"""Property-based codec guarantees (hypothesis): any int64/float64
stream round-trips bit-exactly, and the batch encoders are byte-identical
to the per-row encoders on arbitrary batches (no Spark needed)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from repurpose_spark.functions.gorilla import (
    dod_decode,
    dod_encode,
    dod_encode_batch,
    xor_decode,
    xor_encode,
    xor_encode_batch,
)

ints = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62 - 1), max_size=300
)
floats = st.lists(
    st.floats(allow_nan=False, width=64), max_size=300
)


@settings(max_examples=200, deadline=None)
@given(ints)
def test_dod_roundtrip(xs):
    a = np.asarray(xs, dtype=np.int64)
    assert np.array_equal(dod_decode(dod_encode(a)), a)


@settings(max_examples=200, deadline=None)
@given(floats)
def test_xor_roundtrip(xs):
    a = np.asarray(xs, dtype=np.float64)
    out = xor_decode(xor_encode(a))
    assert np.array_equal(out, a, equal_nan=True)


@settings(max_examples=50, deadline=None)
@given(st.lists(ints, max_size=12))
def test_dod_batch_equals_per_row(batches):
    arrays = [np.asarray(b, dtype=np.int64) for b in batches]
    assert dod_encode_batch(arrays) == [dod_encode(a) for a in arrays]


@settings(max_examples=50, deadline=None)
@given(st.lists(floats, max_size=12))
def test_xor_batch_equals_per_row(batches):
    arrays = [np.asarray(b, dtype=np.float64) for b in batches]
    assert xor_encode_batch(arrays) == [xor_encode(a) for a in arrays]
