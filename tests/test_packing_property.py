"""Property-based fuzz of the distributed prefix-sum packing against the
single-process reference (mirrors test_gorilla_property's strategy):
random doc lists, budgets, group counts and partition counts must all
reproduce the pure-python concat-and-chunk layout exactly."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from repurpose_spark.operators.packing import pack_sequences

docs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9999),   # id suffix
        st.integers(min_value=0, max_value=3),      # group
        st.integers(min_value=0, max_value=500),    # len (0 allowed)
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda t: t[0],
)


def _expected(rows, budget):
    out, acc = {}, {}
    for doc, src, n in sorted(rows, key=lambda r: (r[1], r[0])):
        start = acc.get(src, 0)
        cum = start + n
        out[doc] = (
            start // budget,
            start % budget,
            0 if n == 0 else (cum - 1) // budget - start // budget + 1,
        )
        acc[src] = cum
    return out


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=docs_strategy,
    budget=st.sampled_from([1, 7, 64, 513]),
    parts=st.sampled_from([1, 3, 16]),
)
def test_pack_fuzz_matches_reference(spark, rows, budget, parts):
    data = [(f"d{i:05d}", f"g{g}", n) for i, g, n in rows]
    df = spark.createDataFrame(
        data, "doc_id string, source string, n_tok int"
    )
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["n_chunks"])
        for r in pack_sequences(
            df, budget, num_partitions=parts
        ).collect()
    }
    expect = _expected(data, budget)
    assert got == expect
