"""Collocation vs the pandas-reindex oracle (reference-exact semantics,
stack.py:263-309), including the adversarial offset set from the
reference's unit tests (/root/reference/tests/test_image.py:129-134 —
offsets {0, 1h, 3.5h, 0.125h, 5.9999h} inside a 6h window)."""

import numpy as np
import pandas as pd
import pytest

from repurpose_spark.operators.collocate import collocate, max_gap_seconds, _ticks_to_seconds
from repurpose_spark.oracle.numpy_oracle import oracle_collocate


def _cmp(spark, obs_pd, ticks, strategy, tolerance_seconds=None):
    got = (
        collocate(
            spark.createDataFrame(obs_pd),
            ticks,
            key_cols=["doc_id"],
            ts_col="obs_ts",
            strategy=strategy,
            tolerance_seconds=tolerance_seconds,
        )
        .toPandas()
        .sort_values(["doc_id", "tick"])
        .reset_index(drop=True)
    )
    exp = (
        oracle_collocate(obs_pd, ticks, key_cols=["doc_id"], ts_col="obs_ts",
                         tolerance_seconds=tolerance_seconds)
        .sort_values(["doc_id", "tick"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp), f"{len(got)} vs {len(exp)}\n{got}\n{exp}"
    for c in ["doc_id", "tick", "timedelta_seconds", "v"]:
        if c in exp.columns:
            a, b = got[c].values, exp[c].values
            if a.dtype.kind == "f":
                assert np.allclose(a.astype(float), b.astype(float)), c
            else:
                assert (a == b).all(), f"{c}\n{got}\n{exp}"
    return got


def _obs(doc, hours, vals=None):
    base = pd.Timestamp("2020-01-01")
    return pd.DataFrame(
        {
            "doc_id": doc,
            "obs_ts": [base + pd.Timedelta(hours=h) for h in hours],
            "v": vals if vals is not None else list(range(len(hours))),
        }
    )


TICKS_6H = pd.date_range("2020-01-01", periods=9, freq="6h")


@pytest.mark.parametrize("strategy", ["array", "binned", "arithmetic"])
def test_reference_edge_offsets(spark, strategy):
    # the exact offset set from tests/test_image.py:130
    offsets = [0.0, 1.0, 3.5, 0.125, 5.9999]
    hours = [6 * i + o for i, o in enumerate(offsets)]
    _cmp(spark, _obs("d0", hours), TICKS_6H, strategy)


@pytest.mark.parametrize("strategy", ["array", "binned", "arithmetic"])
def test_exact_tick_fills_two_slots(spark, strategy):
    # obs exactly on a tick also backfills the previous empty tick (case H)
    got = _cmp(spark, _obs("d0", [6.0, 7.0]), TICKS_6H, strategy)
    assert len(got) == 2
    assert set(got["timedelta_seconds"]) == {0.0, 6 * 3600.0}


@pytest.mark.parametrize("strategy", ["array", "binned", "arithmetic"])
def test_first_per_slot_discard(spark, strategy):
    got = _cmp(spark, _obs("d0", [1.0, 2.0, 3.0]), TICKS_6H, strategy)
    assert len(got) == 1 and got["v"][0] == 0


@pytest.mark.parametrize("strategy", ["array", "binned", "arithmetic"])
def test_tolerance_inclusive_and_beyond(spark, strategy):
    _cmp(spark, _obs("d0", [12.0 + 6.0]), TICKS_6H, strategy)      # == tol
    _cmp(spark, _obs("d0", [70.0]), TICKS_6H, strategy)            # beyond axis


@pytest.mark.parametrize("strategy", ["array", "binned"])  # irregular: no arithmetic path
def test_irregular_axis(spark, strategy):
    ticks = [pd.Timestamp("2020-01-01") + pd.Timedelta(hours=h) for h in [0, 1, 12, 13, 36]]
    obs = _obs("d0", [0.5, 1.0, 5.0, 12.7, 20.0, 36.0, 40.0])
    _cmp(spark, obs, ticks, strategy)


@pytest.mark.parametrize("strategy", ["array", "binned", "arithmetic"])
def test_multi_series_random(spark, strategy):
    rng = np.random.default_rng(42)
    frames = []
    for d in range(8):
        hours = np.sort(rng.uniform(0, 50, size=25))
        frames.append(_obs(f"d{d}", hours, rng.integers(0, 100, 25)))
    obs = pd.concat(frames, ignore_index=True)
    _cmp(spark, obs, TICKS_6H, strategy)


@pytest.mark.parametrize("strategy", ["array", "binned", "arithmetic"])
def test_explicit_tolerance(spark, strategy):
    obs = _obs("d0", [0.5, 7.0, 13.5])
    _cmp(spark, obs, TICKS_6H, strategy, tolerance_seconds=3600)


def test_max_gap(spark):
    ticks = _ticks_to_seconds(list(TICKS_6H))
    assert max_gap_seconds(ticks) == 6 * 3600
