"""DTW template matching (operators/dtw.py): the anti-diagonal
vectorized kernel is pinned against an independent brute-force DP, and
the Spark operator against hand-built series."""

import datetime as dt

import numpy as np
import pytest

from repurpose_spark.operators.dtw import dtw_kernel, dtw_to_references


def brute_dtw(x, y, band=None):
    n, m = len(x), len(y)
    D = np.full((n, m), np.inf)
    for i in range(n):
        for j in range(m):
            if band is not None and abs(i - j) > band:
                continue
            c = abs(x[i] - y[j])
            if i == 0 and j == 0:
                D[i, j] = c
                continue
            best = np.inf
            if i > 0:
                best = min(best, D[i - 1, j])
            if j > 0:
                best = min(best, D[i, j - 1])
            if i > 0 and j > 0:
                best = min(best, D[i - 1, j - 1])
            D[i, j] = c + best
    return float(D[-1, -1])


@pytest.mark.parametrize("band", [None, 1, 3, 10])
@pytest.mark.parametrize("shape", [(1, 1), (5, 5), (7, 3), (3, 7), (20, 13)])
def test_kernel_matches_brute_force(band, shape):
    rng = np.random.default_rng(shape[0] * 100 + shape[1] + (band or 0))
    x = rng.normal(size=shape[0])
    y = rng.normal(size=shape[1])
    got = dtw_kernel(x, y, band=band)
    want = brute_dtw(x, y, band=band)
    if np.isinf(want):
        assert np.isinf(got)
    else:
        assert got == pytest.approx(want, rel=1e-12)


def test_kernel_known_answers():
    a = np.array([0.0, 0.0, 1.0, 0.0])
    assert dtw_kernel(a, a) == 0.0
    # a one-step shift warps away entirely (Euclidean would pay 2.0)
    b = np.array([0.0, 1.0, 0.0, 0.0])
    assert dtw_kernel(a, b, band=2) == 0.0
    # band 0 forbids warping → diagonal == L1 distance
    assert dtw_kernel(a, b, band=0) == 2.0
    # infeasible band: length gap exceeds it
    assert np.isinf(dtw_kernel(a, np.zeros(9), band=2))


def test_dtw_to_references_spark(spark):
    t0 = dt.datetime(2024, 1, 1)
    spike = [0.0, 0.0, 5.0, 5.0, 0.0, 0.0, 0.0, 0.0]
    flat = [1.0] * 8
    rows = [
        ("spiky", t0 + dt.timedelta(hours=h), v) for h, v in enumerate(spike)
    ] + [("flat", t0 + dt.timedelta(hours=h), v) for h, v in enumerate(flat)]
    series = spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    )
    refs = spark.createDataFrame(
        [("spike_tpl", [0.0, 5.0, 5.0, 0.0]), ("zero_tpl", [0.0] * 4)],
        "ref_id string, pattern array<double>",
    )
    out = {
        (r["key"], r["ref_id"]): r["dtw_dist"]
        for r in dtw_to_references(
            series, refs, keys=("key",), band=6
        ).collect()
    }
    # the spike template warps onto the spiky series at zero cost
    assert out[("spiky", "spike_tpl")] == 0.0
    # and clearly separates it from the flat series
    assert out[("flat", "spike_tpl")] > 5.0
    assert out[("flat", "zero_tpl")] == 8.0  # |1-0| per point, no warp gain
    # kernel parity: operator result == direct kernel on the sorted series
    assert out[("spiky", "zero_tpl")] == pytest.approx(
        dtw_kernel(np.array(spike), np.zeros(4), band=6)
    )


def test_dtw_infeasible_band_yields_null(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("k", t0 + dt.timedelta(hours=h), float(h)) for h in range(12)
    ]
    series = spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    )
    refs = spark.createDataFrame(
        [("short", [1.0, 2.0])], "ref_id string, pattern array<double>"
    )
    r = dtw_to_references(series, refs, keys=("key",), band=3).collect()[0]
    assert r["dtw_dist"] is None and r["n_points"] == 12


def test_dtw_znorm_matches_shape_not_level(spark):
    t0 = dt.datetime(2024, 1, 1)
    shape = [0.0, 1.0, 0.0, -1.0, 0.0, 1.0, 0.0, -1.0]
    scaled = [100.0 + 10 * v for v in shape]
    rows = [
        ("scaled", t0 + dt.timedelta(hours=h), v)
        for h, v in enumerate(scaled)
    ]
    series = spark.createDataFrame(
        rows, "key string, ts timestamp, value double"
    )
    refs = spark.createDataFrame(
        [("wave", shape)], "ref_id string, pattern array<double>"
    )
    raw = dtw_to_references(series, refs, keys=("key",)).collect()[0]
    zn = dtw_to_references(series, refs, keys=("key",), znorm=True).collect()[
        0
    ]
    assert raw["dtw_dist"] > 100  # level difference dominates raw DTW
    assert zn["dtw_dist"] == pytest.approx(0.0, abs=1e-9)
