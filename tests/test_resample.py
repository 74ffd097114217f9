"""k-NN resample join (J1/J2) vs a straight numpy oracle — mirrors the
reference's known-value tests (tests/test_resample.py:42-137: NN
correctness + Hamming-window golden weights)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from repurpose_spark.operators.resample import (
    build_neighbor_pairs,
    hamming_weight,
    resample_nn,
    resample_weighted,
)


def _grids():
    # targets: 4x4 integer grid; sources: 7x7 half-step grid, value = key*3
    targets = [(i, float(i % 4), float(i // 4)) for i in range(16)]
    sources = [(s, (s % 7) * 0.5, (s // 7) * 0.5) for s in range(49)]
    return targets, sources


@pytest.fixture(scope="module")
def pairs(spark):
    targets, sources = _grids()
    return build_neighbor_pairs(
        spark, targets, sources, k=4, max_dist=0.75
    ).cache()


@pytest.fixture(scope="module")
def src_df(spark):
    _, sources = _grids()
    return spark.createDataFrame(
        [(s, float(s * 3)) for s, _, _ in sources], "key long, v double"
    )


def test_nn_is_exact_collocated_source(spark, pairs, src_df):
    """Every target sits exactly on a source: NN dist must be 0 and the
    value the collocated source's (resample column-0 semantics)."""
    out = {
        r["target_key"]: (r["dist"], r["v"])
        for r in resample_nn(src_df, pairs, ["v"]).collect()
    }
    assert len(out) == 16
    for t, x, y in _grids()[0]:
        s_exact = int(y * 2) * 7 + int(x * 2)
        assert out[t] == (0.0, float(s_exact * 3))


def test_weighted_matches_numpy_oracle(spark, pairs, src_df):
    targets, sources = _grids()
    svals = {s: s * 3.0 for s, _, _ in sources}
    # numpy oracle: same k/max_dist/tie-break, Hamming radius 0.75
    expected = {}
    for t, tx, ty in targets:
        ds = sorted(
            (
                (math.hypot(sx - tx, sy - ty), s)
                for s, sx, sy in sources
                if math.hypot(sx - tx, sy - ty) <= 0.75
            ),
        )[:4]
        ws = [0.54 + 0.46 * math.cos(math.pi * d / 0.75) for d, _ in ds]
        expected[t] = sum(w * svals[s] for w, (_, s) in zip(ws, ds)) / sum(ws)
    out = resample_weighted(
        src_df, pairs, ["v"], weight=hamming_weight(F.col("dist"), 0.75)
    )
    got = {r["target_key"]: r["v"] for r in out.collect()}
    assert set(got) == set(expected)
    for t in expected:
        assert got[t] == pytest.approx(expected[t], abs=1e-9)


def test_min_neighbours_gate(spark, src_df):
    """min_neighbours drops under-covered targets (resample.py:84-97)."""
    targets, sources = _grids()
    far = [(99, 100.0, 100.0)] + targets  # isolated target: 0 neighbours
    pairs = build_neighbor_pairs(spark, far, sources, k=4, max_dist=0.75)
    out = resample_weighted(src_df, pairs, ["v"], min_neighbours=4)
    keys = {r["target_key"] for r in out.collect()}
    assert 99 not in keys
    # interior targets have 1 exact + >=4 at 0.5 → the 4-NN set is full
    assert 5 in keys  # target (1,1) is interior


def test_rank_and_tiebreak_deterministic(spark, pairs):
    """rank 1 is the exact hit; ranks 2..4 are the 0.5-distance ring in
    source_key order (deterministic tie-break)."""
    rows = sorted(
        (r["rank"], r["dist"], r["source_key"])
        for r in pairs.where(F.col("target_key") == 5).collect()
    )
    assert rows[0][0] == 1 and rows[0][1] == 0.0
    assert [d for _, d, _ in rows[1:]] == [0.5, 0.5, 0.5]
    ring_keys = [k for _, _, k in rows[1:]]
    assert ring_keys == sorted(ring_keys)


def test_distributed_pairs_equal_driver_pairs(spark):
    """The grid-bucketed distributed builder must produce the identical
    pairs relation (keys, dists, ranks) as the driver-side brute force."""
    from repurpose_spark.operators.resample import (
        build_neighbor_pairs_distributed,
    )

    targets, sources = _grids()
    drv = build_neighbor_pairs(spark, targets, sources, k=4, max_dist=0.75)
    t_df = spark.createDataFrame(targets, "key long, x double, y double")
    s_df = spark.createDataFrame(sources, "key long, x double, y double")
    dist = build_neighbor_pairs_distributed(t_df, s_df, k=4, max_dist=0.75)
    cols = ["target_key", "source_key", "dist", "rank"]
    a = sorted(map(tuple, drv.select(*cols).collect()))
    b = sorted(map(tuple, dist.select(*cols).collect()))
    assert a == b
