"""Semantic dedup (operators/semdedup.py) vs an independent numpy
re-implementation: seed selection, assignment, keep-low pruning, and
the partition-independence the hash-seeded design promises."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from repurpose_spark.operators.semdedup import (
    assign_to_seeds,
    cluster_profile,
    seed_medoids,
    semantic_dedup,
)


def _mk_emb(spark, n=120, dim=8, seed=3, parts=4):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(n, dim)).astype(np.float32)
    # plant near-duplicates: every 10th vector is a tiny perturbation of
    # its predecessor (cosine ≈ 1 ≫ any organic pair)
    for i in range(10, n, 10):
        base[i] = base[i - 1] + rng.normal(scale=1e-3, size=dim).astype(
            np.float32
        )
    rows = [(i, [float(x) for x in base[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    if parts:
        df = df.repartition(parts)
    return df, base.astype(np.float64)


def _np_reference(vecs, k, threshold, seed="r5"):
    """Independent model: same hash rank, argmax-cosine assignment with
    lowest-sid ties, drop iff a (centroid_cos, id)-lower neighbour in
    the same cluster clears the threshold."""
    n = len(vecs)

    def h(i):
        return hashlib.md5(
            f"{i}\x1f{seed}".encode("utf-8")
        ).hexdigest()

    order = sorted(range(n), key=lambda i: (h(i), i))
    seeds = order[:k]
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    cos = (vecs @ vecs[seeds].T) / (norms[:, None] * norms[seeds][None, :])
    cl = cos.argmax(axis=1)  # numpy argmax = first max = lowest sid
    ccos = cos[np.arange(n), cl]
    kept = np.ones(n, dtype=bool)
    for b in range(n):
        for a in range(n):
            if a == b or cl[a] != cl[b]:
                continue
            if (ccos[a], a) < (ccos[b], b):
                pc = vecs[a] @ vecs[b] / (norms[a] * norms[b])
                if pc >= threshold:
                    kept[b] = False
                    break
    return seeds, cl, ccos, kept


def test_seed_medoids_matches_hash_rank(spark):
    df, vecs = _mk_emb(spark)
    seeds = seed_medoids(df, 5)
    ref, _, _, _ = _np_reference(vecs, 5, 0.9)
    assert [i for _, i, _ in seeds] == ref
    assert [s for s, _, _ in seeds] == list(range(5))


def test_assignment_matches_numpy(spark):
    df, vecs = _mk_emb(spark)
    seeds = seed_medoids(df, 6)
    got = {
        r["vec_id"]: (r["cluster_id"], r["centroid_cos"])
        for r in assign_to_seeds(df, seeds).collect()
    }
    _, cl, ccos, _ = _np_reference(vecs, 6, 0.9)
    for i in range(len(vecs)):
        assert got[i][0] == cl[i]
        assert got[i][1] == pytest.approx(ccos[i], abs=1e-9)


def test_semantic_dedup_matches_numpy(spark):
    df, vecs = _mk_emb(spark)
    out = {r["vec_id"]: r for r in semantic_dedup(df, k=6, threshold=0.9).collect()}
    _, cl, ccos, kept = _np_reference(vecs, 6, 0.9)
    assert len(out) == len(vecs)
    n_dropped = 0
    for i in range(len(vecs)):
        assert out[i]["cluster_id"] == cl[i]
        assert out[i]["kept"] == bool(kept[i]), i
        n_dropped += 0 if kept[i] else 1
    # the planted perturbation pairs must actually exercise the prune
    assert n_dropped >= 8


def test_partition_independence(spark):
    df1, _ = _mk_emb(spark, parts=1)
    df7, _ = _mk_emb(spark, parts=7)
    a = sorted(
        map(tuple, semantic_dedup(df1, k=4, threshold=0.9).collect())
    )
    b = sorted(
        map(tuple, semantic_dedup(df7, k=4, threshold=0.9).collect())
    )
    assert a == b


def test_keep_low_bias(spark):
    """Within every planted duplicate pair the survivor is the member
    with the LOWER centroid similarity (the paper's keep rule)."""
    df, vecs = _mk_emb(spark)
    rows = {r["vec_id"]: r for r in semantic_dedup(df, k=6, threshold=0.9).collect()}
    for i in range(10, len(vecs), 10):
        a, b = rows[i - 1], rows[i]
        if a["cluster_id"] != b["cluster_id"]:
            continue  # perturbation straddled a cluster boundary
        if a["centroid_cos"] == b["centroid_cos"]:
            continue  # 4dp-rounded tie: priority not recoverable here
        if a["kept"] and not b["kept"] or b["kept"] and not a["kept"]:
            lo = a if a["centroid_cos"] < b["centroid_cos"] else b
            assert lo["kept"]


def test_cluster_profile(spark):
    df, vecs = _mk_emb(spark)
    prof = {r["cluster_id"]: r for r in cluster_profile(df, k=6).collect()}
    _, cl, ccos, _ = _np_reference(vecs, 6, 0.9)
    for c in set(cl):
        want = ccos[cl == c]
        assert prof[c]["n"] == int((cl == c).sum())
        assert prof[c]["min_centroid_cos"] == pytest.approx(
            round(float(want.min()), 4), abs=1e-9
        )
        assert prof[c]["max_centroid_cos"] == pytest.approx(
            round(float(want.max()), 4), abs=1e-9
        )
    assert sum(p["n"] for p in prof.values()) == len(vecs)


def test_assignment_plan_has_no_exchange(spark):
    """Assignment must stay in-row: literal seed arrays, no shuffle.
    (parts=0 skips the fixture's repartition — ITS exchange would
    otherwise sit in the plan under inspection.)"""
    df, _ = _mk_emb(spark, parts=0)
    seeds = seed_medoids(df, 4)
    plan = (
        assign_to_seeds(df, seeds)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_validation(spark):
    df, _ = _mk_emb(spark, n=20)
    with pytest.raises(ValueError):
        seed_medoids(df, 0)


def test_refine_seeds_matches_numpy_lloyd(spark):
    from repurpose_spark.operators.semdedup import refine_seeds

    df, vecs = _mk_emb(spark, n=90, dim=6)
    seeds0 = seed_medoids(df, 4)
    got = refine_seeds(df, seeds0, iters=2)
    # numpy replay: same init, argmax-cosine assignment (lowest-sid
    # ties), per-cluster element means, 2 rounds
    cents = np.array([v for _, _, v in seeds0])
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    for _ in range(2):
        cn = np.sqrt((cents * cents).sum(axis=1))
        cos = (vecs @ cents.T) / (norms[:, None] * cn[None, :])
        cl = cos.argmax(axis=1)
        for c in range(len(cents)):
            if (cl == c).any():
                cents[c] = vecs[cl == c].mean(axis=0)
    for sid, _id, vec in got:
        assert np.allclose(vec, cents[sid], atol=1e-9), sid


def test_refine_seeds_keeps_empty_cluster_centroid(spark):
    from repurpose_spark.operators.semdedup import refine_seeds

    # two tight groups, 3 seeds: at least one seed goes empty after the
    # first assignment and must keep its previous centroid
    rows = [(i, [10.0, 0.0, 0.1 * (i % 3)]) for i in range(6)]
    rows += [(i, [0.0, 10.0, 0.1 * (i % 3)]) for i in range(6, 12)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seeds0 = seed_medoids(df, 3)
    got = refine_seeds(df, seeds0, iters=1)
    assert len(got) == 3 and all(len(v) == 3 for _, _, v in got)


def test_semantic_dedup_lloyd_path_runs(spark):
    df, _ = _mk_emb(spark, n=60, dim=6)
    out = semantic_dedup(df, k=3, threshold=0.9, lloyd_iters=1).collect()
    assert len(out) == 60
    assert {r["cluster_id"] for r in out} <= {0, 1, 2}
