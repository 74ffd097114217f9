"""Deterministic bottom-k sampling (operators/sampling.py) and
bucket-over-bucket trending terms (operators/cooccur.py::trending_terms).

Sampling contract: exactly the rows a naive global
row_number-over-hash window would pick — but computed without ever
shuffling the corpus — identical at every partition count and across
runs; seed changes the sample, content doesn't move between groups.
Trending contract: hand-checkable lifts, gap re-entry as new, and the
exact-int division discipline."""

from datetime import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from repurpose_spark.operators.cooccur import trending_terms
from repurpose_spark.operators.sampling import sample_bottom_k, sample_hash_expr


def _docs(spark, n=200, parts=4):
    return spark.range(0, n, 1, parts).select(
        F.format_string("doc%04d", F.col("id")).alias("doc_id"),
        F.element_at(
            F.array(F.lit("web"), F.lit("books"), F.lit("code")),
            (F.col("id") % 3).cast("int") + 1,
        ).alias("source"),
        (F.col("id") * 17 % 97).alias("payload"),
    )


def _naive(df, keys, k, id_col, seed):
    w = Window.partitionBy(*keys).orderBy(
        sample_hash_expr(id_col, seed), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .drop("_rn")
    )


def _key(df):
    return sorted(tuple(r) for r in df.collect())


def test_matches_naive_window(spark):
    df = _docs(spark)
    got = sample_bottom_k(df, ["source"], 7, seed="s1")
    want = _naive(df, ["source"], 7, "doc_id", "s1")
    assert _key(got) == _key(want)
    assert got.groupBy("source").count().where("count != 7").count() == 0


def test_partition_invariance(spark):
    base = _key(sample_bottom_k(_docs(spark, parts=1), ["source"], 5))
    for parts in (3, 16):
        assert (
            _key(sample_bottom_k(_docs(spark, parts=parts), ["source"], 5))
            == base
        )


def test_small_group_returns_whole_group(spark):
    df = _docs(spark, n=9)  # 3 per source
    got = sample_bottom_k(df, ["source"], 25)
    assert got.count() == 9


def test_seed_changes_sample(spark):
    df = _docs(spark)
    a = {r["doc_id"] for r in sample_bottom_k(df, ["source"], 10, seed="a").collect()}
    b = {r["doc_id"] for r in sample_bottom_k(df, ["source"], 10, seed="b").collect()}
    assert a != b


def test_payload_columns_survive(spark):
    df = _docs(spark)
    got = sample_bottom_k(df, ["source"], 4)
    assert got.columns == df.columns
    payload = {r["doc_id"]: r["payload"] for r in df.collect()}
    for r in got.collect():
        assert r["payload"] == payload[r["doc_id"]]


def test_global_sample_no_keys(spark):
    got = sample_bottom_k(_docs(spark), [], 13)
    want = _naive(_docs(spark), [], 13, "doc_id", "")
    assert _key(got) == _key(want)


def test_k_validation(spark):
    with pytest.raises(ValueError, match="positive"):
        sample_bottom_k(_docs(spark), ["source"], 0)


# ------------------------------------------------------------ trending
def test_trending_hand_values(spark):
    # hour 0: a×2 b×1 — hour 1: a×4 b×1 c×1
    rows = [(0, "a")] * 2 + [(0, "b")] + [(1, "a")] * 4 + [(1, "b"), (1, "c")]
    pts = spark.createDataFrame(
        [(datetime(2020, 1, 1, h), t) for h, t in rows], "ts timestamp, token string"
    )
    out = {
        (r["tick"].hour, r["token"]): (r["c_now"], r["c_prev"], r["lift"], r["rn"])
        for r in trending_terms(pts, "hour", k=10).collect()
    }
    # hour 0: everything is new (prev 0)
    assert out[(0, "a")] == (2, 0, 3.0, 1)
    assert out[(0, "b")] == (1, 0, 2.0, 2)
    # hour 1: a quadruples (5/3), b flat (1.0), c new (2.0)
    assert out[(1, "a")] == (4, 2, 5.0 / 3.0, 2)
    assert out[(1, "b")] == (1, 1, 1.0, 3)
    assert out[(1, "c")] == (1, 0, 2.0, 1)  # new beats the riser


def test_trending_gap_reenters_as_new(spark):
    rows = [(0, "a"), (2, "a"), (2, "a")]  # silent in hour 1
    pts = spark.createDataFrame(
        [(datetime(2020, 1, 1, h), t) for h, t in rows], "ts timestamp, token string"
    )
    out = {
        r["tick"].hour: (r["c_now"], r["c_prev"])
        for r in trending_terms(pts, "hour", k=5).collect()
    }
    assert out[2] == (2, 0)  # NOT compared against the stale hour-0 count


def test_trending_top_k_and_ties(spark):
    # equal lifts tie-break by term ascending
    rows = [(0, "x"), (0, "y"), (0, "z")]
    pts = spark.createDataFrame(
        [(datetime(2020, 1, 1, h), t) for h, t in rows], "ts timestamp, token string"
    )
    got = [
        (r["token"], r["rn"])
        for r in trending_terms(pts, "hour", k=2).orderBy("rn").collect()
    ]
    assert got == [("x", 1), ("y", 2)]


def test_trending_partition_invariance(spark):
    rows = [
        (h, f"t{(h * 13 + i) % 7}") for h in range(4) for i in range(h * 5 + 3)
    ]
    data = [(datetime(2020, 1, 1, h), t) for h, t in rows]
    outs = []
    for parts in (1, 8):
        pts = spark.createDataFrame(
            data, "ts timestamp, token string"
        ).repartition(parts)
        outs.append(
            sorted(tuple(r) for r in trending_terms(pts, "hour", k=4).collect())
        )
    assert outs[0] == outs[1]


def test_trending_unit_validation(spark):
    pts = spark.createDataFrame(
        [(datetime(2020, 1, 1), "a")], "ts timestamp, token string"
    )
    with pytest.raises(ValueError, match="unit"):
        trending_terms(pts, "month")
    with pytest.raises(ValueError, match="smoothing"):
        trending_terms(pts, "hour", smoothing=0)
