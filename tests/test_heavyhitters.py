"""Heavy hitters (MG candidates → exact verify): byte-exact vs a full
exact top-k on separated data, MG decrement path exercised with vocab
far above capacity, the honesty contract of the ``guaranteed`` flag,
and partition-layout invariance of guaranteed-exact output."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from repurpose_spark.operators.heavyhitters import (
    _mg_fold,
    top_words,
    topk_frequent,
)


def test_mg_fold_guarantee_local():
    """Classic MG property on an adversarial stream: every item with
    true freq > n/m survives, and estimates undercount by ≤ n/m."""
    rng = np.random.default_rng(0)
    # zipf-ish: heavy head + huge uniform tail
    head = [f"h{i}" for i in range(8) for _ in range(2000 - 200 * i)]
    tail = [f"t{i}" for i in rng.integers(0, 200_000, 60_000)]
    stream = head + tail
    rng.shuffle(stream)
    m = 64
    d: dict = {}
    for i in range(0, len(stream), 1000):  # batched folds
        from collections import Counter

        c = Counter(stream[i : i + 1000])
        _mg_fold(d, c.keys(), c.values(), m)
    assert len(d) <= m
    n = len(stream)
    from collections import Counter

    true = Counter(stream)
    for it, cnt in true.items():
        if cnt > n / m:
            assert it in d, it
            assert d[it] <= cnt and cnt - d[it] <= n / m


@pytest.fixture(scope="module")
def sep_items(spark):
    """4 groups × separated zipf head over a 5000-item vocab — far
    above the sketch capacity, so decrements genuinely fire."""
    return spark.range(200_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.concat(
            F.lit("w"),
            F.when(F.col("id") % 3 == 0, (F.col("id") % 7))  # hot: w0..w6
            .otherwise((F.col("id") * 104729) % 5000 + 10),
        ).cast("string").alias("item"),
    ).cache()


def _exact_topk(df, k):
    from pyspark.sql import Window

    w = Window.partitionBy("g").orderBy(F.desc("n"), F.asc("item"))
    return {
        (r.g, r.item, r.n, r.rnk)
        for r in df.groupBy("g", "item")
        .agg(F.count("*").alias("n"))
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .collect()
    }


def test_exact_when_guaranteed_under_decrements(spark, sep_items):
    out = topk_frequent(sep_items, "item", ["g"], k=5, m=128).collect()
    assert len(out) == 20
    assert all(r.guaranteed for r in out)
    got = {(r.g, r.item, r.n, r.rnk) for r in out}
    assert got == _exact_topk(sep_items, 5)


def test_partition_layout_invariance(spark, sep_items):
    a = sorted(
        map(
            tuple,
            topk_frequent(
                sep_items.repartition(17), "item", ["g"], k=5, m=128
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            topk_frequent(
                sep_items.coalesce(1), "item", ["g"], k=5, m=128
            ).collect(),
        )
    )
    assert a == b


def test_guarantee_flag_is_honest(spark):
    """Mildly skewed data with m far too small: candidates survive,
    but the kth count ≤ n/m, so the flag must come back False — the
    operator never claims exactness it cannot prove.  (On perfectly
    uniform data MG retains nothing at all and the result is empty —
    the degenerate honest answer, asserted too.)"""
    # 10 heavies at freq 2400, just BELOW the certification bound
    # n/m = 40000/16 = 2500: they survive MG (the tail's decrement mass
    # is ~16k/(m+1) ≈ 940 per counter) but cannot be certified
    items = spark.range(40_000).select(
        F.lit("g").alias("g"),
        F.when(
            F.col("id") < 24_000,
            F.concat(F.lit("h"), (F.col("id") % 10)),
        )
        .otherwise(F.concat(F.lit("t"), F.col("id")))
        .alias("item"),
    )
    out = topk_frequent(items, "item", ["g"], k=5, m=16).collect()
    assert out and not any(r.guaranteed for r in out)
    uniform = spark.range(40_000).select(
        F.lit("g").alias("g"),
        ((F.col("id") * 104729) % 3000).cast("string").alias("item"),
    )
    assert (
        topk_frequent(uniform.coalesce(1), "item", ["g"], k=5, m=16).count()
        == 0
    )


def test_top_words_matches_duckdb_shape(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = top_words(docs, k=3, m=256)
    rows = out.collect()
    assert {len(r) for r in rows} == {6}
    assert all(r.rnk <= 3 and r.guaranteed for r in rows)
    # per-group: counts non-increasing by rank
    by_g = {}
    for r in rows:
        by_g.setdefault((r.lang, r.source), []).append(r)
    for rs in by_g.values():
        rs.sort(key=lambda r: r.rnk)
        assert all(a.n >= b.n for a, b in zip(rs, rs[1:]))


def test_flag_false_when_fewer_than_k_survive(spark):
    """Review finding: 2 dominant items + a singleton tail, m small —
    MG's merge decrements the tail away, so fewer than k candidates
    survive; min-over-emitted is NOT the kth exact count and the flag
    must be False (true ranks 3..k are missing)."""
    items = spark.range(100_000).select(
        F.lit("g").alias("g"),
        F.when(F.col("id") < 40_000, F.lit("A"))
        .when(F.col("id") < 80_000, F.lit("B"))
        .otherwise(F.concat(F.lit("t"), F.col("id")))
        .alias("item"),
    )
    out = topk_frequent(items.coalesce(4), "item", ["g"], k=5, m=16).collect()
    assert 0 < len(out) < 5
    assert not any(r.guaranteed for r in out)


def test_null_group_key_kept(spark):
    """GROUP BY keeps NULL keys; so must the candidate/total joins."""
    items = spark.range(2_000).select(
        F.when(F.col("id") % 2 == 0, F.lit("g")).alias("g"),
        (F.col("id") % 3).cast("string").alias("item"),
    )
    out = topk_frequent(items, "item", ["g"], k=2, m=64).collect()
    keys = {r.g for r in out}
    assert keys == {"g", None}
    null_rows = [r for r in out if r.g is None]
    assert len(null_rows) == 2 and all(r.guaranteed for r in null_rows)
