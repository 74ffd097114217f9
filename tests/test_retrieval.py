"""BM25 scoring (operators/retrieval.py): formula parity with a plain
Python reference, corpus-scan discipline, and the ordered-fold
determinism that makes the float score partition-invariant."""

import math

import pytest
from pyspark.sql import functions as F

from repurpose_spark.operators.retrieval import bm25_scores

CORPUS = [
    ("d1", "spark window merge window window"),
    ("d2", "the quick scan and the slow scan"),
    ("d3", "window"),
    ("d4", "nothing relevant here"),
    ("d5", "SPARK Window dup dup dup scan"),
]
TERMS = ["spark", "window", "dup"]


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {d: t.lower().split() for d, t in corpus}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    out = {}
    for d, v in toks.items():
        dl = len(v)
        score, hits = 0.0, 0
        for t in sorted(terms):
            tf = v.count(t)
            if tf == 0 or df[t] == 0:
                continue
            hits += 1
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * dl / avgdl)
            )
        if hits:
            out[d] = (dl, hits, score)
    return out


def _spark_corpus(spark, parts=3):
    return spark.createDataFrame(CORPUS, "doc_id string, text string").repartition(
        parts
    )


def test_matches_python_reference(spark):
    got = {
        r["doc_id"]: (r["dl"], r["n_hits"], r["score"])
        for r in bm25_scores(_spark_corpus(spark), TERMS).collect()
    }
    want = _py_bm25(CORPUS, TERMS)
    assert set(got) == set(want)  # d4 (no hits) absent from both
    for d in want:
        assert got[d][:2] == want[d][:2]
        assert got[d][2] == pytest.approx(want[d][2], rel=1e-12)


def test_case_insensitive_query_and_text(spark):
    lower = bm25_scores(_spark_corpus(spark), ["dup"]).collect()
    upper = bm25_scores(_spark_corpus(spark), ["DUP"]).collect()
    assert sorted(map(tuple, lower)) == sorted(map(tuple, upper))
    assert lower[0]["doc_id"] == "d5"  # matched the uppercased text too


def test_partition_invariance_bitwise(spark):
    outs = [
        sorted(tuple(r) for r in bm25_scores(_spark_corpus(spark, p), TERMS).collect())
        for p in (1, 7)
    ]
    assert outs[0] == outs[1]  # byte-equal floats: ordered in-row fold


def test_rarer_term_outranks_common_at_equal_tf(spark):
    # 'dup' appears in 1 doc, 'window' in 3 → idf(dup) > idf(window)
    rows = {
        r["doc_id"]: r["score"]
        for r in bm25_scores(_spark_corpus(spark), ["dup", "window"]).collect()
    }
    assert rows["d5"] > rows["d3"]


def test_empty_query_rejected(spark):
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(_spark_corpus(spark), [])


def test_zipf_slope_matches_numpy_ols(spark):
    import numpy as np

    from repurpose_spark.operators.cooccur import zipf_slope

    # engineered frequencies: 'a'x8 'b'x4 'c'x2 (+ hapax 'z' cut away)
    docs = spark.createDataFrame(
        [
            (0, "a a a a b b c z", "s1"),
            (1, "a a a a b b c", "s1"),
        ],
        "doc_id long, text string, source string",
    )
    row = zipf_slope(docs, by=("source",), min_freq=2).collect()[0]
    assert row["source"] == "s1" and row["n_ranks"] == 3
    x = np.log(np.array([1.0, 2.0, 3.0]))  # ranks: a, b, c
    y = np.log(np.array([8.0, 4.0, 2.0]))
    want = np.polyfit(x, y, 1)[0]
    assert row["zipf_slope"] == pytest.approx(want, rel=1e-9)


def test_zipf_slope_single_rank_is_null(spark):
    from repurpose_spark.operators.cooccur import zipf_slope

    docs = spark.createDataFrame(
        [(0, "only only word", "s")], "doc_id long, text string, source string"
    )
    row = zipf_slope(docs, by=("source",), min_freq=2).collect()[0]
    assert row["n_ranks"] == 1 and row["zipf_slope"] is None
