"""Trigram-LM perplexity filter: reference-like text scores higher."""

from repurpose_spark.operators.perplexity import (
    trigram_logprob_scores,
    trigram_model,
)


def test_reference_like_text_scores_higher(spark):
    ref = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog " * 3)
         for i in range(5)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (100, "the quick brown fox naps under the lazy dog"),
            (101, "zzqx jjvw qqpz xxkk wwvv zzzz qqqq ppll mmnn"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["avg_logp"]
        for r in trigram_logprob_scores(docs, ref).collect()
    }
    assert got[100] > got[101]


def test_model_prefers_frequent_trigrams(spark):
    ref = spark.createDataFrame(
        [(0, "aaaaaaaaab")], "doc_id long, text string"
    )
    m = {r["tri"]: r["logp"] for r in trigram_model(ref).collect()}
    assert m["aaa"] > m["aab"]


def test_scores_deterministic(spark):
    ref = spark.createDataFrame(
        [(0, "hello world hello world")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "hello there world")], "doc_id long, text string"
    )
    a = trigram_logprob_scores(docs, ref).first()
    b = trigram_logprob_scores(docs, ref).first()
    assert (a["n_tri"], round(a["avg_logp"], 10)) == (
        b["n_tri"], round(b["avg_logp"], 10),
    )
    assert a["n_tri"] == len("hello there world") - 2
