"""Learned BPE: merge learning cross-checked against an independent
brute-force reference (recounts every pair over the fully expanded
corpus each round — no word-count shortcut), rank-priority encoding
equivalence to merge-sequence replay, lossless detokenize round trips,
and the distributed train/encode path over the documents fixture."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from repurpose_spark.operators.bpe import (
    EOW,
    bpe_encode,
    detokenize,
    encode_word,
    learn_merges_local,
    train_bpe,
    word_frequencies,
)

CORPUS = (
    "the cat sat on the mat "
    "the cats sat on the mats "
    "a rat sat where the cat sat "
    "that cat is the fattest cat"
).split()


def _brute_force_merges(words, n_merges):
    """Independent oracle: token sequences for EVERY word instance
    (with repetition), pairs recounted from scratch each round."""
    seqs = [list(w) + [EOW] for w in words]
    merges = []
    for _ in range(n_merges):
        counts = {}
        for s in seqs:
            for p in zip(s, s[1:]):
                counts[p] = counts.get(p, 0) + 1
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b), _ = best
        merges.append((a, b))
        for s in seqs:
            i = 0
            while i < len(s) - 1:
                if s[i] == a and s[i + 1] == b:
                    s[i : i + 2] = [a + b]
                else:
                    i += 1
    return merges


def _word_counts(words):
    out = {}
    for w in words:
        out[w] = out.get(w, 0) + 1
    return sorted(out.items())


def test_merge_learning_matches_brute_force():
    """Weighted word-form learning must equal instance-level learning
    — the identity that makes the distributed word-count pass valid."""
    for n in (1, 5, 15, 40):
        got = learn_merges_local(_word_counts(CORPUS), n)
        want = _brute_force_merges(CORPUS, n)
        assert got == want, (n, got, want)


def test_encode_equals_merge_replay():
    """Rank-priority encoding (GPT-2 style) must reproduce what
    replaying the merge sequence in learning order produces."""
    merges = learn_merges_local(_word_counts(CORPUS), 30)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w in set(CORPUS) | {"catsat", "ratmat", "zzz", "q"}:
        replay = list(w) + [EOW]
        for a, b in merges:
            i = 0
            while i < len(replay) - 1:
                if replay[i] == a and replay[i + 1] == b:
                    replay[i : i + 2] = [a + b]
                else:
                    i += 1
        assert encode_word(w, ranks) == replay, w


def test_roundtrip_lossless():
    merges = learn_merges_local(_word_counts(CORPUS), 25)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    text = " ".join(CORPUS)
    toks = []
    for w in text.split():
        toks.extend(encode_word(w, ranks))
    assert detokenize(toks) == text
    # compression actually happened
    assert len(toks) < sum(len(w) + 1 for w in text.split())


def test_learning_stops_when_no_pair_repeats():
    merges = learn_merges_local([("ab", 1), ("cd", 1)], 100)
    assert merges == []  # min_pair_count=2 gate
    merges = learn_merges_local([("ab", 3)], 100, min_pair_count=2)
    # 'ab'→ merge a+b, then ab+EOW; then nothing left
    assert merges == [("a", "b"), ("ab", EOW)]


@pytest.fixture(scope="module")
def docs(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )


def test_distributed_word_frequencies_exact(spark, docs):
    """The one corpus pass is a plain groupBy — byte-exact vs pandas."""
    got = {
        r["word"]: r["n"] for r in word_frequencies(docs).collect()
    }
    pdf = docs.toPandas()
    want = {}
    for t in pdf["text"]:
        for w in str(t).lower().split():
            want[w] = want.get(w, 0) + 1
    assert got == want


def test_distributed_train_matches_local(spark, docs):
    """With max_word_forms ≥ the vocabulary, distributed training must
    equal local learning on the exact word counts."""
    pdf = docs.toPandas()
    counts = {}
    for t in pdf["text"]:
        for w in str(t).lower().split():
            counts[w] = counts.get(w, 0) + 1
    want = learn_merges_local(sorted(counts.items()), 60)
    got = train_bpe(docs, n_merges=60, max_word_forms=10_000_000)
    assert got == want
    assert len(got) == 60


def test_bpe_encode_spark_path(spark, docs):
    """Distributed encoding: matches driver-side encode_word per doc,
    detokenize round-trips, n column consistent, partition-count
    independent."""
    merges = train_bpe(docs, n_merges=80)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    out = bpe_encode(docs.repartition(7), merges).collect()
    assert len(out) == docs.count()
    pdf = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out[:50]:
        text = str(pdf[r["doc_id"]])
        want = []
        for w in text.lower().split():
            want.extend(encode_word(w, ranks))
        assert r["bpe_tokens"] == want
        assert r["n_bpe_tokens"] == len(want)
        norm = " ".join(text.lower().split())
        assert detokenize(r["bpe_tokens"]) == norm
    # layout invariance: same result at 1 partition
    one = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(docs.coalesce(1), merges).collect()
    }
    for r in out:
        assert one[r["doc_id"]] == r["bpe_tokens"]


def test_encode_rejects_reserved_eow_typed(spark, docs):
    """Review finding: a literal U+2581 in input would silently break
    detokenize losslessness — it must fail typed instead."""
    merges = learn_merges_local(_word_counts(CORPUS), 10)
    bad = spark.createDataFrame(
        [("d1", "foo ▁bar")], "doc_id string, text string"
    )
    with pytest.raises(Exception, match="U\\+2581"):
        bpe_encode(bad, merges).collect()


def test_encode_splits_like_jvm_ascii_whitespace(spark):
    """Review finding: python str.split() splits on NBSP, JVM \\s+ does
    not — train/encode must agree, so NBSP stays inside the word."""
    merges = []
    df = spark.createDataFrame(
        [("d1", "a b c")], "doc_id string, text string"
    )
    row = bpe_encode(df, merges).collect()[0]
    # two words: 'a\xa0b' (NBSP kept) and 'c'
    assert row.n_bpe_tokens == len("a b") + 1 + len("c") + 1
    got_words = "".join(row.bpe_tokens).split(EOW)
    assert got_words[:2] == ["a b", "c"]
