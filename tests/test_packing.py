"""Sequence packing (distributed prefix sum) and deterministic splits."""

import pytest
from pyspark.sql import functions as F

from repurpose_spark.operators.packing import pack_sequences, split_assign


@pytest.fixture(scope="module")
def seqs(spark):
    rows = [
        (f"d{i:03d}", "a" if i % 3 else "b", 10 + (i * 7) % 90)
        for i in range(200)
    ]
    return spark.createDataFrame(rows, "doc_id string, source string, n_tok int")


def _expected(rows, budget):
    # single-process reference: per-source id-ordered concat-and-chunk
    out = {}
    by_src = {}
    for doc, src, n in sorted(rows, key=lambda r: (r[1], r[0])):
        start = by_src.get(src, 0)
        cum = start + n
        out[doc] = (
            start // budget,
            start % budget,
            (cum - 1) // budget - start // budget + 1,
        )
        by_src[src] = cum
    return out

def test_pack_matches_reference(spark, seqs):
    rows = [tuple(r) for r in seqs.collect()]
    expect = _expected(rows, 512)
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["n_chunks"])
        for r in pack_sequences(seqs, 512).collect()
    }
    assert got == expect


def test_pack_independent_of_partitioning(spark, seqs):
    a = pack_sequences(seqs, 512, num_partitions=2).collect()
    b = pack_sequences(seqs, 512, num_partitions=13).collect()
    key = lambda rs: sorted(map(tuple, rs))  # noqa: E731
    assert key(a) == key(b)


def test_pack_long_doc_spans_chunks(spark):
    rows = [("a", "s", 100), ("b", "s", 2000), ("c", "s", 100)]
    d = spark.createDataFrame(rows, "doc_id string, source string, n_tok int")
    got = {r["doc_id"]: r for r in pack_sequences(d, 512).collect()}
    assert got["a"]["pack_id"] == 0 and got["a"]["n_chunks"] == 1
    # b starts at offset 100 → chunk 0, ends at 2099 → chunk 4: spans 5
    assert got["b"]["pack_id"] == 0 and got["b"]["n_chunks"] == 5
    # c starts at 2100 → chunk 4
    assert got["c"]["pack_id"] == 4 and got["c"]["pack_offset"] == 2100 - 4 * 512


def test_split_assign_deterministic_and_weighted(spark, seqs):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s1 = {r["doc_id"]: r["split"] for r in split_assign(seqs, w).collect()}
    s2 = {r["doc_id"]: r["split"] for r in split_assign(seqs, w).collect()}
    assert s1 == s2
    counts = {}
    for v in s1.values():
        counts[v] = counts.get(v, 0) + 1
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    assert counts["train"] > counts.get("test", 0)
    # different seed → different assignment (at least one doc moves)
    s3 = {
        r["doc_id"]: r["split"]
        for r in split_assign(seqs, w, seed="other").collect()
    }
    assert s3 != s1
