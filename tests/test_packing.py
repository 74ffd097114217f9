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
            0 if n == 0 else (cum - 1) // budget - start // budget + 1,
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


def test_materialize_packs_roundtrip(spark):
    """Flattening the packed examples in chunk order reproduces the
    id-ordered concatenation of the source docs, and every non-final
    chunk is exactly budget long."""
    from repurpose_spark.operators.packing import materialize_packs
    from repurpose_spark.sources.synthetic import synth_sequences

    seqs = synth_sequences(spark, 120)
    packs = materialize_packs(seqs, 512, num_partitions=7).collect()

    by_group = {}
    for r in packs:
        by_group.setdefault(r["source"], []).append(r)
    src_rows = seqs.select("source", "doc_id", "tokens").collect()
    concat = {}
    for r in sorted(src_rows, key=lambda r: (r["source"], r["doc_id"])):
        concat.setdefault(r["source"], []).extend(r["tokens"])

    for g, rows in by_group.items():
        rows.sort(key=lambda r: r["pack_id"])
        # contiguous chunk ids from 0
        assert [r["pack_id"] for r in rows] == list(range(len(rows)))
        # all but the last chunk are exactly budget long
        assert all(r["n_tok"] == 512 for r in rows[:-1])
        flat = [t for r in rows for t in r["tokens"]]
        assert flat == concat[g], f"group {g} roundtrip mismatch"


def test_materialize_packs_partitioning_independent(spark):
    from repurpose_spark.operators.packing import materialize_packs
    from repurpose_spark.sources.synthetic import synth_sequences

    seqs = synth_sequences(spark, 60)
    a = materialize_packs(seqs, 256, num_partitions=2).collect()
    b = materialize_packs(seqs, 256, num_partitions=11).collect()
    key = lambda rs: sorted((r["source"], r["pack_id"], tuple(r["tokens"])) for r in rs)  # noqa: E731
    assert key(a) == key(b)


def test_sample_mixture_rates_and_epochs(spark, seqs):
    from repurpose_spark.operators.packing import sample_mixture

    out = sample_mixture(
        seqs, {"a": 0.5, "b": 2.5}, seed="t"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    n_a_src = seqs.where("source = 'a'").count()
    n_b_src = seqs.where("source = 'b'").count()
    # downsample: roughly half of a kept, all in epoch 0
    n_a = len(by_src["a"])
    assert 0.3 * n_a_src < n_a < 0.7 * n_a_src
    assert all(r["epoch"] == 0 for r in by_src["a"])
    # upsample 2.5x: two full epochs + ~half a third
    n_b = len(by_src["b"])
    assert 2.2 * n_b_src < n_b < 2.8 * n_b_src
    eps = {r["epoch"] for r in by_src["b"]}
    assert eps == {0, 1, 2}
    # full epochs are complete copies
    assert sum(1 for r in by_src["b"] if r["epoch"] == 0) == n_b_src
    assert sum(1 for r in by_src["b"] if r["epoch"] == 1) == n_b_src

    # determinism
    again = sample_mixture(seqs, {"a": 0.5, "b": 2.5}, seed="t").collect()
    key = lambda rs: sorted((r["doc_id"], r["epoch"]) for r in rs)  # noqa: E731
    assert key(out) == key(again)


def test_sample_mixture_default_rate_is_keep_once(spark, seqs):
    from repurpose_spark.operators.packing import sample_mixture

    out = sample_mixture(seqs, {"a": 0.5})
    assert out.where("source = 'b'").count() == seqs.where("source = 'b'").count()


def test_chunk_documents_overlap_and_coverage(spark):
    from repurpose_spark.operators.packing import chunk_documents

    docs = spark.createDataFrame(
        [("d1", "abcdefghij"), ("d2", "xy"), ("d3", "")],
        "doc_id string, text string",
    )
    got = {}
    for r in chunk_documents(docs, size=4, stride=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk"])
        )
    for v in got.values():
        v.sort()
    assert got["d1"] == [
        (0, 0, "abcd"), (1, 2, "cdef"), (2, 4, "efgh"),
        (3, 6, "ghij"), (4, 8, "ij"),
    ]
    assert got["d2"] == [(0, 0, "xy")]
    assert got["d3"] == [(0, 0, "")]
    # disjoint default reconstructs the doc
    flat = "".join(
        r["chunk"]
        for r in sorted(
            chunk_documents(docs, size=3).where("doc_id='d1'").collect(),
            key=lambda r: r["chunk_idx"],
        )
    )
    assert flat == "abcdefghij"


def test_pack_int_group_key(spark):
    """by= with a non-string dtype (offsets schema follows the column's
    dtype — ADVICE r2)."""
    rows = [(f"d{i:03d}", i % 3, 10 + (i * 7) % 90) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id string, bucket int, n_tok int")
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["n_chunks"])
        for r in pack_sequences(df, 128, by="bucket").collect()
    }
    expect = _expected([(d, b, n) for d, b, n in rows], 128)
    assert got == expect


def test_pack_pid_assignment_is_frozen(spark, seqs):
    """The range-partitioned pid assignment feeds two jobs (partials
    collect + cum join); it must be checkpointed so both see the SAME
    boundaries (ADVICE r2, high).  Evidence: the returned plan reads the
    materialized checkpoint (ExistingRDD), not a live range exchange."""
    out = pack_sequences(seqs, 512)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
    assert "RangePartitioning" not in plan


def test_materialize_packs_zero_len_boundary_doc(spark):
    """A zero-length doc whose start lands exactly on a chunk boundary
    must not emit pieces into the PREVIOUS chunk (descending sequence
    bug — ADVICE r2) nor create a spurious trailing pack."""
    from repurpose_spark.operators.packing import materialize_packs

    rows = [
        ("d0", "a", list(range(8)), 8),
        ("d1", "a", [], 0),          # starts at offset 8 == budget
        ("d2", "a", [100, 101], 2),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, source string, tokens array<int>, n_tok int"
    )
    packs = {
        r["pack_id"]: r["tokens"]
        for r in materialize_packs(df, 8, by="source").collect()
    }
    assert packs == {0: list(range(8)), 1: [100, 101]}
