"""History-aware dedup ingest (operators/ingest.py): the per-batch
accept/reject loop over the Warehouse + materialized LSH index.

Reference analog: the append-new-dates ingest loop (img2ts.py:798-802)
extends the store with only the novel slice; here "novel" additionally
means not a near-dup of anything already ingested.
"""

import pytest
from pyspark.sql import functions as F

from repurpose_spark.operators.ingest import ingest_with_dedup
from repurpose_spark.sources.tables import Warehouse

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far "
    "away into the deep green forest to hide from the loud hunters"
)
MH = dict(k=8, bands=8, shingle_n=8, threshold=0.35, step=1)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path / "wh"))


def test_bootstrap_dedups_within_batch(spark, wh):
    m = ingest_with_dedup(
        wh,
        _docs(spark, [
            (1, BASE),
            (2, BASE),                              # exact dup of 1
            (3, BASE.replace("green", "dark")),     # near dup of 1
            (4, "totally unrelated document about parquet row groups"),
        ]),
        minhash_kwargs=MH,
    )
    assert m == {
        "n_in": 4, "n_exact_dropped": 1, "n_within_near_dropped": 1,
        "n_history_near_dropped": 0, "n_accepted": 2,
    }
    assert {r["doc_id"] for r in wh.read("documents").collect()} == {1, 4}
    # lineage: the bootstrap snapshot carries the stage counts
    snap = wh.snapshots("documents")[-1]
    assert snap["n_accepted"] == 2 and snap["n_in"] == 4


def test_second_batch_rejects_history_dups(spark, wh):
    ingest_with_dedup(
        wh,
        _docs(spark, [
            (1, BASE),
            (4, "totally unrelated document about parquet row groups"),
        ]),
        minhash_kwargs=MH,
    )
    m = ingest_with_dedup(
        wh,
        _docs(spark, [
            (10, BASE),                              # exact re-delivery of 1
            (11, BASE.replace("quick", "swift")),    # near dup of 1 AND of 10
            (12, "a genuinely fresh document discussing shuffle salting"),
        ]),
        minhash_kwargs=MH,
    )
    # 10~11 is a WITHIN-batch near pair (both derive from BASE), so 11
    # drops at stage 2; the survivor 10 then hits history (jaccard 1.0
    # vs doc 1 — the exact re-delivery caught by the probe, no history
    # fingerprint table needed)
    assert m == {
        "n_in": 3, "n_exact_dropped": 0, "n_within_near_dropped": 1,
        "n_history_near_dropped": 1, "n_accepted": 1,
    }
    assert {r["doc_id"] for r in wh.read("documents").collect()} == {1, 4, 12}


def test_all_duplicate_batch_commits_noop_lineage(spark, wh):
    ingest_with_dedup(wh, _docs(spark, [(1, BASE)]), minhash_kwargs=MH)
    m = ingest_with_dedup(wh, _docs(spark, [(20, BASE)]), minhash_kwargs=MH)
    assert m["n_accepted"] == 0 and m["n_history_near_dropped"] == 1
    snaps = wh.snapshots("documents")
    assert snaps[-1]["mode"] == "noop-ingest" and snaps[-1]["n_in"] == 1
    assert wh.read("documents").count() == 1


def test_extended_index_equals_fresh_build(spark, wh, tmp_path):
    """After N ingests, the incrementally-extended index must be
    indistinguishable from a from-scratch materialize over the accepted
    corpus: a probe of a new batch returns identical pairs either way."""
    from repurpose_spark.operators.dedup import (
        materialize_dedup_index,
        minhash_probe_indexed,
    )

    ingest_with_dedup(
        wh, _docs(spark, [(1, BASE), (2, "unrelated text about parquet")]),
        minhash_kwargs=MH,
    )
    ingest_with_dedup(
        wh,
        _docs(spark, [(3, "fresh row mentioning broadcast joins only"),
                      (4, BASE.replace("forest", "meadow").replace(
                          "hunters", "farmers"))]),
        minhash_kwargs=MH,
    )
    probe = _docs(spark, [
        (100, BASE.replace("lazy", "idle")),
        (101, "fresh row mentioning broadcast joins too"),
        (102, "nothing like anything else at all whatsoever"),
    ])
    mh = {k: v for k, v in MH.items() if k != "threshold"}
    fresh_path = str(tmp_path / "fresh_idx")
    materialize_dedup_index(wh.read("documents"), fresh_path, **mh)
    got_ext = {
        tuple(r) for r in minhash_probe_indexed(
            spark, str(tmp_path / "wh" / "documents__dedup_index"),
            probe, threshold=MH["threshold"], **mh,
        ).collect()
    }
    got_fresh = {
        tuple(r) for r in minhash_probe_indexed(
            spark, fresh_path, probe, threshold=MH["threshold"], **mh,
        ).collect()
    }
    assert got_ext == got_fresh and got_ext  # non-vacuous
    new_ids = {p[0] for p in got_ext}
    assert 100 in new_ids and 101 in new_ids and 102 not in new_ids
