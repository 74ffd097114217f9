"""Warehouse.merge_into: Iceberg-style upsert on the parquet twin —
row updates + inserts, partition pruning (untouched partitions' files
physically untouched), delta-manifest time travel, lineage metrics."""

import glob
import os

import pytest

from repurpose_spark.sources.tables import Warehouse


def _rows(df):
    return sorted((r["doc_id"], r["cell_id"], r["v"]) for r in df.collect())


@pytest.fixture()
def wh(spark, tmp_path):
    w = Warehouse(spark, str(tmp_path / "wh"))
    base = spark.createDataFrame(
        [(1, 0, 10), (2, 0, 20), (3, 1, 30), (4, 1, 40), (5, 2, 50)],
        "doc_id long, cell_id int, v long",
    )
    w.write(base, "t", partition_by=["cell_id"])
    return w


class TestMergeInto:
    def test_update_and_insert(self, spark, wh):
        upd = spark.createDataFrame(
            [(2, 0, 21), (6, 0, 60), (3, 1, 31)],
            "doc_id long, cell_id int, v long",
        )
        m = wh.merge_into(upd, "t", ["doc_id"], ["cell_id"])
        assert m == {"n_updated": 2, "n_inserted": 1, "n_partitions": 2}
        assert _rows(wh.read("t")) == [
            (1, 0, 10), (2, 0, 21), (3, 1, 31), (4, 1, 40),
            (5, 2, 50), (6, 0, 60),
        ]

    def test_untouched_partition_files_not_rewritten(self, spark, wh):
        before = {
            p: os.path.getmtime(p)
            for p in glob.glob(wh.path("t") + "/cell_id=2/*.parquet")
        }
        assert before
        upd = spark.createDataFrame(
            [(1, 0, 11)], "doc_id long, cell_id int, v long"
        )
        wh.merge_into(upd, "t", ["doc_id"], ["cell_id"])
        after = {
            p: os.path.getmtime(p)
            for p in glob.glob(wh.path("t") + "/cell_id=2/*.parquet")
        }
        assert after == before  # same files, same mtimes: never rewritten

    def test_pre_merge_snapshot_expires_and_lineage_records(self, spark, wh):
        # the parquet twin deletes replaced files on overwrite (documented:
        # appends time-travel freely, overwrites expire earlier snapshots
        # touching the rewritten partition) — a merge therefore expires
        # the pre-merge snapshot, with the explanatory error
        pre = wh.snapshot_ids("t")[-1]
        upd = spark.createDataFrame(
            [(5, 2, 51)], "doc_id long, cell_id int, v long"
        )
        wh.merge_into(upd, "t", ["doc_id"], ["cell_id"])
        assert (5, 2, 51) in _rows(wh.read("t"))
        with pytest.raises(ValueError, match="expired"):
            wh.read("t", snapshot_id=pre).collect()
        row = [s for s in wh.snapshots("t") if s.get("merge")][-1]
        assert row["n_updated"] == 1 and row["n_inserted"] == 0

    def test_missing_table_raises(self, spark, wh):
        upd = spark.createDataFrame(
            [(1, 0, 1)], "doc_id long, cell_id int, v long"
        )
        with pytest.raises(ValueError, match="does not exist"):
            wh.merge_into(upd, "nope", ["doc_id"], ["cell_id"])

    def test_unstable_keys_drop_stale_row(self, spark, wh):
        # doc 5 moves cell 2 -> cell 0: the stale cell-2 copy must go
        upd = spark.createDataFrame(
            [(5, 0, 55)], "doc_id long, cell_id int, v long"
        )
        m = wh.merge_into(
            upd, "t", ["doc_id"], ["cell_id"], keys_partition_stable=False
        )
        assert m["n_updated"] == 1 and m["n_inserted"] == 0
        rows = _rows(wh.read("t"))
        assert (5, 0, 55) in rows and all(r[0] != 5 or r[1] == 0 for r in rows)

    def test_empty_updates_noop(self, spark, wh):
        upd = spark.createDataFrame(
            [], "doc_id long, cell_id int, v long"
        )
        pre = wh.snapshot_ids("t")[-1]
        m = wh.merge_into(upd, "t", ["doc_id"], ["cell_id"])
        assert m == {"n_updated": 0, "n_inserted": 0, "n_partitions": 0}
        assert wh.snapshot_ids("t")[-1] == pre  # no commit, no write

    def test_unstable_merge_snapshot_readable_and_scoped(self, spark, wh):
        # ADVICE r5 medium: unscoped, the non-stable merge rewrote EVERY
        # partition while its delta manifest listed only the touched
        # ones — reading the merge's own snapshot then raised
        # "snapshot expired".  The rewrite is now partition-scoped:
        # the snapshot replays, and untouched partitions' files keep
        # their mtimes.
        before = {
            p: os.path.getmtime(p)
            for p in glob.glob(wh.path("t") + "/cell_id=1/*.parquet")
        }
        assert before
        upd = spark.createDataFrame(
            [(5, 0, 55)], "doc_id long, cell_id int, v long"
        )
        wh.merge_into(
            upd, "t", ["doc_id"], ["cell_id"], keys_partition_stable=False
        )
        latest = wh.snapshot_ids("t")[-1]
        assert _rows(wh.read("t", snapshot_id=latest)) == _rows(wh.read("t"))
        after = {
            p: os.path.getmtime(p)
            for p in glob.glob(wh.path("t") + "/cell_id=1/*.parquet")
        }
        assert after == before  # cell 1 untouched by the 2->0 key move

    def test_duplicate_merge_keys_raise(self, spark, wh):
        # ADVICE r5 low: duplicate keys silently inserted duplicate rows
        # on the parquet twin while Iceberg's MERGE INTO raises — match
        # the Iceberg cardinality contract
        upd = spark.createDataFrame(
            [(2, 0, 21), (2, 0, 22)], "doc_id long, cell_id int, v long"
        )
        with pytest.raises(ValueError, match="duplicate merge keys"):
            wh.merge_into(upd, "t", ["doc_id"], ["cell_id"])
