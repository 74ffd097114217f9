"""Slice sink (S7): one directory per tick, partition-pruned read-back,
exact content round-trip vs the in-memory tier."""

import os

from pyspark.sql import functions as F

from repurpose_spark.config import EngineConfig
from repurpose_spark.operators.reorient import sequences_to_points
from repurpose_spark.operators.rollup import rollup_points
from repurpose_spark.operators.slices import export_slices, read_slice
from repurpose_spark.sources.synthetic import synth_sequences

CFG = EngineConfig(n_cells=8)


def test_export_and_pruned_read(spark, tmp_path):
    path = str(tmp_path / "slices")
    hourly = rollup_points(
        sequences_to_points(synth_sequences(spark, 60), CFG, with_ts=False),
        3600, dt_seconds=CFG.dt_seconds, epoch=CFG.epoch,
    ).cache()
    export_slices(hourly, path)

    # one directory per distinct tick
    dirs = [d for d in os.listdir(path) if d.startswith("slice_key=")]
    assert len(dirs) == hourly.select("tick").distinct().count()

    # pruned read returns exactly that tick's rows
    t = "2020-01-01 01:00:00"
    got = read_slice(spark, path, t)
    exp = hourly.where(F.col("tick") == t)
    cols = ["cell_id", "doc_id", "n_points", "sum_v", "min_v", "max_v"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, exp.select(*cols).collect())
    )
    # the filter is a partition filter, not a data filter (scan prunes)
    plan = got._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PartitionFilters: [isnotnull(slice_key" in plan


def test_single_file_per_slice(spark, tmp_path):
    path = str(tmp_path / "slices1")
    hourly = rollup_points(
        sequences_to_points(synth_sequences(spark, 30), CFG, with_ts=False),
        3600, dt_seconds=CFG.dt_seconds, epoch=CFG.epoch,
    )
    export_slices(hourly, path, single_file_per_slice=True)
    for d in os.listdir(path):
        if not d.startswith("slice_key="):
            continue
        files = [f for f in os.listdir(os.path.join(path, d)) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} has {len(files)} files"
