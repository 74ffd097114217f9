"""Structured-Streaming incremental rollup: AvailableNow drains emit
exactly the batch-rollup values for every completed (watermark-passed)
window; the second drain resumes from the offset log and only appends."""

import pytest
from pyspark.sql import functions as F

from repurpose_spark.config import EngineConfig
from repurpose_spark.operators.reorient import sequences_to_points
from repurpose_spark.operators.rollup import rollup_points
from repurpose_spark.sources.synthetic import synth_sequences
from repurpose_spark.streaming.incremental import (
    incremental_hourly_rollup,
    run_available_now,
)

CFG = EngineConfig(n_cells=8)
TIER_COLS = ["cell_id", "doc_id", "tick", "n_points", "sum_v", "min_v", "max_v"]


def _rows(df):
    return sorted(map(tuple, df.select(*TIER_COLS).collect()))


def test_incremental_drains_match_batch(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # points stream, fed in event-time order: first hours 0-1 (pos<128),
    # then the rest — the natural incremental-ingest pattern
    pts = sequences_to_points(synth_sequences(spark, 200), CFG).select(
        "doc_id", "ts", "token"
    )
    pts.where(F.col("pos") < 128).write.mode("append").parquet(src)

    stream = incremental_hourly_rollup(spark, src, CFG, watermark="30 minutes", max_files_per_trigger=1)
    run_available_now(stream, out, ckpt)
    got1 = spark.read.parquet(out)
    batch_all = rollup_points(
        sequences_to_points(synth_sequences(spark, 200), CFG, with_ts=False),
        3600, dt_seconds=CFG.dt_seconds, epoch=CFG.epoch,
    ).cache()

    # emitted rows must be exact batch-tier rows (watermark-complete ones)
    got1_set = _rows(got1)
    assert len(got1_set) > 0
    batch_by_key = {r[:3]: r for r in _rows(batch_all)}
    for r in got1_set:
        assert batch_by_key[r[:3]] == r
    # the first window [0,1h) is certainly complete (max ts 2:07, wm 1:37)
    ticks1 = {r[2] for r in got1_set}
    assert min(batch_by_key)[2] in ticks1

    # feed the remaining positions; resume from the checkpoint
    pts.where(F.col("pos") >= 128).write.mode("append").parquet(src)
    stream2 = incremental_hourly_rollup(spark, src, CFG, watermark="30 minutes", max_files_per_trigger=1)
    run_available_now(stream2, out, ckpt)
    got2_set = _rows(spark.read.parquet(out))

    # monotone append, no duplicates, still exact batch values
    assert set(got1_set) <= set(got2_set)
    keys2 = [r[:3] for r in got2_set]
    assert len(keys2) == len(set(keys2))
    for r in got2_set:
        assert batch_by_key[r[:3]] == r
    # run 2 completed more windows than run 1
    assert len(got2_set) > len(got1_set)
