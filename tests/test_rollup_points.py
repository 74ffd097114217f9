"""rollup_points (integer-bucket fast path) must be identical to the
generic date_trunc rollup on the derived positional axis."""

import pytest

from repurpose_spark.config import EngineConfig
from repurpose_spark.operators.reorient import sequences_to_points
from repurpose_spark.operators.rollup import rollup, rollup_points
from repurpose_spark.sources.synthetic import synth_sequences

CFG = EngineConfig(n_cells=8)


def test_rollup_points_equals_date_trunc(spark):
    seqs = synth_sequences(spark, 50)
    pts_ts = sequences_to_points(seqs, CFG, with_ts=True)
    pts_pos = sequences_to_points(seqs, CFG, with_ts=False)
    a = rollup(pts_ts, "hour")
    b = rollup_points(pts_pos, 3600, dt_seconds=CFG.dt_seconds, epoch=CFG.epoch)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_rollup_points_rejects_misaligned_epoch(spark):
    seqs = synth_sequences(spark, 5)
    pts = sequences_to_points(seqs, CFG, with_ts=False)
    with pytest.raises(ValueError):
        rollup_points(pts, 3600, epoch="2020-01-01 00:30:00")
