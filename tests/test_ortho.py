"""OrthoMultiTs layout: shared per-cell tick axis, aligned values,
exact long↔ortho round-trip (img2ts.py orthogonal-mode semantics)."""

import pytest
from pyspark.sql import functions as F

from repurpose_spark.config import EngineConfig
from repurpose_spark.operators.ortho import ortho_layout, ortho_to_long
from repurpose_spark.operators.reorient import sequences_to_points
from repurpose_spark.operators.rollup import rollup_points
from repurpose_spark.sources.synthetic import synth_sequences

CFG = EngineConfig(n_cells=8)


@pytest.fixture(scope="module")
def hourly(spark):
    pts = sequences_to_points(synth_sequences(spark, 120), CFG, with_ts=False)
    return rollup_points(
        pts, 3600, dt_seconds=CFG.dt_seconds, epoch=CFG.epoch
    ).cache()


def test_shared_axis_per_cell(spark, hourly):
    o = ortho_layout(hourly).cache()
    # every series in a cell carries the identical tick vector
    per_cell = o.groupBy("cell_id").agg(
        F.count_distinct(F.to_json(F.struct("ticks"))).alias("n_axes")
    )
    assert per_cell.where("n_axes > 1").count() == 0
    # axis length == distinct ticks of the cell
    axis = {r["cell_id"]: len(r["ticks"]) for r in o.select("cell_id", "ticks").dropDuplicates(["cell_id"]).collect()}
    truth = {
        r["cell_id"]: r["n"]
        for r in hourly.groupBy("cell_id").agg(
            F.count_distinct("tick").alias("n")
        ).collect()
    }
    assert axis == truth


def test_alignment_and_fills(spark, hourly):
    o = ortho_layout(hourly)
    row = o.where(F.col("doc_id") == "doc00000003").first()
    obs = {
        r["tick"]: r["sum_v"]
        for r in hourly.where(F.col("doc_id") == "doc00000003").collect()
    }
    for t, v in zip(row["ticks"], row["values"]):
        if t in obs:
            assert v == obs[t]
        else:
            assert v is None
    assert sum(v is not None for v in row["values"]) == len(obs)


def test_round_trip_exact(spark, hourly):
    o = ortho_layout(hourly)
    back = ortho_to_long(o)
    a = hourly.select("cell_id", "doc_id", "tick", "sum_v")
    diff = a.exceptAll(back).count() + back.exceptAll(a).count()
    assert diff == 0
