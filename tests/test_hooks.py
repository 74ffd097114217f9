"""F1 preprocess hooks (applyInPandas grouped-map) + P6 reserved-name
validation in collocate."""

import pytest
from pyspark.sql import functions as F

from repurpose_spark.config import EngineConfig
from repurpose_spark.operators.collocate import collocate
from repurpose_spark.operators.hooks import apply_per_series
from repurpose_spark.operators.reorient import sequences_to_points
from repurpose_spark.sources.synthetic import synth_sequences

CFG = EngineConfig(n_cells=8)


def test_hooks_chain_and_sort(spark):
    pts = sequences_to_points(synth_sequences(spark, 20), CFG, with_ts=False)

    def diff(pdf):  # needs sorted input
        return pdf.assign(d=pdf.token.diff().fillna(0))

    def scale(pdf):
        return pdf.assign(d=pdf.d * 2)[["doc_id", "pos", "d"]]

    out = apply_per_series(
        pts.select("doc_id", "pos", "token"),
        [diff, scale],
        "doc_id string, pos int, d double",
        key_cols=["doc_id"],
        sort_within="pos",
    )
    rows = {
        (r["doc_id"], r["pos"]): r["d"]
        for r in out.where(F.col("doc_id") == "doc00000002").collect()
    }
    # tokens step by 7 per pos (closed form) → diff*2 == 14 except pos 0
    assert rows[("doc00000002", 0)] == 0.0
    assert all(
        v == 14.0 for (d, p), v in rows.items() if p > 0
    )


def test_non_callable_hook_rejected(spark):
    pts = sequences_to_points(synth_sequences(spark, 5), CFG, with_ts=False)
    with pytest.raises(TypeError, match="not callable"):
        apply_per_series(pts, ["not-a-fn"], "doc_id string", ["doc_id"])


def test_collocate_reserved_names(spark):
    obs = spark.createDataFrame(
        [("a", "2020-01-01 00:30:00", 1.0)],
        "doc_id string, obs_ts string, timedelta_seconds double",
    ).withColumn("obs_ts", F.col("obs_ts").cast("timestamp"))
    with pytest.raises(ValueError, match="reserved"):
        collocate(obs, ["2020-01-01 00:00:00", "2020-01-01 01:00:00"])
