"""Round-trip reorientation tests.

Mirrors the reference's Img2Ts read-back assertions
(/root/reference/tests/test_img2ts.py:184-192): convert, reconstruct, and
assert exact per-row token-array equality vs the source
(BASELINE.json input_hint invariant)."""

import pandas as pd
from pyspark.sql import functions as F

from repurpose_spark.config import EngineConfig
from repurpose_spark.operators.reorient import points_to_sequences, sequences_to_points
from repurpose_spark.sources.synthetic import synth_sequences, synth_sequences_pandas

CFG = EngineConfig(n_cells=16)


def test_synth_matches_pandas_twin(spark):
    n = 50
    got = (
        synth_sequences(spark, n)
        .orderBy("doc_id")
        .toPandas()
    )
    exp = synth_sequences_pandas(n)
    assert list(got["doc_id"]) == list(exp["doc_id"])
    assert list(got["n_tok"]) == list(exp["n_tok"])
    assert list(got["source"]) == list(exp["source"])
    for a, b in zip(got["tokens"], exp["tokens"]):
        assert list(a) == list(b)


def test_points_invariants(spark):
    seqs = synth_sequences(spark, 20)
    pts = sequences_to_points(seqs, CFG)
    # row count = sum n_tok; per-doc one cell; ts = epoch + pos*dt
    n_pts = pts.count()
    assert n_pts == seqs.agg(F.sum("n_tok")).collect()[0][0]
    cells_per_doc = pts.groupBy("doc_id").agg(
        F.countDistinct("cell_id").alias("c")
    )
    assert cells_per_doc.where("c != 1").count() == 0
    bad_ts = pts.where(
        F.unix_timestamp("ts")
        != F.unix_timestamp(F.lit(CFG.epoch).cast("timestamp"))
        + F.col("pos").cast("long") * CFG.dt_seconds
    )
    assert bad_ts.count() == 0


def test_round_trip_token_array_equality(spark):
    seqs = synth_sequences(spark, 100)
    pts = sequences_to_points(seqs, CFG)
    back = points_to_sequences(pts, CFG)
    joined = (
        seqs.alias("a")
        .join(back.alias("b"), "doc_id")
        .select(
            "doc_id",
            (F.col("a.tokens") == F.col("b.tokens")).alias("tok_eq"),
            (F.col("a.n_tok") == F.col("b.n_tok")).alias("n_eq"),
            (F.col("a.source") == F.col("b.source")).alias("s_eq"),
        )
    )
    assert joined.count() == 100
    assert joined.where(~F.col("tok_eq") | ~F.col("n_eq") | ~F.col("s_eq")).count() == 0


def test_round_trip_skewed(spark):
    seqs = synth_sequences(spark, 100, skew=True)
    back = points_to_sequences(sequences_to_points(seqs, CFG), CFG)
    diff = seqs.select("doc_id", "tokens").exceptAll(
        back.select("doc_id", "tokens")
    )
    assert diff.count() == 0
    assert back.count() == 100
