"""Reorientation: the Img2Ts "big transpose" and its Ts2Img inverse.

Reference: the whole point of repurpose is converting time-major image
stacks into location-major per-cell time series via
``np.split(np.swapaxes(...))`` after a sort-by-cell (img2ts.py:665-731),
and back (ts2img.py).  In a relational model this transpose **is a
shuffle**: explode the payload into long format, attach the cell key, and
let the shuffle on ``cell_id`` co-locate each series.  The inverse is a
``collect_list(struct(pos, token))`` re-assembly with ``array_sort`` — a
deterministic, order-insensitive aggregation (safe under any partitioning,
SURVEY.md §7.3 determinism requirement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from repurpose_spark.config import DEFAULT, EngineConfig
from repurpose_spark.functions.cells import cell_id_expr
from repurpose_spark.functions.timeutils import pos_ts_expr


def sequences_to_points(
    seqs: DataFrame,
    cfg: EngineConfig = DEFAULT,
    with_ts: bool = True,
) -> DataFrame:
    """(doc_id, tokens, n_tok, source) → (cell_id, doc_id, pos, ts, token, source).

    ``posexplode`` is the R2 flatten analog (np.repeat + flatten,
    img2ts.py:531-536).  No shuffle happens here — the shuffle belongs to
    the consumer (groupBy cell / write partitionBy), so Catalyst can fuse
    this whole stage into one WholeStageCodegen scan+generate.
    """
    pts = seqs.select(
        cell_id_expr("doc_id", cfg.n_cells).alias("cell_id"),
        "doc_id",
        "source",
        F.posexplode("tokens").alias("pos", "token"),
    )
    if with_ts:
        pts = pts.withColumn("ts", pos_ts_expr("pos", cfg.dt_seconds, cfg.epoch))
    return pts


def points_to_sequences(points: DataFrame, cfg: EngineConfig = DEFAULT) -> DataFrame:
    """Inverse reorientation: long points back to (doc_id, tokens, n_tok, source).

    Round-trip invariant (BASELINE.json input_hint): per-row token-array
    equality vs the source table; asserted in tests mirroring the
    reference's read-back checks (tests/test_img2ts.py:184-192).

    ``sort_array`` of ``struct(pos, token)`` makes the result independent
    of row arrival order — partial aggregation (map-side combine) stays
    enabled and the output is deterministic under any partitioning.
    """
    return (
        points.groupBy("doc_id", "source")
        .agg(F.sort_array(F.collect_list(F.struct("pos", "token"))).alias("pt"))
        .select(
            "doc_id",
            F.col("pt.token").alias("tokens"),
            F.size("pt").cast("int").alias("n_tok"),
            "source",
        )
    )
