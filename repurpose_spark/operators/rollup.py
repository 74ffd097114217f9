"""Continuous aggregates: raw → hourly → daily retention tiers (A4).

The reference leaves temporal downsampling to a user ``preprocess`` hook
(``df.resample('1D').mean()``, ts2img.py:284-303 and
tests/test_ts2img.py:170-177); here it is first-class.  Two scale rules:

1. **partial+final**: each coarser tier is computed from the next finer
   tier's *partials* (sum/count/min/max), never from raw again — daily
   reads hourly, which is ~3600x smaller than raw points.  avg is derived
   at read time as sum/count, so re-aggregation stays exact.
2. the groupBy keys start with ``cell_id`` so the tier tables inherit the
   cell partitioning and downstream per-cell consumers shuffle nothing.

All aggregates are built-in JVM expressions (hash agg + map-side combine
via Catalyst); no UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from repurpose_spark.config import EPOCH_STR

MERGEABLE = ("n_points", "sum_v", "min_v", "max_v")


def rollup(
    points: DataFrame,
    unit: str,
    key_cols: list = ("cell_id", "doc_id"),
    ts_col: str = "ts",
    value_col: str = "token",
) -> DataFrame:
    """Finest rollup from raw points: one row per (keys, date_trunc(unit, ts))."""
    key_cols = list(key_cols)
    return (
        points.groupBy(*key_cols, F.date_trunc(unit, F.col(ts_col)).alias("tick"))
        .agg(
            F.count(value_col).alias("n_points"),
            F.sum(value_col).alias("sum_v"),
            F.min(value_col).alias("min_v"),
            F.max(value_col).alias("max_v"),
        )
    )


def rollup_points(
    points: DataFrame,
    unit_seconds: int,
    key_cols: list = ("cell_id", "doc_id"),
    pos_col: str = "pos",
    value_col: str = "token",
    dt_seconds: int = 60,
    epoch: str = EPOCH_STR,
    sketch_distinct: bool = False,
    sketch_lg_k: int = 12,
) -> DataFrame:
    """Rollup for the derived positional time axis (ts = epoch + pos*dt).

    ``sketch_distinct=True`` adds a ``uniq_sketch`` HLL partial of
    ``value_col`` per group (distinct-vocabulary tiers; see
    :func:`rollup_distinct_sketch` for semantics and the determinism
    caveat).

    Groups on the integer bucket ``floor(pos*dt / unit)`` and converts to a
    tick timestamp only after aggregation (160k groups instead of 8M rows
    through timestamp codegen) — identical output to
    ``rollup(points_with_ts, unit)`` whenever ``epoch`` is aligned to the
    unit boundary (asserted in tests).  ~4x cheaper per token than
    per-row ``date_trunc``.
    """
    key_cols = list(key_cols)
    epoch_sec = _epoch_seconds(epoch)
    if epoch_sec % unit_seconds != 0:
        raise ValueError("epoch must be aligned to the rollup unit")
    bucket = F.floor(
        (F.col(pos_col).cast("long") * dt_seconds) / unit_seconds
    ).alias("__b")
    aggs = [
        F.count(value_col).alias("n_points"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    ]
    out_cols = ["n_points", "sum_v", "min_v", "max_v"]
    if sketch_distinct:
        # mergeable uniques partial (see rollup_distinct_sketch): the
        # only way a non-key column's distinct count survives the
        # partial+final tier architecture without raw re-reads
        aggs.append(
            F.hll_sketch_agg(value_col, F.lit(sketch_lg_k)).alias(
                "uniq_sketch"
            )
        )
        out_cols.append("uniq_sketch")
    return (
        points.groupBy(*key_cols, bucket)
        .agg(*aggs)
        .select(
            *key_cols,
            F.timestamp_seconds(
                F.lit(epoch_sec) + F.col("__b") * unit_seconds
            ).alias("tick"),
            *out_cols,
        )
    )


def _epoch_seconds(epoch: str) -> int:
    import calendar
    from datetime import datetime

    return calendar.timegm(datetime.fromisoformat(epoch).timetuple())


def rollup_from_partials(
    tier: DataFrame,
    unit: str,
    key_cols: list = ("cell_id", "doc_id"),
    tick_col: str = "tick",
) -> DataFrame:
    """Coarser tier from a finer tier's mergeable partials (exact re-agg;
    a ``uniq_sketch`` column, when present, merges via sketch union)."""
    key_cols = list(key_cols)
    aggs = [
        F.sum("n_points").alias("n_points"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    ]
    if "uniq_sketch" in tier.columns:
        aggs.append(
            F.hll_union_agg("uniq_sketch", F.lit(False)).alias("uniq_sketch")
        )
    return (
        tier.groupBy(*key_cols, F.date_trunc(unit, F.col(tick_col)).alias("tick"))
        .agg(*aggs)
    )


def with_avg(tier: DataFrame) -> DataFrame:
    """Derive mean at read time — exact under re-aggregation."""
    return tier.withColumn("avg_v", F.col("sum_v") / F.col("n_points"))


# ---------------------------------------------------- distinct-count tiers
def rollup_distinct_sketch(
    points: DataFrame,
    unit: str,
    distinct_col: str,
    key_cols: list = ("cell_id",),
    ts_col: str = "ts",
    lg_k: int = 12,
) -> DataFrame:
    """Finest distinct-count tier: one HLL sketch per (keys, tick).

    Exact ``count_distinct`` does NOT re-aggregate (distinct counts are
    not mergeable partials), so an exact daily-uniques tier would have
    to re-read raw — the one aggregate the partial+final architecture
    cannot carry.  Apache DataSketches HLL closes the gap: sketches ARE
    mergeable (union-of-hourly ≈ sketch-of-raw-day within the sketch
    error — test-enforced), ~2^lg_k bytes each, relative standard error
    ~1.04/sqrt(2^lg_k) (~1.6% at the default lg_k=12).  The TimescaleDB
    continuous-aggregate pattern for distinct counts, on Spark's
    built-in ``hll_sketch_agg`` (JVM, map-side partial merge — no UDF).

    Determinism caveat (deliberate exception to SURVEY §7.3): Spark
    builds per-partition partial sketches and merges them, and HLL_4
    merge results vary with the partition layout WITHIN the error
    bound — estimates are error-bounded, not byte-stable.  This is the
    engine's one approximate, partitioning-sensitive aggregate; use
    exact ``count_distinct`` (or the salted two-phase distinct) where
    byte-stable answers are required and a raw re-read is affordable.
    """
    key_cols = list(key_cols)
    return points.groupBy(
        *key_cols, F.date_trunc(unit, F.col(ts_col)).alias("tick")
    ).agg(
        F.hll_sketch_agg(distinct_col, F.lit(lg_k)).alias("uniq_sketch"),
        F.count(distinct_col).alias("n_points"),
    )


def rollup_sketch_from_partials(
    tier: DataFrame,
    unit: str,
    key_cols: list = ("cell_id",),
    tick_col: str = "tick",
) -> DataFrame:
    """Coarser distinct tier from finer sketches — ``hll_union_agg``
    merges without touching raw (sketch union is exact: the merged
    registers equal the registers a direct coarse sketch would hold)."""
    key_cols = list(key_cols)
    return tier.groupBy(
        *key_cols, F.date_trunc(unit, F.col(tick_col)).alias("tick")
    ).agg(
        F.hll_union_agg("uniq_sketch", F.lit(False)).alias("uniq_sketch"),
        F.sum("n_points").alias("n_points"),
    )


def with_distinct_estimate(tier: DataFrame) -> DataFrame:
    """Read-time estimate column from the sketch (keeps the sketch for
    further unions — estimates themselves never re-aggregate)."""
    return tier.withColumn(
        "n_distinct_est", F.hll_sketch_estimate("uniq_sketch")
    )
