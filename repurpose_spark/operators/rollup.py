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

import numpy as np
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
    sketch_quantiles: bool = False,
    sketch_q_k: int = 512,
) -> DataFrame:
    """Rollup for the derived positional time axis (ts = epoch + pos*dt).

    ``sketch_distinct=True`` adds a ``uniq_sketch`` HLL partial of
    ``value_col`` per group (distinct-vocabulary tiers; see
    :func:`rollup_distinct_sketch` for semantics and the determinism
    caveat).

    ``sketch_quantiles=True`` additionally joins in a ``q_sketch``
    mergeable KLL partial of ``value_col`` per group (percentile tiers;
    see :func:`rollup_quantile_sketch`).  The sketch is computed by a
    hand-built partial+final pass over the same slim projection and
    equi-joined on the group keys — both sides are tier-sized (raw
    never shuffles for the sketch), and downstream maintenance
    (daily derivation, compaction, incremental refresh) carries the
    column like any other mergeable partial.

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
    jvm = (
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
    if not sketch_quantiles:
        return jvm
    bucket_raw = F.floor(
        (F.col(pos_col).cast("long") * dt_seconds) / unit_seconds
    )
    slim = points.select(
        *key_cols,
        F.timestamp_seconds(
            F.lit(epoch_sec) + bucket_raw * unit_seconds
        ).alias("tick"),
        F.col(value_col).cast("double").alias("_v"),
    )
    qt = _qsketch_tier(slim, key_cols + ["tick"], sketch_q_k).drop(
        "n_points"  # jvm side already carries the exact count
    )
    return _join_sketch(jvm, qt, key_cols + ["tick"])


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
    a ``uniq_sketch`` column, when present, merges via HLL union, and a
    ``q_sketch`` column via KLL merge — joined back on the group keys
    since the KLL merge is an applyInPandas, not a JVM aggregate)."""
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
    jvm = (
        tier.groupBy(*key_cols, F.date_trunc(unit, F.col(tick_col)).alias("tick"))
        .agg(*aggs)
    )
    if "q_sketch" not in tier.columns:
        return jvm
    qt = rollup_qsketch_from_partials(
        tier, unit, key_cols=key_cols, tick_col=tick_col
    ).drop("n_points")
    return _join_sketch(jvm, qt, key_cols + ["tick"])


def _join_sketch(jvm: DataFrame, qt: DataFrame, cols: list) -> DataFrame:
    """Join the sketch column back onto the JVM aggregates NULL-SAFELY:
    groupBy keeps NULL-keyed groups, so a plain equi-join would leave
    their q_sketch NULL and crash the first from_bytes downstream."""
    cond = None
    for c in cols:
        piece = jvm[c].eqNullSafe(qt[c])
        cond = piece if cond is None else cond & piece
    return jvm.join(qt, on=cond, how="left").select(
        *[jvm[c] for c in jvm.columns], qt["q_sketch"]
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


# ------------------------------------------------------- percentile tiers
def rollup_quantile_sketch(
    points: DataFrame,
    unit: str,
    value_col: str,
    key_cols: list = ("cell_id",),
    ts_col: str = "ts",
    k: int = 512,
) -> DataFrame:
    """Finest percentile tier: one mergeable KLL sketch per (keys, tick).

    Exact percentiles are the other non-mergeable aggregate (after
    distinct counts): a daily p99 is not a function of hourly p99s, so
    an exact percentile tier would re-read raw.  The KLL sketch
    (`functions/qsketch.py`) is mergeable with ~O(1/k) RANK error, so
    coarser tiers union finer sketches without raw — the TimescaleDB
    `percentile_agg` continuous-aggregate pattern.

    Scale shape (the part that matters at 100 TB): this is a hand-built
    partial+final aggregate.  Phase 1 runs inside ``mapInPandas`` and
    folds each PARTITION's rows into per-(keys, tick) partial sketches —
    raw values never cross the wire.  Phase 2 groups the
    O(partitions × groups) sketch blobs (~4 KB each at k=512) and merges
    them per group.  Executor memory holds one sketch per live group per
    partition (bounded: ~550 retained float64 at k=512), the same
    footprint contract as the packing partials
    (`operators/packing.py:36`).

    Like the HLL tier, estimates are error-bounded, not byte-stable:
    partition layout changes insert order, which changes which samples
    survive compaction (rank error stays within bound — test-enforced).
    """
    key_cols = list(key_cols)
    slim = points.select(
        *key_cols,
        F.date_trunc(unit, F.col(ts_col)).alias("tick"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return _qsketch_tier(slim, key_cols + ["tick"], k)


def _qsketch_tier(slim: DataFrame, gcols: list, k: int) -> DataFrame:
    """Partial+final over a (gcols..., _v) frame: per-partition partial
    sketches via mapInPandas (raw never shuffles), then a per-group
    merge of the O(partitions × groups) blobs."""
    import pandas as pd

    from repurpose_spark.functions.qsketch import QuantileSketch

    part_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in slim.schema.fields
        if f.name != "_v"
    ) + ", q_sketch binary, n_points long"

    def partials(batches):
        acc: dict[tuple, QuantileSketch] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(gcols, dropna=False, sort=False):
                kt = tuple(key) if isinstance(key, tuple) else (key,)
                sk = acc.get(kt)
                if sk is None:
                    sk = acc[kt] = QuantileSketch(k)
                sk.update(grp["_v"].to_numpy(dtype=np.float64, na_value=np.nan))
        if acc:
            yield pd.DataFrame(
                [
                    (*kt, sk.to_bytes(), sk.n)
                    for kt, sk in acc.items()
                ],
                columns=gcols + ["q_sketch", "n_points"],
            )

    partial_df = slim.mapInPandas(partials, part_schema)
    return _merge_qsketches(partial_df, gcols, part_schema)


def _merge_qsketches(tier: DataFrame, gcols: list, schema: str) -> DataFrame:
    """Hash-shuffle on the group keys, then ONE mapInPandas call per
    shuffle partition that dict-merges every group it holds.  The
    obvious ``groupBy().applyInPandas`` spelling invokes Python once
    PER GROUP (one Arrow round-trip each) — measured 3-4x the whole
    query's wall at sf0.1's 3,600 hourly groups.  ``repartition(gcols)``
    gives the same all-blobs-of-a-key-in-one-task guarantee with
    O(shuffle partitions) Python calls instead of O(groups); executor
    memory holds one ~4 KB sketch per live group per task, the same
    contract as the partials phase."""
    import pandas as pd

    from repurpose_spark.functions.qsketch import QuantileSketch

    def merge_partition(batches):
        acc: dict[tuple, QuantileSketch] = {}
        npts: dict[tuple, int] = {}
        for pdf in batches:
            for key, grp in pdf.groupby(gcols, dropna=False, sort=False):
                kt = tuple(key) if isinstance(key, tuple) else (key,)
                sk = acc.get(kt)
                for b in grp["q_sketch"]:
                    other = QuantileSketch.from_bytes(bytes(b))
                    if sk is None:
                        sk = other
                    else:
                        sk.merge(other)
                acc[kt] = sk
                npts[kt] = npts.get(kt, 0) + int(grp["n_points"].sum())
        if acc:
            yield pd.DataFrame(
                [(*kt, sk.to_bytes(), npts[kt]) for kt, sk in acc.items()],
                columns=gcols + ["q_sketch", "n_points"],
            )

    return tier.repartition(*gcols).mapInPandas(merge_partition, schema)


def rollup_qsketch_from_partials(
    tier: DataFrame,
    unit: str,
    key_cols: list = ("cell_id",),
    tick_col: str = "tick",
) -> DataFrame:
    """Coarser percentile tier from finer sketches — merge is sample-
    and weight-preserving, so the daily sketch equals (within rank
    error) a sketch built directly on the day's raw."""
    key_cols = list(key_cols)
    coarse = tier.select(
        *key_cols,
        F.date_trunc(unit, F.col(tick_col)).alias("tick"),
        "q_sketch",
        "n_points",
    )
    gcols = key_cols + ["tick"]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in coarse.schema.fields
        if f.name not in ("q_sketch", "n_points")
    ) + ", q_sketch binary, n_points long"
    return _merge_qsketches(coarse, gcols, schema)


def quantile_rows(
    tier: DataFrame, qs: dict | None = None
) -> DataFrame:
    """Long-form read-time estimates: one row per (keys, tick, q label).
    ``qs`` maps label → quantile, default {'p50': .5, 'p90': .9,
    'p99': .99}.  Labels are strings so exact-column alignment never
    trips on float bit patterns."""
    import pandas as pd

    from repurpose_spark.functions.qsketch import QuantileSketch

    if qs is None:
        qs = {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    labels = list(qs)
    probs = [qs[c] for c in labels]
    passthrough = [
        f.name for f in tier.schema.fields
        if f.name not in ("q_sketch",)
    ]
    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in tier.schema.fields
        if f.name != "q_sketch"
    ) + ", q string, value_est double"

    def fn(batches):
        for pdf in batches:
            outs = []
            vals = np.empty((len(pdf), len(probs)))
            for i, b in enumerate(pdf["q_sketch"]):
                vals[i] = QuantileSketch.from_bytes(bytes(b)).quantiles(probs)
            for j, lab in enumerate(labels):
                out = pdf[passthrough].copy()
                out["q"] = lab
                out["value_est"] = vals[:, j]
                outs.append(out)
            yield pd.concat(outs, ignore_index=True)

    return tier.mapInPandas(fn, schema)
