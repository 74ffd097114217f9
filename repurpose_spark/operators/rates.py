"""Counter/gauge analytics: reset-aware increase and time-weighted avg.

Two classic time-series aggregates the plain rollup family can't
express (both are ORDER-dependent within a series, not commutative
folds):

* ``counter_increase`` — PromQL ``increase()`` semantics: a
  monotonically increasing counter (bytes written, rows ingested)
  emits samples; its per-bucket increase is the sum of positive deltas,
  and a DECREASE between consecutive samples is a counter reset (the
  process restarted), contributing the post-reset value rather than a
  negative delta.
* ``time_weighted_avg`` — TimescaleDB ``time_weight('Linear')``: for
  irregularly sampled gauges, the arithmetic mean overweights bursts;
  the trapezoidal integral between consecutive samples divided by the
  covered span is the honest per-bucket average.

Both are pure JVM window compositions: one hash exchange on the series
keys, an in-partition sort on the timestamp, then ``lag``/``lead`` +
conditional aggregation — no UDF, no second shuffle (the final groupBy
re-uses the same key prefix).  Segment attribution rule (documented,
oracle-mirrored): a delta/segment belongs to the bucket of its LATER
sample for increases and its EARLIER sample for trapezoids, and only
segments with both endpoints in one bucket integrate (no cross-bucket
clipping) — buckets with a single sample fall back to that sample's
value for TWA.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counter_increase(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    value_col: str = "counter",
    unit: str = "day",
) -> DataFrame:
    """Per-(keys, date_trunc(unit)) reset-aware increase.

    delta_i = v_i - v_{i-1} when ≥ 0 else v_i (reset: the counter
    restarted from ~0, so the visible post-reset value is the best
    lower bound of the true increase — PromQL's rule).  The first
    sample of a series contributes nothing (no predecessor).  Deltas
    attribute to the bucket of their LATER sample."""
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    prev = F.lag(value_col).over(w)
    delta = F.when(prev.isNull(), F.lit(None)).otherwise(
        F.when(F.col(value_col) >= prev, F.col(value_col) - prev).otherwise(
            F.col(value_col)
        )
    )
    return (
        df.withColumn("_d", delta)
        .groupBy(
            *key_cols, F.date_trunc(unit, F.col(ts_col)).alias("tick")
        )
        .agg(
            F.sum("_d").alias("increase"),
            F.count("_d").alias("n_deltas"),
        )
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    value_col: str = "value",
    unit: str = "day",
    int_scale: int | None = None,
) -> DataFrame:
    """Per-(keys, date_trunc(unit)) trapezoidal time-weighted average.

    Segments between consecutive samples of one series integrate as
    (v_i + v_{i+1})/2 · (t_{i+1} − t_i), attributed to the EARLIER
    sample's bucket and only when both endpoints share that bucket.
    Buckets whose samples form no such segment (single sample) fall
    back to the plain average of their samples.

    ``int_scale``: when the values are fixed-point (e.g. 2-decimal →
    100), the whole integral runs in EXACT integer arithmetic —
    values as scaled longs, time as ``unix_micros`` — so the result is
    bit-identical regardless of partition/summation order (float sums
    are not associative; this is what makes the aggregate certifiable
    against an external engine byte-for-byte)."""
    key_cols = list(key_cols)
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    tick = F.date_trunc(unit, F.col(ts_col))
    nxt_t = F.lead(ts_col).over(w)
    same_bucket = F.date_trunc(unit, nxt_t) == tick

    if int_scale is not None:
        v = F.round(F.col(value_col) * int_scale).cast("long")
        t_us = F.unix_micros(F.col(ts_col).cast("timestamp"))
        nxt_v = F.lead(v).over(w)
        nxt_us = F.unix_micros(nxt_t.cast("timestamp"))
        seg_dt = F.when(same_bucket, nxt_us - t_us)  # long µs
        # the per-segment product (≤2·scale·max|v| × µs-gap) overflows
        # int64 for large gauges × multi-hour gaps, and Spark's default
        # non-ANSI mode would WRAP it silently — decimal(38,0) keeps the
        # integral exact (DuckDB's BIGINT product promotes to HUGEINT,
        # the same widening; both sides convert the identical integer
        # to double at the end)
        seg_area2 = F.when(
            same_bucket,
            (v + nxt_v).cast("decimal(20,0)")
            * (nxt_us - t_us).cast("decimal(18,0)"),
        )
        return (
            df.withColumn("_v", v)
            .withColumn("_dt", seg_dt)
            .withColumn("_a2", seg_area2)
            .groupBy(*key_cols, tick.alias("tick"))
            .agg(
                F.sum("_a2").alias("_sa2"),
                F.sum("_dt").alias("_st"),
                F.sum("_v").alias("_sv"),
                F.count("_v").alias("n_points"),
            )
            .select(
                *key_cols,
                "tick",
                F.when(
                    F.col("_st").isNotNull() & (F.col("_st") > 0),
                    # value·µs over µs — both already in micro units
                    (F.col("_sa2") / (2.0 * int_scale)) / F.col("_st"),
                )
                .otherwise(
                    (F.col("_sv") / float(int_scale)) / F.col("n_points")
                )
                .alias("twa"),
                "n_points",
            )
        )

    t = F.col(ts_col).cast("double")
    nxt_v = F.lead(value_col).over(w)
    seg_dt = F.when(same_bucket, nxt_t.cast("double") - t)
    seg_area = F.when(
        same_bucket,
        (F.col(value_col) + nxt_v) / 2.0 * (nxt_t.cast("double") - t),
    )
    return (
        df.withColumn("_dt", seg_dt)
        .withColumn("_area", seg_area)
        .groupBy(*key_cols, tick.alias("tick"))
        .agg(
            F.sum("_area").alias("_sa"),
            F.sum("_dt").alias("_st"),
            F.avg(value_col).alias("_plain"),
            F.count(value_col).alias("n_points"),
        )
        .select(
            *key_cols,
            "tick",
            F.when(
                F.col("_st").isNotNull() & (F.col("_st") > 0),
                F.col("_sa") / F.col("_st"),
            )
            .otherwise(F.col("_plain"))
            .alias("twa"),
            "n_points",
        )
    )


def rate_limit_admission(
    df: DataFrame,
    key_cols: list,
    ts_col: str = "ts",
    cap: int = 3600,
    refill_per_s: int = 1,
    cost: int = 3600,
    tie_cols: list | tuple = (),
    max_points: int = 100_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Token-bucket admission replay per key — "which events would a
    limiter (capacity ``cap``, ``refill_per_s`` units/sec, ``cost``
    units/event) have admitted", the traffic-policing / abuse-forensics
    question asked of an event stream after the fact.  Work in
    integer units scaled so the refill rate is integral (e.g. 1 token
    per hour ⇒ unit = 1/3600 token, cap 3600, refill 1, cost 3600).

    The bucket starts FULL; at each event (ordered by (ts, ties)):
    ``before = min(cap, after_prev + refill·gap_s)``, admitted iff
    ``before ≥ cost``, and ONLY admitted events consume.  That
    rejection feedback makes the recursion irreducibly sequential —
    no prefix-sum closed form exists (unlike CUSUM/PH, the two-sided
    clamp + conditional consumption breaks associativity) — so this is
    one of the two deliberately sequential operators (with the EWMA
    family).  Sequence-bounded by contract: rate limiting is per
    PRINCIPAL (user/API key), whose event counts are bounded by
    behavior, and ``max_points`` guards the contract like theil_sen.

    Plan shape: repartition on the key + in-partition sort by (key,
    ts, ties), then ONE streaming ``mapInPandas`` pass per partition
    that resets the four-integer state at key boundaries and carries
    it across Arrow batches — one Python loop over the partition, not
    one Arrow group per key (the per-group applyInPandas overhead at
    ~1500 keys measured 2× the entire partition-pass wall).

    All state is int64, so the per-event admission decisions and
    bucket levels are EXACT — DuckDB certifies them byte-for-byte by
    replaying the same integer recursion in a recursive CTE.  Returns
    one row per event: (keys…, ts, ties…, gap_s, bucket_before,
    admitted, bucket_after).
    """
    import pandas as pd

    key_cols = list(key_cols)
    tie_cols = list(tie_cols)
    sel = df.select(*key_cols, ts_col, *tie_cols)
    key_fields = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in sel.schema.fields
    )
    schema = (
        key_fields
        + ", gap_s bigint, bucket_before bigint, admitted boolean, "
        + "bucket_after bigint"
    )
    cap_i, refill_i, cost_i = int(cap), int(refill_per_s), int(cost)

    def fn(batches):
        # partition-scoped state, carried across Arrow batches: rows
        # arrive sorted by (keys, ts, ties), keys never span partitions
        cur_key = object()
        b = prev = npts = 0
        for pdf in batches:
            if pdf.empty:
                continue
            secs = (pdf[ts_col].astype("int64") // 1_000_000_000).tolist()
            keys = list(zip(*(pdf[k].tolist() for k in key_cols)))
            gaps, befores, admits, afters = [], [], [], []
            for kt, s in zip(keys, secs):
                if kt != cur_key:
                    cur_key, b, prev, npts = kt, cap_i, None, 0
                npts += 1
                if npts > max_points:
                    raise ValueError(
                        "rate_limit_admission: series exceeds "
                        "max_points={} — key by principal, not by "
                        "shard".format(max_points)
                    )
                g = 0 if prev is None else s - prev
                prev = s
                b = min(cap_i, b + refill_i * g)
                ok = b >= cost_i
                gaps.append(g)
                befores.append(b)
                admits.append(ok)
                if ok:
                    b -= cost_i
                afters.append(b)
            out = pdf.copy()
            out["gap_s"] = gaps
            out["bucket_before"] = befores
            out["admitted"] = admits
            out["bucket_after"] = afters
            yield out

    n_parts = num_partitions or sel.sparkSession.conf.get(
        "spark.sql.shuffle.partitions"
    )
    ordered = sel.repartition(int(n_parts), *key_cols).sortWithinPartitions(
        *key_cols, ts_col, *tie_cols
    )
    return ordered.mapInPandas(fn, schema=schema)
