"""Ordered-funnel and retention-cohort analytics over the events stream.

The rollup/sessionize family aggregates WITHIN a key's timeline; these
two answer the cross-stage questions product pipelines ask of the same
table (reference analog: repurpose's per-location collocated time axis,
src/repurpose/ts2img.py as-of semantics — "the first matching event at
or after t" is exactly the funnel step predicate).

* ``funnel_counts`` — strictly-ordered k-step funnel: a user reaches
  step i when their earliest step-i event STRICTLY AFTER their step-
  (i−1) anchor exists (classic first-touch attribution).  k−1 chained
  min-aggregate joins, each on the user key — and every side is the
  per-user FIRST-event frame (one row per user), so after the first
  partial+final aggregate nothing user-sized ever reshuffles: the plan
  is k tiny hash joins on already-aggregated frames.
* ``retention_cohorts`` — first-activity-day cohorts × day offset:
  one aggregate anchors each user's cohort day, one join tags every
  event with its offset, one distinct-count per (cohort, offset).

Determinism: both operators compare and count TIMESTAMPS and int64
day indices only — no float arithmetic anywhere, so the DuckDB twin
certifies byte-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    df: DataFrame,
    steps: list | tuple,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Count users reaching each funnel stage in strict order: one row
    per (step, step_name) with n_users (monotonically non-increasing by
    construction).  Fully distributed — the per-stage user frames union
    and aggregate in one plan, no driver-side counting."""
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("a funnel needs at least two steps")
    cur = (
        df.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t"))
    )
    out = cur.select(
        F.lit(1).alias("step"), F.lit(steps[0]).alias("step_name"), user_col
    )
    for i in range(1, len(steps)):
        cur = (
            df.where(F.col(type_col) == steps[i])
            .join(cur.select(user_col, "t"), user_col)
            .where(F.col(ts_col) > F.col("t"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias("t"))
        )
        out = out.unionByName(
            cur.select(
                F.lit(i + 1).alias("step"),
                F.lit(steps[i]).alias("step_name"),
                user_col,
            )
        )
    return out.groupBy("step", "step_name").agg(
        F.count("*").alias("n_users")
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Classic retention triangle: cohort = each user's first-activity
    day (epoch-day int64), offset = active-day − cohort-day; one row
    per (cohort_day, day_offset) with the distinct active users.
    Offset 0 is the cohort size.  ``max_offset`` prunes the tail."""
    day = F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(86400)).cast(
        "long"
    )
    acts = df.select(F.col(user_col).alias("u"), day.alias("d")).distinct()
    first = acts.groupBy("u").agg(F.min("d").alias("d0"))
    tagged = acts.join(first, "u").select(
        F.col("d0").alias("cohort_day"),
        (F.col("d") - F.col("d0")).alias("day_offset"),
        "u",
    )
    if max_offset is not None:
        tagged = tagged.where(F.col("day_offset") <= max_offset)
    return tagged.groupBy("cohort_day", "day_offset").agg(
        F.count("*").alias("n_users")
    )


def last_touch(
    df: DataFrame,
    conv_type: str,
    touch_type: str,
    horizon_s: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tie_cols: list | tuple = (),
) -> DataFrame:
    """Last-touch conversion attribution: for every ``conv_type`` event,
    the user's most recent STRICTLY-PRIOR ``touch_type`` event and
    whether it falls inside the attribution window — the dual of
    ``funnel_counts``' first-touch ordering and the classic marketing /
    abuse-forensics question ("which click gets credit for this
    purchase", "what did this account do right before the error").

    One window per user: the running ``MAX`` of touch timestamps over
    strictly-preceding rows IS the latest prior touch (the stream is
    ts-ordered, and MAX skips the non-touch rows' NULLs by SQL
    semantics — no IGNORE NULLS dialect divergence between engines).
    Gap is exact integer seconds; attribution is an integer predicate —
    byte-stable, certified EXACT, including the NULL rows for
    conversions with no prior touch.  ONE corpus exchange on the user
    key, one sort; the conversion filter prunes after the window.

    Returns (user_col, ts, tie…, last_touch_ts, gap_s, attributed):
    one row per conversion event; ``attributed`` false when no touch
    precedes it or the latest one is older than ``horizon_s``.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, *tie_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_ts = F.max(
        F.when(F.col(type_col) == touch_type, F.col(ts_col))
    ).over(w)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.col("last_touch_ts")
    )
    return (
        df.select(user_col, ts_col, type_col, *tie_cols)
        .withColumn("last_touch_ts", touch_ts)
        .where(F.col(type_col) == conv_type)
        .withColumn("gap_s", gap)
        .withColumn(
            "attributed",
            F.coalesce(F.col("gap_s") <= F.lit(int(horizon_s)), F.lit(False)),
        )
        .select(
            user_col, ts_col, *tie_cols, "last_touch_ts", "gap_s", "attributed"
        )
    )
