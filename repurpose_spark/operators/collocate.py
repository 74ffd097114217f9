"""As-of time collocation (J3) — reference-exact, shuffle-minimal.

Reference semantics (stack.py:263-309): per series, the observation frame
is ``reindex``-ed onto the image tick axis with ``method='bfill',
tolerance=max-tick-gap, limit=1``.  Empirically pinned behavior (see
tests/test_collocate.py):

  * tick t is filled with ``cand = min obs_ts >= t``,
  * kept iff ``cand - t <= tolerance`` (inclusive) AND no tick lies
    strictly between t and cand (limit=1),
  * an obs sitting exactly on a tick fills that tick (delta 0) **and**
    may also backfill the previous tick (pandas exact matches do not
    consume the fill limit — one obs can land on two ticks),
  * later obs in the same slot are DISCARDED (ts2img.py:118-124),
  * emits ``timedelta_seconds = obs_ts - tick >= 0``.

Relational reformulation (proved equivalent in tests vs a pandas oracle):
every obs ``o`` generates at most two candidates —

  1. ``(tick == o, delta = 0)``             if a tick sits exactly at o,
  2. ``(tick = greatest tick < o, delta)``  if ``delta <= tolerance``,

and per ``(key, tick)`` the candidate with **minimum obs_ts** wins.  The
min is computed as ``min(struct(obs_ts, values))`` — associative, so
Catalyst keeps map-side partial aggregation and the result is independent
of partitioning (SURVEY.md §7.3 determinism).

Tick assignment never shuffles the big side: the tick axis (the image
timestamp axis — thousands of entries) is either folded into each row as a
sorted array literal scanned by codegen'd higher-order functions
(axes <= ARRAY_AXIS_MAX), or broadcast-hash-joined via tolerance-width
time bins (the classic binned range-join; each obs meets only the ticks in
two bins).  Both paths produce identical output (cross-checked in tests).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ARRAY_AXIS_MAX = 4096
TIMEDELTA_COL = "timedelta_seconds"


def _ticks_to_seconds(ticks) -> list:
    """Normalize a tick axis (datetimes / strings) to sorted epoch seconds."""
    out = []
    for t in ticks:
        if isinstance(t, str):
            t = datetime.fromisoformat(t)
        if isinstance(t, datetime):
            if t.tzinfo is None:
                import calendar

                out.append(calendar.timegm(t.timetuple()) + t.microsecond / 1e6)
            else:
                out.append(t.timestamp())
        else:
            out.append(float(t))
    out = sorted(out)
    if any(int(x) != x for x in out):
        raise ValueError("tick axis must be whole seconds")
    return [int(x) for x in out]


def max_gap_seconds(ticks_sec: list) -> int:
    """Collocation tolerance = max delta between subsequent ticks
    (t_max_delta, stack.py:240-261)."""
    if len(ticks_sec) < 2:
        raise ValueError("need >= 2 ticks to infer tolerance")
    return max(b - a for a, b in zip(ticks_sec, ticks_sec[1:]))


def _assign_via_array(obs: DataFrame, ticks_sec: list, tol: int,
                      ts_sec: Column) -> DataFrame:
    """Fold the sorted tick axis into the plan as an array literal; pick
    max tick <= obs and max tick < obs with codegen'd ``filter``/``array_max``.
    Zero joins, zero shuffles."""
    arr = F.array(*[F.lit(t) for t in ticks_sec])
    le = F.filter(arr, lambda t: t <= ts_sec)
    return (
        obs.withColumn("__max_le", F.array_max(le))
        .withColumn(
            "__max_lt",
            F.array_max(F.filter(arr, lambda t: t < ts_sec)),
        )
    )


def _assign_via_binned_join(obs: DataFrame, ticks_sec: list, tol: int,
                            ts_sec: Column, obs_cols: list) -> DataFrame:
    """Binned broadcast range join for large axes.

    Each tick is published to its own tolerance-width bin and the next one,
    so an obs in bin b meets exactly the ticks in [obs - tol, obs] via an
    equi-join on bin — a broadcast hash join, never a nested loop."""
    spark = obs.sparkSession
    width = max(tol, 1)
    ticks = spark.createDataFrame([(t,) for t in ticks_sec], "tick_sec long")
    ticks2 = ticks.select(
        "tick_sec",
        F.explode(
            F.array(
                (F.col("tick_sec") / width).cast("long"),
                (F.col("tick_sec") / width).cast("long") + 1,
            )
        ).alias("__bin"),
    )
    j = obs.withColumn("__bin", (ts_sec / width).cast("long")).join(
        F.broadcast(ticks2), "__bin"
    )
    ts2 = F.col("__ts_sec")
    return (
        j.where((F.col("tick_sec") <= ts2) & (ts2 - F.col("tick_sec") <= width))
        .groupBy(*obs_cols)
        .agg(
            F.max("tick_sec").alias("__max_le"),
            F.max(F.when(F.col("tick_sec") < ts2, F.col("tick_sec"))).alias(
                "__max_lt"
            ),
        )
    )


def collocate(
    obs: DataFrame,
    ticks,
    key_cols: list = ("doc_id",),
    ts_col: str = "obs_ts",
    tolerance_seconds: int | None = None,
    strategy: str = "auto",
) -> DataFrame:
    """Collocate observations onto a tick axis with reference semantics.

    Returns one row per filled (key, tick): key_cols + ``tick`` timestamp
    + value columns + ``timedelta_seconds``.
    """
    key_cols = list(key_cols)
    ticks_sec = _ticks_to_seconds(ticks)
    tol = tolerance_seconds if tolerance_seconds is not None else max_gap_seconds(ticks_sec)
    value_cols = [c for c in obs.columns if c not in key_cols + [ts_col]]

    # cast → fractional epoch seconds (unix_timestamp would truncate
    # sub-second offsets like the reference's 5.9999h edge case)
    src = obs.withColumn("__ts_sec", F.col(ts_col).cast("double"))
    ts_sec = F.col("__ts_sec")

    if strategy == "array" or (strategy == "auto" and len(ticks_sec) <= ARRAY_AXIS_MAX):
        assigned = _assign_via_array(src, ticks_sec, tol, ts_sec)
    else:
        assigned = _assign_via_binned_join(
            src, ticks_sec, tol, ts_sec, src.columns
        )

    # candidate 1: exact tick hit (delta 0); candidate 2: previous tick
    exact = assigned.where(F.col("__max_le") == ts_sec).select(
        *key_cols,
        F.col("__max_le").alias("__tick_sec"),
        F.lit(0).cast("double").alias(TIMEDELTA_COL),
        ts_sec.alias("__obs_sec"),
        *value_cols,
    )
    prev = (
        assigned.where(
            F.col("__max_lt").isNotNull()
            & (ts_sec - F.col("__max_lt") <= F.lit(tol))
        )
        .select(
            *key_cols,
            F.col("__max_lt").alias("__tick_sec"),
            (ts_sec - F.col("__max_lt")).cast("double").alias(TIMEDELTA_COL),
            ts_sec.alias("__obs_sec"),
            *value_cols,
        )
    )
    cands = exact.unionByName(prev)

    # first-per-slot dedup (limit=1 / "extras discarded"): min obs wins;
    # min(struct(obs_ts, ...)) is associative -> map-side partial agg.
    packed = F.struct(F.col("__obs_sec"), F.col(TIMEDELTA_COL), *value_cols)
    won = (
        cands.groupBy(*key_cols, "__tick_sec")
        .agg(F.min(packed).alias("__w"))
        .select(
            *key_cols,
            F.timestamp_seconds(F.col("__tick_sec")).alias("tick"),
            F.col(f"__w.{TIMEDELTA_COL}").alias(TIMEDELTA_COL),
            *[F.col(f"__w.{c}").alias(c) for c in value_cols],
        )
    )
    return won
