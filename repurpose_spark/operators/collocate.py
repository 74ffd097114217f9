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


def _is_regular(ticks_us: list) -> bool:
    if len(ticks_us) < 2:
        return False
    step = ticks_us[1] - ticks_us[0]
    return step > 0 and all(
        b - a == step for a, b in zip(ticks_us, ticks_us[1:])
    )


def _assign_via_arithmetic(obs: DataFrame, ticks_us: list,
                           ts_us: Column) -> DataFrame:
    """Regular axes (the common case: hour/day ticks): greatest tick <=/< obs
    is closed-form floor arithmetic — whole-stage-codegen, no lambdas, no
    joins.  ~50x faster than scanning the axis array per row."""
    t0, step = ticks_us[0], ticks_us[1] - ticks_us[0]
    t_last = ticks_us[-1]

    le = F.least(
        F.lit(t0) + F.floor((ts_us - t0) / step).cast("long") * step,
        F.lit(t_last),
    )
    max_le = F.when(ts_us >= t0, le)
    # strict: step back one tick when obs sits exactly on a tick
    lt = F.when(le == ts_us, le - step).otherwise(le)
    max_lt = F.when(ts_us > t0, F.when(lt >= t0, lt))
    return obs.withColumn("__max_le", max_le).withColumn("__max_lt", max_lt)


def _assign_via_array(obs: DataFrame, ticks_us: list, tol_us: int,
                      ts_us: Column) -> DataFrame:
    """Fold the sorted tick axis into the plan as an array literal; pick
    max tick <= obs and max tick < obs with codegen'd ``filter``/``array_max``.
    Zero joins, zero shuffles."""
    arr = F.array(*[F.lit(t) for t in ticks_us])
    le = F.filter(arr, lambda t: t <= ts_us)
    return (
        obs.withColumn("__max_le", F.array_max(le))
        .withColumn(
            "__max_lt",
            F.array_max(F.filter(arr, lambda t: t < ts_us)),
        )
    )


def _assign_via_binned_join(obs: DataFrame, ticks_us: list, tol_us: int,
                            ts_us: Column, obs_cols: list) -> DataFrame:
    """Binned broadcast range join for large axes.

    Each tick is published to its own tolerance-width bin and the next one,
    so an obs in bin b meets exactly the ticks in [obs - tol, obs] via an
    equi-join on bin — a broadcast hash join, never a nested loop."""
    spark = obs.sparkSession
    width = max(tol_us, 1)
    ticks = spark.createDataFrame([(t,) for t in ticks_us], "tick_us long")
    ticks2 = ticks.select(
        "tick_us",
        F.explode(
            F.array(
                F.floor(F.col("tick_us") / width).cast("long"),
                F.floor(F.col("tick_us") / width).cast("long") + 1,
            )
        ).alias("__bin"),
    )
    j = obs.withColumn("__bin", F.floor(ts_us / width).cast("long")).join(
        F.broadcast(ticks2), "__bin"
    )
    ts2 = F.col("__ts_us")
    return (
        j.where((F.col("tick_us") <= ts2) & (ts2 - F.col("tick_us") <= width))
        .groupBy(*obs_cols)
        .agg(
            F.max("tick_us").alias("__max_le"),
            F.max(F.when(F.col("tick_us") < ts2, F.col("tick_us"))).alias(
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
    # P6 protected-name check (ts2img.py:54-58,:159): output column names
    # the operator itself emits must not collide with input variables
    reserved = {TIMEDELTA_COL, "tick"} & set(obs.columns)
    if reserved:
        raise ValueError(
            f"input columns collide with reserved output names: {reserved}"
        )
    ticks_sec = _ticks_to_seconds(ticks)
    tol = tolerance_seconds if tolerance_seconds is not None else max_gap_seconds(ticks_sec)
    ticks_us = [t * 1_000_000 for t in ticks_sec]
    tol_us = int(tol * 1_000_000)
    value_cols = [c for c in obs.columns if c not in key_cols + [ts_col]]

    # exact integer microseconds — no float truncation/cancellation
    # (the reference's 5.9999h sub-second edge survives bit-exactly);
    # cast handles TIMESTAMP_NTZ parquet columns (session tz = UTC)
    src = obs.withColumn(
        "__ts_us", F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    ts_us = F.col("__ts_us")

    if strategy == "arithmetic" or (strategy == "auto" and _is_regular(ticks_us)):
        assigned = _assign_via_arithmetic(src, ticks_us, ts_us)
    elif strategy == "array" or (strategy == "auto" and len(ticks_us) <= ARRAY_AXIS_MAX):
        assigned = _assign_via_array(src, ticks_us, tol_us, ts_us)
    else:
        assigned = _assign_via_binned_join(
            src, ticks_us, tol_us, ts_us, src.columns
        )

    # candidate 1: exact tick hit (delta 0); candidate 2: previous tick.
    # Both candidates are emitted in ONE pass (explode of a ≤2-element
    # struct array) — the old two-filtered-branches union evaluated the
    # whole `assigned` subtree, including the caller's upstream corpus
    # aggregate, once per branch (guide §2.4).  Row multiset identical:
    # each when() contributes exactly when its branch predicate held.
    cand_arr = F.array(
        F.when(
            F.col("__max_le") == ts_us,
            F.struct(
                F.col("__max_le").alias("t"),
                F.lit(0).cast("long").alias("d"),
            ),
        ),
        F.when(
            F.col("__max_lt").isNotNull()
            & (ts_us - F.col("__max_lt") <= F.lit(tol_us)),
            F.struct(
                F.col("__max_lt").alias("t"),
                (ts_us - F.col("__max_lt")).cast("long").alias("d"),
            ),
        ),
    )
    cands = assigned.select(
        *key_cols,
        ts_us.alias("__obs_us"),
        *value_cols,
        F.explode(
            F.filter(cand_arr, lambda x: x.isNotNull())
        ).alias("__c"),
    ).select(
        *key_cols,
        F.col("__c.t").alias("__tick_us"),
        F.col("__c.d").alias("__delta_us"),
        F.col("__obs_us"),
        *value_cols,
    )

    # first-per-slot dedup (limit=1 / "extras discarded"): min obs wins;
    # min(struct(obs_ts, ...)) is associative -> map-side partial agg.
    packed = F.struct(F.col("__obs_us"), F.col("__delta_us"), *value_cols)
    won = (
        cands.groupBy(*key_cols, "__tick_us")
        .agg(F.min(packed).alias("__w"))
        .select(
            *key_cols,
            F.timestamp_micros(F.col("__tick_us")).alias("tick"),
            (F.col("__w.__delta_us") / F.lit(1_000_000.0)).alias(TIMEDELTA_COL),
            F.timestamp_micros(F.col("__w.__obs_us")).alias("obs_ts"),
            *[F.col(f"__w.{c}").alias(c) for c in value_cols],
        )
    )
    return won
