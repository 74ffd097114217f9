"""Batch sessionization: gap-split sessions as a window composition.

The batch twin of ``streaming/stateful.py::stateful_sessionize`` (and
the exact-SQL-expressible one): consecutive points of a series belong
to one session until the series goes quiet for ``gap``.  Classic
two-window shape — a lag marks session STARTS (gap exceeded or first
point), a running sum of start flags numbers the sessions, then one
aggregation per (key, session) emits (start, end, n_points, sum_v).

Scale: one exchange on the series keys + an in-partition sort on the
timestamp; the flag/cumsum/agg all reuse that clustering (Catalyst
plans a single Exchange for the two windows and the final groupBy —
the session id is a function of the same partitioning).  This is also
the CERTIFICATION path for the streaming operator: identical output
frames on identical input, test-enforced, which upgrades the streaming
sessionizer from hand-built expectations to cross-validated semantics.

Reference analog: per-cell series chunking + ``t_max_delta``
(stack.py:240-261) — the max-gap statistic is the degenerate
one-session case of this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    points: DataFrame,
    gap: str = "30 minutes",
    key_cols: list = ("doc_id",),
    ts_col: str = "ts",
    value_col: str = "token",
) -> DataFrame:
    """points → one row per closed session:
    (keys…, session_start, session_end, n_points, sum_v)."""
    key_cols = list(key_cols)
    n, unit = gap.split()
    secs = {"second": 1, "minute": 60, "hour": 3600}[unit.rstrip("s")]
    gap_s = int(n) * secs

    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    # double-cast via timestamp: NTZ parquet columns don't cast to
    # double directly (same gotcha as collocate.py:184)
    t = F.col(ts_col).cast("timestamp").cast("double")
    prev_t = F.lag(t).over(w)
    is_start = F.when(
        prev_t.isNull() | ((t - prev_t) > gap_s), F.lit(1)
    ).otherwise(F.lit(0))
    run = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        points.withColumn("_sid", F.sum(is_start).over(run))
        .groupBy(*key_cols, "_sid")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(value_col).alias("n_points"),
            F.sum(value_col).alias("sum_v"),
        )
        .drop("_sid")
    )
