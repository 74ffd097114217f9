"""Static (time-invariant) variables attached to time-series tables.

The reference's cube supports variables without a time dimension — per-cell
metadata arrays stored alongside the time-varying ones
(stack.py:208-213: variables whose only dims are the location dims).  The
relational mapping is a dimension-table join: the static table has one row
per series key and its columns ride along every tick of that series.

Scale shape: the static side is series-keyed metadata — orders of magnitude
smaller than the points/tier fact side — so it is broadcast and the join is
map-side (no shuffle of the fact table, verified in tests by the absence of
an Exchange on the fact side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_static(
    ts: DataFrame,
    static: DataFrame,
    key_cols: list = ("doc_id",),
    how: str = "left",
    broadcast_static: bool = True,
) -> DataFrame:
    """Join time-invariant per-series columns onto a points/tier table.

    * ``static`` is expected unique per key (reference: one metadata value
      per location); a duplicate key would fan out its series' rows.
    * static column names must not collide with the time-varying ones
      (same protected-name rule as collocate, img2ts.py reserved names).
    """
    key_cols = list(key_cols)
    clash = (set(static.columns) - set(key_cols)) & set(ts.columns)
    if clash:
        raise ValueError(
            f"static columns {sorted(clash)} collide with time-series "
            "columns; rename them before attaching"
        )
    dim = static
    if broadcast_static:
        dim = F.broadcast(dim)
    return ts.join(dim, on=key_cols, how=how)


def static_from_first(
    ts: DataFrame,
    value_cols: list,
    key_cols: list = ("doc_id",),
) -> DataFrame:
    """Derive a static table from a points table: the per-key FIRST value
    of each column (deterministic min-by-tick) — the helper for promoting
    constant-per-series attributes (e.g. ``source``) into a dimension."""
    key_cols = list(key_cols)
    aggs = [F.min(c).alias(c) for c in value_cols]
    return ts.groupBy(*key_cols).agg(*aggs)
