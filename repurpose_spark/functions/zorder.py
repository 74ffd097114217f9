"""Z-order (Morton) clustering key for multi-dimensional data skipping.

The tier layout already handles the PRIMARY access path (cell partition
+ tick range: hive pruning + ``compact(sort_by=['tick'])`` row-group
stats).  A SECONDARY predicate — e.g. ``doc_id`` range within a cell, or
(user, hour) point lookups on the events table — sees full-span min/max
on every row group once rows are sorted by the first column alone.
Z-ordering interleaves the bits of several normalized columns so rows
close in the Morton curve are close in EVERY dimension: each parquet row
group then covers a small hyper-rectangle and min/max stats prune range
predicates on ANY of the clustered columns (the lakehouse
``OPTIMIZE ... ZORDER BY`` maintenance move, same public technique —
Morton 1966).

Pure JVM expressions (bit arithmetic only, no UDF); bounds come from ONE
1-row aggregate.  Use with compaction::

    from repurpose_spark.functions.zorder import zorder_sort_key
    key = zorder_sort_key(wh.read(t), ["doc_id_bucket", "tick_hour"])
    compact_table(wh, t, sort_by=[key])
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_sort_key(
    df: DataFrame, cols: list, bits: int = 12
) -> Column:
    """Morton key over ``cols`` with literal min/max bounds.

    One 1-row aggregate fixes each column's [lo, hi]; each value maps to
    a ``bits``-wide integer rank, and ranks interleave bit-by-bit into a
    single long (``bits × len(cols)`` must stay ≤ 63).  Constant columns
    (hi == lo) contribute rank 0.  The returned Column is self-contained
    (bounds are literals), so it can be passed straight to
    ``sortWithinPartitions`` / ``compact_table(sort_by=[...])`` without
    materializing a helper column.
    """
    if bits * len(cols) > 63:
        raise ValueError("bits * len(cols) must be <= 63")
    exprs = []
    for c in cols:
        col = F.col(c) if isinstance(c, str) else c
        exprs += [
            F.min(col.cast("double")),
            F.max(col.cast("double")),
        ]
    row = df.agg(*exprs).collect()[0]
    top = (1 << bits) - 1
    ranks = []
    for i, c in enumerate(cols):
        col = (F.col(c) if isinstance(c, str) else c).cast("double")
        lo, hi = float(row[2 * i] or 0.0), float(row[2 * i + 1] or 0.0)
        if hi <= lo:
            ranks.append(F.lit(0).cast("long"))
            continue
        r = ((col - F.lit(lo)) / F.lit(hi - lo)) * F.lit(float(top))
        r = F.least(
            F.greatest(r, F.lit(0.0)), F.lit(float(top))
        ).cast("long")
        ranks.append(r)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * len(ranks) + i)
            )
    return key.alias("__zorder")
