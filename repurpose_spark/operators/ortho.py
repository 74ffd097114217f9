"""OrthoMultiTs dense layout: per-cell shared time axis, aligned arrays.

The reference's orthogonal layout stores, per cell, ONE timestamp vector
shared by every location plus a dense [location, time] matrix per
variable (img2ts.py:68-76, :296-301; written 2-D in _write_orthogonal
img2ts.py:436-501).  Relationally that is:

1. the cell's tick domain  = sorted distinct ticks in the cell,
2. per series, a value array *aligned* to that domain (NULL where the
   series has no observation — the dense-cube fill, stack.py:222-226).

Implemented as: per-cell domain agg → explode to (cell, doc, tick) frame
via the series' own key set × domain → left join obs → sorted
collect_list.  All JVM built-ins; the alignment join shuffles on
(cell, doc) which the tier tables are already partitioned by.

``ortho_to_long`` is the exact inverse (explode + drop fills), mirroring
IndexedRaggedTs ragged flattening (img2ts.py:531-536).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ortho_layout(
    tier: DataFrame,
    key_cols: list = ("cell_id", "doc_id"),
    cell_col: str = "cell_id",
    tick_col: str = "tick",
    value_col: str = "sum_v",
) -> DataFrame:
    """Long tier table → one row per series with a value array aligned to
    the cell's shared tick domain.

    Output: (*key_cols, ticks array<...>, values array<...>) where
    ticks is identical for every series of a cell."""
    key_cols = list(key_cols)
    domain = (
        tier.groupBy(cell_col)
        .agg(F.sort_array(F.collect_set(tick_col)).alias("__ticks"))
    )
    # per-series observation map tick→value (sorted struct list)
    per_series = tier.groupBy(*key_cols).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(tick_col, value_col)))
        ).alias("__m")
    )
    joined = per_series.join(domain, cell_col)
    return joined.select(
        *key_cols,
        F.col("__ticks").alias("ticks"),
        F.transform(
            "__ticks", lambda t: F.element_at("__m", t)
        ).alias("values"),
    )


def ortho_to_long(
    ortho: DataFrame,
    key_cols: list = ("cell_id", "doc_id"),
    tick_col: str = "tick",
    value_col: str = "sum_v",
    keep_fills: bool = False,
) -> DataFrame:
    """Inverse: aligned arrays back to the long (ragged) layout; fill
    slots (NULL values) are dropped unless keep_fills."""
    key_cols = list(key_cols)
    out = ortho.select(
        *key_cols,
        F.explode(F.arrays_zip("ticks", "values")).alias("z"),
    ).select(
        *key_cols,
        F.col("z.ticks").alias(tick_col),
        F.col("z.values").alias(value_col),
    )
    if not keep_fills:
        out = out.where(F.col(value_col).isNotNull())
    return out
