"""Retention: expire finer-tier data beyond its horizon.

The reference has no retention (netCDF files accumulate forever); ours is
the TimescaleDB-style policy implied by the tier design — raw beyond the
hourly horizon is dropped, hourly beyond the daily horizon, etc.  The
coarser tier already holds the aggregates, so expiry loses nothing the
policy promised to keep.

With Iceberg this is a metadata-only ``DELETE WHERE tick < horizon`` on a
day-partitioned table (partition drop + snapshot expiry); the Parquet twin
rewrites the table filtered — same semantics, and the lineage sidecar
records rows kept/dropped either way.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from repurpose_spark.sources.tables import Warehouse


def expire_tier(
    wh: Warehouse,
    table: str,
    horizon_tick,
    tick_col: str = "tick",
    partition_by: list | None = None,
) -> dict:
    """Drop rows with tick < horizon_tick; returns kept/dropped counts."""
    df = wh.read(table)
    keep = df.where(F.col(tick_col) >= F.lit(horizon_tick))
    n_keep = keep.count()
    n_total = df.count()
    # Parquet has no in-place delete: stage the kept rows, swap directories.
    # (Iceberg backend: wh would issue DELETE WHERE — metadata-only when
    # the predicate aligns with day partitions.)
    staged = f"{table}__staged"
    wh.write(keep, staged, partition_by=partition_by)
    import os
    import shutil

    live_data = wh.path(table)
    shutil.rmtree(live_data)
    os.rename(wh.path(staged), live_data)
    shutil.rmtree(os.path.dirname(wh.path(staged)), ignore_errors=True)
    metrics = {
        "op": "expire",
        "horizon": str(horizon_tick),
        "n_kept": n_keep,
        "n_dropped": n_total - n_keep,
    }
    wh._commit(table, "expire", metrics)
    return metrics
