"""Image-slice export/read — the Ts2Img sink (S7/R4, SURVEY.md §2.1/§2.8).

The reference writes one netCDF per timestamp with ``{datetime}``
templated names under annual subfolders (_write_img ts2img.py:63-87,
slicing ts2img.py:493-523).  Relationally a "slice" is just the rows of
one tick, so the sink is a write partitioned by a tick-derived key:
every slice becomes its own directory, readable back with partition
pruning (``where(tick = t)`` touches exactly one directory — the
`.explain` shows PartitionFilters, never a full scan).

``slice_key`` uses an ISO-like string (safe across filesystems and
hive-metastore semantics); the original timestamp column is preserved
inside the files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SLICE_KEY = "slice_key"


def slice_key_expr(tick_col: str = "tick"):
    return F.date_format(F.col(tick_col), "yyyy-MM-dd'T'HH-mm-ss")


def export_slices(
    df: DataFrame,
    path: str,
    tick_col: str = "tick",
    mode: str = "overwrite",
    single_file_per_slice: bool = False,
) -> None:
    """Write one directory per tick.  ``single_file_per_slice`` mirrors
    the reference's one-file-per-timestamp layout (repartition by the
    slice key first — one task writes each slice); leave False at scale
    so each slice keeps normal parallel files."""
    out = df.withColumn(SLICE_KEY, slice_key_expr(tick_col))
    if single_file_per_slice:
        out = out.repartition(SLICE_KEY)
    out.write.mode(mode).partitionBy(SLICE_KEY).parquet(path)


def read_slice(spark: SparkSession, path: str, tick) -> DataFrame:
    """Partition-pruned read of one slice."""
    df = spark.read.parquet(path)
    return df.where(
        F.col(SLICE_KEY)
        == F.date_format(F.lit(tick).cast("timestamp"), "yyyy-MM-dd'T'HH-mm-ss")
    ).drop(SLICE_KEY)
