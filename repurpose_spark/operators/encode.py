"""Packed per-series stream layout — the OrthoMultiTs/IndexedRaggedTs
storage analog (img2ts.py:436-640), Gorilla-compressed.

A tier table ``(cell_id, doc_id, tick, v...)`` is reshaped into one row
per series: timestamps DoD-encoded, values XOR-encoded (functions/gorilla).
The reshape is ``sort_array(collect_list(struct(tick, v)))`` — an
associative aggregation, so it is deterministic under any partitioning and
keeps map-side combine; only the final array→binary step leaves the JVM,
through one Arrow-batched pandas UDF per column.

The packed table is cell-partitioned; decode is the exact inverse and the
round-trip is bit-exact (tests/test_gorilla.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from repurpose_spark.functions.gorilla import (
    decode_float_stream,
    decode_int_stream,
    encode_float_stream,
    encode_int_stream,
)


def encode_series(
    tier: DataFrame,
    key_cols: list = ("cell_id", "doc_id"),
    tick_col: str = "tick",
    int_cols: list = (),
    float_cols: list = (),
) -> DataFrame:
    """One packed row per key: ts_bin + <col>_bin binaries + n_points."""
    key_cols = list(key_cols)
    vals = list(int_cols) + list(float_cols)
    packed = (
        tier.groupBy(*key_cols)
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col(tick_col).alias("t"), *vals))
            ).alias("s")
        )
        .select(
            *key_cols,
            F.size("s").alias("n_points"),
            encode_int_stream(F.col("s.t").cast("array<long>")).alias("ts_bin"),
            *[
                encode_int_stream(F.col(f"s.{c}").cast("array<long>")).alias(
                    f"{c}_bin"
                )
                for c in int_cols
            ],
            *[
                encode_float_stream(
                    F.col(f"s.{c}").cast("array<double>")
                ).alias(f"{c}_bin")
                for c in float_cols
            ],
        )
    )
    return packed


def decode_series(
    packed: DataFrame,
    key_cols: list = ("cell_id", "doc_id"),
    tick_col: str = "tick",
    int_cols: list = (),
    float_cols: list = (),
    tick_is_timestamp: bool = True,
) -> DataFrame:
    """Inverse of :func:`encode_series` back to long format."""
    key_cols = list(key_cols)
    df = packed.select(
        *key_cols,
        decode_int_stream("ts_bin").alias("__t"),
        *[decode_int_stream(f"{c}_bin").alias(f"__{c}") for c in int_cols],
        *[decode_float_stream(f"{c}_bin").alias(f"__{c}") for c in float_cols],
    )
    vals = list(int_cols) + list(float_cols)
    zipped = df.select(
        *key_cols,
        F.explode(F.arrays_zip("__t", *[f"__{c}" for c in vals])).alias("z"),
    )
    t = F.col("z.__t")
    return zipped.select(
        *key_cols,
        (F.timestamp_seconds(t) if tick_is_timestamp else t).alias(tick_col),
        *[F.col(f"z.__{c}").alias(c) for c in vals],
    )
