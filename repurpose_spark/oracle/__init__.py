from repurpose_spark.oracle.numpy_oracle import (
    oracle_collocate,
    oracle_rollup,
    oracle_points,
    oracle_gap_fill,
)

__all__ = [
    "oracle_collocate",
    "oracle_rollup",
    "oracle_points",
    "oracle_gap_fill",
]
