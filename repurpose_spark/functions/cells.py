"""Cell / salt key expressions.

The reference buckets points into 5-degree grid cells as its unit of
partitioning, parallelism and output files (img2ts.py:242-249, stack.py:66,
ts2img.py:367-369).  Our analog is a stable hash bucket of the series key:
``cell_id = pmod(xxhash64(doc_id), n_cells)`` — pure JVM expressions, fully
codegen'd, deterministic across runs/partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cell_id_expr(key: str | Column = "doc_id", n_cells: int = 64) -> Column:
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c), F.lit(n_cells)).cast("int")


def salt_expr(key: str | Column = "doc_id", buckets: int = 8) -> Column:
    """Secondary deterministic bucket used to split a hot cell.

    Uses a different seed path (hash of key+marker) so salt is independent
    of cell_id."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(c, F.lit("salt")), F.lit(buckets)).cast("int")
