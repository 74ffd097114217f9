"""Per-variable physical encoding: scale_factor / add_offset int packing.

The reference packs float variables into small integers per variable
(``ts_dtypes`` + ``scale_factor``/``add_offset`` attrs,
ts2img.py:333-340): stored = round((value - add_offset) / scale_factor),
restored = stored * scale_factor + add_offset — the classic netCDF/CF
lossy packing, bounded error scale_factor/2.

Here the packed integers are ordinary int columns, so they compose with
the Gorilla delta-of-delta int stream (functions/gorilla.py) — a float
column quantized to ints typically DoD-compresses far better than the
XOR float path because neighboring values land on a shared grid.

All pure JVM expressions; a sentinel (``fill_int``) round-trips NULLs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def quantize(
    col: str | Column,
    scale_factor: float,
    add_offset: float = 0.0,
    fill_int: int | None = None,
) -> Column:
    """value → round((value - add_offset) / scale_factor) as long.

    NULL → ``fill_int`` (stays NULL when not given), mirroring the
    reference's _FillValue attribute."""
    c = F.col(col) if isinstance(col, str) else col
    q = F.round(
        (c.cast("double") - F.lit(float(add_offset))) / F.lit(float(scale_factor))
    ).cast("long")
    if fill_int is not None:
        q = F.coalesce(q, F.lit(int(fill_int)))
    return q


def dequantize(
    col: str | Column,
    scale_factor: float,
    add_offset: float = 0.0,
    fill_int: int | None = None,
) -> Column:
    """stored → stored * scale_factor + add_offset as double (the CF
    unpacking formula); ``fill_int`` maps back to NULL."""
    c = F.col(col) if isinstance(col, str) else col
    if fill_int is not None:
        c = F.when(c == int(fill_int), F.lit(None).cast("long")).otherwise(c)
    return c.cast("double") * F.lit(float(scale_factor)) + F.lit(
        float(add_offset)
    )
