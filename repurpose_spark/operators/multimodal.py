"""Multimodal columns: image/audio/video as opaque ``binary`` + metadata.

Real training-data pipelines carry media as binary columns and run
decode / feature-extraction / resize / frame-sampling as Arrow-batched
python stages.  The image/audio libraries are NOT in this container, so
the *codec* here is a deterministic fake (`FAKE` raster format below) and
the real-library hook raises ``NotImplementedError`` — but everything
Spark-side is real and tested: schemas, ``mapInPandas`` batch iteration,
multi-row emission (frame sampling), partition behavior, and the
binary⇄numpy boundary.

FAKE raster format (little-endian):
    magic b'FAKE' | u16 width | u16 height | u8 channels | payload
    payload[j] = (seed + 7*j) % 251   (row-major, w*h*c bytes)
FAKE video format:
    magic b'FAKV' | u16 n_frames | then n_frames FAKE rasters back-to-back
    (all frames share one header geometry for simplicity)

Swap ``_decode_raster`` for PIL/turbojpeg and ``_iter_frames`` for
pyav to run on real media; signatures and schemas stay identical.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC_IMG = b"FAKE"
MAGIC_VID = b"FAKV"

DECODE_SCHEMA = (
    "doc_id string, width int, height int, channels int, "
    "n_bytes long, mean_intensity double"
)
DECODE_SCHEMA_SAFE = DECODE_SCHEMA + ", error string"
RESIZE_SCHEMA = (
    "doc_id string, out_w int, out_h int, pooled binary"
)
FRAME_SCHEMA = (
    "doc_id string, frame_idx int, width int, height int, "
    "mean_intensity double"
)


# ------------------------------------------------------------- fake codec
def encode_fake_image(seed: int, w: int, h: int, c: int = 3) -> bytes:
    payload = ((seed + 7 * np.arange(w * h * c, dtype=np.int64)) % 251).astype(
        np.uint8
    )
    return MAGIC_IMG + struct.pack("<HHB", w, h, c) + payload.tobytes()


def encode_fake_video(seed: int, w: int, h: int, n_frames: int, c: int = 3) -> bytes:
    frames = b"".join(
        encode_fake_image(seed + f, w, h, c) for f in range(n_frames)
    )
    return MAGIC_VID + struct.pack("<H", n_frames) + frames


def _decode_raster(buf: bytes):
    """→ (w, h, c, np.uint8 array).  Real-media hook: replace with
    PIL.Image.open for jpeg/png — the rest of the pipeline is unchanged."""
    if buf[:4] != MAGIC_IMG:
        raise NotImplementedError(
            "real image codecs are not available in this environment; "
            "only the FAKE raster format is decodable"
        )
    w, h, c = struct.unpack_from("<HHB", buf, 4)
    arr = np.frombuffer(buf, dtype=np.uint8, offset=9, count=w * h * c)
    return w, h, c, arr.reshape(h, w, c)


def _iter_frames(buf: bytes):
    if buf[:4] != MAGIC_VID:
        raise NotImplementedError("only the FAKV container is decodable here")
    (n,) = struct.unpack_from("<H", buf, 4)
    off = 6
    for i in range(n):
        w, h, c = struct.unpack_from("<HHB", buf, off + 4)
        end = off + 9 + w * h * c
        yield i, buf[off:end]
        off = end


# -------------------------------------------------------------- generators
def synth_media(
    spark: SparkSession, n: int, kind: str = "image",
    numPartitions: int | None = None,
) -> DataFrame:
    """Deterministic fake media table (doc_id, media binary, kind).

    Partition count is capped so tiny fixtures don't spawn one python
    worker per core for a handful of rows (blob ≈ 1 KB; target ≥ 64
    rows/partition)."""
    if numPartitions is None:
        numPartitions = max(1, min(spark.sparkContext.defaultParallelism, n // 64))
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                w, h = 16 + i % 8, 16 + (i * 3) % 8
                if kind == "image":
                    blob = encode_fake_image(i, w, h)
                else:
                    blob = encode_fake_video(i, w, h, n_frames=2 + i % 4)
                rows.append((f"doc{i:08d}", blob, kind))
            yield pd.DataFrame(rows, columns=["doc_id", "media", "kind"])

    return spark.range(0, n, 1, numPartitions).mapInPandas(
        gen, "doc_id string, media binary, kind string"
    )


# --------------------------------------------------------------- operators
def decode_media(
    df: DataFrame, media_col: str = "media", ignore_errors: bool = False
) -> DataFrame:
    """Decode + per-item stats via mapInPandas (Arrow batches).

    ``ignore_errors`` is the reference's log-and-continue semantics
    (process.py:174-199; img2ts.py:214-216): a corrupt item becomes a
    status row (``error`` column set, stats NULL) instead of failing the
    whole Spark task — real pipelines always carry undecodable media."""
    cols = [
        "doc_id", "width", "height", "channels", "n_bytes",
        "mean_intensity",
    ]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    w, h, c, arr = _decode_raster(bytes(buf))
                    row = (doc_id, w, h, c, len(buf), float(arr.mean()))
                except Exception as ex:  # noqa: BLE001
                    if not ignore_errors:
                        raise
                    row = (doc_id, None, None, None, len(buf), None)
                    out.append((*row, f"{type(ex).__name__}: {ex}"[:200]))
                    continue
                out.append((*row, None) if ignore_errors else row)
            yield pd.DataFrame(
                out, columns=cols + (["error"] if ignore_errors else [])
            )

    return df.mapInPandas(
        fn, DECODE_SCHEMA_SAFE if ignore_errors else DECODE_SCHEMA
    )


def resize_pooled(
    df: DataFrame, out_w: int = 4, out_h: int = 4, media_col: str = "media"
) -> DataFrame:
    """Block-mean resize to (out_w, out_h), grayscale, emitted as binary —
    the feature-extraction shape (decode → numpy kernel → compact bytes)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf[media_col]):
                w, h, c, arr = _decode_raster(bytes(buf))
                gray = arr.astype(np.float64).mean(axis=2)
                ys = np.linspace(0, h, out_h + 1).astype(int)
                xs = np.linspace(0, w, out_w + 1).astype(int)
                pooled = np.empty((out_h, out_w), dtype=np.uint8)
                for yi in range(out_h):
                    for xi in range(out_w):
                        pooled[yi, xi] = int(
                            gray[ys[yi]:ys[yi + 1], xs[xi]:xs[xi + 1]].mean()
                        )
                out.append((doc_id, out_w, out_h, pooled.tobytes()))
            yield pd.DataFrame(
                out, columns=["doc_id", "out_w", "out_h", "pooled"]
            )

    return df.mapInPandas(fn, RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame, every: int = 2, media_col: str = "media"
) -> DataFrame:
    """Frame sampling: one input row → one output row per kept frame
    (multi-row emission through mapInPandas)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf[media_col]):
                for idx, frame in _iter_frames(bytes(buf)):
                    if idx % every:
                        continue
                    w, h, c, arr = _decode_raster(frame)
                    out.append((doc_id, idx, w, h, float(arr.mean())))
            yield pd.DataFrame(
                out,
                columns=[
                    "doc_id", "frame_idx", "width", "height",
                    "mean_intensity",
                ],
            )

    return df.mapInPandas(fn, FRAME_SCHEMA)
