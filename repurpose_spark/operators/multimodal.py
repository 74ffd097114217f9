"""Multimodal columns: image/audio/video as opaque ``binary`` + metadata.

Real training-data pipelines carry media as binary columns and run
decode / feature-extraction / resize / frame-sampling as Arrow-batched
python stages.  Two REAL public containers decode here with stdlib +
numpy only (no media libraries): uncompressed **BMP** (24/32-bit BI_RGB,
the Windows DIB format) through the raster path, and PCM **WAV**
(RIFF/WAVE via the stdlib ``wave`` module) through :func:`decode_audio`.
Compressed formats (jpeg/png/mp3/…) need codec libraries that are NOT in
this container, so those branches raise ``NotImplementedError`` — the
deterministic `FAKE` raster/`FAKV` video formats below cover synthetic
fixtures.  Everything Spark-side is real and tested either way: schemas,
``mapInPandas`` batch iteration, multi-row emission (frame sampling),
partition behavior, and the binary⇄numpy boundary.

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


def encode_bmp(arr: np.ndarray) -> bytes:
    """RGB (h, w, 3) uint8 → uncompressed 24-bit BMP (BITMAPINFOHEADER,
    bottom-up rows, 4-byte row padding) — the standard Windows DIB
    layout, writable/readable with stdlib struct only."""
    h, w, c = arr.shape
    if c != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_bmp wants (h, w, 3) uint8 RGB")
    row_size = (3 * w + 3) // 4 * 4
    img_size = row_size * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    rows = np.zeros((h, row_size), dtype=np.uint8)
    # bottom-up, BGR channel order
    rows[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)
    return header + rows.tobytes()


def _decode_bmp(buf: bytes):
    """Uncompressed BI_RGB BMP (24- or 32-bit, BITMAPINFOHEADER or
    larger) → (w, h, 3, RGB uint8 array).  Raises on compressed or
    palette BMPs — those need real codec tables."""
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size = struct.unpack_from("<I", buf, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h_raw = struct.unpack_from("<ii", buf, 18)
    bits, comp = struct.unpack_from("<H", buf, 28)[0], struct.unpack_from(
        "<I", buf, 30
    )[0]
    if comp != 0 or bits not in (24, 32):
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP decodes here "
            f"(bits={bits}, compression={comp})"
        )
    h = abs(h_raw)
    bpp = bits // 8
    row_size = (bpp * w + 3) // 4 * 4
    need = data_off + row_size * h
    if len(buf) < need:
        raise ValueError(f"truncated BMP pixel data ({len(buf)} < {need})")
    rows = np.frombuffer(
        buf, dtype=np.uint8, offset=data_off, count=row_size * h
    ).reshape(h, row_size)
    px = rows[:, : bpp * w].reshape(h, w, bpp)
    if h_raw > 0:  # bottom-up (the common case)
        px = px[::-1]
    rgb = px[:, :, 2::-1]  # BGR(A) → RGB, alpha dropped
    return w, h, 3, np.ascontiguousarray(rgb)


def _decode_raster(buf: bytes):
    """→ (w, h, c, np.uint8 array).  Dispatch: FAKE (synthetic fixture)
    or real uncompressed BMP; jpeg/png hooks would slot in here (PIL /
    turbojpeg) — the rest of the pipeline is unchanged."""
    if buf[:2] == b"BM":
        return _decode_bmp(buf)
    if buf[:4] != MAGIC_IMG:
        raise NotImplementedError(
            "compressed image codecs are not available in this "
            "environment; FAKE rasters and uncompressed BMP decode"
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
                elif kind == "audio":
                    # real PCM WAV container; the waveform is the
                    # closed-form integer family (not a sine: libm sin
                    # differs across engines at 1 ulp, which could flip
                    # an int16 truncation and break the DuckDB oracle)
                    t = np.arange(400 + 100 * (i % 4), dtype=np.int64)
                    blob = encode_wav(
                        ((i * 31 + t * 7) % 32003 - 16001).astype("<i2"),
                        16000, 1,
                    )
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


AUDIO_SCHEMA = (
    "doc_id string, n_samples long, sample_rate int, channels int, "
    "sample_width int, n_bytes long, rms double"
)
AUDIO_SCHEMA_SAFE = AUDIO_SCHEMA + ", error string"


def encode_wav(
    samples: np.ndarray, sample_rate: int = 16000, channels: int = 1
) -> bytes:
    """int16 PCM samples (interleaved if multi-channel) → RIFF/WAVE
    bytes via the stdlib ``wave`` module."""
    import io
    import wave

    bio = io.BytesIO()
    with wave.open(bio, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return bio.getvalue()


def _decode_wav(buf: bytes):
    """PCM RIFF/WAVE → (n_frames, rate, channels, sample_width,
    float64 array normalized to [-1, 1])."""
    import io
    import wave

    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise NotImplementedError(
            "compressed audio codecs are not available in this "
            "environment; PCM WAV decodes"
        )
    with wave.open(io.BytesIO(buf), "rb") as w:
        n, rate, ch, sw = (
            w.getnframes(), w.getframerate(), w.getnchannels(),
            w.getsampwidth(),
        )
        raw = w.readframes(n)
    if sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"sample width {sw} not supported")
    return n, rate, ch, sw, x


def decode_audio(
    df: DataFrame, media_col: str = "media", ignore_errors: bool = False
) -> DataFrame:
    """Per-clip audio stats via mapInPandas — the audio twin of
    :func:`decode_media`, same Arrow-batched shape and the same
    status-row error isolation (``ignore_errors``)."""
    cols = [
        "doc_id", "n_samples", "sample_rate", "channels", "sample_width",
        "n_bytes", "rms",
    ]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, buf in zip(pdf["doc_id"], pdf[media_col]):
                try:
                    n, rate, ch, sw, x = _decode_wav(bytes(buf))
                    row = (
                        doc_id, n, rate, ch, sw, len(buf),
                        float(np.sqrt((x * x).mean())) if len(x) else 0.0,
                    )
                except Exception as ex:  # noqa: BLE001
                    if not ignore_errors:
                        raise
                    row = (doc_id, None, None, None, None, len(buf), None)
                    out.append((*row, f"{type(ex).__name__}: {ex}"[:200]))
                    continue
                out.append((*row, None) if ignore_errors else row)
            yield pd.DataFrame(
                out, columns=cols + (["error"] if ignore_errors else [])
            )

    return df.mapInPandas(
        fn, AUDIO_SCHEMA_SAFE if ignore_errors else AUDIO_SCHEMA
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
