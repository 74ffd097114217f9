"""Pure-stdlib AVI/MJPEG codec (struct + numpy only — no media libs).

AVI is the first REAL **video** container the engine decodes: until now
``sample_frames`` read real animated GIFs and the synthetic FAKV
fixture, but nothing a camera or ffmpeg would emit.  Motion-JPEG-in-AVI
is the classic capture format — a RIFF chunk tree whose ``movi`` list
carries one complete baseline-JPEG image per ``00dc`` chunk — so the
whole decode path composes from two things the repo already has: a RIFF
walker (the WAV parser in ``multimodal.py`` reads the same chunk
grammar) and the round-4/5 baseline JPEG codec (``jpegcodec.py``).
Reference analog: the reference treats the codec boundary as an
exchangeable I/O layer over real containers (ts2img.py:413-419); here
the same boundary gains a genuine video format.

Supported on decode: RIFF-AVI with a single ``vids`` stream, ``00dc`` /
``00db`` movi chunks (JPEG payloads), ``rec `` sub-lists, and the
optional ``idx1`` index (ignored — chunks are walked directly, which
also reads index-less/streamed files).  Multi-stream files and non-MJPG
compression raise ``NotImplementedError`` — the same
typed-unsupported-branch policy as Adam7 PNG and interlaced GIF.

The encoder writes a spec-shaped file (hdrl with avih + strl/strh/strf
BITMAPINFOHEADER 'MJPG', movi, idx1) so round-trip tests exercise the
parser against real header plumbing, not a minimal happy path.
"""

from __future__ import annotations

import struct

import numpy as np

from . import jpegcodec

AVI_RIFF = b"RIFF"
AVI_FOURCC = b"AVI "


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """One RIFF chunk: fourcc | u32 size | payload | pad-to-even."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_avi_mjpeg(
    frames: list[np.ndarray],
    fps: int = 10,
    quality: int = 90,
    subsampling: str = "444",
) -> bytes:
    """(h, w, 3) or (h, w) uint8 frames (uniform shape) → AVI bytes with
    one baseline JPEG per ``00dc`` chunk, plus a well-formed idx1."""
    if not frames:
        raise ValueError("encode_avi_mjpeg wants at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one (h, w)")

    jpegs = [
        jpegcodec.encode_jpeg(f, quality=quality, subsampling=subsampling)
        for f in frames
    ]
    max_bytes = max(len(j) for j in jpegs)

    # MainAVIHeader (56 bytes). Flags: 0x10 = AVIF_HASINDEX.
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,   # dwMaxBytesPerSec
        0,                 # dwPaddingGranularity
        0x10,              # dwFlags
        len(frames),       # dwTotalFrames
        0,                 # dwInitialFrames
        1,                 # dwStreams
        max_bytes,         # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,  # width, height, reserved[4]
    )
    # AVIStreamHeader (56 bytes)
    strh = (
        b"vids" + b"MJPG"
        + struct.pack(
            "<10I4H",
            0, 0, 0,            # flags, prio+lang, initial frames
            1, fps,             # scale, rate → fps frames/sec
            0, len(frames), max_bytes,
            0xFFFFFFFF, 0,      # quality (-1 = default), sample size
            0, 0, w, h,         # rcFrame
        )
    )
    # BITMAPINFOHEADER (40 bytes), biCompression = 'MJPG'
    strf = struct.pack(
        "<I2i2H", 40, w, h, 1, 24
    ) + b"MJPG" + struct.pack("<I4i", w * h * 3, 0, 0, 0, 0)

    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpegs)
    movi = _list(b"movi", movi_payload)

    # idx1: offsets are relative to the start of the movi list fourcc
    # (the common convention), one AVIINDEXENTRY per frame chunk.
    idx = bytearray()
    off = 4  # past the 'movi' fourcc
    for j in jpegs:
        idx += b"00dc" + struct.pack("<3I", 0x10, off, len(j))
        off += 8 + len(j) + (len(j) % 2)
    body = AVI_FOURCC + hdrl + movi + _chunk(b"idx1", bytes(idx))
    return AVI_RIFF + struct.pack("<I", len(body)) + body


def is_avi(buf: bytes) -> bool:
    return buf[:4] == AVI_RIFF and buf[8:12] == AVI_FOURCC


def _walk(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) over a chunk span."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        yield fourcc, pos + 8, size
        pos += 8 + size + (size % 2)


def decode_avi_frames(buf: bytes) -> tuple[int, int, list[np.ndarray]]:
    """AVI bytes → (w, h, [(h, w[, c]) uint8 frames]).  Walks the chunk
    tree directly (no idx1 dependency); validates the stream really is
    MJPEG and single-stream before touching entropy-coded data."""
    if not is_avi(buf):
        raise ValueError("not a RIFF-AVI signature")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    end = min(len(buf), 8 + riff_size)

    w = h = None
    frames: list[np.ndarray] = []

    def scan_movi(start: int, stop: int) -> None:
        for fcc, p, sz in _walk(buf, start, stop):
            if fcc == b"LIST" and buf[p : p + 4] == b"rec ":
                scan_movi(p + 4, p + sz)
            elif fcc[2:4] in (b"dc", b"db"):
                payload = buf[p : p + sz]
                if payload[:2] != jpegcodec.JPEG_SOI:
                    raise NotImplementedError(
                        "non-JPEG frame chunk: only MJPEG AVI decodes here"
                    )
                fw, fh, _c, arr = jpegcodec.decode_jpeg(payload)
                frames.append(arr)

    for fcc, p, sz in _walk(buf, 12, end):
        if fcc != b"LIST":
            continue
        kind = buf[p : p + 4]
        if kind == b"hdrl":
            n_streams = 0
            for f2, p2, s2 in _walk(buf, p + 4, p + sz):
                if f2 == b"avih":
                    w, h = struct.unpack_from("<2I", buf, p2 + 32)
                elif f2 == b"LIST" and buf[p2 : p2 + 4] == b"strl":
                    n_streams += 1
                    for f3, p3, s3 in _walk(buf, p2 + 4, p2 + s2):
                        if f3 == b"strh":
                            if buf[p3 : p3 + 4] != b"vids":
                                raise NotImplementedError(
                                    "non-video AVI stream unsupported"
                                )
                        elif f3 == b"strf":
                            comp = buf[p3 + 16 : p3 + 20]
                            if comp not in (b"MJPG", b"mjpg"):
                                raise NotImplementedError(
                                    f"AVI compression {comp!r}: only MJPG"
                                )
            if n_streams != 1:
                raise NotImplementedError("multi-stream AVI unsupported")
        elif kind == b"movi":
            scan_movi(p + 4, p + sz)

    if w is None or not frames:
        raise ValueError("AVI without hdrl/movi frames")
    fh, fw = frames[0].shape[:2]
    if (fw, fh) != (w, h):
        raise ValueError(
            f"hdrl says {w}x{h} but frame 0 decodes {fw}x{fh}"
        )
    return int(w), int(h), frames
