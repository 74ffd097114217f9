"""Pure-stdlib GIF89a codec (numpy + struct only — no media libraries).

GIF is the third REAL public raster container the engine decodes
(after uncompressed BMP and 8-bit PNG, `multimodal.py`), and the first
REAL **multi-frame** one: ``sample_frames`` previously only read the
synthetic FAKV fixture container.  Reference analog: the reference
reads real geo rasters through netCDF and treats the codec boundary as
an exchangeable I/O layer (ts2img.py:413-419); here the same boundary
is exercised with a genuine variable-width-LZW bitstream format.

Supported on decode: GIF87a/GIF89a, global + local color tables,
multiple image blocks (animation frames) composited onto the logical
screen, Graphic Control Extension transparency, disposal methods
0/1 (keep) and 2 (restore to background).  Interlaced images and
disposal 3 (restore-to-previous) raise ``NotImplementedError`` — the
same typed-unsupported-branch policy as Adam7 PNG.

The encoder writes real LZW (dictionary growth, code-width escalation
9→12 bits, CLEAR on table overflow), so round-trip tests exercise the
decoder's dictionary path — not just literal codes.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_SIGS = (b"GIF87a", b"GIF89a")
_MAX_CODE = 4096  # 12-bit LZW ceiling (GIF89a spec appendix F)


# ------------------------------------------------------------------ LZW
def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Color indices (flat uint8) → GIF LZW byte stream (LSB-first
    variable-width codes).  Real dictionary compression with CLEAR
    emitted on table overflow, per GIF89a appendix F."""
    clear = 1 << min_code_size
    end = clear + 1
    data = bytes(indices.astype(np.uint8).tobytes())

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    width = min_code_size + 1

    emit(clear, width)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= _MAX_CODE:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            width = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF LZW byte stream → flat uint8 index array of ``n_pixels``."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [None, None]

    out = bytearray()
    table = list(base)
    width = min_code_size + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= n:
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width

        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("GIF LZW stream starts with a dict code")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_pixels:
        raise ValueError(
            f"GIF LZW stream short ({len(out)} < {n_pixels} pixels)"
        )
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _sub_blocks(payload: bytes) -> bytes:
    """Chunk an LZW stream into ≤255-byte GIF data sub-blocks."""
    out = bytearray()
    for i in range(0, len(payload), 255):
        chunk = payload[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# -------------------------------------------------------------- encoder
def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray,
    transparent_index: int | None = None,
    min_code_size: int = 8,
) -> bytes:
    """Index frames ((h, w) uint8, all same geometry) + (n≤256, 3)
    palette → real GIF89a bytes.  Every frame is a full-canvas image
    with disposal=keep, so a decoder's compositing path is exercised
    whenever ``transparent_index`` punches holes into later frames."""
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    h, w = frames[0].shape
    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[: len(palette)] = np.asarray(palette, dtype=np.uint8)

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global color table, 8 bits/pixel, 256 entries
    out += struct.pack("<HHBBB", w, h, 0b1111_0111, 0, 0)
    out += pal.tobytes()
    for frame in frames:
        if frame.shape != (h, w):
            raise ValueError("all GIF frames must share the canvas geometry")
        if transparent_index is not None:
            # Graphic Control Extension: disposal=keep(1), transparency on
            out += struct.pack(
                "<BBBBHBB", 0x21, 0xF9, 4, (1 << 2) | 1, 0,
                transparent_index, 0,
            )
        # image descriptor: full canvas, no local table, not interlaced
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        out.append(min_code_size)
        out += _sub_blocks(_lzw_encode(frame.reshape(-1), min_code_size))
    out.append(0x3B)  # trailer
    return bytes(out)


# -------------------------------------------------------------- decoder
def _read_sub_blocks(buf: bytes, off: int) -> tuple[bytes, int]:
    chunks = []
    while True:
        if off >= len(buf):
            raise ValueError("truncated GIF sub-blocks")
        n = buf[off]
        off += 1
        if n == 0:
            return b"".join(chunks), off
        chunks.append(buf[off : off + n])
        off += n


def decode_gif_frames(buf: bytes) -> tuple[int, int, list[np.ndarray]]:
    """GIF bytes → (w, h, [per-frame composited (h, w, 3) uint8 RGB]).

    Frames are composited onto the logical screen in order: sub-canvas
    images land at their (left, top) offset, transparent pixels keep
    the underlying canvas, and disposal 2 clears the frame's rectangle
    back to the background color before the NEXT frame."""
    if buf[:6] not in GIF_SIGS:
        raise ValueError("not a GIF signature")
    w, h, packed, bg_index, _aspect = struct.unpack_from("<HHBBB", buf, 6)
    off = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(buf, np.uint8, n * 3, off).reshape(n, 3)
        off += n * 3

    bg_rgb = gct[bg_index] if gct is not None and bg_index < len(gct) else (
        np.zeros(3, dtype=np.uint8)
    )
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if off >= len(buf):
            raise ValueError("GIF missing trailer")
        block = buf[off]
        off += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = buf[off]
            off += 1
            data, off = _read_sub_blocks(buf, off)
            if label == 0xF9 and len(data) >= 4:
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, ipacked = struct.unpack_from("<HHHHB", buf, off)
        off += 9
        if ipacked & 0x40:
            raise NotImplementedError("interlaced GIF not supported")
        if disposal == 3:
            raise NotImplementedError(
                "GIF disposal restore-to-previous not supported"
            )
        table = gct
        if ipacked & 0x80:
            n = 2 << (ipacked & 0x07)
            table = np.frombuffer(buf, np.uint8, n * 3, off).reshape(n, 3)
            off += n * 3
        if table is None:
            raise ValueError("GIF image block without any color table")
        mcs = buf[off]
        off += 1
        lzw, off = _read_sub_blocks(buf, off)
        idx = _lzw_decode(lzw, mcs, fw * fh).reshape(fh, fw)

        region = canvas[top : top + fh, left : left + fw]
        rgb = table[np.minimum(idx, len(table) - 1)]
        if transparent is not None:
            mask = (idx == transparent)[..., None]
            rgb = np.where(mask, region, rgb)
        canvas[top : top + fh, left : left + fw] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg_rgb
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contains no image blocks")
    return w, h, frames
