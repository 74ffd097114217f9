"""Pure-stdlib IMA (DVI4) ADPCM WAV codec — numpy + struct only.

IMA ADPCM (WAVE format tag ``0x0011``) is the first COMPRESSED audio
container the engine decodes: 4 bits/sample against PCM's 16, with the
step-size table adaptation from the public IMA "Recommended Practices
for Enhancing Digital Audio Compatibility" spec (the same tables every
implementation — ffmpeg, sox, libsndfile — ships).  The stdlib ``wave``
module rejects anything but format tag 1, so this module carries its own
minimal RIFF chunk walker.

Reference analog: the reference treats the codec boundary as an
exchangeable I/O layer (ts2img.py:413-419, netCDF encodings); here the
boundary is exercised with a genuinely lossy bitstream, mirroring how
`jpegcodec` extends the raster path — the lossy twin of the PCM path in
`multimodal._decode_wav`.

Both encoder and decoder are **vectorized across blocks**: a clip is
split into independent fixed-size blocks (each block's header carries
its own predictor seed + step index, per the WAV IMA layout), so the
inherently sequential prediction loop runs ``samples_per_block - 1``
numpy steps over an ``(n_blocks,)`` lane — per-row cost is O(block
size), not O(clip length), and a mapInPandas batch of clips decodes at
array speed.  Mono only; stereo interleaves 4-byte lanes per channel
and raises a typed ``NotImplementedError`` (same policy as Adam7 PNG /
GIF disposal 3).
"""

from __future__ import annotations

import struct

import numpy as np

ADPCM_FMT_TAG = 0x0011
PCM_FMT_TAG = 0x0001

# IMA spec step-size table (89 entries) and 3-bit-magnitude index
# adjustment table — public constants, identical in every implementation.
STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
    143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449,
    494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411,
    1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026,
    4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442,
    11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623,
    27086, 29794, 32767,
], dtype=np.int32)

INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def _reconstruct(pred, step, nibble):
    """Shared decoder arithmetic — the encoder calls this too, so its
    internal predictor tracks the decoder's bit-exactly (the property
    that makes ADPCM error bounded instead of drifting)."""
    diff = step >> 3
    diff = diff + np.where(nibble & 4, step, 0)
    diff = diff + np.where(nibble & 2, step >> 1, 0)
    diff = diff + np.where(nibble & 1, step >> 2, 0)
    pred = pred + np.where(nibble & 8, -diff, diff)
    return np.clip(pred, -32768, 32767)


def samples_per_block(block_align: int) -> int:
    """WAV IMA mono layout: 4-byte block header (int16 seed sample +
    step index + reserved), then 2 samples per data byte."""
    return (block_align - 4) * 2 + 1


def encode_wav_adpcm(
    samples: np.ndarray, sample_rate: int = 16000, block_align: int = 256
) -> bytes:
    """int16 mono samples → RIFF/WAVE bytes, format tag 0x0011.

    The final partial block is padded by repeating the last sample (a
    flat tail costs ~0 bits at minimum step); the ``fact`` chunk records
    the true sample count and the decoder truncates to it.
    """
    x = np.asarray(samples, dtype=np.int32).reshape(-1)
    spb = samples_per_block(block_align)
    n = int(x.size)
    if n == 0:
        raise ValueError("cannot encode an empty clip")
    n_blocks = -(-n // spb)
    pad = n_blocks * spb - n
    if pad:
        x = np.concatenate([x, np.full(pad, x[-1], dtype=np.int32)])
    blocks = x.reshape(n_blocks, spb)

    pred = blocks[:, 0].copy()
    # seed each block's step index from its first delta: smallest step
    # that covers it, so loud blocks don't waste samples ramping up
    first_delta = np.abs(blocks[:, 1] - blocks[:, 0])
    idx = np.minimum(
        np.searchsorted(STEP_TABLE, first_delta).astype(np.int32), 88
    )
    headers = np.zeros((n_blocks, 4), dtype=np.uint8)
    headers[:, 0] = (pred & 0xFF).astype(np.uint8)
    headers[:, 1] = ((pred >> 8) & 0xFF).astype(np.uint8)
    headers[:, 2] = idx.astype(np.uint8)

    nibbles = np.zeros((n_blocks, spb - 1), dtype=np.uint8)
    for j in range(1, spb):
        step = STEP_TABLE[idx]
        diff = blocks[:, j] - pred
        sign = diff < 0
        mag = np.abs(diff)
        b4 = mag >= step
        mag = mag - np.where(b4, step, 0)
        b2 = mag >= (step >> 1)
        mag = mag - np.where(b2, step >> 1, 0)
        b1 = mag >= (step >> 2)
        code = b4 * 4 + b2 * 2 + b1 * 1
        nibbles[:, j - 1] = code + np.where(sign, 8, 0)
        pred = _reconstruct(pred, step, nibbles[:, j - 1].astype(np.int32))
        idx = np.clip(idx + INDEX_TABLE[code], 0, 88)

    # pack: even sample position → LOW nibble of the byte (WAV IMA order)
    data = (nibbles[:, 0::2] | (nibbles[:, 1::2] << 4)).astype(np.uint8)
    payload = np.concatenate([headers, data], axis=1).tobytes()

    byte_rate = (sample_rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", ADPCM_FMT_TAG, 1, sample_rate, byte_rate,
        block_align, 4, 2, spb,
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n)
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def wav_chunks(buf: bytes) -> dict[bytes, bytes]:
    """Minimal RIFF walker → {fourcc: payload}.  First occurrence wins;
    chunks are word-aligned per the RIFF spec."""
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    chunks: dict[bytes, bytes] = {}
    off = 12
    while off + 8 <= len(buf):
        cc = buf[off:off + 4]
        (size,) = struct.unpack_from("<I", buf, off + 4)
        chunks.setdefault(cc, buf[off + 8:off + 8 + size])
        off += 8 + size + (size & 1)
    return chunks


def wav_format_tag(buf: bytes) -> int:
    fmt = wav_chunks(buf).get(b"fmt ")
    if fmt is None or len(fmt) < 2:
        raise ValueError("RIFF/WAVE without a fmt chunk")
    return struct.unpack_from("<H", fmt, 0)[0]


def decode_wav_adpcm(buf: bytes):
    """IMA-ADPCM RIFF/WAVE → (n_samples, rate, channels, int16 array).

    Vectorized across blocks (see module docstring); truncates to the
    ``fact`` sample count when present.
    """
    chunks = wav_chunks(buf)
    fmt = chunks[b"fmt "]
    tag, channels, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if tag != ADPCM_FMT_TAG:
        raise ValueError(f"format tag 0x{tag:04x} is not IMA ADPCM")
    if channels != 1:
        raise NotImplementedError(
            "stereo IMA ADPCM (per-channel 4-byte interleave) is not "
            "supported; mono decodes"
        )
    if bits != 4:
        raise NotImplementedError(f"{bits}-bit IMA ADPCM is not supported")
    spb = samples_per_block(block_align)
    if len(fmt) >= 20:
        declared = struct.unpack_from("<H", fmt, 18)[0]
        if declared and declared != spb:
            raise NotImplementedError(
                f"non-standard samples_per_block {declared} "
                f"(block_align {block_align} implies {spb})"
            )
    data = chunks[b"data"]
    n_blocks = len(data) // block_align
    raw = np.frombuffer(
        data, dtype=np.uint8, count=n_blocks * block_align
    ).reshape(n_blocks, block_align)

    pred = (
        raw[:, 0].astype(np.int32) | (raw[:, 1].astype(np.int32) << 8)
    )
    pred = np.where(pred >= 32768, pred - 65536, pred)
    idx = np.clip(raw[:, 2].astype(np.int32), 0, 88)

    packed = raw[:, 4:]
    nibbles = np.empty((n_blocks, (block_align - 4) * 2), dtype=np.int32)
    nibbles[:, 0::2] = packed & 0x0F
    nibbles[:, 1::2] = packed >> 4

    out = np.empty((n_blocks, spb), dtype=np.int16)
    out[:, 0] = pred.astype(np.int16)
    for j in range(1, spb):
        nib = nibbles[:, j - 1]
        step = STEP_TABLE[idx]
        pred = _reconstruct(pred, step, nib)
        idx = np.clip(idx + INDEX_TABLE[nib & 7], 0, 88)
        out[:, j] = pred.astype(np.int16)

    samples = out.reshape(-1)
    fact = chunks.get(b"fact")
    if fact is not None and len(fact) >= 4:
        n = struct.unpack_from("<I", fact, 0)[0]
        samples = samples[:n]
    return int(samples.size), int(rate), 1, samples
