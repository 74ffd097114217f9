"""Pure-stdlib FLAC codec — numpy + struct + hashlib only.

FLAC is the first LOSSLESS compressed audio container the engine
decodes (IMA-ADPCM in `adpcmcodec` is the lossy one): fixed/LPC linear
prediction over int16 samples with Rice-coded residuals, per the public
format spec (the same layout libFLAC, ffmpeg, and every other
implementation reads).  Lossless means the multimodal oracle for FLAC
clips is EXACT — the decoded waveform must reproduce the closed-form
fixture bit-for-bit, certified both by the per-frame CRC-16 and by the
STREAMINFO MD5 of the raw samples.

Reference analog: the reference treats the codec boundary as an
exchangeable I/O layer (ts2img.py:413-419, netCDF encodings); this
module completes the audio half of that boundary — PCM (identity),
ADPCM (lossy), FLAC (lossless compressed).

Scope and execution shape (same policy as the other stdlib codecs):

- mono, 16-bit only; stereo / other widths raise typed
  ``NotImplementedError`` (the Adam7-PNG / GIF-disposal-3 policy).
- encoder emits CONSTANT / FIXED(0-4) subframes (best-of by residual
  cost) with Rice partitions at any order, escape partitions when
  residuals outgrow Rice; optional LPC subframes (Levinson-Durbin,
  quantized coefficients) behind ``use_lpc=True``.
- decoder handles CONSTANT, VERBATIM, FIXED 0-4, LPC 1-32, Rice and
  Rice2 partitions including escapes — a superset of what the encoder
  writes, so hand-crafted streams exercise the paths the encoder
  doesn't take.
- vectorization: Rice ENCODE builds the whole bit array with numpy
  (loops run over the ≤30 remainder bit positions, never over
  residuals); Rice DECODE walks terminator bits with a single amortized
  O(n_ones) pointer over ``np.flatnonzero`` and extracts all remainders
  with one fancy-indexed matmul; FIXED reconstruction is k nested
  ``np.cumsum`` calls (no per-sample loop).  Only LPC reconstruction is
  inherently sequential (each sample feeds the next prediction) — that
  loop is per-sample within a frame and is the documented slow path.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

MAGIC = b"fLaC"

# --------------------------------------------------------------- CRCs
# FLAC frame CRCs: CRC-8 poly 0x07 over the frame header, CRC-16 poly
# 0x8005 over the whole frame.  Both init 0, no reflection — public
# constants from the format spec.


def _crc_table(poly: int, width: int) -> np.ndarray:
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    tbl = np.zeros(256, dtype=np.uint32)
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) if (r & top) else (r << 1)
        tbl[b] = r & mask
    return tbl


_CRC8_TBL = _crc_table(0x07, 8)
_CRC16_TBL = _crc_table(0x8005, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC8_TBL[r ^ b])
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = int(_CRC16_TBL[((r >> 8) ^ b) & 0xFF]) ^ ((r << 8) & 0xFFFF)
    return r


# --------------------------------------------------------------- bits
class BitWriter:
    """MSB-first bit accumulator; also accepts whole numpy bit arrays
    (the vectorized Rice encoder hands those over in one call)."""

    def __init__(self) -> None:
        self._bits: list[np.ndarray] = []

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        value &= (1 << n) - 1
        arr = (value >> np.arange(n - 1, -1, -1, dtype=np.int64)) & 1
        self._bits.append(arr.astype(np.uint8))

    def write_bits(self, bits: np.ndarray) -> None:
        self._bits.append(bits.astype(np.uint8, copy=False))

    def nbits(self) -> int:
        return sum(len(a) for a in self._bits)

    def tobytes(self) -> bytes:
        if not self._bits:
            return b""
        bits = np.concatenate(self._bits)
        pad = (-len(bits)) % 8
        if pad:
            bits = np.concatenate([bits, np.zeros(pad, dtype=np.uint8)])
        return np.packbits(bits).tobytes()


class BitReader:
    """MSB-first reader over a whole-frame bit array.  Unary runs are
    located via a pointer walk over the precomputed set-bit positions —
    amortized O(total ones), not O(bits scanned)."""

    def __init__(self, buf: bytes, start_bit: int = 0) -> None:
        self.bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8))
        self.ones = np.flatnonzero(self.bits)
        self.pos = start_bit
        self._j = int(np.searchsorted(self.ones, start_bit))

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > len(self.bits):
            raise ValueError("FLAC bitstream truncated")
        chunk = self.bits[self.pos:self.pos + n].astype(np.int64)
        self.pos += n
        return int(chunk @ (1 << np.arange(n - 1, -1, -1, dtype=np.int64)))

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >= (1 << (n - 1)) else v

    def _sync_ones(self) -> None:
        while self._j < len(self.ones) and self.ones[self._j] < self.pos:
            self._j += 1

    def read_unary(self) -> int:
        self._sync_ones()
        if self._j >= len(self.ones):
            raise ValueError("FLAC bitstream truncated in unary run")
        t = int(self.ones[self._j])
        q = t - self.pos
        self.pos = t + 1
        self._j += 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7
        self._sync_ones()


# --------------------------------------------------------------- rice
def _zigzag(res: np.ndarray) -> np.ndarray:
    r = res.astype(np.int64)
    return np.where(r >= 0, r << 1, ((-r) << 1) - 1)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return np.where(u & 1, -((u + 1) >> 1), u >> 1)


def _rice_cost(u: np.ndarray, p: int) -> int:
    return int((u >> p).sum()) + len(u) * (1 + p)


def _best_rice_param(u: np.ndarray) -> tuple[int, int]:
    """(param, cost_bits) minimizing the Rice size; param 15 never used
    (it's the 4-bit escape code)."""
    best_p, best_c = 0, _rice_cost(u, 0)
    for p in range(1, 15):
        c = _rice_cost(u, p)
        if c < best_c:
            best_p, best_c = p, c
    return best_p, best_c


def _rice_encode_bits(u: np.ndarray, p: int) -> np.ndarray:
    """Vectorized Rice encode of zigzagged residuals: one uint8 bit
    array for the whole partition.  The only python loop runs over the
    p remainder bit positions (p ≤ 14)."""
    q = (u >> p).astype(np.int64)
    lens = q + 1 + p
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    bits = np.zeros(int(lens.sum()), dtype=np.uint8)
    term = starts + q
    bits[term] = 1
    if p:
        rem = u & ((1 << p) - 1)
        for k in range(p):
            bits[term + 1 + k] = (rem >> (p - 1 - k)) & 1
    return bits


def _rice_decode(rd: BitReader, n: int, p: int) -> np.ndarray:
    """Decode n Rice(p) values: terminator walk per value (cheap int
    ops on the precomputed ones array), then ONE vectorized remainder
    extraction for the whole partition."""
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    terms = np.empty(n, dtype=np.int64)
    ones, j, pos = rd.ones, rd._j, rd.pos
    n_ones = len(ones)
    for i in range(n):
        while j < n_ones and ones[j] < pos:
            j += 1
        if j >= n_ones:
            raise ValueError("FLAC bitstream truncated in rice partition")
        t = int(ones[j])
        terms[i] = t
        pos = t + 1 + p
        j += 1
    starts = np.concatenate([[rd.pos], terms[:-1] + 1 + p])
    q = terms - starts
    u = q << p
    if p:
        if terms[-1] + 1 + p > len(rd.bits):
            raise ValueError("FLAC bitstream truncated in rice remainder")
        rem_bits = rd.bits[
            terms[:, None] + 1 + np.arange(p)[None, :]
        ].astype(np.int64)
        u = u | (rem_bits @ (1 << np.arange(p - 1, -1, -1, dtype=np.int64)))
    rd.pos = pos
    rd._j = j
    return _unzigzag(u)


# ------------------------------------------------------ fixed predictors
def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    return np.diff(x.astype(np.int64), order) if order else x.astype(np.int64)


def _fixed_reconstruct(warm: np.ndarray, res: np.ndarray, order: int) -> np.ndarray:
    """Inverse of the order-k difference: k nested cumsums seeded from
    the warmup samples — fully vectorized, no per-sample loop."""
    if order == 0:
        return res.copy()
    w = warm.astype(np.int64)
    cur = res.astype(np.int64)  # D^order(x), full length n-order
    for j in range(order - 1, -1, -1):
        # D^j[0] needs x[0..j] — all inside the warmup (j < order ≤ k)
        seed = np.diff(w, j)[0] if j else w[0]
        cur = np.concatenate([[seed], seed + np.cumsum(cur)])
    return cur  # D^0 = x, warmup samples reproduced by the integration


# --------------------------------------------------------------- utf8ish
_UTF8_LIMITS = [(1, 1 << 7), (2, 1 << 11), (3, 1 << 16), (4, 1 << 21),
                (5, 1 << 26), (6, 1 << 31), (7, 1 << 36)]


def _coded_number(v: int) -> bytes:
    for n, lim in _UTF8_LIMITS:
        if v < lim:
            break
    else:
        raise ValueError("coded number exceeds 36 bits")
    if n == 1:
        return bytes([v])
    out = bytearray(n)
    for i in range(n - 1, 0, -1):
        out[i] = 0x80 | (v & 0x3F)
        v >>= 6
    out[0] = ((0xFF << (8 - n)) & 0xFF) | v
    return bytes(out)


def _read_coded_number(rd: BitReader) -> int:
    b0 = rd.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        raise ValueError("malformed coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = rd.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("malformed coded-number continuation byte")
        v = (v << 6) | (c & 0x3F)
    return v


# --------------------------------------------------------------- LPC
def _lpc_coeffs(x: np.ndarray, order: int, precision: int = 14):
    """Levinson-Durbin on the autocorrelation, then quantize to
    (coeffs, shift) integer form.  Returns None when the signal is too
    short/flat for a stable fit (caller falls back to FIXED)."""
    n = len(x)
    if n <= order + 1:
        return None
    # Hann-window the autocorrelation estimate (the standard LPC move —
    # unwindowed normal equations are near-singular on pure tones and
    # the solve goes wild); the RESIDUAL below still uses the raw
    # integer samples with the quantized coefficients, so losslessness
    # never depends on the fit quality.
    xf = x.astype(np.float64) * np.hanning(n)
    ac = np.array([np.dot(xf[: n - k], xf[k:]) for k in range(order + 1)])
    if ac[0] == 0:
        return None
    err = ac[0]
    a = np.zeros(order)
    for i in range(order):
        acc = ac[i + 1] - np.dot(a[:i], ac[i:0:-1][:i])
        k = acc / err
        a[:i], a[i] = a[:i] - k * a[:i][::-1], k
        err *= 1 - k * k
        if err <= 0:
            return None
    cmax = np.abs(a).max()
    if cmax == 0 or not np.isfinite(cmax):
        return None
    shift = precision - 1
    while (cmax * (1 << shift)) >= (1 << (precision - 1)) and shift > 0:
        shift -= 1
    q = np.round(a * (1 << shift)).astype(np.int64)
    if np.abs(q).max() >= (1 << (precision - 1)):
        return None
    return q, shift, precision


def _lpc_residual(x: np.ndarray, q: np.ndarray, shift: int) -> np.ndarray:
    """Vectorized on encode: prediction windows over the ORIGINAL
    samples (lossless ⇒ decoder sees the same history)."""
    xi = x.astype(np.int64)
    order = len(q)
    idx = np.arange(order, len(xi))[:, None] - 1 - np.arange(order)[None, :]
    pred = (xi[idx] @ q) >> shift
    return xi[order:] - pred


def _lpc_reconstruct(warm: np.ndarray, res: np.ndarray, q: np.ndarray,
                     shift: int) -> np.ndarray:
    out = np.empty(len(warm) + len(res), dtype=np.int64)
    out[: len(warm)] = warm
    order = len(q)
    qi = [int(c) for c in q]
    o = out  # local alias; per-sample loop is LPC's documented slow path
    for i in range(order, len(out)):
        acc = 0
        for j in range(order):
            acc += qi[j] * int(o[i - 1 - j])
        o[i] = int(res[i - order]) + (acc >> shift)
    return out


# --------------------------------------------------------------- encode
def _write_residual(bw: BitWriter, res: np.ndarray, pred_order: int,
                    block_size: int, partition_order: int) -> None:
    """Residual coding method 0 (4-bit Rice params) with escape
    partitions when Rice would blow up."""
    bw.write(0, 2)
    bw.write(partition_order, 4)
    n_parts = 1 << partition_order
    part_len = block_size >> partition_order
    off = 0
    for pi in range(n_parts):
        cnt = part_len - (pred_order if pi == 0 else 0)
        part = res[off:off + cnt]
        off += cnt
        u = _zigzag(part)
        p, rice_cost = _best_rice_param(u)
        raw_w = 0
        if len(part):
            m = int(np.abs(part).max())
            raw_w = max(1, m.bit_length() + 1)
        raw_cost = 5 + len(part) * raw_w
        if raw_w <= 31 and raw_cost < rice_cost:
            bw.write(0b1111, 4)  # escape: verbatim partition
            bw.write(raw_w, 5)
            for v in part:
                bw.write(int(v) & ((1 << raw_w) - 1), raw_w)
        else:
            bw.write(p, 4)
            bw.write_bits(_rice_encode_bits(u, p))


def _choose_partition_order(block_size: int, pred_order: int,
                            requested: int) -> int:
    po = requested
    while po > 0 and (
        block_size % (1 << po) != 0 or (block_size >> po) <= pred_order
    ):
        po -= 1
    return po


def encode_flac(
    samples: np.ndarray,
    sample_rate: int = 16000,
    block_size: int = 4096,
    use_lpc: bool = False,
    lpc_order: int = 8,
    partition_order: int = 0,
) -> bytes:
    """int16 mono samples → FLAC bytes (STREAMINFO + frames).

    Per frame the encoder tries CONSTANT and FIXED orders 0–4 (plus an
    LPC fit when ``use_lpc``) and keeps the cheapest by exact coded
    size.  ``partition_order`` requests Rice partitioning (clamped to
    what the block size divides into)."""
    x = np.asarray(samples, dtype=np.int64).reshape(-1)
    if x.size == 0:
        raise ValueError("cannot encode an empty clip")
    if x.min() < -32768 or x.max() > 32767:
        raise ValueError("samples out of int16 range")
    n = int(x.size)

    md5 = hashlib.md5(x.astype("<i2").tobytes()).digest()
    frames = []
    for f_idx, start in enumerate(range(0, n, block_size)):
        blk = x[start:start + block_size]
        frames.append(_encode_frame(
            blk, f_idx, sample_rate, use_lpc, lpc_order, partition_order
        ))

    # STREAMINFO: min/max block size, min/max frame size (0 = unknown),
    # 20-bit rate, 3-bit channels-1, 5-bit bps-1, 36-bit total samples
    last_bs = n - (n - 1) // block_size * block_size
    si = BitWriter()
    si.write(min(block_size, last_bs) if n > block_size else last_bs, 16)
    si.write(block_size if n > block_size else last_bs, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(0, 3)   # channels - 1
    si.write(15, 5)  # bps - 1
    si.write(n & ((1 << 36) - 1), 36)
    info = si.tobytes() + md5
    header = MAGIC + bytes([0x80]) + struct.pack(">I", len(info))[1:] + info
    return header + b"".join(frames)


def _encode_frame(blk: np.ndarray, f_idx: int, sample_rate: int,
                  use_lpc: bool, lpc_order: int, partition_order: int) -> bytes:
    bs = len(blk)
    hdr = BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 1)          # reserved
    hdr.write(0, 1)          # fixed-blocksize strategy (frame number coded)
    hdr.write(0b0111, 4)     # blocksize: 16-bit value at header end
    hdr.write(0b0000, 4)     # sample rate: from STREAMINFO
    hdr.write(0b0000, 4)     # channels: mono
    hdr.write(0b100, 3)      # 16 bits per sample
    hdr.write(0, 1)          # reserved
    hbytes = hdr.tobytes() + _coded_number(f_idx) + struct.pack(">H", bs - 1)
    hbytes += bytes([crc8(hbytes)])

    # candidate subframes, exact coded cost
    cands: list[tuple[int, BitWriter]] = []
    if np.all(blk == blk[0]):
        bw = BitWriter()
        bw.write(0b000000_0 << 1, 8)  # pad+type(CONSTANT)+wasted
        bw.write(int(blk[0]) & 0xFFFF, 16)
        cands.append((bw.nbits(), bw))
    else:
        for order in range(min(5, bs)):
            res = _fixed_residual(blk, order)
            bw = BitWriter()
            bw.write((0b001000 | order) << 1, 8)
            for w in blk[:order]:
                bw.write(int(w) & 0xFFFF, 16)
            po = _choose_partition_order(bs, order, partition_order)
            _write_residual(bw, res, order, bs, po)
            cands.append((bw.nbits(), bw))
        if use_lpc:
            for order in {1, 2, 4, lpc_order}:
                if order < 1 or bs <= order + 1:
                    continue
                fit = _lpc_coeffs(blk, order)
                if fit is None:
                    continue
                q, shift, precision = fit
                res = _lpc_residual(blk, q, shift)
                bw = BitWriter()
                bw.write((0b100000 | (order - 1)) << 1, 8)
                for w in blk[:order]:
                    bw.write(int(w) & 0xFFFF, 16)
                bw.write(precision - 1, 4)
                bw.write(shift, 5)
                for c in q:
                    bw.write(int(c) & ((1 << precision) - 1), precision)
                po = _choose_partition_order(bs, order, partition_order)
                _write_residual(bw, res, order, bs, po)
                cands.append((bw.nbits(), bw))
    _, best = min(cands, key=lambda t: t[0])

    body = BitWriter()
    body.write_bits(np.unpackbits(np.frombuffer(hbytes, dtype=np.uint8)))
    for arr in best._bits:
        body.write_bits(arr)
    payload = body.tobytes()  # zero-padded to byte per spec
    return payload + struct.pack(">H", crc16(payload))


# --------------------------------------------------------------- decode
_BLOCKSIZE_CODES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                    13: 8192, 14: 16384, 15: 32768}
_RATE_CODES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
               6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
               11: 96000}


def decode_flac(buf: bytes):
    """FLAC bytes → (n_samples, rate, channels, int16 array).

    Verifies every frame's CRC-16 and the STREAMINFO MD5 (when set) —
    a lossless container either round-trips exactly or raises."""
    if buf[:4] != MAGIC:
        raise ValueError("not a FLAC stream")
    off = 4
    streaminfo = None
    while True:
        if off + 4 > len(buf):
            raise ValueError("FLAC metadata truncated")
        hdr = buf[off]
        last, btype = hdr & 0x80, hdr & 0x7F
        (length,) = struct.unpack(">I", b"\x00" + buf[off + 1:off + 4])
        block = buf[off + 4:off + 4 + length]
        if btype == 0:
            streaminfo = block
        elif btype == 127:
            raise ValueError("invalid FLAC metadata block type 127")
        off += 4 + length
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC stream without STREAMINFO")

    si = BitReader(streaminfo)
    si.read(16)  # min block size
    si.read(16)  # max block size
    si.read(24)
    si.read(24)
    rate = si.read(20)
    channels = si.read(3) + 1
    bps = si.read(5) + 1
    total = si.read(36)
    md5_expect = streaminfo[18:34]
    if channels != 1:
        raise NotImplementedError(
            f"{channels}-channel FLAC is not supported; mono decodes"
        )
    if bps != 16:
        raise NotImplementedError(f"{bps}-bit FLAC is not supported")

    out: list[np.ndarray] = []
    got = 0
    while got < total:
        frame, consumed = _decode_frame(buf, off, rate)
        out.append(frame)
        got += len(frame)
        off += consumed
    samples = (np.concatenate(out)[:total] if out
               else np.zeros(0, dtype=np.int64))
    x16 = samples.astype("<i2")
    if md5_expect != b"\x00" * 16:
        if hashlib.md5(x16.tobytes()).digest() != md5_expect:
            raise ValueError("FLAC MD5 mismatch: decoded audio is corrupt")
    return int(x16.size), int(rate), 1, x16


def _decode_frame(buf: bytes, off: int, si_rate: int):
    rd = BitReader(buf[off:])
    if rd.read(14) != 0b11111111111110:
        raise ValueError("bad FLAC frame sync")
    rd.read(1)
    rd.read(1)  # blocking strategy (both coded-number forms parse)
    bs_code = rd.read(4)
    rate_code = rd.read(4)
    chan = rd.read(4)
    ss_code = rd.read(3)
    rd.read(1)
    _read_coded_number(rd)
    if bs_code == 0:
        raise ValueError("reserved blocksize code 0")
    elif bs_code == 6:
        bs = rd.read(8) + 1
    elif bs_code == 7:
        bs = rd.read(16) + 1
    else:
        bs = _BLOCKSIZE_CODES[bs_code]
    if rate_code == 12:
        rd.read(8)
    elif rate_code in (13, 14):
        rd.read(16)
    elif rate_code == 15:
        raise ValueError("invalid sample-rate code 15")
    elif rate_code != 0 and _RATE_CODES.get(rate_code) not in (None, si_rate):
        pass  # informational; STREAMINFO rate governs
    hdr_len = rd.pos // 8
    expect = rd.read(8)
    actual = crc8(buf[off:off + hdr_len])
    if expect != actual:
        raise ValueError("FLAC frame header CRC-8 mismatch")
    if chan != 0:
        raise NotImplementedError(
            "only mono channel assignment is supported"
        )
    if ss_code != 0b100:
        raise NotImplementedError("only 16-bit frames are supported")

    x = _decode_subframe(rd, bs, 16)
    rd.align()
    frame_len = rd.pos // 8
    (expect16,) = struct.unpack_from(">H", buf, off + frame_len)
    if crc16(buf[off:off + frame_len]) != expect16:
        raise ValueError("FLAC frame CRC-16 mismatch")
    return x, frame_len + 2


def _decode_subframe(rd: BitReader, bs: int, bps: int) -> np.ndarray:
    if rd.read(1):
        raise ValueError("subframe padding bit set")
    stype = rd.read(6)
    if rd.read(1):
        raise NotImplementedError("wasted-bits subframes not supported")
    if stype == 0:  # CONSTANT
        v = rd.read_signed(bps)
        return np.full(bs, v, dtype=np.int64)
    if stype == 1:  # VERBATIM
        return np.array([rd.read_signed(bps) for _ in range(bs)],
                        dtype=np.int64)
    if 8 <= stype <= 12:  # FIXED
        order = stype - 8
        warm = np.array([rd.read_signed(bps) for _ in range(order)],
                        dtype=np.int64)
        res = _read_residual(rd, bs, order)
        return (_fixed_reconstruct(warm, res, order) if order
                else res)
    if stype >= 32:  # LPC
        order = stype - 32 + 1
        warm = np.array([rd.read_signed(bps) for _ in range(order)],
                        dtype=np.int64)
        precision = rd.read(4) + 1
        if precision == 16:
            raise ValueError("invalid LPC precision code 1111")
        shift = rd.read(5)
        q = np.array([rd.read_signed(precision) for _ in range(order)],
                     dtype=np.int64)
        res = _read_residual(rd, bs, order)
        return _lpc_reconstruct(warm, res, q, shift)
    raise ValueError(f"reserved subframe type {stype}")


def _read_residual(rd: BitReader, bs: int, pred_order: int) -> np.ndarray:
    method = rd.read(2)
    if method not in (0, 1):
        raise ValueError(f"reserved residual coding method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = rd.read(4)
    n_parts = 1 << po
    part_len = bs >> po
    if part_len << po != bs or part_len <= (pred_order if po else 0):
        raise ValueError("invalid rice partition order")
    parts = []
    for pi in range(n_parts):
        cnt = part_len - (pred_order if pi == 0 else 0)
        p = rd.read(pbits)
        if p == escape:
            w = rd.read(5)
            if w:
                parts.append(np.array(
                    [rd.read_signed(w) for _ in range(cnt)], dtype=np.int64
                ))
            else:
                parts.append(np.zeros(cnt, dtype=np.int64))
        else:
            parts.append(_rice_decode(rd, cnt, p))
    return np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)
