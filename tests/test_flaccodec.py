"""FLAC codec: lossless round trips, CRC/MD5 integrity, decoder
superset paths (partitions, LPC, escapes), and the Spark decode path."""

import hashlib
import struct

import numpy as np
import pytest

from repurpose_spark.operators import flaccodec as fc


def _roundtrip(x, **kw):
    buf = fc.encode_flac(np.asarray(x, dtype=np.int64), **kw)
    n, rate, ch, out = fc.decode_flac(buf)
    assert ch == 1
    np.testing.assert_array_equal(out.astype(np.int64), np.asarray(x, dtype=np.int64))
    assert n == len(x)
    return buf


def test_roundtrip_constant():
    _roundtrip(np.full(300, -123))


def test_roundtrip_ramp():
    _roundtrip(np.arange(-500, 500) * 3)


def test_roundtrip_closed_form_family():
    # the synth_media waveform family
    for i in (0, 1, 7, 19):
        t = np.arange(400 + 100 * (i % 4), dtype=np.int64)
        _roundtrip((i * 31 + t * 7) % 32003 - 16001)


def test_roundtrip_noise_and_extremes():
    rng = np.random.default_rng(42)
    x = rng.integers(-32768, 32768, size=3000)
    x[0], x[1], x[2] = -32768, 32767, -32768  # full-range alternation
    _roundtrip(x)


def test_roundtrip_single_sample_and_tiny():
    _roundtrip([12345])
    _roundtrip([-32768, 32767])
    _roundtrip([0, 0, 0, 1])


def test_roundtrip_multi_frame():
    x = (np.arange(1000, dtype=np.int64) * 37) % 20001 - 10000
    buf = _roundtrip(x, block_size=256)
    # 1000 samples at bs=256 -> 4 frames; more than one sync word
    assert buf.count(b"\xff\xf8") >= 2


def test_roundtrip_partition_orders():
    x = (np.arange(512, dtype=np.int64) * 991) % 30011 - 15005
    for po in (0, 1, 2, 3):
        _roundtrip(x, block_size=256, partition_order=po)


def test_roundtrip_lpc():
    # smooth signal where LPC should beat FIXED; round trip must be exact
    t = np.arange(2000)
    x = (8000 * np.sin(t / 20.0) + 3000 * np.sin(t / 7.0)).astype(np.int64)
    buf_fixed = fc.encode_flac(x, use_lpc=False)
    buf_lpc = fc.encode_flac(x, use_lpc=True)
    for buf in (buf_fixed, buf_lpc):
        _, _, _, out = fc.decode_flac(buf)
        np.testing.assert_array_equal(out.astype(np.int64), x)


def test_lpc_actually_selected_and_smaller():
    # high-frequency tone: fixed difference predictors AMPLIFY it
    # (|2 sin(w/2)| > 1), while an order-2 LPC captures it exactly —
    # the shape where LPC genuinely earns its bits
    t = np.arange(4096)
    x = (8000 * np.sin(2.0 * t)).astype(np.int64)
    assert len(fc.encode_flac(x, use_lpc=True)) < 0.8 * len(
        fc.encode_flac(x, use_lpc=False)
    )


def test_escape_partition_roundtrip():
    # white noise at full scale makes Rice worse than raw for high orders;
    # force a shape where the escape wins at least once
    rng = np.random.default_rng(7)
    x = rng.integers(-32768, 32768, size=640)
    _roundtrip(x, block_size=64, partition_order=1)


def test_compression_on_smooth_signal():
    x = (np.arange(8000, dtype=np.int64) % 97) * 50 - 2400
    buf = fc.encode_flac(x)
    assert len(buf) < 2 * len(x)  # well under the 16000-byte raw payload


def test_md5_tamper_detected():
    x = np.arange(500, dtype=np.int64) * 11 - 2750
    buf = bytearray(fc.encode_flac(x))
    # STREAMINFO MD5 lives at bytes 8+18 .. 8+34
    buf[8 + 18] ^= 0xFF
    with pytest.raises(ValueError, match="MD5"):
        fc.decode_flac(bytes(buf))


def test_frame_crc_tamper_detected():
    x = np.arange(500, dtype=np.int64) * 11 - 2750
    buf = bytearray(fc.encode_flac(x))
    buf[-3] ^= 0x01  # flip a bit near the end of the last frame payload
    with pytest.raises(ValueError):
        fc.decode_flac(bytes(buf))


def test_not_flac_raises():
    with pytest.raises(ValueError, match="not a FLAC"):
        fc.decode_flac(b"RIFF\x00\x00\x00\x00WAVE")


def test_verbatim_subframe_decodes():
    # hand-craft a VERBATIM subframe (encoder never emits one)
    bw = fc.BitWriter()
    vals = [-5, 17, 32767, -32768]
    hdr = fc.BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(0b0111, 4)
    hdr.write(0, 4)
    hdr.write(0, 4)
    hdr.write(0b100, 3)
    hdr.write(0, 1)
    hbytes = hdr.tobytes() + fc._coded_number(0) + struct.pack(">H", len(vals) - 1)
    hbytes += bytes([fc.crc8(hbytes)])
    bw.write_bits(np.unpackbits(np.frombuffer(hbytes, dtype=np.uint8)))
    bw.write(0, 1)
    bw.write(1, 6)  # VERBATIM
    bw.write(0, 1)
    for v in vals:
        bw.write(v & 0xFFFF, 16)
    payload = bw.tobytes()
    frame = payload + struct.pack(">H", fc.crc16(payload))

    si = fc.BitWriter()
    si.write(len(vals), 16)
    si.write(len(vals), 16)
    si.write(0, 48)
    si.write(16000, 20)
    si.write(0, 3)
    si.write(15, 5)
    si.write(len(vals), 36)
    info = si.tobytes() + hashlib.md5(
        np.array(vals, dtype="<i2").tobytes()
    ).digest()
    buf = fc.MAGIC + bytes([0x80]) + struct.pack(">I", len(info))[1:] + info + frame
    n, rate, ch, out = fc.decode_flac(buf)
    assert out.tolist() == vals


def test_coded_number_roundtrip():
    for v in (0, 1, 127, 128, 2047, 2048, 65535, 1 << 20, (1 << 31) + 5,
              (1 << 36) - 1):
        enc = fc._coded_number(v)
        rd = fc.BitReader(enc)
        assert fc._read_coded_number(rd) == v


def test_stereo_and_wide_rejected():
    x = np.arange(100, dtype=np.int64)
    buf = bytearray(fc.encode_flac(x))
    fc.decode_flac(bytes(buf))  # baseline decodes
    # set channels-1 = 1 in STREAMINFO (layout: 80 bits of block/frame
    # sizes | rate 20 | channels 3 | bps 5 | total 36 → bits 100..102)
    bits = np.unpackbits(np.frombuffer(bytes(buf[8:8 + 18]), dtype=np.uint8))
    bits[100:103] = [0, 0, 1]
    info = np.packbits(bits).tobytes()
    buf2 = bytes(buf[:8]) + info + bytes(buf[8 + 18:])
    with pytest.raises(NotImplementedError, match="channel"):
        fc.decode_flac(buf2)


def test_decode_via_multimodal_audio_path():
    from repurpose_spark.operators.multimodal import _decode_wav

    i = 3
    t = np.arange(700, dtype=np.int64)
    x = (i * 31 + t * 7) % 32003 - 16001
    buf = fc.encode_flac(x, sample_rate=16000)
    n, rate, ch, sw, f = _decode_wav(buf)
    assert (n, rate, ch, sw) == (700, 16000, 1, 2)
    np.testing.assert_allclose(f, x / 32768.0)


def test_decode_audio_spark_mixed_table(spark):
    from pyspark.sql import functions as F

    from repurpose_spark.operators.multimodal import decode_audio, synth_media

    media = synth_media(spark, 24, kind="flac")
    out = decode_audio(media).orderBy("doc_id").collect()
    assert len(out) == 24
    for r in out:
        i = int(r.doc_id[3:])
        assert r.n_samples == 400 + 100 * (i % 4)
        assert r.sample_rate == 16000 and r.channels == 1
    # exact RMS vs the closed form
    i = int(out[0].doc_id[3:])
    t = np.arange(out[0].n_samples, dtype=np.int64)
    x = (i * 31 + t * 7) % 32003 - 16001
    assert abs(out[0].rms - float(np.sqrt(((x / 32768.0) ** 2).mean()))) < 1e-9
