"""IMA-ADPCM WAV codec (operators/adpcmcodec.py) — the compressed twin
of the PCM path in multimodal._decode_wav.

Certifies: (1) the vectorized block decoder matches a scalar
straight-from-the-IMA-spec reference bit-exactly, (2) the lossy round
trip stays inside the error bound the mm_adpcm_stats oracle relies on,
(3) fact-chunk truncation for non-block-multiple clips, (4) typed
NotImplementedError gates for stereo / non-4-bit streams, and (5) the
Spark decode_audio path handles mixed PCM + ADPCM batches with
status-row isolation.
"""

import numpy as np
import pytest

from repurpose_spark.operators import adpcmcodec as ac
from repurpose_spark.operators import flaccodec


def _scalar_decode(buf: bytes) -> np.ndarray:
    """Scalar reference decoder: the IMA spec loop, one sample at a
    time, no vectorization — what the fast path must match exactly."""
    import struct

    chunks = ac.wav_chunks(buf)
    block_align = struct.unpack_from("<H", chunks[b"fmt "], 12)[0]
    spb = ac.samples_per_block(block_align)
    data = chunks[b"data"]
    out = []
    for b0 in range(0, len(data) - block_align + 1, block_align):
        blk = data[b0:b0 + block_align]
        pred = struct.unpack_from("<h", blk, 0)[0]
        idx = min(max(blk[2], 0), 88)
        out.append(pred)
        nibbles = []
        for byte in blk[4:]:
            nibbles.append(byte & 0x0F)
            nibbles.append(byte >> 4)
        for nib in nibbles:
            step = int(ac.STEP_TABLE[idx])
            diff = step >> 3
            if nib & 4:
                diff += step
            if nib & 2:
                diff += step >> 1
            if nib & 1:
                diff += step >> 2
            pred = pred - diff if nib & 8 else pred + diff
            pred = min(32767, max(-32768, pred))
            idx = min(88, max(0, idx + int(ac.INDEX_TABLE[nib & 7])))
            out.append(pred)
    samples = np.array(out, dtype=np.int16)
    fact = chunks.get(b"fact")
    if fact is not None:
        n = struct.unpack_from("<I", fact, 0)[0]
        samples = samples[:n]
    return samples


def _ramp(i: int, n: int) -> np.ndarray:
    """The synth_media 'adpcm' closed-form waveform."""
    t = np.arange(n, dtype=np.int64)
    return ((((i * 31 + t * 7) % 4001) - 2000) * 8).astype("<i2")


def test_vectorized_decoder_matches_scalar_reference():
    rng = np.random.default_rng(11)
    clips = [
        _ramp(3, 1300),
        rng.integers(-32768, 32768, 777).astype("<i2"),  # worst case: noise
        np.zeros(505, dtype="<i2"),                      # exactly one block
        np.array([12345], dtype="<i2"),                  # header-only clip
    ]
    for x in clips:
        buf = ac.encode_wav_adpcm(x, 8000)
        n, rate, ch, fast = ac.decode_wav_adpcm(buf)
        slow = _scalar_decode(buf)
        assert (n, rate, ch) == (x.size, 8000, 1)
        np.testing.assert_array_equal(fast, slow)


def test_roundtrip_error_bound_on_smooth_ramp():
    """The mm_adpcm_stats oracle allows 2% relative RMS error; the
    fixture family must sit well inside it, and per-sample error away
    from the period wrap must stay within a few minimum steps."""
    for i in range(8):
        x = _ramp(i, 400 + 100 * (i % 4))
        n, rate, ch, dec = ac.decode_wav_adpcm(ac.encode_wav_adpcm(x, 16000))
        assert n == x.size
        rms_in = float(np.sqrt(np.mean(x.astype(np.float64) ** 2)))
        rms_out = float(np.sqrt(np.mean(dec.astype(np.float64) ** 2)))
        assert abs(rms_in - rms_out) <= 0.01 * rms_in
        err = np.abs(dec.astype(np.int64) - x.astype(np.int64))
        # away from the wrap the tracker stays near its minimum step
        assert np.quantile(err, 0.95) <= 64


def test_fact_truncation_and_block_padding():
    # 505 samples/block at block_align 256; 700 is a partial second block
    x = _ramp(1, 700)
    buf = ac.encode_wav_adpcm(x, 16000)
    n, rate, ch, dec = ac.decode_wav_adpcm(buf)
    assert n == 700 and dec.size == 700
    # two full blocks of payload on the wire regardless of truncation
    assert len(ac.wav_chunks(buf)[b"data"]) == 2 * 256


def test_format_tag_and_typed_gates():
    import struct

    x = _ramp(0, 600)
    buf = ac.encode_wav_adpcm(x, 16000)
    assert ac.wav_format_tag(buf) == ac.ADPCM_FMT_TAG

    # PCM WAV reports tag 1 (dispatch stays on the stdlib path)
    from repurpose_spark.operators.multimodal import encode_wav

    assert ac.wav_format_tag(encode_wav(x, 16000, 1)) == ac.PCM_FMT_TAG

    with pytest.raises(ValueError, match="not IMA ADPCM"):
        ac.decode_wav_adpcm(encode_wav(x, 16000, 1))

    def patched(buf, off, word, value):
        return buf[:off] + struct.pack(word, value) + buf[off + struct.calcsize(word):]

    fmt_off = buf.index(b"fmt ") + 8
    stereo = patched(buf, fmt_off + 2, "<H", 2)
    with pytest.raises(NotImplementedError, match="stereo"):
        ac.decode_wav_adpcm(stereo)
    three_bit = patched(buf, fmt_off + 14, "<H", 3)
    with pytest.raises(NotImplementedError, match="not supported"):
        ac.decode_wav_adpcm(three_bit)
    with pytest.raises(ValueError, match="RIFF"):
        ac.wav_chunks(b"ID3\x04 not a wav")


def test_adpcm_through_decode_audio(spark):
    """Mixed PCM + ADPCM + garbage batch through the Spark decode_audio
    path: ADPCM rows report the decoded sample width (2), RMS lands on
    the exact value within the oracle bound, garbage isolates."""
    import pandas as pd

    from repurpose_spark.operators.multimodal import (
        decode_audio,
        encode_wav,
        synth_media,
    )

    x = _ramp(5, 900)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["pcm", "adpcm", "flac", "bad", "corrupt"],
                "media": [
                    encode_wav(x, 16000, 1),
                    ac.encode_wav_adpcm(x, 16000),
                    flaccodec.encode_flac(x, 16000),
                    b"ID3\x03 mp3 frame bytes",
                    b"fLaC truncated stream",
                ],
            }
        )
    )
    out = {r["doc_id"]: r for r in decode_audio(df, ignore_errors=True).collect()}
    exact_rms = float(np.sqrt(np.mean((x.astype(np.float64) / 32768.0) ** 2)))
    for key in ("pcm", "adpcm", "flac"):
        r = out[key]
        assert (r["n_samples"], r["sample_rate"], r["channels"]) == (900, 16000, 1)
        assert r["sample_width"] == 2
    assert out["pcm"]["rms"] == pytest.approx(exact_rms)
    assert out["flac"]["rms"] == pytest.approx(exact_rms)  # lossless: exact
    assert out["adpcm"]["rms"] == pytest.approx(exact_rms, rel=0.02)
    assert out["bad"]["n_samples"] is None
    assert out["bad"]["error"].startswith("NotImplementedError")
    assert out["corrupt"]["n_samples"] is None
    assert out["corrupt"]["error"].startswith("ValueError")

    # the synth_media fixture the mm_adpcm_stats oracle regenerates
    got = decode_audio(synth_media(spark, 12, kind="adpcm")).collect()
    assert len(got) == 12
    for r in got:
        i = int(r["doc_id"][3:])
        y = _ramp(i, 400 + 100 * (i % 4))
        assert r["n_samples"] == y.size
        exact = float(np.sqrt(np.mean(y.astype(np.float64) ** 2)))
        assert r["rms"] * 32768.0 == pytest.approx(exact, rel=0.02)
