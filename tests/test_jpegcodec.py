"""Baseline JPEG codec: lossy round trips within measured bounds, flat
blocks exact at quality 100, every subsampling layout, restart markers,
typed NotImplementedError gates for non-baseline modes, and the Spark
decode_media / error-isolation path over real JFIF blobs."""

import numpy as np
import pytest

from repurpose_spark.operators.jpegcodec import (
    QUANT_LUMA,
    UNZIGZAG,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg,
    scale_quant_table,
)


def _gradient_rgb(h, w):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return np.stack(
        [
            np.clip(yy * 4, 0, 255),
            np.clip(xx * 4, 0, 255),
            np.clip(128 + yy - xx, 0, 255),
        ],
        axis=2,
    ).astype(np.uint8)


def test_zigzag_involution():
    """UNZIGZAG inverts ZIGZAG and both are permutations of 0..63 —
    spec spot-checks: position 1 is (0,1), position 2 is (1,0)."""
    assert sorted(ZIGZAG) == list(range(64))
    arr = np.arange(64)
    np.testing.assert_array_equal(arr[ZIGZAG][UNZIGZAG], arr)
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert list(ZIGZAG[-4:]) == [47, 55, 62, 63]


def test_quality_scaling():
    q50 = scale_quant_table(QUANT_LUMA, 50)
    np.testing.assert_array_equal(q50, QUANT_LUMA)  # IJG: q=50 is identity
    assert scale_quant_table(QUANT_LUMA, 100).max() == 1
    assert (scale_quant_table(QUANT_LUMA, 10) >= QUANT_LUMA).all()
    assert scale_quant_table(QUANT_LUMA, 1).max() == 255


def test_flat_blocks_exact_at_q100():
    """A flat image is DC-only; with the all-ones q=100 table the round
    trip is EXACT — the strongest statement a lossy codec can make."""
    flat = np.full((24, 16), 77, dtype=np.uint8)
    w, h, c, out = decode_jpeg(encode_jpeg(flat, quality=100))
    assert (w, h, c) == (16, 24, 1)
    np.testing.assert_array_equal(out[:, :, 0], flat)
    rgbflat = np.full((16, 16, 3), 130, dtype=np.uint8)
    w, h, c, out = decode_jpeg(encode_jpeg(rgbflat, quality=100))
    assert (w, h, c) == (16, 16, 3)
    # color transform round-trips within rounding of the float matrices
    assert np.abs(out.astype(int) - 130).max() <= 1


def test_gradient_roundtrip_all_subsamplings():
    """Smooth content at q≥85 survives 4:4:4 / 4:2:2 / 4:2:0 within
    small per-pixel bounds; non-multiple-of-8 (and of 16) geometry
    exercises the padding + crop path."""
    rgb = _gradient_rgb(33, 41)
    for sub, q, tol in (("444", 95, 4), ("422", 90, 8), ("420", 90, 8)):
        blob = encode_jpeg(rgb, quality=q, subsampling=sub)
        w, h, c, out = decode_jpeg(blob)
        assert (w, h, c) == (41, 33, 3)
        err = np.abs(out.astype(int) - rgb.astype(int))
        assert err.max() <= tol, (sub, err.max())
        assert abs(float(out.mean()) - float(rgb.mean())) < 0.5


def test_noise_mean_preserved():
    """Worst-case content (uniform noise): per-pixel error is large by
    design, but the DC path must keep the global mean tight."""
    rng = np.random.RandomState(7)
    noise = rng.randint(0, 256, (40, 40, 3)).astype(np.uint8)
    w, h, c, out = decode_jpeg(encode_jpeg(noise, quality=75))
    assert abs(float(out.mean()) - float(noise.mean())) < 1.5


def test_restart_markers_roundtrip():
    """DRI + RSTn every 2 MCUs: the decoder's byte-align / DC-predictor
    reset path produces the same image as the unrestarted stream."""
    rgb = _gradient_rgb(24, 48)  # 18 MCUs at 4:4:4 → 8 restarts (wraps)
    plain = encode_jpeg(rgb, quality=92)
    restarted = encode_jpeg(rgb, quality=92, restart_interval=2)
    assert restarted != plain and b"\xff\xdd" in restarted
    _, _, _, out_p = decode_jpeg(plain)
    _, _, _, out_r = decode_jpeg(restarted)
    np.testing.assert_array_equal(out_p, out_r)
    # and on the 420 MCU layout too
    r420 = encode_jpeg(rgb, quality=92, subsampling="420", restart_interval=1)
    _, _, _, out420 = decode_jpeg(r420)
    err = np.abs(out420.astype(int) - rgb.astype(int))
    assert err.max() <= 10


def test_unsupported_modes_raise_typed():
    good = encode_jpeg(_gradient_rgb(16, 16), quality=90)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(prog)
    i = good.index(b"\xff\xdb")
    deep = good[: i + 4] + bytes([0x10 | good[i + 4]]) + good[i + 5 :]
    with pytest.raises(NotImplementedError, match="16-bit"):
        decode_jpeg(deep)
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0garbage")
    with pytest.raises(ValueError):
        decode_jpeg(good[:60])  # truncated mid-segment
    with pytest.raises(ValueError):
        decode_jpeg(good[:-20])  # truncated entropy stream
    with pytest.raises(ValueError, match="signature"):
        decode_jpeg(b"NOTAJPEG")


def test_jpeg_through_spark_stages(spark):
    """Real JFIF blobs flow through decode_media with status-row error
    isolation; synth_media(kind='jpeg') recovers the closed-form mean
    within the lossy tolerance for both subsampling layouts."""
    import pandas as pd

    from repurpose_spark.operators.multimodal import decode_media, synth_media

    rgb = _gradient_rgb(16, 12)
    good = encode_jpeg(rgb, quality=95)
    prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    rows = pd.DataFrame(
        {
            "doc_id": ["ok_jpg", "trunc", "prog"],
            "media": [good, good[:40], prog],
            "kind": ["image"] * 3,
        }
    )
    out = {r["doc_id"]: r for r in decode_media(
        spark.createDataFrame(rows), ignore_errors=True
    ).collect()}
    ok = out["ok_jpg"]
    assert ok["error"] is None
    assert (ok["width"], ok["height"], ok["channels"]) == (12, 16, 3)
    assert abs(ok["mean_intensity"] - float(rgb.mean())) < 1.0
    assert out["trunc"]["width"] is None and out["trunc"]["error"]
    assert out["prog"]["error"].startswith("NotImplementedError")

    media = synth_media(spark, 16, kind="jpeg")
    got = decode_media(media).collect()
    assert len(got) == 16
    for r in got:
        i = int(r["doc_id"][3:])
        w, h = 16 + i % 8, 16 + (i * 3) % 8
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        px = (i + 7 * np.arange(w * h * 3, dtype=np.int64)) % 251
        assert abs(r["mean_intensity"] - float(px.mean())) < 3.0, r
