"""Multimodal plumbing: fake-codec decode/resize/frame-sample through
real mapInPandas stages — schemas, multi-row emission, determinism,
and the NotImplementedError gate for real codecs."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from repurpose_spark.operators.multimodal import (
    decode_media,
    encode_fake_image,
    resize_pooled,
    sample_frames,
    synth_media,
    _decode_raster,
)


def test_fake_codec_roundtrip_local():
    blob = encode_fake_image(5, 16, 18)
    w, h, c, arr = _decode_raster(blob)
    assert (w, h, c) == (16, 18, 3)
    assert arr[0, 0, 0] == 5 % 251
    assert arr[0, 0, 1] == (5 + 7) % 251


def test_real_codec_gate():
    # webp stays gated (needs codec libs absent from this container)...
    with pytest.raises(NotImplementedError, match="webp"):
        _decode_raster(b"RIFF....WEBPVP8 ....")
    # ...while PNG and JPEG signatures route to the real decoders, which
    # reject garbage with a typed ValueError, not a codec gate
    with pytest.raises(ValueError, match="PNG"):
        _decode_raster(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        _decode_raster(b"\xff\xd8\xff\xe0....jpeg....")


def test_decode_media(spark):
    media = synth_media(spark, 20, kind="image")
    out = decode_media(media).orderBy("doc_id")
    rows = out.collect()
    assert len(rows) == 20
    r0 = rows[0]
    assert (r0["width"], r0["height"], r0["channels"]) == (16, 16, 3)
    # closed-form mean: payload = (0 + 7j) % 251 over w*h*c values
    n = 16 * 16 * 3
    expect = float(((0 + 7 * np.arange(n)) % 251).mean())
    assert r0["mean_intensity"] == pytest.approx(expect)
    # deterministic across runs
    again = decode_media(media).orderBy("doc_id").collect()
    assert rows == again


def test_resize_pooled_shape(spark):
    media = synth_media(spark, 8, kind="image")
    out = resize_pooled(media, out_w=4, out_h=4).collect()
    assert len(out) == 8
    for r in out:
        assert len(bytes(r["pooled"])) == 16


def test_sample_frames_multirow(spark):
    media = synth_media(spark, 12, kind="video")
    out = sample_frames(media, every=2)
    rows = out.collect()
    # doc i has 2 + i%4 frames; kept = ceil(n/2)
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    for i in range(12):
        n_frames = 2 + i % 4
        kept = sorted(per_doc[f"doc{i:08d}"])
        assert kept == list(range(0, n_frames, 2))
    # frame 0 of doc 0 equals the image stats of seed 0
    r = [x for x in rows if x["doc_id"] == "doc00000000" and x["frame_idx"] == 0][0]
    n = r["width"] * r["height"] * 3
    expect = float(((0 + 7 * np.arange(n)) % 251).mean())
    assert r["mean_intensity"] == pytest.approx(expect)


def test_ignore_errors_status_rows(spark):
    """Corrupt blobs become status rows (reference ignore_errors,
    process.py:174-199) — good rows unaffected, task never fails."""
    import pandas as pd

    good = synth_media(spark, 4, kind="image")
    bad = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": ["baddoc"], "media": [b"\x89PNG not fake"],
             "kind": ["image"]}
        )
    )
    mixed = good.unionByName(bad)
    out = decode_media(mixed, ignore_errors=True).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 5
    assert by_id["baddoc"]["error"].startswith("NotImplementedError")
    assert by_id["baddoc"]["width"] is None
    assert by_id["doc00000001"]["error"] is None
    assert by_id["doc00000001"]["width"] == 17
    # strict mode still raises
    with pytest.raises(Exception, match="NotImplementedError|FAKE|raster"):
        decode_media(mixed, ignore_errors=False).collect()


# ------------------------------------------------------- real containers
def _gradient_rgb(w, h):
    """Deterministic RGB test card: distinct per-pixel, per-channel."""
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 3) % 256, (y * 5) % 256, (x + y) % 256], axis=2
    ).astype(np.uint8)


def test_bmp_roundtrip_local():
    """encode_bmp → _decode_raster recovers the exact RGB array — real
    uncompressed BMP (bottom-up rows, BGR order, 4-byte padding) with
    a non-multiple-of-4 width to exercise the padding math."""
    from repurpose_spark.operators.multimodal import _decode_bmp, encode_bmp

    arr = _gradient_rgb(13, 7)  # 13*3=39 bytes/row → 1 pad byte
    blob = encode_bmp(arr)
    assert blob[:2] == b"BM"
    w, h, c, got = _decode_bmp(blob)
    assert (w, h, c) == (13, 7, 3)
    np.testing.assert_array_equal(got, arr)
    # dispatcher routes BMP automatically
    w2, h2, c2, got2 = _decode_raster(blob)
    np.testing.assert_array_equal(got2, arr)


def test_bmp_through_decode_media_and_resize(spark):
    """A crafted real BMP flows end-to-end through the Spark stages:
    decode_media stats match numpy; resize_pooled equals the block-mean
    computed independently."""
    import pandas as pd

    from repurpose_spark.operators.multimodal import encode_bmp

    arr = _gradient_rgb(16, 12)
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": ["bmp0"], "media": [encode_bmp(arr)],
             "kind": ["image"]}
        )
    )
    r = decode_media(df).collect()[0]
    assert (r["width"], r["height"], r["channels"]) == (16, 12, 3)
    assert r["mean_intensity"] == pytest.approx(float(arr.mean()))

    p = resize_pooled(df, out_w=4, out_h=4).collect()[0]
    pooled = np.frombuffer(p["pooled"], dtype=np.uint8).reshape(4, 4)
    gray = arr.astype(np.float64).mean(axis=2)
    expect = np.array(
        [
            [int(gray[y * 3:(y + 1) * 3, x * 4:(x + 1) * 4].mean())
             for x in range(4)]
            for y in range(4)
        ],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(pooled, expect)


def test_bmp_error_isolation(spark):
    """Truncated / compressed BMPs become status rows next to good BMP
    and FAKE rows — the mixed-container, log-and-continue path."""
    import pandas as pd

    from repurpose_spark.operators.multimodal import encode_bmp

    good_bmp = encode_bmp(_gradient_rgb(8, 8))
    rows = pd.DataFrame(
        {
            "doc_id": ["ok_bmp", "trunc", "fake", "rle"],
            "media": [
                good_bmp,
                good_bmp[:40],            # truncated header/pixels
                encode_fake_image(3, 8, 8),
                # compression field (offset 30) forced to BI_RLE8
                good_bmp[:30] + b"\x01\x00\x00\x00" + good_bmp[34:],
            ],
            "kind": ["image"] * 4,
        }
    )
    out = {r["doc_id"]: r for r in decode_media(
        spark.createDataFrame(rows), ignore_errors=True
    ).collect()}
    assert out["ok_bmp"]["error"] is None and out["ok_bmp"]["width"] == 8
    assert out["fake"]["error"] is None
    assert out["trunc"]["width"] is None and "truncated" in out["trunc"]["error"]
    assert out["rle"]["width"] is None and out["rle"]["error"].startswith(
        "NotImplementedError"
    )


def test_wav_roundtrip_and_decode_audio(spark):
    """Real PCM WAV (stdlib wave container) through decode_audio: frame
    counts, rate, channels and RMS match numpy; non-RIFF bytes become a
    status row under ignore_errors."""
    import pandas as pd

    from repurpose_spark.operators.multimodal import decode_audio, encode_wav

    t = np.arange(1600)
    mono = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype("<i2")
    stereo = np.stack([mono, (mono // 2)], axis=1).reshape(-1)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["mono", "stereo", "bad"],
                "media": [
                    encode_wav(mono, 16000, 1),
                    encode_wav(stereo, 8000, 2),
                    b"ID3\x04mp3-ish bytes",
                ],
            }
        )
    )
    out = {r["doc_id"]: r for r in decode_audio(df, ignore_errors=True).collect()}
    m = out["mono"]
    assert (m["n_samples"], m["sample_rate"], m["channels"]) == (1600, 16000, 1)
    x = mono.astype(np.float64) / 32768.0
    assert m["rms"] == pytest.approx(float(np.sqrt((x * x).mean())))
    s = out["stereo"]
    assert (s["n_samples"], s["sample_rate"], s["channels"]) == (1600, 8000, 2)
    assert out["bad"]["n_samples"] is None
    assert out["bad"]["error"].startswith("NotImplementedError")
    # strict mode raises through the task
    with pytest.raises(Exception, match="NotImplementedError|PCM"):
        decode_audio(df, ignore_errors=False).collect()


def test_bmp_roundtrip_fuzz():
    """Property fuzz of the BMP codec: arbitrary small RGB arrays (odd
    widths exercise the 4-byte row padding) survive encode→decode
    byte-exactly."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from repurpose_spark.operators.multimodal import _decode_bmp, encode_bmp

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=37),
        h=st.integers(min_value=1, max_value=23),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, seed):
        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        got_w, got_h, c, got = _decode_bmp(encode_bmp(arr))
        assert (got_w, got_h, c) == (w, h, 3)
        np.testing.assert_array_equal(got, arr)

    check()


def test_png_roundtrip_all_filters_local():
    """encode_png → _decode_png recovers the exact array for every
    scanline filter (0-4) and a per-row cycling mix, across greyscale /
    RGB / RGBA (alpha dropped on decode, like the BMP 32-bit path).
    Width 13 keeps strides non-aligned; the value pattern has enough
    local structure that Paeth's three predictor branches all fire."""
    from repurpose_spark.operators.multimodal import _decode_png, encode_png

    h, w = 11, 13
    for c in (1, 3, 4):
        y, x, ch = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(c), indexing="ij"
        )
        arr = ((3 * y + 5 * x + 11 * ch + (x * y) % 7) * 37 % 256).astype(
            np.uint8
        )
        for ft in (0, 1, 2, 3, 4, [0, 1, 2, 3, 4]):
            blob = encode_png(arr, filter_type=ft)
            assert blob[:8] == b"\x89PNG\r\n\x1a\n"
            got_w, got_h, got_c, got = _decode_png(blob)
            assert (got_w, got_h) == (w, h)
            assert got_c == (1 if c == 1 else 3)
            np.testing.assert_array_equal(got, arr[:, :, : got_c])
    # dispatcher routes PNG automatically
    rgb = ((np.arange(5 * 6 * 3) * 29) % 256).astype(np.uint8).reshape(5, 6, 3)
    w2, h2, c2, got2 = _decode_raster(encode_png(rgb, filter_type=4))
    np.testing.assert_array_equal(got2, rgb)


def test_png_palette_and_unsupported_shapes():
    """Hand-built palette PNG resolves through PLTE; 16-bit and Adam7
    raise typed NotImplementedError (status-row isolation upstream)."""
    import struct as _struct
    import zlib

    from repurpose_spark.operators.multimodal import (
        PNG_SIG,
        _decode_png,
        _png_chunk,
        encode_png,
    )

    h, w = 4, 6
    idx = (np.arange(h * w) % 4).astype(np.uint8).reshape(h, w)
    pal = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [7, 8, 9]], np.uint8
    )
    ihdr = _struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    lines = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    blob = (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"PLTE", pal.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(lines))
        + _png_chunk(b"IEND", b"")
    )
    got_w, got_h, got_c, got = _decode_png(blob)
    assert (got_w, got_h, got_c) == (w, h, 3)
    np.testing.assert_array_equal(got, pal[idx])

    good = encode_png(pal[idx])
    deep = good[:24] + b"\x10" + good[25:]  # IHDR depth byte → 16
    with pytest.raises(NotImplementedError, match="8-bit"):
        _decode_png(deep)
    adam7 = good[:28] + b"\x01" + good[29:]  # IHDR interlace byte → 1
    with pytest.raises(NotImplementedError, match="Adam7"):
        _decode_png(adam7)


def test_png_through_decode_media_and_resize(spark):
    """Crafted real PNGs flow end-to-end through the Spark stages with
    status-row isolation: stats match numpy, resize_pooled equals the
    independent block-mean, corrupt/unsupported blobs become error rows."""
    import pandas as pd

    from repurpose_spark.operators.multimodal import encode_png

    arr = _gradient_rgb(16, 12)
    good = encode_png(arr, filter_type=[0, 1, 2, 3, 4])
    deep = good[:24] + b"\x10" + good[25:]
    rows = pd.DataFrame(
        {
            "doc_id": ["ok_png", "trunc", "deep16"],
            "media": [good, good[:30], deep],
            "kind": ["image"] * 3,
        }
    )
    out = {r["doc_id"]: r for r in decode_media(
        spark.createDataFrame(rows), ignore_errors=True
    ).collect()}
    ok = out["ok_png"]
    assert ok["error"] is None
    assert (ok["width"], ok["height"], ok["channels"]) == (16, 12, 3)
    assert ok["mean_intensity"] == pytest.approx(float(arr.mean()))
    assert out["trunc"]["width"] is None and out["trunc"]["error"]
    assert out["deep16"]["error"].startswith("NotImplementedError")

    df = spark.createDataFrame(rows[rows.doc_id == "ok_png"])
    p = resize_pooled(df, out_w=4, out_h=4).collect()[0]
    pooled = np.frombuffer(p["pooled"], dtype=np.uint8).reshape(4, 4)
    gray = arr.astype(np.float64).mean(axis=2)
    expect = np.array(
        [
            [int(gray[y * 3:(y + 1) * 3, x * 4:(x + 1) * 4].mean())
             for x in range(4)]
            for y in range(4)
        ],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(pooled, expect)


def test_png_synth_media_kind(spark):
    """synth_media(kind='png') emits real PNG blobs over the closed-form
    pixels — decode_media recovers the formula's mean for every row."""
    from repurpose_spark.operators.multimodal import synth_media

    media = synth_media(spark, 24, kind="png")
    out = decode_media(media).collect()
    assert len(out) == 24
    for r in out:
        i = int(r["doc_id"][3:])
        w, h = 16 + i % 8, 16 + (i * 3) % 8
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        px = (i + 7 * np.arange(w * h * 3, dtype=np.int64)) % 251
        assert r["mean_intensity"] == pytest.approx(float(px.mean()))


def test_gif_roundtrip_local():
    """encode_gif → decode_gif_frames recovers every frame exactly.  The
    big frame (96×80 = 7680 px of varied data) drives the LZW dictionary
    past the 12-bit ceiling, so the encoder's CLEAR-on-overflow and the
    decoder's width-escalation paths both fire — not just literal codes."""
    from repurpose_spark.operators.gifcodec import decode_gif_frames, encode_gif

    h, w = 80, 96
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    frames = [
        ((k * 17 + 13 * np.arange(h * w, dtype=np.int64) ** 2) % 251)
        .astype(np.uint8).reshape(h, w)
        for k in range(3)
    ]
    blob = encode_gif(frames, pal)
    assert blob[:6] == b"GIF89a"
    got_w, got_h, got = decode_gif_frames(blob)
    assert (got_w, got_h) == (w, h)
    assert len(got) == 3
    for k in range(3):
        np.testing.assert_array_equal(got[k], pal[frames[k]])


def test_gif_transparency_and_disposal():
    """Hand-built animation: a sub-canvas frame 2 lands at its (left,
    top) offset, its transparent pixels keep the underlying composited
    canvas, and disposal=2 clears its rectangle back to the background
    color before frame 3."""
    import struct as _struct

    from repurpose_spark.operators.gifcodec import (
        _lzw_encode,
        _sub_blocks,
        decode_gif_frames,
        encode_gif,
    )

    pal = np.zeros((256, 3), dtype=np.uint8)
    pal[0] = (10, 20, 30)   # background (bg_index=0)
    pal[1] = (200, 0, 0)
    pal[2] = (0, 200, 0)
    pal[3] = (0, 0, 200)

    w = h = 6
    base = np.full((h, w), 1, dtype=np.uint8)            # frame 1: all red
    sub = np.array([[2, 3], [3, 2]], dtype=np.uint8)      # frame 2: 2×2 patch
    sub[0, 1] = 0                                          # transparent hole

    out = bytearray(b"GIF89a")
    out += _struct.pack("<HHBBB", w, h, 0b1111_0111, 0, 0)
    out += pal.tobytes()
    # frame 1: full canvas, no GCE
    out += _struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(8)
    out += _sub_blocks(_lzw_encode(base.reshape(-1), 8))
    # frame 2: 2×2 at (3, 2), transparent_index=0, disposal=2
    out += _struct.pack("<BBBBHBB", 0x21, 0xF9, 4, (2 << 2) | 1, 0, 0, 0)
    out += _struct.pack("<BHHHHB", 0x2C, 3, 2, 2, 2, 0)
    out.append(8)
    out += _sub_blocks(_lzw_encode(sub.reshape(-1), 8))
    # frame 3: full canvas again
    out += _struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    out.append(8)
    out += _sub_blocks(_lzw_encode(base.reshape(-1), 8))
    out.append(0x3B)

    got_w, got_h, frames = decode_gif_frames(bytes(out))
    assert (got_w, got_h, len(frames)) == (w, h, 3)
    np.testing.assert_array_equal(frames[0], pal[base])
    # frame 2: patch composited at (3,2); transparent cell kept frame 1's red
    exp2 = pal[base].copy()
    exp2[2, 3] = pal[2]
    exp2[2, 4] = pal[1]   # transparent → underlying red
    exp2[3, 3] = pal[3]
    exp2[3, 4] = pal[2]
    np.testing.assert_array_equal(frames[1], exp2)
    # frame 3 overwrites the whole canvas, so disposal-2's background
    # restore is invisible there; assert it via a 3-frame variant where
    # frame 3 is itself a disjoint sub-canvas patch
    out2 = bytes(out[: len(out) - 1 - (10 + 1 + len(
        _sub_blocks(_lzw_encode(base.reshape(-1), 8))))])
    patch = np.array([[1]], dtype=np.uint8)
    out3 = bytearray(out2)
    out3 += _struct.pack("<BHHHHB", 0x2C, 0, 0, 1, 1, 0)
    out3.append(8)
    out3 += _sub_blocks(_lzw_encode(patch.reshape(-1), 8))
    out3.append(0x3B)
    _, _, fr3 = decode_gif_frames(bytes(out3))
    # frame 2's rectangle was restored to background before frame 3
    assert tuple(fr3[2][2, 3]) == (10, 20, 30)
    assert tuple(fr3[2][3, 4]) == (10, 20, 30)
    # untouched canvas (and the 1×1 patch itself) keeps frame-1's red
    assert tuple(fr3[2][0, 0]) == (200, 0, 0)


def test_gif_unsupported_shapes():
    """Interlaced images and disposal=3 raise typed NotImplementedError
    (status-row isolation upstream); garbage raises ValueError."""
    import struct as _struct

    from repurpose_spark.operators.gifcodec import decode_gif_frames, encode_gif

    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    frame = (np.arange(12, dtype=np.uint8) % 7).reshape(3, 4)
    good = encode_gif([frame], pal)

    interlaced = bytearray(good)
    # image descriptor: 6-byte header + LSD(7) + GCT(768) → descriptor at 781
    idesc = 6 + 7 + 768
    assert interlaced[idesc] == 0x2C
    interlaced[idesc + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        decode_gif_frames(bytes(interlaced))

    disp3 = bytearray(b"GIF89a")
    disp3 += _struct.pack("<HHBBB", 4, 3, 0b1111_0111, 0, 0)
    disp3 += pal.tobytes()
    disp3 += _struct.pack("<BBBBHBB", 0x21, 0xF9, 4, (3 << 2), 0, 0, 0)
    disp3 += good[idesc:]
    with pytest.raises(NotImplementedError, match="restore-to-previous"):
        decode_gif_frames(bytes(disp3))

    with pytest.raises(ValueError, match="signature"):
        decode_gif_frames(b"NOTAGIF....")
    with pytest.raises(ValueError):
        decode_gif_frames(good[:40])  # truncated mid-color-table


def test_gif_through_spark_stages(spark):
    """Real GIFs flow through decode_media (first frame), sample_frames
    (every composited frame), and the ignore_errors status-row path."""
    import pandas as pd

    from repurpose_spark.operators.gifcodec import encode_gif

    h, w = 10, 14
    pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
    frames = [
        ((k + 3 * np.arange(h * w, dtype=np.int64)) % 200)
        .astype(np.uint8).reshape(h, w)
        for k in range(4)
    ]
    good = encode_gif(frames, pal)
    rows = pd.DataFrame(
        {
            "doc_id": ["ok_gif", "trunc"],
            "media": [good, good[:50]],
            "kind": ["video"] * 2,
        }
    )
    df = spark.createDataFrame(rows)

    out = {r["doc_id"]: r for r in decode_media(df, ignore_errors=True).collect()}
    ok = out["ok_gif"]
    assert ok["error"] is None
    assert (ok["width"], ok["height"], ok["channels"]) == (w, h, 3)
    assert ok["mean_intensity"] == pytest.approx(float(pal[frames[0]].mean()))
    assert out["trunc"]["width"] is None and out["trunc"]["error"]

    got = sample_frames(
        spark.createDataFrame(rows[rows.doc_id == "ok_gif"]), every=1
    ).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in got] == [0, 1, 2, 3]
    for k, r in enumerate(got):
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_intensity"] == pytest.approx(float(pal[frames[k]].mean()))


def test_gif_synth_media_kind(spark):
    """synth_media(kind='gif') emits real animated GIFs over the
    closed-form indices — sample_frames recovers the formula's per-frame
    mean for every row (the mm_gif_frames oracle contract)."""
    media = synth_media(spark, 24, kind="gif")
    out = sample_frames(media, every=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc) == 24
    for doc_id, rs in by_doc.items():
        i = int(doc_id[3:])
        w, h = 16 + i % 8, 16 + (i * 3) % 8
        nf = 2 + i % 4
        assert sorted(r["frame_idx"] for r in rs) == list(range(0, nf, 2))
        for r in rs:
            k = r["frame_idx"]
            assert (r["width"], r["height"]) == (w, h)
            px = (i + k + 7 * np.arange(w * h, dtype=np.int64)) % 251
            assert r["mean_intensity"] == pytest.approx(float(px.mean()))
