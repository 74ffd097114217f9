"""MJPEG-AVI video container: lossy round trips within measured bounds,
both chroma layouts, grayscale streams, rec-list and index-less files,
typed NotImplementedError gates for non-MJPEG content, and the Spark
sample_frames path over real AVI blobs."""

import struct

import numpy as np
import pytest

from repurpose_spark.operators import jpegcodec
from repurpose_spark.operators.avicodec import (
    _chunk,
    _list,
    decode_avi_frames,
    encode_avi_mjpeg,
    is_avi,
)


def _rgb_frames(n, h=17, w=24):
    return [
        ((k + 7 * np.arange(h * w * 3, dtype=np.int64)) % 251)
        .astype(np.uint8)
        .reshape(h, w, 3)
        for k in range(n)
    ]


def test_roundtrip_both_subsamplings():
    """Per-frame means survive a q95 encode within the same tolerance
    the still-JPEG path measured; frame order and count preserved."""
    frames = _rgb_frames(4)
    for sub in ("444", "420"):
        buf = encode_avi_mjpeg(frames, quality=95, subsampling=sub)
        assert is_avi(buf)
        w, h, out = decode_avi_frames(buf)
        assert (w, h) == (24, 17) and len(out) == 4
        for got, want in zip(out, frames):
            assert got.shape == want.shape
            assert abs(float(got.mean()) - float(want.mean())) < 0.5


def test_grayscale_stream():
    g = [
        ((k + np.arange(256, dtype=np.int64)) % 251)
        .astype(np.uint8)
        .reshape(16, 16)
        for k in range(2)
    ]
    w, h, out = decode_avi_frames(encode_avi_mjpeg(g, quality=95))
    assert (w, h) == (16, 16) and len(out) == 2
    assert abs(float(out[0].mean()) - float(g[0].mean())) < 0.5


def test_rec_list_and_missing_idx1():
    """Players must read movi chunks nested in 'rec ' lists, and files
    with no idx1 at all (live-capture shape) — the walker does both."""
    frames = _rgb_frames(3)
    buf = encode_avi_mjpeg(frames, quality=95)
    # rebuild: wrap each 00dc in its own rec list, drop idx1
    w0, h0, _ = decode_avi_frames(buf)
    jpegs = [
        jpegcodec.encode_jpeg(f, quality=95, subsampling="444")
        for f in frames
    ]
    # reuse the original hdrl by slicing up to the movi LIST
    movi_at = buf.index(b"LISTmovi", 12) if b"LISTmovi" in buf else None
    hdrl_end = buf.find(b"movi") - 8
    hdrl = buf[12:hdrl_end]
    movi = _list(
        b"movi", b"".join(_list(b"rec ", _chunk(b"00dc", j)) for j in jpegs)
    )
    body = b"AVI " + hdrl + movi
    rebuilt = b"RIFF" + struct.pack("<I", len(body)) + body
    w, h, out = decode_avi_frames(rebuilt)
    assert (w, h) == (w0, h0) and len(out) == 3


def test_unsupported_shapes_raise_typed():
    frames = _rgb_frames(1)
    buf = bytearray(encode_avi_mjpeg(frames, quality=95))
    # non-MJPG biCompression → typed gate before entropy decode
    at = buf.index(b"MJPG", buf.index(b"strf"))
    bad = bytes(buf[:at]) + b"XVID" + bytes(buf[at + 4 :])
    with pytest.raises(NotImplementedError, match="only MJPG"):
        decode_avi_frames(bad)
    # audio stream header → typed gate
    at = buf.index(b"vids")
    bad = bytes(buf[:at]) + b"auds" + bytes(buf[at + 4 :])
    with pytest.raises(NotImplementedError, match="non-video"):
        decode_avi_frames(bad)
    # not a RIFF-AVI at all
    with pytest.raises(ValueError, match="signature"):
        decode_avi_frames(b"RIFX" + bytes(buf[4:]))
    # header/frame dimension disagreement must be caught, not returned
    at = buf.index(b"avih") + 8 + 32
    bad = bytearray(buf)
    struct.pack_into("<I", bad, at, 999)
    with pytest.raises(ValueError, match="decodes"):
        decode_avi_frames(bytes(bad))


def test_empty_and_mismatched_frames_rejected_on_encode():
    with pytest.raises(ValueError, match="at least one"):
        encode_avi_mjpeg([])
    with pytest.raises(ValueError, match="share"):
        encode_avi_mjpeg([np.zeros((8, 8, 3), np.uint8),
                          np.zeros((9, 8, 3), np.uint8)])


def test_avi_through_spark_sample_frames(spark):
    """synth_media(kind='avi') → sample_frames: every kept frame's mean
    lands within codec tolerance of the closed-form value, multi-row
    emission per doc, every=2 sampling honored."""
    from repurpose_spark.operators.multimodal import sample_frames, synth_media

    media = synth_media(spark, 24, kind="avi")
    rows = sample_frames(media, every=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 24
    for doc, rs in by_doc.items():
        i = int(doc[3:])
        n_frames = 2 + i % 4
        w, h = 16 + i % 8, 16 + (i * 3) % 8
        assert sorted(r.frame_idx for r in rs) == list(
            range(0, n_frames, 2)
        )
        for r in rs:
            assert (r.width, r.height) == (w, h)
            exact = float(
                ((i + r.frame_idx + 7 * np.arange(w * h * 3, dtype=np.int64))
                 % 251).mean()
            )
            assert abs(r.mean_intensity - exact) < 0.5
