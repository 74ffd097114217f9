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
    with pytest.raises(NotImplementedError):
        _decode_raster(b"\x89PNG\r\n\x1a\n....")


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
