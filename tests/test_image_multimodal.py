"""Real BMP image kernel through the multimodal seam: codec round trip,
feature parity with the numpy oracle, and violation-class routing."""

import numpy as np
import pytest

from llm_drift_detector_spark import codecs
from llm_drift_detector_spark.checks.multimodal import (
    FEATURE_BINS,
    image_features,
    media_features,
)
from llm_drift_detector_spark.synth.images import (
    IMAGES_DDL,
    image_rows,
    images_frame,
    make_pixels,
)


def test_bmp_roundtrip_exact():
    for i in (0, 1, 11, 42):
        px = make_pixels(i)
        payload = codecs.bmp_encode(px)
        w, h, decoded = codecs.bmp_parse(payload)
        assert (w, h) == (px.shape[1], px.shape[0])
        assert np.array_equal(decoded, px)


def test_bmp_topdown_negative_height():
    """height < 0 means top-down row order — decoder must NOT flip."""
    import struct

    px = make_pixels(3)
    payload = bytearray(codecs.bmp_encode(px))
    h = px.shape[0]
    # rewrite height to -h: stored rows are bottom-up, so declaring
    # top-down yields the vertically flipped image
    struct.pack_into("<i", payload, 22, -h)
    w2, h2, decoded = codecs.bmp_parse(bytes(payload))
    assert h2 == h and np.array_equal(decoded, px[::-1])


def test_bmp_parse_rejects_malformed():
    px = make_pixels(1)
    good = codecs.bmp_encode(px)
    for bad in (
        b"XX" + good[2:],               # magic
        good[:30],                       # shorter than header
        good[:28] + b"\x08\x00" + good[30:],  # bpp=8 (palette)
    ):
        with pytest.raises(ValueError):
            codecs.bmp_parse(bad)


def test_bmp_truncated_decodes_partial_rows():
    px = make_pixels(4)
    h, w = px.shape[:2]
    stride = (w * 3 + 3) & ~3
    payload = codecs.bmp_encode(px)[: codecs.BMP_HEADER_BYTES + (h // 2) * stride]
    w2, h2, decoded = codecs.bmp_parse(payload)
    assert (w2, h2) == (w, h) and decoded.shape[0] == h // 2
    # bottom-up storage: the rows present are the BOTTOM rows
    assert np.array_equal(decoded, px[h - h // 2 :])


def test_media_features_real_bmp_kernel(spark):
    """decode_mode='bmp' featurizes decoded PIXELS: a dark and a bright
    image of identical byte length land in different luma bins."""
    dark = np.zeros((8, 8, 3), dtype=np.uint8)
    bright = np.full((8, 8, 3), 250, dtype=np.uint8)
    rows = [
        ("dark", codecs.bmp_encode(dark), "bmp"),
        ("bright", codecs.bmp_encode(bright), "bmp"),
        ("broken", b"XX" + codecs.bmp_encode(dark)[2:], "bmp"),
    ]
    df = spark.createDataFrame(rows, IMAGES_DDL)
    got = {r.item_id: r for r in media_features(df, decode_mode="bmp").collect()}
    assert got["dark"].decode_status == "ok"
    assert got["dark"].feature[0] == pytest.approx(1.0)
    assert got["bright"].feature[FEATURE_BINS - 1] == pytest.approx(1.0)
    assert got["broken"].decode_status == "decode_failed"
    assert got["broken"].feature is None


def test_image_features_matches_numpy_oracle(spark):
    df = images_frame(spark, 40)
    got = {r.item_id: r for r in image_features(df).collect()}
    assert len(got) == 40
    for i, (item_id, payload, _t) in enumerate(image_rows(40)):
        r = got[item_id]
        if i % 10 == 5:
            assert r.decode_status == "null_payload"
            continue
        if i % 10 == 3:
            assert r.decode_status == "decode_failed"
            continue
        px = make_pixels(i)
        h, w = px.shape[:2]
        assert (r.width, r.height) == (w, h)
        if i % 10 == 7:
            assert r.decode_status == "truncated"
            assert 0 < r.rows_decoded == h // 2 < h
            px = px[h - h // 2 :]  # bottom-up: bottom rows survive
        else:
            assert r.decode_status == "ok" and r.rows_decoded == h
        luma = codecs.bmp_luma(px)
        counts = np.bincount(
            np.minimum((luma * 256).astype(np.int64), 255).ravel(), minlength=256
        )
        p = counts[counts > 0] / counts.sum()
        assert r.mean_luma == pytest.approx(float(luma.mean()), abs=1e-12)
        assert r.std_luma == pytest.approx(float(luma.std()), abs=1e-12)
        assert r.entropy == pytest.approx(float(-(p * np.log2(p)).sum()), abs=1e-12)
