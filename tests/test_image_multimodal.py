"""Real BMP + PNG image kernels through the multimodal seam: codec
round trips (PNG exercises CRC walking, DEFLATE, and all five scanline
filters), feature parity with the numpy oracle, and violation-class
routing over the mixed-container tier."""

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
    is_png_row,
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


def test_png_roundtrip_exercises_all_filters():
    """Images taller than 5 rows hit every filter type (encode uses
    y % 5); reconstruction must be pixel-exact through DEFLATE."""
    for i in (0, 4, 13, 42):  # heights 6..10 -> all filters 0-4 used
        px = make_pixels(i)
        payload = codecs.png_encode(px)
        assert payload.startswith(codecs.PNG_SIGNATURE)
        w, h, decoded = codecs.png_parse(payload)
        assert (w, h) == (px.shape[1], px.shape[0])
        assert np.array_equal(decoded, px)
        # the raw pixel bytes must NOT appear verbatim (it is a real
        # compressed format, not a byte-shuffled container)
        assert px.tobytes() not in payload


def test_png_parse_rejects_malformed():
    good = codecs.png_encode(make_pixels(1))
    # corrupt one IDAT byte: CRC must catch it
    idat_pos = good.index(b"IDAT") + 4
    corrupt = good[:idat_pos] + bytes([good[idat_pos] ^ 0xFF]) + good[idat_pos + 1 :]
    for bad, msg in (
        (b"XX" + good[2:], "unknown|not a PNG"),
        (good[:20], "not a PNG|IHDR"),
        (corrupt, "CRC"),
    ):
        with pytest.raises(ValueError, match=msg):
            codecs.image_parse(bad)
    # unsupported layout: 16-bit depth
    ihdr_data = good[16:29]
    patched = bytearray(good)
    patched[24] = 16  # bit depth byte inside IHDR
    import struct as _s
    import zlib as _z

    _s.pack_into(
        ">I", patched, 29, _z.crc32(b"IHDR" + bytes(patched[16:29])) & 0xFFFFFFFF
    )
    assert ihdr_data[8] == 8
    with pytest.raises(ValueError, match="unsupported"):
        codecs.png_parse(bytes(patched))


def test_png_truncated_decodes_partial_rows():
    px = make_pixels(9)  # h=10
    h, w = px.shape[:2]
    # deterministic truncation: only the first h//2 scanlines present
    short = codecs.png_encode(px, rows_present=h // 2)
    w2, h2, decoded = codecs.png_parse(short)
    assert (w2, h2) == (w, h) and decoded.shape[0] == h // 2
    # PNG is top-down: the TOP rows survive (BMP keeps the bottom rows)
    assert np.array_equal(decoded, px[: h // 2])
    # container cut mid-chunk also degrades gracefully (complete rows
    # only, never an exception)
    cut = codecs.png_encode(px)[: len(codecs.png_encode(px)) - 20]
    w3, h3, partial = codecs.png_parse(cut)
    assert (w3, h3) == (w, h) and 0 <= partial.shape[0] <= h
    if partial.shape[0]:
        assert np.array_equal(partial, px[: partial.shape[0]])


def test_image_parse_dispatches_on_magic_bytes():
    px = make_pixels(2)
    for payload in (codecs.bmp_encode(px), codecs.png_encode(px)):
        w, h, decoded = codecs.image_parse(payload)
        assert np.array_equal(decoded, px)
    with pytest.raises(ValueError, match="unknown container"):
        codecs.image_parse(b"GIF89a....")


def test_media_features_real_png_kernel(spark):
    """decode_mode='png' featurizes decoded PIXELS through real
    decompression — dark and bright images separate by luma."""
    dark = np.zeros((8, 8, 3), dtype=np.uint8)
    bright = np.full((8, 8, 3), 250, dtype=np.uint8)
    rows = [
        ("dark", codecs.png_encode(dark), "png"),
        ("bright", codecs.png_encode(bright), "png"),
        ("broken", b"XX" + codecs.png_encode(dark)[2:], "png"),
    ]
    df = spark.createDataFrame(rows, IMAGES_DDL)
    got = {r.item_id: r for r in media_features(df, decode_mode="png").collect()}
    assert got["dark"].decode_status == "ok"
    assert got["dark"].feature[0] == pytest.approx(1.0)
    assert got["bright"].feature[FEATURE_BINS - 1] == pytest.approx(1.0)
    assert got["broken"].decode_status == "decode_failed"
    assert got["broken"].feature is None


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
    """Mixed BMP + PNG tier through ONE operator (per-row magic-byte
    dispatch): every row matches the numpy oracle."""
    df = images_frame(spark, 40)
    got = {r.item_id: r for r in image_features(df).collect()}
    assert len(got) == 40
    png_seen = bmp_seen = 0
    for i, (item_id, payload, mtype) in enumerate(image_rows(40)):
        r = got[item_id]
        assert mtype == ("png" if is_png_row(i) else "bmp")
        if i % 10 == 5:
            assert r.decode_status == "null_payload"
            continue
        if i % 10 == 3:
            assert r.decode_status == "decode_failed"
            continue
        png_seen += is_png_row(i)
        bmp_seen += not is_png_row(i)
        px = make_pixels(i)
        h, w = px.shape[:2]
        assert (r.width, r.height) == (w, h)
        if i % 10 == 7:
            assert r.decode_status == "truncated"
            assert 0 < r.rows_decoded == h // 2 < h
            # PNG scanlines are top-down (top rows survive); BMP pixel
            # rows are bottom-up (bottom rows survive)
            px = px[: h // 2] if is_png_row(i) else px[h - h // 2 :]
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
