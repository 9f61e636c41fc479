"""Multimodal payload plumbing: image / video / generic media columns.

Media are opaque ``binary`` columns with typed metadata, validated and
featurized through the same Arrow-batched path as audio.  The kernel
registry carries THREE genuine container formats decoded stdlib-only —
``"wav"`` (RIFF chunk walker, r4), ``"bmp"`` (24-bit BMP struct
walker, r5) and ``"png"`` (chunk CRCs + DEFLATE + per-row filter
reconstruction, r5) — plus the deterministic ``"fake"`` byte-level
stand-in; ``decode_mode="real"`` raises NotImplementedError at the
documented plug point (PIL / ffmpeg), which after r5 covers only
video.

Operators:
- :func:`media_features` — decode + feature-extract through the kernel
  registry: per-item feature vector + decode_status routing.
- :func:`image_features` — typed image featurization over real BMP
  payloads: declared dims vs rows actually decoded, luma mean/std,
  Shannon entropy; malformed payloads route to ``decode_failed``,
  truncated pixel regions to ``truncated``.
- :func:`frame_sample` — video frame sampling: every k-th fixed-size
  block as one "frame" row (one-to-many, the engine's UDTF-shaped op).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

FEATURE_BINS = 16

MEDIA_FEATURES_SCHEMA = (
    "item_id string, media_type string, n_bytes bigint, "
    "feature array<float>, decode_status string"
)
FRAME_SAMPLE_SCHEMA = "item_id string, frame_index int, frame_bytes binary"


def _fake_decode_feature(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for decode + feature extraction: the
    normalized histogram of byte values.  REAL plug point:
    PIL.Image.open(...) / torchvision transforms / ffmpeg."""
    if len(payload) == 0:
        return np.zeros(FEATURE_BINS, dtype=np.float32)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=FEATURE_BINS).astype(np.float32)
    return hist / hist.sum()


def _wav_decode_feature(payload: bytes) -> np.ndarray:
    """A REAL container decoder behind the same seam (r4): parse the
    RIFF/WAVE payload with the stdlib chunk walker and featurize the
    decoded SIGNAL (normalized |amplitude| histogram), not its bytes.
    Proves the plug-point contract with a genuine on-disk format —
    image/video kernels slot in identically once PIL/ffmpeg exist.
    Raises ValueError on malformed payloads (kernel maps it to
    decode_status='decode_failed')."""
    from .. import codecs

    pcm = codecs.decode(payload, "wav")
    if len(pcm) == 0:
        return np.zeros(FEATURE_BINS, dtype=np.float32)
    idx = np.minimum(
        (np.abs(pcm) * FEATURE_BINS).astype(np.int64), FEATURE_BINS - 1
    )
    hist = np.bincount(idx, minlength=FEATURE_BINS).astype(np.float32)
    return hist / hist.sum()


def _bmp_decode_feature(payload: bytes) -> np.ndarray:
    """A REAL image decoder behind the same seam (r5): parse the 24-bit
    BMP container with the stdlib struct walker (``codecs.bmp_parse``)
    and featurize the decoded PIXELS (normalized luma histogram), not
    their bytes.  With wav this makes the registry two genuine formats
    deep — the NotImplementedError plug point now covers only video.
    Raises ValueError on malformed payloads (-> decode_status=
    'decode_failed')."""
    from .. import codecs

    _w, _h, pixels = codecs.bmp_parse(payload)
    if pixels.size == 0:
        return np.zeros(FEATURE_BINS, dtype=np.float32)
    luma = codecs.bmp_luma(pixels)
    idx = np.minimum((luma * FEATURE_BINS).astype(np.int64), FEATURE_BINS - 1)
    hist = np.bincount(idx.ravel(), minlength=FEATURE_BINS).astype(np.float32)
    return hist / hist.sum()


def _png_decode_feature(payload: bytes) -> np.ndarray:
    """A REAL *compressed* image decoder behind the same seam (r5):
    parse the PNG container (chunk CRCs, DEFLATE inflate, per-row
    filter reconstruction — ``codecs.png_parse``) and featurize the
    decoded PIXELS (normalized luma histogram).  Third genuine format
    in the registry; unlike BMP the pixel bytes never appear verbatim
    in the payload, so this kernel cannot be faked by byte histograms.
    Raises ValueError on malformed payloads (-> decode_status=
    'decode_failed')."""
    from .. import codecs

    _w, _h, pixels = codecs.png_parse(payload)
    if pixels.size == 0:
        return np.zeros(FEATURE_BINS, dtype=np.float32)
    luma = codecs.bmp_luma(pixels)
    idx = np.minimum((luma * FEATURE_BINS).astype(np.int64), FEATURE_BINS - 1)
    hist = np.bincount(idx.ravel(), minlength=FEATURE_BINS).astype(np.float32)
    return hist / hist.sum()


_DECODE_KERNELS = {
    "fake": _fake_decode_feature,
    "wav": _wav_decode_feature,
    "bmp": _bmp_decode_feature,
    "png": _png_decode_feature,
}


def media_features(
    df: DataFrame,
    id_col: str = "item_id",
    media_col: str = "media",
    type_col: str = "media_type",
    decode_mode: str = "fake",
    n_partitions: int | None = None,
    salt: int = 0,
) -> DataFrame:
    """(item_id, media_type, n_bytes, feature, decode_status) per item.

    Same scale shape as the audio decoder: salted repartition, then an
    Arrow-batched kernel; payload stays zero-copy until the kernel.
    """
    if decode_mode == "real":
        raise NotImplementedError(
            "general-purpose IMAGE/VIDEO decode needs PIL/ffmpeg — not "
            "available in this environment; plug the real kernel into "
            "the _DECODE_KERNELS seam (same signature: bytes -> feature "
            "vector).  decode_mode='wav' (audio), 'bmp' and 'png' "
            "(image) demonstrate the seam with genuine container "
            "formats the repo CAN decode; only video lacks a real "
            "kernel."
        )
    if decode_mode not in _DECODE_KERNELS:
        raise ValueError(f"unknown decode_mode: {decode_mode}")
    decode_feature = _DECODE_KERNELS[decode_mode]

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        schema = pa.schema(
            [
                ("item_id", pa.string()),
                ("media_type", pa.string()),
                ("n_bytes", pa.int64()),
                ("feature", pa.list_(pa.float32())),
                ("decode_status", pa.string()),
            ]
        )
        for b in batches:
            ids = b.column("item_id").to_pylist()
            types = b.column("media_type").to_pylist()
            media = b.column("media")
            feats, nbytes, status = [], [], []
            for i in range(b.num_rows):
                if not media[i].is_valid:
                    feats.append(None)
                    nbytes.append(0)
                    status.append("null_payload")
                    continue
                payload = media[i].as_py()
                nbytes.append(len(payload))
                try:
                    feats.append(decode_feature(payload).tolist())
                    status.append("ok")
                except ValueError:
                    feats.append(None)
                    status.append("decode_failed")
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    pa.array(types, pa.string()),
                    pa.array(nbytes, pa.int64()),
                    pa.array(feats, pa.list_(pa.float32())),
                    pa.array(status, pa.string()),
                ],
                schema=schema,
            )

    sel = df.select(
        F.col(id_col).alias("item_id"),
        F.col(media_col).alias("media"),
        F.col(type_col).alias("media_type"),
    )
    n = int(n_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    salted = sel.repartition(n, F.xxhash64("item_id", F.lit(salt)))
    return salted.mapInArrow(kernel, schema=MEDIA_FEATURES_SCHEMA)


IMAGE_FEATURES_SCHEMA = (
    "item_id string, width int, height int, rows_decoded int, "
    "mean_luma double, std_luma double, entropy double, decode_status string"
)


def image_features(
    df: DataFrame,
    id_col: str = "item_id",
    media_col: str = "media",
    n_partitions: int | None = None,
    salt: int = 0,
) -> DataFrame:
    """Typed image features from REAL image payloads (r5 image tier) —
    BMP or PNG, dispatched per row on the container's magic bytes
    (``codecs.image_parse``), so a mixed tier needs no metadata trust.

    Per item: declared (width, height) from the header, rows actually
    decoded, Rec. 601 luma mean/std, and the Shannon entropy (bits) of
    the 256-level luma histogram.  decode_status:

    - ``ok``            full pixel region decoded
    - ``truncated``     header parsed but fewer complete rows present
                        (the image analogue of the audio dur-mismatch)
    - ``decode_failed`` malformed header / unsupported layout
    - ``null_payload``  NULL media column

    Same scale shape as the audio decoder: salted repartition on the id
    defuses payload-size skew before the Arrow-batched kernel.
    """

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from .. import codecs

        schema = pa.schema(
            [
                ("item_id", pa.string()),
                ("width", pa.int32()),
                ("height", pa.int32()),
                ("rows_decoded", pa.int32()),
                ("mean_luma", pa.float64()),
                ("std_luma", pa.float64()),
                ("entropy", pa.float64()),
                ("decode_status", pa.string()),
            ]
        )
        for b in batches:
            ids = b.column("item_id").to_pylist()
            media = b.column("media")
            out = {k: [] for k in ("w", "h", "rows", "mean", "std", "ent", "status")}
            for i in range(b.num_rows):
                if not media[i].is_valid:
                    for k, v in zip(out, (0, 0, 0, None, None, None, "null_payload")):
                        out[k].append(v)
                    continue
                try:
                    w, h, pixels = codecs.image_parse(media[i].as_py())
                except ValueError:
                    for k, v in zip(out, (0, 0, 0, None, None, None, "decode_failed")):
                        out[k].append(v)
                    continue
                rows = int(pixels.shape[0])
                if pixels.size:
                    luma = codecs.bmp_luma(pixels)
                    counts = np.bincount(
                        np.minimum((luma * 256).astype(np.int64), 255).ravel(),
                        minlength=256,
                    )
                    p = counts[counts > 0] / counts.sum()
                    ent = float(-(p * np.log2(p)).sum())
                    mean, std = float(luma.mean()), float(luma.std())
                else:
                    mean = std = ent = None
                status = "ok" if rows == h else "truncated"
                for k, v in zip(out, (w, h, rows, mean, std, ent, status)):
                    out[k].append(v)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.string()),
                    pa.array(out["w"], pa.int32()),
                    pa.array(out["h"], pa.int32()),
                    pa.array(out["rows"], pa.int32()),
                    pa.array(out["mean"], pa.float64()),
                    pa.array(out["std"], pa.float64()),
                    pa.array(out["ent"], pa.float64()),
                    pa.array(out["status"], pa.string()),
                ],
                schema=schema,
            )

    sel = df.select(F.col(id_col).alias("item_id"), F.col(media_col).alias("media"))
    n = int(n_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    salted = sel.repartition(n, F.xxhash64("item_id", F.lit(salt)))
    return salted.mapInArrow(kernel, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample(
    df: DataFrame,
    id_col: str = "item_id",
    media_col: str = "media",
    frame_bytes: int = 1024,
    every_k: int = 4,
) -> DataFrame:
    """One-to-many frame sampling (the UDTF-shaped op): every k-th
    fixed-size block of the payload as a frame row.  REAL plug point:
    ffmpeg keyframe extraction with the same (id, index, bytes) output."""

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        schema = pa.schema(
            [
                ("item_id", pa.string()),
                ("frame_index", pa.int32()),
                ("frame_bytes", pa.binary()),
            ]
        )
        for b in batches:
            ids = b.column("item_id").to_pylist()
            media = b.column("media")
            out_ids, out_idx, out_frames = [], [], []
            for i in range(b.num_rows):
                if not media[i].is_valid:
                    continue
                payload = media[i].as_py()
                n_frames = len(payload) // frame_bytes
                for fi in range(0, n_frames, every_k):
                    out_ids.append(ids[i])
                    out_idx.append(fi)
                    out_frames.append(payload[fi * frame_bytes : (fi + 1) * frame_bytes])
            if out_ids:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_ids, pa.string()),
                        pa.array(out_idx, pa.int32()),
                        pa.array(out_frames, pa.binary()),
                    ],
                    schema=schema,
                )

    sel = df.select(F.col(id_col).alias("item_id"), F.col(media_col).alias("media"))
    return sel.mapInArrow(kernel, schema=FRAME_SAMPLE_SCHEMA)
