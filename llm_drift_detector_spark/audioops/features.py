"""Per-clip PCM feature extraction + audio feature drift.

The reference profiles only text/latency features
(``data/processor.py:200-253``); at the audio tier the payload itself
needs quality profiling — loudness, silence, clipping — both for
filtering (drop silent/clipped clips from a training set) and for drift
(a provider swapping its recording chain shifts RMS/ZCR long before
transcripts change).

Execution: one scan -> (salted repartition) -> mapInArrow decode pass
per table; the emitted frame is a handful of doubles per clip, so every
downstream consumer — the stats profiler, the fused drift detectors,
filters — runs on ~100 B/row regardless of payload size.  Feature drift
is therefore: this pass on ref + cur, then the existing ONE-JOB
multi-feature detector (``drift/grouped.py::multi_feature_drift``) —
N features cost one feature's shuffles, nothing new to optimize.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..checks.audio import _decode_np
from ..drift.grouped import multi_feature_drift

SILENCE_ABS = 1e-3    # |sample| below this counts as silence
CLIP_ABS = 0.999      # |sample| at/above this counts as clipped

FEATURE_COLS = (
    "rms",
    "peak",
    "silence_ratio",
    "clipping_ratio",
    "zcr_per_s",
    "duration_s",
    "hf_energy_ratio",
)

_OUT_DDL = (
    "clip_id string, decode_ok boolean, n_samples bigint, duration_s double, "
    "rms double, peak double, silence_ratio double, clipping_ratio double, "
    "zcr_per_s double, hf_energy_ratio double"
)


def _features_np(pcm: np.ndarray, sr: int) -> tuple:
    x = pcm.astype(np.float64)
    n = len(x)
    dur = n / sr if sr else float("nan")
    ax = np.abs(x)
    zc = int(np.count_nonzero(np.signbit(x[1:]) != np.signbit(x[:-1])))
    # spectral energy above sr/4 relative to total: genuinely-recorded
    # audio has SOME high-band content, while audio upsampled from a
    # lower rate (fake "high-res") rolls off to ~0 — a QA/drift signal
    # the time-domain features can't see.  One rfft per clip.
    if n >= 8:
        mag2 = np.abs(np.fft.rfft(x)) ** 2
        total = float(mag2.sum())
        hf = float(mag2[len(mag2) // 2 :].sum()) / total if total > 0 else 0.0
    else:
        hf = float("nan")
    return (
        n,
        dur,
        float(np.sqrt(np.mean(x * x))),
        float(ax.max()),
        float(np.mean(ax < SILENCE_ABS)),
        float(np.mean(ax >= CLIP_ABS)),
        (zc / dur) if dur and dur > 0 else float("nan"),
        hf,
    )


def audio_features(
    clips: DataFrame,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    salted: bool = True,
    n_partitions: int | None = None,
    salt: int = 29,
) -> DataFrame:
    """(clip_id, decode_ok, n_samples, duration_s, rms, peak,
    silence_ratio, clipping_ratio, zcr_per_s, hf_energy_ratio) — one
    decode per clip.

    Undecodable payloads emit ``decode_ok = false`` with null features
    (kept, not dropped: a decode-failure RATE is itself a drift signal).
    """

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("id")
            payloads = b.column("payload")
            codecs_ = b.column("codec").to_pylist()
            srs = b.column("sr").to_pylist()
            rows = []
            for i in range(b.num_rows):
                pcm = _decode_np(payloads[i].as_py(), codecs_[i])
                cid = ids[i].as_py()
                if pcm is None or len(pcm) == 0:
                    rows.append((cid, False) + (None,) * 8)
                else:
                    rows.append((cid, True) + _features_np(pcm, srs[i] or 0))
            if rows:
                cols = list(zip(*rows))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(cols[0], type=pa.string()),
                        pa.array(cols[1], type=pa.bool_()),
                        pa.array(cols[2], type=pa.int64()),
                        pa.array(cols[3], type=pa.float64()),
                        pa.array(cols[4], type=pa.float64()),
                        pa.array(cols[5], type=pa.float64()),
                        pa.array(cols[6], type=pa.float64()),
                        pa.array(cols[7], type=pa.float64()),
                        pa.array(cols[8], type=pa.float64()),
                        pa.array(cols[9], type=pa.float64()),
                    ],
                    names=[
                        "clip_id",
                        "decode_ok",
                        "n_samples",
                        "duration_s",
                        "rms",
                        "peak",
                        "silence_ratio",
                        "clipping_ratio",
                        "zcr_per_s",
                        "hf_energy_ratio",
                    ],
                )

    src = clips.select(
        F.col(id_col).alias("id"),
        F.col(payload_col).alias("payload"),
        F.col(codec_col).alias("codec"),
        F.col(sr_col).alias("sr"),
    )
    if salted:
        n = int(
            n_partitions
            or clips.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        src = src.repartition(n, F.xxhash64("id", F.lit(salt)))
    return src.mapInArrow(kernel, _OUT_DDL)


def audio_quality_violations(
    clips: DataFrame,
    max_silence_ratio: float | None = None,
    max_clipping_ratio: float | None = None,
    min_rms: float | None = None,
    **feature_kwargs,
) -> DataFrame:
    """(clip_id, check_name='audio_quality', detail) rows for clips that
    decode fine but are unusable as training data: silence-dominated,
    clipped, or effectively empty.

    A quality GATE, not a reference invariant — the validator's opt-in
    check (``RunConfig.enabled_checks``); decode failures are excluded
    here because ``dur_ms_mismatch`` owns them (disjoint classes, same
    rule as the SNR check).  One decode pass; the filter and the detail
    JSON are native expressions over the tiny feature frame.
    """
    from ..config import MAX_CLIPPING_RATIO, MAX_SILENCE_RATIO, MIN_RMS

    max_sil = MAX_SILENCE_RATIO if max_silence_ratio is None else max_silence_ratio
    max_clip = MAX_CLIPPING_RATIO if max_clipping_ratio is None else max_clipping_ratio
    lo_rms = MIN_RMS if min_rms is None else min_rms

    f = audio_features(clips, **feature_kwargs).where("decode_ok")
    reasons = F.filter(
        F.array(
            F.when(F.col("silence_ratio") > max_sil, F.lit("silence")),
            F.when(F.col("clipping_ratio") > max_clip, F.lit("clipping")),
            F.when(F.col("rms") < lo_rms, F.lit("low_rms")),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        f.withColumn("reasons", reasons)
        .where(F.size("reasons") > 0)
        .select(
            "clip_id",
            F.lit("audio_quality").alias("check_name"),
            F.to_json(
                F.struct(
                    F.col("reasons"),
                    F.round("rms", 6).alias("rms"),
                    F.round("silence_ratio", 6).alias("silence_ratio"),
                    F.round("clipping_ratio", 6).alias("clipping_ratio"),
                )
            ).alias("detail"),
        )
    )


def audio_feature_drift(
    ref: DataFrame,
    cur: DataFrame,
    features: list[str] | None = None,
    exact: bool = False,
    group_keys: list[str] | None = None,
    id_col: str = "clip_id",
    **kwargs,
) -> DataFrame:
    """Distribution drift over decoded-PCM features, one row per feature
    (x group when ``group_keys`` names clip columns, e.g. codec or a
    provider id — the whole per-group-per-feature sweep stays ONE job,
    like the text-side detectors).

    Two decode passes (one per side) feed the existing stacked one-job
    detector; decode failures are excluded from the distributions (their
    rate is monitored by the validator, not the drift layer).  Group
    columns rejoin the feature frame on the id — a key-projected join of
    two slim frames, never payloads.
    """
    cols = list(features or FEATURE_COLS)
    gk = list(group_keys or [])

    def side(df: DataFrame) -> DataFrame:
        f = audio_features(df, id_col=id_col).where("decode_ok")
        if gk:
            f = f.join(
                df.select(F.col(id_col).alias("clip_id"), *gk), "clip_id"
            )
        # NaN -> null so the detectors' null filters drop them: a null/0
        # sr_hz yields NaN zcr/duration (and n<8 yields NaN hf ratio)
        # even when the payload decodes, and Spark sorts NaN ABOVE every
        # double — left in, they pile into the top histogram bin and
        # fabricate (or mask) drift
        return f.select(
            *gk,
            *[
                F.nanvl(F.col(c), F.lit(None).cast("double")).alias(c)
                for c in cols
            ],
        )

    return multi_feature_drift(
        side(ref), side(cur), cols, exact=exact, group_keys=gk or None, **kwargs
    )
