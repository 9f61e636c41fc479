"""Time-shift-robust near-dup: trimmed / offset copies.

The whole-clip fingerprint (``.dedup``) is defeated by a trim: cutting
N samples off the front shifts every energy frame.  This module detects
"clip B is a (re-encoded, re-gained) SEGMENT of clip A" — the re-cut /
concatenation duplication mode — with machinery that is invariant to
sample offset:

- **Candidates: spectral-peak signatures.**  Per seconds-based window
  (default 250 ms, hop = half window): Hann -> |rfft| -> top-3 peak
  bins, quantized in ABSOLUTE Hz (so differing sample rates of the
  same recording still collide; seconds-based windows keep coverage
  sr-independent).  Clips shorter than one window emit nothing — size
  ``window_s`` to the corpus.  A window's dominant frequencies don't care where the
  window grid falls, so a copy trimmed at ANY offset shares signatures
  with its source (verified against energy-delta anchor schemes, which
  lose alignment on grid shift).  Clips sharing >= ``min_shared``
  signatures are candidates; the frame shuffles only (id, sig) rows.
- **Verification: best-lag normalized correlation via FFT.**  One
  rfft/irfft cross-correlation per candidate pair gives the correlation
  at EVERY lag in O((n+m) log(n+m)); per-lag overlap norms come from
  two cumulative sums, so the reported corr is the true normalized
  correlation of the overlapping segments at the best lag — exact for
  a verbatim slice (corr = 1, lag = the trim offset).

Scale shape: signatures are computed scan-side in one decode pass
(payloads never shuffle); candidate volume is bounded by signature
bucket sizes with the same salting guard as the banded path; pair
verification fetches only candidate payloads (targeted In-pushdown /
broadcast fallback, as in ``.dedup.verify_pairs_pcm``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..checks.audio import _decode_np
from .dedup import _fetch_pair_payloads

SPECTRAL_WINDOW_S = 0.25  # analysis window in SECONDS (sr-independent
                          # coverage: a fixed sample count is 512 ms at
                          # 8 kHz but 85 ms at 48 kHz, and the same
                          # recording at two rates would never collide)
SPECTRAL_TOPK = 3         # peak bins per window
FREQ_QUANT_HZ = 8.0       # absolute-Hz quantization of peak frequencies
MIN_WINDOW_SAMPLES = 16   # floor for the finest multi-resolution scale


def _spectral_sigs(
    pcm: np.ndarray,
    sr: int,
    window_s: float = SPECTRAL_WINDOW_S,
    max_scales: int = 1,
) -> set[str]:
    """Shift-invariant signature set for one decoded clip.

    Multi-resolution (VERDICT r3 #7): signatures are emitted at a
    LADDER of scales — scale s uses window ``window_s / 2**s`` — for
    every scale 0..max_scales-1 whose window fits the clip (and is at
    least MIN_WINDOW_SAMPLES).  Sigs are tagged ``<scale>:...`` so only
    same-scale signatures collide; a LONG source emits every scale, so
    a short trimmed copy that only fits the finer windows still shares
    its scale's sigs with the source.  Per-scale FFT work is roughly
    constant (windows double in count but halve in size), so
    ``max_scales=k`` costs ~k of the single-scale pass.

    With max_scales=1 (default), clips shorter than one window emit
    nothing — :func:`containment_coverage` makes that skipped
    population visible so the gap is an explicit metric, not a silent
    hole.  Fine scales trade frequency resolution for coverage: below
    ~FREQ_QUANT_HZ resolution the quantization gets coarser (more
    spurious collisions — the verifier gates them) and cross-sample-rate
    collisions weaken; cross-sr containment is a scale-0 feature.
    """
    if not sr:
        return set()
    n = len(pcm)
    x = None
    sigs: set[str] = set()
    for scale in range(max(1, max_scales)):
        w = int(sr * window_s) >> scale
        if w < MIN_WINDOW_SAMPLES:
            break
        if n < w:
            continue
        if x is None:
            x = pcm.astype(np.float64)
        nfft = 1 << (w - 1).bit_length()  # zero-pad to pow2 for FFT speed
        hann = np.hanning(w)
        for start in range(0, n - w + 1, w // 2):
            mag = np.abs(np.fft.rfft(x[start : start + w] * hann, nfft))
            peaks = np.argsort(mag)[-SPECTRAL_TOPK:]
            qf = sorted(
                int(round(p * sr / nfft / FREQ_QUANT_HZ)) for p in peaks
            )
            sigs.add(f"{scale}:" + "-".join(str(q) for q in qf))
    return sigs


def containment_coverage(
    clips: DataFrame,
    window_s: float = SPECTRAL_WINDOW_S,
    max_scales: int = 1,
    sr_col: str = "sr_hz",
    dur_col: str = "dur_ms",
) -> DataFrame:
    """One row: (clips, covered, short_clips_skipped, coverage) — how
    much of the corpus the shingle stage can see at this geometry.

    Fully native (derived from sr/dur, no decode): a clip is covered iff
    it fits ANY scale's window, using the kernel's EXACT integer
    geometry (``int(sr * window_s) >> scale``, scale skipped below
    MIN_WINDOW_SAMPLES) — a probe that disagreed with what the shingle
    stage actually emits would misattribute the gap it exists to
    surface.  Run this before a containment job to size
    ``window_s``/``max_scales`` to the corpus — the sf0.01 probe that
    motivated multi-resolution found only ~1% of clips exceeded the
    single 250 ms window."""
    n_samples = F.col(sr_col).cast("double") * F.col(dur_col) / 1000.0
    fits_any = F.lit(False)
    for scale in range(max(1, max_scales)):
        # mirror _spectral_sigs: w = int(sr * window_s) >> scale
        w = F.floor(F.col(sr_col).cast("double") * F.lit(window_s)).cast(
            "long"
        ) / F.lit(1 << scale)
        w = F.floor(w)
        fits_any = fits_any | ((w >= MIN_WINDOW_SAMPLES) & (n_samples >= w))
    covered = (fits_any & F.col(sr_col).isNotNull()).cast("int")
    return clips.agg(
        F.count("*").cast("bigint").alias("clips"),
        F.sum(covered).cast("bigint").alias("covered"),
        (F.count("*") - F.sum(covered)).cast("bigint").alias("short_clips_skipped"),
        F.round(F.sum(covered) / F.greatest(F.count("*"), F.lit(1)), 4).alias(
            "coverage"
        ),
    )


def audio_spectral_shingles(
    clips: DataFrame,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    salted: bool = True,
    n_partitions: int | None = None,
    salt: int = 41,
    window_s: float = SPECTRAL_WINDOW_S,
    max_scales: int = 1,
) -> DataFrame:
    """(id, sig) distinct spectral signatures, decoded scan-side.
    ``max_scales`` > 1 adds finer scale-tagged windows for short-clip
    coverage (see :func:`_spectral_sigs`)."""

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ids = b.column("id")
            payloads = b.column("payload")
            codecs_ = b.column("codec").to_pylist()
            srs = b.column("sr").to_pylist()
            out_id: list[str] = []
            out_sig: list[str] = []
            for i in range(b.num_rows):
                pcm = _decode_np(payloads[i].as_py(), codecs_[i])
                if pcm is None:
                    continue
                cid = ids[i].as_py()
                for sig in _spectral_sigs(pcm, srs[i] or 0, window_s, max_scales):
                    out_id.append(cid)
                    out_sig.append(sig)
            if out_id:
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(out_id, type=pa.string()),
                        pa.array(out_sig, type=pa.string()),
                    ],
                    names=["id", "sig"],
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
    return src.mapInArrow(kernel, "id string, sig string")


def spectral_candidates(
    sh: DataFrame,
    min_shared: int = 1,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """(id_a, id_b) pairs sharing >= min_shared spectral signatures —
    same bucket-count filter + mega-bucket salting as the banded path
    (a single dominant frequency shared corpus-wide is the silence/tone
    mega-bucket all over again)."""
    counts = sh.groupBy("sig").agg(F.count("*").alias("n"))
    joined = sh.join(counts.where(F.col("n") > 1), "sig")
    if max_bucket_size:
        n_sub = F.ceil(F.col("n") / max_bucket_size).cast("bigint")
        salted_sig = F.when(
            F.col("n") > max_bucket_size,
            F.concat_ws(
                "#",
                F.col("sig"),
                F.pmod(F.xxhash64("id"), n_sub).cast("string"),
            ),
        ).otherwise(F.col("sig"))
        joined = joined.withColumn("sig", salted_sig)
    a = joined.select("sig", F.col("id").alias("id_a"))
    b = joined.select("sig", F.col("id").alias("id_b"))
    return (
        a.join(b, "sig")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_sigs"))
        .where(F.col("shared_sigs") >= min_shared)
        .select("id_a", "id_b")
    )


def _best_offset_corr(
    a: np.ndarray, b: np.ndarray, min_overlap: int
) -> tuple[float, int, int]:
    """(corr, lag, overlap): normalized correlation of the overlapping
    segments at the best lag, via one FFT cross-correlation.  lag k
    means b[0] aligns with a[k] (b is a slice of a at offset lag when
    corr ~ 1)."""
    la, lb = len(a), len(b)
    nfft = 1 << int(la + lb - 1).bit_length()
    fa = np.fft.rfft(a, nfft)
    fb = np.fft.rfft(b, nfft)
    xc = np.fft.irfft(fa * np.conj(fb), nfft)
    lags = np.concatenate([np.arange(0, la), np.arange(-(lb - 1), 0)])
    vals = np.concatenate([xc[:la], xc[nfft - (lb - 1) :]])
    ca = np.concatenate([[0.0], np.cumsum(a * a)])
    cb = np.concatenate([[0.0], np.cumsum(b * b)])
    k = lags
    a_lo = np.maximum(0, k)
    a_hi = np.minimum(la, lb + k)
    b_lo = np.maximum(0, -k)
    b_hi = np.minimum(lb, la - k)
    overlap = a_hi - a_lo
    na = ca[a_hi] - ca[a_lo]
    nb = cb[b_hi] - cb[b_lo]
    denom = np.sqrt(na * nb)
    valid = (overlap >= min_overlap) & (denom > 0)
    corr = np.where(valid, vals / np.maximum(denom, 1e-300), -np.inf)
    i = int(np.argmax(corr))
    return float(corr[i]), int(lags[i]), int(overlap[i])


def verify_containment_pairs(
    pairs: DataFrame,
    clips: DataFrame,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    min_corr: float = 0.9,
    min_overlap_s: float = 0.25,
    max_fetch_ids: int = 1_000,
) -> DataFrame:
    """(id_a, id_b, corr, lag_samples, overlap_s) for candidate pairs
    whose best-lag overlapping correlation passes the gates.

    Mismatched sample rates are handled: side b is linearly resampled
    to side a's rate before correlating (the absolute-Hz signatures
    deliberately let an 8 kHz and a 16 kHz copy of the same recording
    collide — the verifier must not then reject them for comparing raw
    streams in different timebases).  ``lag_samples`` and ``overlap_s``
    are reported in side a's timebase."""
    both = _fetch_pair_payloads(
        pairs,
        clips,
        id_col,
        {"payload": payload_col, "codec": codec_col, "sr": sr_col},
        max_fetch_ids=max_fetch_ids,
    )

    def kernel(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for b in batches:
            ida = b.column("id_a")
            idb = b.column("id_b")
            pa_ = b.column("payload_a")
            pb_ = b.column("payload_b")
            ca = b.column("codec_a").to_pylist()
            cb = b.column("codec_b").to_pylist()
            sra = b.column("sr_a").to_pylist()
            srb = b.column("sr_b").to_pylist()
            rows: list[tuple[str, str, float, int, float]] = []
            for i in range(b.num_rows):
                x = _decode_np(pa_[i].as_py(), ca[i])
                y = _decode_np(pb_[i].as_py(), cb[i])
                sr = sra[i] or 0
                sr_b = srb[i] or 0
                if x is None or y is None or not sr or not sr_b:
                    continue
                if sr_b != sr and len(y) > 1:
                    # linear resample of b into a's timebase
                    dur_b = len(y) / sr_b
                    t_new = np.arange(int(dur_b * sr)) / sr
                    t_old = np.arange(len(y)) / sr_b
                    y = np.interp(t_new, t_old, y.astype(np.float64))
                min_ov = int(min_overlap_s * sr)
                if len(x) < min_ov or len(y) < min_ov:
                    continue
                corr, lag, overlap = _best_offset_corr(
                    x.astype(np.float64), y.astype(np.float64), min_ov
                )
                rows.append(
                    (ida[i].as_py(), idb[i].as_py(), corr, lag, overlap / sr)
                )
            if rows:
                cols = list(zip(*rows))
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(cols[0], type=pa.string()),
                        pa.array(cols[1], type=pa.string()),
                        pa.array(cols[2], type=pa.float64()),
                        pa.array(cols[3], type=pa.int64()),
                        pa.array(cols[4], type=pa.float64()),
                    ],
                    names=["id_a", "id_b", "corr", "lag_samples", "overlap_s"],
                )

    scored = both.mapInArrow(
        kernel,
        "id_a string, id_b string, corr double, lag_samples bigint, overlap_s double",
    )
    return scored.where(F.col("corr") >= min_corr)


def audio_containment_pairs(
    clips: DataFrame,
    min_shared: int = 1,
    max_bucket_size: int | None = 64,
    min_corr: float = 0.9,
    min_overlap_s: float = 0.25,
    window_s: float = SPECTRAL_WINDOW_S,
    max_scales: int = 1,
    id_col: str = "clip_id",
    payload_col: str = "bytes",
    codec_col: str = "codec",
    sr_col: str = "sr_hz",
    **shingle_kwargs,
) -> DataFrame:
    """End-to-end trimmed-copy detection: spectral shingles -> shared-sig
    candidates -> best-lag correlation verify.

    Column names route to BOTH stages; extra keyword arguments
    (``salted`` / ``n_partitions`` / ``salt``) go to the shingle stage
    only.  The signature and candidate frames are persisted because the
    verify stage's id collect and the returned plan each reference them
    (the decode / pair aggregation would otherwise re-run); they stay
    cached for the life of the returned DataFrame.
    """
    cols = dict(
        id_col=id_col, payload_col=payload_col, codec_col=codec_col, sr_col=sr_col
    )
    sh = audio_spectral_shingles(
        clips, window_s=window_s, max_scales=max_scales, **cols, **shingle_kwargs
    ).persist()
    cands = spectral_candidates(
        sh, min_shared=min_shared, max_bucket_size=max_bucket_size
    ).persist()
    result = verify_containment_pairs(
        cands,
        clips,
        min_corr=min_corr,
        min_overlap_s=min_overlap_s,
        **cols,
    )
    # the verify id-collect above materialized cands; the signature
    # frame is no longer referenced by the returned plan
    sh.unpersist()
    return result
