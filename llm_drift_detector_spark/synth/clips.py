"""Deterministic synthetic clips / transcripts generator (FIXTURES.md).

Every row is a pure function of ``(seed, index, params)`` so generation is
deterministic under ANY Spark partitioning — the generator runs as
``spark.range(n).mapInPandas(...)`` and two runs (or two cluster sizes)
produce identical tables.  Violations are injected at fixed index classes
(mod rules below) so tests can compute the exact expected violation set
without reading the data.

Index classes (disjoint by construction; FIXTURES.md §1-2 rates ~0.1%):

====================  ==================  ================================
rule                  violation           effect
====================  ==================  ================================
i % 1000 == 7, i>0    uniqueness          row is a full copy of row i-1
i % 1000 == 13        sr_hz_domain        sr_hz = 12345 (signal generated
                                          at 12345 Hz so dur stays valid)
i % 1000 == 17        dur_ms_mismatch     payload truncated to ~60%
i % 2000 == 19        snr_allclose        high bytes of 10% of samples
                                          XOR-corrupted (pcm_s16le forced)
i % 1000 == 23        codec_whitelist     codec = 'mp3_unknown'
i % 1000 == 29        referential_clip_orphan        transcript row omitted
i % 1000 == 31        referential_transcript_orphan  ghost transcript added
i % 2000 == 37        transcript_equality transcript mutated in transcripts
====================  ==================  ================================

Reference lineage: the row shape mirrors the reference's ``LLMSample``
(``data/collector.py:26-48``) with prompt/response -> transcript and the
numeric drift features carried by dur_ms / sr_hz; the drift-window shifts
in :func:`drift_params` mirror the detector thresholds the reference ships
(``config/default_config.py:126-134``).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, replace
from typing import Iterator

import numpy as np
import pandas as pd

from .. import codecs

SEED = 42
EMBED_DIM = 32

# base vocabulary (fixed; seeded token sequences per FIXTURES.md §1)
VOCAB = (
    "audio clip sample rate codec stream frame buffer signal noise "
    "speech music silence tone pitch tempo beat echo reverb filter "
    "gain level peak wave band mix track channel stereo mono loud "
    "soft fast slow high low deep thin warm cold clean rough"
).split()
# alternate vocabulary for the vocab-swap drift window (reversed forms —
# must survive the detector's lowercasing tokenizer, unlike upcased words)
VOCAB_ALT = tuple(w[::-1] for w in VOCAB)

SR_CHOICES = np.array([8000, 16000, 22050, 44100, 48000])
CODEC_CHOICES = ("pcm_s16le", "flac", "opus")
# wav overlay: rows with i % 7 == 0 carry a REAL RIFF/WAVE container
# (codecs._wav_encode) instead of the drawn codec.  Applied AFTER the rng
# draw so every other field keeps its pre-wav value, and 7 ∤ 1000 so each
# mod-1000 violation class gets a wav/non-wav mix (e.g. 9 of the 60
# truncated-payload rows at sf0.01 are wav).
WAV_EVERY = 7


@dataclass(frozen=True)
class SynthParams:
    n_rows: int
    seed: int = SEED
    # sandbox-scaled durations: log-normal, median ~40 ms, tail ~4 s.
    # (FIXTURES.md nominal median is 3000 ms; scaled down so sf0.1 fits on
    # disk — the log-normal SHAPE, and hence the skew behavior, is kept.)
    dur_median_ms: float = 40.0
    dur_sigma: float = 0.8
    dur_max_ms: float = 4000.0
    inject_violations: bool = True
    # drift knobs (FIXTURES.md §3)
    dur_shift: float = 1.0        # multiplicative mean shift on dur_ms
    vocab_swap_frac: float = 0.0  # fraction of token positions swapped
    embed_rot: float = 0.0        # rotation angle (radians) on embeddings


def drift_params(base: SynthParams, kind: str) -> SynthParams:
    """Current-window parameterizations for two-sample drift tests."""
    if kind == "mean_shift":
        return replace(base, dur_shift=1.25, seed=base.seed + 1, inject_violations=False)
    if kind == "vocab_swap":
        return replace(base, vocab_swap_frac=0.30, seed=base.seed + 1, inject_violations=False)
    if kind == "embed_rot":
        return replace(base, embed_rot=0.90, seed=base.seed + 1, inject_violations=False)
    if kind == "null":  # same distribution, new seed — false-positive guard
        return replace(base, seed=base.seed + 1, inject_violations=False)
    raise ValueError(kind)


# --- pure per-index row functions -------------------------------------------


def _rng(seed: int, i: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, i]))


def make_pcm(seed: int, i: int, sr: int, n_samples: int) -> np.ndarray:
    """Clean float32 signal for row i: sine + noise, params from rng(i)."""
    rng = _rng(seed * 2 + 1, i)
    f = float(rng.uniform(100.0, min(3000.0, 0.4 * sr)))
    phase = float(rng.uniform(0, 2 * math.pi))
    t = np.arange(n_samples, dtype=np.float64) / sr
    pcm = 0.6 * np.sin(2 * math.pi * f * t + phase)
    pcm += 0.05 * rng.standard_normal(n_samples)
    return np.clip(pcm, -1.0, 1.0).astype(np.float32)


def _base_fields(p: SynthParams, i: int) -> dict:
    """Clean (pre-injection) row content for index i."""
    rng = _rng(p.seed, i)
    sr = int(SR_CHOICES[rng.integers(0, len(SR_CHOICES))])
    # log-normal duration; dur_shift moves the mean for drift windows
    mu = math.log(p.dur_median_ms)
    dur_raw = float(np.exp(rng.normal(mu, p.dur_sigma))) * p.dur_shift
    dur_raw = min(max(dur_raw, 5.0), p.dur_max_ms)
    codec = CODEC_CHOICES[int(rng.integers(0, len(CODEC_CHOICES)))]
    if i % WAV_EVERY == 0:
        codec = "wav"
    n_tok = int(3 + min(dur_raw, 2000.0) // 20)
    tok_idx = rng.integers(0, len(VOCAB), size=n_tok)
    if p.vocab_swap_frac > 0.0:
        swap = rng.random(n_tok) < p.vocab_swap_frac
        toks = [
            VOCAB_ALT[j] if s else VOCAB[j]
            for j, s in zip(tok_idx.tolist(), swap.tolist())
        ]
    else:
        toks = [VOCAB[j] for j in tok_idx.tolist()]
    return {
        "clip_id": f"clip-{p.seed}-{i:012d}",
        "sr_hz": sr,
        "dur_raw": dur_raw,
        "codec": codec,
        "transcript": " ".join(toks),
        "tok_idx": tok_idx,
    }


def make_clean_row(p: SynthParams, i: int) -> dict:
    """Fully materialized clean row (reference-window semantics)."""
    b = _base_fields(p, i)
    sr = b["sr_hz"]
    n_samples = max(1, round(sr * b["dur_raw"] / 1000.0))
    dur_ms = round(n_samples * 1000.0 / sr)
    pcm = make_pcm(p.seed, i, sr, n_samples)
    payload = codecs.encode(pcm, b["codec"], sr_hz=sr)
    return {
        "clip_id": b["clip_id"],
        "bytes": payload,
        "sr_hz": sr,
        "dur_ms": int(dur_ms),
        "codec": b["codec"],
        "transcript": b["transcript"],
        "tok_idx": b["tok_idx"],
    }


def make_clip_row(p: SynthParams, i: int) -> dict:
    """Row for the `clips` table: clean content + injected violations."""
    if not p.inject_violations:
        r = make_clean_row(p, i)
        r.pop("tok_idx")
        return r
    if i % 1000 == 7 and i > 0:  # uniqueness: full duplicate of i-1
        r = make_clean_row(p, i - 1)
        r.pop("tok_idx")
        return r

    b = _base_fields(p, i)
    sr, codec = b["sr_hz"], b["codec"]
    if i % 1000 == 13:
        sr = 12345  # out-of-domain, but signal generated at 12345 Hz
    if i % 2000 == 19:
        codec = "pcm_s16le"  # byte-aligned so corruption decodes (low SNR)
    n_samples = max(1, round(sr * b["dur_raw"] / 1000.0))
    dur_ms = round(n_samples * 1000.0 / sr)
    pcm = make_pcm(p.seed, i, sr, n_samples)
    payload = codecs.encode(pcm, codec, sr_hz=sr)
    if i % 1000 == 17:  # truncated payload -> dur_ms mismatch
        payload = payload[: max(2, int(len(payload) * 0.6))]
    if i % 2000 == 19:  # corrupt high byte of every 20th sample -> SNR << 30
        buf = bytearray(payload)
        for off in range(1, len(buf), 20 * 2):
            buf[off] ^= 0x55
        payload = bytes(buf)
    if i % 1000 == 23:
        codec = "mp3_unknown"  # whitelist violation; payload left as-is
    return {
        "clip_id": b["clip_id"],
        "bytes": payload,
        "sr_hz": int(sr),
        "dur_ms": int(dur_ms),
        "codec": codec,
        "transcript": b["transcript"],
    }


def _embed_matrix() -> np.ndarray:
    """Fixed random projection VOCAB -> EMBED_DIM (seeded, module-level)."""
    rng = np.random.default_rng(1234)
    m = rng.standard_normal((len(VOCAB), EMBED_DIM))
    return (m / np.linalg.norm(m, axis=1, keepdims=True)).astype(np.float32)


_PROJ = _embed_matrix()


def embed_tokens(tok_idx: np.ndarray, rot: float = 0.0) -> np.ndarray:
    """Deterministic dim-32 embedding = normalized projected token counts."""
    counts = np.bincount(tok_idx, minlength=len(VOCAB)).astype(np.float32)
    v = counts @ _PROJ
    n = float(np.linalg.norm(v))
    if n > 0:
        v = v / n
    if rot != 0.0:  # global rotation: angle `rot` in every (2k, 2k+1)
        # plane — moves the whole cloud (and centroid) by ~1-cos(rot)
        c, s = math.cos(rot), math.sin(rot)
        v = v.reshape(-1, 2) @ np.array([[c, s], [-s, c]], dtype=np.float32)
        v = v.reshape(-1)
    return v.astype(np.float32)


def make_transcript_rows(p: SynthParams, i: int) -> list[dict]:
    """Rows for the `transcripts` table for clip index i (0, 1 or 2 rows)."""
    rows: list[dict] = []
    if p.inject_violations and i % 1000 == 7 and i > 0:
        return rows  # the duplicate clip reuses i-1's transcript row
    if p.inject_violations and i % 1000 == 29:
        return rows  # omitted -> orphan clip
    b = _base_fields(p, i)
    transcript = b["transcript"]
    if p.inject_violations and i % 2000 == 37:
        transcript = transcript + " MUTATED"
    rows.append(
        {
            "clip_id": b["clip_id"],
            "transcript": transcript,
            "embedding": embed_tokens(b["tok_idx"], p.embed_rot),
        }
    )
    if p.inject_violations and i % 1000 == 31:  # ghost transcript
        rng = _rng(p.seed + 9, i)
        ghost_idx = rng.integers(0, len(VOCAB), size=8)
        rows.append(
            {
                "clip_id": f"ghost-{p.seed}-{i:012d}",
                "transcript": " ".join(VOCAB[j] for j in ghost_idx.tolist()),
                "embedding": embed_tokens(ghost_idx, p.embed_rot),
            }
        )
    return rows


# --- expected violation sets (for golden tests) ------------------------------


def expected_violations(p: SynthParams) -> dict[str, set[str]]:
    """check_name -> set of clip_ids that MUST appear in `violations`."""
    n = p.n_rows
    cid = lambda i: f"clip-{p.seed}-{i:012d}"  # noqa: E731
    out = {
        "uniqueness": {cid(i - 1) for i in range(n) if i % 1000 == 7 and i > 0},
        "sr_hz_domain": {cid(i) for i in range(n) if i % 1000 == 13},
        "dur_ms_mismatch": {cid(i) for i in range(n) if i % 1000 == 17},
        # i%2000==19: corrupted samples (SNR << 30 dB).  i%1000==13: the
        # signal is generated at the out-of-domain 12345 Hz, so its PCM
        # length differs from the clean reference row's -> the decoder
        # emits snr_allclose {error: ref_length_mismatch} (a genuine
        # current/reference divergence; see checks/audio._snr_violation).
        "snr_allclose": {
            cid(i) for i in range(n) if i % 2000 == 19 or i % 1000 == 13
        },
        "codec_whitelist": {cid(i) for i in range(n) if i % 1000 == 23},
        "referential_clip_orphan": {cid(i) for i in range(n) if i % 1000 == 29},
        "referential_transcript_orphan": {
            f"ghost-{p.seed}-{i:012d}" for i in range(n) if i % 1000 == 31
        },
        "transcript_equality": {cid(i) for i in range(n) if i % 2000 == 37},
    }
    return out


# audio-decode checks emitted by checks.audio.audio_invariant_violations —
# the subset of expected_violations() the decoder pipeline owns
AUDIO_DECODE_CHECKS = ("dur_ms_mismatch", "snr_allclose")


def ensure_expected_audio_violations(root: str, p: SynthParams) -> str:
    """Golden parquet of the audio-decode invariant's violation set.

    Written at generation time straight from :func:`expected_violations`
    (the generator knows every planted violation deterministically), so
    the driver's DuckDB oracle can hash-check ``clips_audio_violations``
    — the mandated per-row decoded-PCM invariant (BASELINE.json
    input_hint) — even though decode itself is not SQL-expressible.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(root, "expected_audio_violations")
    out_file = os.path.join(path, "part-000.parquet")
    if os.path.exists(out_file):
        return path
    ev = expected_violations(p)
    rows = [
        {"check_name": c, "clip_id": cid}
        for c in AUDIO_DECODE_CHECKS
        for cid in sorted(ev[c])
    ]
    os.makedirs(path, exist_ok=True)
    schema = pa.schema([("check_name", pa.string()), ("clip_id", pa.string())])
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), out_file)
    return path


# --- Spark-distributed generation -------------------------------------------

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)
TRANSCRIPTS_SCHEMA = "clip_id string, transcript string, embedding array<float>"


def generate_clips(spark, p: SynthParams, out_path: str, partitions: int = 32) -> None:
    """Distributed write of the clips table (pure function of row index)."""
    pb = _params_payload(p)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pp = _params_from_payload(pb)
        for b in batches:
            rows = [make_clip_row(pp, int(i)) for i in b["id"]]
            yield pd.DataFrame(rows)

    (
        spark.range(0, p.n_rows, 1, partitions)
        .mapInPandas(gen, schema=CLIPS_SCHEMA)
        .write.mode("overwrite")
        .parquet(out_path)
    )


def generate_transcripts(spark, p: SynthParams, out_path: str, partitions: int = 32) -> None:
    pb = _params_payload(p)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pp = _params_from_payload(pb)
        for b in batches:
            rows: list[dict] = []
            for i in b["id"]:
                rows.extend(make_transcript_rows(pp, int(i)))
            if rows:
                yield pd.DataFrame(rows)

    (
        spark.range(0, p.n_rows, 1, partitions)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
        .write.mode("overwrite")
        .parquet(out_path)
    )


def _params_payload(p: SynthParams) -> dict:
    return p.__dict__.copy()


def _params_from_payload(d: dict) -> SynthParams:
    return SynthParams(**d)


# --- tiered cache (sf -> row count, FIXTURES.md sizing) ----------------------

SF_ROWS = {
    "sf0.001": 6_000,
    "sf0.01": 60_000,
    "sf0.1": 600_000,
    "sf1.0": 6_000_000,
}
# decode-heavy tier for the scaling bench: fewer, longer clips (~20x the
# payload per row) — representative of real ~seconds-long audio where the
# validation job is decode/transfer-bound, not per-row-overhead-bound
HEAVY_TIER = "bench_heavy"
HEAVY_PARAMS = dict(n_rows=150_000, dur_median_ms=320.0, dur_max_ms=8000.0, seed=43)
SYNTH_ROOT = os.environ.get("SPARK_GRAFT_SYNTH_ROOT", "/root/repo/data/synth")


def sf_rows_for(tier: str) -> int:
    """Clip count for a scale tier.  Known tiers come from SF_ROWS; any
    other ``sf<float>`` dir scales linearly from the same anchor
    (6M rows at sf1.0 — consistent with every listed tier), so a
    driver-generated scale factor outside the list still benches instead
    of dying in ensure_synth."""
    if tier in SF_ROWS:
        return SF_ROWS[tier]
    if tier.startswith("sf"):
        try:
            sf = float(tier[2:])
        except ValueError:
            raise ValueError(f"unknown sf tier: {tier}") from None
        if sf > 0:
            return int(round(6_000_000 * sf))
    raise ValueError(f"unknown sf tier: {tier}")


def synth_dir_for(sf_dir: str) -> str:
    """Map a driver sf dir (/root/testdata/sf0.01) to our synth cache dir."""
    tier = os.path.basename(os.path.normpath(sf_dir))
    sf_rows_for(tier)  # validates
    return os.path.join(SYNTH_ROOT, tier)


def ensure_synth_local(sf_dir: str) -> str:
    """Spark-free fallback generator (pure pandas/pyarrow, same layout).

    Used by ``__spark_entry__.oracle_sql`` as a safety net: the DuckDB
    oracle reads the synth parquet by absolute path, so the data must
    exist even if the Spark side hasn't run yet.  Row content is the
    identical pure function of (seed, index) the Spark path uses.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = synth_dir_for(sf_dir)
    tier = os.path.basename(root)
    p = SynthParams(n_rows=sf_rows_for(tier))
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        ensure_expected_audio_violations(root, p)  # upgrade older caches
        return root

    def write(rows: list[dict], path: str, schema: pa.Schema) -> None:
        os.makedirs(path, exist_ok=True)
        tbl = pa.Table.from_pylist(rows, schema=schema)
        pq.write_table(tbl, os.path.join(path, "part-000.parquet"))

    clips_schema = pa.schema(
        [
            ("clip_id", pa.string()),
            ("bytes", pa.binary()),
            ("sr_hz", pa.int32()),
            ("dur_ms", pa.int32()),
            ("codec", pa.string()),
            ("transcript", pa.string()),
        ]
    )
    tr_schema = pa.schema(
        [
            ("clip_id", pa.string()),
            ("transcript", pa.string()),
            ("embedding", pa.list_(pa.float32())),
        ]
    )
    clean = replace(p, inject_violations=False)
    for params, sub in [(p, "clips"), (clean, "clips_reference")]:
        rows = [make_clip_row(params, i) for i in range(params.n_rows)]
        write(rows, os.path.join(root, sub), clips_schema)
    for params, sub in [(p, "transcripts"), (clean, "transcripts_reference")]:
        rows = []
        for i in range(params.n_rows):
            for r in make_transcript_rows(params, i):
                r = dict(r)
                r["embedding"] = r["embedding"].tolist()
                rows.append(r)
        write(rows, os.path.join(root, sub), tr_schema)
    ensure_expected_audio_violations(root, p)
    with open(done, "w") as f:
        f.write("ok\n")
    return root


def ensure_heavy(spark, partitions: int = 32) -> str:
    """Generate (once) the decode-heavy scaling-bench tier."""
    root = os.path.join(SYNTH_ROOT, HEAVY_TIER)
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return root
    os.makedirs(root, exist_ok=True)
    p = SynthParams(**HEAVY_PARAMS)
    clean = replace(p, inject_violations=False)
    generate_clips(spark, p, os.path.join(root, "clips"), partitions)
    generate_transcripts(spark, p, os.path.join(root, "transcripts"), partitions)
    generate_clips(spark, clean, os.path.join(root, "clips_reference"), partitions)
    with open(done, "w") as f:
        f.write("ok\n")
    return root


def ensure_synth(spark, sf_dir: str, partitions: int = 32) -> str:
    """Generate (once) and return the synth dir for a given sf tier.

    Produces: clips/, transcripts/, clips_reference/, transcripts_reference/
    (reference = clean, violation-free window for two-sample drift + the
    per-row SNR/transcript invariants).
    """
    root = synth_dir_for(sf_dir)
    tier = os.path.basename(root)
    p = SynthParams(n_rows=sf_rows_for(tier))
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        ensure_expected_audio_violations(root, p)  # upgrade older caches
        return root
    os.makedirs(root, exist_ok=True)
    clean = replace(p, inject_violations=False)
    generate_clips(spark, p, os.path.join(root, "clips"), partitions)
    generate_transcripts(spark, p, os.path.join(root, "transcripts"), partitions)
    generate_clips(spark, clean, os.path.join(root, "clips_reference"), partitions)
    generate_transcripts(
        spark, clean, os.path.join(root, "transcripts_reference"), partitions
    )
    ensure_expected_audio_violations(root, p)
    with open(done, "w") as f:
        f.write("ok\n")
    return root
