"""Audio payload constraints — the graft's custom `mapInPandas` operator.

BASELINE.json north_star: "audio-payload constraints (sr_hz domain,
dur_ms vs decoded PCM length, codec whitelist, decoded-PCM SNR>=30dB
allclose vs reference) run inside mapInPandas decoders with salted
repartitioning on clip_id".  sr_hz / codec are pure native filters
(:mod:`.domain`); this module covers the two checks that require
decoding bytes:

- ``dur_ms_mismatch``: |dur_ms - n_samples * 1000 / sr_hz| > tolerance,
  or the payload fails to decode at all (truncated/corrupt stream).
- ``snr_allclose``: decoded PCM vs the reference row's decoded PCM has
  SNR < 30 dB (length mismatches short-circuit to dur_ms_mismatch and
  skip SNR — disjoint violation classes, FIXTURES.md §1).

Scale design
------------
- The clip<->reference equi-join moves full payloads; at 10^12 rows both
  tables must be bucketed by clip_id in Iceberg so this is a
  storage-partitioned join (no shuffle).  In the sandbox it's a plain
  sort-merge join — correct either way.
- Salted repartition before the decoder: long clips make row sizes
  heavy-tailed, so we spread rows uniformly with
  ``repartition(n, xxhash64(clip_id, salt))`` rather than clustering on
  raw clip_id ranges; Arrow's maxRecordsPerBatch (session.py) bounds
  per-batch memory regardless of row size.
- The decoder is an Arrow-batched iterator: numpy work per row (decode is
  inherently per-payload) inside zero-copy pandas batches — the
  reference's per-sample loop (``processor.py:313``) re-expressed at
  batch granularity with no per-row Python in the plan itself.

Transcript equality (FIXTURES invariant #2) needs no decoding and stays
a native join filter: :func:`transcript_mismatches`.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .. import codecs
from ..config import CODEC_WHITELIST, DUR_MS_TOLERANCE, SNR_DB_MIN

AUDIO_VIOLATIONS_SCHEMA = "clip_id string, check_name string, detail string"


def _validate_batch(pdf: pd.DataFrame) -> list[dict]:
    out: list[dict] = []
    for clip_id, payload, sr, dur, codec, ref_payload, ref_codec in zip(
        pdf["clip_id"],
        pdf["bytes"],
        pdf["sr_hz"],
        pdf["dur_ms"],
        pdf["codec"],
        pdf["ref_bytes"],
        pdf["ref_codec"],
    ):
        if codec not in CODEC_WHITELIST:
            continue  # codec_whitelist check owns this row (native filter)
        try:
            pcm = codecs.decode(bytes(payload), str(codec))
        except ValueError as e:
            out.append(
                {
                    "clip_id": clip_id,
                    "check_name": "dur_ms_mismatch",
                    "detail": json.dumps({"error": f"decode_failed: {e}"}),
                }
            )
            continue
        implied_ms = len(pcm) * 1000.0 / float(sr) if sr else float("inf")
        if abs(float(dur) - implied_ms) > DUR_MS_TOLERANCE:
            out.append(
                {
                    "clip_id": clip_id,
                    "check_name": "dur_ms_mismatch",
                    "detail": json.dumps(
                        {"dur_ms": int(dur), "implied_ms": round(implied_ms, 3)}
                    ),
                }
            )
            continue  # length is wrong -> SNR comparison is meaningless
        if ref_payload is None:
            continue  # orphan vs reference: referential check owns it
        try:
            ref_pcm = codecs.decode(bytes(ref_payload), str(ref_codec))
        except ValueError:
            continue  # undecodable reference row: not this row's fault
        if len(ref_pcm) != len(pcm):
            # row passed its OWN dur_ms invariant but differs in length
            # from the reference (e.g. out-of-domain sr_hz rows) — SNR is
            # not comparable; the sr_hz_domain/referential checks own it.
            continue
        snr = codecs.snr_db(ref_pcm, pcm)
        if snr < SNR_DB_MIN:
            out.append(
                {
                    "clip_id": clip_id,
                    "check_name": "snr_allclose",
                    "detail": json.dumps({"snr_db": round(snr, 2), "min_db": SNR_DB_MIN}),
                }
            )
    return out


def _decode_validate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = ["clip_id", "check_name", "detail"]
    for pdf in batches:
        rows = _validate_batch(pdf)
        if rows:
            yield pd.DataFrame(rows, columns=cols)


def audio_invariant_violations(
    clips: DataFrame,
    reference: DataFrame,
    n_partitions: int | None = None,
    salt: int = 0,
) -> DataFrame:
    """Violation rows (clip_id, check_name, detail) from the decoder pass.

    `reference` is the clean reference window (same schema as clips); the
    per-row invariant is BASELINE.json input_hint's "decoded-PCM allclose
    (SNR>=30dB)" against the reference row with the same clip_id.
    """
    ref = reference.select(
        F.col("clip_id"),
        F.col("bytes").alias("ref_bytes"),
        F.col("codec").alias("ref_codec"),
    )
    joined = clips.select("clip_id", "bytes", "sr_hz", "dur_ms", "codec").join(
        ref, "clip_id", "left"
    )
    n = n_partitions or clips.sparkSession.conf.get("spark.sql.shuffle.partitions")
    salted = joined.repartition(int(n), F.xxhash64("clip_id", F.lit(salt)))
    return salted.mapInPandas(_decode_validate, schema=AUDIO_VIOLATIONS_SCHEMA)


def transcript_mismatches(clips: DataFrame, transcripts: DataFrame) -> DataFrame:
    """transcript_equality violations: joined rows whose text differs.

    Native equi-join + filter — no UDF.  Duplicate transcript rows for a
    clip_id would fan out; the synth generator guarantees at most one.
    """
    t = transcripts.select(
        "clip_id", F.col("transcript").alias("transcript_expected")
    )
    return (
        clips.select("clip_id", "transcript")
        .join(t, "clip_id", "inner")
        .where(
            ~F.col("transcript").eqNullSafe(F.col("transcript_expected"))
        )
        .select("clip_id")
        .distinct()
    )
