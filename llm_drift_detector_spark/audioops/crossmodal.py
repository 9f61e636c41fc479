"""Cross-modal dedup: agreement and disagreement between modalities.

A clip row carries BOTH an audio payload and a transcript; each has its
own near-dup detector (``.dedup`` for audio, ``..textops.dedup`` for
text).  Their join is more informative than either alone:

- ``both``        near-dup in audio AND transcript — the same
                  underlying recording + content; the highest-precision
                  dedup signal (drop one).
- ``audio_only``  same recording, different transcript — a
                  transcription inconsistency (the pair belongs in a QA
                  queue, not silent dedup: one of the transcripts is
                  wrong).
- ``text_only``   same transcript, different audio — legitimate
                  re-reads / re-synthesis of the same content (usually
                  KEEP both; dropping them would bias the corpus
                  against common phrases).

Execution: the two candidate pipelines run independently (each with its
own skew guards and pair-restricted verification), and the final
combination is a full-outer join of two SMALL pair frames — nothing
here touches payloads or transcripts again.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..textops.dedup import (
    candidate_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
)
from .dedup import audio_duplicate_pairs


def text_duplicate_pairs(
    df: DataFrame,
    id_col: str = "clip_id",
    text_col: str = "transcript",
    min_jaccard: float = 0.8,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """(id_a, id_b, jaccard) verified transcript near-dups — the
    composed scale path of the text suite (shingle -> minhash -> banded
    buckets -> pair-restricted exact Jaccard)."""
    sh = shingles(df, id_col, text_col).persist()
    sig = minhash_signatures(sh)
    cands = candidate_pairs(
        minhash_lsh_candidates(sig, max_bucket_size=max_bucket_size)
    )
    return ngram_jaccard_pairs(sh, min_jaccard=min_jaccard, pairs=cands)


def cross_modal_duplicate_pairs(
    clips: DataFrame,
    id_col: str = "clip_id",
    text_col: str = "transcript",
    min_jaccard: float = 0.8,
    **audio_kwargs,
) -> DataFrame:
    """(id_a, id_b, audio_dup, text_dup, relation) for every pair
    flagged by either modality; ``relation`` is one of
    'both' / 'audio_only' / 'text_only' (see module docstring for what
    each means operationally)."""
    audio = audio_duplicate_pairs(clips, id_col=id_col, **audio_kwargs).select(
        "id_a", "id_b", F.lit(True).alias("audio_dup")
    )
    text = text_duplicate_pairs(
        clips, id_col=id_col, text_col=text_col, min_jaccard=min_jaccard
    ).select("id_a", "id_b", F.lit(True).alias("text_dup"))
    joined = audio.join(text, ["id_a", "id_b"], "full_outer").select(
        "id_a",
        "id_b",
        F.coalesce("audio_dup", F.lit(False)).alias("audio_dup"),
        F.coalesce("text_dup", F.lit(False)).alias("text_dup"),
    )
    return joined.withColumn(
        "relation",
        F.when(F.col("audio_dup") & F.col("text_dup"), "both")
        .when(F.col("audio_dup"), "audio_only")
        .otherwise("text_only"),
    )
