"""Lexical / style drift (reference C13-C14 + A8,
``detectors/semantic.py:288-445``) as native token-explode plans.

Semantics mirrored exactly, including the reference's quirks:
- tokenize = ``text.lower().split()`` -> ``explode(split(lower(c),'\\s+'))``
  with empty tokens dropped (Python split semantics);
- vocabulary difference = ``0.5 * jaccard + 0.5 * min(js, 1)`` — except
  when the vocabularies share NO common words, where the reference
  returns the bare jaccard distance (1.0 at maximal drift) — and the
  JS here puts the epsilon INSIDE the log (``p*ln(p/m + 1e-10)``, unlike
  C2) and common-word frequencies are normalized by each side's TOTAL
  token count (they do not sum to 1 over the common subset);
- style difference = 0.4 * norm sentence-length delta + 0.3 * norm
  word-length delta + 0.3 * type/token-ratio delta, sentences split on
  '.' with blank sentences dropped;
- lexical drift score = 0.6 * vocab_diff + 0.4 * style_diff.

Plan shape: one explode + groupBy(token) per side (map-side combined),
a full-outer join of two vocab frames (vocab-sized, not corpus-sized),
and single-row aggregates — no Python in the row path.  At 10^12 rows
the token frame is the shuffle: explode fans out ~tokens-per-row, the
hash agg combines map-side, and the vocab join is bounded by |vocab|.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import LEXICAL_THRESHOLD, MIN_SAMPLES


def token_counts(df: DataFrame, col: str) -> DataFrame:
    """A8 vocabulary term frequencies: (token, cnt)."""
    tok = F.explode(F.split(F.lower(F.col(col)), r"\s+")).alias("token")
    return (
        df.where(F.col(col).isNotNull())
        .select(tok)
        .where(F.col("token") != "")
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def vocab_difference_frame(ref: DataFrame, cur: DataFrame, col: str) -> DataFrame:
    """One row: (jaccard, js, vocab_diff, ref_vocab, cur_vocab) — C13."""
    r = token_counts(ref, col).withColumnRenamed("cnt", "cr")
    c = token_counts(cur, col).withColumnRenamed("cnt", "cc")
    j = r.join(c, "token", "full_outer")
    both = F.col("cr").isNotNull() & F.col("cc").isNotNull()
    # JS needs each side's total token count as a scalar first (frequencies
    # are normalized by SIDE totals, semantic.py:404-407) — tiny collect.
    totals = j.agg(
        F.sum("cr").alias("rt"), F.sum("cc").alias("ct")
    ).collect()[0]
    rt, ct = float(totals.rt or 1), float(totals.ct or 1)
    p = F.col("cr").cast("double") / rt
    q = F.col("cc").cast("double") / ct
    m = (p + q) / 2
    js_col = F.sum(
        F.when(both, 0.5 * p * F.log(p / m + 1e-10) + 0.5 * q * F.log(q / m + 1e-10))
    )
    out = j.agg(
        F.count("*").alias("union_n"),
        F.sum(both.cast("bigint")).alias("inter_n"),
        F.sum(F.col("cr").isNotNull().cast("bigint")).cast("bigint").alias("ref_vocab"),
        F.sum(F.col("cc").isNotNull().cast("bigint")).cast("bigint").alias("cur_vocab"),
        F.coalesce(js_col, F.lit(0.0)).alias("js"),
    )
    return out.select(
        (1.0 - F.col("inter_n") / F.greatest(F.col("union_n"), F.lit(1))).alias("jaccard"),
        F.col("js").cast("double").alias("js"),
        "inter_n",
        "ref_vocab",
        "cur_vocab",
    ).select(
        "jaccard",
        "js",
        # Disjoint vocabularies (no common words): the reference returns the
        # bare jaccard_distance (semantic.py:396-398) — 1.0 at maximal drift —
        # rather than the 0.5-weighted blend.
        F.when(F.col("inter_n") == 0, F.col("jaccard"))
        .otherwise(0.5 * F.col("jaccard") + 0.5 * F.least(F.col("js"), F.lit(1.0)))
        .cast("double")
        .alias("vocab_diff"),
        "ref_vocab",
        "cur_vocab",
    )


def style_features_frame(df: DataFrame, col: str) -> DataFrame:
    """One row: (avg_sentence_len, avg_word_len, token_count,
    unique_token_count, diversity) — the C14 feature vector."""
    base = df.where(F.col(col).isNotNull())
    sentences = base.select(
        F.explode(F.split(F.col(col), r"\.")).alias("s")
    ).where(F.trim("s") != "")
    sent_stats = sentences.agg(
        F.avg(
            F.size(F.filter(F.split(F.col("s"), r"\s+"), lambda x: x != ""))
        ).alias("avg_sentence_len")
    )
    toks = base.select(
        F.explode(F.split(F.lower(F.col(col)), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    tok_stats = toks.agg(
        F.avg(F.length("token")).alias("avg_word_len"),
        F.count("*").cast("bigint").alias("token_count"),
        F.countDistinct("token").cast("bigint").alias("unique_token_count"),
    )
    return sent_stats.crossJoin(tok_stats).select(
        F.coalesce(F.col("avg_sentence_len"), F.lit(0.0)).alias("avg_sentence_len"),
        F.coalesce(F.col("avg_word_len"), F.lit(0.0)).alias("avg_word_len"),
        "token_count",
        "unique_token_count",
        (
            F.col("unique_token_count") / F.greatest(F.col("token_count"), F.lit(1))
        ).cast("double").alias("diversity"),
    )


def style_difference(ref_feat: dict, cur_feat: dict) -> float:
    """C14 combine on two collected feature rows (pure scalar math)."""
    def norm_diff(a: float, b: float) -> float:
        mx = max(a, b)
        return abs(a - b) / mx if mx > 0 else 0.0

    return (
        0.4 * norm_diff(ref_feat["avg_sentence_len"], cur_feat["avg_sentence_len"])
        + 0.3 * norm_diff(ref_feat["avg_word_len"], cur_feat["avg_word_len"])
        + 0.3 * abs(ref_feat["diversity"] - cur_feat["diversity"])
    )


def lexical_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str = "transcript",
    detector_threshold: float = LEXICAL_THRESHOLD,
    min_samples: int = MIN_SAMPLES,
) -> dict:
    """Full lexical detector: 0.6 * vocab_diff + 0.4 * style_diff
    (semantic.py:312-315)."""
    n_ref = ref.where(F.col(col).isNotNull()).count()
    n_cur = cur.where(F.col(col).isNotNull()).count()
    result: dict = {
        "metric_name": "lexical_drift",
        "reference_size": n_ref,
        "current_size": n_cur,
        "threshold": detector_threshold,
    }
    if n_ref < min_samples or n_cur < min_samples:
        result.update({"drift_score": 0.0, "drift_detected": False, "gated": True})
        return result
    vd = vocab_difference_frame(ref, cur, col).collect()[0]
    rf = style_features_frame(ref, col).collect()[0].asDict()
    cf = style_features_frame(cur, col).collect()[0].asDict()
    sd = style_difference(rf, cf)
    score = 0.6 * float(vd.vocab_diff) + 0.4 * sd
    result.update(
        {
            "drift_score": score,
            "drift_detected": score > detector_threshold,
            "analysis": {
                "vocabulary_difference": float(vd.vocab_diff),
                "style_difference": sd,
                "jaccard": float(vd.jaccard),
                "js": float(vd.js),
                "reference_vocab_size": int(vd.ref_vocab),
                "current_vocab_size": int(vd.cur_vocab),
                "reference_avg_length": float(rf["avg_sentence_len"]),
                "current_avg_length": float(cf["avg_sentence_len"]),
            },
        }
    )
    return result
