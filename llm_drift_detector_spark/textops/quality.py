"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, fingerprinting.

All native column expressions (regexp/array/string functions) — no UDFs.
Every formula is arithmetic both Spark and DuckDB can evaluate
identically, so each operator has a full SQL oracle.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# tiny function-word sets for the n-gram/stopword language heuristic;
# enough to separate the synthetic corpora and demonstrate the plan shape
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "fr": ("le", "la", "de", "et", "les", "des", "un", "une", "du", "en"),
    "es": ("el", "la", "de", "y", "los", "las", "un", "una", "del", "en"),
    "de": ("der", "die", "das", "und", "den", "von", "zu", "mit", "ist", "im"),
}

PUNCT_PATTERN = r"[.!?,;:]"
WORDISH_PATTERN = r"[a-z0-9]+|[^a-z0-9\s]"  # BPE-ish segments on lowered text


def _tokens(text_col: str) -> Column:
    return F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != "")


def language_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, lang, lang_score) — argmax stopword-hit ratio across languages.

    Ratio = tokens belonging to the language's function-word set / total
    tokens.  Ties break by language code order (deterministic).
    """
    toks = _tokens(text_col)
    n = F.greatest(F.size(toks), F.lit(1))
    ratios = []
    for lang, words in sorted(STOPWORDS.items()):
        hits = F.size(F.filter(toks, lambda x: x.isin(*words)))
        ratios.append(F.struct((hits / n).alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*ratios))
    return df.select(
        F.col(id_col).alias("id"),
        best["lang"].alias("lang"),
        best["score"].cast("double").alias("lang_score"),
    )


def quality_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_chars, n_tokens, punct_ratio, stop_ratio, mean_word_len,
    quality) — length/punct/stopword heuristics combined to [0, 1].

    quality = 0.3 * min(n_tokens/50, 1) + 0.3 * (1 - min(punct_ratio*10, 1))
            + 0.2 * min(stop_ratio*5, 1) + 0.2 * min(mean_word_len/8, 1)
    """
    t = F.col(text_col)
    toks = _tokens(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(toks)
    punct = n_chars - F.length(F.regexp_replace(F.lower(t), PUNCT_PATTERN, ""))
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    en = STOPWORDS["en"]
    stop_ratio = F.size(F.filter(toks, lambda x: x.isin(*en))) / F.greatest(
        n_tokens, F.lit(1)
    )
    mean_word_len = F.aggregate(
        toks, F.lit(0), lambda acc, x: acc + F.length(x)
    ) / F.greatest(n_tokens, F.lit(1))
    quality = (
        0.3 * F.least(n_tokens / 50.0, F.lit(1.0))
        + 0.3 * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0)))
        + 0.2 * F.least(stop_ratio * 5.0, F.lit(1.0))
        + 0.2 * F.least(mean_word_len / 8.0, F.lit(1.0))
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.cast("bigint").alias("n_chars"),
        n_tokens.cast("bigint").alias("n_tokens"),
        punct_ratio.cast("double").alias("punct_ratio"),
        stop_ratio.cast("double").alias("stop_ratio"),
        mean_word_len.cast("double").alias("mean_word_len"),
        quality.cast("double").alias("quality"),
    )


def token_counts_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ws_tokens, wordish_tokens) — whitespace + BPE-ish segment counts."""
    toks = _tokens(text_col)
    wordish = F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORDISH_PATTERN), 0))
    return df.select(
        F.col(id_col).alias("id"),
        F.size(toks).cast("bigint").alias("ws_tokens"),
        wordish.cast("bigint").alias("wordish_tokens"),
    )


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, fingerprint) — md5 over the sorted distinct-token set.

    The classic "key collision" fingerprint: whitespace/word-order/dup
    insensitive, so reordered or re-spaced copies collide.
    """
    toks = F.array_sort(F.array_distinct(_tokens(text_col)))
    return df.select(
        F.col(id_col).alias("id"),
        F.md5(F.array_join(toks, " ")).alias("fingerprint"),
    )
