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
from pyspark.sql import Column, DataFrame

from ..config import LEXICAL_THRESHOLD, MIN_SAMPLES
from .grouped import tag_windows


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


def vocab_difference_frame(
    ref: DataFrame, cur: DataFrame, col: str, totals: str = "window"
) -> DataFrame:
    """One row: (jaccard, js, vocab_diff, ref_vocab, cur_vocab) — C13.

    ``totals`` picks the plan shape for folding in each side's total
    token count (which C13's JS normalizes by, semantic.py:404-407):

    - ``"window"`` (default, reference semantics): empty-key window
      sums over the joined vocab frame.  ONE task carries the whole
      frame — bounded by |window vocabulary| under reference semantics
      (drift WINDOWS of ~100 samples, ``default_config.py:104`` — a few
      thousand distinct tokens), the wrong shape for corpora.
    - ``"broadcast"`` (corpus-scale): totals aggregated to a 1-row
      frame and broadcast-crossJoined back — the vocab frame stays
      fully parallel (no single-partition exchange), still lazy, still
      one action, identical results (test-asserted).
    """
    # both sides' term frequencies from ONE pass over the tagged union —
    # replaces two token_counts aggregates + a full-outer join (three
    # exchanges) with a single groupBy(token) (guide §2.4).  Zero counts
    # map back to NULL so the presence semantics of the old full-outer
    # join (cr/cc NULL when a token is absent from a side) are exact.
    def _side_tokens(df: DataFrame, tag: int) -> DataFrame:
        tok = F.explode(F.split(F.lower(F.col(col)), r"\s+")).alias("token")
        return (
            df.where(F.col(col).isNotNull())
            .select(tok, F.lit(tag).alias("is_ref"))
            .where(F.col("token") != "")
        )

    u = _side_tokens(ref, 1).unionAll(_side_tokens(cur, 0))
    counts = u.groupBy("token").agg(
        F.sum("is_ref").alias("cr_raw"),
        F.sum(1 - F.col("is_ref")).alias("cc_raw"),
    )
    j = counts.select(
        "token",
        F.when(F.col("cr_raw") > 0, F.col("cr_raw")).alias("cr"),
        F.when(F.col("cc_raw") > 0, F.col("cc_raw")).alias("cc"),
    )
    both = F.col("cr").isNotNull() & F.col("cc").isNotNull()
    if totals == "broadcast":
        t = j.agg(
            F.greatest(F.coalesce(F.sum("cr"), F.lit(0)), F.lit(1)).alias("rt"),
            F.greatest(F.coalesce(F.sum("cc"), F.lit(0)), F.lit(1)).alias("ct"),
        )
        j = j.crossJoin(F.broadcast(t))
    elif totals == "window":
        from pyspark.sql import Window

        w = Window.partitionBy()
        j = j.withColumn(
            "rt", F.greatest(F.coalesce(F.sum("cr").over(w), F.lit(0)), F.lit(1))
        ).withColumn(
            "ct", F.greatest(F.coalesce(F.sum("cc").over(w), F.lit(0)), F.lit(1))
        )
    else:
        raise ValueError(f"unknown totals mode: {totals}")
    p = F.col("cr").cast("double") / F.col("rt").cast("double")
    q = F.col("cc").cast("double") / F.col("ct").cast("double")
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


def grouped_lexical_drift(
    df: DataFrame,
    keys: list[str],
    col: str = "transcript",
    side_col: str = "side",
    detector_threshold: float = LEXICAL_THRESHOLD,
    min_samples: int = MIN_SAMPLES,
) -> DataFrame:
    """Per-group C13+C14 for ALL groups in ONE plan — no Python.

    The reference loops the semantic detector per provider
    (``detectors/__init__.py:58-86``).  Here every group shares one
    plan built from four grouped sub-aggregates, each bounded by
    |vocab| or #groups after its map-side combine (and the single-pair
    :func:`lexical_drift` delegates here with a constant key — one
    action either way):

    - token counts per (keys, token) with per-side sums -> per-group
      jaccard + the reference's inside-the-log JS (side-total
      normalized, ``semantic.py:396-407``), disjoint-vocab bare-jaccard
      rule included;
    - per-group per-side style aggregates (avg sentence len from the
      '.'-split explode; avg word len / token count / distinct tokens
      from the token explode) -> C14 normalized deltas;
    - per-group doc counts for the min-sample gate.

    Shuffles: token hash-agg + sentence hash-agg + doc-count agg (all
    keyed on the group keys, map-side combined) and #groups-row joins.
    Input is the :func:`~.grouped.tag_windows` tagged-union shape.
    Output: one row per group with vocab/style/lexical scores.
    """
    base = df.where(F.col(col).isNotNull()).select(
        *keys,
        (F.col(side_col) == "ref").cast("int").alias("r"),
        F.col(col).alias("t"),
    )
    is_r = F.col("r") == 1

    docs_n = base.groupBy(*keys).agg(
        F.sum("r").cast("bigint").alias("n_ref"),
        F.sum(1 - F.col("r")).cast("bigint").alias("n_cur"),
    )

    toks = base.select(
        *keys, "r", F.explode(F.split(F.lower(F.col("t")), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    tc = toks.groupBy(*keys, "token").agg(
        F.sum("r").alias("cr"), F.sum(1 - F.col("r")).alias("cc")
    )
    both = (F.col("cr") > 0) & (F.col("cc") > 0)
    # side token totals as per-group window sums (vocab-sized frame)
    from pyspark.sql import Window

    gw = Window.partitionBy(*keys)
    tcw = tc.withColumn("rt", F.sum("cr").over(gw)).withColumn(
        "ct", F.sum("cc").over(gw)
    )
    p = F.col("cr").cast("double") / F.col("rt")
    q = F.col("cc").cast("double") / F.col("ct")
    m = (p + q) / 2
    vocab = (
        tcw.groupBy(*keys)
        .agg(
            F.count("*").alias("union_n"),
            F.sum(both.cast("bigint")).alias("inter_n"),
            F.coalesce(
                F.sum(
                    F.when(
                        both,
                        0.5 * p * F.log(p / m + 1e-10) + 0.5 * q * F.log(q / m + 1e-10),
                    )
                ),
                F.lit(0.0),
            ).alias("js"),
            F.sum((F.col("cr") > 0).cast("bigint")).alias("ref_vocab"),
            F.sum((F.col("cc") > 0).cast("bigint")).alias("cur_vocab"),
        )
        .select(
            *keys,
            (1.0 - F.col("inter_n") / F.greatest(F.col("union_n"), F.lit(1))).alias(
                "jaccard"
            ),
            F.col("js").cast("double").alias("js"),
            "inter_n",
            "ref_vocab",
            "cur_vocab",
        )
        .withColumn(
            "vocab_diff",
            F.when(F.col("inter_n") == 0, F.col("jaccard"))
            .otherwise(0.5 * F.col("jaccard") + 0.5 * F.least(F.col("js"), F.lit(1.0)))
            .cast("double"),
        )
    )

    tok_stats = toks.groupBy(*keys).agg(
        F.avg(F.when(is_r, F.length("token"))).alias("awl_r"),
        F.avg(F.when(~is_r, F.length("token"))).alias("awl_c"),
        F.count(F.when(is_r, 1)).alias("tc_r"),
        F.count(F.when(~is_r, 1)).alias("tc_c"),
        F.count_distinct(F.when(is_r, F.col("token"))).alias("ut_r"),
        F.count_distinct(F.when(~is_r, F.col("token"))).alias("ut_c"),
    )

    sents = base.select(
        *keys, "r", F.explode(F.split(F.col("t"), r"\.")).alias("s")
    ).where(F.trim("s") != "")
    wc = F.size(F.filter(F.split(F.col("s"), r"\s+"), lambda x: x != ""))
    sent_stats = sents.groupBy(*keys).agg(
        F.avg(F.when(is_r, wc)).alias("asl_r"),
        F.avg(F.when(~is_r, wc)).alias("asl_c"),
    )

    j = (
        docs_n.join(vocab, keys, "left")
        .join(tok_stats, keys, "left")
        .join(sent_stats, keys, "left")
    )

    def norm_diff(a: Column, b: Column) -> Column:
        av, bv = F.coalesce(a, F.lit(0.0)), F.coalesce(b, F.lit(0.0))
        mx = F.greatest(av, bv)
        return F.when(mx > 0, F.abs(av - bv) / mx).otherwise(F.lit(0.0))

    div_r = F.try_divide(F.col("ut_r"), F.greatest(F.col("tc_r"), F.lit(1)))
    div_c = F.try_divide(F.col("ut_c"), F.greatest(F.col("tc_c"), F.lit(1)))
    style = (
        0.4 * norm_diff(F.col("asl_r"), F.col("asl_c"))
        + 0.3 * norm_diff(F.col("awl_r"), F.col("awl_c"))
        + 0.3 * F.abs(F.coalesce(div_r, F.lit(0.0)) - F.coalesce(div_c, F.lit(0.0)))
    )
    gated = (F.col("n_ref") < min_samples) | (F.col("n_cur") < min_samples)
    vd = F.coalesce(F.col("vocab_diff"), F.lit(0.0))
    score = 0.6 * vd + 0.4 * style
    zero = lambda c: F.when(gated, F.lit(0.0)).otherwise(c).cast("double")  # noqa: E731
    return j.select(
        *keys,
        "n_ref",
        "n_cur",
        zero(F.coalesce(F.col("jaccard"), F.lit(0.0))).alias("jaccard"),
        zero(F.coalesce(F.col("js"), F.lit(0.0))).alias("js"),
        zero(vd).alias("vocab_diff"),
        zero(style).alias("style_diff"),
        zero(score).alias("lexical_score"),
        (~gated & (score > detector_threshold)).alias("drift_detected"),
        gated.alias("gated"),
        # raw side features, for callers assembling the reference's
        # analysis dict (lexical_drift delegates here)
        F.coalesce(F.col("ref_vocab"), F.lit(0)).cast("bigint").alias("ref_vocab"),
        F.coalesce(F.col("cur_vocab"), F.lit(0)).cast("bigint").alias("cur_vocab"),
        F.coalesce(F.col("asl_r"), F.lit(0.0)).cast("double").alias("ref_avg_sentence_len"),
        F.coalesce(F.col("asl_c"), F.lit(0.0)).cast("double").alias("cur_avg_sentence_len"),
    )


def lexical_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str = "transcript",
    detector_threshold: float = LEXICAL_THRESHOLD,
    min_samples: int = MIN_SAMPLES,
) -> dict:
    """Full lexical detector: 0.6 * vocab_diff + 0.4 * style_diff
    (semantic.py:312-315).

    FUSED (r3): delegates to :func:`grouped_lexical_drift` with a
    constant group key, so the whole detector — counts, vocab join, JS,
    style features both sides — is ONE Spark action (r2's version
    issued ~6 collects; parity between the two paths is asserted in
    ``test_grouped_lexical_drift_matches_single_pair``)."""
    tagged = tag_windows(
        ref.select(F.col(col)), cur.select(F.col(col))
    ).withColumn("_g", F.lit(1))
    rows = grouped_lexical_drift(
        tagged, ["_g"], col,
        detector_threshold=detector_threshold, min_samples=min_samples,
    ).collect()
    if not rows:
        # both windows empty / all-null: the grouped job emits no rows —
        # same gated zero result the pre-fusion count gate returned
        return {
            "metric_name": "lexical_drift",
            "reference_size": 0,
            "current_size": 0,
            "threshold": detector_threshold,
            "drift_score": 0.0,
            "drift_detected": False,
            "gated": True,
        }
    row = rows[0]
    result: dict = {
        "metric_name": "lexical_drift",
        "reference_size": int(row.n_ref),
        "current_size": int(row.n_cur),
        "threshold": detector_threshold,
    }
    if row.gated:
        result.update({"drift_score": 0.0, "drift_detected": False, "gated": True})
        return result
    result.update(
        {
            "drift_score": float(row.lexical_score),
            "drift_detected": bool(row.drift_detected),
            "analysis": {
                "vocabulary_difference": float(row.vocab_diff),
                "style_difference": float(row.style_diff),
                "jaccard": float(row.jaccard),
                "js": float(row.js),
                "reference_vocab_size": int(row.ref_vocab),
                "current_vocab_size": int(row.cur_vocab),
                "reference_avg_length": float(row.ref_avg_sentence_len),
                "current_avg_length": float(row.cur_avg_sentence_len),
            },
        }
    )
    return result
