"""Semantic drift: perplexity (C11) and topic (C12) —
``detectors/semantic.py:114-286`` — with model-free stand-ins.

The reference uses GPT-2 for perplexity and BERTopic for topics, neither
of which exists in this environment (and neither belongs in a 10^12-row
hot path).  The DRIFT ARITHMETIC is mirrored exactly; the model is
swapped for a deterministic, fully-distributed stand-in, each at a
documented seam where a real model plugs in:

- perplexity: a corpus unigram language model.  perplexity(doc) =
  exp(mean over tokens of -ln p(token)), p from the REFERENCE window's
  token frequencies (Laplace-smoothed).  Swap point: a pandas_udf
  scoring loss with a real LM — the downstream relative-mean-change /
  0.3-cap arithmetic (semantic.py:140-148) is unchanged.
- topics: topic(doc) = argmax dimension of its embedding vector (a
  deterministic hard clustering; any topic-assignment column works).
  The bincount -> normalize -> JS(+1e-10 inside log) -> /0.4-cap chain
  (semantic.py:244-271) is unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..config import MIN_SAMPLES

PERPLEXITY_THRESHOLD = 0.3  # semantic.py:147 default
TOPIC_THRESHOLD = 0.4       # semantic.py:265 default (topic_drift_threshold)


def _tokens(df: DataFrame, col: str, id_col: str | None = None) -> DataFrame:
    # the doc id must be assigned BEFORE the explode (after it, every
    # token row would get its own id and per-doc grouping falls apart)
    base = df.where(F.col(col).isNotNull())
    if id_col is None:
        base = base.withColumn("_doc", F.monotonically_increasing_id())
    else:
        base = base.withColumn("_doc", F.col(id_col))
    return (
        base.select("_doc", F.explode(F.split(F.lower(F.col(col)), r"\s+")).alias("token"))
        .where(F.col("token") != "")
    )


def unigram_perplexities(
    ref: DataFrame, score_df: DataFrame, col: str, id_col: str | None = None
) -> DataFrame:
    """Per-doc perplexity of `score_df` docs under the ref-window unigram
    LM: (_doc, perplexity) where _doc is `id_col` if given (else a plan-
    local surrogate).  Unknown tokens get the Laplace floor 1/(N+V).
    One token-count agg + one broadcastable join."""
    ref_toks = _tokens(ref, col)
    lm = ref_toks.groupBy("token").agg(F.count("*").alias("cnt"))
    totals = lm.agg(F.sum("cnt").alias("n"), F.count("*").alias("v")).collect()[0]
    n_total, vocab = float(totals.n or 0), float(totals.v or 1)
    denom = n_total + vocab  # Laplace: p = (cnt + 1) / (N + V)
    doc_toks = _tokens(score_df, col, id_col)
    joined = doc_toks.join(F.broadcast(lm), "token", "left").select(
        "_doc",
        F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1.0) / F.lit(denom)).alias("logp"),
    )
    return joined.groupBy("_doc").agg(
        F.exp(-F.avg("logp")).cast("double").alias("perplexity")
    )


def perplexity_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str = "transcript",
    threshold: float = PERPLEXITY_THRESHOLD,
    min_samples: int = MIN_SAMPLES,
) -> dict:
    """C11: relative change of mean perplexity, /threshold capped at 1.

    FUSED (r3): two Spark actions (one when gated).  Action 1 counts
    both windows in one tagged-union aggregate; action 2 scores BOTH
    windows under the reference LM in one plan — the LM token counts
    and their Laplace totals stay IN-plan (1-row aggregate broadcast +
    vocab-frame broadcast join; no driver round-trip), then one
    two-level aggregation (per doc, then per side) produces both mean
    perplexities.  r2's version issued ~5 actions and collected LM
    totals to the driver.
    """
    tagged = (
        ref.where(F.col(col).isNotNull())
        .select(F.col(col).alias("t"), F.lit(1).alias("is_ref"))
        .unionByName(
            cur.where(F.col(col).isNotNull())
            .select(F.col(col).alias("t"), F.lit(0).alias("is_ref"))
        )
    )
    is_r = F.col("is_ref") == 1
    counts = tagged.agg(
        F.count(F.when(is_r, 1)).alias("nr"),
        F.count(F.when(~is_r, 1)).alias("nc"),
    ).collect()[0]
    n_ref, n_cur = int(counts.nr), int(counts.nc)
    result: dict = {
        "metric_name": "perplexity_drift",
        "reference_size": n_ref,
        "current_size": n_cur,
        "threshold": threshold,
    }
    if n_ref < min_samples or n_cur < min_samples:
        result.update({"drift_score": 0.0, "drift_detected": False, "gated": True})
        return result

    docs = tagged.withColumn("_doc", F.monotonically_increasing_id())
    toks = docs.select(
        "is_ref", "_doc", F.explode(F.split(F.lower(F.col("t")), r"\s+")).alias("token")
    ).where(F.col("token") != "")
    lm = toks.where(F.col("is_ref") == 1).groupBy("token").agg(
        F.count("*").alias("cnt")
    )
    totals = lm.agg(
        (F.coalesce(F.sum("cnt"), F.lit(0)) + F.count("*")).alias("denom")
    )
    scored = (
        toks.crossJoin(F.broadcast(totals))
        .join(F.broadcast(lm), "token", "left")
        .select(
            "is_ref",
            "_doc",
            F.log(
                (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0) / F.col("denom")
            ).alias("logp"),
        )
    )
    perdoc = scored.groupBy("is_ref", "_doc").agg(
        F.exp(-F.avg("logp")).alias("ppl")
    )
    means = perdoc.agg(
        F.avg(F.when(is_r, F.col("ppl"))).alias("mr"),
        F.avg(F.when(~is_r, F.col("ppl"))).alias("mc"),
    ).collect()[0]
    ref_mean, cur_mean = float(means.mr or 0.0), float(means.mc or 0.0)
    rel = abs(cur_mean - ref_mean) / max(ref_mean, 1e-10)
    score = min(rel / threshold, 1.0)
    result.update(
        {
            "drift_score": score,
            # mirrors C18 with the capped score; a capped score of 1.0
            # means rel_change >= threshold
            "drift_detected": rel > threshold,
            "analysis": {
                "reference_mean": float(ref_mean),
                "current_mean": float(cur_mean),
                "relative_change": float(rel),
                "model": "unigram-LM stand-in (swap point for a real LM)",
            },
        }
    )
    return result


def assign_topics(df: DataFrame, emb_col: str = "embedding") -> DataFrame:
    """Deterministic hard topic assignment: argmax embedding dimension.

    Stand-in for BERTopic fit/transform — swap point for any clustering;
    downstream only needs a `topic` int column.
    """
    pos = F.array_position(
        F.col(emb_col), F.array_max(F.col(emb_col))
    )
    return df.withColumn("topic", (pos - 1).cast("int"))


def topic_histogram(df: DataFrame, topic_col: str = "topic") -> DataFrame:
    """A9: normalized topic distribution (topic, p)."""
    counts = df.groupBy(topic_col).agg(F.count("*").alias("cnt"))
    total = F.sum("cnt").over(Window.partitionBy())
    return counts.select(
        F.col(topic_col).alias("topic"), (F.col("cnt") / total).cast("double").alias("p")
    )


def grouped_topic_drift(
    df: DataFrame,
    keys: list[str],
    topic_col: str = "topic",
    side_col: str = "side",
    threshold: float = TOPIC_THRESHOLD,
) -> DataFrame:
    """C12 for ALL groups in ONE fully-native job — one row per group.

    The reference runs the semantic detector per provider
    (``detectors/__init__.py:58-86``); here every group's topic
    distributions, JS (epsilon inside the log, semantic.py:244-271) and
    /0.4-capped score ride one plan: groupBy(keys, topic) counts both
    sides, per-group windowed totals normalize, one groupBy(keys)
    reduces to the verdict.  State per group is O(#topics).
    Input is the ``tag_windows`` tagged-union shape.
    """
    is_r = F.col(side_col) == "ref"
    counts = (
        df.where(F.col(topic_col).isNotNull())
        .groupBy(*keys, topic_col)
        .agg(
            F.sum(is_r.cast("bigint")).alias("cr"),
            F.sum((~is_r).cast("bigint")).alias("cc"),
        )
    )
    gw = Window.partitionBy(*keys)
    probs = counts.select(
        *keys,
        F.try_divide(F.col("cr"), F.sum("cr").over(gw)).alias("pr"),
        F.try_divide(F.col("cc"), F.sum("cc").over(gw)).alias("pc"),
    ).fillna(0.0, subset=["pr", "pc"])
    m = (F.col("pr") + F.col("pc")) / 2
    out = probs.groupBy(*keys).agg(
        (
            0.5 * F.sum(F.col("pr") * F.log(F.col("pr") / m + 1e-10))
            + 0.5 * F.sum(F.col("pc") * F.log(F.col("pc") / m + 1e-10))
        ).cast("double").alias("js"),
        F.sum((F.col("pr") > 0).cast("int")).alias("ref_topics"),
        F.sum((F.col("pc") > 0).cast("int")).alias("cur_topics"),
    )
    js = F.coalesce(F.col("js"), F.lit(0.0))
    return out.select(
        *keys,
        js.alias("js"),
        F.least(js / threshold, F.lit(1.0)).cast("double").alias("drift_score"),
        (js > threshold).alias("drift_detected"),
        "ref_topics",
        "cur_topics",
    )


def topic_drift(
    ref: DataFrame,
    cur: DataFrame,
    topic_col: str = "topic",
    threshold: float = TOPIC_THRESHOLD,
) -> dict:
    """C12: JS divergence (epsilon inside the log) between topic
    distributions, /threshold capped at 1 (semantic.py:244-271)."""
    r = topic_histogram(ref, topic_col).withColumnRenamed("p", "pr")
    c = topic_histogram(cur, topic_col).withColumnRenamed("p", "pc")
    j = r.join(c, "topic", "full_outer").fillna(0.0, subset=["pr", "pc"])
    m = (F.col("pr") + F.col("pc")) / 2
    js_row = j.agg(
        (
            0.5 * F.sum(F.col("pr") * F.log(F.col("pr") / m + 1e-10))
            + 0.5 * F.sum(F.col("pc") * F.log(F.col("pc") / m + 1e-10))
        ).alias("js"),
        F.sum((F.col("pr") > 0).cast("int")).alias("ref_topics"),
        F.sum((F.col("pc") > 0).cast("int")).alias("cur_topics"),
    ).collect()[0]
    js = float(js_row.js or 0.0)
    score = min(js / threshold, 1.0)
    return {
        "metric_name": "topic_drift",
        "drift_score": score,
        "drift_detected": js > threshold,
        "threshold": threshold,
        "analysis": {
            "jensen_shannon_divergence": js,
            "reference_topic_count": int(js_row.ref_topics),
            "current_topic_count": int(js_row.cur_topics),
            "method": "argmax-dim topics (swap point for a real topic model)",
        },
    }
