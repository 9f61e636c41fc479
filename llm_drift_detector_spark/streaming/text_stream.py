"""Text drift in the stream: lexical (C13/C14), perplexity (C11) and
topic (C12) per micro-batch vs a FROZEN text profile.

Completes the reference's detector registry in continuous mode
(``detectors/__init__.py:58-86`` runs distribution + embedding +
semantic per cadence): ``drift_stream`` covers distributions,
``embedding_stream`` covers C6-C9, this module covers the token-based
families of ``detectors/semantic.py``:

1. :func:`text_reference_profile` — one-off batch jobs over the
   reference window freeze (a) the vocabulary term counts (A8 — also
   the Laplace unigram LM of C11), (b) the C14 style feature row,
   (c) the reference window's own mean perplexity under its own LM
   (C11's baseline, ``semantic.py:140-148``), and optionally (d) the
   topic distribution (C12, argmax-dim stand-in at the documented
   model seam).  Driver state is O(|window vocab| + #topics) — bounded
   by drift-WINDOW vocabulary under reference semantics
   (``default_config.py:104``), same driver-memory contract as the
   grouped distribution profiles.
2. :func:`stream_text_drift` — per micro-batch, ONE fused Spark action
   computes every lexical/perplexity input: the frozen vocab frame
   full-outer-joins the batch token counts (C13's jaccard + inside-
   the-log JS, side-total normalized, ``semantic.py:396-407``,
   disjoint-vocab bare-jaccard rule included), batch token/sentence
   style stats (C14), and per-doc perplexity under the FROZEN LM
   (unknown tokens at the Laplace floor).  The four 1-row subframes
   crossJoin into a single collected row — four scans of a micro-batch-
   sized input, zero per-row Python.  When topics are frozen, a second
   O(#topics) aggregate feeds C12's JS driver-side.  Scores and
   verdicts mirror the batch detectors exactly:

   - ``lexical_score``  = 0.6*vocab_diff + 0.4*style_diff, drift iff
     > LEXICAL_THRESHOLD (``semantic.py:312-315``)
   - ``ppl_score``      = min(rel_change/0.3, 1), drift iff rel > 0.3
     (``semantic.py:140-148``; unigram-LM stand-in at the GPT-2 seam)
   - ``topic_score``    = min(js/0.4, 1), drift iff js > 0.4
     (``semantic.py:244-271``)

Same sink contract as the other streaming families: one metrics row
per epoch at ``<out>/text_metrics``, written by OVERWRITING the
``epoch=<k>`` partition (idempotent foreachBatch replays), Spark's
streaming checkpoint giving each input file exactly-once processing.
"""

from __future__ import annotations

import math
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..config import LEXICAL_THRESHOLD, MIN_SAMPLES
from ..drift.lexical import style_features_frame
from ..drift.semantic import (
    PERPLEXITY_THRESHOLD,
    TOPIC_THRESHOLD,
    assign_topics,
    unigram_perplexities,
)

TEXT_METRICS_SCHEMA = (
    "run_id string, epoch bigint, n bigint, jaccard double, js double, "
    "vocab_diff double, style_diff double, lexical_score double, "
    "lexical_drift boolean, mean_perplexity double, ppl_rel_change double, "
    "ppl_score double, ppl_drift boolean, topic_js double, "
    "topic_score double, topic_drift boolean, drift_detected boolean, "
    "gated boolean"
)
_SINK_ROW_SCHEMA = TEXT_METRICS_SCHEMA.replace("epoch bigint, ", "")


def _tokens(df: DataFrame, col: str) -> DataFrame:
    """(_doc, token): reference tokenization (lower().split(), empties
    dropped) with the doc id assigned BEFORE the explode."""
    return (
        df.where(F.col(col).isNotNull())
        .withColumn("_doc", F.monotonically_increasing_id())
        .select(
            "_doc", F.explode(F.split(F.lower(F.col(col)), r"\s+")).alias("token")
        )
        .where(F.col("token") != "")
    )


def text_reference_profile(
    ref: DataFrame, column: str, topic_column: str | None = None
) -> dict:
    """Frozen text profile: vocab counts + style row + own-LM mean
    perplexity (+ topic distribution when ``topic_column`` is given).

    Raises when the reference window has fewer than MIN_SAMPLES non-null
    docs — a frozen monitor baseline below the detector gate would flag
    nothing forever, which is worse than failing at freeze time.
    """
    base = ref.where(F.col(column).isNotNull())
    n = base.count()
    if n < MIN_SAMPLES:
        raise ValueError(
            f"reference window has {n} non-null {column} docs "
            f"(< MIN_SAMPLES={MIN_SAMPLES}) — refusing to freeze a gated baseline"
        )
    vocab_rows = (
        _tokens(ref, column).groupBy("token").agg(F.count("*").alias("cnt")).collect()
    )
    vocab = {r.token: int(r.cnt) for r in vocab_rows}
    style = style_features_frame(ref, column).collect()[0].asDict()
    mean_ppl = float(
        unigram_perplexities(ref, ref, column)
        .agg(F.avg("perplexity").alias("m"))
        .collect()[0]
        .m
        or 0.0
    )
    profile = {
        "kind": "text",
        "column": column,
        "n": int(n),
        "vocab": vocab,
        "total_tokens": int(sum(vocab.values())),
        "style": {k: float(v) for k, v in style.items()},
        "ref_mean_perplexity": mean_ppl,
    }
    if topic_column is not None:
        tdf = ref.where(
            F.col(topic_column).isNotNull() & (F.size(F.col(topic_column)) > 0)
        )
        counts = (
            assign_topics(tdf, topic_column)
            .groupBy("topic")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
        tot = float(sum(r.cnt for r in counts)) or 1.0
        profile["topic_column"] = topic_column
        # JSON object keys are strings; topic ids stay ints in memory
        profile["topics"] = {str(int(r.topic)): r.cnt / tot for r in counts}
    return profile


def _norm_diff(a: float, b: float) -> float:
    mx = max(a, b)
    return abs(a - b) / mx if mx > 0 else 0.0


def _topic_js(ref_p: dict[str, float], cur_counts: dict[int, int]) -> float:
    """C12's JS (epsilon INSIDE the log, ``semantic.py:244-271``) over
    the union of frozen and batch topics — O(#topics) driver math."""
    tot = float(sum(cur_counts.values())) or 1.0
    keys = set(ref_p) | {str(t) for t in cur_counts}
    js = 0.0
    for k in keys:
        pr = ref_p.get(k, 0.0)
        pc = cur_counts.get(int(k), 0) / tot
        m = (pr + pc) / 2
        js += 0.5 * pr * math.log(pr / m + 1e-10) if pr > 0 else 0.0
        js += 0.5 * pc * math.log(pc / m + 1e-10) if pc > 0 else 0.0
    return js


_ZERO = {
    "jaccard": 0.0, "js": 0.0, "vocab_diff": 0.0, "style_diff": 0.0,
    "lexical_score": 0.0, "lexical_drift": False,
    "mean_perplexity": 0.0, "ppl_rel_change": 0.0, "ppl_score": 0.0,
    "ppl_drift": False,
}


def _batch_row(
    spark: SparkSession, batch_df: DataFrame, profile: dict
) -> tuple:
    """The ONE fused action: (vocab metrics ⋈ token stats) × ppl ×
    sentence stats × doc count, collected as a single row."""
    column = profile["column"]
    rt = float(max(profile["total_tokens"], 1))
    denom = float(profile["total_tokens"] + max(len(profile["vocab"]), 1))

    frozen = spark.createDataFrame(
        list(profile["vocab"].items()) or [("", 0)], "token string, cr bigint"
    ).where(F.col("token") != "")
    toks = _tokens(batch_df, column)
    cur_tc = toks.groupBy("token").agg(F.count("*").alias("cc"))

    # C13 vocab metrics + batch token-level style stats in one subframe:
    # the batch token total enters via a broadcast 1-row crossJoin (the
    # corpus-scale totals shape — no single-partition window)
    ct_tot = cur_tc.agg(
        F.greatest(F.coalesce(F.sum("cc"), F.lit(0)), F.lit(1)).alias("ct")
    )
    j = frozen.join(cur_tc, "token", "full_outer").crossJoin(F.broadcast(ct_tot))
    both = F.col("cr").isNotNull() & F.col("cc").isNotNull()
    p = F.col("cr").cast("double") / F.lit(rt)
    q = F.col("cc").cast("double") / F.col("ct").cast("double")
    m = (p + q) / 2
    vocab_row = j.agg(
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
        F.sum(F.col("cc").isNotNull().cast("bigint")).alias("cur_vocab"),
        F.coalesce(F.sum("cc"), F.lit(0)).alias("tc_c"),
        F.coalesce(F.sum(F.length("token") * F.col("cc")), F.lit(0)).alias("awl_num"),
    )

    # C11: per-doc perplexity under the FROZEN LM (broadcast join,
    # Laplace floor for unknown tokens — same formula as
    # unigram_perplexities but with frozen counts)
    ppl_row = (
        toks.join(F.broadcast(frozen), "token", "left")
        .select(
            "_doc",
            F.log((F.coalesce(F.col("cr"), F.lit(0)) + 1.0) / F.lit(denom)).alias(
                "logp"
            ),
        )
        .groupBy("_doc")
        .agg(F.exp(-F.avg("logp")).alias("ppl"))
        .agg(F.coalesce(F.avg("ppl"), F.lit(0.0)).alias("mean_ppl"))
    )

    base = batch_df.where(F.col(column).isNotNull())
    sent_row = (
        base.select(F.explode(F.split(F.col(column), r"\.")).alias("s"))
        .where(F.trim("s") != "")
        .agg(
            F.coalesce(
                F.avg(
                    F.size(F.filter(F.split(F.col("s"), r"\s+"), lambda x: x != ""))
                ),
                F.lit(0.0),
            ).alias("asl_c")
        )
    )
    n_row = base.agg(F.count("*").alias("n"))
    return (
        vocab_row.crossJoin(ppl_row).crossJoin(sent_row).crossJoin(n_row).collect()[0]
    )


def _text_metrics(
    row, profile: dict, lexical_threshold: float, ppl_threshold: float
) -> dict:
    """O(1) driver arithmetic from the fused row's aggregates."""
    union_n = max(int(row.union_n), 1)
    jaccard = 1.0 - int(row.inter_n) / union_n
    js = float(row.js)
    # disjoint vocabularies: bare jaccard (semantic.py:396-398)
    vocab_diff = (
        jaccard if int(row.inter_n) == 0 else 0.5 * jaccard + 0.5 * min(js, 1.0)
    )
    st = profile["style"]
    tc_c = max(int(row.tc_c), 1)
    awl_c = float(row.awl_num) / tc_c if int(row.tc_c) else 0.0
    div_c = int(row.cur_vocab) / tc_c if int(row.tc_c) else 0.0
    style_diff = (
        0.4 * _norm_diff(st["avg_sentence_len"], float(row.asl_c))
        + 0.3 * _norm_diff(st["avg_word_len"], awl_c)
        + 0.3 * abs(st["diversity"] - div_c)
    )
    lex = 0.6 * vocab_diff + 0.4 * style_diff
    ref_ppl = profile["ref_mean_perplexity"]
    mean_ppl = float(row.mean_ppl)
    rel = abs(mean_ppl - ref_ppl) / max(ref_ppl, 1e-10)
    return {
        "jaccard": float(jaccard),
        "js": js,
        "vocab_diff": float(vocab_diff),
        "style_diff": float(style_diff),
        "lexical_score": float(lex),
        "lexical_drift": bool(lex > lexical_threshold),
        "mean_perplexity": mean_ppl,
        "ppl_rel_change": float(rel),
        "ppl_score": float(min(rel / ppl_threshold, 1.0)),
        "ppl_drift": bool(rel > ppl_threshold),
    }


def stream_text_drift(
    spark: SparkSession,
    text_dir: str,
    profile: dict,
    out_dir: str,
    schema,
    run_id: str = "drift-stream",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    min_samples: int = MIN_SAMPLES,
    lexical_threshold: float = LEXICAL_THRESHOLD,
    ppl_threshold: float = PERPLEXITY_THRESHOLD,
    topic_threshold: float = TOPIC_THRESHOLD,
):
    """Per-micro-batch lexical + perplexity (+ topic) drift vs a frozen
    text profile.  One metrics row per epoch at ``<out>/text_metrics``
    (``TEXT_METRICS_SCHEMA``); epoch-partition overwrite keeps replays
    idempotent.  Returns the streaming query.
    """
    topic_col = profile.get("topic_column")
    sink = os.path.join(out_dir, "text_metrics")
    checkpoint = os.path.join(out_dir, "_text_stream_checkpoint")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        row = _batch_row(spark, batch_df, profile)
        n = int(row.n)
        gated = n < min_samples
        m = (
            dict(_ZERO)
            if gated
            else _text_metrics(row, profile, lexical_threshold, ppl_threshold)
        )
        topic_js = topic_score = topic_drift = None
        if topic_col is not None and not gated:
            counts = (
                assign_topics(
                    batch_df.where(
                        F.col(topic_col).isNotNull()
                        & (F.size(F.col(topic_col)) > 0)
                    ),
                    topic_col,
                )
                .groupBy("topic")
                .agg(F.count("*").alias("cnt"))
                .collect()
            )
            tj = _topic_js(profile["topics"], {int(r.topic): int(r.cnt) for r in counts})
            topic_js = float(tj)
            topic_score = float(min(tj / topic_threshold, 1.0))
            topic_drift = bool(tj > topic_threshold)
        detected = bool(
            m["lexical_drift"] or m["ppl_drift"] or (topic_drift or False)
        )
        out_row = [
            (
                run_id, n,
                m["jaccard"], m["js"], m["vocab_diff"], m["style_diff"],
                m["lexical_score"], m["lexical_drift"],
                m["mean_perplexity"], m["ppl_rel_change"], m["ppl_score"],
                m["ppl_drift"],
                topic_js, topic_score, topic_drift,
                detected, bool(gated),
            )
        ]
        spark.createDataFrame(out_row, _SINK_ROW_SCHEMA).write.mode(
            "overwrite"
        ).parquet(f"{sink}/epoch={int(epoch_id)}")

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(text_dir)
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q
