"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Conventions used here so Spark and DuckDB hash identically:
- every computed double is ROUND(x, 4) on BOTH sides;
- every aggregate / computed column is aliased identically on both sides;
- results are deterministic (no timestamps, no rand).

Clip-table queries run over the deterministic synthetic audio tables
(FIXTURES.md) cached under /root/repo/data/synth/<tier>/; their oracle
SQL reads the same parquet files via read_parquet() absolute paths.
``_ensure_synth_for_oracle`` regenerates them (pure pandas/pyarrow, no
Spark) if the cache is missing when oracle_sql() is called.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from llm_drift_detector_spark.checks import (
    domain_violations,
    duplicate_keys,
    orphans,
    profile,
    uniqueness_metrics,
)
from llm_drift_detector_spark.checks.audio import (
    audio_invariant_violations,
    transcript_mismatches,
)
from llm_drift_detector_spark.config import CODEC_WHITELIST, SR_HZ_DOMAIN
from llm_drift_detector_spark.drift import (
    centroid,
    centroid_cosine_frame,
    js_psi_frame,
    ks_frame,
    mean_dist_frame,
    psi_frame,
    rolling_zscore_anomalies,
    style_features_frame,
    token_counts,
    two_sample_moments,
    vocab_difference_frame,
    wasserstein_frame,
    welch_t_frame,
)
from llm_drift_detector_spark.synth import ensure_synth, synth_dir_for
from llm_drift_detector_spark.synth.clips import ensure_synth_local
from llm_drift_detector_spark.textops import (
    exact_duplicates,
    fingerprint,
    language_id,
    minhash_signatures,
    quality_scores,
    shingles,
    simhash_signatures,
    token_counts_frame,
    topk_brute,
    topk_lsh,
)

import numpy as np

# fixed ANN query vector (seeded; embedded as literals in the oracle SQL)
_ANN_QUERY = np.random.default_rng(7).standard_normal(64)
SIMHASH_BITS = 24  # keep the generated oracle SQL a sane size

# fixed split + pinned bin count for the events drift queries: the Rice
# rule's ceil(2*n^(1/3)) can round differently across engines when n^(1/3)
# lands on a representable integer, so oracle queries pin nbins.
EVENTS_SPLIT_TS = "2024-01-15 00:00:00"
ORACLE_NBINS = 40

SYNTH_SF001 = "/root/repo/data/synth/sf0.01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _clips(spark: SparkSession, sf_dir: str, name: str = "clips") -> DataFrame:
    root = ensure_synth(spark, sf_dir)
    return spark.read.parquet(os.path.join(root, name))


def _round(df: DataFrame, n: int = 4) -> DataFrame:
    """Round every double column to n decimals (cross-engine hash parity)."""
    cols = [
        F.round(F.col(f.name), n).alias(f.name)
        if f.dataType.simpleString() == "double"
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


_round4 = _round


def _events_windows(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    ev = _t(spark, sf_dir, "events")
    ref = ev.where(F.col("ts") < EVENTS_SPLIT_TS).select("value")
    cur = ev.where(F.col("ts") >= EVENTS_SPLIT_TS).select("value")
    return ref, cur


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full validation of the sf0.001 synthetic clips table.

    One row per check with its violation count, plus a rows_total row —
    the engine's core "validate a clips table, emit violations" job
    (SURVEY.md §7.1) collapsed to its summary.  Covers all 8 mandated
    checks including the mapInPandas audio decoder.
    """
    sf_dir = "/root/testdata/sf0.001"
    clips = _clips(spark, sf_dir, "clips")
    tr = _clips(spark, sf_dir, "transcripts")
    ref = _clips(spark, sf_dir, "clips_reference")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("violations")).select(
            F.lit(name).alias("check_name"), "violations"
        )

    audio = audio_invariant_violations(clips, ref)
    parts = [
        clips.agg(F.count("*").cast("bigint").alias("violations")).select(
            F.lit("rows_total").alias("check_name"), "violations"
        ),
        one("uniqueness", duplicate_keys(clips)),
        one("sr_hz_domain", domain_violations(clips, "sr_hz", SR_HZ_DOMAIN)),
        one("codec_whitelist", domain_violations(clips, "codec", CODEC_WHITELIST)),
        one("referential_clip_orphan", orphans(clips, tr)),
        one("referential_transcript_orphan", orphans(tr, clips)),
        one("transcript_equality", transcript_mismatches(clips, tr)),
        one("dur_ms_mismatch", audio.where("check_name = 'dur_ms_mismatch'")),
        one("snr_allclose", audio.where("check_name = 'snr_allclose'")),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check_name")


# ---------------------------------------------------------------------------
# queries — Spark side
# ---------------------------------------------------------------------------


def q_join_agg_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General join+agg shape: lineitem |x| orders |x| customer |x|
    broadcast(nation) -> revenue per nation.  Demonstrates the engine's
    join planning: dimension tables broadcast, fact joins shuffle on
    keys, partial aggregation map-side."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    )
    return _round(
        j.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count("*").cast("bigint").alias("n_items"),
        )
        .orderBy("nation"),
        2,
    )


def q_topk_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-rank top-k per group: top 3 customers by revenue per
    mktsegment (rank/partition window — the analytic-frame shape)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    from pyspark.sql import Window

    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment", "c_custkey")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("revenue"), F.col("c_custkey")
    )
    return (
        per_cust.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 3)
        .select(
            F.col("c_mktsegment").alias("mktsegment"),
            F.col("c_custkey").cast("bigint").alias("custkey"),
            "revenue",
            F.col("rnk").cast("int").alias("rnk"),
        )
        .orderBy("mktsegment", "rnk")
    )


def q_uniqueness_orders_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch uniqueness (the 10^12-row path), made oracle-checkable:
    the HLL estimate itself is engine-specific, so the query emits the
    exact total/distinct plus a boolean asserting the estimate landed
    within the documented rsd envelope (5% default => 3 sigma ~ 15%,
    assert 5% — HLL on 10k+ keys is far tighter in practice)."""
    approx = uniqueness_metrics(_t(spark, sf_dir, "orders"), "o_orderkey", approx=True)
    exact = uniqueness_metrics(_t(spark, sf_dir, "orders"), "o_orderkey")
    a = approx.select(F.col("distinct").alias("approx_distinct"))
    e = exact.select("total", F.col("distinct").alias("exact_distinct"))
    return e.crossJoin(a).select(
        "total",
        "exact_distinct",
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            / F.col("exact_distinct")
            <= 0.05
        ).alias("within_tolerance"),
    )


def _docs_with_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents + 5 re-appended rows: deterministic duplicate injection
    done identically in the oracle SQL (driver documents are unique)."""
    d = _t(spark, sf_dir, "documents")
    return d.unionAll(d.orderBy("doc_id").limit(5))


def q_perplexity_unigram_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 stand-in: per-doc perplexity under the en-docs unigram LM."""
    from llm_drift_detector_spark.drift.semantic import unigram_perplexities

    d = _t(spark, sf_dir, "documents")
    ref = d.where(F.col("lang") == "en").select(F.col("text").alias("transcript"))
    out = unigram_perplexities(
        ref,
        d.select("doc_id", F.col("text").alias("transcript")),
        "transcript",
        id_col="doc_id",
    )
    return _round(out.withColumnRenamed("_doc", "id"), 6).orderBy("id")


def q_topic_histogram_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9/C12 stand-in: argmax-dim topic distribution of embeddings."""
    from llm_drift_detector_spark.drift.semantic import assign_topics, topic_histogram

    e = _t(spark, sf_dir, "embeddings")
    return _round(topic_histogram(assign_topics(e, "embedding")), 6).orderBy("topic")


def q_dedup_clusters_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected-component dedup clusters over injected exact-duplicate
    pairs (docs 0-4 re-added under doc_id+10000): the iterative hash-min
    operator, oracle-checked because exact-dup components are trivially
    SQL-expressible (min id per md5 group)."""
    from llm_drift_detector_spark.textops import duplicate_clusters, exact_duplicates

    d = _t(spark, sf_dir, "documents")
    dups = d.orderBy("doc_id").limit(5).withColumn(
        "doc_id", F.col("doc_id") + 10000
    )
    both = d.unionAll(dups)
    groups = exact_duplicates(both, "doc_id", "text")
    a, b = groups.alias("a"), groups.alias("b")
    pairs = (
        a.join(b, "dup_group")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    )
    return duplicate_clusters(pairs).orderBy("id")


def q_dedup_exact_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(_docs_with_dups(spark, sf_dir), "doc_id", "text").orderBy(
        "id"
    )


def q_dedup_minhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 50)
    return minhash_signatures(shingles(d, "doc_id", "text"), k=8).orderBy("id")


def q_dedup_simhash_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").where(F.col("doc_id") < 30)
    return simhash_signatures(d, "doc_id", "text", bits=SIMHASH_BITS).orderBy("id")


def q_langid_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return _round(language_id(d, "doc_id", "text"), 6).orderBy("id")


def q_quality_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    return _round(quality_scores(d, "doc_id", "text"), 6).orderBy("id")


def q_token_counts_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts_frame(_t(spark, sf_dir, "documents"), "doc_id", "text").orderBy("id")


def q_fingerprint_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprint(_t(spark, sf_dir, "documents"), "doc_id", "text").orderBy("id")


def q_similarity_topk_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return _round(topk_brute(e, "vec_id", "embedding", _ANN_QUERY, k=10), 6)


def q_similarity_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN — the seeded hyperplanes are embedded as literals
    in the oracle SQL, so DuckDB replays the exact bucket pruning and the
    result is fully hash-checked."""
    e = _t(spark, sf_dir, "embeddings")
    return _round(topk_lsh(e, "vec_id", "embedding", _ANN_QUERY, k=10), 6)


def q_similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (k-means coarse quantizer) ANN.  The iterative fit is not
    SQL-expressible, so the oracle checks the CONTRACT instead of the
    ids: recall@10 vs the brute-force top-k must clear 0.8 (deterministic
    seeds -> deterministic verdict)."""
    from llm_drift_detector_spark.textops import topk_brute, topk_ivf

    e = _t(spark, sf_dir, "embeddings")
    # gaussian embeddings are IVF's worst case (no cluster structure, so
    # recall ~ nprobe/n_clusters); nprobe=6/8 clears the 0.8 contract
    ivf = topk_ivf(e, "vec_id", "embedding", _ANN_QUERY, k=10, n_clusters=8, nprobe=6)
    brute = topk_brute(e, "vec_id", "embedding", _ANN_QUERY, k=10)
    hits = ivf.select("id").join(brute.select("id"), "id").count()
    return e.sparkSession.createDataFrame(
        [(10, hits / 10.0 >= 0.8)], "k int, recall_ok boolean"
    )


def q_embedding_near_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed cosine near-dup pairs — the oracle replays the
    signature computation (plane literals), the bucket self-join, and the
    cosine verify in SQL, so the emitted pair set is fully hash-checked."""
    from llm_drift_detector_spark.textops import cosine_near_duplicates

    e = _t(spark, sf_dir, "embeddings")
    return _round(
        cosine_near_duplicates(e, "vec_id", "embedding", threshold=0.3), 6
    ).orderBy("id_a", "id_b")


def q_lexical_vocab_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13 vocabulary difference: en documents vs non-en documents."""
    d = _t(spark, sf_dir, "documents")
    ref = d.where(F.col("lang") == "en").select(F.col("text").alias("transcript"))
    cur = d.where(F.col("lang") != "en").select(F.col("text").alias("transcript"))
    return _round(vocab_difference_frame(ref, cur, "transcript"), 6)


def q_style_features_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select(F.col("text").alias("transcript"))
    return _round(style_features_frame(d, "transcript"), 6)


def q_vocab_term_freq_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 term frequencies (top 50 by count then token for determinism)."""
    d = _t(spark, sf_dir, "documents").select(F.col("text").alias("transcript"))
    return (
        token_counts(d, "transcript")
        .orderBy(F.desc("cnt"), "token")
        .limit(50)
        .select("token", F.col("cnt").cast("bigint").alias("cnt"))
    )


def q_rolling_zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    got = rolling_zscore_anomalies(ev, "value", "event_id", window_size=20, z_threshold=2.0)
    return _round(got.orderBy("event_id"), 6)


def q_pivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 heatmap analog: mean quantity, returnflag x linestatus."""
    li = _t(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.avg("l_quantity"))
        .withColumnRenamed("F", "f_avg")
        .withColumnRenamed("O", "o_avg")
    )
    return _round(p, 6)


def q_clips_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _round4(profile(_clips(spark, sf_dir), ["sr_hz", "dur_ms"]))


def q_clips_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _round4(uniqueness_metrics(_clips(spark, sf_dir), "clip_id"))


def q_clips_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicate_keys(_clips(spark, sf_dir)).select(
        "clip_id", F.col("n").cast("bigint").alias("n")
    )


def q_clips_sr_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_violations(_clips(spark, sf_dir), "sr_hz", SR_HZ_DOMAIN)


def q_clips_codec_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_violations(_clips(spark, sf_dir), "codec", CODEC_WHITELIST)


def _emb_windows(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    e = _t(spark, sf_dir, "embeddings")
    return (
        e.where(F.col("vec_id") % 2 == 0).select("embedding"),
        e.where(F.col("vec_id") % 2 == 1).select("embedding"),
    )


def q_embedding_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, cur = _emb_windows(spark, sf_dir)
    return _round(centroid_cosine_frame(ref, cur, "embedding", 64), 6)


def q_embedding_mean_dist_to_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: avg cosine distance of current rows to the reference centroid."""
    ref, cur = _emb_windows(spark, sf_dir)
    c = centroid(ref, "embedding", 64)
    return _round(mean_dist_frame(cur, "embedding", c, "cosine"), 6)


def q_clips_transcript_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return transcript_mismatches(
        _clips(spark, sf_dir), _clips(spark, sf_dir, "transcripts")
    )


def q_clips_dur_mismatch_bytelen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dur_ms mismatch for byte-length-derivable codecs (pcm: 2 B/sample,
    opus/mu-law: 1 B/sample, canonical-header wav: (len-44)/2) — the
    native fast-path subset of the full mapInPandas check, SQL-expressible
    for the oracle (flac needs decode)."""
    from llm_drift_detector_spark.checks.audio import (
        wav_canonical_pred,
        wav_native_n_samples,
    )

    c = _clips(spark, sf_dir)
    wav_native = (F.col("codec") == "wav") & wav_canonical_pred()
    n_samples = (
        F.when(F.col("codec") == "pcm_s16le", F.floor(F.length("bytes") / 2))
        .when(F.col("codec") == "opus", F.length("bytes"))
        .when(wav_native, wav_native_n_samples())
    )
    implied = n_samples * 1000.0 / F.col("sr_hz")
    return (
        c.where(F.col("codec").isin("pcm_s16le", "opus") | wav_native)
        .where(F.abs(F.col("dur_ms") - implied) > 1.0)
        .select("clip_id", "codec")
    )


def q_clips_audio_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decoder check (all codecs + SNR) — mapInPandas.  Decode is not
    SQL-expressible, so the oracle is a GOLDEN parquet the deterministic
    synth generator emits at build time (synth.clips.
    ensure_expected_audio_violations — the generator knows every planted
    violation); the driver hash-compares against it like any SQL oracle.
    Golden-set parity is additionally covered by tests/test_audio_check.py."""
    got = audio_invariant_violations(
        _clips(spark, sf_dir), _clips(spark, sf_dir, "clips_reference")
    )
    return got.select("check_name", "clip_id").orderBy("check_name", "clip_id")


def q_clips_orphan_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    return orphans(_clips(spark, sf_dir), _clips(spark, sf_dir, "transcripts"))


def q_clips_orphan_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return orphans(_clips(spark, sf_dir, "transcripts"), _clips(spark, sf_dir))


def _tagged_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.col("event_type").alias("grp"),
        F.when(F.col("ts") < EVENTS_SPLIT_TS, "ref").otherwise("cur").alias("side"),
        F.col("value").alias("v"),
    )


_GROUPED_COLS = ["grp", "n_ref", "n_cur", "ks_d", "js", "psi", "wd", "wd_norm", "t_stat"]


def q_drift_by_group_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type) drift in ONE job — the grouped applyInPandas
    comparator (SURVEY §2.5 C1 style; replaces the reference's
    per-provider detector loop).  P-value columns are dropped here (no
    SQL form); stats are oracle-checked per group."""
    from llm_drift_detector_spark.drift import grouped_distribution_drift

    out = grouped_distribution_drift(
        _tagged_events_by_type(spark, sf_dir), ["grp"], "v",
        nbins=ORACLE_NBINS, psi_nbins=10,
    )
    return _round(out.select(*_GROUPED_COLS), 6).orderBy("grp")


def q_drift_by_group_binned_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully-native binned grouped detector (the 10^12-row path):
    no Python anywhere, O(nbins) state per group.  exact_edges for
    oracle parity (production default is the percentile_approx sketch)."""
    from llm_drift_detector_spark.drift import grouped_distribution_drift_binned

    out = grouped_distribution_drift_binned(
        _tagged_events_by_type(spark, sf_dir), ["grp"], "v",
        nbins=ORACLE_NBINS, psi_nbins=10, exact_edges=True,
    )
    return _round(out.select(*_GROUPED_COLS), 6).orderBy("grp")


def q_drift_multi_feature_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drift for THREE lineitem features (F vs O linestatus windows) in
    ONE job — multi_feature_drift stacks the columns and reuses the
    fully-native binned grouped detector with feature name as the key."""
    from llm_drift_detector_spark.drift import multi_feature_drift

    li = _t(spark, sf_dir, "lineitem")
    ref = li.where(F.col("l_linestatus") == "F")
    cur = li.where(F.col("l_linestatus") != "F")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    out = multi_feature_drift(
        ref, cur, cols, nbins=ORACLE_NBINS, psi_nbins=10, exact_edges=True
    )
    return _round(
        out.select(
            F.col("feature").alias("grp"),
            *[c for c in _GROUPED_COLS if c != "grp"],
        ),
        6,
    ).orderBy("grp")


def q_drift_feature_group_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite (event_type x feature) drift sweep in ONE job — the
    full per-provider-per-feature grid the reference computes with
    nested loops (``monitoring/metrics.py:436-484`` x
    ``distribution.py:62-87``) costs one stacked grouped-binned pass."""
    from llm_drift_detector_spark.drift import multi_feature_drift

    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "value",
        F.length("props").cast("double").alias("props_len"),
    )
    ref = ev.where(F.col("ts") < EVENTS_SPLIT_TS)
    cur = ev.where(F.col("ts") >= EVENTS_SPLIT_TS)
    out = multi_feature_drift(
        ref, cur, ["value", "props_len"], group_keys=["event_type"],
        nbins=ORACLE_NBINS, psi_nbins=10, exact_edges=True,
    )
    return _round(
        out.select(
            F.concat_ws(":", "event_type", "feature").alias("grp"),
            *[c for c in _GROUPED_COLS if c != "grp"],
        ),
        6,
    ).orderBy("grp")


def q_drift_embedding_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group embedding drift (C6-C9) for ALL groups in ONE native
    plan — replaces the reference's per-provider embedding-detector loop
    (``detectors/__init__.py:58-86``)."""
    from llm_drift_detector_spark.drift import grouped_embedding_drift

    e = _t(spark, sf_dir, "embeddings")
    tagged = e.select(
        (F.col("label") % 3).cast("int").alias("grp"),
        F.when(F.col("vec_id") % 2 == 0, "ref").otherwise("cur").alias("side"),
        "embedding",
    )
    out = grouped_embedding_drift(tagged, ["grp"], "embedding")
    return _round(
        out.select(
            "grp", "n_ref", "n_cur", "centroid_distance", "variance_change",
            "avg_dist_to_ref", "ref_intra", "cur_intra", "drift_score",
            "drift_detected",
        ),
        6,
    ).orderBy("grp")


def q_lexical_by_group_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language lexical+style drift (C13-C14) for ALL groups in ONE
    native plan (even vs odd doc_id windows per language)."""
    from llm_drift_detector_spark.drift import grouped_lexical_drift

    d = _t(spark, sf_dir, "documents")
    tagged = d.select(
        F.col("lang").alias("grp"),
        F.when(F.col("doc_id") % 2 == 0, "ref").otherwise("cur").alias("side"),
        F.col("text").alias("transcript"),
    )
    out = grouped_lexical_drift(tagged, ["grp"], "transcript")
    return _round(
        out.select(
            "grp", "n_ref", "n_cur", "jaccard", "js", "vocab_diff",
            "style_diff", "lexical_score", "drift_detected",
        ),
        6,
    ).orderBy("grp")


def q_drift_js_psi_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, cur = _events_windows(spark, sf_dir)
    return _round(js_psi_frame(ref, cur, "value", nbins=ORACLE_NBINS), 6)


def q_drift_ks_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, cur = _events_windows(spark, sf_dir)
    return _round(ks_frame(ref, cur, "value"), 6)


def q_drift_wasserstein_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, cur = _events_windows(spark, sf_dir)
    return _round(wasserstein_frame(ref, cur, "value"), 6)


def q_drift_welch_t_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, cur = _events_windows(spark, sf_dir)
    return _round(welch_t_frame(ref, cur, "value"), 6)


def q_drift_psi_quantile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, cur = _events_windows(spark, sf_dir)
    return _round(psi_frame(ref, cur, "value", nbins=10), 6)


def q_drift_moments_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ref, cur = _events_windows(spark, sf_dir)
    return _round(two_sample_moments(ref, cur, "value"), 4)


def q_drift_combine_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 normalized-weighted combine + C18 verdict as oracle-checkable
    rows (one per method + the combined row), over the SQL-expressible
    method subset (js/wasserstein/psi; the p-based scores have no SQL
    form and stay pytest-covered).  Scores are rounded to 6dp BEFORE the
    normalize so both engines combine identical inputs."""
    ref, cur = _events_windows(spark, sf_dir)
    js = js_psi_frame(ref, cur, "value", nbins=ORACLE_NBINS).select(
        F.lit("js_divergence").alias("method"),
        F.round("js", 6).alias("score"),
        F.lit(0.2).alias("threshold"),
        F.lit(1.0).alias("weight"),
    )
    w1 = wasserstein_frame(ref, cur, "value").select(
        F.lit("wasserstein").alias("method"),
        F.round("wd_norm", 6).alias("score"),
        F.lit(0.1).alias("threshold"),
        F.lit(1.0).alias("weight"),
    )
    ps = psi_frame(ref, cur, "value", nbins=10).select(
        F.lit("psi").alias("method"),
        F.round("psi", 6).alias("score"),
        F.lit(0.2).alias("threshold"),
        F.lit(1.0).alias("weight"),
    )
    m = js.unionByName(w1).unionByName(ps).select(
        "method",
        "score",
        F.round(F.least(F.col("score") / F.col("threshold"), F.lit(1.0)), 6).alias(
            "norm_score"
        ),
        (F.col("score") > F.col("threshold")).alias("drift_detected"),
        "weight",
    )
    combined = m.agg(
        (F.sum(F.col("norm_score") * F.col("weight")) / F.sum("weight")).alias("c"),
        F.max(F.col("drift_detected").cast("int")).alias("any_d"),
    ).select(
        F.lit("combined").alias("method"),
        F.round("c", 6).alias("score"),
        F.round("c", 6).alias("norm_score"),
        # C18 verbatim: reference combine fires iff score > detector threshold
        (F.col("c") > F.lit(0.1)).alias("drift_detected"),
        F.lit(3.0).alias("weight"),
    )
    return m.unionByName(combined).drop("weight").orderBy("method")


def q_drift_summary_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 rollup over a real per-group metrics frame: the binned grouped
    detector's (5 event_type groups x 3 methods) scores -> drift_summary
    -> (detector_name, max score, any-drift, n, status)."""
    from llm_drift_detector_spark.drift import (
        drift_summary,
        grouped_distribution_drift_binned,
    )

    g = grouped_distribution_drift_binned(
        _tagged_events_by_type(spark, sf_dir), ["grp"], "v",
        nbins=ORACLE_NBINS, psi_nbins=10, exact_edges=True,
    ).select(
        "grp",
        F.round("js", 6).alias("js"),
        F.round("psi", 6).alias("psi"),
        F.round("wd_norm", 6).alias("wd_norm"),
    )
    metrics = g.selectExpr(
        "grp",
        "stack(3, 'js_divergence', js, 'psi', psi, 'wasserstein', wd_norm)"
        " AS (detector_name, drift_score)",
    ).select(
        "detector_name",
        "drift_score",
        (
            F.col("drift_score")
            > F.when(F.col("detector_name") == "wasserstein", 0.1).otherwise(0.2)
        ).alias("drift_detected"),
        F.lit(None).cast("timestamp").alias("timestamp"),
    )
    out = drift_summary(metrics, group_cols=("detector_name",))
    return out.select(
        "detector_name",
        F.round("max_drift_score", 6).alias("max_drift_score"),
        "drift_detected",
        "n_results",
        "status",
    ).orderBy("detector_name")


def q_performance_drift_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15 per-metric relative-mean-change + error-rate special case,
    emitted as rows (metric, ref/cur values, relative change, score,
    verdict) plus the overall combine."""
    from llm_drift_detector_spark.drift import performance_drift

    ev = _t(spark, sf_dir, "events")
    ref = ev.where(F.col("ts") < EVENTS_SPLIT_TS)
    cur = ev.where(F.col("ts") >= EVENTS_SPLIT_TS)
    res = performance_drift(
        ref,
        cur,
        metrics=[{"name": "value"}, {"name": "error_rate"}],
        error_condition=F.col("event_type") == "error",
    )

    def r6(x: float) -> float:
        import math

        return math.copysign(math.floor(abs(x) * 1e6 + 0.5) / 1e6, x)

    rows = []
    for name in sorted(res["metrics"]):
        m = res["metrics"][name]
        rv = m.get("reference_mean", m.get("reference_value"))
        cv = m.get("current_mean", m.get("current_value"))
        rows.append(
            (
                name,
                r6(rv),
                r6(cv),
                r6(m["relative_change"]),
                r6(m["drift_score"]),
                bool(m["drift_detected"]),
            )
        )
    rows.append(
        (
            "overall",
            None,
            None,
            None,
            r6(res["drift_score"]),
            bool(res["drift_detected"]),
        )
    )
    return spark.createDataFrame(
        rows,
        "metric string, ref_value double, cur_value double, "
        "relative_change double, drift_score double, drift_detected boolean",
    ).orderBy("metric")


def q_stream_validate_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming parity in the driver contract: run the AvailableNow
    stream (multiple micro-batches) over the synth clips and emit the
    SQL-expressible violation classes; the oracle recomputes them from
    the same parquet with full-table SQL — equal iff the batch-local
    streaming semantics are correct."""
    import tempfile

    from llm_drift_detector_spark.streaming import stream_validate

    root = ensure_synth(spark, sf_dir)
    tr = spark.read.parquet(os.path.join(root, "transcripts"))
    ref = spark.read.parquet(os.path.join(root, "clips_reference"))
    out = tempfile.mkdtemp(prefix="drv_stream_")
    stream_validate(
        spark, os.path.join(root, "clips"), tr, ref, out,
        run_id="driver", max_files_per_trigger=4,
    )
    got = spark.read.parquet(os.path.join(out, "violations_stream"))
    sql_checks = [
        "sr_hz_domain",
        "codec_whitelist",
        "referential_clip_orphan",
        "transcript_equality",
    ]
    return (
        got.where(F.col("check_name").isin(sql_checks))
        .select("check_name", "clip_id")
        .distinct()
        .orderBy("check_name", "clip_id")
    )


def q_stream_drift_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r4 streaming drift operator in the driver contract: a REAL
    AvailableNow stream (one micro-batch per window file) judged against
    a frozen reference profile.  The events current window splits into 3
    deterministic sub-windows by ``event_id % 3``; each becomes one
    micro-batch, and the oracle recomputes every window's frozen-profile
    binned metrics (JS/PSI/binned-KS/Welch t/score/verdict) with
    full-table SQL.  Epoch/run ids are dropped: file->epoch order is a
    scheduling detail, the per-window METRIC ROWS are the contract."""
    import tempfile

    from llm_drift_detector_spark.streaming import reference_profile, stream_drift

    ev = _t(spark, sf_dir, "events")
    ref = ev.where(F.col("ts") < EVENTS_SPLIT_TS).select("value")
    root = tempfile.mkdtemp(prefix="drv_stream_drift_")
    for w in range(3):
        (
            ev.where(
                (F.col("ts") >= EVENTS_SPLIT_TS) & (F.col("event_id") % 3 == w)
            )
            .select("value")
            .coalesce(1)
            .write.parquet(f"{root}/in/w={w}")
        )
    prof = reference_profile(ref, "value", nbins=ORACLE_NBINS, psi_nbins=10)
    stream_drift(
        spark,
        f"{root}/in/w=*",
        prof,
        f"{root}/out",
        schema="value double",
        max_files_per_trigger=1,
    )
    out = spark.read.parquet(f"{root}/out/drift_metrics")
    return _round(
        out.select(
            "n", "batch_mean", "js", "psi", "ks_d", "t_stat",
            "drift_score", "drift_detected", "gated",
        ),
        6,
    )


def q_similarity_ivf_indexed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r4 PERSISTED IVF index in the driver contract: build once
    (centroids + cluster-partitioned assignments), query through the
    index with partition pruning and no fit at query time.  Contract
    row: recall@10 vs brute force clears 0.8 (same as
    similarity_ivf_topk) AND the indexed path returns the identical id
    set as the in-session IVF at the same (n_clusters, nprobe, seed) —
    the persisted index must not change the answer."""
    import tempfile

    from llm_drift_detector_spark.textops import (
        ivf_build_index,
        ivf_topk_indexed,
        topk_brute,
        topk_ivf,
    )

    e = _t(spark, sf_dir, "embeddings")
    index_dir = os.path.join(tempfile.mkdtemp(prefix="drv_ivf_"), "index")
    ivf_build_index(e, "vec_id", "embedding", index_dir, n_clusters=8)
    idx_ids = {
        r.id
        for r in ivf_topk_indexed(
            spark, index_dir, _ANN_QUERY, k=10, nprobe=6
        ).collect()
    }
    fit_ids = {
        r.id
        for r in topk_ivf(
            e, "vec_id", "embedding", _ANN_QUERY, k=10, n_clusters=8, nprobe=6
        ).collect()
    }
    brute_ids = {
        r.id for r in topk_brute(e, "vec_id", "embedding", _ANN_QUERY, k=10).collect()
    }
    recall = len(idx_ids & brute_ids) / 10.0
    return spark.createDataFrame(
        [(10, recall >= 0.8, idx_ids == fit_ids)],
        "k int, recall_ok boolean, parity_ok boolean",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """EXACTLY 50 entries — the driver harness evaluates at most 50
    queries (VERDICT r2 #1: six r2 queries at positions 51-56 silently
    got no correctness row).  Every operator keeps exactly one
    representative query; redundant second-table shapes were retired in
    r3 (uniqueness_orders / uniqueness_events_user / stats_profile_
    lineitem / referential_{orders_customer,customer_orders} /
    clips_drift_{js_psi,ks} / clips_embedding_centroid_cosine /
    error_rate_events — each operator stays green via the remaining
    query on its north-star table; A5's error-rate arithmetic lives
    inside performance_drift_events).  r5 swap (VERDICT r4 #2):
    drift_moments_events (A2 arithmetic subsumed by
    performance_drift_events + welch_t) and dedup_exact_documents
    (exact-dup groups replayed inside dedup_clusters_documents' oracle)
    retired; stream_drift_metrics and similarity_ivf_indexed_topk give
    the r4 streaming-drift and persisted-index operators driver
    representation."""
    return {
        # verdict layer / audio decode / streaming (driver-skipped in r2)
        "drift_combine_events": q_drift_combine_events,
        "drift_summary_events": q_drift_summary_events,
        "performance_drift_events": q_performance_drift_events,
        "stream_validate_clips": q_stream_validate_clips,
        "clips_dur_mismatch_bytelen": q_clips_dur_mismatch_bytelen,
        "clips_audio_violations": q_clips_audio_violations,
        # grouped one-job detectors
        "drift_by_group_events": q_drift_by_group_events,
        "drift_by_group_binned_events": q_drift_by_group_binned_events,
        "drift_multi_feature_lineitem": q_drift_multi_feature_lineitem,
        "drift_feature_group_events": q_drift_feature_group_events,
        "drift_embedding_by_group": q_drift_embedding_by_group,
        "lexical_by_group_documents": q_lexical_by_group_documents,
        # single-pair comparators
        "drift_js_psi_events": q_drift_js_psi_events,
        "drift_ks_events": q_drift_ks_events,
        "drift_wasserstein_events": q_drift_wasserstein_events,
        "drift_welch_t_events": q_drift_welch_t_events,
        "drift_psi_quantile_events": q_drift_psi_quantile_events,
        "stream_drift_metrics": q_stream_drift_metrics,
        # relational / stats / uniqueness / referential
        "join_agg_revenue_by_nation": q_join_agg_revenue_by_nation,
        "topk_customers_by_revenue": q_topk_customers_by_revenue,
        "uniqueness_orders_approx": q_uniqueness_orders_approx,
        "pivot_lineitem": q_pivot_lineitem,
        # audio clip table (north-star) checks
        "clips_stats_profile": q_clips_stats_profile,
        "clips_uniqueness": q_clips_uniqueness,
        "clips_duplicate_keys": q_clips_duplicate_keys,
        "clips_sr_domain": q_clips_sr_domain,
        "clips_codec_whitelist": q_clips_codec_whitelist,
        "clips_orphan_clips": q_clips_orphan_clips,
        "clips_orphan_transcripts": q_clips_orphan_transcripts,
        "clips_transcript_equality": q_clips_transcript_equality,
        # semantic / lexical / performance
        "perplexity_unigram_documents": q_perplexity_unigram_documents,
        "topic_histogram_embeddings": q_topic_histogram_embeddings,
        "lexical_vocab_documents": q_lexical_vocab_documents,
        "style_features_documents": q_style_features_documents,
        "vocab_term_freq_documents": q_vocab_term_freq_documents,
        "rolling_zscore_events": q_rolling_zscore_events,
        # dedup / similarity / text pipeline
        "dedup_clusters_documents": q_dedup_clusters_documents,
        "dedup_minhash_documents": q_dedup_minhash_documents,
        "dedup_simhash_documents": q_dedup_simhash_documents,
        "langid_documents": q_langid_documents,
        "quality_documents": q_quality_documents,
        "token_counts_documents": q_token_counts_documents,
        "fingerprint_documents": q_fingerprint_documents,
        "similarity_topk_embeddings": q_similarity_topk_embeddings,
        "similarity_lsh_topk": q_similarity_lsh_topk,
        "similarity_ivf_topk": q_similarity_ivf_topk,
        "similarity_ivf_indexed_topk": q_similarity_ivf_indexed_topk,
        "embedding_near_duplicates": q_embedding_near_duplicates,
        # embedding drift scalars
        "embedding_centroid_cosine": q_embedding_centroid_cosine,
        "embedding_mean_dist_to_ref": q_embedding_mean_dist_to_ref,
    }


# ---------------------------------------------------------------------------
# oracle SQL — DuckDB side
# ---------------------------------------------------------------------------


def _ensure_synth_for_oracle() -> None:
    if not os.path.exists(os.path.join(SYNTH_SF001, "_DONE")):
        ensure_synth_local("/root/testdata/sf0.01")


def _profile_sql(src: str, columns: list[str]) -> str:
    parts = []
    for c in columns:
        parts.append(
            f"""
    SELECT '{c}' AS "column",
           count({c}) AS count,
           count(*) - count({c}) AS null_count,
           ROUND((count(*) - count({c})) * 1.0 / GREATEST(count(*), 1), 4) AS null_rate,
           ROUND(avg({c}), 4) AS mean,
           ROUND(COALESCE(stddev_pop({c}), 0.0), 4) AS stddev,
           ROUND(min({c})::DOUBLE, 4) AS min,
           ROUND(max({c})::DOUBLE, 4) AS max,
           ROUND(quantile_cont({c}, 0.25), 4) AS q25,
           ROUND(quantile_cont({c}, 0.50), 4) AS median,
           ROUND(quantile_cont({c}, 0.75), 4) AS q75
    FROM {src}"""
        )
    return " UNION ALL ".join(parts)


def _uniqueness_sql(src: str, key: str) -> str:
    return f"""
    WITH per_key AS (SELECT {key} AS k, count(*) AS n FROM {src} GROUP BY {key})
    SELECT sum(n)::BIGINT AS total,
           count(*)::BIGINT AS distinct,
           sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_keys,
           sum(CASE WHEN n > 1 THEN n ELSE 0 END)::BIGINT AS rows_in_dup_keys,
           ROUND(sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1.0 / sum(n), 4) AS dup_rate
    FROM per_key
    """


_CLIPS = f"read_parquet('{SYNTH_SF001}/clips/*.parquet')"
_CLIPS_REF = f"read_parquet('{SYNTH_SF001}/clips_reference/*.parquet')"
_TRANSCRIPTS = f"read_parquet('{SYNTH_SF001}/transcripts/*.parquet')"

_EVENTS_REF = f"SELECT value AS v FROM events WHERE ts < TIMESTAMP '{EVENTS_SPLIT_TS}'"
_EVENTS_CUR = f"SELECT value AS v FROM events WHERE ts >= TIMESTAMP '{EVENTS_SPLIT_TS}'"
_CLIPSD_REF = f"SELECT dur_ms AS v FROM {_CLIPS_REF}"
_CLIPSD_CUR = f"SELECT dur_ms AS v FROM {_CLIPS}"


def _two_windows_cte(ref_sql: str, cur_sql: str) -> str:
    """Shared CTE prologue: tagged union + global range/count stats.

    Mirrors comparators._union_ecdf / shared_range arithmetic exactly —
    IEEE f64 ops are deterministic, so Spark and DuckDB bucket/ECDF
    identically given the same doubles.
    """
    return f"""
    u AS (
      SELECT v::DOUBLE AS v, 1 AS r, 0 AS c FROM ({ref_sql}) WHERE v IS NOT NULL
      UNION ALL
      SELECT v::DOUBLE AS v, 0 AS r, 1 AS c FROM ({cur_sql}) WHERE v IS NOT NULL
    ),
    st AS (SELECT min(v) AS mn, max(v) AS mx,
                  sum(r)::BIGINT AS nr, sum(c)::BIGINT AS nc FROM u)
    """


def _js_psi_sql(ref_sql: str, cur_sql: str, nbins: int) -> str:
    return f"""
    WITH {_two_windows_cte(ref_sql, cur_sql)},
    binned AS (
      SELECT CAST(LEAST(FLOOR((u.v - st.mn) / ((st.mx - st.mn) / {nbins})),
                        {nbins - 1}) AS INT) AS bin, r, c
      FROM u, st),
    counts AS (SELECT bin, sum(r) AS cr, sum(c) AS cc FROM binned GROUP BY bin),
    bins AS (SELECT CAST(range AS INT) AS bin FROM range({nbins})),
    j AS (SELECT b.bin, COALESCE(cr, 0)::DOUBLE AS cr, COALESCE(cc, 0)::DOUBLE AS cc
          FROM bins b LEFT JOIN counts USING (bin)),
    dens AS (SELECT cr / ((SELECT nr::DOUBLE FROM st) * (SELECT (mx - mn) / {nbins} FROM st)) + 1e-10 AS dr,
                    cc / ((SELECT nc::DOUBLE FROM st) * (SELECT (mx - mn) / {nbins} FROM st)) + 1e-10 AS dc
             FROM j),
    probs AS (SELECT dr / sum(dr) OVER () AS p, dc / sum(dc) OVER () AS q FROM dens)
    SELECT ROUND(0.5 * sum(p * ln(p / ((p + q) / 2))) + 0.5 * sum(q * ln(q / ((p + q) / 2))), 6) AS js,
           ROUND(sum((p - q) * ln(p / q)), 6) AS psi
    FROM probs
    """


def _ks_sql(ref_sql: str, cur_sql: str) -> str:
    return f"""
    WITH {_two_windows_cte(ref_sql, cur_sql)},
    cum AS (SELECT
        sum(r) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
        sum(c) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM u)
    SELECT ROUND(max(abs(cr / (SELECT nr::DOUBLE FROM st)
                       - cc / (SELECT nc::DOUBLE FROM st))), 6) AS ks_d
    FROM cum
    """


def _wasserstein_sql(ref_sql: str, cur_sql: str) -> str:
    return f"""
    WITH {_two_windows_cte(ref_sql, cur_sql)},
    cum AS (SELECT v,
        sum(r) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
        sum(c) OVER (ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM u),
    perv AS (SELECT v, max(cr) AS cr, max(cc) AS cc FROM cum GROUP BY v),
    steps AS (SELECT
        abs(cr / (SELECT nr::DOUBLE FROM st) - cc / (SELECT nc::DOUBLE FROM st))
        * (COALESCE(lead(v) OVER (ORDER BY v), v) - v) AS area
      FROM perv),
    rng AS (SELECT GREATEST(
        (SELECT max(v) - min(v) FROM u WHERE r = 1),
        (SELECT max(v) - min(v) FROM u WHERE c = 1)) AS value_range)
    SELECT ROUND(COALESCE(sum(area), 0.0), 6) AS wd,
           ROUND(COALESCE(sum(area), 0.0) / (SELECT value_range FROM rng), 6) AS wd_norm
    FROM steps
    """


def _welch_t_sql(ref_sql: str, cur_sql: str) -> str:
    return f"""
    WITH r AS (SELECT avg(v::DOUBLE) AS m, COALESCE(var_samp(v::DOUBLE), 0.0) AS s,
                      count(v)::BIGINT AS n FROM ({ref_sql}) WHERE v IS NOT NULL),
         c AS (SELECT avg(v::DOUBLE) AS m, COALESCE(var_samp(v::DOUBLE), 0.0) AS s,
                      count(v)::BIGINT AS n FROM ({cur_sql}) WHERE v IS NOT NULL)
    SELECT ROUND(CASE WHEN (r.s / r.n + c.s / c.n) > 0
                      THEN (r.m - c.m) / sqrt(r.s / r.n + c.s / c.n)
                      ELSE 0.0 END, 6) AS t_stat
    FROM r, c
    """


def _psi_quantile_sql(ref_sql: str, cur_sql: str, nbins: int = 10) -> str:
    qs = ", ".join(str(i / nbins) for i in range(1, nbins))
    return f"""
    WITH {_two_windows_cte(ref_sql, cur_sql)},
    edges AS (SELECT unnest(quantile_cont(v, [{qs}])) AS e FROM u WHERE r = 1),
    dv AS (SELECT v, sum(r) AS rv, sum(c) AS cv FROM u GROUP BY v),
    bucketed AS (SELECT (SELECT count(*) FROM edges WHERE e < dv.v)::INT AS bin,
                        rv, cv FROM dv),
    counts AS (SELECT bin, sum(rv) AS cr, sum(cv) AS cc FROM bucketed GROUP BY bin),
    bins AS (SELECT CAST(range AS INT) AS bin FROM range({nbins})),
    j AS (SELECT b.bin, COALESCE(cr, 0)::DOUBLE AS cr, COALESCE(cc, 0)::DOUBLE AS cc
          FROM bins b LEFT JOIN counts USING (bin)),
    probs AS (SELECT
        (cr / (SELECT nr::DOUBLE FROM st) + 1e-10) / (1.0 + {nbins} * 1e-10) AS p,
        (cc / (SELECT nc::DOUBLE FROM st) + 1e-10) / (1.0 + {nbins} * 1e-10) AS q
      FROM j)
    SELECT ROUND(sum((p - q) * ln(p / q)), 6) AS psi FROM probs
    """


_DOC_TOKENS = (
    "SELECT t.token FROM documents d, "
    "unnest(regexp_split_to_array(lower(d.text), '\\s+')) AS t(token) "
    "WHERE {where} AND t.token <> ''"
)

_TOKLIST = "list_filter(regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')"
_DOC_ID_TOKENS = (
    "SELECT doc_id, t.token FROM documents, "
    f"unnest({_TOKLIST}) AS t(token) WHERE {{where}}"
)
_EN_SET = "('the','a','of','and','to','in','is','it','that','for')"


def _perplexity_sql() -> str:
    ref_toks = _DOC_ID_TOKENS.format(where="lang = 'en'")
    all_toks = _DOC_ID_TOKENS.format(where="TRUE")
    return f"""
    WITH lm AS (SELECT token, count(*) AS cnt FROM ({ref_toks}) GROUP BY token),
    tot AS (SELECT sum(cnt)::DOUBLE + count(*)::DOUBLE AS denom FROM lm),
    dt AS (SELECT doc_id, token FROM ({all_toks})),
    lp AS (SELECT dt.doc_id,
                  ln((COALESCE(lm.cnt, 0) + 1.0) / (SELECT denom FROM tot)) AS logp
           FROM dt LEFT JOIN lm ON dt.token = lm.token)
    SELECT doc_id AS id, ROUND(exp(-avg(logp)), 6) AS perplexity
    FROM lp GROUP BY doc_id ORDER BY id
    """


def _topic_hist_sql() -> str:
    return """
    WITH t AS (SELECT CAST(list_position(embedding,
                     list_aggregate(embedding, 'max')) - 1 AS INT) AS topic
               FROM embeddings),
    c AS (SELECT topic, count(*) AS cnt FROM t GROUP BY topic)
    SELECT topic, ROUND(cnt * 1.0 / (SELECT sum(cnt) FROM c), 6) AS p
    FROM c ORDER BY topic
    """


def _dedup_exact_sql() -> str:
    return """
    WITH d AS (SELECT * FROM documents
               UNION ALL (SELECT * FROM documents ORDER BY doc_id LIMIT 5)),
    w AS (SELECT doc_id AS id, md5(text) AS dup_group FROM d),
    c AS (SELECT dup_group, count(*) AS group_size FROM w GROUP BY dup_group)
    SELECT id, w.dup_group, group_size FROM w JOIN c USING (dup_group)
    WHERE group_size > 1 ORDER BY id
    """


def _minhash_sql(k: int = 8) -> str:
    mins = ", ".join(
        f"min(md5('{i}|' || shingle)) AS m{i}" for i in range(k)
    )
    return f"""
    WITH docs AS (SELECT doc_id, {_TOKLIST} AS toks FROM documents WHERE doc_id < 50),
    sh AS (SELECT DISTINCT doc_id,
                  array_to_string(toks[s.s : s.s + 2], ' ') AS shingle
           FROM docs, unnest(range(1, GREATEST(len(toks) - 2, 1) + 1)) AS s(s)),
    shf AS (SELECT doc_id, shingle FROM sh WHERE shingle <> '')
    SELECT doc_id AS id, {mins} FROM shf GROUP BY doc_id ORDER BY id
    """


def _simhash_sql(bits: int) -> str:
    sums = ", ".join(
        "sum(CASE WHEN CAST(floor((strpos('0123456789abcdef', "
        f"substr(h, {i // 4 + 1}, 1)) - 1) / {2 ** (i % 4)}) AS INT) % 2 = 1 "
        f"THEN 1 ELSE -1 END) AS s{i}"
        for i in range(bits)
    )
    sig = " + ".join(f"CASE WHEN s{i} > 0 THEN {2 ** i} ELSE 0 END" for i in range(bits))
    toks = _DOC_ID_TOKENS.format(where="doc_id < 30")
    return f"""
    WITH toks AS (SELECT doc_id, md5(token) AS h FROM ({toks})),
    s AS (SELECT doc_id, {sums} FROM toks GROUP BY doc_id)
    SELECT doc_id AS id, CAST({sig} AS BIGINT) AS simhash FROM s ORDER BY id
    """


def _langid_sql() -> str:
    from llm_drift_detector_spark.textops.quality import STOPWORDS

    toks = _DOC_ID_TOKENS.format(where="TRUE")
    ratio_cols = ", ".join(
        f"sum(CASE WHEN token IN ({', '.join(repr(w) for w in words)}) THEN 1 ELSE 0 END) * 1.0 / count(*) AS {lang}"
        for lang, words in sorted(STOPWORDS.items())
    )
    unp = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang, {lang} AS score FROM r"
        for lang in sorted(STOPWORDS)
    )
    return f"""
    WITH toks AS ({toks}),
    r AS (SELECT doc_id, {ratio_cols} FROM toks GROUP BY doc_id),
    unp AS ({unp}),
    best AS (SELECT doc_id, lang, score,
                    row_number() OVER (PARTITION BY doc_id
                                       ORDER BY score DESC, lang DESC) AS rn
             FROM unp)
    SELECT doc_id AS id, lang, ROUND(score, 6) AS lang_score
    FROM best WHERE rn = 1 ORDER BY id
    """


def _quality_sql() -> str:
    toks = _DOC_ID_TOKENS.format(where="TRUE")
    return f"""
    WITH toks AS ({toks}),
    t AS (SELECT doc_id, count(*) AS n_tokens,
                 avg(CASE WHEN token IN {_EN_SET} THEN 1.0 ELSE 0.0 END) AS stop_ratio,
                 avg(length(token)) AS mean_word_len
          FROM toks GROUP BY doc_id),
    b AS (SELECT doc_id, length(text) AS n_chars,
                 (length(text) - length(regexp_replace(lower(text), '[.!?,;:]', '', 'g')))
                 * 1.0 / GREATEST(length(text), 1) AS punct_ratio
          FROM documents)
    SELECT b.doc_id AS id, n_chars::BIGINT AS n_chars, n_tokens::BIGINT AS n_tokens,
           ROUND(punct_ratio, 6) AS punct_ratio,
           ROUND(stop_ratio, 6) AS stop_ratio,
           ROUND(mean_word_len, 6) AS mean_word_len,
           ROUND(0.3 * LEAST(n_tokens / 50.0, 1.0)
               + 0.3 * (1.0 - LEAST(punct_ratio * 10.0, 1.0))
               + 0.2 * LEAST(stop_ratio * 5.0, 1.0)
               + 0.2 * LEAST(mean_word_len / 8.0, 1.0), 6) AS quality
    FROM b JOIN t USING (doc_id) ORDER BY id
    """


def _ann_topk_sql(k: int = 10) -> str:
    vals = ", ".join(
        f"({i + 1}, CAST({float(v)!r} AS DOUBLE))" for i, v in enumerate(_ANN_QUERY)
    )
    return f"""
    WITH q(i, qv) AS (VALUES {vals}),
    qn AS (SELECT sqrt(sum(qv * qv)) AS qn FROM q),
    terms AS (SELECT vec_id, sum(embedding[q.i] * q.qv) AS dot,
                     sqrt(sum(embedding[q.i] * embedding[q.i])) AS rnorm
              FROM embeddings, q WHERE embedding IS NOT NULL GROUP BY vec_id),
    cosd AS (SELECT vec_id AS id,
                    CASE WHEN rnorm > 0 AND (SELECT qn FROM qn) > 0
                         THEN dot / (rnorm * (SELECT qn FROM qn)) ELSE -1.0 END AS cosine
             FROM terms)
    SELECT id, ROUND(cosine, 6) AS cosine FROM cosd
    ORDER BY cosine DESC, id LIMIT {k}
    """


def _vocab_diff_sql(ref_where: str, cur_where: str) -> str:
    rt = _DOC_TOKENS.format(where=ref_where)
    ct = _DOC_TOKENS.format(where=cur_where)
    return f"""
    WITH rc AS (SELECT token, count(*) AS cr FROM ({rt}) GROUP BY token),
    cc AS (SELECT token, count(*) AS cc FROM ({ct}) GROUP BY token),
    j AS (SELECT COALESCE(rc.token, cc.token) AS token, cr, cc
          FROM rc FULL OUTER JOIN cc ON rc.token = cc.token),
    tot AS (SELECT sum(cr)::DOUBLE AS rt, sum(cc)::DOUBLE AS ct FROM j),
    agg AS (SELECT
        1.0 - sum(CASE WHEN cr IS NOT NULL AND cc IS NOT NULL THEN 1 ELSE 0 END)
              * 1.0 / GREATEST(count(*), 1) AS jaccard,
        COALESCE(sum(CASE WHEN cr IS NOT NULL AND cc IS NOT NULL THEN
            0.5 * (cr / (SELECT rt FROM tot))
                * ln((cr / (SELECT rt FROM tot))
                     / ((cr / (SELECT rt FROM tot) + cc / (SELECT ct FROM tot)) / 2) + 1e-10)
          + 0.5 * (cc / (SELECT ct FROM tot))
                * ln((cc / (SELECT ct FROM tot))
                     / ((cr / (SELECT rt FROM tot) + cc / (SELECT ct FROM tot)) / 2) + 1e-10)
        END), 0.0) AS js,
        sum(CASE WHEN cr IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS ref_vocab,
        sum(CASE WHEN cc IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS cur_vocab,
        sum(CASE WHEN cr IS NOT NULL AND cc IS NOT NULL THEN 1 ELSE 0 END)::BIGINT AS inter_n
      FROM j)
    SELECT ROUND(jaccard, 6) AS jaccard, ROUND(js, 6) AS js,
           ROUND(CASE WHEN inter_n = 0 THEN jaccard
                      ELSE 0.5 * jaccard + 0.5 * LEAST(js, 1.0) END, 6) AS vocab_diff,
           ref_vocab, cur_vocab
    FROM agg
    """


def _style_features_sql(where: str = "TRUE") -> str:
    toks = _DOC_TOKENS.format(where=where)
    return f"""
    WITH sent AS (
      SELECT len(list_filter(regexp_split_to_array(s.s, '\\s+'), x -> x <> '')) AS wc
      FROM documents d, unnest(regexp_split_to_array(d.text, '\\.')) AS s(s)
      WHERE {where} AND trim(s.s) <> ''),
    tok AS (SELECT avg(length(token)) AS avg_word_len,
                   count(*)::BIGINT AS token_count,
                   count(DISTINCT token)::BIGINT AS unique_token_count
            FROM ({toks}))
    SELECT ROUND((SELECT COALESCE(avg(wc), 0.0) FROM sent), 6) AS avg_sentence_len,
           ROUND(avg_word_len, 6) AS avg_word_len,
           token_count, unique_token_count,
           ROUND(unique_token_count * 1.0 / GREATEST(token_count, 1), 6) AS diversity
    FROM tok
    """


def _zscore_sql(w: int = 20, z: float = 2.0) -> str:
    return f"""
    WITH v AS (SELECT event_id, value::DOUBLE AS v FROM events WHERE value IS NOT NULL),
    s AS (SELECT event_id,
        row_number() OVER (ORDER BY event_id) AS rn,
        count(*) OVER () AS n,
        avg(v) OVER (ORDER BY event_id ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING) AS expected,
        COALESCE(stddev_pop(v) OVER (ORDER BY event_id ROWS BETWEEN {w} PRECEDING AND 1 PRECEDING), 0.0) AS prev_std,
        avg(v) OVER (ORDER BY event_id ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS value
      FROM v),
    zz AS (SELECT event_id, value, expected,
               CASE WHEN prev_std > 0 THEN abs(value - expected) / prev_std ELSE 0.0 END AS z_score
           FROM s WHERE rn >= {w + 1} AND rn <= n - {w} + 1)
    SELECT event_id, ROUND(value, 6) AS value, ROUND(expected, 6) AS expected,
           ROUND(z_score, 6) AS z_score,
           CASE WHEN value > expected THEN 'increase' ELSE 'decrease' END AS direction
    FROM zz WHERE z_score > {z}
    ORDER BY event_id
    """


def _centroid_cosine_sql(ref_sql: str, cur_sql: str, dim: int) -> str:
    """ref_sql/cur_sql select one LIST column aliased `e`."""
    return f"""
    WITH dims AS (SELECT CAST(range AS INT) + 1 AS i FROM range({dim})),
    a AS (SELECT i, avg(e[i]) AS a FROM ({ref_sql}), dims GROUP BY i),
    b AS (SELECT i, avg(e[i]) AS b FROM ({cur_sql}), dims GROUP BY i),
    j AS (SELECT a.a, b.b FROM a JOIN b USING (i))
    SELECT ROUND(1.0 - sum(a * b) / (sqrt(sum(a * a)) * sqrt(sum(b * b))), 6)
           AS centroid_cosine
    FROM j
    """


def _mean_dist_sql(ref_sql: str, cur_sql: str, dim: int) -> str:
    """avg cosine distance of cur rows to the ref centroid (C8)."""
    return f"""
    WITH dims AS (SELECT CAST(range AS INT) + 1 AS i FROM range({dim})),
    cref AS (SELECT i, avg(e[i]) AS c FROM ({ref_sql}), dims GROUP BY i),
    cn AS (SELECT sqrt(sum(c * c)) AS cnorm FROM cref),
    rows_n AS (SELECT row_number() OVER () AS rid, e FROM ({cur_sql})),
    terms AS (SELECT r.rid, sum(r.e[d.i] * cref.c) AS dot,
                     sqrt(sum(r.e[d.i] * r.e[d.i])) AS rnorm
              FROM rows_n r, dims d JOIN cref ON cref.i = d.i
              GROUP BY r.rid),
    dists AS (SELECT CASE WHEN rnorm > 0 AND (SELECT cnorm FROM cn) > 0
                          THEN 1.0 - dot / (rnorm * (SELECT cnorm FROM cn))
                          ELSE 1.0 END AS dist FROM terms)
    SELECT ROUND(avg(dist), 6) AS mean_dist FROM dists
    """


def _grouped_embedding_sql(
    dim: int = 64, min_samples: int = 10, threshold: float = 0.15
) -> str:
    """Replay grouped_embedding_drift per (label % 3) group: per-group
    per-dim centroids, C6 cosine between them, C7/C8 mean distances via
    a (row x dim) join back onto the centroid frame."""
    return f"""
    WITH dims AS (SELECT CAST(range AS INT) + 1 AS i FROM range({dim})),
    b AS (SELECT CAST(label % 3 AS INT) AS grp,
                 CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END AS r,
                 vec_id, embedding AS e
          FROM embeddings WHERE embedding IS NOT NULL),
    cent AS (SELECT grp, i,
                    avg(CASE WHEN r = 1 THEN e[i] END) AS ca,
                    avg(CASE WHEN r = 0 THEN e[i] END) AS cb
             FROM b, dims GROUP BY grp, i),
    cnt AS (SELECT grp, sum(r)::BIGINT AS n_ref, sum(1 - r)::BIGINT AS n_cur
            FROM b GROUP BY grp),
    cd AS (SELECT grp,
                  CASE WHEN sqrt(sum(ca * ca)) > 0 AND sqrt(sum(cb * cb)) > 0
                       THEN 1.0 - sum(ca * cb) / (sqrt(sum(ca * ca)) * sqrt(sum(cb * cb)))
                       ELSE 1.0 END AS centroid_distance
           FROM cent GROUP BY grp),
    rowd AS (SELECT b.grp, b.r, b.vec_id,
                    sum(b.e[c.i] * c.ca) AS dot_a,
                    sum(b.e[c.i] * c.cb) AS dot_b,
                    sqrt(sum(b.e[c.i] * b.e[c.i])) AS rn,
                    sqrt(sum(c.ca * c.ca)) AS can,
                    sqrt(sum(c.cb * c.cb)) AS cbn
             FROM b JOIN cent c ON c.grp = b.grp
             GROUP BY b.grp, b.r, b.vec_id),
    dists AS (SELECT grp, r,
                     CASE WHEN rn > 0 AND can > 0
                          THEN 1.0 - dot_a / (rn * can) ELSE 1.0 END AS da,
                     CASE WHEN rn > 0 AND cbn > 0
                          THEN 1.0 - dot_b / (rn * cbn) ELSE 1.0 END AS db
              FROM rowd),
    agg AS (SELECT grp,
                   avg(CASE WHEN r = 1 THEN da END) AS ref_intra,
                   avg(CASE WHEN r = 0 THEN db END) AS cur_intra,
                   avg(CASE WHEN r = 0 THEN da END) AS avg_dist_to_ref
            FROM dists GROUP BY grp),
    f AS (SELECT cnt.grp, n_ref, n_cur, centroid_distance, ref_intra, cur_intra,
                 avg_dist_to_ref,
                 abs(cur_intra - ref_intra) / GREATEST(ref_intra, 1e-10) AS vc,
                 n_ref < {min_samples} OR n_cur < {min_samples} AS gated
          FROM cnt JOIN cd USING (grp) JOIN agg USING (grp)),
    s AS (SELECT *, 0.6 * centroid_distance + 0.2 * vc + 0.2 * avg_dist_to_ref AS score
          FROM f)
    SELECT grp, n_ref, n_cur,
           ROUND(CASE WHEN gated THEN 0.0 ELSE centroid_distance END, 6) AS centroid_distance,
           ROUND(CASE WHEN gated THEN 0.0 ELSE vc END, 6) AS variance_change,
           ROUND(CASE WHEN gated THEN 0.0 ELSE avg_dist_to_ref END, 6) AS avg_dist_to_ref,
           ROUND(CASE WHEN gated THEN 0.0 ELSE ref_intra END, 6) AS ref_intra,
           ROUND(CASE WHEN gated THEN 0.0 ELSE cur_intra END, 6) AS cur_intra,
           ROUND(CASE WHEN gated THEN 0.0 ELSE score END, 6) AS drift_score,
           (NOT gated AND score > {threshold}) AS drift_detected
    FROM s ORDER BY grp
    """


def _grouped_lexical_sql(min_samples: int = 10, threshold: float = 0.10) -> str:
    """Replay grouped_lexical_drift per language (even vs odd doc_id)."""
    return f"""
    WITH d AS (SELECT lang AS grp,
                      CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS r, text
               FROM documents WHERE text IS NOT NULL),
    toks AS (SELECT grp, r, t.token FROM d,
             unnest(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                x -> x <> '')) AS t(token)),
    tc AS (SELECT grp, token, sum(r)::DOUBLE AS cr, sum(1 - r)::DOUBLE AS cc
           FROM toks GROUP BY grp, token),
    tot AS (SELECT grp, sum(cr) AS rt, sum(cc) AS ct FROM tc GROUP BY grp),
    vag AS (SELECT tc.grp,
              1.0 - sum(CASE WHEN cr > 0 AND cc > 0 THEN 1 ELSE 0 END) * 1.0
                    / GREATEST(count(*), 1) AS jaccard,
              COALESCE(sum(CASE WHEN cr > 0 AND cc > 0 THEN
                  0.5 * (cr / rt) * ln((cr / rt) / (((cr / rt) + (cc / ct)) / 2) + 1e-10)
                + 0.5 * (cc / ct) * ln((cc / ct) / (((cr / rt) + (cc / ct)) / 2) + 1e-10)
              END), 0.0) AS js,
              sum(CASE WHEN cr > 0 AND cc > 0 THEN 1 ELSE 0 END) AS inter_n
            FROM tc JOIN tot USING (grp) GROUP BY tc.grp),
    ts AS (SELECT grp,
             avg(CASE WHEN r = 1 THEN length(token) END) AS awl_r,
             avg(CASE WHEN r = 0 THEN length(token) END) AS awl_c,
             count(CASE WHEN r = 1 THEN 1 END)::DOUBLE AS tc_r,
             count(CASE WHEN r = 0 THEN 1 END)::DOUBLE AS tc_c,
             count(DISTINCT CASE WHEN r = 1 THEN token END)::DOUBLE AS ut_r,
             count(DISTINCT CASE WHEN r = 0 THEN token END)::DOUBLE AS ut_c
           FROM toks GROUP BY grp),
    sent AS (SELECT grp, r,
                    len(list_filter(regexp_split_to_array(s.s, '\\s+'),
                                    x -> x <> '')) AS wc
             FROM d, unnest(regexp_split_to_array(text, '\\.')) AS s(s)
             WHERE trim(s.s) <> ''),
    ss AS (SELECT grp,
                  avg(CASE WHEN r = 1 THEN wc END) AS asl_r,
                  avg(CASE WHEN r = 0 THEN wc END) AS asl_c
           FROM sent GROUP BY grp),
    dn AS (SELECT grp, sum(r)::BIGINT AS n_ref, sum(1 - r)::BIGINT AS n_cur
           FROM d GROUP BY grp),
    f AS (SELECT dn.grp, n_ref, n_cur, jaccard, js,
                 CASE WHEN inter_n = 0 THEN jaccard
                      ELSE 0.5 * jaccard + 0.5 * LEAST(js, 1.0) END AS vocab_diff,
                 0.4 * (CASE WHEN GREATEST(COALESCE(asl_r, 0), COALESCE(asl_c, 0)) > 0
                             THEN abs(COALESCE(asl_r, 0) - COALESCE(asl_c, 0))
                                  / GREATEST(COALESCE(asl_r, 0), COALESCE(asl_c, 0))
                             ELSE 0.0 END)
               + 0.3 * (CASE WHEN GREATEST(COALESCE(awl_r, 0), COALESCE(awl_c, 0)) > 0
                             THEN abs(COALESCE(awl_r, 0) - COALESCE(awl_c, 0))
                                  / GREATEST(COALESCE(awl_r, 0), COALESCE(awl_c, 0))
                             ELSE 0.0 END)
               + 0.3 * abs(ut_r / GREATEST(tc_r, 1) - ut_c / GREATEST(tc_c, 1)) AS style_diff,
                 n_ref < {min_samples} OR n_cur < {min_samples} AS gated
          FROM dn JOIN vag USING (grp) JOIN ts USING (grp) JOIN ss USING (grp)),
    s AS (SELECT *, 0.6 * vocab_diff + 0.4 * style_diff AS score FROM f)
    SELECT grp, n_ref, n_cur,
           ROUND(CASE WHEN gated THEN 0.0 ELSE jaccard END, 6) AS jaccard,
           ROUND(CASE WHEN gated THEN 0.0 ELSE js END, 6) AS js,
           ROUND(CASE WHEN gated THEN 0.0 ELSE vocab_diff END, 6) AS vocab_diff,
           ROUND(CASE WHEN gated THEN 0.0 ELSE style_diff END, 6) AS style_diff,
           ROUND(CASE WHEN gated THEN 0.0 ELSE score END, 6) AS lexical_score,
           (NOT gated AND score > {threshold}) AS drift_detected
    FROM s ORDER BY grp
    """


_EVENTS_FEATURE_GROUP_U = """
      SELECT event_type || ':value' AS grp, value::DOUBLE AS v,
             CASE WHEN ts < TIMESTAMP '{t}' THEN 1 ELSE 0 END AS r,
             CASE WHEN ts < TIMESTAMP '{t}' THEN 0 ELSE 1 END AS c
      FROM events WHERE value IS NOT NULL
      UNION ALL
      SELECT event_type || ':props_len', length(props)::DOUBLE,
             CASE WHEN ts < TIMESTAMP '{t}' THEN 1 ELSE 0 END,
             CASE WHEN ts < TIMESTAMP '{t}' THEN 0 ELSE 1 END
      FROM events WHERE props IS NOT NULL"""


def _planes_values_sql(n_planes: int = 8, seed: int = 7, dim: int = 64) -> str:
    """The seeded LSH hyperplanes as SQL VALUES rows (j, i, w, b):
    plane index, 1-based dim index, weight, bit value 2^j."""
    from llm_drift_detector_spark.textops.similarity import hyperplanes

    planes = hyperplanes(dim, n_planes, seed)
    rows = []
    for j in range(n_planes):
        for i in range(dim):
            rows.append(f"({j}, {i + 1}, CAST({float(planes[j][i])!r} AS DOUBLE), {2**j})")
    return ", ".join(rows)


_SIGS_CTE = """
    pl(j, i, w, b) AS (VALUES {planes}),
    dots AS (SELECT e.vec_id, pl.j, min(pl.b) AS b,
                    sum(e.embedding[pl.i] * pl.w) AS d
             FROM embeddings e, pl
             WHERE e.embedding IS NOT NULL
             GROUP BY e.vec_id, pl.j),
    sigs AS (SELECT vec_id,
                    CAST(sum(CASE WHEN d > 0 THEN b ELSE 0 END) AS INT) AS sig
             FROM dots GROUP BY vec_id)
"""


def _lsh_topk_sql(k: int = 10, n_planes: int = 8, seed: int = 7) -> str:
    """Replay topk_lsh exactly: signature from plane literals, probe the
    query's bucket + Hamming-1 neighbors, cosine within the probed set."""
    from llm_drift_detector_spark.textops.similarity import hyperplanes

    planes = hyperplanes(len(_ANN_QUERY), n_planes, seed)
    qsig = int(
        sum(2**j for j, p in enumerate(planes) if float(np.dot(p, _ANN_QUERY)) > 0)
    )
    probes = [qsig] + [qsig ^ (1 << j) for j in range(n_planes)]
    vals = ", ".join(
        f"({i + 1}, CAST({float(v)!r} AS DOUBLE))" for i, v in enumerate(_ANN_QUERY)
    )
    return f"""
    WITH {_SIGS_CTE.format(planes=_planes_values_sql(n_planes, seed, len(_ANN_QUERY)))},
    q(i, qv) AS (VALUES {vals}),
    qn AS (SELECT sqrt(sum(qv * qv)) AS qn FROM q),
    cand AS (SELECT vec_id FROM sigs WHERE sig IN ({', '.join(map(str, probes))})),
    terms AS (SELECT e.vec_id, sum(e.embedding[q.i] * q.qv) AS dot,
                     sqrt(sum(e.embedding[q.i] * e.embedding[q.i])) AS rnorm
              FROM embeddings e JOIN cand USING (vec_id), q
              WHERE e.embedding IS NOT NULL GROUP BY e.vec_id),
    cosd AS (SELECT vec_id AS id,
                    CASE WHEN rnorm > 0 AND (SELECT qn FROM qn) > 0
                         THEN dot / (rnorm * (SELECT qn FROM qn)) ELSE -1.0 END AS cosine
             FROM terms)
    SELECT id, ROUND(cosine, 6) AS cosine FROM cosd
    ORDER BY cosine DESC, id LIMIT {k}
    """


def _near_dup_sql(threshold: float = 0.3, n_planes: int = 8, seed: int = 7, dim: int = 64) -> str:
    """Replay cosine_near_duplicates: same-signature pairs, exact cosine
    verify, id_a < id_b."""
    return f"""
    WITH {_SIGS_CTE.format(planes=_planes_values_sql(n_planes, seed, dim))},
    dims AS (SELECT CAST(range AS INT) + 1 AS i FROM range({dim})),
    base AS (SELECT e.vec_id AS id, e.embedding AS e, s.sig
             FROM embeddings e JOIN sigs s USING (vec_id)
             WHERE e.embedding IS NOT NULL),
    pairs AS (SELECT a.id AS id_a, b.id AS id_b, a.e AS ea, b.e AS eb
              FROM base a JOIN base b ON a.sig = b.sig AND a.id < b.id),
    scored AS (SELECT id_a, id_b,
                      sum(ea[d.i] * eb[d.i])
                      / (sqrt(sum(ea[d.i] * ea[d.i])) * sqrt(sum(eb[d.i] * eb[d.i])))
                      AS cosine
               FROM pairs, dims d GROUP BY id_a, id_b)
    SELECT id_a, id_b, ROUND(cosine, 6) AS cosine FROM scored
    WHERE cosine >= {threshold} ORDER BY id_a, id_b
    """


def _drift_combine_sql() -> str:
    """C5/C18 combine from the (already 6dp-rounded) single-method
    oracle scalars — mirrors q_drift_combine_events' round-then-combine."""
    js = _js_psi_sql(_EVENTS_REF, _EVENTS_CUR, ORACLE_NBINS)
    w1 = _wasserstein_sql(_EVENTS_REF, _EVENTS_CUR)
    ps = _psi_quantile_sql(_EVENTS_REF, _EVENTS_CUR, 10)
    return f"""
    WITH jsq AS ({js}), w1q AS ({w1}), psq AS ({ps}),
    m(method, score, threshold, weight) AS (
      SELECT 'js_divergence', js, 0.2, 1.0 FROM jsq
      UNION ALL SELECT 'wasserstein', wd_norm, 0.1, 1.0 FROM w1q
      UNION ALL SELECT 'psi', psi, 0.2, 1.0 FROM psq),
    scored AS (SELECT method, score,
                      ROUND(LEAST(score / threshold, 1.0), 6) AS norm_score,
                      score > threshold AS drift_detected, weight
               FROM m),
    comb AS (SELECT sum(norm_score * weight) / sum(weight) AS c FROM scored)
    SELECT method, score, norm_score, drift_detected FROM scored
    UNION ALL
    SELECT 'combined', ROUND(c, 6), ROUND(c, 6), c > 0.1 FROM comb
    ORDER BY method
    """


def _drift_summary_sql() -> str:
    """A6 rollup over the binned grouped detector's per-group scores."""
    g = _grouped_drift_sql(False, ORACLE_NBINS, 10)
    return f"""
    WITH g AS ({g}),
    m AS (
      SELECT 'js_divergence' AS detector_name, js AS drift_score, js > 0.2 AS dd FROM g
      UNION ALL SELECT 'psi', psi, psi > 0.2 FROM g
      UNION ALL SELECT 'wasserstein', wd_norm, wd_norm > 0.1 FROM g)
    SELECT detector_name,
           ROUND(max(drift_score), 6) AS max_drift_score,
           bool_or(dd) AS drift_detected,
           count(*)::BIGINT AS n_results,
           CASE WHEN bool_or(dd) AND max(drift_score) > 0.8 THEN 'critical'
                WHEN bool_or(dd) THEN 'warning'
                ELSE 'normal' END AS status
    FROM m GROUP BY detector_name ORDER BY detector_name
    """


def _performance_drift_sql() -> str:
    """C15: relative mean change (value) + error-rate x100 rule + overall."""
    t = EVENTS_SPLIT_TS
    return f"""
    WITH r AS (SELECT avg(value::DOUBLE) AS m FROM events WHERE ts < TIMESTAMP '{t}'),
    c AS (SELECT avg(value::DOUBLE) AS m FROM events WHERE ts >= TIMESTAMP '{t}'),
    re AS (SELECT avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) AS er
           FROM events WHERE ts < TIMESTAMP '{t}'),
    ce AS (SELECT avg(CASE WHEN event_type = 'error' THEN 1.0 ELSE 0.0 END) AS er
           FROM events WHERE ts >= TIMESTAMP '{t}'),
    vm AS (SELECT CASE WHEN r.m > 0 THEN (c.m - r.m) / r.m ELSE 0.0 END AS rel,
                  r.m AS rv, c.m AS cv FROM r, c),
    em AS (SELECT CASE WHEN re.er > 0 THEN (ce.er - re.er) / re.er
                       ELSE ce.er * 100 END AS rel,
                  re.er AS rv, ce.er AS cv FROM re, ce),
    vrow AS (SELECT 'value' AS metric, rv, cv, rel,
                    LEAST(abs(rel) / 0.5, 1.0) AS ds FROM vm),
    erow AS (SELECT 'error_rate' AS metric, rv, cv, rel,
                    LEAST(GREATEST(rel, 0.0) / 2.0, 1.0) AS ds FROM em),
    bothm AS (SELECT * FROM erow UNION ALL SELECT * FROM vrow),
    orow AS (SELECT avg(ds) AS ds FROM bothm)
    SELECT metric, ROUND(rv, 6) AS ref_value, ROUND(cv, 6) AS cur_value,
           ROUND(rel, 6) AS relative_change, ROUND(ds, 6) AS drift_score,
           ds > 0.5 AS drift_detected
    FROM bothm
    UNION ALL
    SELECT 'overall', NULL, NULL, NULL, ROUND(ds, 6), ds > 0.1 FROM orow
    ORDER BY metric
    """


def _stream_validate_sql() -> str:
    sr_list = ", ".join(str(v) for v in SR_HZ_DOMAIN)
    codec_list = ", ".join(f"'{c}'" for c in CODEC_WHITELIST)
    return f"""
    SELECT DISTINCT 'sr_hz_domain' AS check_name, clip_id FROM {_CLIPS}
    WHERE sr_hz IS NULL OR sr_hz NOT IN ({sr_list})
    UNION
    SELECT DISTINCT 'codec_whitelist', clip_id FROM {_CLIPS}
    WHERE codec IS NULL OR codec NOT IN ({codec_list})
    UNION
    SELECT DISTINCT 'referential_clip_orphan', c.clip_id FROM {_CLIPS} c
    WHERE NOT EXISTS (SELECT 1 FROM {_TRANSCRIPTS} t WHERE t.clip_id = c.clip_id)
    UNION
    SELECT DISTINCT 'transcript_equality', c.clip_id FROM {_CLIPS} c
    JOIN {_TRANSCRIPTS} t ON c.clip_id = t.clip_id
    WHERE c.transcript IS DISTINCT FROM t.transcript
    ORDER BY check_name, clip_id
    """


_EVENTS_GROUPED_U = """
      SELECT event_type AS grp, value::DOUBLE AS v,
             CASE WHEN ts < TIMESTAMP '{t}' THEN 1 ELSE 0 END AS r,
             CASE WHEN ts < TIMESTAMP '{t}' THEN 0 ELSE 1 END AS c
      FROM events WHERE value IS NOT NULL"""

_LINEITEM_FEATURES = ("l_quantity", "l_extendedprice", "l_discount")

_LINEITEM_STACK_U = " UNION ALL ".join(
    f"""
      SELECT '{c}' AS grp, {c}::DOUBLE AS v,
             CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END AS r,
             CASE WHEN l_linestatus = 'F' THEN 0 ELSE 1 END AS c
      FROM lineitem WHERE {c} IS NOT NULL"""
    for c in _LINEITEM_FEATURES
)


def _grouped_drift_sql(
    exact_ecdf: bool, nbins: int, psi_nbins: int, u_sql: str | None = None
) -> str:
    """Per-group drift oracle: same arithmetic as the single-pair SQL
    oracles, windowed/grouped by `grp`.  exact_ecdf selects union-ECDF
    KS/W1 (the applyInPandas variant) vs binned-ECDF (the native binned
    variant); JS/PSI/t are identical in both."""
    u_sql = u_sql or _EVENTS_GROUPED_U.format(t=EVENTS_SPLIT_TS)
    qs = ", ".join(str(i / psi_nbins) for i in range(1, psi_nbins))
    if exact_ecdf:
        ks_w1 = f"""
    cum AS (SELECT grp, v,
        sum(r) OVER (PARTITION BY grp ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
        sum(c) OVER (PARTITION BY grp ORDER BY v RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM u),
    perv AS (SELECT grp, v, max(cr) AS cr, max(cc) AS cc FROM cum GROUP BY grp, v),
    steps AS (SELECT p.grp,
        abs(p.cr / st.nr - p.cc / st.nc) AS gap,
        abs(p.cr / st.nr - p.cc / st.nc)
          * (COALESCE(lead(p.v) OVER (PARTITION BY p.grp ORDER BY p.v), p.v) - p.v) AS area
      FROM perv p JOIN st USING (grp)),
    ksw AS (SELECT grp, max(gap) AS ks_d, COALESCE(sum(area), 0.0) AS wd
            FROM steps GROUP BY grp)"""
    else:
        ks_w1 = f"""
    ecum AS (SELECT grp,
        sum(p) OVER (PARTITION BY grp ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fp,
        sum(q) OVER (PARTITION BY grp ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fq,
        (SELECT (st.mx - st.mn) / {nbins} FROM st WHERE st.grp = probs.grp) AS binw
      FROM probs),
    ksw AS (SELECT grp, max(abs(fp - fq)) AS ks_d,
                   sum(abs(fp - fq)) * any_value(binw) AS wd
            FROM ecum GROUP BY grp)"""
    return f"""
    WITH u AS ({u_sql}),
    st AS (SELECT grp, min(v) AS mn, max(v) AS mx,
                  sum(r)::DOUBLE AS nr, sum(c)::DOUBLE AS nc,
                  max(v) FILTER (WHERE r = 1) - min(v) FILTER (WHERE r = 1) AS range_r,
                  max(v) FILTER (WHERE c = 1) - min(v) FILTER (WHERE c = 1) AS range_c,
                  avg(v) FILTER (WHERE r = 1) AS mean_r, avg(v) FILTER (WHERE c = 1) AS mean_c,
                  COALESCE(var_samp(v) FILTER (WHERE r = 1), 0.0) AS var_r,
                  COALESCE(var_samp(v) FILTER (WHERE c = 1), 0.0) AS var_c
           FROM u GROUP BY grp),
    binned AS (
      SELECT u.grp,
             CAST(LEAST(FLOOR((u.v - st.mn) / ((st.mx - st.mn) / {nbins})),
                        {nbins - 1}) AS INT) AS bin, r, c
      FROM u JOIN st USING (grp)),
    counts AS (SELECT grp, bin, sum(r) AS cr, sum(c) AS cc FROM binned GROUP BY grp, bin),
    bins AS (SELECT g.grp, CAST(t.range AS INT) AS bin
             FROM (SELECT DISTINCT grp FROM u) g, range({nbins}) t),
    dense AS (SELECT b.grp, b.bin, COALESCE(cr, 0)::DOUBLE AS cr, COALESCE(cc, 0)::DOUBLE AS cc
              FROM bins b LEFT JOIN counts USING (grp, bin)),
    dens AS (SELECT d.grp, d.bin,
                    d.cr / (st.nr * ((st.mx - st.mn) / {nbins})) + 1e-10 AS dr,
                    d.cc / (st.nc * ((st.mx - st.mn) / {nbins})) + 1e-10 AS dc
             FROM dense d JOIN st USING (grp)),
    probs AS (SELECT grp, bin,
                     dr / sum(dr) OVER (PARTITION BY grp) AS p,
                     dc / sum(dc) OVER (PARTITION BY grp) AS q
              FROM dens),
    jsx AS (SELECT grp,
                   0.5 * sum(p * ln(p / ((p + q) / 2)))
                 + 0.5 * sum(q * ln(q / ((p + q) / 2))) AS js
            FROM probs GROUP BY grp),
    edges AS (SELECT grp, unnest(quantile_cont(v, [{qs}]) FILTER (WHERE r = 1)) AS e
              FROM u GROUP BY grp),
    dv AS (SELECT grp, v, sum(r) AS rv, sum(c) AS cv FROM u GROUP BY grp, v),
    bucketed AS (SELECT dv.grp,
                        (SELECT count(*) FROM edges e
                         WHERE e.grp = dv.grp AND e.e < dv.v)::INT AS bin,
                        rv, cv
                 FROM dv),
    pcounts AS (SELECT grp, bin, sum(rv) AS cr, sum(cv) AS cc
                FROM bucketed GROUP BY grp, bin),
    pbins AS (SELECT g.grp, CAST(t.range AS INT) AS bin
              FROM (SELECT DISTINCT grp FROM u) g, range({psi_nbins}) t),
    pdense AS (SELECT b.grp, COALESCE(cr, 0)::DOUBLE AS cr, COALESCE(cc, 0)::DOUBLE AS cc
               FROM pbins b LEFT JOIN pcounts USING (grp, bin)),
    pprobs AS (SELECT grp,
                      (cr / sum(cr) OVER (PARTITION BY grp) + 1e-10) / (1.0 + {psi_nbins} * 1e-10) AS p,
                      (cc / sum(cc) OVER (PARTITION BY grp) + 1e-10) / (1.0 + {psi_nbins} * 1e-10) AS q
               FROM pdense),
    psix AS (SELECT grp, sum((p - q) * ln(p / q)) AS psi FROM pprobs GROUP BY grp),
    {ks_w1}
    SELECT st.grp,
           st.nr::BIGINT AS n_ref, st.nc::BIGINT AS n_cur,
           ROUND(ksw.ks_d, 6) AS ks_d,
           ROUND(jsx.js, 6) AS js,
           ROUND(psix.psi, 6) AS psi,
           ROUND(ksw.wd, 6) AS wd,
           ROUND(CASE WHEN GREATEST(st.range_r, st.range_c) > 0
                      THEN ksw.wd / GREATEST(st.range_r, st.range_c)
                      ELSE 0.0 END, 6) AS wd_norm,
           ROUND(CASE WHEN (st.var_r / st.nr + st.var_c / st.nc) > 0
                      THEN (st.mean_r - st.mean_c) / sqrt(st.var_r / st.nr + st.var_c / st.nc)
                      ELSE 0.0 END, 6) AS t_stat
    FROM st JOIN ksw USING (grp) JOIN jsx USING (grp) JOIN psix USING (grp)
    ORDER BY grp
    """


def _stream_drift_sql(nbins: int, psi_nbins: int) -> str:
    """Frozen-profile per-window drift metrics — the oracle for
    q_stream_drift_metrics.  Reproduces streaming/drift_stream.py's
    reference_profile + _binned_metrics arithmetic exactly: REF-ONLY
    range with two-sided clamped equal-width bins, ref-decile PSI
    buckets, density/eps/normalize JS, binned-ECDF KS, Welch t from
    moments, score = max(js/0.1, psi/0.2).  One row per event_id%3
    window (the same deterministic split the Spark query streams as
    separate files)."""
    qs = ", ".join(str(i / psi_nbins) for i in range(1, psi_nbins))
    return f"""
    WITH ref AS (SELECT value::DOUBLE AS v FROM events
                 WHERE ts < TIMESTAMP '{EVENTS_SPLIT_TS}' AND value IS NOT NULL),
    geo AS (SELECT count(*)::BIGINT AS n, avg(v) AS mean,
                   COALESCE(var_samp(v), 0.0) AS var, min(v) AS mn, max(v) AS mx,
                   CASE WHEN max(v) > min(v) THEN (max(v) - min(v)) / {nbins}
                        ELSE 1.0 END AS width
            FROM ref),
    edges AS (SELECT unnest(quantile_cont(v, [{qs}])) AS e FROM ref),
    rjc AS (SELECT CAST(GREATEST(LEAST(FLOOR((v - (SELECT mn FROM geo))
                                             / (SELECT width FROM geo)),
                                       {nbins - 1}), 0) AS INT) AS bin,
                   count(*)::DOUBLE AS c
            FROM ref GROUP BY bin),
    rpb AS (SELECT (SELECT count(*) FROM edges WHERE e < x.v)::INT AS bin FROM ref x),
    rpc AS (SELECT bin, count(*)::DOUBLE AS c FROM rpb GROUP BY bin),
    wins AS (SELECT value::DOUBLE AS v, (event_id % 3)::INT AS w FROM events
             WHERE ts >= TIMESTAMP '{EVENTS_SPLIT_TS}' AND value IS NOT NULL),
    cst AS (SELECT w, count(*)::BIGINT AS n, avg(v) AS mean,
                   COALESCE(var_samp(v), 0.0) AS var
            FROM wins GROUP BY w),
    cjc AS (SELECT w, CAST(GREATEST(LEAST(FLOOR((v - (SELECT mn FROM geo))
                                                / (SELECT width FROM geo)),
                                          {nbins - 1}), 0) AS INT) AS bin,
                   count(*)::DOUBLE AS c
            FROM wins GROUP BY w, bin),
    cpb AS (SELECT w, (SELECT count(*) FROM edges WHERE e < x.v)::INT AS bin FROM wins x),
    cpc AS (SELECT w, bin, count(*)::DOUBLE AS c FROM cpb GROUP BY w, bin),
    grid AS (SELECT ws.w, b.bin
             FROM (SELECT DISTINCT w FROM wins) ws,
                  (SELECT CAST(range AS INT) AS bin FROM range({nbins})) b),
    dens AS (SELECT g.w, g.bin,
                    COALESCE(r.c, 0) / ((SELECT n::DOUBLE FROM geo)
                                        * (SELECT width FROM geo)) + 1e-10 AS dr,
                    COALESCE(cj.c, 0) / (GREATEST(s.n, 1)::DOUBLE
                                         * (SELECT width FROM geo)) + 1e-10 AS dc
             FROM grid g
             JOIN cst s ON s.w = g.w
             LEFT JOIN rjc r ON r.bin = g.bin
             LEFT JOIN cjc cj ON cj.w = g.w AND cj.bin = g.bin),
    probs AS (SELECT w, bin, dr / sum(dr) OVER (PARTITION BY w) AS p,
                     dc / sum(dc) OVER (PARTITION BY w) AS q
              FROM dens),
    cums AS (SELECT w, p, q,
                    sum(p) OVER (PARTITION BY w ORDER BY bin) AS cp,
                    sum(q) OVER (PARTITION BY w ORDER BY bin) AS cq
             FROM probs),
    jsks AS (SELECT w,
                    sum(0.5 * p * ln(p / ((p + q) / 2))
                        + 0.5 * q * ln(q / ((p + q) / 2))) AS js,
                    max(abs(cp - cq)) AS ks_d
             FROM cums GROUP BY w),
    pgrid AS (SELECT ws.w, b.bin
              FROM (SELECT DISTINCT w FROM wins) ws,
                   (SELECT CAST(range AS INT) AS bin FROM range({psi_nbins})) b),
    pp AS (SELECT g.w,
                  (COALESCE(r.c, 0) / GREATEST((SELECT sum(c) FROM rpc), 1.0)
                   + 1e-10) / (1.0 + {psi_nbins} * 1e-10) AS p,
                  (COALESCE(cp.c, 0) / GREATEST(s.n, 1)::DOUBLE
                   + 1e-10) / (1.0 + {psi_nbins} * 1e-10) AS q
           FROM pgrid g
           JOIN cst s ON s.w = g.w
           LEFT JOIN rpc r ON r.bin = g.bin
           LEFT JOIN cpc cp ON cp.w = g.w AND cp.bin = g.bin),
    psis AS (SELECT w, sum((p - q) * ln(p / q)) AS psi FROM pp GROUP BY w)
    SELECT s.n::BIGINT AS n, ROUND(s.mean, 6) AS batch_mean,
           ROUND(j.js, 6) AS js, ROUND(ps.psi, 6) AS psi,
           ROUND(j.ks_d, 6) AS ks_d,
           ROUND(CASE WHEN ((SELECT var FROM geo) / (SELECT n FROM geo)
                            + s.var / s.n) > 0
                      THEN ((SELECT mean FROM geo) - s.mean)
                           / sqrt((SELECT var FROM geo) / (SELECT n FROM geo)
                                  + s.var / s.n)
                      ELSE 0.0 END, 6) AS t_stat,
           ROUND(GREATEST(j.js / 0.1, ps.psi / 0.2), 6) AS drift_score,
           (s.n >= 10 AND GREATEST(j.js / 0.1, ps.psi / 0.2) > 1.0) AS drift_detected,
           (s.n < 10) AS gated
    FROM cst s JOIN jsks j USING (w) JOIN psis ps USING (w)
    """


def _moments_sql(ref_sql: str, cur_sql: str) -> str:
    def side(src: str, name: str) -> str:
        return f"""
        SELECT '{name}' AS side, count(v)::BIGINT AS n,
               ROUND(avg(v::DOUBLE), 4) AS mean,
               ROUND(COALESCE(var_samp(v::DOUBLE), 0.0), 4) AS var_samp,
               ROUND(COALESCE(stddev_pop(v::DOUBLE), 0.0), 4) AS stddev,
               ROUND(min(v::DOUBLE), 4) AS min, ROUND(max(v::DOUBLE), 4) AS max
        FROM ({src})"""

    return side(ref_sql, "ref") + " UNION ALL " + side(cur_sql, "cur")


def oracle_sql() -> dict[str, str]:
    _ensure_synth_for_oracle()
    sr_list = ", ".join(str(v) for v in SR_HZ_DOMAIN)
    codec_list = ", ".join(f"'{c}'" for c in CODEC_WHITELIST)
    return {
        "drift_by_group_events": _grouped_drift_sql(True, ORACLE_NBINS, 10),
        "drift_multi_feature_lineitem": _grouped_drift_sql(
            False, ORACLE_NBINS, 10, u_sql=_LINEITEM_STACK_U
        ),
        "drift_by_group_binned_events": _grouped_drift_sql(False, ORACLE_NBINS, 10),
        "drift_feature_group_events": _grouped_drift_sql(
            False, ORACLE_NBINS, 10,
            u_sql=_EVENTS_FEATURE_GROUP_U.format(t=EVENTS_SPLIT_TS),
        ),
        "drift_embedding_by_group": _grouped_embedding_sql(),
        "lexical_by_group_documents": _grouped_lexical_sql(),
        "drift_js_psi_events": _js_psi_sql(_EVENTS_REF, _EVENTS_CUR, ORACLE_NBINS),
        "drift_ks_events": _ks_sql(_EVENTS_REF, _EVENTS_CUR),
        "drift_wasserstein_events": _wasserstein_sql(_EVENTS_REF, _EVENTS_CUR),
        "drift_welch_t_events": _welch_t_sql(_EVENTS_REF, _EVENTS_CUR),
        "drift_psi_quantile_events": _psi_quantile_sql(_EVENTS_REF, _EVENTS_CUR, 10),
        "perplexity_unigram_documents": _perplexity_sql(),
        "topic_histogram_embeddings": _topic_hist_sql(),
        "dedup_clusters_documents": """
            WITH dups AS (SELECT doc_id + 10000 AS doc_id, text FROM
                          (SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 5)),
            uni AS (SELECT doc_id, text FROM documents UNION ALL SELECT * FROM dups),
            g AS (SELECT doc_id AS id, md5(text) AS grp FROM uni),
            c AS (SELECT grp, count(*) AS n, min(id) AS cluster_id FROM g GROUP BY grp)
            SELECT id, cluster_id FROM g JOIN c USING (grp) WHERE n > 1 ORDER BY id
        """,
        "dedup_minhash_documents": _minhash_sql(8),
        "dedup_simhash_documents": _simhash_sql(SIMHASH_BITS),
        "langid_documents": _langid_sql(),
        "quality_documents": _quality_sql(),
        "token_counts_documents": f"""
            SELECT doc_id AS id, len({_TOKLIST})::BIGINT AS ws_tokens,
                   len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))::BIGINT
                   AS wordish_tokens
            FROM documents ORDER BY id
        """,
        "fingerprint_documents": f"""
            SELECT doc_id AS id,
                   md5(array_to_string(list_sort(list_distinct({_TOKLIST})), ' '))
                   AS fingerprint
            FROM documents ORDER BY id
        """,
        "similarity_topk_embeddings": _ann_topk_sql(10),
        "similarity_lsh_topk": _lsh_topk_sql(10),
        "similarity_ivf_topk": "SELECT 10 AS k, TRUE AS recall_ok",
        "similarity_ivf_indexed_topk": (
            "SELECT 10 AS k, TRUE AS recall_ok, TRUE AS parity_ok"
        ),
        "embedding_near_duplicates": _near_dup_sql(0.3),
        "uniqueness_orders_approx": """
            SELECT count(o_orderkey)::BIGINT AS total,
                   count(DISTINCT o_orderkey)::BIGINT AS exact_distinct,
                   TRUE AS within_tolerance
            FROM orders
        """,
        "drift_combine_events": _drift_combine_sql(),
        "drift_summary_events": _drift_summary_sql(),
        "performance_drift_events": _performance_drift_sql(),
        "stream_validate_clips": _stream_validate_sql(),
        "lexical_vocab_documents": _vocab_diff_sql("d.lang = 'en'", "d.lang <> 'en'"),
        "style_features_documents": _style_features_sql(),
        "vocab_term_freq_documents": f"""
            SELECT token, count(*)::BIGINT AS cnt
            FROM ({_DOC_TOKENS.format(where="TRUE")})
            GROUP BY token ORDER BY cnt DESC, token LIMIT 50
        """,
        "rolling_zscore_events": _zscore_sql(20, 2.0),
        "pivot_lineitem": """
            SELECT l_returnflag,
                   ROUND(avg(l_quantity) FILTER (WHERE l_linestatus = 'F'), 6) AS f_avg,
                   ROUND(avg(l_quantity) FILTER (WHERE l_linestatus = 'O'), 6) AS o_avg
            FROM lineitem GROUP BY l_returnflag
        """,
        "embedding_centroid_cosine": _centroid_cosine_sql(
            "SELECT embedding AS e FROM embeddings WHERE vec_id % 2 = 0",
            "SELECT embedding AS e FROM embeddings WHERE vec_id % 2 = 1",
            64,
        ),
        "embedding_mean_dist_to_ref": _mean_dist_sql(
            "SELECT embedding AS e FROM embeddings WHERE vec_id % 2 = 0",
            "SELECT embedding AS e FROM embeddings WHERE vec_id % 2 = 1",
            64,
        ),
        "stream_drift_metrics": _stream_drift_sql(ORACLE_NBINS, 10),
        "join_agg_revenue_by_nation": """
            SELECT n.n_name AS nation,
                   ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY n.n_name ORDER BY nation
        """,
        "topk_customers_by_revenue": """
            WITH per_cust AS (
              SELECT c.c_mktsegment, c.c_custkey,
                     ROUND(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
              FROM lineitem l
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              JOIN customer c ON o.o_custkey = c.c_custkey
              GROUP BY c.c_mktsegment, c.c_custkey),
            ranked AS (
              SELECT c_mktsegment AS mktsegment, c_custkey AS custkey, revenue,
                     row_number() OVER (PARTITION BY c_mktsegment
                                        ORDER BY revenue DESC, c_custkey) AS rnk
              FROM per_cust)
            SELECT mktsegment, custkey::BIGINT AS custkey, revenue, rnk::INT AS rnk
            FROM ranked WHERE rnk <= 3 ORDER BY mktsegment, rnk
        """,
        "clips_stats_profile": _profile_sql(_CLIPS, ["sr_hz", "dur_ms"]),
        "clips_uniqueness": _uniqueness_sql(_CLIPS, "clip_id"),
        "clips_duplicate_keys": f"""
            SELECT clip_id, count(*)::BIGINT AS n FROM {_CLIPS}
            GROUP BY clip_id HAVING count(*) > 1
        """,
        "clips_sr_domain": f"""
            SELECT clip_id, CAST(sr_hz AS VARCHAR) AS value FROM {_CLIPS}
            WHERE sr_hz IS NULL OR sr_hz NOT IN ({sr_list})
        """,
        "clips_codec_whitelist": f"""
            SELECT clip_id, codec AS value FROM {_CLIPS}
            WHERE codec IS NULL OR codec NOT IN ({codec_list})
        """,
        "clips_orphan_clips": f"""
            SELECT DISTINCT c.clip_id FROM {_CLIPS} c
            WHERE NOT EXISTS (SELECT 1 FROM {_TRANSCRIPTS} t WHERE t.clip_id = c.clip_id)
        """,
        "clips_orphan_transcripts": f"""
            SELECT DISTINCT t.clip_id FROM {_TRANSCRIPTS} t
            WHERE NOT EXISTS (SELECT 1 FROM {_CLIPS} c WHERE c.clip_id = t.clip_id)
        """,
        "clips_transcript_equality": f"""
            SELECT DISTINCT c.clip_id FROM {_CLIPS} c
            JOIN {_TRANSCRIPTS} t ON c.clip_id = t.clip_id
            WHERE c.transcript IS DISTINCT FROM t.transcript
        """,
        # Golden-parquet oracle: the synth generator emits the exact
        # planted audio-decode violation set at build time (decode itself
        # is not SQL-expressible) — see q_clips_audio_violations.
        "clips_audio_violations": f"""
            SELECT check_name, clip_id
            FROM read_parquet('{SYNTH_SF001}/expected_audio_violations/*.parquet')
            ORDER BY check_name, clip_id
        """,
        # wav branch mirrors checks.audio.wav_canonical_pred /
        # wav_native_n_samples: full canonical-front check (RIFF/WAVE,
        # fmt size 16 PCM mono, 16-bit, data) and
        # min(declared LE data size, bytes present) // 2
        "clips_dur_mismatch_bytelen": f"""
            WITH c AS (
              SELECT clip_id, codec, sr_hz, dur_ms,
                     octet_length(bytes) AS blen, hex(bytes) AS h
              FROM {_CLIPS}
            )
            SELECT clip_id, codec FROM c
            WHERE (codec IN ('pcm_s16le', 'opus')
                   OR (codec = 'wav' AND blen >= 44
                       AND substring(h, 1, 8) = '52494646'
                       AND substring(h, 17, 8) = '57415645'
                       AND substring(h, 25, 8) = '666D7420'
                       AND substring(h, 33, 16) = '1000000001000100'
                       AND substring(h, 69, 12) = '100064617461'))
              AND abs(dur_ms - (CASE WHEN codec = 'pcm_s16le'
                                     THEN floor(blen / 2)
                                     WHEN codec = 'wav'
                                     THEN floor(LEAST(
                                          CAST(concat('0x', substring(h, 87, 2),
                                                      substring(h, 85, 2),
                                                      substring(h, 83, 2),
                                                      substring(h, 81, 2)) AS BIGINT),
                                          blen - 44) / 2)
                                     ELSE blen END) * 1000.0 / sr_hz) > 1.0
        """,
    }
