"""Tests for scalar functions, semantic drift stand-ins, alerts,
io helpers, multimodal plumbing, and streaming validation."""

import math
from datetime import datetime, timedelta

import numpy as np
import pyspark.sql.functions as F
import pytest

from llm_drift_detector_spark.checks.multimodal import frame_sample, media_features
from llm_drift_detector_spark.drift.semantic import (
    assign_topics,
    perplexity_drift,
    topic_drift,
    unigram_perplexities,
)
from llm_drift_detector_spark.functions import (
    dotted_get,
    is_valid_url,
    parse_timestamp,
    truncate_text,
)
from llm_drift_detector_spark.monitoring import AlertManager, classify_level
from llm_drift_detector_spark.pipeline.io import last_n_per_group, recent_window
from llm_drift_detector_spark.synth.clips import SynthParams, drift_params, make_clean_row


# --- scalar functions (§2.8) -------------------------------------------------


def test_scalar_functions(spark):
    df = spark.createDataFrame(
        [
            ("x" * 2000, "https://example.com/a", '{"a": {"b": "7"}}', "1700000000"),
            ("short", "not a url", '{"a": {}}', "2024-01-02 03:04:05"),
        ],
        "text string, url string, meta string, ts string",
    )
    rows = df.select(
        truncate_text("text", 100).alias("t"),
        is_valid_url("url").alias("u"),
        dotted_get("meta", "a.b").alias("g"),
        parse_timestamp("ts").alias("p"),
    ).collect()
    assert len(rows[0].t) == 100 and rows[0].t.endswith("...")
    assert rows[1].t == "short"
    assert rows[0].u is True and rows[1].u is False
    assert rows[0].g == "7" and rows[1].g is None
    assert rows[0].p == datetime(2023, 11, 14, 22, 13, 20)
    assert rows[1].p == datetime(2024, 1, 2, 3, 4, 5)


# --- semantic drift (C11/C12) -------------------------------------------------


def texts_df(spark, p, n=80):
    return spark.createDataFrame(
        [(make_clean_row(p, i)["transcript"],) for i in range(n)], "transcript string"
    )


def test_unigram_perplexity_matches_python(spark):
    base = SynthParams(n_rows=40, inject_violations=False)
    ref = texts_df(spark, base, 40)
    got = {r._doc: r.perplexity for r in unigram_perplexities(ref, ref, "transcript").collect()}
    # python oracle on the same corpus
    texts = [make_clean_row(base, i)["transcript"] for i in range(40)]
    from collections import Counter

    cnt = Counter(t for x in texts for t in x.lower().split())
    n_total, vocab = sum(cnt.values()), len(cnt)
    exp_vals = sorted(
        math.exp(-np.mean([math.log((cnt[t] + 1) / (n_total + vocab)) for t in x.lower().split()]))
        for x in texts
    )
    assert np.allclose(sorted(got.values()), exp_vals, rtol=1e-9)


def test_perplexity_drift_trips_on_vocab_swap(spark):
    base = SynthParams(n_rows=80, inject_violations=False)
    ref = texts_df(spark, base)
    swap = texts_df(spark, drift_params(base, "vocab_swap"))
    null = texts_df(spark, drift_params(base, "null"))
    res_swap = perplexity_drift(ref, swap)
    res_null = perplexity_drift(ref, null)
    # 30% unseen tokens -> perplexity jumps -> relative change > 0.3
    assert res_swap["drift_detected"]
    assert not res_null["drift_detected"]
    assert res_swap["drift_score"] == 1.0  # capped


def test_topic_drift(spark):
    rng = np.random.default_rng(5)
    a = rng.standard_normal((200, 8))
    b = a.copy()
    b[:, 3] += 10.0  # push argmax to dim 3 -> concentrated topic dist
    df_a = spark.createDataFrame([(r.tolist(),) for r in a.astype(float)], "embedding array<double>")
    df_b = spark.createDataFrame([(r.tolist(),) for r in b.astype(float)], "embedding array<double>")
    ta, tb = assign_topics(df_a), assign_topics(df_b)
    res = topic_drift(ta, tb)
    assert res["drift_detected"] and res["drift_score"] > 0.5
    res_same = topic_drift(ta, ta)
    assert not res_same["drift_detected"]
    assert abs(res_same["analysis"]["jensen_shannon_divergence"]) < 1e-6


# --- alerts (C19) --------------------------------------------------------------


def test_alert_levels_and_throttle():
    t0 = datetime(2026, 8, 16, 12, 0, 0)
    assert classify_level(0.12, 0.1) == "critical"
    assert classify_level(0.08, 0.1) == "warning"
    assert classify_level(0.05, 0.1) is None
    mgr = AlertManager(cooldown_minutes=60)
    row = dict(detector_name="ks", column="dur_ms", drift_score=0.08, threshold=0.1)
    a1 = mgr.derive([dict(row, timestamp=t0)])
    assert len(a1) == 1 and a1[0].level == "warning"
    # within cooldown -> suppressed
    assert mgr.derive([dict(row, timestamp=t0 + timedelta(minutes=30))]) == []
    # after cooldown -> fires again
    assert len(mgr.derive([dict(row, timestamp=t0 + timedelta(minutes=61))])) == 1
    # critical bypasses at half cooldown
    crit = dict(row, drift_score=0.2)
    assert len(mgr.derive([dict(crit, timestamp=t0)])) == 1
    assert mgr.derive([dict(crit, timestamp=t0 + timedelta(minutes=20))]) == []
    assert len(mgr.derive([dict(crit, timestamp=t0 + timedelta(minutes=31))])) == 1


# --- io helpers (W2/W3) ---------------------------------------------------------


def test_recent_window_and_last_n(spark):
    rows = [(i, datetime(2026, 8, 16, 0, 0, 0) + timedelta(hours=i)) for i in range(48)]
    df = spark.createDataFrame(rows, "id int, ts timestamp")
    recent = recent_window(df, "ts", 5, now=datetime(2026, 8, 17, 23, 0, 0))
    assert {r.id for r in recent.collect()} == {42, 43, 44, 45, 46, 47}
    last3 = last_n_per_group(df, "ts", 3)
    assert {r.id for r in last3.collect()} == {45, 46, 47}


# --- multimodal plumbing ---------------------------------------------------------


def test_media_features_fake_kernel(spark):
    rows = [
        ("a", bytes(range(256)) * 4, "image"),
        ("b", b"\x00" * 100, "image"),
        ("c", None, "video"),
    ]
    df = spark.createDataFrame(rows, "item_id string, media binary, media_type string")
    got = {r.item_id: r for r in media_features(df).collect()}
    assert got["a"].n_bytes == 1024 and got["a"].decode_status == "ok"
    assert np.allclose(got["a"].feature, [1 / 16] * 16)  # uniform bytes
    assert got["b"].feature[0] == pytest.approx(1.0)  # all zero bytes -> bin 0
    assert got["c"].decode_status == "null_payload"
    with pytest.raises(NotImplementedError):
        media_features(df, decode_mode="real")


def test_media_features_real_wav_kernel(spark):
    """decode_mode='wav' runs a REAL container decoder through the
    multimodal seam: features come from the decoded SIGNAL (a loud and
    a quiet tone of identical byte length differ), malformed payloads
    map to decode_status='decode_failed'."""
    from llm_drift_detector_spark import codecs
    from llm_drift_detector_spark.synth.clips import make_pcm

    pcm = make_pcm(5, 0, 16000, 1600)
    loud = codecs.encode(pcm, "wav", sr_hz=16000)
    quiet = codecs.encode((0.05 * pcm).astype("float32"), "wav", sr_hz=16000)
    rows = [
        ("loud", loud, "audio"),
        ("quiet", quiet, "audio"),
        ("broken", b"JUNK" + loud[4:], "audio"),
    ]
    df = spark.createDataFrame(rows, "item_id string, media binary, media_type string")
    got = {r.item_id: r for r in media_features(df, decode_mode="wav").collect()}
    assert got["loud"].decode_status == "ok" and got["quiet"].decode_status == "ok"
    # quiet signal concentrates in the lowest |amplitude| bins
    assert got["quiet"].feature[0] > 0.9 > got["loud"].feature[0]
    assert got["broken"].decode_status == "decode_failed"
    assert got["broken"].feature is None


def test_frame_sample_udtf_shape(spark):
    payload = bytes(range(256)) * 32  # 8192 bytes = 8 frames of 1024
    df = spark.createDataFrame(
        [("v", payload)], "item_id string, media binary"
    )
    frames = frame_sample(df, frame_bytes=1024, every_k=4).collect()
    assert [(r.item_id, r.frame_index) for r in frames] == [("v", 0), ("v", 4)]
    assert all(len(r.frame_bytes) == 1024 for r in frames)


# --- streaming -------------------------------------------------------------------


def test_stream_validate_matches_batch(spark, sf_dir, tmp_path):
    from llm_drift_detector_spark.pipeline import violations_frame
    from llm_drift_detector_spark.streaming import stream_validate
    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, sf_dir)
    tr = spark.read.parquet(f"{root}/transcripts")
    ref = spark.read.parquet(f"{root}/clips_reference")
    out = str(tmp_path / "stream_out")
    # maxFilesPerTrigger=1 forces MULTIPLE micro-batches: the stream runs
    # only batch-local checks, whose union over batches equals the
    # full-table batch-local result — no false transcript-orphans from
    # partial views (the include_global=False contract).
    stream_validate(
        spark, f"{root}/clips", tr, ref, out, run_id="s1", max_files_per_trigger=1
    )
    got = spark.read.parquet(f"{out}/violations_stream")
    batch = violations_frame(
        spark.read.parquet(f"{root}/clips"), tr, ref, include_global=False
    )
    got_set = {(r.check_name, r.clip_id) for r in got.collect()}
    exp_set = {(r.check_name, r.clip_id) for r in batch.collect()}
    assert got_set == exp_set
    # globally-scoped checks never leak into the streaming sink
    assert not {c for c, _ in got_set} & {"uniqueness", "referential_transcript_orphan"}


def test_windowed_violation_counts_batch_semantics(spark):
    from llm_drift_detector_spark.streaming import windowed_violation_counts

    t0 = datetime(2026, 8, 16, 12, 0, 0)
    rows = [
        ("uniqueness", t0 + timedelta(seconds=s)) for s in (0, 10, 70)
    ] + [("sr_hz_domain", t0 + timedelta(seconds=65))]
    df = spark.createDataFrame(rows, "check_name string, ingest_ts timestamp")
    got = {
        (r.window_start.minute, r.check_name): r.violations
        for r in windowed_violation_counts(df).collect()
    }
    assert got[(0, "uniqueness")] == 2
    assert got[(1, "uniqueness")] == 1
    assert got[(1, "sr_hz_domain")] == 1


def test_embed_texts_matches_stored_embeddings(spark, sf_dir):
    """P2-P3: the Arrow pandas-UDF projection recomputes the transcripts
    table's embedding column BIT-IDENTICALLY from the text (same
    deterministic encoder the fixture generator used)."""
    import numpy as np

    from llm_drift_detector_spark.functions.embed import embed_texts
    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, sf_dir)
    tr = spark.read.parquet(f"{root}/transcripts").limit(200)
    got = embed_texts(
        tr.select("clip_id", "transcript", F.col("embedding").alias("stored")),
        "transcript",
        out_col="recomputed",
    ).collect()
    assert len(got) == 200
    for r in got:
        assert np.array_equal(
            np.asarray(r.stored, dtype=np.float32),
            np.asarray(r.recomputed, dtype=np.float32),
        ), r.clip_id


def test_weighted_sample_modes(spark):
    """O6: sampleBy fractions (approximate) and exact-k per stratum."""
    from llm_drift_detector_spark.pipeline.io import weighted_sample

    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(2000)]
    df = spark.createDataFrame(rows, "id int, grp string")
    s = weighted_sample(df, "grp", {"a": 0.5, "b": 0.1}, seed=3)
    counts = {r.grp: r.cnt for r in s.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    assert 350 < counts["a"] < 650 and 30 < counts["b"] < 180
    ek = weighted_sample(df, "grp", {"a": 1.0, "b": 1.0}, seed=3, exact_k=25)
    ek_counts = {r.grp: r.cnt for r in ek.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    assert ek_counts == {"a": 25, "b": 25}
    # deterministic across invocations
    ids1 = sorted(r.id for r in weighted_sample(df, "grp", {"a": 1.0}, seed=3, exact_k=10).collect())
    ids2 = sorted(r.id for r in weighted_sample(df, "grp", {"a": 1.0}, seed=3, exact_k=10).collect())
    assert ids1 == ids2


def test_grouped_topic_drift_matches_single_pair(spark):
    """Per-group C12 in one job == topic_drift on each group's windows;
    native plan, one-sided topics handled like the full-outer join."""
    from llm_drift_detector_spark.drift.grouped import tag_windows
    from llm_drift_detector_spark.drift.semantic import grouped_topic_drift, topic_drift

    import numpy as np
    import pytest

    rng = np.random.default_rng(41)
    tg = {
        "same": (rng.integers(0, 5, 300), rng.integers(0, 5, 280)),
        "shifted": (rng.integers(0, 5, 300), rng.integers(5, 8, 260)),
    }
    rows = []
    for g, (r, c) in tg.items():
        rows += [(g, "ref", int(t)) for t in r]
        rows += [(g, "cur", int(t)) for t in c]
    tagged = spark.createDataFrame(rows, "grp string, side string, topic int")
    got = {r.grp: r for r in grouped_topic_drift(tagged, ["grp"]).collect()}
    for g, (r, c) in tg.items():
        ra = spark.createDataFrame([(int(t),) for t in r], "topic int")
        rb = spark.createDataFrame([(int(t),) for t in c], "topic int")
        exp = topic_drift(ra, rb)
        assert got[g].js == pytest.approx(
            exp["analysis"]["jensen_shannon_divergence"], abs=1e-9
        ), g
        assert got[g].drift_score == pytest.approx(exp["drift_score"], abs=1e-9)
        assert got[g].drift_detected == exp["drift_detected"]
        assert got[g].ref_topics == exp["analysis"]["reference_topic_count"]
        assert got[g].cur_topics == exp["analysis"]["current_topic_count"]
    assert got["shifted"].drift_detected and not got["same"].drift_detected
    # native plan
    plan = grouped_topic_drift(
        tagged, ["grp"]
    )._jdf.queryExecution().executedPlan().toString()
    for bad in ("EvalPython", "InPandas", "MapInArrow"):
        assert bad not in plan
