"""Streaming text drift (lexical C13/C14 + perplexity C11 + topic C12
per micro-batch vs a frozen text profile): planted vocabulary shifts
flip only their own batch; per-batch metrics match the BATCH detectors
run on the same windows; restarts are exactly-once."""

import pytest


def _docs(vocab_words, n, words_per_doc=12):
    """Deterministic docs cycling through a vocabulary, '.'-sentenced."""
    rows = []
    for i in range(n):
        ws = [vocab_words[(i * 7 + j) % len(vocab_words)] for j in range(words_per_doc)]
        rows.append((" ".join(ws[:6]) + ". " + " ".join(ws[6:]) + ".",))
    return rows


A_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta"]
B_VOCAB = ["omega", "psi", "chi", "phi", "upsilon", "tau", "sigma", "rho"]


def test_stream_text_drift_flags_only_shifted_batch(spark, tmp_path):
    from llm_drift_detector_spark.streaming import (
        stream_text_drift,
        text_reference_profile,
    )

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ref = spark.createDataFrame(_docs(A_VOCAB, 120), "transcript string")
    prof = text_reference_profile(ref, "transcript")
    assert prof["kind"] == "text" and prof["n"] == 120
    assert set(prof["vocab"]) == {w + "." for w in A_VOCAB} | set(A_VOCAB)

    for i, vocab in enumerate([A_VOCAB, B_VOCAB, A_VOCAB]):
        spark.createDataFrame(_docs(vocab, 60), "transcript string").coalesce(
            1
        ).write.parquet(f"{src}/b{i}")
    stream_text_drift(
        spark, src + "/b*", prof, out,
        schema="transcript string", max_files_per_trigger=1,
    )
    rows = {
        int(r.epoch): r for r in spark.read.parquet(f"{out}/text_metrics").collect()
    }
    assert set(rows) == {0, 1, 2}
    detected = {e for e, r in rows.items() if r.drift_detected}
    assert len(detected) == 1
    shifted = rows[detected.pop()]
    # disjoint vocabularies: bare-jaccard rule -> vocab_diff = 1
    assert shifted.jaccard == 1.0 and shifted.vocab_diff == 1.0
    assert shifted.lexical_drift and shifted.ppl_drift
    for e, r in rows.items():
        if not r.drift_detected:
            assert r.vocab_diff < 0.05 and r.lexical_score < 0.05
            assert r.ppl_rel_change < 0.05 and not r.gated and r.n == 60
    # topics disabled: columns are NULL
    assert all(r.topic_js is None for r in rows.values())


def test_stream_text_metrics_match_batch_detectors(spark, tmp_path):
    """One micro-batch; the stream row equals the BATCH lexical_drift /
    perplexity_drift results on the same (ref, cur) pair — the frozen
    profile changes the execution shape, not the numbers."""
    from llm_drift_detector_spark.drift.lexical import lexical_drift
    from llm_drift_detector_spark.drift.semantic import perplexity_drift
    from llm_drift_detector_spark.streaming import (
        stream_text_drift,
        text_reference_profile,
    )

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ref = spark.createDataFrame(_docs(A_VOCAB, 80), "transcript string")
    # half-overlapping vocabulary + longer docs: partial drift
    cur_rows = _docs(A_VOCAB[:4] + B_VOCAB[:4], 50, words_per_doc=16)
    cur = spark.createDataFrame(cur_rows, "transcript string")

    prof = text_reference_profile(ref, "transcript")
    cur.coalesce(1).write.parquet(f"{src}/b0")
    stream_text_drift(spark, src + "/b*", prof, out, schema="transcript string")
    r = spark.read.parquet(f"{out}/text_metrics").collect()[0]

    lex = lexical_drift(ref, cur)
    assert abs(r.vocab_diff - lex["analysis"]["vocabulary_difference"]) < 1e-9
    assert abs(r.style_diff - lex["analysis"]["style_difference"]) < 1e-9
    assert abs(r.jaccard - lex["analysis"]["jaccard"]) < 1e-9
    assert abs(r.js - lex["analysis"]["js"]) < 1e-9
    assert abs(r.lexical_score - lex["drift_score"]) < 1e-9
    assert r.lexical_drift == lex["drift_detected"]

    ppl = perplexity_drift(ref, cur)
    assert abs(r.mean_perplexity - ppl["analysis"]["current_mean"]) < 1e-6
    assert abs(prof["ref_mean_perplexity"] - ppl["analysis"]["reference_mean"]) < 1e-6
    assert abs(r.ppl_rel_change - ppl["analysis"]["relative_change"]) < 1e-6
    assert r.ppl_drift == ppl["drift_detected"]


def test_stream_text_topic_family_matches_batch(spark, tmp_path):
    """With --topic-column frozen, a batch whose argmax-dim topics
    rotate flips topic_drift, and the JS matches the batch topic_drift
    on the same windows."""
    from llm_drift_detector_spark.drift.semantic import assign_topics, topic_drift
    from llm_drift_detector_spark.streaming import (
        stream_text_drift,
        text_reference_profile,
    )

    def erows(hot_dims, n):
        out = []
        for i in range(n):
            hot = hot_dims[i % len(hot_dims)]
            v = [0.1] * 8
            v[hot] = 1.0
            out.append((f"tok{i % 9} words here. more words.", v))
        return out

    ddl = "transcript string, embedding array<float>"
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ref = spark.createDataFrame(erows([0, 1], 100), ddl)
    prof = text_reference_profile(ref, "transcript", topic_column="embedding")
    assert prof["topic_column"] == "embedding"
    assert set(prof["topics"]) == {"0", "1"}

    cur = spark.createDataFrame(erows([6, 7], 60), ddl)
    cur.coalesce(1).write.parquet(f"{src}/b0")
    stream_text_drift(spark, src + "/b*", prof, out, schema=ddl)
    r = spark.read.parquet(f"{out}/text_metrics").collect()[0]

    batch = topic_drift(assign_topics(ref, "embedding"), assign_topics(cur, "embedding"))
    assert abs(r.topic_js - batch["analysis"]["jensen_shannon_divergence"]) < 1e-9
    assert abs(r.topic_score - batch["drift_score"]) < 1e-9
    assert r.topic_drift == batch["drift_detected"] is True
    assert r.drift_detected  # topic family alone trips the row verdict


def test_stream_text_checkpoint_resume_and_gating(spark, tmp_path):
    from llm_drift_detector_spark.streaming import (
        load_profile,
        save_profile,
        stream_text_drift,
        text_reference_profile,
    )

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ref = spark.createDataFrame(_docs(A_VOCAB, 60), "transcript string")
    prof = text_reference_profile(ref, "transcript")
    path = str(tmp_path / "text.json")
    save_profile(prof, path)
    assert load_profile(path) == prof

    # a tiny batch gates (min_samples), zeroed metrics
    spark.createDataFrame(_docs(B_VOCAB, 4), "transcript string").coalesce(
        1
    ).write.parquet(f"{src}/b0")
    stream_text_drift(spark, src + "/b*", prof, out, schema="transcript string")
    rows = spark.read.parquet(f"{out}/text_metrics").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.gated and r.n == 4 and r.lexical_score == 0.0 and not r.drift_detected

    # restart, no new data: nothing reprocessed
    stream_text_drift(spark, src + "/b*", prof, out, schema="transcript string")
    assert len(spark.read.parquet(f"{out}/text_metrics").collect()) == 1

    # new file: exactly one new epoch row
    spark.createDataFrame(_docs(A_VOCAB, 40), "transcript string").coalesce(
        1
    ).write.parquet(f"{src}/b1")
    stream_text_drift(spark, src + "/b*", prof, out, schema="transcript string")
    final = spark.read.parquet(f"{out}/text_metrics").collect()
    assert len(final) == 2 and sum(r.n for r in final) == 44


def _gdocs(groups_vocab, n_per_group, words_per_doc=12):
    """(group, transcript) rows: each group cycles its own vocabulary."""
    rows = []
    for g, vocab in groups_vocab.items():
        rows.extend(
            (g, doc)
            for (doc,) in _docs(vocab, n_per_group, words_per_doc)
        )
    return rows


def test_grouped_text_stream_flags_only_shifted_group(spark, tmp_path):
    from llm_drift_detector_spark.streaming import (
        stream_text_drift_grouped,
        text_reference_profile_grouped,
    )

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ddl = "provider string, transcript string"
    ref = spark.createDataFrame(
        _gdocs({"a": A_VOCAB, "b": B_VOCAB}, 80), ddl
    )
    prof = text_reference_profile_grouped(ref, ["provider"], "transcript")
    assert prof["kind"] == "text_grouped"
    assert set(prof["profiles"]) == {("a",), ("b",)}
    assert prof["profiles"][("a",)]["n"] == 80

    # batch: group a stays on its vocab, group b SHIFTS to a's vocab,
    # plus rows from an unknown provider and a gated tiny group
    batch = (
        _gdocs({"a": A_VOCAB}, 60)
        + _gdocs({"b": A_VOCAB}, 60)
        + _gdocs({"zzz": B_VOCAB}, 7)
    )
    spark.createDataFrame(batch, ddl).coalesce(1).write.parquet(f"{src}/b0")
    stream_text_drift_grouped(spark, src + "/b*", prof, out, schema=ddl)
    rows = spark.read.parquet(f"{out}/text_metrics_grouped").collect()
    by_key = {r.provider: r for r in rows}
    assert set(by_key) == {"a", "b", None}

    a, b, unk = by_key["a"], by_key["b"], by_key[None]
    assert not a.drift_detected and a.vocab_diff < 0.05 and a.n == 60
    assert b.drift_detected and b.lexical_drift and b.ppl_drift
    assert b.jaccard == 1.0 and b.vocab_diff == 1.0  # disjoint rule
    assert unk.gated_reason == "unknown_group" and unk.n == 7 and unk.gated
    assert a.gated_reason is None and not a.gated


def test_grouped_text_stream_matches_global_per_group(spark, tmp_path):
    """Each group's streamed row equals the GLOBAL text stream run on
    that group's slice alone (and hence the batch detectors, which the
    global test already pins) — including the topic family."""
    import pyspark.sql.functions as F

    from llm_drift_detector_spark.streaming import (
        stream_text_drift,
        stream_text_drift_grouped,
        text_reference_profile,
        text_reference_profile_grouped,
    )

    def erows(g, vocab, hot_dims, n):
        out = []
        for i in range(n):
            v = [0.1] * 8
            v[hot_dims[i % len(hot_dims)]] = 1.0
            doc = " ".join(vocab[(i * 5 + j) % len(vocab)] for j in range(10))
            out.append((g, doc + ". tail words.", v))
        return out

    ddl = "provider string, transcript string, embedding array<float>"
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ref_rows = erows("a", A_VOCAB, [0, 1], 70) + erows("b", B_VOCAB, [2, 3], 90)
    cur_rows = erows("a", A_VOCAB, [0, 1], 40) + erows(
        "b", A_VOCAB[:4] + B_VOCAB[:4], [6, 7], 50
    )
    ref = spark.createDataFrame(ref_rows, ddl)
    cur = spark.createDataFrame(cur_rows, ddl)

    gprof = text_reference_profile_grouped(
        ref, ["provider"], "transcript", topic_column="embedding"
    )
    spark.createDataFrame(cur_rows, ddl).coalesce(1).write.parquet(f"{src}/b0")
    stream_text_drift_grouped(spark, src + "/b*", gprof, out, schema=ddl)
    grouped = {
        r.provider: r
        for r in spark.read.parquet(f"{out}/text_metrics_grouped").collect()
    }

    for g in ("a", "b"):
        sprof = text_reference_profile(
            ref.where(F.col("provider") == g), "transcript",
            topic_column="embedding",
        )
        gsrc, gout = str(tmp_path / f"s_{g}"), str(tmp_path / f"o_{g}")
        cur.where(F.col("provider") == g).drop("provider").coalesce(
            1
        ).write.parquet(f"{gsrc}/b0")
        stream_text_drift(
            spark, gsrc + "/b*", sprof, gout,
            schema="transcript string, embedding array<float>",
        )
        solo = spark.read.parquet(f"{gout}/text_metrics").collect()[0]
        got = grouped[g]
        assert got.n == solo.n
        for f in (
            "jaccard", "js", "vocab_diff", "style_diff", "lexical_score",
            "mean_perplexity", "ppl_rel_change", "ppl_score", "topic_js",
            "topic_score",
        ):
            assert abs(got[f] - solo[f]) < 1e-9, (g, f, got[f], solo[f])
        for f in ("lexical_drift", "ppl_drift", "topic_drift", "drift_detected"):
            assert got[f] == solo[f]
    assert grouped["b"].drift_detected and not grouped["a"].drift_detected


def test_grouped_text_stream_empty_batch_and_min_samples(spark, tmp_path):
    from llm_drift_detector_spark.streaming import (
        stream_text_drift_grouped,
        text_reference_profile_grouped,
    )

    ddl = "provider string, transcript string"
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ref = spark.createDataFrame(_gdocs({"a": A_VOCAB}, 60), ddl)
    prof = text_reference_profile_grouped(ref, ["provider"], "transcript")

    # all-null batch -> empty_batch placeholder row claims the epoch
    spark.createDataFrame([("a", None)], ddl).coalesce(1).write.parquet(
        f"{src}/b0"
    )
    stream_text_drift_grouped(spark, src + "/b*", prof, out, schema=ddl)
    rows = spark.read.parquet(f"{out}/text_metrics_grouped").collect()
    assert len(rows) == 1 and rows[0].gated_reason == "empty_batch"

    # tiny known-group batch -> min_samples gate
    spark.createDataFrame(_gdocs({"a": B_VOCAB}, 3), ddl).coalesce(
        1
    ).write.parquet(f"{src}/b1")
    stream_text_drift_grouped(spark, src + "/b*", prof, out, schema=ddl)
    rows = {
        int(r.epoch): r
        for r in spark.read.parquet(f"{out}/text_metrics_grouped").collect()
    }
    assert len(rows) == 2
    gated = rows[max(rows)]
    assert gated.provider == "a" and gated.gated_reason == "min_samples"
    assert gated.n == 3 and not gated.drift_detected


def test_text_profile_refuses_gated_baseline(spark):
    from llm_drift_detector_spark.streaming import text_reference_profile

    tiny = spark.createDataFrame(_docs(A_VOCAB, 3), "transcript string")
    with pytest.raises(ValueError, match="MIN_SAMPLES"):
        text_reference_profile(tiny, "transcript")


def test_monitor_cli_text_family(spark, tmp_path, capsys):
    """The monitor job runs the text families alongside the others when
    --text-column is given; clean synth transcripts show no text drift;
    profile reuse rejects a topic-column mismatch."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import monitor_stream

    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, "/root/testdata/sf0.001")
    ppath = str(tmp_path / "text_frozen.json")
    args = [
        "--clips-dir", f"{root}/clips",
        "--reference", f"{root}/clips_reference",
        "--transcripts", f"{root}/transcripts",
        "--out", str(tmp_path / "m1"),
        "--drift-column", "dur_ms",
        "--text-column", "transcript",
        "--text-dir", f"{root}/transcripts",
        "--text-reference", f"{root}/transcripts_reference",
        "--text-topic-column", "embedding",
        "--text-profile-path", ppath,
    ]
    assert monitor_stream.main(args) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["text_epochs"] >= 1
    assert s["text_drift_detected_epochs"] == []

    bad = list(args)
    bad[bad.index("--text-topic-column") + 1] = "missing_col"
    bad[bad.index(str(tmp_path / "m1"))] = str(tmp_path / "m2")
    with pytest.raises(SystemExit, match="does not match"):
        monitor_stream.main(bad)


def test_monitor_cli_text_grouped(spark, tmp_path, capsys):
    """--text-group-keys routes the text family through the GROUPED
    stream: the summary reports per-group detections and the alert
    rows carry the group-suffixed column key."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import monitor_stream

    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, "/root/testdata/sf0.001")
    ddl = "provider string, transcript string"
    tref = spark.createDataFrame(
        _gdocs({"a": A_VOCAB, "b": B_VOCAB}, 40), ddl
    )
    # group b shifts to a's vocabulary in the streamed batch
    tcur = spark.createDataFrame(
        _gdocs({"a": A_VOCAB, "b": A_VOCAB}, 30), ddl
    )
    trefdir, tdir = str(tmp_path / "tref"), str(tmp_path / "tcur")
    tref.coalesce(1).write.parquet(trefdir)
    tcur.coalesce(1).write.parquet(f"{tdir}/b0")

    out = str(tmp_path / "m")
    assert monitor_stream.main([
        "--clips-dir", f"{root}/clips",
        "--reference", f"{root}/clips_reference",
        "--transcripts", f"{root}/transcripts",
        "--out", out,
        "--drift-column", "dur_ms",
        "--text-column", "transcript",
        "--text-dir", tdir + "/b*",
        "--text-reference", trefdir,
        "--text-group-keys", "provider",
    ]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["text_epochs"] == 1
    assert s["text_drift_detected"] == [{"provider": "b", "epoch": 0}]
    # alert columns are group-suffixed so per-group cooldowns are
    # independent; only group b's text detectors may alert
    text_alert_cols = {
        a["column"] for a in s["alerts"] if a["detector"].endswith("_stream")
        and a["column"].startswith("transcript")
    }
    assert text_alert_cols and text_alert_cols <= {"transcript|b"}
