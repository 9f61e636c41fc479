"""Incremental text-profile update: vocab/style/topics merge EXACTLY
(merged == from-scratch on the concatenated windows); the own-LM mean
perplexity is provably non-mergeable, so the update mixes new-doc
scores under the merged LM and flags LM staleness explicitly."""

import pytest

from tests.test_text_stream import A_VOCAB, B_VOCAB, _docs


def _edocs(vocab, hot_dims, n):
    out = []
    for i in range(n):
        v = [0.1] * 8
        v[hot_dims[i % len(hot_dims)]] = 1.0
        doc = " ".join(vocab[(i * 5 + j) % len(vocab)] for j in range(10))
        out.append((doc + ". tail words.", v))
    return out


DDL = "transcript string, embedding array<float>"


def test_merged_equals_from_scratch_for_mergeable_parts(spark):
    from llm_drift_detector_spark.streaming import (
        text_reference_profile,
        update_text_reference_profile,
    )

    a = spark.createDataFrame(_edocs(A_VOCAB, [0, 1], 120), DDL)
    b = spark.createDataFrame(_edocs(A_VOCAB[:4] + B_VOCAB[:4], [2, 3], 70), DDL)
    both = a.unionAll(b)

    merged = update_text_reference_profile(
        text_reference_profile(a, "transcript", topic_column="embedding"), b
    )
    scratch = text_reference_profile(both, "transcript", topic_column="embedding")

    assert merged["n"] == scratch["n"] == 190
    assert merged["vocab"] == scratch["vocab"]
    assert merged["total_tokens"] == scratch["total_tokens"]
    assert merged["n_sentences"] == scratch["n_sentences"]
    for k in scratch["style"]:
        assert merged["style"][k] == pytest.approx(scratch["style"][k]), k
    assert merged["topics_n"] == scratch["topics_n"]
    for k in scratch["topics"]:
        assert merged["topics"][k] == pytest.approx(scratch["topics"][k]), k
    # associativity: fold b in two halves == fold b at once
    b1 = spark.createDataFrame(_edocs(A_VOCAB[:4] + B_VOCAB[:4], [2, 3], 35), DDL)
    # second half must be the REMAINING docs; regenerate deterministically
    rows = _edocs(A_VOCAB[:4] + B_VOCAB[:4], [2, 3], 70)[35:]
    b2 = spark.createDataFrame(rows, DDL)
    two_step = update_text_reference_profile(
        update_text_reference_profile(
            text_reference_profile(a, "transcript", topic_column="embedding"), b1
        ),
        b2,
    )
    assert two_step["vocab"] == merged["vocab"]
    assert two_step["n"] == merged["n"]


def test_ppl_mix_converges_same_distribution_flags_shift(spark):
    from llm_drift_detector_spark.streaming import (
        text_reference_profile,
        update_text_reference_profile,
    )

    a = spark.createDataFrame(_docs(A_VOCAB, 150), "transcript string")
    prof = text_reference_profile(a, "transcript")

    # same-distribution fold: LM barely moves, mixed mean ~= truth
    same = spark.createDataFrame(_docs(A_VOCAB, 150), "transcript string")
    m1 = update_text_reference_profile(prof, same)
    scratch = text_reference_profile(a.unionAll(same), "transcript")
    assert m1["ppl_lm_divergence"] < 1e-6
    assert not m1["needs_ppl_rescore"]
    assert m1["ref_mean_perplexity"] == pytest.approx(
        scratch["ref_mean_perplexity"], rel=0.05
    )

    # disjoint-vocab fold: LM moved, stored component is stale -> flag
    shift = spark.createDataFrame(_docs(B_VOCAB, 150), "transcript string")
    m2 = update_text_reference_profile(prof, shift)
    assert m2["ppl_lm_divergence"] > 0.1 and m2["needs_ppl_rescore"]


def test_update_refuses_old_profile_and_is_dropin_for_stream(spark, tmp_path):
    from llm_drift_detector_spark.streaming import (
        load_profile,
        save_profile,
        stream_text_drift,
        text_reference_profile,
        update_text_reference_profile,
    )

    a = spark.createDataFrame(_docs(A_VOCAB, 80), "transcript string")
    prof = text_reference_profile(a, "transcript")

    legacy = {k: v for k, v in prof.items() if k != "n_sentences"}
    with pytest.raises(ValueError, match="n_sentences"):
        update_text_reference_profile(legacy, a)

    # empty fold is a no-op
    empty = spark.createDataFrame([(None,)], "transcript string")
    assert update_text_reference_profile(prof, empty) == dict(prof)

    # merged profile hot-swaps into the stream (and JSON round-trips)
    merged = update_text_reference_profile(
        prof, spark.createDataFrame(_docs(A_VOCAB, 40), "transcript string")
    )
    path = str(tmp_path / "m.json")
    save_profile(merged, path)
    assert load_profile(path) == merged
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    spark.createDataFrame(_docs(B_VOCAB, 50), "transcript string").coalesce(
        1
    ).write.parquet(f"{src}/b0")
    stream_text_drift(
        spark, src + "/b*", merged, out, schema="transcript string"
    )
    r = spark.read.parquet(f"{out}/text_metrics").collect()[0]
    assert r.drift_detected and r.n == 50  # disjoint traffic still flags


def test_grouped_text_update_matches_per_group(spark):
    """update_text_reference_profile_grouped == the global update run
    on each group's slice, for every mergeable part; per-group LM
    staleness flags are independent; unknown groups counted."""
    import pyspark.sql.functions as F

    from llm_drift_detector_spark.streaming import (
        text_reference_profile,
        text_reference_profile_grouped,
        update_text_reference_profile,
        update_text_reference_profile_grouped,
    )

    gddl = "provider string, transcript string, embedding array<float>"

    def grows(g, vocab, hot, n):
        return [(g, t, e) for t, e in _edocs(vocab, hot, n)]

    ref_rows = grows("a", A_VOCAB, [0, 1], 80) + grows("b", B_VOCAB, [2], 60)
    # group a folds SAME-distribution data; group b folds a vocab shift
    new_rows = (
        grows("a", A_VOCAB, [0, 1], 50)
        + grows("b", A_VOCAB, [5], 40)
        + grows("zzz", B_VOCAB, [3], 7)
    )
    ref = spark.createDataFrame(ref_rows, gddl)
    new = spark.createDataFrame(new_rows, gddl)

    gprof = text_reference_profile_grouped(
        ref, ["provider"], "transcript", topic_column="embedding"
    )
    merged = update_text_reference_profile_grouped(gprof, new)
    assert merged["unknown_rows"] == 7

    for g in ("a", "b"):
        solo = update_text_reference_profile(
            text_reference_profile(
                ref.where(F.col("provider") == g).drop("provider"),
                "transcript",
                topic_column="embedding",
            ),
            new.where(F.col("provider") == g).drop("provider"),
        )
        got = merged["profiles"][(g,)]
        assert got["n"] == solo["n"]
        assert got["vocab"] == solo["vocab"]
        assert got["n_sentences"] == solo["n_sentences"]
        for k in solo["style"]:
            assert got["style"][k] == pytest.approx(solo["style"][k]), (g, k)
        assert got["topics_n"] == solo["topics_n"]
        for k in solo["topics"]:
            assert got["topics"][k] == pytest.approx(solo["topics"][k])
        assert got["ppl_lm_divergence"] == pytest.approx(
            solo["ppl_lm_divergence"], abs=1e-12
        )
        assert got["ref_mean_perplexity"] == pytest.approx(
            solo["ref_mean_perplexity"], rel=1e-9
        )
    assert not merged["profiles"][("a",)]["needs_ppl_rescore"]
    assert merged["profiles"][("b",)]["needs_ppl_rescore"]


def test_grouped_text_update_refuses_legacy_and_is_dropin(spark, tmp_path):
    from llm_drift_detector_spark.streaming import (
        stream_text_drift_grouped,
        text_reference_profile_grouped,
        update_text_reference_profile_grouped,
    )

    gddl = "provider string, transcript string"
    ref = spark.createDataFrame(
        [("a", d) for (d,) in _docs(A_VOCAB, 60)], gddl
    )
    gprof = text_reference_profile_grouped(ref, ["provider"], "transcript")

    legacy = {
        **gprof,
        "profiles": {
            g: {k: v for k, v in p.items() if k != "n_sentences"}
            for g, p in gprof["profiles"].items()
        },
    }
    with pytest.raises(ValueError, match="n_sentences"):
        update_text_reference_profile_grouped(legacy, ref)

    merged = update_text_reference_profile_grouped(
        gprof,
        spark.createDataFrame([("a", d) for (d,) in _docs(A_VOCAB, 30)], gddl),
    )
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    spark.createDataFrame(
        [("a", d) for (d,) in _docs(B_VOCAB, 40)], gddl
    ).coalesce(1).write.parquet(f"{src}/b0")
    stream_text_drift_grouped(spark, src + "/b*", merged, out, schema=gddl)
    rows = spark.read.parquet(f"{out}/text_metrics_grouped").collect()
    assert len(rows) == 1 and rows[0].drift_detected  # disjoint traffic flags


def test_tokenless_window_does_not_crater_ppl_mean(spark):
    """A whitespace-only window has no scorable docs: folding it must
    leave ref_mean_perplexity unchanged (scored-doc weighting), not
    drag it toward the 0.0 placeholder."""
    from llm_drift_detector_spark.streaming import (
        text_reference_profile,
        update_text_reference_profile,
    )

    a = spark.createDataFrame(_docs(A_VOCAB, 80), "transcript string")
    prof = text_reference_profile(a, "transcript")
    assert prof["n_ppl_docs"] == 80

    blank = spark.createDataFrame([("   ",)] * 50, "transcript string")
    m = update_text_reference_profile(prof, blank)
    assert m["n"] == 130  # docs counted
    assert m["n_ppl_docs"] == 80  # but not scored
    assert m["ref_mean_perplexity"] == pytest.approx(
        prof["ref_mean_perplexity"]
    )
