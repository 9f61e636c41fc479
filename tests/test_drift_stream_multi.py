"""Multi-column streaming drift: one fused aggregate per micro-batch
covers every monitored feature column; per-column rows are numerically
identical to the single-column stream run on that column alone."""

import pytest


def _rows(n, a_shift=0.0, b_shift=0.0, c_null=False):
    """Three numeric features with deterministic, distinct shapes."""
    out = []
    for i in range(n):
        out.append(
            (
                float(1000 + (i % 13)) + a_shift,
                float(50 + (i * 3) % 29) + b_shift,
                None if c_null else float((i % 7) ** 2),
            )
        )
    return out


DDL = "fa double, fb double, fc double"
COLS = ["fa", "fb", "fc"]


def test_multi_profile_matches_single_column_profiles(spark):
    from llm_drift_detector_spark.streaming import (
        reference_profile,
        reference_profile_multi,
    )

    ref = spark.createDataFrame(_rows(200), DDL)
    multi = reference_profile_multi(ref, COLS, nbins=20, psi_nbins=5)
    assert multi["kind"] == "distribution_multi" and multi["columns"] == COLS
    for c in COLS:
        solo = reference_profile(ref, c, nbins=20, psi_nbins=5)
        got = multi["column_profiles"][c]
        for k in ("n", "mean", "var", "mn", "mx", "width", "edges",
                  "js_counts", "psi_counts"):
            assert got[k] == pytest.approx(solo[k]), (c, k)


def test_multi_stream_matches_single_streams_and_flags_one_column(
    spark, tmp_path
):
    from llm_drift_detector_spark.streaming import (
        reference_profile,
        reference_profile_multi,
        stream_drift,
        stream_drift_multi,
    )

    ref = spark.createDataFrame(_rows(300), DDL)
    multi = reference_profile_multi(ref, COLS)

    # batch 0 clean; batch 1 shifts ONLY fb far out of range
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    batches = [_rows(80), _rows(80, b_shift=500.0)]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )
    stream_drift_multi(
        spark, src + "/b*", multi, out, schema=DDL, max_files_per_trigger=1
    )
    got = {
        (r.column, int(r.epoch)): r
        for r in spark.read.parquet(f"{out}/drift_metrics_multi").collect()
    }
    assert set(got) == {(c, e) for c in COLS for e in (0, 1)}
    flagged = {k for k, r in got.items() if r.drift_detected}
    assert flagged == {("fb", 1)}

    # exact per-column parity with the single-column stream
    for c in COLS:
        solo_prof = reference_profile(ref, c)
        sout = str(tmp_path / f"solo_{c}")
        stream_drift(
            spark, src + "/b*", solo_prof, sout,
            schema=DDL, max_files_per_trigger=1,
        )
        for r in spark.read.parquet(f"{sout}/drift_metrics").collect():
            m = got[(c, int(r.epoch))]
            for f in ("n", "batch_mean", "js", "psi", "ks_d", "t_stat",
                      "drift_score"):
                assert m[f] == pytest.approx(r[f], abs=1e-12), (c, f)
            assert m.drift_detected == r.drift_detected
            assert m.gated == r.gated


def test_multi_stream_all_null_column_gates_not_drops(spark, tmp_path):
    from llm_drift_detector_spark.streaming import (
        reference_profile_multi,
        stream_drift_multi,
    )

    ref = spark.createDataFrame(_rows(100), DDL)
    multi = reference_profile_multi(ref, COLS)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    spark.createDataFrame(_rows(60, c_null=True), DDL).coalesce(
        1
    ).write.parquet(f"{src}/b0")
    stream_drift_multi(spark, src + "/b*", multi, out, schema=DDL)
    rows = {r.column: r for r in spark.read.parquet(
        f"{out}/drift_metrics_multi"
    ).collect()}
    assert set(rows) == set(COLS)  # every monitored column reports
    assert rows["fc"].gated and rows["fc"].n == 0
    assert not rows["fa"].gated and rows["fa"].n == 60


def test_multi_profile_save_load_and_null_column_refusal(spark, tmp_path):
    from llm_drift_detector_spark.streaming import (
        load_profile,
        reference_profile_multi,
        save_profile,
    )

    ref = spark.createDataFrame(_rows(100), DDL)
    multi = reference_profile_multi(ref, ["fa", "fb"])
    path = str(tmp_path / "multi.json")
    save_profile(multi, path)
    assert load_profile(path) == multi  # string keys survive untouched

    all_null = spark.createDataFrame(_rows(50, c_null=True), DDL)
    with pytest.raises(ValueError, match="fc"):
        reference_profile_multi(all_null, COLS)


def test_monitor_cli_drift_columns(spark, tmp_path, capsys):
    """--drift-columns switches the distribution family to the fused
    multi stream: per-column summary + per-column alert keys."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import monitor_stream

    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "m")
    assert monitor_stream.main([
        "--clips-dir", f"{root}/clips",
        "--reference", f"{root}/clips_reference",
        "--transcripts", f"{root}/transcripts",
        "--out", out,
        "--drift-columns", "dur_ms,sr_hz",
    ]) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["drift_column"] == ["dur_ms", "sr_hz"]
    assert s["epochs"] >= 1
    # clean synth traffic: no column drifts
    assert s["drift_detected"] == []

    # the full matrix: --drift-columns x --group-keys
    assert monitor_stream.main([
        "--clips-dir", f"{root}/clips",
        "--reference", f"{root}/clips_reference",
        "--transcripts", f"{root}/transcripts",
        "--out", str(tmp_path / "m2"),
        "--drift-columns", "dur_ms,sr_hz",
        "--group-keys", "codec",
    ]) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["epochs"] >= 1 and s2["drift_detected"] == []


def test_update_multi_matches_per_column_updates(spark):
    """The fused incremental update equals N single-column updates:
    counts/bins exactly, moments to fp roundoff; a column that is
    all-null in the new data keeps its profile untouched."""
    from llm_drift_detector_spark.streaming import (
        reference_profile,
        reference_profile_multi,
        update_reference_profile,
        update_reference_profile_multi,
    )

    ref = spark.createDataFrame(_rows(150), DDL)
    new = spark.createDataFrame(
        _rows(90, a_shift=3.0, b_shift=-200.0, c_null=True), DDL
    )
    multi = reference_profile_multi(ref, COLS)
    merged = update_reference_profile_multi(multi, new)
    assert merged["columns"] == COLS

    for c in COLS:
        solo = update_reference_profile(reference_profile(ref, c), new)
        got = merged["column_profiles"][c]
        assert got["n"] == solo["n"]
        assert got["js_counts"] == solo["js_counts"]
        assert got["psi_counts"] == solo["psi_counts"]
        assert got["mean"] == pytest.approx(solo["mean"], rel=1e-12)
        assert got["var"] == pytest.approx(solo["var"], rel=1e-12)
        for k in ("data_mn", "data_mx", "needs_rebin"):
            assert got.get(k) == solo.get(k), (c, k)
    # fb shifted far below the frozen range: rebin flag raised there only
    assert merged["column_profiles"]["fb"]["needs_rebin"]
    assert not merged["column_profiles"]["fa"]["needs_rebin"]
    # fc all-null: untouched
    assert merged["column_profiles"]["fc"] == multi["column_profiles"]["fc"]


def test_multi_columns_accept_sql_expressions(spark, tmp_path):
    """A column spec may be any SQL expression (length(s) here):
    payload/metadata features stream without a decode pass, keyed by
    the expression string end to end."""
    from llm_drift_detector_spark.streaming import (
        reference_profile_multi,
        stream_drift_multi,
        update_reference_profile_multi,
    )

    ddl = "fa double, s string"
    mk = lambda n, pad: [
        (float(1000 + (i % 13)), "x" * (10 + (i % 5) + pad)) for i in range(n)
    ]
    ref = spark.createDataFrame(mk(150, 0), ddl)
    cols = ["fa", "length(s)"]
    prof = reference_profile_multi(ref, cols)
    assert set(prof["column_profiles"]) == set(cols)
    assert prof["column_profiles"]["length(s)"]["mn"] == 10.0

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    spark.createDataFrame(mk(60, 40), ddl).coalesce(1).write.parquet(
        f"{src}/b0"
    )
    stream_drift_multi(spark, src + "/b*", prof, out, schema=ddl)
    rows = {r.column: r for r in spark.read.parquet(
        f"{out}/drift_metrics_multi"
    ).collect()}
    assert rows["length(s)"].drift_detected  # strings grew 40 chars
    assert not rows["fa"].drift_detected

    merged = update_reference_profile_multi(prof, ref)
    assert merged["column_profiles"]["length(s)"]["n"] == 300


GDDL = "provider string, fa double, fb double"


def _grows(groups, n, fb_shift=0.0, shift_group=None):
    out = []
    for g in groups:
        for i in range(n):
            out.append(
                (
                    g,
                    float(1000 + (i % 13)) + (10.0 if g == "b" else 0.0),
                    float(50 + (i * 3) % 29)
                    + (fb_shift if g == shift_group else 0.0),
                )
            )
    return out


def test_multi_grouped_matches_grouped_per_column_and_flags_one_cell(
    spark, tmp_path
):
    from llm_drift_detector_spark.streaming import (
        reference_profile_grouped,
        reference_profile_multi_grouped,
        stream_drift_grouped,
        stream_drift_multi_grouped,
    )

    ref = spark.createDataFrame(_grows(["a", "b"], 120), GDDL)
    mg = reference_profile_multi_grouped(ref, ["provider"], ["fa", "fb"])
    assert mg["kind"] == "distribution_multi_grouped"
    assert set(mg["profiles"]) == {("a",), ("b",)}

    # batch: only (group b, column fb) shifts; plus an unknown provider
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    batch = _grows(["a", "b"], 60, fb_shift=400.0, shift_group="b") + [
        ("zzz", 1.0, 2.0)
    ] * 7
    spark.createDataFrame(batch, GDDL).coalesce(1).write.parquet(f"{src}/b0")
    stream_drift_multi_grouped(spark, src + "/b*", mg, out, schema=GDDL)
    got = {
        (r.provider, r.column): r
        for r in spark.read.parquet(
            f"{out}/drift_metrics_multi_grouped"
        ).collect()
    }
    assert set(got) == {
        ("a", "fa"), ("a", "fb"), ("b", "fa"), ("b", "fb"), (None, None),
    }
    flagged = {k for k, r in got.items() if r.drift_detected}
    assert flagged == {("b", "fb")}
    unk = got[(None, None)]
    assert unk.gated_reason == "unknown_group" and unk.n == 7

    # exact per-cell parity with the single-column grouped stream
    for c in ("fa", "fb"):
        gprof = reference_profile_grouped(ref, ["provider"], c)
        sout = str(tmp_path / f"solo_{c}")
        stream_drift_grouped(spark, src + "/b*", gprof, sout, schema=GDDL)
        for r in spark.read.parquet(f"{sout}/drift_metrics_grouped").collect():
            if r.gated_reason == "unknown_group":
                assert unk.n == r.n  # same row-count semantics, 2 cols
                continue
            m = got[(r.provider, c)]
            for f in ("n", "batch_mean", "js", "psi", "ks_d", "t_stat",
                      "drift_score"):
                assert m[f] == pytest.approx(r[f], abs=1e-12), (c, f)
            assert m.drift_detected == r.drift_detected
            assert m.gated == r.gated


def test_multi_grouped_profile_save_load_and_empty_cell_refusal(
    spark, tmp_path
):
    from llm_drift_detector_spark.streaming import (
        load_profile,
        reference_profile_multi_grouped,
        save_profile,
    )

    ref = spark.createDataFrame(_grows(["a", "b"], 50), GDDL)
    mg = reference_profile_multi_grouped(ref, ["provider"], ["fa", "fb"])
    path = str(tmp_path / "mg.json")
    save_profile(mg, path)
    assert load_profile(path) == mg

    # group b's fb entirely null in the reference -> loud refusal
    import pyspark.sql.functions as F

    holey = ref.withColumn(
        "fb", F.when(F.col("provider") == "b", None).otherwise(F.col("fb"))
    )
    with pytest.raises(ValueError, match="fb"):
        reference_profile_multi_grouped(holey, ["provider"], ["fa", "fb"])


def test_multi_grouped_empty_batch_and_gating(spark, tmp_path):
    from llm_drift_detector_spark.streaming import (
        reference_profile_multi_grouped,
        stream_drift_multi_grouped,
    )

    ref = spark.createDataFrame(_grows(["a"], 60), GDDL)
    mg = reference_profile_multi_grouped(ref, ["provider"], ["fa", "fb"])
    src, out = str(tmp_path / "src"), str(tmp_path / "out")

    # all-null batch -> empty_batch placeholder claims the epoch
    spark.createDataFrame([("a", None, None)], GDDL).coalesce(
        1
    ).write.parquet(f"{src}/b0")
    stream_drift_multi_grouped(spark, src + "/b*", mg, out, schema=GDDL)
    rows = spark.read.parquet(f"{out}/drift_metrics_multi_grouped").collect()
    assert len(rows) == 1 and rows[0].gated_reason == "empty_batch"

    # tiny known-group batch -> both cells gate on min_samples
    spark.createDataFrame(_grows(["a"], 3), GDDL).coalesce(1).write.parquet(
        f"{src}/b1"
    )
    stream_drift_multi_grouped(spark, src + "/b*", mg, out, schema=GDDL)
    by_epoch = {}
    for r in spark.read.parquet(f"{out}/drift_metrics_multi_grouped").collect():
        by_epoch.setdefault(int(r.epoch), []).append(r)
    assert len(by_epoch) == 2
    gated = by_epoch[max(by_epoch)]
    assert {(r.provider, r.column) for r in gated} == {("a", "fa"), ("a", "fb")}
    assert all(r.gated_reason == "min_samples" and r.n == 3 for r in gated)


def test_drift_columns_split_respects_expression_commas():
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    from monitor_stream import _split_columns

    assert _split_columns("dur_ms,sr_hz") == ["dur_ms", "sr_hz"]
    assert _split_columns("round(dur_ms,2),coalesce(sr_hz,0)") == [
        "round(dur_ms,2)",
        "coalesce(sr_hz,0)",
    ]
    assert _split_columns(" a , length(b) ") == ["a", "length(b)"]
