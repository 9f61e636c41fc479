"""Event-time windowed drift: late rows merge into their proper
window via the watermark state store, too-late rows drop, and each
FINALIZED window gets exactly one verdict row."""

from datetime import datetime

import pytest


def _rows(hhmm_list, shift=0.0):
    return [
        (datetime(2024, 1, 1, int(t[:2]), int(t[3:])), float(100 + (i % 13)) + shift)
        for i, t in enumerate(hhmm_list)
    ]


DDL = "ts timestamp, x double"


def test_windowed_drift_late_merge_and_finalization(spark, tmp_path):
    from llm_drift_detector_spark.streaming import (
        reference_profile,
        stream_drift_windowed,
    )

    ref = spark.createDataFrame(
        [(datetime(2024, 1, 1), float(100 + (i % 13))) for i in range(300)], DDL
    )
    prof = reference_profile(ref, "x")
    src, out = str(tmp_path / "src"), str(tmp_path / "out")

    # b0: 40 clean rows in w[00:00) + 40 SHIFTED rows in w[01:00)
    b0 = _rows([f"00:{10 + i % 45:02d}" for i in range(40)]) + _rows(
        [f"01:{5 + i % 50:02d}" for i in range(40)], shift=500.0
    )
    # b1: 20 LATE-but-in-watermark clean rows for w[00:00) + rows at
    # 04:00 that advance the watermark past w0/w1
    b1 = _rows(["00:30"] * 20) + _rows(["04:00"] * 5)
    # b2: sentinel at 07:00 (advances the watermark further)
    b2 = _rows(["07:00"] * 5)
    for i, rows in enumerate([b0, b1, b2]):
        spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(f"{src}/b{i}")

    stream_drift_windowed(
        spark, src + "/b*", prof, out, schema=DDL, ts_col="ts",
        window_duration="1 hour", watermark_delay="90 minutes",
        max_files_per_trigger=1,
    )
    got = {
        r.window_start.hour: r
        for r in spark.read.parquet(f"{out}/drift_metrics_windowed").collect()
    }
    # w0 and w1 finalized within the first drain
    assert {0, 1} <= set(got)
    w0, w1 = got[0], got[1]
    assert w0.n == 60  # 40 on time + 20 late-but-in-watermark
    assert not w0.drift_detected
    assert w1.n == 40 and w1.drift_detected  # the shifted window only

    # a second drain: the checkpointed watermark (05:30) drops the
    # too-late 00:40 row — w0's verdict is immutable once finalized —
    # while the 10:00 rows advance it further and finalize the 04:00
    # window (gated: 5 rows)
    spark.createDataFrame(
        _rows(["00:40"]) + _rows(["10:00"] * 3), DDL
    ).coalesce(1).write.parquet(f"{src}/b3")
    stream_drift_windowed(
        spark, src + "/b*", prof, out, schema=DDL, ts_col="ts",
        window_duration="1 hour", watermark_delay="90 minutes",
        max_files_per_trigger=1,
    )
    got2 = {
        r.window_start.hour: r
        for r in spark.read.parquet(f"{out}/drift_metrics_windowed").collect()
    }
    assert got2[0].n == 60 and got2[1].n == 40
    assert 4 in got2
    assert got2[4].gated and got2[4].n == 5
    # exactly one row per finalized window
    assert len(
        spark.read.parquet(f"{out}/drift_metrics_windowed").collect()
    ) == len(got2)


def test_windowed_metrics_match_epoch_stream_on_aligned_data(spark, tmp_path):
    """When data arrives in order and one batch == one window, the
    windowed verdicts equal the epoch stream's (same frozen geometry,
    same arithmetic)."""
    from llm_drift_detector_spark.streaming import (
        reference_profile,
        stream_drift,
        stream_drift_windowed,
    )

    ref = spark.createDataFrame(
        [(datetime(2024, 1, 1), float(100 + (i % 13))) for i in range(200)], DDL
    )
    prof = reference_profile(ref, "x")
    src, wout, eout = (
        str(tmp_path / "src"), str(tmp_path / "w"), str(tmp_path / "e"),
    )
    batches = [
        _rows([f"00:{i % 60:02d}" for i in range(50)]),
        _rows([f"01:{i % 60:02d}" for i in range(50)], shift=300.0),
        _rows(["05:00"] * 3),  # watermark advancer (gated tail window)
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, DDL).coalesce(1).write.parquet(f"{src}/b{i}")

    stream_drift_windowed(
        spark, src + "/b*", prof, wout, schema=DDL, ts_col="ts",
        window_duration="1 hour", watermark_delay="0 seconds",
        max_files_per_trigger=1,
    )
    stream_drift(
        spark, src + "/b*", prof, eout, schema=DDL, max_files_per_trigger=1
    )
    wrows = {
        r.window_start.hour: r
        for r in spark.read.parquet(f"{wout}/drift_metrics_windowed").collect()
    }
    erows = {
        int(r.epoch): r
        for r in spark.read.parquet(f"{eout}/drift_metrics").collect()
    }
    for hour, epoch in ((0, 0), (1, 1)):
        w, e = wrows[hour], erows[epoch]
        assert w.n == e.n
        for f in ("batch_mean", "js", "psi", "ks_d", "t_stat", "drift_score"):
            assert w[f] == pytest.approx(e[f], abs=1e-12), f
        assert w.drift_detected == e.drift_detected
    assert wrows[1].drift_detected and not wrows[0].drift_detected


def test_windowed_grouped_flags_one_cell_and_merges_late(spark, tmp_path):
    """Windowed x grouped: late rows merge into their (window, group)
    cell, only the shifted cell flags, unknown providers surface as a
    NULL-keyed per-window row."""
    from llm_drift_detector_spark.streaming import (
        reference_profile_grouped,
        stream_drift_windowed_grouped,
    )

    gddl = "provider string, ts timestamp, x double"

    def grows(g, hhmm_list, shift=0.0):
        return [(g, t, x + shift) for t, x in _rows(hhmm_list)]

    ref = spark.createDataFrame(
        [(g, datetime(2024, 1, 1), float(100 + (i % 13)))
         for g in ("a", "b") for i in range(200)],
        gddl,
    )
    prof = reference_profile_grouped(ref, ["provider"], "x")
    src, out = str(tmp_path / "src"), str(tmp_path / "out")

    # b0: w0 clean for both groups; w1 SHIFTED for group b only
    b0 = (
        grows("a", [f"00:{10 + i % 45:02d}" for i in range(30)])
        + grows("b", [f"00:{10 + i % 45:02d}" for i in range(30)])
        + grows("a", [f"01:{5 + i % 50:02d}" for i in range(30)])
        + grows("b", [f"01:{5 + i % 50:02d}" for i in range(30)], shift=700.0)
    )
    # b1: LATE w0 rows for group a + unknown provider in w0's watermark
    # span + advancer rows
    b1 = (
        grows("a", ["00:30"] * 15)
        + grows("zzz", ["00:45"] * 4)
        + grows("a", ["04:00"] * 3)
        + grows("b", ["04:00"] * 3)
    )
    for i, rows in enumerate([b0, b1]):
        spark.createDataFrame(rows, gddl).coalesce(1).write.parquet(
            f"{src}/b{i}"
        )
    # extra drain with newer data so w0/w1 definitely finalize
    stream_drift_windowed_grouped(
        spark, src + "/b*", prof, out, schema=gddl, ts_col="ts",
        window_duration="1 hour", watermark_delay="90 minutes",
        max_files_per_trigger=1,
    )
    spark.createDataFrame(
        grows("a", ["08:00"] * 2), gddl
    ).coalesce(1).write.parquet(f"{src}/b2")
    stream_drift_windowed_grouped(
        spark, src + "/b*", prof, out, schema=gddl, ts_col="ts",
        window_duration="1 hour", watermark_delay="90 minutes",
        max_files_per_trigger=1,
    )

    got = {
        (r.window_start.hour, r.provider): r
        for r in spark.read.parquet(
            f"{out}/drift_metrics_windowed_grouped"
        ).collect()
    }
    assert got[(0, "a")].n == 45  # 30 on time + 15 late merged
    assert not got[(0, "a")].drift_detected
    assert got[(0, "b")].n == 30 and not got[(0, "b")].drift_detected
    assert got[(1, "a")].n == 30 and not got[(1, "a")].drift_detected
    assert got[(1, "b")].drift_detected  # the one shifted cell
    unk = got[(0, None)]
    assert unk.gated_reason == "unknown_group" and unk.n == 4
    # tail advancer windows gate on min_samples
    assert got[(4, "a")].gated_reason == "min_samples"
