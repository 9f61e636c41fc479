"""C19 alerts in the streaming monitor: level classification + cooldown
throttling over drained epochs, with state that survives restarts."""

import json
import sys

import pyspark.sql.functions as F
import pytest

sys.path.insert(0, "/root/repo/jobs")


def _write_batch(df, path):
    df.coalesce(1).write.parquet(path)


@pytest.fixture()
def monitor_env(spark, tmp_path):
    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, "/root/testdata/sf0.001")
    ref = spark.read.parquet(f"{root}/clips_reference")
    clips_dir = str(tmp_path / "clips")
    base = ref.limit(400)
    # epoch 0: heavy dur_ms shift (critical), epoch 1: still shifted
    # (inside cooldown), epoch 2: clean
    _write_batch(base.withColumn("dur_ms", F.col("dur_ms") + 5000), f"{clips_dir}/b0")
    _write_batch(base.withColumn("dur_ms", F.col("dur_ms") + 5000), f"{clips_dir}/b1")
    _write_batch(base, f"{clips_dir}/b2")
    return {"root": root, "clips_dir": clips_dir, "out": str(tmp_path / "out")}


def test_critical_then_quiet_yields_one_alert(spark, monitor_env, capsys):
    import monitor_stream

    args = [
        "--clips-dir", monitor_env["clips_dir"] + "/b*",
        "--reference", f"{monitor_env['root']}/clips_reference",
        "--transcripts", f"{monitor_env['root']}/transcripts",
        "--out", monitor_env["out"],
        "--drift-column", "dur_ms",
        "--max-files-per-trigger", "1",
        "--alert-cooldown-minutes", "150",
        "--epoch-minutes", "60",
    ]
    assert monitor_stream.main(args) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["epochs"] == 3
    assert s["drift_detected_epochs"] == [0, 1]
    # epoch 0 alerts critical; epoch 1 is 60 min later — inside the
    # 75-min critical bypass window — so throttled; epoch 2 is clean
    assert len(s["alerts"]) == 1
    a = s["alerts"][0]
    assert a["epoch"] == 0 and a["level"] == "critical"
    assert a["detector"] == "distribution_stream" and a["column"] == "dur_ms"
    alerts = spark.read.parquet(f"{monitor_env['out']}/alerts").collect()
    assert len(alerts) == 1 and alerts[0].level == "critical"

    # rerun the drain with nothing new: persisted throttle state keeps
    # the already-alerted epochs silent; the alerts table does not grow
    assert monitor_stream.main(args) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["alerts"] == []
    assert spark.read.parquet(f"{monitor_env['out']}/alerts").count() == 1

    # a NEW shifted epoch past the bypass window (epoch 3 = +180 min
    # from the last alert > 75 min) re-alerts
    ref = spark.read.parquet(f"{monitor_env['root']}/clips_reference").limit(400)
    _write_batch(
        ref.withColumn("dur_ms", F.col("dur_ms") + 5000),
        f"{monitor_env['clips_dir']}/b3",
    )
    assert monitor_stream.main(args) == 0
    s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [a["epoch"] for a in s3["alerts"]] == [3]
    assert spark.read.parquet(f"{monitor_env['out']}/alerts").count() == 2


def test_grouped_alerts_key_on_group(spark, monitor_env, capsys):
    """Grouped drift rows alert per GROUP: the throttle key carries the
    group suffix, so two codecs drifting in the same epoch produce two
    alert rows, not one throttled composite."""
    import monitor_stream

    out = monitor_env["out"] + "_grouped"
    assert monitor_stream.main(
        [
            "--clips-dir", monitor_env["clips_dir"] + "/b*",
            "--reference", f"{monitor_env['root']}/clips_reference",
            "--transcripts", f"{monitor_env['root']}/transcripts",
            "--out", out,
            "--drift-column", "dur_ms",
            "--group-keys", "codec",
            "--max-files-per-trigger", "1",
            "--alert-cooldown-minutes", "150",
        ]
    ) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    epoch0 = [a for a in s["alerts"] if a["epoch"] == 0]
    cols = {a["column"] for a in epoch0}
    # the +5000ms shift hits every codec group in epoch 0: one alert
    # per group key, each column tagged dur_ms|<codec>
    assert len(cols) >= 2 and all(c.startswith("dur_ms|") for c in cols)
    # epoch 1 repeats the shift inside the cooldown window: throttled
    assert not any(a["epoch"] == 1 for a in s["alerts"])


def test_derive_alerts_cadence_cli(spark, tmp_path, capsys):
    """The out-of-band cadence job (continuous-monitor companion):
    derives alerts only for NEW epochs, is idempotent when nothing new
    arrived, and picks up later epochs on the next invocation."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import derive_alerts

    from llm_drift_detector_spark.streaming import (
        reference_profile,
        stream_drift,
    )

    def rows(n, shift=0.0):
        return [(float(100 + (i * 7) % 31) + shift,) for i in range(n)]

    out, src = str(tmp_path / "out"), str(tmp_path / "src")
    ref = spark.createDataFrame(rows(200), "x double")
    prof = reference_profile(ref, "x")

    spark.createDataFrame(rows(60), "x double").coalesce(1).write.parquet(
        f"{src}/b0"
    )
    spark.createDataFrame(rows(60, shift=900.0), "x double").coalesce(
        1
    ).write.parquet(f"{src}/b1")
    stream_drift(
        spark, src + "/b*", prof, out, schema="x double",
        max_files_per_trigger=1,
    )

    # default mode holds back each sink's HIGHEST epoch (a live monitor
    # may still be overwriting it): only epoch 0 derives, no alert yet
    held = ["--out", out, "--drift-column", "x", "--epoch-minutes", "120"]
    assert derive_alerts.main(held) == 0
    s0 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s0["new_alerts"] == []

    cli = held + ["--include-latest"]
    assert derive_alerts.main(cli) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(s1["new_alerts"]) == 1
    assert s1["new_alerts"][0]["epoch"] == 1
    assert s1["new_alerts"][0]["column"] == "x"

    # nothing new arrived: idempotent no-op
    assert derive_alerts.main(cli) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["new_alerts"] == []

    # a later shifted epoch arrives; only IT derives (cooldown cleared
    # by the 120-minute epoch spacing)
    spark.createDataFrame(rows(60, shift=900.0), "x double").coalesce(
        1
    ).write.parquet(f"{src}/b2")
    stream_drift(
        spark, src + "/b*", prof, out, schema="x double",
        max_files_per_trigger=1,
    )
    assert derive_alerts.main(cli) == 0
    s3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [a["epoch"] for a in s3["new_alerts"]] == [2]
    # the alerts sink accumulated exactly the two rows
    assert spark.read.parquet(f"{out}/alerts").count() == 2
