"""End-to-end pipeline tests: golden violation sets, verdicts, and
kill-and-resume (FIXTURES.md §5.3, §5.5)."""

import pyspark.sql.functions as F
import pytest

from llm_drift_detector_spark.pipeline import RunConfig, run_validation
from llm_drift_detector_spark.synth import ensure_synth
from llm_drift_detector_spark.synth.clips import SF_ROWS, SynthParams, expected_violations


@pytest.fixture(scope="module")
def tables(spark, sf_dir):
    root = ensure_synth(spark, sf_dir)
    return {
        "clips": spark.read.parquet(f"{root}/clips"),
        "transcripts": spark.read.parquet(f"{root}/transcripts"),
        "reference": spark.read.parquet(f"{root}/clips_reference"),
        "expected": expected_violations(SynthParams(n_rows=SF_ROWS["sf0.001"])),
    }


def violations_by_check(spark, out_dir, run_id):
    df = spark.read.parquet(f"{out_dir}/violations")
    got: dict[str, set] = {}
    for r in df.where(F.col("run_id") == run_id).collect():
        got.setdefault(r.check_name, set()).add(r.clip_id)
    return got


def test_full_run_emits_exact_violation_sets(spark, tables, tmp_path):
    cfg = RunConfig(run_id="r1", out_dir=str(tmp_path / "out"))
    summary = run_validation(
        spark, tables["clips"], tables["transcripts"], tables["reference"], cfg
    )
    got = violations_by_check(spark, cfg.out_dir, "r1")
    exp = tables["expected"]
    for check, ids in exp.items():
        assert got.get(check, set()) == ids, check
    assert set(got) == {k for k, v in exp.items() if v}
    # verdicts: every bucket accounted for; fails where violations exist
    assert summary["buckets_pass"] + summary["buckets_fail"] == cfg.n_buckets
    assert summary["violations_emitted"] == sum(len(v) for v in exp.values())
    assert summary["rows_processed"] == SF_ROWS["sf0.001"]

    # metrics table shape: profile + drift rows present
    m = spark.read.parquet(f"{cfg.out_dir}/metrics")
    assert m.where("detector_name = 'stats_profile'").count() > 0
    drift = m.where("detector_name = 'distribution_drift'")
    assert drift.where("metric_name = 'ks_test'").count() == 1
    # clips vs clean reference: same distribution -> KS must not trip
    ks = drift.where("metric_name = 'ks_test'").collect()[0]
    assert not ks.drift_detected


def test_kill_and_resume_matches_uninterrupted(spark, tables, tmp_path):
    base = dict(
        spark=spark,
        clips=tables["clips"],
        transcripts=tables["transcripts"],
        reference=tables["reference"],
    )
    # uninterrupted run
    cfg_a = RunConfig(run_id="full", out_dir=str(tmp_path / "a"))
    run_validation(cfg=cfg_a, **base)

    # killed after 2 of 4 groups, then resumed
    cfg_b = RunConfig(run_id="resumed", out_dir=str(tmp_path / "b"))
    s1 = run_validation(cfg=cfg_b, max_groups=2, **base)
    assert len(s1["executed_groups"]) == 2
    cp1 = spark.read.parquet(f"{cfg_b.out_dir}/checkpoints")
    done_after_kill = cp1.select("partition_id").distinct().count()
    assert 0 < done_after_kill < cfg_b.n_buckets

    s2 = run_validation(cfg=cfg_b, **base)
    # resume skipped exactly the checkpointed buckets
    assert sorted(s2["resumed_buckets_skipped"]) == sorted(
        r.partition_id for r in cp1.select("partition_id").distinct().collect()
    )
    assert len(s2["executed_groups"]) == 2

    va = violations_by_check(spark, cfg_a.out_dir, "full")
    vb = violations_by_check(spark, cfg_b.out_dir, "resumed")
    assert va == vb

    # each bucket checkpointed exactly once despite the kill
    cp2 = spark.read.parquet(f"{cfg_b.out_dir}/checkpoints")
    per_bucket = cp2.groupBy("partition_id").count().collect()
    assert all(r["count"] == 1 for r in per_bucket)
    assert len(per_bucket) == cfg_b.n_buckets


def test_rerun_completed_run_is_noop(spark, tables, tmp_path):
    cfg = RunConfig(run_id="noop", out_dir=str(tmp_path / "c"))
    run_validation(
        spark, tables["clips"], tables["transcripts"], tables["reference"], cfg
    )
    s = run_validation(
        spark, tables["clips"], tables["transcripts"], tables["reference"], cfg
    )
    assert s["executed_groups"] == []
    assert len(s["resumed_buckets_skipped"]) == cfg.n_buckets
