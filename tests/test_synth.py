"""Synthetic-table generator properties: determinism, injected violations."""

import numpy as np
import pyspark.sql.functions as F

from llm_drift_detector_spark import codecs
from llm_drift_detector_spark.synth.clips import (
    SynthParams,
    drift_params,
    expected_violations,
    generate_clips,
    generate_transcripts,
    make_clean_row,
    make_clip_row,
)

P = SynthParams(n_rows=3000)


def test_row_purity_and_duplicate_class():
    # duplicate class: row 1007 is a byte-identical copy of row 1006
    a, b = make_clip_row(P, 1007), make_clip_row(P, 1006)
    assert a == b
    # purity: same index twice -> identical row
    assert make_clip_row(P, 123) == make_clip_row(P, 123)


def test_clean_row_invariants_hold():
    for i in [0, 5, 50, 2500]:
        r = make_clean_row(P, i)
        pcm = codecs.decode(r["bytes"], r["codec"])
        assert abs(r["dur_ms"] - len(pcm) * 1000.0 / r["sr_hz"]) <= 1.0


def test_generate_deterministic_across_partitionings(spark, tmp_path):
    p = SynthParams(n_rows=500)
    generate_clips(spark, p, str(tmp_path / "a"), partitions=2)
    generate_clips(spark, p, str(tmp_path / "b"), partitions=7)
    da = spark.read.parquet(str(tmp_path / "a")).orderBy("clip_id", "dur_ms")
    db = spark.read.parquet(str(tmp_path / "b")).orderBy("clip_id", "dur_ms")
    assert [r.asDict() for r in da.collect()] == [r.asDict() for r in db.collect()]


def test_injected_violation_classes_visible(spark, tmp_path):
    generate_clips(spark, P, str(tmp_path / "clips"), partitions=4)
    generate_transcripts(spark, P, str(tmp_path / "tr"), partitions=4)
    clips = spark.read.parquet(str(tmp_path / "clips"))
    tr = spark.read.parquet(str(tmp_path / "tr"))
    exp = expected_violations(P)

    assert clips.count() == P.n_rows
    bad_sr = {r.clip_id for r in clips.where(~F.col("sr_hz").isin(8000, 16000, 22050, 44100, 48000)).collect()}
    assert bad_sr == exp["sr_hz_domain"]
    from llm_drift_detector_spark.config import CODEC_WHITELIST
    bad_codec = {r.clip_id for r in clips.where(~F.col("codec").isin(*CODEC_WHITELIST)).collect()}
    assert bad_codec == exp["codec_whitelist"]
    dups = {
        r.clip_id
        for r in clips.groupBy("clip_id").count().where("count > 1").collect()
    }
    assert dups == exp["uniqueness"]
    orphan_clips = {
        r.clip_id
        for r in clips.join(tr, "clip_id", "left_anti").select("clip_id").distinct().collect()
    }
    assert orphan_clips == exp["referential_clip_orphan"]
    orphan_tr = {
        r.clip_id for r in tr.join(clips, "clip_id", "left_anti").collect()
    }
    assert orphan_tr == exp["referential_transcript_orphan"]


def test_drift_windows_shift_only_what_they_claim():
    base = SynthParams(n_rows=200, inject_violations=False)
    shifted = drift_params(base, "mean_shift")
    d_base = np.array([make_clean_row(base, i)["dur_ms"] for i in range(200)])
    d_shift = np.array([make_clean_row(shifted, i)["dur_ms"] for i in range(200)])
    assert d_shift.mean() > d_base.mean() * 1.1

    from llm_drift_detector_spark.synth.clips import VOCAB, VOCAB_ALT

    alt_only = set(VOCAB_ALT) - set(VOCAB)
    swapped = drift_params(base, "vocab_swap")
    t = make_clean_row(swapped, 3)["transcript"]
    assert any(w in alt_only for w in t.split())
    t0 = make_clean_row(drift_params(base, "null"), 3)["transcript"]
    assert not any(w in alt_only for w in t0.split())
