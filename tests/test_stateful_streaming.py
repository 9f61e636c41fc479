"""applyInPandasWithState running-drift operator: state persists across
micro-batches; a shifted batch trips the z-score."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    """Two parquet files processed as separate micro-batches
    (maxFilesPerTrigger=1): batch 1 establishes state at mean 10,
    batch 2 is shifted to mean 30."""
    base = tmp_path_factory.mktemp("stateful")
    src = str(base / "src")
    out = str(base / "out")
    cp = str(base / "cp")
    rng = np.random.default_rng(9)
    b1 = [("a", float(v)) for v in rng.normal(10, 1, 500)]
    b2 = [("a", float(v)) for v in rng.normal(30, 1, 500)]
    spark.createDataFrame(b1, "key string, value double").coalesce(1).write.parquet(
        src + "/batch=1"
    )
    spark.createDataFrame(b2, "key string, value double").coalesce(1).write.parquet(
        src + "/batch=2"
    )
    return {"src": src, "out": out, "cp": cp}


def test_running_drift_state_across_microbatches(spark, stream_env):
    from llm_drift_detector_spark.streaming.stateful import running_drift_state

    stream = (
        spark.readStream.schema("key string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_env["src"] + "/batch=*")
    )
    q = (
        running_drift_state(stream, "key", "value")
        .writeStream.format("parquet")
        .option("path", stream_env["out"])
        .option("checkpointLocation", stream_env["cp"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        spark.read.parquet(stream_env["out"]).collect(), key=lambda r: r.running_n
    )
    assert len(rows) == 2
    first, second = rows
    # batch 1: no prior state -> z=0, establishes running stats
    assert first.batch_n == 500 and first.z_score == 0.0 and not first.drifted
    assert abs(first.running_mean - 10.0) < 0.5
    # batch 2: shifted mean vs accumulated state -> massive z, drifted,
    # and the state carried over (running_n includes both batches)
    assert second.batch_n == 500 and second.running_n == 1000
    assert second.drifted and second.z_score > 100
    assert 19 < second.running_mean < 21  # pooled mean of 10s and 30s


def test_cross_batch_duplicate_flagged_exactly_once(spark, tmp_path):
    """A clip_id split across micro-batches is flagged exactly once
    (state persists); a triplicate across three batches flags twice;
    unique ids are never flagged (VERDICT r2 #10)."""
    from llm_drift_detector_spark.streaming.stateful import streaming_duplicate_clips

    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    b1 = [("dup_a",), ("uniq_1",), ("tri_b",)]
    b2 = [("dup_a",), ("uniq_2",), ("tri_b",)]
    b3 = [("uniq_3",), ("tri_b",)]
    for i, b in enumerate((b1, b2, b3), 1):
        spark.createDataFrame(b, "clip_id string").coalesce(1).write.parquet(
            f"{src}/batch={i}"
        )
    stream = (
        spark.readStream.schema("clip_id string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/batch=*")
    )
    q = (
        streaming_duplicate_clips(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.clip_id for r in spark.read.parquet(out).collect())
    assert got == ["dup_a", "tri_b", "tri_b"]


def test_within_batch_duplicate_also_flagged(spark, tmp_path):
    """2nd+ occurrences INSIDE one micro-batch flag too — the first
    occurrence never does.  (applyInPandasWithState only runs on
    streaming frames, so this is a one-trigger stream.)"""
    from llm_drift_detector_spark.streaming.stateful import streaming_duplicate_clips

    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    spark.createDataFrame(
        [("x",), ("x",), ("x",), ("y",)], "clip_id string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("clip_id string").parquet(src)
    q = (
        streaming_duplicate_clips(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.clip_id for r in spark.read.parquet(out).collect())
    assert got == ["x", "x"]


def test_cross_batch_payload_duplicate_flagged(spark, tmp_path):
    """key_col='bytes', id_col='clip_id': the SAME payload under two
    different clip_ids, split across micro-batches, is flagged once by
    its second clip_id — exact audio dedup in continuous mode."""
    from llm_drift_detector_spark.streaming.stateful import streaming_duplicate_clips

    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    pay_a, pay_b, pay_c = (bytearray(p) for p in (b"\x01\x02" * 50, b"\x03\x04" * 50, b"\x05\x06" * 50))
    b1 = [("c1", pay_a), ("c2", pay_b)]
    b2 = [("c3", pay_a), ("c4", pay_c)]  # c3 re-uses payload A
    for i, b in enumerate((b1, b2), 1):
        spark.createDataFrame(b, "clip_id string, bytes binary").coalesce(1).write.parquet(
            f"{src}/batch={i}"
        )
    stream = (
        spark.readStream.schema("clip_id string, bytes binary")
        .option("maxFilesPerTrigger", 1)
        .parquet(src + "/batch=*")
    )
    q = (
        streaming_duplicate_clips(stream, key_col="bytes", id_col="clip_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(r.clip_id for r in spark.read.parquet(out).collect())
    assert got == ["c3"]


class _FakeGroupState:
    """Minimal GroupState stand-in for kernel-level unit tests."""

    def __init__(self):
        self._tuple = None
        self.update_calls = 0

    @property
    def exists(self):
        return self._tuple is not None

    @property
    def get(self):
        return self._tuple

    def update(self, t):
        self._tuple = t
        self.update_calls += 1


def _run_bloom_trigger(kernel, state, ids_hashes):
    import pandas as pd

    pdf = pd.DataFrame(
        {"clip_id": [c for c, _ in ids_hashes], "h": [h for _, h in ids_hashes]}
    )
    out = list(kernel((0,), iter([pdf]), state))
    return sorted(out[0]["clip_id"]) if out else []


def test_bloom_state_bytes_bounded_across_triggers():
    """VERDICT r3 #2: per-bucket state is a FIXED byte size across >=3
    triggers — no growth with ids seen — and a no-new-ids trigger does
    not rewrite state at all."""
    from llm_drift_detector_spark.streaming.stateful import (
        _make_bloom_dup_update,
        bloom_geometry,
    )

    m_bits, k = bloom_geometry(capacity=10_000, fpp=0.01)
    kernel = _make_bloom_dup_update(m_bits, k)
    state = _FakeGroupState()
    rng_ids = [(f"c{i}", hash(f"c{i}")) for i in range(3000)]

    sizes = []
    for t in range(3):  # 1000 fresh ids per trigger
        batch = rng_ids[t * 1000 : (t + 1) * 1000]
        flagged = _run_bloom_trigger(kernel, state, batch)
        assert flagged == []  # all fresh (fpp at this fill is negligible)
        sizes.append(len(state.get[0]))
    assert sizes == [m_bits // 8] * 3  # constant, never grows

    # replay trigger 1's ids: all flagged, state NOT rewritten
    calls_before = state.update_calls
    flagged = _run_bloom_trigger(kernel, state, rng_ids[:1000])
    assert len(flagged) == 1000
    assert state.update_calls == calls_before  # no-new-bits -> no rewrite


def test_bloom_no_false_negatives_and_fpp_bound():
    """Every true duplicate is flagged (no false negatives); fresh ids
    at full capacity flag at a rate close to the configured fpp."""
    import numpy as np

    from llm_drift_detector_spark.streaming.stateful import (
        _make_bloom_dup_update,
        bloom_geometry,
    )

    cap, fpp = 5_000, 0.01
    m_bits, k = bloom_geometry(cap, fpp)
    kernel = _make_bloom_dup_update(m_bits, k)
    state = _FakeGroupState()
    rng = np.random.default_rng(7)
    seen = [(f"s{i}", int(rng.integers(-(2**63), 2**63))) for i in range(cap)]
    _run_bloom_trigger(kernel, state, seen)

    # no false negatives: all seen ids flag on re-occurrence
    assert len(_run_bloom_trigger(kernel, state, seen)) == cap
    # false positives on fresh ids bounded near fpp.  Membership is
    # probed directly on the state bytes (running them through the
    # kernel would INSERT each unflagged id and overfill the filter
    # mid-measurement); 3x slack for sampling noise.
    from llm_drift_detector_spark.streaming.stateful import _bloom_positions

    buf = state.get[0]
    fp = sum(
        1
        for i in range(20_000)
        if all(
            buf[j >> 3] & (1 << (j & 7))
            for j in _bloom_positions(int(rng.integers(-(2**63), 2**63)), m_bits, k)
        )
    )
    assert fp / 20_000 <= 3 * fpp


def test_exact_mode_still_available(spark, tmp_path):
    """state_mode='exact' keeps the original exact-set kernel for
    bounded backfills."""
    from llm_drift_detector_spark.streaming.stateful import streaming_duplicate_clips

    src, out, cp = (str(tmp_path / d) for d in ("src", "out", "cp"))
    spark.createDataFrame(
        [("x",), ("x",), ("y",)], "clip_id string"
    ).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema("clip_id string").parquet(src)
    q = (
        streaming_duplicate_clips(stream, state_mode="exact")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", cp)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(r.clip_id for r in spark.read.parquet(out).collect()) == ["x"]


def test_stream_drift_flags_only_the_shifted_microbatch(spark, tmp_path):
    """VERDICT r3 #5: per-micro-batch binned drift vs a frozen reference
    profile — a planted mean shift in batch 2 flips drift_detected in
    THAT batch's metrics row and nowhere else."""
    import numpy as np

    from llm_drift_detector_spark.streaming import reference_profile, stream_drift

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    rng = np.random.default_rng(21)
    ref = spark.createDataFrame(
        [(float(v),) for v in rng.normal(100, 10, 4000)], "dur_ms double"
    )
    prof = reference_profile(ref, "dur_ms", nbins=30, psi_nbins=10)
    assert prof["n"] == 4000 and len(prof["edges"]) == 9

    batches = [
        rng.normal(100, 10, 800),   # batch 1: same distribution
        rng.normal(160, 10, 800),   # batch 2: planted mean shift
        rng.normal(100, 10, 800),   # batch 3: back to normal
    ]
    for i, b in enumerate(batches, 1):
        spark.createDataFrame(
            [(float(v),) for v in b], "dur_ms double"
        ).coalesce(1).write.parquet(f"{src}/batch={i}")

    stream_drift(
        spark,
        src + "/batch=*",
        prof,
        out,
        schema="dur_ms double",
        max_files_per_trigger=1,
    )
    rows = sorted(
        spark.read.parquet(f"{out}/drift_metrics").collect(), key=lambda r: r.epoch
    )
    assert len(rows) == 3
    flags = [r.drift_detected for r in rows]
    assert flags == [False, True, False], [
        (r.epoch, r.js, r.psi, r.drift_score) for r in rows
    ]
    shifted = rows[1]
    assert shifted.n == 800 and abs(shifted.batch_mean - 160) < 2
    assert shifted.js > rows[0].js and shifted.psi > rows[0].psi
    assert not any(r.gated for r in rows)


def test_stream_drift_gates_tiny_batches(spark, tmp_path):
    """A micro-batch below min_samples is gated: metrics zeroed, no
    drift verdict."""
    import numpy as np

    from llm_drift_detector_spark.streaming import reference_profile, stream_drift

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    rng = np.random.default_rng(5)
    ref = spark.createDataFrame(
        [(float(v),) for v in rng.normal(50, 5, 1000)], "v double"
    )
    prof = reference_profile(ref, "v", nbins=20, psi_nbins=4)
    spark.createDataFrame(
        [(999.0,), (1000.0,)], "v double"
    ).coalesce(1).write.parquet(f"{src}/b1")
    stream_drift(spark, src + "/b*", prof, out, schema="v double")
    rows = spark.read.parquet(f"{out}/drift_metrics").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.gated and not r.drift_detected and r.drift_score == 0.0


def test_monitor_stream_job_end_to_end(spark, tmp_path, capsys):
    """jobs/monitor_stream.py: one CLI run drains the backlog, emitting
    batch-local violations AND per-epoch drift metrics vs the frozen
    reference profile (the reference's poll loop as a stream)."""
    import sys

    import numpy as np

    sys.path.insert(0, "/root/repo/jobs")
    import monitor_stream

    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, "/root/testdata/sf0.001")
    out = str(tmp_path / "mon")
    rc = monitor_stream.main(
        [
            "--clips-dir", f"{root}/clips",
            "--reference", f"{root}/clips_reference",
            "--transcripts", f"{root}/transcripts",
            "--out", out,
            "--drift-column", "dur_ms",
        ]
    )
    assert rc == 0
    summary = __import__("json").loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["violation_rows"] > 0
    assert summary["epochs"] >= 1
    # clips vs the clean reference: same dur distribution -> no drift
    assert summary["drift_detected_epochs"] == []
    met = spark.read.parquet(f"{out}/drift_metrics").collect()
    assert all(not r.gated for r in met) and all(r.n > 0 for r in met)
    assert abs(sum(r.n for r in met) - 6000) < 1

    # grouped mode: per-codec frozen profiles, still no drift vs clean
    out2 = str(tmp_path / "mon_grouped")
    rc = monitor_stream.main(
        [
            "--clips-dir", f"{root}/clips",
            "--reference", f"{root}/clips_reference",
            "--transcripts", f"{root}/transcripts",
            "--out", out2,
            "--drift-column", "dur_ms",
            "--group-keys", "codec",
        ]
    )
    assert rc == 0
    s2 = __import__("json").loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["drift_detected"] == []
    met2 = spark.read.parquet(f"{out2}/drift_metrics_grouped").collect()
    codecs_seen = {r.codec for r in met2}
    assert {"pcm_s16le", "flac", "opus", "wav"} <= codecs_seen
    # mp3_unknown rows exist in clips but NOT in the clean reference ->
    # surfaced as a NULL-keyed row with the unknown_group marker
    unk2 = [r for r in met2 if r.gated_reason == "unknown_group"]
    assert unk2 and all(r.codec is None and r.gated for r in unk2)


def test_stream_drift_grouped_flags_only_shifted_group_and_batch(spark, tmp_path):
    """Per-group streaming drift vs frozen per-group profiles: a shift
    planted in codec 'b' in batch 2 flips drift_detected for ('b',
    epoch 2) ONLY; groups unseen in the reference land as a gated
    unknown_group row, not a silent drop."""
    import numpy as np

    from llm_drift_detector_spark.streaming import (
        reference_profile_grouped,
        stream_drift_grouped,
    )

    rng = np.random.default_rng(31)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ref_rows = [("a", float(v)) for v in rng.normal(50, 5, 2000)] + [
        ("b", float(v)) for v in rng.normal(200, 20, 2000)
    ]
    ref = spark.createDataFrame(ref_rows, "codec string, dur_ms double")
    prof = reference_profile_grouped(ref, ["codec"], "dur_ms", nbins=24, psi_nbins=8)
    assert set(prof["profiles"]) == {("a",), ("b",)}

    def batch(rows, i):
        spark.createDataFrame(rows, "codec string, dur_ms double").coalesce(
            1
        ).write.parquet(f"{src}/batch={i}")

    batch(
        [("a", float(v)) for v in rng.normal(50, 5, 500)]
        + [("b", float(v)) for v in rng.normal(200, 20, 500)],
        1,
    )
    batch(
        [("a", float(v)) for v in rng.normal(50, 5, 500)]
        + [("b", float(v)) for v in rng.normal(320, 20, 500)]  # b shifts
        + [("zz", float(v)) for v in rng.normal(1, 1, 40)],    # unknown group
        2,
    )
    stream_drift_grouped(
        spark, src + "/batch=*", prof, out,
        schema="codec string, dur_ms double", max_files_per_trigger=1,
    )
    rows = spark.read.parquet(f"{out}/drift_metrics_grouped").collect()
    flags = {(r.codec, r.epoch): r.drift_detected for r in rows}
    assert flags[("a", 0)] is False and flags[("a", 1)] is False
    assert flags[("b", 0)] is False and flags[("b", 1)] is True
    unk = [r for r in rows if r.gated_reason == "unknown_group"]
    assert len(unk) == 1 and unk[0].gated and unk[0].n == 40 and unk[0].epoch == 1
    assert unk[0].codec is None  # marker column, not a reserved key value


def test_grouped_profile_boolean_key_canonicalization(spark, tmp_path):
    """Profile build and per-batch routing share SPARK's string cast for
    group keys: a boolean key yields 'true'/'false' on both sides, so
    its rows reach their own profile instead of the unknown bucket
    (Python str() would have built 'True' at profile time)."""
    import numpy as np

    from llm_drift_detector_spark.streaming import (
        reference_profile_grouped,
        stream_drift_grouped,
    )

    rng = np.random.default_rng(53)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ref = spark.createDataFrame(
        [(True, float(v)) for v in rng.normal(10, 2, 400)]
        + [(False, float(v)) for v in rng.normal(100, 10, 400)],
        "flag boolean, v double",
    )
    prof = reference_profile_grouped(ref, ["flag"], "v", nbins=12, psi_nbins=4)
    assert set(prof["profiles"]) == {("true",), ("false",)}

    spark.createDataFrame(
        [(True, float(v)) for v in rng.normal(10, 2, 200)]
        + [(False, float(v)) for v in rng.normal(100, 10, 200)],
        "flag boolean, v double",
    ).coalesce(1).write.parquet(src)
    stream_drift_grouped(
        spark, src, prof, out, schema="flag boolean, v double"
    )
    rows = spark.read.parquet(f"{out}/drift_metrics_grouped").collect()
    assert {r.flag for r in rows} == {"true", "false"}
    assert not any(r.gated_reason == "unknown_group" for r in rows)
    assert all(not r.gated and not r.drift_detected for r in rows)


def test_grouped_empty_batch_writes_epoch_placeholder(spark, tmp_path):
    """An all-null batch still claims its epoch partition (NULL-keyed
    empty_batch row) so epoch accounting matches the global variant."""
    import numpy as np

    from llm_drift_detector_spark.streaming import (
        reference_profile_grouped,
        stream_drift_grouped,
    )

    rng = np.random.default_rng(59)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ref = spark.createDataFrame(
        [("a", float(v)) for v in rng.normal(10, 2, 300)],
        "codec string, v double",
    )
    prof = reference_profile_grouped(ref, ["codec"], "v", nbins=12, psi_nbins=4)
    spark.createDataFrame(
        [("a", None), ("a", None)], "codec string, v double"
    ).coalesce(1).write.parquet(src)
    stream_drift_grouped(spark, src, prof, out, schema="codec string, v double")
    rows = spark.read.parquet(f"{out}/drift_metrics_grouped").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.codec is None and r.gated and r.n == 0
    assert r.gated_reason == "empty_batch" and int(r.epoch) == 0


def test_stream_drift_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Restarting the drift stream with the same checkpoint reprocesses
    NOTHING (no duplicate metrics rows); new files after the restart are
    picked up with fresh epochs."""
    import numpy as np

    from llm_drift_detector_spark.streaming import reference_profile, stream_drift

    rng = np.random.default_rng(17)
    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    ref = spark.createDataFrame(
        [(float(v),) for v in rng.normal(10, 2, 1000)], "v double"
    )
    prof = reference_profile(ref, "v", nbins=16, psi_nbins=4)

    def write_batch(i):
        spark.createDataFrame(
            [(float(x),) for x in rng.normal(10, 2, 300)], "v double"
        ).coalesce(1).write.parquet(f"{src}/b{i}")

    write_batch(1)
    stream_drift(spark, src + "/b*", prof, out, schema="v double")
    first = spark.read.parquet(f"{out}/drift_metrics").collect()
    assert len(first) == 1

    # restart with no new data: nothing reprocessed
    stream_drift(spark, src + "/b*", prof, out, schema="v double")
    again = spark.read.parquet(f"{out}/drift_metrics").collect()
    assert len(again) == 1

    # new file after restart: exactly one new row, total n = 600
    write_batch(2)
    stream_drift(spark, src + "/b*", prof, out, schema="v double")
    final = spark.read.parquet(f"{out}/drift_metrics").collect()
    assert len(final) == 2 and sum(r.n for r in final) == 600


def test_profile_save_load_roundtrip_and_cli_reuse(spark, tmp_path, capsys):
    """save_profile/load_profile roundtrip exactly; the monitor CLI with
    --profile-path LOADS a stored profile on restart — proven by
    pointing the rerun at a garbage reference table: drift is still
    computed against the stored profile (the reference is not touched)."""
    import json
    import sys

    import numpy as np

    from llm_drift_detector_spark.streaming import (
        load_profile,
        reference_profile,
        reference_profile_grouped,
        save_profile,
    )

    rng = np.random.default_rng(41)
    ref = spark.createDataFrame(
        [("a", float(v)) for v in rng.normal(5, 1, 600)]
        + [("b", float(v)) for v in rng.normal(50, 5, 600)],
        "codec string, dur_ms double",
    )
    for prof in (
        reference_profile(ref, "dur_ms", nbins=12, psi_nbins=4),
        reference_profile_grouped(ref, ["codec"], "dur_ms", nbins=12, psi_nbins=4),
    ):
        path = str(tmp_path / "p.json")
        save_profile(prof, path)
        assert load_profile(path) == prof

    sys.path.insert(0, "/root/repo/jobs")
    import monitor_stream

    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, "/root/testdata/sf0.001")
    ppath = str(tmp_path / "frozen.json")
    args = [
        "--clips-dir", f"{root}/clips",
        "--transcripts", f"{root}/transcripts",
        "--out", str(tmp_path / "m1"),
        "--drift-column", "dur_ms",
        "--profile-path", ppath,
        "--reference", f"{root}/clips_reference",
    ]
    assert monitor_stream.main(args) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # restart against a GARBAGE reference: the stored profile wins
    garbage = str(tmp_path / "garbage_ref")
    spark.createDataFrame(
        [(f"g{i}", b"x", 1, 999999, "pcm_s16le", "t") for i in range(40)],
        "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string, transcript string",
    ).write.parquet(garbage)
    args2 = [a if a != f"{root}/clips_reference" else garbage for a in args]
    args2[args2.index(str(tmp_path / "m1"))] = str(tmp_path / "m2")
    assert monitor_stream.main(args2) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["reference_rows"] == s1["reference_rows"] == 6000
    assert s2["drift_detected_epochs"] == []  # judged vs the frozen profile

    # a rerun asking for a DIFFERENT drift column / bin geometry than the
    # stored profile must be rejected, not silently monitor the stored
    # column while reporting the requested one
    for bad in (
        ["--drift-column", "sr_hz"],
        ["--nbins", "13"],
        ["--psi-nbins", "7"],
    ):
        args3 = list(args2)
        if bad[0] in args3:
            args3[args3.index(bad[0]) + 1] = bad[1]
        else:
            args3 += bad
        args3[args3.index(str(tmp_path / "m2"))] = str(tmp_path / "m3")
        with pytest.raises(SystemExit, match="does not match"):
            monitor_stream.main(args3)


def test_monitor_stream_zero_batch_reports_zeros(spark, tmp_path, capsys):
    """Review r4: a drain with nothing to process (empty clips dir) must
    print a zero summary, not crash on the never-created sinks."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import monitor_stream

    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, "/root/testdata/sf0.001")
    empty = tmp_path / "empty_clips"
    empty.mkdir()
    rc = monitor_stream.main(
        [
            "--clips-dir", str(empty),
            "--reference", f"{root}/clips_reference",
            "--transcripts", f"{root}/transcripts",
            "--out", str(tmp_path / "zb"),
            "--drift-column", "dur_ms",
        ]
    )
    assert rc == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["violation_rows"] == 0 and s["epochs"] == 0
    assert s["drift_detected_epochs"] == []
