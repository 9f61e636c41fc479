"""Audio-modality dedup + feature extraction (audioops package)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from llm_drift_detector_spark import codecs
from llm_drift_detector_spark.synth.clips import make_pcm

SR = 16000
CLIPS_DDL = "clip_id string, bytes binary, sr_hz int, dur_ms int, codec string"


def _row(cid, pcm, codec, sr=SR):
    return (
        cid,
        bytearray(codecs.encode(pcm, codec)),
        sr,
        int(round(len(pcm) * 1000.0 / sr)),
        codec,
    )


@pytest.fixture(scope="module")
def dup_clips(spark):
    """Deterministic fixture: one recording in five guises + unrelated
    clips.  Expected near-dup component: {a0..a4}; exact byte-dup
    group: {a0, a4} only."""
    base = make_pcm(7, 0, SR, SR)  # 1 s
    rows = [
        _row("a0", base, "pcm_s16le"),
        _row("a1", base, "flac"),                      # re-encode, lossless
        _row("a2", base, "opus"),                      # re-encode, lossy
        _row("a3", (0.5 * base).astype(np.float32), "pcm_s16le"),  # re-gain
    ]
    rows.append(("a4",) + tuple(rows[0][1:]))          # bit-identical copy
    for i in range(5, 25):                             # unrelated
        n = SR + 137 * i
        rows.append(_row(f"u{i}", make_pcm(7, i, SR, n), "pcm_s16le"))
    return spark.createDataFrame(rows, CLIPS_DDL)


def test_exact_duplicates_audio_bytes_only(dup_clips):
    from llm_drift_detector_spark.audioops import exact_duplicates_audio

    got = exact_duplicates_audio(dup_clips).collect()
    # only the bit-identical pair groups; the flac/opus/gain copies of
    # the same recording have different payload bytes
    assert sorted(r.id for r in got) == ["a0", "a4"]
    assert all(r.group_size == 2 for r in got)


def test_fingerprints_invariant_to_codec_and_gain(dup_clips):
    from llm_drift_detector_spark.audioops import audio_fingerprints

    fp = audio_fingerprints(dup_clips).collect()
    sigs = {}
    for r in fp:
        sigs.setdefault(r.id, {})[r.band] = r.band_sig
    assert len(sigs["a0"]) == 8
    # lossless re-encode and constant re-gain: every band identical
    assert sigs["a1"] == sigs["a0"]
    assert sigs["a3"] == sigs["a0"]
    # lossy (mu-law) re-encode: quantization may flip near-tie bits, but
    # most bands must survive — that's the LSH property near-dup
    # recall rests on
    shared = sum(sigs["a2"][b] == sigs["a0"][b] for b in range(8))
    assert shared >= 4
    # unrelated clips share no band with a0 (energy-delta bits are
    # effectively iid coin flips; 16-bit bands make collisions ~2^-16)
    for i in range(5, 25):
        assert all(
            sigs[f"u{i}"][b] != sigs["a0"][b] for b in range(8)
        ), f"u{i} collides with a0"


def test_audio_near_dup_pairs_and_clusters(dup_clips):
    from llm_drift_detector_spark.audioops import audio_duplicate_pairs
    from llm_drift_detector_spark.textops import duplicate_clusters

    pairs = audio_duplicate_pairs(dup_clips)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    members = {x for p in got for x in p}
    assert members == {"a0", "a1", "a2", "a3", "a4"}
    labels = {
        r.id: r.cluster_id for r in duplicate_clusters(pairs).collect()
    }
    assert labels == {k: "a0" for k in ["a0", "a1", "a2", "a3", "a4"]}


def test_deduplicate_audio_keeps_one_per_cluster(dup_clips):
    from llm_drift_detector_spark.audioops import deduplicate_audio

    kept = sorted(r.clip_id for r in deduplicate_audio(dup_clips).collect())
    # a0..a4 collapse to a0 (min id); unrelated clips all survive
    assert kept == sorted(["a0"] + [f"u{i}" for i in range(5, 25)])


def test_verify_gate_rejects_different_audio(spark, dup_clips):
    """Even if a bucket collision proposed an unrelated pair, the PCM
    correlation gate must reject it."""
    from llm_drift_detector_spark.audioops import verify_pairs_pcm

    forced = spark.createDataFrame(
        [("a0", "u5"), ("a0", "a3"), ("u6", "u7")], "id_a string, id_b string"
    )
    got = verify_pairs_pcm(forced, dup_clips).collect()
    assert [(r.id_a, r.id_b) for r in got] == [("a0", "a3")]
    assert got[0].corr > 0.999  # gain-invariant: 0.5x copy correlates ~1


def test_audio_topk_finds_reencoded_query(spark, dup_clips):
    """Query with an OPUS re-encode of a0's recording at a different
    gain: every stored guise of that recording ranks above every
    unrelated clip, corr-descending."""
    from llm_drift_detector_spark.audioops import audio_topk

    base = make_pcm(7, 0, SR, SR)
    query = codecs.encode((0.7 * base).astype(np.float32), "opus")
    got = audio_topk(dup_clips, query, "opus", k=10, min_corr=0.9).collect()
    ids = [r.clip_id for r in got]
    assert set(ids) == {"a0", "a1", "a2", "a3", "a4"}
    assert all(r.corr > 0.99 for r in got)
    assert all(r.bands_matched >= 1 for r in got)

    # an unrelated query matches nothing above the corr gate
    other = codecs.encode(make_pcm(99, 1, SR, SR), "pcm_s16le")
    assert audio_topk(dup_clips, other, "pcm_s16le", k=5, min_corr=0.9).count() == 0


def test_audio_features_match_numpy_oracle(spark, dup_clips):
    from llm_drift_detector_spark.audioops import audio_features
    from llm_drift_detector_spark.audioops.features import (
        CLIP_ABS,
        SILENCE_ABS,
        _features_np,
    )

    feats = {r.clip_id: r for r in audio_features(dup_clips).collect()}
    base = make_pcm(7, 0, SR, SR)
    dec = codecs.decode(codecs.encode(base, "pcm_s16le"), "pcm_s16le")
    n, dur, rms, peak, sil, clip_r, zcr, hf = _features_np(dec, SR)
    got = feats["a0"]
    assert got.decode_ok and got.n_samples == SR
    assert got.rms == pytest.approx(rms) and got.peak == pytest.approx(peak)
    assert got.zcr_per_s == pytest.approx(zcr)
    # sine + small noise below sr/4: high-band holds only noise energy
    assert got.hf_energy_ratio == pytest.approx(hf) and 0.0 < hf < 0.05
    # cross-check one feature against a direct numpy computation
    x = dec.astype(np.float64)
    assert got.rms == pytest.approx(float(np.sqrt(np.mean(x * x))))
    assert got.silence_ratio == pytest.approx(float(np.mean(np.abs(x) < SILENCE_ABS)))
    assert got.clipping_ratio == pytest.approx(float(np.mean(np.abs(x) >= CLIP_ABS)))
    # the re-gained copy halves rms but keeps zcr
    assert feats["a3"].rms == pytest.approx(0.5 * got.rms, rel=1e-3)
    assert feats["a3"].zcr_per_s == pytest.approx(got.zcr_per_s, rel=1e-3)


def test_audio_features_decode_failure_rows(spark):
    from llm_drift_detector_spark.audioops import audio_features

    bad = spark.createDataFrame(
        [("x0", bytearray(b"\x01\x02\x03"), SR, 10, "mp3_unknown")], CLIPS_DDL
    )
    got = audio_features(bad).collect()
    assert len(got) == 1 and not got[0].decode_ok and got[0].rms is None


def test_audio_feature_drift_detects_gain_shift(spark):
    from llm_drift_detector_spark.audioops import audio_feature_drift

    # per-clip amplitude spread: the rms distribution needs real width,
    # else the histogram methods (JS/PSI) amplify sampling noise over a
    # microscopic value range and over-trigger on identical windows
    def amp(i):
        return 0.4 + 0.6 * ((i * 37) % 97) / 97.0

    ref_rows = [
        _row(f"r{i}", (amp(i) * make_pcm(11, i, SR, SR // 2)).astype(np.float32),
             "pcm_s16le")
        for i in range(250)
    ]
    cur_same = [
        _row(f"c{i}", (amp(i) * make_pcm(11, 1000 + i, SR, SR // 2)).astype(np.float32),
             "pcm_s16le")
        for i in range(250)
    ]
    cur_gain = [
        _row(f"g{i}", (0.3 * amp(i) * make_pcm(11, 1000 + i, SR, SR // 2)).astype(np.float32),
             "pcm_s16le")
        for i in range(250)
    ]
    ref = spark.createDataFrame(ref_rows, CLIPS_DDL)
    same = spark.createDataFrame(cur_same, CLIPS_DDL)
    gained = spark.createDataFrame(cur_gain, CLIPS_DDL)

    cols = ["rms", "zcr_per_s"]
    calm = {r.feature: r for r in audio_feature_drift(ref, same, cols, exact=True).collect()}
    hot = {r.feature: r for r in audio_feature_drift(ref, gained, cols, exact=True).collect()}
    assert not calm["rms"].drift_detected
    assert hot["rms"].drift_detected
    # zcr is gain-invariant: it must stay calm in BOTH comparisons
    assert not calm["zcr_per_s"].drift_detected
    assert not hot["zcr_per_s"].drift_detected


def test_audio_feature_drift_per_group_one_job(spark):
    """Per-(codec) feature drift in one stacked job: the gained codec's
    rms drifts, the untouched codec stays calm — and zcr stays calm in
    both groups."""
    from llm_drift_detector_spark.audioops import audio_feature_drift

    def amp(i):
        return 0.4 + 0.6 * ((i * 41) % 89) / 89.0

    def rows(prefix, off, gain_opus):
        out = []
        for i in range(120):
            pcm = (amp(i) * make_pcm(19, off + i, SR, SR // 4)).astype(np.float32)
            out.append(_row(f"{prefix}p{i}", pcm, "pcm_s16le"))
            pcm2 = (amp(i) * make_pcm(19, off + 500 + i, SR, SR // 4))
            out.append(
                _row(f"{prefix}o{i}", (gain_opus * pcm2).astype(np.float32), "opus")
            )
        return out

    ref = spark.createDataFrame(rows("r", 0, 1.0), CLIPS_DDL)
    cur = spark.createDataFrame(rows("c", 2000, 0.3), CLIPS_DDL)
    got = {
        (r.codec, r.feature): r
        for r in audio_feature_drift(
            ref, cur, ["rms", "zcr_per_s"], exact=True, group_keys=["codec"]
        ).collect()
    }
    assert len(got) == 4  # 2 codecs x 2 features, one job
    assert got[("opus", "rms")].drift_detected
    assert not got[("pcm_s16le", "rms")].drift_detected
    assert not got[("opus", "zcr_per_s")].drift_detected
    assert not got[("pcm_s16le", "zcr_per_s")].drift_detected


def test_audio_quality_violations_and_opt_in_gate(spark):
    from llm_drift_detector_spark.audioops import audio_quality_violations
    from llm_drift_detector_spark.pipeline.runner import RunConfig, violations_frame

    normal = make_pcm(13, 0, SR, SR // 2)
    silent = np.zeros(SR // 2, dtype=np.float32)
    silent[:100] = 0.5  # 100 loud samples, ~98.8% silence
    clipped = np.ones(SR // 2, dtype=np.float32)
    clipped[: SR // 4] = normal[: SR // 4]  # 50% full-scale
    rows = [
        _row("ok", normal, "pcm_s16le"),
        _row("sil", silent, "pcm_s16le"),
        _row("clip", clipped, "pcm_s16le"),
        ("bad", bytearray(b"xx"), SR, 10, "mp3_unknown"),  # decode failure
    ]
    clips = spark.createDataFrame(rows, CLIPS_DDL)

    got = {r.clip_id: r.detail for r in audio_quality_violations(clips).collect()}
    assert set(got) == {"sil", "clip"}  # decode failure excluded by design
    assert "silence" in got["sil"] and "clipping" in got["clip"]

    # opt-in: the default config must NOT run the gate...
    cfg = RunConfig(run_id="t", out_dir="/tmp/t")
    assert not cfg.check_active("audio_quality")
    empty_t = spark.createDataFrame([], "clip_id string, transcript string")
    clips = clips.withColumn("transcript", F.lit("t"))  # full input_hint shape
    base = violations_frame(clips, empty_t, clips, cfg=cfg)
    assert base.where(F.col("check_name") == "audio_quality").count() == 0
    # ...and an explicit enable runs exactly it
    cfg_on = RunConfig(run_id="t", out_dir="/tmp/t", enabled_checks=("audio_quality",))
    only = violations_frame(clips, empty_t, clips, cfg=cfg_on)
    rows_on = only.collect()
    assert {r.check_name for r in rows_on} == {"audio_quality"}
    assert {r.clip_id for r in rows_on} == {"sil", "clip"}


def test_payload_duplicate_opt_in_check(spark):
    """Same bytes under two clip_ids: the opt-in payload_duplicate check
    flags the non-keeper id; the default config never runs it."""
    from llm_drift_detector_spark.pipeline.runner import RunConfig, violations_frame

    pcm = make_pcm(31, 0, SR, SR // 4)
    rows = [
        _row("k0", pcm, "pcm_s16le") + ("t",),
        ("k1",) + tuple(_row("k0", pcm, "pcm_s16le")[1:]) + ("t",),  # same bytes
        _row("k2", make_pcm(31, 1, SR, SR // 4), "pcm_s16le") + ("t",),
    ]
    clips = spark.createDataFrame(rows, CLIPS_DDL + ", transcript string")
    empty_t = spark.createDataFrame([], "clip_id string, transcript string")

    cfg_off = RunConfig(run_id="p", out_dir="/tmp/p")
    assert not cfg_off.check_active("payload_duplicate")
    cfg_on = RunConfig(
        run_id="p", out_dir="/tmp/p", enabled_checks=("payload_duplicate",)
    )
    got = violations_frame(clips, empty_t, clips, cfg=cfg_on).collect()
    assert [(r.check_name, r.clip_id) for r in got] == [("payload_duplicate", "k1")]


def test_payload_duplicate_cross_group_in_checkpointed_runner(spark, tmp_path):
    """Duplicate groups key on md5(bytes), which clip_id bucketing does
    NOT respect: a pair whose ids hash to different bucket GROUPS must
    still be flagged by the checkpointed runner (it runs the check once
    globally, not per group)."""
    from llm_drift_detector_spark.checks.base import bucket_id
    from llm_drift_detector_spark.pipeline.runner import RunConfig, run_validation

    n_buckets, groups = 8, 4
    # pick two ids that land in different GROUPS (bucket % groups)
    cand = spark.createDataFrame(
        [(f"id{i}",) for i in range(40)], "clip_id string"
    ).select("clip_id", bucket_id("clip_id", n_buckets).alias("b")).collect()
    by_group = {}
    for r in cand:
        by_group.setdefault(int(r.b) % groups, []).append(r.clip_id)
    gkeys = sorted(by_group)
    id_a, id_b = by_group[gkeys[0]][0], by_group[gkeys[1]][0]

    pcm = make_pcm(37, 0, SR, SR // 4)
    payload = bytearray(codecs.encode(pcm, "pcm_s16le"))
    other = make_pcm(37, 1, SR, SR // 4)
    ddl = CLIPS_DDL + ", transcript string"
    rows = [
        (id_a, payload, SR, 250, "pcm_s16le", "t"),
        (id_b, payload, SR, 250, "pcm_s16le", "t"),  # same bytes, other group
        _row("uniq", other, "pcm_s16le") + ("t",),
    ]
    clips = spark.createDataFrame(rows, ddl)
    empty_t = spark.createDataFrame([], "clip_id string, transcript string")
    cfg = RunConfig(
        run_id="pdx",
        out_dir=str(tmp_path / "out"),
        n_buckets=n_buckets,
        groups=groups,
        enabled_checks=("payload_duplicate",),
    )
    summary = run_validation(spark, clips, empty_t, clips, cfg)
    assert summary["payload_duplicate_rows"] == 1
    # payload rows land in a SIBLING of violations/ so the violations
    # group= partition column keeps its integer type (ADVICE r3)
    vio = spark.read.parquet(str(tmp_path / "out" / "payload_violations"))
    flagged = vio.where(F.col("check_name") == "payload_duplicate").collect()
    assert [r.clip_id for r in flagged] == [max(id_a, id_b)]
    # and the violations/ partition column stays numeric-typed
    viodir = tmp_path / "out" / "violations"
    if viodir.exists():
        vtypes = dict(spark.read.parquet(str(viodir)).dtypes)
        assert vtypes.get("group", "int") in ("int", "bigint")
    # idempotent on resume: re-running does not duplicate the rows
    summary2 = run_validation(spark, clips, empty_t, clips, cfg)
    assert summary2["payload_duplicate_rows"] == 1


def test_audio_quality_gate_runs_in_streaming(spark, tmp_path):
    """The gate is per-row (batch-local), so it is streaming-safe: an
    opt-in cfg routes it through stream_validate's micro-batches."""
    from llm_drift_detector_spark.pipeline.runner import RunConfig
    from llm_drift_detector_spark.streaming import stream_validate

    silent = np.zeros(SR // 4, dtype=np.float32)
    rows = [
        _row("s0", silent, "pcm_s16le") + ("t",),
        _row("n0", make_pcm(17, 0, SR, SR // 4), "pcm_s16le") + ("t",),
    ]
    ddl = CLIPS_DDL + ", transcript string"
    src = str(tmp_path / "clips_src")
    spark.createDataFrame(rows, ddl).write.parquet(src)
    out = str(tmp_path / "stream_out")
    empty_t = spark.createDataFrame([], "clip_id string, transcript string")
    ref = spark.createDataFrame([], ddl)
    cfg = RunConfig(run_id="sq", out_dir=out, enabled_checks=("audio_quality",))
    stream_validate(spark, src, empty_t, ref, out, run_id="sq", cfg=cfg)
    got = spark.read.parquet(f"{out}/violations_stream").collect()
    assert [(r.check_name, r.clip_id) for r in got] == [("audio_quality", "s0")]


def test_fingerprint_shuffle_carries_no_payload(dup_clips):
    """Scale property: payload bytes are consumed inside the scan->decode
    stage; every exchange in the candidate plan moves only id/band/sig
    rows."""
    from llm_drift_detector_spark.audioops import (
        audio_fingerprints,
        fingerprint_candidates,
    )

    plan = (
        fingerprint_candidates(audio_fingerprints(dup_clips))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "payload" not in line and "bytes" not in line


def test_near_dup_fetch_pushes_ids_into_scan(spark, dup_clips, tmp_path):
    """The pair-verify payload fetch must reach the parquet scan as a
    pushed In(clip_id, ...) filter (row-group pruning), mirroring the
    validator's targeted fetch."""
    from llm_drift_detector_spark.audioops import verify_pairs_pcm

    path = str(tmp_path / "clips_pq")
    dup_clips.write.parquet(path)
    clips = spark.read.parquet(path)
    forced = spark.createDataFrame(
        [("a0", "a3"), ("a1", "a4")], "id_a string, id_b string"
    )
    plan = (
        verify_pairs_pcm(forced, clips)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:300]
    assert "clip_id" in pushed and ("In(" in pushed or "in(" in pushed)


def test_mega_bucket_salting_bounds_audio_pairs(spark):
    """1000 identical silent clips -> one all-zero-signature bucket per
    band; the cap must keep candidate pairs ~n*cap/2, not n^2/2."""
    from llm_drift_detector_spark.audioops import (
        audio_fingerprints,
        fingerprint_candidates,
    )

    silent = np.zeros(SR // 4, dtype=np.float32)
    rows = [_row(f"s{i:04d}", silent, "pcm_s16le") for i in range(600)]
    df = spark.createDataFrame(rows, CLIPS_DDL)
    fp = audio_fingerprints(df).persist()
    capped = fingerprint_candidates(
        fp, max_bucket_size=20, min_band_matches=1
    ).count()
    # uncapped: C(600,2) = 179,700 distinct pairs; capped: <= 8 bands x
    # 30 sub-buckets x C(20,2) = 45,600 (less after cross-band overlap)
    assert 0 < capped <= 46_000
    # AND-OR amplification: requiring >=2 matching (salted) bands cuts
    # the mega-bucket candidates by roughly another order of magnitude
    amplified = fingerprint_candidates(fp, max_bucket_size=20).count()
    assert 0 < amplified < capped / 4
    fp.unpersist()


def test_identical_clips_survive_mega_bucket_salting(spark):
    """200 identical clips with a tiny bucket cap: banded candidates
    alone would scatter them across per-band sub-buckets (>=2-band rule
    then drops most pairs), but the identical-signature star pairs must
    still collapse ALL of them into one cluster."""
    from llm_drift_detector_spark.audioops import audio_duplicate_pairs
    from llm_drift_detector_spark.textops import duplicate_clusters

    from llm_drift_detector_spark.audioops import (
        audio_fingerprints,
        fingerprint_identical_pairs,
    )

    pcm = make_pcm(23, 0, SR, SR // 4)
    rows = [_row(f"d{i:03d}", pcm, "pcm_s16le") for i in range(200)]
    clips = spark.createDataFrame(rows, CLIPS_DDL)
    # the star pairs alone give DETERMINISTIC one-component connectivity
    # (banded pairs under salting only connect probabilistically)
    stars = fingerprint_identical_pairs(audio_fingerprints(clips)).collect()
    assert len(stars) == 199 and all(r.id_a == "d000" for r in stars)
    pairs = audio_duplicate_pairs(clips, max_bucket_size=10)
    labels = {r.id: r.cluster_id for r in duplicate_clusters(pairs).collect()}
    assert len(labels) == 200
    assert set(labels.values()) == {"d000"}


def test_best_offset_corr_exact_slice():
    """Numpy oracle: a verbatim slice correlates at 1.0 with lag equal
    to the trim offset; an unrelated signal stays low at every lag."""
    from llm_drift_detector_spark.audioops.containment import _best_offset_corr

    x = make_pcm(61, 0, SR, 2 * SR).astype(np.float64)
    delta = 3137
    y = x[delta : delta + int(1.2 * SR)]
    corr, lag, overlap = _best_offset_corr(x, y, int(0.25 * SR))
    assert corr == pytest.approx(1.0, abs=1e-9)
    assert lag == delta and overlap == len(y)
    z = make_pcm(62, 0, SR, SR).astype(np.float64)
    corr2, _, _ = _best_offset_corr(x, z, int(0.25 * SR))
    assert corr2 < 0.5


def test_containment_finds_trimmed_reencoded_copy(spark):
    """A copy trimmed at an ARBITRARY sample offset, re-gained and
    re-encoded (opus), is found with the correct lag; unrelated clips
    produce no verified pairs."""
    from llm_drift_detector_spark.audioops import audio_containment_pairs

    delta = 4057  # deliberately not a multiple of any window/hop size
    base = make_pcm(63, 0, SR, 2 * SR)
    segment = (0.6 * base[delta : delta + int(1.2 * SR)]).astype(np.float32)
    rows = [
        _row("orig", base, "pcm_s16le"),
        _row("trim", segment, "opus"),
    ] + [_row(f"u{i}", make_pcm(64, i, SR, 2 * SR), "pcm_s16le") for i in range(8)]
    clips = spark.createDataFrame(rows, CLIPS_DDL)
    got = audio_containment_pairs(clips).collect()
    assert len(got) == 1
    r = got[0]
    assert {r.id_a, r.id_b} == {"orig", "trim"}
    assert r.corr > 0.95  # opus companding noise keeps it just below 1
    assert abs(abs(r.lag_samples) - delta) <= 2
    assert r.overlap_s == pytest.approx(1.2, abs=0.01)


def test_cross_modal_duplicate_relations(spark):
    """both / audio_only / text_only relations over a crafted corpus:
    same recording + same transcript -> both; same recording with a
    different transcript -> audio_only (transcription QA); same
    transcript re-read as different audio -> text_only (keep)."""
    from llm_drift_detector_spark.audioops import cross_modal_duplicate_pairs

    pcm1 = make_pcm(71, 0, SR, SR)
    pcm2 = make_pcm(71, 1, SR, SR)
    t1 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "completely different sentence with other words entirely spoken here"
    ddl = CLIPS_DDL + ", transcript string"
    rows = [
        _row("b0", pcm1, "pcm_s16le") + (t1,),
        _row("b1", pcm1, "flac") + (t1,),          # both: same audio+text
        _row("a1", (0.5 * pcm1).astype(np.float32), "pcm_s16le") + (t2,),  # audio_only
        _row("t1", pcm2, "pcm_s16le") + (t1,),     # text_only vs b0/b1
    ]
    clips = spark.createDataFrame(rows, ddl)
    got = {
        (r.id_a, r.id_b): r.relation
        for r in cross_modal_duplicate_pairs(clips).collect()
    }
    assert got[("b0", "b1")] == "both"
    assert got[("a1", "b0")] == "audio_only" and got[("a1", "b1")] == "audio_only"
    assert got[("b0", "t1")] == "text_only" and got[("b1", "t1")] == "text_only"
    # audio_only pairs never involve t1's different recording
    assert ("a1", "t1") not in got


def test_containment_matches_across_sample_rates(spark):
    """The same recording stored at 16 kHz and as a decimated 8 kHz copy:
    absolute-Hz signatures collide by design, and the verifier must
    resample instead of rejecting the pair for comparing raw streams in
    different timebases."""
    from llm_drift_detector_spark.audioops import audio_containment_pairs

    base = make_pcm(67, 0, SR, 2 * SR)          # f < 0.4*16k < 4 kHz
    low = base[::2].copy()                       # clean 8 kHz decimation
    rows = [
        _row("hi16", base, "pcm_s16le", sr=SR),
        _row("lo8", (0.8 * low).astype(np.float32), "pcm_s16le", sr=SR // 2),
    ] + [_row(f"u{i}", make_pcm(68, i, SR, 2 * SR), "pcm_s16le") for i in range(5)]
    clips = spark.createDataFrame(rows, CLIPS_DDL)
    got = audio_containment_pairs(clips).collect()
    assert len(got) == 1
    r = got[0]
    assert {r.id_a, r.id_b} == {"hi16", "lo8"}
    assert r.corr > 0.9
    assert r.overlap_s == pytest.approx(2.0, abs=0.05)


def test_audio_topk_rejects_mismatched_stored_fingerprints(spark, dup_clips):
    """ADVICE r3: a stored fingerprint frame built with different bands
    must raise, not silently return zero/garbage candidates."""
    from llm_drift_detector_spark.audioops import audio_topk
    from llm_drift_detector_spark.audioops.dedup import audio_fingerprints

    stored = audio_fingerprints(dup_clips, bands=4)
    base = make_pcm(7, 0, SR, SR)
    query = codecs.encode((0.7 * base).astype(np.float32), "opus")
    with pytest.raises(ValueError, match="band range"):
        audio_topk(dup_clips, query, "opus", bands=8, fingerprints=stored)
    # matching geometry passes through: an exact-payload query (its
    # fingerprint is bit-identical to the stored a0 sigs at ANY band
    # count) retrieves the recording.  (The re-encoded query needs the
    # finer 8-band split to survive mu-law sign flips — with 4 bands a
    # single flipped frame kills a whole band sig, which is exactly why
    # geometry mismatches must raise instead of degrading silently.)
    exact = codecs.encode(base, "pcm_s16le")
    got = audio_topk(
        dup_clips, exact, "pcm_s16le", bands=4, min_corr=0.9, fingerprints=stored
    ).collect()
    assert "a0" in {r.clip_id for r in got}


def test_checkpointed_dedup_resumes_without_recomputing_fingerprints(
    spark, dup_clips, tmp_path
):
    """VERDICT r3 #6: a run killed after the fingerprint stage commits
    must NOT replay the decode pass on resume.  Proof: after stage 1
    commits, resume with a clips frame whose payloads are GARBAGE — if
    fingerprints were recomputed the candidates would change/vanish;
    instead the stored stage drives candidate generation unchanged.
    (Verification still reads real payloads, so the final pairs from
    the intact frame are identical to the uncheckpointed baseline.)"""
    from llm_drift_detector_spark.audioops import (
        audio_duplicate_pairs,
        audio_duplicate_pairs_checkpointed,
    )

    ckpt = str(tmp_path / "ckpt")
    baseline = {
        (r.id_a, r.id_b)
        for r in audio_duplicate_pairs(dup_clips).collect()
    }

    # full checkpointed run: commits fingerprints/ + candidates/
    got = {
        (r.id_a, r.id_b)
        for r in audio_duplicate_pairs_checkpointed(
            spark, dup_clips, ckpt, run_id="r1"
        ).collect()
    }
    assert got == baseline
    import os

    assert os.path.exists(f"{ckpt}/run=r1/fingerprints/_SUCCESS")
    assert os.path.exists(f"{ckpt}/run=r1/candidates/_SUCCESS")

    # re-entry on the same run_id: identical result, stages read back
    # from the checkpoint
    poisoned = dup_clips.withColumn("bytes", F.expr("CAST('xx' AS BINARY)"))
    resumed = {
        (r.id_a, r.id_b)
        for r in audio_duplicate_pairs_checkpointed(
            spark,
            dup_clips,  # verification needs real payloads
            ckpt,
            run_id="r1",
        ).collect()
    }
    assert resumed == baseline

    # fingerprint stage is truly not re-run: poisoned payloads + same
    # run_id still yield the same CANDIDATES (stage 2 reads stage 1's
    # parquet); only verification (which reads the poisoned bytes)
    # rejects them.
    cand_before = spark.read.parquet(f"{ckpt}/run=r1/candidates").count()
    _ = audio_duplicate_pairs_checkpointed(
        spark, poisoned, ckpt, run_id="r1"
    ).collect()
    cand_after = spark.read.parquet(f"{ckpt}/run=r1/candidates").count()
    assert cand_before == cand_after and cand_before > 0

    # a fresh run_id with poisoned payloads DOES recompute -> no pairs
    fresh = audio_duplicate_pairs_checkpointed(
        spark, poisoned, ckpt, run_id="r2"
    ).collect()
    assert fresh == []


def test_multiresolution_recovers_subwindow_trim(spark):
    """VERDICT r3 #7: a planted trim SHORTER than the base 250 ms window
    is invisible at max_scales=1 but recovered at max_scales=2 (the
    source emits the finer scale's sigs too, so the short copy collides
    at its own scale), with the exact lag."""
    from llm_drift_detector_spark.audioops import audio_containment_pairs

    delta = 2251
    base = make_pcm(81, 0, SR, 2 * SR)
    # 150 ms slice: shorter than 250 ms (scale 0), longer than 125 ms
    # (scale 1); re-gained
    seg = (0.7 * base[delta : delta + int(0.15 * SR)]).astype(np.float32)
    rows = [
        _row("orig", base, "pcm_s16le"),
        _row("short_trim", seg, "pcm_s16le"),
    ] + [_row(f"u{i}", make_pcm(82, i, SR, 2 * SR), "pcm_s16le") for i in range(6)]
    clips = spark.createDataFrame(rows, CLIPS_DDL)

    blind = audio_containment_pairs(clips, min_overlap_s=0.1).collect()
    assert not any({r.id_a, r.id_b} == {"orig", "short_trim"} for r in blind)

    got = audio_containment_pairs(clips, min_overlap_s=0.1, max_scales=2).collect()
    hits = [r for r in got if {r.id_a, r.id_b} == {"orig", "short_trim"}]
    assert len(hits) == 1
    r = hits[0]
    assert r.corr > 0.999 and abs(abs(r.lag_samples) - delta) <= 2
    assert r.overlap_s == pytest.approx(0.15, abs=0.01)


def test_containment_coverage_metric(spark):
    """The native coverage probe reports the sub-window population at
    each geometry — the skipped tail is an explicit metric."""
    from llm_drift_detector_spark.audioops import containment_coverage

    rows = [
        _row("long", make_pcm(91, 0, SR, SR), "pcm_s16le"),            # 1 s
        _row("mid", make_pcm(91, 1, SR, int(0.15 * SR)), "pcm_s16le"),  # 150 ms
        _row("tiny", make_pcm(91, 2, SR, int(0.05 * SR)), "pcm_s16le"), # 50 ms
    ]
    clips = spark.createDataFrame(rows, CLIPS_DDL)
    c1 = containment_coverage(clips, max_scales=1).collect()[0]
    assert (c1.clips, c1.covered, c1.short_clips_skipped) == (3, 1, 2)
    c2 = containment_coverage(clips, max_scales=2).collect()[0]
    assert (c2.covered, c2.short_clips_skipped) == (2, 1)
    c3 = containment_coverage(clips, max_scales=3).collect()[0]
    assert c3.covered == 2  # 62.5 ms window still misses the 50 ms clip
    c4 = containment_coverage(clips, max_scales=4).collect()[0]
    assert c4.covered == 3 and c4.coverage == 1.0
    # review r4: an over-deep ladder (finest scale below the 16-sample
    # floor) must NOT zero the probe — coarser scales still cover, and
    # the kernel still emits for them (probe mirrors kernel geometry)
    lo_sr = spark.createDataFrame(
        [_row("low", make_pcm(91, 3, 8000, 8000), "pcm_s16le", sr=8000)],
        CLIPS_DDL,
    )
    c8 = containment_coverage(lo_sr, max_scales=8).collect()[0]
    assert c8.covered == 1 and c8.short_clips_skipped == 0


def test_band_partitioned_fingerprint_index_prunes_and_matches(
    spark, dup_clips, tmp_path
):
    """audio_build_fingerprint_index stores sigs partitioned by band:
    the query's (band, band_sig) literals prune to the query's
    partitions (PartitionFilters), and retrieval through the stored
    index equals the on-the-fly path."""
    from llm_drift_detector_spark.audioops import (
        audio_build_fingerprint_index,
        audio_topk,
    )

    idx = str(tmp_path / "fpidx")
    audio_build_fingerprint_index(dup_clips, idx)
    stored = spark.read.parquet(idx)
    assert dict(stored.dtypes)["band"] == "int"

    # partition pruning: an OR of (band, band_sig) conjunctions lands
    # band constraints in PartitionFilters, not a full-index scan
    probe = stored.where(
        ((F.col("band") == 0) & (F.col("band_sig") == "0"))
        | ((F.col("band") == 3) & (F.col("band_sig") == "f"))
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # PartitionFilters: [((band = 0) OR (band = 3))] — band constraints
    # prune partitions; band_sig equality pushes into the parquet scan
    part = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert "band" in part and "band_sig" not in part
    assert "PushedFilters" in plan and "band_sig" in plan.split("PushedFilters")[1][:200]

    base = make_pcm(7, 0, SR, SR)
    query = codecs.encode((0.7 * base).astype(np.float32), "opus")
    via_index = {
        (r.clip_id, r.bands_matched)
        for r in audio_topk(
            dup_clips, query, "opus", min_corr=0.9, fingerprints=stored
        ).collect()
    }
    fresh = {
        (r.clip_id, r.bands_matched)
        for r in audio_topk(dup_clips, query, "opus", min_corr=0.9).collect()
    }
    assert via_index == fresh and {c for c, _ in via_index} == {
        "a0", "a1", "a2", "a3", "a4"
    }


def test_dedup_cli_checkpoint_resume(spark, dup_clips, tmp_path, capsys):
    """jobs/dedup_audio.py --checkpoint-dir: the CLI commits stage
    checkpoints, and a rerun (resume) reuses them — identical pairs,
    fingerprints not rebuilt (directory mtime unchanged)."""
    import json
    import os
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import dedup_audio

    src = str(tmp_path / "clips")
    dup_clips.write.parquet(src)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    args = [
        "--clips", src, "--out", out,
        "--checkpoint-dir", ckpt, "--run-id", "cli1",
    ]
    assert dedup_audio.main(args) == 0
    s1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s1["pairs"] > 0
    fp_success = f"{ckpt}/run=cli1/fingerprints/_SUCCESS"
    assert os.path.exists(fp_success)
    mtime = os.path.getmtime(fp_success)

    assert dedup_audio.main(args) == 0
    s2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s2["pairs"] == s1["pairs"] and s2["cluster_members"] == s1["cluster_members"]
    assert os.path.getmtime(fp_success) == mtime  # stage not rebuilt
