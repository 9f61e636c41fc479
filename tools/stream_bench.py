"""Streaming monitor throughput/latency bench (VERDICT r4 #7).

Drains the sf0.1 synthetic clips backlog (32 parquet part-files,
600k clips) through the three streaming operators in AvailableNow mode
with ``maxFilesPerTrigger=2`` (16 micro-batches — >= 10 triggers as the
brief requires) and reports, per stream:

- rows/sec over the whole drain (wall clock from query start to
  termination, measured around awaitTermination);
- the per-trigger latency distribution (min / median / max of
  ``triggerExecution`` from the query's progress events);
- for the Bloom-state dedup stream, the state-store footprint over the
  drain (``stateOperators.memoryUsedBytes`` first/last/max) — the
  FIXED-size property is the point: the last trigger's state must not
  exceed the configured bloom geometry.

Streams benched:

1. ``stream_drift``            frozen-profile distribution drift (one
                               aggregate per micro-batch)
2. ``stream_embedding_drift``  frozen-centroid embedding drift (one
                               aggregate per micro-batch, over the
                               transcripts backlog)
3. ``stream_text_drift``       frozen-profile lexical/perplexity text
                               drift (one fused action per micro-batch,
                               over the transcripts backlog)
4. ``stream_validate``         batch-local validation checks + sinks
5. ``streaming_duplicate_clips`` (bloom) cross-batch payload dedup via
                               applyInPandasWithState

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/stream_bench.py
Prints one JSON line; paste the table into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def _trigger_stats(progresses) -> dict:
    durs = [
        p["durationMs"].get("triggerExecution", 0)
        for p in progresses
        if p.get("numInputRows", 0) > 0
    ]
    rows = sum(p.get("numInputRows", 0) for p in progresses)
    return {
        "triggers": len(durs),
        "rows": int(rows),
        "trigger_ms_min": int(min(durs)) if durs else 0,
        "trigger_ms_p50": int(np.median(durs)) if durs else 0,
        "trigger_ms_max": int(max(durs)) if durs else 0,
    }


def _progress_list(q):
    return [
        json.loads(p) if isinstance(p, str) else p for p in q.recentProgress
    ]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    files_per_trigger = int(os.environ.get("STREAM_BENCH_FILES_PER_TRIGGER", "2"))
    if "SPARK_GRAFT_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/spark-scratch"

    from llm_drift_detector_spark.session import get_spark
    from llm_drift_detector_spark.streaming import (
        embedding_reference_profile,
        reference_profile,
        stream_drift,
        stream_embedding_drift,
        stream_text_drift,
        stream_validate,
        streaming_duplicate_clips,
        text_reference_profile,
    )
    from llm_drift_detector_spark.streaming.validate_stream import CLIPS_DDL
    from llm_drift_detector_spark.synth import ensure_synth

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    root = ensure_synth(spark, sf_dir)
    clips_dir = os.path.join(root, "clips")
    tr_dir = os.path.join(root, "transcripts")
    ref = spark.read.parquet(os.path.join(root, "clips_reference"))
    tr_ref = spark.read.parquet(os.path.join(root, "transcripts_reference"))
    transcripts = spark.read.parquet(tr_dir)
    n_clips = spark.read.parquet(clips_dir).count()

    scratch = tempfile.mkdtemp(prefix="stream_bench_", dir="/dev/shm")
    results: dict[str, dict] = {}

    # ---- 1. distribution drift stream --------------------------------
    prof = reference_profile(ref, "dur_ms")
    t0 = time.time()
    q = stream_drift(
        spark, clips_dir, prof, f"{scratch}/drift", schema=CLIPS_DDL,
        max_files_per_trigger=files_per_trigger,
    )
    wall = time.time() - t0
    st = _trigger_stats(_progress_list(q))
    results["stream_drift"] = {
        **st, "wall_s": round(wall, 2),
        "rows_per_sec": int(st["rows"] / wall) if wall else 0,
    }

    # ---- 1b. fused multi-column drift stream -------------------------
    # four features (two metadata columns + two no-decode payload
    # expressions) through ONE aggregate per micro-batch; the point of
    # comparison is stream_drift above — N columns should cost ~one
    # stream's drain, not N drains
    from llm_drift_detector_spark.streaming import (
        reference_profile_multi,
        stream_drift_multi,
    )

    mcols = ["dur_ms", "sr_hz", "length(bytes)", "length(transcript)"]
    mprof = reference_profile_multi(ref, mcols)
    t0 = time.time()
    q = stream_drift_multi(
        spark, clips_dir, mprof, f"{scratch}/mdrift", schema=CLIPS_DDL,
        max_files_per_trigger=files_per_trigger,
    )
    wall = time.time() - t0
    st = _trigger_stats(_progress_list(q))
    results["stream_drift_multi_4col"] = {
        **st, "wall_s": round(wall, 2),
        "rows_per_sec": int(st["rows"] / wall) if wall else 0,
        "columns": len(mcols),
        "col_rows_per_sec": (
            int(len(mcols) * st["rows"] / wall) if wall else 0
        ),
    }

    # ---- 1c. full G x N matrix stream (groups x columns) -------------
    from llm_drift_detector_spark.streaming import (
        reference_profile_multi_grouped,
        stream_drift_multi_grouped,
    )

    mgprof = reference_profile_multi_grouped(ref, ["codec"], mcols)
    n_groups = len(mgprof["profiles"])
    t0 = time.time()
    q = stream_drift_multi_grouped(
        spark, clips_dir, mgprof, f"{scratch}/mgdrift", schema=CLIPS_DDL,
        max_files_per_trigger=files_per_trigger,
    )
    wall = time.time() - t0
    st = _trigger_stats(_progress_list(q))
    results["stream_drift_multi_grouped"] = {
        **st, "wall_s": round(wall, 2),
        "rows_per_sec": int(st["rows"] / wall) if wall else 0,
        "columns": len(mcols),
        "groups": n_groups,
        "cell_rows_per_sec": (
            int(len(mcols) * st["rows"] / wall) if wall else 0
        ),
    }

    # ---- 1d. event-time windowed drift ---------------------------------
    # the clips table carries no event time; derive a deterministic one
    # spanning ~8 hours (16 windows of 30 min) and — crucially — write
    # the source files IN EVENT-TIME ORDER (one file per window,
    # sequential writes: maxFilesPerTrigger consumes files by mod-time,
    # so arrival order tracks event order like a real ingest).  A
    # hash-ordered copy would put near-max timestamps in batch 0, jump
    # the watermark to the end, and drop ~94% of the backlog as
    # too-late — a drain that "finishes fast" by not doing the work.
    # Columns pruned to what the stream scans: payload bytes never copy.
    import pyspark.sql.functions as F

    from llm_drift_detector_spark.streaming import stream_drift_windowed

    wsrc = f"{scratch}/windowed_src"
    ts_expr = F.timestamp_seconds(
        F.lit(1_700_000_000) + (F.abs(F.xxhash64("clip_id")) % 28_800)
    )
    wbase = (
        spark.read.parquet(clips_dir)
        .select("clip_id", "dur_ms", ts_expr.alias("ts"))
    )
    for wi in range(16):
        lo, hi = 1_700_000_000 + wi * 1800, 1_700_000_000 + (wi + 1) * 1800
        (
            wbase.where(
                (F.col("ts") >= F.timestamp_seconds(F.lit(lo)))
                & (F.col("ts") < F.timestamp_seconds(F.lit(hi)))
            )
            .coalesce(2)
            .write.parquet(f"{wsrc}/f{wi:02d}")
        )
        time.sleep(0.05)  # distinct mtimes -> deterministic file order
    wschema = spark.read.parquet(wsrc + "/f*").schema
    n_wrows = spark.read.parquet(wsrc + "/f*").count()
    t0 = time.time()
    q = stream_drift_windowed(
        spark, wsrc + "/f*", prof, f"{scratch}/wdrift",
        schema=wschema, ts_col="ts",
        window_duration="30 minutes", watermark_delay="30 minutes",
        max_files_per_trigger=files_per_trigger,
    )
    wall = time.time() - t0
    st = _trigger_stats(_progress_list(q))
    wsink = spark.read.parquet(f"{scratch}/wdrift/drift_metrics_windowed")
    n_windows = wsink.count()
    rows_scored = wsink.agg(F.sum("n")).collect()[0][0] or 0
    results["stream_drift_windowed"] = {
        **st, "wall_s": round(wall, 2),
        "rows_per_sec": int(st["rows"] / wall) if wall else 0,
        "backlog_rows": int(n_wrows),
        "rows_in_finalized_windows": int(rows_scored),
        "finalized_windows": int(n_windows),
    }

    # ---- 2. embedding drift stream (transcripts backlog) -------------
    eprof = embedding_reference_profile(tr_ref, "embedding")
    t0 = time.time()
    q = stream_embedding_drift(
        spark, tr_dir, eprof, f"{scratch}/edrift", schema=transcripts.schema,
        max_files_per_trigger=files_per_trigger,
    )
    wall = time.time() - t0
    st = _trigger_stats(_progress_list(q))
    results["stream_embedding_drift"] = {
        **st, "wall_s": round(wall, 2),
        "rows_per_sec": int(st["rows"] / wall) if wall else 0,
    }

    # ---- 3. text drift stream (transcripts backlog) ------------------
    tprof = text_reference_profile(tr_ref, "transcript")
    t0 = time.time()
    q = stream_text_drift(
        spark, tr_dir, tprof, f"{scratch}/tdrift", schema=transcripts.schema,
        max_files_per_trigger=files_per_trigger,
    )
    wall = time.time() - t0
    st = _trigger_stats(_progress_list(q))
    n_tr = transcripts.count()
    # numInputRows counts every scan of the micro-batch; the fused text
    # plan reads it 4x (vocab join / perplexity / sentence / count
    # subframes), so the honest drain rate is backlog transcripts / wall
    results["stream_text_drift"] = {
        **st, "wall_s": round(wall, 2),
        "rows_per_sec": int(st["rows"] / wall) if wall else 0,
        "transcripts_per_sec_drain": int(n_tr / wall) if wall else 0,
    }

    # ---- 4. validation stream ----------------------------------------
    t0 = time.time()
    q = stream_validate(
        spark, clips_dir, transcripts, ref, f"{scratch}/validate",
        run_id="bench", max_files_per_trigger=files_per_trigger,
    )
    wall = time.time() - t0
    st = _trigger_stats(_progress_list(q))
    # numInputRows here counts EVERY source scan the per-batch checks
    # union in (clips + transcript/reference joins re-read per trigger),
    # so the honest drain rate is backlog clips / wall, reported
    # separately from the raw input-row volume
    results["stream_validate"] = {
        **st, "wall_s": round(wall, 2),
        "rows_per_sec": int(st["rows"] / wall) if wall else 0,
        "clips_per_sec_drain": int(n_clips / wall) if wall else 0,
    }

    # ---- 5. bloom-state cross-batch dedup ----------------------------
    stream = (
        spark.readStream.schema(CLIPS_DDL)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(clips_dir)
    )
    flagged = streaming_duplicate_clips(
        stream, key_col="bytes", id_col="clip_id", state_mode="bloom",
        n_state_buckets=512, bloom_capacity_per_bucket=100_000, bloom_fpp=0.01,
    )
    t0 = time.time()
    q = (
        flagged.writeStream.format("parquet")
        .option("path", f"{scratch}/dedup/out")
        .option("checkpointLocation", f"{scratch}/dedup/cp")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.time() - t0
    progresses = _progress_list(q)
    st = _trigger_stats(progresses)
    state_bytes = [
        op.get("memoryUsedBytes", 0)
        for p in progresses
        for op in p.get("stateOperators", [])
        if p.get("numInputRows", 0) > 0
    ]
    dup_rows = spark.read.parquet(f"{scratch}/dedup/out").count()
    results["streaming_dedup_bloom"] = {
        **st, "wall_s": round(wall, 2),
        "rows_per_sec": int(st["rows"] / wall) if wall else 0,
        "flagged_duplicates": int(dup_rows),
        "state_bytes_first": int(state_bytes[0]) if state_bytes else 0,
        "state_bytes_last": int(state_bytes[-1]) if state_bytes else 0,
        "state_bytes_max": int(max(state_bytes)) if state_bytes else 0,
    }

    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps({
        "metric": "streaming monitor drain throughput",
        "sf_dir": sf_dir,
        "clips": int(n_clips),
        "cpus": cpus,
        "files_per_trigger": files_per_trigger,
        "streams": results,
    }))


if __name__ == "__main__":
    main()
