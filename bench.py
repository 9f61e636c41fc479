"""Benchmark harness — one JSON line to stdout.

Runs the engine's headline jobs at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]:

  validate_full   all 8 checks incl. the mapInPandas audio decoder over
                  the synthetic clips table (the north-rule job; the
                  reported clips_per_sec derives from this)
  stats_profile   per-column stats sketch over clips
  js_psi          JS + PSI, clips dur_ms vs reference window
  ks_exact        exact two-sample KS over events.value
  embedding       centroid-cosine drift over transcript embeddings
  lexical         vocabulary difference over transcripts

Output: {"metric": "...", "value": <total sec>, "unit": "sec",
         "queries": {name: sec}, "sf": ..., "clips_per_sec": ...}

The two-cluster-size scaling evidence (local[8] vs local[32]) lives in
tools/scaling_bench.py -> BENCH/BASELINE.md; this file is the per-round
driver hook and uses ONE parallelism level.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from llm_drift_detector_spark.drift import (  # noqa: E402
    centroid_cosine_frame,
    grouped_distribution_drift_binned,
    js_psi_frame,
    ks_frame,
    psi_frame,
    tag_windows,
    vocab_difference_frame,
)
from llm_drift_detector_spark.checks import profile  # noqa: E402
from llm_drift_detector_spark.config import SKETCH  # noqa: E402
from llm_drift_detector_spark.pipeline import violations_frame  # noqa: E402
from llm_drift_detector_spark.session import get_spark  # noqa: E402
from llm_drift_detector_spark.synth import ensure_synth  # noqa: E402
from llm_drift_detector_spark.synth.clips import EMBED_DIM  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # shuffle scratch on tmpfs: the sandbox VM's lone disk stalls
    # alternate passes with writeback (BENCH/BASELINE.md methodology);
    # a real cluster has per-node disks, so disk-backed scratch here
    # measures the box, not the plan.  Override/disable via env.
    if "SPARK_GRAFT_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/spark-scratch"
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        app_name="llm-drift-bench",
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = ensure_synth(spark, sf_dir, partitions=cpus)
    clips = spark.read.parquet(f"{root}/clips")
    tr = spark.read.parquet(f"{root}/transcripts")
    ref = spark.read.parquet(f"{root}/clips_reference")
    tr_ref = spark.read.parquet(f"{root}/transcripts_reference")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    n_clips = clips.count()

    # One-time ENVIRONMENT setup, kept out of every timed region (r2's
    # "cold 46 s vs warm 10 s" was mostly this, not the engine):
    # 1. page-cache the payload/text columns — the sandbox's lone VM
    #    disk otherwise bills its first full sequential read to the
    #    first timed pass (a real cluster reads from many spindles /
    #    object-store connections);
    # 2. spin up the Python/Arrow worker pool with a tiny decode slice —
    #    worker spawn + Arrow channel init is a per-JVM one-time cost.
    # `queries_cold` below therefore measures ENGINE cold (JIT, codegen,
    # first shuffle), not the box's disk or fork latency.
    for df, col in ((clips, "bytes"), (ref, "bytes")):
        df.select(F.sum(F.length(col))).collect()
    for df in (tr, tr_ref):
        df.select(F.sum(F.length("transcript"))).collect()
    violations_frame(
        clips.limit(4 * cpus), tr.limit(4 * cpus), ref.limit(4 * cpus)
    ).groupBy("check_name").count().collect()

    timings: dict[str, float] = {}
    cold: dict[str, float] = {}

    spread: dict[str, list[float]] = {}

    def run(name, thunk, passes: int = 3):
        # Measured single-pass times on this box are LONG-TAILED: the
        # full validation union job ranges 7-50 s at sf0.1/local[32]
        # across fresh JVMs (GC + stage-scheduling + python-worker churn
        # — see tools/measure_validate.py, BENCH/BASELINE.md), which is
        # how round 1 ended up with three irreconcilable single samples
        # (17.2 / 37.2 / 45.1 s) and a warm-slower-than-cold inversion.
        # So: one warmup pass (JIT, page cache, python workers; reported
        # as `queries_cold`), then the MEDIAN of `passes` measured
        # passes, with min/max spread.  Plans are rebuilt by the thunk
        # each call, so no shuffle-file reuse fakes the number.
        t0 = time.time()
        thunk()
        cold[name] = round(time.time() - t0, 3)
        xs = []
        for _ in range(passes):
            t0 = time.time()
            thunk()
            xs.append(round(time.time() - t0, 3))
        xs.sort()
        timings[name] = xs[len(xs) // 2]
        spread[name] = [xs[0], xs[-1]]

    run(
        "validate_full",
        lambda: violations_frame(clips, tr, ref)
        .groupBy("check_name")
        .count()
        .collect(),
        passes=5,  # the headline number; widest tail, deepest sampling
    )
    run("stats_profile", lambda: profile(clips, ["sr_hz", "dur_ms"], SKETCH).collect())
    run(
        "js_psi",
        lambda: (
            js_psi_frame(ref.select("dur_ms"), clips.select("dur_ms"), "dur_ms").collect(),
            psi_frame(ref.select("dur_ms"), clips.select("dur_ms"), "dur_ms", mode=SKETCH).collect(),
        ),
    )
    run(
        "grouped_drift",
        # per-codec drift (ref vs cur windows) for ALL groups in ONE job —
        # the fully-native binned grouped detector (no Python)
        lambda: grouped_distribution_drift_binned(
            tag_windows(
                ref.select("codec", "dur_ms"), clips.select("codec", "dur_ms")
            ),
            ["codec"],
            "dur_ms",
        ).collect(),
    )
    run(
        "ks_exact",
        lambda: ks_frame(
            events.where(F.col("event_type") == "view").select("value"),
            events.where(F.col("event_type") != "view").select("value"),
            "value",
        ).collect(),
    )
    run(
        "embedding",
        lambda: centroid_cosine_frame(
            tr_ref.select("embedding"), tr.select("embedding"), "embedding", EMBED_DIM
        ).collect(),
    )
    run(
        "lexical",
        lambda: vocab_difference_frame(
            tr_ref.select("transcript"), tr.select("transcript"), "transcript"
        ).collect(),
    )

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "validation+drift suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_cold": cold,
                "queries_spread": spread,
                "sf": float(sf),
                "clips": n_clips,
                "clips_per_sec": round(n_clips / timings["validate_full"], 1),
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
