"""Throughput of the audio-modality dedup path at sf0.1 (600k clips).

Measures three stages separately (median of N fresh-plan passes each,
same protocol as bench.py):

- features: one decode pass -> per-clip PCM features
- fingerprints: decode -> 8x16-bit LSH band signatures (count action)
- near_dup_pairs: full pipeline (fingerprints -> bucket candidates ->
  pair-restricted correlation verify)

Standalone record for BENCH/BASELINE.md — deliberately NOT part of
bench.py's driver suite (the suite total is compared round-over-round;
new keys would skew it).

Usage: python tools/audio_dedup_bench.py [sf_dir] [passes]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-scratch")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from llm_drift_detector_spark.audioops import (
        audio_duplicate_pairs,
        audio_features,
        audio_fingerprints,
    )
    from llm_drift_detector_spark.session import get_spark
    from llm_drift_detector_spark.synth import ensure_synth

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    root = ensure_synth(spark, sf_dir)
    n_clips = spark.read.parquet(f"{root}/clips").count()

    def clips():
        # fresh plan per pass: shuffle-file reuse would fake the timing
        return spark.read.parquet(f"{root}/clips")

    jobs = {
        "features": lambda: audio_features(clips()).count(),
        "fingerprints": lambda: audio_fingerprints(clips()).count(),
        "near_dup_pairs": lambda: audio_duplicate_pairs(clips()).count(),
    }
    out: dict = {"sf_dir": sf_dir, "n_clips": n_clips, "passes": passes}
    for name, job in jobs.items():
        job()  # warm-up (page cache, python workers, codegen)
        times, result = [], None
        for _ in range(passes):
            t0 = time.monotonic()
            result = job()
            times.append(time.monotonic() - t0)
        med = statistics.median(times)
        out[name] = {
            "median_s": round(med, 2),
            "spread_s": [round(min(times), 2), round(max(times), 2)],
            "clips_per_sec": round(n_clips / med),
            "result_rows": result,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
