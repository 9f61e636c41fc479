"""Steady-state measurement for validate_full (VERDICT r1 #3).

Round 1 left three irreconcilable numbers for the same job (17.2 s /
37.2 s / 45.1 s) and a warm-pass-slower-than-cold inversion.  This tool
makes the measurement defensible:

- N independent SAMPLES, each in a FRESH JVM (subprocess), so no page
  cache of shuffle files, JIT state, or Python worker pools leak
  between samples;
- within a sample, PASSES alternating back-to-back (pass1 = cold:
  includes scan-cache warmup; pass2..k = steady-state), each building a
  fresh plan (no shuffle-file reuse);
- the report is per-pass medians with min/max spread across samples.

Usage: python tools/measure_validate.py [n_samples] [passes_per_sample]
Runs ALONE — concurrent Spark jobs corrupt the numbers.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from llm_drift_detector_spark.pipeline import violations_frame
from llm_drift_detector_spark.session import get_spark
from llm_drift_detector_spark.synth import ensure_synth

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
passes = int(sys.argv[1])
spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=max(cpus, 16),
                  app_name="measure-validate")
spark.sparkContext.setLogLevel("ERROR")
root = ensure_synth(spark, sf_dir, partitions=cpus)
clips = spark.read.parquet(f"{root}/clips")
tr = spark.read.parquet(f"{root}/transcripts")
ref = spark.read.parquet(f"{root}/clips_reference")
n = clips.count()
times = []
for _ in range(passes):
    t0 = time.time()
    violations_frame(clips, tr, ref).groupBy("check_name").count().collect()
    times.append(round(time.time() - t0, 3))
print("RESULT " + json.dumps({"passes": times, "clips": n}))
spark.stop()
"""


def main() -> None:
    n_samples = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    samples: list[list[float]] = []
    clips = None
    for i in range(n_samples):
        out = subprocess.run(
            [sys.executable, "-c", _CHILD, str(passes)],
            capture_output=True,
            text=True,
            env={**os.environ, "PYTHONPATH": "/root/repo"},
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(f"sample {i}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        rec = json.loads(line[0][len("RESULT "):])
        samples.append(rec["passes"])
        clips = rec["clips"]
        print(f"sample {i}: passes={rec['passes']}", file=sys.stderr)

    per_pass = list(zip(*samples))
    med = [round(statistics.median(p), 3) for p in per_pass]
    report = {
        "samples": samples,
        "clips": clips,
        "pass_medians": med,
        "cold_median": med[0],
        "steady_median": round(statistics.median([t for s in samples for t in s[1:]]), 3),
        "steady_min": min(t for s in samples for t in s[1:]),
        "steady_max": max(t for s in samples for t in s[1:]),
        "clips_per_sec_steady": round(
            clips / statistics.median([t for s in samples for t in s[1:]]), 1
        ),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
