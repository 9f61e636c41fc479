"""Per-component isolation bench + plan capture for the round-6 optimization pass.

Times each bench.py query AND each sub-check of validate_full in isolation
with the noop sink (guide §1.4) so we see where validate_full's seconds go,
and writes .explain("formatted") for every bench query to plans/r06/.

Usage:
  python tools/bench_components.py [--plans-only] [--tag before|after]

Never imported by bench.py; bench.py stays the frozen driver contract.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from llm_drift_detector_spark.checks import profile  # noqa: E402
from llm_drift_detector_spark.checks.audio import (  # noqa: E402
    audio_invariant_violations,
    transcript_mismatches,
)
from llm_drift_detector_spark.checks.domain import domain_violations  # noqa: E402
from llm_drift_detector_spark.checks.referential import orphans  # noqa: E402
from llm_drift_detector_spark.checks.uniqueness import duplicate_keys  # noqa: E402
from llm_drift_detector_spark.config import (  # noqa: E402
    CODEC_WHITELIST,
    SKETCH,
    SR_HZ_DOMAIN,
)
from llm_drift_detector_spark.drift import (  # noqa: E402
    centroid_cosine_frame,
    grouped_distribution_drift_binned,
    js_psi_frame,
    ks_frame,
    psi_frame,
    tag_windows,
    vocab_difference_frame,
)
from llm_drift_detector_spark.pipeline import violations_frame  # noqa: E402
from llm_drift_detector_spark.session import get_spark  # noqa: E402
from llm_drift_detector_spark.synth import ensure_synth  # noqa: E402
from llm_drift_detector_spark.synth.clips import EMBED_DIM  # noqa: E402


def main() -> None:
    plans_only = "--plans-only" in sys.argv
    tag = "after" if "after" in sys.argv else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if "SPARK_GRAFT_LOCAL_DIR" not in os.environ and os.path.isdir("/dev/shm"):
        os.environ["SPARK_GRAFT_LOCAL_DIR"] = "/dev/shm/spark-scratch"
    spark = get_spark(
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 16),
        app_name="bench-components",
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = ensure_synth(spark, sf_dir, partitions=cpus)
    clips = spark.read.parquet(f"{root}/clips")
    tr = spark.read.parquet(f"{root}/transcripts")
    ref = spark.read.parquet(f"{root}/clips_reference")
    tr_ref = spark.read.parquet(f"{root}/transcripts_reference")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    if not plans_only:
        # warm page cache + python workers, same as bench.py
        for df, col in ((clips, "bytes"), (ref, "bytes")):
            df.select(F.sum(F.length(col))).collect()
        for df in (tr, tr_ref):
            df.select(F.sum(F.length("transcript"))).collect()
        violations_frame(
            clips.limit(4 * cpus), tr.limit(4 * cpus), ref.limit(4 * cpus)
        ).groupBy("check_name").count().collect()

    # ---- the bench queries as (name, frame-builder) ----------------------
    benches = {
        "validate_full": lambda: violations_frame(clips, tr, ref)
        .groupBy("check_name")
        .count(),
        "stats_profile": lambda: profile(clips, ["sr_hz", "dur_ms"], SKETCH),
        "js_psi_js": lambda: js_psi_frame(ref.select("dur_ms"), clips.select("dur_ms"), "dur_ms"),
        "js_psi_psi": lambda: psi_frame(
            ref.select("dur_ms"), clips.select("dur_ms"), "dur_ms", mode=SKETCH
        ),
        "grouped_drift": lambda: grouped_distribution_drift_binned(
            tag_windows(ref.select("codec", "dur_ms"), clips.select("codec", "dur_ms")),
            ["codec"],
            "dur_ms",
        ),
        "ks_exact": lambda: ks_frame(
            events.where(F.col("event_type") == "view").select("value"),
            events.where(F.col("event_type") != "view").select("value"),
            "value",
        ),
        "embedding": lambda: centroid_cosine_frame(
            tr_ref.select("embedding"), tr.select("embedding"), "embedding", EMBED_DIM
        ),
        "lexical": lambda: vocab_difference_frame(
            tr_ref.select("transcript"), tr.select("transcript"), "transcript"
        ),
    }

    # ---- sub-checks of validate_full, isolated ---------------------------
    components = {
        "vf_uniqueness": lambda: duplicate_keys(clips),
        "vf_sr_domain": lambda: domain_violations(clips, "sr_hz", SR_HZ_DOMAIN),
        "vf_codec_whitelist": lambda: domain_violations(clips, "codec", CODEC_WHITELIST),
        "vf_clip_orphans": lambda: orphans(clips, tr),
        "vf_transcript_orphans": lambda: orphans(tr, clips),
        "vf_transcript_equality": lambda: transcript_mismatches(clips, tr),
        "vf_audio_invariants": lambda: audio_invariant_violations(clips, ref),
    }

    if plans_only:
        # plan capture only on explicit request — a timing run must never
        # silently overwrite the committed before/after plan snapshots
        plans_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r06"
        )
        os.makedirs(plans_dir, exist_ok=True)
        for name, build in benches.items():
            df = build()
            with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        print(f"plans written to {plans_dir} ({tag})", file=sys.stderr)
        spark.stop()
        return

    def time_noop(build, passes=3):
        xs = []
        for _ in range(passes + 1):
            t0 = time.time()
            build().write.format("noop").mode("overwrite").save()
            xs.append(round(time.time() - t0, 3))
        warm = sorted(xs[1:])
        return {"cold": xs[0], "median": warm[len(warm) // 2], "spread": [warm[0], warm[-1]]}

    out = {}
    for name, build in {**benches, **components}.items():
        spark.sparkContext.setJobDescription(f"component:{name}")
        out[name] = time_noop(build)
        print(name, out[name], file=sys.stderr)
    spark.sparkContext.setJobDescription(None)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
