"""spark-submit entry point: validate a clips table, resumably.

Usage (cluster or local):

    python tools/build_package.py   # -> dist/llm_drift_detector_spark.zip
    spark-submit --py-files dist/llm_drift_detector_spark.zip \
        jobs/validate.py \
        --clips  <path-or-table> --transcripts <path> --reference <path> \
        --out    /path/to/run-output \
        --run-id nightly-2026-08-16 [--buckets 4096] [--groups 64] \
        [--exact] [--snr-mode deep] [--disable-checks snr_allclose]

Re-running with the same --run-id/--out resumes: buckets already
checkpointed are skipped (see pipeline/runner.py).  Inputs may be
parquet paths or catalog tables (``table:<name>`` prefix, e.g. Iceberg).
Prints the run summary as one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(spark, spec: str):
    if spec.startswith("table:"):
        return spark.read.table(spec[len("table:"):])
    return spark.read.parquet(spec)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clips", required=True)
    p.add_argument("--transcripts", required=True)
    p.add_argument("--reference", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--run-id", required=True)
    p.add_argument("--buckets", type=int, default=32)
    p.add_argument("--groups", type=int, default=4)
    p.add_argument("--salt", type=int, default=0)
    p.add_argument(
        "--exact", action="store_true",
        help="exact stats mode (single-task sort KS / full percentile); "
        "default is the sketch mode — the 10^12-row path",
    )
    p.add_argument("--sketch", action="store_true", help="(default; kept for compat)")
    p.add_argument("--snr-mode", default="hash_shortcut", choices=("hash_shortcut", "deep"))
    p.add_argument("--drift-columns", default="dur_ms")
    p.add_argument(
        "--drift-group-keys",
        default="",
        help="comma list of key columns; when set, per-group drift "
        "(all groups, one job per column) lands in the metrics table",
    )
    p.add_argument("--enable-checks", default="", help="comma list; empty = all")
    p.add_argument("--disable-checks", default="", help="comma list; wins over enable")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from llm_drift_detector_spark.config import EXACT, SKETCH
    from llm_drift_detector_spark.pipeline import RunConfig, run_validation

    # under spark-submit the session/master comes from the launcher
    spark = SparkSession.builder.appName(f"validate-{args.run_id}").getOrCreate()
    cfg = RunConfig(
        run_id=args.run_id,
        out_dir=args.out,
        n_buckets=args.buckets,
        groups=args.groups,
        mode=EXACT if args.exact else SKETCH,
        drift_columns=tuple(c for c in args.drift_columns.split(",") if c),
        salt=args.salt,
        snr_mode=args.snr_mode,
        enabled_checks=tuple(c for c in args.enable_checks.split(",") if c) or None,
        disabled_checks=tuple(c for c in args.disable_checks.split(",") if c),
        drift_group_keys=tuple(c for c in args.drift_group_keys.split(",") if c),
    )
    summary = run_validation(
        spark,
        _load(spark, args.clips),
        _load(spark, args.transcripts),
        _load(spark, args.reference),
        cfg,
        lineage_extra={"clips": args.clips, "reference": args.reference},
    )
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
