"""spark-submit entry point: acoustic dedup of a clips table.

Usage (cluster or local):

    python tools/build_package.py   # -> dist/llm_drift_detector_spark.zip
    spark-submit --py-files dist/llm_drift_detector_spark.zip \
        jobs/dedup_audio.py \
        --clips <path-or-table> --out /path/to/dedup-output \
        [--mode near|exact|containment] [--min-corr MODE_DEFAULT] \
        [--min-band-matches 2] [--max-bucket-size 64] [--keep-clips]

Writes to --out:

- ``pairs/``     verified near-dup pairs (near mode), exact-dup
                 membership rows (exact mode), or containment pairs
                 with corr/lag/overlap (containment mode)
- ``clusters/``  (id, cluster_id) connected components (near mode)
- ``kept/``      the deduplicated clips table (--keep-clips, near and
                 exact modes — it rewrites payloads, the one stage that
                 moves bytes; containment is not an equivalence
                 relation, so --keep-clips there is an error)

Prints one JSON summary line.  Inputs may be parquet paths or catalog
tables (``table:<name>`` prefix, e.g. Iceberg).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _load(spark, spec: str):
    if spec.startswith("table:"):
        return spark.read.table(spec[len("table:"):])
    return spark.read.parquet(spec)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clips", required=True)
    p.add_argument("--out", required=True)
    p.add_argument(
        "--mode", default="near", choices=("near", "exact", "containment")
    )
    p.add_argument(
        "--min-corr", type=float, default=None,
        help="verification gate; defaults to the library default for "
        "the mode (0.95 near, 0.9 containment)",
    )
    p.add_argument("--min-len-ratio", type=float, default=0.98)
    p.add_argument("--min-band-matches", type=int, default=2)
    p.add_argument("--max-bucket-size", type=int, default=64)
    p.add_argument(
        "--window-s", type=float, default=0.25,
        help="containment mode: spectral window seconds (size to corpus)",
    )
    p.add_argument(
        "--min-overlap-s", type=float, default=0.25,
        help="containment mode: minimum verified overlap seconds",
    )
    p.add_argument(
        "--max-scales", type=int, default=1,
        help="containment mode: multi-resolution scale count (scale s "
        "halves the window s times; covers clips shorter than one "
        "window at the cost of ~max_scales x shingle FFT work)",
    )
    p.add_argument(
        "--keep-clips", action="store_true",
        help="also write the deduplicated clips table (rewrites payloads)",
    )
    p.add_argument(
        "--checkpoint-dir", default=None,
        help="near mode: durable stage checkpoints (fingerprints, "
        "candidates) under this dir; a killed run resumes from the last "
        "committed stage instead of replaying the decode pass",
    )
    p.add_argument(
        "--run-id", default="default",
        help="checkpoint namespace; reuse to resume, change for fresh "
        "inputs or geometry",
    )
    args = p.parse_args(argv)
    if args.keep_clips and args.mode == "containment":
        p.error("--keep-clips is undefined for containment mode (a "
                "contained segment is not an equivalence class); drop "
                "the flag or use --mode near/exact")
    min_corr = args.min_corr if args.min_corr is not None else (
        0.9 if args.mode == "containment" else 0.95
    )

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("dedup-audio").getOrCreate()
    clips = _load(spark, args.clips)
    summary: dict = {"mode": args.mode, "clips": args.clips}

    if args.mode == "exact":
        import pyspark.sql.functions as F
        from pyspark.sql import Window

        from llm_drift_detector_spark.audioops import exact_duplicates_audio

        dups = exact_duplicates_audio(clips)
        dups.write.mode("overwrite").parquet(os.path.join(args.out, "pairs"))
        summary["dup_rows"] = spark.read.parquet(
            os.path.join(args.out, "pairs")
        ).count()
        if args.keep_clips:
            losers = (
                spark.read.parquet(os.path.join(args.out, "pairs"))
                .withColumn(
                    "keeper", F.min("id").over(Window.partitionBy("dup_group"))
                )
                .where(F.col("id") != F.col("keeper"))
                .select(F.col("id").alias("clip_id"))
            )
            kept = clips.join(F.broadcast(losers), "clip_id", "left_anti")
            kept.write.mode("overwrite").parquet(os.path.join(args.out, "kept"))
            summary["kept"] = spark.read.parquet(
                os.path.join(args.out, "kept")
            ).count()
    elif args.mode == "containment":
        from llm_drift_detector_spark.audioops import (
            audio_containment_pairs,
            containment_coverage,
        )

        # coverage probe first (native, no decode): surfaces the
        # sub-window population the shingle stage cannot see, so a low
        # pair count is attributable instead of silent
        cov = containment_coverage(
            clips, window_s=args.window_s, max_scales=args.max_scales
        ).collect()[0]
        summary["coverage"] = {
            "clips": cov.clips,
            "covered": cov.covered,
            "short_clips_skipped": cov.short_clips_skipped,
            "coverage": cov.coverage,
        }
        pairs = audio_containment_pairs(
            clips,
            max_bucket_size=args.max_bucket_size,
            min_corr=min_corr,
            min_overlap_s=args.min_overlap_s,
            window_s=args.window_s,
            max_scales=args.max_scales,
        )
        pairs.write.mode("overwrite").parquet(os.path.join(args.out, "pairs"))
        summary["pairs"] = spark.read.parquet(
            os.path.join(args.out, "pairs")
        ).count()
    else:
        from llm_drift_detector_spark.audioops import (
            audio_duplicate_pairs,
            audio_duplicate_pairs_checkpointed,
        )
        from llm_drift_detector_spark.textops import duplicate_clusters

        if args.checkpoint_dir:
            pairs = audio_duplicate_pairs_checkpointed(
                spark,
                clips,
                checkpoint_dir=args.checkpoint_dir,
                run_id=args.run_id,
                max_bucket_size=args.max_bucket_size,
                min_band_matches=args.min_band_matches,
                min_corr=min_corr,
                min_len_ratio=args.min_len_ratio,
            ).persist()
        else:
            pairs = audio_duplicate_pairs(
                clips,
                max_bucket_size=args.max_bucket_size,
                min_band_matches=args.min_band_matches,
                min_corr=min_corr,
                min_len_ratio=args.min_len_ratio,
            ).persist()
        pairs.write.mode("overwrite").parquet(os.path.join(args.out, "pairs"))
        clusters = duplicate_clusters(pairs)
        clusters.write.mode("overwrite").parquet(os.path.join(args.out, "clusters"))
        summary["pairs"] = pairs.count()
        summary["cluster_members"] = spark.read.parquet(
            os.path.join(args.out, "clusters")
        ).count()
        if args.keep_clips:
            import pyspark.sql.functions as F

            losers = (
                spark.read.parquet(os.path.join(args.out, "clusters"))
                .where(F.col("id") != F.col("cluster_id"))
                .select(F.col("id").alias("clip_id"))
            )
            kept = clips.join(F.broadcast(losers), "clip_id", "left_anti")
            kept.write.mode("overwrite").parquet(os.path.join(args.out, "kept"))
            summary["kept"] = spark.read.parquet(
                os.path.join(args.out, "kept")
            ).count()

    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
