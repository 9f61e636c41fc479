"""Derive C19 alerts from a running monitor's metric sinks — the
cadence companion to a ``--continuous`` monitor.

spark-submit --py-files dist/llm_drift_detector_spark.zip \\
    jobs/derive_alerts.py --out <monitor-out-dir> \\
    [--drift-column dur_ms --embedding-column embedding \\
     --text-column transcript --cooldown-minutes 60 --epoch-minutes 60]

The AvailableNow monitor derives alerts at the end of its drain; a
continuous monitor never stops, so alerting runs OUT-OF-BAND: cron this
job on the reference's detection cadence
(``default_config.py:106``).  Each invocation discovers whichever
metric sinks exist under --out, derives alerts for epochs not yet
processed (per-sink progress in ``alerts_progress.json``; cooldown
state in ``alerts_state.json``), appends them to ``alerts/``, and
prints one JSON line.  Idempotent: an invocation with no new epochs
emits nothing.  Single-writer by design — run ONE cadence job per
monitor out dir (the monitor's own drain-end derivation shares the
same state files, so mixing modes stays exactly-once).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", required=True, help="the monitor's out dir")
    p.add_argument("--drift-column", default="value",
                   help="cooldown-key label for single-column distribution "
                   "sinks (multi/matrix sinks carry their own)")
    p.add_argument("--embedding-column", default="embedding")
    p.add_argument("--text-column", default="text")
    p.add_argument("--cooldown-minutes", type=float, default=60.0)
    p.add_argument("--epoch-minutes", type=float, default=60.0)
    p.add_argument(
        "--include-latest", action="store_true",
        help="also derive each sink's HIGHEST epoch; by default it is "
        "held back one cadence because a live monitor may still be "
        "overwriting (or crash-replaying) it — only pass this when the "
        "monitor is known stopped",
    )
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from llm_drift_detector_spark.monitoring.derive import derive_stream_alerts

    spark = SparkSession.builder.appName("derive-alerts").getOrCreate()
    alert_rows = derive_stream_alerts(
        spark,
        args.out,
        distribution_label=args.drift_column,
        embedding_label=args.embedding_column,
        text_label=args.text_column,
        cooldown_minutes=args.cooldown_minutes,
        epoch_minutes=args.epoch_minutes,
        holdback_latest=not args.include_latest,
    )
    print(json.dumps({
        "out": args.out,
        "new_alerts": [
            {"epoch": e, "level": lvl, "detector": det, "column": col}
            for e, lvl, det, col, _s, _t in alert_rows
        ],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
