"""Table I/O abstraction + time-window helpers.

Reference parity (SURVEY §2.1): the reference hand-implements per-backend
scans/sinks with the same five predicates (JSON files, local multi-format,
SQL, Redis — S1-S13); on Spark those collapse into ``spark.read`` /
``df.write`` with Catalyst doing pushdown.  This module is the single
writer/reader seam:

- ``table:<name>`` specs go through the session catalog (Iceberg when the
  runtime jar + catalog are configured — ``writeTo(...).append()`` /
  ``MERGE`` semantics; the sandbox has no Iceberg jar, so catalog specs
  require the deployment to provide it).
- plain paths are parquet directories (the sandbox fallback; same writer
  API shape).

Time-rotation (S12/W4): the reference rotates metrics CSV files by
hour/day/week/month in the FILENAME; here rotation is a time-partitioned
write — ``partitionBy(date_trunc)`` — which Iceberg/parquet readers prune
on (S13's mtime-window scan becomes a partition predicate).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, spec: str) -> DataFrame:
    if spec.startswith("table:"):
        return spark.read.table(spec[len("table:"):])
    return spark.read.parquet(spec)


def write_table(
    df: DataFrame,
    spec: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    if spec.startswith("table:"):
        name = spec[len("table:"):]
        w = df.writeTo(name)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(spec)


def write_metrics_rotated(
    metrics: DataFrame, spec: str, period: str = "day", ts_col: str = "timestamp"
) -> None:
    """S12/W4: append metrics partitioned by the rotation period."""
    rotated = metrics.withColumn("period", F.date_trunc(period, F.col(ts_col)))
    write_table(rotated, spec, mode="append", partition_by=["period"])


def recent_window(df: DataFrame, ts_col: str, hours: float, now=None) -> DataFrame:
    """W2: 'recent N hours' sliding filter (metrics.py:297-322)."""
    now_expr = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    return df.where(
        F.col(ts_col) >= now_expr - F.expr(f"INTERVAL {int(hours * 3600)} SECONDS")
    )


def last_n_per_group(
    df: DataFrame, order_col: str, n: int, group_cols: list[str] | None = None
) -> DataFrame:
    """W3: current-window selection — last `n` rows by `order_col` per
    group (the reference's window_size=100 slice, default_config.py:104)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*(group_cols or [])).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
