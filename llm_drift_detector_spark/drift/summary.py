"""Drift summary rollup + heatmap pivot (reference A6/A7/A10,
``monitoring/metrics.py:405-542``, ``visualization/dashboard.py:693-759``).

The reference builds a nested provider->model->detector dict with
Python loops; here it's one groupBy.agg.  Our engine's grouping keys are
(detector_name, column) — the graft has a single table instead of
provider/model pairs; callers with multi-tenant metrics pass their own
``group_cols``.

Status mapping mirrors metrics.py:125-137: drift anywhere -> "warning",
max score > 0.8 -> "critical", else "normal".
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def drift_summary(
    metrics: DataFrame, group_cols: tuple[str, ...] = ("detector_name", "column")
) -> DataFrame:
    """Per-group rollup: max score, any-drift, last timestamp, row count,
    and the reference's status classification."""
    g = metrics.groupBy(*group_cols).agg(
        F.max("drift_score").cast("double").alias("max_drift_score"),
        F.max(F.col("drift_detected").cast("int")).cast("boolean").alias("drift_detected"),
        F.max("timestamp").alias("last_detection"),
        F.count("*").cast("bigint").alias("n_results"),
    )
    status = (
        F.when(
            F.col("drift_detected") & (F.col("max_drift_score") > 0.8), "critical"
        )
        .when(F.col("drift_detected"), "warning")
        .otherwise("normal")
    )
    return g.withColumn("status", status)


def drift_pivot(
    metrics: DataFrame,
    index: str = "detector_name",
    columns: str = "column",
    values: list[str] | None = None,
) -> DataFrame:
    """A7 heatmap: mean drift_score, `index` rows x `columns` columns.

    Pass ``values`` (the distinct pivot values) when known — skipping the
    distinct-discovery job, which matters on wide metrics tables.
    """
    p = metrics.groupBy(index).pivot(columns, values) if values else metrics.groupBy(
        index
    ).pivot(columns)
    return p.agg(F.avg("drift_score"))


def mean_threshold(metrics: DataFrame) -> DataFrame:
    """A10: dashboard mean-threshold line."""
    return metrics.agg(F.avg("threshold").cast("double").alias("mean_threshold"))
