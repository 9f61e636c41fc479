"""Uniqueness check on a key column (graft A11).

The reference assumes uuid uniqueness (``data/collector.py:29``); the
mandate makes it a first-class check on ``clip_id``.  Violation rows are
the duplicated keys with their multiplicities; the metric row carries
total / distinct / duplicate-key counts.

Scale note: ``groupBy(key).count()`` is one hash-aggregate shuffle with
map-side partial aggregation — the canonical plan.  For a metric-only
pass at 10^12 rows, ``approx_count_distinct`` (HLL sketch, no shuffle of
distinct values) is exposed via ``approx=True``.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def duplicate_keys(df: DataFrame, key: str = "clip_id") -> DataFrame:
    """Keys appearing more than once: (clip_id, n) — the violation rows."""
    return (
        df.groupBy(F.col(key).alias("clip_id"))
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
    )


def uniqueness_metrics(
    df: DataFrame, key: str = "clip_id", approx: bool = False, rsd: float = 0.02
) -> DataFrame:
    """Single metric row: total, distinct, duplicate key count, dup rate.

    ``rsd`` bounds the HLL relative standard deviation in approx mode
    (0.02 => the estimate lands within ~5% with overwhelming margin)."""
    if approx:
        return df.agg(
            F.count(key).alias("total"),
            F.approx_count_distinct(key, rsd).alias("distinct"),
        ).select(
            "total",
            "distinct",
            (F.col("total") - F.col("distinct")).alias("excess_rows"),
            ((F.col("total") - F.col("distinct")) / F.col("total")).alias("dup_rate"),
        )
    per_key = df.groupBy(key).agg(F.count("*").alias("n"))
    return per_key.agg(
        F.sum("n").alias("total"),
        F.count("*").alias("distinct"),
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("rows_in_dup_keys"),
        F.sum((F.col("n") > 1).cast("bigint")).alias("dup_keys"),
    ).select(
        F.col("total").cast("bigint").alias("total"),
        F.col("distinct").cast("bigint").alias("distinct"),
        F.col("dup_keys").cast("bigint").alias("dup_keys"),
        F.col("rows_in_dup_keys").cast("bigint").alias("rows_in_dup_keys"),
        (F.col("rows_in_dup_keys") / F.col("total")).cast("double").alias("dup_rate"),
    )
