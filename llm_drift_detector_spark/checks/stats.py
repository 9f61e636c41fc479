"""Per-column statistics profile (reference A1: ``DistributionStats``).

Reproduces ``data/processor.py:92-116``: for each numeric column —
count, mean, std (population, matching ``np.std`` default ddof=0), min,
max, q25/median/q75 — plus the graft-mandated null-rate.

Plan shape: ONE aggregate pass over the input (all columns' stats in a
single ``agg``), then an unpivot (``stack``) of the single result row
into long format.  At 10^12 rows this is one scan + a map-side-combined
partial aggregate; the shuffle moves one row per partition.

Exact vs sketch (SURVEY.md §4.2.3): exact mode uses ``percentile``
(linear interpolation, matches ``np.percentile``) for oracle parity;
sketch mode uses ``percentile_approx`` (t-digest-style sketch) which is
the only viable plan at 10^12 rows — exact percentile materializes every
value per column in one aggregation buffer.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..config import EXACT, StatsMode

STAT_FIELDS = (
    "count",
    "null_count",
    "null_rate",
    "mean",
    "stddev",
    "min",
    "max",
    "q25",
    "median",
    "q75",
)


def profile(df: DataFrame, columns: list[str], mode: StatsMode = EXACT) -> DataFrame:
    """One row per column: the reference's DistributionStats + null-rate.

    Output schema: column string, count bigint, null_count bigint,
    null_rate double, mean double, stddev double, min double, max double,
    q25 double, median double, q75 double.
    """
    aggs = []
    for c in columns:
        col = F.col(c).cast("double")
        if mode.exact:
            q = F.expr(f"percentile({c}, array(0.25D, 0.5D, 0.75D))")
        else:
            q = F.percentile_approx(
                col, [0.25, 0.5, 0.75], mode.approx_percentile_accuracy
            )
        aggs += [
            F.count(col).alias(f"{c}__count"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__null_count"),
            F.avg(col).alias(f"{c}__mean"),
            F.coalesce(F.stddev_pop(col), F.lit(0.0)).alias(f"{c}__stddev"),
            F.min(col).alias(f"{c}__min"),
            F.max(col).alias(f"{c}__max"),
            q[0].cast("double").alias(f"{c}__q25"),
            q[1].cast("double").alias(f"{c}__q50"),
            q[2].cast("double").alias(f"{c}__q75"),
        ]
    wide = df.agg(*aggs)

    # unpivot the single row into (column, stats...) long format
    stack_args = []
    for c in columns:
        stack_args.append(f"'{c}'")
        stack_args += [
            f"`{c}__count`",
            f"`{c}__null_count`",
            f"`{c}__mean`",
            f"`{c}__stddev`",
            f"`{c}__min`",
            f"`{c}__max`",
            f"`{c}__q25`",
            f"`{c}__q50`",
            f"`{c}__q75`",
        ]
    stacked = wide.selectExpr(
        f"stack({len(columns)}, {', '.join(stack_args)}) as "
        "(column, count, null_count, mean, stddev, min, max, q25, median, q75)"
    )
    return stacked.select(
        "column",
        F.col("count").cast("bigint").alias("count"),
        F.col("null_count").cast("bigint").alias("null_count"),
        (
            F.col("null_count") / F.greatest(F.col("count") + F.col("null_count"), F.lit(1))
        ).cast("double").alias("null_rate"),
        "mean",
        "stddev",
        "min",
        "max",
        "q25",
        "median",
        "q75",
    )
