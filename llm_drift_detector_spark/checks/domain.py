"""Domain / whitelist constraints on scalar columns (graft mandate).

sr_hz domain and codec whitelist from BASELINE.json input_hint.  Pure
native filters — pushed down to the parquet/Iceberg scan, no Python.
The violation projection selects only (clip_id, offending column), so
the scan never reads the `bytes` payload (column pruning — check
``ReadSchema`` in .explain()).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def domain_violations(
    df: DataFrame, column: str, allowed: Sequence, key: str = "clip_id"
) -> DataFrame:
    """Rows whose `column` is null or outside `allowed`: (clip_id, value)."""
    c = F.col(column)
    return df.where(c.isNull() | ~c.isin(*list(allowed))).select(
        F.col(key).alias("clip_id"), c.cast("string").alias("value")
    )


# whitelist semantics are identical; alias kept for call-site readability
whitelist_violations = domain_violations
