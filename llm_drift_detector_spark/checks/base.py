"""Check framework: result schemas + stable partition (bucket) ids.

The engine's analogue of the reference's abstract detector interface
(``detectors/base.py:65-125``): a check is a function from input
DataFrames to (metric rows, violation rows).  Checks here return
*deterministic core frames* (no run_id / wall-clock columns) so they can
be oracle-diffed against DuckDB; the pipeline layer
(:mod:`..pipeline.runner`) decorates them into the persisted
``metrics`` / ``violations`` tables of FIXTURES.md §4.

Stable partition ids
--------------------
Checkpoint/resume (BASELINE.json north_rule) needs partition identities
that survive cluster resizes and AQE re-planning.  Physical
``spark_partition_id()`` does not — it depends on task scheduling.  We
use a *logical bucket*: ``pmod(xxhash64(clip_id), n_buckets)``.  The
same row always lands in the same bucket on any cluster, so per-bucket
verdicts, lineage and resume are well-defined at any parallelism.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

from ..config import SALT_BUCKETS

# FIXTURES.md §4 output schemas
VIOLATIONS_SCHEMA = (
    "run_id string, check_name string, clip_id string, detail string, "
    "partition_id int"
)
METRICS_SCHEMA = (
    "run_id string, timestamp timestamp, detector_name string, "
    "metric_name string, column string, drift_score double, "
    "threshold double, drift_detected boolean, p_value double, "
    "reference_size bigint, current_size bigint, details string"
)
VERDICTS_SCHEMA = (
    "run_id string, partition_id int, status string, rows_processed bigint, "
    "violations_emitted bigint, lineage string, completed_at timestamp"
)


def bucket_id(key: str | Column = "clip_id", n_buckets: int = SALT_BUCKETS) -> Column:
    """Stable logical bucket for a key column (resume + salt unit)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")
