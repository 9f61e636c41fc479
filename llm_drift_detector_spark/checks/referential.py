"""Referential integrity clip <-> transcript (graft J1).

The reference has no joins (SURVEY.md §2.3); the mandate adds
clips-vs-transcripts integrity.  Both directions are anti-joins:

- orphan clips: clip rows with no transcript row
- orphan transcripts: transcript rows with no clip row

Plan shape: ``LEFT ANTI`` join on ``clip_id``.  At scale the join
strategy is Catalyst's choice — broadcast when one side's *distinct key
projection* is small, else sort-merge; AQE converts to broadcast at
runtime when a side turns out small.  We project to the key column
FIRST so the shuffle moves 8-byte-ish keys, never audio payloads.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def orphans(left: DataFrame, right: DataFrame, key: str = "clip_id") -> DataFrame:
    """Distinct `key` values present in `left` but absent from `right`."""
    lk = left.select(F.col(key).alias("clip_id")).distinct()
    rk = right.select(F.col(key).alias("clip_id")).distinct()
    return lk.join(rk, "clip_id", "left_anti")
