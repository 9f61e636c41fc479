"""Custom stateful streaming operator: running drift state per key.

``applyInPandasWithState`` keeps a per-key (e.g. per codec, per source)
running mean/variance (Welford accumulators) across micro-batches and
emits a drift verdict for every batch: the z-score of the batch mean
against the accumulated history — the streaming analogue of the
reference's rolling z-score scan (C16) with state that survives across
triggers instead of a window buffer.

``applyInPandasWithState`` only executes on streaming frames (Spark 4
raises UnsupportedOperation on batch input) — tests drive it with
one-trigger ``availableNow`` streams.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "n bigint, mean double, m2 double"
OUTPUT_SCHEMA = (
    "key string, batch_n bigint, batch_mean double, running_n bigint, "
    "running_mean double, running_std double, z_score double, drifted boolean"
)


def _update(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    values: list[float] = []
    for pdf in pdfs:
        values.extend(float(v) for v in pdf["value"].dropna())
    if state.exists:
        n, mean, m2 = state.get
    else:
        n, mean, m2 = 0, 0.0, 0.0

    batch_n = len(values)
    batch_mean = sum(values) / batch_n if batch_n else 0.0
    # z-score of this batch's mean vs the PRIOR accumulated distribution
    prior_std = math.sqrt(m2 / n) if n > 1 else 0.0
    if batch_n and prior_std > 0:
        z = abs(batch_mean - mean) / (prior_std / math.sqrt(batch_n))
    else:
        z = 0.0

    for v in values:  # Welford accumulate
        n += 1
        d = v - mean
        mean += d / n
        m2 += d * (v - mean)
    state.update((n, mean, m2))

    std = math.sqrt(m2 / n) if n > 1 else 0.0
    yield pd.DataFrame(
        [
            {
                "key": key[0],
                "batch_n": batch_n,
                "batch_mean": batch_mean,
                "running_n": n,
                "running_mean": mean,
                "running_std": std,
                "z_score": z,
                "drifted": z > 3.0,
            }
        ]
    )


DUP_STATE_SCHEMA = "seen array<bigint>"
DUP_OUTPUT_SCHEMA = "clip_id string"


def _dup_update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    flagged: list[str] = []
    for pdf in pdfs:
        for cid, h in zip(pdf["clip_id"], pdf["h"]):
            h = int(h)
            if h in seen:
                flagged.append(cid)
            else:
                seen.add(h)
    state.update((list(seen),))
    if flagged:
        yield pd.DataFrame({"clip_id": flagged})


def streaming_duplicate_clips(
    df: DataFrame,
    key_col: str = "clip_id",
    n_state_buckets: int = 512,
    id_col: str | None = None,
) -> DataFrame:
    """GLOBAL uniqueness in continuous mode: flag every re-occurrence of
    a key across ALL micro-batches, exactly once per extra occurrence.

    The batch runner's A11 uniqueness (``checks/uniqueness.py``) is a
    full-table groupBy; foreachBatch streaming can only see one batch
    (the documented batch-local gap).  This closes it with
    ``applyInPandasWithState`` keyed on a HASH BUCKET of the key — not
    the key itself — so state shards into ``n_state_buckets`` groups
    (co-grouped rows per trigger, bounded state-store key count) rather
    than one state entry per distinct clip_id.  Per-bucket state is the
    set of xxhash64(key) values seen (8 B/id; false-positive rate 2^-64
    per pair).  At 10^12 ids exact state is ~8 TB across the cluster —
    the documented evolution is a per-bucket Bloom filter in the same
    state slot (drop `seen` to a byte array; the update kernel is the
    only code that changes).

    First occurrence of a key is NOT emitted; the 2nd, 3rd, ... each
    emit one (clip_id) row in the trigger where they arrive — a
    duplicate split across micro-batches is flagged exactly once.

    ``id_col`` (default: the key itself) names the column EMITTED for a
    flagged row, decoupling dedup identity from the reported id:
    ``key_col="bytes", id_col="clip_id"`` is cross-batch EXACT PAYLOAD
    dedup for the audio tier — xxhash64 hashes the binary column
    scan-side, so state and shuffle still carry 8 B per row, never
    payloads.
    """
    import pyspark.sql.functions as F

    prepared = df.select(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_state_buckets))
        .cast("int")
        .alias("bucket"),
        F.col(id_col or key_col).cast("string").alias("clip_id"),
        F.xxhash64(F.col(key_col)).alias("h"),
    )
    return prepared.groupBy("bucket").applyInPandasWithState(
        _dup_update,
        outputStructType=DUP_OUTPUT_SCHEMA,
        stateStructType=DUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_drift_state(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Apply the stateful drift accumulator.  `df` may be a streaming
    frame (state persists across micro-batches via the streaming
    checkpoint); must be a streaming frame (batch input raises
    UnsupportedOperation in Spark 4)."""
    import pyspark.sql.functions as F

    prepared = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("double").alias("value"),
    )
    return prepared.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
