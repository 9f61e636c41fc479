"""Custom stateful streaming operator: running drift state per key.

``applyInPandasWithState`` keeps a per-key (e.g. per codec, per source)
running mean/variance (Welford accumulators) across micro-batches and
emits a drift verdict for every batch: the z-score of the batch mean
against the accumulated history — the streaming analogue of the
reference's rolling z-score scan (C16) with state that survives across
triggers instead of a window buffer.

Works identically on a batch DataFrame for testing (Spark runs the same
code path with a single "batch" of state).
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


def running_drift_state(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Apply the stateful drift accumulator.  `df` may be a streaming
    frame (state persists across micro-batches via the streaming
    checkpoint) or a batch frame (single update, for tests)."""
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
