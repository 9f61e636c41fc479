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
DUP_BLOOM_STATE_SCHEMA = "filter binary"
DUP_OUTPUT_SCHEMA = "clip_id string"


def _dup_update(
    key: Tuple[int],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Exact-set kernel (state_mode='exact'): keeps every xxhash64 seen.

    State grows 8 B/id forever AND the whole set re-serializes every
    trigger (O(total ids) per trigger even for a tiny batch) — fine for
    bounded backfills, a scale-killer for continuous streams.  The Bloom
    kernel below is the continuous-mode default.
    """
    seen = set(state.get[0]) if state.exists else set()
    flagged: list[str] = []
    changed = False
    for pdf in pdfs:
        for cid, h in zip(pdf["clip_id"], pdf["h"]):
            h = int(h)
            if h in seen:
                flagged.append(cid)
            else:
                seen.add(h)
                changed = True
    if changed:
        state.update((list(seen),))
    if flagged:
        yield pd.DataFrame({"clip_id": flagged})


def bloom_geometry(capacity: int, fpp: float) -> Tuple[int, int]:
    """(m_bits, k_hashes) for a Bloom filter of `capacity` items at `fpp`.

    Standard sizing: m = -n ln(p) / (ln 2)^2, k = (m/n) ln 2.  m is
    rounded up to a whole byte.
    """
    if not (0.0 < fpp < 1.0) or capacity <= 0:
        raise ValueError(f"bad bloom geometry: capacity={capacity} fpp={fpp}")
    m = math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 7) // 8) * 8
    k = max(1, round(m / capacity * math.log(2)))
    return m, k


def _bloom_positions(h: int, m_bits: int, k: int) -> list[int]:
    """k bit positions from one 64-bit hash via Kirsch-Mitzenmacher
    double hashing: idx_j = (h_lo + j * h_hi) mod m."""
    h &= (1 << 64) - 1
    h1 = h & 0xFFFFFFFF
    h2 = (h >> 32) | 1  # odd -> full-period stride
    return [(h1 + j * h2) % m_bits for j in range(k)]


def _make_bloom_dup_update(m_bits: int, k: int):
    """Bloom kernel factory: FIXED-size per-bucket state (m_bits/8 bytes),
    so per-trigger (de)serialization cost is O(m) constant — independent
    of how many ids the stream has ever seen — and state.update is
    skipped entirely on triggers that add no new bits."""

    def update(
        key: Tuple[int],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        raw = state.get[0] if state.exists else None
        buf = bytearray(raw) if raw is not None else bytearray(m_bits // 8)
        flagged: list[str] = []
        changed = False
        for pdf in pdfs:
            for cid, h in zip(pdf["clip_id"], pdf["h"]):
                pos = _bloom_positions(int(h), m_bits, k)
                if all(buf[i >> 3] & (1 << (i & 7)) for i in pos):
                    flagged.append(cid)
                else:
                    for i in pos:
                        buf[i >> 3] |= 1 << (i & 7)
                    changed = True
        if changed:
            state.update((bytes(buf),))
        if flagged:
            yield pd.DataFrame({"clip_id": flagged})

    return update


def streaming_duplicate_clips(
    df: DataFrame,
    key_col: str = "clip_id",
    n_state_buckets: int = 512,
    id_col: str | None = None,
    state_mode: str = "exact",
    bloom_capacity_per_bucket: int = 100_000,
    bloom_fpp: float = 0.01,
) -> DataFrame:
    """GLOBAL uniqueness in continuous mode: flag every re-occurrence of
    a key across ALL micro-batches, once per extra occurrence.

    The batch runner's A11 uniqueness (``checks/uniqueness.py``) is a
    full-table groupBy; foreachBatch streaming can only see one batch
    (the documented batch-local gap).  This closes it with
    ``applyInPandasWithState`` keyed on a HASH BUCKET of the key — not
    the key itself — so state shards into ``n_state_buckets`` groups
    (co-grouped rows per trigger, bounded state-store key count) rather
    than one state entry per distinct clip_id.

    state_mode:

    - ``"exact"`` (default): the original xxhash64-set state (8 B/id,
      fp rate 2^-64 per pair) — never flags a unique key, and restarting
      a pre-existing checkpointed stream keeps working (the default must
      not change the state-store schema under an existing checkpoint).
      State grows with distinct keys and every trigger rewrites the full
      set, so for UNBOUNDED continuous streams opt into ``"bloom"``.
    - ``"bloom"`` (opt-in, continuous-mode): per-bucket state is a
      FIXED-size Bloom filter sized by ``bloom_geometry(
      bloom_capacity_per_bucket, bloom_fpp)``.  Per-trigger state
      rewrite cost is O(filter bytes), constant for the life of the
      stream; total state = n_state_buckets * m/8 bytes FOREVER (the
      defaults give 512 * ~117 KiB ≈ 60 MiB for ~51M ids at <=1% fpp).
      Guarantee: every true duplicate is flagged (no false negatives);
      a first occurrence may be flagged spuriously with probability
      <= bloom_fpp while the bucket holds <= capacity distinct ids
      (degrading gracefully beyond).  At 10^12 ids: 65536 buckets x
      18M capacity x 0.1% fpp = 65536 * ~32 MiB ≈ 2 TiB spread over
      the cluster's state stores — tunable to the precision/footprint
      point the pipeline needs, vs ~8 TB *and* O(corpus) per-trigger
      rewrite for exact state.  Note a downstream consumer that DROPS
      flagged rows will discard a unique key at rate <= fpp — only pick
      bloom when that loss budget is acceptable (or route flags to
      review instead of deletion).

    First occurrence of a key is NOT emitted; the 2nd, 3rd, ... each
    emit one (clip_id) row in the trigger where they arrive — a
    duplicate split across micro-batches is flagged exactly once.

    CHECKPOINT COMPATIBILITY: ``state_mode`` is part of the state-store
    schema (``array<bigint>`` vs ``binary``), so it must NOT change
    across restarts of an existing checkpointed stream — Spark fails
    the query on the state-schema change.  Keeping ``"exact"`` as the
    default preserves every pre-existing checkpointed caller; opt into
    bloom explicitly when starting a NEW continuous stream.

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
    if state_mode == "bloom":
        m_bits, k = bloom_geometry(bloom_capacity_per_bucket, bloom_fpp)
        kernel, schema = _make_bloom_dup_update(m_bits, k), DUP_BLOOM_STATE_SCHEMA
    elif state_mode == "exact":
        kernel, schema = _dup_update, DUP_STATE_SCHEMA
    else:
        raise ValueError(f"unknown state_mode: {state_mode}")
    return prepared.groupBy("bucket").applyInPandasWithState(
        kernel,
        outputStructType=DUP_OUTPUT_SCHEMA,
        stateStructType=schema,
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
