"""Embedding drift (reference C6-C10, ``detectors/embedding.py:60-248``).

All per-row math stays native: for a fixed embedding dimension d the
centroid is d ``avg(element_at(col, i))`` aggregate expressions — one
scan, map-side partial agg, a single tiny result row (no posexplode
shuffle of N*d rows), and per-row distances-to-centroid are d-term
dot-product expressions inside whole-stage codegen.  Python touches only
collected centroids (d floats) and the <=1000x1000 MMD kernel on sampled
rows (the reference's own subsampling cap, ``embedding.py:226-234``).

Semantics mirrored exactly:
- centroid distance: cosine (``1 - cos``) or euclidean/sqrt(d)   (C6)
- intra-cluster dispersion = mean distance to own centroid; variance
  change = |curr-ref| / max(ref, 1e-10)                           (C7)
- avg distance of current rows to reference centroid              (C8)
- drift_score = 0.6*C6 + 0.2*C7 + 0.2*C8; with MMD available:
  0.5*score + 0.5*min(mmd, 1)                                     (C9)
- MMD with cosine kernel, off-diagonal means, clamped >= 0        (C10)
"""

from __future__ import annotations

import math

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from ..config import EMBEDDING_DETECTOR_THRESHOLD, MIN_SAMPLES


def _dim(df: DataFrame, col: str) -> int:
    row = df.select(F.size(F.col(col)).alias("d")).limit(1).collect()
    if not row:
        raise ValueError("empty embedding frame")
    return int(row[0].d)


# Above this dimensionality the d-expression aggregate stops being the
# right plan: d avg() expressions generate O(d) Java code (Janino method
# limits loom past ~1k terms; similarity.py hit them at 8x64) and the
# partial-agg buffer is one row of width d anyway.  The posexplode form
# shuffles tiny (pos, sum, cnt) partials instead — O(1) codegen, any d.
CENTROID_EXPLODE_DIM = 256


def centroid_frame(df: DataFrame, col: str, dim: int) -> DataFrame:
    """One row with avg_0..avg_{d-1}: the columnwise mean (A3 centroid)."""
    aggs = [
        F.avg(F.element_at(F.col(col), i + 1).cast("double")).alias(f"avg_{i}")
        for i in range(dim)
    ]
    return df.where(F.col(col).isNotNull()).agg(*aggs)


def _centroid_exploded(df: DataFrame, col: str) -> dict[int, float]:
    """High-d centroid: posexplode -> groupBy(pos).avg — one shuffle of
    per-dimension partial aggregates, codegen-safe at any d."""
    rows = (
        df.where(F.col(col).isNotNull())
        .select(F.posexplode(F.col(col)).alias("pos", "v"))
        .groupBy("pos")
        .agg(F.avg(F.col("v").cast("double")).alias("avg"))
        .collect()
    )
    return {int(r.pos): float(r.avg) for r in rows}


def centroid(df: DataFrame, col: str, dim: int | None = None) -> np.ndarray:
    dim = dim or _dim(df, col)
    if dim > CENTROID_EXPLODE_DIM:
        by_pos = _centroid_exploded(df, col)
        return np.array([by_pos.get(i, 0.0) for i in range(dim)], dtype=np.float64)
    row = centroid_frame(df, col, dim).collect()[0]
    return np.array([row[f"avg_{i}"] for i in range(dim)], dtype=np.float64)


def _dot_lit(col: str, vec: np.ndarray) -> Column:
    return sum(
        (
            F.element_at(F.col(col), i + 1).cast("double") * float(v)
            for i, v in enumerate(vec)
        ),
        F.lit(0.0),
    )


def _row_norm(col: str, dim: int) -> Column:
    return F.sqrt(
        sum(
            (F.pow(F.element_at(F.col(col), i + 1).cast("double"), 2) for i in range(dim)),
            F.lit(0.0),
        )
    )


def _dist_to_lit(col: str, vec: np.ndarray, metric: str) -> Column:
    """Per-row distance to a constant vector, as a native expression."""
    d = len(vec)
    if metric == "cosine":
        vnorm = float(np.linalg.norm(vec))
        dot = _dot_lit(col, vec)
        rn = _row_norm(col, d)
        return F.when(
            (rn > 0) & F.lit(vnorm > 0), 1.0 - dot / (rn * F.lit(vnorm))
        ).otherwise(F.lit(1.0))
    # euclidean / sqrt(d) (embedding.py:189-190 normalization)
    sq = sum(
        (
            F.pow(F.element_at(F.col(col), i + 1).cast("double") - float(v), 2)
            for i, v in enumerate(vec)
        ),
        F.lit(0.0),
    )
    return F.sqrt(sq) / math.sqrt(d)


def _np_dist(a: np.ndarray, b: np.ndarray, metric: str) -> float:
    if metric == "cosine":
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return 1.0
        return float(1.0 - np.dot(a, b) / (na * nb))
    return float(np.linalg.norm(a - b) / math.sqrt(len(a)))


def mean_dist_frame(
    df: DataFrame, col: str, vec: np.ndarray, metric: str = "cosine"
) -> DataFrame:
    """One row: (mean_dist double) — avg per-row distance to `vec`."""
    return (
        df.where(F.col(col).isNotNull())
        .agg(F.avg(_dist_to_lit(col, vec, metric)).cast("double").alias("mean_dist"))
    )


def centroid_cosine_frame(ref: DataFrame, cur: DataFrame, col: str, dim: int) -> DataFrame:
    """One row: (centroid_cosine double) — fully in-plan C6 for the oracle
    harness (centroids joined per dimension, cosine as an aggregate)."""
    def side(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.posexplode(F.col(col)).alias("i", "x"))
            .groupBy("i")
            .agg(F.avg(F.col("x").cast("double")).alias(name))
        )

    j = side(ref, "a").join(side(cur, "b"), "i")
    return j.agg(
        (
            1.0
            - F.sum(F.col("a") * F.col("b"))
            / (F.sqrt(F.sum(F.col("a") * F.col("a"))) * F.sqrt(F.sum(F.col("b") * F.col("b"))))
        ).cast("double").alias("centroid_cosine")
    )


def sample_embeddings(
    df: DataFrame, col: str, k: int, seed: int
) -> np.ndarray:
    """Deterministic <=k uniform sample, collected as an (n, d) matrix.

    Mirrors the reference's MMD cap (embedding.py:226-234) — orderBy
    rand(seed) + limit gives exact-k without-replacement sampling."""
    rows = (
        df.where(F.col(col).isNotNull())
        .select(F.col(col).alias("e"))
        .orderBy(F.rand(seed))
        .limit(k)
        .collect()
    )
    return np.array([r.e for r in rows], dtype=np.float64)


def mmd_cosine(x: np.ndarray, y: np.ndarray) -> float:
    """MMD with cosine-similarity kernel, off-diagonal means (C10)."""
    def normed(m):
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    xn, yn = normed(x), normed(y)
    xx, yy, xy = xn @ xn.T, yn @ yn.T, xn @ yn.T
    m, n = len(x), len(y)
    if m < 2 or n < 2:
        return 0.0
    mmd = (xx.sum() - np.trace(xx)) / (m * (m - 1))
    mmd += (yy.sum() - np.trace(yy)) / (n * (n - 1))
    mmd -= 2.0 * xy.sum() / (m * n)
    return float(max(0.0, mmd))


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    col: str = "embedding",
    metric: str = "cosine",
    use_mmd: bool = True,
    mmd_cap: int = 1000,
    seed: int = 42,
    detector_threshold: float = EMBEDDING_DETECTOR_THRESHOLD,
    min_samples: int = MIN_SAMPLES,
) -> dict:
    """Full reference embedding-detector semantics (C6-C10)."""
    n_ref = ref.where(F.col(col).isNotNull()).count()
    n_cur = cur.where(F.col(col).isNotNull()).count()
    result: dict = {
        "metric_name": "embedding_distance",
        "reference_size": n_ref,
        "current_size": n_cur,
        "threshold": detector_threshold,
    }
    if n_ref < min_samples or n_cur < min_samples:
        result.update({"drift_score": 0.0, "drift_detected": False, "gated": True})
        return result

    dim = _dim(ref, col)
    c_ref = centroid(ref, col, dim)
    c_cur = centroid(cur, col, dim)
    centroid_distance = _np_dist(c_ref, c_cur, metric)

    ref_intra = mean_dist_frame(ref, col, c_ref, metric).collect()[0].mean_dist or 0.0
    cur_intra = mean_dist_frame(cur, col, c_cur, metric).collect()[0].mean_dist or 0.0
    variance_change = abs(cur_intra - ref_intra) / max(ref_intra, 1e-10)
    avg_dist_to_ref = mean_dist_frame(cur, col, c_ref, metric).collect()[0].mean_dist or 0.0

    drift_score = 0.6 * centroid_distance + 0.2 * variance_change + 0.2 * avg_dist_to_ref
    analysis = {
        "centroid_distance": centroid_distance,
        "variance_change": variance_change,
        "avg_distance_to_reference": avg_dist_to_ref,
        "ref_intra_distance": ref_intra,
        "curr_intra_distance": cur_intra,
        "distance_metric": metric,
    }
    if use_mmd and n_ref > 10 and n_cur > 10:
        x = sample_embeddings(ref, col, mmd_cap, seed)
        y = sample_embeddings(cur, col, mmd_cap, seed + 1)
        mmd = mmd_cosine(x, y)
        analysis["mmd"] = mmd
        drift_score = 0.5 * drift_score + 0.5 * min(mmd, 1.0)

    result["drift_score"] = float(drift_score)
    result["drift_detected"] = drift_score > detector_threshold
    result["analysis"] = analysis
    return result
