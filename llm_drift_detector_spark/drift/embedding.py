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


# Above this dimensionality the d-term element_at expression sums stop
# being safe: O(d) generated Java blows past Janino's method-size limit
# (textops/similarity.py:27-31 hit this at 8x64 planes) and codegen
# falls back to interpreted mode.  The zip_with/aggregate HOF form is
# ONE compact expression at any d (HOFs evaluate JVM-side, outside
# whole-stage codegen by design — deliberate, asserted in tests).
VECTOR_EXPR_DIM = 256


def _lit_arr(vec: np.ndarray) -> Column:
    # foldable CreateArray of literals — constant-folded by Catalyst
    return F.array(*[F.lit(float(v)) for v in vec])


def _dot_lit(col: str, vec: np.ndarray) -> Column:
    if len(vec) <= VECTOR_EXPR_DIM:
        return sum(
            (
                F.element_at(F.col(col), i + 1).cast("double") * float(v)
                for i, v in enumerate(vec)
            ),
            F.lit(0.0),
        )
    prods = F.zip_with(
        F.col(col).cast("array<double>"), _lit_arr(vec), lambda x, y: x * y
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _row_norm(col: str, dim: int) -> Column:
    if dim <= VECTOR_EXPR_DIM:
        return F.sqrt(
            sum(
                (F.pow(F.element_at(F.col(col), i + 1).cast("double"), 2) for i in range(dim)),
                F.lit(0.0),
            )
        )
    sq = F.aggregate(
        F.col(col).cast("array<double>"), F.lit(0.0), lambda acc, x: acc + x * x
    )
    return F.sqrt(sq)


def _dist_to_lit(col: str, vec: np.ndarray, metric: str) -> Column:
    """Per-row distance to a constant vector, as a native expression.

    d <= VECTOR_EXPR_DIM uses codegen'd element_at sums; above that the
    zip_with/aggregate HOF form keeps the plan compiling at any d
    (d=1024 asserted in tests/test_embedding_drift.py)."""
    d = len(vec)
    if metric == "cosine":
        vnorm = float(np.linalg.norm(vec))
        dot = _dot_lit(col, vec)
        rn = _row_norm(col, d)
        return F.when(
            (rn > 0) & F.lit(vnorm > 0), 1.0 - dot / (rn * F.lit(vnorm))
        ).otherwise(F.lit(1.0))
    # euclidean / sqrt(d) (embedding.py:189-190 normalization)
    if d <= VECTOR_EXPR_DIM:
        sq = sum(
            (
                F.pow(F.element_at(F.col(col), i + 1).cast("double") - float(v), 2)
                for i, v in enumerate(vec)
            ),
            F.lit(0.0),
        )
    else:
        diffs = F.zip_with(
            F.col(col).cast("array<double>"), _lit_arr(vec), lambda x, y: (x - y) * (x - y)
        )
        sq = F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)
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


def _dist_to_vec_col(e: Column, cvec: Column, metric: str) -> Column:
    """Per-row distance of array column `e` to a PER-ROW centroid array
    column `cvec` (same value within a group) — pure HOF, any d."""
    ed = e.cast("array<double>")
    if metric == "cosine":
        dot = F.aggregate(
            F.zip_with(ed, cvec, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        rn = F.sqrt(F.aggregate(ed, F.lit(0.0), lambda a, x: a + x * x))
        cn = F.sqrt(F.aggregate(cvec, F.lit(0.0), lambda a, x: a + x * x))
        return F.when((rn > 0) & (cn > 0), 1.0 - dot / (rn * cn)).otherwise(F.lit(1.0))
    sq = F.aggregate(
        F.zip_with(ed, cvec, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return F.sqrt(sq) / F.sqrt(F.size(cvec).cast("double"))


def grouped_embedding_drift(
    df: DataFrame,
    keys: list[str],
    col: str = "embedding",
    side_col: str = "side",
    metric: str = "cosine",
    detector_threshold: float = EMBEDDING_DETECTOR_THRESHOLD,
    min_samples: int = MIN_SAMPLES,
) -> DataFrame:
    """Per-group C6-C9 for ALL groups in ONE plan — no Python anywhere.

    The reference loops the embedding detector per (provider, model)
    (``monitoring/metrics.py:436-484``, ``detectors/__init__.py:58-86``)
    — with the r2 fused single-pair path that is still 3 actions x
    #groups.  Here every group rides one plan:

    1. posexplode -> groupBy(keys, pos): per-group per-dim centroid
       components + row counts (map-side combined — the shuffle carries
       tasks x groups x d partial rows, never N x d);
    2. groupBy(keys): reassemble centroid ARRAYS via
       transform(array_sort(collect_list(struct(pos, avg)))), compute
       the C6 centroid distance natively (HOF dot/norms);
    3. broadcast the #groups-row centroid frame back onto the rows and
       take one groupBy(keys) aggregate for the three mean distances
       (C7 dispersion both sides + C8 distance-to-ref-centroid).

    C9 weights (0.6/0.2/0.2) and min-sample gating are applied in the
    final projection.  MMD (C10) is intentionally omitted here — it is
    a sampled driver-side kernel in the reference too; use
    :func:`embedding_drift` per pair when MMD is required.

    Input is the tagged-union shape of :func:`~.grouped.tag_windows`:
    group key columns + ``side_col`` ('ref'/'cur') + the array column.
    """
    # size > 0 alongside the null filter: an empty array emits no
    # posexplode rows (excluded from centroids and n_ref/n_cur) but
    # would still reach the distance aggregate, where the cosine
    # otherwise-branch scores it 1.0 and inflates ref_intra/cur_intra/
    # avg_dist_to_ref — row counts, centroids, and distances must
    # cover the same population (ADVICE r3).
    base = df.where(F.col(col).isNotNull() & (F.size(F.col(col)) > 0)).select(
        *keys,
        (F.col(side_col) == "ref").cast("int").alias("is_ref"),
        F.col(col).alias("e"),
    )
    is_r = F.col("is_ref") == 1
    x = F.col("x").cast("double")
    cent = (
        base.select(*keys, "is_ref", F.posexplode("e").alias("pos", "x"))
        .groupBy(*keys, "pos")
        .agg(
            F.avg(F.when(is_r, x)).alias("a"),
            F.avg(F.when(~is_r, x)).alias("b"),
            F.count(F.when(is_r, 1)).alias("nr"),
            F.count(F.when(~is_r, 1)).alias("nc"),
        )
    )
    centv = cent.groupBy(*keys).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "a"))), lambda s: s["a"]
        ).alias("c_ref"),
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "b"))), lambda s: s["b"]
        ).alias("c_cur"),
        F.max("nr").alias("n_ref"),
        F.max("nc").alias("n_cur"),
    )
    # C6 between the two centroid arrays, natively per group
    if metric == "cosine":
        dot = F.aggregate(
            F.zip_with(F.col("c_ref"), F.col("c_cur"), lambda p, q: p * q),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        rn = F.sqrt(F.aggregate(F.col("c_ref"), F.lit(0.0), lambda a, v: a + v * v))
        cn = F.sqrt(F.aggregate(F.col("c_cur"), F.lit(0.0), lambda a, v: a + v * v))
        cd = F.when((rn > 0) & (cn > 0), 1.0 - dot / (rn * cn)).otherwise(F.lit(1.0))
    else:
        sq = F.aggregate(
            F.zip_with(F.col("c_ref"), F.col("c_cur"), lambda p, q: (p - q) * (p - q)),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        cd = F.sqrt(sq) / F.sqrt(F.size(F.col("c_ref")).cast("double"))
    centv = centv.withColumn("centroid_distance", cd)

    rows = base.join(F.broadcast(centv), keys)
    out = rows.groupBy(*keys).agg(
        F.first("n_ref").alias("n_ref"),
        F.first("n_cur").alias("n_cur"),
        F.first("centroid_distance").alias("centroid_distance"),
        F.avg(F.when(is_r, _dist_to_vec_col(F.col("e"), F.col("c_ref"), metric))).alias(
            "ref_intra"
        ),
        F.avg(
            F.when(~is_r, _dist_to_vec_col(F.col("e"), F.col("c_cur"), metric))
        ).alias("cur_intra"),
        F.avg(
            F.when(~is_r, _dist_to_vec_col(F.col("e"), F.col("c_ref"), metric))
        ).alias("avg_dist_to_ref"),
    )
    gated = (F.col("n_ref") < min_samples) | (F.col("n_cur") < min_samples)
    vc = F.abs(F.col("cur_intra") - F.col("ref_intra")) / F.greatest(
        F.col("ref_intra"), F.lit(1e-10)
    )
    score = (
        0.6 * F.col("centroid_distance") + 0.2 * vc + 0.2 * F.col("avg_dist_to_ref")
    )
    zero = lambda c: F.when(gated, F.lit(0.0)).otherwise(c).cast("double")  # noqa: E731
    return out.select(
        *keys,
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        zero(F.col("centroid_distance")).alias("centroid_distance"),
        zero(vc).alias("variance_change"),
        zero(F.col("avg_dist_to_ref")).alias("avg_dist_to_ref"),
        zero(F.col("ref_intra")).alias("ref_intra"),
        zero(F.col("cur_intra")).alias("cur_intra"),
        zero(score).alias("drift_score"),
        (~gated & (score > detector_threshold)).alias("drift_detected"),
        gated.alias("gated"),
    )


def grouped_embedding_drift_exact(
    df: DataFrame,
    keys: list[str],
    col: str = "embedding",
    side_col: str = "side",
    metric: str = "cosine",
    use_mmd: bool = True,
    mmd_cap: int = 1000,
    seed: int = 42,
    detector_threshold: float = EMBEDDING_DETECTOR_THRESHOLD,
    min_samples: int = MIN_SAMPLES,
) -> DataFrame:
    """Per-group embedding drift WITH the sampled MMD kernel (C6-C10),
    all groups in one ``groupBy(keys).applyInPandas`` job.

    The two-tier design mirrors the distribution family
    (``grouped.py``): :func:`grouped_embedding_drift` is the fully
    native 10^12-row path (no MMD — C10 is a sampled kernel in the
    reference too); this variant is the provider/model-sized-groups
    tier where each group's rows fit one worker, and adds the exact
    0.5/0.5 MMD blend of the single-pair detector.  Numpy kernel
    mirrors :func:`embedding_drift` bit-for-bit; when a side is under
    ``mmd_cap`` its full set is the sample, so results equal the fused
    single-pair path exactly (tested).
    """
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in keys
    )
    out_schema = (
        f"{key_fields}, n_ref bigint, n_cur bigint, centroid_distance double, "
        "variance_change double, avg_dist_to_ref double, ref_intra double, "
        "cur_intra double, mmd double, drift_score double, "
        "drift_detected boolean, gated boolean"
    )

    import pandas as pd

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        keyvals = {k: pdf[k].iloc[0] for k in keys}
        sub = pdf.dropna(subset=[col])
        r = np.stack(sub.loc[sub[side_col] == "ref", col].to_numpy()) if (
            (sub[side_col] == "ref").any()
        ) else np.empty((0, 0))
        c = np.stack(sub.loc[sub[side_col] == "cur", col].to_numpy()) if (
            (sub[side_col] == "cur").any()
        ) else np.empty((0, 0))
        out = {
            **keyvals,
            "n_ref": len(r),
            "n_cur": len(c),
            "centroid_distance": 0.0,
            "variance_change": 0.0,
            "avg_dist_to_ref": 0.0,
            "ref_intra": 0.0,
            "cur_intra": 0.0,
            "mmd": 0.0,
            "drift_score": 0.0,
            "drift_detected": False,
            "gated": False,
        }
        if len(r) < min_samples or len(c) < min_samples:
            out["gated"] = True
            return pd.DataFrame([out])
        r = r.astype(np.float64)
        c = c.astype(np.float64)
        c_ref, c_cur = r.mean(axis=0), c.mean(axis=0)
        cd = _np_dist(c_ref, c_cur, metric)

        def mean_dist(m: np.ndarray, v: np.ndarray) -> float:
            if metric == "cosine":
                vn = np.linalg.norm(v)
                rn = np.linalg.norm(m, axis=1)
                dots = m @ v
                d = np.where(
                    (rn > 0) & (vn > 0), 1.0 - dots / (rn * vn), 1.0
                )
                return float(d.mean())
            return float(
                (np.linalg.norm(m - v[None, :], axis=1) / math.sqrt(len(v))).mean()
            )

        ri, ci = mean_dist(r, c_ref), mean_dist(c, c_cur)
        ad = mean_dist(c, c_ref)
        vc = abs(ci - ri) / max(ri, 1e-10)
        score = 0.6 * cd + 0.2 * vc + 0.2 * ad
        out.update(
            centroid_distance=cd, variance_change=vc, avg_dist_to_ref=ad,
            ref_intra=ri, cur_intra=ci,
        )
        if use_mmd and len(r) > 10 and len(c) > 10:
            rng = np.random.default_rng(seed)
            x = r if len(r) <= mmd_cap else r[
                rng.choice(len(r), mmd_cap, replace=False)
            ]
            y = c if len(c) <= mmd_cap else c[
                rng.choice(len(c), mmd_cap, replace=False)
            ]
            mmd = mmd_cosine(x, y)
            out["mmd"] = mmd
            score = 0.5 * score + 0.5 * min(mmd, 1.0)
        out["drift_score"] = float(score)
        out["drift_detected"] = bool(score > detector_threshold)
        return pd.DataFrame([out])

    return df.groupBy(*keys).applyInPandas(compute, schema=out_schema)


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
    """Full reference embedding-detector semantics (C6-C10), FUSED.

    <= 3 Spark actions total (asserted in tests), each one pass:
    1. one tagged-union posexplode aggregate: BOTH centroids + BOTH row
       counts in a single groupBy(pos) job (map-side combined — tasks
       shuffle at most d tiny partial rows, codegen-safe at any d);
    2. one tagged-union aggregate computing all three mean distances
       (ref->c_ref, cur->c_cur, cur->c_ref) against the collected
       centroid literals;
    3. one union window-sample job for the two MMD subsamples.
    Gated runs (either side under min_samples) stop after action 1.
    The reference orchestrates the same math eagerly per frame
    (``detectors/embedding.py:60-248``); r2's version issued ~9 actions.
    """
    from pyspark.sql import Window

    tagged = (
        ref.where(F.col(col).isNotNull())
        .select(F.col(col).alias("e"), F.lit(1).alias("is_ref"))
        .unionByName(
            cur.where(F.col(col).isNotNull())
            .select(F.col(col).alias("e"), F.lit(0).alias("is_ref"))
        )
    )

    # --- action 1: counts + both centroids, one posexplode aggregate ---
    is_r = F.col("is_ref") == 1
    stats = (
        tagged.select("is_ref", F.posexplode("e").alias("pos", "x"))
        .groupBy("pos")
        .agg(
            F.avg(F.when(is_r, F.col("x").cast("double"))).alias("a"),
            F.avg(F.when(~is_r, F.col("x").cast("double"))).alias("b"),
            F.count(F.when(is_r, 1)).alias("nr"),
            F.count(F.when(~is_r, 1)).alias("nc"),
        )
        .collect()
    )
    n_ref = max((int(r.nr) for r in stats), default=0)
    n_cur = max((int(r.nc) for r in stats), default=0)
    result: dict = {
        "metric_name": "embedding_distance",
        "reference_size": n_ref,
        "current_size": n_cur,
        "threshold": detector_threshold,
    }
    if n_ref < min_samples or n_cur < min_samples:
        result.update({"drift_score": 0.0, "drift_detected": False, "gated": True})
        return result

    dim = len(stats)
    by_pos = {int(r.pos): r for r in stats}
    c_ref = np.array([by_pos[i].a for i in range(dim)], dtype=np.float64)
    c_cur = np.array([by_pos[i].b for i in range(dim)], dtype=np.float64)
    centroid_distance = _np_dist(c_ref, c_cur, metric)

    # --- action 2: all three mean distances in one pass ---
    drow = tagged.agg(
        F.avg(F.when(is_r, _dist_to_lit("e", c_ref, metric))).alias("ri"),
        F.avg(F.when(~is_r, _dist_to_lit("e", c_cur, metric))).alias("ci"),
        F.avg(F.when(~is_r, _dist_to_lit("e", c_ref, metric))).alias("ar"),
    ).collect()[0]
    ref_intra = float(drow.ri or 0.0)
    cur_intra = float(drow.ci or 0.0)
    avg_dist_to_ref = float(drow.ar or 0.0)
    variance_change = abs(cur_intra - ref_intra) / max(ref_intra, 1e-10)

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
        # --- action 3: both <=cap subsamples in ONE window job ---
        # The two-value partition key would force each ENTIRE side
        # through one task (full sort of N rows to keep cap): thin each
        # side first with a Bernoulli gate sized from the counts action
        # 1 already paid for (~3x cap expected survivors, shortfall
        # probability ~0), so the per-side window sorts a bounded frame.
        # When a side is small the fraction is 1.0 and every row
        # survives — selection is then identical to the unthinned job.
        frac_ref = min(1.0, 3.0 * mmd_cap / max(n_ref, 1))
        frac_cur = min(1.0, 3.0 * mmd_cap / max(n_cur, 1))
        gate = F.rand(seed + 1) < F.when(
            F.col("is_ref") == 1, F.lit(frac_ref)
        ).otherwise(F.lit(frac_cur))
        w = Window.partitionBy("is_ref").orderBy(F.rand(seed))
        rows = (
            tagged.where(gate)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= mmd_cap)
            .select("is_ref", "e")
            .collect()
        )
        x = np.array([r.e for r in rows if r.is_ref == 1], dtype=np.float64)
        y = np.array([r.e for r in rows if r.is_ref == 0], dtype=np.float64)
        mmd = mmd_cosine(x, y)
        analysis["mmd"] = mmd
        drift_score = 0.5 * drift_score + 0.5 * min(mmd, 1.0)

    result["drift_score"] = float(drift_score)
    result["drift_detected"] = drift_score > detector_threshold
    result["analysis"] = analysis
    return result
