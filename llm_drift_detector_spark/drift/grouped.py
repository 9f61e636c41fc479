"""Per-group drift detection in ONE Spark job.

The reference loops detectors per (provider, model)
(``monitoring/metrics.py:436-484`` builds per-provider frames;
``detectors/__init__.py:58-86`` calls each detector per provider) — one
Python call per group.  On Spark that pattern costs a full job per
group; with thousands of provider/model (or feature) groups it is the
#1 scalability trap.  This module runs EVERY group in one shuffle:

- :func:`grouped_distribution_drift` — ``groupBy(keys).applyInPandas``
  computing the exact KS/JS/PSI/Wasserstein/Welch-t suite per group in
  numpy (SURVEY §2.5 C1's mandated style: "a grouped pandas UDF
  computing D + asymptotic p per group").  Each group's rows flow
  through Arrow to ONE python worker; groups are processed in parallel
  across executors.  Per-group data must fit in worker memory — the
  right tool when groups are provider/model-sized.  P-values use the
  same pure-numpy tails as the single-pair path (stattests).
- :func:`grouped_distribution_drift_binned` — the 10^12-row path:
  NO Python at all.  One aggregate computes per-group range/moments/
  quantile edges; rows bin against their group's range; one
  groupBy(keys, grid, bin) counts both sides; windowed cumulative sums
  per group turn the bins into a binned ECDF for KS/W1.  Per-group
  state is O(nbins) regardless of group size, every reduction is a
  native expression, and the only shuffles are two hash exchanges on
  the group keys (the ranges join broadcasts — #groups rows).

Formula parity: both variants reproduce the single-pair comparators'
arithmetic exactly (same epsilon/density/normalize sequence, same
``count-of-edges-strictly-below`` PSI bucket rule), so results are
DuckDB-oracle-checkable per group (see __spark_entry__
``drift_by_group_events``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..config import (
    DISTRIBUTION_METHODS,
    EPS,
    MIN_SAMPLES,
)
from .stattests import ks_2samp_p, welch_t

_METRIC_FIELDS = (
    "n_ref bigint, n_cur bigint, ks_d double, ks_p double, js double, "
    "psi double, wd double, wd_norm double, t_stat double, t_p double, "
    "drift_score double, drift_detected boolean, gated boolean"
)


def _pair_metrics_np(
    r: np.ndarray,
    c: np.ndarray,
    nbins: int,
    psi_nbins: int,
    min_samples: int,
    methods: dict[str, tuple[float, float]],
) -> dict:
    """Exact one-pair metric suite in numpy — the per-group kernel.

    Mirrors the Spark frame builders bit-for-bit:
    - KS/W1 over the union ECDF (ties share cumulative mass);
    - JS via equal-width density + 1e-10 epsilon + renormalize
      (``distribution.py:289-300``), shared [min,max] range;
    - PSI over reference-quantile bins, bucket = #edges strictly below v,
      ``(count/total + eps) / (1 + nbins*eps)`` probabilities;
    - Welch t with the incomplete-beta p.
    """
    out = {
        "n_ref": len(r),
        "n_cur": len(c),
        "ks_d": 0.0,
        "ks_p": 1.0,
        "js": 0.0,
        "psi": 0.0,
        "wd": 0.0,
        "wd_norm": 0.0,
        "t_stat": 0.0,
        "t_p": 1.0,
        "drift_score": 0.0,
        "drift_detected": False,
        "gated": False,
    }
    if len(r) < min_samples or len(c) < min_samples:
        out["gated"] = True
        return out

    mn = min(r.min(), c.min())
    mx = max(r.max(), c.max())

    # --- KS + Wasserstein over the union ECDF ---
    all_v = np.unique(np.concatenate([r, c]))
    fr = np.searchsorted(np.sort(r), all_v, side="right") / float(len(r))
    fc = np.searchsorted(np.sort(c), all_v, side="right") / float(len(c))
    diff = np.abs(fr - fc)
    ks_d = float(diff.max()) if len(all_v) else 0.0
    wd = float(np.sum(diff[:-1] * np.diff(all_v))) if len(all_v) > 1 else 0.0
    value_range = max(float(r.max() - r.min()), float(c.max() - c.min()))
    out["ks_d"] = ks_d
    out["ks_p"] = ks_2samp_p(ks_d, len(r), len(c))
    out["wd"] = wd
    out["wd_norm"] = wd / value_range if value_range > 0 else 0.0

    # --- JS over the shared equal-width histogram ---
    if mx > mn:
        w = (mx - mn) / nbins
        br = np.minimum(np.floor((r - mn) / w), nbins - 1).astype(np.int64)
        bc = np.minimum(np.floor((c - mn) / w), nbins - 1).astype(np.int64)
        cr = np.bincount(br, minlength=nbins).astype(np.float64)
        cc = np.bincount(bc, minlength=nbins).astype(np.float64)
        dens_r = cr / (float(len(r)) * w) + EPS
        dens_c = cc / (float(len(c)) * w) + EPS
        p = dens_r / dens_r.sum()
        q = dens_c / dens_c.sum()
        m = (p + q) / 2.0
        out["js"] = float(0.5 * np.sum(p * np.log(p / m)) + 0.5 * np.sum(q * np.log(q / m)))

    # --- PSI over reference-quantile bins ---
    edges = np.percentile(r, [100.0 * i / psi_nbins for i in range(1, psi_nbins)])
    pb = (r[:, None] > edges[None, :]).sum(axis=1)
    qb = (c[:, None] > edges[None, :]).sum(axis=1)
    pcnt = np.bincount(pb, minlength=psi_nbins).astype(np.float64)
    qcnt = np.bincount(qb, minlength=psi_nbins).astype(np.float64)
    pp = (pcnt / pcnt.sum() + EPS) / (1.0 + psi_nbins * EPS)
    qq = (qcnt / qcnt.sum() + EPS) / (1.0 + psi_nbins * EPS)
    out["psi"] = float(np.sum((pp - qq) * np.log(pp / qq)))

    # --- Welch t ---
    vr = float(np.var(r, ddof=1)) if len(r) > 1 else 0.0
    vc = float(np.var(c, ddof=1)) if len(c) > 1 else 0.0
    t, _, t_p = welch_t(float(r.mean()), vr, len(r), float(c.mean()), vc, len(c))
    out["t_stat"], out["t_p"] = t, t_p

    # --- C5 combine + calibrated per-method verdict (as distribution_drift) ---
    scores = {
        "ks_test": (1.0 - out["ks_p"], out["ks_p"] < methods.get("ks_test", (0.05,))[0]),
        "js_divergence": (out["js"], out["js"] > methods.get("js_divergence", (0.2,))[0]),
        "wasserstein": (
            out["wd_norm"],
            out["wd_norm"] > methods.get("wasserstein", (0.1,))[0],
        ),
        "t_test": (1.0 - out["t_p"], out["t_p"] < methods.get("t_test", (0.05,))[0]),
        "psi": (out["psi"], out["psi"] > methods.get("psi", (0.2,))[0]),
    }
    total_w, combined = 0.0, 0.0
    detected = False
    for name, (thr, wt) in methods.items():
        if name not in scores:
            continue
        score, fired = scores[name]
        combined += min(score / thr, 1.0) * wt if thr > 0 else 0.0
        total_w += wt
        detected = detected or fired
    out["drift_score"] = combined / total_w if total_w > 0 else 0.0
    out["drift_detected"] = bool(detected)
    return out


def grouped_distribution_drift(
    df: DataFrame,
    keys: list[str],
    column: str,
    side_col: str = "side",
    nbins: int = 40,
    psi_nbins: int = 10,
    min_samples: int = MIN_SAMPLES,
    methods: dict[str, tuple[float, float]] | None = None,
) -> DataFrame:
    """Exact per-group drift suite — one row per key group, ONE job.

    ``df`` holds BOTH windows: group key columns + ``side_col``
    ('ref'/'cur') + the value column.  Callers with two separate frames
    tag and union them first (see :func:`tag_windows`).
    """
    meth = methods or DISTRIBUTION_METHODS
    key_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields if f.name in keys
    )
    out_schema = f"{key_fields}, {_METRIC_FIELDS}"

    def compute(pdf: pd.DataFrame) -> pd.DataFrame:
        keyvals = {k: pdf[k].iloc[0] for k in keys}
        vals = pdf[[side_col, column]].dropna(subset=[column])
        r = vals.loc[vals[side_col] == "ref", column].to_numpy(dtype=np.float64)
        c = vals.loc[vals[side_col] == "cur", column].to_numpy(dtype=np.float64)
        row = _pair_metrics_np(r, c, nbins, psi_nbins, min_samples, meth)
        return pd.DataFrame([{**keyvals, **row}])

    return df.groupBy(*keys).applyInPandas(compute, schema=out_schema)


def tag_windows(
    ref: DataFrame, cur: DataFrame, side_col: str = "side"
) -> DataFrame:
    """Union two windows with a side tag — input shape for the grouped
    detectors."""
    return ref.withColumn(side_col, F.lit("ref")).unionByName(
        cur.withColumn(side_col, F.lit("cur"))
    )


def grouped_distribution_drift_binned(
    df: DataFrame,
    keys: list[str],
    column: str,
    side_col: str = "side",
    nbins: int = 40,
    psi_nbins: int = 10,
    min_samples: int = MIN_SAMPLES,
    exact_edges: bool = False,
    approx_accuracy: int = 10000,
) -> DataFrame:
    """Binned per-group drift — NO Python anywhere, O(nbins) state per
    group: the 10^12-row scale path.

    Three native stages (two key-hash shuffles + one broadcast):
    1. per-group aggregate: counts, moments, shared range, reference
       quantile edges (``percentile_approx`` sketch by default;
       ``exact_edges=True`` for oracle parity);
    2. rows bin against their group's range (broadcast join of the
       #groups-row stats frame), explode into (grid, bin) pairs, one
       groupBy(keys, grid, bin) with map-side combine;
    3. per-group windowed cumsum over bins -> binned-ECDF KS/W1; JS/PSI
       from the same counts; Welch t from stage 1's moments.

    KS/W1 are the binned (sketch) estimates — identical in kind to the
    single-pair SKETCH mode; JS and PSI are exact (they are defined on
    the binned histogram).  Zero-mass bins are materialized per group
    (groups x range(nbins) — the epsilon must count for them) exactly as
    :func:`histogram_probs` does for one pair.
    """
    v = F.col(column).cast("double")
    base = df.where(v.isNotNull()).select(
        *keys, (F.col(side_col) == "ref").cast("int").alias("is_ref"), v.alias("v")
    )
    rv = F.when(F.col("is_ref") == 1, F.col("v"))
    cv = F.when(F.col("is_ref") == 0, F.col("v"))
    qs = [i / psi_nbins for i in range(1, psi_nbins)]
    if exact_edges:
        edges_expr = F.expr(
            "percentile(CASE WHEN is_ref = 1 THEN v END, "
            f"array({', '.join(f'{q}D' for q in qs)}))"
        )
    else:
        edges_expr = F.percentile_approx(rv, qs, approx_accuracy)

    st = base.groupBy(*keys).agg(
        F.count(rv).alias("n_ref"),
        F.count(cv).alias("n_cur"),
        F.avg(rv).alias("mean_ref"),
        F.coalesce(F.var_samp(rv), F.lit(0.0)).alias("var_ref"),
        F.avg(cv).alias("mean_cur"),
        F.coalesce(F.var_samp(cv), F.lit(0.0)).alias("var_cur"),
        F.min(F.col("v")).alias("mn"),
        F.max(F.col("v")).alias("mx"),
        (F.max(rv) - F.min(rv)).alias("range_ref"),
        (F.max(cv) - F.min(cv)).alias("range_cur"),
        edges_expr.alias("edges"),
    )

    # --- stage 2: bin every row against its group's range -----------------
    stats_b = F.broadcast(st.select(*keys, "mn", "mx", "edges"))
    joined = base.join(stats_b, keys)
    w = (F.col("mx") - F.col("mn")) / nbins
    js_bin = F.when(
        F.col("mx") > F.col("mn"),
        F.least(F.floor((F.col("v") - F.col("mn")) / w), F.lit(nbins - 1)),
    ).otherwise(F.lit(0))
    psi_bin = F.aggregate(
        F.col("edges"),
        F.lit(0),
        lambda acc, e: acc + (F.col("v") > e).cast("int"),
    )
    pairs = F.array(
        F.struct(F.lit(0).alias("__g"), js_bin.cast("int").alias("__bin")),
        F.struct(F.lit(1).alias("__g"), psi_bin.cast("int").alias("__bin")),
    )
    counts = (
        joined.select(*keys, "is_ref", F.explode(pairs).alias("gb"))
        .groupBy(*keys, F.col("gb.__g").alias("__g"), F.col("gb.__bin").alias("__bin"))
        .agg(
            F.sum("is_ref").alias("cr"),
            F.sum(1 - F.col("is_ref")).alias("cc"),
        )
    )

    # --- stage 3: densify bins, native reductions per group ---------------
    spark = df.sparkSession
    bins = spark.range(nbins).select(
        F.lit(0).alias("__g"), F.col("id").cast("int").alias("__bin")
    ).unionAll(
        spark.range(psi_nbins).select(
            F.lit(1).alias("__g"), F.col("id").cast("int").alias("__bin")
        )
    )
    # carry ALL per-group stats through the bins frame so the final
    # reduction needs no extra join back to st (st still executes twice —
    # once here, once inside the binning broadcast — vs three times in
    # the naive dense+join-metrics shape)
    st_cols = [
        "n_ref", "n_cur", "mn", "mx",
        "mean_ref", "var_ref", "mean_cur", "var_cur", "range_ref", "range_cur",
    ]
    dense = (
        st.select(*keys, *st_cols)
        .join(F.broadcast(bins), how="cross")
        .join(counts, [*keys, "__g", "__bin"], "left")
        .fillna(0, subset=["cr", "cc"])
    )
    width = (F.col("mx") - F.col("mn")) / nbins
    # try_divide everywhere a group can be one-sided (e.g. a violation
    # class present only in the CURRENT window -> n_ref = 0): ANSI mode
    # raises DIVIDE_BY_ZERO otherwise; the nulls land only in rows the
    # min-sample gate zeroes at the end.
    # JS grid densities (g=0): count/(n*w) + eps, renormalized per side
    dens_r = F.try_divide(F.col("cr"), F.col("n_ref") * width) + F.lit(EPS)
    dens_c = F.try_divide(F.col("cc"), F.col("n_cur") * width) + F.lit(EPS)
    grp = Window.partitionBy(*keys, "__g")
    p0 = F.try_divide(dens_r, F.sum(dens_r).over(grp))
    q0 = F.try_divide(dens_c, F.sum(dens_c).over(grp))
    # PSI grid probabilities (g=1)
    p1 = (F.try_divide(F.col("cr"), F.sum("cr").over(grp)) + EPS) / (1.0 + psi_nbins * EPS)
    q1 = (F.try_divide(F.col("cc"), F.sum("cc").over(grp)) + EPS) / (1.0 + psi_nbins * EPS)
    cum = Window.partitionBy(*keys, "__g").orderBy("__bin").rowsBetween(
        Window.unboundedPreceding, 0
    )
    fp = F.sum(p0).over(cum)
    fq = F.sum(q0).over(cum)
    per_bin = dense.select(
        *keys,
        *st_cols,
        "__g",
        F.when(
            (F.col("__g") == 0) & (F.col("mx") > F.col("mn")),
            0.5 * p0 * F.log(p0 / ((p0 + q0) / 2))
            + 0.5 * q0 * F.log(q0 / ((p0 + q0) / 2)),
        ).otherwise(F.lit(0.0)).alias("js_term"),
        F.when(F.col("__g") == 1, (p1 - q1) * F.log(p1 / q1))
        .otherwise(F.lit(0.0))
        .alias("psi_term"),
        F.when((F.col("__g") == 0) & (F.col("mx") > F.col("mn")), F.abs(fp - fq))
        .otherwise(F.lit(0.0))
        .alias("ecdf_gap"),
        width.alias("width"),
    )
    out = per_bin.groupBy(*keys).agg(
        F.sum("js_term").cast("double").alias("js"),
        F.sum("psi_term").cast("double").alias("psi"),
        F.max("ecdf_gap").cast("double").alias("ks_d"),
        (F.sum("ecdf_gap") * F.first("width")).cast("double").alias("wd"),
        *[F.first(c).alias(c) for c in st_cols if c not in ("mn", "mx")],
    )
    value_range = F.greatest(F.col("range_ref"), F.col("range_cur"))
    se = F.try_divide(F.col("var_ref"), F.col("n_ref")) + F.try_divide(
        F.col("var_cur"), F.col("n_cur")
    )
    gated = (F.col("n_ref") < min_samples) | (F.col("n_cur") < min_samples)
    return out.select(
        *keys,
        F.col("n_ref").cast("bigint").alias("n_ref"),
        F.col("n_cur").cast("bigint").alias("n_cur"),
        *[
            F.when(gated, F.lit(0.0)).otherwise(c).cast("double").alias(name)
            for name, c in (
                ("ks_d", F.col("ks_d")),
                ("js", F.col("js")),
                ("psi", F.col("psi")),
                ("wd", F.col("wd")),
                (
                    "wd_norm",
                    F.when(value_range > 0, F.col("wd") / value_range).otherwise(0.0),
                ),
                (
                    "t_stat",
                    F.when(
                        se > 0,
                        (F.col("mean_ref") - F.col("mean_cur")) / F.sqrt(se),
                    ).otherwise(0.0),
                ),
            )
        ],
        gated.alias("gated"),
    )


def multi_feature_drift(
    ref: DataFrame,
    cur: DataFrame,
    columns: list[str],
    exact: bool = False,
    group_keys: list[str] | None = None,
    **kwargs,
) -> DataFrame:
    """Drift for MANY feature columns in ONE job — one row per feature
    (x group when ``group_keys`` is given).

    The reference's detector loops features inside one detect() call
    (``detectors/distribution.py:62-87``) AND loops that per provider
    (``monitoring/metrics.py:436-484``); the single-pair
    :func:`~..comparators.distribution_drift` is per-column (<=3 actions
    each).  This wrapper stacks the columns into (feature, v) rows and
    reuses the grouped detectors with the feature NAME as a group key,
    so N features cost the same shuffles as one.  ``group_keys``
    composes with the stack: the detector keys on
    (*group_keys, feature), so a full per-provider-per-feature sweep is
    STILL one job — #groups x #features grid, one pass over the data.
    ``exact=True`` routes through the applyInPandas suite (adds
    p-values; per-feature-per-group data must fit a worker); default is
    the fully-native binned path.
    """
    gk = list(group_keys or [])
    n = len(columns)
    args = ", ".join(f"'{c}', cast(`{c}` as double)" for c in columns)
    stack = f"stack({n}, {args}) AS (feature, v)"
    tagged = tag_windows(ref.selectExpr(*gk, stack), cur.selectExpr(*gk, stack))
    fn = grouped_distribution_drift if exact else grouped_distribution_drift_binned
    return fn(tagged, [*gk, "feature"], "v", **kwargs)
