"""Two-sample distribution comparators as Spark plan builders.

Reproduces the reference's detector semantics (``detectors/
distribution.py:183-306``) as native DataFrame aggregations:

- KS 2-sample (C1): exact mode = union + range-window ECDF, D = max|F1-F2|;
  sketch mode = D over the binned ECDF (same histogram as JS) — the only
  viable plan at 10^12 rows (a global sort is off the table).
- Jensen-Shannon (C2): two-pass equal-width histogram (Rice rule on
  n_ref+n_cur, shared [min,max] range), density + 1e-10 epsilon,
  normalize, natural-log JS — formula byte-for-byte from
  ``distribution.py:266-306``.
- Wasserstein (C3): 1-D EMD = integral |F1-F2| dx over the union grid
  (exact) or bin grid (sketch), normalized by the larger side range
  (``distribution.py:227-246``).
- Welch t (C4): closed form from per-side (n, mean, var_samp) aggregates;
  p-value via numpy incomplete beta on the collected scalars.
- PSI (C17, graft addition): same bins, sum((p-q) * ln(p/q)).

Binning note: buckets are computed as
``least(floor((x - min) / w), nbins - 1)`` with ``w = (max-min)/nbins``
on BOTH Spark and the DuckDB/numpy oracles — IEEE arithmetic is
deterministic across engines, so bucket assignment matches exactly
(np.histogram's linspace-edge search can differ by one ulp on integer
edges; we standardize on the floor form, same left-closed semantics).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..config import (
    DISTRIBUTION_DETECTOR_THRESHOLD,
    DISTRIBUTION_METHODS,
    EPS,
    EXACT,
    HISTOGRAM_MAX_BINS,
    MIN_SAMPLES,
    StatsMode,
)
from .stattests import ks_2samp_p, welch_t


def rice_bins(n_total: int, cap: int = HISTOGRAM_MAX_BINS) -> int:
    """Rice rule ceil(2 * n^(1/3)) (``distribution.py:286-287``), capped."""
    return max(1, min(cap, int(math.ceil(2.0 * n_total ** (1.0 / 3.0)))))


def shared_range(ref: DataFrame, cur: DataFrame, column: str) -> tuple[float, float, int, int]:
    """Global [min,max] + per-side counts — pass 1 of the histogram."""
    a = ref.agg(
        F.min(F.col(column).cast("double")).alias("mn"),
        F.max(F.col(column).cast("double")).alias("mx"),
        F.count(column).alias("n"),
    ).collect()[0]
    b = cur.agg(
        F.min(F.col(column).cast("double")).alias("mn"),
        F.max(F.col(column).cast("double")).alias("mx"),
        F.count(column).alias("n"),
    ).collect()[0]
    mn = min(x for x in (a.mn, b.mn) if x is not None)
    mx = max(x for x in (a.mx, b.mx) if x is not None)
    return mn, mx, int(a.n), int(b.n)


def _bucket(col, mn: float, w: float, nbins: int):
    return F.least(
        F.floor((col.cast("double") - F.lit(mn)) / F.lit(w)), F.lit(nbins - 1)
    ).cast("int")


def histogram_probs(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    nbins: int | None = None,
    range_stats: tuple[float, float, int, int] | None = None,
) -> DataFrame:
    """Per-bin probability vectors for both sides: (bin, p, q).

    p/q reproduce the reference's ``np.histogram(density=True)`` + 1e-10
    epsilon + renormalize sequence (``distribution.py:289-300``).  Bins
    with zero mass are materialized (the epsilon must count for them),
    via a ``spark.range(nbins)`` outer join — nbins <= 512 rows, trivially
    broadcast.  Pass 2 of the two-pass plan: one groupBy per side with
    map-side partial aggregation.
    """
    if range_stats is None:
        range_stats = shared_range(ref, cur, column)
    mn, mx, n_ref, n_cur = range_stats
    if nbins is None:
        nbins = rice_bins(n_ref + n_cur)
    if mx <= mn:
        # degenerate range: reference returns JS=0 (distribution.py:283-284)
        spark = ref.sparkSession
        return spark.range(0).selectExpr(
            "cast(id as int) bin", "cast(0.0 as double) p", "cast(0.0 as double) q"
        )
    w = (mx - mn) / nbins
    spark = ref.sparkSession

    def side_counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.where(F.col(column).isNotNull())
            .groupBy(_bucket(F.col(column), mn, w, nbins).alias("bin"))
            .agg(F.count("*").alias(name))
        )

    bins = spark.range(nbins).select(F.col("id").cast("int").alias("bin"))
    joined = (
        bins.join(side_counts(ref, "cr"), "bin", "left")
        .join(side_counts(cur, "cc"), "bin", "left")
        .fillna(0, subset=["cr", "cc"])
    )
    # density = count / (n * w); add eps; normalize by the side's sum
    dens_r = F.col("cr") / F.lit(float(n_ref) * w) + F.lit(EPS)
    dens_c = F.col("cc") / F.lit(float(n_cur) * w) + F.lit(EPS)
    sum_r = F.sum(dens_r).over(Window.partitionBy())
    sum_c = F.sum(dens_c).over(Window.partitionBy())
    return joined.select(
        "bin",
        (dens_r / sum_r).alias("p"),
        (dens_c / sum_c).alias("q"),
    )


def js_psi_frame(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    nbins: int | None = None,
) -> DataFrame:
    """One row: (js double, psi double) — fully Spark-native reduction."""
    probs = histogram_probs(ref, cur, column, nbins=nbins)
    p, q = F.col("p"), F.col("q")
    m = (p + q) / 2
    return probs.agg(
        (
            F.sum(p * F.log(p / m)) * 0.5 + F.sum(q * F.log(q / m)) * 0.5
        ).alias("js"),
        F.sum((p - q) * F.log(p / q)).alias("psi"),
    ).select(
        F.coalesce(F.col("js"), F.lit(0.0)).cast("double").alias("js"),
        F.coalesce(F.col("psi"), F.lit(0.0)).cast("double").alias("psi"),
    )


def ref_quantile_edges(
    ref: DataFrame, column: str, nbins: int = 10, mode: StatsMode = EXACT
) -> list[float]:
    """Internal quantile edges (nbins-1 of them) of the REFERENCE side.

    Exact mode: `percentile` (linear interpolation); sketch mode:
    `percentile_approx` — the 10^12-row path.
    """
    qs = [i / nbins for i in range(1, nbins)]
    c = F.col(column).cast("double")
    if mode.exact:
        arr = F.expr(
            f"percentile(cast({column} as double), array({', '.join(f'{q}D' for q in qs)}))"
        )
    else:
        arr = F.percentile_approx(c, qs, mode.approx_percentile_accuracy)
    row = ref.agg(arr.alias("edges")).collect()[0]
    return [float(x) for x in (row.edges or [])]


def psi_frame(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    nbins: int = 10,
    mode: StatsMode = EXACT,
) -> DataFrame:
    """One row: (psi double) — PSI over reference-decile bins.

    The equal-width PSI in :func:`js_psi_frame` shares the JS histogram
    but inherits its tail sensitivity: a sparse tail bin on one side vs
    the epsilon on the other inflates (p-q)*ln(p/q) even for identical
    distributions.  The standard PSI construction bins by REFERENCE
    quantiles (deciles by default) so expected mass per bin is 1/nbins;
    this is the variant the detector verdict uses.

    Bucket rule: bucket(v) = #edges strictly below v — identical literal
    comparisons on Spark/DuckDB/numpy, no float-edge ambiguity.
    """
    edges = ref_quantile_edges(ref, column, nbins, mode)
    spark = ref.sparkSession
    if not edges:
        return spark.range(1).select(F.lit(0.0).alias("psi"))
    v = F.col(column).cast("double")
    bucket = sum(
        ((v > F.lit(e)).cast("int") for e in edges), F.lit(0)
    ).alias("bin")

    def side_probs(df: DataFrame, cname: str):
        return (
            df.where(v.isNotNull())
            .groupBy(bucket)
            .agg(F.count("*").alias(cname))
        )

    bins = spark.range(nbins).select(F.col("id").cast("int").alias("bin"))
    j = (
        bins.join(side_probs(ref, "cr"), "bin", "left")
        .join(side_probs(cur, "cc"), "bin", "left")
        .fillna(0, subset=["cr", "cc"])
    )
    sum_r = F.sum("cr").over(Window.partitionBy())
    sum_c = F.sum("cc").over(Window.partitionBy())
    probs = j.select(
        ((F.col("cr") / sum_r + F.lit(EPS)) / (F.lit(1.0) + F.lit(nbins * EPS))).alias("p"),
        ((F.col("cc") / sum_c + F.lit(EPS)) / (F.lit(1.0) + F.lit(nbins * EPS))).alias("q"),
    )
    p, q = F.col("p"), F.col("q")
    return probs.agg(
        F.coalesce(F.sum((p - q) * F.log(p / q)), F.lit(0.0))
        .cast("double")
        .alias("psi")
    )


def _union_ecdf(ref: DataFrame, cur: DataFrame, column: str) -> DataFrame:
    """Union both sides with cumulative per-side counts over the value order.

    rangeBetween (not rowsBetween) so ties contribute all their mass to
    the ECDF at that value — required for exact KS with repeated values.
    EXACT MODE ONLY: the empty-partitionBy window is a single-task global
    sort; at scale use the binned (sketch) variants.
    """
    u = ref.select(
        F.col(column).cast("double").alias("v"), F.lit(1).alias("r"), F.lit(0).alias("c")
    ).unionAll(
        cur.select(
            F.col(column).cast("double").alias("v"),
            F.lit(0).alias("r"),
            F.lit(1).alias("c"),
        )
    ).where(F.col("v").isNotNull())
    w = Window.orderBy("v").rangeBetween(Window.unboundedPreceding, 0)
    return u.select(
        "v", F.sum("r").over(w).alias("cum_r"), F.sum("c").over(w).alias("cum_c")
    )


def ks_frame(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    mode: StatsMode = EXACT,
) -> DataFrame:
    """One row: (ks_d double) — the two-sample KS statistic."""
    if mode.exact:
        _, _, n_ref, n_cur = shared_range(ref, cur, column)
        e = _union_ecdf(ref, cur, column)
        return e.agg(
            F.max(
                F.abs(
                    F.col("cum_r") / F.lit(float(n_ref))
                    - F.col("cum_c") / F.lit(float(n_cur))
                )
            ).cast("double").alias("ks_d")
        )
    # sketch: D over the binned ECDF (bin grid = ecdf_bins equal-width)
    rs = shared_range(ref, cur, column)
    probs = histogram_probs(ref, cur, column, nbins=mode.ecdf_bins, range_stats=rs)
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = probs.select(
        F.sum("p").over(w).alias("fp"), F.sum("q").over(w).alias("fq")
    )
    return cum.agg(F.max(F.abs(F.col("fp") - F.col("fq"))).cast("double").alias("ks_d"))


def wasserstein_frame(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    mode: StatsMode = EXACT,
) -> DataFrame:
    """One row: (wd double, wd_norm double).

    Exact: W1 = sum over union grid of |F1 - F2| * (next_v - v); the
    range-normalized form divides by max(range_ref, range_cur)
    (``distribution.py:236-246``).
    """
    a = ref.agg(
        F.min(F.col(column).cast("double")).alias("mn"),
        F.max(F.col(column).cast("double")).alias("mx"),
        F.count(column).alias("n"),
    ).collect()[0]
    b = cur.agg(
        F.min(F.col(column).cast("double")).alias("mn"),
        F.max(F.col(column).cast("double")).alias("mx"),
        F.count(column).alias("n"),
    ).collect()[0]
    value_range = max(
        (a.mx or 0.0) - (a.mn or 0.0), (b.mx or 0.0) - (b.mn or 0.0)
    )
    if mode.exact:
        e = _union_ecdf(ref, cur, column)
        # one row per distinct value: the cum counts at that value
        per_v = e.groupBy("v").agg(
            F.max("cum_r").alias("cum_r"), F.max("cum_c").alias("cum_c")
        )
        nxt = F.lead("v").over(Window.orderBy("v"))
        steps = per_v.select(
            (
                F.abs(
                    F.col("cum_r") / F.lit(float(a.n))
                    - F.col("cum_c") / F.lit(float(b.n))
                )
                * (F.coalesce(nxt, F.col("v")) - F.col("v"))
            ).alias("area")
        )
        wd_col = F.coalesce(F.sum("area"), F.lit(0.0))
    else:
        mn = min(x for x in (a.mn, b.mn) if x is not None)
        mx = max(x for x in (a.mx, b.mx) if x is not None)
        probs = histogram_probs(
            ref, cur, column, nbins=mode.ecdf_bins, range_stats=(mn, mx, a.n, b.n)
        )
        w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        binw = (mx - mn) / mode.ecdf_bins if mx > mn else 0.0
        cum = probs.select(
            F.sum("p").over(w).alias("fp"), F.sum("q").over(w).alias("fq")
        )
        steps = cum.select(
            (F.abs(F.col("fp") - F.col("fq")) * F.lit(binw)).alias("area")
        )
        wd_col = F.coalesce(F.sum("area"), F.lit(0.0))
    denom = float(value_range) if value_range > 0 else None
    return steps.agg(wd_col.cast("double").alias("wd")).select(
        "wd",
        (F.col("wd") / F.lit(denom)).alias("wd_norm")
        if denom
        else F.lit(0.0).alias("wd_norm"),
    )


def two_sample_moments(ref: DataFrame, cur: DataFrame, column: str) -> DataFrame:
    """(side, n, mean, var_samp, stddev_pop, min, max) per side — one agg each."""

    def side(df: DataFrame, name: str) -> DataFrame:
        c = F.col(column).cast("double")
        return df.agg(
            F.lit(name).alias("side"),
            F.count(c).cast("bigint").alias("n"),
            F.avg(c).alias("mean"),
            F.coalesce(F.var_samp(c), F.lit(0.0)).alias("var_samp"),
            F.coalesce(F.stddev_pop(c), F.lit(0.0)).alias("stddev"),
            F.min(c).alias("min"),
            F.max(c).alias("max"),
        )

    return side(ref, "ref").unionByName(side(cur, "cur"))


def welch_t_frame(ref: DataFrame, cur: DataFrame, column: str) -> DataFrame:
    """One row: (t_stat double) — Welch t from native aggregates.

    The p-value needs the incomplete beta function, which has no SQL
    form; :func:`distribution_drift` computes it driver-side from the
    same aggregates (see stattests.welch_t).
    """
    m = two_sample_moments(ref, cur, column)
    piv = m.groupBy().pivot("side", ["ref", "cur"]).agg(
        F.first("mean").alias("mean"),
        F.first("var_samp").alias("var"),
        F.first("n").alias("n"),
    )
    se = F.col("ref_var") / F.col("ref_n") + F.col("cur_var") / F.col("cur_n")
    return piv.select(
        F.when(se > 0, (F.col("ref_mean") - F.col("cur_mean")) / F.sqrt(se))
        .otherwise(0.0)
        .cast("double")
        .alias("t_stat")
    )


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    methods: dict[str, tuple[float, float]] | None = None,
    mode: StatsMode = EXACT,
    detector_threshold: float = DISTRIBUTION_DETECTOR_THRESHOLD,
    min_samples: int = MIN_SAMPLES,
) -> dict:
    """Full reference distribution-detector semantics for one feature.

    Runs the per-method comparators, normalizes scores per C5
    (``min(score/threshold, 1)`` weighted mean), and applies the C18
    verdict (``drift_score > detector_threshold``).  Spark does every
    per-row/per-bin reduction; Python only touches collected aggregate
    scalars (<= nbins + a handful).

    Returns a dict shaped like the reference ``DriftResult``.
    """
    methods = methods or DISTRIBUTION_METHODS
    mn, mx, n_ref, n_cur = shared_range(ref, cur, column)
    result: dict = {
        "metric_name": "distribution_drift",
        "column": column,
        "reference_size": n_ref,
        "current_size": n_cur,
        "threshold": detector_threshold,
        "methods": {},
    }
    if n_ref < min_samples or n_cur < min_samples:
        # min-sample gate (detectors/base.py:127-157): score 0, no drift
        result.update({"drift_score": 0.0, "drift_detected": False, "gated": True})
        return result

    moments = {r["side"]: r for r in two_sample_moments(ref, cur, column).collect()}
    tests: dict[str, dict] = {}

    if "ks_test" in methods or "wasserstein" in methods:
        d = ks_frame(ref, cur, column, mode).collect()[0].ks_d or 0.0
        wrow = wasserstein_frame(ref, cur, column, mode).collect()[0]
        if "ks_test" in methods:
            thr, wt = methods["ks_test"]
            p = ks_2samp_p(float(d), n_ref, n_cur)
            tests["ks_test"] = {
                "statistic": float(d),
                "p_value": p,
                "score": 1.0 - p,
                "threshold": thr,
                "weight": wt,
                "drift_detected": p < thr,
            }
        if "wasserstein" in methods:
            thr, wt = methods["wasserstein"]
            tests["wasserstein"] = {
                "distance": float(wrow.wd),
                "score": float(wrow.wd_norm),
                "threshold": thr,
                "weight": wt,
                "drift_detected": float(wrow.wd_norm) > thr,
            }

    if "js_divergence" in methods:
        row = js_psi_frame(ref, cur, column).collect()[0]
        thr, wt = methods["js_divergence"]
        tests["js_divergence"] = {
            "divergence": float(row.js),
            "score": float(row.js),
            "threshold": thr,
            "weight": wt,
            "drift_detected": float(row.js) > thr,
        }
    if "psi" in methods:
        psi = float(psi_frame(ref, cur, column, mode=mode).collect()[0].psi)
        thr, wt = methods["psi"]
        tests["psi"] = {
            "psi": psi,
            "score": psi,
            "threshold": thr,
            "weight": wt,
            "drift_detected": psi > thr,
        }

    if "t_test" in methods:
        thr, wt = methods["t_test"]
        r, c = moments["ref"], moments["cur"]
        t, df, p = welch_t(r["mean"], r["var_samp"], r["n"], c["mean"], c["var_samp"], c["n"])
        tests["t_test"] = {
            "statistic": t,
            "p_value": p,
            "score": 1.0 - p,
            "threshold": thr,
            "weight": wt,
            "drift_detected": p < thr,
        }

    # C5: normalized weighted combine (distribution.py:89-104)
    total_w = sum(t["weight"] for t in tests.values())
    feature_drift = 0.0
    for t in tests.values():
        norm = min(t["score"] / t["threshold"], 1.0) if t["threshold"] > 0 else 0.0
        feature_drift += norm * t["weight"]
    feature_drift = feature_drift / total_w if total_w > 0 else 0.0

    result["methods"] = tests
    result["drift_score"] = feature_drift
    # Verdict note: the reference's C18 (`score > detector_threshold`,
    # base.py:184) applied to its own C5 normalization saturates — any
    # KS p < 0.95 normalizes to 1.0, so the combined verdict fires even
    # for identical distributions.  We report that combine verbatim as
    # `drift_detected_reference_combine` and gate the engine verdict on
    # the per-method thresholds the reference configures (ks p<0.05,
    # js>0.2, ... default_config.py:126-134) — the calibrated semantics.
    result["drift_detected_reference_combine"] = feature_drift > detector_threshold
    result["drift_detected"] = any(t["drift_detected"] for t in tests.values())
    result["ref_stats"] = {
        "mean": moments["ref"]["mean"],
        "std": moments["ref"]["stddev"],
        "min": moments["ref"]["min"],
        "max": moments["ref"]["max"],
    }
    result["curr_stats"] = {
        "mean": moments["cur"]["mean"],
        "std": moments["cur"]["stddev"],
        "min": moments["cur"]["min"],
        "max": moments["cur"]["max"],
    }
    return result
