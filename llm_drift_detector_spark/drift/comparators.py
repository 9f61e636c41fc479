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
    """Global [min,max] + per-side counts — pass 1 of the histogram.

    ONE aggregate over the tagged union (was two separate actions — half
    the driver round-trips for every two-pass comparator; guide §1.2:
    fewer passes first).  Global min/max over the union equals the
    min/max of the per-side values, and the per-side conditional counts
    are exactly the old per-frame ``F.count(column)``.
    """
    c = F.col(column).cast("double")
    u = ref.select(c.alias("v"), F.lit(1).alias("is_ref")).unionAll(
        cur.select(c.alias("v"), F.lit(0).alias("is_ref"))
    )
    row = u.agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count(F.when(F.col("is_ref") == 1, F.col("v"))).alias("n_ref"),
        F.count(F.when(F.col("is_ref") == 0, F.col("v"))).alias("n_cur"),
    ).collect()[0]
    if row.mn is None:
        # both sides empty/all-null: same contract as the old
        # min()-of-empty-sequence
        raise ValueError("shared_range: no non-null values on either side")
    return float(row.mn), float(row.mx), int(row.n_ref), int(row.n_cur)


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

    # BOTH sides' bin counts from ONE pass over the tagged union (the
    # old per-side groupBys scanned each input separately), and the
    # <=nbins-row count frame is broadcast against the bins spine — the
    # planner's estimate for an aggregate over a big scan is far above
    # the auto-broadcast threshold, so without the hint this 213-row
    # join ran as a sort-merge with two extra exchanges (guide §3.1).
    u = ref.select(F.col(column).alias("v"), F.lit(1).alias("is_ref")).unionAll(
        cur.select(F.col(column).alias("v"), F.lit(0).alias("is_ref"))
    )
    side_counts = (
        u.where(F.col("v").isNotNull())
        .groupBy(_bucket(F.col("v"), mn, w, nbins).alias("bin"))
        .agg(
            F.count(F.when(F.col("is_ref") == 1, True)).alias("cr"),
            F.count(F.when(F.col("is_ref") == 0, True)).alias("cc"),
        )
    )
    bins = spark.range(nbins).select(F.col("id").cast("int").alias("bin"))
    joined = bins.join(F.broadcast(side_counts), "bin", "left").fillna(
        0, subset=["cr", "cc"]
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
    v = F.col("v").cast("double")
    bucket = sum(
        ((v > F.lit(e)).cast("int") for e in edges), F.lit(0)
    ).alias("bin")

    # one pass over the tagged union for both sides' bucket counts +
    # broadcast against the bins spine (see histogram_probs)
    u = ref.select(F.col(column).alias("v"), F.lit(1).alias("is_ref")).unionAll(
        cur.select(F.col(column).alias("v"), F.lit(0).alias("is_ref"))
    )
    side_probs = (
        u.where(v.isNotNull())
        .groupBy(bucket)
        .agg(
            F.count(F.when(F.col("is_ref") == 1, True)).alias("cr"),
            F.count(F.when(F.col("is_ref") == 0, True)).alias("cc"),
        )
    )
    bins = spark.range(nbins).select(F.col("id").cast("int").alias("bin"))
    j = bins.join(F.broadcast(side_probs), "bin", "left").fillna(
        0, subset=["cr", "cc"]
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
        # ONE action: the side totals are the maxima of the cumulative
        # counts, read off the same sorted frame with an unbounded
        # window (same single sort task; was a separate count pass).
        # Explicit double casts keep the division fractional (Infinity/
        # NaN on an empty side, as the old float literals produced)
        # rather than ANSI integral division.
        e = _union_ecdf(ref, cur, column)
        wf = Window.orderBy("v").rangeBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
        d = F.abs(
            F.col("cum_r").cast("double") / F.max("cum_r").over(wf).cast("double")
            - F.col("cum_c").cast("double") / F.max("cum_c").over(wf).cast("double")
        )
        return e.select(d.alias("d")).agg(
            F.max("d").cast("double").alias("ks_d")
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
    # per-side range + count stats in ONE aggregate over the tagged
    # union (was two separate driver actions)
    c = F.col(column).cast("double")
    u = ref.select(c.alias("v"), F.lit(1).alias("is_ref")).unionAll(
        cur.select(c.alias("v"), F.lit(0).alias("is_ref"))
    )
    rv = F.when(F.col("is_ref") == 1, F.col("v"))
    cv = F.when(F.col("is_ref") == 0, F.col("v"))
    srow = u.agg(
        F.min(rv).alias("a_mn"),
        F.max(rv).alias("a_mx"),
        F.count(rv).alias("a_n"),
        F.min(cv).alias("b_mn"),
        F.max(cv).alias("b_mx"),
        F.count(cv).alias("b_n"),
    ).collect()[0]

    class _Side:
        def __init__(self, mn, mx, n):
            self.mn, self.mx, self.n = mn, mx, int(n)

    a = _Side(srow.a_mn, srow.a_mx, srow.a_n)
    b = _Side(srow.b_mn, srow.b_mx, srow.b_n)
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


def _tagged_union(ref: DataFrame, cur: DataFrame, column: str) -> DataFrame:
    """(v double, is_ref int) with nulls dropped — shared scan for the
    fused passes."""
    v = F.col(column).cast("double")
    return (
        ref.select(v.alias("v"), F.lit(1).alias("is_ref"))
        .unionAll(cur.select(v.alias("v"), F.lit(0).alias("is_ref")))
        .where(F.col("v").isNotNull())
    )


def _fused_two_sample_stats(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    edges_nbins: int | None = None,
    mode: StatsMode = EXACT,
):
    """Pass 1 of the fused detector: ONE aggregate over the tagged union
    computing per-side count/mean/var/std/min/max AND (optionally) the
    reference-side quantile edges for PSI.  Replaces what used to be
    five separate actions (shared_range x2 sides, two_sample_moments,
    ref_quantile_edges, wasserstein's range aggs)."""
    u = _tagged_union(ref, cur, column)
    rv = F.when(F.col("is_ref") == 1, F.col("v"))
    cv = F.when(F.col("is_ref") == 0, F.col("v"))

    def side(c, tag: str):
        return [
            F.count(c).alias(f"n_{tag}"),
            F.avg(c).alias(f"mean_{tag}"),
            F.coalesce(F.var_samp(c), F.lit(0.0)).alias(f"var_{tag}"),
            F.coalesce(F.stddev_pop(c), F.lit(0.0)).alias(f"std_{tag}"),
            F.min(c).alias(f"min_{tag}"),
            F.max(c).alias(f"max_{tag}"),
        ]

    aggs = side(rv, "ref") + side(cv, "cur")
    if edges_nbins:
        qs = [i / edges_nbins for i in range(1, edges_nbins)]
        if mode.exact:
            arr = F.expr(
                "percentile(CASE WHEN is_ref = 1 THEN v END, "
                f"array({', '.join(f'{q}D' for q in qs)}))"
            )
        else:
            arr = F.percentile_approx(rv, qs, mode.approx_percentile_accuracy)
        aggs.append(arr.alias("edges"))
    return u.agg(*aggs).collect()[0]


def _fused_bin_counts(
    ref: DataFrame, cur: DataFrame, column: str, grids: list
) -> dict[int, dict[int, tuple[int, int]]]:
    """Pass 2: one groupBy(grid, bin) computing BOTH sides' counts for
    EVERY requested binning at once (JS equal-width, PSI quantile
    buckets, sketch-ECDF grid).  `grids` is a list of bucket Columns
    over `v`; each input row explodes into len(grids) tiny (grid, bin)
    pairs that combine map-side, so one scan + one small shuffle covers
    every histogram the detector needs.  Zero-mass bins are filled
    driver-side (the collected result is <= sum(nbins) rows)."""
    u = _tagged_union(ref, cur, column)
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("g"), b.cast("int").alias("bin"))
            for i, b in enumerate(grids)
        ]
    )
    rows = (
        u.select("is_ref", F.explode(pairs).alias("gb"))
        .groupBy(F.col("gb.g").alias("g"), F.col("gb.bin").alias("bin"))
        .agg(
            F.sum("is_ref").alias("cr"),
            F.sum(1 - F.col("is_ref")).alias("cc"),
        )
        .collect()
    )
    out: dict[int, dict[int, tuple[int, int]]] = {i: {} for i in range(len(grids))}
    for r in rows:
        out[r.g][r.bin] = (int(r.cr), int(r.cc))
    return out


def _fused_exact_ecdf(
    ref: DataFrame, cur: DataFrame, column: str, n_ref: int, n_cur: int
):
    """Pass 3 (exact mode only): ONE action over the union ECDF yielding
    both the KS statistic and the Wasserstein integral.  Ties share the
    rangeBetween cumulative mass, so the per-distinct-value max equals
    the per-row max.  Single-task global sort — exact mode is the
    oracle/small-window path; sketch mode replaces this with pass 2's
    binned grid."""
    e = _union_ecdf(ref, cur, column)
    per_v = e.groupBy("v").agg(
        F.max("cum_r").alias("cum_r"), F.max("cum_c").alias("cum_c")
    )
    diff = F.abs(
        F.col("cum_r") / F.lit(float(n_ref)) - F.col("cum_c") / F.lit(float(n_cur))
    )
    nxt = F.lead("v").over(Window.orderBy("v"))
    s = per_v.select(
        diff.alias("diff"),
        (diff * (F.coalesce(nxt, F.col("v")) - F.col("v"))).alias("area"),
    )
    return s.agg(
        F.coalesce(F.max("diff"), F.lit(0.0)).cast("double").alias("ks_d"),
        F.coalesce(F.sum("area"), F.lit(0.0)).cast("double").alias("wd"),
    ).collect()[0]


def _dense_counts(sparse: dict[int, tuple[int, int]], nbins: int):
    """Sparse (bin -> (cr, cc)) to dense numpy count vectors."""
    import numpy as np

    cr = np.zeros(nbins, dtype=np.float64)
    cc = np.zeros(nbins, dtype=np.float64)
    for b, (a, c) in sparse.items():
        if 0 <= b < nbins:
            cr[b], cc[b] = a, c
    return cr, cc


def _hist_probs_np(cr, cc, n_ref: int, n_cur: int, width: float):
    """numpy mirror of histogram_probs' density+epsilon+normalize."""
    dens_r = cr / (float(n_ref) * width) + EPS
    dens_c = cc / (float(n_cur) * width) + EPS
    return dens_r / dens_r.sum(), dens_c / dens_c.sum()


def distribution_drift(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    methods: dict[str, tuple[float, float]] | None = None,
    mode: StatsMode = EXACT,
    detector_threshold: float = DISTRIBUTION_DETECTOR_THRESHOLD,
    min_samples: int = MIN_SAMPLES,
    psi_nbins: int = 10,
) -> dict:
    """Full reference distribution-detector semantics for one feature.

    Runs the per-method comparators, normalizes scores per C5
    (``min(score/threshold, 1)`` weighted mean), and applies the C18
    verdict (``drift_score > detector_threshold``).

    Fused execution — at most THREE Spark actions regardless of how many
    methods are configured (two in sketch mode):

    1. one aggregate over the tagged ref+cur union: per-side
       count/mean/var/std/min/max + reference quantile edges;
    2. one groupBy(grid, bin) computing every histogram at once
       (JS equal-width, PSI quantile buckets, and in sketch mode the
       binned-ECDF grid for KS/Wasserstein);
    3. exact mode only: one union-ECDF pass yielding both the KS
       statistic and the Wasserstein integral.

    Spark does every per-row reduction; Python touches only collected
    aggregate scalars and <= sum(nbins) histogram rows, applying the
    identical formulas the standalone frame builders (:func:`js_psi_frame`,
    :func:`psi_frame`, :func:`ks_frame`, :func:`wasserstein_frame`) encode
    in Spark expressions — those remain the oracle-checkable single-method
    paths.  Returns a dict shaped like the reference ``DriftResult``.
    """
    import numpy as np

    methods = methods or DISTRIBUTION_METHODS
    want_ks = "ks_test" in methods
    want_w1 = "wasserstein" in methods
    want_js = "js_divergence" in methods
    want_psi = "psi" in methods

    stats = _fused_two_sample_stats(
        ref, cur, column, edges_nbins=psi_nbins if want_psi else None, mode=mode
    )
    n_ref, n_cur = int(stats["n_ref"]), int(stats["n_cur"])
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

    mn = min(x for x in (stats["min_ref"], stats["min_cur"]) if x is not None)
    mx = max(x for x in (stats["max_ref"], stats["max_cur"]) if x is not None)
    value_range = max(
        (stats["max_ref"] or 0.0) - (stats["min_ref"] or 0.0),
        (stats["max_cur"] or 0.0) - (stats["min_cur"] or 0.0),
    )
    edges = [float(x) for x in (stats["edges"] or [])] if want_psi else []
    moments = {
        side: {
            "n": int(stats[f"n_{side}"]),
            "mean": stats[f"mean_{side}"],
            "var_samp": stats[f"var_{side}"],
            "stddev": stats[f"std_{side}"],
            "min": stats[f"min_{side}"],
            "max": stats[f"max_{side}"],
        }
        for side in ("ref", "cur")
    }
    tests: dict[str, dict] = {}

    # ---- pass 2: every histogram in one job -------------------------------
    grid_cols, grid_names = [], []
    degenerate = mx <= mn
    nbins_js = rice_bins(n_ref + n_cur)
    if want_js and not degenerate:
        grid_cols.append(_bucket(F.col("v"), mn, (mx - mn) / nbins_js, nbins_js))
        grid_names.append("js")
    if want_psi and edges:
        bucket = sum(((F.col("v") > F.lit(e)).cast("int") for e in edges), F.lit(0))
        grid_cols.append(bucket)
        grid_names.append("psi")
    if (want_ks or want_w1) and not mode.exact and not degenerate:
        grid_cols.append(
            _bucket(F.col("v"), mn, (mx - mn) / mode.ecdf_bins, mode.ecdf_bins)
        )
        grid_names.append("ecdf")
    counts = (
        _fused_bin_counts(ref, cur, column, grid_cols) if grid_cols else {}
    )
    by_name = {name: counts[i] for i, name in enumerate(grid_names)}

    if want_js:
        if degenerate:
            js = 0.0  # degenerate range: reference returns 0 (distribution.py:283-284)
        else:
            cr, cc = _dense_counts(by_name["js"], nbins_js)
            p, q = _hist_probs_np(cr, cc, n_ref, n_cur, (mx - mn) / nbins_js)
            m = (p + q) / 2.0
            js = float(0.5 * np.sum(p * np.log(p / m)) + 0.5 * np.sum(q * np.log(q / m)))
        thr, wt = methods["js_divergence"]
        tests["js_divergence"] = {
            "divergence": js,
            "score": js,
            "threshold": thr,
            "weight": wt,
            "drift_detected": js > thr,
        }

    if want_psi:
        if edges:
            cr, cc = _dense_counts(by_name["psi"], psi_nbins)
            p = (cr / cr.sum() + EPS) / (1.0 + psi_nbins * EPS)
            q = (cc / cc.sum() + EPS) / (1.0 + psi_nbins * EPS)
            psi = float(np.sum((p - q) * np.log(p / q)))
        else:
            psi = 0.0
        thr, wt = methods["psi"]
        tests["psi"] = {
            "psi": psi,
            "score": psi,
            "threshold": thr,
            "weight": wt,
            "drift_detected": psi > thr,
        }

    # ---- KS + Wasserstein: pass 3 (exact) or pass 2's ecdf grid (sketch) --
    if want_ks or want_w1:
        if mode.exact:
            row = _fused_exact_ecdf(ref, cur, column, n_ref, n_cur)
            ks_d, wd = float(row.ks_d), float(row.wd)
        elif degenerate:
            ks_d, wd = 0.0, 0.0
        else:
            cr, cc = _dense_counts(by_name["ecdf"], mode.ecdf_bins)
            p, q = _hist_probs_np(cr, cc, n_ref, n_cur, (mx - mn) / mode.ecdf_bins)
            fp, fq = np.cumsum(p), np.cumsum(q)
            ks_d = float(np.max(np.abs(fp - fq)))
            wd = float(np.sum(np.abs(fp - fq)) * ((mx - mn) / mode.ecdf_bins))
        wd_norm = wd / float(value_range) if value_range > 0 else 0.0
        if want_ks:
            thr, wt = methods["ks_test"]
            p_val = ks_2samp_p(ks_d, n_ref, n_cur)
            tests["ks_test"] = {
                "statistic": ks_d,
                "p_value": p_val,
                "score": 1.0 - p_val,
                "threshold": thr,
                "weight": wt,
                "drift_detected": p_val < thr,
            }
        if want_w1:
            thr, wt = methods["wasserstein"]
            tests["wasserstein"] = {
                "distance": wd,
                "score": wd_norm,
                "threshold": thr,
                "weight": wt,
                "drift_detected": wd_norm > thr,
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
