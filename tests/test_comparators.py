"""Comparator correctness vs local numpy re-implementations of the
reference formulas (``detectors/distribution.py:202-306``) — FIXTURES.md
§5.4.  scipy is not installed; the numpy oracles below ARE the spec.
"""

import math

import numpy as np
import pytest

from llm_drift_detector_spark.config import EPS, SKETCH
from llm_drift_detector_spark.drift import (
    distribution_drift,
    js_psi_frame,
    ks_frame,
    psi_frame,
    shared_range,
    wasserstein_frame,
    welch_t_frame,
)
from llm_drift_detector_spark.drift.comparators import rice_bins
from llm_drift_detector_spark.drift.stattests import (
    betainc_reg,
    kolmogorov_sf,
    student_t_sf,
    welch_t,
)

RNG = np.random.default_rng(7)
REF = RNG.normal(50.0, 10.0, size=800)
CUR_SAME = RNG.normal(50.0, 10.0, size=700)
CUR_SHIFT = RNG.normal(60.0, 12.0, size=700)


def spark_pair(spark, a, b):
    ra = spark.createDataFrame([(float(x),) for x in a], "v double")
    rb = spark.createDataFrame([(float(x),) for x in b], "v double")
    return ra, rb


# --- numpy oracles (reference formulas, floor-binning standardization) ------


def np_hist_probs(a, b, nbins=None):
    mn = min(a.min(), b.min())
    mx = max(a.max(), b.max())
    if nbins is None:
        nbins = rice_bins(len(a) + len(b))
    w = (mx - mn) / nbins
    def probs(x, n):
        idx = np.minimum(np.floor((x - mn) / w), nbins - 1).astype(int)
        counts = np.bincount(idx, minlength=nbins).astype(float)
        dens = counts / (n * w) + EPS
        return dens / dens.sum()
    return probs(a, len(a)), probs(b, len(b))


def np_js(a, b, nbins=None):
    p, q = np_hist_probs(a, b, nbins)
    m = (p + q) / 2
    return 0.5 * np.sum(p * np.log(p / m)) + 0.5 * np.sum(q * np.log(q / m))


def np_psi(a, b, nbins=None):
    p, q = np_hist_probs(a, b, nbins)
    return float(np.sum((p - q) * np.log(p / q)))


def np_psi_quantile(a, b, nbins=10):
    edges = np.percentile(a, [100 * i / nbins for i in range(1, nbins)])
    def probs(x, n):
        bucket = np.sum(x[:, None] > edges[None, :], axis=1)
        counts = np.bincount(bucket, minlength=nbins).astype(float)
        return (counts / n + EPS) / (1.0 + nbins * EPS)
    p, q = probs(a, len(a)), probs(b, len(b))
    return float(np.sum((p - q) * np.log(p / q)))


def np_ks(a, b):
    allv = np.sort(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), allv, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), allv, side="right") / len(b)
    return float(np.max(np.abs(fa - fb)))


def np_wasserstein(a, b):
    u = np.sort(np.unique(np.concatenate([a, b])))
    fa = np.searchsorted(np.sort(a), u, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), u, side="right") / len(b)
    return float(np.sum(np.abs(fa - fb)[:-1] * np.diff(u)))


# --- stattests sanity (closed-form reference points) -------------------------


def test_kolmogorov_sf_known_values():
    assert kolmogorov_sf(0.0) == 1.0
    # Q(1.36) ~ 0.049 (classic 5% critical value)
    assert abs(kolmogorov_sf(1.36) - 0.049) < 2e-3
    assert kolmogorov_sf(3.0) < 1e-6


def test_student_t_sf_known_values():
    # t=2.086, df=20 -> one-sided p ~ 0.025 (95% two-sided CI point)
    assert abs(student_t_sf(2.086, 20) - 0.025) < 1e-3
    # df=1 (Cauchy): sf(1) = 0.25 exactly
    assert abs(student_t_sf(1.0, 1) - 0.25) < 1e-9
    # large df -> normal: sf(1.96, 1e6) ~ 0.025
    assert abs(student_t_sf(1.96, 1e6) - 0.025) < 1e-3


def test_betainc_symmetry():
    assert abs(betainc_reg(2.0, 3.0, 0.4) + betainc_reg(3.0, 2.0, 0.6) - 1.0) < 1e-12


# --- Spark vs numpy oracle ---------------------------------------------------


@pytest.mark.parametrize("cur", [CUR_SAME, CUR_SHIFT], ids=["same", "shift"])
def test_js_psi_match_numpy(spark, cur):
    ra, rb = spark_pair(spark, REF, cur)
    row = js_psi_frame(ra, rb, "v").collect()[0]
    assert abs(row.js - np_js(REF, cur)) < 1e-9
    assert abs(row.psi - np_psi(REF, cur)) < 1e-9


@pytest.mark.parametrize("cur", [CUR_SAME, CUR_SHIFT], ids=["same", "shift"])
def test_psi_quantile_matches_numpy(spark, cur):
    ra, rb = spark_pair(spark, REF, cur)
    psi = psi_frame(ra, rb, "v").collect()[0].psi
    assert abs(psi - np_psi_quantile(REF, cur)) < 1e-9
    # calibration: same-distribution PSI must sit well under threshold,
    # shifted must exceed it
    if cur is CUR_SAME:
        assert psi < 0.1
    else:
        assert psi > 0.2


@pytest.mark.parametrize("cur", [CUR_SAME, CUR_SHIFT], ids=["same", "shift"])
def test_ks_exact_matches_numpy(spark, cur):
    ra, rb = spark_pair(spark, REF, cur)
    d = ks_frame(ra, rb, "v").collect()[0].ks_d
    assert abs(d - np_ks(REF, cur)) < 1e-12


def test_ks_with_ties(spark):
    a = np.array([1.0, 2.0, 2.0, 2.0, 3.0, 4.0] * 5)
    b = np.array([2.0, 2.0, 3.0, 3.0, 5.0, 5.0] * 5)
    ra, rb = spark_pair(spark, a, b)
    d = ks_frame(ra, rb, "v").collect()[0].ks_d
    assert abs(d - np_ks(a, b)) < 1e-12


def test_ks_sketch_close_to_exact(spark):
    ra, rb = spark_pair(spark, REF, CUR_SHIFT)
    d_exact = ks_frame(ra, rb, "v").collect()[0].ks_d
    d_sketch = ks_frame(ra, rb, "v", SKETCH).collect()[0].ks_d
    # binned ECDF with 4096 bins: error bounded by max bin mass
    assert abs(d_exact - d_sketch) < 0.02


def test_wasserstein_matches_numpy(spark):
    ra, rb = spark_pair(spark, REF, CUR_SHIFT)
    row = wasserstein_frame(ra, rb, "v").collect()[0]
    wd = np_wasserstein(REF, CUR_SHIFT)
    assert abs(row.wd - wd) < 1e-9
    rng = max(REF.max() - REF.min(), CUR_SHIFT.max() - CUR_SHIFT.min())
    assert abs(row.wd_norm - wd / rng) < 1e-12


def test_welch_t_matches_numpy(spark):
    ra, rb = spark_pair(spark, REF, CUR_SHIFT)
    t_spark = welch_t_frame(ra, rb, "v").collect()[0].t_stat
    t_np, df, p = welch_t(
        REF.mean(), REF.var(ddof=1), len(REF),
        CUR_SHIFT.mean(), CUR_SHIFT.var(ddof=1), len(CUR_SHIFT),
    )
    assert abs(t_spark - t_np) < 1e-9
    assert p < 1e-6  # strongly shifted means


def test_distribution_drift_verdicts(spark):
    ra, rb = spark_pair(spark, REF, CUR_SHIFT)
    res = distribution_drift(ra, rb, "v")
    assert res["drift_detected"]
    assert res["methods"]["ks_test"]["drift_detected"]
    assert res["methods"]["ks_test"]["p_value"] < 0.05
    assert res["reference_size"] == len(REF)

    ra, rb = spark_pair(spark, REF, CUR_SAME)
    res_null = distribution_drift(ra, rb, "v")
    assert not res_null["methods"]["ks_test"]["drift_detected"]
    assert not res_null["methods"]["js_divergence"]["drift_detected"]


def test_min_sample_gate(spark):
    ra, rb = spark_pair(spark, REF[:5], CUR_SHIFT)
    res = distribution_drift(ra, rb, "v")
    assert res["drift_score"] == 0.0 and not res["drift_detected"]
    assert res.get("gated")


def test_shared_range(spark):
    ra, rb = spark_pair(spark, REF, CUR_SHIFT)
    mn, mx, n, m = shared_range(ra, rb, "v")
    assert mn == min(REF.min(), CUR_SHIFT.min())
    assert mx == max(REF.max(), CUR_SHIFT.max())
    assert (n, m) == (len(REF), len(CUR_SHIFT))


def _count_actions(monkeypatch, sample_df):
    """Count DataFrame.collect() actions — the fused-orchestration contract.
    Patches the RUNTIME DataFrame class (pyspark 4's classic subclass
    overrides collect, so patching the base would miss)."""
    cls = type(sample_df)
    calls = {"n": 0}
    orig = cls.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(cls, "collect", counting)
    return calls


def test_distribution_drift_fused_action_count(spark, monkeypatch):
    """The detector issues <= 3 Spark actions in exact mode and <= 2 in
    sketch mode, no matter how many methods are configured (VERDICT r1 #2)."""
    ra, rb = spark_pair(spark, REF, CUR_SHIFT)
    calls = _count_actions(monkeypatch, ra)
    res = distribution_drift(ra, rb, "v")  # all 5 default methods
    assert len(res["methods"]) == 5
    assert calls["n"] == 3

    calls["n"] = 0
    res_sk = distribution_drift(ra, rb, "v", mode=SKETCH)
    assert len(res_sk["methods"]) == 5
    assert calls["n"] == 2

    # single-method configs never pay for unrequested comparators
    calls["n"] = 0
    distribution_drift(ra, rb, "v", methods={"t_test": (0.05, 1.0)})
    assert calls["n"] == 1  # moments pass only
    calls["n"] = 0
    distribution_drift(ra, rb, "v", methods={"js_divergence": (0.2, 1.0)})
    assert calls["n"] == 2  # moments + histogram, no ECDF sort


def test_distribution_drift_fused_matches_frames(spark):
    """Fused numpy post-processing reproduces the standalone Spark frame
    builders (the oracle-checked paths) to float tolerance."""
    ra, rb = spark_pair(spark, REF, CUR_SHIFT)
    res = distribution_drift(ra, rb, "v")

    js_row = js_psi_frame(ra, rb, "v").collect()[0]
    assert res["methods"]["js_divergence"]["divergence"] == pytest.approx(js_row.js, abs=1e-9)
    psi_row = psi_frame(ra, rb, "v").collect()[0]
    assert res["methods"]["psi"]["psi"] == pytest.approx(psi_row.psi, abs=1e-9)
    ks_row = ks_frame(ra, rb, "v").collect()[0]
    assert res["methods"]["ks_test"]["statistic"] == pytest.approx(ks_row.ks_d, abs=1e-12)
    w_row = wasserstein_frame(ra, rb, "v").collect()[0]
    assert res["methods"]["wasserstein"]["distance"] == pytest.approx(w_row.wd, abs=1e-9)
    assert res["methods"]["wasserstein"]["score"] == pytest.approx(w_row.wd_norm, abs=1e-9)
    t_row = welch_t_frame(ra, rb, "v").collect()[0]
    assert res["methods"]["t_test"]["statistic"] == pytest.approx(t_row.t_stat, abs=1e-9)

    # sketch mode agrees with the sketch frames too
    res_sk = distribution_drift(ra, rb, "v", mode=SKETCH)
    ks_sk = ks_frame(ra, rb, "v", mode=SKETCH).collect()[0]
    assert res_sk["methods"]["ks_test"]["statistic"] == pytest.approx(ks_sk.ks_d, abs=1e-9)
    w_sk = wasserstein_frame(ra, rb, "v", mode=SKETCH).collect()[0]
    assert res_sk["methods"]["wasserstein"]["distance"] == pytest.approx(w_sk.wd, abs=1e-9)


def test_distribution_drift_degenerate_range(spark):
    """All-equal values: JS/PSI 0, KS/W1 0 — no histogram crash."""
    ra, rb = spark_pair(spark, np.full(50, 7.0), np.full(40, 7.0))
    res = distribution_drift(ra, rb, "v")
    assert res["methods"]["js_divergence"]["divergence"] == 0.0
    assert res["methods"]["ks_test"]["statistic"] == 0.0
    assert res["methods"]["wasserstein"]["distance"] == 0.0
    res_sk = distribution_drift(ra, rb, "v", mode=SKETCH)
    assert res_sk["methods"]["ks_test"]["statistic"] == 0.0
