"""Grouped (per-key) drift detectors vs the oracle-checked single-pair
frame builders: every group's row must match what the single-pair path
computes on that group's two windows.
"""

import numpy as np
import pytest

from llm_drift_detector_spark.config import StatsMode
from llm_drift_detector_spark.drift import (
    grouped_distribution_drift,
    grouped_distribution_drift_binned,
    js_psi_frame,
    ks_frame,
    psi_frame,
    tag_windows,
    wasserstein_frame,
    welch_t_frame,
)

RNG = np.random.default_rng(11)
GROUPS = {
    "a": (RNG.normal(10, 2, 400), RNG.normal(10, 2, 350)),     # null
    "b": (RNG.normal(10, 2, 400), RNG.normal(14, 3, 300)),     # shifted
    "c": (RNG.exponential(5, 500), RNG.exponential(9, 450)),   # scaled
    "tiny": (RNG.normal(0, 1, 4), RNG.normal(5, 1, 6)),        # below gate
}


@pytest.fixture(scope="module")
def tagged(spark):
    rows = []
    for g, (r, c) in GROUPS.items():
        rows += [(g, "ref", float(x)) for x in r]
        rows += [(g, "cur", float(x)) for x in c]
    return spark.createDataFrame(rows, "grp string, side string, v double")


def _pair_frames(spark, g):
    r, c = GROUPS[g]
    ra = spark.createDataFrame([(float(x),) for x in r], "v double")
    rb = spark.createDataFrame([(float(x),) for x in c], "v double")
    return ra, rb


def test_grouped_exact_matches_single_pair(spark, tagged):
    got = {
        r.grp: r
        for r in grouped_distribution_drift(
            tagged, ["grp"], "v", nbins=40, psi_nbins=10
        ).collect()
    }
    assert set(got) == set(GROUPS)
    for g in ("a", "b", "c"):
        ra, rb = _pair_frames(spark, g)
        ks = ks_frame(ra, rb, "v").collect()[0].ks_d
        assert got[g].ks_d == pytest.approx(ks, abs=1e-12), g
        js = js_psi_frame(ra, rb, "v", nbins=40).collect()[0].js
        assert got[g].js == pytest.approx(js, abs=1e-9), g
        psi = psi_frame(ra, rb, "v", nbins=10).collect()[0].psi
        assert got[g].psi == pytest.approx(psi, abs=1e-9), g
        w = wasserstein_frame(ra, rb, "v").collect()[0]
        assert got[g].wd == pytest.approx(w.wd, abs=1e-9), g
        assert got[g].wd_norm == pytest.approx(w.wd_norm, abs=1e-9), g
        t = welch_t_frame(ra, rb, "v").collect()[0].t_stat
        assert got[g].t_stat == pytest.approx(t, abs=1e-9), g
    # verdicts: b and c drifted, a not; tiny gated
    assert got["b"].drift_detected and got["c"].drift_detected
    assert not got["a"].drift_detected
    assert got["tiny"].gated and got["tiny"].drift_score == 0.0


def test_grouped_binned_matches_sketch_frames(spark, tagged):
    nbins = 40
    got = {
        r.grp: r
        for r in grouped_distribution_drift_binned(
            tagged, ["grp"], "v", nbins=nbins, psi_nbins=10, exact_edges=True
        ).collect()
    }
    sk = StatsMode(exact=False, ecdf_bins=nbins)
    for g in ("a", "b", "c"):
        ra, rb = _pair_frames(spark, g)
        js = js_psi_frame(ra, rb, "v", nbins=nbins).collect()[0].js
        assert got[g].js == pytest.approx(js, abs=1e-9), g
        psi = psi_frame(ra, rb, "v", nbins=10).collect()[0].psi
        assert got[g].psi == pytest.approx(psi, abs=1e-9), g
        ks = ks_frame(ra, rb, "v", mode=sk).collect()[0].ks_d
        assert got[g].ks_d == pytest.approx(ks, abs=1e-9), g
        w = wasserstein_frame(ra, rb, "v", mode=sk).collect()[0]
        assert got[g].wd == pytest.approx(w.wd, abs=1e-9), g
        assert got[g].wd_norm == pytest.approx(w.wd_norm, abs=1e-9), g
        t = welch_t_frame(ra, rb, "v").collect()[0].t_stat
        assert got[g].t_stat == pytest.approx(t, abs=1e-9), g
    assert got["tiny"].gated


def test_grouped_binned_is_fully_native(tagged):
    """The scale path must contain NO Python evaluation (no
    ArrowEvalPython/BatchEvalPython/FlatMapGroupsInPandas nodes)."""
    plan = grouped_distribution_drift_binned(
        tagged, ["grp"], "v"
    )._jdf.queryExecution().executedPlan().toString()
    for bad in ("EvalPython", "InPandas", "MapInArrow"):
        assert bad not in plan, f"{bad} found in native-only plan"


def test_tag_windows_roundtrip(spark):
    ra, rb = _pair_frames(spark, "a")
    t = tag_windows(ra, rb)
    n = {r.side: r.cnt for r in t.groupBy("side").count().withColumnRenamed("count", "cnt").collect()}
    assert n == {"ref": 400, "cur": 350}


def test_multi_feature_drift_matches_per_column(spark):
    """N feature columns in one job == the per-column frame builders."""
    from llm_drift_detector_spark.drift import (
        multi_feature_drift,
    )

    rng = np.random.default_rng(23)
    ref_rows = [(float(a), float(b)) for a, b in
                zip(rng.normal(5, 1, 300), rng.exponential(2, 300))]
    cur_rows = [(float(a), float(b)) for a, b in
                zip(rng.normal(7, 1, 280), rng.exponential(2, 280))]
    ref = spark.createDataFrame(ref_rows, "x double, y double")
    cur = spark.createDataFrame(cur_rows, "x double, y double")

    got = {r.feature: r for r in
           multi_feature_drift(ref, cur, ["x", "y"], nbins=40, exact_edges=True).collect()}
    assert set(got) == {"x", "y"}
    for col in ("x", "y"):
        js = js_psi_frame(ref.select(col), cur.select(col), col, nbins=40).collect()[0].js
        assert got[col].js == pytest.approx(js, abs=1e-9), col
        psi = psi_frame(ref.select(col), cur.select(col), col, nbins=10).collect()[0].psi
        assert got[col].psi == pytest.approx(psi, abs=1e-9), col
    # exact variant carries p-values
    ex = {r.feature: r for r in multi_feature_drift(ref, cur, ["x", "y"], exact=True).collect()}
    assert ex["x"].ks_p < 0.05 and ex["x"].drift_detected  # mean shift on x
    assert ex["y"].ks_p > 0.05
