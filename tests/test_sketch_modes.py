"""Exact vs sketch mode error bounds (SURVEY §4.2.3): the 10^12-row
approximations must stay within documented tolerances of exact mode."""

import numpy as np
import pytest

from llm_drift_detector_spark.checks import profile
from llm_drift_detector_spark.config import SKETCH, StatsMode
from llm_drift_detector_spark.drift import ks_frame, psi_frame, wasserstein_frame

RNG = np.random.default_rng(21)
A = np.exp(RNG.normal(3.0, 0.8, size=5000))  # log-normal like dur_ms
B = np.exp(RNG.normal(3.3, 0.9, size=4000))


@pytest.fixture(scope="module")
def frames(spark):
    fa = spark.createDataFrame([(float(x),) for x in A], "v double")
    fb = spark.createDataFrame([(float(x),) for x in B], "v double")
    return fa, fb


def test_profile_sketch_quantiles_within_rank_tolerance(frames):
    fa, _ = frames
    exact = profile(fa, ["v"]).collect()[0]
    sketch = profile(fa, ["v"], SKETCH).collect()[0]
    # approx_percentile accuracy=10000 -> rank error <= n/10000 = 0.5 ranks;
    # assert value-space closeness via the empirical CDF instead
    srt = np.sort(A)
    for stat, q in [("q25", 0.25), ("median", 0.5), ("q75", 0.75)]:
        rank_exact = np.searchsorted(srt, exact[stat]) / len(A)
        rank_sketch = np.searchsorted(srt, sketch[stat]) / len(A)
        assert abs(rank_sketch - q) < 0.01, stat
        assert abs(rank_sketch - rank_exact) < 0.01, stat
    # non-quantile stats identical in both modes
    for stat in ("count", "mean", "stddev", "min", "max"):
        assert exact[stat] == sketch[stat]


def test_ks_sketch_error_bounded_by_bin_mass(frames):
    fa, fb = frames
    d_exact = ks_frame(fa, fb, "v").collect()[0].ks_d
    d_sketch = ks_frame(fa, fb, "v", SKETCH).collect()[0].ks_d
    # binned-ECDF D error is bounded by the max per-bin mass; with 4096
    # equal-width bins on this data that is well under 2 percentage points
    assert abs(d_exact - d_sketch) < 0.02
    assert d_sketch <= d_exact + 1e-12  # binning can only smooth D down


def test_wasserstein_sketch_close(frames):
    fa, fb = frames
    exact = wasserstein_frame(fa, fb, "v").collect()[0]
    sketch = wasserstein_frame(fa, fb, "v", SKETCH).collect()[0]
    rng = max(A.max() - A.min(), B.max() - B.min())
    # EMD on the bin grid: error <= bin width = range / 4096
    assert abs(exact.wd - sketch.wd) < rng / 1000
    assert abs(exact.wd_norm - sketch.wd_norm) < 1e-3


def test_psi_sketch_mode_close(frames):
    fa, fb = frames
    exact = psi_frame(fa, fb, "v").collect()[0].psi
    sketch = psi_frame(fa, fb, "v", mode=SKETCH).collect()[0].psi
    # decile edges from the approx sketch move bucket boundaries by
    # <= rank accuracy; PSI shifts accordingly — small relative error
    assert abs(exact - sketch) < 0.05 * max(exact, 0.1)


def test_custom_mode_accuracy_knob(frames):
    fa, _ = frames
    rough = StatsMode(exact=False, approx_percentile_accuracy=100)
    srt = np.sort(A)
    row = profile(fa, ["v"], rough).collect()[0]
    rank = np.searchsorted(srt, row["median"]) / len(A)
    assert abs(rank - 0.5) < 0.05  # 1/accuracy rank bound
