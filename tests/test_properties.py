"""Property-based comparator invariants (hypothesis).

These pin mathematical properties rather than point values: bounds,
symmetries, and degenerate-input behavior must hold for ANY data, which
covers the corners the fixed-seed oracle tests can't enumerate.
Spark-side evaluation is batched per property run via one session-scoped
frame builder to keep runtime sane.
"""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from llm_drift_detector_spark.drift.stattests import (
    betainc_reg,
    kolmogorov_sf,
    ks_2samp_p,
    student_t_sf,
    welch_t,
)
from llm_drift_detector_spark.monitoring import classify_level

floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)
samples = st.lists(floats, min_size=2, max_size=200)


@given(lam=st.floats(min_value=0, max_value=10, allow_nan=False))
def test_kolmogorov_sf_is_a_survival_function(lam):
    q = kolmogorov_sf(lam)
    assert 0.0 <= q <= 1.0
    # monotone non-increasing
    assert kolmogorov_sf(lam + 0.1) <= q + 1e-12


@given(d=st.floats(min_value=0, max_value=1), n=st.integers(2, 10_000), m=st.integers(2, 10_000))
def test_ks_p_bounds(d, n, m):
    p = ks_2samp_p(d, n, m)
    assert 0.0 <= p <= 1.0


@given(t=st.floats(min_value=-50, max_value=50, allow_nan=False), df=st.floats(min_value=0.5, max_value=1e4))
def test_student_t_sf_bounds_and_symmetry(t, df):
    p = student_t_sf(t, df)
    assert 0.0 <= p <= 1.0
    assert abs(p + student_t_sf(-t, df) - 1.0) < 1e-9


@given(a=st.floats(0.5, 50), b=st.floats(0.5, 50), x=st.floats(0, 1))
def test_betainc_reg_bounds_monotone(a, b, x):
    v = betainc_reg(a, b, x)
    assert -1e-12 <= v <= 1.0 + 1e-12
    assert betainc_reg(a, b, min(1.0, x + 0.05)) >= v - 1e-9


@given(xs=samples, ys=samples)
def test_welch_t_antisymmetric(xs, ys):
    m1, v1, n1 = np.mean(xs), np.var(xs, ddof=1), len(xs)
    m2, v2, n2 = np.mean(ys), np.var(ys, ddof=1), len(ys)
    t1, df1, p1 = welch_t(m1, v1, n1, m2, v2, n2)
    t2, df2, p2 = welch_t(m2, v2, n2, m1, v1, n1)
    assert abs(t1 + t2) < 1e-9 * max(1.0, abs(t1))
    assert abs(p1 - p2) < 1e-9


@given(
    score=st.floats(0, 10, allow_nan=False),
    threshold=st.floats(0.001, 5, allow_nan=False),
)
def test_classify_level_ordering(score, threshold):
    lvl = classify_level(score, threshold)
    if lvl == "critical":
        assert score >= threshold
    elif lvl == "warning":
        assert 0.7 * threshold <= score < threshold
    else:
        assert score < 0.7 * threshold


# --- Spark-side distribution properties (single session, few examples) -------


@settings(max_examples=5, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    a=st.lists(st.floats(0, 1000, allow_nan=False, allow_infinity=False), min_size=15, max_size=60),
    b=st.lists(st.floats(0, 1000, allow_nan=False, allow_infinity=False), min_size=15, max_size=60),
)
def test_comparator_bounds_on_spark(spark, a, b):
    from llm_drift_detector_spark.drift import js_psi_frame, ks_frame, psi_frame

    fa = spark.createDataFrame([(float(x),) for x in a], "v double")
    fb = spark.createDataFrame([(float(x),) for x in b], "v double")
    row = js_psi_frame(fa, fb, "v", nbins=16).collect()[0]
    assert -1e-9 <= row.js <= math.log(2) + 1e-9  # JS in [0, ln 2]
    d = ks_frame(fa, fb, "v").collect()[0].ks_d
    assert -1e-12 <= d <= 1.0 + 1e-12
    psi = psi_frame(fa, fb, "v").collect()[0].psi
    assert psi >= -1e-9  # PSI is a symmetrized KL: non-negative
