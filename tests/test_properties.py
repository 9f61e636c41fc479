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


# --- wav container (r4) ------------------------------------------------------

pcm_arrays = st.lists(
    st.floats(min_value=-1.0, max_value=1.0, allow_nan=False, width=32),
    min_size=1,
    max_size=4000,
)
sample_rates = st.sampled_from([8000, 12345, 16000, 22050, 44100, 48000])


@given(xs=pcm_arrays, sr=sample_rates)
@settings(max_examples=50, deadline=None)
def test_wav_roundtrip_any_signal_any_rate(xs, sr):
    """encode->decode is the s16 quantization for ANY signal/rate; the
    header stores the rate; num_samples agrees with the decode."""
    from llm_drift_detector_spark import codecs

    pcm = np.asarray(xs, dtype=np.float32)
    payload = codecs.encode(pcm, "wav", sr_hz=sr)
    out = codecs.decode(payload, "wav")
    assert len(out) == len(pcm)
    assert np.max(np.abs(out - np.clip(pcm, -1, 1))) <= (1.0 / 32767.0) + 1e-7
    assert codecs.wav_sample_rate(payload) == sr
    assert codecs.num_samples(payload, "wav") == len(pcm)


@given(xs=pcm_arrays, cut=st.integers(min_value=0, max_value=10_000))
@settings(max_examples=50, deadline=None)
def test_wav_truncation_never_lengthens_or_errors_past_header(xs, cut):
    """Truncating anywhere at/after the 44-byte header yields a decode
    of <= the original length (never garbage growth, never a crash);
    truncation into the header raises ValueError."""
    from llm_drift_detector_spark import codecs

    pcm = np.asarray(xs, dtype=np.float32)
    payload = codecs.encode(pcm, "wav", sr_hz=16000)
    k = min(cut, len(payload))
    if k >= codecs.WAV_HEADER_BYTES:
        out = codecs.decode(payload[:k], "wav")
        assert len(out) <= len(pcm)
        np.testing.assert_array_equal(out, codecs.decode(payload, "wav")[: len(out)])
    else:
        with pytest.raises(ValueError):
            codecs.decode(payload[:k], "wav")


# --- bloom dedup kernel (r4) -------------------------------------------------


@given(cap=st.integers(16, 200_000), fpp=st.floats(0.0001, 0.2))
@settings(max_examples=100, deadline=None)
def test_bloom_geometry_sane(cap, fpp):
    from llm_drift_detector_spark.streaming.stateful import bloom_geometry

    m, k = bloom_geometry(cap, fpp)
    assert m % 8 == 0 and m > 0 and k >= 1
    # more capacity or lower fpp never shrinks the filter
    m2, _ = bloom_geometry(cap * 2, fpp)
    m3, _ = bloom_geometry(cap, fpp / 2)
    assert m2 >= m and m3 >= m


@given(hs=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=300))
@settings(max_examples=50, deadline=None)
def test_bloom_membership_no_false_negatives_property(hs):
    """Anything inserted is ALWAYS found afterwards, for arbitrary
    64-bit hash values (including negatives and duplicates)."""
    from llm_drift_detector_spark.streaming.stateful import (
        _bloom_positions,
        bloom_geometry,
    )

    m, k = bloom_geometry(1000, 0.01)
    buf = bytearray(m // 8)
    for h in hs:
        for i in _bloom_positions(h, m, k):
            buf[i >> 3] |= 1 << (i & 7)
    for h in hs:
        assert all(buf[i >> 3] & (1 << (i & 7)) for i in _bloom_positions(h, m, k))
