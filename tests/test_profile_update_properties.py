"""Property-based invariants for the incremental profile-update
algebra (hypothesis): for ANY reference window, ANY fold window, and
ANY split of the fold, the merged profile must equal the exact numpy
computation over the concatenation at the FROZEN geometry — counts and
bins exactly, moments to fp roundoff — and folding must be associative.

The fixed-seed tests pin parity against the per-column/per-group
single updates; these pin the algebra itself against an independent
numpy oracle, covering corners (constant windows, duplicate values,
extreme magnitudes, tiny windows) the fixed seeds can't enumerate."""

import math

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

# magnitude capped at 1e4: the Chan/ss-based variance path carries
# ~ulp(x^2)-scale absolute error, and near the cap with near-constant
# windows that error floor exceeds any tight tolerance — a property of
# the (documented, Spark-identical) arithmetic, not a merge bug.  The
# cap keeps the oracle comparison meaningful; the fixed-seed tests
# cover realistic magnitudes.
floats = st.floats(
    min_value=-1e4, max_value=1e4, allow_nan=False, allow_infinity=False,
    width=32,
)
window = st.lists(floats, min_size=12, max_size=60)

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _np_bins(xs, prof):
    """Independent numpy replication of the frozen-geometry binning."""
    xs = np.asarray(xs, dtype=np.float64)
    raw = np.floor((xs - prof["mn"]) / prof["width"])
    jb = np.clip(raw, 0, prof["nbins"] - 1).astype(int)
    js = np.bincount(jb, minlength=prof["nbins"]).astype(float)
    edges = np.asarray(prof["edges"])
    pb = (xs[:, None] > edges[None, :]).sum(axis=1)
    psi = np.bincount(pb, minlength=prof["psi_nbins"]).astype(float)
    return js.tolist(), psi.tolist()


@settings(**_SETTINGS)
@given(ref=window, fold=window, cut=st.floats(min_value=0.1, max_value=0.9))
def test_distribution_merge_matches_numpy_oracle(spark, ref, fold, cut):
    from llm_drift_detector_spark.streaming import (
        reference_profile,
        update_reference_profile,
    )

    rdf = spark.createDataFrame([(float(x),) for x in ref], "x double")
    prof = reference_profile(rdf, "x")
    fdf = spark.createDataFrame([(float(x),) for x in fold], "x double")
    merged = update_reference_profile(prof, fdf)

    allv = np.asarray([float(x) for x in ref + fold], dtype=np.float64)
    assert merged["n"] == len(allv)
    assert merged["mean"] == pytest.approx(float(np.mean(allv)), rel=1e-9, abs=1e-9)
    assert merged["var"] == pytest.approx(
        float(np.var(allv, ddof=1)), rel=1e-6, abs=1e-4
    )
    js, psi = _np_bins(allv, prof)
    assert merged["js_counts"] == js
    assert merged["psi_counts"] == psi
    # observed range tracked exactly
    assert merged["data_mn"] == pytest.approx(float(allv.min()))
    assert merged["data_mx"] == pytest.approx(float(allv.max()))

    # associativity: fold in two pieces == fold at once (counts exact)
    k = max(1, min(len(fold) - 1, int(len(fold) * cut)))
    m2 = update_reference_profile(
        update_reference_profile(
            prof,
            spark.createDataFrame([(float(x),) for x in fold[:k]], "x double"),
        ),
        spark.createDataFrame([(float(x),) for x in fold[k:]], "x double"),
    )
    assert m2["n"] == merged["n"]
    assert m2["js_counts"] == merged["js_counts"]
    assert m2["psi_counts"] == merged["psi_counts"]
    assert m2["mean"] == pytest.approx(merged["mean"], rel=1e-9, abs=1e-9)
    assert m2["var"] == pytest.approx(merged["var"], rel=1e-6, abs=1e-4)


vec = st.lists(floats, min_size=4, max_size=4)
vecs = st.lists(vec, min_size=3, max_size=30)


@settings(**_SETTINGS)
@given(ref=vecs, fold=vecs)
def test_embedding_merge_matches_numpy_oracle(spark, ref, fold):
    from llm_drift_detector_spark.streaming import (
        embedding_reference_profile,
        update_embedding_reference_profile,
    )

    ddl = "e array<float>"
    rdf = spark.createDataFrame([([float(x) for x in v],) for v in ref], ddl)
    prof = embedding_reference_profile(rdf, "e")
    fdf = spark.createDataFrame([([float(x) for x in v],) for v in fold], ddl)
    merged = update_embedding_reference_profile(prof, fdf)

    # float32 storage: the oracle must see the same rounded values
    allv = np.asarray(ref + fold, dtype=np.float32).astype(np.float64)
    assert merged["n"] == len(allv)
    c = allv.mean(axis=0)
    assert np.allclose(merged["centroid"], c, rtol=1e-6, atol=1e-3)
    msq = float((allv * allv).sum(axis=1).mean())
    rms = math.sqrt(max(0.0, msq - float(np.dot(c, c))))
    # sqrt-of-cancellation: for near-constant windows both sides are
    # sqrt of ~ulp-scale noise — abs tolerance covers that floor
    assert merged["ref_rms"] == pytest.approx(rms, rel=1e-6, abs=5e-2)
