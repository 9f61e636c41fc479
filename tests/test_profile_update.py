"""Incremental reference-profile update: merged == from-scratch at the
same frozen geometry; range-drift flags rebin; hot-swaps into the
streaming monitor.  The embedding profile merges the same way
(centroid/n/rms are exactly mergeable)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from llm_drift_detector_spark.streaming import (
    embedding_reference_profile,
    reference_profile,
    stream_drift,
    stream_embedding_drift,
    update_embedding_reference_profile,
    update_reference_profile,
)
from llm_drift_detector_spark.streaming.drift_stream import (
    _clamped_bin,
    _psi_bucket,
)


def _frame(spark, values):
    return spark.createDataFrame([(float(v),) for v in values], "v double")


def _from_scratch_counts(df, profile):
    """Bin df with the profile's FROZEN geometry (the oracle for the
    merge: same expressions, all data at once)."""
    nbins, psi_nbins = profile["nbins"], profile["psi_nbins"]
    rows = (
        df.where(F.col("v").isNotNull())
        .groupBy(
            _clamped_bin(F.col("v"), profile["mn"], profile["width"], nbins).alias("jb"),
            _psi_bucket(F.col("v"), profile["edges"]).alias("pb"),
        )
        .agg(F.count("*").alias("c"))
        .collect()
    )
    js = np.zeros(nbins)
    psi = np.zeros(psi_nbins)
    for r in rows:
        js[int(r.jb)] += r.c
        psi[int(r.pb)] += r.c
    return js, psi


def test_merged_equals_from_scratch_same_geometry(spark):
    rng = np.random.default_rng(211)
    a = rng.normal(50, 10, 3000)
    # b INSIDE a's observed range so no clamping asymmetry is possible
    b = np.clip(rng.normal(55, 4, 1200), a.min(), a.max())
    dfa, dfb = _frame(spark, a), _frame(spark, b)
    prof = reference_profile(dfa, "v", nbins=24, psi_nbins=8)
    merged = update_reference_profile(prof, dfb)

    both = dfa.unionAll(dfb)
    js, psi = _from_scratch_counts(both, prof)
    assert merged["n"] == 4200
    assert np.array_equal(np.asarray(merged["js_counts"]), js)
    assert np.array_equal(np.asarray(merged["psi_counts"]), psi)

    st = both.agg(F.avg("v").alias("m"), F.var_samp("v").alias("var")).collect()[0]
    assert merged["mean"] == pytest.approx(float(st.m), rel=1e-12)
    assert merged["var"] == pytest.approx(float(st.var), rel=1e-9)
    # geometry stays FROZEN
    for k in ("mn", "mx", "width", "edges", "nbins", "psi_nbins"):
        assert merged[k] == prof[k]
    assert merged["needs_rebin"] is False


def test_chained_updates_associative(spark):
    rng = np.random.default_rng(223)
    a = rng.normal(0, 1, 2000)
    b = np.clip(rng.normal(0.2, 0.8, 500), a.min(), a.max())
    c = np.clip(rng.normal(-0.1, 1.1, 700), a.min(), a.max())
    prof = reference_profile(_frame(spark, a), "v", nbins=16, psi_nbins=4)
    one_by_one = update_reference_profile(
        update_reference_profile(prof, _frame(spark, b)), _frame(spark, c)
    )
    at_once = update_reference_profile(prof, _frame(spark, np.concatenate([b, c])))
    assert one_by_one["n"] == at_once["n"] == 3200
    assert one_by_one["js_counts"] == at_once["js_counts"]
    assert one_by_one["psi_counts"] == at_once["psi_counts"]
    assert one_by_one["mean"] == pytest.approx(at_once["mean"], rel=1e-12)
    assert one_by_one["var"] == pytest.approx(at_once["var"], rel=1e-9)


def test_range_drift_flags_rebin(spark):
    rng = np.random.default_rng(227)
    a = rng.uniform(0, 100, 2000)
    prof = reference_profile(_frame(spark, a), "v", nbins=10, psi_nbins=4)

    inside = update_reference_profile(prof, _frame(spark, rng.uniform(10, 90, 300)))
    assert inside["needs_rebin"] is False

    outside = update_reference_profile(prof, _frame(spark, rng.uniform(150, 200, 300)))
    assert outside["needs_rebin"] is True
    assert outside["data_mx"] >= 150.0
    # the out-of-range mass clamped into the TOP bin, none lost
    assert sum(outside["js_counts"]) == 2300
    assert outside["js_counts"][-1] >= prof["js_counts"][-1] + 300
    # frozen geometry untouched even when flagged
    assert outside["mn"] == prof["mn"] and outside["mx"] == prof["mx"]

    empty = update_reference_profile(prof, _frame(spark, []))
    assert empty["n"] == prof["n"] and empty["js_counts"] == prof["js_counts"]


def _evecs(rng, center, n, d=8, spread=0.3):
    return center + rng.normal(0, spread, size=(n, d))


def _eframe(spark, vecs):
    return spark.createDataFrame(
        [([float(x) for x in v],) for v in vecs], "embedding array<float>"
    )


def test_embedding_merged_equals_from_scratch(spark):
    rng = np.random.default_rng(311)
    c_a = np.linspace(0.5, 1.5, 8)
    a = _evecs(rng, c_a, 900)
    b = _evecs(rng, c_a + 0.4, 350)
    prof = embedding_reference_profile(_eframe(spark, a), "embedding")
    merged = update_embedding_reference_profile(prof, _eframe(spark, b))

    scratch = embedding_reference_profile(
        _eframe(spark, a).unionAll(_eframe(spark, b)), "embedding"
    )
    assert merged["n"] == scratch["n"] == 1250
    # float32 storage dominates the tolerance, not the merge algebra
    assert np.allclose(merged["centroid"], scratch["centroid"], atol=1e-6)
    assert merged["ref_rms"] == pytest.approx(scratch["ref_rms"], rel=1e-6)
    for k in ("kind", "column", "metric", "dim"):
        assert merged[k] == prof[k]


def test_embedding_update_associative_empty_and_dim_guard(spark):
    rng = np.random.default_rng(313)
    c = np.zeros(8)
    a, b, d = (_evecs(rng, c + off, n) for off, n in [(0, 600), (0.2, 200), (-0.1, 300)])
    prof = embedding_reference_profile(_eframe(spark, a), "embedding")
    one_by_one = update_embedding_reference_profile(
        update_embedding_reference_profile(prof, _eframe(spark, b)), _eframe(spark, d)
    )
    at_once = update_embedding_reference_profile(
        prof, _eframe(spark, np.concatenate([b, d]))
    )
    assert one_by_one["n"] == at_once["n"] == 1100
    assert np.allclose(one_by_one["centroid"], at_once["centroid"], atol=1e-9)
    assert one_by_one["ref_rms"] == pytest.approx(at_once["ref_rms"], rel=1e-9)

    empty = update_embedding_reference_profile(
        prof, spark.createDataFrame([], "embedding array<float>")
    )
    assert empty == prof

    with pytest.raises(ValueError, match="dim"):
        update_embedding_reference_profile(
            prof, _eframe(spark, _evecs(rng, np.zeros(5), 10, d=5))
        )


def test_embedding_merged_profile_hot_swaps_into_stream(spark, tmp_path):
    """Traffic from the updated reference mixture is in-distribution
    under the merged profile but flags under the stale one — same
    contract as the distribution hot-swap."""
    rng = np.random.default_rng(317)
    src = str(tmp_path / "esrc")
    # orthogonal (not antipodal) regimes: the mixture centroid stays
    # well away from zero, so cosine distances are numerically stable
    c_old = np.full(8, 1.0)
    c_new = np.array([1.0, 1.0, 1.0, 1.0, -1.0, -1.0, -1.0, -1.0])
    prof = embedding_reference_profile(
        _eframe(spark, _evecs(rng, c_old, 800, spread=0.2)), "embedding"
    )
    merged = update_embedding_reference_profile(
        prof, _eframe(spark, _evecs(rng, c_new, 800, spread=0.2))
    )
    # batch from the new 50:50 mixture
    batch = np.concatenate(
        [_evecs(rng, c_old, 150, spread=0.2), _evecs(rng, c_new, 150, spread=0.2)]
    )
    _eframe(spark, batch).coalesce(1).write.parquet(f"{src}/b0")
    stream_embedding_drift(
        spark, src + "/b*", prof, str(tmp_path / "estale"),
        schema="embedding array<float>",
    )
    stream_embedding_drift(
        spark, src + "/b*", merged, str(tmp_path / "efresh"),
        schema="embedding array<float>",
    )
    stale = spark.read.parquet(f"{tmp_path}/estale/embedding_metrics").collect()[0]
    fresh = spark.read.parquet(f"{tmp_path}/efresh/embedding_metrics").collect()[0]
    assert stale.drift_detected and not fresh.drift_detected
    assert stale.centroid_distance > fresh.centroid_distance
    assert stale.drift_score > fresh.drift_score


def test_merged_profile_hot_swaps_into_stream(spark, tmp_path):
    """A monitor restarted with the refreshed profile judges traffic
    matching the UPDATED reference mixture as in-distribution; the
    stale profile flags the same batch."""
    rng = np.random.default_rng(229)
    src = str(tmp_path / "src")
    a = rng.normal(10, 1, 2000)
    shifted = rng.normal(14, 1, 1500)  # the new (legitimate) regime
    prof = reference_profile(_frame(spark, a), "v", nbins=20, psi_nbins=5)
    merged = update_reference_profile(
        prof, _frame(spark, shifted), rebin_rel_threshold=10.0
    )

    # a batch drawn from the merged mixture (2000:1500 proportions)
    batch = np.concatenate([rng.normal(10, 1, 229), rng.normal(14, 1, 171)])
    _frame(spark, batch).coalesce(1).write.parquet(f"{src}/b0")
    stream_drift(
        spark, src + "/b*", prof, str(tmp_path / "stale"), schema="v double"
    )
    stream_drift(
        spark, src + "/b*", merged, str(tmp_path / "fresh"), schema="v double"
    )
    stale = spark.read.parquet(f"{tmp_path}/stale/drift_metrics").collect()[0]
    fresh = spark.read.parquet(f"{tmp_path}/fresh/drift_metrics").collect()[0]
    assert stale.drift_detected and stale.js > fresh.js
    assert stale.drift_score > fresh.drift_score
    assert not fresh.drift_detected
