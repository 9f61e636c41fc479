"""Embedding drift vs numpy oracle (reference embedding.py:60-248) and
on the synth drift windows (rotation must trip, null must not)."""

import numpy as np
import pytest

from llm_drift_detector_spark.drift import (
    centroid,
    centroid_cosine_frame,
    embedding_drift,
    mean_dist_frame,
    mmd_cosine,
)
from llm_drift_detector_spark.synth.clips import (
    SynthParams,
    drift_params,
    make_transcript_rows,
)

RNG = np.random.default_rng(11)
A = RNG.normal(0, 1, size=(300, 16))
B_SAME = RNG.normal(0, 1, size=(250, 16))
B_SHIFT = RNG.normal(0.8, 1, size=(250, 16))


def emb_df(spark, m):
    return spark.createDataFrame(
        [(row.tolist(),) for row in m.astype(float)], "embedding array<double>"
    )


def np_cos(a, b):
    return 1.0 - np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))


def test_centroid_matches_numpy(spark):
    df = emb_df(spark, A)
    c = centroid(df, "embedding")
    assert np.allclose(c, A.mean(axis=0), atol=1e-12)


def test_mean_dist_matches_numpy(spark):
    df = emb_df(spark, A)
    c = A.mean(axis=0)
    got = mean_dist_frame(df, "embedding", c).collect()[0].mean_dist
    exp = np.mean([np_cos(r, c) for r in A])
    assert abs(got - exp) < 1e-9


def test_centroid_cosine_frame_matches(spark):
    ra, rb = emb_df(spark, A), emb_df(spark, B_SHIFT)
    got = centroid_cosine_frame(ra, rb, "embedding", 16).collect()[0].centroid_cosine
    exp = np_cos(A.mean(axis=0), B_SHIFT.mean(axis=0))
    assert abs(got - exp) < 1e-9


def test_mmd_properties():
    assert mmd_cosine(A, A) < 1e-9  # identical sets -> ~0
    assert mmd_cosine(A, B_SHIFT) > mmd_cosine(A, B_SAME)


def test_embedding_drift_full_matches_numpy(spark):
    ra, rb = emb_df(spark, A), emb_df(spark, B_SHIFT)
    res = embedding_drift(ra, rb, use_mmd=False)
    c_a, c_b = A.mean(axis=0), B_SHIFT.mean(axis=0)
    cd = np_cos(c_a, c_b)
    ri = np.mean([np_cos(r, c_a) for r in A])
    ci = np.mean([np_cos(r, c_b) for r in B_SHIFT])
    vc = abs(ci - ri) / max(ri, 1e-10)
    ad = np.mean([np_cos(r, c_a) for r in B_SHIFT])
    exp = 0.6 * cd + 0.2 * vc + 0.2 * ad
    assert abs(res["drift_score"] - exp) < 1e-9
    assert res["drift_detected"]


def test_embedding_drift_gate(spark):
    res = embedding_drift(emb_df(spark, A[:5]), emb_df(spark, B_SAME))
    assert res.get("gated") and not res["drift_detected"]


@pytest.mark.parametrize("kind,should_trip", [("embed_rot", True), ("null", False)])
def test_synth_rotation_window(spark, kind, should_trip):
    base = SynthParams(n_rows=300, inject_violations=False)

    def emb_window(p):
        rows = []
        for i in range(p.n_rows):
            for r in make_transcript_rows(p, i):
                rows.append((r["embedding"].tolist(),))
        return spark.createDataFrame(rows, "embedding array<float>")

    ref = emb_window(base)
    cur = emb_window(drift_params(base, kind))
    res = embedding_drift(ref, cur, use_mmd=True)
    assert res["drift_detected"] == should_trip, res


def test_high_dim_centroid_exploded_path(spark):
    """d > CENTROID_EXPLODE_DIM switches to the posexplode plan (codegen-
    safe at any dimensionality) and matches the d-expression aggregate."""
    import numpy as np

    from llm_drift_detector_spark.drift.embedding import (
        CENTROID_EXPLODE_DIM,
        centroid,
        centroid_frame,
    )

    d = CENTROID_EXPLODE_DIM + 64
    rng = np.random.default_rng(2)
    mat = rng.standard_normal((50, d))
    df = spark.createDataFrame(
        [(r.tolist(),) for r in mat], f"embedding array<double>"
    )
    got = centroid(df, "embedding", d)
    assert got.shape == (d,)
    assert np.allclose(got, mat.mean(axis=0), atol=1e-12)
    # spot-check agreement with the low-d aggregate plan on a slice
    row = centroid_frame(df, "embedding", 4).collect()[0]
    assert np.allclose([row[f"avg_{i}"] for i in range(4)], got[:4], atol=1e-12)
