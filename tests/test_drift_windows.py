"""End-to-end drift detection on the synthetic drift windows
(FIXTURES.md §3): injected shifts must trip, the null window must not.
"""

import pytest

from llm_drift_detector_spark.drift import distribution_drift
from llm_drift_detector_spark.synth.clips import (
    SynthParams,
    drift_params,
    make_clean_row,
)

BASE = SynthParams(n_rows=400, inject_violations=False)


@pytest.fixture(scope="module")
def dur_frames(spark):
    def dur_df(p):
        rows = [(float(make_clean_row(p, i)["dur_ms"]),) for i in range(p.n_rows)]
        return spark.createDataFrame(rows, "dur_ms double")

    return {
        "ref": dur_df(BASE),
        "mean_shift": dur_df(drift_params(BASE, "mean_shift")),
        "null": dur_df(drift_params(BASE, "null")),
    }


def test_mean_shift_trips_ks_and_t(dur_frames):
    res = distribution_drift(dur_frames["ref"], dur_frames["mean_shift"], "dur_ms")
    assert res["drift_detected"]
    assert res["methods"]["ks_test"]["p_value"] < 0.05
    assert res["methods"]["t_test"]["p_value"] < 0.05


def test_null_window_no_false_positive(dur_frames):
    res = distribution_drift(dur_frames["ref"], dur_frames["null"], "dur_ms")
    assert not res["drift_detected"]
    assert res["methods"]["ks_test"]["p_value"] >= 0.05
    assert res["methods"]["js_divergence"]["score"] <= 0.2
    # the reference's saturating combine DOES fire here — documented quirk
    assert res["drift_detected_reference_combine"]


def test_identical_windows_all_zero(dur_frames):
    res = distribution_drift(dur_frames["ref"], dur_frames["ref"], "dur_ms")
    assert not res["drift_detected"]
    assert res["methods"]["ks_test"]["statistic"] == 0.0
    assert abs(res["methods"]["js_divergence"]["score"]) < 1e-12
    assert abs(res["methods"]["psi"]["score"]) < 1e-12
