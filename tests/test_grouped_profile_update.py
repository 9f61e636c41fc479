"""Grouped incremental profile updates (distribution + embedding):
one fused job folds new data into every group; per-group results equal
the single-group updates on each slice; unknown groups are counted,
reported, and never folded."""

import numpy as np
import pytest
import pyspark.sql.functions as F

DDL = "provider string, x double"


def _rows(groups, n, shift=0.0, shift_group=None):
    out = []
    for g in groups:
        for i in range(n):
            out.append(
                (
                    g,
                    float(100 + (i * 7) % 31)
                    + (50.0 if g == "b" else 0.0)
                    + (shift if g == shift_group else 0.0),
                )
            )
    return out


def test_grouped_distribution_update_matches_per_group(spark):
    from llm_drift_detector_spark.streaming import (
        reference_profile,
        reference_profile_grouped,
        update_reference_profile,
        update_reference_profile_grouped,
    )

    ref = spark.createDataFrame(_rows(["a", "b"], 100), DDL)
    new = spark.createDataFrame(
        _rows(["a", "b"], 60, shift=-500.0, shift_group="b")
        + [("zzz", 1.0)] * 9,
        DDL,
    )
    gprof = reference_profile_grouped(ref, ["provider"], "x")
    merged = update_reference_profile_grouped(gprof, new)
    assert merged["unknown_rows"] == 9
    assert set(merged["profiles"]) == {("a",), ("b",)}

    for g in ("a", "b"):
        solo = update_reference_profile(
            reference_profile(ref.where(F.col("provider") == g), "x"),
            new.where(F.col("provider") == g),
        )
        got = merged["profiles"][(g,)]
        assert got["n"] == solo["n"]
        assert got["js_counts"] == solo["js_counts"]
        assert got["psi_counts"] == solo["psi_counts"]
        assert got["mean"] == pytest.approx(solo["mean"], rel=1e-12)
        assert got["var"] == pytest.approx(solo["var"], rel=1e-12)
        for k in ("data_mn", "data_mx", "needs_rebin"):
            assert got.get(k) == solo.get(k), (g, k)
    # only the shifted group's range moved enough to flag
    assert merged["profiles"][("b",)]["needs_rebin"]
    assert not merged["profiles"][("a",)]["needs_rebin"]

    # all-unknown fold: profiles untouched, count reported
    only_unknown = spark.createDataFrame([("qqq", 5.0)] * 4, DDL)
    m2 = update_reference_profile_grouped(gprof, only_unknown)
    assert m2["unknown_rows"] == 4
    assert m2["profiles"] == gprof["profiles"]


def _erows(groups, n, rot=None):
    out = []
    for g in groups:
        for i in range(n):
            v = [0.1] * 6
            hot = (0 if g == "a" else 2) if g != rot else 5
            v[hot] = 1.0 + (i % 3) * 0.1
            out.append((g, v))
    return out


EDDL = "provider string, emb array<float>"


def test_grouped_embedding_update_matches_per_group(spark):
    from llm_drift_detector_spark.streaming import (
        embedding_reference_profile,
        embedding_reference_profile_grouped,
        update_embedding_reference_profile,
        update_embedding_reference_profile_grouped,
    )

    ref = spark.createDataFrame(_erows(["a", "b"], 80), EDDL)
    new = spark.createDataFrame(
        _erows(["a", "b"], 50, rot="b") + [("zzz", [1.0] * 6)] * 5, EDDL
    )
    gprof = embedding_reference_profile_grouped(ref, ["provider"], "emb")
    merged = update_embedding_reference_profile_grouped(gprof, new)
    assert merged["unknown_rows"] == 5

    for g in ("a", "b"):
        solo = update_embedding_reference_profile(
            embedding_reference_profile(
                ref.where(F.col("provider") == g), "emb"
            ),
            new.where(F.col("provider") == g),
        )
        got = merged["profiles"][(g,)]
        assert got["n"] == solo["n"]
        assert np.allclose(got["centroid"], solo["centroid"], atol=1e-12)
        assert got["ref_rms"] == pytest.approx(solo["ref_rms"], rel=1e-9)

    # merged == from-scratch on the concatenated KNOWN windows
    both = ref.unionAll(new.where(F.col("provider") != "zzz"))
    scratch = embedding_reference_profile_grouped(both, ["provider"], "emb")
    for g in (("a",), ("b",)):
        assert merged["profiles"][g]["n"] == scratch["profiles"][g]["n"]
        assert np.allclose(
            merged["profiles"][g]["centroid"],
            scratch["profiles"][g]["centroid"],
            atol=1e-9,
        )
        assert merged["profiles"][g]["ref_rms"] == pytest.approx(
            scratch["profiles"][g]["ref_rms"], rel=1e-6
        )

    # dim mismatch rejected loudly
    bad = spark.createDataFrame([("a", [1.0, 2.0])], EDDL)
    with pytest.raises(ValueError, match="array length"):
        update_embedding_reference_profile_grouped(gprof, bad)


def test_grouped_updates_hot_swap_into_streams(spark, tmp_path):
    """Merged grouped profiles are drop-ins: save/load round-trips and
    the grouped streams accept them."""
    from llm_drift_detector_spark.streaming import (
        load_profile,
        reference_profile_grouped,
        save_profile,
        stream_drift_grouped,
        update_reference_profile_grouped,
    )

    ref = spark.createDataFrame(_rows(["a", "b"], 80), DDL)
    gprof = reference_profile_grouped(ref, ["provider"], "x")
    merged = update_reference_profile_grouped(
        gprof, spark.createDataFrame(_rows(["a", "b"], 40), DDL)
    )
    path = str(tmp_path / "g.json")
    save_profile(merged, path)
    loaded = load_profile(path)
    assert loaded["profiles"].keys() == merged["profiles"].keys()

    src, out = str(tmp_path / "src"), str(tmp_path / "out")
    spark.createDataFrame(
        _rows(["a", "b"], 30, shift=900.0, shift_group="a"), DDL
    ).coalesce(1).write.parquet(f"{src}/b0")
    stream_drift_grouped(spark, src + "/b*", loaded, out, schema=DDL)
    rows = {
        r.provider: r
        for r in spark.read.parquet(f"{out}/drift_metrics_grouped").collect()
    }
    assert rows["a"].drift_detected and not rows["b"].drift_detected


def test_matrix_update_matches_per_group_multi(spark):
    """update_reference_profile_multi_grouped == per-group
    update_reference_profile_multi on each slice, exactly."""
    from llm_drift_detector_spark.streaming import (
        reference_profile_multi,
        reference_profile_multi_grouped,
        update_reference_profile_multi,
        update_reference_profile_multi_grouped,
    )

    ddl = "provider string, fa double, fb double"

    def rows(groups, n, fb_shift=0.0, sg=None):
        return [
            (
                g,
                float(100 + (i * 7) % 31),
                float(50 + (i * 3) % 29) + (fb_shift if g == sg else 0.0),
            )
            for g in groups
            for i in range(n)
        ]

    ref = spark.createDataFrame(rows(["a", "b"], 90), ddl)
    new = spark.createDataFrame(
        rows(["a", "b"], 50, fb_shift=-300.0, sg="b") + [("zzz", 1.0, 2.0)] * 3,
        ddl,
    )
    mg = reference_profile_multi_grouped(ref, ["provider"], ["fa", "fb"])
    merged = update_reference_profile_multi_grouped(mg, new)
    assert merged["unknown_rows"] == 3

    for g in ("a", "b"):
        solo = update_reference_profile_multi(
            reference_profile_multi(
                ref.where(F.col("provider") == g), ["fa", "fb"]
            ),
            new.where(F.col("provider") == g),
        )
        for c in ("fa", "fb"):
            got = merged["profiles"][(g,)][c]
            want = solo["column_profiles"][c]
            assert got["n"] == want["n"]
            assert got["js_counts"] == want["js_counts"]
            assert got["psi_counts"] == want["psi_counts"]
            assert got["mean"] == pytest.approx(want["mean"], rel=1e-12)
            assert got["var"] == pytest.approx(want["var"], rel=1e-12)
            for k in ("data_mn", "data_mx", "needs_rebin"):
                assert got.get(k) == want.get(k), (g, c, k)
    assert merged["profiles"][("b",)]["fb"]["needs_rebin"]
    assert not merged["profiles"][("a",)]["fb"]["needs_rebin"]


def test_refresh_profiles_cli(spark, tmp_path, capsys):
    """The maintenance CLI auto-detects the stored kind, folds the new
    window, re-saves atomically, and surfaces the honesty flags."""
    import json
    import sys

    sys.path.insert(0, "/root/repo/jobs")
    import refresh_profiles

    from llm_drift_detector_spark.streaming import (
        load_profile,
        reference_profile_grouped,
        save_profile,
    )

    ref = spark.createDataFrame(_rows(["a", "b"], 80), DDL)
    new_dir = str(tmp_path / "new")
    spark.createDataFrame(
        _rows(["a", "b"], 40, shift=-900.0, shift_group="b")
        + [("zzz", 1.0)] * 6,
        DDL,
    ).write.parquet(new_dir)

    path = str(tmp_path / "frozen.json")
    save_profile(reference_profile_grouped(ref, ["provider"], "x"), path)

    assert refresh_profiles.main(
        ["--profile-path", path, "--new-data", new_dir]
    ) == 0
    s = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert s["kind"] == "distribution_grouped"
    assert s["n_before"] == 160 and s["n_after"] == 240
    assert s["flags"]["unknown_rows"] == 6
    assert s["flags"]["needs_rebin_groups"] == [["b"]]
    # the stored file now carries the merged profile
    assert load_profile(path)["profiles"][("a",)]["n"] == 120

    # unsupported kind fails loudly
    save_profile({"kind": "something_else", "keys": ["p"]}, path)
    with pytest.raises(SystemExit, match="no incremental update"):
        refresh_profiles.main(["--profile-path", path, "--new-data", new_dir])


def test_unknown_group_dim_mismatch_does_not_abort_embedding_update(spark):
    """A NEW provider with a different embedding dimension must be
    counted-not-folded, not crash the whole refresh; known-group dim
    mismatches still abort."""
    from llm_drift_detector_spark.streaming import (
        embedding_reference_profile_grouped,
        update_embedding_reference_profile_grouped,
    )

    ref = spark.createDataFrame(_erows(["a"], 60), EDDL)
    gprof = embedding_reference_profile_grouped(ref, ["provider"], "emb")

    new = spark.createDataFrame(
        _erows(["a"], 30) + [("newprov", [1.0, 2.0, 3.0])] * 8, EDDL
    )
    merged = update_embedding_reference_profile_grouped(gprof, new)
    assert merged["unknown_rows"] == 8
    assert merged["profiles"][("a",)]["n"] == 90
