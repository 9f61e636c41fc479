"""Round-6 optimization equivalence tests.

Each optimization restructured an operator's plan without changing its
results; these tests pin the equivalences explicitly:

- binned grouped drift: driver-side stage 3 (bounded grids) vs the
  distributed array-reduction stage 3, including one-sided, degenerate-
  range and null-key groups;
- audio invariants: the merged decode+SNR broadcast path vs the shuffled
  pair-join fallback vs the fully-lazy fallback;
- the fused relational checks vs the standalone operators on adversarial
  duplicate/orphan/equality shapes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from llm_drift_detector_spark.drift import (
    grouped_distribution_drift_binned,
    tag_windows,
)
from llm_drift_detector_spark.pipeline.runner import RunConfig, _violations_for_group


def _rows_map(rows, keys=("codec",)):
    return {tuple(r[k] for k in keys): r.asDict() for r in rows}


def test_grouped_binned_driver_stage3_matches_distributed(spark):
    rows = (
        [("only_ref", "ref", 1.0)] * 6
        + [("only_cur", "cur", 2.0)] * 6
        + [("const", "ref", 5.0)] * 8
        + [("const", "cur", 5.0)] * 8
        + [(None, "ref", 1.0), (None, "cur", 9.0)] * 6
        + [("mix", "ref", float(i)) for i in range(30)]
        + [("mix", "cur", float(i * 2)) for i in range(30)]
    )
    edge = spark.createDataFrame(rows, "codec string, side string, v double")
    a = grouped_distribution_drift_binned(edge, ["codec"], "v", min_samples=3).collect()
    b = grouped_distribution_drift_binned(
        edge, ["codec"], "v", min_samples=3, max_driver_cells=0
    ).collect()
    am, bm = _rows_map(a), _rows_map(b)
    assert set(am) == set(bm)
    for g in am:
        for f, x in am[g].items():
            y = bm[g][f]
            if isinstance(x, float):
                assert x == pytest.approx(y, abs=1e-12), (g, f, x, y)
            else:
                assert x == y, (g, f, x, y)
    # gated one-sided groups zero every metric in both paths
    assert am[("only_ref",)]["gated"] and am[("only_ref",)]["ks_d"] == 0.0
    # degenerate range: js/ks/wd forced 0, not gated
    assert not am[("const",)]["gated"] and am[("const",)]["js"] == 0.0


def test_grouped_binned_min_samples_zero_uses_distributed_path(spark):
    # min_samples=0 keeps the distributed stage 3 (NULL semantics owner);
    # the two entry points must still agree on a well-populated frame
    df = tag_windows(
        spark.createDataFrame([(float(i),) for i in range(40)], "v double"),
        spark.createDataFrame([(float(i * 2),) for i in range(40)], "v double"),
    ).withColumn("g", F.lit("a"))
    a = grouped_distribution_drift_binned(df, ["g"], "v", min_samples=0).collect()
    b = grouped_distribution_drift_binned(df, ["g"], "v", min_samples=3).collect()
    assert a[0]["js"] == pytest.approx(b[0]["js"], abs=1e-12)


@pytest.fixture(scope="module")
def synth(spark, sf_dir):
    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, sf_dir)
    return {
        "clips": spark.read.parquet(f"{root}/clips"),
        "reference": spark.read.parquet(f"{root}/clips_reference"),
    }


def test_audio_fetch_paths_agree(synth):
    from llm_drift_detector_spark.checks.audio import audio_invariant_violations

    def key(rows):
        return sorted((r.clip_id, r.check_name, r.detail) for r in rows)

    merged = key(audio_invariant_violations(synth["clips"], synth["reference"]).collect())
    pair_join = key(
        audio_invariant_violations(
            synth["clips"], synth["reference"], max_broadcast_fetch_ids=0
        ).collect()
    )
    lazy = key(
        audio_invariant_violations(
            synth["clips"], synth["reference"], max_collected_violations=0
        ).collect()
    )
    assert merged == pair_join == lazy
    assert merged  # non-empty: synth injects violations


def test_fused_relational_checks_match_standalone(spark):
    clips = spark.createDataFrame(
        [
            ("dup", "same text"), ("dup", "same text"),        # uniqueness, equal
            ("dup2", "a"), ("dup2", "b"),                      # uniqueness + mismatch
            ("orphan_clip", "x"),
            ("eq", "hello"),
            ("neq", "hello"),
            ("nulls", None),
            ("null_vs_text", None),
        ],
        "clip_id string, transcript string",
    )
    tr = spark.createDataFrame(
        [
            ("dup", "same text"),
            ("dup2", "a"),
            ("orphan_tr", "y"),
            ("eq", "hello"),
            ("neq", "world"),
            ("nulls", None),
            ("null_vs_text", "t"),
        ],
        "clip_id string, transcript string",
    )
    cfg = RunConfig(
        run_id="t",
        out_dir="/tmp/t",
        enabled_checks=(
            "uniqueness",
            "referential_clip_orphan",
            "referential_transcript_orphan",
            "transcript_equality",
        ),
    )
    got = {
        (r.check_name, r.clip_id)
        for r in _violations_for_group(clips, tr, clips.limit(0), cfg).collect()
        if r.check_name
        in (
            "uniqueness",
            "referential_clip_orphan",
            "referential_transcript_orphan",
            "transcript_equality",
        )
    }
    expected = {
        ("uniqueness", "dup"),
        ("uniqueness", "dup2"),
        ("referential_clip_orphan", "orphan_clip"),
        ("referential_transcript_orphan", "orphan_tr"),
        ("transcript_equality", "dup2"),       # {a,b} vs {a}: some pair differs
        ("transcript_equality", "neq"),
        ("transcript_equality", "null_vs_text"),  # NULL vs text differs null-safely
        # NOT: ("transcript_equality", "dup")   {same,same} vs {same}: all equal
        # NOT: ("transcript_equality", "nulls") NULL <=> NULL
    }
    assert got == expected
    # uniqueness detail carries the multiplicity like duplicate_keys did
    detail = {
        r.clip_id: r.detail
        for r in _violations_for_group(clips, tr, clips.limit(0), cfg).collect()
        if r.check_name == "uniqueness"
    }
    assert detail["dup"] == '{"n":2}'
