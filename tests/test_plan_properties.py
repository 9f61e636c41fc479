"""Physical-plan property assertions for the headline operators.

Correctness tests prove the NUMBERS; these prove the PLANS — the
properties that decide whether the same code survives a 100x scale-up:
filters reach the parquet scan, projections prune columns, dimension
joins broadcast, native paths contain no Python evaluation, and the hot
expressions stay inside whole-stage codegen.
"""

import pyspark.sql.functions as F
import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def sf(sf_dir):
    # plan checks read the driver tables at the smallest tier
    return "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_scan(spark, sf):
    ev = spark.read.parquet(f"{sf}/events.parquet")
    plan = _plan(ev.where(F.col("ts") < "2024-01-15").select("value"))
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:200]
    assert "LessThan(ts" in pushed or "ts" in pushed


def test_column_pruning_in_read_schema(spark, sf):
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    plan = _plan(li.select("l_quantity", "l_discount"))
    rs = plan.split("ReadSchema")[1][:200]
    assert "l_quantity" in rs and "l_discount" in rs
    assert "l_comment" not in rs and "l_extendedprice" not in rs


def test_dimension_join_broadcasts(spark, sf):
    import __spark_entry__ as e

    plan = _plan(e.q_join_agg_revenue_by_nation(spark, sf))
    assert "BroadcastHashJoin" in plan


def test_topk_uses_take_ordered_not_full_sort(spark, sf):
    from llm_drift_detector_spark.textops import topk_brute

    import __spark_entry__ as e

    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    plan = _plan(topk_brute(emb, "vec_id", "embedding", e._ANN_QUERY, k=10))
    assert "TakeOrderedAndProject" in plan


def test_text_quality_fully_native_with_codegen(spark, sf):
    from llm_drift_detector_spark.textops import quality_scores

    d = spark.read.parquet(f"{sf}/documents.parquet")
    plan = _plan(quality_scores(d, "doc_id", "text"))
    # "*(n)" marks whole-stage-codegen spans in executedPlan toString;
    # the HOF lambdas in the top Project run interpreted (expected — no
    # codegen for lambda functions), but the scan pipeline is codegen'd
    # and columnar, and nothing touches Python.
    assert "*(1)" in plan and "Batched: true" in plan
    for bad in ("EvalPython", "InPandas", "MapInArrow"):
        assert bad not in plan


def test_audio_shortcut_fetch_pushes_ids_into_scan(spark, sf_dir):
    """The targeted payload fetch must reach the scan as a pushed filter
    (In/InSet on clip_id), not a post-scan broadcast join — the third
    payload-column read is row-group-pruned."""
    from llm_drift_detector_spark.checks.audio import audio_invariant_violations
    from llm_drift_detector_spark.synth import ensure_synth

    root = ensure_synth(spark, sf_dir)
    clips = spark.read.parquet(f"{root}/clips")
    ref = spark.read.parquet(f"{root}/clips_reference")
    plan = _plan(audio_invariant_violations(clips, ref))
    # at least one scan carries a pushed clip_id In filter
    assert any(
        "clip_id" in seg[:400]
        for seg in plan.split("PushedFilters")[1:]
        if "In(clip_id" in seg[:400] or "In(" in seg[:200]
    ), "no In(clip_id,...) pushed into any scan"


def test_wav_native_dur_path_is_python_free(spark, sf_dir):
    """The canonical-wav dur check (r4) is pure JVM: header magic via
    binary substring + length arithmetic on the scan — no Python stage
    anywhere in the plan, and the scan stays columnar/codegen'd."""
    import __spark_entry__ as e

    frame = e.q_clips_dur_mismatch_bytelen(spark, sf_dir)
    plan = _plan(frame)
    for bad in ("EvalPython", "InPandas", "MapInArrow"):
        assert bad not in plan
    assert "Batched: true" in plan and "*(1)" in plan


def test_multi_drift_fused_aggregate_partials_before_exchange(spark):
    """The multi-column drift aggregate (streaming per-batch job and
    profile binned pass) must stay Python-free and partially aggregate
    BEFORE its exchange — the explode multiplies rows by N columns, and
    only map-side combine keeps the shuffle at O(N x nbins x psi_nbins)
    per task instead of O(rows x N)."""
    from llm_drift_detector_spark.streaming.drift_stream import (
        _clamped_bin,
        _psi_bucket,
        reference_profile_multi,
    )

    rows = [(float(1000 + (i % 13)), float(50 + (i * 3) % 29)) for i in range(300)]
    ref = spark.createDataFrame(rows, "fa double, fb double")
    prof = reference_profile_multi(ref, ["fa", "fb"])

    cols = ["fa", "fb"]
    base = ref.select(
        *[F.col(c).cast("double").alias(f"v{i}") for i, c in enumerate(cols)]
    )
    structs = []
    for i, c in enumerate(cols):
        p = prof["column_profiles"][c]
        v = F.col(f"v{i}")
        structs.append(
            F.when(
                v.isNotNull(),
                F.struct(
                    F.lit(i).alias("ci"),
                    _clamped_bin(v, p["mn"], p["width"], p["nbins"]).alias("jb"),
                    _psi_bucket(v, p["edges"]).alias("pb"),
                    v.alias("v"),
                ),
            )
        )
    agg = (
        base.select(
            F.explode(F.filter(F.array(*structs), lambda x: x.isNotNull())).alias("x")
        )
        .select("x.ci", "x.jb", "x.pb", "x.v")
        .groupBy("ci", "jb", "pb")
        .agg(F.count("*").alias("c"), F.sum("v").alias("s"))
    )
    plan = _plan(agg)
    assert "Python" not in plan  # no BatchEvalPython / ArrowEval anywhere
    # a partial aggregate must appear BELOW the exchange
    pre_exchange = plan.split("Exchange hashpartitioning", 1)[1]
    assert "partial_count" in pre_exchange and "partial_sum" in pre_exchange
