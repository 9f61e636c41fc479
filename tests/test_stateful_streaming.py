"""applyInPandasWithState running-drift operator: state persists across
micro-batches; a shifted batch trips the z-score."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def stream_env(spark, tmp_path_factory):
    """Two parquet files processed as separate micro-batches
    (maxFilesPerTrigger=1): batch 1 establishes state at mean 10,
    batch 2 is shifted to mean 30."""
    base = tmp_path_factory.mktemp("stateful")
    src = str(base / "src")
    out = str(base / "out")
    cp = str(base / "cp")
    rng = np.random.default_rng(9)
    b1 = [("a", float(v)) for v in rng.normal(10, 1, 500)]
    b2 = [("a", float(v)) for v in rng.normal(30, 1, 500)]
    spark.createDataFrame(b1, "key string, value double").coalesce(1).write.parquet(
        src + "/batch=1"
    )
    spark.createDataFrame(b2, "key string, value double").coalesce(1).write.parquet(
        src + "/batch=2"
    )
    return {"src": src, "out": out, "cp": cp}


def test_running_drift_state_across_microbatches(spark, stream_env):
    from llm_drift_detector_spark.streaming.stateful import running_drift_state

    stream = (
        spark.readStream.schema("key string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_env["src"] + "/batch=*")
    )
    q = (
        running_drift_state(stream, "key", "value")
        .writeStream.format("parquet")
        .option("path", stream_env["out"])
        .option("checkpointLocation", stream_env["cp"])
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        spark.read.parquet(stream_env["out"]).collect(), key=lambda r: r.running_n
    )
    assert len(rows) == 2
    first, second = rows
    # batch 1: no prior state -> z=0, establishes running stats
    assert first.batch_n == 500 and first.z_score == 0.0 and not first.drifted
    assert abs(first.running_mean - 10.0) < 0.5
    # batch 2: shifted mean vs accumulated state -> massive z, drifted,
    # and the state carried over (running_n includes both batches)
    assert second.batch_n == 500 and second.running_n == 1000
    assert second.drifted and second.z_score > 100
    assert 19 < second.running_mean < 21  # pooled mean of 10s and 30s
