"""Structured Streaming validation.

The reference is poll-based batch (SURVEY §2.10: no watermarks, no
stateful ops — `detection_frequency_minutes: 60`); the Spark engine adds
a streaming ingestion path as the natural upgrade:

- :func:`stream_validate` — `readStream` over a clips directory; each
  micro-batch runs the batch-LOCAL subset of the `violations_frame` plan
  via `foreachBatch` and appends to the violations sink.  Batch-local =
  domain, clip-orphan, transcript equality, dur_ms/SNR payload checks —
  the checks whose per-row verdict doesn't depend on rows outside the
  batch.  Globally-scoped checks (transcript-orphan, uniqueness) are
  EXCLUDED: on a micro-batch they false-positive (a transcript whose
  clip arrives in the next batch is not an orphan; cross-batch duplicate
  clip_ids are invisible).  They belong to the bucket-checkpointed batch
  runner, or to a stateful operator (see streaming/stateful.py).
  `Trigger.AvailableNow` drains a backlog then stops — the test/cron
  mode; omit for continuous.
- :func:`windowed_violation_counts` — watermarked tumbling-window
  violation rates: the late-data-tolerant aggregation
  (`withWatermark` + `window`) the reference's hourly poll approximates.

Checkpointing is Spark's own streaming checkpoint (source offsets +
sink commit log) — complementary to the batch runner's bucket
checkpoints: the stream guarantees each input FILE is processed once;
the batch runner guarantees bucket-level resume within a huge snapshot.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..pipeline.runner import RunConfig, violations_frame

CLIPS_DDL = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)


def stream_validate(
    spark: SparkSession,
    clips_dir: str,
    transcripts: DataFrame,
    reference: DataFrame,
    out_dir: str,
    run_id: str = "stream",
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    cfg: RunConfig | None = None,
):
    """Start (and with available_now=True, run to completion) a streaming
    validation over a clips parquet directory.  Returns the query.

    ``cfg`` customizes check selection — every check that survives the
    batch-local subset is streaming-safe, including the opt-in
    ``audio_quality`` gate (its verdict is per-row).

    The static sides are FROZEN AT STREAM START and persisted pruned:
    without this, every micro-batch re-scans the transcripts table and
    re-hashes EVERY reference payload (the SNR candidate join computes
    xxhash64(bytes) over the whole reference window per trigger) — the
    measured majority of the drain cost.  What persists is tiny: the
    (clip_id, transcript) projection and a ~16-byte/row hash frame —
    never reference payloads.  Freezing matches the drift streams'
    frozen-profile contract (the comparison target must not drift with
    the current data); at 10^12 rows, persist the hash frame to a table
    once instead of caching (same seam: ``reference_hashes``).  In
    AvailableNow mode both are unpersisted after the drain; a
    continuous stream keeps them pinned for its lifetime.
    """
    reader = spark.readStream.schema(CLIPS_DDL)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(clips_dir)
    sink = os.path.join(out_dir, "violations_stream")
    checkpoint = os.path.join(out_dir, "_stream_checkpoint")
    cfg = cfg or RunConfig(run_id=run_id, out_dir=out_dir)

    t_static = transcripts.select("clip_id", "transcript").persist()
    t_static.count()
    ref_hashes = None
    if cfg.snr_mode != "deep" and (
        cfg.check_active("dur_ms_mismatch") or cfg.check_active("snr_allclose")
    ):
        ref_hashes = reference.select(
            "clip_id", F.xxhash64("bytes").alias("rh")
        ).persist()
        ref_hashes.count()

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        # include_global=False: a micro-batch is a PARTIAL view of clips,
        # so transcript-orphan would flag every transcript whose clip is
        # in another batch, and uniqueness only sees within-batch dups.
        # Those two stay with the bucket-checkpointed batch runner (or
        # the stateful path, streaming/stateful.py).
        # One source read per trigger: the violations union's branches
        # (relational join, domains, audio eager pass + decode stage)
        # each consumed their own scan of the batch files; the cached
        # slice lives exactly as long as this batch's computation.
        batch_df = batch_df.persist()
        try:
            (
                violations_frame(
                    batch_df, t_static, reference, cfg,
                    include_global=False, reference_hashes=ref_hashes,
                )
                .withColumn("run_id", F.lit(run_id))
                .withColumn("epoch", F.lit(epoch_id))
                .write.mode("append")
                .parquet(sink)
            )
        finally:
            batch_df.unpersist()

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
        t_static.unpersist()
        if ref_hashes is not None:
            ref_hashes.unpersist()
    return q


def windowed_violation_counts(
    violations: DataFrame,
    ts_col: str = "ingest_ts",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window violation counts per check — the
    late-data-tolerant streaming aggregation (works on a streaming OR
    batch frame; streaming requires `ts_col` to be event time)."""
    return (
        violations.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), F.col("check_name"))
        .agg(F.count("*").alias("violations"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "check_name",
            "violations",
        )
    )
