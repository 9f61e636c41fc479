"""Table I/O abstraction + time-window helpers.

Reference parity (SURVEY §2.1): the reference hand-implements per-backend
scans/sinks with the same five predicates (JSON files, local multi-format,
SQL, Redis — S1-S13); on Spark those collapse into ``spark.read`` /
``df.write`` with Catalyst doing pushdown.  This module is the single
writer/reader seam:

- ``table:<name>`` specs go through the session catalog (Iceberg when the
  runtime jar + catalog are configured — ``writeTo(...).append()`` /
  ``MERGE`` semantics; the sandbox has no Iceberg jar, so catalog specs
  require the deployment to provide it).
- plain paths are parquet directories (the sandbox fallback; same writer
  API shape).

Time-rotation (S12/W4): the reference rotates metrics CSV files by
hour/day/week/month in the FILENAME; here rotation is a time-partitioned
write — ``partitionBy(date_trunc)`` — which Iceberg/parquet readers prune
on (S13's mtime-window scan becomes a partition predicate).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, spec: str) -> DataFrame:
    if spec.startswith("table:"):
        return spark.read.table(spec[len("table:"):])
    return spark.read.parquet(spec)


def write_table(
    df: DataFrame,
    spec: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
) -> None:
    if spec.startswith("table:"):
        name = spec[len("table:"):]
        w = df.writeTo(name)
        if mode == "overwrite":
            w.createOrReplace()
        else:
            w.append()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(spec)


def write_bucket_partitioned(
    df: DataFrame, spec: str, n_buckets: int = 32, key: str = "clip_id"
) -> None:
    """Materialize ``bucket_id = pmod(xxhash64(key), n_buckets)`` as a
    PARTITION column — the plain-parquet equivalent of Iceberg's
    ``bucket(key, B)`` transform.  run_validation detects the column and
    filters on it, so each bucket group's scan PRUNES to its partitions
    instead of re-scanning the full input with a computed predicate
    (the 10^12-row requirement; see runner module docstring)."""
    from ..checks.base import bucket_id

    write_table(
        df.withColumn("bucket_id", bucket_id(key, n_buckets)),
        spec,
        mode="overwrite",
        partition_by=["bucket_id"],
    )


def merge_upsert(
    spark: SparkSession, df: DataFrame, spec: str, keys: list[str],
    order_col: str | None = None,
) -> None:
    """MERGE-equivalent idempotent write: a row whose key tuple already
    exists in the target is NOT inserted again (WHEN NOT MATCHED THEN
    INSERT semantics) — re-running a crashed writer cannot duplicate.

    ``table:`` specs issue a real ``MERGE INTO`` (Iceberg / any v2
    catalog with row-level ops — the production path).  Plain paths get
    the parquet fallback: left-anti join against the existing keys, then
    append.  The fallback is idempotent but not atomic across concurrent
    writers; Iceberg's snapshot commit is, which is why the catalog is
    the mandated target at scale.

    In-batch duplicate keys: pass ``order_col`` (ts/updated_at) to keep
    the LATEST row per key deterministically (row_number over the keys,
    ordered by it descending).  Without it, same-key rows in one batch
    MUST be identical — dropDuplicates keeps an arbitrary one, so two
    differing rows would yield a partitioning-dependent survivor.
    """
    # duplicate keys WITHIN the batch would be inserted twice by both
    # paths (MERGE only guards against target matches) — collapse first
    if order_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        df = df.dropDuplicates(keys)
    if spec.startswith("table:"):
        name = spec[len("table:"):]
        df.createOrReplaceTempView("_merge_src")
        cond = " AND ".join(f"t.{k} = s.{k}" for k in keys)
        spark.sql(
            f"MERGE INTO {name} t USING _merge_src s ON {cond} "
            "WHEN NOT MATCHED THEN INSERT *"
        )
        spark.catalog.dropTempView("_merge_src")
        return
    # target-existence probe via the engine, not os.path: os.path.exists is
    # always False for s3://, hdfs:// etc., which silently skipped the
    # anti-join and duplicated rows on re-run for non-local targets
    from pyspark.errors import AnalysisException

    try:
        existing = spark.read.parquet(spec).select(*keys).distinct()
    except AnalysisException as e:
        # ONLY "no target yet" may skip the dedup — a transient read
        # failure (credentials, throttling, corrupt footer) must raise,
        # or the anti-join is silently skipped and the re-run appends
        # every already-written key again
        msg = str(e)
        # UNABLE_TO_INFER_SCHEMA covers the existing-but-empty target:
        # a killed first write leaves only _temporary/ (no parquet
        # footers), which is "no data committed yet", not a transient
        # failure — treating it as fatal would brick every rerun of the
        # crash-recovery replay until the dir is manually deleted.
        if (
            "PATH_NOT_FOUND" not in msg
            and "Path does not exist" not in msg
            and "UNABLE_TO_INFER_SCHEMA" not in msg
        ):
            raise
        existing = None
    if existing is not None:
        df = df.join(existing, keys, "left_anti")
    df.write.mode("append").parquet(spec)


def write_metrics_rotated(
    metrics: DataFrame, spec: str, period: str = "day", ts_col: str = "timestamp"
) -> None:
    """S12/W4: append metrics partitioned by the rotation period."""
    rotated = metrics.withColumn("period", F.date_trunc(period, F.col(ts_col)))
    write_table(rotated, spec, mode="append", partition_by=["period"])


def recent_window(df: DataFrame, ts_col: str, hours: float, now=None) -> DataFrame:
    """W2: 'recent N hours' sliding filter (metrics.py:297-322)."""
    now_expr = F.lit(now).cast("timestamp") if now is not None else F.current_timestamp()
    return df.where(
        F.col(ts_col) >= now_expr - F.expr(f"INTERVAL {int(hours * 3600)} SECONDS")
    )


def weighted_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    seed: int = 7,
    exact_k: int | None = None,
) -> DataFrame:
    """O6 weighted/stratified sampling.

    Default: native ``sampleBy`` — one scan, per-stratum Bernoulli
    acceptance, no shuffle (row counts are approximate, the scale path).
    ``exact_k``: exactly k rows per stratum via a seeded per-stratum
    rank window (deterministic, one shuffle on the strata column) — the
    small-side path when downstream needs fixed sample sizes (e.g. the
    MMD cap).
    """
    if exact_k is None:
        return df.sampleBy(strata_col, fractions, seed)
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(F.xxhash64(F.struct(*df.columns), F.lit(seed)))
    return (
        df.where(F.col(strata_col).isin(list(fractions)))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= exact_k)
        .drop("_rn")
    )


def last_n_per_group(
    df: DataFrame, order_col: str, n: int, group_cols: list[str] | None = None
) -> DataFrame:
    """W3: current-window selection — last `n` rows by `order_col` per
    group (the reference's window_size=100 slice, default_config.py:104)."""
    from pyspark.sql import Window

    w = Window.partitionBy(*(group_cols or [])).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )
