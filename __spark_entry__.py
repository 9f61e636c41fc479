"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Conventions used here so Spark and DuckDB hash identically:
- every computed double is ROUND(x, 4) on BOTH sides;
- every aggregate / computed column is aliased identically on both sides;
- results are deterministic (no timestamps, no rand).

Clip-table queries run over the deterministic synthetic audio tables
(FIXTURES.md) cached under /root/repo/data/synth/<tier>/; their oracle
SQL reads the same parquet files via read_parquet() absolute paths.
``_ensure_synth_for_oracle`` regenerates them (pure pandas/pyarrow, no
Spark) if the cache is missing when oracle_sql() is called.
"""

from __future__ import annotations

import os
from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from llm_drift_detector_spark.checks import (
    domain_violations,
    duplicate_keys,
    orphans,
    profile,
    uniqueness_metrics,
)
from llm_drift_detector_spark.config import CODEC_WHITELIST, SR_HZ_DOMAIN
from llm_drift_detector_spark.synth import ensure_synth, synth_dir_for
from llm_drift_detector_spark.synth.clips import ensure_synth_local

SYNTH_SF001 = "/root/repo/data/synth/sf0.01"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _clips(spark: SparkSession, sf_dir: str, name: str = "clips") -> DataFrame:
    root = ensure_synth(spark, sf_dir)
    return spark.read.parquet(os.path.join(root, name))


def _round4(df: DataFrame) -> DataFrame:
    """Round every double column to 4 decimals (cross-engine hash parity)."""
    cols = [
        F.round(F.col(f.name), 4).alias(f.name)
        if f.dataType.simpleString() == "double"
        else F.col(f.name)
        for f in df.schema.fields
    ]
    return df.select(*cols)


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: validation summary of the sf0.001 synthetic clips table.

    One row per check with its violation count, plus a rows_total row —
    the engine's core "validate a clips table, emit violations" job
    (SURVEY.md §7.1) collapsed to its summary.
    """
    sf_dir = "/root/testdata/sf0.001"
    clips = _clips(spark, sf_dir, "clips")
    tr = _clips(spark, sf_dir, "transcripts")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").cast("bigint").alias("violations")).select(
            F.lit(name).alias("check_name"), "violations"
        )

    parts = [
        clips.agg(F.count("*").cast("bigint").alias("violations")).select(
            F.lit("rows_total").alias("check_name"), "violations"
        ),
        one("uniqueness", duplicate_keys(clips)),
        one("sr_hz_domain", domain_violations(clips, "sr_hz", SR_HZ_DOMAIN)),
        one("codec_whitelist", domain_violations(clips, "codec", CODEC_WHITELIST)),
        one("referential_clip_orphan", orphans(clips, tr)),
        one("referential_transcript_orphan", orphans(tr, clips)),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("check_name")


# ---------------------------------------------------------------------------
# queries — Spark side
# ---------------------------------------------------------------------------


def q_stats_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return _round4(profile(li, ["l_quantity", "l_extendedprice", "l_discount"]))


def q_uniqueness_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _round4(uniqueness_metrics(_t(spark, sf_dir, "orders"), "o_orderkey"))


def q_uniqueness_events_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _round4(uniqueness_metrics(_t(spark, sf_dir, "events"), "user_id"))


def q_referential_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("clip_id"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("clip_id"))
    return orphans(o, c).select(F.col("clip_id").cast("bigint").alias("orphan_key"))


def q_referential_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("clip_id"))
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("clip_id"))
    return orphans(c, o).select(F.col("clip_id").cast("bigint").alias("orphan_key"))


def q_clips_stats_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _round4(profile(_clips(spark, sf_dir), ["sr_hz", "dur_ms"]))


def q_clips_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _round4(uniqueness_metrics(_clips(spark, sf_dir), "clip_id"))


def q_clips_duplicate_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return duplicate_keys(_clips(spark, sf_dir)).select(
        "clip_id", F.col("n").cast("bigint").alias("n")
    )


def q_clips_sr_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_violations(_clips(spark, sf_dir), "sr_hz", SR_HZ_DOMAIN)


def q_clips_codec_whitelist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return domain_violations(_clips(spark, sf_dir), "codec", CODEC_WHITELIST)


def q_clips_orphan_clips(spark: SparkSession, sf_dir: str) -> DataFrame:
    return orphans(_clips(spark, sf_dir), _clips(spark, sf_dir, "transcripts"))


def q_clips_orphan_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return orphans(_clips(spark, sf_dir, "transcripts"), _clips(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "stats_profile_lineitem": q_stats_profile_lineitem,
        "uniqueness_orders": q_uniqueness_orders,
        "uniqueness_events_user": q_uniqueness_events_user,
        "referential_orders_customer": q_referential_orders_customer,
        "referential_customer_orders": q_referential_customer_orders,
        "clips_stats_profile": q_clips_stats_profile,
        "clips_uniqueness": q_clips_uniqueness,
        "clips_duplicate_keys": q_clips_duplicate_keys,
        "clips_sr_domain": q_clips_sr_domain,
        "clips_codec_whitelist": q_clips_codec_whitelist,
        "clips_orphan_clips": q_clips_orphan_clips,
        "clips_orphan_transcripts": q_clips_orphan_transcripts,
    }


# ---------------------------------------------------------------------------
# oracle SQL — DuckDB side
# ---------------------------------------------------------------------------


def _ensure_synth_for_oracle() -> None:
    if not os.path.exists(os.path.join(SYNTH_SF001, "_DONE")):
        ensure_synth_local("/root/testdata/sf0.01")


def _profile_sql(src: str, columns: list[str]) -> str:
    parts = []
    for c in columns:
        parts.append(
            f"""
    SELECT '{c}' AS "column",
           count({c}) AS count,
           count(*) - count({c}) AS null_count,
           ROUND((count(*) - count({c})) * 1.0 / GREATEST(count(*), 1), 4) AS null_rate,
           ROUND(avg({c}), 4) AS mean,
           ROUND(COALESCE(stddev_pop({c}), 0.0), 4) AS stddev,
           ROUND(min({c})::DOUBLE, 4) AS min,
           ROUND(max({c})::DOUBLE, 4) AS max,
           ROUND(quantile_cont({c}, 0.25), 4) AS q25,
           ROUND(quantile_cont({c}, 0.50), 4) AS median,
           ROUND(quantile_cont({c}, 0.75), 4) AS q75
    FROM {src}"""
        )
    return " UNION ALL ".join(parts)


def _uniqueness_sql(src: str, key: str) -> str:
    return f"""
    WITH per_key AS (SELECT {key} AS k, count(*) AS n FROM {src} GROUP BY {key})
    SELECT sum(n)::BIGINT AS total,
           count(*)::BIGINT AS distinct,
           sum(CASE WHEN n > 1 THEN 1 ELSE 0 END)::BIGINT AS dup_keys,
           sum(CASE WHEN n > 1 THEN n ELSE 0 END)::BIGINT AS rows_in_dup_keys,
           ROUND(sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1.0 / sum(n), 4) AS dup_rate
    FROM per_key
    """


_CLIPS = f"read_parquet('{SYNTH_SF001}/clips/*.parquet')"
_TRANSCRIPTS = f"read_parquet('{SYNTH_SF001}/transcripts/*.parquet')"


def oracle_sql() -> dict[str, str]:
    _ensure_synth_for_oracle()
    sr_list = ", ".join(str(v) for v in SR_HZ_DOMAIN)
    codec_list = ", ".join(f"'{c}'" for c in CODEC_WHITELIST)
    return {
        "stats_profile_lineitem": _profile_sql(
            "lineitem", ["l_quantity", "l_extendedprice", "l_discount"]
        ),
        "uniqueness_orders": _uniqueness_sql("orders", "o_orderkey"),
        "uniqueness_events_user": _uniqueness_sql("events", "user_id"),
        "referential_orders_customer": """
            SELECT DISTINCT o.o_custkey AS orphan_key FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        """,
        "referential_customer_orders": """
            SELECT DISTINCT c.c_custkey AS orphan_key FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """,
        "clips_stats_profile": _profile_sql(_CLIPS, ["sr_hz", "dur_ms"]),
        "clips_uniqueness": _uniqueness_sql(_CLIPS, "clip_id"),
        "clips_duplicate_keys": f"""
            SELECT clip_id, count(*)::BIGINT AS n FROM {_CLIPS}
            GROUP BY clip_id HAVING count(*) > 1
        """,
        "clips_sr_domain": f"""
            SELECT clip_id, CAST(sr_hz AS VARCHAR) AS value FROM {_CLIPS}
            WHERE sr_hz IS NULL OR sr_hz NOT IN ({sr_list})
        """,
        "clips_codec_whitelist": f"""
            SELECT clip_id, codec AS value FROM {_CLIPS}
            WHERE codec IS NULL OR codec NOT IN ({codec_list})
        """,
        "clips_orphan_clips": f"""
            SELECT DISTINCT c.clip_id FROM {_CLIPS} c
            WHERE NOT EXISTS (SELECT 1 FROM {_TRANSCRIPTS} t WHERE t.clip_id = c.clip_id)
        """,
        "clips_orphan_transcripts": f"""
            SELECT DISTINCT t.clip_id FROM {_TRANSCRIPTS} t
            WHERE NOT EXISTS (SELECT 1 FROM {_CLIPS} c WHERE c.clip_id = t.clip_id)
        """,
    }
