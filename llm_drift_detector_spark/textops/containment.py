"""Text containment dedup: find documents EMBEDDED verbatim (or near-
verbatim) inside longer ones — the doc-in-doc contamination case that
whole-document minhash/simhash miss (a 10% excerpt has Jaccard ~0.1
against its source and never passes the near-dup gate).

The text analogue of ``audioops/containment.py``, reusing the dedup
module's shingle tokenization so signatures are interchangeable:

1. :func:`positional_shingles` — (id, shingle, pos): the SAME n-word
   shingles as ``dedup.shingles`` plus the token position of each
   shingle's FIRST occurrence (one row per distinct shingle per doc).
2. :func:`containment_candidates` — pairs sharing >= ``min_shared``
   shingles, via shared-shingle buckets with the same bucket-count
   filter + mega-bucket salting as the banded/spectral paths
   (boilerplate shingles shared corpus-wide are the mega-bucket again).
3. :func:`verify_text_containment` — pair-restricted verification:
   containment Jaccard |A∩B| / |A| of the SMALLER side's shingle set,
   plus the token-offset estimate = modal (container_pos −
   contained_pos) over matched shingles and the fraction of matches
   agreeing with it (``offset_support`` ~ 1.0 for a verbatim excerpt,
   low for bag-of-shingles coincidence).

Scale shape: shingle rows shuffle (id, shingle, pos) — never document
text; candidate pair volume is bounded by the salted bucket sizes;
verification joins only the candidate ids' shingles (semi-join
restriction), so work is proportional to candidates, never corpus^2.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

DEFAULT_MIN_SHARED = 3


def positional_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """(id, shingle, pos) — distinct n-word shingles with first-
    occurrence token position.  Shingle strings are IDENTICAL to
    ``dedup.shingles`` (lowercase, whitespace split, empties dropped)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.struct(
            F.concat_ws(" ", F.slice(toks, i + 1, n)).alias("shingle"),
            i.alias("pos"),
        ),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("s"))
        .select("id", F.col("s.shingle").alias("shingle"), F.col("s.pos").alias("pos"))
        .where(F.col("shingle") != "")
        .groupBy("id", "shingle")
        .agg(F.min("pos").alias("pos"))
    )


def containment_candidates(
    sh: DataFrame,
    min_shared: int = DEFAULT_MIN_SHARED,
    max_bucket_size: int | None = 64,
) -> DataFrame:
    """(id_a, id_b) pairs sharing >= min_shared shingles.

    Same skew guard as ``dedup.minhash_lsh_candidates`` /
    ``audioops.spectral_candidates``: buckets larger than
    ``max_bucket_size`` are salted into sub-buckets by
    ``pmod(xxhash64(id), ceil(n/cap))``, bounding within-bucket pairs at
    ~n*cap/2 on low-entropy corpora (shared boilerplate).  Shared counts
    undercount across sub-buckets of a salted mega-bucket — the standard
    trade; a genuine excerpt still shares its many NON-boilerplate
    shingles."""
    counts = sh.groupBy("shingle").agg(F.count("*").alias("n"))
    joined = sh.select("id", "shingle").join(
        counts.where(F.col("n") > 1), "shingle"
    )
    if max_bucket_size:
        n_sub = F.ceil(F.col("n") / max_bucket_size).cast("bigint")
        salted = F.when(
            F.col("n") > max_bucket_size,
            F.concat_ws(
                "#",
                F.col("shingle"),
                F.pmod(F.xxhash64("id"), n_sub).cast("string"),
            ),
        ).otherwise(F.col("shingle"))
        joined = joined.withColumn("shingle", salted)
    a = joined.select("shingle", F.col("id").alias("id_a"))
    b = joined.select("shingle", F.col("id").alias("id_b"))
    return (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_shingles"))
        .where(F.col("shared_shingles") >= min_shared)
        .select("id_a", "id_b")
    )


def verify_text_containment(
    pairs: DataFrame,
    sh: DataFrame,
    min_containment: float = 0.9,
) -> DataFrame:
    """(contained_id, container_id, containment, offset_tokens,
    offset_support, inter, sz_contained, sz_container) for candidate
    pairs passing the containment gate.

    The CONTAINED side is the one with the smaller distinct-shingle set;
    ``containment = |A∩B| / |A|`` over distinct shingles (so a verbatim
    excerpt scores ~1.0 regardless of how long its container is);
    ``offset_tokens`` is the modal ``container_pos − contained_pos``
    over matched shingles (ties broken toward the smaller offset) and
    ``offset_support`` the fraction of matched shingles at that delta —
    near 1.0 only when the match is a CONTIGUOUS copy, which separates
    true containment from topical shingle overlap."""
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    p = (
        pairs.join(
            sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a"
        ).join(
            sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b"
        )
    )
    small_a = F.col("sz_a") <= F.col("sz_b")
    oriented = p.select(
        F.when(small_a, F.col("id_a")).otherwise(F.col("id_b")).alias("contained_id"),
        F.when(small_a, F.col("id_b")).otherwise(F.col("id_a")).alias("container_id"),
        F.least("sz_a", "sz_b").alias("sz_contained"),
        F.greatest("sz_a", "sz_b").alias("sz_container"),
    )
    sh_c = sh.select(
        F.col("id").alias("contained_id"),
        "shingle",
        F.col("pos").alias("pos_c"),
    )
    sh_k = sh.select(
        F.col("id").alias("container_id"),
        "shingle",
        F.col("pos").alias("pos_k"),
    )
    matched = (
        oriented.join(sh_c, "contained_id")
        .join(sh_k, ["container_id", "shingle"])
    )
    per_delta = matched.groupBy(
        "contained_id",
        "container_id",
        "sz_contained",
        "sz_container",
        (F.col("pos_k") - F.col("pos_c")).alias("delta"),
    ).agg(F.count("*").alias("dn"))
    per_pair = per_delta.groupBy(
        "contained_id", "container_id", "sz_contained", "sz_container"
    ).agg(
        F.sum("dn").alias("inter"),
        # modal delta; ties -> smaller offset (struct orders by dn desc
        # then -delta desc = delta asc)
        F.expr("max_by(delta, struct(dn, -delta))").alias("offset_tokens"),
        F.max("dn").alias("best_dn"),
    )
    return (
        per_pair.select(
            "contained_id",
            "container_id",
            (F.col("inter") / F.col("sz_contained")).cast("double").alias("containment"),
            F.col("offset_tokens").cast("bigint").alias("offset_tokens"),
            (F.col("best_dn") / F.col("inter")).cast("double").alias("offset_support"),
            F.col("inter").cast("bigint").alias("inter"),
            F.col("sz_contained").cast("bigint").alias("sz_contained"),
            F.col("sz_container").cast("bigint").alias("sz_container"),
        )
        .where(F.col("containment") >= min_containment)
    )


def text_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_shared: int = DEFAULT_MIN_SHARED,
    max_bucket_size: int | None = 64,
    min_containment: float = 0.9,
) -> DataFrame:
    """End-to-end doc-in-doc detection: shingle -> candidates -> verify.

    The shingle frame feeds BOTH stages, so persist it when calling the
    stages separately on a large corpus."""
    sh = positional_shingles(df, id_col, text_col, n)
    cands = containment_candidates(sh, min_shared, max_bucket_size)
    return verify_text_containment(cands, sh, min_containment)
