"""Deduplication operators for training-data pipelines.

Not present in the reference (it assumes uuid uniqueness,
``data/collector.py:29``); mandated as first-class engine components for
the 100 TB tier.  Four strategies, cheapest first:

- exact: hash-groupBy on md5(text) — one shuffle, the canonical plan.
- MinHash + LSH: shingle -> K min-hashes -> B bands -> bucket join.
  Near-dup candidates come from band-bucket collisions; verification
  (exact shingle Jaccard) runs only on candidates.
- SimHash: 64-bit sign-sum signature; near-dups share band prefixes.
- n-gram Jaccard: exact pairwise verification on candidate pairs.

Cross-engine determinism: every hash is derived from md5 hex strings
(identical bytes in Spark, DuckDB and Python), never from engine-local
hash functions (xxhash64/hash differ across engines), so the DuckDB
oracle can replay the exact same signatures.

Scale notes: min-hash signatures are K aggregate buffers in ONE
groupBy(doc) pass over the exploded shingle frame (map-side combined);
band buckets shuffle only (band_id, signature, doc_id) — never text.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

DEFAULT_K = 32       # minhash permutations
DEFAULT_BANDS = 8    # bands (rows per band = K / BANDS)


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, dup_group md5, group_size) for every row in a duplicated group."""
    h = F.md5(F.col(text_col)).alias("dup_group")
    w = df.select(F.col(id_col).alias("id"), h)
    counts = w.groupBy("dup_group").agg(F.count("*").alias("group_size"))
    return (
        w.join(counts.where(F.col("group_size") > 1), "dup_group")
        .select("id", "dup_group", "group_size")
    )


def shingles(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """Distinct n-word shingles per document: (id, shingle).

    Tokenization mirrors the engine's lexical path: lowercase,
    whitespace split, empties dropped.
    """
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(sh).alias("shingle"))
        .where(F.col("shingle") != "")
        .distinct()
    )


def _minhash_expr(seed: int) -> Column:
    # md5 over (seed|shingle): lexicographic min of hex == a random
    # permutation's min, reproducible in any engine with md5()
    return F.min(F.md5(F.concat(F.lit(f"{seed}|"), F.col("shingle")))).alias(f"m{seed}")


def minhash_signatures(
    sh: DataFrame, k: int = DEFAULT_K
) -> DataFrame:
    """(id, m0..m{k-1}) — one groupBy pass, k min() buffers."""
    return sh.groupBy("id").agg(*[_minhash_expr(i) for i in range(k)])


def minhash_lsh_candidates(
    sig: DataFrame,
    k: int = DEFAULT_K,
    bands: int = DEFAULT_BANDS,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate near-dup groups: (band, band_sig, id).

    Documents sharing (band, band_sig) are candidates; rows are emitted
    only for buckets with >= 2 docs.  Downstream verification:
    :func:`candidate_pairs` -> :func:`ngram_jaccard_pairs`.

    ``max_bucket_size`` is the skew guard: a mega-bucket (boilerplate —
    e.g. 10k identical license headers land in ONE bucket per band)
    would make the within-bucket pair join quadratic.  Oversized buckets
    are SALTED into ceil(n/cap) sub-buckets by ``pmod(xxhash64(id), s)``
    (folded into band_sig), bounding within-bucket pairs at ~n*cap/2
    instead of n^2/2.  Cross-sub-bucket pairs are lost for THAT bucket,
    which is the standard trade: members of a boilerplate cluster still
    link transitively through the surviving pairs (dedup consumers take
    connected components), and genuinely-similar pairs keep colliding in
    the other bands.
    """
    r = k // bands
    band_cols = []
    for b in range(bands):
        members = [F.col(f"m{b * r + j}") for j in range(r)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws("|", *members)).alias("band_sig"))
        )
    exploded = sig.select(
        "id", F.explode(F.array(*band_cols)).alias("bb")
    ).select("id", F.col("bb.band").alias("band"), F.col("bb.band_sig").alias("band_sig"))
    counts = exploded.groupBy("band", "band_sig").agg(F.count("*").alias("n"))
    joined = exploded.join(counts.where(F.col("n") > 1), ["band", "band_sig"])
    if max_bucket_size:
        n_sub = F.ceil(F.col("n") / max_bucket_size).cast("bigint")
        # the band participates in the salt so each band partitions the
        # mega-bucket DIFFERENTLY — pairs from different bands stitch the
        # sub-buckets back into one connected component
        salted_sig = F.when(
            F.col("n") > max_bucket_size,
            F.concat_ws(
                "#",
                F.col("band_sig"),
                F.pmod(F.xxhash64("id", F.col("band")), n_sub).cast("string"),
            ),
        ).otherwise(F.col("band_sig"))
        joined = joined.withColumn("band_sig", salted_sig)
    return joined.select("band", "band_sig", "id")


def candidate_pairs(cands: DataFrame) -> DataFrame:
    """Distinct (id_a, id_b) pairs from candidate buckets — the join key
    is the bucket, so pair volume is bounded by the (salted) bucket
    sizes, never by the corpus."""
    a = cands.alias("a")
    b = cands.alias("b")
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def ngram_jaccard_pairs(
    sh: DataFrame,
    min_jaccard: float = 0.8,
    candidates: DataFrame | None = None,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard for pairs: (id_a, id_b, jaccard).

    ``pairs`` (from :func:`candidate_pairs`) is the scale path: ONLY the
    given (id_a, id_b) pairs are verified, so work is proportional to
    the candidate count — a mega-bucket can't go quadratic here.
    ``candidates`` restricts the shingle self-join to candidate ids
    (pairs still form via shared shingles — fine when buckets are
    small).  Without either, the self-join is exact-but-quadratic; only
    for small inputs / oracle checks.
    """
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    if pairs is not None:
        ja = sh.withColumnRenamed("id", "id_a")
        jb = sh.withColumnRenamed("id", "id_b")
        inter = (
            pairs.join(ja, "id_a")
            .join(jb, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
        out = (
            inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
            .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
            .select(
                "id_a",
                "id_b",
                (
                    F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
                ).cast("double").alias("jaccard"),
            )
        )
        return out.where(F.col("jaccard") >= min_jaccard)
    a = sh.alias("a")
    b = sh.alias("b")
    if candidates is not None:
        ids = candidates.select("id").distinct()
        a = sh.join(ids, "id").alias("a")
        b = sh.join(ids, "id").alias("b")
    inter = (
        a.join(b, F.col("a.shingle") == F.col("b.shingle"))
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).cast("double").alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= min_jaccard)


def duplicate_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over (near-)duplicate pairs: (id, cluster_id),
    cluster_id = the minimum id in the component.

    Dedup consumers need components, not pairs (keep one doc per cluster).
    Hash-min label propagation WITH pointer doubling: every node starts
    labeled with itself; each iteration every node takes the min label
    among itself and its neighbors, then shortcuts to its label's label
    (``l(x) <- l(l(x))``, the path-halving step of Kiveris et al.'s
    star-contraction family) — convergence is O(log diameter) rounds
    instead of O(diameter), which matters for chain-shaped near-dup
    graphs (LSH near-cliques converge in 2-4 rounds either way).  Each
    round is two joins + one groupBy on (id, label) pairs only (never
    text/payloads); labels persist per round and the fixpoint check is
    a cheap count.  Not SQL-expressible (iterative) — correctness is
    property-tested (chains, cliques, isolated pairs).
    """
    edges = pairs.select("id_a", "id_b")
    sym = edges.unionAll(
        edges.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).persist()
    labels = (
        sym.select(F.col("id_a").alias("id")).distinct().withColumn("label", F.col("id"))
    ).persist()
    labels.count()
    changed = 0
    for it in range(max_iters):
        nbr_min = (
            sym.join(
                labels.select(F.col("id").alias("id_b"), F.col("label").alias("nbr")),
                "id_b",
            )
            .groupBy(F.col("id_a").alias("id"))
            .agg(F.min("nbr").alias("nbr_min"))
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least(F.col("label"), F.coalesce("nbr_min", "label")).alias("label"),
        )
        # pointer doubling: follow one more hop through the label table
        # so label chains halve every round (O(log d) total rounds)
        hop = stepped.select(
            F.col("id").alias("label"), F.col("label").alias("ll")
        )
        new = (
            stepped.join(hop, "label", "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce("ll", "label")).alias("label"),
            )
            .persist()
        )
        changed = (
            new.join(labels.withColumnRenamed("label", "old"), "id")
            .where(F.col("label") != F.col("old"))
            .count()
        )
        labels.unpersist()
        # truncate lineage every few rounds: each iteration stacks a
        # join onto the logical plan; on a high-diameter component the
        # un-checkpointed plan gets arbitrarily deep (analysis cost +
        # stack risk at 10^12-edge scale).  After the checkpoint, release
        # `new`'s cache explicitly — rebinding labels to the checkpoint
        # wrapper would otherwise leave each checkpoint round's (id,
        # label) cache pinned for the session (the later
        # labels.unpersist() only sees the wrapper).
        if (it + 1) % 5 == 0:
            cp = new.localCheckpoint(eager=True)
            new.unpersist()
            labels = cp
        else:
            labels = new
        if changed == 0:
            break
    sym.unpersist()
    if changed > 0:
        # a component with diameter > max_iters has NOT converged —
        # returning silently would hand back wrong (split) clusters
        raise RuntimeError(
            f"duplicate_clusters did not converge in {max_iters} iterations "
            f"({changed} labels still changing) — raise max_iters (diameter "
            "of the candidate graph exceeds it)"
        )
    return labels.select("id", F.col("label").alias("cluster_id"))


def _hex_digit_val(c: Column) -> Column:
    return F.instr(F.lit("0123456789abcdef"), c) - 1


def simhash_signatures(df: DataFrame, id_col: str, text_col: str, bits: int = 64) -> DataFrame:
    """(id, simhash bigint) — sign-sum over per-token md5-derived bits.

    Bit i of a token's hash = bit (i%4) of hex digit (i//4) of md5(token)
    — pure string/arithmetic ops, reproducible in SQL for the oracle.
    bits <= 60 keeps the signature inside a signed bigint.
    """
    bits = min(bits, 60)
    toks = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
        )
        .where(F.col("token") != "")
        .withColumn("h", F.md5(F.col("token")))
    )
    bit_aggs = []
    for i in range(bits):
        digit = _hex_digit_val(F.substring(F.col("h"), i // 4 + 1, 1))
        bit = F.floor(digit / (2 ** (i % 4))) % 2
        bit_aggs.append(
            F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"s{i}")
        )
    sums = toks.groupBy("id").agg(*bit_aggs)
    sig = sum(
        (
            F.when(F.col(f"s{i}") > 0, F.lit(2**i)).otherwise(F.lit(0))
            for i in range(bits)
        ),
        F.lit(0),
    )
    return sums.select("id", sig.cast("bigint").alias("simhash"))
