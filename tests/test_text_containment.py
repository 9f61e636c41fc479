"""Doc-in-doc text containment: planted verbatim excerpts recovered at
the exact token offset; candidate volume bounded on low-entropy corpora;
near-dup misses that containment catches."""

import numpy as np
import pytest

from llm_drift_detector_spark.textops import (
    containment_candidates,
    positional_shingles,
    text_containment_pairs,
    verify_text_containment,
)
from llm_drift_detector_spark.textops.dedup import shingles


def _words(rng, n):
    # pseudo-words: enough entropy that 3-shingles are effectively unique
    return [f"w{rng.integers(0, 50_000):05d}x{i % 97}" for i in range(n)]


def test_planted_excerpt_recovered_with_offset(spark):
    """A verbatim excerpt (10% of a 500-token doc, offset 100) comes back
    with containment >= 0.95 at the right offset and near-total offset
    support; unrelated docs produce nothing."""
    rng = np.random.default_rng(101)
    long_tokens = _words(rng, 500)
    excerpt = long_tokens[100:150]  # 50 tokens = 10%
    rows = [
        ("long", " ".join(long_tokens)),
        ("excerpt", " ".join(excerpt)),
    ] + [(f"noise{i}", " ".join(_words(rng, 120))) for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id string, text string")

    out = text_containment_pairs(
        docs, "doc_id", "text", n=3, min_shared=3, min_containment=0.95
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.contained_id == "excerpt" and r.container_id == "long"
    assert r.containment >= 0.95
    assert r.offset_tokens == 100
    assert r.offset_support >= 0.95
    assert r.sz_contained == 48  # 50 tokens -> 48 distinct 3-shingles


def test_containment_catches_what_near_dup_jaccard_misses(spark):
    """The same excerpt pair has whole-doc Jaccard ~ 0.1 (misses every
    near-dup gate) but containment ~ 1.0 — the operator's reason to
    exist."""
    rng = np.random.default_rng(103)
    long_tokens = _words(rng, 500)
    docs = spark.createDataFrame(
        [("long", " ".join(long_tokens)), ("ex", " ".join(long_tokens[50:100]))],
        "doc_id string, text string",
    )
    sh = shingles(docs, "doc_id", "text")
    from llm_drift_detector_spark.textops import ngram_jaccard_pairs

    jac = ngram_jaccard_pairs(sh, min_jaccard=0.0).collect()
    assert len(jac) == 1 and jac[0].jaccard < 0.15

    out = text_containment_pairs(docs, "doc_id", "text").collect()
    assert len(out) == 1 and out[0].containment > 0.95
    assert out[0].offset_tokens == 50


def test_positional_shingles_match_dedup_shingles(spark):
    """positional_shingles emits the SAME shingle strings as
    dedup.shingles (interchangeable signatures), plus first-occurrence
    positions."""
    docs = spark.createDataFrame(
        [("d", "The quick brown fox jumps over the quick brown fox again")],
        "doc_id string, text string",
    )
    plain = {r.shingle for r in shingles(docs, "doc_id", "text").collect()}
    pos = positional_shingles(docs, "doc_id", "text").collect()
    assert {r.shingle for r in pos} == plain
    by_sh = {r.shingle: r.pos for r in pos}
    assert by_sh["the quick brown"] == 0  # FIRST occurrence (repeat at 6)
    assert by_sh["quick brown fox"] == 1


def test_candidate_volume_bounded_on_low_entropy_corpus(spark):
    """N docs sharing the same boilerplate must not go quadratic:
    mega-bucket salting bounds candidate pairs (the
    test_mega_bucket_salting_bounds_pair_count pattern for the
    containment path)."""
    n, cap = 300, 16
    docs = spark.createDataFrame(
        [
            (f"d{i:04d}", "identical boilerplate license header repeated everywhere verbatim")
            for i in range(n)
        ],
        "doc_id string, text string",
    )
    sh = positional_shingles(docs, "doc_id", "text")
    cands = containment_candidates(sh, min_shared=1, max_bucket_size=cap)
    n_pairs = cands.count()
    naive = n * (n - 1) // 2  # 44_850
    # ~#shingles distinct buckets x sub-buckets of <=cap: bounded by
    # shingles_per_doc * n * cap / 2
    n_shingles = 6  # 8 tokens -> 6 trigram shingles
    assert 0 < n_pairs <= n_shingles * n * cap // 2, (n_pairs, naive)
    assert n_pairs < naive / 4


def test_gate_rejects_topical_overlap(spark):
    """Shared topical shingles without contiguity fail the containment
    gate (and would show scattered offsets if let through)."""
    rng = np.random.default_rng(107)
    shared = _words(rng, 30)
    a_tokens = []
    b_tokens = []
    # interleave the 10 shared 3-grams at DIFFERENT, scattered places
    for i in range(10):
        a_tokens += _words(rng, 17) + shared[3 * i : 3 * i + 3]
        b_tokens += shared[3 * i : 3 * i + 3] + _words(rng, 23)
    docs = spark.createDataFrame(
        [("a", " ".join(a_tokens)), ("b", " ".join(b_tokens))],
        "doc_id string, text string",
    )
    sh = positional_shingles(docs, "doc_id", "text")
    cands = containment_candidates(sh, min_shared=3)
    assert cands.count() == 1  # they DO become candidates...
    out = verify_text_containment(cands, sh, min_containment=0.9).collect()
    assert out == []  # ...but the containment gate rejects them
    loose = verify_text_containment(cands, sh, min_containment=0.0).collect()
    assert len(loose) == 1 and loose[0].containment < 0.2
    assert loose[0].offset_support < 0.5  # no dominant alignment
