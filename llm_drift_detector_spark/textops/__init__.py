from .dedup import (  # noqa: F401
    exact_duplicates,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_signatures,
)
from .quality import (  # noqa: F401
    fingerprint,
    language_id,
    quality_scores,
    token_counts_frame,
)
from .similarity import cosine_near_duplicates, topk_brute, topk_lsh  # noqa: F401
