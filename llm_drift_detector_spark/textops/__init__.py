from .dedup import (  # noqa: F401
    duplicate_clusters,
    exact_duplicates,
    candidate_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash_signatures,
)
from .containment import (  # noqa: F401
    containment_candidates,
    positional_shingles,
    text_containment_pairs,
    verify_text_containment,
)
from .quality import (  # noqa: F401
    fingerprint,
    language_id,
    quality_scores,
    token_counts_frame,
)
from .similarity import (  # noqa: F401
    cosine_near_duplicates,
    ivf_build_index,
    ivf_topk_indexed,
    kmeans_fit,
    topk_brute,
    topk_ivf,
    topk_lsh,
)
