"""Audio-modality pipeline operators: dedup, fingerprints, features.

The text-side training-data operators (:mod:`..textops`) have audio
equivalents here — the graft cell is pyspark x audio, so deduplication
and quality profiling must work on the payload column, not just the
transcript.  Everything decodes scan-side (mapInArrow) and shuffles only
small derived rows; payload bytes never enter an exchange.
"""

from .crossmodal import cross_modal_duplicate_pairs, text_duplicate_pairs
from .dedup import (
    audio_duplicate_pairs,
    audio_duplicate_pairs_checkpointed,
    audio_fingerprints,
    deduplicate_audio,
    exact_duplicates_audio,
    fingerprint_candidates,
    fingerprint_identical_pairs,
    verify_pairs_pcm,
)
from .containment import (
    audio_containment_pairs,
    containment_coverage,
    audio_spectral_shingles,
    spectral_candidates,
    verify_containment_pairs,
)
from .features import audio_feature_drift, audio_features, audio_quality_violations
from .retrieval import audio_build_fingerprint_index, audio_topk

__all__ = [
    "audio_containment_pairs",
    "containment_coverage",
    "cross_modal_duplicate_pairs",
    "text_duplicate_pairs",
    "audio_duplicate_pairs",
    "audio_duplicate_pairs_checkpointed",
    "audio_feature_drift",
    "audio_features",
    "audio_quality_violations",
    "audio_spectral_shingles",
    "audio_fingerprints",
    "audio_build_fingerprint_index",
    "audio_topk",
    "deduplicate_audio",
    "exact_duplicates_audio",
    "fingerprint_candidates",
    "fingerprint_identical_pairs",
    "spectral_candidates",
    "verify_containment_pairs",
    "verify_pairs_pcm",
]
