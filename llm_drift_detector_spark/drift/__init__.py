from .comparators import (  # noqa: F401
    distribution_drift,
    histogram_probs,
    js_psi_frame,
    ks_frame,
    psi_frame,
    ref_quantile_edges,
    rice_bins,
    shared_range,
    two_sample_moments,
    wasserstein_frame,
    welch_t_frame,
)
from .grouped import (  # noqa: F401
    grouped_distribution_drift,
    grouped_distribution_drift_binned,
    multi_feature_drift,
    tag_windows,
)
from .embedding import (  # noqa: F401
    centroid,
    centroid_cosine_frame,
    embedding_drift,
    grouped_embedding_drift,
    grouped_embedding_drift_exact,
    mean_dist_frame,
    mmd_cosine,
)
from .lexical import (  # noqa: F401
    grouped_lexical_drift,
    lexical_drift,
    style_features_frame,
    token_counts,
    vocab_difference_frame,
)
from .performance import (  # noqa: F401
    error_rate_frame,
    grouped_performance_drift,
    performance_drift,
    rolling_zscore_anomalies,
)
from .stattests import kolmogorov_sf, ks_2samp_p, student_t_sf, welch_t  # noqa: F401
from .summary import drift_pivot, drift_summary, mean_threshold  # noqa: F401
