from .drift_stream import (  # noqa: F401
    load_profile,
    reference_profile,
    reference_profile_grouped,
    reference_profile_multi,
    reference_profile_multi_grouped,
    save_profile,
    stream_drift,
    stream_drift_grouped,
    stream_drift_multi,
    stream_drift_multi_grouped,
    stream_drift_windowed,
    stream_drift_windowed_grouped,
    update_reference_profile,
    update_reference_profile_grouped,
    update_reference_profile_multi,
    update_reference_profile_multi_grouped,
)
from .embedding_stream import (  # noqa: F401
    embedding_reference_profile,
    embedding_reference_profile_grouped,
    stream_embedding_drift,
    stream_embedding_drift_grouped,
    update_embedding_reference_profile,
    update_embedding_reference_profile_grouped,
)
from .stateful import running_drift_state, streaming_duplicate_clips  # noqa: F401
from .text_stream import (  # noqa: F401
    stream_text_drift,
    stream_text_drift_grouped,
    text_reference_profile,
    text_reference_profile_grouped,
    update_text_reference_profile,
    update_text_reference_profile_grouped,
)
from .validate_stream import stream_validate, windowed_violation_counts  # noqa: F401
