from .drift_stream import reference_profile, stream_drift  # noqa: F401
from .stateful import running_drift_state, streaming_duplicate_clips  # noqa: F401
from .validate_stream import stream_validate, windowed_violation_counts  # noqa: F401
