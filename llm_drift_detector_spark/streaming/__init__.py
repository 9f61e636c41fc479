from .validate_stream import stream_validate, windowed_violation_counts  # noqa: F401
