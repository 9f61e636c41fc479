from .runner import RunConfig, run_validation, violations_frame  # noqa: F401
