from .runner import RunConfig, run_validation  # noqa: F401
