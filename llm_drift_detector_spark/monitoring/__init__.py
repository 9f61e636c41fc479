from .alerts import Alert, AlertManager, classify_level  # noqa: F401
