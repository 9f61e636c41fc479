from .base import METRICS_SCHEMA, VIOLATIONS_SCHEMA, bucket_id  # noqa: F401
from .domain import domain_violations, whitelist_violations  # noqa: F401
from .referential import orphans  # noqa: F401
from .stats import profile  # noqa: F401
from .uniqueness import duplicate_keys, uniqueness_metrics  # noqa: F401
