"""Scalar function surface (reference §2.8, ``utils/helpers.py``).

Each reference helper mapped to its native Spark expression — these are
the building blocks the checks/drift modules use; exposed here as a
stable API so reference users find their utilities.

| reference                                  | here            |
|--------------------------------------------|-----------------|
| truncate with suffix (helpers.py:91-109)   | truncate_text   |
| md5/sha1/sha256 (helpers.py:201-219)       | md5_col/...     |
| ISO/unix timestamp parse (:262-289)        | parse_timestamp |
| URL validation (:111-125)                  | is_valid_url    |
| nested-dict dotted get (:291-321)          | dotted_get      |
| uuid default id (collector.py:29)          | uuid_col        |
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def truncate_text(col: str | Column, max_length: int = 1000, suffix: str = "...") -> Column:
    """Cap text at max_length chars, appending `suffix` when truncated
    (helpers.py:91-109; the perplexity cap semantic.py:192-193 uses
    max_length=1000 with no suffix)."""
    c = _c(col)
    return F.when(
        F.length(c) > max_length,
        F.concat(F.substring(c, 1, max_length - len(suffix)), F.lit(suffix)),
    ).otherwise(c)


def md5_col(col: str | Column) -> Column:
    return F.md5(_c(col).cast("string"))


def sha1_col(col: str | Column) -> Column:
    return F.sha1(_c(col).cast("string"))


def sha256_col(col: str | Column) -> Column:
    return F.sha2(_c(col).cast("string"), 256)


def parse_timestamp(col: str | Column) -> Column:
    """ISO string / unix seconds / unix millis -> timestamp
    (helpers.py:262-289 accepted all three)."""
    c = _c(col)
    as_num = c.try_cast("double")  # ANSI-safe: NULL for non-numeric strings
    return (
        F.when(as_num.isNotNull() & (as_num > 1e11), F.timestamp_millis(c.try_cast("bigint")))
        .when(as_num.isNotNull(), F.timestamp_seconds(as_num))
        .otherwise(F.to_timestamp(c.cast("string")))
    )


def is_valid_url(col: str | Column) -> Column:
    """http(s) URL with a host (helpers.py:111-125 used urlparse)."""
    c = _c(col)
    host = F.try_parse_url(c, F.lit("HOST"))  # NULL (not error) on junk
    proto = F.try_parse_url(c, F.lit("PROTOCOL"))
    return (
        host.isNotNull()
        & (host != "")
        & proto.isin("http", "https")
    )


def dotted_get(json_col: str | Column, path: str) -> Column:
    """Nested dotted-path get over a JSON string column
    (helpers.py:291-321 walked nested dicts)."""
    return F.get_json_object(_c(json_col), "$." + path)


def uuid_col() -> Column:
    """Random uuid default id (collector.py:29). Non-deterministic by
    nature — do not use in oracle-compared queries."""
    return F.expr("uuid()")
