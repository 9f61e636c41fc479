from .scalars import (  # noqa: F401
    dotted_get,
    is_valid_url,
    md5_col,
    parse_timestamp,
    sha1_col,
    sha256_col,
    truncate_text,
    uuid_col,
)
from .embed import embed_texts, embedding_udf  # noqa: F401
