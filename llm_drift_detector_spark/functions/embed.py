"""P2-P3: embedding projection — text -> ``array<float>`` via an
Arrow-vectorized pandas UDF.

The reference computes sentence-transformers embeddings in Python
batches (``detectors/semantic.py`` model usage; ``data/models.py``
response fields).  On Spark the shape is a ``pandas_udf``: Arrow ships
string batches to the worker, the encoder maps a batch of texts to a
(batch, dim) float32 matrix, Arrow ships the vectors back — no
row-at-a-time Python.

The encoder here is the engine's deterministic stand-in (normalized
seeded-projection of token counts — the SAME function the synthetic
fixture generator uses, so recomputed vectors are bit-identical to the
stored ``embedding`` column; tested in test_extensions.py).  The swap
point for a real model is :func:`embedding_udf`'s ``encode``: any
callable ``list[str] -> np.ndarray[(n, dim), float32]``
(e.g. ``SentenceTransformer.encode``) drops in unchanged — batch
sizing is already bounded by ``spark.sql.execution.arrow.
maxRecordsPerBatch``.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.functions import pandas_udf


def _default_encode(rot: float = 0.0) -> Callable[[list[str]], np.ndarray]:
    """The deterministic stand-in encoder (synth fixture parity)."""
    from ..synth.clips import VOCAB, embed_tokens

    tok2idx = {t: i for i, t in enumerate(VOCAB)}

    def encode(texts: list[str]) -> np.ndarray:
        out = []
        for t in texts:
            idx = [tok2idx[w] for w in str(t).lower().split() if w in tok2idx]
            out.append(embed_tokens(np.asarray(idx, dtype=np.int64), rot))
        return np.stack(out) if out else np.empty((0, 0), dtype=np.float32)

    return encode


def embedding_udf(
    encode: Callable[[list[str]], np.ndarray] | None = None, rot: float = 0.0
) -> Column:
    """Arrow-batched text->vector UDF.  Pass ``encode`` to plug a real
    model (loaded once per python worker, amortized over batches)."""
    enc = encode or _default_encode(rot)

    @pandas_udf("array<float>")
    def embed(texts: pd.Series) -> pd.Series:
        mat = enc(texts.tolist())
        return pd.Series(list(mat))

    return embed


def embed_texts(
    df: DataFrame,
    text_col: str,
    out_col: str = "embedding",
    encode: Callable[[list[str]], np.ndarray] | None = None,
    rot: float = 0.0,
) -> DataFrame:
    """Attach an embedding column computed from ``text_col`` (P2-P3)."""
    return df.withColumn(out_col, embedding_udf(encode, rot)(F.col(text_col)))
