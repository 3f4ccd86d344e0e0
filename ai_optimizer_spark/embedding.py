"""Embedding clients — the pluggable model boundary (SURVEY.md §2.10).

The reference wraps any provider behind LiteLLM with two entry points:
embed_documents (batched ≤96 texts/call, models/litellm_embeddings.py:69-84)
and embed_query (:86-88). Here the same two-method protocol is implemented
as:

  * `HashEmbedder` — the deterministic test double (the reference mocks its
    models in tests the same way, SURVEY.md §5): token hashing into a
    fixed-dim bucket space with ±1 signs, L2-normalized. Pure numpy, no
    network, reproducible everywhere.
  * `embed_column` — the Spark surface: a scalar-iterator pandas_udf so the
    (potentially expensive) client is constructed once per executor task,
    then reused across Arrow batches — the Spark analog of the reference's
    cached embed client (vs_retriever.py:172-207). Internal batching honors
    the provider cap (96).

A real provider adapter drops in by implementing the same protocol; nothing
downstream changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

EMBED_DIM = 64
PROVIDER_BATCH = 96  # OCI Cohere lower bound across providers (litellm_embeddings.py:15-17)


class HashEmbedder:
    """Deterministic hash embedding: each whitespace token lands in
    `dim` buckets via the portable 60-bit md5 hash; sign comes from the
    next hash bit; vectors are L2-normalized. Same algorithm is trivially
    reimplementable anywhere, which keeps every embedding-dependent result
    verifiable."""

    def __init__(self, dim: int = EMBED_DIM):
        self.dim = dim

    def _embed_one(self, text: str) -> np.ndarray:
        import hashlib

        v = np.zeros(self.dim, dtype=np.float64)
        for tok in (text or "").split():
            h = int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16)
            bucket = h % self.dim
            sign = 1.0 if (h >> 30) & 1 else -1.0
            v[bucket] += sign
        n = np.linalg.norm(v)
        return (v / n if n > 0 else v).astype(np.float32)

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for i in range(0, len(texts), PROVIDER_BATCH):
            out.extend(self._embed_one(t).tolist() for t in texts[i : i + PROVIDER_BATCH])
        return out

    def embed_query(self, text: str) -> list[float]:
        return self._embed_one(text).tolist()


def embed_column(
    text_col: str | Column, dim: int = EMBED_DIM, rate_limit: int = 0
) -> Column:
    """Vectorized embedding of a text column via a scalar-iterator
    pandas_udf: client built once per task, Arrow batches in/out — the
    10-100x-over-row-UDF path when Python is unavoidable.

    `rate_limit` > 0 throttles like the reference (sleep 60/rate_limit
    between provider batches, embed/vector_store.py:183-186) — a per-task
    token-bucket so N executor tasks respect N×limit aggregate, matching
    how provider quotas are usually per-connection (SURVEY.md §4-O8)."""

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        import time

        client = HashEmbedder(dim)
        interval = 60.0 / rate_limit if rate_limit > 0 else 0.0
        next_call = 0.0
        for batch in batches:
            texts = batch.fillna("").tolist()
            out: list[list[float]] = []
            for i in range(0, len(texts), PROVIDER_BATCH):
                if interval:
                    now = time.monotonic()
                    if now < next_call:
                        time.sleep(next_call - now)
                    next_call = time.monotonic() + interval
                out.extend(client.embed_documents(texts[i : i + PROVIDER_BATCH]))
            yield pd.Series(out)

    return _embed(F.col(text_col) if isinstance(text_col, str) else text_col)
