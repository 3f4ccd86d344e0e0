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


class Throttle:
    """Per-task provider-call throttle: sleep so calls are at least
    60/rate_limit seconds apart (the reference sleeps 60/rate_limit between
    embed batches, embed/vector_store.py:183-186). One instance per task /
    client, so N executor tasks respect N×limit aggregate — matching how
    provider quotas are usually per-connection (SURVEY.md §4-O8)."""

    def __init__(self, rate_limit: int = 0):
        self.interval = 60.0 / rate_limit if rate_limit > 0 else 0.0
        self._next_call = 0.0

    def wait(self) -> None:
        if not self.interval:
            return
        import time

        now = time.monotonic()
        if now < self._next_call:
            time.sleep(self._next_call - now)
        self._next_call = time.monotonic() + self.interval


class EmbedderUnavailable(RuntimeError):
    """No transport for the configured provider (litellm not installed)."""


def _default_retryable(exc: Exception) -> bool:
    """Transient-only retry policy (ADVICE r4): retry what a second attempt
    can plausibly fix. Provider SDK errors (litellm/openai-style) carry
    `status_code` — retry 408 (request timeout), 409 (conflict), 429
    (rate limit), and 5xx; any other coded error (401 bad key, 404 unknown
    model, 400 validation) is permanent and surfaces immediately. Errors
    with NO status code are retryable only when they are transport-shaped
    (timeouts, dropped connections)."""
    status = getattr(exc, "status_code", None)
    if status is not None:
        try:
            code = int(status)
        except (TypeError, ValueError):
            # non-numeric status (some SDKs expose header strings): fall
            # back to the transport-shape test rather than crashing the
            # retry handler and masking the provider error
            return isinstance(exc, (TimeoutError, ConnectionError))
        return code in (408, 409, 429) or code >= 500
    return isinstance(exc, (TimeoutError, ConnectionError))


class ProviderEmbedder:
    """LiteLLM-style provider adapter behind the SAME two-method protocol as
    HashEmbedder — the real-model seam (reference shape:
    models/litellm_embeddings.py:20-99: inputs chunked to the ≤96 provider
    cap per call, model/api_key/api_base forwarded per call).

    `transport` is injectable for tests: a callable
    ``(texts: list[str], **call_kwargs) -> list[list[float]]``. The default
    transport import-gates litellm and raises `EmbedderUnavailable` when the
    library is absent — the engine's doubles remain the test path; this
    class is the production drop-in.

    Transient transport failures are retried `max_retries` times with
    exponential backoff (the adapter owns retries; the reference delegates
    them to litellm's client). Only RETRYABLE failures burn the retry
    budget — by default timeouts/connection drops and provider errors
    carrying a 408/409/429/5xx `status_code`; permanent failures (bad API key,
    unknown model, other 4xx) re-raise immediately instead of sleeping
    through backoff toward the same answer. Pass `retryable` (an
    ``(exc) -> bool`` predicate) to widen or narrow the policy. Protocol
    violations — wrong embedding count, ragged vector widths, or a width
    differing from the configured `dim` — likewise raise immediately: a
    provider answering with the wrong shape will answer with the wrong
    shape again."""

    def __init__(
        self,
        model: str,
        api_key: str | None = None,
        api_base: str | None = None,
        batch_size: int = PROVIDER_BATCH,
        rate_limit: int = 0,
        transport=None,
        dim: int | None = None,
        max_retries: int = 2,
        retry_backoff: float = 0.5,
        retryable=None,
    ):
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        self.model = model
        self.batch_size = batch_size
        self.dim = dim
        self.max_retries = max_retries
        self.retry_backoff = retry_backoff
        self._call_kwargs = {"model": model}
        if api_key is not None:
            self._call_kwargs["api_key"] = api_key
        if api_base is not None:
            self._call_kwargs["api_base"] = api_base
        self._throttle = Throttle(rate_limit)
        self._transport = transport if transport is not None else _litellm_transport()
        self._retryable = retryable if retryable is not None else _default_retryable

    def _call_with_retry(self, chunk: list[str]) -> list[list[float]]:
        import time

        for attempt in range(self.max_retries + 1):
            self._throttle.wait()
            try:
                return self._transport(chunk, **self._call_kwargs)
            except Exception as exc:
                if attempt == self.max_retries or not self._retryable(exc):
                    raise
                time.sleep(self.retry_backoff * (2**attempt))
        raise AssertionError("unreachable")

    def _validate(self, vecs: list[list[float]], chunk: list[str]) -> None:
        if len(vecs) != len(chunk):
            raise ValueError(
                f"provider returned {len(vecs)} embeddings for "
                f"{len(chunk)} inputs (model={self.model})"
            )
        widths = {len(v) for v in vecs}
        if len(widths) > 1:
            raise ValueError(
                f"provider returned ragged embedding widths {sorted(widths)} "
                f"(model={self.model})"
            )
        if self.dim is not None and widths and widths != {self.dim}:
            raise ValueError(
                f"provider returned dim {widths.pop()}, expected {self.dim} "
                f"(model={self.model})"
            )

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for i in range(0, len(texts), self.batch_size):
            chunk = texts[i : i + self.batch_size]
            vecs = self._call_with_retry(chunk)
            self._validate(vecs, chunk)
            out.extend(vecs)
        return out

    def embed_query(self, text: str) -> list[float]:
        return self.embed_documents([text])[0]


class ProviderHTTPError(RuntimeError):
    """HTTP-level provider failure. Carries `status_code` so the default
    retry predicate (408/409/429/5xx retryable, other 4xx permanent) applies
    to raw-HTTP transports exactly as it does to SDK exceptions."""

    def __init__(self, status_code: int, body: str = ""):
        super().__init__(f"provider HTTP {status_code}: {body[:200]}")
        self.status_code = status_code


def openai_http_transport(
    api_base: str,
    api_key: str | None = None,
    timeout: float = 30.0,
    path: str = "/v1/embeddings",
):
    """Stdlib transport speaking the OpenAI-compatible embeddings wire shape
    (POST {api_base}{path} with ``{"model": ..., "input": [...]}`` →
    ``{"data": [{"embedding": [...]}, ...]}``) — the request/response schema
    LiteLLM normalizes every provider to (reference:
    models/litellm_embeddings.py:69-84). No SDK dependency: urllib over a
    real socket, so the retry/throttle/dimension-enforcement path in
    ProviderEmbedder is exercisable (and integration-tested,
    tests/test_provider_http.py) even where litellm is absent.

    Non-2xx responses raise ProviderHTTPError with the status code attached;
    the caller's retry predicate decides transient vs permanent. Responses
    are returned in input order (the wire shape's `index` field is honored
    when present, defensively)."""
    import json as _json
    import urllib.error
    import urllib.request

    url = api_base.rstrip("/") + path

    def call(texts: list[str], **kw) -> list[list[float]]:
        payload = {"input": texts}
        if kw.get("model"):
            payload["model"] = kw["model"]
        headers = {"Content-Type": "application/json"}
        key = kw.get("api_key", api_key)
        if key:
            headers["Authorization"] = f"Bearer {key}"
        req = urllib.request.Request(
            url, data=_json.dumps(payload).encode("utf-8"), headers=headers
        )
        import http.client

        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                body = _json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as exc:
            raise ProviderHTTPError(
                exc.code, exc.read().decode("utf-8", "replace")
            ) from exc
        except (OSError, http.client.HTTPException) as exc:
            # socket timeout / refused / dropped, AND mid-body failures
            # (IncompleteRead, BadStatusLine) — all transport-shaped, all
            # retryable (review r8: HTTPException is not an OSError and
            # would otherwise be treated as permanent)
            raise ConnectionError(str(exc)) from exc
        data = body["data"]
        if any("index" in item for item in data):
            # the index field is only trustworthy when it is a COMPLETE
            # permutation of range(len(data)): a response mixing indexed
            # and unindexed items, or carrying duplicate/out-of-range
            # indexes, is malformed — raising (permanent, not retryable)
            # beats best-effort sorting that silently misaligns texts
            # with embeddings (advice r8)
            idx = [item.get("index") for item in data]
            if sorted(idx, key=lambda v: (v is None, v)) != list(
                range(len(data))
            ):
                raise ValueError(
                    f"provider response 'index' fields are not a permutation "
                    f"of 0..{len(data) - 1}: {idx[:16]}"
                )
            data = sorted(data, key=lambda item: item["index"])
        return [item["embedding"] for item in data]

    return call


def _litellm_transport():
    try:
        import litellm  # type: ignore
    except ImportError as exc:
        raise EmbedderUnavailable("litellm not installed") from exc

    def call(texts: list[str], **kw) -> list[list[float]]:
        resp = litellm.embedding(input=texts, **kw)
        return [item["embedding"] for item in resp.data]

    return call


def make_embedder(config: dict | None = None, transport=None):
    """Config-selected embedding client behind one protocol:
    ``{"provider": "hash"}`` (default) → the deterministic double;
    ``{"provider": "litellm", "model": ..., "api_key": ..., "api_base": ...,
    "batch_size": ..., "rate_limit": ...}`` → the real adapter;
    ``{"provider": "http", "api_base": ...}`` → the same adapter over the
    stdlib OpenAI-wire transport (no SDK needed). Everything downstream
    (embed_column, the vector-store populate plan) is agnostic."""
    cfg = dict(config or {})
    provider = cfg.get("provider", "hash")
    if provider == "hash":
        return HashEmbedder(dim=cfg.get("dim", EMBED_DIM))
    if provider == "http":
        if not cfg.get("api_base"):
            raise ValueError("provider 'http' requires api_base")
        transport = transport or openai_http_transport(
            cfg["api_base"],
            api_key=cfg.get("api_key"),
            timeout=cfg.get("timeout", 30.0),
        )
        return ProviderEmbedder(
            model=cfg.get("model", ""),
            batch_size=cfg.get("batch_size", PROVIDER_BATCH),
            rate_limit=cfg.get("rate_limit", 0),
            transport=transport,
            dim=cfg.get("dim"),
            max_retries=cfg.get("max_retries", 2),
            retry_backoff=cfg.get("retry_backoff", 0.5),
        )
    if provider == "litellm":
        return ProviderEmbedder(
            model=cfg.get("model", ""),
            api_key=cfg.get("api_key"),
            api_base=cfg.get("api_base"),
            batch_size=cfg.get("batch_size", PROVIDER_BATCH),
            rate_limit=cfg.get("rate_limit", 0),
            transport=transport,
            dim=cfg.get("dim"),
            max_retries=cfg.get("max_retries", 2),
            retry_backoff=cfg.get("retry_backoff", 0.5),
        )
    raise ValueError(f"unknown embedding provider: {provider!r}")


def embed_column(
    text_col: str | Column,
    dim: int = EMBED_DIM,
    rate_limit: int = 0,
    config: dict | None = None,
) -> Column:
    """Vectorized embedding of a text column via a scalar-iterator
    pandas_udf: client built once per task, Arrow batches in/out — the
    10-100x-over-row-UDF path when Python is unavoidable.

    `rate_limit` > 0 throttles provider batches (Throttle); `config`
    selects the client via make_embedder (default: the deterministic hash
    double, so results stay verifiable)."""
    cfg = dict(config or {})
    cfg.setdefault("provider", "hash")
    if cfg["provider"] == "hash":
        # only the hash double gets a default dim; for a real provider the
        # width is the model's to declare — an explicit cfg["dim"] opts in
        # to enforcement, an absent one must not impose the double's 64
        cfg.setdefault("dim", dim)
    cfg.setdefault("rate_limit", rate_limit)

    @F.pandas_udf(ArrayType(FloatType()))
    def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        client = make_embedder(cfg)
        throttle = Throttle(rate_limit)
        for batch in batches:
            texts = batch.fillna("").tolist()
            out: list[list[float]] = []
            for i in range(0, len(texts), PROVIDER_BATCH):
                throttle.wait()
                out.extend(client.embed_documents(texts[i : i + PROVIDER_BATCH]))
            yield pd.Series(out)

    return _embed(F.col(text_col) if isinstance(text_col, str) else text_col)
