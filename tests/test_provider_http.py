"""Live-shaped provider integration tests (VERDICT r7 task 4): drive
ProviderEmbedder through the stdlib OpenAI-wire HTTP transport against a
real in-process socket server — converting the D3 seam from "unit-tested
against fakes" to "integration-tested against HTTP". The server scripts
provider behaviors the reference's LiteLLM layer normalizes
(models/litellm_embeddings.py:69-99): batch-of-96 requests, 429
rate-limits, 5xx flaps, permanent 4xx, wrong-dimension and wrong-count
replies.

Skipped (not failed) when sockets are unavailable in the sandbox.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from ai_optimizer_spark.embedding import (
    ProviderEmbedder,
    ProviderHTTPError,
    make_embedder,
    openai_http_transport,
)

DIM = 4


def _vec(text: str) -> list[float]:
    # deterministic per-text embedding so order/alignment is assertable
    return [float(len(text)), float(ord(text[0]) if text else 0), 1.0, 0.0]


class _ScriptedHandler(BaseHTTPRequestHandler):
    """Each POST pops the next scripted behavior; default is 'ok'.
    Behaviors: ("ok",) | ("status", code) | ("wrong_dim", d) | ("short",)
    | ("ragged",)."""

    server_version = "scripted/0"

    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        payload = json.loads(self.rfile.read(n).decode("utf-8"))
        srv = self.server
        srv.requests.append(
            {
                "path": self.path,
                "input": payload.get("input", []),
                "model": payload.get("model"),
                "auth": self.headers.get("Authorization"),
            }
        )
        behavior = srv.script.pop(0) if srv.script else ("ok",)
        if behavior[0] == "status":
            body = json.dumps({"error": {"message": "scripted"}}).encode()
            self.send_response(behavior[1])
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        texts = payload["input"]
        if behavior[0] == "wrong_dim":
            data = [
                {"index": i, "embedding": [0.0] * behavior[1]}
                for i in range(len(texts))
            ]
        elif behavior[0] == "short":
            data = [
                {"index": i, "embedding": _vec(t)}
                for i, t in enumerate(texts[:-1])
            ]
        elif behavior[0] == "ragged":
            data = [
                {"index": i, "embedding": _vec(t)[: DIM - (i % 2)]}
                for i, t in enumerate(texts)
            ]
        elif behavior[0] == "bad_index":
            # malformed index fields: duplicate 0s with one unindexed item —
            # NOT a permutation of range(len), must be rejected not sorted
            data = [
                {"index": 0, "embedding": _vec(t)} for t in texts[:-1]
            ] + [{"embedding": _vec(texts[-1])}]
        else:
            # reversed index order on the wire — the transport must restore
            # input order from the `index` field
            data = [
                {"index": i, "embedding": _vec(t)}
                for i, t in enumerate(texts)
            ][::-1]
        body = json.dumps({"object": "list", "data": data}).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)


@pytest.fixture()
def server():
    try:
        srv = ThreadingHTTPServer(("127.0.0.1", 0), _ScriptedHandler)
    except OSError as exc:  # no sockets in this sandbox
        pytest.skip(f"sockets unavailable: {exc}")
    srv.requests = []
    srv.script = []
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    srv.base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        yield srv
    finally:
        srv.shutdown()
        srv.server_close()


def _embedder(server, **kw) -> ProviderEmbedder:
    kw.setdefault("retry_backoff", 0.01)
    return ProviderEmbedder(
        model="test-model",
        api_key="sk-test",
        transport=openai_http_transport(server.base, api_key="sk-test"),
        dim=DIM,
        **kw,
    )


def test_batching_and_order_over_http(server):
    """200 texts at the 96-cap → exactly 3 wire requests (96/96/8), results
    aligned to inputs even though the server replies index-reversed."""
    texts = [f"doc {i:03d}" for i in range(200)]
    out = _embedder(server).embed_documents(texts)
    assert [len(r["input"]) for r in server.requests] == [96, 96, 8]
    assert all(r["model"] == "test-model" for r in server.requests)
    assert all(r["auth"] == "Bearer sk-test" for r in server.requests)
    assert out == [_vec(t) for t in texts]


def test_429_rate_limit_retried(server):
    server.script = [("status", 429)]
    out = _embedder(server).embed_documents(["hello"])
    assert out == [_vec("hello")]
    assert len(server.requests) == 2  # 429 burned one attempt, retry won


def test_5xx_flap_retried_to_success(server):
    server.script = [("status", 503), ("status", 500)]
    out = _embedder(server, max_retries=2).embed_documents(["hello"])
    assert out == [_vec("hello")]
    assert len(server.requests) == 3


def test_permanent_401_not_retried(server):
    server.script = [("status", 401)]
    with pytest.raises(ProviderHTTPError) as ei:
        _embedder(server).embed_documents(["hello"])
    assert ei.value.status_code == 401
    assert len(server.requests) == 1  # no retry on a permanent error


def test_retry_budget_exhausted_raises_last_429(server):
    server.script = [("status", 429)] * 3
    with pytest.raises(ProviderHTTPError) as ei:
        _embedder(server, max_retries=2).embed_documents(["hello"])
    assert ei.value.status_code == 429
    assert len(server.requests) == 3  # initial + 2 retries, then surface


def test_wrong_dimension_rejected_immediately(server):
    server.script = [("wrong_dim", DIM + 3)]
    with pytest.raises(ValueError, match="dim"):
        _embedder(server).embed_documents(["hello"])
    assert len(server.requests) == 1  # protocol violation: no retry


def test_wrong_count_rejected(server):
    server.script = [("short",)]
    with pytest.raises(ValueError, match="embeddings for"):
        _embedder(server).embed_documents(["a", "b", "c"])


def test_ragged_widths_rejected(server):
    server.script = [("ragged",)]
    with pytest.raises(ValueError, match="ragged"):
        _embedder(server).embed_documents(["aa", "bb"])


def test_malformed_index_fields_rejected(server):
    """A response mixing indexed and unindexed items (or duplicate
    indexes) is malformed: the transport must raise rather than
    best-effort sort and silently misalign texts with embeddings."""
    server.script = [("bad_index",)]
    with pytest.raises(ValueError, match="permutation"):
        _embedder(server).embed_documents(["a", "b", "c"])
    assert len(server.requests) == 1  # protocol violation: no retry


def test_throttle_spaces_wire_calls(server):
    """rate_limit=600 → ≥0.1 s between provider calls; 3 batches of 1 with
    batch_size=1 must take ≥0.2 s wall-clock (reference sleeps
    60/rate_limit between embed batches, embed/vector_store.py:183-186)."""
    emb = _embedder(server, batch_size=1, rate_limit=600)
    t0 = time.monotonic()
    emb.embed_documents(["a", "b", "c"])
    assert time.monotonic() - t0 >= 0.18
    assert len(server.requests) == 3


def test_connection_refused_is_retryable_then_raises():
    # bind-then-close to get a port with no listener
    try:
        probe = ThreadingHTTPServer(("127.0.0.1", 0), _ScriptedHandler)
    except OSError as exc:
        pytest.skip(f"sockets unavailable: {exc}")
    port = probe.server_address[1]
    probe.server_close()
    calls = []
    transport = openai_http_transport(f"http://127.0.0.1:{port}")

    def counting(texts, **kw):
        calls.append(len(texts))
        return transport(texts, **kw)

    emb = ProviderEmbedder(
        model="m", transport=counting, max_retries=1, retry_backoff=0.01
    )
    with pytest.raises(ConnectionError):
        emb.embed_documents(["hello"])
    assert len(calls) == 2  # transport-shaped failure burned the retry


def test_make_embedder_http_provider(server):
    emb = make_embedder(
        {
            "provider": "http",
            "api_base": server.base,
            "model": "test-model",
            "api_key": "sk-test",
            "dim": DIM,
        }
    )
    assert emb.embed_query("hi") == _vec("hi")
    assert server.requests[0]["auth"] == "Bearer sk-test"
    assert server.requests[0]["path"] == "/v1/embeddings"
