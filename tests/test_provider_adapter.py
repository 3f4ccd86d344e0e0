"""Provider-adapter seam tests (mocked transport — no network, no litellm).

The production embedding path is `ProviderEmbedder` behind the same
two-method protocol as the deterministic `HashEmbedder` double; these tests
pin the batch-96 chunking, call-kwarg forwarding, rate-limit spacing, and
the import-gated default transport."""

from __future__ import annotations

import time

import pytest

from ai_optimizer_spark.embedding import (
    EMBED_DIM,
    EmbedderUnavailable,
    HashEmbedder,
    ProviderEmbedder,
    Throttle,
    make_embedder,
)


def _recording_transport(record):
    def call(texts, **kw):
        record.append((list(texts), dict(kw)))
        return [[float(len(t))] for t in texts]

    return call


def test_batching_honors_provider_cap():
    calls = []
    client = ProviderEmbedder(model="m", transport=_recording_transport(calls))
    texts = [f"t{i}" for i in range(200)]
    out = client.embed_documents(texts)
    assert [len(c[0]) for c in calls] == [96, 96, 8]
    assert len(out) == 200
    # order preserved across chunks
    assert out == [[float(len(t))] for t in texts]


def test_call_kwargs_forwarded():
    calls = []
    client = ProviderEmbedder(
        model="prov/model-x",
        api_key="k",
        api_base="http://localhost:9",
        transport=_recording_transport(calls),
    )
    client.embed_query("hello")
    _, kw = calls[0]
    assert kw == {"model": "prov/model-x", "api_key": "k", "api_base": "http://localhost:9"}


def test_short_response_raises():
    client = ProviderEmbedder(model="m", transport=lambda texts, **kw: [[1.0]])
    with pytest.raises(ValueError, match="1 embeddings for 2 inputs"):
        client.embed_documents(["a", "b"])


def test_rate_limit_spaces_calls():
    calls = []

    def timed(texts, **kw):
        calls.append(time.monotonic())
        return [[0.0]] * len(texts)

    client = ProviderEmbedder(
        model="m", batch_size=1, rate_limit=1200, transport=timed
    )  # 1200/min → 50 ms between calls
    client.embed_documents(["a", "b", "c"])
    assert len(calls) == 3
    assert calls[2] - calls[0] >= 0.095  # two 50 ms gaps, scheduling slack


def test_default_transport_is_import_gated():
    with pytest.raises(EmbedderUnavailable, match="litellm"):
        ProviderEmbedder(model="m")  # litellm absent in this container


def test_make_embedder_config_selection():
    assert isinstance(make_embedder(None), HashEmbedder)
    assert isinstance(make_embedder({"provider": "hash", "dim": 16}), HashEmbedder)
    assert make_embedder({"provider": "hash", "dim": 16}).dim == 16

    client = make_embedder(
        {"provider": "litellm", "model": "m", "batch_size": 4},
        transport=lambda texts, **kw: [[0.0]] * len(texts),
    )
    assert isinstance(client, ProviderEmbedder) and client.batch_size == 4
    with pytest.raises(ValueError, match="unknown embedding provider"):
        make_embedder({"provider": "quantum"})


def test_protocol_parity_with_hash_double():
    """Both clients satisfy the same protocol: embed_documents list-in/
    list-out with stable dim, embed_query == single-doc embed."""
    calls = []
    prov = ProviderEmbedder(model="m", transport=_recording_transport(calls))
    double = HashEmbedder()
    for client in (prov, double):
        docs = client.embed_documents(["alpha beta", "gamma"])
        assert len(docs) == 2
        assert client.embed_query("alpha beta") == docs[0]
    assert len(double.embed_query("x")) == EMBED_DIM


def test_throttle_zero_is_free():
    t = Throttle(0)
    start = time.monotonic()
    for _ in range(100):
        t.wait()
    assert time.monotonic() - start < 0.05


# ---------------------------------------------------------------------------
# chat adapter (the LLM half of the provider seam)
# ---------------------------------------------------------------------------


def _chat_transport(replies):
    """Pops canned replies; records (prompt, params)."""
    log = []

    def call(prompt, **params):
        log.append((prompt, params))
        r = replies.pop(0)
        if isinstance(r, Exception):
            raise r
        return r

    call.log = log
    return call


def test_classify_contract():
    from ai_optimizer_spark.chat import ProviderChat

    t = _chat_transport(["vecsearch", " NL2SQL ", "gibberish", RuntimeError("boom")])
    c = ProviderChat(model="m", transport=t)
    assert c.classify_query("find similar docs") == "vecsearch"
    assert c.classify_query("sum revenue") == "nl2sql"  # casefolded
    assert c.classify_query("x") == "both"  # out-of-domain -> fallback
    assert c.classify_query("x") == "both"  # transport error -> fallback
    # temperature 0 and the 10-token cap are on the wire
    assert t.log[0][1]["temperature"] == 0 and t.log[0][1]["max_tokens"] == 10


def test_rephrase_contract():
    from ai_optimizer_spark.chat import ProviderChat

    t = _chat_transport(["better question", "two\nlines", "  ", RuntimeError("x")])
    c = ProviderChat(model="m", transport=t)
    # <2 turns: no call at all
    assert c.rephrase("q", ["one turn"]) == "q" and not t.log
    assert c.rephrase("q", ["a", "b"]) == "better question"
    assert c.rephrase("q", ["a", "b"]) == "q"  # multi-line rejected
    assert c.rephrase("q", ["a", "b"]) == "q"  # empty rejected
    assert c.rephrase("q", ["a", "b"]) == "q"  # error -> original
    assert t.log[0][1]["max_tokens"] == 128


def test_grade_contract():
    from ai_optimizer_spark.chat import ProviderChat

    t = _chat_transport(["Yes, relevant", "no.", "maybe?", RuntimeError("x")])
    c = ProviderChat(model="m", transport=t)
    assert c.grade("q", ["d"]) == "yes"
    assert c.grade("q", ["d"]) == "no"
    assert c.grade("q", ["d"]) == "yes"  # unparseable -> yes
    assert c.grade("q", ["d"]) == "yes"  # error -> yes
    assert c.grade("q", []) == "yes" and len(t.log) == 4  # empty set: no call


def test_make_chat_selection():
    from ai_optimizer_spark.chat import ChatUnavailable, ProviderChat, make_chat

    assert make_chat(None) is None  # doubles stay the default path
    c = make_chat({"provider": "litellm", "model": "m"}, transport=lambda p, **k: "ok")
    assert isinstance(c, ProviderChat)
    with pytest.raises(ValueError, match="unknown chat provider"):
        make_chat({"provider": "psychic"})
    with pytest.raises(ChatUnavailable):
        ProviderChat(model="m")  # litellm absent in this container


# ---------------------------------------------------------------------------
# retry + shape enforcement (VERDICT r3 task #6)
# ---------------------------------------------------------------------------


class _ProviderError(RuntimeError):
    """Provider-SDK-shaped error: carries status_code like litellm/openai
    exception classes do."""

    def __init__(self, msg, status_code):
        super().__init__(msg)
        self.status_code = status_code


def _flaky_transport(fail_times, record, exc_factory=None):
    """Raises a transient 503-coded error for the first `fail_times` calls,
    then succeeds."""
    state = {"calls": 0}
    if exc_factory is None:
        exc_factory = lambda: _ProviderError("transient provider 5xx", 503)

    def call(texts, **kw):
        state["calls"] += 1
        record.append(time.monotonic())
        if state["calls"] <= fail_times:
            raise exc_factory()
        return [[1.0, 2.0] for _ in texts]

    return call


def test_transient_failure_retried_with_backoff():
    calls = []
    client = ProviderEmbedder(
        model="m",
        transport=_flaky_transport(2, calls),
        max_retries=2,
        retry_backoff=0.02,
    )
    out = client.embed_documents(["a"])
    assert out == [[1.0, 2.0]]
    assert len(calls) == 3  # two failures + one success
    # backoff spacing: 0.02 then 0.04 between attempts
    assert calls[1] - calls[0] >= 0.018 and calls[2] - calls[1] >= 0.035


def test_retries_exhausted_reraises():
    calls = []
    client = ProviderEmbedder(
        model="m",
        transport=_flaky_transport(99, calls),
        max_retries=1,
        retry_backoff=0.001,
    )
    with pytest.raises(RuntimeError, match="transient"):
        client.embed_documents(["a"])
    assert len(calls) == 2  # initial + 1 retry, then surfaced


def test_dimension_mismatch_rejected_without_retry():
    """A provider answering with the wrong width is a protocol violation,
    not a transient fault — fail fast, never burn retries on it."""
    calls = []

    def wrong_dim(texts, **kw):
        calls.append(1)
        return [[1.0, 2.0, 3.0] for _ in texts]

    client = ProviderEmbedder(
        model="m", transport=wrong_dim, dim=2, max_retries=5, retry_backoff=0.001
    )
    with pytest.raises(ValueError, match="dim 3, expected 2"):
        client.embed_documents(["a", "b"])
    assert len(calls) == 1  # no retry on shape errors


def test_ragged_widths_rejected():
    client = ProviderEmbedder(
        model="m",
        transport=lambda texts, **kw: [[1.0], [1.0, 2.0]],
    )
    with pytest.raises(ValueError, match="ragged"):
        client.embed_documents(["a", "b"])


def test_retry_config_flows_through_make_embedder():
    calls = []
    client = make_embedder(
        {
            "provider": "litellm",
            "model": "m",
            "dim": 2,
            "max_retries": 3,
            "retry_backoff": 0.01,
        },
        transport=_flaky_transport(3, calls),
    )
    assert client.embed_documents(["x"]) == [[1.0, 2.0]]
    assert len(calls) == 4


def test_permanent_errors_surface_without_retry():
    """ADVICE r4: a non-retryable failure (bad API key → 401, unknown model
    → 404, validation → 400) must NOT burn the retry budget sleeping
    through backoff — it surfaces on the first call."""
    for status in (400, 401, 404):
        calls = []
        client = ProviderEmbedder(
            model="m",
            transport=_flaky_transport(
                99, calls, lambda s=status: _ProviderError("permanent", s)
            ),
            max_retries=5,
            retry_backoff=0.5,
        )
        with pytest.raises(_ProviderError, match="permanent"):
            client.embed_documents(["a"])
        assert len(calls) == 1, f"status {status} was retried"


def test_uncoded_transport_timeouts_are_retryable():
    """Errors with no status code retry only when transport-shaped:
    TimeoutError/ConnectionError retry; a bare RuntimeError does not."""
    calls = []
    client = ProviderEmbedder(
        model="m",
        transport=_flaky_transport(1, calls, lambda: TimeoutError("slow")),
        max_retries=2,
        retry_backoff=0.001,
    )
    assert client.embed_documents(["a"]) == [[1.0, 2.0]]
    assert len(calls) == 2

    calls2 = []
    client2 = ProviderEmbedder(
        model="m",
        transport=_flaky_transport(1, calls2, lambda: RuntimeError("???")),
        max_retries=2,
        retry_backoff=0.001,
    )
    with pytest.raises(RuntimeError):
        client2.embed_documents(["a"])
    assert len(calls2) == 1  # unknown failure class: fail fast, don't guess


def test_custom_retryable_predicate_overrides_default():
    calls = []
    client = ProviderEmbedder(
        model="m",
        transport=_flaky_transport(1, calls, lambda: RuntimeError("flaky")),
        max_retries=2,
        retry_backoff=0.001,
        retryable=lambda exc: "flaky" in str(exc),
    )
    assert client.embed_documents(["a"]) == [[1.0, 2.0]]
    assert len(calls) == 2


def test_string_and_garbage_status_codes_handled():
    """Review finding: int(status) must not crash the retry handler, and a
    numeric STRING status ('429') must classify like its integer."""
    calls = []
    client = ProviderEmbedder(
        model="m",
        transport=_flaky_transport(1, calls, lambda: _ProviderError("rl", "429")),
        max_retries=2,
        retry_backoff=0.001,
    )
    assert client.embed_documents(["a"]) == [[1.0, 2.0]]
    assert len(calls) == 2  # string '429' retried like int 429

    calls2 = []
    client2 = ProviderEmbedder(
        model="m",
        transport=_flaky_transport(
            9, calls2, lambda: _ProviderError("weird", "Service Unavailable")
        ),
        max_retries=3,
        retry_backoff=0.001,
    )
    with pytest.raises(_ProviderError, match="weird"):  # original error, not ValueError
        client2.embed_documents(["a"])
    assert len(calls2) == 1  # unparseable status: fail fast
