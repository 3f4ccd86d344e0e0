"""Chat-model adapter — the LLM half of the provider seam (the embedding
half is embedding.ProviderEmbedder).

The reference drives every LLM-backed operator through LiteLLM completions
with an op-specific *contract* around the raw call: a fixed output domain,
a validation rule, and a deterministic fallback. The engine's in-plan
doubles (operators/llm_doubles.py) implement those contracts as column
expressions for verifiable tests; this module implements the SAME contracts
around a real transport so a deployment can flip provider without touching
any plan:

  * classify_query — domain {nl2sql, vecsearch, both}, temperature 0,
    max_tokens 10, fallback "both" (runtime/langgraph/multi_tool.py:108-120)
  * rephrase      — >=2-turn history gate, 128-token cap, single-line
    guard falling back to the original question (mcp/tools/
    vs_rephrase.py:28-60)
  * grade         — binary yes/no by containment, anything else (including
    transport failure) grades "yes" so retrieval is never blanked by an
    unparseable judge (mcp/tools/vs_grade.py:32-51)

`transport` is a callable ``(prompt: str, **params) -> str`` injected for
tests; the default import-gates litellm and raises `ChatUnavailable` when
absent. Throttling reuses embedding.Throttle.
"""

from __future__ import annotations

from .embedding import Throttle

CLASSIFY_MAX_TOKENS = 10
REPHRASE_MAX_TOKENS = 128
MIN_HISTORY_FOR_REPHRASE = 2
ROUTES = ("nl2sql", "vecsearch", "both")


class ChatUnavailable(RuntimeError):
    """No transport for the configured chat provider (litellm absent)."""


def _litellm_chat_transport():
    try:
        import litellm  # type: ignore
    except ImportError as exc:
        raise ChatUnavailable("litellm not installed") from exc

    def call(prompt: str, **params) -> str:
        resp = litellm.completion(
            messages=[{"role": "user", "content": prompt}], **params
        )
        return resp.choices[0].message.content or ""

    return call


class ProviderChat:
    """Minimal completion client + the reference's per-op contracts."""

    def __init__(
        self,
        model: str,
        api_key: str | None = None,
        api_base: str | None = None,
        rate_limit: int = 0,
        transport=None,
    ):
        self.model = model
        self._params = {"model": model}
        if api_key is not None:
            self._params["api_key"] = api_key
        if api_base is not None:
            self._params["api_base"] = api_base
        self._throttle = Throttle(rate_limit)
        self._transport = (
            transport if transport is not None else _litellm_chat_transport()
        )

    def complete(self, prompt: str, **overrides) -> str:
        self._throttle.wait()
        return self._transport(prompt, **{**self._params, **overrides})

    # -- op contracts -------------------------------------------------------

    def classify_query(self, question: str) -> str:
        """Route a question to {nl2sql, vecsearch, both}; ANY deviation —
        out-of-domain output or a transport error — falls back to "both"
        (run every sub-plan rather than drop one)."""
        try:
            raw = self.complete(
                f"Classify this question as nl2sql, vecsearch or both: {question}",
                temperature=0,
                max_tokens=CLASSIFY_MAX_TOKENS,
            )
        except Exception:
            return "both"
        answer = raw.strip().lower()
        return answer if answer in ROUTES else "both"

    def rephrase(self, question: str, history: list[str]) -> str:
        """History-conditioned rephrase: skipped entirely under 2 turns;
        output must be one non-empty line or the original stands."""
        if len(history) < MIN_HISTORY_FOR_REPHRASE:
            return question
        try:
            raw = self.complete(
                "Rephrase the question as one standalone line.\n"
                f"History: {' | '.join(history)}\nQuestion: {question}",
                max_tokens=REPHRASE_MAX_TOKENS,
            )
        except Exception:
            return question
        candidate = raw.strip()
        if not candidate or "\n" in candidate or "\r" in candidate:
            return question
        return candidate

    def grade(self, question: str, documents: list[str]) -> str:
        """Binary relevance: "yes" ∈ response → yes, else "no" ∈ response →
        no, anything else (or a failed call) → yes — never blank retrieval
        on an unparseable judge."""
        if not documents:
            return "yes"
        try:
            raw = self.complete(
                f"Are these documents relevant to: {question}?\n\n"
                + "\n\n".join(documents)
                + "\n\nAnswer yes or no.",
                temperature=0,
            )
        except Exception:
            return "yes"
        answer = raw.lower()
        if "yes" in answer:
            return "yes"
        if "no" in answer:
            return "no"
        return "yes"


def make_chat(config: dict | None = None, transport=None) -> ProviderChat | None:
    """Config-selected chat client; provider "none" (default) returns None —
    the flow keeps its deterministic doubles unless a model is configured."""
    cfg = dict(config or {})
    provider = cfg.get("provider", "none")
    if provider == "none":
        return None
    if provider == "litellm":
        return ProviderChat(
            model=cfg.get("model", ""),
            api_key=cfg.get("api_key"),
            api_base=cfg.get("api_base"),
            rate_limit=cfg.get("rate_limit", 0),
            transport=transport,
        )
    raise ValueError(f"unknown chat provider: {provider!r}")
