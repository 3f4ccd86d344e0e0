"""Config-keyed plan cache — SURVEY.md §4-O11.

The reference caches compiled sessions by (client, route) keyed on a
settings-identity dict, rebuilding only when the effective settings change
(runtime/langgraph/chat.py:92,110-144,295-320). The Spark analog caches
*built DataFrame plans* (and their broadcast/cache artifacts) the same way:
building a plan is cheap, but a cached plan preserves reused broadcast
variables, persisted intermediates, and AQE statistics across queries.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Callable
from typing import Any


def settings_identity(settings: dict[str, Any]) -> str:
    """Stable identity hash of a settings payload: canonical JSON → sha256.
    Mirrors the reference's identity-dict comparison (chat.py:110-144) but
    collapses it to a key."""
    canon = json.dumps(settings, sort_keys=True, separators=(",", ":"), default=str)
    return hashlib.sha256(canon.encode()).hexdigest()[:16]


class PlanCache:
    """Plans keyed by (client, route, settings-identity); a settings change
    produces a new identity → stale entries for that (client, route) are
    dropped (the reference's cache-invalidate-on-identity-change)."""

    def __init__(self) -> None:
        self._plans: dict[tuple[str, str, str], Any] = {}
        self.builds = 0  # observability: how many cache misses built a plan

    def get_or_build(
        self,
        client: str,
        route: str,
        settings: dict[str, Any],
        builder: Callable[[], Any],
    ) -> Any:
        ident = settings_identity(settings)
        key = (client, route, ident)
        if key not in self._plans:
            # settings changed → drop superseded plans for this client+route
            stale = [k for k in self._plans if k[:2] == (client, route)]
            for k in stale:
                del self._plans[k]
            self._plans[key] = builder()
            self.builds += 1
        return self._plans[key]

    def invalidate(self, client: str | None = None) -> None:
        if client is None:
            self._plans.clear()
        else:
            for k in [k for k in self._plans if k[0] == client]:
                del self._plans[k]

    def __len__(self) -> int:
        return len(self._plans)
