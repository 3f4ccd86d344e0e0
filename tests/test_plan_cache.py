"""O11 plan cache: identity-keyed reuse + invalidate-on-settings-change."""

from __future__ import annotations

from ai_optimizer_spark.plans.plan_cache import PlanCache, settings_identity


def test_reuse_and_rebuild_semantics():
    cache = PlanCache()
    s1 = {"top_k": 8, "threshold": 0.65}
    p1 = cache.get_or_build("alice", "vecsearch", s1, lambda: object())
    p2 = cache.get_or_build("alice", "vecsearch", dict(s1), lambda: object())
    assert p1 is p2 and cache.builds == 1  # same identity → no rebuild

    p3 = cache.get_or_build("alice", "vecsearch", {"top_k": 4}, lambda: object())
    assert p3 is not p1 and cache.builds == 2  # settings change → rebuild
    assert len(cache) == 1  # superseded plan dropped

    cache.get_or_build("bob", "vecsearch", s1, lambda: object())
    assert cache.builds == 3 and len(cache) == 2  # per-client isolation

    cache.invalidate("alice")
    assert len(cache) == 1
    cache.invalidate()
    assert len(cache) == 0


def test_identity_is_order_insensitive():
    assert settings_identity({"a": 1, "b": 2}) == settings_identity({"b": 2, "a": 1})
    assert settings_identity({"a": 1}) != settings_identity({"a": 2})
