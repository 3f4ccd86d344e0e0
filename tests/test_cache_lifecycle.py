"""Persist-lifecycle gate (VERDICT r10 "What's wrong" #2): operator-internal
``persist()`` intermediates must be releasable by a session sweep. A
long-lived session that composes operator calls would otherwise accumulate
corpus-scale cached blocks that Spark's CacheManager never evicts on Python
GC — at 100 TB the text-sized shingle-index entries squeeze executor
storage and spill-churn hot data.

Every operator persist goes through ``ai_optimizer_spark.cache.shared_persist``;
``release_shared_caches()`` unpersists everything registered. This test runs
a sweep of the persist-heavy operators, releases, and asserts the JVM
CacheManager is empty — i.e. zero net cached-entry growth per session sweep.
"""

from __future__ import annotations

from ai_optimizer_spark.cache import (
    active_shared_count,
    release_shared_caches,
    shared_persist,
)
from ai_optimizer_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"

# Covers every shared_persist call site: minhash/LSH family (dedup.py),
# exact-Jaccard + recall intersection, sweep, incremental, winnow, KMV/CMS
# sketches (misc.py), sketch refreshes + drift (refresh.py), quality
# classifier fit (textops.py), bloom decon, error curve (similarity.py),
# and the composed e2e plans (curation.py).
SWEEP = [
    "d3_minhash_lsh_pairs",
    "d21_lsh_recall",
    "d22_lsh_cap_recall_sweep",
    "d24_incremental_lsh_dedup",
    "a26_kmv_distinct_shingles",
    "a28_kmv_source_overlap",
    "t12_drift_monitor",
    "t20_kmv_sketch_refresh",
    "t21_cms_sketch_refresh",
    "tx19_quality_classifier",
    "v28_quantization_error_curve",
    "e2e_auto_curation",
]


def _cache_manager_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_release_shared_caches_empties_cache_manager(spark):
    spark.catalog.clearCache()
    release_shared_caches()  # drop anything a previous test registered
    assert _cache_manager_empty(spark)

    for name in SWEEP:
        df = QUERIES[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()

    # the sweep's operators must actually have registered entries —
    # otherwise this gate is vacuous
    assert active_shared_count() >= len(SWEEP) // 2

    released = release_shared_caches()
    assert released >= len(SWEEP) // 2
    assert active_shared_count() == 0
    assert _cache_manager_empty(spark), (
        "CacheManager still holds entries after release_shared_caches(); "
        "some operator persists outside shared_persist()"
    )


def test_release_is_idempotent_and_safe_when_empty(spark):
    assert release_shared_caches() == 0


def test_shared_persist_returns_same_dataframe(spark):
    df = spark.range(5)
    try:
        assert shared_persist(df) is df
        assert df.storageLevel.useMemory
    finally:
        assert release_shared_caches() >= 1
