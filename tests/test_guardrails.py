"""O12 result-size governance + O8 embed throttle."""

from __future__ import annotations

import time

import pytest

from ai_optimizer_spark.embedding import embed_column
from ai_optimizer_spark.guardrails import ResultSetTooLargeError, collect_capped
from ai_optimizer_spark.tables import load_tables


def test_collect_capped_under_and_over(spark):
    ok = collect_capped(spark.range(10), cap=100)
    assert len(ok) == 10
    with pytest.raises(ResultSetTooLargeError):
        collect_capped(spark.range(200), cap=100)


def test_embed_rate_limit_throttles(spark, sf_small):
    docs = load_tables(spark, sf_small)["documents"].limit(200).coalesce(1)
    t0 = time.perf_counter()
    docs.select(embed_column("text")).write.format("noop").mode("overwrite").save()
    unthrottled = time.perf_counter() - t0
    # 200 rows = 3 provider batches; 1200/min → 0.05 s between batches
    t0 = time.perf_counter()
    docs.select(embed_column("text", rate_limit=1200)).write.format("noop").mode(
        "overwrite"
    ).save()
    throttled = time.perf_counter() - t0
    assert throttled >= 0.1  # at least two inter-batch sleeps happened
    assert throttled > unthrottled * 0 + 0.1  # sanity: sleep actually occurred
