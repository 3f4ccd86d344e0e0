"""Plan-shape regression tests: the physical properties the engine's scale
claims rest on — broadcasts, pushdown, sort+limit fusion, shuffle-free
narrow maps — asserted against the optimized plans so perf regressions
fail CI, not the benchmark."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest

from ai_optimizer_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        QUERIES[name](spark, SF).explain("formatted")
    return buf.getvalue()


def test_standings_broadcasts_dimensions(spark):
    plan = plan_of(spark, "a6_customer_standings")
    assert "BroadcastHashJoin" in plan  # customer side broadcasts
    assert "PushedFilters: [IsNotNull" in plan  # join keys push to scan


def test_topk_fuses_sort_and_limit(spark):
    plan = plan_of(spark, "v1_cosine_topk")
    assert "TakeOrderedAndProject" in plan  # no global sort materialized
    assert "EqualTo(vec_id,0)" in plan  # query-vector filter reaches scan


def test_chunker_is_shuffle_free(spark):
    plan = plan_of(spark, "tx5_chunk_documents")
    assert "Exchange" not in plan  # pure narrow map: scan → generate → project


def test_similarity_conversions_shuffle_free(spark):
    plan = plan_of(spark, "v2_similarity_conversions")
    # crossJoin(broadcast(1-row query)) + exprs: only a broadcast exchange
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange") - plan.count("BroadcastExchange") <= plan.count("ReusedExchange")


def test_anti_join_builds_broadcast(spark):
    plan = plan_of(spark, "j2_anti_join_new_rows")
    assert "LeftAnti" in plan and "Broadcast" in plan
