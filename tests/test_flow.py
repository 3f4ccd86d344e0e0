"""§3.1 flow composition: stage pruning, routing fallback, grade blanking,
and settings-keyed plan caching."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_optimizer_spark.plans.flow import (
    VecsearchFlow,
    VecsearchSettings,
    rephrase_question,
    route_stores,
)
from ai_optimizer_spark.plans.vector_store import (
    VectorStoreCatalog,
    chunks_from_documents,
    populate_store,
)
from ai_optimizer_spark.tables import load_tables


@pytest.fixture(scope="module")
def flow(spark, tmp_path_factory):
    catalog = VectorStoreCatalog(str(tmp_path_factory.mktemp("flow") / "stores"))
    docs = load_tables(spark, "/root/testdata/sf0.001")["documents"].limit(60)
    populate_store(spark, catalog, "table_docs",
                   chunks_from_documents(docs.filter(F.col("doc_id") % 2 == 0)))
    populate_store(spark, catalog, "stream_docs",
                   chunks_from_documents(docs.filter(F.col("doc_id") % 2 == 1)))
    return VecsearchFlow(spark, catalog)


def test_flow_end_to_end_and_cache(flow):
    hits = flow.run("alice", "table join filter fast")
    assert 0 < hits.count() <= 8
    assert {"id", "text", "similarity", "searched_table", "grade"} <= set(hits.columns)
    flow.run("alice", "another table question")
    assert flow.cache.builds == 1  # same settings → compiled flow reused
    flow.run("alice", "q", VecsearchSettings(top_k=3))
    assert flow.cache.builds == 2  # settings change → rebuild


def test_routing_picks_matching_store_with_fallback(flow):
    assert route_stores(flow.catalog, "about table things") == ["table_docs"]
    assert route_stores(flow.catalog, "about stream things") == ["stream_docs"]
    # no token overlap → fallback to first store (the reference's contract)
    assert route_stores(flow.catalog, "zzz qqq") == ["stream_docs"]


def test_grading_blanks_irrelevant(flow):
    hits = flow.run(
        "bob", "table join", VecsearchSettings(grade_terms=("nosuchword12345",))
    )
    assert hits.filter(F.col("text") != "").count() == 0
    assert hits.filter(F.col("grade") != "no").count() == 0


def test_pruned_flow_skips_stages(flow):
    bare = flow.run(
        "carol", "table join",
        VecsearchSettings(enable_rephrase=False, enable_routing=False,
                          enable_grading=False),
    )
    assert "grade" not in bare.columns  # grading stage elided from the plan


def test_rephrase_guard():
    assert rephrase_question("q", []) == "q"
    assert rephrase_question("q", ["a", "b"]) == "q (re: b)"
