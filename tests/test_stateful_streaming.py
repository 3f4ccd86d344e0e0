"""applyInPandasWithState job tracking must agree with its batch twin and
with the window-based implementation — three routes, one semantics."""

from __future__ import annotations

from ai_optimizer_spark.operators.jobs import job_states
from ai_optimizer_spark.streaming.event_stream import events_stream
from ai_optimizer_spark.streaming.stateful import (
    run_stream_to_final,
    track_jobs_batch,
    track_jobs_stream,
)
from ai_optimizer_spark.tables import load_tables


def _as_set(df):
    return {(r.job_id, r.last_seen, r.n_updates, r.status) for r in df.collect()}


def test_pandas_batch_matches_window_impl(spark, sf_small):
    t = load_tables(spark, sf_small)
    assert _as_set(track_jobs_batch(t)) == _as_set(job_states(t))


def test_stream_matches_batch(spark, sf_small):
    t = load_tables(spark, sf_small)
    stream_plan = track_jobs_stream(events_stream(spark, sf_small))
    got = run_stream_to_final(spark, stream_plan, "job_states_stream_test")
    assert _as_set(got) == _as_set(track_jobs_batch(t))
    assert got.count() > 0


def test_streaming_refresh_ingests_incrementally(spark, sf_small, tmp_path):
    """Drop dir → stream → store; a second drop with one modified + one new
    doc updates exactly those files on the next availableNow run."""
    from pyspark.sql import functions as F

    from ai_optimizer_spark.plans.vector_store import VectorStoreCatalog
    from ai_optimizer_spark.streaming.refresh_stream import start_refresh_stream
    from ai_optimizer_spark.tables import load_tables

    drop = str(tmp_path / "drop")
    ckpt = str(tmp_path / "ckpt")
    catalog = VectorStoreCatalog(str(tmp_path / "stores"))

    docs = (
        load_tables(spark, sf_small)["documents"]
        .limit(20)
        .select("doc_id", "text", "source")
    )
    docs.coalesce(1).write.mode("append").parquet(drop)
    start_refresh_stream(spark, catalog, "live", drop, ckpt)
    store1 = spark.read.parquet(catalog.data_path("live"))
    n1 = store1.count()
    assert n1 > 0
    doc1_before = {r.id for r in store1.filter(F.col("metadata")["filename"] == "doc_1").collect()}

    delta = spark.createDataFrame(
        [(0, "totally new text for doc zero", "src0"),
         (7777, "new streaming doc about joins", "srcS")],
        "doc_id long, text string, source string",
    )
    delta.coalesce(1).write.mode("append").parquet(drop)
    start_refresh_stream(spark, catalog, "live", drop, ckpt)

    store2 = spark.read.parquet(catalog.data_path("live"))
    assert store2.filter(F.col("metadata")["filename"] == "doc_7777").count() == 1
    doc0 = store2.filter(F.col("metadata")["filename"] == "doc_0")
    assert doc0.count() == 1 and "totally new text" in doc0.first().text
    doc1_after = {r.id for r in store2.filter(F.col("metadata")["filename"] == "doc_1").collect()}
    assert doc1_after == doc1_before and doc1_before
