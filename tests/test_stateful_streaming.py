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
