"""Streaming ≡ batch parity: the streaming windowed aggregation over the
static snapshot must equal the batch tumbling-window operator (the defining
property of Structured Streaming)."""

from __future__ import annotations

from ai_optimizer_spark.operators.events import tumbling_window_counts
from ai_optimizer_spark.streaming.event_stream import (
    ProgressRecorder,
    events_stream,
    run_to_memory,
    windowed_counts,
)
from ai_optimizer_spark.tables import load_tables


def test_streaming_matches_batch(spark, sf_small):
    listener = ProgressRecorder()
    spark.streams.addListener(listener)
    try:
        stream_plan = windowed_counts(events_stream(spark, sf_small))
        got = run_to_memory(spark, stream_plan, "win_counts_test")
        want = tumbling_window_counts(load_tables(spark, sf_small))
        g = {tuple(r) for r in got.collect()}
        w = {tuple(r) for r in want.collect()}
        assert g == w and len(g) > 0
    finally:
        spark.streams.removeListener(listener)
    assert len(listener.started) >= 1
    assert sum(p["num_input_rows"] for p in listener.progress) > 0
