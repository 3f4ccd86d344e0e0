"""Event-stream operators (batch form) — the Spark-native extension over
the driver's `events` table (SURVEY.md §2.9 note: watermarked/windowed aggs
are absent in the reference; they're the engine's streaming surface).

The same logic runs streaming in `streaming/event_stream.py`; these batch
forms are the DuckDB-verifiable equivalents (identical results on a static
snapshot), which is exactly how Structured Streaming semantics are defined
(a streaming query = the batch query over the ever-growing table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tables import epoch_us

SESSION_GAP_MINUTES = 30


def tumbling_window_counts(t: dict[str, DataFrame]) -> DataFrame:
    """Tumbling 1-hour windows per event type: count + value sum.
    `date_trunc` keys the window start — partial+final agg, one shuffle of
    (24·31·5) groups regardless of input size."""
    ev = t["events"]
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )


def sliding_window_counts(t: dict[str, DataFrame]) -> DataFrame:
    """Sliding 1-hour windows every 30 minutes per event type — batch form of
    `F.window(ts, "1 hour", "30 minutes")`. Each event lands in exactly two
    epoch-aligned windows; the explode is built-in (no UDF) and the agg stays
    partial+final over a bounded group count."""
    ev = t["events"]
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sessionize(t: dict[str, DataFrame]) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): classic lag + cumulative
    sum of session-break flags, then per-session rollup. Two window passes
    over one shuffle on user_id — the batch analog of
    `applyInPandasWithState` session windows, with no Python in the path."""
    ev = t["events"]
    w_user = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    # >= gap starts a new session — matching Spark's session_window merge
    # rule (merge only while next event < last + gap), so the streaming
    # variant in streaming/event_stream.py agrees at exact-gap boundaries
    # microsecond precision: cast("long") would truncate to whole seconds
    # and disagree with sub-second event times exactly at the gap boundary
    # (epoch_us on the DuckDB side; bit-identical integers, no float gap)
    gap_us = SESSION_GAP_MINUTES * 60 * 1_000_000
    with_breaks = ev.withColumn(
        "new_session",
        F.when(
            epoch_us("ts") - F.lag(epoch_us("ts")).over(w_user) >= gap_us,
            1,
        ).otherwise(0),
    )
    with_ids = with_breaks.withColumn(
        "session_seq",
        F.sum("new_session").over(
            w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        with_ids.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


def session_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Rollup over sessions: per-user session counts and mean session size
    (the fan-in aggregate a session table feeds)."""
    sessions = sessionize(t)
    return (
        sessions.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.round(F.avg("n_events"), 4).alias("avg_events_per_session"),
            F.max("n_events").alias("max_session_events"),
        )
    )


def attributed_purchases(t: dict[str, DataFrame]) -> DataFrame:
    """Event-to-event attribution (batch form of the stream-stream interval
    join): each purchase paired with every view by the same user in the
    preceding hour. The streaming twin is
    `streaming.event_stream.attributed_purchases_stream` — identical results
    on a static snapshot (batch-parity-tested).

    Plan shape: one shuffle of each filtered side on user_id; the interval
    predicate is a post-join filter on the co-partitioned pair (Spark's
    stream-stream join uses exactly this key+range form to bound state).
    Timestamps compare natively (microsecond integers under the hood) — no
    second-truncating casts."""
    ev = t["events"]
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.round("value", 4).alias("purchase_value"),
    )
    return (
        views.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") < F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "user_id", "view_id", "purchase_id", "view_ts", "purchase_ts",
            "purchase_value",
        )
    )
