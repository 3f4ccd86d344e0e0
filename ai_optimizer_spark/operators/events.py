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


FUNNEL_STEPS = ("view", "click", "signup", "purchase")


def funnel_steps(t: dict[str, DataFrame]) -> DataFrame:
    """ST11: ordered funnel analysis — of the users who ever did step 1,
    how many went on to do step 2 strictly later, then step 3 after that,
    etc. (view → click → signup → purchase). The sequential dependency
    (each step's timestamp must exceed the user's PREVIOUS step timestamp)
    is what distinguishes a funnel from four independent counts.

    Spark shape: step k is a per-user min-aggregate of step-k events later
    than the step-(k-1) timestamp — a chain of filters + groupBys whose
    every exchange keys user_id and whose input shrinks monotonically
    (step k's events ⋈ step k-1's survivors). The final conversion
    table is 4 rows through a trivial window. At 100 TB the event scan is
    type-pruned per step and nothing besides (user_id, ts) ever shuffles."""
    ev = t["events"].select("user_id", "event_type", "ts")
    prev = (
        ev.filter(F.col("event_type") == FUNNEL_STEPS[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("step_ts"))
    )
    counts = [prev.select(F.count(F.lit(1)).alias("n_users")).withColumn(
        "step", F.lit(f"1_{FUNNEL_STEPS[0]}")
    )]
    for i, etype in enumerate(FUNNEL_STEPS[1:], start=2):
        nxt = (
            ev.filter(F.col("event_type") == etype)
            .join(prev.select("user_id", F.col("step_ts").alias("prev_ts")), "user_id")
            .filter(F.col("ts") > F.col("prev_ts"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("step_ts"))
        )
        counts.append(
            nxt.select(F.count(F.lit(1)).alias("n_users")).withColumn(
                "step", F.lit(f"{i}_{etype}")
            )
        )
        prev = nxt
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    w = Window.orderBy("step")
    first = F.first("n_users").over(
        Window.orderBy("step").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_n = F.lag("n_users", 1, None).over(w)
    return out.select(
        "step",
        "n_users",
        F.round(F.col("n_users") / first, 4).alias("pct_of_first"),
        F.round(F.col("n_users") / F.coalesce(prev_n, F.col("n_users")), 4).alias(
            "pct_of_prev"
        ),
    )


def cohort_retention(t: dict[str, DataFrame], max_weeks: int = 8) -> DataFrame:
    """A22: cohort retention triangle — users grouped by signup week
    (cohort = week of their FIRST signup event), tracked by how many were
    active again N weeks later. The companion report to the funnel: the
    funnel measures conversion depth, retention measures durability.

    Spark shape: cohort assignment is one per-user min-aggregate; activity
    is a (user, week) distinct; their join keys user_id, and the output
    collapses to at most |cohorts| × max_weeks cells. Every exchange
    carries only (user_id, week) pairs — at 100 TB nothing else moves."""
    ev = t["events"].select("user_id", "event_type", "ts")
    cohorts = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    weeks_between = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("int")
    return (
        activity.join(cohorts, "user_id")
        .select("user_id", "cohort_week", weeks_between.alias("week_offset"))
        .filter((F.col("week_offset") >= 0) & (F.col("week_offset") < max_weeks))
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
        .orderBy("cohort_week", "week_offset")
    )


def scd2_state_history(t: dict[str, DataFrame]) -> DataFrame:
    """T8: slowly-changing-dimension (type 2) history construction — turn a
    mutation log into validity intervals: per user, consecutive runs of
    the same state (event_type here) collapse into one row with
    [valid_from, valid_to) and a version number; the current state has
    valid_to = NULL. The warehouse-side complement of J4's diff join: J4
    detects what changed now, SCD2 records every state the dimension ever
    had — the reference's refresh pipeline overwrites in place
    (embed/refresh.py), so this is the history it discards.

    Spark shape: one shuffle on user_id feeds both window passes (change
    flag via lag, version via running sum) and the per-version aggregate;
    valid_to comes from one more lead over the (tiny) per-version rows.
    The mutation log never re-shuffles."""
    ev = t["events"].select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    flagged = ev.withColumn(
        "chg",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        ).otherwise(0),
    )
    versioned = flagged.withColumn(
        "version",
        F.sum("chg").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    runs = versioned.groupBy("user_id", "version").agg(
        F.first("event_type").alias("state"),
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    wv = Window.partitionBy("user_id").orderBy("version")
    return runs.select(
        "user_id",
        F.col("version").cast("long").alias("version"),
        "state",
        "valid_from",
        F.lead("valid_from").over(wv).alias("valid_to"),
        "n_events",
    )
