"""Temporal joins over the `events` table: as-of join and banded range join.

The reference has no as-of/range joins (SURVEY.md §2.3 note — its only range
flavor is timestamp-threshold predicates), but a training-data/event pipeline
at 100 TB needs them, so the engine supplies both as first-class operators
built to avoid the naive O(N·M) range explosion:

- **As-of join** = union + one window pass. Tag both sides, shuffle ONCE on
  the join key, and carry the most recent right-side row forward with
  `last(..., ignorenulls=True)`. No point-in-interval join, no per-row probe
  — cost is a single sort-shuffle on (key, ts), which is the floor for this
  operation. This is the standard big-data formulation (same shape Flink's
  temporal join and DuckDB's ASOF JOIN compute, but expressed as a Spark
  window so Catalyst handles partial sort + codegen).

- **Banded range join** = time-bucket equi-join. Each probe row is joined
  only against candidate rows in its own and the adjacent time bucket
  (bucket width = range width), then the exact range predicate filters
  within the band. Turns an inequality join (which Spark would execute as
  BroadcastNestedLoop) into an equi-join + filter that shuffles on
  (user, bucket) — linear, AQE-skew-safe, and broadcastable when one side
  is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..tables import epoch_us

RANGE_SECONDS = 600  # 10-minute look-ahead band


def _side(t: dict[str, DataFrame], event_type: str) -> DataFrame:
    return t["events"].filter(F.col("event_type") == event_type).select(
        "event_id", "user_id", "ts", "value"
    )


def asof_join_last_error(t: dict[str, DataFrame]) -> DataFrame:
    """For every click, the most recent error (same user, error.ts <= click.ts).

    Right side is first deduped to one row per (user, ts) — latest event_id
    wins — so the "greatest ts" pick is deterministic on ties. Then both
    sides union with a side tag; a single window partitioned by user and
    ordered by (ts, side, event_id) carries the last error struct onto each
    click row. Errors sort before clicks at equal ts (side 0 < 1), giving
    inclusive as-of semantics.
    """
    clicks = _side(t, "click")
    errors = _side(t, "error")

    w_tie = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    errors_d = (
        errors.withColumn("rn", F.row_number().over(w_tie))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    err_struct = F.struct(
        F.col("ts").alias("err_ts"), F.col("value").alias("err_value")
    )
    tagged = errors_d.select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("double").alias("click_value"),
        F.lit(0).alias("side"),
        err_struct.alias("err"),
    ).unionByName(
        clicks.select(
            "user_id",
            "ts",
            "event_id",
            F.col("value").alias("click_value"),
            F.lit(1).alias("side"),
            F.lit(None)
            .cast(f"struct<err_ts:{dict(clicks.dtypes)['ts']},err_value:double>")
            .alias("err"),
        )
    )

    w_carry = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("side"), F.asc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged.withColumn("last_err", F.last("err", ignorenulls=True).over(w_carry))
    return carried.filter(F.col("side") == 1).select(
        "user_id",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
        "click_value",
        F.col("last_err.err_ts").alias("last_error_ts"),
        F.col("last_err.err_value").alias("last_error_value"),
    )


def banded_range_join(t: dict[str, DataFrame]) -> DataFrame:
    """Per error event: count + value-sum of clicks by the same user in the
    following 10 minutes (error.ts < click.ts <= error.ts + 10 min).

    The error side explodes into its own and the next 10-minute bucket, the
    click side keys on its single bucket, and the join is a plain equi-join
    on (user_id, bucket) — the exact interval predicate then filters inside
    the band. Left join back onto all errors keeps zero-click rows.
    """
    # epoch-µs bucketing (ts is TIMESTAMP_NTZ — no direct long cast exists)
    bucket = lambda c: F.floor(epoch_us(c) / (RANGE_SECONDS * 1_000_000))  # noqa: E731
    errors = _side(t, "error")
    clicks = _side(t, "click")

    e_banded = errors.select(
        F.col("event_id").alias("e_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("e_ts"),
        F.explode(F.array(bucket("ts"), bucket("ts") + 1)).alias("bucket"),
    )
    c_keyed = clicks.select(
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("c_value"),
        bucket("ts").alias("bucket"),
    )
    in_band = (
        e_banded.join(
            c_keyed,
            (e_banded["e_user_id"] == c_keyed["c_user_id"])
            & (e_banded["bucket"] == c_keyed["bucket"]),
        )
        .filter(
            (F.col("c_ts") > F.col("e_ts"))
            & (F.col("c_ts") <= F.col("e_ts") + F.expr(f"INTERVAL {RANGE_SECONDS} SECONDS"))
        )
        .groupBy("e_event_id")
        .agg(
            F.count(F.lit(1)).alias("n_clicks_10m"),
            F.round(F.sum("c_value"), 4).alias("click_value_10m"),
        )
    )
    return (
        errors.join(in_band, errors["event_id"] == in_band["e_event_id"], "left")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.coalesce("n_clicks_10m", F.lit(0)).alias("n_clicks_10m"),
            F.round(F.coalesce("click_value_10m", F.lit(0.0)), 4).alias("click_value_10m"),
        )
    )
