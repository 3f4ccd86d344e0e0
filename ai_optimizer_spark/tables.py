"""Test-data table loading + view registration.

Mirrors the reference's catalog bootstrap (`src/server/app/database/
registry.py:29-77` discovers tables then registers them with the app); here
the "catalog" is the driver-provided parquet directory and registration is
`createOrReplaceTempView` so both the DataFrame API and `spark.sql`/NL2SQL
paths see the same relations.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def widen_scan(df: DataFrame, min_parts: int = 16) -> DataFrame:
    """Restore scan parallelism for single-row-group test files ahead of
    CPU-heavy map work (per-shingle hashing, chunk explosion).

    The driver's small-SF parquet has ONE row group per table, so the scan
    yields one partition and expensive map-side expressions run on one core
    out of 32. A real 100 TB table scans as thousands of row groups and
    needs no help — so this fires only when the scan is narrower than the
    target (the explicit partition count is exempt from AQE coalescing).
    Deliberately NOT applied wholesale in load_tables: for cheap scans the
    extra shuffle costs more than the parallelism buys.
    """
    if df.isStreaming:
        # .rdd is illegal on a streaming frame, and micro-batch sources
        # already split arrivals across tasks — widening is a batch-scan
        # concern only (st14 shares span_fingerprints with the batch ops)
        return df
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df


# DataFrame-handle memo, keyed per live session (weak: a stopped session's
# entries vanish with it) then per sf_dir. This is METADATA reuse, not
# result caching: each `spark.read.parquet` costs a driver-side footer
# read + a 1-task schema job, and the engine's query functions call
# load_tables per invocation — measured r11, a 125-query bench session
# paid ~10 such jobs per query (~0.3-0.8 s each call) re-deriving
# identical scan plans. The memoized DataFrame is an UNEXECUTED plan:
# every materialization still scans the parquet files; nothing about
# results or data is retained. A production session holds table handles
# in exactly this way (catalog/metastore lookup once per table).
_TABLE_MEMO: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = None  # type: ignore[assignment]


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver parquet table as a DataFrame.

    Plain `spark.read.parquet` — schema comes from parquet footers (no
    inference pass), filters/projections push down to the scan. Handles
    are memoized per (session, sf_dir); callers get a fresh shallow copy
    of the dict, so overwriting an entry (the sample_mod pattern) never
    leaks into other callers.
    """
    global _TABLE_MEMO
    if _TABLE_MEMO is None:
        import weakref

        _TABLE_MEMO = weakref.WeakKeyDictionary()
    per_session = _TABLE_MEMO.setdefault(spark, {})
    key = os.path.abspath(sf_dir)
    tables = per_session.get(key)
    if tables is None:
        tables = {
            name: spark.read.parquet(f"{sf_dir}/{name}.parquet")
            for name in TABLE_NAMES
        }
        tables["events"] = normalize_event_ts(tables["events"])
        per_session[key] = tables
    return dict(tables)


def normalize_event_ts(ev: DataFrame) -> DataFrame:
    """Pin `events.ts` to TIMESTAMP_NTZ regardless of session config.

    The driver parquet stores ts as TIMESTAMP(NANOS); Spark 4 reads that as
    TIMESTAMP_NTZ (µs-truncated), a `nanosAsLong` session reads it as bigint,
    and hand-built test fixtures may carry a tz-aware TIMESTAMP. All engine
    timestamp arithmetic (epoch math, window bucketing, struct casts) assumes
    ONE type, so every flavor converges here. ns→µs uses integer division —
    a double round-trip would lose precision (2024 epoch-ns overflows the
    53-bit mantissa) — and tz-aware casts are deterministic under the UTC
    session default.
    """
    ts_type = dict(ev.dtypes).get("ts")
    if ts_type == "bigint":
        ev = ev.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    elif ts_type == "timestamp":
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return ev


def epoch_us(col: str | F.Column) -> F.Column:
    """Microseconds since epoch for a TIMESTAMP_NTZ column.

    `unix_micros` only accepts tz-aware TIMESTAMP, so NTZ epoch math goes
    through `timestamp_diff` against the NTZ epoch literal — pure integer
    arithmetic, no tz shift, bit-identical to DuckDB's `epoch_us`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_diff(
        "MICROSECOND",
        F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
        c.cast("timestamp_ntz"),
    )


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (the NL2SQL surface)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
