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
    if df.rdd.getNumPartitions() < min_parts:
        return df.repartition(min_parts)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every driver parquet table as a DataFrame.

    Plain `spark.read.parquet` — schema comes from parquet footers (no
    inference pass), filters/projections push down to the scan.
    """
    tables = {name: spark.read.parquet(f"{sf_dir}/{name}.parquet") for name in TABLE_NAMES}
    # events.ts is TIMESTAMP(NANOS) in the driver parquet; Spark reads it as
    # long (nanosAsLong). Truncate ns→µs exactly like DuckDB's TIMESTAMP cast
    # (integer division, no double round-trip — 2024 epoch-ns overflows the
    # 53-bit double mantissa). Known cost: predicates on the derived ts can't
    # push into the scan (the filter sits above timestamp_micros()); a real
    # deployment stores µs timestamps and gets pushdown for free.
    ev = tables["events"]
    if dict(ev.dtypes).get("ts") == "bigint":
        tables["events"] = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return tables


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view (the NL2SQL surface)."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
