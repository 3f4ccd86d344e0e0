"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash). Implementation lives in ``ai_optimizer_spark``; this module is
just the wiring.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ai_optimizer_spark.operators.relational import customer_standings  # noqa: E402
from ai_optimizer_spark.registry import ORACLE_SQL, QUERIES  # noqa: E402
from ai_optimizer_spark.session import ensure_package_shipped  # noqa: E402
from ai_optimizer_spark.tables import load_tables  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: customer standings — the
    reference's driver-standings NL2SQL shape (multi-join + grouped/
    conditional aggregation + ranking; docs/demo/racing-championship/
    schema.sql:669-699) over customer ⋈ orders ⋈ lineitem."""
    ensure_package_shipped(spark)
    tables = load_tables(spark, "/root/testdata/sf0.001")
    return customer_standings(tables)


def _wrap(fn: Callable[[SparkSession, str], DataFrame]):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        # Pandas-UDF queries reference this package on workers; ship it so
        # the contract works regardless of the harness's cwd / PYTHONPATH.
        ensure_package_shipped(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted => rows-only check)."""
    return dict(ORACLE_SQL)
