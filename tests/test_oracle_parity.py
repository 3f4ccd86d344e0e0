"""End-to-end parity gate: every registered (query, oracle) pair must agree
with DuckDB at sf0.01 — the same check the driver runs, but stricter (exact
multiset equality, not just hash)."""

from __future__ import annotations

import pytest

from ai_optimizer_spark.registry import ORACLE_SQL, QUERIES

from .oracle_compare import compare, duckdb_con

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, spark, con):
    df = QUERIES[name](spark, SF_DIR)
    ok, msg = compare(df, con, ORACLE_SQL[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE_SQL)))
def test_rows_only_queries_run(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
