"""NL2SQL validator + policy-view tests (the reference's safety surface:
SELECT-only token walk embed/utils.py:35-70, identifier fullmatch
database/sql.py:30, deepsec grants deepsec/database.py:379-423)."""

from __future__ import annotations

import pytest

from ai_optimizer_spark.operators.security import apply_policy
from ai_optimizer_spark.plans.nl2sql import (
    SQLValidationError,
    run_sql,
    schema_information,
    validate_identifier,
    validate_select_only,
)
from ai_optimizer_spark.tables import register_views

GOOD = [
    "SELECT 1",
    "select * from customer",
    "WITH x AS (SELECT 1 AS a) SELECT * FROM x",
    "SELECT 'insert into t' AS s",  # forbidden word inside a literal is fine
    "SELECT 1; ",  # single trailing semicolon ok
    "SELECT 1 -- drop table\n",  # forbidden word in comment is stripped
]

BAD = [
    "",
    "   ",
    "DROP TABLE customer",
    "INSERT INTO t VALUES (1)",
    "SELECT 1; DROP TABLE t",
    "WITH x AS (SELECT 1) DELETE FROM t",
    "UPDATE t SET a=1",
    "CREATE TABLE t AS SELECT 1",
    "SELECT * FROM t; SELECT * FROM u",
    "GRANT ALL ON t TO u",
]


@pytest.mark.parametrize("sql", GOOD)
def test_validator_accepts(sql):
    assert validate_select_only(sql) == sql


@pytest.mark.parametrize("sql", BAD)
def test_validator_rejects(sql):
    with pytest.raises(SQLValidationError):
        validate_select_only(sql)


def test_identifier_validation():
    assert validate_identifier("my_table_1") == "my_table_1"
    for bad in ("a;b", "a b", "a-b", "", "t'x"):
        with pytest.raises(SQLValidationError):
            validate_identifier(bad)


def test_run_sql_end_to_end(spark, sf_small):
    register_views(spark, sf_small)
    df = run_sql(spark, "SELECT COUNT(*) AS n FROM customer")
    assert df.collect()[0].n > 0
    with pytest.raises(SQLValidationError):
        run_sql(spark, "DELETE FROM customer")


def test_schema_information(spark, sf_small):
    register_views(spark, sf_small)
    info = schema_information(spark)
    tabs = {r.table_name for r in info.collect()}
    assert {"customer", "orders", "lineitem"} <= tabs


def test_policy_view_row_and_column(spark, sf_small):
    from ai_optimizer_spark.tables import load_tables

    t = load_tables(spark, sf_small)
    view = apply_policy(
        t["customer"],
        except_columns=["c_acctbal"],
        row_predicate="c_acctbal > 0",
    )
    assert "c_acctbal" not in view.columns
    assert view.count() < t["customer"].count()

    only = apply_policy(t["customer"], allowed_columns=["c_custkey", "c_name"])
    assert only.columns == ["c_custkey", "c_name"]


def test_generate_sql_consults_catalog_and_falls_back(spark, sf_small):
    from ai_optimizer_spark.plans.nl2sql import answer_question, generate_sql
    from ai_optimizer_spark.tables import register_views

    register_views(spark, sf_small)
    sql = generate_sql(spark, "what is the total revenue by nation")
    assert "n_name" in sql and sql.lstrip().upper().startswith("SELECT")
    # unknown question → safe fallback, still runnable
    fb = generate_sql(spark, "how about the weather")
    assert fb == "SELECT COUNT(*) AS n_rows FROM orders"
    assert answer_question(spark, "how about the weather").first().n_rows > 0
    # count-by-priority template
    assert "o_orderpriority" in generate_sql(spark, "count orders by priority")
