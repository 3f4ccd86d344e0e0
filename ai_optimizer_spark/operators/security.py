"""Row/column-level security as policy views — SURVEY.md §2.2 P6/P7.

The reference's Deep Data Security issues `CREATE DATA GRANT ... WHERE
<predicate>` row filters and per-column grant lists / `ALL COLUMNS EXCEPT`
(deepsec/database.py:379-423, :396-409). In Spark the same governance is a
policy view: a row predicate + a pruned projection compiled over the base
relation — Catalyst pushes both into the scan, so enforcement is free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.nl2sql import validate_identifier


def apply_policy(
    df: DataFrame,
    allowed_columns: list[str] | None = None,
    except_columns: list[str] | None = None,
    row_predicate: str | None = None,
) -> DataFrame:
    """Build a policy view: column grant list (or ALL COLUMNS EXCEPT) plus an
    optional row predicate. Identifiers are validated like the reference
    validates grant targets (deepsec/database.py:52-77 `\\w+` fullmatch)."""
    out = df
    # row predicate first — it may reference columns the grant hides
    if row_predicate is not None:
        out = out.filter(F.expr(row_predicate))
    cols = df.columns
    if allowed_columns is not None:
        for c in allowed_columns:
            validate_identifier(c)
        cols = [c for c in cols if c in set(allowed_columns)]
    if except_columns is not None:
        for c in except_columns:
            validate_identifier(c)
        cols = [c for c in cols if c not in set(except_columns)]
    return out.select(*cols)


def customer_policy_view(t: dict[str, DataFrame]) -> DataFrame:
    """P6+P7 demo policy: the grantee sees only building-segment customers
    in credit (row grant) and never the account balance (column except)."""
    return apply_policy(
        t["customer"],
        except_columns=["c_acctbal"],
        row_predicate="c_acctbal > 0 AND c_mktsegment = 'BUILDING'",
    )
