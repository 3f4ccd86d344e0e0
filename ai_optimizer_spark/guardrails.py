"""Result-size governance — SURVEY.md §4-O12.

The reference caps driver-side materialization at 100,000 rows and raises
instead of silently truncating (database/sql.py:17-24,91-106). Distributed
execution makes the cap unnecessary for engine-internal work (results stay
on executors), but any API that `collect()`s to the driver keeps the same
contract: error loudly, never truncate silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MAX_COLLECT_ROWS = 100_000


class ResultSetTooLargeError(RuntimeError):
    def __init__(self, at_least: int, cap: int):
        super().__init__(
            f"result exceeds the {cap}-row driver materialization cap "
            f"(≥{at_least} rows); add a filter/limit or write to a sink instead"
        )
        self.at_least = at_least
        self.cap = cap


def collect_capped(df: DataFrame, cap: int = MAX_COLLECT_ROWS) -> list:
    """collect() with the reference's cap semantics: fetch cap+1 via limit
    (one extra row, not the full result) and raise if the cap is exceeded.
    The limit pushes down, so an oversized result costs O(cap), not O(N)."""
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ResultSetTooLargeError(len(rows), cap)
    return rows
