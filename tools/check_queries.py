"""Strict 3-scale oracle check for named queries (the r8 pre-promotion
procedure, runnable standalone): exact multiset equality vs DuckDB at
sf0.001 / sf0.01 / sf0.1.

Usage: python tools/check_queries.py <query> [<query> ...]
Exit 0 iff every (query, scale) pair matches.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from ai_optimizer_spark.registry import ORACLE_SQL, QUERIES  # noqa: E402
from ai_optimizer_spark.session import get_spark  # noqa: E402
from oracle_compare import duckdb_con, strict_compare  # noqa: E402

SCALES = ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    spark = get_spark("ai_optimizer_spark-check")
    spark.sparkContext.setLogLevel("ERROR")
    bad = []
    for sf in SCALES:
        con = duckdb_con(sf)
        for name in names:
            df = QUERIES[name](spark, sf)
            if name not in ORACLE_SQL:
                print(f"{sf} {name}: rows-only ({df.count()} rows)")
                continue
            ok, msg = strict_compare(df, con, ORACLE_SQL[name])
            print(f"{sf} {name}: {'OK' if ok else 'MISMATCH ' + msg}", flush=True)
            if not ok:
                bad.append((sf, name))
        spark.catalog.clearCache()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
