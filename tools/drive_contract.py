"""Standalone driver-contract simulator: imports ONLY __spark_entry__.

entry(spark) smoke at sf0.001, then every queries()[name] at SF_CHECK
(default sf0.01) compared to oracle_sql()[name] in DuckDB via
order-insensitive value hash (columns sorted by name, floats %.9g).
Exit 0 iff no mismatches/errors.
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
from pyspark.sql import SparkSession

SF = os.environ.get("SF_CHECK", "/root/testdata/sf0.01")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "24")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm(v):
    import datetime
    import math
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return "%.9g" % v
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def value_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm(r[i]) for i in order) for r in rows)
    return hashlib.md5("\n".join(lines).encode()).hexdigest()


def main():
    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1. entry smoke (twice — idempotence)
    for i in range(2):
        df = E.entry(spark)
        n = len(df.collect())
        print(f"entry() pass {i}: {n} rows, schema={[f.name for f in df.schema]}")

    qs = E.queries()
    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    bad = []
    t0 = time.time()
    for i, (name, fn) in enumerate(qs.items()):
        try:
            sdf = fn(spark, SF)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            bad.append((name, f"spark error: {ex}"))
            print(f"[{i+1}/{len(qs)}] {name}: SPARK ERROR {str(ex)[:200]}")
            continue
        if name not in oracles:
            print(f"[{i+1}/{len(qs)}] {name}: rows-only ({len(s_rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as ex:
            bad.append((name, f"oracle error: {ex}"))
            print(f"[{i+1}/{len(qs)}] {name}: ORACLE ERROR {str(ex)[:200]}")
            continue
        ok_rows = len(s_rows) == len(d_rows)
        ok_schema = sorted(s_cols) == sorted(d_cols)
        ok_hash = ok_schema and value_hash(s_cols, s_rows) == value_hash(d_cols, d_rows)
        status = "OK" if (ok_rows and ok_schema and ok_hash) else "MISMATCH"
        if status != "OK":
            bad.append((name, f"rows={ok_rows} schema={ok_schema} hash={ok_hash} "
                              f"spark={len(s_rows)} oracle={len(d_rows)}"))
        print(f"[{i+1}/{len(qs)}] {name}: {status}")

    print(f"\n{len(bad)} mismatches in {time.time()-t0:.0f}s at {SF}")
    for n, m in bad:
        print(" -", n, m)
    sys.exit(1 if bad else 0)


main()
