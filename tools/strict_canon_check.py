"""Strict driver-canon replica: pandas sort_values + dtype-sensitive
value hash (str() of each cell, so int64 32 vs float64 32.0 MISMATCH,
and list columns CRASH — exactly the external driver's behavior).

Usage: ONLY="mm2_frame_features,..." python strict_canon_check.py
"""
import hashlib
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

SF = os.environ.get("SF_CHECK", "/root/testdata/sf0.01")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "24")
ONLY = [s for s in os.environ.get("ONLY", "").split(",") if s]
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    lines = ["|".join(str(v) for v in row) for row in df.itertuples(index=False)]
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

    qs = E.queries()
    oracles = E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    names = ONLY or list(qs)
    bad = []
    t0 = time.time()
    for i, name in enumerate(names):
        if name not in oracles:
            print(f"[{i+1}/{len(names)}] {name}: rows-only, skipped")
            continue
        try:
            spdf = qs[name](spark, SF).toPandas()
            opdf = con.execute(oracles[name]).df()
            ok_rows = len(spdf) == len(opdf)
            ok_schema = sorted(spdf.columns) == sorted(opdf.columns)
            ok_hash = ok_schema and canon(spdf) == canon(opdf)
        except Exception as ex:
            bad.append((name, f"ERR {type(ex).__name__}: {str(ex)[:300]}"))
            print(f"[{i+1}/{len(names)}] {name}: ERR {str(ex)[:200]}")
            continue
        if ok_rows and ok_schema and ok_hash:
            print(f"[{i+1}/{len(names)}] {name}: OK ({len(spdf)} rows)")
        else:
            bad.append((name, f"rows={ok_rows} schema={ok_schema} hash={ok_hash}"))
            print(f"[{i+1}/{len(names)}] {name}: MISMATCH rows={ok_rows} "
                  f"schema={ok_schema} hash={ok_hash} "
                  f"sdtypes={dict(spdf.dtypes.astype(str))} "
                  f"odtypes={dict(opdf.dtypes.astype(str))}")

    print(f"\n{len(bad)} strict mismatches in {time.time()-t0:.0f}s at {SF}")
    for n, m in bad:
        print(" -", n, m)
    sys.exit(1 if bad else 0)


main()
