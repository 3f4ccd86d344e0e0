"""Dump .explain('formatted') for registry queries to plans/$SPARK_GRAFT_PLAN_ROUND/
(default r11).

Usage:
    python tools/explain_dump.py <suffix> <query> [<query> ...]

Writes plans/<round>/<query>_<suffix>.txt for each query (suffix = before/after).
Building the DataFrame runs any eager harness side effects (store builds),
but the plan itself is not executed. SPARK_GRAFT_SF_DIR picks the scale
(default sf0.1 — the bench scale, so plans match the bench's shapes).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_optimizer_spark.registry import QUERIES  # noqa: E402
from ai_optimizer_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r11"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("ai_optimizer_spark-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
