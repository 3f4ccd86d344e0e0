"""Driver-cost breakdown per query (guide §1, §7.3): splits one invocation
into BUILD (Python DataFrame construction incl. py4j/expr parse and any
eager collects inside the operator), PLAN (analysis + optimization +
physical planning, forced via queryExecution().executedPlan()), and EXEC
(noop-sink materialization of the already-planned frame). min-of-N each.

The r10 v17 finding came from this split: a query whose BUILD+PLAN
dominates is driver-bound (expression-tree size, py4j chatter, eager
collects), and no executor-side optimization will move it.

Usage: python tools/breakdown_probe.py q1 [q2 ...]
Output: TSV  name  build_sec  plan_sec  exec_sec  total_sec
"""

from __future__ import annotations

import gc
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_optimizer_spark.registry import QUERIES  # noqa: E402
from ai_optimizer_spark.session import get_spark  # noqa: E402
from bench import N_PASSES, materialize  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ai_optimizer_spark-breakdown")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    print("name\tbuild_sec\tplan_sec\texec_sec\ttotal_sec")
    for name in names:
        q = QUERIES.get(name)
        if q is None:
            print(f"{name}\t<unknown>", flush=True)
            continue
        best = None
        for _ in range(N_PASSES):
            t0 = time.perf_counter()
            df = q(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            materialize(df)
            t3 = time.perf_counter()
            cur = (t1 - t0, t2 - t1, t3 - t2, t3 - t0)
            best = cur if best is None or cur[3] < best[3] else best
            spark.catalog.clearCache()
            gc.collect()
        b, p, e, tot = best
        print(f"{name}\t{b:.3f}\t{p:.3f}\t{e:.3f}\t{tot:.3f}", flush=True)


if __name__ == "__main__":
    main()
