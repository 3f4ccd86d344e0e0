"""Per-query job/stage/task profiler (guide §1: measure first).

Runs each bench HEADLINE query once (same noop-sink methodology as
bench.py) under a unique job group, then reads the status tracker for the
job/stage/task counts — the cheap proxy for "how many actions and
shuffles does one invocation cost". High job count => driver-side eager
work (collects, store builds); high stage count => exchanges.

Usage: python tools/profile_bench.py [query ...]   (default: all HEADLINE)
Output: TSV  name  wall_sec  n_jobs  n_stages  n_tasks
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ai_optimizer_spark.registry import QUERIES  # noqa: E402
from ai_optimizer_spark.session import get_spark  # noqa: E402
from bench import HEADLINE, materialize  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ai_optimizer_spark-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1).count()

    import gc

    print("name\twall_sec\tn_jobs\tn_stages\tn_tasks")
    for name in names:
        q = QUERIES.get(name)
        if q is None:
            continue
        group = f"profile:{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        materialize(q(spark, sf_dir))
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(f"{name}\t{dt:.3f}\t{len(job_ids)}\t{n_stages}\t{n_tasks}", flush=True)
        spark.catalog.clearCache()
        gc.collect()


if __name__ == "__main__":
    main()
