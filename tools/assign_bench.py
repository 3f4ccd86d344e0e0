"""Micro-bench + diagnosis harness for the coarse-quantizer assignment tiers
(VERDICT r5 task 1): flat inlined-literal argmin (`_assign_cells`), the
two-level hierarchical form (`_assign_cells_hier`), and the Arrow/numpy
tier (`_assign_cells_np`) at corpus-scaled k.

Context: at the 64x tile (320k vectors) auto-k is 640; a prior-session
solo micro-bench of the FLAT form timed out at 10 min while the identical
assignment inside d20's probe ran in 32 s — suspected Janino codegen
blow-up / interpreted-HOF fallback for the 640-struct literal in some
session states. This script reproduces the case under a hard per-run
timeout, prints plan/codegen diagnostics, and times every tier in its own
fresh JVM so session state cannot leak between measurements.

Usage:
    python tools/assign_bench.py               # all tiers at x64/auto-k
    TIERS=flat,hier,np K=640 TILE=/tmp/scale_probe/x64 TIMEOUT=600 \
        python tools/assign_bench.py
Run solo (bench discipline — see the verify skill).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

TILE = os.environ.get("TILE", "/tmp/scale_probe/x64")
K = int(os.environ.get("K", "0"))  # 0 = auto (choose_semdedup_k)
TIMEOUT = int(os.environ.get("TIMEOUT", "600"))
TIERS = [t for t in os.environ.get("TIERS", "flat,hier,np").split(",") if t]

_CHILD = r"""
import os, sys, time
tier = sys.argv[1]
tile = sys.argv[2]
k = int(sys.argv[3])
t_start = time.perf_counter()
from ai_optimizer_spark.session import get_spark
from ai_optimizer_spark.operators.similarity import (
    _assign_cells, _assign_cells_hier, _assign_cells_np,
)
from pyspark.sql import functions as F
spark = get_spark(f"assign-bench-{tier}")
spark.sparkContext.setLogLevel("WARN")
spark.range(1).count()
t_jvm = time.perf_counter()
emb = spark.read.parquet(f"{tile}/embeddings.parquet")
if k == 0:
    from ai_optimizer_spark.operators.dedup import choose_semdedup_k
    k = choose_semdedup_k(emb.count())
cents = emb.filter(F.col("vec_id") < k).select(
    F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
)
rows = cents.collect()
t_model = time.perf_counter()
if tier == "flat":
    assigned = _assign_cells(emb, cents, rows=rows)
elif tier == "hier":
    import math
    gs = max(1, round(math.sqrt(k)))
    assigned = _assign_cells_hier(emb, rows, group_size=gs, g_probe=2)
elif tier == "np":
    assigned = _assign_cells_np(emb, cents, rows=rows)
else:
    raise SystemExit(f"unknown tier {tier}")
# count() not write: we time the assignment projection itself, and the
# digest-only count avoids timing a parquet write of the embedding column
n = assigned.groupBy("cid").count().count()
t_done = time.perf_counter()
print("CHILD_RESULT " + __import__("json").dumps({
    "tier": tier, "k": k, "n_cells_used": n,
    "jvm_sec": round(t_jvm - t_start, 2),
    "model_sec": round(t_model - t_jvm, 2),
    "assign_sec": round(t_done - t_model, 2),
}), flush=True)
"""


def run_tier(tier: str) -> dict:
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", _CHILD, tier, TILE, str(K)],
            capture_output=True,
            text=True,
            timeout=TIMEOUT,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    except subprocess.TimeoutExpired:
        return {"tier": tier, "timeout_sec": TIMEOUT, "status": "TIMEOUT"}
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_RESULT "):
            out = json.loads(line[len("CHILD_RESULT "):])
            out["status"] = "ok"
            out["wall_sec"] = round(time.perf_counter() - t0, 2)
            return out
    return {
        "tier": tier,
        "status": f"exit={proc.returncode}",
        "stderr_tail": proc.stderr[-2000:],
    }


def main() -> None:
    results = [run_tier(t) for t in TIERS]
    for r in results:
        print(json.dumps(r), flush=True)


if __name__ == "__main__":
    main()
