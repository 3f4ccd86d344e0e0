"""Sustained-rate streaming measurement (VERDICT r7 task 5).

The st* twins are correctness-complete (shared batch oracles, late-data
and replay tests); what SCALE.md lacked was a SUSTAINED-throughput row:
does per-batch cost stay flat when the stream runs for dozens of
consecutive micro-batches, or does state / listener / file-log growth
creep in?

Two always-on daemons, each driven with WAVES (default 25) back-to-back
micro-batches of fresh input files against a LONG-LIVED query (one
.start(), files dropped into the source directory, per-batch timings from
StreamingQuery.recentProgress — not per-wave availableNow restarts, which
would re-pay query startup every wave and measure the wrong thing):

  st19 — SQ8 ingest + per-cell quantization-health aggregate. Streaming
         state = k cells, bounded forever; the probe asserts state rows
         stay constant and per-batch duration stays flat.
  st21 — kNN query serving over the quantized clustered store
         (quantized_knn_serve per micro-batch via foreachBatch). No
         streaming state at all; the probe asserts per-batch serve time
         stays flat.

Each wave is one parquet file of the sf0.1 embeddings table (2,000
vectors) with wave-shifted ids — 25 waves = 50k vectors ingested /
25 query waves of 20 queries served. Flatness gate: median of the last 5
batch durations ≤ 1.5× median of batches 2-6 (batch 1 excluded: it pays
JIT + codegen warmup).

Run solo: python tools/streaming_sustain_probe.py  (~3-5 min).
Results go to SCALE.md ("sustained streaming" rows).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ai_optimizer_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/stream_sustain"
WAVES = int(os.environ.get("WAVES", "25"))
N_CENTROIDS = 16


def _median(xs: list[float]) -> float:
    xs = sorted(xs)
    return xs[len(xs) // 2] if xs else 0.0


def _wait_for_batches(q, want: int, timeout: float = 300.0) -> list:
    """Poll recentProgress until `want` batches with input rows committed."""
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout:
        done = [p for p in q.recentProgress if p["numInputRows"] > 0]
        if len(done) >= want:
            return done
        time.sleep(0.2)
    raise TimeoutError(f"only {len(done)} of {want} batches after {timeout}s")


def _emit_waves(spark, src_dir: str, q, base_df, n_waves: int) -> list:
    """Drop one wave file at a time, waiting for the stream to commit the
    previous wave first — so every wave is its own micro-batch."""
    n = base_df.count()
    for w in range(n_waves):
        wave = base_df.select(
            (F.col("vec_id") + F.lit(w * n)).alias("vec_id"),
            "embedding",
            "label",
        )
        wave.coalesce(1).write.mode("overwrite").parquet(f"{WORK}/_stage")
        part = [
            f for f in os.listdir(f"{WORK}/_stage") if f.endswith(".parquet")
        ][0]
        shutil.copy(f"{WORK}/_stage/{part}", f"{src_dir}/wave_{w:03d}.parquet")
        _wait_for_batches(q, w + 1)
    return _wait_for_batches(q, n_waves)


def _flatness(progress: list) -> dict:
    durs = [p["durationMs"]["triggerExecution"] / 1000.0 for p in progress]
    rows = [p["numInputRows"] for p in progress]
    warm = _median(durs[1:6])
    tail = _median(durs[-5:])
    return {
        "batches": len(durs),
        "rows_total": int(sum(rows)),
        "batch_sec_first": round(durs[0], 2),
        "batch_sec_warm_median": round(warm, 2),
        "batch_sec_tail_median": round(tail, 2),
        "tail_over_warm": round(tail / warm, 2) if warm else None,
        "rows_per_sec_steady": round(sum(rows[1:]) / max(sum(durs[1:]), 1e-9)),
    }


def probe_st19(spark) -> dict:
    """Sustained SQ8 ingest: one long-lived aggregating stream, k-row
    state, waves of 2k vectors each."""
    from ai_optimizer_spark.operators.similarity import sq8_cell_stats

    src_dir = f"{WORK}/st19_src"
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir)
    static = spark.read.parquet(f"{BASE}/embeddings.parquet")
    cents = static.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    stream = spark.readStream.schema(static.schema).parquet(src_dir)
    plan = sq8_cell_stats(stream, cents)
    q = (
        plan.writeStream.format("memory")
        .queryName("sustain_st19")
        .outputMode("complete")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        progress = _emit_waves(spark, src_dir, q, static, WAVES)
        res = _flatness(progress)
        # bounded state: the per-cell aggregate must hold exactly k rows
        state_rows = [
            p["stateOperators"][0]["numRowsTotal"]
            for p in progress
            if p.get("stateOperators")
        ]
        res["state_rows_max"] = max(state_rows) if state_rows else None
        res["state_bounded"] = bool(state_rows) and max(state_rows) <= N_CENTROIDS
        res["out_cells"] = spark.table("sustain_st19").count()
    finally:
        q.stop()
    return res


def probe_st21(spark) -> dict:
    """Sustained kNN serving: long-lived store + centroid model, waves of
    20 queries each served by the shared v26 tail via foreachBatch."""
    from ai_optimizer_spark.plans.bucketing import (
        ensure_sq8_clustered_store,
        quantized_knn_serve,
    )

    name = ensure_sq8_clustered_store(spark, BASE, N_CENTROIDS)
    store = (
        spark.table(name)
        .withColumn("cid", F.col("cid").cast("long"))
        .withColumn("codes", F.col("codes").cast("array<double>"))
    )
    static = spark.read.parquet(f"{BASE}/embeddings.parquet")
    cents = static.filter(F.col("vec_id") < N_CENTROIDS).select(
        F.col("vec_id").alias("ccid"), F.col("embedding").alias("ce")
    )

    src_dir = f"{WORK}/st21_src"
    shutil.rmtree(src_dir, ignore_errors=True)
    os.makedirs(src_dir)
    stream = (
        spark.readStream.schema(static.schema)
        .parquet(src_dir)
        .filter(F.col("vec_id") % 100 < 1)  # 20 of each 2k wave
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
    )
    served: list = []

    def _serve(batch_df, _bid):
        if batch_df.isEmpty():
            return
        served.extend(
            quantized_knn_serve(store, cents, batch_df, 3, 4).collect()
        )

    q = (
        stream.writeStream.foreachBatch(_serve)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        progress = _emit_waves(spark, src_dir, q, static, WAVES)
        res = _flatness(progress)
        res["served_rows"] = len(served)
    finally:
        q.stop()
    return res


def main() -> None:
    spark = get_spark("stream-sustain")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    os.makedirs(WORK, exist_ok=True)

    out = {"waves": WAVES, "base": BASE}
    t0 = time.monotonic()
    out["st19"] = probe_st19(spark)
    print(f"st19 done in {time.monotonic()-t0:.0f}s: "
          f"{json.dumps(out['st19'])}", flush=True)
    t0 = time.monotonic()
    out["st21"] = probe_st21(spark)
    print(f"st21 done in {time.monotonic()-t0:.0f}s: "
          f"{json.dumps(out['st21'])}", flush=True)

    assert out["st19"]["state_bounded"], out["st19"]
    for key in ("st19", "st21"):
        r = out[key]["tail_over_warm"]
        assert r is not None and r <= 1.5, (key, out[key])
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
