"""Skewed-corpus stress for the dedup/LSH shuffles (VERDICT r8 task 5).

scale_probe's tiles keep near-dup density and source balance constant as
the corpus grows; a real crawl does not — one domain routinely owns half
the pages and boilerplate forms a single giant near-dup block. This probe
builds a 16x tile (80k docs) where

  * ONE source ("megasrc") owns 50% of the corpus (doc_id % 2 == 0), and
  * ONE boilerplate near-dup block covers 10% of the corpus
    (doc_id % 10 == 0: a fixed ~60-word boilerplate plus a tiny per-doc
    variant suffix, so the block is near- but not exact-duplicate — the
    LSH band path, not the exact-hash path, must absorb it),

then times the capped dedup operators (d3c, d17, d22) and the cascade
(e2e_dedup_cascade) against it, and reports the STRAGGLER SIGNATURE per
stage — max task duration vs median — parsed from the Spark event log
(jobs are attributed to queries via spark.jobGroup.id). A worst-stage
ratio ≫ 4x with a large absolute max means one band bucket / one hot key
is serializing the stage and the op needs salting or cap escalation.

Run solo: python tools/skew_probe.py (~5-10 min). Results go to SCALE.md
("skewed-corpus stress" row).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/skew_probe"
EVDIR = f"{WORK}/eventlog"
FACTOR = int(os.environ.get("FACTOR", "16"))
# d22 (cap-recall sweep) is NOT probed here: its exact-truth rider is an
# uncapped all-pairs self-join by design, and the 8,000-doc boilerplate
# block is a single LSH bucket of 32M truth pairs — measured: OOMs the
# 8g JVM (r9). That is the strongest measured argument for the sampled
# baseline: d21b's deterministic mod-m pair universe is the form that
# survives a skewed corpus, so IT is probed instead.
OPS = [
    "d3c_minhash_lsh_capped",
    "d17_corpus_dup_profile",
    "d21b_lsh_recall_sampled",
    "e2e_dedup_cascade",
    # r10 extension (verdict r9 task 3): the remaining pair-enumerating
    # joins under the same event-log max/median gate — d4's simhash
    # pigeonhole blocks (the 10% boilerplate block collapses to near-one
    # simhash, the worst case for banded equality), d25's winnowing
    # fingerprint pairs, the cell-bounded cosine family (d18/d20 — a hot
    # IVF cell is the bucket-skew analog on the vector side), and a28's
    # KMV overlap matrix with its exact-Jaccard harness rider.
    "d4_simhash_pairs",
    "d25_winnow_pairs",
    "d18_semdedup",
    "d20_semantic_decontamination",
    "a28_kmv_source_overlap",
]


def get_spark() -> SparkSession:
    os.makedirs(EVDIR, exist_ok=True)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("skew-probe")
        # 24g + 64 shuffle partitions: the salted grid join runs 32
        # CONCURRENT heavy tasks where the unsalted straggler ran one —
        # one 8g heap / 32 local threads = 250MB/task, far below what a
        # real cluster gives an executor core (2-4g). The unsalted plan
        # only "fit" 8g by accident: its single hot task owned the heap
        # while 31 threads idled. Sizing rule (the spill-aware bullet):
        # per-task buffers must fit heap/cores.
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.eventLog.enabled", "true")
        .config("spark.eventLog.dir", EVDIR)
        .getOrCreate()
    )


def build_skewed_tile(spark) -> str:
    """The scale_probe 16x tile with the source column and 10% of texts
    rewritten into the skew shape. Everything but documents symlinks to
    the balanced tile, so the vector-side operators see identical data."""
    import scale_probe as SP

    balanced = SP.build_tile(spark, FACTOR)
    out = f"{WORK}/x{FACTOR}"
    doc_path = f"{out}/documents.parquet"
    if not os.path.isdir(doc_path):
        os.makedirs(out, exist_ok=True)
        docs = spark.read.parquet(f"{balanced}/documents.parquet")
        # boilerplate: the first ~60 words of the base corpus's doc 0 —
        # realistic token distribution, deterministic across runs
        base0 = (
            spark.read.parquet(f"{BASE}/documents.parquet")
            .filter(F.col("doc_id") == 0)
            .collect()[0]
            .text
        )
        boiler = " ".join(base0.split()[:60])
        is_block = F.col("doc_id") % 10 == 0
        text = F.when(
            is_block,
            F.concat(
                F.lit(boiler),
                F.lit(" variant "),
                (F.col("doc_id") % 7).cast("string"),
            ),
        ).otherwise(F.col("text"))
        skewed = docs.select(
            "doc_id",
            text.alias("text"),
            "lang",
            F.when(F.col("doc_id") % 2 == 0, F.lit("megasrc"))
            .otherwise(F.col("source"))
            .alias("source"),
        ).withColumn("n_chars", F.length("text").cast("long"))
        skewed.repartition(32).write.mode("overwrite").parquet(doc_path)
    for t in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{balanced}/{t}.parquet", dst)
    return out


def _event_files() -> list[str]:
    """Event-log files under EVDIR — Spark 4 writes a rolling DIRECTORY
    per application (eventlog_v2_<app>/events_*); handle both layouts."""
    out = []
    for name in os.listdir(EVDIR):
        full = os.path.join(EVDIR, name)
        if os.path.isdir(full):
            out.extend(
                os.path.join(full, f)
                for f in os.listdir(full)
                if f.startswith("events_")
            )
        else:
            out.append(full)
    return out


def _open_events(fname: str):
    """Spark compresses rolling event logs with zstd by default; no
    python zstd binding is in this environment, so shell out to the
    zstd CLI (present via conda) for .zstd files."""
    if fname.endswith(".zstd"):
        import io
        import subprocess

        raw = subprocess.run(
            ["zstd", "-dc", fname], capture_output=True, check=True
        ).stdout
        return io.StringIO(raw.decode("utf-8", "replace"))
    return open(fname)


def parse_stage_tasks() -> dict[str, list[dict]]:
    """Per-query worst-stage task statistics out of the event log:
    {query: [{stage, n_tasks, median_ms, max_ms, ratio}, ...]}. The
    job -> query attribution comes from the log itself: JobStart carries
    spark.jobGroup.id, which main() sets to the query name."""
    group_of_stage: dict[int, str] = {}
    tasks_of_stage: dict[int, list[float]] = {}
    for fname in _event_files():
        fh = _open_events(fname)
        with fh:
            for line in fh:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                kind = ev.get("Event")
                if kind == "SparkListenerJobStart":
                    grp = (ev.get("Properties") or {}).get("spark.jobGroup.id")
                    if grp:
                        for sid in ev.get("Stage IDs", []):
                            group_of_stage[sid] = grp
                elif kind == "SparkListenerTaskEnd":
                    info = ev.get("Task Info", {})
                    dur = info.get("Finish Time", 0) - info.get("Launch Time", 0)
                    tasks_of_stage.setdefault(ev["Stage ID"], []).append(dur)
    out: dict[str, list[dict]] = {}
    for sid, grp in group_of_stage.items():
        durs = tasks_of_stage.get(sid)
        if not durs or len(durs) < 2:
            continue
        med = statistics.median(durs)
        out.setdefault(grp, []).append(
            {
                "stage": sid,
                "n_tasks": len(durs),
                "median_ms": round(med, 1),
                "max_ms": round(max(durs), 1),
                "ratio": round(max(durs) / med, 1) if med > 0 else 0.0,
            }
        )
    return out


def main() -> None:
    from ai_optimizer_spark.registry import QUERIES

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(1).count()

    tile = build_skewed_tile(spark)
    docs = spark.read.parquet(f"{tile}/documents.parquet")
    n = docs.count()
    mega = docs.filter(F.col("source") == "megasrc").count()
    block = docs.filter(F.col("doc_id") % 10 == 0).count()
    print(f"tile={tile} docs={n} megasrc={mega} dup_block={block}", flush=True)

    res: dict = {"n_docs": n, "megasrc_share": round(mega / n, 3),
                 "block_share": round(block / n, 3), "queries": {}}
    for name in OPS:
        sc.setJobGroup(name, name)
        t0 = time.monotonic()
        rows = QUERIES[name](spark, tile).collect()
        dt = round(time.monotonic() - t0, 1)
        res["queries"][name] = {"sec": dt, "rows": len(rows)}
        print(f"{name}: {dt}s rows={len(rows)}", flush=True)
        spark.catalog.clearCache()

    spark.stop()
    time.sleep(2)  # let the event log flush/rename

    stats = parse_stage_tasks()
    for name in OPS:
        worst = max(
            stats.get(name, []),
            key=lambda s: (s["ratio"], s["max_ms"]),
            default=None,
        )
        res["queries"][name]["worst_stage"] = worst
        print(f"{name}: worst stage {worst}", flush=True)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
