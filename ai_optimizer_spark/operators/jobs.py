"""Job state machine, heartbeat reaper, TTL eviction — SURVEY.md §2.9 T2-T4.

The reference tracks embed jobs in `aio_embed_jobs` with guarded transitions:
terminal writes only land on rows still in {queued,running}
(embed/jobs.py:249-313 — "a late finish can't overwrite a reaped row"),
a heartbeat reaper fails rows stale > 180 s (jobs.py:982-1063), and terminal
rows older than 3600 s are evicted (jobs.py:309-313).

Jobs here are derived deterministically from `events`: job_id = user_id, the
event stream is the status-update log (signup→queued, click→running,
purchase→succeeded, error→failed, view→heartbeat). The whole state machine
is ONE window pass per job — Spark's batch analog of
`mapGroupsWithState` with monotonic transitions; at scale it shuffles once
on job_id and each group folds locally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HEARTBEAT_REAP_CUTOFF = "2024-01-29 00:00:00"  # reap jobs silent after this
TTL_CUTOFF = "2024-01-15 00:00:00"  # evict terminal jobs finished before this

STATUS_MAP = {
    "signup": "queued",
    "click": "running",
    "purchase": "succeeded",
    "error": "failed",
}
TERMINAL = ("succeeded", "failed")


def _status_log(ev: DataFrame) -> DataFrame:
    status = F.create_map(
        *[F.lit(x) for kv in STATUS_MAP.items() for x in kv]
    )[F.col("event_type")]
    return ev.select(
        F.col("user_id").alias("job_id"),
        "ts",
        "event_id",
        status.alias("status"),
    )


def job_states(t: dict[str, DataFrame]) -> DataFrame:
    """T2: fold the status log into one row per job with the terminal-write
    guard: the FIRST terminal update wins; later updates (even terminal
    ones) are ignored — mirroring the reference's
    `WHERE status IN ('queued','running')` guard on terminal writes.
    Non-terminal jobs carry their latest non-heartbeat status.
    `last_seen` = max event ts (the heartbeat column)."""
    log = _status_log(t["events"])
    agg = log.groupBy("job_id").agg(
        F.max("ts").alias("last_seen"), F.count(F.lit(1)).alias("n_updates")
    )
    w_asc = Window.partitionBy("job_id").orderBy(F.asc("ts"), F.asc("event_id"))
    w_desc = Window.partitionBy("job_id").orderBy(F.desc("ts"), F.desc("event_id"))
    first_term = (
        log.filter(F.col("status").isin(*TERMINAL))
        .withColumn("rn", F.row_number().over(w_asc))
        .filter(F.col("rn") == 1)
        .select("job_id", F.col("status").alias("term_status"))
    )
    last_update = (
        log.filter(F.col("status").isNotNull())
        .withColumn("rn", F.row_number().over(w_desc))
        .filter(F.col("rn") == 1)
        .select("job_id", F.col("status").alias("last_status"))
    )
    return (
        agg.join(first_term, "job_id", "left")
        .join(last_update, "job_id", "left")
        .select(
            "job_id",
            "last_seen",
            "n_updates",
            F.coalesce("term_status", "last_status", F.lit("queued")).alias("status"),
        )
    )


def reap_stale_jobs(t: dict[str, DataFrame]) -> DataFrame:
    """T3: heartbeat reaper — non-terminal jobs whose last heartbeat is
    older than the staleness cutoff become 'failed' (reason: reaped), the
    batch analog of the 180 s reap (embed/jobs.py:300-313)."""
    states = job_states(t)
    cutoff = F.to_timestamp(F.lit(HEARTBEAT_REAP_CUTOFF))
    reaped = (~F.col("status").isin(*TERMINAL)) & (F.col("last_seen") < cutoff)
    return states.select(
        "job_id",
        "last_seen",
        F.when(reaped, F.lit("failed")).otherwise(F.col("status")).alias("status"),
        F.when(reaped, F.lit("reaped")).otherwise(F.lit("live")).alias("reap_reason"),
    )


def ttl_evict(t: dict[str, DataFrame]) -> DataFrame:
    """T4: TTL eviction — drop terminal jobs whose last update predates the
    TTL horizon (embed/jobs.py:309-313); survivors are returned (the
    rewritten table)."""
    states = job_states(t)
    cutoff = F.to_timestamp(F.lit(TTL_CUTOFF))
    evicted = F.col("status").isin(*TERMINAL) & (F.col("last_seen") < cutoff)
    return states.filter(~evicted).select("job_id", "status", "last_seen", "n_updates")
