"""Custom stateful operator: the job state machine as arbitrary stateful
processing — SURVEY.md §2.9-T2/T3 in their Spark-native form.

The reference guards terminal writes with `WHERE status IN
('queued','running')` so a late finish can't overwrite a reaped row
(embed/jobs.py:249-313). `operators/jobs.py` expresses that fold with
windows; here the SAME semantics run as a per-key sequential fold in pandas:

  * `track_jobs_batch`  — `groupBy(job_id).applyInPandas` — the batch twin,
    hash-verified against the window implementation's DuckDB oracle.
  * `track_jobs_stream` — `groupBy(job_id).applyInPandasWithState` — the
    incremental form: state = (status, last_seen, n) per job, carried
    across micro-batches; the guard lives in the shared `_fold`.

Scale shape: both shuffle once on job_id; streaming state is O(live jobs),
bounded further by the T3/T4 reap+TTL ops. The heartbeat timeout (reaper)
stays a periodic batch op (`operators/jobs.reap_stale_jobs`) rather than a
GroupStateTimeout so reap policy is replayable and oracle-checkable.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.jobs import STATUS_MAP, TERMINAL

OUTPUT_SCHEMA = "job_id long, last_seen timestamp, n_updates long, status string"
STATE_SCHEMA = "status string, terminal boolean, last_seen_us long, n long"

_EPOCH = pd.Timestamp("1970-01-01")


def _fold(
    pdfs: Iterable[pd.DataFrame],
    status: str,
    terminal: bool,
    last_seen_us: int,
    n: int,
) -> tuple[str, bool, int, int]:
    """Sequential transition fold with the terminal-write guard. Events are
    processed in (ts, event_id) order; heartbeats (unmapped event types)
    bump last_seen and the update count but not the status."""
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for row in pdf.itertuples():
            us = int((row.ts - _EPOCH).value // 1_000)
            last_seen_us = max(last_seen_us, us)
            n += 1
            new = STATUS_MAP.get(row.event_type)
            if new is None or terminal:  # heartbeat, or guarded by terminal
                continue
            status = new
            terminal = new in TERMINAL
    return status, terminal, last_seen_us, n


def _out_row(job_id: int, status: str, last_seen_us: int, n: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "job_id": [job_id],
            "last_seen": [pd.Timestamp(last_seen_us * 1000)],
            "n_updates": [n],
            "status": [status],
        }
    )


def _track_batch(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    status, terminal, last_seen_us, n = _fold([pdf], "queued", False, 0, 0)
    return _out_row(key[0], status, last_seen_us, n)


def _track_stream(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        status, terminal, last_seen_us, n = state.get
    else:
        status, terminal, last_seen_us, n = "queued", False, 0, 0
    status, terminal, last_seen_us, n = _fold(pdfs, status, terminal, last_seen_us, n)
    state.update((status, terminal, last_seen_us, n))
    yield _out_row(key[0], status, last_seen_us, n)


def _job_events(events: DataFrame) -> DataFrame:
    from pyspark.sql import functions as F

    return events.select(
        F.col("user_id").alias("job_id"), "ts", "event_id", "event_type"
    )


def track_jobs_batch(t: dict[str, DataFrame]) -> DataFrame:
    """T2 as applyInPandas: one row per job with guarded final status —
    byte-identical to operators/jobs.job_states (same DuckDB oracle)."""
    return (
        _job_events(t["events"])
        .groupBy("job_id")
        .applyInPandas(_track_batch, OUTPUT_SCHEMA)
    )


def track_jobs_stream(events: DataFrame) -> DataFrame:
    """T2 incrementally: applyInPandasWithState over a job-event stream.
    Output mode 'update' emits each job's latest folded state per batch."""
    return (
        _job_events(events)
        .groupBy("job_id")
        .applyInPandasWithState(
            _track_stream,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_to_final(spark, stream_plan: DataFrame, name: str, timeout_sec: int = 120):
    """Run an update-mode stateful stream with Trigger.AvailableNow into a
    memory sink and return the LAST emitted row per job (the final state)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .event_stream import bounded_state_shuffle

    # bounded state (|jobs| rows) — same state-store sizing rationale as
    # run_to_memory (event_stream.STREAM_STATE_PARTITIONS)
    with bounded_state_shuffle(spark):
        q = (
            stream_plan.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout_sec)
    sink = spark.table(name)
    w = Window.partitionBy("job_id").orderBy(F.desc("n_updates"))
    return (
        sink.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
