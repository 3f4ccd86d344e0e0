"""Streaming exact dedup — the incremental form of the D1 dedup family
(operators/dedup.py) for an always-on ingest pipeline.

`dropDuplicatesWithinWatermark` keys state by event_id and keeps each key
only until the watermark passes its event time + delay, so state is
bounded by (duplicate-arrival horizon x ingest rate), not by stream
history — the property that makes exact dedup feasible on an unbounded
100 TB/day feed. Duplicates arriving within the horizon are dropped by
state lookup; rows arriving later than the watermark are dropped as late
data BEFORE the duplicate check — including late FIRST occurrences, which
are lost entirely. That is the deliberate trade for bounded state: on an
in-order feed the output equals the batch `distinct` result (the parity
test_streaming.py asserts); under watermark-late arrivals it is the
batch result minus the late-loss set (test_streaming_late_data.py pins
both halves of that contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

DEDUP_HORIZON = "2 hours"


def deduped_events(events: DataFrame, horizon: str = DEDUP_HORIZON) -> DataFrame:
    """Keep the first arrival of each event_id within the watermark
    horizon. Input must be a streaming DataFrame with an event-time `ts`."""
    return events.withWatermark("ts", horizon).dropDuplicatesWithinWatermark(
        ["event_id"]
    )
