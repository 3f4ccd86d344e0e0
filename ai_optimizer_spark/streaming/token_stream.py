"""T6: SSE token streaming — the last §2.9 operator, in its data form.

The reference streams chat-model chunks to the client over SSE and then
folds them into one final assistant message + usage totals
(runtime/langgraph/session.py:50-84 forwards `on_chat_model_stream`
chunks in arrival order; `_aggregate_usage_callback` sums the per-chunk
usage into one TokenUsage). The serving transport (asyncio queue → SSE)
is out of engine scope; the DATA operation underneath is:

    ordered stream of (session, seq, chunk) → per-session ordered
    reassembly into the final message + usage fold.

Both forms below implement exactly that:

  * `assemble_messages`    — batch: groupBy(session) with an order-proof
    aggregation (collect_list of (seq, chunk) structs → array_sort →
    join). collect_list order is nondeterministic across tasks; sorting
    by seq inside the aggregate makes the reassembly independent of
    arrival order — the same guarantee SSE gets from TCP ordering, done
    Spark-side. Hash-verified against a DuckDB `string_agg(... ORDER BY
    seq)` oracle.
  * `run_token_assembly_stream` — the REAL streaming plan: readStream →
    same aggregation in complete mode → memory sink (availableNow), the
    st6/st7 pattern. A streaming query is the batch query over the
    complete input, so its output is hash-checked against the same
    oracle in tests.

Token-chunk feed: the engine is LLM-free, so `token_chunks` synthesizes
the chunk stream deterministically from `documents` (one chunk per
whitespace token, seq = emission index) — the same double strategy as
D3-D11. Reassembly must therefore reproduce the whitespace-normalized
document, which the oracle independently verifies.

Scale shape: one shuffle keyed by session_id; per-session state is one
message's chunks (bounded by max completion length), so streaming state
is O(live sessions × completion length) — the same bound the reference's
per-session asyncio queue has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..tables import load_tables


def token_chunks(docs: DataFrame) -> DataFrame:
    """The chunk feed double: (session_id, seq, chunk) — one row per
    streamed token, seq = emission order (posexplode index)."""
    return docs.select(
        F.col("doc_id").alias("session_id"),
        F.posexplode(T.words("text")).alias("seq", "chunk"),
    )


def assemble_messages(chunks: DataFrame) -> DataFrame:
    """Fold a chunk stream into final messages + usage: order-proof ordered
    concat (sort by seq inside the aggregate) and the token/char usage sums
    (`_aggregate_usage_callback`'s cross-chunk fold, session.py:88-110)."""
    parts = F.array_sort(
        F.collect_list(F.struct(F.col("seq"), F.col("chunk")))
    )
    return chunks.groupBy("session_id").agg(
        F.array_join(
            F.transform(parts, lambda s: s["chunk"]), " "
        ).alias("message"),
        F.count(F.lit(1)).cast("long").alias("completion_tokens"),
        F.sum(F.length("chunk")).cast("long").alias("completion_chars"),
    )


def token_assembly(t: dict[str, DataFrame]) -> DataFrame:
    """t6 batch entry: synthesize the chunk feed and fold it back."""
    return assemble_messages(token_chunks(t["documents"]))


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.parquet as a bounded stream (availableNow drains it) —
    the events_stream pattern: schema from the static footer, directory
    source scoped to the one file by glob."""
    static = load_tables(spark, sf_dir)["documents"]
    return (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def run_token_assembly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t6 streaming twin: the same reassembly as a streaming aggregation
    (complete mode — sessions finalize when the feed drains, availableNow).
    Returns the materialized memory table."""
    import uuid

    from .event_stream import run_to_memory

    name = f"st_tokens_{uuid.uuid4().hex[:12]}"
    plan = assemble_messages(token_chunks(documents_stream(spark, sf_dir)))
    return run_to_memory(spark, plan, name, timeout_sec=300)
