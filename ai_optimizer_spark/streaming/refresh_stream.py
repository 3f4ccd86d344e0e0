"""Streaming incremental refresh — T1 as a Structured Streaming sink.

The reference polls the object store on demand and refreshes changed files
(api/v1/endpoints/embed.py:1234-1261). The Spark-native form watches a drop
directory with a file-source stream and merges each micro-batch into the
vector store via the SAME refresh_store used by the batch path — foreachBatch
is exactly the escape hatch for merge-shaped sinks. Checkpointing makes the
ingest exactly-once per file: a restarted stream never re-embeds files it
already processed (the streaming analog of the etag/mtime diff, which still
guards content-level changes inside refresh_store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.vector_store import VectorStoreCatalog, refresh_store

DOC_SCHEMA = "doc_id long, text string, source string"


def docs_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream over a document drop directory (one parquet file
    per arriving corpus delta)."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )


def start_refresh_stream(
    spark: SparkSession,
    catalog: VectorStoreCatalog,
    name: str,
    input_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """Process everything currently in the drop dir (Trigger.AvailableNow),
    merging each micro-batch into the store, then stop. Call again after
    new files arrive — the checkpoint skips already-ingested files."""

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        refresh_store(spark, catalog, name, batch_df)

    q = (
        docs_stream(spark, input_dir)
        .writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_sec)
