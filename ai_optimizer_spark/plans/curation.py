"""Corpus curation pipeline — the end-to-end training-data recipe the
north-star operators exist for, composed as ONE declarative plan:

    documents → language gate → quality gate → dedup (keep canonical
    component member only) → token accounting → split assignment

Every stage is deterministic (portable-hash dedup + splits, arithmetic
quality score), so the WHOLE pipeline hash-verifies against a single
DuckDB oracle — including the recursive-CTE connected components.

Scale shape: quality, token count, and split are computed in ONE
projection fused into the parquet scan — no join carries them. The only
join in the plan is the dedup anti-join, and its build side is just the
non-canonical members of LSH components (a vanishing fraction of a
deduped corpus), so AQE plans it as a broadcast. The output is the corpus
manifest a trainer consumes (doc, source, tokens, quality, split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T
from ..operators.dedup import LSH_MAX_BUCKET_DEFAULT, dedup_losers
from ..operators.sampling import split_expr
from ..operators.textops import quality_parts

QUALITY_FLOOR = 0.5
KEEP_LANG = "en"


def curation_pipeline(t: dict[str, DataFrame]) -> DataFrame:
    # skew guard ON in the production path: a degenerate boilerplate bucket
    # must not send an O(B²) candidate wave through verification
    losers = dedup_losers(t, max_bucket_size=LSH_MAX_BUCKET_DEFAULT)
    w = T.words("text")
    _, _, _, quality = quality_parts(w)
    return (
        t["documents"]
        .filter(F.col("lang") == KEEP_LANG)
        .select(
            "doc_id",
            "source",
            F.size(w).cast("long").alias("n_tokens"),
            quality.alias("quality"),
            split_expr(F.col("doc_id")).alias("split"),
        )
        .filter(F.col("quality") >= QUALITY_FLOOR)
        .join(losers, "doc_id", "left_anti")
    )


def curation_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Per-split accounting over the curated manifest — the sanity numbers
    (docs, token budget, mean quality) read before a training run."""
    return (
        curation_pipeline(t)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
    )


def training_export(t: dict[str, DataFrame], capacity: int = 2048) -> DataFrame:
    """E2E training export — the full write path a trainer consumes, as
    ONE composed plan: curate (language → quality → dedup-canonical keep)
    → take the train split → pack the surviving docs into fixed-capacity
    token sequences. The output manifest maps every training document to
    (sequence bin, offset) — what a sequence-packing data loader reads.

    Composition is the point: the curation projection fuses into the
    scan, the dedup anti-join broadcasts its loser set, and the packing
    prefix-sum runs the two-pass bucket form over only the curated train
    docs. Hash-verified end-to-end against a single DuckDB oracle that
    chains the recursive-CTE components, the split hash, and the packing
    window."""
    from ..operators.sampling import pack_token_stream

    curated = curation_pipeline(t)
    train = curated.filter(F.col("split") == "train").select("doc_id", "n_tokens")
    return pack_token_stream(train, capacity)
