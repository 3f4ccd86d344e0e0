"""Corpus curation pipeline — the end-to-end training-data recipe the
north-star operators exist for, composed as ONE declarative plan:

    documents → language gate → quality gate → dedup (keep canonical
    component member only) → token accounting → split assignment

Every stage is deterministic (portable-hash dedup + splits, arithmetic
quality score), so the WHOLE pipeline hash-verifies against a single
DuckDB oracle — including the recursive-CTE connected components.

Scale shape: language/quality/token/split stages are narrow maps over one
scan; dedup contributes its banded-LSH + label-propagation cost; the final
assembly is doc_id equi-joins that AQE plans as broadcasts once the
curated side shrinks. The output is the corpus manifest a trainer consumes
(doc, source, tokens, quality, split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import dedup_clusters
from ..operators.sampling import hash_split
from ..operators.textops import quality_score, token_stats

QUALITY_FLOOR = 0.5
KEEP_LANG = "en"


def curation_pipeline(t: dict[str, DataFrame]) -> DataFrame:
    docs = t["documents"]
    canon = dedup_clusters(t).filter(F.col("is_canonical")).select("doc_id")
    quality = quality_score(t).select("doc_id", "quality")
    tokens = token_stats(t).select("doc_id", "n_tokens")
    split = hash_split(t).select("doc_id", "split")
    return (
        docs.filter(F.col("lang") == KEEP_LANG)
        .join(canon, "doc_id", "left_semi")
        .join(quality, "doc_id")
        .filter(F.col("quality") >= QUALITY_FLOOR)
        .join(tokens, "doc_id")
        .join(split, "doc_id")
        .select("doc_id", "source", "n_tokens", "quality", "split")
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
