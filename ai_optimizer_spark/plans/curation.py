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


CASCADE_STAGES = ("input", "exact", "minhash_lsh", "semdedup")


def dedup_cascade(
    t: dict[str, DataFrame], max_bucket_size: int | None = None
) -> DataFrame:
    """E2E dedup cascade — the FineWeb/Dolma recipe (Penedo et al. 2024;
    Soldaini et al. 2024): exact dedup, then MinHash-LSH near-dup, then
    SemDeDup semantic dedup, reported as a 4-row attrition profile
    (docs/tokens surviving after each stage) — the table a curation run
    publishes before anyone trains on the output.

    Each stage's removal set is computed GLOBALLY over the input corpus
    (how production pipelines actually run — the three stages are
    independent jobs that can execute in parallel; recomputing LSH on
    exact-survivors would serialize them for near-zero benefit since an
    exact-duplicate's LSH pairs are also pairs of its canonical), then
    applied SEQUENTIALLY: a doc's removal is attributed to the FIRST
    stage that catches it, so the profile decomposes the corpus exactly.

    Scale shape: the three removal sets are id-only columns (exact: a
    digest-keyed window over md5, no bodies shuffled; LSH: the capped
    production config's component losers — the near-dup subgraph only;
    SemDeDup: auto-k celled pair scan, linear by construction). The base
    is one token-count projection fused into the scan; the flags attach
    via three left joins whose build sides are each a vanishing fraction
    of the corpus (broadcast under AQE), and the profile itself is ONE
    partial+final aggregate — four rows come out of a struct inline, not
    four passes."""
    from ..operators.dedup import (
        LSH_MAX_BUCKET_DEFAULT,
        dedup_losers,
        semdedup,
    )
    from ..functions.text import token_count

    docs = t["documents"]
    base = docs.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    from pyspark.sql import Window

    exact_losers = (
        docs.select(
            "doc_id",
            F.min("doc_id")
            .over(Window.partitionBy(F.md5("text")))
            .alias("canon"),
        )
        .filter(F.col("doc_id") != F.col("canon"))
        .select("doc_id", F.lit(True).alias("f1"))
    )
    lsh_losers = dedup_losers(
        t, max_bucket_size=LSH_MAX_BUCKET_DEFAULT
    ).select("doc_id", F.lit(True).alias("f2"))
    sem_losers = (
        semdedup(t)
        .filter(~F.col("is_kept"))
        .select(F.col("vec_id").alias("doc_id"), F.lit(True).alias("f3"))
    )
    flagged = (
        base.join(exact_losers, "doc_id", "left")
        .join(lsh_losers, "doc_id", "left")
        .join(sem_losers, "doc_id", "left")
        .select(
            "n_tokens",
            F.coalesce("f1", F.lit(False)).alias("f1"),
            F.coalesce("f2", F.lit(False)).alias("f2"),
            F.coalesce("f3", F.lit(False)).alias("f3"),
        )
    )
    zero = F.lit(0).cast("long")
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n0"),
        F.coalesce(F.sum("n_tokens"), F.lit(0).cast("long")).alias("t0"),
        F.coalesce(F.sum(F.when(F.col("f1"), 1)), zero).alias("r1"),
        F.coalesce(F.sum(F.when(F.col("f1"), F.col("n_tokens"))), zero).alias("tt1"),
        F.coalesce(F.sum(F.when(~F.col("f1") & F.col("f2"), 1)), zero).alias("r2"),
        F.coalesce(
            F.sum(F.when(~F.col("f1") & F.col("f2"), F.col("n_tokens"))), zero
        ).alias("tt2"),
        F.coalesce(
            F.sum(F.when(~F.col("f1") & ~F.col("f2") & F.col("f3"), 1)), zero
        ).alias("r3"),
        F.coalesce(
            F.sum(F.when(~F.col("f1") & ~F.col("f2") & F.col("f3"), F.col("n_tokens"))),
            zero,
        ).alias("tt3"),
    )

    def row(stage: int, removed, remaining, tokens):
        return F.struct(
            F.lit(stage).cast("long").alias("stage"),
            F.lit(CASCADE_STAGES[stage]).alias("stage_name"),
            removed.cast("long").alias("docs_removed"),
            remaining.cast("long").alias("docs_remaining"),
            tokens.cast("long").alias("tokens_remaining"),
        )

    n0, t0 = F.col("n0"), F.col("t0")
    r1, r2, r3 = F.col("r1"), F.col("r2"), F.col("r3")
    tt1, tt2, tt3 = F.col("tt1"), F.col("tt2"), F.col("tt3")
    return agg.select(
        F.inline(
            F.array(
                row(0, F.lit(0), n0, t0),
                row(1, r1, n0 - r1, t0 - tt1),
                row(2, r2, n0 - r1 - r2, t0 - tt1 - tt2),
                row(3, r3, n0 - r1 - r2 - r3, t0 - tt1 - tt2 - tt3),
            )
        )
    )
