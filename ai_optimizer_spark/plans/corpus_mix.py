"""Pretraining corpus assembly — the modern data-mixing recipe composed
as one deterministic pipeline, the way CCNet→DSIR stacks run in practice:

    documents → bigram-LM perplexity gate (drop the 'tail' tertile,
    CCNet's discard signal) → DSIR importance selection over the kept
    pool (top quartile by hashed-n-gram log(p_target/p_raw)) → the
    per-(lang, source) mix manifest a training run consumes.

Both stages are the registered operators (tx16 / smp10 cores), so the
composition inherits their determinism and the WHOLE pipeline
hash-verifies against one chained-CTE DuckDB oracle.

Scale shape: stage boundaries are ID-LEVEL — the perplexity gate emits a
doc_id set that semi-joins back into the documents scan (ids only; text
never crosses a stage boundary), and DSIR re-reads the gated corpus once
for its feature pass, exactly like the real two-pass pipelines. Token
accounting rides the DSIR feature counts (n_tokens = Σ bucket counts), so
the final manifest costs one doc-level aggregation, not a third text pass.

Reference pattern: CCNet (Wenzek et al. 2020) tertile filtering feeding
DSIR (Xie et al. 2023) selection; reference repo analog: the staged
curation spools in src/server/app/embed/document.py (load→filter→spool)
generalized to corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sampling import dsir_select
from ..operators.textops import ngram_perplexity


def corpus_assembly(t: dict[str, DataFrame]) -> DataFrame:
    ppl = ngram_perplexity(t)
    kept_ids = ppl.where(F.col("ppl_bucket") != "tail").select("doc_id")
    # id-only gate APPLIED TO THE FEATURE TABLE, not the documents (r10,
    # guide §8): the old plan semi-joined documents with kept_ids first,
    # which shuffled the text payload on doc_id just to drop a tertile;
    # dsir_select(keep_ids=...) filters the exploded (doc_id, bucket, cnt)
    # digests instead — identical selected set (the filter commutes with
    # the explode), and no exchange ever carries text. The kept set stays
    # a shuffled (non-broadcast) semi-join: it is a corpus-scale fraction,
    # the plan that survives 100×.
    sel = dsir_select(t["documents"], extra_keys=("lang",), keep_ids=kept_ids)
    # total (not mean) importance mass: the weights are 4-decimal values,
    # so a DECIMAL(18,6) sum is exact and order-independent — averaging
    # re-rounded doubles flips on exact .00005 boundaries between engines
    # (the j19 decimal-sum pattern)
    return (
        sel.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.round(F.sum(F.col("weight").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("total_weight"),
        )
    )
