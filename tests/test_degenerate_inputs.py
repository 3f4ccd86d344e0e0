"""Degenerate-input robustness: NULL text, empty strings, whitespace-only
documents must flow through the text/dedup operator family without errors
and with sane outputs (real corpora always contain them; an ANSI-mode
Spark 4 expression that assumes non-null would throw mid-scan)."""

from __future__ import annotations

import pytest

from ai_optimizer_spark.operators import dedup as D
from ai_optimizer_spark.operators import sampling as SMP
from ai_optimizer_spark.operators import textops as TX
from ai_optimizer_spark.operators import refresh as RF
from ai_optimizer_spark.plans.corpus_mix import corpus_assembly


@pytest.fixture(scope="module")
def degenerate_t(spark):
    docs = spark.createDataFrame(
        [
            (1, None, "s", None, 0),
            (2, "", "s", "en", 0),
            (3, "   ", "s", "en", 3),
            (4, "one two three four five six", "s", "en", 27),
            (5, "one two three four five six", "s", "en", 27),
        ],
        "doc_id long, text string, source string, lang string, n_chars long",
    )
    return {"documents": docs}


@pytest.mark.parametrize(
    "fn",
    [
        TX.token_stats,
        TX.quality_score,
        TX.lang_id,
        TX.fingerprints,
        TX.chunk_documents,
        TX.bpe_token_stats,
        TX.bpe_pair_counts,
        D.exact_dedup,
        D.ngram_jaccard_pairs,
        D.minhash_lsh_pairs,
        D.simhash_pairs_blocked,
        D.simhash_pairs_auto,
        D.repeated_substring_stats,
        D.cluster_survivors,
        D.corpus_dup_profile,
        SMP.token_budget_select,
        SMP.dsir_importance,
        TX.ngram_perplexity,
        TX.gopher_rules,
        corpus_assembly,
        lambda t: D.span_index(t["documents"]),
        # final-r5 additions: the modern-pipeline ops must survive NULL /
        # empty / whitespace-only text too
        TX.quality_classifier,
        SMP.curriculum_order,
        SMP.mixture_epochs,
        SMP.unimax_budget,
        RF.bloom_index_refresh,
        D.bloom_decontamination,
    ],
)
def test_text_family_survives_degenerate_docs(degenerate_t, fn):
    fn(degenerate_t).collect()  # must not raise


def test_degenerate_semantics(degenerate_t):
    # chunker: only docs with content produce chunks
    chunks = TX.chunk_documents(degenerate_t).collect()
    assert {r.doc_id for r in chunks} == {3, 4, 5}
    # signatures exist only for docs with >= SHINGLE_N words
    sigs = D.simhash_signatures(degenerate_t["documents"]).collect()
    assert {r.doc_id for r in sigs} == {4, 5}
    # identical docs are an exact-dup pair and a hamming-0 simhash pair
    kept = {r.doc_id for r in D.exact_dedup(degenerate_t).collect()}
    assert 4 in kept and 5 not in kept
    pairs = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in D.simhash_pairs_blocked(degenerate_t).collect()
    }
    assert (4, 5, 0) in pairs


def test_incremental_rollup_empty_delta_and_empty_history(spark, sf_small):
    """t9: a cutoff beyond every event_id (empty delta) and one below every
    event_id (empty history) must both equal the full recompute — merging
    with an empty side is the identity."""
    from ai_optimizer_spark.operators.refresh import incremental_rollup
    from ai_optimizer_spark.tables import load_tables

    t = load_tables(spark, sf_small)
    full = {
        (r.window_start, r.event_type, r.n_events, r.value_sum)
        for r in incremental_rollup(t, cutoff=50_000).collect()
    }
    for cutoff in (0, 10**12):
        got = {
            (r.window_start, r.event_type, r.n_events, r.value_sum)
            for r in incremental_rollup(t, cutoff=cutoff).collect()
        }
        assert got == full and got


def test_clustered_range_search_zero_radius(spark, sf_small):
    """v16b: radius 0 returns only exact-duplicate vectors (none in the
    fixture) without erroring on an empty live-cell list edge."""
    from ai_optimizer_spark.plans.bucketing import clustered_range_search

    rows = clustered_range_search(spark, sf_small, radius=0.0).collect()
    assert rows == [] or all(r.dist == 0.0 for r in rows)


def test_refresh_store_empty_corpus_noop(spark, sf_small, tmp_path):
    """refresh_store with an empty current_docs batch must leave the store
    untouched (the diff is empty on the current side; nothing is stale
    unless remove_missing, which a delta batch must not pass)."""
    from pyspark.sql import functions as F

    from ai_optimizer_spark.plans.vector_store import (
        VectorStoreCatalog,
        refresh_store,
    )
    from ai_optimizer_spark.tables import load_tables

    docs = load_tables(spark, sf_small)["documents"].filter(F.col("doc_id") < 10).select(
        "doc_id", "text", "source"
    )
    catalog = VectorStoreCatalog(str(tmp_path / "stores"))
    store1 = refresh_store(spark, catalog, "store_e", docs)
    ids1 = {r.id for r in store1.select("id").collect()}
    empty = docs.filter(F.col("doc_id") < 0)
    store2 = refresh_store(spark, catalog, "store_e", empty)
    assert {r.id for r in store2.select("id").collect()} == ids1


def test_span_index_refresh_empty_delta_and_empty_history(spark, sf_small):
    """t10: a cutoff above every doc_id (empty delta) and below every
    doc_id (empty history) must both equal the full recompute — merging
    with an empty side is the identity, and the affected-fingerprint
    restriction never drops untouched rows."""
    from ai_optimizer_spark.operators.dedup import span_index
    from ai_optimizer_spark.operators.refresh import span_index_refresh
    from ai_optimizer_spark.tables import load_tables

    t = load_tables(spark, sf_small)
    full = {
        (r.wh, r.n_docs, r.min_doc)
        for r in span_index(t["documents"]).collect()
    }
    assert full
    for cutoff in (0, 10**12, 25):
        got = {
            (r.wh, r.n_docs, r.min_doc)
            for r in span_index_refresh(t, cutoff=cutoff).collect()
        }
        assert got == full, f"cutoff={cutoff}"


def test_cell_stats_refresh_empty_delta_and_empty_history(spark, sf_small):
    """t11: cutoff 0 (everything is delta), a cutoff above every vec_id
    (everything is stored), and a mid cutoff must all produce the same
    stats — count adds and max takes greatest, so the merge with an empty
    side is the identity and the split point can never change the result."""
    from ai_optimizer_spark.operators.refresh import cell_stats_refresh
    from ai_optimizer_spark.tables import load_tables

    t = load_tables(spark, sf_small)
    results = []
    for cutoff in (0, 10**12, 100):
        results.append(
            {
                (r.cid, r.n_vecs, round(r.r_cell, 6))
                for r in cell_stats_refresh(t, cutoff=cutoff).collect()
            }
        )
    assert results[0]
    assert results[0] == results[1] == results[2]
    # every centroid owns at least its own seed vector
    assert len(results[0]) == 16


def test_dedup_cascade_degenerate_docs_and_zero_vector(spark, degenerate_t):
    """e2e_dedup_cascade must survive NULL/empty text AND a zero-norm
    embedding (normalization divides by the norm: IEEE gives inf/NaN,
    the cosine filters must treat it as not-a-duplicate, never throw),
    and the profile must stay internally consistent."""
    from ai_optimizer_spark.plans.curation import dedup_cascade

    emb = spark.createDataFrame(
        [
            (1, [0.0] * 8, 0),  # zero vector: norm == 0
            (2, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
            (3, [1.0, 0.001, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
            (4, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 1),
            (5, [0.0, 1.0, 0.001, 0.0, 0.0, 0.0, 0.0, 0.0], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    t = {"documents": degenerate_t["documents"], "embeddings": emb}
    rows = sorted(dedup_cascade(t).collect(), key=lambda r: r.stage)
    assert len(rows) == 4
    for prev, cur in zip(rows, rows[1:]):
        assert cur.docs_remaining == prev.docs_remaining - cur.docs_removed
        assert cur.docs_remaining >= 0
    # docs 4/5 are exact duplicates: the exact stage must fire
    assert rows[1].docs_removed >= 1


@pytest.fixture(scope="module")
def degenerate_emb(spark):
    """Realistic embedding pathologies: a zero vector (failed encode), a
    NULL embedding (missing row), plus normal vectors — every
    similarity-family op must survive a corpus containing them."""
    return spark.createDataFrame(
        [
            (0, [1.0, 0.2, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
            (1, [0.0] * 8, 0),  # zero norm
            (2, None, 1),  # NULL embedding
            (3, [0.9, 0.25, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
            (4, [0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.1], 1),
            (5, [0.0, 0.95, 0.0, 0.0, 0.0, 0.0, 0.0, 0.12], 1),
        ],
        "vec_id long, embedding array<float>, label int",
    )


def test_similarity_family_survives_degenerate_embeddings(spark, degenerate_emb):
    """Zero-norm and NULL embeddings must flow through the cosine paths
    without ANSI divide-by-zero errors; the zero vector scores 0.0
    ('similar to nothing'), the NULL row scores NULL (missing) — neither
    ever surfaces as a near-duplicate or a top hit."""
    from ai_optimizer_spark.operators import dedup as DD
    from ai_optimizer_spark.operators import similarity as S

    t = {"embeddings": degenerate_emb}
    topk = S.cosine_topk(t).collect()  # query vec_id=0, must not raise
    assert all(r.vec_id != 1 or r.cos_sim == 0.0 for r in topk)
    pairs = DD.embedding_neardup_blocked(t).collect()  # must not raise
    flat = {v for r in pairs for v in (r.vec_a, r.vec_b)}
    assert 1 not in flat and 2 not in flat  # degenerate rows never pair
    sem = DD.semdedup(t, n_centroids=2).collect()
    assert {r.vec_id for r in sem} >= {0, 1, 3, 4, 5}


def test_qcls_row_scorer_matches_batch_on_degenerate_text(spark, degenerate_t):
    """The st17 per-row scorer must equal the batch classifier even for
    NULL/empty/whitespace-only text: such docs have no word features but
    DO have the bias feature, so both scorers emit sigmoid(bias) — the
    row scorer must not poison z to NULL through the NULL bucket array."""
    from pyspark.sql import functions as F

    from ai_optimizer_spark.operators.textops import (
        qcls_fit,
        qcls_score_expr,
        quality_classifier,
    )

    docs = degenerate_t["documents"]
    batch = {
        (r.doc_id, r.score, r.keep)
        for r in quality_classifier(degenerate_t).collect()
    }
    weights, _feat = qcls_fit(docs)
    p = qcls_score_expr(weights)
    rowwise = {
        (r.doc_id, r.score, r.keep)
        for r in docs.select(
            "doc_id",
            (F.round(p, 6) + F.lit(0.0)).alias("score"),
            (p >= 0.5).alias("keep"),
        ).collect()
    }
    assert rowwise == batch and len(batch) == 5


def test_dedup_cascade_empty_corpus(spark):
    """An empty corpus must produce the 4-row all-zero profile — not NULL
    token sums (uncoalesced SUM) or an analysis error (semdedup's empty
    centroid literal types as VOID without its guard)."""
    from ai_optimizer_spark.plans.curation import dedup_cascade

    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    rows = sorted(
        dedup_cascade({"documents": docs, "embeddings": emb}).collect(),
        key=lambda r: r.stage,
    )
    assert len(rows) == 4
    assert all(
        (r.docs_removed, r.docs_remaining, r.tokens_remaining) == (0, 0, 0)
        for r in rows
    )


def test_curriculum_ignores_null_text(spark, degenerate_t):
    """smp12 is defined over tokenizable docs: a NULL-text doc must not
    appear in the schedule AND must not shift anyone's stage boundaries
    (left in the distribution it would — and differently per engine:
    Spark windows order NULLS FIRST, DuckDB NULLS LAST)."""
    from ai_optimizer_spark.operators.sampling import curriculum_order

    docs = degenerate_t["documents"]
    with_null = sorted(
        map(tuple, curriculum_order({"documents": docs}).collect())
    )
    clean = sorted(
        map(
            tuple,
            curriculum_order(
                {"documents": docs.filter(docs.text.isNotNull())}
            ).collect(),
        )
    )
    assert with_null == clean
    assert all(r[0] != 1 for r in with_null)  # doc 1 (NULL text) absent


def test_r6_e2e_ops_survive_empty_corpus(spark):
    """The r6 e2e ops on an EMPTY corpus: auto_curation must still derive
    knobs (cap floors to 2 with no collisions; k floors to 16) and emit
    the all-zero 4-row profile; decon_report likewise; tokenizer
    fertility returns an empty table (no domains) rather than raising on
    the empty merge fit."""
    from ai_optimizer_spark.operators.textops import tokenizer_fertility
    from ai_optimizer_spark.plans.curation import auto_curation, decon_report

    docs = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )
    emb = spark.createDataFrame([], "vec_id long, embedding array<float>, label int")
    t = {"documents": docs, "embeddings": emb}

    rows = sorted(auto_curation(t).collect(), key=lambda r: r.stage)
    assert len(rows) == 4
    assert all(r.docs_remaining == 0 and r.tokens_remaining == 0 for r in rows)
    assert rows[0].lsh_bucket_cap == 2 and rows[0].semdedup_k == 16

    rows = sorted(decon_report(t).collect(), key=lambda r: r.stage)
    assert len(rows) == 4
    assert all(r.docs_remaining == 0 for r in rows)

    assert tokenizer_fertility(t).collect() == []
