"""Degenerate-input robustness: NULL text, empty strings, whitespace-only
documents must flow through the text/dedup operator family without errors
and with sane outputs (real corpora always contain them; an ANSI-mode
Spark 4 expression that assumes non-null would throw mid-scan)."""

from __future__ import annotations

import pytest

from ai_optimizer_spark.operators import dedup as D
from ai_optimizer_spark.operators import textops as TX


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
