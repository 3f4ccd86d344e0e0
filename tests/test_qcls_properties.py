"""Property-based verification of the tx19/st17 exactness contract: for
ANY corpus, the stateless per-row scorer (scaled-integer dot) must produce
BIT-IDENTICAL scores to the batch classifier's DECIMAL-sum dot — the
equality st17's shared oracle rests on. Randomized vocab/mixes exercise
many distinct (x, w) rounding combinations."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ai_optimizer_spark.operators.textops import (
    qcls_fit,
    qcls_score_expr,
    quality_classifier,
)

VOCAB = "alpha beta gamma delta eps zeta".split()

corpus = st.lists(
    st.tuples(
        st.lists(st.sampled_from(VOCAB), min_size=1, max_size=14),
        st.sampled_from(["src0", "src1", "src2"]),
    ),
    min_size=2,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(spec=corpus)
@pytest.mark.slow
def test_row_scorer_bit_equals_batch_scorer(spec, spark):
    rows = [
        (i, " ".join(words), "en", src, len(words))
        for i, (words, src) in enumerate(spec)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    batch = {
        r.doc_id: (r.score, r.keep)
        for r in quality_classifier({"documents": docs}).collect()
    }
    weights, _feat = qcls_fit(docs)
    p = qcls_score_expr(weights)
    rowwise = {
        r.doc_id: (r.score, r.keep)
        for r in docs.select(
            "doc_id",
            (F.round(p, 6) + F.lit(0.0)).alias("score"),
            (p >= 0.5).alias("keep"),
        ).collect()
    }
    assert rowwise == batch  # bit-identical, not approximately equal
