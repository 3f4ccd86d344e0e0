"""Property-based chunker verification (hypothesis): the reference's
sliding-window semantics (embed/document.py:88-99) hold for ALL sizes, not
just the fixtures — boundary coverage, overlap arithmetic, reconstruction."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st

from ai_optimizer_spark.functions import text as T


def reference_chunker(text: str, size: int, overlap: int) -> list[tuple[int, str]]:
    """Direct python port of the reference loop (document.py:88-99):
    emit text[start:start+size]; stop once the end is reached; else
    start = end - overlap."""
    out = []
    start, n = 0, len(text)
    while start < n:
        end = min(start + size, n)
        out.append((start, text[start:end]))
        if end >= n:
            break
        start = end - overlap
    return out


@settings(max_examples=200, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=2000),
    size=st.integers(min_value=1, max_value=300),
    overlap=st.integers(min_value=0, max_value=299),
)
def test_chunk_starts_match_reference_loop(n, size, overlap, spark):
    if overlap >= size:
        return  # chunk_text validates this precondition separately
    text = "x" * n
    want = [s for s, _ in reference_chunker(text, size, overlap)]
    row = spark.range(1).selectExpr(f"{n} as n").select(
        T.chunk_starts("n", size, overlap).alias("starts")
    ).first()
    assert list(row.starts) == want


@settings(max_examples=50, deadline=None)
@given(
    text=st.text(alphabet="ab c", min_size=0, max_size=400),
    size=st.integers(min_value=2, max_value=120),
)
def test_chunks_cover_text_exactly(text, size, spark):
    overlap = size // 3
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"id": [1], "text": [text]}))
    rows = (
        T.chunk_text(df, "text", "id", size, overlap)
        .orderBy("start_index")
        .collect()
    )
    want = reference_chunker(text, size, overlap)
    got = [(r.start_index, r.chunk_text) for r in rows]
    assert got == want
    if text:
        # every char position is covered by at least one chunk
        covered = set()
        for s, c in got:
            covered.update(range(s, s + len(c)))
        assert covered == set(range(len(text)))


# ---------------------------------------------------------------------------
# repetition-stats fold (tx11): array-domain run-length vs Python reference
# ---------------------------------------------------------------------------


def round_half_up(x: float, digits: int = 3) -> float:
    """Spark/DuckDB ROUND semantics: HALF_UP over the double's shortest
    decimal form. Python's round() is half-even and disagrees at exact .5
    boundaries (e.g. 13/16 = 0.8125 → Spark 0.813, round() 0.812 — found
    by hypothesis)."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def reference_repetition(text: str) -> tuple[int, int, float]:
    """Plain-Python mirror of repetition_stats' per-doc math."""
    from collections import Counter

    words = text.strip().split() if text.strip() else [""]
    # Spark's split on \s+ of "" yields [""] — mirror that
    n = len(words)
    top = max(Counter(words).values())
    bigrams = ["_".join(p) for p in zip(words, words[1:])]
    dup = round_half_up(1.0 - len(set(bigrams)) / len(bigrams)) if bigrams else 0.0
    return n, top, dup


@settings(max_examples=30, deadline=None)
@given(
    tokens=st.lists(
        st.text(alphabet="abc", min_size=1, max_size=3), min_size=0, max_size=30
    )
)
@pytest.mark.slow
def test_repetition_stats_match_reference(tokens, spark):
    """The aggregate() run-length fold equals multiset max-multiplicity for
    arbitrary token sequences (incl. empty, single, all-equal)."""
    import pyspark.sql.functions as F

    from ai_optimizer_spark.operators.textops import repetition_stats

    text = " ".join(tokens)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string").withColumn(
        "source", F.lit("s")
    )
    row = repetition_stats({"documents": docs}).collect()[0]
    n, top, dup = reference_repetition(text)
    assert row.n_tokens == n
    assert row.top_word_n == top
    assert abs(row.dup_bigram_frac - dup) < 1e-9
    assert abs(row.top_word_frac - round_half_up(top / n)) < 1e-9
