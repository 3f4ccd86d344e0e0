"""Property-based verification of d15 repeated-substring coverage: for ANY
corpus (random tokens from a tiny alphabet, so span collisions are common),
the operator's per-doc window counts match a direct Python reference of the
definition — every w-token span, duplicated iff its exact text occurs more
than once anywhere in the corpus (self-repeats included)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ai_optimizer_spark.operators.dedup import repeated_substring_stats

W = 3  # small window so short random docs still produce spans


def reference(docs: list[tuple[int, str]], w: int = W):
    spans = {}
    for did, text in docs:
        toks = text.split()
        spans[did] = (
            [" ".join(toks[i : i + w]) for i in range(len(toks) - w + 1)]
            if len(toks) >= w
            else []
        )
    counts = Counter(x for ws in spans.values() for x in ws)
    return {
        did: (len(ws), sum(1 for x in ws if counts[x] > 1))
        for did, ws in spans.items()
        if ws
    }


corpus = st.lists(
    st.lists(st.sampled_from("aa bb cc dd".split()), min_size=0, max_size=12),
    min_size=1,
    max_size=8,
)


@settings(max_examples=15, deadline=None)
@given(token_lists=corpus)
def test_repeated_substring_stats_matches_reference(token_lists, spark):
    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    df = spark.createDataFrame(docs, "doc_id long, text string").withColumn(
        "source", F.lit("s")
    )
    got = {
        r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_frac)
        for r in repeated_substring_stats({"documents": df}, window=W).collect()
    }
    want = reference(docs)
    assert set(got) == set(want)
    for did, (n_win, n_dup) in want.items():
        g = got[did]
        assert (g[0], g[1]) == (n_win, n_dup), (did, g, (n_win, n_dup))
        # dup_frac: same ratio (rounding mode may differ at exact 5e-5 ties)
        assert abs(g[2] - n_dup / n_win) <= 1e-4
