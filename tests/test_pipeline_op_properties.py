"""Property-based invariants for the r5 modern-pipeline operators: the
guarantees their papers state, checked on randomized corpora rather than
the fixture alone (the d15 property-test pattern, SURVEY §5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from ai_optimizer_spark.operators.dedup import SEMDEDUP_TAU, semdedup
from ai_optimizer_spark.operators.sampling import dsir_select
from ai_optimizer_spark.operators.textops import ngram_perplexity


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def random_corpus(spark):
    # deterministic pseudo-random corpus: tiny vocabulary so bigram/bucket
    # collisions are common (the interesting regime for all three ops)
    vocab = ["alpha", "beta", "gamma", "delta", "the", "of"]
    rows = []
    for i in range(120):
        n = 4 + (i * 7) % 23
        words = [vocab[(i * 13 + j * 5) % len(vocab)] for j in range(n)]
        rows.append(
            (i, " ".join(words), ["en", "de", "fr"][i % 3], f"src{i % 4}", n)
        )
    return _docs(spark, rows)


def test_perplexity_tertiles_balanced_per_language(spark, random_corpus):
    """NTILE(3) guarantee: within every language, tertile sizes differ by
    at most 1, and every scored doc lands in exactly one bucket."""
    out = ngram_perplexity({"documents": random_corpus}).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r.lang, []).append(r.ppl_bucket)
    assert by_lang  # non-degenerate corpus
    for lang, buckets in by_lang.items():
        counts = [buckets.count(b) for b in ("head", "middle", "tail")]
        assert sum(counts) == len(buckets)
        assert max(counts) - min(counts) <= 1, (lang, counts)


def test_dsir_selects_exactly_top_quartile(spark, random_corpus):
    """DSIR keep rule == NTILE(4)=1: exactly ceil(N/4) docs selected, and
    they are precisely the top of the (weight DESC, doc_id ASC) order
    over ALL scored docs."""
    scored = random_corpus.count()
    sel = dsir_select(random_corpus).collect()
    assert len(sel) == math.ceil(scored / 4)
    # recompute the full ranking independently: selection must be a prefix
    all_w = dsir_select(random_corpus, keep_ntile=1).collect()  # keep all
    order = sorted(all_w, key=lambda r: (-r.weight, r.doc_id))
    expect = {(r.doc_id) for r in order[: len(sel)]}
    assert {r.doc_id for r in sel} == expect


def test_semdedup_rank_greedy_guarantee(spark):
    """The released-implementation rule, checked directly: a vector is
    removed IFF some same-cell vector with cosine >= tau precedes it in
    (cos_to_centroid ASC, vec_id ASC) order."""
    import itertools

    rows = []
    for i in range(60):
        # 8-dim deterministic vectors in a few tight directions so that
        # same-cell high-cosine pairs exist
        base = [(i % 5) + 1.0, (i % 3) + 1.0, 1.0, 0.5, 0.25, 0.0, 0.0, 1.0]
        vec = [x + 0.01 * ((i * 7 + j) % 11) for j, x in enumerate(base)]
        rows.append((i, vec, i % 2))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = {r.vec_id: r for r in semdedup({"embeddings": emb}, n_centroids=4).collect()}
    vecs = {r[0]: r[1] for r in rows}

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 3)

    cells = {}
    for vid, r in out.items():
        cells.setdefault(r.cid, []).append(vid)
    for cid, members in cells.items():
        order = sorted(members, key=lambda v: (out[v].cos_c, v))
        for idx, v in enumerate(order):
            has_pred = any(
                cos(vecs[v], vecs[u]) >= SEMDEDUP_TAU for u in order[:idx]
            )
            assert out[v].is_kept == (not has_pred), (cid, v)
