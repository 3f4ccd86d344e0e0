"""Property-based verification of smp12 curriculum staging: for ANY corpus
(random length multisets, heavy ties), the operator's stage assignment
matches a direct Python reference of the exact-quantile definition
stage(v) = ceil(cum(v) * S / N) - 1 over non-NULL lengths, positions are
dense per (stage, shard), and NULL-text docs are excluded entirely."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from ai_optimizer_spark.operators.sampling import (
    CURRICULUM_SHARDS,
    CURRICULUM_STAGES,
    curriculum_order,
)


def reference_stages(lengths: list[int], s: int = CURRICULUM_STAGES):
    n = len(lengths)
    out = {}
    cum = 0
    for v in sorted(set(lengths)):
        cum += lengths.count(v)
        out[v] = (cum * s - 1) // n
    return out


# lengths in words; a couple of None entries model NULL text
corpus = st.lists(
    st.one_of(st.integers(min_value=1, max_value=9), st.none()),
    min_size=1,
    max_size=40,
)


@settings(max_examples=12, deadline=None)
@given(lengths=corpus)
def test_curriculum_matches_exact_quantile_reference(lengths, spark):
    rows = [
        (
            i,
            None if L is None else " ".join(["w"] * L),
            "en",
            "s",
            0 if L is None else L,
        )
        for i, L in enumerate(lengths)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = curriculum_order({"documents": docs}).collect()
    real = [L for L in lengths if L is not None]
    assert len(out) == len(real)
    if not real:
        return
    want = reference_stages(real)
    per_cell = {}
    for r in out:
        assert lengths[r.doc_id] is not None  # NULL-text docs excluded
        assert r.n_tokens == lengths[r.doc_id]
        assert r.stage == want[r.n_tokens], (r.n_tokens, r.stage, want)
        assert 0 <= r.shard < CURRICULUM_SHARDS
        per_cell.setdefault((r.stage, r.shard), []).append(r.pos)
    for poss in per_cell.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
