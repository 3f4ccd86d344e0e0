"""Semantic unit tests for the §2 completion sweep — properties the parity
hash can't see: ANN recall, fallback semantics, guard behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_optimizer_spark.operators import llm_doubles as LD
from ai_optimizer_spark.operators import misc as M
from ai_optimizer_spark.operators import similarity as S
from ai_optimizer_spark.tables import load_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def t(spark):
    return load_tables(spark, SF_DIR)


def test_ivf_recall_against_brute_force(t):
    """IVF with a wide probe must recover most of the exact top-8; with all
    cells probed it must match exactly (IVF-Flat degenerates to flat)."""
    exact = {r.vec_id for r in S.cosine_topk(t, query_id=0, k=8).collect()}
    full_probe = {
        r.vec_id
        for r in S.ivf_topk(t, query_id=0, k=8, n_centroids=16, n_probe=16).collect()
    }
    assert full_probe == exact
    partial = {
        r.vec_id
        for r in S.ivf_topk(t, query_id=0, k=8, n_centroids=16, n_probe=4).collect()
    }
    # partial probe returns a subset of the corpus ranked identically:
    # anything it returns that is also in exact must be correct, and
    # recall should be non-trivial on clustered synthetic data.
    assert len(partial & exact) >= 2


def test_classification_domain_and_fallback(t):
    routes = {r.route for r in LD.query_classification(t).select("route").distinct().collect()}
    assert routes <= {"nl2sql", "vecsearch", "both"}
    # fallback: a doc with no hint words lands on "both"
    spark = t["documents"].sparkSession
    blank = {"documents": spark.createDataFrame([(1, "zzz xyzzy", "en", "s", 9)],
                                                t["documents"].schema)}
    assert LD.query_classification(blank).first().route == "both"


def test_grade_blanking_contract(t):
    graded = LD.grade_blanking(t)
    bad = graded.filter((F.col("grade") == "no") & (F.col("graded_text") != "")).count()
    assert bad == 0


def test_semantic_routing_caps_at_three(t):
    assert LD.semantic_routing(t).count() <= 3


def test_single_line_guard_never_emits_newline(t):
    out = LD.single_line_guard(t)
    assert out.filter(F.col("question").contains("\n")).count() == 0
    # rejected rows fall back to the original text
    docs = t["documents"]
    joined = out.join(docs, "doc_id").filter(F.col("rejected"))
    assert joined.filter(F.col("question") != F.col("text")).count() == 0


def test_hex_roundtrip_lossless(t):
    assert M.hex_roundtrip(t).filter(~F.col("lossless")).count() == 0


def test_identifier_normalize_bounded_and_distinct(t):
    out = M.identifier_normalize(t)
    assert out.filter(F.length("identifier") > 25).count() == 0
    # compaction must not collapse distinct names
    n_names = t["part"].select("p_name").distinct().count()
    assert out.select("identifier").distinct().count() == n_names


def test_session_history_ordered(t):
    row = M.session_history(t).orderBy("user_id").first()
    assert row.n_turns == len(row.history.split("\n"))


def test_sketch_stats_bound_error_vs_exact(t):
    """HLL distinct within 5% of exact; sketch percentiles within 10% of
    exact interpolated percentiles (sf0.001 groups are small, so the
    quantile sketch at accuracy 10000 is effectively exact)."""
    got = {r.event_type: r for r in M.approx_sketch_stats(t).collect()}
    exact = {
        r.event_type: r
        for r in t["events"]
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    assert set(got) == set(exact) and len(got) > 0
    for et, e in exact.items():
        g = got[et]
        assert abs(g.approx_users - e.users) <= max(1, 0.05 * e.users)
        assert abs(g.p50_value_sketch - e.p50) <= 0.10 * max(1.0, e.p50)
        assert abs(g.p95_value_sketch - e.p95) <= 0.10 * max(1.0, e.p95)


def test_quality_resample_tracks_scores(spark, sf_small):
    """smp8: survival probability equals the quality score — the kept
    fraction approximates mean quality, every kept doc's hash-uniform is
    below its own p, and higher-quality docs are kept at a higher rate."""
    from ai_optimizer_spark.operators.sampling import quality_resample
    from ai_optimizer_spark.operators.textops import quality_score
    from ai_optimizer_spark.tables import load_tables

    t = load_tables(spark, sf_small)
    kept = quality_resample(t).collect()
    scores = {r.doc_id: r.quality for r in quality_score(t).collect()}
    n, mean_q = len(scores), sum(scores.values()) / len(scores)
    frac = len(kept) / n
    assert abs(frac - mean_q) < 0.1  # law of large numbers at fixture size
    assert all(r.quality == scores[r.doc_id] for r in kept)
    kept_ids = {r.doc_id for r in kept}
    hi = [d for d, q in scores.items() if q >= mean_q]
    lo = [d for d, q in scores.items() if q < mean_q]
    hi_rate = sum(1 for d in hi if d in kept_ids) / len(hi)
    lo_rate = sum(1 for d in lo if d in kept_ids) / len(lo)
    assert hi_rate > lo_rate


def test_token_budget_select_is_greedy_prefix(spark, sf_medium):
    """smp9: the kept set is EXACTLY the greedy (quality DESC, doc_id ASC)
    prefix whose inclusive token cumsum fits floor(frac × total) — verified
    against a driver-side recompute; cum_tok matches the flat prefix sum."""
    from ai_optimizer_spark.operators.sampling import BUDGET_FRAC, token_budget_select
    from ai_optimizer_spark.operators.textops import quality_score, token_stats
    from ai_optimizer_spark.tables import load_tables

    t = load_tables(spark, sf_medium)
    got = {r.doc_id: r for r in token_budget_select(t).collect()}
    q = {r.doc_id: r.quality for r in quality_score(t).collect()}
    tok = {r.doc_id: r.n_tokens for r in token_stats(t).collect()}
    budget = int(BUDGET_FRAC * sum(tok.values()))
    order = sorted(q, key=lambda d: (-q[d], d))
    cum, want = 0, {}
    for d in order:
        cum += tok[d]
        if cum <= budget:
            want[d] = cum
    assert set(got) == set(want)
    assert 0 < len(got) < len(q)  # a strict subset was selected
    for d, r in got.items():
        assert r.cum_tok == want[d]
        assert r.quality == q[d] and r.n_tokens == tok[d]


def test_kmv_sketch_error_bound_and_merge_algebra(spark, sf_medium):
    """a26: the KMV estimate must land within the k=64 error envelope of
    the exact distinct-shingle count (generous 25% bound vs the ~12.5%
    theoretical stddev), the sketch must be saturated (n_kept == k), and
    the MERGE algebra must hold: the k smallest hashes of the corpus ==
    k smallest of the union of two half-corpus sketches."""
    from pyspark.sql import functions as F

    from ai_optimizer_spark.functions import text as T
    from ai_optimizer_spark.operators.misc import KMV_K, kmv_distinct_shingles
    from ai_optimizer_spark.tables import load_tables

    t = load_tables(spark, sf_medium)
    row = kmv_distinct_shingles(t).collect()[0]
    assert row.n_kept == KMV_K == row.k
    assert abs(row.estimate - row.n_exact) / row.n_exact < 0.25

    docs = t["documents"]

    def k_smallest(df):
        return [
            r.h
            for r in df.select(
                F.explode(T.word_shingles(F.col("text"))).alias("sh")
            )
            .distinct()
            .select((T.hash60(F.col("sh")) / F.lit(float(1 << 60))).alias("h"))
            .orderBy(F.asc("h"))
            .limit(KMV_K)
            .collect()
        ]

    whole = k_smallest(docs)
    half_a = k_smallest(docs.filter(F.col("doc_id") % 2 == 0))
    half_b = k_smallest(docs.filter(F.col("doc_id") % 2 == 1))
    merged = sorted(set(half_a) | set(half_b))[:KMV_K]
    assert merged == whole


def test_cms_never_undercounts_and_merges(spark, sf_medium):
    """a27: the CMS point estimate can only OVERcount (min over rows of a
    counter that includes the term's own hits), the overcount must sit
    inside the Cormode-Muthukrishnan envelope (e*N/W per row; generous
    2N/W here), and the sketch must be ALGEBRAIC: cell counts of the
    corpus == elementwise sum of two half-corpus sketches."""
    from pyspark.sql import functions as F

    from ai_optimizer_spark.functions import text as T
    from ai_optimizer_spark.operators.misc import (
        CMS_SEEDS,
        CMS_TOP_N,
        CMS_W,
        cms_heavy_hitters,
        _cms_cells,
    )
    from ai_optimizer_spark.tables import load_tables

    t = load_tables(spark, sf_medium)
    rows = cms_heavy_hitters(t).collect()
    assert len(rows) == CMS_TOP_N
    n_tokens = t["documents"].select(
        F.sum(F.size(T.words("text")))
    ).collect()[0][0]
    for r in rows:
        assert r.overcount >= 0, f"CMS undercounted {r.term}"
        assert r.est_count == r.n_exact + r.overcount
        assert r.overcount <= 2 * n_tokens / CMS_W

    docs = t["documents"]

    def sketch_cells(df):
        out = {}
        cells = (
            df.select(F.explode(T.words("text")).alias("term"))
            .select(_cms_cells(F.col("term"), CMS_SEEDS, CMS_W).alias("sb"))
            .groupBy("sb.seed", "sb.bucket")
            .count()
            .collect()
        )
        for r in cells:
            out[(r.seed, r.bucket)] = r["count"]
        return out

    whole = sketch_cells(docs)
    half_a = sketch_cells(docs.filter(F.col("doc_id") % 2 == 0))
    half_b = sketch_cells(docs.filter(F.col("doc_id") % 2 == 1))
    merged = {
        k: half_a.get(k, 0) + half_b.get(k, 0)
        for k in set(half_a) | set(half_b)
    }
    assert merged == whole


def test_kmv_overlap_error_envelope(spark, sf_medium):
    """a28: every pair's estimate must land within the k=64 KMV error
    envelope of the exact Jaccard (stddev ~ sqrt(J(1-J)/k) <= 0.0625;
    generous additive 0.2 bound), n_kept must saturate at k wherever the
    union has >= k distinct shingles, and the estimate must be a valid
    fraction of n_kept."""
    from ai_optimizer_spark.operators.misc import (
        KMV_K,
        KMV_PAIRS,
        kmv_source_overlap,
    )
    from ai_optimizer_spark.tables import load_tables

    t = load_tables(spark, sf_medium)
    rows = kmv_source_overlap(t).collect()
    assert {(r.src_a, r.src_b) for r in rows} == set(KMV_PAIRS)
    for r in rows:
        assert r.k == KMV_K
        assert 0 < r.n_kept <= KMV_K
        assert 0.0 <= r.jaccard_est <= 1.0
        assert abs(r.jaccard_est - r.jaccard_exact) <= 0.2, (
            f"({r.src_a},{r.src_b}): est {r.jaccard_est} "
            f"vs exact {r.jaccard_exact}"
        )
    # the fixtures have real overlap — the op must detect SOME of it
    assert any(r.jaccard_exact > 0 for r in rows)
    assert any(r.jaccard_est > 0 for r in rows)


def test_weighted_sample_fixed_size_and_quality_biased(spark, sf_medium):
    """smp14: the A-ES draw must return EXACTLY n distinct documents (the
    fixed-size property smp8's Bernoulli resample lacks), must be
    deterministic, and must be genuinely weight-biased: the sample's
    mean quality exceeds the corpus mean (higher-w docs get larger
    ln(u)/w keys in expectation)."""
    from pyspark.sql import functions as F

    from ai_optimizer_spark.operators.sampling import WSAMP_N, weighted_sample
    from ai_optimizer_spark.operators.textops import quality_score
    from ai_optimizer_spark.tables import load_tables

    t = load_tables(spark, sf_medium)
    rows = weighted_sample(t).collect()
    assert len(rows) == WSAMP_N
    assert len({r.doc_id for r in rows}) == WSAMP_N
    again = weighted_sample(t).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]

    corpus_mean = quality_score(t).agg(F.avg("quality")).collect()[0][0]
    sample_mean = sum(r.quality for r in rows) / len(rows)
    assert sample_mean > corpus_mean
