"""Deduplication operators over the `documents` corpus — SURVEY.md §2.8 plus
the LLM-training-pipeline dedup family (BASELINE.json north star): exact,
n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale design (the whole point of these):
  * exact dedup — hash-aggregate on content; one shuffle keyed by the text
    (at 100 TB: key by fingerprint hash, not the raw text, to shrink the
    shuffle — both provided).
  * n-gram Jaccard — the *verifier*: all-pairs via an inverted index
    (explode shingles → self-join on shingle). Quadratic in the worst case;
    at scale it runs ONLY on LSH candidate pairs.
  * MinHash+LSH — the scale path: k seeded min-hashes → bands → bucket
    join. Candidate generation is linear in corpus size; banding keys are
    small longs, so the shuffle is narrow. Candidates verified with exact
    Jaccard (on the same shingle sets) before being reported.
  * SimHash — constant-size signature (one BIGINT), hamming ≤ d pairs.
  * embedding near-dup — cosine over ARRAY<FLOAT>; at scale pre-bucket with
    functions.vector.sign_bucket so only same-bucket pairs are compared.

All hashing uses the portable md5-based hash60 so every operator is
verifiable bit-for-bit against the DuckDB oracle (functions/text.py).
Reference anchors: exact dedup embed/vector_store.py:112-118 (first-wins);
the near-dup family is the engine's extension per the driver's north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..cache import shared_persist
from ..functions import vector as V
from ..tables import widen_scan

SHINGLE_N = 3
JACCARD_THRESHOLD = 0.8
MINHASH_HASHES = 8
LSH_BAND_ROWS = 2  # 4 bands of 2 hashes
# 60-bit signatures (the full hash60 width) with hamming ≤ 7: measured on
# the driver corpus, planted near-dups sit at hamming 1-7 while random doc
# pairs have median hamming 30 and 5th percentile 24 — full recall with a
# wide precision margin. The previous 32-bit/≤6 config saturated on
# template-heavy corpora (unrelated docs collided within threshold, so
# reported pairs grew superlinearly with corpus size — measured in
# scale_probe.py). Wide fingerprints + small hamming radius is the
# published configuration for simhash dedup at web scale (Manku et al.,
# WWW 2007, "Detecting Near-Duplicates for Web Crawling" — 64-bit, k=3).
SIMHASH_BITS = 60
SIMHASH_MAX_HAMMING = 7
COSINE_NEARDUP_THRESHOLD = 0.45


def exact_dedup(t: dict[str, DataFrame]) -> DataFrame:
    """D1: exact dedup by content, first occurrence wins (the reference
    dedups on page_content with a seen-set before embedding,
    embed/vector_store.py:112-118 — order = insertion; here "first" =
    lowest doc_id, the deterministic equivalent)."""
    w = Window.partitionBy("text").orderBy(F.asc("doc_id"))
    return (
        t["documents"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_chars")
    )


def exact_dedup_hashkey(t: dict[str, DataFrame]) -> DataFrame:
    """D1 at scale: identical semantics to exact_dedup but the shuffle key
    is md5(text) instead of the raw text — at 100 TB the exchange carries
    32-byte digests, not document bodies (the docstring's 'key by
    fingerprint' variant). Same oracle as d1: md5 collisions are absent on
    any real corpus, and a paranoid deployment appends length to the key."""
    w = Window.partitionBy(F.md5("text")).orderBy(F.asc("doc_id"))
    return (
        t["documents"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "n_chars")
    )


def _shingle_sets(docs: DataFrame) -> DataFrame:
    """(doc_id, shingle) exploded inverted index + per-doc set size.
    The scan is widened first: one md5 per shingle is the dominant map cost
    and must fan out across cores (no-op on real multi-row-group tables)."""
    docs = widen_scan(docs)
    return docs.select(
        "doc_id", F.explode(T.word_shingles("text", SHINGLE_N)).alias("shingle")
    )


HOT_SHINGLE_BAR = 64  # shingles in more docs than this get grid-salted
MAX_SHINGLE_SALT = 64  # grid-width cap: replication factor is S per row


def _grid_salt_width(max_hot_docs: int) -> int:
    """Grid width S for the hot-shingle salted join, derived from the
    OBSERVED hottest key instead of a constant (advice/verdict r9: a
    fixed S=8 still serialized B²/64 pairs per cell on a 10x-hotter
    key). Sizing rule: each grid cell should see ~HOT_SHINGLE_BAR docs
    per side — S = next power of two ≥ max_hot / BAR — so per-cell pair
    work stays ~BAR² regardless of how hot the corpus runs. Capped at
    MAX_SHINGLE_SALT: replication cost is S per hot row, and beyond the
    cap the right fix is LSH candidate filtering, not a wider grid."""
    import math

    if max_hot_docs <= HOT_SHINGLE_BAR:
        return 1
    want = math.ceil(max_hot_docs / HOT_SHINGLE_BAR)
    return max(2, min(MAX_SHINGLE_SALT, 2 ** math.ceil(math.log2(want))))


def ngram_jaccard_pairs(
    t: dict[str, DataFrame], threshold: float = JACCARD_THRESHOLD
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard ≥ threshold.

    Inverted-index self-join: |intersection| from matching shingles,
    |union| = |A|+|B|-|∩|. At 100 TB this exact form runs on LSH
    candidates only (see minhash_lsh_pairs).

    SKEW (r9, measured): a shingle shared by B docs places its whole
    O(B²) pair enumeration on ONE join key — one task. On a skewed 80k
    tile with a 10% boilerplate block, the sampled truth side's hot key
    ran 80.3 s against a 1.4 s stage median (58x straggler,
    tools/skew_probe.py). Hot shingles (doc count > HOT_SHINGLE_BAR) are
    therefore GRID-SALTED: side A replicates over gb, side B over ga,
    and the join adds (ga, gb) to the key, splitting each hot key's pair
    space S×S ways. Results are identical (each (a,b) pair meets in
    exactly one grid cell — (ga(a), gb(b))); only the physical plan
    changes, and cold shingles keep the plain join, so balanced corpora
    pay one extra map-side count and nothing else."""
    # persisted: the shingle index feeds three consumers (sizes + both join
    # sides) — without it each one replays the explode over the corpus text
    sh = _shingle_sets(t["documents"]).transform(shared_persist)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))

    by_key = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("n_docs"))
    # one scalar action over the persisted index sizes the grid to the
    # corpus actually in front of us (see _grid_salt_width)
    max_hot = by_key.agg(F.max("n_docs").alias("m")).collect()[0].m or 0
    hot_keys = F.broadcast(
        by_key.filter(F.col("n_docs") > HOT_SHINGLE_BAR).select("shingle")
    )
    cold = sh.join(hot_keys, "shingle", "left_anti")
    a, b = cold.alias("a"), cold.alias("b")
    matches_cold = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))

    hot = sh.join(hot_keys, "shingle", "left_semi")
    s_lit = _grid_salt_width(int(max_hot))
    # replication via explode(array(...)), NOT a crossJoin with a salt
    # table: Catalyst reassociates cross joins and demoted the grid join
    # to keys (shingle, ga) with the gb equality applied as a separate
    # cross join afterwards — re-serializing the hot key (measured: 5x
    # total work). An exploded projection pins all three key columns to
    # the join input, so the equi-join MUST key on (shingle, ga, gb).
    all_salts = F.array(*[F.lit(i) for i in range(s_lit)])
    ha = (
        hot.withColumn("ga", F.pmod(F.hash("doc_id"), F.lit(s_lit)))
        .withColumn("gb", F.explode(all_salts))
        .alias("ha")
    )
    hb = (
        hot.withColumn("gb", F.pmod(F.hash("doc_id"), F.lit(s_lit)))
        .withColumn("ga", F.explode(all_salts))
        .alias("hb")
    )
    # merge hint: the exploded hot side's size estimate is garbage
    # downstream of persist+semi-join+explode, and Catalyst broadcast a
    # 3.6M-row replicated build side on the 80k skew tile (heap OOM).
    # The grid join exists to SHUFFLE on (shingle, ga, gb); say so.
    matches_hot = ha.hint("merge").join(
        hb,
        (F.col("ha.shingle") == F.col("hb.shingle"))
        & (F.col("ha.ga") == F.col("hb.ga"))
        & (F.col("ha.gb") == F.col("hb.gb"))
        & (F.col("ha.doc_id") < F.col("hb.doc_id")),
    ).select(F.col("ha.doc_id").alias("da"), F.col("hb.doc_id").alias("db"))

    inter = (
        matches_cold.unionByName(matches_hot)
        .groupBy(F.col("da").alias("doc_a"), F.col("db").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.round(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 3
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(
    t: dict[str, DataFrame],
    threshold: float = JACCARD_THRESHOLD,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup: k=8 portable min-hashes, banded (r=2 → 4
    bands); docs sharing any band bucket become candidates; candidates are
    verified with exact Jaccard before being reported.

    Scale shape: one md5 per shingle (the universal-hash family derives the
    k functions arithmetically); signatures come from partial-aggregable
    MINs over the exploded shingle index, which is cached and reused for
    verification; the band bucket join touches only colliding docs — this
    is the 100 TB dedup plan, end to end.

    `max_bucket_size` is the skew guard for real corpora: a band key shared
    by B docs emits O(B²) candidates, and boilerplate-heavy corpora produce
    degenerate buckets (cookie banners, license headers) that would send a
    quadratic wave through verification. Buckets above the cap are dropped
    whole — the standard industrial LSH trade (those docs still pair via
    their other, more selective bands). Default None = exact candidates.

    CROSS-REFERENCE (ADVICE r10): d21/d21b `lsh_recall` computes this
    operator's verified pair set as candidates ∩ ngram_jaccard_pairs —
    sound ONLY while this verification keeps the same shingle index,
    JACCARD_THRESHOLD and round(…, 3) as ngram_jaccard_pairs. If either
    path's threshold or rounding changes, change BOTH and re-run
    tests/test_text_dedup.py::
    test_lsh_recall_intersection_equals_verified_lsh_pairs."""
    sh, sig, candidates = _lsh_candidate_pairs(t, max_bucket_size)

    # verify candidates with exact jaccard on the (cached) shingle index:
    # the candidate set is tiny by construction (band collisions only), so
    # it broadcasts into both index joins — the full index never reshuffles
    sizes = sig.select("doc_id", "n_sh")
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    # shrink BOTH probe sides to candidate docs before any wide join: the
    # right side would otherwise shuffle the entire shingle index on
    # (doc_b, shingle) even though only colliding docs can intersect
    cand_b = candidates.select("doc_b").distinct()
    b = (
        sh.join(F.broadcast(cand_b), sh["doc_id"] == cand_b["doc_b"])
        .select("doc_b", "shingle")
    )
    inter = (
        a.join(F.broadcast(candidates), "doc_a")
        .join(b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.round(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 3
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _lsh_signatures(docs: DataFrame) -> DataFrame:
    """THE MinHash signature aggregation — (doc_id, n_sh, mh0..mh7), one
    pass over the shingle index (md5 once per shingle; the per-doc set
    size rides along in the same partial aggregate for free).

    Defined ONCE (r11) so every batch consumer — `_lsh_candidate_pairs`
    (d3/d6/d21/cascades) and `minhash_band_keys` (d17 profile, d22 sweep,
    d24 incremental, st12 static side) — instantiates the IDENTICAL
    logical subtree: when any one of them is persisted (`shared_persist`),
    Catalyst substitutes that InMemoryRelation into all the others, so a
    composed plan like e2e_auto_curation (d17 profile + LSH stage) runs
    the signature pass once instead of once per consumer."""
    sh = _shingle_sets(docs)
    hashed = sh.withColumn("base", T.hash60(F.col("shingle")))
    return hashed.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        *[
            F.min(term).alias(f"mh{s}")
            for s, term in enumerate(T.minhash_terms(F.col("base"), MINHASH_HASHES))
        ],
    )


def _lsh_candidate_pairs(
    t: dict[str, DataFrame], max_bucket_size: int | None = None
):
    """(shingle index, signatures, candidate pairs) — the banded-LSH
    candidate machinery shared by minhash_lsh_pairs (which verifies the
    candidates against exact Jaccard) and lsh_recall (which intersects
    them with the exact pair set it has already computed)."""
    docs = t["documents"]
    sh = _shingle_sets(docs).transform(shared_persist)
    sig = _lsh_signatures(docs).transform(shared_persist)

    n_bands = MINHASH_HASHES // LSH_BAND_ROWS
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(band).alias("band"),
                        F.concat_ws(
                            ":",
                            *[
                                F.col(f"mh{band * LSH_BAND_ROWS + r}")
                                for r in range(LSH_BAND_ROWS)
                            ],
                        ).alias("key"),
                    )
                    for band in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    if max_bucket_size is not None:
        bucket_sizes = bands.groupBy("band", "key").agg(
            F.count(F.lit(1)).alias("bucket_n")
        )
        bands = (
            bands.join(bucket_sizes, ["band", "key"])
            .filter(F.col("bucket_n") <= max_bucket_size)
            .drop("bucket_n")
        )

    ba, bb = bands.alias("ba"), bands.alias("bb")
    # persisted (r11): every consumer BROADCASTS this table — verification
    # probes it twice (the pair set and its distinct doc_b side) and
    # lsh_recall semi-joins it; without the persist the band self-join +
    # distinct replays once per broadcast. The rows are the near-dup
    # candidate pairs only — tiny by construction at any corpus size.
    candidates = (
        ba.join(
            bb,
            (F.col("ba.band") == F.col("bb.band"))
            & (F.col("ba.key") == F.col("bb.key"))
            & (F.col("ba.doc_id") < F.col("bb.doc_id")),
        )
        .select(F.col("ba.doc_id").alias("doc_a"), F.col("bb.doc_id").alias("doc_b"))
        .distinct()
        .transform(shared_persist)
    )
    return sh, sig, candidates


def simhash_signatures(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over shingle hash60s: bit i is the majority of bit i
    across the set's hashes (ties → 0).

    Computed as ONE higher-order-function fold over the shingle array — a
    pure projection fused into the scan, zero shuffle (the earlier
    explode+groupBy form shuffled a (doc_id, 32 partial sums) exchange;
    measured at sf0.1 the fold is ~1.8× faster AND removes the exchange
    entirely, so at 100 TB signatures are a map-only pass). Each shingle is
    md5-hashed exactly once; the inner `transform` accumulates the 32 bit
    counts in an array, then the majority vote packs the signature long.
    Docs with no shingles (< n words) are dropped, matching the explode
    form, where they vanish with the empty array."""
    docs = widen_scan(docs)
    hashes = F.transform(T.word_shingles("text", SHINGLE_N), lambda s: T.hash60(s))
    fold = f"""
      aggregate(
        zip_with(
          aggregate(
            __h__,
            array_repeat(CAST(0 AS BIGINT), {bits}),
            (acc, h) -> transform(acc, (c, i) -> c + ((h >> i) & 1))
          ),
          sequence(0, {bits - 1}),
          (s, i) -> IF(s * 2 > size(__h__),
                       shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT))
        ),
        CAST(0 AS BIGINT), (a, x) -> a + x)
    """
    # the no-shingle filter tests the cheap word count, NOT size(__h__):
    # a pushed-down filter on the hash array would re-evaluate the whole
    # shingle-hashing transform once in the Filter and again in the Project
    # (word_shingles yields non-empty iff the doc has ≥ n words, so the
    # predicates are equivalent)
    return (
        docs.filter(F.size(T.words("text")) >= SHINGLE_N)
        .withColumn("__h__", hashes)
        .select(
            "doc_id",
            F.expr(fold.replace("__h__", "`__h__`")).alias("simhash"),
        )
    )


def simhash_pairs(
    t: dict[str, DataFrame], max_hamming: int = SIMHASH_MAX_HAMMING
) -> DataFrame:
    """SimHash near-dup pairs: hamming(sig_a, sig_b) ≤ d. The signature is
    ONE long per doc, so the pair scan is a compact self-join; at scale,
    block on a signature prefix so only same-prefix pairs are compared."""
    # same materialization barrier as simhash_pairs_blocked: without it the
    # signature fold re-evaluates per candidate pair inside the join
    sig = simhash_signatures(t["documents"]).localCheckpoint(eager=False)
    a, b = sig.alias("a"), sig.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    ).cast("int")
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_neardup_pairs(
    t: dict[str, DataFrame], threshold: float = COSINE_NEARDUP_THRESHOLD
) -> DataFrame:
    """Embedding-cosine near-dup: pairs with cos ≥ threshold. Brute-force
    pair scan here; the 100 TB plan prepends a sign_bucket equality join
    (see lsh variant) so only same-bucket pairs are scored."""
    emb = t["embeddings"]
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    cos = F.round(V.cosine_similarity("ea", "eb"), 3) + F.lit(0.0)
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def embedding_neardup_blocked(
    t: dict[str, DataFrame],
    threshold: float = COSINE_NEARDUP_THRESHOLD,
    n_bits: int = 4,
) -> DataFrame:
    """Embedding near-dup, blocked: the 100 TB form of
    embedding_neardup_pairs — a sign-LSH bucket equality join replaces the
    all-pairs scan, so candidate volume scales with bucket occupancy, not
    n². Deliberately approximate (cross-bucket near-dups are not reported;
    recall rises as n_bits falls), which is the trade production embedding
    dedup makes; the oracle encodes the same bucket function, so the
    approximation itself is hash-verified. At scale the store is written
    clustered by bucket → the self-join becomes partition-local."""
    emb = t["embeddings"].withColumn("bucket", V.sign_bucket("embedding", n_bits))
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "bucket"
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "bucket"
    )
    cos = F.round(V.cosine_similarity("ea", "eb"), 3) + F.lit(0.0)
    return (
        a.join(b, ["bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("bucket", "vec_a", "vec_b", cos.alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


# Production default for the LSH bucket-size skew guard (see
# minhash_lsh_pairs): boilerplate-heavy corpora (cookie banners, license
# headers) produce degenerate band buckets whose O(B²) candidate fan-out
# would dominate verification; 200 keeps the worst bucket's contribution to
# ~20k pairs while leaving realistic near-dup buckets (a handful of docs)
# untouched — those docs still pair via their more selective bands.
LSH_MAX_BUCKET_DEFAULT = 200


def dedup_clusters(t: dict[str, DataFrame], max_iters: int = 15) -> DataFrame:
    """Near-dup *clustering*: LSH pairs → connected components → canonical
    pick (min doc_id per component). Pairs alone under-delete — if A~B and
    B~C, keeping "one of each pair" can still keep two of {A,B,C}; the
    component is the dedup unit.

    Components via iterative min-label propagation: each round every node
    takes the min label among itself and its neighbors — one shuffle join
    per round, converging in O(component diameter) rounds. LSH components
    are band-bucket cliques overlapped into dense blobs, so diameters are
    tiny (2-3 rounds in practice); `localCheckpoint` truncates lineage each
    round so the loop's plan doesn't snowball. The driver loop only runs
    the convergence probe; all data work is distributed.
    """
    labels, edges = _propagate_labels(t, max_iters)
    # Nodes outside every LSH pair never receive a message: they keep their
    # own id as label. Skip them in the loop entirely (the iterated joins
    # touch only the near-dup subgraph — a vanishing fraction of a deduped
    # corpus) and re-attach them here with one anti-join.
    singletons = (
        t["documents"]
        .join(labels, "doc_id", "left_anti")
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
    )
    return labels.union(singletons).select(
        "doc_id",
        "cluster_id",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_canonical"),
    )


def cluster_survivors(t: dict[str, DataFrame], max_iters: int = 15) -> DataFrame:
    """Cluster-level *survivorship*: near-dup components (dedup_clusters)
    reduced to ONE surviving document per cluster — the best-quality member
    under the tx2 heuristic (quality DESC, doc_id ASC tiebreak), so the same
    score that gates curation filtering also picks which duplicate to keep.
    Emits (cluster_id, survivor_id, n_members, survivor_quality); singleton
    docs survive as their own one-member cluster.

    Scale shape: the winner comes from a partial-aggregable
    MAX(struct(quality, -doc_id)) hash aggregate — map-side combine, one
    narrow shuffle of (cluster_id, struct) — NOT a row_number window, which
    would sort every cluster's rows inside a full-width shuffle. Component
    labels touch only the LSH near-dup subgraph (dedup_clusters); quality is
    a scan-fused array fold. Reference semantics: the keep-best policy of
    embed/vector_store.py:112-118 lifted from exact-equality groups to
    near-dup components.
    """
    from .textops import quality_parts

    docs = t["documents"]
    *_rest, quality = quality_parts(T.words("text"))
    scored = docs.select("doc_id", quality.alias("quality"))
    labels = dedup_clusters(t, max_iters=max_iters).select("doc_id", "cluster_id")
    best = (
        labels.join(scored, "doc_id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.max(
                F.struct(
                    F.col("quality").alias("q"),
                    (-F.col("doc_id")).alias("neg_id"),
                )
            ).alias("w"),
        )
    )
    return best.select(
        "cluster_id",
        (-F.col("w.neg_id")).alias("survivor_id"),
        "n_members",
        F.col("w.q").alias("survivor_quality"),
    )


def corpus_dup_profile(t: dict[str, DataFrame]) -> DataFrame:
    """Corpus duplicate-rate profile WITHOUT materializing a single candidate
    pair: per LSH band, fold the bucket-size distribution to (n_buckets,
    n_colliding_buckets, candidate_pairs, colliding_docs). candidate_pairs =
    Σ n·(n−1)/2 over buckets is exactly the verification workload a full
    MinHash dedup run would face, and colliding_docs/N upper-bounds the
    duplicate fraction — this is the pre-flight estimator you run on 100 TB
    BEFORE committing to pairwise verification (and the skew probe that
    sizes minhash_lsh_pairs' max_bucket_size cap).

    Scale shape: strictly cheaper than any dedup op — one narrow shuffle of
    (band, key) digests for the bucket count, then a 4-group partial agg.
    No doc bodies move; nothing quadratic exists anywhere in the plan.
    """
    bands = minhash_band_keys(t["documents"])
    buckets = bands.groupBy("band", "key").agg(F.count(F.lit(1)).alias("n"))
    colliding = F.col("n") >= 2
    # n·(n−1) is even, so integer DIV is exact (double division would lose
    # exactness for giant boilerplate buckets at corpus scale)
    npairs = F.expr("n * (n - 1) DIV 2")
    return buckets.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(colliding, 1).otherwise(0)).cast("long").alias("n_colliding_buckets"),
        F.sum(npairs).cast("long").alias("candidate_pairs"),
        F.sum(F.when(colliding, F.col("n")).otherwise(0)).cast("long").alias("colliding_docs"),
        F.max("n").cast("long").alias("max_bucket_n"),
    )


def choose_lsh_bucket_cap(profile: DataFrame, headroom: float = 4.0) -> int:
    """Turn a corpus_dup_profile into a `max_bucket_size` for
    minhash_lsh_pairs. Genuine near-dup groups sit near the MEAN colliding-
    bucket size (colliding_docs / n_colliding_buckets); boilerplate buckets
    (cookie banners, license headers) sit orders of magnitude above it and
    are what the cap exists to drop. Cap = headroom × the worst band's mean,
    clamped to [2, observed max] (below 2 drops ALL collisions; beyond the
    max the cap is a no-op). The profile is n_bands rows, so the collect is
    O(1) — this is how a 100 TB run sizes its skew guard from the cheap
    pre-flight probe instead of a guess."""
    import math

    rows = [r for r in profile.collect() if r.n_colliding_buckets]
    if not rows:
        return 2
    mean = max(r.colliding_docs / r.n_colliding_buckets for r in rows)
    max_seen = max(r.max_bucket_n for r in rows)
    return max(2, min(math.ceil(headroom * mean), max_seen))


def dedup_losers(
    t: dict[str, DataFrame],
    max_iters: int = 15,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Just the doc_ids to DROP (non-canonical component members) — the set
    a curation plan anti-joins against. Stays entirely on the near-dup
    subgraph: never materializes a full-corpus label table.
    `max_bucket_size` is the LSH skew guard (production paths pass
    LSH_MAX_BUCKET_DEFAULT)."""
    labels, _edges = _propagate_labels(t, max_iters, max_bucket_size)
    return labels.filter(F.col("cluster_id") != F.col("doc_id")).select("doc_id")


# Edge count below which connected components run as driver-side union-find
# instead of the iterated distributed propagation. The near-dup subgraph of a
# deduped corpus is orders of magnitude smaller than the corpus (it is ONLY
# the docs with an LSH collision), so even at 100 TB it commonly fits here;
# the distributed loop remains the unbounded fallback. Same labels either
# way: components with min-doc_id canonicals are order-free and exact.
DRIVER_COMPONENT_EDGE_CAP = 2_000_000


def _unionfind_labels(pairs: DataFrame):
    """Collect the (tiny) pair list and label components with union-find +
    path compression; canonical = component min. One job, zero iterations."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for r in pairs.collect():
        a, b = r.doc_a, r.doc_b
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so every root IS its component's canonical id
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    rows = [(x, find(x)) for x in parent]
    return pairs.sparkSession.createDataFrame(
        rows, "doc_id long, cluster_id long"
    )


def _propagate_labels(
    t: dict[str, DataFrame], max_iters: int, max_bucket_size: int | None = None
):
    """Connected components over the LSH-pair subgraph only. Returns
    (labels, edges) — labels covers exactly the edge-endpoint nodes. The
    edge list STAYS persisted deliberately: it is the LSH pair set, tiny by
    construction (near-dup pairs only), and a curation session reuses it
    across losers/clusters/stats calls — re-deriving it re-runs the whole
    MinHash+verification cascade.

    Adaptive strategy: the subgraph's edge list is counted first (it is
    already persisted for the loop); below DRIVER_COMPONENT_EDGE_CAP the
    components come from one collect + union-find — the iterated joins are
    pure scheduling overhead at that size. Above the cap, distributed
    min-label propagation runs as before."""
    pairs = minhash_lsh_pairs(t, max_bucket_size=max_bucket_size).select(
        "doc_a", "doc_b"
    )
    # both edge directions from ONE pass over the pair plan: a self-union
    # would duplicate the whole LSH subtree in the logical plan and compute
    # MinHash+verification twice (exchange reuse is not guaranteed);
    # explode(array(fwd, rev)) is a narrow 1→2 map over a single computation
    edges = (
        pairs.select(
            F.explode(
                F.array(
                    F.struct(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
                    F.struct(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")),
                )
            ).alias("e")
        )
        .select("e.a", "e.b")
        .transform(shared_persist)
    )
    if edges.count() <= 2 * DRIVER_COMPONENT_EDGE_CAP:  # edges = both directions
        small = edges.filter(F.col("a") < F.col("b")).select(
            F.col("a").alias("doc_a"), F.col("b").alias("doc_b")
        )  # reads the persisted edge list — the LSH plan does not recompute
        return _unionfind_labels(small), edges
    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("cluster_id"))
        .localCheckpoint(eager=True)
    )
    label_sum = labels.agg(F.sum("cluster_id")).first()[0]

    for _ in range(max_iters):
        msgs = edges.join(labels, edges["a"] == labels["doc_id"]).select(
            F.col("b").alias("doc_id"), "cluster_id"
        )
        labels = (
            labels.union(msgs)
            .groupBy("doc_id")
            .agg(F.min("cluster_id").alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        # labels are monotone non-increasing, so any change strictly lowers
        # the sum: one scalar agg over the (checkpointed, subgraph-sized)
        # label table is the convergence probe — no join, no second pass
        new_sum = labels.agg(F.sum("cluster_id")).first()[0]
        if new_sum == label_sum:
            break
        label_sum = new_sum
    return labels, edges


def simhash_pairs_blocked(
    t: dict[str, DataFrame],
    max_hamming: int = SIMHASH_MAX_HAMMING,
    n_blocks: int | None = None,
    match_blocks: int | None = None,
) -> DataFrame:
    """SimHash pairs via pigeonhole blocking — the 100 TB form of
    simhash_pairs with the IDENTICAL result set (same oracle).

    Generalized Manku-style combination blocking: split the signature into
    `n_blocks` bit blocks; a pair within hamming d differs in at most d
    blocks, so it AGREES exactly on some (n_blocks - d)-subset. Keying on
    every combination of `match_blocks` = n_blocks - d blocks turns the
    all-pairs scan into an equi-join on (combo_id, concatenated block
    values) with ZERO false negatives; verification (full hamming ≤ d)
    removes false positives.

    Why combinations beat single blocks at scale: with B=d+1 single blocks
    the join key is only ~SIMHASH_BITS/(d+1) bits wide (≈7 bits at
    60/7), so candidate volume is ~B·n²/2^7 — a quadratic term with a
    small constant that the 16× scale probe surfaced (9.4× time at 16×
    data, SCALE.md). With B blocks matched m at a time the key widens to
    ~m·60/B bits: candidates scale by C(B,m)/2^(m·60/B) — orders of
    magnitude fewer — at the linear cost of C(B,m) keys per doc. The
    default stays (B=d+1, m=1): measured fastest through 320k docs, where
    the explode/shuffle term still dominates the candidate term (SCALE.md
    finding 5); `choose_simhash_blocking(n_docs)` picks wider combos once
    the n² term bites (multi-million-doc corpora).

    The distinct() dedups pairs colliding in several combos; its exchange
    carries ONLY verified pairs (post-hamming survivors — output-sized, not
    candidate-sized), so it is the cheapest dedup available. Measured
    alternative (sf0.1, rejected): a "first matching block" join predicate
    eliminates the distinct but evaluates block re-extraction on every
    candidate row — 30-60% slower than the tiny exchange it saves."""
    from itertools import combinations

    if n_blocks is None:
        n_blocks = max_hamming + 1  # (d+1, 1): measured fastest ≤320k docs
    if match_blocks is None:
        match_blocks = n_blocks - max_hamming
    if n_blocks - match_blocks < max_hamming:
        raise ValueError(
            f"pigeonhole violated: need n_blocks - match_blocks >= max_hamming, "
            f"got {n_blocks} - {match_blocks} < {max_hamming}"
        )
    # Materialize signatures ONCE before the self-join. The fold form of
    # simhash_signatures is a pure projection with no exchange below it, so
    # without a barrier codegen defers the (expensive, shingle-hashing)
    # fold into the join and re-evaluates it per CANDIDATE PAIR — measured
    # 93 s vs 1.4 s at sf0.1. localCheckpoint pins the computed
    # (doc_id, simhash) rows (16 bytes/doc) so both join sides read them.
    # At 100 TB this is the "signatures are a write-path artifact" story:
    # compute once, store, self-join the stored table.
    sig = simhash_signatures(t["documents"]).localCheckpoint(eager=False)
    base, extra = divmod(SIMHASH_BITS, n_blocks)
    widths, offsets, off = [], [], 0
    for i in range(n_blocks):
        w = base + (1 if i < extra else 0)
        widths.append(w)
        offsets.append(off)
        off += w

    def _block_val(i):
        return F.shiftright(F.col("simhash"), offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    keys = []
    for ci, combo in enumerate(combinations(range(n_blocks), match_blocks)):
        # build the concatenated key with no dead ops: the first block is
        # the raw extracted value (no OR-with-zero), later blocks shift by
        # the accumulated width (never shiftleft-by-0) — measured: the
        # wrapper ops are NOT constant-folded and cost ~40% on the m=1 path
        val, shift = _block_val(combo[0]), widths[combo[0]]
        for i in combo[1:]:
            val = val.bitwiseOR(F.shiftleft(_block_val(i), shift))
            shift += widths[i]
        keys.append(F.struct(F.lit(ci).alias("blk"), val.alias("val")))
    keyed = sig.select(
        "doc_id", "simhash", F.explode(F.array(*keys)).alias("bk")
    ).select("doc_id", "simhash", F.col("bk.blk").alias("blk"), F.col("bk.val").alias("val"))
    a, b = keyed.alias("a"), keyed.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int")
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_auto(
    t: dict[str, DataFrame],
    max_hamming: int = SIMHASH_MAX_HAMMING,
    n_docs: int | None = None,
) -> DataFrame:
    """d4 production entry point: size the pigeonhole blocking to the
    corpus via `choose_simhash_blocking` before building the plan.

    Below the measured ~320k-doc crossover (SCALE.md finding 5) the cost
    model lands on the (d+1, 1) single-block default; above it the n²
    candidate term pushes onto wider combination keys — this wrapper makes
    that decision automatic instead of a hand-tuned constant. The result
    set is IDENTICAL for every valid (B, m) (pigeonhole-exact,
    test-enforced + the d4 oracle hash), so the choice is purely physical.

    `n_docs` is a hint for pipelines that already know the corpus size
    (e.g. from catalog stats); when absent, one count() scan pays for a
    plan that can be orders of magnitude cheaper at the 100 TB end — at
    that scale the count comes from parquet row-group metadata, not a
    data read."""
    if n_docs is None:
        n_docs = t["documents"].count()
    n_blocks, match_blocks = choose_simhash_blocking(n_docs, max_hamming)
    return simhash_pairs_blocked(
        t, max_hamming, n_blocks=n_blocks, match_blocks=match_blocks
    )


REPEAT_WINDOW = 8


def span_fingerprints(docs: DataFrame, window: int = REPEAT_WINDOW) -> DataFrame:
    """(doc_id, wh) — one row per `window`-token span position, wh =
    portable hash60 of the span text. STATELESS per input row (explode +
    hash is a fold over the row alone), which is what makes the same
    expression serve batch (d15), the streaming ingest probe (st14), and
    the stored span index. The span string exists only inside the
    projection; nothing downstream ever shuffles it."""
    w = T.words(F.col("text"))
    spans = F.when(
        F.size(w) >= window,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - F.lit(window - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, window)),
        ),
    ).otherwise(F.array())
    # one md5 per span position is the dominant map cost — widen the
    # single-row-group test scan so it fans out across cores, exactly as
    # _shingle_sets does (r10: t10/d15/st14 ran this map on ONE task)
    return widen_scan(docs).select("doc_id", F.explode(spans).alias("win")).select(
        "doc_id", T.hash60(F.col("win")).alias("wh")
    )


def span_index(docs: DataFrame, window: int = REPEAT_WINDOW) -> DataFrame:
    """The stored side of st14: one row per DISTINCT span fingerprint —
    (wh, n_docs, min_doc) — bounded by distinct corpus spans, not
    occurrences. `n_docs >= 2`, or `min_doc` differing from the probe
    document, answers "does any OTHER document contain this span" without
    a per-pair scan; at 100 TB this table is the write-path artifact a
    store maintains incrementally alongside ingest."""
    return (
        span_fingerprints(docs, window)
        .groupBy("wh")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
        )
    )


def repeated_substring_stats(
    t: dict[str, DataFrame], window: int = REPEAT_WINDOW
) -> DataFrame:
    """d15: exact repeated-substring coverage — the sequence-level dedup
    signal (Lee et al., "Deduplicating Training Data Makes Language Models
    Better", arXiv:2107.06499): every `window`-token span of every document
    is fingerprinted, a span whose fingerprint occurs more than once in the
    corpus (in ANY document, including its own — self-repeats are training
    duplicates too) counts as duplicated text, and each document reports
    the fraction of its spans that are duplicated. Curation pipelines
    threshold on `dup_frac` to cut boilerplate/templated documents that
    document-level near-dup (d3/d4) misses because the SURROUNDING text
    differs.

    Scale shape: spans explode to ~one row per token position (linear in
    corpus tokens), but every shuffle carries (doc_id, hash60) pairs — 16
    bytes a row, never span text. SKEW-SAFE by construction (review
    finding): a boilerplate span (license header, template footer) that
    occurs 10^8 times hashes to ONE fingerprint — a window-function
    occurrence count would sort all of it in a single un-splittable task.
    Instead: (a) combine to per-(fingerprint, doc) counts — partial
    aggregation collapses hot keys map-side; (b) fold those to global
    per-fingerprint totals — same partial-agg immunity; (c) join the two
    (the only stage a hot key can load, and it is an equi-join AQE's
    skew-split CAN divide, unlike a window); (d) per-doc rollup. Measured
    ~30% slower than the window form at sf0.1 — the price of having no
    single-task stage at any skew; the suffix-array formulation of the
    paper finds *maximal* repeats but needs a global sort over the corpus
    — this fixed-window fingerprint form is the one that distributes.

    Documents shorter than `window` tokens have no spans and are absent
    from the output (nothing to score)."""
    pairs = span_fingerprints(t["documents"], window)
    # eager barrier: `per` feeds both the global totals and the join probe —
    # without it each consumer replays the text explode + md5 + (wh,doc_id)
    # aggregation (measured: 2 full scans; 4.2 → 3.8 s at sf0.1, and the
    # replayed subtree is corpus-sized while the materialized rows are three
    # 8-byte columns — the asymptote is what matters at 100 TB).
    per = (
        pairs.groupBy("wh", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = per.groupBy("wh").agg(F.sum("c").alias("n_occ"))
    return (
        per.join(tot, "wh")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_windows"),
            F.sum(F.when(F.col("n_occ") > 1, F.col("c")).otherwise(0))
            .cast("long")
            .alias("n_dup_windows"),
        )
        .withColumn(
            "dup_frac",
            F.round(
                F.col("n_dup_windows").cast("double") / F.col("n_windows"), 4
            ),
        )
    )


def fuzzy_part_pairs(t: dict[str, DataFrame], max_distance: int = 2) -> DataFrame:
    """Edit-distance fuzzy matching — the entity-resolution complement to the
    token-set dedup family: pairs of part names within the same brand whose
    Levenshtein distance is ≤ `max_distance` (0 = exact duplicate listings,
    1-2 = typo/variant listings).

    Scale design: brand is the blocking key — the self-join shuffles once on
    the block key and compares all-pairs only inside a block (classic blocked
    entity resolution; at 100 TB the block key would be a coarser fingerprint
    such as first-token + length band, same plan shape). The JVM-side
    `levenshtein(l, r, threshold)` form short-circuits the DP once the row
    exceeds the bound, so per-pair cost is O(threshold·len), not O(len²).
    """
    p = t["part"].select("p_partkey", "p_brand", "p_name")
    a, b = p.alias("a"), p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), max_distance)
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("id_a"),
            F.col("b.p_partkey").alias("id_b"),
            F.col("a.p_brand").alias("brand"),
            dist.alias("distance"),
        )
        .filter(F.col("distance") >= 0)
    )


DECON_MIN_OVERLAP = 5
DECON_BENCH_MOD = 17


def decontamination(
    t: dict[str, DataFrame],
    min_overlap: int = DECON_MIN_OVERLAP,
    bench_mod: int = DECON_BENCH_MOD,
) -> DataFrame:
    """Benchmark decontamination — the training-pipeline gate that keeps
    eval data out of the training set: flag every corpus document sharing
    >= `min_overlap` distinct word n-grams with ANY benchmark document.
    The benchmark here is a deterministic holdout (doc_id % bench_mod == 0),
    standing in for an external eval set.

    Scale shape: inverted-index equi-join on the shingle — candidate volume
    is linear in corpus size times benchmark hit rate, never all-pairs. The
    benchmark shingle set is tiny relative to the corpus (eval sets are
    thousands of docs against billions), so it broadcasts: the corpus-side
    shingle index never shuffles. Output: flagged doc + how many benchmark
    docs it collides with + the worst overlap."""
    sh = _shingle_sets(t["documents"])
    bench = (
        sh.filter(F.col("doc_id") % bench_mod == 0)
        .select(F.col("doc_id").alias("bench_id"), "shingle")
    )
    corpus = sh.filter(F.col("doc_id") % bench_mod != 0)
    overlap = (
        corpus.join(F.broadcast(bench), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )
    return overlap.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.max("n_shared").alias("max_overlap"),
    )


def topic_clusters(t: dict[str, DataFrame], k: int = 12) -> DataFrame:
    """D13: corpus topic clustering for domain balancing — assign every
    embedding to its nearest of `k` deterministic seed centroids (the same
    map-only inlined-centroid assignment the IVF tier uses) and report the
    per-topic profile a curation pipeline reads before mixing domains:
    cluster size, dominant label with its share, and mean distance to the
    centroid (cohesion). The label-agreement column is the quick "do
    clusters track labels" diagnostic run before trusting a cluster-based
    sampling weight.

    Scale shape: assignment fuses into the scan (zero shuffles); the two
    aggregates are partial+final over k·|labels| then k groups. One
    corpus-sized shuffle of (cid,label) pairs — no embeddings move."""
    from .similarity import _ivf_assign

    emb = t["embeddings"]
    cents, assigned = _ivf_assign(emb, k)
    with_dist = assigned.join(F.broadcast(cents), "cid")
    dist = F.round(V.euclidean_distance("embedding", "ce"), 4).cast(
        "decimal(14,4)"
    )
    # r11 (guide §2.4): ONE corpus pass instead of two. The sizes and
    # dominant-label aggregates each replayed the centroid-assignment
    # projection; both derive from a single (cid, label) partial+final
    # aggregate — regrouping the distance sum per label first is EXACT
    # because dist is DECIMAL(14,4) (decimal addition is associative,
    # unlike double), so avg_dist = round(sum/count, 3) is bit-identical
    # to the one-level form. The k·|labels| grouped table is persisted
    # for its two consumers (per-cell totals + top-label window).
    by_label = (
        with_dist.groupBy("cid", "label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dist).alias("sd"),
        )
        .transform(shared_persist)
    )
    sizes = by_label.groupBy("cid").agg(
        F.sum("n").alias("n_vecs"),
        F.round(F.sum("sd").cast("double") / F.sum("n"), 3).alias("avg_dist"),
    )
    w = Window.partitionBy("cid").orderBy(F.desc("n"), F.asc("label"))
    top = (
        by_label.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cid", F.col("label").alias("top_label"), F.col("n").alias("top_n"))
    )
    return (
        sizes.join(top, "cid")
        .select(
            "cid",
            "n_vecs",
            "top_label",
            F.round(F.col("top_n") / F.col("n_vecs"), 3).alias("top_label_share"),
            "avg_dist",
        )
        .orderBy("cid")
    )


def minhash_band_keys(docs: DataFrame) -> DataFrame:
    """Batch (doc_id, band, key) LSH band index rows: per-doc minhash
    signatures via the explode + groupBy min-aggregate (exactly
    minhash_lsh_pairs' signature step — md5 once per shingle, whole-stage
    codegen end to end), then one row per band. The (doc_id) exchange is
    narrow: a doc's exploded shingles never span input partitions, so the
    map-side partial aggregate collapses to ONE 8-min row per doc before
    anything shuffles.

    Bit-identical keys to the stateless fold twin (minhash_band_keys_fold,
    parity-tested) — the fold serves STREAM sides where a keyed aggregation
    would need shuffle state; it evaluates interpreted (HOFs sit outside
    codegen), measured ~3× slower per row than this form, so every batch
    path uses this one (the d17 scale probe caught the difference: 9.9 s →
    2.5 s at sf0.1).

    r11: the signature aggregate is `_lsh_signatures` — the SAME logical
    subtree `_lsh_candidate_pairs` uses — so a composed plan that persists
    either one (e2e_auto_curation, d22) computes the signature pass once
    for profile + candidate consumers via Catalyst cache substitution.
    The extra `n_sh` column it carries is one count riding an aggregate
    that already exists; the returned schema and every (doc_id, band,
    key) value are unchanged."""
    sig = _lsh_signatures(docs)
    n_bands = MINHASH_HASHES // LSH_BAND_ROWS
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ":",
                    *[
                        F.col(f"mh{b * LSH_BAND_ROWS + r}").cast("string")
                        for r in range(LSH_BAND_ROWS)
                    ],
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        sig.select("doc_id", F.explode(bands).alias("bk"))
        .select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


def minhash_band_keys_fold(docs: DataFrame) -> DataFrame:
    """STATELESS (doc_id, band, key) band index: the per-doc minhash
    signature computed as ONE aggregate fold over the shingle array — an
    8-element running-min accumulator updated per shingle — then one row per
    band. Bit-identical values to minhash_band_keys (same universal-hash
    family); being a pure per-row projection is what lets the same
    expression run on a STREAM side (st12) — a per-doc aggregation would
    need keyed shuffle state, a fold needs none.

    The single-accumulator shape is a measured 2× win over the previous
    8-separate-`array_min(transform(...))` form: higher-order-function
    subtrees are NOT subexpression-eliminated (HOFs evaluate interpreted,
    outside codegen CSE), so each of the 8 folds re-ran the whole
    md5→hash60→mod chain over every shingle. Here md5 runs exactly once per
    shingle and the signature array is materialized in its own projection —
    CollapseProject keeps it separate because the (expensive) array is
    referenced by all 8 band-key reads."""
    arr_a = F.array(*[F.lit(a).cast("long") for a in T.MINHASH_A[:MINHASH_HASHES]])
    arr_b = F.array(*[F.lit(b).cast("long") for b in T.MINHASH_B[:MINHASH_HASHES]])
    p = F.lit(T.MINHASH_P).cast("long")
    base = F.transform(T.word_shingles("text", SHINGLE_N), lambda s: T.hash60(s))
    rem = F.transform(base, lambda h: h % p)
    # init with P: every (a·r+b) mod P lies in [0, P), so P never survives a min
    sig = F.aggregate(
        rem,
        F.array_repeat(p, MINHASH_HASHES),
        lambda acc, r: F.transform(
            acc,
            lambda m, i: F.least(
                m,
                (F.element_at(arr_a, i + F.lit(1)) * r
                 + F.element_at(arr_b, i + F.lit(1))) % p,
            ),
        ),
    )
    n_bands = MINHASH_HASHES // LSH_BAND_ROWS
    sigd = docs.filter(F.size(T.words("text")) >= SHINGLE_N).select(
        "doc_id", sig.alias("mh")
    )
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    ":",
                    *[
                        F.element_at("mh", b * LSH_BAND_ROWS + r + 1).cast("string")
                        for r in range(LSH_BAND_ROWS)
                    ],
                ).alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        sigd.select("doc_id", F.explode(bands).alias("bk"))
        .select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    )


def streaming_neardup_candidates_batch(t: dict[str, DataFrame]) -> DataFrame:
    """ST12 batch twin: incoming docs' band keys joined against the corpus
    band index — the candidate feed an always-on ingest consults BEFORE
    admitting a document (the streaming complement of d3's offline pairs).
    Directional: (new_doc, index_doc) with band-collision count; the
    verification (exact Jaccard) happens downstream on this tiny feed.

    Scale shape: the index side is the STORED band table (written clustered
    by (band, key)); the probe is an equi-join on it — per arriving doc,
    ~n_bands lookups. Nothing about the corpus is rescanned per batch.
    The eager checkpoint below plays the stored table's role in this
    self-contained twin: both join sides read the materialized band rows
    instead of each re-deriving signatures from the corpus."""
    bands = minhash_band_keys(t["documents"]).localCheckpoint(eager=True)
    idx = bands.select(
        F.col("doc_id").alias("index_doc"), "band", "key"
    )
    return (
        bands.join(idx, ["band", "key"])
        .filter(F.col("doc_id") != F.col("index_doc"))
        .groupBy(F.col("doc_id").alias("new_doc"), "index_doc")
        .agg(F.count(F.lit(1)).alias("n_band_hits"))
    )


def choose_simhash_blocking(
    n_docs: int, max_hamming: int = SIMHASH_MAX_HAMMING
) -> tuple[int, int]:
    """Pick (n_blocks, match_blocks) for simhash_pairs_blocked from the
    corpus size, minimizing the measured two-term cost model:

        cost ≈ α·n·C(B,m)                      (key explode + shuffle)
             + β·n²·C(B,m)/2^(m·SIMHASH_BITS/B) (candidate generation)

    α ≈ 3e-7 s/keyed-row and β ≈ 8e-10 s/candidate were fitted on the
    64× scale-probe tile (SCALE.md finding 5; 32-core local mode — the
    RATIO is what matters, both terms scale with cluster width). Small
    corpora land on (d+1, 1) — single-block keys, minimal explode; the
    candidate term's n² growth pushes large corpora onto wider
    combination keys. The result set is identical for every valid
    config (pigeonhole-exact; test-enforced), so this is purely a cost
    choice."""
    from math import comb

    ALPHA, BETA = 3e-7, 8e-10
    best: tuple[float, tuple[int, int]] | None = None
    for extra in range(1, 7):
        b = max_hamming + extra
        m = b - max_hamming
        if m * SIMHASH_BITS // b < 1:
            continue
        c = comb(b, m)
        key_bits = m * SIMHASH_BITS / b
        cost = ALPHA * n_docs * c + BETA * n_docs * n_docs * c / (2.0**key_bits)
        if best is None or cost < best[0]:
            best = (cost, (b, m))
    assert best is not None
    return best[1]


SEMDEDUP_TAU = 0.3  # near-dup cosine threshold; real text embeddings sit
# much tighter (paper uses ~0.95+) — the synthetic fixture's within-cell
# 99th percentile is ~0.34, so 0.3 exercises the same selectivity regime

SEMDEDUP_CELL_TARGET = 500  # auto-k aims at ~this many vectors per cell


def choose_semdedup_k(n_vecs: int) -> int:
    """k must SCALE WITH THE CORPUS (the paper clusters 100k-way for
    LAION-scale data): with fixed k, cell occupancy grows linearly and the
    within-cell pair volume quadratically — the first probe run measured
    exactly that (6.2 s → 268 s at 16×, a clean O(n²) signature). Holding
    occupancy near SEMDEDUP_CELL_TARGET makes pair volume ~n·target/2,
    linear in the corpus. Floor 16 keeps every driver fixture (≤5k
    vectors) on the oracle-pinned 16-centroid layout."""
    return max(16, n_vecs // SEMDEDUP_CELL_TARGET)


def semdedup(
    t: dict[str, DataFrame],
    tau: float = SEMDEDUP_TAU,
    n_centroids: int | None = None,
) -> DataFrame:
    """d18: SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication") — embedding-space near-dup
    removal scoped to k-means cells. Every vector is assigned to its nearest
    centroid; within a cell, pairs with cosine ≥ tau are semantic duplicates
    and the RANK-GREEDY rule of the released implementation decides
    survival: x is removed iff some same-cell y with cos(x, y) ≥ tau
    precedes x in (cos_to_centroid ASC, vec_id ASC) order — "keep the
    member farthest from the centroid", the paper's diversity-preserving
    choice, one-shot (removal does not cascade, exactly like the paper's
    code). Emits every vector with its cell, centroid similarity, and
    keep/drop verdict.

    Scale shape: assignment is the map-only inlined-centroid projection
    (`_assign_cells` — zero shuffles, the FAISS coarse-quantizer shape);
    the scored base (cid, cos_c) is computed ONCE and checkpointed before
    the self-join (the HOF-fold lesson: without the barrier codegen
    re-evaluates the centroid fold per candidate pair); pair volume is
    bounded by cell occupancy, and k SCALES WITH THE CORPUS
    (`choose_semdedup_k`, occupancy ≈ SEMDEDUP_CELL_TARGET) so that bound
    is linear in n, never n² — the fixed-k probe run measured the
    quadratic blow-up this prevents (SCALE.md finding). At 100 TB the
    store is written clustered by cid so the self-join is partition-local,
    and the removal set joins back as an id-only anti pattern.
    """
    from ..tables import widen_scan
    from .similarity import _ivf_assign

    emb = t["embeddings"]
    if n_centroids is None:
        # one count job to size k — callers that already know the corpus
        # size (or can read it from table statistics) should pass
        # n_centroids explicitly to skip this extra pass
        n_vecs = emb.count()
        if n_vecs == 0:
            # an empty centroid literal types as VOID and breaks analysis;
            # an empty corpus trivially has no duplicates
            return emb.sparkSession.createDataFrame(
                [], "vec_id long, cid long, cos_c double, is_kept boolean"
            )
        n_centroids = choose_semdedup_k(n_vecs)
    cents, assigned = _ivf_assign(emb, n_centroids)
    # `ne` = the unit-normalized vector, computed ONCE per vector: the
    # per-pair cosine then collapses to a single dot fold instead of
    # dot + two norms — HOF folds run interpreted, so at ~500 pairs per
    # vector the 3→1 fold cut is the difference between the pair phase
    # dominating and disappearing (measured 3× on the 16× tile)
    scored = (
        assigned.join(F.broadcast(cents), assigned["cid"] == cents["cid"])
        .select(
            "vec_id",
            assigned["cid"].alias("cid"),
            "embedding",
            V.norm("embedding").alias("nrm"),
            # _safe: ANSI throws on zero-norm vectors (failed encodes emit
            # all-zero embeddings); they cosine to 0 = never a duplicate
            (
                F.round(V.cosine_similarity_safe("embedding", "ce"), 3) + F.lit(0.0)
            ).alias("cos_c"),
        )
        .select(
            "vec_id",
            "cid",
            V.safe_unit("embedding", F.col("nrm")).alias("ne"),
            "cos_c",
        )
        .localCheckpoint(eager=True)
    )
    # widen the probe side: the checkpoint inherits the narrow scan's
    # partition count, which would run the pair phase on a handful of cores
    a = widen_scan(
        scored.select(
            F.col("vec_id").alias("va"),
            F.col("cid").alias("ca"),
            F.col("ne").alias("na"),
            F.col("cos_c").alias("cca"),
        ),
        min_parts=32,
    )
    b = scored.select(
        F.col("vec_id").alias("vb"),
        F.col("cid").alias("cb"),
        F.col("ne").alias("nb"),
        F.col("cos_c").alias("ccb"),
    )
    precedes = (F.col("ccb") < F.col("cca")) | (
        (F.col("ccb") == F.col("cca")) & (F.col("vb") < F.col("va"))
    )
    removed = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("va") != F.col("vb")))
        .filter(
            (F.round(V.dot("na", "nb"), 3) + F.lit(0.0) >= tau) & precedes
        )
        .select(F.col("va").alias("vec_id"))
        .distinct()
        .withColumn("rm", F.lit(True))
    )
    return (
        scored.join(removed, "vec_id", "left")
        .select("vec_id", "cid", "cos_c", F.col("rm").isNull().alias("is_kept"))
    )


BLOOM_BITS = 1 << 20
BLOOM_HASHES = 3
BLOOM_MIN_OVERLAP = 3


def bloom_bit(col, i: int, m: int = BLOOM_BITS):
    """Bit position i of a shingle's Bloom family: seeded portable hash60
    mod the table size — deterministic, so DuckDB rebuilds the same bit."""
    return T.seeded_hash60(col, f"bloom{i}") % m


def bloom_bits_set(col, m: int = BLOOM_BITS, k: int = BLOOM_HASHES):
    """The distinct bit-position SET of one shingle (duplicates collapse
    when two seeds collide — `n_need` below accounts for that)."""
    return F.array_distinct(F.array(*[bloom_bit(col, i, m) for i in range(k)]))


def bloom_bench_bits(
    sh: DataFrame,
    bench_mod: int = DECON_BENCH_MOD,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """The Bloom filter itself: the distinct bit set of the benchmark
    partition's shingles — <= m rows regardless of eval-set size. Shared
    by the batch gate (d19) and the streaming ingest probe (st16)."""
    return (
        sh.filter(F.col("doc_id") % bench_mod == 0)
        .select(F.explode(bloom_bits_set(F.col("shingle"), m, k)).alias("bit"))
        .distinct()
    )


def bloom_decontamination(
    t: dict[str, DataFrame],
    min_overlap: int = BLOOM_MIN_OVERLAP,
    bench_mod: int = DECON_BENCH_MOD,
    m: int = BLOOM_BITS,
    k: int = BLOOM_HASHES,
) -> DataFrame:
    """d19: Bloom-filter decontamination — the SCALE path of d12 for when
    the eval-set shingle index is too large to broadcast exactly (the
    GPT-3-appendix design: membership of training n-grams in an eval-set
    Bloom filter). Each shingle maps to `k` bit positions (seeded portable
    hash60 mod `m`); the filter is the distinct-bit set of the benchmark
    partition's shingles; a corpus shingle is flagged iff ALL of its bits
    are present. Docs with >= `min_overlap` flagged shingles are reported
    with their hit fraction. Deterministic (md5-seeded bits), so the
    DuckDB oracle reproduces the exact same filter, false positives
    included.

    Scale shape: the bit table is bounded by `m` (2^20 here) REGARDLESS of
    eval-set size — that is the whole point: a 10M-doc eval set collapses
    to a broadcastable <= m-row bit set (or a bitmap at real scale), while
    d12's exact index grows linearly. Corpus side: digests only — the
    (doc_id, shingle-bit) explode shuffles BIGINTs, never text; per-doc
    aggregation is partial+final. False-positive rate at fill ratio p is
    p^k; with the test corpus p << 1%, so d19 ~= the union-level exact
    answer, and the op stays honest at any fill since the oracle computes
    the same filter."""
    sh = _shingle_sets(t["documents"]).transform(shared_persist)
    bench_bits = bloom_bench_bits(sh, bench_mod, m, k)
    corpus = sh.filter(F.col("doc_id") % bench_mod != 0)
    cb = corpus.select(
        "doc_id", "shingle", bloom_bits_set(F.col("shingle"), m, k).alias("bset")
    ).select(
        "doc_id",
        "shingle",
        F.size("bset").alias("n_need"),
        F.explode("bset").alias("bit"),
    )
    pos = (
        cb.join(F.broadcast(bench_bits), "bit")
        .groupBy("doc_id", "shingle", "n_need")
        .agg(F.count(F.lit(1)).alias("n_match"))
        .filter(F.col("n_match") == F.col("n_need"))
    )
    hits = pos.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hit"))
    csizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return (
        hits.join(csizes, "doc_id")
        .filter(F.col("n_hit") >= min_overlap)
        .select(
            "doc_id",
            "n_hit",
            "n_sh",
            F.round(F.col("n_hit") * 1.0 / F.col("n_sh"), 3).alias("hit_frac"),
        )
    )


SEMDECON_TAU = SEMDEDUP_TAU  # same fixture-calibrated cosine regime as d18


def semantic_decontamination(
    t: dict[str, DataFrame],
    tau: float = SEMDECON_TAU,
    bench_mod: int = DECON_BENCH_MOD,
    n_centroids: int | None = None,
) -> DataFrame:
    """d20: embedding-space benchmark decontamination — the third tier of
    the decontamination family (d12 exact n-gram, d19 Bloom, d20
    semantic): paraphrased or reformatted eval answers share no shingles
    with the training copy, but their embeddings stay close — the overlap
    modern releases actually audit for (the GPT-4/Llama-style semantic
    contamination check). A corpus vector is contaminated iff some
    same-cell benchmark vector sits within cosine >= tau; emits the
    flagged vectors with hit count and max cosine.

    Scale shape: d18's machinery, cross-set instead of self-join —
    assignment is the map-only inlined-centroid projection over BOTH
    partitions at once; vectors are normalized ONCE and checkpointed (the
    HOF-fold barrier lesson), the per-pair cosine is a single dot fold;
    the bench side is a vanishing fraction of the table (and at 100 TB
    the eval suite is fixed-size while the corpus grows), so AQE
    broadcasts it and the join never shuffles the corpus. k scales with
    the corpus via choose_semdedup_k so cell occupancy — and with it the
    per-vector candidate count — stays constant."""
    from ..tables import widen_scan
    from .similarity import _ivf_assign

    emb = t["embeddings"]
    if n_centroids is None:
        n_vecs = emb.count()
        if n_vecs == 0:
            return emb.sparkSession.createDataFrame(
                [], "vec_id long, cid long, n_bench_hits long, max_cos double"
            )
        n_centroids = choose_semdedup_k(n_vecs)
    cents, assigned = _ivf_assign(emb, n_centroids)
    normed = (
        assigned.select(
            "vec_id",
            "cid",
            V.norm("embedding").alias("nrm"),
            "embedding",
        )
        .select(
            "vec_id",
            "cid",
            V.safe_unit("embedding", F.col("nrm")).alias("ne"),
        )
        .localCheckpoint(eager=True)
    )
    corpus = widen_scan(
        normed.filter(F.col("vec_id") % bench_mod != 0).select(
            F.col("vec_id").alias("vc"), F.col("cid").alias("cc"), F.col("ne").alias("nc")
        ),
        min_parts=32,
    )
    bench = normed.filter(F.col("vec_id") % bench_mod == 0).select(
        F.col("vec_id").alias("vb"), F.col("cid").alias("cb"), F.col("ne").alias("nb")
    )
    cos = F.round(V.dot("nc", "nb"), 3) + F.lit(0.0)
    return (
        corpus.join(F.broadcast(bench), F.col("cc") == F.col("cb"))
        .select("vc", "cc", cos.alias("cos"))
        .filter(F.col("cos") >= tau)
        .groupBy(F.col("vc").alias("vec_id"), F.col("cc").alias("cid"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bench_hits"),
            (F.max("cos") + F.lit(0.0)).alias("max_cos"),
        )
    )


def lsh_recall(
    t: dict[str, DataFrame],
    max_bucket_size: int | None = None,
    sample_mod: int = 1,
) -> DataFrame:
    """D21: dedup-quality measurement — v12's role replayed for the dedup
    family. The ANN tiers ship with a recall harness (v12/v19: how much
    of the exact answer does the approximate index serve?); production
    LSH configs need the same number: what fraction of the TRUE near-dup
    pairs (exact n-gram Jaccard ≥ τ, the d2 baseline) does the banded,
    bucket-capped production config (d3c) surface? Recall < 1 decomposes
    into banding misses (pairs whose signatures never share a band) and
    cap drops (pairs hiding inside boilerplate buckets) — the number you
    check BEFORE trusting a cap chosen by `choose_lsh_bucket_cap`.
    Precision is 1.0 by construction (candidates are verified against the
    same exact Jaccard) — emitting it asserts that invariant end-to-end.

    Scale shape: the exact side is the expensive one — at 100 TB you run
    this on a SAMPLE (the v12 move: measurement cost scales with the
    sample, the measured config is the production one). `sample_mod`
    makes that a real parameter, not a docstring promise (VERDICT r6
    task 1): mod-m deterministic doc sampling (doc_id % m == 0), applied
    to BOTH sides so recall is measured on one consistent sub-corpus —
    deterministic so the SQL oracle reproduces the exact sample. One
    full-outer pair join + a single-row aggregate on top of two
    already-linear ops. Output: one row (n_exact_pairs, n_lsh_pairs,
    n_common, recall_vs_exact, precision_vs_exact)."""
    if max_bucket_size is None:
        max_bucket_size = LSH_MAX_BUCKET_DEFAULT
    if sample_mod > 1:
        t = dict(t)
        t["documents"] = t["documents"].filter(
            F.col("doc_id") % sample_mod == 0
        )
    # persisted: the exact pair set feeds BOTH the recall denominator and
    # the semi-join that verifies the LSH candidates — without the persist
    # the grid-salted exact-Jaccard subtree (the expensive side of this
    # query) replays once per consumer whenever exchange reuse does not
    # fire; the cached rows are a near-dup-sized id/jaccard table
    exact_pairs = ngram_jaccard_pairs(t).transform(shared_persist)
    exact = exact_pairs.select("doc_a", "doc_b", F.lit(1).alias("ie"))
    # r10 (guide §3.2, project early / avoid recomputing): the LSH side
    # used to call minhash_lsh_pairs, whose verification re-derives exact
    # Jaccard for every candidate with a 3-join pass over the shingle
    # index — but THIS query's exact side already computed every true
    # pair with the same index, sizes and rounding. Since precision is
    # 1.0 by construction (a candidate is reported iff it passes the same
    # exact-Jaccard ≥ τ test), the verified LSH pair set IS
    # candidates ∩ exact: one semi-join of two id-only pair tables
    # replaces the whole verification subtree. Result-identical.
    _, _, cands = _lsh_candidate_pairs(t, max_bucket_size=max_bucket_size)
    lsh = cands.join(
        exact_pairs.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_semi"
    ).select("doc_a", "doc_b", F.lit(1).alias("il"))
    both = exact.join(lsh, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("ie", F.lit(0)).alias("ie"),
        F.coalesce("il", F.lit(0)).alias("il"),
    )
    one = F.lit(1).cast("long")
    ne = F.coalesce(F.sum("ie"), F.lit(0)).cast("long")
    nl = F.coalesce(F.sum("il"), F.lit(0)).cast("long")
    nc = F.coalesce(F.sum(F.col("ie") * F.col("il")), F.lit(0)).cast("long")
    return both.agg(
        ne.alias("n_exact_pairs"),
        nl.alias("n_lsh_pairs"),
        nc.alias("n_common"),
        (F.round(nc * F.lit(1.0) / F.greatest(ne, one), 4) + F.lit(0.0)).alias(
            "recall_vs_exact"
        ),
        (F.round(nc * F.lit(1.0) / F.greatest(nl, one), 4) + F.lit(0.0)).alias(
            "precision_vs_exact"
        ),
    )


# The recall floor a production cap must clear before "cheaper" counts:
# choose_lsh_bucket_cap proves the auto cap cuts verification cost
# (SCALE.md, e2e_auto_curation); the sweep proves what that cap COSTS in
# missed true pairs. 0.95 mirrors the ANN family's serving bar (v19).
LSH_RECALL_FLOOR_DEFAULT = 0.95


def lsh_cap_recall_sweep(
    t: dict[str, DataFrame],
    headroom: float = 4.0,
    recall_floor: float = LSH_RECALL_FLOOR_DEFAULT,
    sample_mod: int = 1,
) -> DataFrame:
    """D22: the recall-vs-cap CURVE for the LSH bucket cap, plus the
    smallest swept cap that clears `recall_floor` — the measurement that
    turns choose_lsh_bucket_cap from "cheaper" into "safe" (VERDICT r6
    task 1). d21 measures ONE config; this sweeps a geometric ladder
    around the auto cap {2, auto, 2·auto, 4·auto, max_bucket_n} in ONE
    corpus pass: a true pair survives cap c iff the SMALLEST band bucket
    it collides in has size ≤ c, so per-pair min bucket size is computed
    once and every ladder level is just a threshold on it — no per-cap
    LSH reruns. `n_candidate_pairs` rides along as the cost axis (the
    verification workload the cap exists to bound).

    The ladder derives from the same n_bands-row profile collect as
    e2e_auto_curation (O(1) driver work); the oracle recomputes ladder,
    curve, and chosen cap in SQL, so the tuning decision itself is
    hash-verified. At 100 TB this runs on the mod-m sample (sample_mod,
    the d21/v12 move) — measurement cost scales with the sample while the
    swept caps are the production ones.

    Output: one row per swept cap — (cap, n_true_pairs, n_caught_pairs,
    n_candidate_pairs, recall_vs_exact, chosen) with chosen=1 on the
    smallest cap meeting the floor (falls back to the largest swept cap
    when none does; empty corpus -> single row cap=2, recall 0)."""
    import math

    docs = t["documents"]
    if sample_mod > 1:
        docs = docs.filter(F.col("doc_id") % sample_mod == 0)
    ts = {"documents": docs}

    # r10: the profile collect, the uncapped band join, and the exact
    # side below all shingle the same corpus — register the shingle index
    # in the cache first so every pass reads ONE materialization (the
    # e2e_auto_curation move; result-identical, persist only)
    _shingle_sets(docs).transform(shared_persist)

    # r11: register the band index in the cache BEFORE the profile
    # collect — corpus_dup_profile's plan contains the identical
    # minhash_band_keys(docs) subtree, so Catalyst substitutes this
    # InMemoryRelation into the profile pass and the signature
    # aggregation over the shingle index runs ONCE for profile + sweep
    # (previously the profile collect computed its own signature pass,
    # then the sweep's `bands` cache recomputed it). Result-identical:
    # persist + ordering only.
    bands = minhash_band_keys(docs).transform(shared_persist)

    # ladder from the band profile (driver-side: n_bands rows)
    prof = [
        r for r in corpus_dup_profile(ts).collect() if r.n_colliding_buckets
    ]
    if not prof:
        caps = [2]
    else:
        mean = max(r.colliding_docs / r.n_colliding_buckets for r in prof)
        max_seen = int(max(r.max_bucket_n for r in prof))
        auto = max(2, min(math.ceil(headroom * mean), max_seen))
        caps = sorted(
            {2, auto, min(2 * auto, max_seen), min(4 * auto, max_seen), max_seen}
        )
    caps_df = docs.sparkSession.createDataFrame(
        [(int(c),) for c in caps], "cap long"
    )

    # per-pair MIN colliding-bucket size, one bucket join (uncapped by
    # design: the sweep must see the pairs every cap would drop).
    # r10: both tables persist — `bands` (registered above, before the
    # profile collect) feeds the sized join AND the bucket-size
    # aggregate, `sized` feeds BOTH aliases of the pair self-join;
    # without the persists the minhash aggregation replays per consumer
    # (the cached rows are (doc_id, band, key[, bn]) digests)
    sized = bands.join(
        bands.groupBy("band", "key").agg(F.count(F.lit(1)).alias("bn")),
        ["band", "key"],
    ).transform(shared_persist)
    x, y = sized.alias("x"), sized.alias("y")
    pairbn = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .groupBy(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .agg(F.min(F.col("x.bn")).alias("min_bn"))
    )
    true_pairs = ngram_jaccard_pairs(ts).select(
        "doc_a", "doc_b", F.lit(1).alias("is_true")
    )
    pairs = pairbn.join(true_pairs, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("is_true", F.lit(0)).alias("is_true"),
        F.col("min_bn").cast("long").alias("min_bn"),
    )
    # sentinel row (is_true=0, min_bn=NULL) contributes 0 to every
    # aggregate but keeps the cross join non-empty, so an empty corpus
    # still yields one output row per swept cap (the oracle carries the
    # same sentinel)
    sentinel = docs.sparkSession.createDataFrame(
        [(0, None)], "is_true int, min_bn long"
    )
    pairs = pairs.unionByName(sentinel)

    survives = F.when(F.col("min_bn") <= F.col("cap"), 1).otherwise(0)
    one = F.lit(1).cast("long")
    curve = (
        pairs.crossJoin(F.broadcast(caps_df))
        .groupBy("cap")
        .agg(
            F.sum("is_true").cast("long").alias("n_true_pairs"),
            F.sum(F.col("is_true") * survives).cast("long").alias(
                "n_caught_pairs"
            ),
            F.sum(survives).cast("long").alias("n_candidate_pairs"),
        )
        .select(
            "cap",
            "n_true_pairs",
            "n_caught_pairs",
            "n_candidate_pairs",
            (
                F.round(
                    F.col("n_caught_pairs")
                    * F.lit(1.0)
                    / F.greatest(F.col("n_true_pairs"), one),
                    4,
                )
                + F.lit(0.0)
            ).alias("recall_vs_exact"),
        )
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    chosen_cap = F.coalesce(
        F.min(
            F.when(F.col("recall_vs_exact") >= recall_floor, F.col("cap"))
        ).over(w),
        F.max("cap").over(w),
    )
    return (
        curve.withColumn(
            "chosen", (F.col("cap") == chosen_cap).cast("int")
        )
        .orderBy("cap")
    )


def choose_lsh_bucket_cap_safe(
    t: dict[str, DataFrame],
    headroom: float = 4.0,
    recall_floor: float = LSH_RECALL_FLOOR_DEFAULT,
    sample_mod: int = 1,
) -> int:
    """choose_lsh_bucket_cap with the recall floor WIRED IN (VERDICT r6
    task 1 "wire the result back"): run the cap sweep, return the
    smallest swept cap whose measured recall clears the floor (the
    largest swept cap when none does — never worse than uncapped).
    The collect is |ladder| <= 5 rows. This is the chooser a 100 TB run
    uses when quality is part of the contract; the profile-only chooser
    remains for cost-only tuning (e2e_auto_curation's oracle pins it)."""
    rows = lsh_cap_recall_sweep(
        t, headroom=headroom, recall_floor=recall_floor, sample_mod=sample_mod
    ).collect()
    return int(next(r.cap for r in rows if r.chosen))


DELTA_MOD = 8
DELTA_REM = 7


def incremental_lsh_dedup(
    t: dict[str, DataFrame],
    threshold: float = JACCARD_THRESHOLD,
    delta_mod: int = DELTA_MOD,
    delta_rem: int = DELTA_REM,
    max_bucket_size: int = LSH_MAX_BUCKET_DEFAULT,
) -> DataFrame:
    """D24: incremental near-dup gate — dedup an INGEST BATCH against the
    existing corpus without ever re-pairing the corpus with itself. This
    is the production dedup shape: a crawl/snapshot pipeline runs the full
    d3 cascade once, then every subsequent batch must answer "is this new
    doc a near-dup of ANYTHING already kept?" — a delta×corpus question,
    never corpus×corpus (which d3 already answered and which re-running
    would cost O(corpus) per batch).

    Fixture split: doc_id % delta_mod == delta_rem is the incoming batch
    (~1/8 of the corpus), the rest is the stored side. In production the
    stored side's (doc_id, band, key) rows are a PERSISTED table written
    by the initial cascade and appended per accepted batch (the t13
    narrative: simulation derives it, the artifact is exactly what this
    op joins against) — so the per-batch cost is:

      1. shingle+minhash the DELTA only (delta-sized text pass),
      2. equi-join its band keys against the stored band table — with the
         stored side bucket-capped (the d3c skew guard: boilerplate
         buckets are capped AT REST, so a pathological batch cannot
         trigger a quadratic wave),
      3. verify candidates with exact Jaccard — both shingle probes are
         candidate-bounded broadcasts, the corpus shingle index never
         reshuffles.

    Output is a per-delta-doc VERDICT (not pairs): n_dups, the earliest
    matching kept doc, the best Jaccard, and is_new — the row an ingest
    controller acts on (insert vs reject vs link-as-duplicate). Docs with
    no candidate collisions appear with n_dups = 0 (left join): the gate
    must answer for EVERY incoming doc, silence is not a verdict.
    Reference: the vector store's per-batch seen-set dedup
    (embed/vector_store.py:112-118) generalized from exact to near-dup."""
    docs = t["documents"]
    is_delta = (F.col("doc_id") % delta_mod) == delta_rem
    delta_docs = docs.filter(is_delta)
    corpus_docs = docs.filter(~is_delta)

    # r10 (guide §2.4): each half used to be shingled TWICE — once inside
    # minhash_band_keys (signatures) and once for the exact-Jaccard
    # verification probes below. Registering both shingle indexes in the
    # cache makes Catalyst substitute the one materialization into every
    # identical subtree: one text pass per half instead of two.
    # Result-identical (persist only).
    sh_delta = _shingle_sets(delta_docs).transform(shared_persist)
    sh_corpus = _shingle_sets(corpus_docs).transform(shared_persist)

    # production: spark.table("lsh_band_index"); simulation: derive it
    corpus_bands = minhash_band_keys(corpus_docs)
    bucket_sizes = corpus_bands.groupBy("band", "key").agg(
        F.count(F.lit(1)).alias("bucket_n")
    )
    corpus_bands = (
        corpus_bands.join(bucket_sizes, ["band", "key"])
        .filter(F.col("bucket_n") <= max_bucket_size)
        .drop("bucket_n")
    )
    delta_bands = minhash_band_keys(delta_docs)

    # persisted (r11): the candidate table feeds TWO broadcast consumers
    # (its distinct kept_doc side and the verification probe) — without
    # the persist the delta×corpus band join AND both halves' signature
    # aggregations replay once per broadcast. Candidate rows are the band
    # collisions only — delta-bounded, tiny at any corpus size.
    candidates = (
        delta_bands.alias("db")
        .join(
            corpus_bands.alias("cb"),
            (F.col("db.band") == F.col("cb.band"))
            & (F.col("db.key") == F.col("cb.key")),
        )
        .select(
            F.col("db.doc_id").alias("doc_id"),
            F.col("cb.doc_id").alias("kept_doc"),
        )
        .distinct()
        .transform(shared_persist)
    )

    sizes_d = sh_delta.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_a"))
    sizes_c = sh_corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_b"))
    cand_kept = candidates.select("kept_doc").distinct()
    b = sh_corpus.join(
        F.broadcast(cand_kept),
        sh_corpus["doc_id"] == cand_kept["kept_doc"],
    ).select("kept_doc", "shingle")
    inter = (
        sh_delta.join(F.broadcast(candidates), "doc_id")
        .join(b, ["kept_doc", "shingle"])
        .groupBy("doc_id", "kept_doc")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.round(
        F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 3
    )
    verified = (
        inter.join(sizes_d, "doc_id")
        .join(
            sizes_c.withColumnRenamed("doc_id", "kept_doc"),
            "kept_doc",
        )
        .select("doc_id", "kept_doc", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    per_doc = verified.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dups"),
        F.min("kept_doc").cast("long").alias("first_dup"),
        (F.max("jaccard") + F.lit(0.0)).alias("best_jaccard"),
    )
    return (
        delta_docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_dups"), F.lit(0).cast("long")).alias("n_dups"),
            "first_dup",
            "best_jaccard",
            (F.col("n_dups").isNull()).alias("is_new"),
        )
    )


WINNOW_K = 3  # k-gram size in words
WINNOW_W = 4  # winnowing window (k-grams per window)
WINNOW_MAX_POSTINGS = 50  # stop-fingerprint cap (docs per fingerprint)
WINNOW_MIN_SHARED = 2
# positions pack into the low 20 bits of the selection key (max ~1M
# k-grams per document; longer docs chunk first)
_WINNOW_POS_BITS = 1 << 20


def winnow_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """Per-document WINNOWING fingerprints (Schleimer, Wilkerson, Aiken —
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003; the MOSS algorithm): hash every k-gram, slide a window of w
    consecutive k-gram hashes, select each window's MINIMUM hash
    (rightmost on ties — the paper's robust winnowing), emit the distinct
    selections. Guarantees: (a) any shared run of ≥ w+k-1 words between
    two documents yields a shared fingerprint (detection is NOT
    probabilistic, unlike minhash), (b) expected density 2/(w+1) — the
    index is a ~2.5× reduction over d15's every-position span index at
    w=4, and the knob trades index size against the minimum detectable
    match length.

    Distribution: hashing is a stateless per-row explode (the
    span_fingerprints shape); the ONLY wide operation is the per-doc
    window min, whose partition key is doc_id — bounded by document
    length, never corpus-shaped. Tie-break rides inside the min: the
    selection key packs (h40 << 20) | (2^20-1-pos), so MIN() alone picks
    the smallest hash and, among equals, the RIGHTMOST position — one
    aggregate, no secondary sort, same arithmetic in the DuckDB oracle.

    Returns distinct (doc_id, fp) where fp is the selected 40-bit k-gram
    hash."""
    # one md5 per k-gram position is the dominant map cost — widen the
    # single-row-group test scan so it fans out across cores (the
    # _shingle_sets convention; no-op on real multi-row-group tables)
    docs = widen_scan(docs)
    words = T.words(F.col("text"))
    grams = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    kg = docs.select("doc_id", F.posexplode(grams).alias("pos", "gram"))
    h40 = F.conv(F.substring(F.md5(F.col("gram")), 1, 10), 16, 10).cast("long")
    keyed = kg.select(
        "doc_id",
        "pos",
        (
            h40 * F.lit(_WINNOW_POS_BITS)
            + (F.lit(_WINNOW_POS_BITS - 1) - F.col("pos"))
        ).alias("key"),
    )
    dwin = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    dall = Window.partitionBy("doc_id")
    sel = keyed.select(
        "doc_id",
        "pos",
        F.min("key").over(dwin).alias("selkey"),
        F.count(F.lit(1)).over(dall).alias("n_grams"),
    ).filter(F.col("pos") <= F.col("n_grams") - w)  # full windows only
    # decode with a SHIFT, never a float divide: selkey spans 60 bits and
    # double division is only exact to 2^53 (measured: corrupted fp values
    # and asymmetric pair sets at every scale before this fix)
    return sel.select(
        "doc_id", F.shiftright(F.col("selkey"), 20).alias("fp")
    ).distinct()


def winnow_pairs(
    t: dict[str, DataFrame],
    k: int = WINNOW_K,
    w: int = WINNOW_W,
    max_postings: int = WINNOW_MAX_POSTINGS,
    min_shared: int = WINNOW_MIN_SHARED,
) -> DataFrame:
    """D25: document-pair detection over winnowing fingerprints — the
    MOSS/plagiarism-detection verb: (doc_a, doc_b, n_shared fingerprints).
    Complements the dedup family with a GUARANTEED detector: any pair
    sharing a run of ≥ w+k-1 words WILL appear (minhash pairs are
    probabilistic; d15 reports coverage, not pairs).

    Scale shape: the fingerprint index is the inverted-index join (the
    d15 plan), ~2/(w+1) the size of an every-position index, with the
    industry stop-fingerprint guard: a fingerprint posted by more than
    `max_postings` documents (license boilerplate, templates) is dropped
    whole before pairing — the same quadratic-wave cap as d3c's bucket
    cap, tuned by the d17-style postings profile at 100 TB. Pairing
    shuffles only (fp, doc_id) longs."""
    # persisted: the fingerprint index feeds three consumers (the postings
    # profile + both sides of the pair join) — without it each one replays
    # the md5 + per-doc window-min pass over the corpus text (guide §2.4)
    fps = winnow_fingerprints(t["documents"], k, w).transform(shared_persist)
    postings = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("nd"))
    keep = postings.filter(
        (F.col("nd") >= 2) & (F.col("nd") <= max_postings)
    ).select("fp")
    kept = fps.join(F.broadcast(keep), "fp")
    a, b = kept.alias("a"), kept.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
