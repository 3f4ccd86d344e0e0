"""Vector similarity retrieval — SURVEY.md §2.3-J1/J9, §2.5-W1/W2, §2.2-P1.

The reference issues per-store `ORDER BY distance FETCH FIRST k` through
LangChain OracleVS (mcp/tools/vs_retriever.py:245-301), converts distances to
similarities, filters by threshold, dedups keep-max, and re-sorts globally.
Here the whole retrieval is ONE declarative plan:

    candidates ⨯ broadcast(queries) → score expr → threshold filter
    → window top-k per query → (union across stores) → keep-max dedup
    → global top-k

Scale shape: the query side is always tiny (a handful of vectors) and
broadcast; the candidate side streams through codegen'd expressions — no
shuffle until the per-query window, which partitions by query_id (perfectly
parallel, no skew since every query sees ~equal candidates). With the
sign-LSH bucket (v6) the scan itself is pruned ~2^bits-fold.

Default parameters mirror the reference: top_k=8, score_threshold=0.65,
fetch_k=20, lambda_mult=0.5 (core/schemas.py:52-55).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import shared_persist
from ..functions import vector as V

TOP_K = 8
SCORE_THRESHOLD = 0.65
FETCH_K = 20
LAMBDA_MULT = 0.5


def _query_vectors(t: dict[str, DataFrame], vec_ids: list[int]) -> DataFrame:
    emb = t["embeddings"]
    return emb.filter(F.col("vec_id").isin(vec_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def cosine_topk(t: dict[str, DataFrame], query_id: int = 0, k: int = TOP_K) -> DataFrame:
    """J1+W1: single-query cosine top-k. Rounded to 3 like the reference
    (`round(similarity, 3)`, vs_retriever.py:280); ties broken by vec_id so
    the result is a deterministic set."""
    emb = t["embeddings"]
    q = _query_vectors(t, [query_id])
    sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def similarity_conversions(t: dict[str, DataFrame], query_id: int = 0) -> DataFrame:
    """F11/J1: all three metric conversions side by side with the exact
    reference formulas (vs_retriever.py:268-274), rounded to 3 as the
    reference does."""
    emb = t["embeddings"]
    q = _query_vectors(t, [query_id])
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            (F.round(V.cosine_score("embedding", "query_vec"), 3) + F.lit(0.0)).alias("cosine_sim"),
            (F.round(V.dot_score("embedding", "query_vec"), 3) + F.lit(0.0)).alias("dot_sim"),
            (F.round(V.euclidean_score("embedding", "query_vec"), 3) + F.lit(0.0)).alias("euclidean_sim"),
        )
    )


def threshold_search(
    t: dict[str, DataFrame], query_id: int = 0, threshold: float = SCORE_THRESHOLD
) -> DataFrame:
    """P1: score-threshold filter with the reference default 0.65 on the
    COSINE-converted similarity (1 - d/2). The filter sits *before* the
    top-k window, so at scale most candidates die in the scan stage."""
    emb = t["embeddings"]
    q = _query_vectors(t, [query_id])
    sim = F.round(V.cosine_score("embedding", "query_vec"), 3) + F.lit(0.0)
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", sim.alias("similarity"))
        .filter(F.col("similarity") >= threshold)
    )


def multi_query_topk(
    t: dict[str, DataFrame], query_ids: tuple[int, ...] = (0, 1, 2), k: int = 5
) -> DataFrame:
    """W2: per-query top-k — a *batch* of query vectors against the store in
    one plan: crossJoin(broadcast(queries)) + window row_number ≤ k.
    This is the engine's knn-join primitive; the reference runs one Oracle
    query per (question, store) instead (vs_retriever.py:224)."""
    emb = t["embeddings"]
    q = _query_vectors(t, list(query_ids))
    sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def lsh_bucket_topk(
    t: dict[str, DataFrame], query_id: int = 0, k: int = 5, n_bits: int = 8
) -> DataFrame:
    """O6 scale path: approximate top-k searching only the query's sign-LSH
    bucket. At 100 TB the store is written clustered by `bucket` so this
    prunes ~255/256 of the scan via partition pruning; here the bucket
    predicate demonstrates the plan shape. Exact search (cosine_topk) stays
    the default, LSH is the opt-in (SURVEY.md §4-O6)."""
    emb = t["embeddings"].withColumn("bucket", V.sign_bucket("embedding", n_bits))
    q = (
        emb.filter(F.col("vec_id") == query_id)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
            F.col("bucket").alias("query_bucket"),
        )
    )
    sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    return (
        emb.join(F.broadcast(q), emb.bucket == q.query_bucket)
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", "bucket", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def knn_self_join(t: dict[str, DataFrame], k: int = 3, limit_queries: int = 50) -> DataFrame:
    """Brute-force kNN join: for each of the first `limit_queries` vectors,
    its k nearest neighbours (excluding itself). The all-pairs baseline the
    ANN variants are judged against.

    r11 (guide §2.2): the candidate side is widened first — the N·Q
    interpreted HOF cosines are the dominant map cost, and the single-
    row-group fixture scan ran all of them on ONE core out of 32 (profiled:
    2 tasks, 1.9 s of the query's 2.0 s in that one stage). No-op on real
    multi-row-group tables; the query side broadcasts from the narrow scan
    as before. Per-row arithmetic and the window's total order are
    partitioning-independent, so results are bit-identical."""
    from ..tables import widen_scan

    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") < limit_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        widen_scan(emb).crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def _validate_centroid_rows(rows) -> None:
    """Reject a degenerate centroid MODEL (NULL vector or a NULL element
    inside one) identically in every assignment tier. Without this the
    flat tier silently degrades via NULL-distance struct ordering while
    the np tier crashes building its float64 matrix — auto-routing would
    change failure behavior at k>64 (ADVICE r6). Degenerate EMBEDDINGS
    remain handled (min-cid fallthrough, tier-equality-tested); NaN
    centroid elements are also fine (NaN distance sorts greatest in both
    tiers). A broken model is a caller bug, so it raises."""
    for r in rows:
        ce = r["ce"]
        if ce is None or any(x is None for x in ce):
            raise ValueError(
                f"degenerate centroid model: centroid cid={r['cid']} has "
                "a NULL vector or NULL element; fix the centroid source "
                "(all assignment tiers reject this identically)"
            )


def _assign_cells(emb: DataFrame, cents: DataFrame, rows=None) -> DataFrame:
    """Cell assignment, map-only: the centroid set is a tiny model, so it is
    collected once and inlined as an array-of-structs expression; every
    vector computes argmin(dist, cid) inside a single projection
    (`array_min` over (dist, cid) structs — lexicographic struct ordering
    gives the same dist-then-cid tie-break as the aggregate form).

    This replaces the previous crossJoin + groupBy(vec_id) formulation whose
    exchange carried the full corpus WITH embedding arrays. Now assignment
    fuses into the scan — zero shuffles — which is the correct 100 TB shape:
    centroids ship to workers as part of the plan (exactly how FAISS-style
    IVF distributes its coarse quantizer), and the write path clusters the
    store by the resulting cid. `rows` lets a caller that already collected
    the centroid model (e.g. ivfpq_topk) skip the duplicate collect job."""
    if rows is None:
        rows = cents.collect()
    _validate_centroid_rows(rows)
    if not rows:
        # an empty centroid literal types as VOID and fails analysis; with
        # no cells there is nothing to assign — empty result, right schema
        return emb.limit(0).select(
            "vec_id", "label", "embedding", F.lit(0).cast("long").alias("cid")
        )
    # one array literal per centroid (not one scalar literal per dim) keeps
    # the expression tree small — codegen compiles in milliseconds even at
    # high dim, and the literal ships once inside the serialized plan
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(int(r["cid"])).cast("long").alias("cid"),
                F.lit([float(x) for x in r["ce"]]).alias("ce"),
            )
            for r in rows
        ]
    )
    dcs = F.transform(
        cent_arr,
        lambda c: F.struct(
            V.euclidean_distance(F.col("embedding"), c["ce"]).alias("dist"),
            c["cid"].alias("cid"),
        ),
    )
    return emb.select(
        "vec_id", "label", "embedding", F.array_min(dcs)["cid"].alias("cid")
    )


def _assign_cells_np(emb: DataFrame, cents: DataFrame, rows=None) -> DataFrame:
    """The Arrow/BLAS tier of cell assignment (VERDICT r5 task 6 — v20's
    pattern applied to the WRITE path): same logical operator as
    `_assign_cells`, but the argmin runs as one (batch x k) numpy distance
    matrix per Arrow batch instead of a k-literal expression tree.
    Identical output contract: nearest centroid by euclidean distance,
    ties broken by MIN cid (centroids are sorted cid-ascending and
    `argmin` returns the first minimum; squared distance has the same
    argmin as the root). Like v20, all arithmetic is float64 — numpy's
    pairwise summation can differ from the expression fold by round-off
    ulps on near-equidistant centroids; the tiers are equality-tested on
    the fixtures (tests/test_similarity.py).

    Scale rationale: the flat expression form pays an interpreted-HOF
    evaluation per (vector, centroid) AND a codegen/analysis cost that
    grows with the k-struct literal; this tier ships the centroid matrix
    once per task closure and stays O(n·k) in BLAS flops with no
    expression-size term — the shape that survives corpus-scaled k
    (tools/assign_bench.py measures the tiers side by side)."""
    import numpy as np

    from pyspark.sql.types import LongType, StructField, StructType

    if rows is None:
        rows = cents.collect()
    _validate_centroid_rows(rows)
    base = emb.select("vec_id", "label", "embedding")
    if not rows:
        return base.limit(0).withColumn("cid", F.lit(0).cast("long"))
    order = sorted(rows, key=lambda r: int(r["cid"]))
    cids = np.asarray([int(r["cid"]) for r in order], dtype=np.int64)
    C = np.ascontiguousarray(
        [[float(x) for x in r["ce"]] for r in order], dtype=np.float64
    )
    schema = StructType(base.schema.fields + [StructField("cid", LongType())])

    dim = C.shape[1]

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            vecs = list(pdf["embedding"])
            ok = np.asarray(
                [v is not None and len(v) == dim for v in vecs], dtype=bool
            )
            # NULL (or wrong-dim) embedding: every distance is NULL, and
            # the flat tier's struct ordering then falls through to the
            # MIN cid — reproduce that here so the tiers stay bit-equal
            # on the degenerate gauntlet
            out = np.full(len(vecs), cids[0], dtype=np.int64)
            if ok.any():
                X = np.asarray(
                    [np.asarray(v, dtype=np.float64) for v, o in zip(vecs, ok) if o]
                )
                # ||x-c||^2 expanded form: one (n,k) GEMM + broadcast norms —
                # O(n·k·d) flops without materializing (n,k,d)
                d2 = (
                    (X * X).sum(axis=1)[:, None]
                    - 2.0 * (X @ C.T)
                    + (C * C).sum(axis=1)[None, :]
                )
                # NaN sorts GREATEST in Spark's ordering (the flat tier only
                # picks a NaN-distance cell when every distance is NaN, and
                # then ties break to min cid) — +inf gives argmin the same
                # semantics, with the all-inf row landing on index 0 = min cid
                d2 = np.where(np.isnan(d2), np.inf, d2)
                out[ok] = cids[d2.argmin(axis=1)]
            yield pdf.assign(cid=out)

    return base.mapInPandas(_assign, schema)


# Above this centroid count the flat inlined-literal argmin loses to the
# Arrow tier (VERDICT r5 task 1 measurements, tools/assign_bench.py at the
# 64x tile / 128k vectors: flat 27.1 s vs np 3.7 s at k=256; at corpus-
# scaled k the flat expression ALSO pays a per-session analysis/codegen
# cost that grows with the k-struct literal — the k=640 micro-bench that
# timed out in r5). At or below the threshold the flat form wins: it fuses
# into the scan with zero Python, and every driver fixture (k=16) stays on
# the oracle-pinned flat plan.
ASSIGN_FLAT_MAX_K = 64


def choose_assignment_tier(k: int) -> str:
    """Assignment tier for a k-centroid coarse quantizer: 'flat' (inlined
    JVM expression, zero Python) below ASSIGN_FLAT_MAX_K, else 'np' (the
    Arrow/BLAS mapInPandas kernel). Tested bit-equal on the fixtures; the
    routing is what lets auto-k consumers (semdedup, semantic decon, the
    IVF family) survive corpus-scaled k without a per-op tier choice."""
    return "flat" if k <= ASSIGN_FLAT_MAX_K else "np"


def assign_cells_auto(emb: DataFrame, cents: DataFrame, rows=None) -> DataFrame:
    """`_assign_cells` with automatic tier selection (VERDICT r5 task 1).
    Same output contract as both tiers: nearest centroid, euclidean,
    min-cid tie-break."""
    if rows is None:
        rows = cents.collect()
    if choose_assignment_tier(len(rows)) == "flat":
        return _assign_cells(emb, cents, rows=rows)
    return _assign_cells_np(emb, cents, rows=rows)


def _ivf_assign(emb: DataFrame, n_centroids: int):
    """(centroids, cell assignment) for IVF: centroids seed from a fixed
    corpus subset (deterministic k-means init). Assignment tier is chosen
    by k (assign_cells_auto) so auto-k callers scale past the flat
    expression form's limit."""
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    return cents, assign_cells_auto(emb, cents)


def _lloyd_update(assigned: DataFrame) -> DataFrame:
    """One Lloyd iteration as pure DataFrame ops: new centroid = per-dim
    mean of its cell's vectors. posexplode → two partial-agg shuffles →
    re-assembled array (sorted by dim position). Iterative ML refinement
    without leaving Catalyst — at 100 TB each iteration is two shuffles of
    (cells × dims) doubles, independent of corpus size after the first
    partial aggregation."""
    return (
        assigned.select("cid", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("cid", "pos")
        .agg(F.avg("val").alias("m"))
        .groupBy("cid")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select(
            "cid",
            F.transform("pm", lambda x: x["m"].cast("float")).alias("ce"),
        )
    )


def ivf_kmeans_topk(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    n_centroids: int = 16,
    n_probe: int = 4,
    iterations: int = 2,
) -> DataFrame:
    """IVF with k-means-refined centroids: deterministic seed centroids,
    `iterations` Lloyd updates (assign → mean → re-assign), then the same
    probe+search plan as ivf_topk. Tighter cells → better recall at equal
    n_probe. Oracle-backed despite the iterative shape: the fixed 2-round
    Lloyd loop unrolls into chained SQL CTEs (assign → per-dim AVG →
    float32-quantize → reassign), exact at sf0.01 and sf0.1; recall is
    additionally unit-tested against brute force."""
    emb = t["embeddings"]
    cents, assigned = _ivf_assign(emb, n_centroids)
    for _ in range(iterations):
        cents = _lloyd_update(assigned)
        assigned = assign_cells_auto(emb, cents)
    q = _query_vectors(t, [query_id])
    return _probe_and_search(cents, assigned, q, query_id, k, n_probe)


def _probe_and_search(
    cents: DataFrame,
    assigned: DataFrame,
    q: DataFrame,
    query_id: int,
    k: int,
    n_probe: int,
) -> DataFrame:
    """Shared IVF tail: rank cells by query-centroid distance, semi-join the
    n_probe nearest into the assignment, score with the rounding contract
    the DuckDB oracle mirrors, take the top-k."""
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select("cid", V.euclidean_distance("ce", "query_vec").alias("qdist"))
        .orderBy(F.asc("qdist"), F.asc("cid"))
        .limit(n_probe)
        .select("cid")
    )
    sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    return (
        assigned.join(F.broadcast(probe), "cid", "left_semi")
        .filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", "cid", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_topk(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """O6 scale path #2: IVF-style ANN. Coarse centroids are a fixed subset
    of the corpus (deterministic stand-in for k-means — the assignment and
    probe plan shapes are identical); every vector is assigned to its
    nearest centroid, the query probes only the `n_probe` nearest cells.

    Scale shape: assignment is a write-path cost — at 100 TB the store is
    written clustered/partitioned by `cid`, so the probe semi-join becomes
    partition pruning and the scan reads n_probe/n_centroids of the data.
    Recall is traded against `n_probe` exactly as in FAISS-style IVF-Flat.
    """
    from ..tables import widen_scan

    emb = t["embeddings"]
    # r11 (guide 2.2): widen the assignment input - the per-row argmin fold
    # over the inlined centroid model is the dominant map cost, and the
    # single-row-group fixture scan ran it on one core. Round-robin only
    # (the map-only guard forbids a vec_id hash exchange); no-op on real
    # multi-row-group tables; per-row arithmetic and the top-k total order
    # are partitioning-independent.
    cents, assigned = _ivf_assign(widen_scan(emb), n_centroids)
    q = _query_vectors(t, [query_id])
    return _probe_and_search(cents, assigned, q, query_id, k, n_probe)


def ivf_knn_join(
    t: dict[str, DataFrame],
    n_queries: int = 20,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Batch ANN: the kNN *join* over IVF cells — every query probes its
    `n_probe` nearest cells; candidates are scored and top-k'd per query.
    This is the training-pipeline shape (dedup/retrieval over millions of
    queries): one cell assignment is shared by ALL queries, the probe list
    is a tiny broadcast, and the per-query window parallelizes on query_id.
    At scale with the store partitioned by `cid`, each query reads
    n_probe/n_centroids of the data — same plan, pruned scan."""
    from ..tables import widen_scan

    emb = t["embeddings"]
    # r11: same widen-the-assignment-input move as ivf_topk (guide 2.2);
    # the query side stays on the narrow scan (it broadcasts).
    cents, assigned = _ivf_assign(widen_scan(emb), n_centroids)
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    w_probe = Window.partitionBy("query_id").orderBy(F.asc("qdist"), F.asc("cid"))
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select(
            "cid",
            "query_id",
            "query_vec",
            V.euclidean_distance("ce", "query_vec").alias("qdist"),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("cid", "query_id", "query_vec")
    )
    sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    w_k = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        assigned.join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "cid", sim.alias("cos_sim"))
        .withColumn("rnk", F.row_number().over(w_k))
        .filter(F.col("rnk") <= k)
    )


def matmul_knn_join(
    t: dict[str, DataFrame], k: int = 3, limit_queries: int = 50
) -> DataFrame:
    """Brute-force kNN join, BLAS tier: identical semantics (and oracle) to
    knn_self_join, but the scoring runs as one numpy matmul per Arrow batch
    inside mapInPandas instead of per-row `zip_with`/`aggregate` exprs.

    Why this exists: Spark's higher-order array functions are interpreted
    (not whole-stage-codegen'd), so N·Q·d scalar ops dominate the exact
    tier. A normalized `V @ Qᵀ` hits vectorized BLAS — orders of magnitude
    more FLOPs/s — and each batch emits only its local top-k per query, so
    the shuffle into the final per-query window carries O(batches·Q·k)
    rows, never N·Q. At 100 TB this is the exact-search workhorse; the
    query block (the broadcast side) just grows to a tile loop.

    Per-batch pruning orders by (rounded sim desc, vec_id asc) — the same
    total order as the final window — so pruning can never change the
    result."""
    import numpy as np
    import pandas as pd

    emb = t["embeddings"]
    q_rows = (
        emb.filter(F.col("vec_id") < limit_queries)
        .select("vec_id", "embedding")
        .collect()
    )
    q_ids = np.array([r.vec_id for r in q_rows], dtype=np.int64)
    qn = np.array([r.embedding for r in q_rows], dtype=np.float64)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    bq = emb.sparkSession.sparkContext.broadcast((q_ids, qn))

    def _score(batches):
        ids, qmat = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
            vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
            sims = np.round(vecs @ qmat.T, 3) + 0.0  # (n, q)
            vec_ids = pdf["vec_id"].to_numpy()
            parts = []
            for j in range(sims.shape[1]):
                mask = vec_ids != ids[j]
                cand_v, cand_s = vec_ids[mask], sims[mask, j]
                keep = np.lexsort((cand_v, -cand_s))[:k]
                parts.append(
                    pd.DataFrame(
                        {
                            "query_id": np.full(len(keep), ids[j], dtype=np.int64),
                            "vec_id": cand_v[keep],
                            "cos_sim": cand_s[keep],
                        }
                    )
                )
            if parts:
                yield pd.concat(parts, ignore_index=True)

    from ..tables import widen_scan

    partial = widen_scan(emb).mapInPandas(
        _score, "query_id long, vec_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return partial.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") <= k)


def union_store_results(t: dict[str, DataFrame], query_id: int = 0, k: int = 5) -> DataFrame:
    """U2: result concatenation across fan-out store searches
    (vs_retriever.py:240-242 extends one hit list per searched table).
    Two "stores" = label partitions of the corpus; per-store top-k plans
    union into one distributed result — no driver-side list append."""
    emb = t["embeddings"]
    q = _query_vectors(t, [query_id])
    sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)

    def store_topk(store: DataFrame, name: str) -> DataFrame:
        return (
            store.crossJoin(F.broadcast(q))
            .filter(F.col("vec_id") != query_id)
            .select(
                F.lit(name).alias("searched_table"), "vec_id", sim.alias("cos_sim")
            )
            .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
            .limit(k)
        )

    low = store_topk(emb.filter(F.col("label") < 5), "store_low")
    high = store_topk(emb.filter(F.col("label") >= 5), "store_high")
    return low.unionByName(high)


def _mmr_select(vecs, rel, k: int, lambda_mult: float) -> list[int]:
    """Greedy MMR over one candidate set (numpy); shared by the driver-side
    single-query path and the grouped batch path."""
    import numpy as np

    vnorm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    pair_sim = vnorm @ vnorm.T
    selected = [0]  # candidates arrive relevance-sorted
    while len(selected) < min(k, len(rel)):
        best_i, best_score = -1, -np.inf
        for i in range(len(rel)):
            if i in selected:
                continue
            redundancy = max(pair_sim[i][j] for j in selected)
            score = lambda_mult * rel[i] - (1 - lambda_mult) * redundancy
            if score > best_score:
                best_i, best_score = i, score
        selected.append(best_i)
    return selected


def mmr_rerank_batch(
    t: dict[str, DataFrame],
    n_queries: int = 10,
    k: int = TOP_K,
    fetch_k: int = FETCH_K,
    lambda_mult: float = LAMBDA_MULT,
) -> DataFrame:
    """J9 at pipeline scale: MMR for MANY queries at once. The distributed
    top-fetch_k plan produces ≤fetch_k candidates per query; a grouped
    applyInPandas runs the greedy selection per query in parallel — each
    group is tiny (≤20 rows) so the Python cost is bounded while thousands
    of queries re-rank concurrently. This is what the reference's one-query-
    at-a-time LangChain MMR (vs_retriever.py:283-294) becomes on Spark."""
    import numpy as np
    import pandas as pd

    emb = t["embeddings"]
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    rel_col = V.cosine_similarity("embedding", "query_vec")
    w = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("vec_id"))
    cands = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", "embedding", rel_col.alias("rel"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= fetch_k)
    )

    def _rerank(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["rn"]).reset_index(drop=True)
        vecs = np.array(list(pdf["embedding"]), dtype=np.float64)
        rel = pdf["rel"].to_numpy()
        order = _mmr_select(vecs, rel, k, lambda_mult)
        return pd.DataFrame(
            {
                "query_id": key[0],
                "vec_id": pdf.loc[order, "vec_id"].astype("int64").values,
                "mmr_rank": range(1, len(order) + 1),
                "relevance": [round(float(rel[i]), 3) for i in order],
            }
        )

    return cands.groupBy("query_id").applyInPandas(
        _rerank, "query_id long, vec_id long, mmr_rank int, relevance double"
    )


def mmr_rerank(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    fetch_k: int = FETCH_K,
    lambda_mult: float = LAMBDA_MULT,
) -> DataFrame:
    """J9: Maximal-Marginal-Relevance re-rank. Fetch_k candidates come from
    the distributed top-k plan; the greedy selection runs on the collected
    candidate set — exactly the reference's shape (LangChain MMR over ≤20
    rows, vs_retriever.py:283-294). Candidates are tiny by construction, so
    driver-side numpy is the right tool; the heavy lifting (scoring all N
    vectors) stayed in Spark.

    Oracle-backed despite being iterative: the greedy selection is a
    recursive CTE in DuckDB (the chosen set rides as a list, a correlated
    argmax picks each step) — exact match at sf0.01 and sf0.1.
    """
    import numpy as np

    emb = t["embeddings"]
    spark = emb.sparkSession
    q = _query_vectors(t, [query_id])
    sim = V.cosine_similarity("embedding", "query_vec")
    cands = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", "embedding", sim.alias("rel"))
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(fetch_k)
        .collect()
    )
    if not cands:
        return spark.createDataFrame([], "vec_id long, mmr_rank int, relevance double")
    vecs = np.array([r.embedding for r in cands], dtype=np.float64)
    rel = np.array([r.rel for r in cands])
    selected = _mmr_select(vecs, rel, k, lambda_mult)

    rows = [
        (int(cands[i].vec_id), rank + 1, float(round(rel[i], 3)))
        for rank, i in enumerate(selected)
    ]
    return spark.createDataFrame(rows, "vec_id long, mmr_rank int, relevance double")


def _sq_dist(a, b):
    """Σ (aᵢ-bᵢ)² in DOUBLE — squared euclidean, additive across subspaces
    (the property PQ's asymmetric-distance sum relies on)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _pq_subvectors(emb: DataFrame, m: int, dims: int) -> DataFrame:
    """Slice each embedding into `m` contiguous subvectors:
    (vec_id, sub_id ∈ [0,m), subvec of dims/m floats). Pure narrow map."""
    d = dims // m
    slices = F.array(*[F.slice("embedding", i * d + 1, d) for i in range(m)])
    return emb.select("vec_id", F.posexplode(slices).alias("sub_id", "subvec"))


def pq_topk(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    m: int = 8,
    n_codes: int = 16,
    dims: int = 64,
    refine: int = 4,
) -> DataFrame:
    """O6 scale path #3: product quantization — the compressed-domain ANN
    tier below IVF. Each vector is encoded as `m` one-byte codes (nearest
    codebook centroid per subspace): 64 float32 dims → 8 codes, a 32×
    compression of what the candidate scan has to read and shuffle. The
    query never decompresses the corpus: a (m × n_codes) asymmetric-distance
    table is built once from the query and broadcast, the approximate
    distance is SUM(table[sub, code]) — a partial-aggregable groupBy over
    codes — and only the `refine·k` best candidates are re-ranked exactly.

    Scale shape: codebooks and the ADC table are tiny broadcasts; the
    encode pass is a write-path cost (stored alongside the store like the
    IVF cell id); the read path scans codes only, so at 100 TB the
    candidate generation reads m bytes/vector instead of 4·dims. Codebooks
    seed deterministically from the corpus head (same convention as
    `ivf_topk`; k-means refinement composes exactly as `_lloyd_update`).
    Approximate by design, but deterministic — the encode/ADC/refine
    pipeline is hash-verified against a full SQL re-derivation; recall is
    additionally unit-tested against brute force."""
    emb = t["embeddings"]
    subs = _pq_subvectors(emb, m, dims)
    books = subs.filter(F.col("vec_id") < n_codes).select(
        "sub_id", F.col("vec_id").alias("code"), F.col("subvec").alias("cvec")
    )
    encoded = (
        subs.join(F.broadcast(books), "sub_id")
        .select(
            "vec_id",
            "sub_id",
            F.struct(_sq_dist("subvec", "cvec").alias("d"), F.col("code")).alias("dc"),
        )
        .groupBy("vec_id", "sub_id")
        .agg(F.min("dc").alias("best"))
        .select("vec_id", "sub_id", F.col("best.code").alias("code"))
    )
    q = _query_vectors(t, [query_id])
    qsubs = _pq_subvectors(
        q.select(F.lit(-1).alias("vec_id"), F.col("query_vec").alias("embedding")),
        m,
        dims,
    ).select("sub_id", F.col("subvec").alias("qsub"))
    adc = books.join(qsubs, "sub_id").select(
        "sub_id", "code", _sq_dist("cvec", "qsub").alias("qd")
    )
    cands = (
        encoded.join(F.broadcast(adc), ["sub_id", "code"])
        .groupBy("vec_id")
        # round-9 before the cut: identical candidates (same codes) must
        # tie EXACTLY so the vec_id tie-break is engine-independent —
        # DuckDB's parallel hash aggregate sums equal groups in different
        # orders, so unrounded sums differ by ulps between identical rows
        # (caught by the r9 sf0.001 strict check on v20)
        .agg(F.round(F.sum("qd"), 9).alias("approx_d"))
        .filter(F.col("vec_id") != query_id)
        .orderBy(F.asc("approx_d"), F.asc("vec_id"))
        .limit(refine * k)
        .select("vec_id")
    )
    sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    return (
        emb.join(F.broadcast(cands), "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def ann_recall(
    t: dict[str, DataFrame],
    n_queries: int = 20,
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """ANN quality evaluation: recall@k of the IVF kNN join against the
    exact brute-force kNN, per query. This is the "measure, don't guess"
    counterpart to the IVF operators — the query a pipeline runs before
    committing to an (n_centroids, n_probe) operating point, exactly how
    FAISS-style deployments pick nprobe.

    Plan shape: both kNN sides reduce to k rows per query before the
    comparison join, so the recall join touches n_queries*k rows — free at
    any corpus scale; the cost is the two kNN plans themselves (the exact
    side is the one that doesn't survive 100 TB, which is the point of
    measuring on a sample)."""
    exact = knn_self_join(t, k=k, limit_queries=n_queries).select(
        "query_id", "vec_id"
    )
    approx = ivf_knn_join(
        t, n_queries=n_queries, k=k, n_centroids=n_centroids, n_probe=n_probe
    ).select("query_id", "vec_id", F.lit(1).alias("hit"))
    return (
        exact.join(approx, ["query_id", "vec_id"], "left")
        .groupBy("query_id")
        .agg(F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_hits"))
        .select(
            "query_id",
            "n_hits",
            F.round(F.col("n_hits") / F.lit(float(k)), 3).alias("recall_at_k"),
        )
    )


HYBRID_CANDIDATES = 50
RRF_K = 60


def hybrid_rrf_topk(
    t: dict[str, DataFrame],
    query_id: int = 0,
    query_terms: tuple[str, ...] = ("window", "stream", "join"),
    k: int = TOP_K,
    n_candidates: int = HYBRID_CANDIDATES,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Hybrid retrieval: keyword and vector top-N candidate lists fused by
    Reciprocal Rank Fusion — the engine extension a RAG deployment layers
    over pure vector search (the reference searches vectors only; hybrid is
    the standard recall backstop for exact-term queries).

    RRF operates on the truncated per-modality rankings (the production
    shape: fuse top-N lists, never rank the full corpus): each modality
    contributes 1/(rrf_k + rank) for docs in its top-N, absent docs
    contribute nothing. Both top-Ns are TakeOrderedAndProject prunes —
    per-partition top-N then one tiny merge, no global sort; the fusion
    join touches 2N rows. Ranks use rounded scores with doc_id tie-breaks
    so both engines order identically."""
    docs, emb = t["documents"], t["embeddings"]

    kw_score = sum(
        (F.size(F.regexp_extract_all("text", F.lit(term), F.lit(0))).cast("long")
         for term in query_terms),
        start=F.lit(0).cast("long"),
    )
    w_kw = Window.orderBy(F.desc("kw_score"), F.asc("doc_id"))
    kw = (
        docs.select("doc_id", kw_score.alias("kw_score"))
        .orderBy(F.desc("kw_score"), F.asc("doc_id"))
        .limit(n_candidates)
        .withColumn("r_kw", F.row_number().over(w_kw))
    )

    q = _query_vectors(t, [query_id])
    cos = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    w_vec = Window.orderBy(F.desc("cos_sim"), F.asc("doc_id"))
    vec = (
        emb.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select(F.col("vec_id").alias("doc_id"), cos.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("doc_id"))
        .limit(n_candidates)
        .withColumn("r_vec", F.row_number().over(w_vec))
    )

    contrib = lambda r: F.coalesce(  # noqa: E731
        F.lit(1.0) / (F.lit(rrf_k) + r), F.lit(0.0)
    )
    return (
        kw.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.round(contrib(F.col("r_kw")) + contrib(F.col("r_vec")), 6).alias(
                "rrf_score"
            ),
            "r_kw",
            "r_vec",
        )
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(k)
    )


RANGE_RADIUS = 1.2
# Pruning slack: covers the 3-decimal output rounding (±5e-4) plus float
# jitter in the bound arithmetic, so a boundary hit can never sit in a
# pruned cell.
RANGE_PRUNE_EPS = 1e-3


def _range_live_cells(
    cents: DataFrame, cell_r: DataFrame, q: DataFrame, radius: float
) -> DataFrame:
    """Cells whose triangle-inequality lower bound admits a hit:
    d(q, c) - r_cell <= radius (+ slack). Exposed for the pruning test."""
    return (
        cents.join(F.broadcast(cell_r), "cid")
        .crossJoin(F.broadcast(q))
        .select(
            "cid",
            (V.euclidean_distance("ce", "query_vec") - F.col("r_cell")).alias("lb"),
        )
        .filter(F.col("lb") <= F.lit(radius + RANGE_PRUNE_EPS))
        .select("cid")
    )


def range_search(
    t: dict[str, DataFrame],
    query_id: int = 0,
    radius: float = RANGE_RADIUS,
    n_centroids: int = 16,
) -> DataFrame:
    """v16: EXACT radius search with IVF cell pruning — every vector within
    `radius` of the query, guaranteed identical to brute force (and
    hash-verified against the brute-force oracle), but the scan skips whole
    cells via the triangle inequality:

        d(q, x) >= d(q, c) - d(x, c) >= d(q, c) - r_cell

    so a cell whose lower bound exceeds radius (+eps) cannot contain a hit
    and is pruned BEFORE any per-vector distance is computed. Unlike
    ivf_topk this trades nothing: pruning is conservative, recall is 1.0 by
    construction.

    Scale shape: per-cell radii are one partial-aggregable groupBy over the
    assignment (a write-path statistic, stored with the clustered layout);
    the probe list is cells-sized and broadcasts; the big side is scanned
    only for surviving cells — with the store partitioned by cid that is
    partition pruning, same as v13. On clustered corpora most cells prune
    (proven in tests/test_similarity.py on constructed clusters); on
    uniformly random vectors distance concentration leaves little to prune,
    which is a property of the data, not the plan."""
    from ..tables import widen_scan

    emb = t["embeddings"]
    # r11: widen the assignment input (guide 2.2) - BOTH consumers (the
    # radii aggregate and the pruned scan) re-run the argmin fold, and the
    # fixture scan put each on one core. No-op at real scale; the stored
    # twin (v16b) reads radii off the store and never recomputes.
    cents, assigned = _ivf_assign(widen_scan(emb), n_centroids)
    cell_r = (
        assigned.join(F.broadcast(cents), "cid")
        .select("cid", V.euclidean_distance("embedding", "ce").alias("dc"))
        .groupBy("cid")
        .agg(F.max("dc").alias("r_cell"))
    )
    q = _query_vectors(t, [query_id])
    live_cells = _range_live_cells(cents, cell_r, q, radius)
    dist = F.round(V.euclidean_distance("embedding", "query_vec"), 3) + F.lit(0.0)
    return (
        assigned.join(F.broadcast(live_cells), "cid", "left_semi")
        .crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", "label", dist.alias("dist"))
        .filter(F.col("dist") <= radius)
    )


def _ivfpq_model(
    emb: DataFrame,
    query_id: int,
    n_centroids: int,
    n_probe: int,
    m: int,
    n_codes: int,
    dims: int,
):
    """Driver-side IVFPQ model fit, shared by the expression tier
    (ivfpq_topk) and the numpy tier (ivfpq_topk_np): ONE bounded collect
    (centroids + codebook seeds + query) → (C, books, probed, qd,
    assigned). These are exactly the artifacts a FAISS index file holds;
    fitting them is a write-path cost."""
    model_rows = (
        emb.filter((F.col("vec_id") < max(n_centroids, n_codes)) | (F.col("vec_id") == query_id))
        .select("vec_id", "embedding")
        .collect()
    )
    by_id = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in model_rows}
    C = [by_id[c] for c in range(n_centroids)]
    assigned = _assign_cells(
        emb,
        emb.filter(F.col("vec_id") < n_centroids).select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
        ),
        rows=[{"cid": c, "ce": C[c]} for c in range(n_centroids)],
    )
    d = dims // m

    def _d2(u, v):
        acc = 0.0
        for x, y in zip(u, v):
            acc += (x - y) ** 2
        return acc

    # shared residual codebooks per subspace, seeded from the corpus head
    # (deterministic, same convention as pq_topk / ivf_topk): codebook
    # entry `code` of subspace `s` is that head vector's residual slice
    books: list[list[list[float]]] = [[None] * n_codes for _ in range(m)]
    for code in range(n_codes):
        e = by_id[code]
        cid = min(range(len(C)), key=lambda c: (_d2(e, C[c]), c))
        resid = [x - y for x, y in zip(e, C[cid])]
        for s in range(m):
            books[s][code] = resid[s * d : (s + 1) * d]

    # probe the n_probe nearest cells; per-cell ADC table from the
    # query residual: qd[p][s][c] = ||q_resid_slice - codebook[s][c]||^2
    qe = by_id[query_id]
    probed = sorted(range(len(C)), key=lambda c: (_d2(qe, C[c]), c))[:n_probe]
    qd = []
    for cid in probed:
        qresid = [x - y for x, y in zip(qe, C[cid])]
        qd.append(
            [
                [_d2(qresid[s * d : (s + 1) * d], books[s][c]) for c in range(n_codes)]
                for s in range(m)
            ]
        )
    return C, books, probed, qd, qe, assigned


def _dlit(vals) -> str:
    """Nested DOUBLE-array literal as one parseable SQL string. repr()
    round-trips every finite double exactly, and Spark parses decimal /
    scientific literals with correct rounding, so `F.expr(_dlit(v))`
    builds the same literal tree as the nested-F.lit form at a tiny
    fraction of the py4j round-trips (see ivfpq_topk)."""
    if isinstance(vals, (list, tuple)):
        return "array(" + ",".join(_dlit(v) for v in vals) + ")"
    v = float(vals)
    if v != v or v in (float("inf"), float("-inf")):
        # repr() would emit 'nanD'/'infD', which fails at expression PARSE
        # with a message pointing nowhere near the cause (ADVICE r10). A
        # non-finite value here means a corrupt model-fit collect — fail
        # loudly at the source instead.
        raise ValueError(
            f"_dlit: non-finite model scalar {v!r} — upstream model fit "
            "produced NaN/Inf (corrupt embeddings?); refusing to build an "
            "unparseable literal"
        )
    return repr(v) + "D"


def ivfpq_topk(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    dims: int = 64,
    refine: int = 4,
) -> DataFrame:
    """O6 scale path #4: IVF+PQ — the two ANN tiers composed the way a
    FAISS-style IVFPQ index composes them. Coarse quantizer (IVF cells)
    prunes the scan to n_probe/n_centroids of the corpus; within the
    probed cells the RESIDUAL (vector − cell centroid) is product-
    quantized to `m` codes, and candidates are ranked by an asymmetric-
    distance table before an exact re-rank of the `refine·k` best.
    Residual quantization is what distinguishes IVFPQ from flat PQ:
    residuals concentrate near zero, so the same codebook budget buys
    materially better recall.

    Read-path plan shape — ZERO shuffles before the top-k: every model is
    tiny and ships inside the plan (centroids n_centroids·dims floats,
    codebooks m·n_codes·(dims/m) floats, ADC table n_probe·m·n_codes
    doubles — the exact artifacts a FAISS index file holds), so cell
    assignment, probe filter, code argmin, and the ADC sum are ONE fused
    projection over the scan, followed by TakeOrderedAndProject for the
    refine·k cut and a broadcast-semi-join exact re-rank. At 100 TB the
    store is written clustered by cid with codes precomputed alongside
    (write-path cost), making the probe filter partition pruning and the
    projection a lookup instead of an argmin. The whole index — coarse
    assignment, residual codebooks, ADC tables, refine — is hash-verified
    against a full SQL re-derivation (exact at sf0.01/sf0.1); recall is
    additionally unit-tested against brute force
    (tests/test_similarity.py)."""
    emb = t["embeddings"]
    C, books, probed, qd, qe, assigned = _ivfpq_model(
        emb, query_id, n_centroids, n_probe, m, n_codes, dims
    )
    d = dims // m

    # --- map-only candidate scoring, inlined models ---
    # Each model array is ONE JVM-parsed F.expr literal, not a py4j Column
    # construction per scalar — the _rp_project driver-cost lesson
    # (similarity.py finding-11): the per-scalar form spent ~2 s of DRIVER
    # time per call building ~700 literal Columns for the same values
    # (repr() round-trips doubles exactly, so the parsed literals are
    # bit-identical to F.lit's).
    ce_arr = F.expr(_dlit(C))
    books_arr = F.expr(_dlit(books))
    qd_arr = F.expr(_dlit(qd))
    probe_arr = F.expr(
        "array(" + ",".join(f"{int(c)}L" for c in probed) + ")"
    )
    resid = F.zip_with(
        "embedding", F.element_at(ce_arr, F.col("cid").cast("int") + 1), lambda x, y: x - y
    )
    sub_d2 = lambda rs, cv: F.aggregate(  # noqa: E731
        F.zip_with(rs, cv, lambda x, y: (x.cast("double") - y.cast("double")) ** 2),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    qd_cell = F.element_at(qd_arr, F.col("ppos").cast("int"))
    approx = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            F.element_at(qd_cell, s.cast("int") + 1),
            F.array_min(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_codes - 1)),
                    lambda c: F.struct(
                        sub_d2(
                            F.slice(F.col("resid"), s.cast("int") * d + 1, d),
                            F.element_at(
                                F.element_at(books_arr, s.cast("int") + 1),
                                c.cast("int") + 1,
                            ),
                        ).alias("dd"),
                        c.alias("code"),
                    ),
                )
            )["code"].cast("int")
            + 1,
        ),
    )
    cands = (
        assigned.withColumn("ppos", F.array_position(probe_arr, F.col("cid")))
        .filter(F.col("ppos") > 0)
        .withColumn("resid", resid)
        .select("vec_id", F.round(approx, 9).alias("approx_d"))
        .filter(F.col("vec_id") != query_id)
        .orderBy(F.asc("approx_d"), F.asc("vec_id"))
        .limit(refine * k)
        .select("vec_id")
    )
    # exact re-rank with the query inlined (it is already in the collected
    # model — no extra scan job / crossJoin needed)
    sim = F.round(V.cosine_similarity("embedding", F.lit(qe)), 3) + F.lit(0.0)
    return (
        emb.join(F.broadcast(cands), "vec_id", "left_semi")
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def filtered_topk(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    label_filter: int = 1,
) -> DataFrame:
    """V18: metadata-filtered vector search — top-k among only the vectors
    whose metadata matches a predicate (label here; in the reference the
    analog is per-store scoping + Deep-Data-Security row filters on the
    retriever, mcp/tools/vs_retriever.py). PRE-filter strategy: the
    predicate is applied before scoring, so selectivity prunes the scan —
    the right default when the predicate reaches the storage layer
    (parquet predicate pushdown / partition pruning on the label column).
    The alternative (post-filter after an unfiltered top-k) under-returns
    when the filter is selective — the classic filtered-ANN trap; this
    operator never under-returns k.

    Plan shape: filter is pushed to the scan (PushedFilters on label),
    then the same broadcast-query score + TakeOrderedAndProject tail as
    v1. At 100 TB with the store partitioned by label/tenant the scan
    reads only matching partitions."""
    emb = t["embeddings"].filter(F.col("label") == label_filter)
    q = _query_vectors(t, [query_id])
    sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    return (
        emb.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def crossencoder_rerank(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    fetch_k: int = FETCH_K,
) -> DataFrame:
    """D14: two-stage retrieval — bi-encoder recall then cross-encoder
    precision: stage 1 takes the cosine top-`fetch_k` (cheap, index-
    servable); stage 2 scores each (query, candidate) PAIR with a
    cross-encoder and keeps the top-`k` by that score. The standard RAG
    precision backstop the reference approximates with its LLM grade step
    (mcp/tools/vs_grade.py) — graded per retrieved set there, per pair
    here.

    The cross-encoder is a deterministic double (portable hash60 of the
    pair identity → [0,1) score) behind the REAL serving shape: an
    Arrow-batched pandas UDF over the fetch_k pair rows — exactly where a
    model client would batch its forward passes (same seam as
    embedding.py's scalar-iterator embedder; swap the double for a client
    without touching the plan). Because the double is the portable hash,
    the WHOLE two-stage pipeline is DuckDB-hash-verified, not rows-only.

    Scale shape: stage 1 is v1's TakeOrdered plan; stage 2 touches only
    fetch_k rows per query — model cost, not data cost."""
    import hashlib

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cross_score(pair_key):
        return pair_key.map(
            lambda s: (int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % 1000)
            / 1000.0
        )

    _cross_score.__annotations__ = {"pair_key": pd.Series, "return": pd.Series}
    cross_udf = pandas_udf(_cross_score, "double")

    # Materialize the stage-1 cut: with the UDF downstream, Catalyst would
    # otherwise plan stage 1 as a global range-sort + limit (the UDF blocks
    # TakeOrderedAndProject fusion) and score up to fetch_k rows PER
    # PARTITION. Checkpointing the fetch_k rows keeps stage 1 a TakeOrdered
    # job and bounds the model's forward passes to exactly fetch_k.
    stage1 = cosine_topk(t, query_id=query_id, k=fetch_k).localCheckpoint(
        eager=False
    )
    pair_key = F.concat_ws(":", F.lit(query_id), F.col("vec_id"))
    return (
        stage1.select(
            "vec_id",
            "cos_sim",
            F.round(cross_udf(pair_key), 3).alias("cross_score"),
        )
        .orderBy(F.desc("cross_score"), F.asc("vec_id"))
        .limit(k)
    )


def ann_operating_curve(
    t: dict[str, DataFrame],
    n_queries: int = 20,
    k: int = 3,
    n_centroids: int = 16,
    probes: tuple[int, ...] = (1, 2, 4, 8),
) -> DataFrame:
    """V19: the full ANN operating curve — mean/min recall@k of the IVF
    tier at every candidate `n_probe`, in one DataFrame. This is the table
    a deployment reads to pick its operating point (the recall/cost knee);
    v12 measures one point of it.

    Plan shape: one exact-kNN side shared across the sweep (Spark caches
    nothing here, but each side reduces to n_queries·k rows before any
    comparison join, so the whole sweep costs |probes| IVF plans + one
    exact plan on a sample — the measurement runs on samples by design."""
    out = None
    for p in probes:
        r = (
            ann_recall(
                t, n_queries=n_queries, k=k, n_centroids=n_centroids, n_probe=p
            )
            .agg(
                F.round(F.avg("recall_at_k"), 3).alias("mean_recall"),
                F.round(F.min("recall_at_k"), 3).alias("min_recall"),
                F.sum("n_hits").alias("total_hits"),
            )
            .select(F.lit(p).alias("n_probe"), "mean_recall", "min_recall", "total_hits")
        )
        out = r if out is None else out.unionByName(r)
    return out


def ivfpq_topk_np(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    n_codes: int = 16,
    dims: int = 64,
    refine: int = 4,
) -> DataFrame:
    """V20: the BLAS tier of IVFPQ — same logical operator as ivfpq_topk,
    different physical strategy for the candidate scoring: instead of the
    interpreted higher-order-function expressions, an Arrow-batched
    mapInPandas kernel does cell argmin, code argmin, and the ADC sum as
    numpy matrix ops (the v10 pattern applied to the compressed domain).
    All arithmetic is float64; numpy's pairwise summation can differ from
    the expression fold by round-off ulps, but the refine·k cut has slack
    and the final re-rank is exact cosine either way — the tiers produce
    identical results on the fixtures (equality-tested in
    tests/test_similarity.py).

    At 100 TB this is the tier that serves: per Arrow batch of B vectors,
    assignment is one (B×n_centroids) distance matrix, encoding m
    (B×n_codes) subspace matrices, and the ADC sum a gather — all BLAS,
    no per-element interpreter."""
    import numpy as np
    import pandas as pd

    emb = t["embeddings"]
    C, books, probed, qd, qe, _assigned = _ivfpq_model(
        emb, query_id, n_centroids, n_probe, m, n_codes, dims
    )
    d = dims // m
    Cnp = np.asarray(C, dtype=np.float64)                      # (nc, dims)
    Bnp = np.asarray(books, dtype=np.float64)                  # (m, n_codes, d)
    QD = np.asarray(qd, dtype=np.float64)                      # (n_probe, m, n_codes)
    probed_arr = np.asarray(probed, dtype=np.int64)
    probe_pos = {int(c): i for i, c in enumerate(probed)}

    def _score(batches):
        for pdf in batches:
            X = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            if X.size == 0:
                yield pd.DataFrame({"vec_id": [], "approx_d": []})
                continue
            # cell assignment: argmin over squared distance, cid tie-break
            d2 = ((X[:, None, :] - Cnp[None, :, :]) ** 2).sum(axis=2)
            cids = d2.argmin(axis=1)  # argmin returns FIRST min → cid asc tie-break
            mask = np.isin(cids, probed_arr)
            if not mask.any():
                yield pd.DataFrame({"vec_id": [], "approx_d": []})
                continue
            Xs = X[mask]
            cs = cids[mask]
            resid = Xs - Cnp[cs]                               # (n, dims)
            sub = resid.reshape(len(Xs), m, d)                 # (n, m, d)
            # code argmin per subspace: (n, m, n_codes)
            dd = ((sub[:, :, None, :] - Bnp[None, :, :, :]) ** 2).sum(axis=3)
            codes = dd.argmin(axis=2)                          # (n, m)
            ppos = np.asarray([probe_pos[int(c)] for c in cs])
            # gather qd[ppos, s, codes] and sum over s
            # round-9 matches the expression tier and the oracle cut (see
            # ivfpq_topk): identical candidates tie exactly across engines.
            # Residual half-mode caveat: np rounds half-to-even while
            # Spark F.round / DuckDB ROUND round half-away — a sum landing
            # EXACTLY on a 0.5e-9 boundary could still differ, but double
            # sums of products land there with ~0 probability; the tie
            # guarantee this buys is for IDENTICAL codes (equal sums),
            # which round identically under any half mode.
            approx = QD[ppos[:, None], np.arange(m)[None, :], codes].sum(
                axis=1
            ).round(9)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"][mask].astype("int64"), "approx_d": approx}
            )

    scored = emb.select("vec_id", "embedding").mapInPandas(
        _score, "vec_id long, approx_d double"
    )
    cands = (
        scored.filter(F.col("vec_id") != query_id)
        .orderBy(F.asc("approx_d"), F.asc("vec_id"))
        .limit(refine * k)
        .select("vec_id")
    )
    sim = F.round(V.cosine_similarity("embedding", F.lit(qe)), 3) + F.lit(0.0)
    return (
        emb.join(F.broadcast(cands), "vec_id", "left_semi")
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


HIER_GROUP_SIZE = 4  # centroids per group (pilot = the group's min cid)
HIER_G_PROBE = 2  # level-1 groups searched at level 2


def _assign_cells_hier(
    emb: DataFrame,
    rows,
    group_size: int = HIER_GROUP_SIZE,
    g_probe: int = HIER_G_PROBE,
) -> DataFrame:
    """Two-level coarse assignment — the fix for the O(n·k) flat-argmin
    term SCALE.md's d20 64× analysis identified (auto-k families pay
    n²/target in assignment; FAISS answers with a hierarchical coarse
    quantizer). Centroids partition into cid-contiguous groups; level 1
    ranks groups by distance to each group's PILOT (its min-cid member —
    chosen over a mean representative deliberately: zero arithmetic, so
    the rule is bit-deterministic and SQL-encodable with no float-order
    risk); level 2 runs the exact argmin over only the g_probe nearest
    groups' members. Per-vector work drops from k to G + g_probe·(k/G)
    (≈2√k at the optimum); with g_probe == n_groups the result is EXACTLY
    the flat argmin. Everything stays one inlined JVM projection — zero
    shuffles, same as the flat form."""
    pilots = F.array(
        *[
            F.struct(
                F.lit(int(r["cid"]) // group_size).cast("long").alias("gid"),
                F.lit([float(x) for x in r["ce"]]).alias("pe"),
            )
            for r in rows
            if int(r["cid"]) % group_size == 0
        ]
    )
    members = F.array(
        *[
            F.struct(
                F.lit(int(r["cid"])).cast("long").alias("cid"),
                F.lit(int(r["cid"]) // group_size).cast("long").alias("gid"),
                F.lit([float(x) for x in r["ce"]]).alias("ce"),
            )
            for r in rows
        ]
    )
    gd = F.transform(
        pilots,
        lambda p: F.struct(
            V.euclidean_distance(F.col("embedding"), p["pe"]).alias("dist"),
            p["gid"].alias("gid"),
        ),
    )
    chosen_gids = F.transform(
        F.slice(F.array_sort(gd), 1, g_probe), lambda c: c["gid"]
    )

    # LET-BINDING, load-bearing: referencing `chosen_gids` directly inside
    # the member filter re-evaluates the whole level-1 sort PER MEMBER
    # (the hof-projection re-evaluation trap, measured 15x SLOWER than the
    # flat argmin at k=256). transform over a 1-element array binds the
    # chosen-group list once per row; the lambdas below reference the
    # bound variable, not the expression.
    def argmin_within(cg):
        cand = F.filter(members, lambda m: F.array_contains(cg, m["gid"]))
        dcs = F.transform(
            cand,
            lambda m: F.struct(
                V.euclidean_distance(F.col("embedding"), m["ce"]).alias("dist"),
                m["cid"].alias("cid"),
            ),
        )
        return F.array_min(dcs)["cid"]

    cid = F.get(F.transform(F.array(chosen_gids), argmin_within), 0)
    return emb.select("vec_id", "label", "embedding", cid.alias("cid"))


def hier_ivf_topk(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    n_centroids: int = 16,
    group_size: int = HIER_GROUP_SIZE,
    g_probe: int = HIER_G_PROBE,
    n_probe: int = 4,
) -> DataFrame:
    """v22: IVF top-k with HIERARCHICAL corpus assignment — v7's read path
    over a two-level coarse quantizer. The approximation is part of the
    contract: the oracle encodes the pilot rule and the g_probe group
    choice verbatim, so the op is hash-verified WITH its approximation
    (the d3c move: the production knob lives inside the oracle). Query-
    side probing stays exact (one vector, k distances)."""
    emb = t["embeddings"]
    cents = emb.filter(F.col("vec_id") < n_centroids).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    rows = cents.collect()
    assigned = _assign_cells_hier(emb, rows, group_size, g_probe)
    q = _query_vectors(t, [query_id])
    return _probe_and_search(cents, assigned, q, query_id, k, n_probe)


# SQ8 symmetric max-abs quantization: one int8 code per dimension, one
# float scale per vector. 127 levels per sign — the FAISS ScalarQuantizer
# QT_8bit family member that needs NO training pass, so the write path is
# a pure projection (unlike PQ's codebook fit).
SQ8_LEVELS = 127


def sq8_scale_codes():
    """The SQ8 quantization expressions (scale, codes) over an `embedding`
    column — ONE home for the formula so the batch store (v23), and the
    streaming ingest twin (st19) can never drift. codes are integer-valued
    doubles in [-SQ8_LEVELS, SQ8_LEVELS] (int8 at rest); a zero vector
    quantizes to scale 0 + all-zero codes (no divide-by-zero).

    `codes` references the MATERIALIZED `scale` COLUMN, not the scale
    expression: inlining the array_max fold inside the transform lambda
    makes interpreted HOF evaluation recompute the fold per element —
    O(d^2) per vector on every write path (the same HOF-re-expansion trap
    v23's read path was audited against). Callers therefore project in
    two stages: `scale` first, then `codes` (sq8_project does both);
    Catalyst's CollapseProject keeps them separate because the fold is
    non-cheap and multiply referenced."""
    scale = F.array_max(F.transform("embedding", lambda x: F.abs(x))) / F.lit(
        float(SQ8_LEVELS)
    )
    codes = F.when(
        F.col("scale") > 0,
        F.transform("embedding", lambda x: F.round(x / F.col("scale"))),
    ).otherwise(F.transform("embedding", lambda x: F.lit(0.0)))
    return scale, codes


def sq8_project(df: DataFrame) -> DataFrame:
    """Append (scale, codes) to a DataFrame with an `embedding` column as
    TWO projections (scale materialized first) — the one sanctioned way to
    evaluate sq8_scale_codes, shared by v23's store, st19's ingest, t14's
    refresh, and the clustered-store writer."""
    scale, codes = sq8_scale_codes()
    return df.withColumn("scale", scale).withColumn("codes", codes)


def sq8_store(emb: DataFrame) -> DataFrame:
    """The stored layout of the SQ8 tier: (vec_id, label, scale, codes).
    codes are integer-valued (round(x/scale) in [-127, 127]) — at rest
    they serialize as int8, a 4× cut over float32 (8× over float64)
    before any ANN structure is even involved; `scale` is the per-vector
    max-abs / 127. A zero vector stores scale 0 + all-zero codes. Pure
    scan-fused projection: quantization adds ZERO shuffles to ingest."""
    return sq8_project(emb).select("vec_id", "label", "scale", "codes")


def sq8_topk(
    t: dict[str, DataFrame], query_id: int = 0, k: int = TOP_K
) -> DataFrame:
    """V23: scalar-quantized (SQ8) serving tier — the third STORAGE tier
    beside flat float (v1/v5) and product quantization (v11/v17).
    Asymmetric search: the query stays exact while candidates score
    against their RECONSTRUCTED vectors (code · scale) — the FAISS
    ScalarQuantizer read path. Quantization is deterministic arithmetic
    (no trained codebook), so the DuckDB oracle reproduces the codes, the
    reconstruction, and therefore the exact served set — approximation
    encoded in the oracle, the d3c/v22 move.

    Cosine is SCALE-INVARIANT, so scoring the reconstruction
    (codes · scale) equals scoring the raw integer codes — the read path
    therefore never dequantizes at all (per-vector `scale` is only needed
    for dot/euclidean metrics and for reconstruction). This identity also
    keeps the expensive fold referenced ONCE: a recon-array expression
    inside the cosine would re-expand per occurrence (the d17/finding-9
    HOF trap — verified in this op's first plan audit), while `codes` is
    a stored column.

    Scale shape: the plan is cosine_topk's (one corpus pass, broadcast
    1-row query, TakeOrderedAndProject) over a store that is 4-8× smaller
    on disk, which at 100 TB is the difference between a scan that fits
    the read bandwidth budget and one that doesn't. Composes with the IVF
    tiers: a clustered store would hold (cid, scale, codes) and prune
    cells first; this op isolates the quantization contract itself.
    Reference semantics: the vector store's similarity search
    (vs_retriever.py:268-280) under a compressed at-rest layout."""
    store = sq8_store(t["embeddings"])
    q = _query_vectors(t, [query_id])
    sim = F.round(V.cosine_similarity("codes", "query_vec"), 3) + F.lit(0.0)
    return (
        store.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def sq8_cell_stats(emb: DataFrame, cents: DataFrame, rows=None) -> DataFrame:
    """Per-cell SQ8 quantization-health statistics — ONE home for the
    st19 (streaming ingest monitor) and t14 (incremental merge refresh)
    computation so the two can never drift: occupancy, worst per-dimension
    reconstruction error (rounded 9 BEFORE the max so both engines range
    over identical value sets), and the per-cell scale envelope. Every
    aggregate is order-free (count/max/min — no float sums), which is
    both the streaming-correctness argument and the algebraic-merge
    argument (partial maxes merge to the exact global max)."""
    quantized = sq8_project(assign_cells_auto(emb, cents, rows=rows)).select(
        "vec_id", "cid", "embedding", "scale", "codes"
    )
    qerr = F.when(
        F.col("scale") > 0,
        F.round(
            F.array_max(
                F.zip_with(
                    "embedding",
                    "codes",
                    lambda x, c: F.abs(x - c * F.col("scale")),
                )
            ),
            9,
        ),
    ).otherwise(F.lit(0.0))
    return (
        quantized.select("cid", "scale", qerr.alias("qerr"))
        .groupBy("cid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_vecs"),
            (F.max("qerr") + F.lit(0.0)).alias("max_qerr"),
            (F.round(F.max("scale"), 9) + F.lit(0.0)).alias("max_scale"),
            (F.round(F.min("scale"), 9) + F.lit(0.0)).alias("min_scale"),
        )
    )


def residual_sq8_project(assigned: DataFrame, cents: DataFrame) -> DataFrame:
    """Residual SQ8 quantization over a cell assignment — the FAISS
    IVF+SQ `by_residual` write path: each vector stores the SQ8 codes of
    (x − centroid[cid]) instead of x itself. The grid step is rscale =
    max|resid|/127: it shrinks with the CELL radius, so reconstruction
    error beats direct SQ8 exactly where cells are tighter than vector
    magnitudes (real embedding corpora cluster; that is why FAISS defaults
    IVF scalar quantizers to by_residual). On an UNCLUSTERED corpus the
    residual is no smaller than the vector (‖x−c‖ ≈ √2‖x‖ for independent
    directions) and direct SQ8 is at par or better — measured honestly on
    the uniform synthetic fixture in tests/test_similarity.py, which
    asserts the win on a constructed tight-cluster corpus and the
    per-dim half-step error contract (err ≤ rscale/2) everywhere.

    HOF discipline (the v23/ADVICE-r6 rule): `resid` is materialized as a
    COLUMN before `rscale` folds over it, and `rcodes` references both as
    columns — no fold is ever inlined inside another lambda, so nothing
    re-evaluates per element. Three stacked projections, all scan-fused:
    residual quantization adds ZERO shuffles over the assignment pass it
    rides (the same pass that writes the clustered layout)."""
    joined = assigned.join(
        F.broadcast(cents.select(F.col("cid").alias("r_cid"), "ce")),
        F.col("cid") == F.col("r_cid"),
    ).drop("r_cid")
    # explicit DOUBLE arithmetic: float−float would round to float
    # precision while the DuckDB oracle subtracts exactly-widened doubles
    resid = joined.withColumn(
        "resid",
        F.zip_with(
            "embedding", "ce", lambda x, c: x.cast("double") - c.cast("double")
        ),
    )
    scaled = resid.withColumn(
        "rscale",
        F.array_max(F.transform("resid", lambda r: F.abs(r)))
        / F.lit(float(SQ8_LEVELS)),
    )
    rcodes = F.when(
        F.col("rscale") > 0,
        F.transform("resid", lambda r: F.round(r / F.col("rscale"))),
    ).otherwise(F.transform("resid", lambda r: F.lit(0.0)))
    return scaled.withColumn("rcodes", rcodes)


def residual_sq8_topk(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """V27: IVF-pruned top-k over RESIDUAL-quantized codes — v24's probe
    with the store's codes holding SQ8(x − centroid) rather than SQ8(x).
    This is the classic FAISS IVF-SQ8 configuration (by_residual=true):
    the cell geometry the IVF layout already paid for is reused to centre
    the quantizer, so the code grid spans the CELL's extent, not the whole
    space — finer wherever cells are tighter than vector magnitudes (the
    clustered-corpus regime; see residual_sq8_project on when it is not).

    Read path must dequantize (cosine is scale-invariant in the codes only
    when the centroid is zero): candidates reconstruct
    x̂ = ce + rcodes·rscale via one zip_with against the BROADCAST k-row
    centroid table, materialized as a column before scoring (HOF
    discipline), then score cosine(x̂, q) exactly like v5. Deterministic
    assignment + deterministic arithmetic ⇒ the DuckDB oracle reproduces
    the exact served set, approximation included (the d3c/v22/v24 move).

    Scale shape: identical to v24 — on the stored layout the probe is a
    literal partition filter over a ~4× compressed store; the added
    reconstruction is d multiply-adds per candidate against a broadcast
    model table (no extra shuffle, no extra scan). What the residual buys
    at 100 TB: the SAME bandwidth as v24 with reconstruction error closer
    to the flat tier — the knob between v23 (cheap, coarse) and raw
    float32 (exact, 4× the bytes).
    Reference semantics: vs_retriever.py:268-280 top-k under a
    compressed-at-rest, cell-centred layout."""
    emb = t["embeddings"]
    cents, assigned = _ivf_assign(emb, n_centroids)
    store = residual_sq8_project(assigned, cents).select(
        "vec_id", "label", "cid", "ce", "rscale", "rcodes"
    )
    q = _query_vectors(t, [query_id])
    probe = (
        cents.crossJoin(F.broadcast(q))
        .select("cid", V.euclidean_distance("ce", "query_vec").alias("qdist"))
        .orderBy(F.asc("qdist"), F.asc("cid"))
        .limit(n_probe)
        .select("cid")
    )
    recon = store.join(F.broadcast(probe), "cid", "left_semi").withColumn(
        "recon", F.zip_with("ce", "rcodes", lambda c, rc: c + rc * F.col("rscale"))
    )
    sim = F.round(V.cosine_similarity("recon", "query_vec"), 3) + F.lit(0.0)
    return (
        recon.filter(F.col("vec_id") != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.col("cid").cast("long").alias("cid"),
            sim.alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )


def quantization_error_curve(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    n_centroids: int = 16,
) -> DataFrame:
    """V28: the quantization family's quality harness — the d21/d22 move
    (measure the approximation you ship) applied to the SQ8 tiers: one
    row per tier (direct v23 codes vs residual v27 codes) reporting the
    corpus-wide reconstruction-error envelope AND the served top-k recall
    vs the exact flat answer for the probe query. This is the number a
    deployment reads before choosing a layout: on clustered corpora the
    residual tier's max_err collapses with the cell radius; on uniform
    ones the two tie (both regimes are real — the fixture is uniform, so
    the harness is expected to report parity here, and the tight-cluster
    unit test pins the other regime).

    All arithmetic is deterministic (max-abs grids, fixed centroids,
    exact query), so the DuckDB oracle reproduces errors, recalls, and
    the 2-row report bit-for-bit. Scale: two scan-fused projections +
    k-bounded top-k joins; the error aggregate partial-combines — the
    harness costs two corpus passes, and at 100 TB runs on a sample (the
    v12/d21 scoping move)."""
    emb = t["embeddings"]
    q = _query_vectors(t, [query_id])
    exact_sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    # Reuse barriers (r10, guide §1.2 "don't compute things twice"): the
    # exact baseline and both code tables each feed TWO consumers (recall
    # join + error/topk), and Catalyst planned each consumer its own
    # subtree — 24 parquet scans / 6 corpus passes in the before plan
    # (plans/r10/v28_..._before.txt). `exact` checkpoints at k rows;
    # `direct`/`recon` persist so the quantize+reconstruct projections run
    # once and both consumers read the cache (the minhash `sh`/`sig`
    # convention). Values are untouched — same expressions, computed once.
    exact = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", exact_sim.alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
        .localCheckpoint(eager=True)
    )

    # direct tier: v23's codes
    direct = sq8_project(emb).transform(shared_persist)
    d_err = F.when(
        F.col("scale") > 0,
        F.array_max(
            F.zip_with(
                "embedding", "codes", lambda x, c: F.abs(x - c * F.col("scale"))
            )
        ),
    ).otherwise(F.lit(0.0))
    d_stats = direct.select(d_err.alias("e")).agg(
        (F.round(F.avg("e"), 9) + F.lit(0.0)).alias("mean_err"),
        (F.round(F.max("e"), 9) + F.lit(0.0)).alias("max_err"),
    )
    d_sim = F.round(V.cosine_similarity("codes", "query_vec"), 3) + F.lit(0.0)
    d_top = (
        direct.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", d_sim.alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
    )
    d_recall = (
        d_top.join(exact, "vec_id", "left_semi")
        .agg((F.count(F.lit(1)) / F.lit(float(k))).alias("recall"))
    )

    # residual tier: v27's codes
    cents, assigned = _ivf_assign(emb, n_centroids)
    resid = residual_sq8_project(assigned, cents)
    recon = resid.withColumn(
        "xr", F.zip_with("ce", "rcodes", lambda c, rc: c + rc * F.col("rscale"))
    ).transform(shared_persist)
    r_err = F.array_max(
        F.zip_with("embedding", "xr", lambda x, h: F.abs(x.cast("double") - h))
    )
    r_stats = recon.select(r_err.alias("e")).agg(
        (F.round(F.avg("e"), 9) + F.lit(0.0)).alias("mean_err"),
        (F.round(F.max("e"), 9) + F.lit(0.0)).alias("max_err"),
    )
    r_sim = F.round(V.cosine_similarity("xr", "query_vec"), 3) + F.lit(0.0)
    r_top = (
        recon.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != query_id)
        .select("vec_id", r_sim.alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id")
    )
    r_recall = (
        r_top.join(exact, "vec_id", "left_semi")
        .agg((F.count(F.lit(1)) / F.lit(float(k))).alias("recall"))
    )

    d_row = (
        d_stats.crossJoin(d_recall)
        .select(F.lit("sq8_direct").alias("tier"), "mean_err", "max_err", "recall")
    )
    r_row = (
        r_stats.crossJoin(r_recall)
        .select(F.lit("sq8_residual").alias("tier"), "mean_err", "max_err", "recall")
    )
    return d_row.unionByName(r_row)


# ---------------------------------------------------------------------------
# v29: random-projection (Johnson–Lindenstrauss) prefilter + exact re-rank
# ---------------------------------------------------------------------------

RP_DIM = 24
RP_EMB_DIM = 64
RP_COARSE_C = 400


def _rp_sign(i: int, j: int) -> float:
    """Deterministic Achlioptas ±1 sign for projection cell (i, j), derived
    from the portable md5 family — reproducible in any engine, no RNG."""
    import hashlib

    return 1.0 if int(hashlib.md5(f"rp|{i}|{j}".encode()).hexdigest()[0], 16) % 2 == 0 else -1.0


RP_SIGNS: tuple[tuple[float, ...], ...] = tuple(
    tuple(_rp_sign(i, j) for j in range(RP_EMB_DIM)) for i in range(RP_DIM)
)

# parsed-projection memo, keyed per live SparkContext (see _rp_project)
_RP_PROJECT_MEMO = None


def _rp_project(col_name: str, signs=RP_SIGNS) -> Column:
    """The RP_DIM projected coordinates of a vector column as ONE array
    column — each coordinate an explicit left-associated multiply-add
    chain, bit-identical to the same left-associated '+' chain in any
    SQL engine (floating-point addition is order-sensitive; both sides
    fix the SAME order, so no rounding slack is needed anywhere in the
    coarse phase). Materialized as an array ON PURPOSE: the downstream
    cosine references the array through HOF lambdas, which bind the
    value once per row — inlining the 24 depth-64 chains into the three
    consumer sites (dot + both norms) is the hof-projection
    re-evaluation trap (cf. v22/v23) and, at this width, also overflows
    Janino (measured: a single collapsed coarse Project with 2880
    element_at nodes fails codegen and falls back to interpreted).

    Built as ONE JVM-parsed F.expr string, not ~3,000 py4j Column
    constructions — the r5/finding-11 driver-cost lesson applied to the
    read path (measured: the py4j form put ~17 s of DRIVER time on every
    v29 call regardless of corpus size). Scalar per-element casts
    (double(float) is exact) keep the values identical to casting the
    whole array first.

    r11: the parsed Column is memoized per live SparkContext (the
    load_tables pattern) — parsing the ~1,500-term string still cost
    ~0.4 s of driver time PER CALL (breakdown probe: v29 build 0.85 s,
    two `_rp_project` parses). A Column is an immutable unresolved
    expression handle; reusing it across plans is exactly what `F.col`
    does, and analysis re-instantiates fresh expression ids per query.
    Keyed on the SparkContext so a stopped JVM's handle is never reused."""
    if signs is RP_SIGNS:
        import weakref

        global _RP_PROJECT_MEMO
        if _RP_PROJECT_MEMO is None:
            _RP_PROJECT_MEMO = weakref.WeakKeyDictionary()
        from pyspark import SparkContext

        sc = SparkContext._active_spark_context
        memo = _RP_PROJECT_MEMO.setdefault(sc, {}) if sc is not None else None
        if memo is not None and col_name in memo:
            return memo[col_name]
    else:
        memo = None
    chains = []
    for row in signs:
        chains.append(
            " + ".join(
                f"CAST(element_at({col_name}, {j + 1}) AS DOUBLE) * {s!r}D"
                for j, s in enumerate(row)
            )
        )
    col = F.expr("array(" + ", ".join(chains) + ")")
    if memo is not None:
        memo[col_name] = col
    return col


def _rp_dot(a: Column, b: Column) -> Column:
    """Fold-dot over two projected arrays: 0.0 + a1*b1 + a2*b2 + ... —
    the aggregate's fold order, mirrored verbatim in the oracle SQL."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _rp_cosine(a: Column, b: Column) -> Column:
    """Cosine in the projected space — zero-norm-safe the same way on
    both engines (degenerate projection scores -1)."""
    denom = F.sqrt(_rp_dot(a, a)) * F.sqrt(_rp_dot(b, b))
    return F.when(denom > 0, _rp_dot(a, b) / denom).otherwise(F.lit(-1.0))


def random_projection_topk(
    t: dict[str, DataFrame],
    query_id: int = 0,
    k: int = TOP_K,
    coarse_c: int = RP_COARSE_C,
) -> DataFrame:
    """V29: JL random-projection prefilter + exact re-rank — the
    DIMENSIONALITY-reduction member of the approximate family (IVF
    prunes rows, SQ8 compresses cells, RP compresses DIMENSIONS;
    Johnson & Lindenstrauss 1984, Achlioptas 2003 for ±1 projections).
    Phase 1 scores every vector by cosine in the 24-dim projected space
    (a fixed ±1 matrix, so each coordinate is one multiply-add chain in
    codegen) and keeps the top coarse_c candidates; phase 2 re-scores
    ONLY those with the exact 64-dim cosine and serves the top k.

    Both phases are deterministic cross-engine: the projection sums are
    the same left-associated chains in Spark and the DuckDB oracle (no
    rounding needed for the coarse cut), and the exact re-rank reuses
    the v1 round-3 contract — so the oracle reproduces the SERVED set
    exactly, approximation included (the v24 discipline).

    Why this exists at 100 TB: the coarse pass needs 24 projected coordinates per row
    instead of 64 — with a materialized projection column (the
    stored-form follow-up, cf. v27b) the candidate scan reads ~2.7x fewer
    bytes (float32 projections) and does ~2.7x less arithmetic than a
    brute-force pass, while the
    exact pass touches coarse_c rows regardless of corpus size. Config (p=24, C=400)
    was CHOSEN by measurement, not assumed: recall vs the exact top-8 is
    1.0 at sf0.01 and sf0.1 on the fixture corpora (8/16-dim projections
    lose the ordering: the synthetic embeddings' cosine gaps are tiny);
    the unit test pins a recall floor.

    r11 (guide §2.2): the candidate side is widened — the 24 depth-64
    projection chains per row are the dominant map cost and the
    single-row-group fixture scan ran them all on ONE core (profiled: 2
    tasks, 1.9 s of exec). No-op on real multi-row-group tables; per-row
    arithmetic and both TakeOrdered total orders are partitioning-
    independent, so the served rows are bit-identical."""
    from ..tables import widen_scan

    emb = t["embeddings"]
    q = _query_vectors(t, [query_id])
    qp = q.select(
        "query_vec", _rp_project("query_vec").alias("qv")
    )
    coarse = (
        widen_scan(emb).crossJoin(F.broadcast(qp))
        .filter(F.col("vec_id") != query_id)
        .select(
            "vec_id",
            "label",
            "embedding",
            "query_vec",
            # LET-BINDING (the v22 move): transform over a 1-element array
            # binds the projected coordinates once per row; referencing a
            # pv COLUMN from the cosine would let CollapseProject inline
            # the 24 chains into each HOF consumer (measured: 2x
            # re-evaluation even split across two selects).
            F.get(
                F.transform(
                    F.array(_rp_project("embedding")),
                    lambda v: _rp_cosine(v, F.col("qv")),
                ),
                0,
            ).alias("coarse"),
        )
        .orderBy(F.desc("coarse"), F.asc("vec_id"))
        .limit(coarse_c)
    )
    sim = F.round(V.cosine_similarity("embedding", "query_vec"), 3) + F.lit(0.0)
    return (
        coarse.select("vec_id", "label", sim.alias("cos_sim"))
        .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
        .limit(k)
    )
