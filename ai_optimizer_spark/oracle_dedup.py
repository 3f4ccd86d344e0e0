"""DuckDB oracle SQL for the dedup operator family.

These mirror ai_optimizer_spark.operators.dedup step for step using the
same portable md5-based hash60, so results match bit-for-bit. The hash in
DuckDB is ('0x' || substr(md5(s), 1, 15))::BIGINT == Spark
conv(substr(md5(s),1,15),16,10)::long.
"""

from __future__ import annotations

from .operators.dedup import (
    JACCARD_THRESHOLD,
    LSH_BAND_ROWS,
    MINHASH_HASHES,
    SHINGLE_N,
    SIMHASH_BITS,
    SIMHASH_MAX_HAMMING,
    COSINE_NEARDUP_THRESHOLD,
)

# distinct n-word shingles per doc (set semantics, identical to
# functions.text.word_shingles). `src` parameterizes the document source
# so sampled harnesses (d21b/d22: doc_id % m = 0) reuse the same chain.
def _shingles_cte(src: str = "documents") -> str:
    return f"""
    w AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
        FROM {src}
    ),
    g AS (
        SELECT doc_id, words,
               unnest(generate_series(1, greatest(len(words) - {SHINGLE_N - 1}, 0))) AS i
        FROM w
    ),
    sh AS (
        SELECT DISTINCT doc_id,
               array_to_string(words[i:i+{SHINGLE_N - 1}], ' ') AS shingle
        FROM g
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id)
"""


_SHINGLES_CTE = _shingles_cte()

EXACT_DEDUP = """
    SELECT doc_id, source, n_chars
    FROM (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id ASC) AS rn
        FROM documents
    ) WHERE rn = 1
"""

def ngram_jaccard(src: str = "documents") -> str:
    return f"""
    WITH {_shingles_cte(src)},
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 3) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 3) >= {JACCARD_THRESHOLD}
"""


NGRAM_JACCARD = ngram_jaccard()


def _minhash_cols() -> str:
    from .functions.text import MINHASH_A, MINHASH_B, MINHASH_P

    return ",\n               ".join(
        f"MIN(({MINHASH_A[s]} * (base % {MINHASH_P}) + {MINHASH_B[s]}) % {MINHASH_P}) AS mh{s}"
        for s in range(MINHASH_HASHES)
    )


def _bands_union() -> str:
    n_bands = MINHASH_HASHES // LSH_BAND_ROWS
    parts = []
    for band in range(n_bands):
        key = " || ':' || ".join(
            f"CAST(mh{band * LSH_BAND_ROWS + r} AS VARCHAR)" for r in range(LSH_BAND_ROWS)
        )
        parts.append(f"SELECT doc_id, {band} AS band, {key} AS key FROM sig")
    return "\n        UNION ALL\n        ".join(parts)


MINHASH_LSH = f"""
    WITH {_SHINGLES_CTE},
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS base
        FROM sh
    ),
    sig AS (
        SELECT doc_id,
               {_minhash_cols()}
        FROM hashed
        GROUP BY doc_id
    ),
    bands AS (
        {_bands_union()}
    ),
    candidates AS (
        SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
        FROM bands ba JOIN bands bb
          ON ba.band = bb.band AND ba.key = bb.key AND ba.doc_id < bb.doc_id
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
        FROM candidates c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 3) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 3) >= {JACCARD_THRESHOLD}
"""


def _simhash_bit_sums() -> str:
    return ",\n               ".join(
        f"SUM((h >> {i}) & 1) AS b{i}" for i in range(SIMHASH_BITS)
    )


def _simhash_assemble() -> str:
    return " + ".join(
        f"(CASE WHEN b{i} * 2 > n THEN {2**i} ELSE 0 END)" for i in range(SIMHASH_BITS)
    )


SIMHASH_PAIRS = f"""
    WITH {_SHINGLES_CTE},
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS h
        FROM sh
    ),
    bit_sums AS (
        SELECT doc_id, COUNT(*) AS n,
               {_simhash_bit_sums()}
        FROM hashed GROUP BY doc_id
    ),
    sig AS (
        SELECT doc_id, CAST({_simhash_assemble()} AS BIGINT) AS simhash
        FROM bit_sums
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
"""

EMBEDDING_NEARDUP = f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) + 0.0 AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 3) + 0.0
          >= {COSINE_NEARDUP_THRESHOLD}
"""

# connected components over the LSH pairs via recursive label spreading:
# every node's label set = initial labels of all reachable nodes (edges are
# symmetric), so MIN(label) per node is the component's min doc_id —
# identical to the Spark min-label-propagation fixpoint.
def _quality_ctes() -> str:
    """The tx2 quality formula as CTEs (wq/m/q) — identical text to the
    tx2_quality_score oracle so survivorship ranks by bit-identical scores."""
    from .operators.textops import STOPWORDS

    return f"""
    wq AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words FROM documents),
    m AS (
        SELECT doc_id,
               len(words) * 1.0 AS n,
               len(list_filter(words, x -> x IN {STOPWORDS!r})) * 1.0 AS n_stop,
               len(list_distinct(words)) * 1.0 AS n_uniq
        FROM wq
    ),
    q AS (
        SELECT doc_id,
               ROUND(0.4 * LEAST(1.0, n / 50.0) + 0.3 * (n_uniq / n) + 0.3 * (1.0 - n_stop / n), 3) AS quality
        FROM m
    )"""


DEDUP_CLUSTERS = f"""
    WITH RECURSIVE pairs AS (
        SELECT doc_a, doc_b FROM ({MINHASH_LSH}) q
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b AS a, doc_a AS b FROM pairs
    ),
    cc AS (
        SELECT doc_id AS node, doc_id AS label FROM documents
        UNION
        SELECT e.b AS node, cc.label FROM cc JOIN edges e ON cc.node = e.a
    )
    SELECT node AS doc_id, MIN(label) AS cluster_id,
           (node = MIN(label)) AS is_canonical
    FROM cc GROUP BY node
"""


# d16: cluster survivorship — components from the DEDUP_CLUSTERS fixpoint
# (embedded as a derived table), winner per cluster by (quality DESC,
# doc_id ASC) via ROW_NUMBER — deterministic because quality is ROUNDed to
# 3 digits identically on both engines (tx2's strict-verified formula).
CLUSTER_SURVIVORS = f"""
    WITH labels AS (
        SELECT doc_id, cluster_id FROM ({DEDUP_CLUSTERS}) c
    ),
    {_quality_ctes()},
    ranked AS (
        SELECT l.cluster_id, l.doc_id, q.quality,
               ROW_NUMBER() OVER (
                   PARTITION BY l.cluster_id ORDER BY q.quality DESC, l.doc_id ASC
               ) AS rn,
               COUNT(*) OVER (PARTITION BY l.cluster_id) AS n_members
        FROM labels l JOIN q ON q.doc_id = l.doc_id
    )
    SELECT cluster_id, doc_id AS survivor_id,
           CAST(n_members AS BIGINT) AS n_members,
           quality AS survivor_quality
    FROM ranked WHERE rn = 1
"""

# d17: per-band bucket-size folds — SUMs CAST to BIGINT (DuckDB SUM(BIGINT)
# promotes to HUGEINT, which the driver's pandas canon renders as float64).
CORPUS_DUP_PROFILE = f"""
    WITH {_SHINGLES_CTE},
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS base
        FROM sh
    ),
    sig AS (
        SELECT doc_id,
               {_minhash_cols()}
        FROM hashed
        GROUP BY doc_id
    ),
    bands AS (
        {_bands_union()}
    ),
    buckets AS (SELECT band, key, COUNT(*) AS n FROM bands GROUP BY band, key)
    SELECT band,
           COUNT(*) AS n_buckets,
           CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_colliding_buckets,
           CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS candidate_pairs,
           CAST(SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) AS BIGINT) AS colliding_docs,
           CAST(MAX(n) AS BIGINT) AS max_bucket_n
    FROM buckets GROUP BY band
"""


# ST12: LSH band-collision candidate feed (directional, pre-verification) —
# the stream-static join's result equals this static self-join by Structured
# Streaming's semantics (streaming result = batch query over the full input).
STREAMING_NEARDUP_CANDIDATES = f"""
    WITH {_SHINGLES_CTE},
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS base
        FROM sh
    ),
    sig AS (
        SELECT doc_id,
               {_minhash_cols()}
        FROM hashed
        GROUP BY doc_id
    ),
    bands AS (
        {_bands_union()}
    )
    SELECT ba.doc_id AS new_doc, bb.doc_id AS index_doc, COUNT(*) AS n_band_hits
    FROM bands ba
    JOIN bands bb ON ba.band = bb.band AND ba.key = bb.key AND ba.doc_id <> bb.doc_id
    GROUP BY 1, 2
"""


# d3c: the PRODUCTION LSH configuration (bucket cap ON) with the cap
def autocap_ctes(headroom: float = 4.0) -> str:
    """`choose_lsh_bucket_cap` recomputed in SQL (the e2e_auto_curation
    oracle): yields a CTE chain ending in `autocap(cap)`. Formula parity
    with operators/dedup.py::choose_lsh_bucket_cap — per-band mean
    colliding-bucket size via IEEE double division, then
    cap = max(2, min(ceil(headroom * worst_band_mean), max_bucket_n)),
    empty-collision corpus -> 2. Splice at the HEAD of a WITH list; the
    shingle/bucket names it defines are shadowed harmlessly when a nested
    LSH subquery redefines them (DuckDB lexical CTE scoping)."""
    return f"""{_SHINGLES_CTE},
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS base
        FROM sh
    ),
    sig AS (
        SELECT doc_id,
               {_minhash_cols()}
        FROM hashed
        GROUP BY doc_id
    ),
    bands AS (
        {_bands_union()}
    ),
    buckets AS (SELECT band, key, COUNT(*) AS n FROM bands GROUP BY band, key),
    bandprof AS (
        SELECT band,
               SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) * 1.0
                   / SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS mean_n,
               MAX(n) AS max_n
        FROM buckets GROUP BY band
        HAVING SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) > 0
    ),
    autocap AS (
        SELECT CAST(COALESCE(
            GREATEST(2, LEAST(CAST(CEIL({headroom} * MAX(mean_n)) AS BIGINT),
                              CAST(MAX(max_n) AS BIGINT))),
            2) AS BIGINT) AS cap
        FROM bandprof
    )"""


# encoded in the oracle itself — band buckets above the cap are dropped
# whole before candidate generation, exactly like
# minhash_lsh_pairs(max_bucket_size=...).
def minhash_lsh_capped(max_bucket_size: int | str, src: str = "documents") -> str:
    # max_bucket_size may be a literal int OR a SQL scalar subquery string
    # (e2e_auto_curation passes "(SELECT cap FROM autocap)" so the cap the
    # oracle verifies is the one IT derives from the corpus); `src` lets
    # sampled harnesses (d21b) run the same chain on a doc_id-mod sample
    return f"""
    WITH {_shingles_cte(src)},
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS base
        FROM sh
    ),
    sig AS (
        SELECT doc_id,
               {_minhash_cols()}
        FROM hashed
        GROUP BY doc_id
    ),
    bands AS (
        {_bands_union()}
    ),
    sized AS (
        SELECT band, key, COUNT(*) AS bn FROM bands GROUP BY band, key
    ),
    kept AS (
        SELECT b.doc_id, b.band, b.key
        FROM bands b JOIN sized s ON b.band = s.band AND b.key = s.key
        WHERE s.bn <= {max_bucket_size}
    ),
    candidates AS (
        SELECT DISTINCT ba.doc_id AS doc_a, bb.doc_id AS doc_b
        FROM kept ba JOIN kept bb
          ON ba.band = bb.band AND ba.key = bb.key AND ba.doc_id < bb.doc_id
    ),
    inter AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_inter
        FROM candidates c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b,
           ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 3) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 3) >= {JACCARD_THRESHOLD}
"""


def cap_recall_sweep(
    headroom: float = 4.0,
    recall_floor: float = 0.95,
    sample_mod: int = 1,
) -> str:
    """d22's oracle: the recall-vs-cap curve and the chosen cap, recomputed
    end to end in SQL — ladder derivation (choose_lsh_bucket_cap's formula
    over the band profile), per-pair min colliding-bucket size, exact
    n-gram Jaccard truth, threshold sweep, and the floor-based choice. The
    sentinel row mirrors the Spark op so an empty corpus still emits one
    row per swept cap."""
    src = (
        "documents"
        if sample_mod <= 1
        else f"(SELECT * FROM documents WHERE doc_id % {sample_mod} = 0)"
    )
    recall = "ROUND(n_caught_pairs * 1.0 / GREATEST(n_true_pairs, 1), 4) + 0.0"
    return f"""
    WITH {_shingles_cte(src)},
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS base
        FROM sh
    ),
    sig AS (
        SELECT doc_id,
               {_minhash_cols()}
        FROM hashed
        GROUP BY doc_id
    ),
    bands AS (
        {_bands_union()}
    ),
    buckets AS (SELECT band, key, COUNT(*) AS n FROM bands GROUP BY band, key),
    bandprof AS (
        SELECT band,
               SUM(CASE WHEN n >= 2 THEN n ELSE 0 END) * 1.0
                   / SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS mean_n,
               MAX(n) AS max_n
        FROM buckets GROUP BY band
        HAVING SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) > 0
    ),
    autocap AS (
        SELECT CAST(COALESCE(
            GREATEST(2, LEAST(CAST(CEIL({headroom} * MAX(mean_n)) AS BIGINT),
                              CAST(MAX(max_n) AS BIGINT))),
            2) AS BIGINT) AS cap
        FROM bandprof
    ),
    maxn AS (SELECT CAST(MAX(max_n) AS BIGINT) AS m FROM bandprof),
    capladder AS (
        SELECT DISTINCT cap FROM (
            SELECT UNNEST([CAST(2 AS BIGINT), a.cap,
                CASE WHEN x.m IS NULL THEN NULL
                     ELSE LEAST(2 * a.cap, x.m) END,
                CASE WHEN x.m IS NULL THEN NULL
                     ELSE LEAST(4 * a.cap, x.m) END,
                x.m]) AS cap
            FROM autocap a, maxn x
        ) WHERE cap IS NOT NULL
    ),
    sized AS (
        SELECT b.doc_id, b.band, b.key, s.n AS bn
        FROM bands b JOIN buckets s ON b.band = s.band AND b.key = s.key
    ),
    pairbn AS (
        SELECT xa.doc_id AS doc_a, yb.doc_id AS doc_b,
               CAST(MIN(xa.bn) AS BIGINT) AS min_bn
        FROM sized xa JOIN sized yb
          ON xa.band = yb.band AND xa.key = yb.key AND xa.doc_id < yb.doc_id
        GROUP BY 1, 2
    ),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    truep AS (
        SELECT doc_a, doc_b, 1 AS is_true
        FROM inter
        JOIN sizes sa ON sa.doc_id = doc_a
        JOIN sizes sb ON sb.doc_id = doc_b
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 3)
              >= {JACCARD_THRESHOLD}
    ),
    pairs AS (
        SELECT COALESCE(t.is_true, 0) AS is_true, p.min_bn
        FROM pairbn p FULL OUTER JOIN truep t
          ON p.doc_a = t.doc_a AND p.doc_b = t.doc_b
        UNION ALL
        SELECT 0 AS is_true, CAST(NULL AS BIGINT) AS min_bn
    ),
    curve AS (
        SELECT c.cap,
            CAST(COALESCE(SUM(is_true), 0) AS BIGINT) AS n_true_pairs,
            CAST(COALESCE(SUM(CASE WHEN is_true = 1 AND min_bn <= c.cap
                                   THEN 1 ELSE 0 END), 0) AS BIGINT)
                AS n_caught_pairs,
            CAST(COALESCE(SUM(CASE WHEN min_bn <= c.cap THEN 1 ELSE 0 END),
                          0) AS BIGINT) AS n_candidate_pairs
        FROM pairs CROSS JOIN capladder c
        GROUP BY c.cap
    )
    SELECT cap, n_true_pairs, n_caught_pairs, n_candidate_pairs,
           {recall} AS recall_vs_exact,
           CAST(cap = COALESCE(
               MIN(CASE WHEN {recall} >= {recall_floor} THEN cap END)
                   OVER (),
               MAX(cap) OVER ()) AS INT) AS chosen
    FROM curve
    ORDER BY cap
"""


def _shingles_cte_named(src: str, suffix: str) -> str:
    """_shingles_cte with suffixed CTE names so two sources can coexist
    in one query (the d24 delta/corpus split)."""
    return f"""
    w{suffix} AS (
        SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS words
        FROM {src}
    ),
    g{suffix} AS (
        SELECT doc_id, words,
               unnest(generate_series(1, greatest(len(words) - {SHINGLE_N - 1}, 0))) AS i
        FROM w{suffix}
    ),
    sh{suffix} AS (
        SELECT DISTINCT doc_id,
               array_to_string(words[i:i+{SHINGLE_N - 1}], ' ') AS shingle
        FROM g{suffix}
    ),
    sizes{suffix} AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh{suffix} GROUP BY doc_id)
"""


def _bands_union_named(sig: str) -> str:
    n_bands = MINHASH_HASHES // LSH_BAND_ROWS
    parts = []
    for band in range(n_bands):
        key = " || ':' || ".join(
            f"CAST(mh{band * LSH_BAND_ROWS + r} AS VARCHAR)"
            for r in range(LSH_BAND_ROWS)
        )
        parts.append(f"SELECT doc_id, {band} AS band, {key} AS key FROM {sig}")
    return "\n        UNION ALL\n        ".join(parts)


def incremental_lsh(
    max_bucket_size: int, delta_mod: int = 8, delta_rem: int = 7
) -> str:
    """d24's oracle: the delta×corpus banded join with the corpus-side
    bucket cap, verified with exact Jaccard, finished as a per-delta-doc
    verdict (every incoming doc answered; no-collision docs are is_new)."""
    delta_src = (
        f"(SELECT * FROM documents WHERE doc_id % {delta_mod} = {delta_rem})"
    )
    corpus_src = (
        f"(SELECT * FROM documents WHERE doc_id % {delta_mod} <> {delta_rem})"
    )
    return f"""
    WITH {_shingles_cte_named(delta_src, "d")},
    {_shingles_cte_named(corpus_src, "c")},
    hashed_d AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS base
        FROM shd
    ),
    hashed_c AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 1, 15))::BIGINT AS base
        FROM shc
    ),
    sig_d AS (
        SELECT doc_id, {_minhash_cols()} FROM hashed_d GROUP BY doc_id
    ),
    sig_c AS (
        SELECT doc_id, {_minhash_cols()} FROM hashed_c GROUP BY doc_id
    ),
    bands_d AS (
        {_bands_union_named("sig_d")}
    ),
    bands_c_all AS (
        {_bands_union_named("sig_c")}
    ),
    bands_c AS (
        SELECT * FROM bands_c_all
        QUALIFY COUNT(*) OVER (PARTITION BY band, key) <= {max_bucket_size}
    ),
    candidates AS (
        SELECT DISTINCT d.doc_id, c.doc_id AS kept_doc
        FROM bands_d d JOIN bands_c c ON d.band = c.band AND d.key = c.key
    ),
    inter AS (
        SELECT x.doc_id, x.kept_doc, COUNT(*) AS n_inter
        FROM candidates x
        JOIN shd a ON a.doc_id = x.doc_id
        JOIN shc b ON b.doc_id = x.kept_doc AND b.shingle = a.shingle
        GROUP BY 1, 2
    ),
    verified AS (
        SELECT i.doc_id, i.kept_doc,
               ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 3)
                   AS jaccard
        FROM inter i
        JOIN sizesd sa ON sa.doc_id = i.doc_id
        JOIN sizesc sb ON sb.doc_id = i.kept_doc
        WHERE ROUND(n_inter * 1.0 / (sa.n_sh + sb.n_sh - n_inter), 3)
              >= {JACCARD_THRESHOLD}
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_dups,
               CAST(MIN(kept_doc) AS BIGINT) AS first_dup,
               MAX(jaccard) + 0.0 AS best_jaccard
        FROM verified GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(p.n_dups, 0)::BIGINT AS n_dups,
           p.first_dup,
           p.best_jaccard,
           (p.n_dups IS NULL) AS is_new
    FROM (SELECT doc_id FROM {delta_src} x) d
    LEFT JOIN per_doc p ON d.doc_id = p.doc_id
"""
