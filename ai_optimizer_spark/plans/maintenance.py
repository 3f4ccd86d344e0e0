"""Applied store maintenance — the WRITE side of the geometry-repair pair.

t15 (hot-cell split), t17 (cold-cell merge) and t16/t16b (delete repair)
are ANALYSIS forms: they compute the repair a maintainer should apply.
This module APPLIES them to the quantized clustered store in place, at
partition granularity — the maintenance loop a deployed store actually
runs (reference: the embed refresh pipeline rebuilds the whole store,
src/server/app/embed/refresh.py:28-143; here each repair rewrites only
the affected cells).

The mechanism is the lakehouse copy-on-write pattern at cell granularity:

  * the store is a Hive-partitioned parquet table, one file per `cid`
    (plans/bucketing.ensure_sq8_clustered_store);
  * a repair computes replacement rows for the AFFECTED cells only and
    writes them with dynamic partition overwrite
    (`spark.sql.sources.partitionOverwriteMode=dynamic`) — untouched
    cells' files are never rewritten;
  * cells that cease to exist (merged away, fully erased) are dropped
    with `ALTER TABLE ... DROP PARTITION`;
  * every write goes through `repartition("cid")` first so the
    one-file-per-cell invariant survives the rewrite.

Because splits retire the "centroid = source vector with vec_id == cid"
convention (a split cell's B-half is seeded by an arbitrary member), the
maintained store carries an explicit GEOMETRY table
(cid, seed_vec_id, r_cell): the centroid of cell `cid` is the SOURCE
table's vector at `seed_vec_id`, and r_cell is the cell radius (max
member distance to that seed). The geometry table is k-row — KB-sized at
any corpus scale — and is the only model state a reader needs:
`geom_served_topk` resolves its probe list from it (broadcast-joined to
the source for the seed vectors), then reads exactly n_probe partitions.

Scale shape per repair at 100 TB: occupancy is a k-row aggregate over the
store's partition column (metadata-cheap: cid + vec_id only); member
reads are partition-pruned to affected cells; raw vectors come from ONE
source scan filtered by a broadcast of affected-member ids; the rewrite
shuffles only affected-cell payloads. No step is O(corpus) except the
first store build itself.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load_tables
from .bucketing import (
    IVF_N_CENTROIDS,
    _clear_stale_location,
    ensure_sq8_clustered_store,
)


def _names(sf_dir: str, n_centroids: int, gen: str | None = None) -> tuple[str, str]:
    tag = re.sub(r"\W", "_", sf_dir.strip("/").rsplit("/", 1)[-1])
    gen_sfx = f"_{gen}" if gen else ""
    return (
        f"embeddings_sq8_{tag}_k{n_centroids}{gen_sfx}",
        f"sq8_cell_geom_{tag}_k{n_centroids}{gen_sfx}",
    )


def _dynamic_overwrite(store_name: str, rows: DataFrame) -> None:
    """Rewrite exactly the partitions present in `rows` (dynamic partition
    overwrite), preserving one-file-per-cell. insertInto is positional —
    callers pass columns in table order (vec_id, label, scale, codes, cid)."""
    spark = rows.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        rows.repartition("cid").write.format("parquet").mode(
            "overwrite"
        ).insertInto(store_name)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def _drop_partitions(spark: SparkSession, store_name: str, cids: list[int]) -> None:
    for cid in cids:
        spark.sql(
            f"ALTER TABLE {store_name} DROP IF EXISTS PARTITION (cid={int(cid)})"
        )


def _store_cols(store: DataFrame) -> DataFrame:
    """The store's data columns in table order, cid last (insertInto is
    positional)."""
    return store.select("vec_id", "label", "scale", "codes", "cid")


def _write_geometry(spark: SparkSession, geom_name: str, rows: list) -> None:
    """Replace the geometry table. k-row model state: collect/recreate is
    bounded by n_centroids (never corpus-scaled), and a full small-table
    rewrite is cheaper and safer than partition surgery on a KB table."""
    df = spark.createDataFrame(
        sorted(rows), "cid long, seed_vec_id long, r_cell double"
    )
    _clear_stale_location(spark, f"{geom_name}__next")
    df.coalesce(1).write.format("parquet").mode("overwrite").saveAsTable(
        f"{geom_name}__next"
    )
    spark.sql(f"DROP TABLE IF EXISTS {geom_name}")
    _clear_stale_location(spark, geom_name)
    spark.sql(f"ALTER TABLE {geom_name}__next RENAME TO {geom_name}")


def _geom_rows(spark: SparkSession, geom_name: str) -> list:
    return [
        (int(r.cid), int(r.seed_vec_id), float(r.r_cell))
        for r in spark.table(geom_name).collect()
    ]


def _seed_vectors(emb: DataFrame, geom: DataFrame) -> DataFrame:
    """(cid, ce) centroid vectors for the CURRENT geometry: the source
    table's vector at each cell's seed_vec_id. Geometry is k-row → the
    join broadcasts; the source scan is id-filtered and column-pruned."""
    return geom.join(
        emb.select(F.col("vec_id").alias("seed_vec_id"), "embedding"),
        "seed_vec_id",
    ).select("cid", F.col("embedding").alias("ce"))


def _recompute_radii(
    spark: SparkSession,
    store_name: str,
    emb: DataFrame,
    seeds: DataFrame,
    cids: list[int],
) -> dict[int, float]:
    """r_cell for the given cells off the CURRENT store: one partition-
    pruned pass over affected members joined (broadcast) to the source for
    raw vectors and to the seed table for centroids. Bounded by affected-
    cell occupancy, never the corpus. Same 9-digit round as _cell_radii."""
    from ..functions import vector as V

    members = spark.table(store_name).filter(F.col("cid").isin(cids)).select(
        "vec_id", F.col("cid").cast("long").alias("cid")
    )
    # members is NOT force-broadcast: repair callers pass a handful of
    # affected cells (AQE broadcasts the small side at runtime), but the
    # invariant checker passes EVERY cell — corpus-sized, must shuffle
    dist = (
        emb.join(members, "vec_id")
        .join(
            F.broadcast(seeds.filter(F.col("cid").isin(cids)).withColumnRenamed("cid", "s_cid")),
            F.col("cid") == F.col("s_cid"),
        )
        .select("cid", V.euclidean_distance("embedding", "ce").alias("dc"))
        .groupBy("cid")
        .agg((F.round(F.max("dc"), 9) + F.lit(0.0)).alias("r_cell"))
    )
    return {int(r.cid): float(r.r_cell) for r in dist.collect()}


def sweep_stale_generations(spark: SparkSession, min_age_sec: float = 6 * 3600) -> int:
    """Remove warehouse directories of t18 GENERATIONS left behind by
    prior processes (the session catalog is in-memory, so a dead
    session's gen tables survive only as orphan directories). Guard
    rails: only t18's own `_g<hex>` naming is touched (never the shared
    base store/radii/geometry caches, never test/probe gens — those
    clean up after themselves), only directories UNKNOWN to this
    session's catalog, and only those older than `min_age_sec` (6 h —
    t18 generations live for one harness call; any session older than
    the bar AND still holding a live gen would have to be a 6-hour
    interactive session, accepted as out of contract). Returns the
    number of directories removed. Called by the t18 registry wrapper so
    repeated harness runs don't accumulate unbounded per-call
    generations."""
    import os
    import re as _re
    import shutil
    import time as _time

    wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    wh = wh.replace("file:", "")
    if not os.path.isdir(wh):
        return 0
    pat = _re.compile(
        r"^(embeddings_sq8|sq8_cell_geom)_.+_k\d+_g[0-9a-f]{8}(__next)?$"
    )
    now = _time.time()
    n = 0
    for d in os.listdir(wh):
        full = os.path.join(wh, d)
        try:
            old_enough = now - os.path.getmtime(full) > min_age_sec
        except OSError:
            continue
        if pat.match(d) and old_enough and not spark.catalog.tableExists(d):
            shutil.rmtree(full, ignore_errors=True)
            n += 1
    return n


def ensure_maintained_store(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = IVF_N_CENTROIDS,
    gen: str | None = None,
) -> tuple[str, str]:
    """(store, geometry) pair for a maintenance generation. `gen=None`
    reuses the shared idempotent store (read-only callers); a gen tag
    builds a PRIVATE copy whose partitions the apply_* functions may
    rewrite without invalidating the shared cache other queries serve
    from. Geometry initializes to the build convention (seed_vec_id =
    cid, r_cell from the fused radii table)."""
    base = ensure_sq8_clustered_store(spark, sf_dir, n_centroids)
    store_name, geom_name = _names(sf_dir, n_centroids, gen)
    if gen and not spark.catalog.tableExists(store_name):
        # the session catalog is in-memory: a table from a PRIOR process
        # leaves only its warehouse directory behind — clear it, as the
        # bucketing builders do, or saveAsTable dies on LOCATION_EXISTS
        _clear_stale_location(spark, store_name)
        _store_cols(spark.table(base)).repartition("cid").write.format(
            "parquet"
        ).partitionBy("cid").mode("overwrite").saveAsTable(store_name)
    if not spark.catalog.tableExists(geom_name):
        tag = re.sub(r"\W", "_", sf_dir.strip("/").rsplit("/", 1)[-1])
        radii = spark.table(f"sq8_cell_radii_{tag}_k{n_centroids}")
        rows = [
            (int(r.cid), int(r.cid), float(r.r_cell)) for r in radii.collect()
        ]
        _write_geometry(spark, geom_name, rows)
    return store_name, geom_name


def apply_cell_splits(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = IVF_N_CENTROIDS,
    hot_num: int = 11,
    hot_den: int = 10,
    gen: str = "m",
) -> dict:
    """Apply t15's deterministic 2-split to every hot cell of the store:
    the A-half (seeded by the cell's min-vec_id member) keeps the cid; the
    B-half moves to a NEW cell with cid = n_centroids_base + rank of the
    hot cell (rank by cid asc over this repair) — deterministic and
    SQL-reproducible. Store partitions for hot cells are rewritten in
    place (dynamic overwrite); new-cid partitions are created; geometry
    rows for hot cells are replaced by two rows each with re-tightened
    radii (max member distance to the new seed).

    Codes/scale are per-vector (cell-independent) — a split moves rows
    between partitions, it never re-quantizes."""
    from ..operators.refresh import split_member_assign

    store_name, geom_name = ensure_maintained_store(spark, sf_dir, n_centroids, gen)
    emb = load_tables(spark, sf_dir)["embeddings"]
    store = spark.table(store_name).withColumn("cid", F.col("cid").cast("long"))

    occ = store.groupBy("cid").agg(F.count(F.lit(1)).alias("n_vecs"))
    tot = occ.agg(F.sum("n_vecs").alias("n_total"))
    # threshold against the LIVE cell count (geometry rows), not the
    # build-time n_centroids: after earlier splits/merges the average
    # occupancy is n_total / n_live, and using the stale k would
    # mis-flag cells from cycle 2 onward (review r8). On a fresh
    # generation n_live == occupied build cells (16 at every fixture),
    # so t18's oracle is unaffected.
    n_live = spark.table(geom_name).count()
    hot_rows = (
        occ.crossJoin(F.broadcast(tot))
        .filter(
            F.col("n_vecs") * hot_den * n_live
            > F.lit(hot_num) * F.col("n_total")
        )
        .select("cid")
        .collect()
    )  # bounded by k
    hot_cids = sorted(int(r.cid) for r in hot_rows)
    if not hot_cids:
        return {"hot_cells": 0, "new_cells": 0}

    # raw vectors for hot members: partition-pruned store map ⋈ source
    members = (
        store.filter(F.col("cid").isin(hot_cids))
        .select("vec_id", "cid")
        .join(emb.select("vec_id", "embedding"), "vec_id")
        .select("vec_id", "cid", "embedding")
    )
    sub = split_member_assign(members).localCheckpoint(eager=True)

    # a cell whose members are all identical degenerates to seed B == seed
    # A (its B-half would be empty): leave it alone — splitting cannot
    # reduce its occupancy
    seeds_ab = {
        int(r.cid): (int(r.a_vec), int(r.b_vec))
        for r in sub.select("cid", "a_vec", "b_vec").distinct().collect()
    }
    hot_cids = [c for c in hot_cids if seeds_ab[c][0] != seeds_ab[c][1]]
    if not hot_cids:
        return {"hot_cells": 0, "new_cells": 0}
    sub = sub.filter(F.col("cid").isin(hot_cids))

    # new-cid allocation: geometry knows every live cid; allocate above the
    # current max so ids never collide (collect is k-row bounded)
    geom_rows = _geom_rows(spark, geom_name)
    next_cid = max(r[0] for r in geom_rows) + 1
    new_cid_of = {
        cid: next_cid + rank for rank, cid in enumerate(hot_cids)
    }
    map_df = F.broadcast(
        spark.createDataFrame(
            [(c, int(n)) for c, n in new_cid_of.items()],
            "old_cid long, new_cid long",
        )
    )

    # replacement rows: A-half keeps cid, B-half takes the new cid
    assigned = sub.select(
        "vec_id",
        "cid",
        "a_vec",
        "seed_vec_id",
    ).join(map_df, F.col("cid") == F.col("old_cid"))
    routed = assigned.select(
        "vec_id",
        F.when(F.col("seed_vec_id") == F.col("a_vec"), F.col("cid"))
        .otherwise(F.col("new_cid"))
        .alias("to_cid"),
    )
    repl = (
        store.filter(F.col("cid").isin(hot_cids))
        .drop("cid")
        .join(F.broadcast(routed), "vec_id")
        .select("vec_id", "label", "scale", "codes", F.col("to_cid").alias("cid"))
    )
    _dynamic_overwrite(store_name, repl)

    # geometry: hot rows replaced by two rows each, radii re-tightened off
    # the split's own member distances (round-9, the _cell_radii contract)
    radii = {
        (int(r.cid), int(r.seed_vec_id)): float(r.r_sub)
        for r in sub.groupBy("cid", "seed_vec_id")
        .agg((F.round(F.max("d_sub"), 9) + F.lit(0.0)).alias("r_sub"))
        .collect()
    }
    new_geom = [r for r in geom_rows if r[0] not in set(hot_cids)]
    for cid in hot_cids:
        a_vec, b_vec = seeds_ab[cid]
        new_geom.append((cid, a_vec, radii.get((cid, a_vec), 0.0)))
        new_geom.append((new_cid_of[cid], b_vec, radii.get((cid, b_vec), 0.0)))
    _write_geometry(spark, geom_name, new_geom)
    return {
        "hot_cells": len(hot_cids),
        "new_cells": len(hot_cids),
        "new_cids": sorted(new_cid_of.values()),
    }


def apply_cell_merges(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = IVF_N_CENTROIDS,
    cold_num: int = 9,
    cold_den: int = 10,
    gen: str = "m",
) -> dict:
    """Apply t17's cold-cell merge: members of each cold cell move into
    the nearest NON-cold cell (by seed-vector euclidean, ties → min cid);
    target partitions are rewritten with the union, cold partitions are
    DROPPED, and the target's geometry radius re-tightens to the max
    distance of the merged membership to the TARGET seed."""
    from ..functions import vector as V

    store_name, geom_name = ensure_maintained_store(spark, sf_dir, n_centroids, gen)
    emb = load_tables(spark, sf_dir)["embeddings"]
    store = spark.table(store_name).withColumn("cid", F.col("cid").cast("long"))
    geom = spark.table(geom_name)

    occ = store.groupBy("cid").agg(F.count(F.lit(1)).alias("n_vecs"))
    tot = occ.agg(F.sum("n_vecs").alias("n_total"))
    n_cells = geom.count()
    flagged = occ.crossJoin(F.broadcast(tot)).select(
        "cid",
        "n_vecs",
        (
            F.col("n_vecs") * cold_den * n_cells
            < F.lit(cold_num) * F.col("n_total")
        ).alias("is_cold"),
    )
    seeds = _seed_vectors(emb, geom)
    cold = flagged.filter(F.col("is_cold")).join(
        seeds.withColumnRenamed("ce", "cold_ce"), "cid"
    )
    warm = flagged.filter(~F.col("is_cold")).select(
        F.col("cid").alias("tgt_cid")
    ).join(
        seeds.select(F.col("cid").alias("tgt_cid"), F.col("ce").alias("tgt_ce")),
        "tgt_cid",
    )
    w_t = Window.partitionBy("cold_cid").orderBy(F.asc("cdist"), F.asc("tgt_cid"))
    chosen_rows = (
        cold.select(F.col("cid").alias("cold_cid"), "cold_ce")
        .crossJoin(F.broadcast(warm))
        .select(
            "cold_cid",
            "tgt_cid",
            V.euclidean_distance("cold_ce", "tgt_ce").alias("cdist"),
        )
        .withColumn("rn", F.row_number().over(w_t))
        .filter(F.col("rn") == 1)
        .select("cold_cid", "tgt_cid")
        .collect()
    )  # bounded by k
    if not chosen_rows:
        return {"cold_cells": 0}
    tgt_of = {int(r.cold_cid): int(r.tgt_cid) for r in chosen_rows}
    cold_cids = sorted(tgt_of)
    tgt_cids = sorted(set(tgt_of.values()))

    remap = F.broadcast(
        spark.createDataFrame(
            [(c, t) for c, t in tgt_of.items()], "from_cid long, to_cid long"
        )
    )
    moved = (
        store.filter(F.col("cid").isin(cold_cids))
        .join(remap, F.col("cid") == F.col("from_cid"))
        .select("vec_id", "label", "scale", "codes", F.col("to_cid").alias("cid"))
    )
    kept = _store_cols(store.filter(F.col("cid").isin(tgt_cids)))
    _dynamic_overwrite(store_name, kept.unionByName(moved))
    _drop_partitions(spark, store_name, cold_cids)

    # geometry: drop cold rows; re-tighten the affected targets
    geom_rows = [r for r in _geom_rows(spark, geom_name) if r[0] not in tgt_of]
    new_r = _recompute_radii(spark, store_name, emb, seeds, tgt_cids)
    geom_rows = [
        (cid, seed, new_r.get(cid, r)) for cid, seed, r in geom_rows
    ]
    _write_geometry(spark, geom_name, geom_rows)
    return {
        "cold_cells": len(cold_cids),
        "targets": tgt_cids,
    }


def apply_delete_wave(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = IVF_N_CENTROIDS,
    del_mod: int = 41,
    del_rem: int = 5,
    gen: str = "m",
) -> dict:
    """Apply t16b's erasure wave: rows matching the delete predicate are
    removed by rewriting ONLY their cells' partitions with the survivors
    (cells the wave misses are untouched); fully-emptied cells are
    dropped from both the store and the geometry; affected radii
    re-tighten over survivors."""
    store_name, geom_name = ensure_maintained_store(spark, sf_dir, n_centroids, gen)
    emb = load_tables(spark, sf_dir)["embeddings"]
    store = spark.table(store_name).withColumn("cid", F.col("cid").cast("long"))

    is_del = F.col("vec_id") % del_mod == del_rem
    affected = sorted(
        int(r.cid)
        for r in store.filter(is_del).select("cid").distinct().collect()
    )
    if not affected:
        return {"affected_cells": 0, "deleted": 0}
    aff = store.filter(F.col("cid").isin(affected))
    n_del = aff.filter(is_del).count()
    survivors = _store_cols(aff.filter(~is_del))
    surv_counts = {
        int(r.cid): int(r.n)
        for r in survivors.groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    emptied = [c for c in affected if surv_counts.get(c, 0) == 0]
    nonempty = [c for c in affected if c not in emptied]
    if nonempty:
        _dynamic_overwrite(store_name, survivors.filter(F.col("cid").isin(nonempty)))
    _drop_partitions(spark, store_name, emptied)

    geom = spark.table(geom_name)
    seeds = _seed_vectors(emb, geom)
    new_r = _recompute_radii(spark, store_name, emb, seeds, nonempty)
    geom_rows = [
        (cid, seed, new_r.get(cid, r))
        for cid, seed, r in _geom_rows(spark, geom_name)
        if cid not in set(emptied)
    ]
    _write_geometry(spark, geom_name, geom_rows)
    return {
        "affected_cells": len(affected),
        "deleted": n_del,
        "emptied_cells": emptied,
    }


def geom_served_topk(
    spark: SparkSession,
    sf_dir: str,
    query_id: int = 0,
    k: int = 8,
    n_probe: int = 4,
    n_centroids: int = IVF_N_CENTROIDS,
    gen: str | None = "m",
) -> DataFrame:
    """v24's read against the MAINTAINED store: the probe list resolves
    from the geometry table (seed vectors fetched from the source by
    seed_vec_id — a k-row broadcast join, collected driver-side like
    v24's centroid probe) instead of the build-time `vec_id < k`
    convention, so reads stay correct across splits/merges/erasures.
    Same plan shape as v24: literal partition filter, no shuffle,
    TakeOrderedAndProject over int8 codes."""
    from ..functions import vector as V
    from ..operators.similarity import _query_vectors

    store_name, geom_name = ensure_maintained_store(spark, sf_dir, n_centroids, gen)
    store = spark.table(store_name).withColumn(
        "codes", F.col("codes").cast("array<double>")
    )
    tables = load_tables(spark, sf_dir)
    emb = tables["embeddings"]
    q = _query_vectors(tables, [query_id])
    seeds = _seed_vectors(emb, spark.table(geom_name))
    probe_rows = (
        seeds.crossJoin(F.broadcast(q))
        .select("cid", V.euclidean_distance("ce", "query_vec").alias("qdist"))
        .orderBy(F.asc("qdist"), F.asc("cid"))
        .limit(n_probe)
        .collect()
    )
    probe_cids = [int(r.cid) for r in probe_rows]
    sim = F.round(V.cosine_similarity("codes", "query_vec"), 3) + F.lit(0.0)
    return (
        store.filter(F.col("cid").isin(probe_cids))  # partition pruning
        .filter(F.col("vec_id") != query_id)
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


def store_invariants(
    spark: SparkSession,
    sf_dir: str,
    n_centroids: int = IVF_N_CENTROIDS,
    gen: str | None = "m",
) -> dict:
    """The invariants a maintained store must satisfy after ANY sequence
    of repairs — the contract tests/test_maintenance.py pins and the 1M
    probe asserts:

      cells_match     — store partitions ≡ geometry rows, both ways
      no_empty_cells  — every geometry cell has ≥1 stored member
      radii_tight     — r_cell == max member distance to the cell's seed
                        (recomputed from the source, round-9 equality)
      one_file_per_cell — each partition directory holds exactly 1 file
    """
    import os

    store_name, geom_name = ensure_maintained_store(spark, sf_dir, n_centroids, gen)
    emb = load_tables(spark, sf_dir)["embeddings"]
    store = spark.table(store_name).withColumn("cid", F.col("cid").cast("long"))
    geom = spark.table(geom_name)

    store_cids = {int(r.cid) for r in store.select("cid").distinct().collect()}
    geom_map = {int(r.cid): float(r.r_cell) for r in geom.collect()}
    cells_match = store_cids == set(geom_map)

    occ = {
        int(r.cid): int(r.n)
        for r in store.groupBy("cid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    no_empty = all(occ.get(c, 0) > 0 for c in geom_map)

    seeds = _seed_vectors(emb, geom)
    actual_r = _recompute_radii(
        spark, store_name, emb, seeds, sorted(store_cids)
    )
    radii_tight = all(
        abs(actual_r.get(c, -1.0) - geom_map[c]) < 1e-9 for c in geom_map
    )

    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {store_name}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]
        .data_type
    )
    path = loc.replace("file:", "")
    files_per_cell = {}
    for d in os.listdir(path) if os.path.isdir(path) else []:
        if d.startswith("cid="):
            full = os.path.join(path, d)
            files_per_cell[d] = len(
                [f for f in os.listdir(full) if f.endswith(".parquet")]
            )
    one_file = bool(files_per_cell) and all(
        v == 1 for v in files_per_cell.values()
    )

    return {
        "cells_match": cells_match,
        "no_empty_cells": no_empty,
        "radii_tight": radii_tight,
        "one_file_per_cell": one_file,
        "n_cells": len(geom_map),
        "n_rows": sum(occ.values()),
        "max_files_in_cell": max(files_per_cell.values(), default=0),
    }
