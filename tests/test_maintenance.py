"""Applied store maintenance (plans/maintenance.py): the full
split→merge→erase cycle on a real partitioned store, with the store
invariants asserted after every step and an INDEPENDENT numpy oracle for
the geometry-served read (VERDICT r7 task 7).

The t15/t17/t16b operators are analysis forms verified against DuckDB;
these tests verify the APPLY side: partition rewrites, DROP PARTITIONs,
geometry updates, and that serving stays correct across repairs.
"""

from __future__ import annotations

import uuid

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_optimizer_spark.plans.maintenance import (
    apply_cell_merges,
    apply_cell_splits,
    apply_delete_wave,
    ensure_maintained_store,
    geom_served_topk,
    store_invariants,
)

SF = "/root/testdata/sf0.001"
K = 16


@pytest.fixture(scope="module")
def gen(spark):
    """One maintenance generation shared by the module: the tests apply
    the cycle IN ORDER (split → merge → erase) and each asserts the
    invariants — order matters and pytest runs module tests in file
    order. Teardown drops the gen tables so repeated test runs don't
    accumulate store copies in the shared warehouse (review r8)."""
    g = f"t{uuid.uuid4().hex[:8]}"
    store_name, geom_name = ensure_maintained_store(spark, SF, K, gen=g)
    yield g
    for name in (store_name, geom_name):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _assert_invariants(spark, gen, stage: str):
    inv = store_invariants(spark, SF, K, gen=gen)
    for key in ("cells_match", "no_empty_cells", "radii_tight", "one_file_per_cell"):
        assert inv[key], f"{stage}: invariant {key} violated: {inv}"
    return inv


def _numpy_serve(spark, gen, query_id: int, k: int, n_probe: int):
    """Independent oracle for geom_served_topk: numpy recomputation of the
    probe list and the SQ8 top-k off the CURRENT store + geometry tables
    (reads the same state, shares no Spark expression code)."""
    from ai_optimizer_spark.plans.maintenance import _names

    store_name, geom_name = _names(SF, K, gen)
    store = spark.table(store_name).toPandas()
    geom = spark.table(geom_name).toPandas()
    emb = {
        int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{SF}/embeddings.parquet").collect()
    }
    qv = emb[query_id]
    # probe: n_probe nearest cells by euclidean distance to the seed vector
    geom = geom.assign(
        qdist=[np.linalg.norm(emb[int(s)] - qv) for s in geom["seed_vec_id"]]
    ).sort_values(["qdist", "cid"])
    probe = set(int(c) for c in geom["cid"].head(n_probe))
    cand = store[store["cid"].astype(int).isin(probe)]
    rows = []
    for r in cand.itertuples(index=False):
        if int(r.vec_id) == query_id:
            continue
        c = np.asarray(r.codes, dtype=np.float64)
        denom = np.linalg.norm(c) * np.linalg.norm(qv)
        sim = round(float(c @ qv / denom), 3) if denom > 0 else -1.0
        rows.append((int(r.vec_id), sim))
    rows.sort(key=lambda t: (-t[1], t[0]))
    return rows[:k]


def test_fresh_generation_invariants_and_serve(spark, gen):
    inv = _assert_invariants(spark, gen, "fresh")
    assert inv["n_cells"] == K
    got = [
        (int(r.vec_id), float(r.cos_sim))
        for r in geom_served_topk(spark, SF, 0, 8, 4, K, gen=gen).collect()
    ]
    assert got == _numpy_serve(spark, gen, 0, 8, 4)


@pytest.mark.slow
def test_apply_splits_preserves_invariants(spark, gen):
    store_name, _ = ensure_maintained_store(spark, SF, K, gen=gen)
    before = spark.table(store_name).count()
    rep = apply_cell_splits(spark, SF, K, hot_num=11, hot_den=10, gen=gen)
    assert rep["hot_cells"] > 0, "fixture must have hot cells at 1.1x avg"
    inv = _assert_invariants(spark, gen, "after-split")
    assert inv["n_cells"] == K + rep["new_cells"]
    assert inv["n_rows"] == before  # splits move rows, never drop them
    got = [
        (int(r.vec_id), float(r.cos_sim))
        for r in geom_served_topk(spark, SF, 0, 8, 4, K, gen=gen).collect()
    ]
    assert got == _numpy_serve(spark, gen, 0, 8, 4)


@pytest.mark.slow
def test_apply_merges_preserves_invariants(spark, gen):
    store_name, geom_name = ensure_maintained_store(spark, SF, K, gen=gen)
    before = spark.table(store_name).count()
    cells_before = spark.table(geom_name).count()
    rep = apply_cell_merges(spark, SF, K, cold_num=9, cold_den=10, gen=gen)
    assert rep["cold_cells"] > 0, "post-split store must have cold cells"
    inv = _assert_invariants(spark, gen, "after-merge")
    assert inv["n_cells"] == cells_before - rep["cold_cells"]
    assert inv["n_rows"] == before  # merges move rows, never drop them
    got = [
        (int(r.vec_id), float(r.cos_sim))
        for r in geom_served_topk(spark, SF, 0, 8, 4, K, gen=gen).collect()
    ]
    assert got == _numpy_serve(spark, gen, 0, 8, 4)


@pytest.mark.slow
def test_apply_delete_wave_preserves_invariants(spark, gen):
    store_name, _ = ensure_maintained_store(spark, SF, K, gen=gen)
    before = spark.table(store_name).count()
    rep = apply_delete_wave(spark, SF, K, del_mod=41, del_rem=5, gen=gen)
    assert rep["deleted"] > 0
    inv = _assert_invariants(spark, gen, "after-delete")
    assert inv["n_rows"] == before - rep["deleted"]
    # the erased rows are really gone from the store
    store = spark.table(store_name)
    assert store.filter(F.col("vec_id") % 41 == 5).count() == 0
    got = [
        (int(r.vec_id), float(r.cos_sim))
        for r in geom_served_topk(spark, SF, 0, 8, 4, K, gen=gen).collect()
    ]
    assert got == _numpy_serve(spark, gen, 0, 8, 4)


@pytest.mark.slow
def test_delete_wave_idempotent(spark, gen):
    """Replaying the same erasure wave is a no-op: nothing left to delete,
    no partitions rewritten, invariants intact.

    slow: the replay leg of the gen-store mutation chain (splits → merges
    → delete wave → THIS) — it asserts on state the preceding slow-marked
    wave test creates, so the chain runs together in the slow tier."""
    rep = apply_delete_wave(spark, SF, K, del_mod=41, del_rem=5, gen=gen)
    assert rep == {"affected_cells": 0, "deleted": 0}
    _assert_invariants(spark, gen, "after-replay")


def test_geom_serve_plan_shape(spark, gen):
    """The maintained-store read keeps v24's plan contract: literal
    partition pruning on cid, no shuffle exchange, TakeOrderedAndProject."""
    df = geom_served_topk(spark, SF, 0, 8, 4, K, gen=gen)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "PartitionFilters" in plan
    assert "cid" in plan.split("PartitionFilters", 1)[1][:200]
    assert plan.count("Exchange") == plan.count("BroadcastExchange")


@pytest.mark.slow
def test_split_generation_reused_across_calls(spark, monkeypatch):
    """Two consecutive t18-style calls share ONE generation: the first
    builds (one apply_cell_splits), the second re-serves the cached gen
    without re-copying the store or re-applying the split (verdict r8:
    the per-call uuid gen copied the whole base store every call)."""
    import ai_optimizer_spark.plans.maintenance as M

    # isolate the memo so earlier tests/sessions can't pre-satisfy it
    monkeypatch.setattr(M, "_GEN_APPLIED", set())
    calls = []
    real_apply = M.apply_cell_splits
    monkeypatch.setattr(
        M,
        "apply_cell_splits",
        lambda *a, **kw: (calls.append(1), real_apply(*a, **kw))[1],
    )
    g1 = M.split_generation(spark, SF, K, hot_num=11, hot_den=10)
    g2 = M.split_generation(spark, SF, K, hot_num=11, hot_den=10)
    try:
        assert g1 == g2  # deterministic config-keyed tag
        assert calls == [1], "second call must re-serve, not re-split"
        # the cached generation serves identically to a fresh one
        got = [
            (int(r.vec_id), float(r.cos_sim))
            for r in geom_served_topk(spark, SF, 0, 8, 4, K, gen=g1).collect()
        ]
        assert got == _numpy_serve(spark, g1, 0, 8, 4)
        # a different config gets its own generation
        assert M.split_generation(spark, SF, K, hot_num=2, hot_den=1) != g1
    finally:
        for base in M._names(SF, K, g1) + M._names(
            SF, K, M.split_generation(spark, SF, K, hot_num=2, hot_den=1)
        ):
            spark.sql(f"DROP TABLE IF EXISTS {base}")


def test_sweep_stale_generations_guards(spark, tmp_path):
    """The t18 generation reaper: removes only gen-suffixed orphan dirs
    older than the age bar; live-session tables, young dirs, and the
    shared base-store caches are never touched."""
    import os
    import time

    from ai_optimizer_spark.plans.maintenance import sweep_stale_generations

    wh = spark.conf.get("spark.sql.warehouse.dir").replace("file:", "")
    os.makedirs(wh, exist_ok=True)
    old = time.time() - 7 * 3600  # past the 6 h age bar
    victims = ["embeddings_sq8_sfx_k16_gdeadbeef", "sq8_cell_geom_sfx_k16_gdeadbeef"]
    keepers = [
        "embeddings_sq8_sfx_k16",          # shared base cache: wrong pattern
        "sq8_cell_radii_sfx_k16",          # radii cache: wrong prefix
        "embeddings_sq8_sfx_k16_tdeadbee",  # test-gen prefix: wrong pattern
    ]
    young = "embeddings_sq8_sfx_k16_g12345678"
    for d in victims + keepers + [young]:
        os.makedirs(os.path.join(wh, d), exist_ok=True)
        if d != young:
            os.utime(os.path.join(wh, d), (old, old))
    try:
        removed = sweep_stale_generations(spark)
        assert removed >= len(victims)
        for d in victims:
            assert not os.path.isdir(os.path.join(wh, d)), d
        for d in keepers + [young]:
            assert os.path.isdir(os.path.join(wh, d)), d
    finally:
        import shutil

        for d in keepers + [young]:
            shutil.rmtree(os.path.join(wh, d), ignore_errors=True)


@pytest.mark.slow
def test_repair_plan_cycle_converges(spark):
    """The plan-driven loop (verdict r8 task 3): cycle 1 executes the
    decision table's rows with BALANCED splits; cycle 2 must decide
    all-keep (fixed-target thresholds + median-cut halves — nearest-seed
    splits ping-ponged: 42 -> 38+4 -> merge-back -> 42). Invariants,
    including seeds_are_members, hold after the cycle."""
    import uuid

    import ai_optimizer_spark.plans.maintenance as M

    g = f"t{uuid.uuid4().hex[:8]}"
    M.ensure_maintained_store(spark, SF, K, g)
    try:
        c1 = M.apply_repair_plan(spark, SF, K, 13, 10, 1, 4, gen=g)
        assert c1["plan"]["split"] >= 1, "fixture must flag a hot cell at 1.3x"
        for key, val in c1["invariants"].items():
            if isinstance(val, bool):
                assert val, f"cycle-1 invariant {key} violated: {c1['invariants']}"
        c2 = M.apply_repair_plan(spark, SF, K, 13, 10, 1, 4, gen=g)
        assert c2["plan"]["split"] == 0 and c2["plan"]["merge"] == 0, (
            f"cycle 2 must decide all-keep, got {c2['plan']}"
        )
    finally:
        for t in M._names(SF, K, g):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_balanced_split_halves_are_even(spark):
    """split_member_assign_balanced cuts exactly ceil(n/2)/floor(n/2) and
    keeps t15's seeds (A = min member, B = farthest from A, both members
    of their own halves)."""
    from ai_optimizer_spark.operators.refresh import (
        split_member_assign,
        split_member_assign_balanced,
    )
    from ai_optimizer_spark.tables import load_tables

    emb = load_tables(spark, SF)["embeddings"]
    members = emb.select(
        "vec_id", (F.col("vec_id") % 2).alias("cid"), "embedding"
    )
    bal = split_member_assign_balanced(members).toPandas()
    near = split_member_assign(members).toPandas()
    # same seed pairs as the nearest-seed assigner
    assert set(map(tuple, bal[["cid", "a_vec", "b_vec"]].values.tolist())) == set(
        map(tuple, near[["cid", "a_vec", "b_vec"]].values.tolist())
    )
    for cid, grp in bal.groupby("cid"):
        n = len(grp)
        n_a = (grp["seed_vec_id"] == grp["a_vec"]).sum()
        assert n_a == (n + 1) // 2, f"cell {cid}: {n_a} of {n} in A-half"
        a_vec = int(grp["a_vec"].iloc[0])
        b_vec = int(grp["b_vec"].iloc[0])
        assert int(grp.loc[grp.vec_id == a_vec, "seed_vec_id"].iloc[0]) == a_vec
        assert int(grp.loc[grp.vec_id == b_vec, "seed_vec_id"].iloc[0]) == b_vec


@pytest.mark.slow
def test_delete_wave_reseeds_erased_seed(spark):
    """Erasing a geometry seed re-seeds the cell with its min surviving
    member: the geometry never references an erased id (verdict r8
    task 4 — the right-to-be-forgotten gap)."""
    import uuid

    import ai_optimizer_spark.plans.maintenance as M

    g = f"t{uuid.uuid4().hex[:8]}"
    store_name, geom_name = M.ensure_maintained_store(spark, SF, K, g)
    try:
        # pick a live seed and a modulus hitting exactly that id
        seed = int(
            spark.table(geom_name).orderBy("cid").limit(1).collect()[0].seed_vec_id
        )
        n_rows = spark.table(store_name).count()
        mod = n_rows + 17  # > max vec_id: predicate hits exactly `seed`
        rep = M.apply_delete_wave(spark, SF, K, del_mod=mod, del_rem=seed, gen=g)
        assert rep["deleted"] == 1
        assert rep["reseeded_cells"], "the erased id was a seed; must reseed"
        live_seeds = {
            int(r.seed_vec_id) for r in spark.table(geom_name).collect()
        }
        assert seed not in live_seeds
        inv = M.store_invariants(spark, SF, K, gen=g)
        for key, val in inv.items():
            if isinstance(val, bool):
                assert val, f"invariant {key} violated after seed erasure: {inv}"
    finally:
        for t in M._names(SF, K, g):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_hadoop_fs_partition_listing(spark, gen):
    """The one-file-per-cell audit goes through the Hadoop FS API: a
    scheme-qualified URI (file:/...) lists correctly — os.listdir would
    have required stripping the scheme and silently returns {} on any
    non-local store (verdict r8 task 7)."""
    from ai_optimizer_spark.plans.maintenance import (
        _hadoop_partition_files,
        _names,
    )

    store_name, _ = _names(SF, K, gen)
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {store_name}")
        .filter(F.col("col_name") == "Location")
        .collect()[0]
        .data_type
    )
    assert loc.startswith("file:"), loc  # the non-local (URI) branch is real
    files = _hadoop_partition_files(spark, loc)
    assert files and all(n == 1 for n in files.values())
    assert _hadoop_partition_files(spark, loc + "__nonexistent__") == {}


def test_live_repair_plan_broadcast_only(spark, gen):
    """Plan guard: deciding is k-row work — occupancy agg plus broadcast
    joins; no sort-merge join may appear in the decision table's plan."""
    from ai_optimizer_spark.plans.maintenance import live_repair_plan

    df = live_repair_plan(spark, SF, K, gen=gen)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan


@pytest.mark.slow
def test_ingest_roundtrip_store_equality(spark):
    """Erase-wave → re-ingest reproduces the ENTIRE store and geometry
    bit-for-bit (not just the served top-k t24 hash-verifies): same
    (vec_id, label, scale, codes, cid) multiset, same geometry rows."""
    import uuid

    import ai_optimizer_spark.plans.maintenance as M
    from ai_optimizer_spark.tables import load_tables

    ref = f"t{uuid.uuid4().hex[:8]}"
    rt = f"t{uuid.uuid4().hex[:8]}"
    ref_store, ref_geom = M.ensure_maintained_store(spark, SF, K, ref)
    rt_store, rt_geom = M.ensure_maintained_store(spark, SF, K, rt)
    try:
        rep = M.apply_delete_wave(spark, SF, K, del_mod=41, del_rem=23, gen=rt)
        assert rep["deleted"] > 0 and not rep.get("reseeded_cells")
        emb = load_tables(spark, SF)["embeddings"]
        batch = emb.filter(F.col("vec_id") % 41 == 23).select(
            "vec_id", "label", "embedding"
        )
        ing = M.apply_ingest_batch(spark, SF, K, gen=rt, batch=batch)
        assert ing["ingested"] == rep["deleted"]

        def canon(name):
            return sorted(
                (int(r.vec_id), int(r.label), float(r.scale),
                 tuple(int(c) for c in r.codes), int(r.cid))
                for r in spark.table(name).collect()
            )

        assert canon(rt_store) == canon(ref_store)
        assert sorted(
            (int(r.cid), int(r.seed_vec_id), float(r.r_cell))
            for r in spark.table(rt_geom).collect()
        ) == sorted(
            (int(r.cid), int(r.seed_vec_id), float(r.r_cell))
            for r in spark.table(ref_geom).collect()
        )
        inv = M.store_invariants(spark, SF, K, gen=rt)
        for key, val in inv.items():
            if isinstance(val, bool):
                assert val, f"invariant {key} violated after round trip: {inv}"
    finally:
        for t in M._names(SF, K, ref) + M._names(SF, K, rt):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


@pytest.mark.slow
def test_ingest_into_repaired_geometry(spark):
    """Ingest into a store whose geometry has DIVERGED from the build
    convention: erase a wave, split hot cells (new cells, new seeds),
    then re-ingest the erased rows — assignment must follow the LIVE
    seeds (an erased row can land in a post-split cell that did not
    exist when it was first built), radii extend monotonically, and the
    full invariant suite (incl. radii_tight recomputed from source and
    seeds_are_members) stays green. The ingest contract is asserted
    implicitly: batch ids exist in the source table (the system of
    record for raw vectors), which is what the radii audit joins on."""
    import uuid

    import ai_optimizer_spark.plans.maintenance as M
    from ai_optimizer_spark.tables import load_tables

    g = f"t{uuid.uuid4().hex[:8]}"
    store_name, geom_name = M.ensure_maintained_store(spark, SF, K, g)
    try:
        rep = M.apply_delete_wave(spark, SF, K, del_mod=43, del_rem=7, gen=g)
        assert rep["deleted"] > 0
        M.apply_cell_splits(spark, SF, K, hot_num=11, hot_den=10, gen=g)
        n0 = spark.table(store_name).count()
        n_cells = spark.table(geom_name).count()
        assert n_cells > K  # geometry really diverged from the build
        emb = load_tables(spark, SF)["embeddings"]
        batch = emb.filter(F.col("vec_id") % 43 == 7).select(
            "vec_id", "label", "embedding"
        )
        ing = M.apply_ingest_batch(spark, SF, K, gen=g, batch=batch)
        assert ing["ingested"] == rep["deleted"]
        assert spark.table(store_name).count() == n0 + rep["deleted"]
        inv = M.store_invariants(spark, SF, K, gen=g)
        for key, val in inv.items():
            if isinstance(val, bool):
                assert val, f"invariant {key} violated after ingest: {inv}"
        # served read still agrees with the independent numpy oracle
        got = [
            (int(r.vec_id), float(r.cos_sim))
            for r in geom_served_topk(spark, SF, 0, 8, 4, K, gen=g).collect()
        ]
        assert got == _numpy_serve(spark, g, 0, 8, 4)
    finally:
        for t in M._names(SF, K, g):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_balanced_split_seed_b_survives_max_distance_ties(spark):
    """ADVICE r9 (medium): when > floor(n/2) members tie at the max
    distance (duplicate embeddings), the median-cut window must still
    rank seed B into the B-half — otherwise apply_cell_splits writes a
    B-cell whose geometry seed is not a member. Cell fixture: vec 1 at
    the origin (seed A), vecs 2-6 all identical at distance 1 (seed B =
    vec 2, the min-id member of a 5-way tie spanning the cut)."""
    from ai_optimizer_spark.operators.refresh import split_member_assign_balanced

    members = spark.createDataFrame(
        [(1, 0, [0.0, 0.0])] + [(v, 0, [1.0, 0.0]) for v in range(2, 7)],
        "vec_id long, cid long, embedding array<double>",
    )
    bal = {
        int(r.vec_id): (int(r.a_vec), int(r.b_vec), int(r.seed_vec_id))
        for r in split_member_assign_balanced(members).collect()
    }
    a_vec, b_vec = bal[1][0], bal[1][1]
    assert (a_vec, b_vec) == (1, 2)
    # seed B lands in its own half despite ranking first by the old
    # (dist_a, vec_id) order
    assert bal[b_vec][2] == b_vec
    # halves are still exactly ceil(n/2)/floor(n/2)
    n_a = sum(1 for _, _, s in bal.values() if s == a_vec)
    assert n_a == 3 and len(bal) - n_a == 3
    # seed A keeps rank 1 (it is the only dist-0 member here)
    assert bal[a_vec][2] == a_vec


def test_ingest_rejects_duplicate_ids(spark):
    """ADVICE r9: apply_ingest_batch enforces the 'ids must be new'
    contract — a batch reusing a live vec_id raises instead of silently
    appending a duplicate id (possibly into a different cell)."""
    import uuid

    import ai_optimizer_spark.plans.maintenance as M
    from ai_optimizer_spark.tables import load_tables

    g = f"t{uuid.uuid4().hex[:8]}"
    store_name, _ = M.ensure_maintained_store(spark, SF, K, g)
    try:
        emb = load_tables(spark, SF)["embeddings"]
        batch = emb.filter(F.col("vec_id") % 41 == 23).select(
            "vec_id", "label", "embedding"
        )
        n0 = spark.table(store_name).count()
        with pytest.raises(ValueError, match="already live"):
            M.apply_ingest_batch(spark, SF, K, gen=g, batch=batch)
        assert spark.table(store_name).count() == n0  # nothing appended
    finally:
        for t in M._names(SF, K, g):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
