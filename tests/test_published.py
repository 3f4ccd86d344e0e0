"""Published (snapshot-isolated) store: plans/published.py.

The verdict-r9 contract: a reader resolving mid-repair serves either
fully-old or fully-new state (never mixed), a crash before commit is
invisible, and the published layer's repairs produce bit-identical
store state to the in-place maintained layer (shared policy core).
Each test monkeypatches `_pub_root` to a tmp dir so the shared
registry root is never touched.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

import ai_optimizer_spark.plans.published as P

SF = "/root/testdata/sf0.001"
K = 16


@pytest.fixture()
def pub_root(tmp_path, monkeypatch):
    root = str(tmp_path / "pub")
    monkeypatch.setattr(P, "_pub_root", lambda *_a, **_k: root)
    return root


def _rows(df):
    return sorted(
        (int(r.vec_id), int(r.label), int(r.cid), float(r.cos_sim))
        for r in df.collect()
    )


def _store_multiset(spark, root, rows):
    df = P._read_cells(spark, root, [(c, p) for c, _s, _r, _n, p in rows])
    return sorted(
        (int(r.vec_id), int(r.label), float(r.scale),
         tuple(int(c) for c in r.codes), int(r.cid))
        for r in df.collect()
    )


def test_init_matches_maintained_base_serve(spark, pub_root):
    """Epoch 1 is the build: the published serve equals the maintained
    layer's geometry-served read of the untouched store."""
    from ai_optimizer_spark.plans.maintenance import geom_served_topk

    ep = P.publish_init(spark, SF, K)
    assert ep == 1
    got = _rows(P.published_served_topk(spark, SF, 0, 8, 4, K))
    want = _rows(geom_served_topk(spark, SF, 0, 8, 4, K, gen=None))
    assert got == want
    inv = P.published_invariants(spark, SF, K)
    for key in ("paths_exist", "counts_match", "seeds_are_members", "radii_tight"):
        assert inv[key], inv


def test_reader_isolation_across_repair(spark, pub_root):
    """A reader pinned to epoch E keeps serving E's exact pre-repair
    result after a repair commits E+1; an unpinned reader resolves the
    complete new state. No mixed state is observable at any epoch."""
    P.publish_init(spark, SF, K)
    ep0, rows0 = P.resolve_snapshot(spark, SF, K)
    before = _rows(P.published_served_topk(spark, SF, 0, 8, 4, K, epoch=ep0))
    rep = P.publish_repair(spark, SF, K, 13, 10, 1, 4)
    assert rep["epoch"] == ep0 + 1 and rep["plan"]["split"] >= 1
    # pinned reader: bit-identical to the pre-repair serve
    assert _rows(P.published_served_topk(spark, SF, 0, 8, 4, K, epoch=ep0)) == before
    # the old snapshot's manifest is untouched
    assert P.resolve_snapshot(spark, SF, K, epoch=ep0)[1] == rows0
    # new reader: complete post-repair state, invariants green
    inv = P.published_invariants(spark, SF, K)
    assert inv["epoch"] == ep0 + 1
    for key in ("paths_exist", "counts_match", "seeds_are_members", "radii_tight"):
        assert inv[key], inv
    # and the old epoch still audits green too (fully-old, never mixed)
    inv0 = P.published_invariants(spark, SF, K, epoch=ep0)
    for key in ("paths_exist", "counts_match", "seeds_are_members", "radii_tight"):
        assert inv0[key], inv0


def test_crash_before_commit_is_invisible(spark, pub_root, monkeypatch):
    """Kill the repair between staging cell files and committing the
    snapshot: readers still resolve the old epoch, serve correctly, and
    the sweeper reclaims the orphans; a subsequent repair succeeds."""
    P.publish_init(spark, SF, K)
    before = _rows(P.published_served_topk(spark, SF, 0, 8, 4, K))

    real_commit = P._commit_snapshot

    def boom(*a, **k):
        raise RuntimeError("injected crash before commit")

    monkeypatch.setattr(P, "_commit_snapshot", boom)
    with pytest.raises(RuntimeError, match="injected"):
        P.publish_repair(spark, SF, K, 13, 10, 1, 4)
    # reader view: nothing happened
    assert P.published_epochs(spark, SF, K) == [1]
    assert _rows(P.published_served_topk(spark, SF, 0, 8, 4, K)) == before
    # orphan cell files exist and are swept once old enough
    n_cells_before = len(P._listdir(spark, os.path.join(pub_root, "cells")))
    swept = P.sweep_published(spark, SF, K, keep_epochs=2, min_age_sec=0.0)
    assert swept["deleted_files"] > 0
    assert (
        len(P._listdir(spark, os.path.join(pub_root, "cells")))
        == n_cells_before - swept["deleted_files"]
    )
    # the repair completes normally afterwards
    monkeypatch.setattr(P, "_commit_snapshot", real_commit)
    rep = P.publish_repair(spark, SF, K, 13, 10, 1, 4)
    assert rep["epoch"] == 2
    inv = P.published_invariants(spark, SF, K)
    for key in ("paths_exist", "counts_match", "seeds_are_members", "radii_tight"):
        assert inv[key], inv


def test_published_equals_inplace_repair(spark, pub_root):
    """The two layers execute the SAME policy: after one plan-driven
    cycle at identical thresholds, the published store state equals the
    maintained gen table's (vec_id, label, scale, codes, cid) multiset
    and the geometry agrees row-for-row (cid, seed, round-9 radius)."""
    import uuid

    import ai_optimizer_spark.plans.maintenance as M

    P.publish_init(spark, SF, K)
    P.publish_repair(spark, SF, K, 13, 10, 1, 4)
    _ep, rows = P.resolve_snapshot(spark, SF, K)

    g = f"t{uuid.uuid4().hex[:8]}"
    store_name, geom_name = M.ensure_maintained_store(spark, SF, K, g)
    try:
        M.apply_repair_plan(spark, SF, K, 13, 10, 1, 4, gen=g, audit=False)
        want_store = sorted(
            (int(r.vec_id), int(r.label), float(r.scale),
             tuple(int(c) for c in r.codes), int(r.cid))
            for r in spark.table(store_name).collect()
        )
        assert _store_multiset(spark, pub_root, rows) == want_store
        want_geom = sorted(
            (int(r.cid), int(r.seed_vec_id), round(float(r.r_cell), 9))
            for r in spark.table(geom_name).collect()
        )
        got_geom = sorted(
            (c, s, round(r, 9)) for c, s, r, _n, _p in rows
        )
        assert got_geom == want_geom
    finally:
        for t in M._names(SF, K, g):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_all_keep_plan_publishes_nothing(spark, pub_root):
    """A cycle whose plan is all-keep commits no new epoch (publishing an
    identical snapshot would churn readers and the sweeper for nothing)."""
    P.publish_init(spark, SF, K)
    rep = P.publish_repair(spark, SF, K, 100, 1, 1, 100)  # unreachable bars
    assert rep["plan"]["split"] == 0 and rep["plan"]["merge"] == 0
    assert rep["epoch"] == 1
    assert P.published_epochs(spark, SF, K) == [1]


def test_serve_reads_exactly_probe_files(spark, pub_root):
    """File-level pruning: the serve plan's scan list is exactly the
    n_probe probed cells' files — nothing else is readable from the
    plan, and no sort-merge join appears (manifest joins broadcast)."""
    P.publish_init(spark, SF, K)
    df = P.published_served_topk(spark, SF, 0, 8, 4, K)
    files = df.inputFiles()
    cell_files = [f for f in files if "/cells/" in f]
    assert len(cell_files) == 4
    assert "SortMergeJoin" not in df._jdf.queryExecution().executedPlan().toString()


def test_sweep_retains_servable_epochs(spark, pub_root):
    """After three epochs with keep_epochs=2: the oldest snapshot is
    gone, the retained two still serve (all their files kept)."""
    P.publish_init(spark, SF, K)
    P.publish_repair(spark, SF, K, 13, 10, 1, 4)
    P.publish_repair(spark, SF, K, 3, 1, 2, 3)
    eps = P.published_epochs(spark, SF, K)
    assert len(eps) >= 2
    served = {
        ep: _rows(P.published_served_topk(spark, SF, 0, 8, 4, K, epoch=ep))
        for ep in eps[-2:]
    }
    swept = P.sweep_published(spark, SF, K, keep_epochs=2, min_age_sec=0.0)
    assert swept["dropped_epochs"] == eps[:-2]
    assert P.published_epochs(spark, SF, K) == eps[-2:]
    for ep, want in served.items():
        assert _rows(P.published_served_topk(spark, SF, 0, 8, 4, K, epoch=ep)) == want
        inv = P.published_invariants(spark, SF, K, epoch=ep)
        assert inv["paths_exist"], inv


def test_heal_geometry_finishes_abandoned_swap(spark):
    """Maintained-store sibling fix: a crash between _write_geometry's
    DROP and RENAME (same-process exception window) leaves `__next`
    complete; ensure_maintained_store heals it instead of rebuilding."""
    import uuid

    import ai_optimizer_spark.plans.maintenance as M

    g = f"t{uuid.uuid4().hex[:8]}"
    store_name, geom_name = M.ensure_maintained_store(spark, SF, K, g)
    try:
        want = sorted(
            (int(r.cid), int(r.seed_vec_id), float(r.r_cell))
            for r in spark.table(geom_name).collect()
        )
        # simulate the crash window: __next fully written, original dropped
        spark.table(geom_name).write.mode("overwrite").saveAsTable(
            f"{geom_name}__next"
        )
        spark.sql(f"DROP TABLE IF EXISTS {geom_name}")
        assert not spark.catalog.tableExists(geom_name)
        M.ensure_maintained_store(spark, SF, K, g)  # heals, must not rebuild
        got = sorted(
            (int(r.cid), int(r.seed_vec_id), float(r.r_cell))
            for r in spark.table(geom_name).collect()
        )
        assert got == want
        assert not spark.catalog.tableExists(f"{geom_name}__next")
    finally:
        for t in (*M._names(SF, K, g), f"{M._names(SF, K, g)[1]}__next"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
