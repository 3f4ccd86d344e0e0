"""Core relational operators — SURVEY.md §2.3 (joins), §2.4 (aggregations),
§2.5 (windows/top-k), §2.6 (set ops) — re-expressed as declarative DataFrame
plans over the driver's TPC-H-ish tables.

Each function takes the `tables` dict from `tables.load_tables` and returns a
DataFrame. Semantics trace to the reference (file:line cited per function);
the *shape* (which join keys, which aggregates) is mapped onto the driver's
star schema: nation≈team, customer≈driver, orders≈race entries,
lineitem≈per-lap results.

Scale notes apply to every function here:
  * dimension sides (region/nation/part/supplier) broadcast — at 100 TB
    only fact-fact joins (orders⋈lineitem) shuffle, co-partitioned on the
    join key by AQE;
  * aggregations are partial+final automatically (map-side combine), so
    group-by cardinality, not input rows, bounds the shuffle;
  * top-k uses window row_number per group (partition-local sort + single
    shuffle on the group key) or `orderBy().limit(k)` which Catalyst plans
    as TakeOrderedAndProject (per-partition heap, no full sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import shared_persist


def revenue_expr():
    """Per-line revenue: extendedprice * (1 - discount)."""
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------

def pricing_summary(t: dict[str, DataFrame]) -> DataFrame:
    """Grouped multi-aggregate rollup (A5/A6 shape: SUM/AVG/COUNT with
    conditional arithmetic), the reference's standings-view aggregate
    pattern (docs/demo/racing-championship/schema.sql:669-723) applied to
    lineitem. Pure partial+final agg: one shuffle of 6 groups.
    """
    li = t["lineitem"]
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(revenue_expr()), 2).alias("sum_disc_price"),
            F.round(F.sum(revenue_expr() * (F.lit(1.0) + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def customer_standings(t: dict[str, DataFrame], limit: int = 20) -> DataFrame:
    """The flagship: per-customer standings — the reference's driver-standings
    view shape (schema.sql:669-699: multi-join + SUM + COUNT(DISTINCT) +
    conditional COUNT + ROUND(AVG)) over customer⋈orders⋈lineitem.

    Plan: orders⋈lineitem is the only fact-fact shuffle; customer joins on
    the already-aggregated (small) side. Final top-N is
    TakeOrderedAndProject — no global sort materialization.
    """
    cust, orders, li = t["customer"], t["orders"], t["lineitem"]
    per_cust = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(
            F.round(F.sum(revenue_expr()), 2).alias("total_revenue"),
            F.countDistinct("o_orderkey").alias("num_orders"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("finished_lines"),
            F.round(F.avg("l_quantity"), 4).alias("avg_quantity"),
        )
    )
    return (
        per_cust.join(cust, per_cust.o_custkey == cust.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            "total_revenue",
            "num_orders",
            "finished_lines",
            "avg_quantity",
        )
        .orderBy(F.desc("total_revenue"), F.asc("custkey"))
        .limit(limit)
    )


def team_standings(t: dict[str, DataFrame]) -> DataFrame:
    """Per-nation ("team") standings with conditional aggregation — the
    reference's team_standings view (schema.sql:725-745): SUM, COUNT(DISTINCT),
    conditional SUM via CASE, NVL→coalesce, ROUND(AVG,3).
    Nation/region are broadcast dims; only orders⋈customer shuffles.
    """
    cust, orders, nation = t["customer"], t["orders"], t["nation"]
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("team"))
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("total_points"),
            F.countDistinct("o_custkey").alias("num_drivers"),
            F.count(F.when(F.col("o_orderpriority") == "1-URGENT", 1)).alias("urgent_orders"),
            F.round(F.coalesce(F.sum(F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))), F.lit(0.0)), 2).alias("finished_points"),
            F.round(F.avg("o_totalprice"), 3).alias("avg_points"),
        )
    )


def json_group_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """A1: GROUP BY a JSON-extracted field with MAX rollups — the reference
    pushes `GROUP BY JSON_VALUE(metadata,'$.filename')` server-side so the
    app never materializes per-chunk rows (embed/vector_store.py:375-412).
    Here: events.props is a JSON bag; group on `$.k`.
    `get_json_object` stays in whole-stage codegen — no UDF.
    """
    ev = t["events"]
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.groupBy(k.alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.max("value"), 4).alias("max_value"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def two_key_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """A2: two-key group-by with COUNT + MAX stats + orphan handling via
    coalesce (embed/vector_store.py:447-531 groups by (filename, source) and
    labels null filenames as orphans)."""
    docs = t["documents"]
    return (
        docs.groupBy(
            F.coalesce(F.col("lang"), F.lit("orphan")).alias("lang"),
            F.col("source").alias("source"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_chars").alias("max_chars"),
            F.min("doc_id").alias("first_doc"),
        )
    )


def distinct_sources(t: dict[str, DataFrame]) -> DataFrame:
    """A4: DISTINCT projection (embed/vector_store.py:415-419 pulls distinct
    legacy metadata sources). Hash-agg distinct, partial+final."""
    return t["documents"].select("source").distinct()


def correctness_report(t: dict[str, DataFrame]) -> DataFrame:
    """A7+A8: evaluation aggregation — overall + per-topic mean correctness
    (api/v1/endpoints/testbed.py:312-346, Giskard correctness_by_topic).
    "Correctness" is a deterministic judge double: md5-parity of the doc text
    (same rule in the DuckDB oracle), topic = lang. `grouping sets` gives
    overall + by-topic in ONE shuffle instead of a union of two aggs.
    """
    docs = t["documents"]
    judged = docs.withColumn(
        "correct",
        (F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long") % 2 == 0),
    )
    return (
        judged.groupBy(F.lit("by_topic").alias("scope"), F.col("lang").alias("topic"))
        .agg(
            F.round(F.avg(F.col("correct").cast("double")), 4).alias("correctness"),
            F.count(F.lit(1)).alias("n"),
        )
        .unionByName(
            judged.groupBy(F.lit("overall").alias("scope"), F.lit("all").alias("topic")).agg(
                F.round(F.avg(F.col("correct").cast("double")), 4).alias("correctness"),
                F.count(F.lit(1)).alias("n"),
            )
        )
    )


def evaluation_failures(t: dict[str, DataFrame]) -> DataFrame:
    """A9: failures filter (testbed.py:346 `report.failures`) — rows the
    deterministic judge marked incorrect."""
    docs = t["documents"]
    return (
        docs.withColumn(
            "correct",
            (F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long") % 2 == 0),
        )
        .filter(~F.col("correct"))
        .select("doc_id", "lang", "source")
    )


def token_usage_fold(t: dict[str, DataFrame]) -> DataFrame:
    """A10: token-usage fold (runtime/common.py:150-160 sums prompt/completion
    tokens across calls) — whitespace token counts summed per source."""
    docs = t["documents"]
    tokens = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return (
        docs.groupBy("source")
        .agg(
            F.sum(tokens.cast("long")).alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

def anti_join_new_rows(t: dict[str, DataFrame]) -> DataFrame:
    """J2: the vector-store merge anti-join — INSERT only ids not already in
    the target (embed/vector_store.py:250-257 `WHERE NOT EXISTS`).
    Mapped: customers with no *finished* orders — the "new rows" not yet in
    the target. Broadcast-able build side at dim scale; at fact scale AQE
    picks shuffled hash anti-join.
    """
    cust, orders = t["customer"], t["orders"]
    finished = orders.filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(finished, cust.c_custkey == finished.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


def semi_join_existing(t: dict[str, DataFrame]) -> DataFrame:
    """J8: existence probe (database/settings.py:263-274 `SELECT 1 ... WHERE
    client=:c`) as a semi-join: customers having ≥1 urgent order."""
    cust, orders = t["customer"], t["orders"]
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


def multiway_left_join(t: dict[str, DataFrame]) -> DataFrame:
    """J5: the demo's driver-profile multi-way join with LEFT JOIN keeping
    zero-activity rows (schema.sql:685-690). region⋈nation broadcast;
    customer LEFT-joined so nations with no customers survive."""
    region, nation, cust = t["region"], t["nation"], t["customer"]
    return (
        F.broadcast(region)
        .join(nation, region.r_regionkey == nation.n_regionkey)
        .join(cust, nation.n_nationkey == cust.c_nationkey, "left")
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count("c_custkey").alias("n_customers"),
            F.round(F.coalesce(F.sum("c_acctbal"), F.lit(0.0)), 2).alias("total_acctbal"),
        )
    )


def cascade_delete_survivors(t: dict[str, DataFrame]) -> DataFrame:
    """J7: FK-cascade delete (database/objects.py:69-84 ON DELETE CASCADE
    testsets→qa) as a join rewrite: delete non-'F' orders, lineitems survive
    only via semi-join on surviving parents."""
    orders, li = t["orders"], t["lineitem"]
    surviving_orders = orders.filter(F.col("o_orderstatus") == "F")
    survivors = li.join(
        surviving_orders, li.l_orderkey == surviving_orders.o_orderkey, "left_semi"
    )
    return survivors.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("surviving_lines"),
        F.round(F.sum("l_quantity"), 2).alias("surviving_qty"),
    )


def composite_key_join(t: dict[str, DataFrame]) -> DataFrame:
    """J5 composite-key flavor (schema.sql:711-719 joins performance_metrics
    ON (driver_id, race_id)): lineitem⋈(part,supplier) on the composite
    (l_partkey,l_suppkey) via a pre-joined dim — per (brand, supplier-nation)
    revenue."""
    li, part, supp = t["lineitem"], t["part"], t["supplier"]
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("p_brand").alias("brand"), F.col("s_nationkey").alias("supp_nation"))
        .agg(F.round(F.sum(revenue_expr()), 2).alias("revenue"), F.count(F.lit(1)).alias("n_lines"))
    )


def view_on_view_standings(t: dict[str, DataFrame], spark=None) -> DataFrame:
    """J6: view-on-view composition (schema.sql:725-745 championship view
    joins two other views). Expressed as chained temp views consumed by
    spark.sql — Catalyst inlines them; no materialization boundary."""
    spark = spark or t["customer"].sparkSession
    t["customer"].createOrReplaceTempView("v_customer")
    t["orders"].createOrReplaceTempView("v_orders")
    t["nation"].createOrReplaceTempView("v_nation")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_cust_points AS
        SELECT o_custkey AS custkey, ROUND(SUM(o_totalprice), 2) AS points,
               COUNT(*) AS races
        FROM v_orders GROUP BY o_custkey
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_nation_standings AS
        SELECT c.c_nationkey AS nationkey,
               ROUND(SUM(p.points), 2) AS nation_points,
               SUM(p.races) AS nation_races,
               COUNT(*) AS n_scoring_customers
        FROM v_cust_points p JOIN v_customer c ON p.custkey = c.c_custkey
        GROUP BY c.c_nationkey
        """
    )
    return spark.sql(
        """
        SELECT n.n_name AS nation, s.nation_points, s.nation_races,
               s.n_scoring_customers
        FROM v_nation_standings s JOIN v_nation n ON s.nationkey = n.n_nationkey
        """
    )


# ---------------------------------------------------------------------------
# §2.5 windows / top-k, §2.6 set ops, §2.2 predicates
# ---------------------------------------------------------------------------

def global_topk(t: dict[str, DataFrame], k: int = 8) -> DataFrame:
    """W1: global sort + truncate to top_k (vs_retriever.py:361-365, default
    k=8 core/schemas.py:52). Catalyst plans orderBy+limit as
    TakeOrderedAndProject: per-partition heaps, no global sort."""
    return (
        t["orders"]
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
        .limit(k)
    )


def per_group_topk(t: dict[str, DataFrame], k: int = 5) -> DataFrame:
    """W2: per-query top-k (`FETCH FIRST k` per store search,
    vs_retriever.py:264): top-k customers by acctbal per nation via window
    row_number — one shuffle on the partition key, partition-local sort."""
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        t["customer"]
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("custkey"),
            F.round("c_acctbal", 2).alias("acctbal"),
            "rnk",
        )
    )


def keep_max_dedup(t: dict[str, DataFrame]) -> DataFrame:
    """W3/D2: dedup keeping the highest-scoring duplicate
    (vs_retriever.py:130-151 keeps max similarity_score per page_content).
    Mapped: per orderkey keep the line with max extendedprice (ties: lowest
    linenumber — the reference keeps the *first* seen on ties since it only
    replaces on strictly-greater score)."""
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber")
    )
    return (
        t["lineitem"]
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("best_price"),
        )
    )


def ranked_standings(t: dict[str, DataFrame]) -> DataFrame:
    """W6: championship ranking — rank() over aggregated standings
    (prompts.json: 'Sort by Final Total descending … name the champion')."""
    standings = team_standings(t)
    w = Window.orderBy(F.desc("total_points"), F.asc("team"))
    return standings.withColumn("rank", F.rank().over(w)).select(
        "rank", "team", "total_points", "num_drivers"
    )


def union_grant_targets(t: dict[str, DataFrame]) -> DataFrame:
    """U1/U3: UNION ALL of heterogeneous sources into one relation
    (deepsec/database.py:172-179 unions tables+views as grant targets)."""
    cust = t["customer"].select(
        F.lit("customer").alias("entity_type"),
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
    )
    supp = t["supplier"].select(
        F.lit("supplier").alias("entity_type"),
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
    )
    return cust.unionByName(supp)


def interval_staleness_filter(t: dict[str, DataFrame]) -> DataFrame:
    """P4/F7: timestamp-interval staleness predicate (embed/jobs.py:300-313
    `updated < SYSTIMESTAMP - NUMTODSINTERVAL(n,'SECOND')`). Anchored to a
    fixed cutoff for determinism: events in the trailing window, counted by
    type. The filter pushes down to the parquet scan (`PushedFilters`)."""
    ev = t["events"]
    cutoff = F.to_timestamp(F.lit("2024-01-25 00:00:00"))
    return (
        ev.filter(F.col("ts") >= cutoff)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_recent"),
            F.round(F.sum("value"), 4).alias("recent_value"),
        )
    )


def json_path_projection(t: dict[str, DataFrame]) -> DataFrame:
    """P2: JSON-path projection (`JSON_VALUE(metadata,'$.filename')`,
    embed/vector_store.py:388-396) — pure codegen, no UDF."""
    ev = t["events"]
    return ev.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k"),
        "event_type",
    ).filter(F.col("k") < 10)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salt: int = 8,
) -> DataFrame:
    """Skew-defeating equi-join: the fact side gets a deterministic salt
    (hash of the full row mod n_salt), the dim side is replicated once per
    salt value, and the join key becomes (key, salt) — a hot key's rows
    spread over n_salt reducers instead of one. Result is identical to the
    plain join; use when a handful of keys dominate and AQE's skew split
    (enabled in session.py) isn't available or granular enough.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salt))
    salted_fact = fact.withColumn("_salt", salt)
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return salted_fact.join(replicated_dim, [key, "_salt"]).drop("_salt")


def skewed_nation_rollup(t: dict[str, DataFrame]) -> DataFrame:
    """J-skew demo: orders ⋈ customer ⋈ nation via the salted join on the
    (naturally skewed) customer key, rolled up per nation — same result as
    the plain join, verified by the oracle."""
    orders, cust = t["orders"], t["customer"]
    dim = cust.select(F.col("c_custkey").alias("o_custkey"), "c_nationkey")
    joined = salted_join(orders, dim, "o_custkey")
    return (
        joined.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def local_supplier_volume(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q5 shape — the deepest NL2SQL join the demo corpus implies
    (schema.sql's standings views compose 3-4 relations; this is the 6-way
    generalization): revenue per nation where customer and supplier are
    co-national, customers restricted to one region, orders to one year.

    Plan shape at 100 TB: region/nation/supplier/customer are broadcast
    dims (region filter prunes nation before the fact join); the only
    fact-fact shuffle is orders⋈lineitem, and the date filter is pushed to
    the orders parquet scan so the shuffle carries one year, not the
    history. The co-national predicate rides the supplier join — no extra
    exchange.
    """
    region = t["region"].filter(F.col("r_name") == "ASIA")
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    nation = t["nation"].join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    )
    cust = t["customer"].join(
        F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
    )
    li, supp = t["lineitem"], t["supplier"]
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.round(F.sum(revenue_expr()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("nation"))
    )


def market_share(
    t: dict[str, DataFrame],
    part_type: str = "ECONOMY",
    region_name: str = "EUROPE",
    share_nation: str = "NATION_7",
) -> DataFrame:
    """TPC-H Q8 shape — national market share: of the revenue a region's
    customers spend on one part type, the fraction supplied from one
    nation, per order year. The canonical NL2SQL "share of X within Y over
    time" question (conditional-aggregation numerator over a multi-join).

    Plan shape at 100 TB: part (type-filtered), customer⋈nation⋈region,
    and supplier⋈nation are all broadcast dims; lineitem⋈orders is the one
    fact-fact shuffle, date-pruned at the orders scan. The share division
    happens after a tiny per-year aggregate."""
    nation, region = t["nation"], t["region"].filter(F.col("r_name") == region_name)
    cust_nation = nation.join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("cn_key"))
    cust = t["customer"].join(
        F.broadcast(cust_nation), F.col("c_nationkey") == F.col("cn_key")
    )
    supp = t["supplier"].join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    part = t["part"].filter(F.col("p_type") == part_type)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = t["lineitem"]
    vol = revenue_expr()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == share_nation, vol).otherwise(F.lit(0.0)))
                / F.sum(vol),
                4,
            ).alias("mkt_share"),
            F.round(F.sum(vol), 2).alias("total_volume"),
        )
        .orderBy("o_year")
    )


def parts_supplier_counts(t: dict[str, DataFrame], limit: int = 20) -> DataFrame:
    """TPC-H Q16 shape — supplier breadth per part segment, excluding a
    blocklisted supplier set (negative account balance stands in for the
    complaints filter): COUNT(DISTINCT) after an anti-join, the classic
    "how many distinct providers, ignoring known-bad ones" inventory
    question.

    Plan shape: the blocklist is tiny → broadcast anti-join on the fact;
    part is a broadcast dim; the count-distinct shuffles (brand, type,
    size, suppkey) pre-deduped pairs only. Total order makes LIMIT
    deterministic."""
    bad_suppliers = t["supplier"].filter(F.col("s_acctbal") < 0).select("s_suppkey")
    part = t["part"]
    li = t["lineitem"]
    return (
        li.join(F.broadcast(bad_suppliers), li.l_suppkey == bad_suppliers.s_suppkey, "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.desc("supplier_cnt"), F.asc("p_brand"), F.asc("p_type"), F.asc("p_size")
        )
        .limit(limit)
    )


def pivot_status_by_year(t: dict[str, DataFrame]) -> DataFrame:
    """Pivot (long → wide conditional aggregation): order totals per year,
    one column per order status — the declared-values form of the demo
    schema's CASE-WHEN pivots (schema.sql:680-682). Explicit value list
    keeps the schema static (no discovery pass) and the plan a single
    partial-aggregable groupBy."""
    orders = t["orders"]
    return (
        orders.groupBy(F.year("o_orderdate").alias("o_year"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.round(F.sum("o_totalprice"), 2))
        .select(
            "o_year",
            F.col("F").alias("total_f"),
            F.col("O").alias("total_o"),
            F.col("P").alias("total_p"),
        )
        .orderBy("o_year")
    )


def balance_distribution(t: dict[str, DataFrame]) -> DataFrame:
    """W-family completion: percent_rank + cume_dist + ntile over supplier
    account balances within nation — the relative-standing window trio.
    One shuffle on the partition key; all three functions share the sort."""
    w = Window.partitionBy("s_nationkey").orderBy(F.asc("s_acctbal"), F.asc("s_suppkey"))
    return t["supplier"].select(
        "s_suppkey",
        "s_nationkey",
        F.round(F.col("s_acctbal"), 2).alias("acctbal"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


def small_quantity_revenue(t: dict[str, DataFrame], brand: str = "Brand#5") -> DataFrame:
    """TPC-H Q17 shape — correlated scalar subquery as a derived-table join:
    revenue lost if small-quantity line items (below 20% of the part's own
    average order quantity) were not stocked. The reference's NL2SQL surface
    emits exactly this subquery-per-row pattern for "compared to its average"
    questions.

    Plan shape: the brand filter prunes part to a bounded dim → broadcast
    into lineitem; the per-part average is computed once over the pruned
    fact slice (group-by cardinality = parts in brand, tiny) and broadcast
    back. No correlated re-execution — the subquery is decorrelated into
    one partial-aggregable groupBy, the same rewrite Catalyst applies to
    scalar subqueries. Final result is a single global aggregate."""
    part = t["part"].filter(F.col("p_brand") == brand).select("p_partkey")
    li = t["lineitem"].join(
        F.broadcast(part), F.col("l_partkey") == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    caps = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(F.broadcast(caps), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


def large_volume_orders(
    t: dict[str, DataFrame], threshold: float = 300.0, limit: int = 100
) -> DataFrame:
    """TPC-H Q18 shape — HAVING-filtered aggregate as a semi-join driver:
    customers who placed orders whose total quantity exceeds `threshold`.
    The IN-(GROUP BY ... HAVING) subquery becomes an aggregate → filter →
    join pipeline.

    Plan shape: the HAVING filter runs map-side-combinable groupBy on the
    fact, then the surviving key set (99.9th-percentile tail → tiny at any
    scale, threshold scales with basket size not corpus size) broadcasts
    into orders; customer joins after the fact side has already collapsed
    to ~tail rows, so AQE picks a broadcast there too. Total order makes
    LIMIT deterministic."""
    li = t["lineitem"]
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > threshold)
    )
    orders = t["orders"]
    cust = t["customer"]
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.col("total_qty"),
        )
        .orderBy(F.desc("total_qty"), F.asc("o_orderkey"))
        .limit(limit)
    )


def idle_rich_customers(t: dict[str, DataFrame], since: str = "2001-01-01") -> DataFrame:
    """TPC-H Q22 shape — global scalar subquery + anti-join: customers whose
    balance beats the positive-balance average but who have placed no order
    since `since`, grouped by nation. Exercises the two decorrelations the
    NL2SQL path needs most: scalar-aggregate-as-broadcast-cross-join and
    NOT-EXISTS-as-left-anti.

    Plan shape: the scalar average is a 1-row DataFrame cross-joined in
    (broadcast, no shuffle); the anti-join right side is orders date-pruned
    at the scan and projected to o_custkey — at scale that's the one real
    shuffle, co-partitioned on the customer key; the final groupBy collapses
    to nation cardinality."""
    cust = t["customer"]
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    recent = t["orders"].filter(F.col("o_orderdate") >= since)
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def late_order_priority(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q4 shape — EXISTS with a cross-table range predicate: count
    orders per priority that have at least one line shipped more than 75
    days after the order date. The correlated EXISTS decorrelates to a
    left-semi join whose condition is equi (orderkey) + range (dates);
    Spark hash-joins on the equi part and applies the range residually —
    no nested loop, one co-partitioned shuffle at scale.
    """
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-07-01")))
    )
    li = t["lineitem"].select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 75 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_late_orders"))
        .orderBy("o_orderpriority")
    )


def returned_item_revenue(t: dict[str, DataFrame], k: int = 20) -> DataFrame:
    """TPC-H Q10 shape — the returned-item revenue ranking: customers by
    revenue lost to returned lines in one quarter. Four-relation join where
    every dimension broadcasts (customer after the date-pruned orders
    semi-reduce it, nation always); the single fact-fact shuffle is
    lineitem ⋈ orders on the order key; TakeOrderedAndProject caps the
    output."""
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    returned = t["lineitem"].filter(F.col("l_returnflag") == "R")
    cust = t["customer"]
    nation = t["nation"]
    return (
        returned.join(orders, returned.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        # DECIMAL sum: per-customer revenue sums are small enough to land on
        # 2-decimal rounding boundaries, where double association order
        # (Spark's partial aggregation vs the oracle's serial fold) flips the
        # last cent; summing exact decimals is order-free on both engines
        .agg(
            F.round(F.sum(revenue_expr().cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(k)
    )


def forecast_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q6 shape — the pure filter-pushdown aggregate: one year of
    discounted small-quantity lines folded to a single number. Every
    predicate reaches the parquet scan (PushedFilters), the aggregation is
    partial+final; nothing else moves. The simplest query where columnar
    pruning + pushdown decide the entire runtime at 100 TB."""
    li = t["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
            & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-01-01")))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "forecast_revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


def volume_shipping(
    t: dict[str, DataFrame],
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_7",
) -> DataFrame:
    """TPC-H Q7 shape — bilateral trade volume: revenue shipped between a
    supplier nation and a customer nation (both directions), per ship
    year. The NL2SQL "flow between X and Y over time" question over the
    reference's star schema (nl2sql prompt catalog, mcp/prompts).

    Plan shape at 100 TB: supplier⋈nation and customer⋈nation are
    broadcast dims; the only fact-fact shuffle is lineitem⋈orders on
    orderkey, with the shipdate window pushed to the lineitem scan. The
    (supp_nation, cust_nation) pair filter collapses the join output
    before the tiny 2×years aggregate."""
    nat = t["nation"].select("n_nationkey", "n_name")
    supp = (
        t["supplier"]
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(nation_a, nation_b))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        t["customer"]
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin(nation_a, nation_b))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    return (
        li.join(t["orders"].select("o_orderkey", "o_custkey"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.round(F.sum(revenue_expr().cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def profit_by_nation_year(t: dict[str, DataFrame], part_type: str = "STANDARD") -> DataFrame:
    """TPC-H Q9 shape — product-line profit by supplier nation and year.
    The schema has no partsupp/supplycost, so cost is modeled as
    retailprice-proportional (0.6 × p_retailprice × quantity): same join
    topology (part+supplier dims onto lineitem, orders for the year),
    different constant.

    Plan shape at 100 TB: part (type-filtered) and supplier⋈nation
    broadcast; lineitem⋈orders co-partitions on orderkey. Aggregate
    output is |nations|×|years| — tiny."""
    part = t["part"].filter(F.col("p_type") == part_type).select("p_partkey", "p_retailprice")
    supp = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"].select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    li = t["lineitem"]
    amount = revenue_expr() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(t["orders"].select("o_orderkey", "o_orderdate"),
              li.l_orderkey == F.col("o_orderkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(amount.cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("sum_profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


def customer_order_distribution(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q13 shape — customer distribution: how many customers placed
    exactly N qualifying orders (including N=0, which only an OUTER join
    can surface). The double aggregation (per-customer count, then
    histogram of counts) is the canonical "distribution of activity"
    report.

    Plan shape at 100 TB: orders (filtered) shuffles once on custkey for
    the left outer join + first aggregate; the second aggregate's input is
    |customers| rows collapsing to a handful of histogram buckets — free."""
    orders = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        t["customer"].select("c_custkey")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


def promo_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q14 shape — promotion effect: the percentage of one month's
    revenue attributable to PROMO-type parts. Conditional-aggregation
    numerator over a single broadcast join; the month window is pushed to
    the lineitem scan, so at 100 TB the query reads ~1/84 of the fact
    table and one small dim."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-09-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-10-01")))
    )
    part = t["part"].select("p_partkey", "p_type")
    rev = revenue_expr().cast("decimal(18,6)")
    zero = F.lit(0.0).cast("decimal(18,6)")
    return li.join(F.broadcast(part), li.l_partkey == part.p_partkey).agg(
        F.round(
            F.lit(100.0)
            * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast("double")
            / F.sum(rev).cast("double"),
            4,
        ).alias("promo_revenue_pct"),
        F.round(F.sum(rev), 2).cast("double").alias("total_revenue"),
    )


def top_supplier(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q15 shape — top supplier(s): the supplier(s) whose quarterly
    revenue equals the maximum quarterly revenue (view + scalar-subquery
    max; ties must all surface, which LIMIT 1 would get wrong). Spark
    form: aggregate once, max over the aggregate via a rank window on an
    empty partition — the aggregate is |suppliers| rows, so the
    unpartitioned window is a non-issue at any scale."""
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1996-04-01")))
    )
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(F.sum(revenue_expr().cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_revenue")
        )
    )
    w = Window.orderBy(F.col("total_revenue").desc())
    return (
        rev.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") == 1)
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


def small_quantity_loss(t: dict[str, DataFrame], brand: str = "Brand#5") -> DataFrame:
    """TPC-H Q17 shape — small-quantity revenue loss: for one brand's
    parts, revenue from lines whose quantity is below 50% of that part's
    average quantity, divided by 7 (the "weekly loss if we stopped taking
    small orders" number). The correlated scalar subquery decorrelates to
    a per-part average joined back.

    Plan shape at 100 TB: brand-filtered part is a broadcast dim, so the
    per-part average aggregates only that brand's lines (a semi-join-
    pruned scan), and the join back to lines is on the same pruned set —
    two passes over a small slice, no full-fact shuffle."""
    part = t["part"].filter(F.col("p_brand") == brand).select("p_partkey")
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice")
    brand_lines = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = brand_lines.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("half_avg_qty")
    )
    return (
        brand_lines.join(F.broadcast(avg_qty), F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast("double")
                / F.lit(7.0),
                2,
            ).alias("avg_yearly_loss"),
            F.count(F.lit(1)).alias("n_small_lines"),
        )
    )


def waiting_supplier(t: dict[str, DataFrame], late_days: int = 60, k: int = 20) -> DataFrame:
    """TPC-H Q21 shape — suppliers who kept orders waiting: in
    multi-supplier orders, the supplier who was the ONLY late shipper
    (shipped > `late_days` after the order date; the schema has no
    commit/receipt dates, so lateness is vs o_orderdate). The classic
    EXISTS + NOT-EXISTS pair decorrelates to one per-(order, supplier)
    aggregate + one per-order aggregate — no nested loops, no repeated
    scans of the fact table.

    At 100 TB the expensive exchange is the first one (lineitem⋈orders on
    orderkey); every later exchange keys already-aggregated rows — one row
    per (order, supplier), then per order — so the shuffled volume shrinks
    monotonically; output is |suppliers| rows."""
    li = t["lineitem"].join(
        t["orders"].select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    # persisted (r11, guide §2.4): per_os feeds TWO consumers (the
    # per-order rollup and the culprit filter-join) and the committed
    # before-plan shows NO ReusedExchange — lineitem⋈orders plus this
    # aggregate computed twice. The cached rows are (orderkey, suppkey,
    # was_late) digests — the narrow proxy, never lineitem payloads.
    per_os = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            (F.col("l_shipdate")
             > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")).cast("int")
        ).alias("was_late")
    ).transform(shared_persist)
    per_order = per_os.groupBy(F.col("l_orderkey").alias("g_orderkey")).agg(
        F.count(F.lit(1)).alias("n_supps"),
        F.sum("was_late").alias("n_late"),
    )
    culprit = (
        per_os.filter(F.col("was_late") == 1)
        .join(
            per_order.filter((F.col("n_supps") >= 2) & (F.col("n_late") == 1)),
            F.col("l_orderkey") == F.col("g_orderkey"),
        )
    )
    return (
        culprit.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(t["supplier"].select("s_suppkey", "s_name")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(k)
    )


def shipping_priority(t: dict[str, DataFrame], k: int = 10) -> DataFrame:
    """TPC-H Q3 shape (the last classic missing from the join corpus):
    unshipped-revenue shipping priority — BUILDING-segment customers'
    orders placed before a date, restricted to lines shipped after it,
    top-k orders by revenue. (o_orderpriority stands in for the schema's
    absent o_shippriority.)

    Plan shape at 100 TB: the segment-filtered customer dim broadcasts
    into date-pruned orders (both predicates reach their scans), that
    result broadcasts into the date-pruned lineitem scan at fixture scale
    (co-partitioned SMJ at real scale), and the top-k fuses into
    TakeOrderedAndProject. DECIMAL revenue sums keep the ranking
    order-free across engines."""
    cutoff = F.to_timestamp(F.lit("1995-03-15"))
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < cutoff).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = t["lineitem"].filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(
            F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(revenue_expr().cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(k)
    )


def disjunctive_part_revenue(t: dict[str, DataFrame]) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR of predicate bundles, each
    tying part attributes (brand, size) to line attributes (quantity) —
    the classic disjunctive-pushdown stressor. Adapted to this schema's
    part columns (no container attribute).

    Plan shape: part prunes to the union of the three brand/size ranges
    at the scan (the OR's part-only conjuncts ARE pushable), the pruned
    dim broadcasts, and the mixed part×line conjuncts evaluate post-join
    — one scan each side, no shuffle join, single global aggregate."""
    p = t["part"].select("p_partkey", "p_brand", "p_size")
    li = t["lineitem"].select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    joined = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    bundle = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 15)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(5, 25)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#5")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return joined.filter(bundle).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.round(F.sum(revenue_expr().cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("revenue"),
    )


def min_cost_supplier(
    t: dict[str, DataFrame],
    region: str = "EUROPE",
    size: int = 15,
    ptype: str = "PROMO",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q2 shape — min-cost supplier per part, the classic correlated
    scalar subquery decorrelated into a min-join: for each part of a
    size/type class, the region's supplier(s) offering the lowest unit
    price. This schema has no partsupp table, so lineitem is the
    part×supplier offer relation (offer cost = MIN(l_extendedprice /
    l_quantity) per pair) — the correlated `cost = (SELECT MIN ...)`
    becomes a per-part MIN aggregate joined back on equality, the
    decorrelation every planner applies to Q2.

    Plan shape at 100 TB: the part-class filter prunes the fact scan
    BEFORE the offer aggregate (broadcast semi-shape, predicate reaches
    the scan), the region-filtered supplier dim broadcasts, the per-part
    min table is class-sized and broadcasts back, and the top-k fuses
    into TakeOrderedAndProject. Cost values stay raw doubles end to end —
    identical IEEE arithmetic on both engines, no rounding tie risk."""
    parts = (
        t["part"]
        .filter((F.col("p_size") == size) & (F.col("p_type") == ptype))
        .select("p_partkey", "p_name")
    )
    sup = (
        t["supplier"]
        .join(
            F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    offers = (
        t["lineitem"]
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey", "p_name")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    # Barrier before branching (same reason as important_part_values):
    # `eligible` feeds BOTH the per-part min and the probe join, and
    # Catalyst plans DataFrame branches independently — without the pin
    # the class-pruned fact scan and offer aggregate execute twice. The
    # pinned rows are (part, supplier) pairs of one size/type class in one
    # region — class-sized, the bounded-model contract.
    eligible = offers.join(
        F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey")
    ).localCheckpoint(eager=False)
    best = eligible.groupBy("l_partkey").agg(F.min("cost").alias("min_cost"))
    return (
        eligible.join(
            F.broadcast(best.withColumnRenamed("l_partkey", "b_partkey")),
            (F.col("l_partkey") == F.col("b_partkey"))
            & (F.col("cost") == F.col("min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "nation",
            F.col("l_partkey").alias("p_partkey"),
            "p_name",
            "cost",
        )
        .orderBy(
            F.desc("s_acctbal"), F.asc("nation"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(k)
    )


def important_part_values(
    t: dict[str, DataFrame], nation: str = "NATION_7", threshold_inv: int = 5000
) -> DataFrame:
    """TPC-H Q11 shape — value concentration with a GLOBAL-threshold
    HAVING: parts whose total line value (through one nation's suppliers)
    exceeds 1/`threshold_inv` of that nation's total (TPC-H scales this
    fraction with SF; 1/5000 keeps the row set non-trivial at every
    fixture scale). The global scalar
    subquery becomes a 1-row broadcast; the threshold test runs as
    `part_sum * threshold_inv > total` over DECIMAL(18,6) partials —
    exact integer/decimal arithmetic, so the keep/cut decision is
    bit-identical across engines (a double comparison at the threshold
    would flap the row set). The grand total folds over the per-part sums
    (exact for decimals), and the per-part table is checkpointed before
    branching — Catalyst plans DataFrame branches independently, so
    without the barrier BOTH branches re-scan the fact (plan-tested);
    with it the fact is read once and the total is a fold over #parts
    pinned rows (part-dimension-sized, the same bounded-model contract as
    the centroid collects)."""
    scoped = (
        t["lineitem"]
        .join(
            F.broadcast(
                t["supplier"]
                .join(
                    F.broadcast(t["nation"].filter(F.col("n_name") == nation)),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
                .select("s_suppkey")
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "l_partkey", F.col("l_extendedprice").cast("decimal(18,6)").alias("v")
        )
    )
    per_part = (
        scoped.groupBy("l_partkey")
        .agg(F.sum("v").alias("pv"))
        .localCheckpoint(eager=False)
    )
    total = per_part.agg(F.sum("pv").alias("tv"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("pv") * threshold_inv > F.col("tv"))
        .select(
            "l_partkey",
            F.round(F.col("pv"), 2).cast("double").alias("part_value"),
        )
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )
