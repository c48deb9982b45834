"""Relational operator surface.

The reference's query capability is indirect: it materializes a normalized
schema (``/root/reference/sql/init.sql:1-19``) on which MySQL answers
arbitrary SQL — its one declared join path is the articles->bodies FK equi-
join (``sql/init.sql:17-18``). This module exposes the full relational
surface the new engine supports over the fixture tables: scans with pushed
filters, every join type, hash aggregation (incl. rollup/cube/grouping sets),
window functions, sorts/top-k, and set operations.

Scale notes (100 TB):
  * nation/region are broadcast (constant cardinality at any SF).
  * fact-fact joins (lineitem x orders) shuffle on the join key; AQE handles
    skew and converts to broadcast when a filtered side collapses.
  * top-k uses orderBy().limit(k) which Spark plans as TakeOrderedAndProject
    (per-partition heap + driver merge — no global sort).
  * per-group top-k uses a rank window, which shuffles once on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import load_table, register_views


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Scans / filters / projections
# ---------------------------------------------------------------------------


@query(
    "scan_filter_project",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity >= 45 AND l_returnflag = 'R'
    """,
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate + projection pushed into the parquet scan (check
    ``PushedFilters``/``ReadSchema`` in the formatted plan)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .where((F.col("l_quantity") >= 45) & (F.col("l_returnflag") == "R"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                    AS sum_qty,
           round(sum(l_extendedprice), 2)                               AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           round(avg(l_quantity), 4)                                    AS avg_qty,
           round(avg(l_extendedprice), 4)                               AS avg_price,
           round(avg(l_discount), 6)                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide hash aggregation with map-side partial agg."""
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "q6_revenue_forecast",
    """
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.04 AND 0.08
      AND l_quantity < 24
    """,
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: selective scan -> global agg; every predicate is
    parquet-pushable so the scan reads a fraction of the row groups."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.04, 0.08))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Joins — the reference's J1 FK equi-join generalized to every join type
# ---------------------------------------------------------------------------


@query(
    "q5_revenue_by_nation",
    """
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '2000-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC
    """,
)
def q5_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: 4-way join star query (TPC-H Q5 shape).

    lineitem x orders is the only fact-fact shuffle; nation/region are
    broadcast so the customer->nation->region path never shuffles the big
    side. Mirrors the reference's articles-join-bodies consumption pattern
    (``/root/reference/README.md:49-54``) at analytic scale.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    nat = F.broadcast(_t(spark, sf_dir, "nation"))
    reg = F.broadcast(_t(spark, sf_dir, "region").where(F.col("r_name").isin("ASIA", "EUROPE")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@query(
    "q3_top_orders_by_segment",
    """
    SELECT o_orderkey, o_orderdate,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
      AND l_shipdate  > TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderkey
    LIMIT 10
    """,
)
def q3_top_orders_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: join + agg + top-k (TakeOrderedAndProject, no global
    sort). Tie-broken on o_orderkey so the k-set is deterministic."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1999-01-01").cast("timestamp")
    )
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "join_inner_fk",
    """
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def join_inner_fk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's J1 FK equi-join pattern (articles.body -> bodies.id,
    ``/root/reference/sql/init.sql:17-18``) over orders -> customer."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@query(
    "join_left_outer",
    """
    SELECT c_custkey, count(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


@query(
    "join_full_outer",
    """
    SELECT coalesce(c.nk, s.nk) AS nationkey,
           coalesce(c.n_cust, 0) AS n_cust,
           coalesce(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) s
    ON c.nk = s.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        c.join(s, "nk", "full")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "join_left_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as a left-semi join: one shuffle, no row duplication."""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 400000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_left_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as a left-anti join: customers with no very-large order.
    (Every customer has SOME order in the fixture, so the unfiltered version
    would be a vacuous empty-vs-empty check.)"""
    cust = _t(spark, sf_dir, "customer")
    big = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 450000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_cross_dims",
    """
    SELECT a.r_name AS from_region, b.r_name AS to_region
    FROM region a CROSS JOIN region b
    WHERE a.r_regionkey <> b.r_regionkey
    """,
)
def join_cross_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join of bounded dims (broadcast nested loop; only sane when one
    side is tiny — never cross-join two fact tables)."""
    a = _t(spark, sf_dir, "region").select(F.col("r_name").alias("from_region"), "r_regionkey")
    b = _t(spark, sf_dir, "region").select(
        F.col("r_name").alias("to_region"), F.col("r_regionkey").alias("rk2")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .where(F.col("r_regionkey") != F.col("rk2"))
        .select("from_region", "to_region")
    )


@query(
    "join_theta_residual",
    """
    SELECT l_returnflag, count(*) AS n_late
    FROM lineitem JOIN orders
      ON l_orderkey = o_orderkey AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    GROUP BY l_returnflag
    """,
)
def join_theta_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key + theta residual: Catalyst keys the shuffle on the equi part
    and evaluates the inequality as a post-join residual — NOT a nested-loop
    join, so it scales like a plain FK join."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(
            orders,
            (li.l_orderkey == orders.o_orderkey)
            & (li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
        )
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_late"))
    )


# ---------------------------------------------------------------------------
# Aggregations (reference A5 [absent] — supplied from built-ins)
# ---------------------------------------------------------------------------


@query(
    "agg_count_distinct",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*) AS n_orders
    FROM orders GROUP BY o_orderstatus
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct: Spark expands to a two-phase aggregate."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "agg_approx_count_distinct",
    """
    -- the HLL++ estimate itself is implementation-defined, so the oracle
    -- checks the CONTRACT instead: Spark returns the exact counts plus
    -- booleans asserting the sketch landed within 5x the requested rsd
    -- (0.01 -> 5%); the oracle recomputes the exact counts and expects TRUE.
    SELECT count(DISTINCT l_orderkey)::BIGINT AS n_orders_exact,
           count(DISTINCT l_partkey)::BIGINT AS n_parts_exact,
           TRUE AS hll_orders_ok,
           TRUE AS hll_parts_ok
    FROM lineitem
    """,
)
def agg_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch distinct — the scale path: one pass, fixed memory, no
    shuffle explosion at 100 TB (vs exact distinct's expand + reshuffle).
    The estimate is implementation-defined, so the oracled surface is the
    accuracy contract: |approx - exact| / exact <= 5 * rsd. The exact counts
    ride along only to make the check (and the driver's value-hash) exact;
    the HLL aggregate still runs and is still what the booleans grade."""
    rsd = 0.01
    agg = _t(spark, sf_dir, "lineitem").agg(
        F.approx_count_distinct("l_orderkey", rsd).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd).alias("approx_parts"),
        F.countDistinct("l_orderkey").alias("n_orders_exact"),
        F.countDistinct("l_partkey").alias("n_parts_exact"),
    )
    tol = 5 * rsd

    def _ok(approx, exact):
        return (
            F.abs(F.col(approx) - F.col(exact)) <= F.col(exact) * F.lit(tol)
        ).alias("hll_" + approx.split("_")[1] + "_ok")

    return agg.select(
        "n_orders_exact",
        "n_parts_exact",
        _ok("approx_orders", "n_orders_exact"),
        _ok("approx_parts", "n_parts_exact"),
    )


@query(
    "agg_theta_sketch_distinct",
    """
    -- theta sketches store raw hashes until the nominal-entries threshold
    -- (lgk=20 -> 1M), so below it the estimate IS the exact distinct count
    -- and an exact SQL oracle exists (same trick as agg_approx_percentile)
    SELECT o_orderpriority,
           count(DISTINCT o_custkey)::BIGINT AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_theta_sketch_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datasketches theta-sketch distinct count (Spark 4 native) — unlike
    HLL, theta sketches support set operations (intersection/difference via
    `theta_union`/`theta_difference` of sketch blobs) and are the
    mergeable-sketch path for distinct counting across partitioned corpora:
    partial sketches merge associatively map-side, the corpus never
    reshuffles rows. Below the sketch's nominal capacity the estimate is
    EXACT, which is what makes this entry fully oracle-able; above it (real
    100 TB cardinalities) the same plan degrades gracefully to ~1.6% error
    at lgk=20."""
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.theta_sketch_estimate(
                F.theta_sketch_agg("o_custkey", F.lit(20))
            ).alias("n_customers")
        )
    )


@query(
    "agg_stats",
    """
    SELECT c_mktsegment,
           round(min(c_acctbal), 2) AS min_bal,
           round(max(c_acctbal), 2) AS max_bal,
           round(avg(c_acctbal), 4) AS avg_bal,
           round(stddev_samp(c_acctbal), 4) AS std_bal,
           count(*) AS n
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.round(F.stddev_samp("c_acctbal"), 4).alias("std_bal"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "agg_rollup",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


@query(
    "agg_cube",
    """
    SELECT o_orderstatus, o_orderpriority, count(*) AS n
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "agg_grouping_sets",
    """
    SELECT c_mktsegment, c_nationkey, round(sum(c_acctbal), 2) AS total_bal
    FROM customer
    GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_mktsegment, c_nationkey, round(sum(c_acctbal), 2) AS total_bal
        FROM customer
        GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
        """
    )


@query(
    "distinct_pairs",
    "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "having_filter",
    """
    SELECT o_custkey, count(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING count(*) >= 12
    """,
)
def having_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .where(F.col("n_orders") >= 12)
    )


# ---------------------------------------------------------------------------
# Window functions (reference §2.6 [absent] — supplied from built-ins)
# ---------------------------------------------------------------------------


@query(
    "window_topk_per_group",
    """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: one shuffle on the group key; at scale Spark inserts
    a WindowGroupLimit (partial top-k before the shuffle)."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "window_rank_dense",
    """
    SELECT c_mktsegment, c_custkey,
           rank()       OVER (PARTITION BY c_mktsegment ORDER BY round(c_acctbal, 2) DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY round(c_acctbal, 2) DESC) AS drnk
    FROM customer
    """,
)
def window_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(F.round("c_acctbal", 2).desc())
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
        )
    )


@query(
    "window_lag_lead",
    """
    SELECT user_id, event_id,
           lag(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
    )


@query(
    "window_running_sum",
    """
    SELECT user_id, event_id,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "events")
        .select("user_id", "event_id", F.round(F.sum("value").over(w), 2).alias("running_value"))
    )


@query(
    "window_range_frame",
    """
    SELECT o_orderkey, o_totalprice,
           count(*) OVER (ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS n_within_1k
    FROM orders
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based (RANGE) global frame, DISTRIBUTED. The naive
    ``Window.orderBy(price).rangeBetween(-1000, 0)`` has no partition key,
    so Spark funnels the entire table through one WindowExec task. Because
    the frame has a FIXED value width (1000), it spans at most two
    width-1000 value buckets: partition by ``floor(price/1000)``, and ship
    each row once more as a frame-only "carry" copy into the next bucket.
    Inside each bucket the same RANGE window sees every row of its frame
    exactly once (natives from this bucket + carries from the previous),
    then carries are dropped. One hash shuffle over 2N rows, width scales
    with the value range — no single-task stage at any size."""
    width = 1000
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = F.floor(F.col("o_totalprice") / width).cast("long")
    anchors = orders.withColumn("_b", b).withColumn("_anchor", F.lit(True))
    carries = orders.withColumn("_b", b + 1).withColumn("_anchor", F.lit(False))
    w = (
        Window.partitionBy("_b")
        .orderBy("o_totalprice")
        .rangeBetween(-width, Window.currentRow)
    )
    return (
        anchors.unionByName(carries)
        .withColumn("n_within_1k", F.count(F.lit(1)).over(w))
        .where(F.col("_anchor"))
        .select("o_orderkey", "o_totalprice", "n_within_1k")
    )


@query(
    "window_ntile_first_last",
    """
    SELECT c_custkey,
           ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS bal_quartile,
           first_value(c_custkey) OVER (PARTITION BY c_nationkey
                                        ORDER BY c_acctbal DESC, c_custkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS richest_in_nation
    FROM customer
    """,
)
def window_ntile_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The global quartile is a DISTRIBUTED exact ntile
    (``operators.ids.global_ntile``: range-partitioned rank + ANSI tile
    arithmetic) — ``ntile().over(Window.orderBy(...))`` would funnel the
    whole table through one WindowExec task. The per-nation first_value
    stays a (partitioned) window."""
    from wiki_mysql_spark.operators.ids import global_ntile

    w_nation = (
        Window.partitionBy("c_nationkey")
        .orderBy(F.col("c_acctbal").desc(), "c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_nationkey"
    )
    tiled = global_ntile(
        cust, ["c_acctbal", "c_custkey"], 4, tile_col="bal_quartile"
    )
    return tiled.select(
        "c_custkey",
        "bal_quartile",
        F.first("c_custkey").over(w_nation).alias("richest_in_nation"),
    )


# ---------------------------------------------------------------------------
# Sorts / limits / top-k (reference O1/O2)
# ---------------------------------------------------------------------------


@query(
    "sort_topk_global",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
    """,
)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k -> TakeOrderedAndProject: per-partition heaps, driver
    merge; never a full sort. (Reference O2 [absent].)"""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@query(
    "sort_multi_key",
    """
    SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber FROM lineitem
    WHERE l_quantity = 50
    ORDER BY l_returnflag, l_linestatus DESC, l_orderkey, l_linenumber
    """,
)
def sort_multi_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key range-partitioned sort (mixed asc/desc)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_quantity") == 50)
        .select("l_returnflag", "l_linestatus", "l_orderkey", "l_linenumber")
        .orderBy("l_returnflag", F.col("l_linestatus").desc(), "l_orderkey", "l_linenumber")
    )


@query("limit_scan", "SELECT count(*) AS n FROM (SELECT * FROM lineitem LIMIT 100)")
def limit_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's --limit early-stop (``/root/reference/dbfy.py:207-208``)
    as a plan-level LocalLimit pushed to the scan. Count wrapped so the
    oracle comparison is row-set stable (which 100 rows is nondeterministic)."""
    return _t(spark, sf_dir, "lineitem").limit(100).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Set operations (reference §2.6 [absent])
# ---------------------------------------------------------------------------


@query(
    "set_union_distinct",
    """
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey FROM supplier
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "set_intersect",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "set_except",
    """
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT DISTINCT via subtract (exceptAll would be multiset minus).
    The supplier side is filtered so both fixture SFs yield a non-empty
    difference — unfiltered, both sides cover all 25 nations and the check
    would be vacuous empty-vs-empty."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = (
        _t(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nationkey"))
    )
    return c.subtract(s)


# ---------------------------------------------------------------------------
# Subqueries & pivot
# ---------------------------------------------------------------------------


@query(
    "subquery_above_avg",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
    """,
)
def subquery_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery -> Catalyst plans it as a broadcast one-row join."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) * 1.8 FROM orders)
        """
    )


@query(
    "pivot_events_by_type",
    """
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click')    AS "click",
           count(*) FILTER (WHERE event_type = 'view')     AS "view",
           count(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
           count(*) FILTER (WHERE event_type = 'signup')   AS "signup",
           count(*) FILTER (WHERE event_type = 'error')    AS "error"
    FROM events GROUP BY user_id
    """,
)
def pivot_events_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (never let Spark scan for distinct
    pivot values at 100 TB — pass them)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase", "signup", "error"])
    )


# ---------------------------------------------------------------------------
# Advanced joins: as-of and range-band (SURVEY.md J3 [absent] — supplied)
# ---------------------------------------------------------------------------


@query(
    "join_asof_last_signup",
    """
    SELECT p.event_id, p.user_id, s.event_id AS signup_event_id, s.ts AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def join_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent
    prior-or-same signup. Implemented union-and-fill (one shuffle on
    (user, time) — not an inequality join); oracle is DuckDB's native
    ASOF JOIN."""
    from wiki_mysql_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        "ts",
        F.col("event_id").alias("signup_event_id"),
        F.col("ts").alias("signup_ts"),
    )
    return asof_join(
        purchases,
        signups,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["signup_event_id", "signup_ts"],
    ).select("event_id", "user_id", "signup_event_id", "signup_ts")


@query(
    "join_asof_forward_next_error",
    """
    SELECT p.event_id, p.user_id, e.event_id AS next_error_event_id,
           e.ts AS next_error_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts <= e.ts
    """,
)
def join_asof_forward_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each purchase matched to the user's next
    same-or-later error event — the post-event attribution shape. Same
    union-and-fill machinery as backward (one shuffle), frame reversed;
    oracle is DuckDB's native ASOF JOIN with the inequality flipped."""
    from wiki_mysql_spark.operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    errors = ev.where(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        F.col("event_id").alias("next_error_event_id"),
        F.col("ts").alias("next_error_ts"),
    )
    return asof_join(
        purchases,
        errors,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_values=["next_error_event_id", "next_error_ts"],
        direction="forward",
    ).select("event_id", "user_id", "next_error_event_id", "next_error_ts")


@query(
    "join_range_bands",
    """
    SELECT b.band_id, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
    FROM orders
    JOIN (SELECT unnest(range(5)) AS band_id) b
      ON o_totalprice >= b.band_id * 100000 AND o_totalprice < (b.band_id + 1) * 100000
    GROUP BY b.band_id
    """,
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range (non-equi) join against a broadcast band dimension — the
    sane physical shape for interval joins: broadcast-nested-loop over a
    tiny side, never fact x fact."""
    bands = F.broadcast(
        spark.range(5).select(F.col("id").alias("band_id"))
    )
    o = _t(spark, sf_dir, "orders")
    return (
        o.join(
            bands,
            (F.col("o_totalprice") >= F.col("band_id") * 100000)
            & (F.col("o_totalprice") < (F.col("band_id") + 1) * 100000),
        )
        .groupBy("band_id")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "unpivot_stats_long",
    """
    SELECT c_mktsegment, metric, round(val, 4) AS val
    FROM (
        SELECT c_mktsegment,
               round(avg(c_acctbal), 4) AS avg_bal,
               round(min(c_acctbal), 4) AS min_bal,
               round(max(c_acctbal), 4) AS max_bal
        FROM customer GROUP BY c_mktsegment
    ) UNPIVOT (val FOR metric IN (avg_bal, min_bal, max_bal))
    """,
)
def unpivot_stats_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (the inverse of pivot): wide per-segment stats to long
    (segment, metric, value) form."""
    wide = (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
            F.round(F.min("c_acctbal"), 4).alias("min_bal"),
            F.round(F.max("c_acctbal"), 4).alias("max_bal"),
        )
    )
    return wide.unpivot(
        "c_mktsegment", ["avg_bal", "min_bal", "max_bal"], "metric", "val"
    ).select("c_mktsegment", "metric", F.round("val", 4).alias("val"))


@query(
    "window_percent_cume",
    """
    SELECT o_orderkey,
           round(percent_rank() OVER (PARTITION BY o_orderpriority
                                      ORDER BY o_totalprice), 6) AS pct_rank,
           round(cume_dist() OVER (PARTITION BY o_orderpriority
                                   ORDER BY o_totalprice), 6) AS cume,
           ntile(10) OVER (PARTITION BY o_orderpriority
                           ORDER BY o_totalprice, o_orderkey) AS decile
    FROM orders
    """,
)
def window_percent_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions (percent_rank / cume_dist / ntile
    deciles). percent_rank and cume_dist are value-based, so ties agree
    across engines without a tiebreak; ntile is position-based and gets the
    unique-key tiebreak."""
    orders = load_table(spark, sf_dir, "orders")
    w_val = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    w_pos = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        F.round(F.percent_rank().over(w_val), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w_val), 6).alias("cume"),
        F.ntile(10).over(w_pos).cast("long").alias("decile"),
    )


_SET_OPS_ALL_SQL = """
    WITH a AS (SELECT c_nationkey AS k FROM customer),
         b AS (SELECT s_nationkey AS k FROM supplier)
    SELECT 'union_all' AS op, k, count(*) AS n
    FROM (SELECT k FROM a UNION ALL SELECT k FROM b) GROUP BY k
    UNION ALL
    SELECT 'intersect_all' AS op, k, count(*) AS n
    FROM (SELECT k FROM a INTERSECT ALL SELECT k FROM b) GROUP BY k
    UNION ALL
    SELECT 'except_all' AS op, k, count(*) AS n
    FROM (SELECT k FROM a EXCEPT ALL SELECT k FROM b) GROUP BY k
"""


@query("set_ops_all", _SET_OPS_ALL_SQL)
def set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) set-operation semantics — UNION ALL keeps
    duplicates, INTERSECT ALL keeps min(multiplicity), EXCEPT ALL
    subtracts multiplicities. DataFrame spelling: union / intersectAll /
    exceptAll; the per-op counts make multiplicity differences visible to
    the hash compare (a DISTINCT-semantics bug would change n, not just
    row presence)."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))

    def counted(df: DataFrame, op: str) -> DataFrame:
        return df.groupBy("k").agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(op).alias("op"), "k", "n"
        )

    return (
        counted(c.union(s), "union_all")
        .unionByName(counted(c.intersectAll(s), "intersect_all"))
        .unionByName(counted(c.exceptAll(s), "except_all"))
    )


_LATERAL_SQL = """
    SELECT n_name, t.c_custkey, t.c_name, t.c_acctbal
    FROM nation, LATERAL (
        SELECT c_custkey, c_name, c_acctbal
        FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
    ) t
"""


@query("join_lateral_topk", _LATERAL_SQL)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-2
    customers per nation) — the SQL-standard spelling of per-group top-k.
    The identical text runs on Spark (DomainJoin + windowed rewrite under
    the hood) and DuckDB; ties break on c_custkey so the selected set is
    deterministic."""
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


@query(
    "agg_corr_regr",
    """
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) + 0 AS corr_qty_price,
           round(covar_samp(l_quantity, l_discount), 6) + 0 AS covar_qty_disc,
           round(regr_slope(l_extendedprice, l_quantity), 6) + 0 AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 6) + 0 AS intercept,
           count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr_regr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: correlation, sample covariance, simple
    linear regression (slope/intercept), and a FILTERed count. All are
    single-pass co-moment aggregates that combine map-side; rounding at 6
    decimals absorbs the partial-aggregation summation-order noise."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        (F.round(F.corr("l_quantity", "l_extendedprice"), 6) + F.lit(0.0)).alias(
            "corr_qty_price"
        ),
        (F.round(F.covar_samp("l_quantity", "l_discount"), 6) + F.lit(0.0)).alias(
            "covar_qty_disc"
        ),
        (F.round(F.regr_slope("l_extendedprice", "l_quantity"), 6) + F.lit(0.0)).alias(
            "slope"
        ),
        (
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 6)
            + F.lit(0.0)
        ).alias("intercept"),
        F.count(F.when(F.col("l_discount") > 0.05, F.lit(1))).alias("n_discounted"),
    )


@query(
    "profile_histogram",
    """
    WITH s AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi
               FROM orders)
    SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / 20.0)), 19)
                AS BIGINT) AS bin,
           count(*) AS n,
           round(min(o_totalprice), 2) AS bin_lo,
           round(max(o_totalprice), 2) AS bin_hi
    FROM orders, s
    GROUP BY bin
    """,
)
def profile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width 20-bin histogram of order totals — the data-profiling
    primitive behind quality dashboards. The min/max bounds are a 1-row
    broadcast; binning is pure arithmetic on the scan (no second shuffle
    beyond the bin aggregate). Bin edges are computed by the identical
    IEEE expression on both engines, so boundary assignment is exact."""
    orders = _t(spark, sf_dir, "orders").select("o_totalprice")
    s = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    binned = orders.join(F.broadcast(s)).select(
        "o_totalprice",
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / 20.0)
            ),
            F.lit(19),
        )
        .cast("long")
        .alias("bin"),
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("o_totalprice"), 2).alias("bin_lo"),
        F.round(F.max("o_totalprice"), 2).alias("bin_hi"),
    )


@query(
    "agg_listagg_sorted",
    """
    SELECT c_nationkey AS nationkey,
           string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer WHERE c_acctbal > 9000
    GROUP BY c_nationkey
    """,
)
def agg_listagg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg with deterministic element order: collect_list
    is partition-order-dependent, so the list is array_sort'ed before
    joining — the only way a distributed string_agg can be reproducible.
    The filter keeps per-group lists small (collect_list materializes the
    group in executor memory; unbounded groups need a different design)."""
    return (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias(
                "names"
            )
        )
    )


@query(
    "window_nth_value",
    """
    SELECT o_orderkey, o_custkey, o_totalprice,
           nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_highest
    FROM orders
    """,
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over the whole partition (second-highest order total per
    customer, NULL for single-order customers) — completes the analytic
    window surface beyond first/last/lag/lead. Tie-broken by o_orderkey so
    the 2nd row is the same row on both engines."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.nth_value("o_totalprice", 2).over(w).alias("second_highest"),
    )


@query(
    "join_interval_points",
    """
    WITH iv AS (
        SELECT user_id, min(ts) AS lo, min(ts) + INTERVAL 2 HOUR AS hi
        FROM events GROUP BY user_id
    )
    SELECT e.user_id, e.event_id, iv.lo AS window_lo
    FROM events e JOIN iv
      ON e.user_id = iv.user_id AND e.ts >= iv.lo AND e.ts <= iv.hi
    """,
)
def join_interval_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-x-large interval-point range join, bin-and-join formulation
    (`operators/intervals.py`): each user's first-2-hours activity window
    joined to that user's events. Intervals explode into covered hour bins
    and the join is EQUI on (user, bin) with exact containment as a
    residual — never a cartesian/BNL (plan-asserted in test_plans.py); the
    oracle runs the naive inequality join, which DuckDB can afford at
    fixture scale."""
    from wiki_mysql_spark.operators.intervals import interval_point_join

    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    iv = (
        ev.groupBy("user_id")
        .agg(F.min("ts").alias("lo"))
        .withColumn("hi", F.col("lo") + F.expr("INTERVAL 2 HOUR"))
    )
    out = interval_point_join(
        ev, iv, key="user_id", time_col="ts", lo_col="lo", hi_col="hi",
        bin_seconds=3600,
    )
    return out.select("user_id", "event_id", F.col("lo").alias("window_lo"))


def _sql_layout_zorder() -> str:
    from wiki_mysql_spark.operators.layout import sql_morton

    z = sql_morton("o_custkey", "o_orderkey")
    return f"""
    -- keys are %-65536-reduced FIRST (same as the Spark side), so min/max
    -- and the ntile tie-break operate on identical values at any SF — at
    -- sf0.1 raw o_orderkey exceeds 65536 and unmodded aggregation diverges
    WITH keyed AS (
        SELECT o_custkey, o_orderkey, {z} AS zkey
        FROM (SELECT (o_custkey % 65536) AS o_custkey,
                     (o_orderkey % 65536) AS o_orderkey FROM orders)
    ),
    bucketed AS (
        SELECT o_custkey, o_orderkey,
               ntile(32) OVER (ORDER BY zkey, o_custkey, o_orderkey) AS bucket
        FROM keyed
    )
    SELECT bucket::INT AS bucket,
           count(*)::BIGINT AS n_rows,
           min(o_custkey) AS x_min, max(o_custkey) AS x_max,
           min(o_orderkey) AS y_min, max(o_orderkey) AS y_max
    FROM bucketed GROUP BY bucket
    """


@query("layout_zorder_stats", _sql_layout_zorder())
def layout_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering for multi-dimensional scan pruning
    (`operators/layout.py`): orders keyed by the bit-interleave of
    (custkey, orderkey), bucketed in Morton order, each bucket reporting
    its key rectangle — tight rectangles are what make min-max pruning
    work on BOTH columns at 100 TB. The write path uses
    ``repartitionByRange`` (one shuffle, same as any sort); this
    verification view uses exact ntile so the oracle can recompute the
    identical bucket assignment."""
    from wiki_mysql_spark.operators.layout import zorder_bucket_stats

    orders = _t(spark, sf_dir, "orders").select(
        (F.col("o_custkey") % 65536).alias("o_custkey"),
        (F.col("o_orderkey") % 65536).alias("o_orderkey"),
    )
    return zorder_bucket_stats(
        orders, "o_custkey", "o_orderkey", n_buckets=32
    ).select(
        "bucket", "n_rows", "x_min", "x_max", "y_min", "y_max"
    )


@query(
    "agg_hll_merge_partitions",
    """
    -- sketch MERGEABILITY contract: per-day Datasketches-HLL sketches of
    -- distinct users union into one estimate for the whole corpus. The
    -- sketch bytes are implementation-defined, so the oracle checks the
    -- exact per-day counts plus TRUE contract booleans: every per-day
    -- estimate within 5% of its exact count, and the UNION of the daily
    -- sketches within 5% of the exact overall distinct — the property
    -- that makes distinct-counting incremental at 100 TB (yesterday's
    -- sketch + today's partials, never a recount).
    SELECT d, n_exact,
           TRUE AS day_estimate_ok,
           TRUE AS merged_estimate_ok
    FROM (
        SELECT date_trunc('day', ts) AS d,
               count(DISTINCT user_id)::BIGINT AS n_exact
        FROM events GROUP BY 1
    )
    """,
)
def agg_hll_merge_partitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting (Apache DataSketches HLL via
    Spark's hll_sketch_agg / hll_union_agg): one sketch per event day,
    then a UNION of all daily sketches estimating the overall distinct —
    the re-aggregation property sketches exist for (rollup across
    partitions, days, or clusters without recounting). Exact counts ride
    along to make the hash exact; the oracled surface is the accuracy
    contract on every day AND on the merged union."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    merged = F.broadcast(
        daily.agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("merged_est")
        ).crossJoin(ev.agg(F.countDistinct("user_id").alias("total_exact")))
    )
    return (
        daily.crossJoin(merged)
        .select(
            "d",
            "n_exact",
            (
                F.abs(F.hll_sketch_estimate("sk") - F.col("n_exact"))
                <= F.col("n_exact") * 0.05
            ).alias("day_estimate_ok"),
            (
                F.abs(F.col("merged_est") - F.col("total_exact"))
                <= F.col("total_exact") * 0.05
            ).alias("merged_estimate_ok"),
        )
    )
