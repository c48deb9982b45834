"""TPC-H-adapted query shapes beyond the core set — chosen to exercise the
Catalyst rewrites a warehouse workload leans on: correlated EXISTS/IN ->
semi joins, scalar subqueries -> broadcast joins, conditional-aggregate
ratios, disjunctive predicate pushdown, HAVING-subquery pipelines, and
multi-fact star joins with derived (year) grouping. Adapted to the fixture
schema (no partsupp/shipmode/commitdate columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wiki_mysql_spark.queries.registry import query
from wiki_mysql_spark.sources.tables import load_table, register_views


@query(
    "q4_priority_with_late_item",
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_late_item(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS with a cross-table predicate —
    Catalyst rewrites it to a left-semi join with the residual condition."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
        GROUP BY o_orderpriority
        """
    )


@query(
    "q7_nation_volume",
    """
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           extract(year FROM l_shipdate)::INT AS ship_year,
           cast(sum(cast(round(l_extendedprice * (1 - l_discount) * 100)
                         AS BIGINT)) AS BIGINT) / 100.0 AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE sn.n_name IN ('NATION_1', 'NATION_2')
      AND cn.n_name IN ('NATION_3', 'NATION_4')
    GROUP BY 1, 2, 3
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two-fact star with the nation dim joined TWICE under
    different roles (both broadcast) and a derived year grouping."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    sn = F.broadcast(
        nat.where(F.col("n_name").isin("NATION_1", "NATION_2")).select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        )
    )
    cn = F.broadcast(
        nat.where(F.col("n_name").isin("NATION_3", "NATION_4")).select(
            F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
        )
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(sn, F.col("s_nationkey") == F.col("sn_key"))
        .join(cn, F.col("c_nationkey") == F.col("cn_key"))
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("ship_year")
        )
        .agg(
            # exact cents summed as BIGINT: order-independent, so Spark and
            # the oracle agree bit-for-bit even over sf1's ~6M-row groups
            # (a double sum differs in the last cent depending on add order)
            (F.sum(F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")) / 100.0).alias(
                "volume"
            )
        )
    )


@query(
    "q14_promo_revenue_ratio",
    """
    SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END)
                 / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio in one pass."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_pct")
        )
    )


@query(
    "q16_brand_supplier_count",
    """
    SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_size IN (5, 15, 25, 35, 45) AND p_brand <> 'Brand#3'
    GROUP BY p_brand, p_size
    """,
)
def q16_brand_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-agg over a filtered dim join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(
        F.col("p_size").isin(5, 15, 25, 35, 45) & (F.col("p_brand") != "Brand#3")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q18_large_volume_orders",
    """
    SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS o_totalprice,
           round(total_qty, 2) AS total_qty
    FROM orders JOIN (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 180
    ) big ON o_orderkey = big.l_orderkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate-HAVING subquery feeding a join + top-k."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .where(F.col("raw_qty") > 180)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select(
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("raw_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


@query(
    "q19_disjunctive_predicates",
    """
    SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity >= 15 AND l_quantity <= 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity >= 30 AND l_quantity <= 50)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive predicates across both
    join sides — Catalyst extracts the common-side filters for pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    b = F.col("p_brand")
    s = F.col("p_size")
    q = F.col("l_quantity")
    cond = (
        ((b == "Brand#1") & s.between(1, 15) & q.between(1, 20))
        | ((b == "Brand#2") & s.between(10, 30) & q.between(15, 35))
        | ((b == "Brand#3") & s.between(20, 50) & q.between(30, 50))
    )
    return j.where(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q22_idle_rich_customers",
    """
    SELECT c_mktsegment, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    GROUP BY c_mktsegment
    """,
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery + anti join in one query (anti side
    filtered so the result is non-empty at fixture SFs — every customer has
    some order, which would make the literal Q22 a vacuous check)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS n_cust, round(sum(c_acctbal), 2) AS total_bal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        GROUP BY c_mktsegment
        """
    )


@query(
    "q8_market_share",
    """
    WITH volumes AS (
        SELECT extract(year FROM o_orderdate)::INT AS order_year,
               sn.n_name AS supp_nation,
               l_extendedprice * (1 - l_discount) AS volume
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
    )
    SELECT order_year,
           round(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0 END)
                 / sum(volume), 6) AS mkt_share
    FROM volumes GROUP BY order_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of total volume per year —
    conditional-sum ratio over a multi-join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    vol = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.year("o_orderdate").alias("order_year"),
            F.col("n_name").alias("supp_nation"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    return vol.groupBy("order_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share")
    )


@query(
    "q9_profit_by_nation_year",
    """
    SELECT n_name AS nation, extract(year FROM l_shipdate)::INT AS o_year,
           cast(sum(cast(round((l_extendedprice * (1 - l_discount)
                                - 0.5 * p_retailprice * l_quantity) * 100)
                         AS BIGINT)) AS BIGINT) / 100.0 AS sum_profit
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, extract(year FROM l_shipdate)::INT
    """,
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year over a pattern-
    filtered part dim (no partsupp in the fixture, so supply cost is derived
    from p_retailprice). LIKE filter prunes the part side before the join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("l_shipdate").alias("o_year"))
        # cents-as-BIGINT sum: order-independent (see q7_nation_volume)
        .agg((F.sum(F.round(profit * 100).cast("bigint")) / 100.0).alias("sum_profit"))
    )


@query(
    "q10_returned_items",
    """
    SELECT c_custkey, c_name, round(revenue, 2) AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM (
        SELECT c_custkey, c_name, c_acctbal, n_name,
               sum(l_extendedprice * (1 - l_discount)) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name
    )
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: lost-revenue-per-customer star join with a fact-side
    flag filter and a top-k on the aggregate (TakeOrderedAndProject)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nat = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("raw_rev")
        )
        .orderBy(F.col("raw_rev").desc(), "c_custkey")
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round("raw_rev", 2).alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
    )


@query(
    "q12_priority_by_linestatus",
    """
    SELECT l_linestatus,
           sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional counts partitioned by a fact attribute
    (l_linestatus stands in for the fixture's missing l_shipmode)."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q13_order_count_distribution",
    """
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: two stacked aggregations over a left outer join with
    a join-side residual predicate — customers with zero qualifying orders
    must survive into the c_count = 0 bucket."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "5-LOW"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q15_top_supplier",
    """
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               sum(l_extendedprice * (1 - l_discount)) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, round(total_rev, 2) AS total_rev
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT max(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: an aggregated 'view' consumed twice — once for the
    scalar max, once for the equality probe. The revenue subplan is shared;
    Catalyst plans the scalar side as a broadcast."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   sum(l_extendedprice * (1 - l_discount)) AS total_rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, round(total_rev, 2) AS total_rev
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_rev = (SELECT max(total_rev) FROM revenue)
        """
    )


@query(
    "q17_small_quantity_revenue",
    """
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#1'
      AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                        FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average) —
    Catalyst de-correlates it into an aggregate + join. Quantities are
    integral doubles, so both engines' averages are bit-identical and the
    0.2·avg threshold compares identically."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.2 * avg(l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        """
    )


@query(
    "q21_waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the sole-blame pattern — a semi join (some other
    supplier in the order) AND an anti join (no other supplier was late) on
    the same fact table, late-ness derived from o_orderdate + 60 days (the
    fixture has no commit/receipt dates)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT s_name, count(*) AS numwait
        FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name
        """
    )


def _pseudo_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp stand-in derived from lineitem (the fixture schema has no
    partsupp table): per (part, supplier), the minimum observed unit price
    as supply cost and total shipped quantity as availability. min() over
    identical division results and sums of integral-double quantities are
    bit-identical across engines, so downstream oracles stay exact."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"),
        F.sum("l_quantity").alias("qty"),
    )


_SQL_PSEUDO_PARTSUPP = """
    SELECT l_partkey, l_suppkey,
           min(l_extendedprice / l_quantity) AS cost,
           sum(l_quantity) AS qty
    FROM lineitem GROUP BY l_partkey, l_suppkey
"""


@query(
    "q2_min_cost_supplier",
    f"""
    WITH ps AS ({_SQL_PSEUDO_PARTSUPP}),
    eur AS (
        SELECT s_suppkey, s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    ),
    ranked AS (
        SELECT p.p_partkey, p.p_brand, e.s_name, e.n_name, ps.cost,
               row_number() OVER (PARTITION BY p.p_partkey
                                  ORDER BY ps.cost, ps.l_suppkey) AS rk
        FROM ps JOIN eur e ON ps.l_suppkey = e.s_suppkey
                JOIN part p ON ps.l_partkey = p.p_partkey
        WHERE p.p_size >= 25
    )
    SELECT p_partkey, p_brand, s_name, n_name, round(cost, 4) AS min_cost
    FROM ranked WHERE rk = 1
    ORDER BY min_cost DESC, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest EUROPE supplier per large part. The
    per-part argmin is a partial-aggregatable min(struct(cost, tiebreak,
    payload)) — lexicographic struct-min combines map-side, so there is no
    per-part sort and the only shuffle on the big side is the aggregate on
    p_partkey (the oracle's row_number formulation is the semantic spec;
    this is the plan you'd actually want at scale). Dimension side
    (supplier x nation x region, filtered part) stays broadcast."""
    ps = _pseudo_partsupp(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    eur = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )
    part = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_size") >= 25)
        .select("p_partkey", "p_brand")
    )
    joined = ps.join(eur, ps.l_suppkey == eur.s_suppkey).join(
        part, ps.l_partkey == part.p_partkey
    )
    best = joined.groupBy("p_partkey", "p_brand").agg(
        F.min(F.struct("cost", "l_suppkey", "s_name", "n_name")).alias("m")
    )
    return (
        best.select(
            "p_partkey",
            "p_brand",
            F.col("m.s_name").alias("s_name"),
            F.col("m.n_name").alias("n_name"),
            F.round(F.col("m.cost"), 4).alias("min_cost"),
        )
        .orderBy(F.col("min_cost").desc(), "p_partkey")
        .limit(100)
    )


@query(
    "q11_important_parts",
    f"""
    WITH ps AS ({_SQL_PSEUDO_PARTSUPP}),
    g AS (
        SELECT l_partkey AS p_partkey, sum(cost * qty) AS val
        FROM ps JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_7'
        GROUP BY l_partkey
    )
    SELECT p_partkey, round(val, 2) AS part_value
    FROM g
    WHERE val > (SELECT sum(val) * 0.001 FROM g)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: value concentration — per-part inventory value for
    one nation's suppliers, kept only above a fraction of the nation total
    (HAVING against a scalar subquery over the same aggregate). The
    aggregate is computed once and consumed twice; the 1-row total joins
    back by broadcast, not a second scan."""
    ps = _pseudo_partsupp(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    nat_sup = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey).select(
        "s_suppkey"
    )
    g = (
        ps.join(nat_sup, ps.l_suppkey == nat_sup.s_suppkey)
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(F.sum(F.col("cost") * F.col("qty")).alias("val"))
    )
    total = g.agg((F.sum("val") * F.lit(0.001)).alias("thr"))
    return (
        g.join(F.broadcast(total))
        .where(F.col("val") > F.col("thr"))
        .select("p_partkey", F.round("val", 2).alias("part_value"))
    )


@query(
    "q20_excess_red_suppliers",
    """
    WITH excess AS (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
        GROUP BY l_suppkey
        HAVING sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                         AND l_shipdate <  TIMESTAMP '1997-01-01'
                        THEN l_quantity ELSE 0 END) > 0.2 * sum(l_quantity)
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name LIKE 'NATION_1%'
      AND s_suppkey IN (SELECT l_suppkey FROM excess)
    ORDER BY s_name
    """,
)
def q20_excess_red_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers whose 1996 shipments of red parts exceed a
    fraction of their all-time red-part volume (the fixture has no partsupp
    availability column, so "excess availability" becomes a window-share
    HAVING over the same fact). One scan, one shuffle: the in-window and
    all-time sums are a single conditional aggregate per supplier — not two
    grouped subqueries joined back. The part filter broadcasts; the final
    membership check is a left-semi join (IN-subquery rewrite)."""
    li = load_table(spark, sf_dir, "lineitem")
    red = (
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    in_window = (F.col("l_shipdate") >= "1996-01-01") & (
        F.col("l_shipdate") < "1997-01-01"
    )
    excess = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.when(in_window, F.col("l_quantity")).otherwise(0.0)).alias("w"),
            F.sum("l_quantity").alias("tot"),
        )
        .where(F.col("w") > 0.2 * F.col("tot"))
        .select("l_suppkey")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").where(F.col("n_name").like("NATION_1%"))
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(excess, sup.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# iterative graph workload: PageRank over the customer->supplier trade graph
# ---------------------------------------------------------------------------


def _pagerank_iter_cte(prev: str, cur: str) -> str:
    return f"""
    {cur} AS MATERIALIZED (
        SELECT n.node, round(0.15 + 0.85 * coalesce(c.s, 0.0), 9) AS rank
        FROM nodes n LEFT JOIN (
            SELECT e.dst, sum(r.rank / e.outdeg) AS s
            FROM e_deg e JOIN {prev} r ON r.node = e.src
            GROUP BY e.dst
        ) c ON c.dst = n.node
    )"""


@query(
    "graph_pagerank",
    f"""
    -- MATERIALIZED is load-bearing (the BPE-oracle lesson): edges is
    -- referenced by deg/e_deg/nodes and each rank round references its
    -- predecessor; inlined CTEs would re-evaluate the whole chain
    -- exponentially (measured 485s at sf1 on the dangling variant)
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    e_deg AS MATERIALIZED (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)),
    nodes AS MATERIALIZED (
        SELECT DISTINCT node FROM
        (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
    ),
    r0 AS (SELECT node, 1.0 AS rank FROM nodes),
    {_pagerank_iter_cte('r0', 'r1')},
    {_pagerank_iter_cte('r1', 'r2')},
    {_pagerank_iter_cte('r2', 'r3')}
    SELECT node, round(rank, 6) + 0 AS rank FROM r3
    """,
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration PageRank (3 rounds, d=0.85) over the directed
    customer->supplier trade graph derived from lineitem x orders — the
    canonical iterative-algorithm workload (`operators/graph.py:pagerank`:
    per round one edges-vs-ranks join + one partial-aggregated sum; edges
    checkpointed once, never re-shuffled). The DuckDB oracle replays the
    identical unrolled iterations; per-iteration rounding pins float
    determinism across engines."""
    from wiki_mysql_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    ranks = pagerank(edges, n_iters=3, damping=0.85, round_digits=9)
    return ranks.select(
        "node", (F.round("rank", 6) + F.lit(0.0)).alias("rank")
    )


def _pagerank_dangling_iter_cte(prev: str, cur: str) -> str:
    # same join-aggregate as the simple oracle plus the standard dangling
    # term: every node gains d * (sum of dangling ranks) / N per round.
    # Arithmetic is parenthesized to evaluate in the same order as the Spark
    # expression (base first, then the dangling term), so per-iteration
    # 9-digit rounding pins both engines to identical doubles.
    return f"""
    dang_{prev} AS MATERIALIZED (
        SELECT coalesce(sum(rank), 0.0) AS m FROM {prev}
        WHERE node NOT IN (SELECT src FROM deg)
    ),
    {cur} AS MATERIALIZED (
        SELECT n.node,
               round((0.15 + 0.85 * coalesce(c.s, 0.0))
                     + 0.85 * (SELECT m FROM dang_{prev})
                       / (SELECT cnt FROM ncnt), 9) AS rank
        FROM nodes n LEFT JOIN (
            SELECT e.dst, sum(r.rank / e.outdeg) AS s
            FROM e_deg e JOIN {prev} r ON r.node = e.src
            GROUP BY e.dst
        ) c ON c.dst = n.node
    )"""


@query(
    "graph_pagerank_dangling",
    f"""
    -- MATERIALIZED is load-bearing (the BPE-oracle lesson): edges is
    -- referenced by deg/e_deg/nodes and each rank round references its
    -- predecessor; inlined CTEs would re-evaluate the whole chain
    -- exponentially (measured 485s at sf1 on the dangling variant)
    WITH edges AS MATERIALIZED (
        SELECT DISTINCT 'c' || o_custkey AS src, 's' || l_suppkey AS dst
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    ),
    deg AS MATERIALIZED (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
    e_deg AS MATERIALIZED (SELECT e.src, e.dst, d.outdeg FROM edges e JOIN deg d USING (src)),
    nodes AS MATERIALIZED (
        SELECT DISTINCT node FROM
        (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
    ),
    ncnt AS MATERIALIZED (SELECT count(*)::DOUBLE AS cnt FROM nodes),
    r0 AS (SELECT node, 1.0 AS rank FROM nodes),
    {_pagerank_dangling_iter_cte('r0', 'r1')},
    {_pagerank_dangling_iter_cte('r1', 'r2')},
    {_pagerank_dangling_iter_cte('r2', 'r3')}
    SELECT node, round(rank, 6) + 0 AS rank FROM r3
    """,
)
def graph_pagerank_dangling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard-definition PageRank (dangling mass redistributed uniformly
    each round — what NetworkX/GraphFrames compute, up to normalization) over
    the customer->supplier trade graph. Suppliers have no outgoing edges, so
    at every iteration their entire rank mass is dangling — this entry
    exercises the redistribution term hard rather than incidentally. The
    DuckDB oracle replays the identical unrolled iterations including the
    per-round dangling scalar."""
    from wiki_mysql_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    ranks = pagerank(
        edges, n_iters=3, damping=0.85, round_digits=9, redistribute_dangling=True
    )
    return ranks.select(
        "node", (F.round("rank", 6) + F.lit(0.0)).alias("rank")
    )


@query(
    "graph_triangle_count",
    """
    -- co-supply graph: suppliers sharing an order; triangles counted on
    -- canonical (a < b) edges via the one-ordered-form 3-way join
    WITH pe AS (
        SELECT DISTINCT least(a.l_suppkey, b.l_suppkey) AS a,
                        greatest(a.l_suppkey, b.l_suppkey) AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_suppkey <> b.l_suppkey
    )
    SELECT
        (SELECT count(DISTINCT node) FROM
            (SELECT a AS node FROM pe UNION ALL SELECT b FROM pe))::BIGINT
            AS n_nodes,
        (SELECT count(*) FROM pe)::BIGINT AS n_edges,
        (SELECT count(*) FROM pe e1
           JOIN pe e2 ON e1.b = e2.a
           JOIN pe e3 ON e3.a = e1.a AND e3.b = e2.b)::BIGINT AS n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact triangle count over the supplier co-supply graph (suppliers
    sharing an order), via degree-ordered orientation
    (`operators/graph.py:triangle_count`): edges oriented low-(degree,id) →
    high, so hub nodes become wedge sinks instead of wedge centers and the
    wedge join is bounded by sum(out_deg^2) = O(m^1.5) on ANY degree
    distribution — the property that keeps this runnable at 100 TB where
    the naive shared-endpoint join explodes on skew. The oracle counts the
    same triangles with the canonical-edge 3-way join, which DuckDB can
    afford at fixture scale."""
    from wiki_mysql_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    a = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sa"))
    b = li.select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sb"))
    edges = (
        a.join(b, "ok")
        .where(F.col("sa") != F.col("sb"))
        .select(F.col("sa").alias("src"), F.col("sb").alias("dst"))
    )
    return triangle_count(edges)
