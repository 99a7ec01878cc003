"""Extended TPC-H-shaped relational queries (SURVEY.md §2.2, round 3).

Adapted from the public TPC-H specification to the driver testdata's
column subset (TESTDATA.md): there is no partsupp table and lineitem
lacks shipmode/commitdate/receiptdate, so several queries substitute
equivalent-shaped predicates — Q9/Q12/Q16 (profit = discounted
revenue without supply cost; Q12 classifies by order priority instead
of ship mode; Q16 counts suppliers from lineitem instead of partsupp),
Q2/Q11/Q20 (unit price / line value from lineitem stands in for
partsupp supplycost/availqty), and Q4/Q21 (lateness = shipped more
than 60 days after the order date, instead of receipt past commit;
Q22 groups by nation instead of the missing phone country code). All
22 queries are adapted here or in queries/relational.py (Q1/Q3/Q5/
Q14/Q19 live there); queries/subqueries.py additionally keeps the
MINIMAL single-subquery demos of the Q4/Q17/Q18/Q22 shapes
(subq_exists_priority / subq_scalar_avg_qty / subq_in_heavy_orders /
subq_global_avg_anti) so each decorrelation pattern is testable in
isolation from the full-query join trees.

Scale stance (same as queries/relational.py): joins to world-bounded
dims (nation/region) may hint F.broadcast; joins to sf-proportional
tables (customer/supplier/part) stay unhinted so AQE picks
broadcast-vs-shuffle from runtime sizes; fact-fact joins shuffle once
on the join key. Scalar subqueries decorrelate to broadcast 1-row
cross joins, never to unbounded single-partition windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hdfs_parquet_importer_spark.queries import register
from hdfs_parquet_importer_spark.tables import load_table


# --------------------------------------------------------------------------
# Q6: single-table filter + global agg. The three predicates all push
# into the parquet scan (PushedFilters); the aggregate is a partial +
# final sum moving 8 bytes per partition. The cheapest possible shape
# at any scale.
# --------------------------------------------------------------------------
@register(
    "q6_forecast_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6: forecast revenue change (pure scan-side filters + "
    "global sum; zero shuffle beyond the 1-row partials).",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between two nations. nation is joined twice
# (supplier side and customer side) — both broadcast (world-bounded);
# the two IN-filters prune to 2 nations before the join, and the
# cross-pair predicate applies post-join. Facts shuffle once on
# orderkey.
# --------------------------------------------------------------------------
@register(
    "q7_volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier, lineitem, orders, customer, nation n1, nation n2
  WHERE s_suppkey = l_suppkey
    AND o_orderkey = l_orderkey
    AND c_custkey = o_custkey
    AND s_nationkey = n1.n_nationkey
    AND c_nationkey = n2.n_nationkey
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7: bilateral trade volume by year; nation joined twice "
    "(both broadcast), symmetric pair predicate post-join.",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    pair = ("NATION_1", "NATION_2")
    nation = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*pair))
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    return (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8: national market share inside one region for one part type.
# Conditional-sum ratio per year. part is filtered on p_type before
# the join (pushdown) and stays unhinted; the ASIA region restriction
# reaches customers through two broadcast dim hops.
# --------------------------------------------------------------------------
@register(
    "q8_market_share",
    oracle="""
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM part, lineitem, orders, customer, supplier, nation n1, nation n2, region
  WHERE p_partkey = l_partkey
    AND l_orderkey = o_orderkey
    AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey
    AND n1.n_regionkey = r_regionkey
    AND r_name = 'ASIA'
    AND l_suppkey = s_suppkey
    AND s_nationkey = n2.n_nationkey
    AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
    doc="TPC-H Q8: NATION_3's share of ECONOMY-part revenue sold into "
    "ASIA, by order year (conditional-aggregate ratio). r11 restores "
    "the spec's o_orderdate BETWEEN 1995-01-01 AND 1996-12-31 "
    "restriction, previously dropped without documentation — it "
    "pushes into the orders scan and cuts the joined lineitem volume "
    "~3.5x at every sf.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").between("1995-01-01", "1996-12-31")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(region), F.col("c_rkey") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(0.0))
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 (adapted): product-line profit by supplier nation and year. The
# reference spec subtracts ps_supplycost * l_quantity; testdata has no
# partsupp, so profit degrades to discounted revenue — the join/agg
# shape (part name LIKE filter, 4-way join, two-level group) is
# preserved, which is what exercises the planner.
#
# Float hardening: the naive ROUND(SUM(price*(1-disc)), 2) landed on a
# .xx5 boundary at sf0.01 and rounded differently per engine
# (accumulation order). Prices are exact cents and discounts exact
# percents in the testdata, so the sum is computed in exact integer
# cent-percent units (bigint) and divided once at the end — both
# engines then round the identical double.
# --------------------------------------------------------------------------
@register(
    "q9_product_profit",
    oracle="""
SELECT nation, o_year,
       ROUND(CAST(SUM(volume_cp) AS BIGINT) / 10000.0, 2) AS profit
FROM (
  SELECT n_name AS nation,
         EXTRACT(year FROM o_orderdate) AS o_year,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS volume_cp
  FROM part, lineitem, orders, supplier, nation
  WHERE p_partkey = l_partkey
    AND l_suppkey = s_suppkey
    AND l_orderkey = o_orderkey
    AND s_nationkey = n_nationkey
    AND p_name LIKE '%widget%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""",
    doc="TPC-H Q9 adapted (no partsupp): widget-part discounted revenue "
    "by supplier nation and order year (exact cent-percent integer sum).",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    volume_cp = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.round(F.sum(volume_cp) / 10000.0, 2).alias("profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 customers by lost revenue in a
# quarter. Deterministic LIMIT: ties on rounded revenue break on
# c_custkey. customer joins unhinted (sf-proportional); nation
# broadcast.
# --------------------------------------------------------------------------
@register(
    "q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_returnflag = 'R'
  AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10: top-20 customers by returned-line revenue in "
    "1997Q4 (join + agg + deterministic top-k).",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q12 (adapted): the spec classifies lines by ship mode and commit/
# receipt lateness; testdata has neither, so the preserved shape is
# the orders-lineitem join with a conditional two-way count split by
# order priority, grouped by line status.
# --------------------------------------------------------------------------
@register(
    "q12_priority_shipping",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders, lineitem
WHERE o_orderkey = l_orderkey
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    doc="TPC-H Q12 adapted (no shipmode): high/low-priority line "
    "counts per line status for 1997 shipments.",
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# --------------------------------------------------------------------------
# Q13: distribution of customers by order count, including zero-order
# customers — the canonical left-outer-join-then-histogram. Two
# shuffles: custkey for the join-side count, then the tiny c_count
# histogram agg.
# --------------------------------------------------------------------------
@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13: customer order-count histogram via left outer "
    "join (COUNT(col) skips the NULLs from orderless customers).",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


# --------------------------------------------------------------------------
# Q15: top supplier(s) by quarterly revenue. The scalar max
# decorrelates to a broadcast 1-row cross join (the repo's standard
# pattern) — NOT an unbounded partitionBy() window, which would pull
# every supplier aggregate through one task at scale. Revenue
# accumulates in EXACT integer cent-percent units (the q9 hardening):
# r11 review found a supplier whose float revenue sum lands exactly on
# a round-half-cent tie, where ROUND-before-max depends on
# accumulation order — with exact bigint sums divided once at the end,
# both engines round the identical double and the max-equality (row
# MEMBERSHIP, not just a cell) can never diverge.
# --------------------------------------------------------------------------
@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
               / 10000.0, 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier, revenue
WHERE s_suppkey = supplier_no
  AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
    doc="TPC-H Q15: supplier(s) achieving max 1997Q1 revenue; scalar "
    "max via broadcast cross join.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    cent_pct = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("long")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(cent_pct) / 10000.0, 2).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    supp = load_table(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 (adapted): supplier diversity per part segment. The spec counts
# partsupp suppliers; without partsupp, lineitem supplies the
# (partkey, suppkey) pairs. COUNT(DISTINCT) over the joined pairs is
# a two-shuffle plan (expand on the group keys, then distinct-agg);
# part's NOT-brand + size-IN filters push into its scan.
# --------------------------------------------------------------------------
@register(
    "q16_supplier_cnt",
    oracle="""
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
    doc="TPC-H Q16 adapted (lineitem for partsupp): distinct supplier "
    "count per surviving (brand, type, size) segment.",
)
def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Brand#5 EXISTS in the testdata domain (Brand#1..25) so the
    # NOT-brand predicate genuinely excludes rows — the spec's
    # Brand#45 was out of domain and the filter was vacuous, proving
    # nothing about the != pushdown path (r11 review).
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# Q2 (adapted): min-cost supplier per part within one region. No
# partsupp table, so supplycost := the minimum observed unit price
# (l_extendedprice / l_quantity) per (part, supplier) from lineitem.
# The spec's correlated MIN subquery decorrelates to a per-part
# groupBy-min joined back on (partkey, cost) — one extra shuffle on
# partkey instead of a correlated probe per row, the standard
# scale-out rewrite. Double equality on the min is safe cross-engine:
# both sides compute the identical IEEE division from identical
# parquet doubles, and MIN is order-independent.
# --------------------------------------------------------------------------
@register(
    "q2_min_cost_supplier",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS supplycost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
       FLOOR(ps.supplycost * 10000) / 10000.0 AS supplycost
FROM part, ps, supplier, nation, region
WHERE p_partkey = ps.l_partkey
  AND s_suppkey = ps.l_suppkey
  AND p_size <= 10 AND p_type = 'ECONOMY'
  AND s_nationkey = n_nationkey
  AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND ps.supplycost = (
    SELECT MIN(ps2.supplycost)
    FROM ps ps2, supplier s2, nation n2, region r2
    WHERE ps2.l_partkey = p_partkey
      AND s2.s_suppkey = ps2.l_suppkey
      AND s2.s_nationkey = n2.n_nationkey
      AND n2.n_regionkey = r2.r_regionkey
      AND r2.r_name = 'ASIA')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
LIMIT 40
""",
    doc="TPC-H Q2 adapted (lineitem unit price for partsupp cost): "
    "cheapest ASIA supplier(s) per small ECONOMY part; correlated MIN "
    "decorrelated to groupBy-min + equi-join.",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") <= 10) & (F.col("p_type") == "ECONOMY")
    )
    # Pre-aggregate ONLY lineitem rows of qualifying parts (r11
    # review: ~3% survive at gate scale, so aggregating all of
    # lineitem first wasted a 32x-larger shuffle; legal because the
    # part filter is per-partkey, so min over the restricted rows
    # equals the spec's min). Catalyst cannot push the later part
    # join below the groupBy on its own — the left_semi does it.
    ps = (
        li.join(
            part.select("p_partkey"),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "supplycost"
            )
        )
    )
    # Region-restricted (part, supplier, cost) triples — shared by the
    # outer query AND the decorrelated min (same region predicate).
    ps_region = (
        ps.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    # Restrict to qualifying parts BEFORE computing per-part minima:
    # the part filter is per-partkey, so min over the restricted rows
    # equals the spec's min over all region suppliers of that part.
    candidates = ps_region.join(part, F.col("l_partkey") == F.col("p_partkey"))
    min_cost = candidates.groupBy(F.col("l_partkey").alias("__mc_pkey")).agg(
        F.min("supplycost").alias("__min_cost")
    )
    return (
        candidates.join(
            min_cost,
            (F.col("l_partkey") == F.col("__mc_pkey"))
            & (F.col("supplycost") == F.col("__min_cost")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            # FLOOR-scaled, not ROUND-ed: ROUND ties (x.xxxx5) resolve
            # differently across engines; floor of the identical double
            # is bit-deterministic.
            (F.floor(F.col("supplycost") * 10000) / 10000.0).alias("supplycost"),
            "s_suppkey",
        )
        # s_suppkey is a key of (part, supplier) candidate rows, so the
        # sort is a TOTAL order — the limit boundary never depends on
        # name uniqueness. The limit binds at sf0.01 (62 candidates),
        # so the boundary tie-break is actually exercised by the gate.
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey", "s_suppkey")
        .limit(40)
        .drop("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q11 (adapted): parts holding an outsized share of line value across
# a 3-nation supplier group — GROUP BY with HAVING against a scalar
# subquery (fraction of the grand total). Value is computed in exact
# integer cent-units (price cents x integral quantity) so the
# threshold comparison can never flip on cross-engine float
# accumulation order; the comparison itself stays in integers
# (val_cp * 1000 > total_cp  <=>  val_cp > 0.1% of total).
# --------------------------------------------------------------------------
@register(
    "q11_important_value",
    oracle="""
WITH v AS (
  SELECT l_partkey AS partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * CAST(ROUND(l_quantity) AS BIGINT)) AS val_cp
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
  GROUP BY l_partkey
)
SELECT partkey, ROUND(CAST(val_cp AS BIGINT) / 100.0, 2) AS value
FROM v
WHERE val_cp * 1000 > (SELECT SUM(val_cp) FROM v)
ORDER BY value DESC, partkey
""",
    doc="TPC-H Q11 adapted (line value for partsupp stock value): "
    "parts exceeding 0.1% of the 3-nation total; HAVING vs scalar "
    "subquery via broadcast 1-row cross join, exact integer cents.",
)
def q11_important_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    # ROUND before every double->bigint cast: Spark's cast truncates
    # while DuckDB's rounds-to-nearest, so an un-rounded cast only
    # agrees while the generator keeps quantities integral.
    val_cp = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        F.col("l_quantity")
    ).cast("long")
    v = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(val_cp).alias("val_cp"))
    )
    total = v.agg(F.sum("val_cp").alias("__total_cp"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("val_cp") * 1000 > F.col("__total_cp"))
        .select("partkey", F.round(F.col("val_cp") / 100.0, 2).alias("value"))
        .orderBy(F.desc("value"), "partkey")
    )


# --------------------------------------------------------------------------
# Q20 (adapted): suppliers who moved excess quantity of red parts in
# 1997 — the spec's nested IN chain (supplier IN (... part IN (...)
# with a correlated quantity threshold)) becomes a semi-join pipeline:
# part-filter semi-join -> (supplier, part) groupBy with integral-
# quantity HAVING -> left-semi into supplier. Each IN is a left_semi
# (no fan-out duplication, distinct for free); quantities are integral
# in the testdata so the HAVING sum is exact in bigint on both
# engines.
# --------------------------------------------------------------------------
@register(
    "q20_excess_quantity",
    oracle="""
SELECT s_name, s_acctbal, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > 40)
ORDER BY s_name
""",
    doc="TPC-H Q20 adapted (shipped quantity for availqty): suppliers "
    "shipping >40 units of any red part in 1997; nested INs as "
    "left-semi joins.",
)
def q20_excess_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    red_parts = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    heavy_supps = (
        li.join(red_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        # ROUND before the cast — see q11 note on truncate-vs-round.
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).alias("__qty"))
        .filter(F.col("__qty") > 40)
        .select("l_suppkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        supp.join(heavy_supps, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21 (adapted): suppliers who single-handedly delayed multi-supplier
# finalized orders. No commit/receipt dates, so "late" := shipped more
# than 60 days after the order date. The spec's EXISTS becomes a
# left_semi self-join on l_orderkey (with the <> supplier residual
# condition), the NOT EXISTS a left_anti against the late-line set —
# both shuffle once on the natural orderkey with bounded fan-in
# (lines per order is small and unskewed), so the shape survives any
# scale-up.
# --------------------------------------------------------------------------
@register(
    "q21_waiting_suppliers",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier, lineitem l1, orders
WHERE s_suppkey = l1.l_suppkey
  AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 25
""",
    doc="TPC-H Q21 adapted (ship-lag lateness): top-25 suppliers by "
    "count of finalized orders where theirs was the only late line; "
    "EXISTS/NOT-EXISTS as semi/anti self-joins on orderkey.",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    others = li.select(
        F.col("l_orderkey").alias("__o2_okey"), F.col("l_suppkey").alias("__o2_skey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("__o3_okey"), F.col("l_suppkey").alias("__o3_skey")
    )
    lone_late = (
        late.join(
            others,
            (F.col("l_orderkey") == F.col("__o2_okey"))
            & (F.col("l_suppkey") != F.col("__o2_skey")),
            "left_semi",
        ).join(
            late_others,
            (F.col("l_orderkey") == F.col("__o3_okey"))
            & (F.col("l_suppkey") != F.col("__o3_skey")),
            "left_anti",
        )
    )
    supp = load_table(spark, sf_dir, "supplier")
    return (
        lone_late.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )


# --------------------------------------------------------------------------
# Q4: order priority checking. The spec's correlated EXISTS (a line
# received past its commit date) becomes a left-semi join on orderkey
# against late lines (shipped >60 days after order date — the same
# lateness substitute as Q21). Semi join = each order counted once no
# matter how many late lines; the quarter filter pushes into the scan.
# --------------------------------------------------------------------------
@register(
    "q4_priority_check",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
    doc="TPC-H Q4 (order priority checking), full adaptation: orders "
    "of one quarter with at least one late line, counted by priority. "
    "EXISTS decorrelates to a left-semi equi-join on orderkey with "
    "the lateness predicate as a join-side filter — one shuffle, "
    "per-order dedup for free. Minimal shape demo: "
    "subq_exists_priority (queries/subqueries.py).",
)
def q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue. The spec's correlated scalar
# subquery (0.2 * avg quantity of THIS part) decorrelates into a
# per-part aggregate joined back on partkey — the standard rewrite;
# Catalyst plans both sides off one lineitem scan with the brand
# filter pushed through the part join.
# --------------------------------------------------------------------------
@register(
    "q17_small_qty_revenue",
    oracle="""
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem, part
WHERE p_partkey = l_partkey
  AND p_brand = 'Brand#23'
  AND l_quantity < (
    SELECT 0.2 * AVG(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = part.p_partkey)
""",
    doc="TPC-H Q17 (small-quantity-order revenue), full adaptation "
    "(no container column; the brand filter carries the selective "
    "role). Correlated scalar avg -> per-part groupBy joined back on "
    "partkey: the subquery becomes one partial-agg shuffle keyed the "
    "same as the main join, no per-row re-scan. Minimal shape demo: "
    "subq_scalar_avg_qty.",
)
def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    # Per-part averages over ONLY the brand's lineitem rows (r11
    # review: ~4% survive, so averaging all of lineitem wasted a
    # 27x-larger shuffle; avg is per-partkey, so the restriction is
    # value-neutral — Catalyst cannot infer it through the aggregate).
    avg_qty = (
        li.join(
            part.select("p_partkey"),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy(F.col("l_partkey").alias("__avg_pkey"))
        .agg((F.avg("l_quantity") * 0.2).alias("qty_cut"))
    )
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(avg_qty, F.col("l_partkey") == F.col("__avg_pkey"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# --------------------------------------------------------------------------
# Q18: large-volume customers. The HAVING subquery becomes a grouped
# aggregate semi-joined into orders; order totals then join customer.
# Top-100 with a (totalprice DESC, orderkey) total order so the limit
# boundary is deterministic — planned as TakeOrderedAndProject.
# --------------------------------------------------------------------------
@register(
    "q18_large_volume_customer",
    oracle="""
WITH big AS (
  SELECT l_orderkey, SUM(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice,
       ROUND(total_qty, 2) AS total_qty
FROM big JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
""",
    doc="TPC-H Q18 (large-volume customers), full adaptation: orders "
    "whose line quantities sum past the threshold, with customer "
    "names, top-100 by order value. The IN-over-HAVING subquery is "
    "the grouped aggregate itself joined on orderkey (no second scan "
    "of lineitem); timestamps cross the engine boundary as formatted "
    "strings per the registry contract. Minimal shape demo: "
    "subq_in_heavy_orders.",
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("__tq")).filter(
        F.col("__tq") > 250
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("__tq", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q22: global sales opportunity. Two subqueries, two scale shapes: the
# positive-balance average is an uncorrelated scalar (1-row broadcast
# cross join — never a window), and NOT EXISTS(orders) is a left-anti
# equi-join. Nation stands in for the spec's phone country code
# (broadcast, world-bounded).
# --------------------------------------------------------------------------
@register(
    "q22_sales_opportunity",
    oracle="""
WITH cutoff AS (
  SELECT AVG(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0)
SELECT n_name, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer, nation, cutoff
WHERE c_nationkey = n_nationkey
  AND c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY n_name ORDER BY n_name
""",
    doc="TPC-H Q22 (global sales opportunity), full adaptation: "
    "above-average-balance customers with no RECENT order (the "
    "spec's 'no orders for 7 years' lapsed-customer window, here "
    "2000+ on the 1995-2001 testdata), by nation (no phone column "
    "for the spec's country-code substring; nation is the same "
    "world-bounded grouping role). Scalar avg broadcasts as a 1-row "
    "cross join; NOT EXISTS is a left-anti join on custkey with the "
    "recency predicate pushed into the orders scan; nation "
    "broadcasts. Minimal shape demo: subq_global_avg_anti.",
)
def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    cutoff = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(cutoff))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("n_name")
    )
