"""Advanced warehouse analytics pack — the TPC-H query shapes not
covered by :mod:`bireme_spark.queries.tpch`: scalar subqueries,
correlated-average filters, NOT EXISTS anti-joins, nested semi-joins,
and outer-join histograms. These are the remaining Greenplum-served
query classes a bireme user runs over synced tables (reference keeps
the warehouse in sync — `ChangeLoader.java:205-330` — and the
warehouse answers these; here Spark does both).

Adapted to the test schema (no partsupp / shipmode / commitdate /
receiptdate / phone): each docstring states the adaptation. All
plans are declarative — scalar thresholds become broadcast one-row
joins (Catalyst folds them), correlated per-group averages become a
groupBy + broadcast join, NOT IN / NOT EXISTS become left-anti joins.

Scale notes (100 TB): every scalar-subquery threshold is a one-row
broadcast — no driver collect; every per-part average is computed in
the same shuffle that the main join already needs (partial agg
map-side); anti-joins run on the already-shuffled key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from bireme_spark.functions.money import disc_price, dsum, money
from bireme_spark.queries.tpch import DP_SQL, PRICE_SQL
from bireme_spark.sources.tables import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min-cost supplier per part (TPC-H Q2 shape; adapted: the
    part↔supplier relation comes from distinct lineitem pairs since
    the schema has no partsupp, and 'cost' is s_acctbal minimized).
    Correlated-min subquery → per-part min + re-join; nation/region
    broadcast-hinted, part/supplier by threshold/AQE."""
    p = _t(spark, sf_dir, "part").where((F.col("p_size") == 15) & (F.col("p_type") == "PROMO"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    l = _t(spark, sf_dir, "lineitem")
    ps = (
        l.select(F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey"))
        .distinct()
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .join(s, F.col("ps_suppkey") == s.s_suppkey)
        .join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = Window.partitionBy("ps_partkey")
    return (
        ps.withColumn("min_bal", F.min("s_acctbal").over(w))
        .where(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
SELECT s_acctbal, s_name, n_name, p_partkey, p_type
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem) ps
JOIN part     ON ps_partkey = p_partkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'PROMO' AND r_name = 'EUROPE'
  AND s_acctbal = (
    SELECT MIN(s2.s_acctbal)
    FROM (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem) ps2
    JOIN supplier s2 ON ps2.sk = s2.s_suppkey
    JOIN nation n2   ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2   ON n2.n_regionkey = r2.r_regionkey
    WHERE ps2.pk = ps_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8): NATION_1 supplier revenue
    share within AMERICA-region customers per order year. Conditional
    sum over a 7-way star join — nation/region broadcast-hinted,
    the SF-scaling dims by threshold/AQE; single fact shuffle on
    orderkey."""
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "STANDARD")
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = disc_price()
    nat = F.when(F.col("supp_nation") == "NATION_1", vol).otherwise(F.lit(0).cast("decimal(17,4)"))
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(broadcast(n1), c.c_nationkey == F.col("c_nk"))
        .join(broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(broadcast(n2), s.s_nationkey == F.col("s_nk"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (F.sum(nat).cast("double") / F.sum(vol).cast("double")).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                     ELSE CAST(0 AS DECIMAL(17,4)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year, {DP_SQL} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA' AND p_type = 'STANDARD'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (TPC-H Q11 shape; adapted:
    'stock value' per part = Σ extendedprice over NATION_3-supplied
    lineitems). Parts whose value exceeds 0.1% of the grand total —
    the scalar total joins back as a broadcast one-row DataFrame, not
    a driver collect, so the plan is fully distributed."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    l = _t(spark, sf_dir, "lineitem")
    supplied = l.join(s, l.l_suppkey == s.s_suppkey).join(
        broadcast(n), s.s_nationkey == n.n_nationkey
    )
    per_part = supplied.groupBy("l_partkey").agg(
        F.sum(money("l_extendedprice")).alias("pv")  # exact decimal
    )
    # Scale-relative threshold (TPC-H Q11 divides its fraction by SF
    # for the same reason): 2x the mean per-part value, so the result
    # set stays meaningful at every corpus size.
    total = per_part.agg(
        (F.sum("pv").cast("double") * F.lit(2.0) / F.count(F.lit(1))).alias("threshold")
    )
    return (
        per_part.join(broadcast(total))
        .where(F.col("pv").cast("double") > F.col("threshold"))
        .select("l_partkey", F.col("pv").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


Q11_SQL = f"""
SELECT l_partkey, CAST(SUM({PRICE_SQL}) AS DOUBLE) AS part_value
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
GROUP BY l_partkey
HAVING CAST(SUM({PRICE_SQL}) AS DOUBLE) > (
  SELECT CAST(SUM(pv) AS DOUBLE) * 2.0 / COUNT(*)
  FROM (SELECT CAST(SUM({PRICE_SQL}) AS DECIMAL(38,2)) AS pv
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey) t)
ORDER BY part_value DESC, l_partkey
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13): LEFT OUTER join
    customer→orders (keeping zero-order customers), per-customer
    count, then histogram of counts. Two shuffles by construction
    (custkey, then count) — the second is tiny."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer
      LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier by quarter revenue (TPC-H Q15): the MAX(revenue)
    scalar subquery becomes a broadcast one-row join against the same
    per-supplier aggregate — computed once, reused for both sides."""
    s = _t(spark, sf_dir, "supplier")
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(disc_price(), "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        rev.join(broadcast(mx), rev.total_revenue == F.col("max_revenue"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, CAST(SUM({DP_SQL}) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q16_part_supplier_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part/supplier relationship count (TPC-H Q16 shape): distinct
    supplier count per (brand, type, size), excluding one brand, one
    type prefix, and 'complained' suppliers (NOT IN → left-anti
    join; here: suppliers with negative acctbal)."""
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3") & (~F.col("p_type").startswith("SMALL"))
    )
    s_bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    l = _t(spark, sf_dir, "lineitem")
    ps = l.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    return (
        ps.join(s_bad, ps.ps_suppkey == s_bad.s_suppkey, "left_anti")
        .join(p, F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, CAST(COUNT(DISTINCT ps_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem) ps
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'SMALL%'
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17): lines with quantity
    below 20% of their part's average. The correlated per-part AVG is
    one extra aggregate on the fact table joined back on the same
    partkey the main join already shuffled on — the per-part average
    table is ~|part| rows (SF-scaling, so no forced broadcast; AQE
    broadcasts it while it fits)."""
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#2")
    l = _t(spark, sf_dir, "lineitem")
    lp = l.join(p, l.l_partkey == p.p_partkey)
    avg_q = lp.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        lp.join(avg_q, lp.l_partkey == F.col("ap_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )


Q17_SQL = f"""
SELECT CAST(SUM({PRICE_SQL}) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                    JOIN part p2 ON l2.l_partkey = p2.p_partkey
                    WHERE l2.l_partkey = lineitem.l_partkey AND p2.p_brand = 'Brand#2')
"""


def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 shape): suppliers in
    NATION_2 who supplied 'forest%'-named parts in excess quantity
    (year volume > 50) — nested semi-joins, innermost agg first."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").startswith("red"))
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    heavy = (
        l.join(p.select("p_partkey"), l.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(heavy, s.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, s_suppkey
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND s_suppkey IN (
    SELECT l_suppkey FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 50)
ORDER BY s_name
"""


def q21_late_sole_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept multi-supplier orders waiting (TPC-H Q21
    shape; adapted: 'late' = shipped >60 days after order date since
    the schema has no receipt/commit dates). EXISTS → semi-join on
    (orderkey, other-supplier), NOT EXISTS → anti-join on late other
    suppliers; both run on the orderkey shuffle already in flight."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l = _t(spark, sf_dir, "lineitem")
    lo = l.join(o, l.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    late = lo.where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    l1 = late.alias("l1")
    l2 = lo.alias("l2")
    l3 = late.alias("l3")
    cand = l1.join(
        l2,
        (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
        & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
        "left_semi",
    )
    sole = cand.join(
        l3,
        (cand.l_orderkey == F.col("l3.l_orderkey")) & (cand.l_suppkey != F.col("l3.l_suppkey")),
        "left_anti",
    )
    return (
        sole.join(s.join(broadcast(n), s.s_nationkey == n.n_nationkey),
                  sole.l_suppkey == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2 JOIN orders o2 ON l2.l_orderkey = o2.o_orderkey
              WHERE o2.o_orderstatus = 'F'
                AND l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
                  WHERE o3.o_orderstatus = 'F'
                    AND l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 shape; adapted: grouped by
    nation since the schema has no phone country code). Customers
    with above-average positive balance and no recent (1998+) orders
    — the average is a broadcast scalar, the NOT EXISTS a left-anti
    join on the distinct recent-customer set."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp")
    )
    avg_bal = c.where(F.col("c_acctbal") > 0).agg(
        (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    return (
        c.join(broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o.select("o_custkey").distinct(), c.c_custkey == F.col("o_custkey"), "left_anti")
        .join(broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(money("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


Q22_SQL = """
SELECT cntry, COUNT(*) AS numcust, CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM (SELECT n_name AS cntry, c_acctbal
      FROM customer JOIN nation ON c_nationkey = n_nationkey
      WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                         FROM customer WHERE c_acctbal > 0)
        AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1998-01-01')) t
GROUP BY cntry
ORDER BY cntry
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q8_market_share": q8_market_share,
    "q11_important_stock": q11_important_stock,
    "q13_customer_distribution": q13_customer_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q16_part_supplier_relation": q16_part_supplier_relation,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q20_potential_promotion": q20_potential_promotion,
    "q21_late_sole_supplier": q21_late_sole_supplier,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}

ORACLE = {
    "q2_min_cost_supplier": Q2_SQL,
    "q8_market_share": Q8_SQL,
    "q11_important_stock": Q11_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_part_supplier_relation": Q16_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q20_potential_promotion": Q20_SQL,
    "q21_late_sole_supplier": Q21_SQL,
    "q22_global_sales_opportunity": Q22_SQL,
}
