"""Relational extensions beyond plain GROUP BY: explicit GROUPING
SETS with grouping ids, and non-equi (range/banded) joins — the two
warehouse idioms not already covered by the rollup/cube and equi-join
queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bireme_spark.functions.money import disc_price, dsum, money
from bireme_spark.sources.tables import load_table


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts/value by GROUPING SETS ((year), (year, priority),
    ()) with an explicit grouping id to disambiguate aggregated-away
    NULLs from data NULLs. Single hash-aggregate pass (Spark Expand +
    one shuffle), same as rollup/cube."""
    o = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate").alias("order_year")
    p = F.col("o_orderpriority")
    return (
        o.select(y, p, "o_totalprice")
        .groupingSets(
            [["order_year"], ["order_year", "o_orderpriority"], []],
            "order_year",
            "o_orderpriority",
        )
        .agg(
            (
                F.grouping("order_year") * 2 + F.grouping("o_orderpriority")
            ).cast("int").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(money("o_totalprice"), "total_value"),
        )
        .orderBy(
            F.col("gid"),
            F.col("order_year").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


GROUPING_SETS_SQL = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, o_orderpriority,
       CAST(GROUPING(year(o_orderdate)) * 2 + GROUPING(o_orderpriority) AS INTEGER) AS gid,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM orders
GROUP BY GROUPING SETS ((year(o_orderdate)), (year(o_orderdate), o_orderpriority), ())
ORDER BY gid, order_year NULLS FIRST, o_orderpriority NULLS FIRST
"""


def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded (non-equi range) join: classify lineitems into quantity
    bands with lo < qty <= hi and aggregate revenue per band. The band
    table is tiny, so the right plan is a broadcast nested-loop join
    with the range predicate — the fact side streams through
    map-side, never shuffles on the band key; the only exchange is
    the final 4-group aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select("l_quantity", "l_extendedprice", "l_discount")
    bands = spark.createDataFrame(
        [(1, "low", 0.0, 10.0), (2, "mid", 10.0, 25.0), (3, "high", 25.0, 40.0), (4, "bulk", 40.0, 50.0)],
        "band_id int, band string, lo double, hi double",
    )
    disc = money("l_extendedprice") * (F.lit(1).cast("decimal(5,2)") - F.col("l_discount").cast("decimal(5,2)"))
    return (
        li.join(
            F.broadcast(bands),
            (F.col("l_quantity") > F.col("lo")) & (F.col("l_quantity") <= F.col("hi")),
        )
        .groupBy("band_id", "band")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(disc, "revenue"),
        )
        .orderBy("band_id")
    )


RANGE_BAND_JOIN_SQL = """
SELECT band_id, band, COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN (VALUES (1, 'low', 0.0, 10.0), (2, 'mid', 10.0, 25.0),
             (3, 'high', 25.0, 40.0), (4, 'bulk', 40.0, 50.0)) AS bands(band_id, band, lo, hi)
  ON l_quantity > lo AND l_quantity <= hi
GROUP BY 1, 2 ORDER BY 1
"""


QUERIES = {
    "grouping_sets_agg": grouping_sets_agg,
    "range_band_join": range_band_join,
}

ORACLE = {
    "grouping_sets_agg": GROUPING_SETS_SQL,
    "range_band_join": RANGE_BAND_JOIN_SQL,
}


_BASKET_MIN_SUPPORT = 2
_BASKET_TOPK = 50


def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-pair mining with lift over order baskets (the Apriori
    pair pass): parts co-purchased in the same order, scored by
    lift = N·c(a,b) / (n(a)·n(b)).

    Exactness: all counts are integers, so the lift numerator and
    denominator are exact and round(·, 6) is engine-identical; top-50
    ranks by (pair-count desc, part ids) — fully deterministic.

    Scale: the ONLY corpus-sized shuffle is on l_orderkey; the pair
    fan-out inside an order is bounded by basket size (≤ C(7,2) = 21
    in TPC-H, enforced ≤ C(basket,2) generally — never parts²). The
    per-part support table re-aggregates the same distinct frame, and
    the final selection is TakeOrdered. A hot part never explodes:
    pairs form per-basket, not per-part."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # ONE order-keyed exchange (r10 opt): the (ok, pk) distinct folds
    # into collect_set, and BOTH the u < v pair stream and the
    # per-part support explode map-side from the same checkpointed
    # basket arrays — replaces the former distinct + pair self-join
    # (the checkpointed frame is |orders|-sized, not |items|-sized,
    # and the sort-merge join on l_orderkey disappears outright).
    arrs = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("arr"))
        .localCheckpoint(eager=True)
    )
    pair_counts = (
        arrs.select(
            F.explode(
                F.expr(
                    "flatten(transform(arr, (x, i) ->"
                    " transform(slice(arr, i + 2, size(arr) - i - 1),"
                    " y -> struct(x AS pk_a, y AS pk_b))))"
                )
            ).alias("p")
        )
        .select("p.pk_a", "p.pk_b")
        .groupBy("pk_a", "pk_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .where(F.col("c_ab") >= _BASKET_MIN_SUPPORT)
    )
    support = (
        arrs.select(F.explode("arr").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    n_orders = load_table(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("N")
    )
    return (
        pair_counts.join(
            support.select(F.col("l_partkey").alias("pk_a"), F.col("n").alias("n_a")),
            "pk_a",
        )
        .join(
            support.select(F.col("l_partkey").alias("pk_b"), F.col("n").alias("n_b")),
            "pk_b",
        )
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pk_a",
            "pk_b",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                (F.col("N") * F.col("c_ab")).cast("double")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("c_ab").desc(), "pk_a", "pk_b")
        .limit(_BASKET_TOPK)
    )


MARKET_BASKET_SQL = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS pk_a, b.l_partkey AS pk_b, COUNT(*) AS c_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}
),
support AS (
  SELECT l_partkey, COUNT(*) AS n FROM items GROUP BY 1
),
tot AS (SELECT COUNT(*) AS N FROM orders)
SELECT p.pk_a, p.pk_b,
       CAST(p.c_ab AS BIGINT) AS c_ab,
       CAST(sa.n AS BIGINT) AS n_a,
       CAST(sb.n AS BIGINT) AS n_b,
       ROUND(CAST(tot.N * p.c_ab AS DOUBLE) / (sa.n * sb.n), 6) AS lift
FROM pairs p
JOIN support sa ON sa.l_partkey = p.pk_a
JOIN support sb ON sb.l_partkey = p.pk_b
CROSS JOIN tot
ORDER BY c_ab DESC, pk_a, pk_b
LIMIT {_BASKET_TOPK}
"""

QUERIES["market_basket_lift"] = market_basket_lift
ORACLE["market_basket_lift"] = MARKET_BASKET_SQL


def orders_open_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-sweep concurrency counting: how many orders are OPEN
    (placed but not yet fully shipped) on each day — the classic
    ±1 event sweep over [o_orderdate, max(l_shipdate)) intervals.
    Monthly sampling keeps the output readable: backlog level on the
    1st of each month.

    Scale shape: each interval emits two events map-side; ONE
    (day) hash agg collapses the corpus to a |days| net-change
    series; the cumulative sum then runs on series-sized data (a
    single-partition window over ~2500 rows — fine BECAUSE the
    aggregation happened first; the raw orders never see a global
    window). Pure integer math throughout.

    The completion date comes from lineitem (max ship date per order) —
    a PK-hash join sized by lineitem, the same shuffle cdc_apply
    uses."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("end_date")
    )
    # the interval frame is read twice by the ±1 event union and its
    # children again by bounds/daily: checkpoint the two-date-column
    # frame so orders+lineitem collapse once (plan audit: 4+4 scans;
    # A/B at sf0.1 0.93 vs 1.20s)
    iv = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        F.col("o_orderdate").alias("start_date"), "end_date"
    ).localCheckpoint(eager=True)
    events = iv.select(
        F.col("start_date").alias("day"), F.lit(1).alias("delta")
    ).unionByName(iv.select(F.col("end_date").alias("day"), F.lit(-1).alias("delta")))
    # dense month-first grid with net=0: a month whose 1st has no
    # order event still gets its carried-forward backlog row (the
    # sparse series alone would silently drop that month)
    bounds = events.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = bounds.select(
        F.explode(
            F.expr("sequence(trunc(d0, 'MM'), d1, interval 1 month)")
        ).alias("day"),
        F.col("d0"),
    ).where(F.col("day") >= F.col("d0"))
    daily = (
        events.unionByName(grid.select("day", F.lit(0).alias("delta")))
        .groupBy("day")
        .agg(F.sum("delta").alias("net"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    swept = daily.withColumn("backlog", F.sum("net").over(w))
    return (
        swept.where(F.dayofmonth("day") == 1)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("backlog").cast("bigint").alias("open_orders"),
        )
        .orderBy("day")
    )


ORDERS_BACKLOG_SQL = """
WITH iv AS (
  SELECT o.o_orderdate AS start_date, l.end_date
  FROM orders o
  JOIN (SELECT l_orderkey, MAX(l_shipdate) AS end_date
        FROM lineitem GROUP BY 1) l
    ON l.l_orderkey = o.o_orderkey
),
events AS (
  SELECT start_date AS day, 1 AS delta FROM iv
  UNION ALL
  SELECT end_date AS day, -1 AS delta FROM iv
),
bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM events),
grid AS (
  SELECT CAST(unnest(generate_series(date_trunc('month', d0), d1,
                                     INTERVAL 1 MONTH)) AS DATE) AS day, d0
  FROM bounds
),
all_events AS (
  SELECT day, delta FROM events
  UNION ALL
  SELECT day, 0 AS delta FROM grid WHERE day >= d0
),
daily AS (SELECT day, SUM(delta) AS net FROM all_events GROUP BY 1),
swept AS (
  SELECT day, SUM(net) OVER (ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS backlog
  FROM daily
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(backlog AS BIGINT) AS open_orders
FROM swept
WHERE dayofmonth(day) = 1
ORDER BY day
"""

QUERIES["orders_open_backlog"] = orders_open_backlog
ORACLE["orders_open_backlog"] = ORDERS_BACKLOG_SQL


_SEARCH_TERMS = ("red", "widget")


def parts_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-text AND-search over part names via an inverted postings
    index — the token-postings plan, not a LIKE scan: explode names
    into (token, partkey) postings, probe the query terms, and a part
    matches when its distinct-hit count equals the number of query
    terms (postings-list intersection as ONE hash agg).

    Scale: at 100 TB the postings frame is built once and reused for
    every query (here it is derived inline); the probe filter reaches
    the postings before any shuffle, so the exchange carries only the
    candidate hits, and the intersection agg is |candidates|-sized —
    the LIKE twin rescans the whole table per query instead. Oracle =
    the LIKE conjunction, proving index ≡ scan semantics for
    whole-token matches."""
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    postings = p.select(
        "p_partkey", F.explode(F.split("p_name", " ")).alias("token")
    ).where(F.col("token") != "")
    hits = (
        postings.where(F.col("token").isin(*_SEARCH_TERMS))
        .groupBy("p_partkey")
        .agg(F.count_distinct("token").alias("n_terms"))
        .where(F.col("n_terms") == len(_SEARCH_TERMS))
    )
    return (
        hits.join(p, "p_partkey")
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


_TOKEN_GUARD = " AND ".join(
    f"list_contains(string_split(p_name, ' '), '{t}')" for t in _SEARCH_TERMS
)

PARTS_KEYWORD_SEARCH_SQL = f"""
SELECT p_partkey, p_name
FROM part
WHERE {_TOKEN_GUARD}
ORDER BY p_partkey
"""

QUERIES["parts_keyword_search"] = parts_keyword_search
ORACLE["parts_keyword_search"] = PARTS_KEYWORD_SEARCH_SQL


def customers_churn_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-operation cohort analysis: customers RETAINED from 1995 to
    1996 (INTERSECT), CHURNED (EXCEPT), and NEW (reverse EXCEPT) —
    the set-algebra idioms (DataFrame.intersect / exceptAll) the
    other queries don't exercise.

    Scale: each set op is a distinct-aggregate join on the customer
    key — the same single PK-hash shuffle as a semi/anti join; the
    three branches reuse the two year-slices. Output is one summary
    row (three counts), so only counts cross the driver."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.where(F.year("o_orderdate") == 1996).select("o_custkey")
    retained = y95.intersect(y96).count()
    churned = y95.distinct().exceptAll(y96.distinct()).count()
    new = y96.distinct().exceptAll(y95.distinct()).count()
    return spark.createDataFrame(
        [(retained, churned, new)],
        "retained bigint, churned bigint, new_customers bigint",
    )


CUSTOMERS_CHURN_SQL = """
WITH y95 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995),
     y96 AS (SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
SELECT (SELECT COUNT(*) FROM (SELECT * FROM y95 INTERSECT SELECT * FROM y96)) AS retained,
       (SELECT COUNT(*) FROM (SELECT * FROM y95 EXCEPT SELECT * FROM y96)) AS churned,
       (SELECT COUNT(*) FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y95)) AS new_customers
"""

QUERIES["customers_churn_setops"] = customers_churn_setops
ORACLE["customers_churn_setops"] = CUSTOMERS_CHURN_SQL


def lineitem_ols_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed closed-form OLS — price-vs-quantity regression per
    return flag: slope, intercept and r² from the five sufficient
    statistics (n, Σx, Σy, Σxy, Σx²(,Σy²)), the map-side-combinable
    form every massively-parallel regression uses (one pass, one
    |groups|-row shuffle; no iterative solver needed for 1-D OLS).

    Exactness: the 2dp money inputs accumulate as DECIMAL products
    (order-proof); the closed-form combination then runs on those
    exact sums cast to double — identical inputs + identical
    expression shape ⇒ identical doubles on both engines; outputs
    round at 6dp."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    stats = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    return stats.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / n, 6).alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    ).orderBy("l_returnflag")


LINEITEM_OLS_SQL = """
WITH stats AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS sxy,
         SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS sxx,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS syy
  FROM lineitem GROUP BY 1
)
SELECT l_returnflag, CAST(n AS BIGINT) AS n,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
       ROUND((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept,
       ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
             / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS r2
FROM stats
ORDER BY l_returnflag
"""

QUERIES["lineitem_ols_regression"] = lineitem_ols_regression
ORACLE["lineitem_ols_regression"] = LINEITEM_OLS_SQL


def orders_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test at scale — is line-item return
    behavior independent of order priority? The A/B-testing primitive
    run as pure aggregation: ONE PK-hash join (lineitem→orders, the
    cdc_apply shuffle) feeds a contingency-table agg; expected counts
    and χ² terms are computed on the |priorities|×|flags| table, so
    nothing after the first agg is corpus-sized.

    Exactness: observed counts and margins are integers; each χ² term
    (O−E)²/E is rounded at 6dp and DECIMAL-summed — engine-identical.
    Output: one row per cell (observed, expected, term) plus the
    statistic via a window total, fully value-checked."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_returnflag")
    cells = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    wr = Window.partitionBy("o_orderpriority")
    wc = Window.partitionBy("l_returnflag")
    wt = Window.partitionBy()
    t = (
        cells.withColumn("row_n", F.sum("observed").over(wr))
        .withColumn("col_n", F.sum("observed").over(wc))
        .withColumn("N", F.sum("observed").over(wt))
        .withColumn(
            "expected",
            F.round(F.col("row_n") * F.col("col_n") / F.col("N").cast("double"), 6),
        )
        .withColumn(
            "term",
            F.round(
                (F.col("observed") - F.col("expected"))
                * (F.col("observed") - F.col("expected"))
                / F.col("expected"),
                6,
            ).cast("decimal(18,6)"),
        )
    )
    return (
        t.withColumn("chi2", F.round(F.sum("term").over(wt).cast("double"), 6))
        .select(
            "o_orderpriority",
            "l_returnflag",
            F.col("observed").cast("bigint").alias("observed"),
            "expected",
            F.col("term").cast("double").alias("term"),
            "chi2",
        )
        .orderBy("o_orderpriority", "l_returnflag")
    )


ORDERS_CHI2_SQL = """
WITH cells AS (
  SELECT o.o_orderpriority, l.l_returnflag, COUNT(*) AS observed
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
t AS (
  SELECT *,
         SUM(observed) OVER (PARTITION BY o_orderpriority) AS row_n,
         SUM(observed) OVER (PARTITION BY l_returnflag) AS col_n,
         SUM(observed) OVER () AS N
  FROM cells
),
e AS (
  SELECT o_orderpriority, l_returnflag, observed,
         ROUND(row_n * col_n / CAST(N AS DOUBLE), 6) AS expected
  FROM t
),
s AS (
  SELECT *,
         CAST(ROUND((observed - expected) * (observed - expected) / expected, 6)
              AS DECIMAL(18,6)) AS term
  FROM e
)
SELECT o_orderpriority, l_returnflag,
       CAST(observed AS BIGINT) AS observed,
       expected,
       CAST(term AS DOUBLE) AS term,
       ROUND(CAST(SUM(term) OVER () AS DOUBLE), 6) AS chi2
FROM s
ORDER BY o_orderpriority, l_returnflag
"""

QUERIES["orders_chi2_independence"] = orders_chi2_independence
ORACLE["orders_chi2_independence"] = ORDERS_CHI2_SQL


def nation_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (inequality) analysis: the Gini
    coefficient of customer order revenue within each nation, via the
    rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over revenues sorted
    ascending — how top-heavy each market is.

    Exactness: per-customer revenue is a DECIMAL sum; ranks are
    integers (ties broken by custkey — same order both engines);
    Σ(i·xᵢ) accumulates as exact DECIMAL; the final combination is an
    identical double expression, rounded 6dp.

    Scale: revenue agg shuffles once on the customer PK; the rank
    window partitions per nation (cohort-sized sorts), and the final
    agg is |nations| rows."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        o.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(12,2)")).alias("rev"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("rev").asc(), F.col("o_custkey").asc())
    ranked = rev.withColumn("i", F.row_number().over(w))
    g = ranked.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("rev").alias("total_rev"),
        F.sum(F.col("i") * F.col("rev")).alias("iwsum"),
    )
    nn = F.col("n_customers").cast("double")
    return g.select(
        F.col("n_name").alias("nation"),
        F.col("n_customers").cast("bigint").alias("n_customers"),
        F.col("total_rev").cast("double").alias("total_rev"),
        F.round(
            2.0 * F.col("iwsum").cast("double") / (nn * F.col("total_rev").cast("double"))
            - (nn + 1.0) / nn,
            6,
        ).alias("gini"),
    ).orderBy("nation")


NATION_GINI_SQL = """
WITH rev AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY 1
),
located AS (
  SELECT r.o_custkey, r.rev, n.n_name
  FROM rev r
  JOIN customer c ON c.c_custkey = r.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY n_name
                               ORDER BY rev ASC, o_custkey ASC) AS i
  FROM located
),
g AS (
  SELECT n_name, COUNT(*) AS n_customers, SUM(rev) AS total_rev,
         SUM(i * rev) AS iwsum
  FROM ranked GROUP BY 1
)
SELECT n_name AS nation,
       CAST(n_customers AS BIGINT) AS n_customers,
       CAST(total_rev AS DOUBLE) AS total_rev,
       ROUND(2.0 * CAST(iwsum AS DOUBLE) / (CAST(n_customers AS DOUBLE) * CAST(total_rev AS DOUBLE))
             - (CAST(n_customers AS DOUBLE) + 1.0) / CAST(n_customers AS DOUBLE), 6) AS gini
FROM g
ORDER BY nation
"""

QUERIES["nation_revenue_gini"] = nation_revenue_gini
ORACLE["nation_revenue_gini"] = NATION_GINI_SQL


def lineitem_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact QUANTITY-WEIGHTED median unit price per return flag —
    the weighted-quantile primitive (plain percentiles treat a
    1000-unit line like a 1-unit line; procurement/pricing analytics
    weight by volume): the smallest price whose running quantity
    weight reaches half the group's total.

    Exactness: weights and the half-total comparison are DECIMAL
    (2·cumw ≥ W avoids dividing W by 2); price ordering ties break by
    orderkey/linenumber only inside the cumsum (the selected price is
    tie-insensitive).

    Scale: ONE shuffle on the group key; the cumsum window sorts
    within each group partition; output is |groups| rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
        (F.col("l_extendedprice").cast("decimal(12,2)") / F.col("l_quantity").cast("decimal(12,2)"))
        .cast("decimal(18,6)")
        .alias("unit_price"),
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "unit_price", "l_orderkey", "l_linenumber"
    )
    tot = Window.partitionBy("l_returnflag")
    t = li.withColumn(
        "cumw", F.sum("qty").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).withColumn("W", F.sum("qty").over(tot))
    hit = t.where(2 * F.col("cumw") >= F.col("W"))
    pick = Window.partitionBy("l_returnflag").orderBy(
        "unit_price", "l_orderkey", "l_linenumber"
    )
    return (
        hit.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("unit_price").cast("double").alias("weighted_median_price"),
            F.col("W").cast("double").alias("total_quantity"),
        )
        .orderBy("l_returnflag")
    )


LINEITEM_WMEDIAN_SQL = """
WITH t AS (
  SELECT l_returnflag, l_orderkey, l_linenumber,
         CAST(l_quantity AS DECIMAL(12,2)) AS qty,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2))
              / CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(18,6)) AS unit_price
  FROM lineitem
),
c AS (
  SELECT *,
         SUM(qty) OVER (PARTITION BY l_returnflag
                        ORDER BY unit_price, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         SUM(qty) OVER (PARTITION BY l_returnflag) AS W
  FROM t
)
SELECT l_returnflag,
       CAST(unit_price AS DOUBLE) AS weighted_median_price,
       CAST(W AS DOUBLE) AS total_quantity
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_returnflag
                               ORDER BY unit_price, l_orderkey, l_linenumber) AS rn
  FROM c WHERE 2 * cumw >= W
)
WHERE rn = 1
ORDER BY l_returnflag
"""

QUERIES["lineitem_weighted_median"] = lineitem_weighted_median
ORACLE["lineitem_weighted_median"] = LINEITEM_WMEDIAN_SQL


def customers_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation
    with exact quintile scores, reported as cell counts + average
    spend per (r, f, m) segment — the classic CRM rollup.

    Scale design: the naive plan scores with three global
    ``ntile(5)`` windows — three full sorts of the customer table.
    Instead, each metric collapses to a value→count histogram
    (map-side-combined agg on customer-level data), the exact CDF
    runs on histogram-sized frames, and the four quintile boundaries
    per metric come back as ONE broadcast row; scores are then pure
    map-side expressions (`1 + Σ (v > bᵢ)`). The only customer-scale
    exchanges are the per-customer agg and the ≤5³-cell final rollup.
    Boundary semantics: score s means v is in the s-th quintile with
    ties collapsing downward (v ≤ b₁ → 1), identical in both engines
    because boundaries and comparisons are exact ints/decimals.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", money("o_totalprice").alias("price")
    )
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("d_last"),
        F.count(F.lit(1)).alias("f_val"),
        F.sum("price").alias("m_val"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("d_anchor"))
    # customer-level frame feeds FOUR branches (three metric
    # histograms + the scoring pass): checkpoint so orders collapses
    # once (plan audit: 8 orders scans; A/B at sf0.1 favored the
    # checkpoint 1.47 vs 1.56s)
    cust = cust.join(F.broadcast(anchor)).withColumn(
        "r_val", F.datediff("d_anchor", "d_last")
    ).localCheckpoint(eager=True)

    def bounds(col: str, prefix: str) -> DataFrame:
        hist = cust.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
            "tot", F.sum("cnt").over(Window.partitionBy())
        )
        cd = F.col("cum").cast("double") / F.col("tot").cast("double")
        return cum.agg(
            *[
                F.min(F.when(cd >= q, F.col(col))).alias(f"{prefix}{i}")
                for i, q in ((1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
            ]
        )

    b = bounds("r_val", "rb").join(bounds("f_val", "fb")).join(bounds("m_val", "mb"))

    def score(col: str, prefix: str):
        s = F.lit(1)
        for i in (1, 2, 3, 4):
            s = s + F.when(F.col(col) > F.col(f"{prefix}{i}"), 1).otherwise(0)
        return s

    scored = cust.join(F.broadcast(b)).select(
        score("r_val", "rb").alias("r_score"),
        score("f_val", "fb").alias("f_score"),
        score("m_val", "mb").alias("m_score"),
        "m_val",
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (F.sum("m_val").cast("double") / F.count(F.lit(1)).cast("double")).alias(
                "avg_monetary"
            ),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


RFM_SQL = """
WITH cust AS (
  SELECT o_custkey, MAX(o_orderdate) AS d_last, COUNT(*) AS f_val,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS m_val
  FROM orders GROUP BY 1
),
withr AS (
  SELECT c.*, datediff('day', d_last, (SELECT MAX(o_orderdate) FROM orders)) AS r_val
  FROM cust c
),
rh AS (SELECT r_val AS v, COUNT(*) AS cnt FROM withr GROUP BY 1),
fh AS (SELECT f_val AS v, COUNT(*) AS cnt FROM withr GROUP BY 1),
mh AS (SELECT m_val AS v, COUNT(*) AS cnt FROM withr GROUP BY 1),
rc AS (SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE) AS cd FROM rh),
fc AS (SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE) AS cd FROM fh),
mc AS (SELECT v, CAST(SUM(cnt) OVER (ORDER BY v) AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE) AS cd FROM mh),
b AS (
  SELECT
    (SELECT MIN(CASE WHEN cd >= 0.2 THEN v END) FROM rc) AS rb1,
    (SELECT MIN(CASE WHEN cd >= 0.4 THEN v END) FROM rc) AS rb2,
    (SELECT MIN(CASE WHEN cd >= 0.6 THEN v END) FROM rc) AS rb3,
    (SELECT MIN(CASE WHEN cd >= 0.8 THEN v END) FROM rc) AS rb4,
    (SELECT MIN(CASE WHEN cd >= 0.2 THEN v END) FROM fc) AS fb1,
    (SELECT MIN(CASE WHEN cd >= 0.4 THEN v END) FROM fc) AS fb2,
    (SELECT MIN(CASE WHEN cd >= 0.6 THEN v END) FROM fc) AS fb3,
    (SELECT MIN(CASE WHEN cd >= 0.8 THEN v END) FROM fc) AS fb4,
    (SELECT MIN(CASE WHEN cd >= 0.2 THEN v END) FROM mc) AS mb1,
    (SELECT MIN(CASE WHEN cd >= 0.4 THEN v END) FROM mc) AS mb2,
    (SELECT MIN(CASE WHEN cd >= 0.6 THEN v END) FROM mc) AS mb3,
    (SELECT MIN(CASE WHEN cd >= 0.8 THEN v END) FROM mc) AS mb4
),
scored AS (
  SELECT
    1 + (CASE WHEN r_val > rb1 THEN 1 ELSE 0 END) + (CASE WHEN r_val > rb2 THEN 1 ELSE 0 END)
      + (CASE WHEN r_val > rb3 THEN 1 ELSE 0 END) + (CASE WHEN r_val > rb4 THEN 1 ELSE 0 END) AS r_score,
    1 + (CASE WHEN f_val > fb1 THEN 1 ELSE 0 END) + (CASE WHEN f_val > fb2 THEN 1 ELSE 0 END)
      + (CASE WHEN f_val > fb3 THEN 1 ELSE 0 END) + (CASE WHEN f_val > fb4 THEN 1 ELSE 0 END) AS f_score,
    1 + (CASE WHEN m_val > mb1 THEN 1 ELSE 0 END) + (CASE WHEN m_val > mb2 THEN 1 ELSE 0 END)
      + (CASE WHEN m_val > mb3 THEN 1 ELSE 0 END) + (CASE WHEN m_val > mb4 THEN 1 ELSE 0 END) AS m_score,
    m_val
  FROM withr, b
)
SELECT r_score, f_score, m_score, COUNT(*) AS n_customers,
       CAST(SUM(m_val) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_monetary
FROM scored GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""

QUERIES["customers_rfm_segmentation"] = customers_rfm_segmentation
ORACLE["customers_rfm_segmentation"] = RFM_SQL


def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: customers grouped by first-order
    quarter, revenue accumulated per quarters-since-acquisition — the
    warehouse classic behind every retention/LTV dashboard.

    Scale design: the acquisition quarter is ONE per-customer MIN agg
    (map-side combined); joined back on the customer key (the only
    row-scale exchanges — both on c_custkey-sized data, never a
    window over raw orders). The LTV matrix itself is a
    |cohorts|×|quarters| cell agg. Quarter index arithmetic is pure
    integers; revenue is DECIMAL-exact.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", money("o_totalprice").alias("price")
    )
    qidx = lambda c: F.year(c) * 4 + F.quarter(c) - 1  # noqa: E731
    first = o.groupBy("o_custkey").agg(F.min("o_orderdate").alias("d0"))
    j = o.join(first, "o_custkey").select(
        (F.concat(F.year("d0"), F.lit("-Q"), F.quarter("d0"))).alias("cohort"),
        (qidx(F.col("o_orderdate")) - qidx(F.col("d0"))).alias("quarters_since"),
        "o_custkey",
        "price",
    )
    return (
        j.groupBy("cohort", "quarters_since")
        .agg(
            F.countDistinct("o_custkey").alias("n_active_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("price"), "revenue"),
        )
        .orderBy("cohort", "quarters_since")
    )


COHORT_LTV_SQL = """
WITH first AS (
  SELECT o_custkey, MIN(o_orderdate) AS d0 FROM orders GROUP BY 1
),
j AS (
  SELECT CONCAT(CAST(year(f.d0) AS VARCHAR), '-Q', CAST(quarter(f.d0) AS VARCHAR)) AS cohort,
         (year(o.o_orderdate) * 4 + quarter(o.o_orderdate))
           - (year(f.d0) * 4 + quarter(f.d0)) AS quarters_since,
         o.o_custkey,
         CAST(o.o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders o JOIN first f ON o.o_custkey = f.o_custkey
)
SELECT cohort,
       CAST(quarters_since AS BIGINT) AS quarters_since,
       COUNT(DISTINCT o_custkey) AS n_active_customers,
       COUNT(*) AS n_orders,
       CAST(SUM(price) AS DOUBLE) AS revenue
FROM j GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["orders_cohort_ltv"] = orders_cohort_ltv
ORACLE["orders_cohort_ltv"] = COHORT_LTV_SQL


def parts_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline (Pareto-front) query: parts not dominated on
    (minimize retail price, maximize size) — the multi-criteria
    shortlist operator. A part is dominated iff some part is
    no-worse on both axes and strictly better on one.

    Scale design: the textbook formulation is a quadratic NOT-EXISTS
    self-join; in 2D one sweep decides domination exactly — and the
    sweep here runs on the price→max(size) HISTOGRAM, not raw rows:
    collapse to one row per distinct price (map-side-combined agg),
    take the running max of size over strictly-cheaper prices with a
    ROWS frame (safe: one row per price — a RANGE -1 frame on a
    decimal column is a VALUE offset and silently skips sub-unit
    neighbors), then join the surviving (price, gmax) pairs back on
    the price key. Skyline ⇔ size == its price's max AND that max
    beats every cheaper price's max. Exchanges: one price-key agg, a
    histogram-sized sort, one price-key join. d>2 generalizes to the
    local-skyline → global-skyline two-phase.
    """
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", money("p_retailprice").alias("price"), F.col("p_size").alias("size")
    )
    g = p.groupBy("price").agg(F.max("size").alias("gmax"))
    w = Window.orderBy("price").rowsBetween(Window.unboundedPreceding, -1)
    sky_prices = (
        g.withColumn("m_cheaper", F.max("gmax").over(w))
        .where(F.col("m_cheaper").isNull() | (F.col("gmax") > F.col("m_cheaper")))
        .select("price", "gmax")
    )
    return (
        p.join(F.broadcast(sky_prices), "price")
        .where(F.col("size") == F.col("gmax"))
        .select("p_partkey", F.col("price").cast("double").alias("price"), "size")
        .orderBy("price", "p_partkey")
    )


SKYLINE_SQL = """
WITH p AS (
  SELECT p_partkey, CAST(p_retailprice AS DECIMAL(12,2)) AS price, p_size AS size
  FROM part
),
g AS (SELECT price, MAX(size) AS gmax FROM p GROUP BY price),
sky AS (
  SELECT price, gmax FROM (
    SELECT *,
           MAX(gmax) OVER (ORDER BY price
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m_cheaper
    FROM g
  ) WHERE m_cheaper IS NULL OR gmax > m_cheaper
)
SELECT p.p_partkey, CAST(p.price AS DOUBLE) AS price, CAST(p.size AS INTEGER) AS size
FROM p JOIN sky ON p.price = sky.price AND p.size = sky.gmax
ORDER BY price, p_partkey
"""

QUERIES["parts_skyline_pareto"] = parts_skyline_pareto
ORACLE["parts_skyline_pareto"] = SKYLINE_SQL


def lineitem_shipping_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-time-shipping SLA attainment per line status × order year:
    share of line items shipped within 30 days of the order date —
    the ops-reporting rollup every sync'd warehouse serves daily.

    Scale design: one PK-hash join (lineitem ⋈ orders on the order
    key — both sides pruned to three columns), SLA flag as a map-side
    integer expression, one |statuses|×|years| cell agg. Rate is an IEEE
    division of exact counts, 6dp-rounded.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_linestatus",
        F.year("o_orderdate").alias("order_year"),
        (F.datediff("l_shipdate", "o_orderdate") <= 30).cast("int").alias("on_time"),
    )
    return (
        j.groupBy("l_linestatus", "order_year")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("on_time").alias("n_on_time"),
        )
        .select(
            "l_linestatus",
            "order_year",
            "n_items",
            "n_on_time",
            F.round(
                F.col("n_on_time").cast("double") / F.col("n_items").cast("double"), 6
            ).alias("on_time_rate"),
        )
        .orderBy("l_linestatus", "order_year")
    )


SHIPPING_SLA_SQL = """
SELECT l.l_linestatus,
       CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
       COUNT(*) AS n_items,
       CAST(SUM(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
       ROUND(CAST(SUM(CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) <= 30
                           THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS on_time_rate
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["lineitem_shipping_sla"] = lineitem_shipping_sla
ORACLE["lineitem_shipping_sla"] = SHIPPING_SLA_SQL


def orders_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-priority mix between
    the first and second half of order history (split at the median
    year) — THE feature-drift metric an ML monitor runs on every
    sync'd snapshot. PSI = Σ (p₂−p₁)·ln(p₂/p₁) over buckets.

    Scale design: one (half, priority) hash agg collapses the table;
    marginals and PSI terms compute on the |priorities|-cell frame.
    The median-year split point is an exact histogram-CDF boundary
    (one broadcast scalar). Terms are 6dp-rounded then summed —
    engine-identical.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"), "o_orderpriority"
    )
    yh = o.groupBy("y").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("y").rowsBetween(Window.unboundedPreceding, 0)
    cd = (
        F.sum("cnt").over(w).cast("double")
        / F.sum("cnt").over(Window.partitionBy()).cast("double")
    )
    med = yh.select("y", cd.alias("cd")).agg(
        F.min(F.when(F.col("cd") >= 0.5, F.col("y"))).alias("med_y")
    )
    halves = o.join(F.broadcast(med)).select(
        F.when(F.col("y") <= F.col("med_y"), "h1").otherwise("h2").alias("half"),
        "o_orderpriority",
    )
    cells = halves.groupBy("half", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = Window.partitionBy("half")
    p = cells.withColumn("p", F.col("n").cast("double") / F.sum("n").over(tot).cast("double"))
    wide = (
        p.groupBy("o_orderpriority")
        .agg(
            F.max(F.when(F.col("half") == "h1", F.col("p"))).alias("p1"),
            F.max(F.when(F.col("half") == "h2", F.col("p"))).alias("p2"),
        )
    )
    term = F.round((F.col("p2") - F.col("p1")) * F.log(F.col("p2") / F.col("p1")), 6)
    return (
        wide.select(
            "o_orderpriority",
            F.round("p1", 6).alias("p1"),
            F.round("p2", 6).alias("p2"),
            term.alias("psi_term"),
        )
        .orderBy("o_orderpriority")
    )


PSI_DRIFT_SQL = """
WITH o AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y, o_orderpriority FROM orders
),
yh AS (SELECT y, COUNT(*) AS cnt FROM o GROUP BY 1),
cum AS (
  SELECT y, CAST(SUM(cnt) OVER (ORDER BY y) AS DOUBLE)
              / CAST(SUM(cnt) OVER () AS DOUBLE) AS cd
  FROM yh
),
med AS (SELECT MIN(CASE WHEN cd >= 0.5 THEN y END) AS med_y FROM cum),
halves AS (
  SELECT CASE WHEN o.y <= med.med_y THEN 'h1' ELSE 'h2' END AS half, o_orderpriority
  FROM o CROSS JOIN med
),
cells AS (SELECT half, o_orderpriority, COUNT(*) AS n FROM halves GROUP BY 1, 2),
p AS (
  SELECT *, CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY half) AS DOUBLE) AS p
  FROM cells
),
wide AS (
  SELECT o_orderpriority,
         MAX(CASE WHEN half = 'h1' THEN p END) AS p1,
         MAX(CASE WHEN half = 'h2' THEN p END) AS p2
  FROM p GROUP BY 1
)
SELECT o_orderpriority, ROUND(p1, 6) AS p1, ROUND(p2, 6) AS p2,
       ROUND((p2 - p1) * LN(p2 / p1), 6) AS psi_term
FROM wide ORDER BY o_orderpriority
"""

QUERIES["orders_psi_drift"] = orders_psi_drift
ORACLE["orders_psi_drift"] = PSI_DRIFT_SQL


def lineitem_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts bucketed A/B/C by
    cumulative revenue share (top 80% / next 15% / tail 5%) — the
    Pareto rollup behind every stocking policy.

    Scale design: the fact table collapses to one revenue row per
    part (map-side-combined DECIMAL agg); the cumulative-share window
    runs on the part-cardinality frame ordered by revenue (a
    part-level sort, never a fact-row sort), with the part key as the
    deterministic tiebreak. Class assignment is the share BEFORE the
    part (strictly-preceding cum), so the part that crosses 0.8 is
    still an A — the standard convention, identical in both engines.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", money("l_extendedprice").alias("price")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("price").alias("rev"))
    w = Window.orderBy(F.col("rev").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, -1
    )
    wall = Window.partitionBy()
    d = per_part.withColumn(
        "share_before",
        F.coalesce(F.sum("rev").over(w), F.lit(0).cast("decimal(38,2)")).cast("double")
        / F.sum("rev").over(wall).cast("double"),
    )
    cls = (
        F.when(F.col("share_before") < 0.80, "A")
        .when(F.col("share_before") < 0.95, "B")
        .otherwise("C")
    )
    return (
        d.select(cls.alias("abc_class"), "rev")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").cast("double").alias("revenue"),
        )
        .orderBy("abc_class")
    )


ABC_CLASS_SQL = """
WITH per_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
  FROM lineitem GROUP BY 1
),
d AS (
  SELECT rev,
         CAST(COALESCE(SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS DOUBLE)
           / CAST(SUM(rev) OVER () AS DOUBLE) AS share_before
  FROM per_part
)
SELECT CASE WHEN share_before < 0.80 THEN 'A'
            WHEN share_before < 0.95 THEN 'B'
            ELSE 'C' END AS abc_class,
       COUNT(*) AS n_parts,
       CAST(SUM(rev) AS DOUBLE) AS revenue
FROM d GROUP BY 1 ORDER BY 1
"""

QUERIES["lineitem_abc_classification"] = lineitem_abc_classification
ORACLE["lineitem_abc_classification"] = ABC_CLASS_SQL


def customers_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lorenz curve in deciles: share of total revenue contributed by
    each customer decile (ranked poorest→richest) plus the cumulative
    share — the inequality curve behind the per-nation Gini, as the
    report a revenue team reads.

    Scale design: the fact table collapses to one DECIMAL revenue row
    per customer first; ranking runs on the customer-cardinality
    frame (revenue, custkey tiebreak), decile assignment is integer
    math on the rank, and shares are IEEE divisions of exact DECIMAL
    sums. Never a fact-row sort.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", money("o_totalprice").alias("price")
    )
    per_cust = o.groupBy("o_custkey").agg(F.sum("price").alias("rev"))
    w = Window.orderBy("rev", "o_custkey")
    wall = Window.partitionBy()
    d = (
        per_cust.withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wall))
        .withColumn("decile", (F.floor((F.col("rn") - 1) * 10 / F.col("n")) + 1).cast("int"))
    )
    tot = Window.partitionBy()
    by_dec = d.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"), F.sum("rev").alias("dec_rev")
    )
    out = by_dec.withColumn(
        "share",
        F.round(
            F.col("dec_rev").cast("double") / F.sum("dec_rev").over(tot).cast("double"),
            6,
        ),
    ).withColumn(
        "cum_share",
        F.round(
            F.sum("dec_rev")
            .over(Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0))
            .cast("double")
            / F.sum("dec_rev").over(tot).cast("double"),
            6,
        ),
    )
    return out.select("decile", "n_customers", "share", "cum_share").orderBy("decile")


LORENZ_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY 1
),
d AS (
  SELECT rev,
         CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY rev, o_custkey) - 1) * 10.0
                    / COUNT(*) OVER ()) + 1 AS INTEGER) AS decile
  FROM per_cust
),
by_dec AS (
  SELECT decile, COUNT(*) AS n_customers, SUM(rev) AS dec_rev FROM d GROUP BY 1
)
SELECT decile, n_customers,
       ROUND(CAST(dec_rev AS DOUBLE) / CAST(SUM(dec_rev) OVER () AS DOUBLE), 6) AS share,
       ROUND(CAST(SUM(dec_rev) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             / CAST(SUM(dec_rev) OVER () AS DOUBLE), 6) AS cum_share
FROM by_dec ORDER BY decile
"""

QUERIES["customers_lorenz_deciles"] = customers_lorenz_deciles
ORACLE["customers_lorenz_deciles"] = LORENZ_SQL


def suppliers_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman supply-concentration index per nation:
    Σ (supplier revenue share)² · 10000 over each nation's suppliers
    — the antitrust-style concentration screen next to the customer
    Gini (HHI > 2500 = highly concentrated).

    Scale design: ONE supplier-key shuffle aggregates each supplier's
    DECIMAL revenue; the nation roll-up and share math run on the
    supplier-cardinality frame (broadcast nation dim); shares are
    IEEE divisions of exact sums; HHI terms are 6dp-rounded then
    DECIMAL-summed (a double sum is shuffle-order-dependent).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", money("l_extendedprice").alias("price")
    )
    per_supp = li.groupBy("l_suppkey").agg(F.sum("price").alias("rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    j = (
        per_supp.join(s, per_supp.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("n_name", "rev")
    )
    wnat = Window.partitionBy("n_name")
    shares = j.withColumn(
        "share", F.col("rev").cast("double") / F.sum("rev").over(wnat).cast("double")
    )
    return (
        shares.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(
                F.round(F.pow("share", F.lit(2.0)) * 10000, 6).cast("decimal(18,6)")
            ).cast("double").alias("hhi"),
        )
        .orderBy("n_name")
    )


SUPPLIER_HHI_SQL = """
WITH per_supp AS (
  SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT n.n_name, p.rev
  FROM per_supp p
  JOIN supplier s ON p.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
),
shares AS (
  SELECT n_name,
         CAST(rev AS DOUBLE) / CAST(SUM(rev) OVER (PARTITION BY n_name) AS DOUBLE) AS share
  FROM j
)
SELECT n_name, COUNT(*) AS n_suppliers,
       CAST(SUM(CAST(ROUND(POW(share, 2) * 10000, 6) AS DECIMAL(18,6))) AS DOUBLE) AS hhi
FROM shares GROUP BY 1 ORDER BY 1
"""

QUERIES["suppliers_hhi_concentration"] = suppliers_hhi_concentration
ORACLE["suppliers_hhi_concentration"] = SUPPLIER_HHI_SQL


def segments_contribution_margin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-segment contribution report: per c_mktsegment — active
    customers, orders, DECIMAL-exact revenue, revenue share, and
    average account balance — the one-page segment P&L a revenue
    team reviews weekly.

    Scale design: orders aggregate per customer on ONE customer-key
    shuffle, the segment dim rides the same key, and the final
    |segments|-cell rollup carries exact DECIMAL sums; shares and
    averages are IEEE divisions of exact totals (acctbal is 2dp, so
    its DECIMAL sum is exact too).
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", money("o_totalprice").alias("price")
    )
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"), F.sum("price").alias("rev")
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", money("c_acctbal").alias("bal")
    )
    j = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
    seg = j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count(F.col("rev")).alias("n_active"),
        F.sum(F.coalesce("n_orders", F.lit(0))).alias("n_orders"),
        F.sum(F.coalesce(F.col("rev"), F.lit(0).cast("decimal(12,2)"))).alias("_rev"),
        F.sum("bal").alias("_bal"),
    )
    wall = Window.partitionBy()
    return (
        seg.withColumn(
            "revenue_share",
            F.round(
                F.col("_rev").cast("double") / F.sum("_rev").over(wall).cast("double"),
                6,
            ),
        )
        .select(
            "c_mktsegment",
            "n_customers",
            "n_active",
            "n_orders",
            F.col("_rev").cast("double").alias("revenue"),
            "revenue_share",
            F.round(
                F.col("_bal").cast("double") / F.col("n_customers").cast("double"), 6
            ).alias("avg_acctbal"),
        )
        .orderBy("c_mktsegment")
    )


SEGMENTS_SQL = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY 1
),
j AS (
  SELECT c.c_mktsegment, CAST(c.c_acctbal AS DECIMAL(12,2)) AS bal,
         p.n_orders, p.rev
  FROM customer c LEFT JOIN per_cust p ON c.c_custkey = p.o_custkey
),
seg AS (
  SELECT c_mktsegment,
         COUNT(*) AS n_customers,
         COUNT(rev) AS n_active,
         CAST(SUM(COALESCE(n_orders, 0)) AS BIGINT) AS n_orders,
         SUM(COALESCE(rev, 0)) AS _rev,
         SUM(bal) AS _bal
  FROM j GROUP BY 1
)
SELECT c_mktsegment, n_customers, n_active, n_orders,
       CAST(_rev AS DOUBLE) AS revenue,
       ROUND(CAST(_rev AS DOUBLE) / CAST(SUM(_rev) OVER () AS DOUBLE), 6) AS revenue_share,
       ROUND(CAST(_bal AS DOUBLE) / CAST(n_customers AS DOUBLE), 6) AS avg_acctbal
FROM seg ORDER BY c_mktsegment
"""

QUERIES["segments_contribution_margin"] = segments_contribution_margin
ORACLE["segments_contribution_margin"] = SEGMENTS_SQL


def customers_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier estimator (1958) of the customer repurchase
    interval: survival = P(no repeat order within t days). Gaps
    between a customer's consecutive orders are EVENTS; the gap from
    the last order to the corpus end-date is RIGHT-CENSORED — the
    churn-analysis staple that naive "average gap" metrics get wrong
    by ignoring censoring.

    Scale design: one window over (custkey, orderdate) derives the
    gaps (shuffle on custkey); the estimator itself runs on the
    duration HISTOGRAM (value → event/censor counts + cumulative
    at-risk window — histogram-CDF house pattern), never raw gaps.
    d_i and n_i are exact integers; the survival curve is the
    cumulative product Π(1 − d/n), computed as exp(Σ ln(·)) on both
    engines (identical IEEE ops), rounded at 6dp. Emitted only at
    event times (the KM convention) with day-granular durations."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    nxt = F.lead("o_orderdate").over(w)
    spans = o.withColumn("nxt", nxt).crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("nxt").isNotNull(), F.datediff("nxt", "o_orderdate")
        ).otherwise(F.datediff("h", "o_orderdate")).alias("t"),
        F.col("nxt").isNotNull().alias("is_event"),
    ).where(F.col("t") > 0)
    hist = spans.groupBy("t").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).alias("d"),
        F.count(F.lit(1)).alias("tot"),
    )
    total = spans.count()
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    curve = hist.withColumn(
        "n_at_risk", F.lit(total) - F.coalesce(F.sum("tot").over(wcum), F.lit(0))
    )
    wsurv = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # the last event time can absorb ALL remaining at-risk mass
    # (n == d ⇒ factor 0 ⇒ ln undefined): sum lns of nonzero factors
    # and zero the curve from the first exhausted step onward
    lnterm = F.when(
        F.col("n_at_risk") > F.col("d"),
        F.log(
            (F.col("n_at_risk") - F.col("d")).cast("double")
            / F.col("n_at_risk").cast("double")
        ),
    )
    hit_zero = F.max(
        F.when(F.col("n_at_risk") == F.col("d"), 1).otherwise(0)
    ).over(wsurv)
    surv = F.when(hit_zero == 1, F.lit(0.0)).otherwise(
        F.exp(F.sum(lnterm).over(wsurv))
    )
    return (
        curve.withColumn("survival", F.round(surv, 6))
        .where(F.col("d") > 0)
        .select(
            F.col("t").cast("int").alias("t_days"),
            F.col("d").cast("bigint").alias("n_events"),
            F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
            "survival",
        )
        .orderBy("t_days")
    )


CUSTOMERS_SURVIVAL_KM_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS nxt
  FROM orders
),
spans AS (
  SELECT CASE WHEN nxt IS NOT NULL
              THEN datediff('day', o_orderdate, nxt)
              ELSE datediff('day', o_orderdate, (SELECT MAX(o_orderdate) FROM orders)) END AS t,
         nxt IS NOT NULL AS is_event
  FROM o
),
spans2 AS (SELECT * FROM spans WHERE t > 0),
hist AS (
  SELECT t, SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS d, COUNT(*) AS tot
  FROM spans2 GROUP BY t
),
curve AS (
  SELECT t, d,
         (SELECT COUNT(*) FROM spans2)
           - COALESCE(SUM(tot) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_at_risk
  FROM hist
),
km AS (
  SELECT t, d, n_at_risk,
         ROUND(CASE WHEN MAX(CASE WHEN n_at_risk = d THEN 1 ELSE 0 END)
                         OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
               THEN 0.0
               ELSE EXP(SUM(CASE WHEN n_at_risk > d
                            THEN LN(CAST(n_at_risk - d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)) END)
                    OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) END, 6)
           AS survival
  FROM curve
)
SELECT CAST(t AS INTEGER) AS t_days, CAST(d AS BIGINT) AS n_events,
       CAST(n_at_risk AS BIGINT) AS n_at_risk, survival
FROM km WHERE d > 0 ORDER BY t_days
"""

QUERIES["customers_survival_km"] = customers_survival_km
ORACLE["customers_survival_km"] = CUSTOMERS_SURVIVAL_KM_SQL


def nations_revenue_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price/volume/mix bridge between 1995 and 1996 revenue per
    supplier nation — the classic BI "why did revenue move"
    decomposition: Δrev = (Δp)·q₀ + p₀·(Δq) + (Δp)(Δq) with
    p = unit price (rev/qty).

    Scale design: lineitem collapses in ONE map-side-combined agg to
    (nation, year) DECIMAL sums of qty and revenue (the supplier join
    shuffles on suppkey with AQE sizing; nation is a broadcast-hinted
    fixed-cardinality dim); the decomposition itself runs on ≤25×2
    cells. Sums are DECIMAL-exact; each effect is one IEEE
    expression of exact decimals, identical on both engines, 6dp."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        F.year("l_shipdate").alias("yr"),
        F.col("l_quantity").cast("decimal(18,2)").alias("qty"),
        money("l_extendedprice").alias("rev"),
    ).where(F.col("yr").isin(1995, 1996))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    per = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name", "yr")
        .agg(F.sum("qty").alias("q"), F.sum("rev").alias("r"))
    )
    wide = per.groupBy("n_name").agg(
        F.max(F.when(F.col("yr") == 1995, F.col("q"))).alias("q0"),
        F.max(F.when(F.col("yr") == 1995, F.col("r"))).alias("r0"),
        F.max(F.when(F.col("yr") == 1996, F.col("q"))).alias("q1"),
        F.max(F.when(F.col("yr") == 1996, F.col("r"))).alias("r1"),
    ).where(
        F.col("q0").isNotNull() & F.col("q1").isNotNull()
        & (F.col("q0") > 0) & (F.col("q1") > 0)
    )
    p0 = F.col("r0").cast("double") / F.col("q0").cast("double")
    p1 = F.col("r1").cast("double") / F.col("q1").cast("double")
    dq = (F.col("q1") - F.col("q0")).cast("double")
    return wide.select(
        F.col("n_name").alias("nation"),
        F.col("r0").cast("double").alias("rev_1995"),
        F.col("r1").cast("double").alias("rev_1996"),
        (F.col("r1") - F.col("r0")).cast("double").alias("rev_change"),
        F.round((p1 - p0) * F.col("q0").cast("double"), 6).alias("price_effect"),
        F.round(p0 * dq, 6).alias("volume_effect"),
        F.round((p1 - p0) * dq, 6).alias("mix_effect"),
    ).orderBy("nation")


NATIONS_DECOMPOSITION_SQL = """
WITH per AS (
  SELECT n.n_name, CAST(year(l.l_shipdate) AS INTEGER) AS yr,
         SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS q,
         SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS r
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE year(l.l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2
),
wide AS (
  SELECT n_name,
         MAX(CASE WHEN yr = 1995 THEN q END) AS q0,
         MAX(CASE WHEN yr = 1995 THEN r END) AS r0,
         MAX(CASE WHEN yr = 1996 THEN q END) AS q1,
         MAX(CASE WHEN yr = 1996 THEN r END) AS r1
  FROM per GROUP BY 1
)
SELECT n_name AS nation,
       CAST(r0 AS DOUBLE) AS rev_1995,
       CAST(r1 AS DOUBLE) AS rev_1996,
       CAST(r1 - r0 AS DOUBLE) AS rev_change,
       ROUND((CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
              - CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))
             * CAST(q0 AS DOUBLE), 6) AS price_effect,
       ROUND(CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)
             * CAST(q1 - q0 AS DOUBLE), 6) AS volume_effect,
       ROUND((CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)
              - CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE))
             * CAST(q1 - q0 AS DOUBLE), 6) AS mix_effect
FROM wide
WHERE q0 IS NOT NULL AND q1 IS NOT NULL AND q0 > 0 AND q1 > 0
ORDER BY nation
"""

QUERIES["nations_revenue_decomposition"] = nations_revenue_decomposition
ORACLE["nations_revenue_decomposition"] = NATIONS_DECOMPOSITION_SQL


_MIGRATION_SPLIT = "1998-01-01"


def customers_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer value-segment MIGRATION matrix: monetary quintile in
    the early period (orders before 1998) vs the late period (1998+),
    each period scored against its OWN spend distribution — the CRM
    question behind retention programs ("which high-value customers
    slipped, which grew"). Segment 0 = not active in that period, so
    the matrix's 0-row/0-column are acquisition and churn.

    Scale design: two per-customer DECIMAL spend aggs (one shuffle
    each), exact quintile boundaries via the histogram-CDF house
    pattern (never a global ntile sort), boundaries broadcast back,
    one full-outer join on custkey for the matrix, final ≤36-cell
    rollup. Boundaries/compares are exact decimals — identical
    engine-side."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", money("o_totalprice").alias("price")
    )
    split = F.lit(_MIGRATION_SPLIT).cast("date")

    def period_scores(df: DataFrame, alias: str) -> DataFrame:
        spend = df.groupBy("o_custkey").agg(F.sum("price").alias("m"))
        hist = spend.groupBy("m").agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
        cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
            "tot", F.sum("cnt").over(Window.partitionBy())
        )
        cd = F.col("cum").cast("double") / F.col("tot").cast("double")
        b = cum.agg(
            *[
                F.min(F.when(cd >= q, F.col("m"))).alias(f"b{i}")
                for i, q in ((1, 0.2), (2, 0.4), (3, 0.6), (4, 0.8))
            ]
        )
        s = F.lit(1)
        for i in (1, 2, 3, 4):
            s = s + F.when(F.col("m") > F.col(f"b{i}"), 1).otherwise(0)
        return spend.join(F.broadcast(b)).select(
            "o_custkey", s.alias(alias)
        )

    p0 = period_scores(o.where(F.col("o_orderdate") < split), "seg_p0")
    p1 = period_scores(o.where(F.col("o_orderdate") >= split), "seg_p1")
    m = p0.join(p1, "o_custkey", "full_outer").select(
        F.coalesce("seg_p0", F.lit(0)).cast("int").alias("seg_p0"),
        F.coalesce("seg_p1", F.lit(0)).cast("int").alias("seg_p1"),
    )
    return (
        m.groupBy("seg_p0", "seg_p1")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("seg_p0", "seg_p1")
    )


def _migration_period_sql(name: str, where: str) -> str:
    return f"""
{name}_spend AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS m
  FROM orders WHERE {where} GROUP BY 1
),
{name}_cdf AS (
  SELECT m AS v,
         CAST(SUM(cnt) OVER (ORDER BY v) AS DOUBLE)
           / CAST(SUM(cnt) OVER () AS DOUBLE) AS cd
  FROM (SELECT m, COUNT(*) AS cnt FROM {name}_spend GROUP BY 1)
),
{name}_b AS (
  SELECT
    (SELECT MIN(CASE WHEN cd >= 0.2 THEN v END) FROM {name}_cdf) AS b1,
    (SELECT MIN(CASE WHEN cd >= 0.4 THEN v END) FROM {name}_cdf) AS b2,
    (SELECT MIN(CASE WHEN cd >= 0.6 THEN v END) FROM {name}_cdf) AS b3,
    (SELECT MIN(CASE WHEN cd >= 0.8 THEN v END) FROM {name}_cdf) AS b4
),
{name}_seg AS (
  SELECT o_custkey,
         1 + (CASE WHEN m > b1 THEN 1 ELSE 0 END) + (CASE WHEN m > b2 THEN 1 ELSE 0 END)
           + (CASE WHEN m > b3 THEN 1 ELSE 0 END) + (CASE WHEN m > b4 THEN 1 ELSE 0 END) AS seg
  FROM {name}_spend, {name}_b
)"""


CUSTOMERS_MIGRATION_SQL = f"""
WITH {_migration_period_sql("p0", f"o_orderdate < DATE '{_MIGRATION_SPLIT}'")},
{_migration_period_sql("p1", f"o_orderdate >= DATE '{_MIGRATION_SPLIT}'")}
SELECT CAST(COALESCE(p0_seg.seg, 0) AS INTEGER) AS seg_p0,
       CAST(COALESCE(p1_seg.seg, 0) AS INTEGER) AS seg_p1,
       COUNT(*) AS n_customers
FROM p0_seg FULL OUTER JOIN p1_seg USING (o_custkey)
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["customers_value_migration"] = customers_value_migration
ORACLE["customers_value_migration"] = CUSTOMERS_MIGRATION_SQL


def lineitem_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U test (1947): do returned ('R') and regular
    ('N') line items draw their quantities from the same
    distribution? The rank-based two-sample test that, unlike the
    t-test, needs no normality — and unlike KS, targets stochastic
    dominance (a location shift).

    Scale design: quantities collapse to a value→(count_R, count_N)
    histogram (ONE map-side-combined agg — the histogram-CDF house
    pattern); midranks, rank sums, U, the tie-corrected variance and
    Z all come from that ≤|distinct values| frame. Midranks are kept
    ×2 (``2·rank = 2·cum_before + cnt + 1``) so every statistic is an
    exact integer until the one closing IEEE expression for Z."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "N")
    )
    hist = li.groupBy(F.col("l_quantity").cast("long").alias("v")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("l_returnflag") == "N", 1).otherwise(0)).alias("cb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.withColumn(
        "cum_before", F.coalesce(F.sum(F.col("ca") + F.col("cb")).over(w), F.lit(0))
    ).withColumn("rank2", 2 * F.col("cum_before") + F.col("ca") + F.col("cb") + 1)
    agg = ranked.agg(
        F.sum("ca").cast("long").alias("n1"),
        F.sum("cb").cast("long").alias("n2"),
        F.sum(F.col("ca") * F.col("rank2")).cast("long").alias("r2_sum"),
        F.sum(
            (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            * (F.col("ca") + F.col("cb"))
            - (F.col("ca") + F.col("cb"))
        ).cast("long").alias("tie_term"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    u2 = F.col("r2_sum") - n1 * (n1 + 1)  # 2·U1, exact integer
    mu2 = n1 * n2  # 2·E[U]
    var = (
        n1.cast("double")
        * n2.cast("double")
        / 12.0
        * (
            (n + 1).cast("double")
            - F.col("tie_term").cast("double") / (n * (n - 1)).cast("double")
        )
    )
    return agg.select(
        "n1",
        "n2",
        u2.cast("bigint").alias("u_times_2"),
        F.round((u2 - mu2).cast("double") / (2.0 * F.sqrt(var)), 6).alias("z"),
    )


MANNWHITNEY_SQL = """
WITH hist AS (
  SELECT CAST(l_quantity AS BIGINT) AS v,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN l_returnflag = 'N' THEN 1 ELSE 0 END) AS cb
  FROM lineitem WHERE l_returnflag IN ('R', 'N')
  GROUP BY 1
),
ranked AS (
  SELECT v, ca, cb,
         COALESCE(SUM(ca + cb) OVER (ORDER BY v
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM hist
),
agg AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS n1,
         CAST(SUM(cb) AS BIGINT) AS n2,
         CAST(SUM(ca * (2 * cum_before + ca + cb + 1)) AS BIGINT) AS r2_sum,
         CAST(SUM((ca + cb) * (ca + cb) * (ca + cb) - (ca + cb)) AS BIGINT) AS tie_term
  FROM ranked
)
SELECT n1, n2,
       CAST(r2_sum - n1 * (n1 + 1) AS BIGINT) AS u_times_2,
       ROUND(CAST(r2_sum - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
             / (2.0 * SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0
                * (CAST(n1 + n2 + 1 AS DOUBLE)
                   - CAST(tie_term AS DOUBLE)
                     / CAST((n1 + n2) * (n1 + n2 - 1) AS DOUBLE)))), 6) AS z
FROM agg
"""

QUERIES["lineitem_mannwhitney_u"] = lineitem_mannwhitney_u
ORACLE["lineitem_mannwhitney_u"] = MANNWHITNEY_SQL


def orders_priority_kendall_taub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall τ-b ordinal association between order YEAR and order
    PRIORITY (is the priority mix drifting over time?) — the
    tie-aware rank correlation for ordinal×ordinal data, computed
    entirely from the contingency table.

    Scale design: the order stream collapses ONCE to the
    |years|×|priorities| contingency table (map-side combine);
    concordant/discordant pair counts come from the table's self-join
    (≤35×35 cells — constant work at any data size); C, D and the
    tie terms are exact integers, τ-b is one closing IEEE
    expression."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("pri"),
    )
    cells = o.groupBy("yr", "pri").agg(F.count(F.lit(1)).alias("n"))
    a = cells.select(
        F.col("yr").alias("y1"), F.col("pri").alias("p1"), F.col("n").alias("n1c")
    )
    b = cells.select(
        F.col("yr").alias("y2"), F.col("pri").alias("p2"), F.col("n").alias("n2c")
    )
    pairs = a.crossJoin(b)
    conc = pairs.where(
        (F.col("y2") > F.col("y1")) & (F.col("p2") > F.col("p1"))
    ).agg(F.sum(F.col("n1c") * F.col("n2c")).alias("v"))
    disc = pairs.where(
        (F.col("y2") > F.col("y1")) & (F.col("p2") < F.col("p1"))
    ).agg(F.sum(F.col("n1c") * F.col("n2c")).alias("v"))
    c_val = conc.collect()[0]["v"] or 0
    d_val = disc.collect()[0]["v"] or 0
    totals = cells.agg(F.sum("n").alias("n")).collect()[0]
    n_total = totals["n"]
    rows = cells.groupBy("yr").agg(F.sum("n").alias("r")).collect()
    cols = cells.groupBy("pri").agg(F.sum("n").alias("c")).collect()
    n0 = n_total * (n_total - 1) // 2
    n1 = sum(r["r"] * (r["r"] - 1) // 2 for r in rows)
    n2 = sum(c["c"] * (c["c"] - 1) // 2 for c in cols)
    # rounding happens in Spark SQL (half-away, = DuckDB ROUND) —
    # never Python round() (half-even; CLAUDE.md rule)
    raw = spark.createDataFrame(
        [(int(n_total), int(c_val), int(d_val), int(n0 - n1), int(n0 - n2))],
        "n bigint, concordant bigint, discordant bigint, dr bigint, dc bigint",
    )
    return raw.select(
        "n",
        "concordant",
        "discordant",
        F.round(
            (F.col("concordant") - F.col("discordant")).cast("double")
            / F.sqrt(F.col("dr").cast("double") * F.col("dc").cast("double")),
            6,
        ).alias("tau_b"),
    )


KENDALL_TAUB_SQL = """
WITH cells AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS pri,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
cd AS (
  SELECT
    CAST(SUM(CASE WHEN b.yr > a.yr AND b.pri > a.pri THEN a.n * b.n ELSE 0 END) AS BIGINT) AS c,
    CAST(SUM(CASE WHEN b.yr > a.yr AND b.pri < a.pri THEN a.n * b.n ELSE 0 END) AS BIGINT) AS d
  FROM cells a, cells b
),
t AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         CAST((SELECT SUM(r * (r - 1) // 2) FROM (SELECT SUM(n) AS r FROM cells GROUP BY yr)) AS BIGINT) AS n1,
         CAST((SELECT SUM(c * (c - 1) // 2) FROM (SELECT SUM(n) AS c FROM cells GROUP BY pri)) AS BIGINT) AS n2
  FROM cells
)
SELECT n_total AS n, cd.c AS concordant, cd.d AS discordant,
       ROUND(CAST(cd.c - cd.d AS DOUBLE)
             / SQRT(CAST(n_total * (n_total - 1) // 2 - n1 AS DOUBLE)
                    * CAST(n_total * (n_total - 1) // 2 - n2 AS DOUBLE)), 6) AS tau_b
FROM cd, t
"""

QUERIES["orders_priority_kendall_taub"] = orders_priority_kendall_taub
ORACLE["orders_priority_kendall_taub"] = KENDALL_TAUB_SQL


def suppliers_similar_portfolios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity similarity by basket: supplier pairs whose PART
    PORTFOLIOS overlap (Jaccard of the distinct part sets each
    supplier has shipped, ≥ 0.10) — the dual-sourcing / substitute-
    vendor screen, and the same inverted-index machinery as the
    document dedup miners applied to relational entities.

    Scale design: lineitem collapses to DISTINCT (supplier, part)
    pairs ONCE (map-side partial distinct); candidates come from the
    part-keyed inverted index (suppliers sharing a part — never a
    supplier×supplier cross join); portfolio sizes join back onto the
    candidate-pair table (pair-sized, not stream-sized). A df=1 part
    (single-supplier) can never produce a pair and is pruned free by
    the self-join itself."""
    # keeps the distinct + p-keyed self-join build: the checkpointed
    # collect_set/explode pair enumeration A/B-LOST here (r10 opt:
    # old 3.65 vs new 5.00 min-of-3, consistent reps — each part has
    # few suppliers, so the array build pays more than the join saves)
    # r11 opt: eager checkpoint — sp feeds 4 readers in one DAG (the
    # inverted-index self-join's two sides + the sizes agg twice), so
    # the lineitem scan + distinct otherwise re-executes per reader
    # (the triangle-family exchange-reuse lesson). A/B numbers in
    # OPTIMIZATION_r11.md.
    sp = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_suppkey").alias("s"), F.col("l_partkey").alias("p"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sizes = sp.groupBy("s").agg(F.count(F.lit(1)).alias("n"))
    a = sp.select(F.col("s").alias("s_a"), "p")
    b = sp.select(F.col("s").alias("s_b"), "p")
    common = (
        a.join(b, "p")
        .where(F.col("s_a") < F.col("s_b"))
        .groupBy("s_a", "s_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    paired = common.join(
        sizes.select(F.col("s").alias("s_a"), F.col("n").alias("n_a")), "s_a"
    ).join(sizes.select(F.col("s").alias("s_b"), F.col("n").alias("n_b")), "s_b")
    jac = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return (
        paired.where(jac >= 0.10)
        .select(
            "s_a",
            "s_b",
            "n_common",
            F.round(jac, 6).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "s_a", "s_b")
        .limit(50)
    )


SUPPLIERS_PORTFOLIO_SQL = """
WITH sp AS (SELECT DISTINCT l_suppkey AS s, l_partkey AS p FROM lineitem),
sizes AS (SELECT s, COUNT(*) AS n FROM sp GROUP BY 1),
common AS (
  SELECT a.s AS s_a, b.s AS s_b, COUNT(*) AS n_common
  FROM sp a JOIN sp b ON a.p = b.p AND a.s < b.s
  GROUP BY 1, 2
)
SELECT s_a, s_b, CAST(n_common AS BIGINT) AS n_common,
       ROUND(CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE), 6)
         AS jaccard
FROM common
JOIN sizes sa ON sa.s = s_a
JOIN sizes sb ON sb.s = s_b
WHERE CAST(n_common AS DOUBLE) / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.10
ORDER BY jaccard DESC, s_a, s_b
LIMIT 50
"""

QUERIES["suppliers_similar_portfolios"] = suppliers_similar_portfolios
ORACLE["suppliers_similar_portfolios"] = SUPPLIERS_PORTFOLIO_SQL


_DID_SPLIT = "1997-01-01"


def parts_promo_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the PROMO effect: how
    did average discounted revenue per line item move for PROMO parts
    vs non-PROMO parts, before vs after 1997 — the causal-inference
    workhorse for "did the campaign do anything beyond the market
    trend". DiD = (promo_after − promo_before) − (other_after −
    other_before).

    Scale design: lineitem joins part on partkey once (AQE-sized; no
    broadcast hint — part scales with SF) and collapses to the 2×2
    (cohort, period) DECIMAL cells in the same map-side-combined agg;
    the estimate is arithmetic on four exact cells. Group means are
    IEEE divisions of exact sums, identical on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_shipdate") < F.lit(_DID_SPLIT).cast("date")).alias("before"),
        (money("l_extendedprice") * (F.lit(1).cast("decimal(5,2)") - F.col("l_discount").cast("decimal(5,2)"))).alias("rev"),
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("promo")
    )
    cells = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("promo", "before")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("rev").alias("s"))
    )
    wide = cells.agg(
        *[
            F.max(
                F.when(
                    (F.col("promo") == pr) & (F.col("before") == be),
                    F.col("s").cast("double") / F.col("n").cast("double"),
                )
            ).alias(f"m_{'p' if pr else 'o'}_{'b' if be else 'a'}")
            for pr in (True, False)
            for be in (True, False)
        ],
        F.sum("n").alias("n_items"),
    )
    did = (F.col("m_p_a") - F.col("m_p_b")) - (F.col("m_o_a") - F.col("m_o_b"))
    return wide.select(
        F.col("n_items").cast("bigint").alias("n_items"),
        F.round("m_p_b", 6).alias("promo_before"),
        F.round("m_p_a", 6).alias("promo_after"),
        F.round("m_o_b", 6).alias("other_before"),
        F.round("m_o_a", 6).alias("other_after"),
        F.round(did, 6).alias("did_estimate"),
    )


PARTS_PROMO_DID_SQL = f"""
WITH cells AS (
  SELECT p.p_type LIKE 'PROMO%' AS promo,
         l.l_shipdate < DATE '{_DID_SPLIT}' AS before,
         COUNT(*) AS n,
         SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(5,2)) - CAST(l.l_discount AS DECIMAL(5,2)))) AS s
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
wide AS (
  SELECT
    MAX(CASE WHEN promo AND before THEN CAST(s AS DOUBLE) / n END) AS m_p_b,
    MAX(CASE WHEN promo AND NOT before THEN CAST(s AS DOUBLE) / n END) AS m_p_a,
    MAX(CASE WHEN NOT promo AND before THEN CAST(s AS DOUBLE) / n END) AS m_o_b,
    MAX(CASE WHEN NOT promo AND NOT before THEN CAST(s AS DOUBLE) / n END) AS m_o_a,
    CAST(SUM(n) AS BIGINT) AS n_items
  FROM cells
)
SELECT n_items,
       ROUND(m_p_b, 6) AS promo_before,
       ROUND(m_p_a, 6) AS promo_after,
       ROUND(m_o_b, 6) AS other_before,
       ROUND(m_o_a, 6) AS other_after,
       ROUND((m_p_a - m_p_b) - (m_o_a - m_o_b), 6) AS did_estimate
FROM wide
"""

QUERIES["parts_promo_did"] = parts_promo_did
ORACLE["parts_promo_did"] = PARTS_PROMO_DID_SQL


def nations_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilson score interval (1927) for the per-nation line-item
    RETURN RATE — interval estimation, the piece a point-estimate
    league table misses: a nation with 3/9 returns must not outrank
    one with 250/1000 just because 0.33 > 0.25; the Wilson lower
    bound is the ranking statistic reddit-style systems use.

    Scale design: one supplier-keyed join (AQE-sized) + broadcast
    nation, then ONE map-side-combined agg to 25 (returns, total)
    integer cells; the interval is closed-form IEEE on exact counts
    (z = 1.96), identical on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", (F.col("l_returnflag") == "R").alias("ret")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.when(F.col("ret"), 1).otherwise(0)).cast("long").alias("n_returned"),
        )
    )
    z2 = 1.96 * 1.96
    nn = F.col("n_items").cast("double")
    p = F.col("n_returned").cast("double") / nn
    center = (p + z2 / (2.0 * nn)) / (1.0 + z2 / nn)
    half = (
        F.lit(1.96)
        * F.sqrt(p * (1.0 - p) / nn + z2 / (4.0 * nn * nn))
        / (1.0 + z2 / nn)
    )
    return cells.select(
        F.col("n_name").alias("nation"),
        "n_items",
        "n_returned",
        F.round(p, 6).alias("rate"),
        F.round(center - half, 6).alias("wilson_lo"),
        F.round(center + half, 6).alias("wilson_hi"),
    ).orderBy("nation")


NATIONS_WILSON_SQL = """
WITH cells AS (
  SELECT n.n_name AS nation,
         COUNT(*) AS n_items,
         CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_returned
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1
)
SELECT nation, n_items, n_returned,
       ROUND(CAST(n_returned AS DOUBLE) / n_items, 6) AS rate,
       ROUND(((CAST(n_returned AS DOUBLE) / n_items) + (1.96 * 1.96) / (2.0 * n_items))
               / (1.0 + (1.96 * 1.96) / n_items)
             - 1.96 * SQRT((CAST(n_returned AS DOUBLE) / n_items)
                           * (1.0 - CAST(n_returned AS DOUBLE) / n_items) / n_items
                           + (1.96 * 1.96) / (4.0 * CAST(n_items AS DOUBLE) * n_items))
               / (1.0 + (1.96 * 1.96) / n_items), 6) AS wilson_lo,
       ROUND(((CAST(n_returned AS DOUBLE) / n_items) + (1.96 * 1.96) / (2.0 * n_items))
               / (1.0 + (1.96 * 1.96) / n_items)
             + 1.96 * SQRT((CAST(n_returned AS DOUBLE) / n_items)
                           * (1.0 - CAST(n_returned AS DOUBLE) / n_items) / n_items
                           + (1.96 * 1.96) / (4.0 * CAST(n_items AS DOUBLE) * n_items))
               / (1.0 + (1.96 * 1.96) / n_items), 6) AS wilson_hi
FROM cells ORDER BY nation
"""

QUERIES["nations_return_rate_wilson"] = nations_return_rate_wilson
ORACLE["nations_return_rate_wilson"] = NATIONS_WILSON_SQL


def lineitem_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across the three return-flag groups on line-item
    quantity: between/within sums of squares and the F statistic —
    the "do ANY of the groups differ" omnibus test that precedes
    pairwise comparisons (Mann–Whitney here covers the pairwise
    case).

    Scale design: ONE map-side-combined agg to k=3 rows of integer
    sufficient statistics (n, Σx, Σx²); SSB/SSW come from those via
    exact integer cross-multiplication (kept n-scaled to avoid any
    division before the final expression), and F is one closing IEEE
    expression identical on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("long").alias("x")
    )
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("s2"),
    )
    # Σ_g s1_g²/n_g: each term is one IEEE op on exact longs, but a
    # plain SUM of doubles adds in engine-dependent order — fold the
    # flag-sorted term list SEQUENTIALLY instead (bit-identical on
    # both engines; the embedding_quantize list_reduce pattern)
    term = (
        F.col("s1").cast("double")
        * F.col("s1").cast("double")
        / F.col("n").cast("double")
    )
    tot = g.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("n_tot"),
        F.sum("s1").cast("long").alias("s1_tot"),
        F.sum("s2").cast("long").alias("s2_tot"),
        F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("l_returnflag").alias("f"), term.alias("t")))
                ),
                lambda x: x["t"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("ssb_term"),
    )
    ssb = F.col("ssb_term") - (
        F.col("s1_tot").cast("double")
        * F.col("s1_tot").cast("double")
        / F.col("n_tot").cast("double")
    )
    ssw = F.col("s2_tot").cast("double") - F.col("ssb_term")
    f_stat = (ssb / (F.col("k") - 1).cast("double")) / (
        ssw / (F.col("n_tot") - F.col("k")).cast("double")
    )
    return tot.select(
        "k",
        "n_tot",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(f_stat, 6).alias("f_stat"),
    )


LINEITEM_ANOVA_SQL = """
WITH g AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s1,
         CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS s2
  FROM lineitem GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_tot,
         CAST(SUM(s1) AS BIGINT) AS s1_tot,
         CAST(SUM(s2) AS BIGINT) AS s2_tot,
         list_reduce(list_prepend(0.0,
           list_transform(
             list_sort(list(ROW(l_returnflag,
                                CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))),
             r -> r[2])),
           (a, x) -> a + x) AS ssb_term
  FROM g
)
SELECT k, n_tot,
       ROUND(ssb_term - CAST(s1_tot AS DOUBLE) * CAST(s1_tot AS DOUBLE)
                        / CAST(n_tot AS DOUBLE), 6) AS ss_between,
       ROUND(CAST(s2_tot AS DOUBLE) - ssb_term, 6) AS ss_within,
       ROUND((ssb_term - CAST(s1_tot AS DOUBLE) * CAST(s1_tot AS DOUBLE)
                         / CAST(n_tot AS DOUBLE)) / CAST(k - 1 AS DOUBLE)
             / ((CAST(s2_tot AS DOUBLE) - ssb_term) / CAST(n_tot - k AS DOUBLE)), 6)
         AS f_stat
FROM tot
"""

QUERIES["lineitem_anova_f"] = lineitem_anova_f
ORACLE["lineitem_anova_f"] = LINEITEM_ANOVA_SQL


def parts_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres, Paasche and Fisher price indices for 1996 vs 1995
    over the common part basket — the price-statistics counterpart of
    the revenue bridge (nations_revenue_decomposition): Laspeyres
    weights by base-period quantities, Paasche by current, Fisher is
    their geometric mean.

    Scale design: lineitem collapses ONCE to per-(part, year) DECIMAL
    (qty, revenue) cells; unit prices p = rev/qty per cell; the
    basket join is part-keyed on the cell table (part-cardinality,
    not line-cardinality). Index numerators/denominators are
    flag-sorted SEQUENTIAL folds of per-part IEEE terms (engine-
    identical; plain double SUM order is engine-dependent), and each
    index is one closing division."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.year("l_shipdate").alias("yr"),
        F.col("l_quantity").cast("decimal(18,2)").alias("q"),
        money("l_extendedprice").alias("r"),
    ).where(F.col("yr").isin(1995, 1996))
    cells = li.groupBy("l_partkey", "yr").agg(
        F.sum("q").alias("q"), F.sum("r").alias("r")
    )
    wide = (
        cells.groupBy("l_partkey")
        .agg(
            F.max(F.when(F.col("yr") == 1995, F.col("q"))).alias("q0"),
            F.max(F.when(F.col("yr") == 1995, F.col("r"))).alias("r0"),
            F.max(F.when(F.col("yr") == 1996, F.col("q"))).alias("q1"),
            F.max(F.when(F.col("yr") == 1996, F.col("r"))).alias("r1"),
        )
        .where(
            F.col("q0").isNotNull()
            & F.col("q1").isNotNull()
            & (F.col("q0") > 0)
            & (F.col("q1") > 0)
        )
    )
    p0 = F.col("r0").cast("double") / F.col("q0").cast("double")
    p1 = F.col("r1").cast("double") / F.col("q1").cast("double")
    q0d = F.col("q0").cast("double")
    q1d = F.col("q1").cast("double")
    terms = wide.select(
        "l_partkey",
        (p1 * q0d).alias("l_num"),
        (p0 * q0d).alias("l_den"),
        (p1 * q1d).alias("p_num"),
        (p0 * q1d).alias("p_den"),
    )

    def fold(col):
        return F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("l_partkey").alias("k"), F.col(col).alias("t"))
                    )
                ),
                lambda x: x["t"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    def fold2(col):
        return F.aggregate(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(F.col("bucket").alias("k"), F.col(col).alias("t"))
                    )
                ),
                lambda x: x["t"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    per_bucket = terms.withColumn("bucket", F.col("l_partkey") % 1024).groupBy(
        "bucket"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        fold("l_num").alias("l_num"),
        fold("l_den").alias("l_den"),
        fold("p_num").alias("p_num"),
        fold("p_den").alias("p_den"),
    )
    agg = per_bucket.agg(
        F.sum("n_parts").cast("long").alias("n_parts"),
        fold2("l_num").alias("ln_"),
        fold2("l_den").alias("ld_"),
        fold2("p_num").alias("pn_"),
        fold2("p_den").alias("pd_"),
    )
    lasp = F.col("ln_") / F.col("ld_")
    paas = F.col("pn_") / F.col("pd_")
    return agg.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


PARTS_PRICE_INDEX_SQL = """
WITH cells AS (
  SELECT l_partkey, CAST(year(l_shipdate) AS INTEGER) AS yr,
         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS r
  FROM lineitem WHERE year(l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2
),
wide AS (
  SELECT l_partkey,
         MAX(CASE WHEN yr = 1995 THEN q END) AS q0,
         MAX(CASE WHEN yr = 1995 THEN r END) AS r0,
         MAX(CASE WHEN yr = 1996 THEN q END) AS q1,
         MAX(CASE WHEN yr = 1996 THEN r END) AS r1
  FROM cells GROUP BY 1
),
terms AS (
  SELECT l_partkey,
         (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)) * CAST(q0 AS DOUBLE) AS l_num,
         (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)) * CAST(q0 AS DOUBLE) AS l_den,
         (CAST(r1 AS DOUBLE) / CAST(q1 AS DOUBLE)) * CAST(q1 AS DOUBLE) AS p_num,
         (CAST(r0 AS DOUBLE) / CAST(q0 AS DOUBLE)) * CAST(q1 AS DOUBLE) AS p_den
  FROM wide
  WHERE q0 IS NOT NULL AND q1 IS NOT NULL AND q0 > 0 AND q1 > 0
),
per_bucket AS (
  SELECT l_partkey % 1024 AS bucket,
         CAST(COUNT(*) AS BIGINT) AS n_parts,
         list_reduce(list_prepend(0.0, list_transform(
           list_sort(list(ROW(l_partkey, l_num))), r -> r[2])), (a, x) -> a + x) AS l_num,
         list_reduce(list_prepend(0.0, list_transform(
           list_sort(list(ROW(l_partkey, l_den))), r -> r[2])), (a, x) -> a + x) AS l_den,
         list_reduce(list_prepend(0.0, list_transform(
           list_sort(list(ROW(l_partkey, p_num))), r -> r[2])), (a, x) -> a + x) AS p_num,
         list_reduce(list_prepend(0.0, list_transform(
           list_sort(list(ROW(l_partkey, p_den))), r -> r[2])), (a, x) -> a + x) AS p_den
  FROM terms GROUP BY 1
),
agg AS (
  SELECT CAST(SUM(n_parts) AS BIGINT) AS n_parts,
         list_reduce(list_prepend(0.0, list_transform(
           list_sort(list(ROW(bucket, l_num))), r -> r[2])), (a, x) -> a + x) AS ln_,
         list_reduce(list_prepend(0.0, list_transform(
           list_sort(list(ROW(bucket, l_den))), r -> r[2])), (a, x) -> a + x) AS ld_,
         list_reduce(list_prepend(0.0, list_transform(
           list_sort(list(ROW(bucket, p_num))), r -> r[2])), (a, x) -> a + x) AS pn_,
         list_reduce(list_prepend(0.0, list_transform(
           list_sort(list(ROW(bucket, p_den))), r -> r[2])), (a, x) -> a + x) AS pd_
  FROM per_bucket
)
SELECT n_parts,
       ROUND(ln_ / ld_, 6) AS laspeyres,
       ROUND(pn_ / pd_, 6) AS paasche,
       ROUND(SQRT((ln_ / ld_) * (pn_ / pd_)), 6) AS fisher
FROM agg
"""

QUERIES["parts_price_index_fisher"] = parts_price_index_fisher
ORACLE["parts_price_index_fisher"] = PARTS_PRICE_INDEX_SQL


def lineitem_theil_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil T inequality index of supplier revenue, decomposed into
    its between-nation and within-nation components (Theil 1967) —
    the additive complement to the Gini/Lorenz/HHI battery: unlike
    Gini, Theil tells you WHERE the concentration lives (countries
    diverging vs suppliers within a country diverging).

    Determinism: per-supplier revenues are DECIMAL-exact sums; every
    logarithmic term is computed in IEEE from 2dp-rounded decimal
    scalars (identical per-row on both engines), rounded at 6dp and
    DECIMAL-summed — the entropy/logprob discipline, so no sum is
    shuffle-order-dependent.

    Scale: lineitem collapses to the supplier revenue table in ONE
    map-side-combined shuffle; everything after is supplier-count
    sized with a broadcast nation join and broadcast 1-row grand
    totals. T_total, T_between, T_within are each independent rounded
    term-sums (the between+within=total identity holds only in exact
    math and is deliberately not asserted)."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", disc_price().alias("rev")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    # supplier-count-sized and read by FOUR branches (grand, bynat,
    # t_total, t_within) — 9 scans of the three tables in the
    # executed plan, but a checkpoint A/B-LOST at sf0.1 (eager 1.04 /
    # lazy 0.86 / plain 0.88 min-of-3): each re-collapse is one cheap
    # map-side-combined agg. At fact-table scale, persist ps.
    ps = (
        l.groupBy("l_suppkey")
        .agg(F.sum("rev").alias("x"))
        .join(supp, "l_suppkey")
        .join(F.broadcast(nat), "s_nationkey")
        .select("l_suppkey", "n_name", F.round("x", 2).cast("double").alias("xr"))
    )
    grand = ps.agg(
        F.round(F.sum(F.col("xr").cast("decimal(18,2)")), 2).cast("double").alias("xd"),
        F.count(F.lit(1)).cast("double").alias("nd"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    bynat = ps.groupBy("n_name").agg(
        F.round(F.sum(F.col("xr").cast("decimal(18,2)")), 2).cast("double").alias("xgd"),
        F.count(F.lit(1)).cast("double").alias("ngd"),
    )
    term6 = lambda c: F.round(c, 6).cast("decimal(18,6)")  # noqa: E731
    t_total = (
        ps.join(F.broadcast(grand.select("xd", "nd")), F.lit(True))
        .select(
            term6(
                (F.col("xr") / F.col("xd"))
                * F.log(F.col("nd") * F.col("xr") / F.col("xd"))
            ).alias("t")
        )
        .agg(F.round(F.sum("t").cast("double"), 6).alias("theil_total"))
    )
    t_between = (
        bynat.join(F.broadcast(grand.select("xd", "nd")), F.lit(True))
        .select(
            term6(
                (F.col("xgd") / F.col("xd"))
                * F.log(
                    (F.col("xgd") / F.col("xd")) / (F.col("ngd") / F.col("nd"))
                )
            ).alias("t")
        )
        .agg(F.round(F.sum("t").cast("double"), 6).alias("theil_between"))
    )
    tg = (
        ps.join(bynat, "n_name")
        .select(
            "n_name",
            term6(
                (F.col("xr") / F.col("xgd"))
                * F.log(F.col("ngd") * F.col("xr") / F.col("xgd"))
            ).alias("t"),
        )
        .groupBy("n_name")
        .agg(F.sum("t").cast("double").alias("t_g"))
    )
    t_within = (
        tg.join(bynat, "n_name")
        .join(F.broadcast(grand.select("xd")), F.lit(True))
        .select(term6((F.col("xgd") / F.col("xd")) * F.col("t_g")).alias("t"))
        .agg(F.round(F.sum("t").cast("double"), 6).alias("theil_within"))
    )
    return (
        grand.select("n_suppliers")
        .join(F.broadcast(t_total), F.lit(True))
        .join(F.broadcast(t_between), F.lit(True))
        .join(F.broadcast(t_within), F.lit(True))
    )


LINEITEM_THEIL_SQL = """
WITH ps0 AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(5,2)))) AS x
  FROM lineitem GROUP BY 1
),
ps AS (
  SELECT ps0.l_suppkey, n_name, CAST(ROUND(x, 2) AS DOUBLE) AS xr
  FROM ps0
  JOIN supplier ON s_suppkey = ps0.l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
),
grand AS (
  SELECT CAST(ROUND(SUM(CAST(xr AS DECIMAL(18,2))), 2) AS DOUBLE) AS xd,
         CAST(COUNT(*) AS DOUBLE) AS nd,
         COUNT(*) AS n_suppliers
  FROM ps
),
bynat AS (
  SELECT n_name,
         CAST(ROUND(SUM(CAST(xr AS DECIMAL(18,2))), 2) AS DOUBLE) AS xgd,
         CAST(COUNT(*) AS DOUBLE) AS ngd
  FROM ps GROUP BY 1
),
tt AS (
  SELECT ROUND(SUM(CAST(ROUND((xr / xd) * LN(nd * xr / xd), 6)
                        AS DECIMAL(18,6))) :: DOUBLE, 6) AS theil_total
  FROM ps, grand
),
tb AS (
  SELECT ROUND(SUM(CAST(ROUND((xgd / xd) * LN((xgd / xd) / (ngd / nd)), 6)
                        AS DECIMAL(18,6))) :: DOUBLE, 6) AS theil_between
  FROM bynat, grand
),
tgrp AS (
  SELECT ps.n_name,
         CAST(SUM(CAST(ROUND((xr / xgd) * LN(ngd * xr / xgd), 6)
                       AS DECIMAL(18,6))) AS DOUBLE) AS t_g
  FROM ps JOIN bynat ON bynat.n_name = ps.n_name
  GROUP BY 1
),
tw AS (
  SELECT ROUND(SUM(CAST(ROUND((xgd / xd) * t_g, 6)
                        AS DECIMAL(18,6))) :: DOUBLE, 6) AS theil_within
  FROM tgrp
  JOIN bynat ON bynat.n_name = tgrp.n_name, grand
)
SELECT n_suppliers, theil_total, theil_between, theil_within
FROM grand, tt, tb, tw
"""

QUERIES["lineitem_theil_decomposition"] = lineitem_theil_decomposition
ORACLE["lineitem_theil_decomposition"] = LINEITEM_THEIL_SQL


def orders_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D earth-mover (Wasserstein-1) distance between the early
    (< 1998) and late (≥ 1998) order-value distributions — the
    metric-aware complement to PSI/KS: it weighs HOW FAR mass moved,
    not just that bins changed, so a uniform $50 price creep scores
    proportionally where KS saturates.

    Exactness: W1 = ∫|F_A − F_B| dx on the $100-bucket grid, computed
    entirely in integers — per-bin |C_A·n_B − C_B·n_A| times the gap
    to the next occupied bucket — with ONE final bigint/bigint IEEE
    division (both operands < 2^53), so no rounding anywhere and no
    .5e-6 ROUND trap. Bucketing is explicit FLOOR on an identical
    double expression (never a bare double→int cast: DuckDB rounds,
    Spark truncates).

    Scale: one map-side-combined histogram groupBy collapses the
    table; the CDF window runs on histogram-sized data (the
    histogram-CDF house pattern); totals broadcast back."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(FLOOR(o_totalprice / 100.0) AS BIGINT)").alias("bucket"),
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("date"))
        .cast("int")
        .alias("early"),
    )
    hist = o.groupBy("bucket").agg(
        F.sum("early").cast("bigint").alias("ca"),
        F.sum(1 - F.col("early")).cast("bigint").alias("cb"),
    )
    tot = hist.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = hist.select(
        "bucket",
        F.sum("ca").over(w).alias("cca"),
        F.sum("cb").over(w).alias("ccb"),
        F.lead("bucket").over(Window.orderBy("bucket")).alias("nxt"),
    )
    num = (
        cum.join(F.broadcast(tot), F.lit(True))
        .select(
            (
                F.abs(F.col("cca") * F.col("nb") - F.col("ccb") * F.col("na"))
                * F.coalesce((F.col("nxt") - F.col("bucket")) * 100, F.lit(0))
            ).alias("contrib")
        )
        .agg(F.sum("contrib").cast("bigint").alias("num"))
    )
    return (
        tot.join(F.broadcast(num), F.lit(True))
        .select(
            "na",
            "nb",
            "n_bins",
            (
                F.col("num").cast("double") / (F.col("na") * F.col("nb")).cast("double")
            ).alias("w1_distance"),
        )
        .withColumnRenamed("na", "n_early")
        .withColumnRenamed("nb", "n_late")
    )


ORDERS_WASSERSTEIN_SQL = """
WITH b AS (
  SELECT CAST(FLOOR(o_totalprice / 100.0) AS BIGINT) AS bucket,
         CASE WHEN o_orderdate < DATE '1998-01-01' THEN 1 ELSE 0 END AS early
  FROM orders
),
hist AS (
  SELECT bucket, CAST(SUM(early) AS BIGINT) AS ca,
         CAST(SUM(1 - early) AS BIGINT) AS cb
  FROM b GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
         COUNT(*) AS n_bins
  FROM hist
),
cum AS (
  SELECT bucket,
         SUM(ca) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cca,
         SUM(cb) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS ccb,
         LEAD(bucket) OVER (ORDER BY bucket) AS nxt
  FROM hist
),
num AS (
  SELECT CAST(SUM(ABS(cca * nb - ccb * na)
              * COALESCE((nxt - bucket) * 100, 0)) AS BIGINT) AS num
  FROM cum, tot
)
SELECT na AS n_early, nb AS n_late, n_bins,
       CAST(num AS DOUBLE) / CAST(na * nb AS DOUBLE) AS w1_distance
FROM tot, num
"""

QUERIES["orders_wasserstein_drift"] = orders_wasserstein_drift
ORACLE["orders_wasserstein_drift"] = ORDERS_WASSERSTEIN_SQL


def parts_abc_xyz_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC-XYZ inventory segmentation matrix — the planner's 2-D view
    that crosses revenue importance (A: first 80% of cumulative
    revenue, B: to 95%, C: tail) with demand PREDICTABILITY from the
    coefficient of variation of monthly demand (X: CV ≤ 0.5 steady,
    Y: CV ≤ 1 variable, Z: erratic or <2 observed months). A-X parts
    get safety stock; C-Z parts get made to order.

    Exactness: all money/quantity moves as INTEGER CENTS (2dp doubles
    ×100 are whole-valued decimals — exact bigint), so cumulative
    shares and CV thresholds are integer cross-multiplications:
    A ⇔ 5·cum ≤ 4·total, X ⇔ 4·(n·Σx²−S²) ≤ S², Y ⇔ n·Σx²−S² ≤ S²
    — zero division or rounding anywhere until the final /100.0.

    Scale: ONE part-grain revenue agg + ONE (part, month) demand agg;
    the ABC window runs on the |parts|-sized frame ordered by
    revenue (histogram-CDF family), XYZ stats are map-side sums;
    the closing matrix is a 9-cell agg."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        (money("l_extendedprice") * 100).cast("bigint").alias("rev_c"),
        (F.col("l_quantity").cast("decimal(12,2)") * 100).cast("bigint").alias("qty_c"),
    )
    rev = l.groupBy("l_partkey").agg(F.sum("rev_c").alias("r"))
    w = Window.orderBy(F.col("r").desc(), F.col("l_partkey").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = rev.agg(F.sum("r").alias("t"))
    abc = (
        rev.withColumn("cum", F.sum("r").over(w))
        .join(F.broadcast(tot), F.lit(True))
        .select(
            "l_partkey",
            "r",
            F.when(5 * F.col("cum") <= 4 * F.col("t"), "A")
            .when(20 * F.col("cum") <= 19 * F.col("t"), "B")
            .otherwise("C")
            .alias("abc"),
        )
    )
    monthly = l.groupBy("l_partkey", "month").agg(F.sum("qty_c").alias("x"))
    xyz = monthly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    ).select(
        "l_partkey",
        F.when(F.col("n") < 2, "Z")
        .when(
            4 * (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
            <= F.col("s") * F.col("s"),
            "X",
        )
        .when(
            (F.col("n") * F.col("q") - F.col("s") * F.col("s"))
            <= F.col("s") * F.col("s"),
            "Y",
        )
        .otherwise("Z")
        .alias("xyz"),
    )
    return (
        abc.join(xyz, "l_partkey")
        .groupBy("abc", "xyz")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            (F.sum("r").cast("double") / 100.0).alias("revenue"),
        )
        .orderBy("abc", "xyz")
    )


PARTS_ABC_XYZ_SQL = """
WITH l AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS month,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS rev_c,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS qty_c
  FROM lineitem
),
rev AS (SELECT l_partkey, CAST(SUM(rev_c) AS BIGINT) AS r FROM l GROUP BY 1),
tot AS (SELECT CAST(SUM(r) AS BIGINT) AS t FROM rev),
abc AS (
  SELECT l_partkey, r,
         CASE WHEN 5 * SUM(r) OVER (ORDER BY r DESC, l_partkey ASC
                                    ROWS UNBOUNDED PRECEDING) <= 4 * t THEN 'A'
              WHEN 20 * SUM(r) OVER (ORDER BY r DESC, l_partkey ASC
                                     ROWS UNBOUNDED PRECEDING) <= 19 * t THEN 'B'
              ELSE 'C' END AS abc
  FROM rev, tot
),
monthly AS (
  SELECT l_partkey, month, CAST(SUM(qty_c) AS BIGINT) AS x FROM l GROUP BY 1, 2
),
xyz AS (
  SELECT l_partkey,
         CASE WHEN COUNT(*) < 2 THEN 'Z'
              WHEN 4 * (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                   <= SUM(x) * SUM(x) THEN 'X'
              WHEN (COUNT(*) * SUM(x * x) - SUM(x) * SUM(x))
                   <= SUM(x) * SUM(x) THEN 'Y'
              ELSE 'Z' END AS xyz
  FROM monthly GROUP BY 1
)
SELECT abc, xyz, COUNT(*) AS n_parts,
       CAST(SUM(r) AS DOUBLE) / 100.0 AS revenue
FROM abc JOIN xyz USING (l_partkey)
GROUP BY 1, 2 ORDER BY 1, 2
"""

QUERIES["parts_abc_xyz_matrix"] = parts_abc_xyz_matrix
ORACLE["parts_abc_xyz_matrix"] = PARTS_ABC_XYZ_SQL


def lineitem_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance two-sample t-test (Welch 1947) on
    extended price, returned ('R') vs neither ('N') line items — the
    pairwise follow-up to lineitem_anova_f's omnibus F (Welch because
    the two populations have no reason to share a variance).

    Engine-exact: sufficient statistics are DECIMAL sums (Σx at 2dp,
    Σx² at 4dp) accumulated in ONE map-side-combined conditional agg;
    Σx² is rounded to 0dp BEFORE the double cast so its scaled
    integer stays under 2^53 (the CLAUDE.md DECIMAL→DOUBLE
    boundary), after which mean/variance/t/dof are one closing IEEE
    expression written identically on both engines — no rounding, no
    transcendentals beyond correctly-rounded sqrt, so the outputs are
    bit-identical.

    Scale: one aggregation to a single row of moments; nothing else
    moves."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", money("l_extendedprice").alias("x")
    )
    xx = F.col("x") * F.col("x")

    def grp(flag):
        c = F.col("l_returnflag") == flag
        return [
            F.count(F.when(c, 1)).alias(f"n_{flag}"),
            F.sum(F.when(c, F.col("x"))).alias(f"s1_{flag}"),
            F.round(F.sum(F.when(c, xx)), 0).alias(f"s2_{flag}"),
        ]

    m = li.agg(*grp("R"), *grp("N"))
    n1, n2 = F.col("n_R").cast("double"), F.col("n_N").cast("double")
    s1r, s1n = F.col("s1_R").cast("double"), F.col("s1_N").cast("double")
    s2r, s2n = F.col("s2_R").cast("double"), F.col("s2_N").cast("double")
    m1, m2 = s1r / n1, s1n / n2
    v1 = (s2r - n1 * m1 * m1) / (n1 - F.lit(1.0))
    v2 = (s2n - n2 * m2 * m2) / (n2 - F.lit(1.0))
    se1, se2 = v1 / n1, v2 / n2
    t = (m1 - m2) / F.sqrt(se1 + se2)
    dof = (se1 + se2) * (se1 + se2) / (
        se1 * se1 / (n1 - F.lit(1.0)) + se2 * se2 / (n2 - F.lit(1.0))
    )
    return m.select(
        F.col("n_R").alias("n_r"),
        F.col("n_N").alias("n_n"),
        m1.alias("mean_r"),
        m2.alias("mean_n"),
        t.alias("t_stat"),
        dof.alias("welch_dof"),
    )


LINEITEM_WELCH_SQL = """
WITH m AS (
  SELECT COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS n_r,
         SUM(CASE WHEN l_returnflag = 'R'
                  THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS s1_r,
         ROUND(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(l_extendedprice AS DECIMAL(12,2)) END), 0) AS s2_r,
         COUNT(CASE WHEN l_returnflag = 'N' THEN 1 END) AS n_n,
         SUM(CASE WHEN l_returnflag = 'N'
                  THEN CAST(l_extendedprice AS DECIMAL(12,2)) END) AS s1_n,
         ROUND(SUM(CASE WHEN l_returnflag = 'N'
                        THEN CAST(l_extendedprice AS DECIMAL(12,2))
                           * CAST(l_extendedprice AS DECIMAL(12,2)) END), 0) AS s2_n
  FROM lineitem
),
d AS (
  SELECT n_r, n_n,
         CAST(n_r AS DOUBLE) AS dn1, CAST(n_n AS DOUBLE) AS dn2,
         CAST(s1_r AS DOUBLE) / CAST(n_r AS DOUBLE) AS m1,
         CAST(s1_n AS DOUBLE) / CAST(n_n AS DOUBLE) AS m2,
         CAST(s2_r AS DOUBLE) AS q1, CAST(s2_n AS DOUBLE) AS q2
  FROM m
),
v AS (
  SELECT *,
         (q1 - dn1 * m1 * m1) / (dn1 - 1.0) / dn1 AS se1,
         (q2 - dn2 * m2 * m2) / (dn2 - 1.0) / dn2 AS se2
  FROM d
)
SELECT n_r, n_n, m1 AS mean_r, m2 AS mean_n,
       (m1 - m2) / SQRT(se1 + se2) AS t_stat,
       (se1 + se2) * (se1 + se2)
         / (se1 * se1 / (dn1 - 1.0) + se2 * se2 / (dn2 - 1.0)) AS welch_dof
FROM v
"""

QUERIES["lineitem_welch_ttest"] = lineitem_welch_ttest
ORACLE["lineitem_welch_ttest"] = LINEITEM_WELCH_SQL


def customers_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (with average-tie ranks) between a
    customer's order COUNT and total SPEND — "do frequent buyers
    spend more" measured monotonically, complementing the parametric
    OLS and the concordance-based Kendall τ-b already in the suite.

    Engine-exact: centered doubled average ranks are INTEGERS
    (2·avgrank = 2·RANK() + tiecount − 1, so c2 = that − (n+1) is an
    exact integer with Σc2 = 0 by construction); all three moment
    sums are BIGINT-exact, and ρ = Sxy/(√Sxx·√Syy) is one closing
    IEEE expression — no rounding anywhere.

    Scale: the per-customer agg is one fact-table shuffle to the
    customer dimension; the rank windows sort that dimension (the
    known global-sort pinch — at 100 TB swap in histogram-CDF ranks,
    the house exact-quantile pattern; customer-dimension sorts are
    fine well past this SF)."""
    o = load_table(spark, sf_dir, "orders")
    per = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(money("o_totalprice")).alias("spend"),
    )
    w_all = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n = F.count(F.lit(1)).over(w_all)
    c2 = lambda col: (
        F.lit(2) * F.rank().over(Window.orderBy(col))
        + F.count(F.lit(1)).over(Window.partitionBy(col))
        - 1
        - (n + 1)
    ).cast("long")
    ranked = per.select(c2(F.col("cnt")).alias("cx"), c2(F.col("spend")).alias("cy"))
    s = ranked.agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("cx") * F.col("cy")).alias("sxy"),
        F.sum(F.col("cx") * F.col("cx")).alias("sxx"),
        F.sum(F.col("cy") * F.col("cy")).alias("syy"),
    )
    rho = F.col("sxy").cast("double") / (
        F.sqrt(F.col("sxx").cast("double")) * F.sqrt(F.col("syy").cast("double"))
    )
    return s.select("n_customers", rho.alias("rho_spearman"))


CUSTOMERS_SPEARMAN_SQL = """
WITH per AS (
  SELECT o_custkey, COUNT(*) AS cnt,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS spend
  FROM orders GROUP BY 1
),
ranked AS (
  SELECT 2 * RANK() OVER (ORDER BY cnt) + COUNT(*) OVER (PARTITION BY cnt)
           - 1 - (COUNT(*) OVER () + 1) AS cx,
         2 * RANK() OVER (ORDER BY spend) + COUNT(*) OVER (PARTITION BY spend)
           - 1 - (COUNT(*) OVER () + 1) AS cy
  FROM per
),
s AS (
  SELECT COUNT(*) AS n_customers,
         SUM(cx * cy) AS sxy, SUM(cx * cx) AS sxx, SUM(cy * cy) AS syy
  FROM ranked
)
SELECT n_customers,
       CAST(sxy AS DOUBLE) / (SQRT(CAST(sxx AS DOUBLE)) * SQRT(CAST(syy AS DOUBLE)))
         AS rho_spearman
FROM s
"""

QUERIES["customers_spearman"] = customers_spearman
ORACLE["customers_spearman"] = CUSTOMERS_SPEARMAN_SQL


def orders_little_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Little's law audit (L = λ·W) of the order fulfillment queue,
    per calendar year: arrival rate λ (orders started per day),
    cycle time W (avg days from order to last shipment), and BOTH
    sides of the identity — L estimated as λ·W vs L measured as the
    time-integral of work-in-progress over the year — the queueing
    sanity check a fulfillment dashboard runs to catch WIP leakage
    (orders that never close inflate measured L but not λ·W).

    Engine-exact: every quantity starts from integer day arithmetic
    (datediff overlaps, duration sums); the λ/W/L divisions and the
    λ·W product are IEEE on exact integers, identically associated on
    both engines — no rounding.

    Scale: completion = one lineitem→order groupBy (co-partitioned on
    the join key); the year expansion is a ≤7-row broadcast; the
    per-year rollup is map-side-combined."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("start")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    done = li.groupBy("l_orderkey").agg(F.max("ship").alias("finish"))
    span = o.join(done, o["o_orderkey"] == done["l_orderkey"]).select(
        "start", "finish", (F.datediff("finish", "start") + 1).alias("dur_days")
    )
    years = spark.range(1995, 2002).select(F.col("id").cast("int").alias("y"))
    ys = F.to_date(F.concat(F.col("y"), F.lit("-01-01")))
    ye = F.to_date(F.concat(F.col("y"), F.lit("-12-31")))
    j = span.crossJoin(F.broadcast(years)).where(
        (F.col("start") <= ye) & (F.col("finish") >= ys)
    )
    per = j.groupBy("y").agg(
        F.sum(
            F.datediff(F.least(F.col("finish"), ye), F.greatest(F.col("start"), ys))
            + 1
        ).alias("wip_days"),
        F.count(F.when(F.year("start") == F.col("y"), 1)).alias("n_started"),
        F.sum(F.when(F.year("start") == F.col("y"), F.col("dur_days"))).alias(
            "dur_sum"
        ),
        (F.datediff(F.max(ye), F.max(ys)) + 1).alias("days_in_year"),
    )
    lam = F.col("n_started").cast("double") / F.col("days_in_year").cast("double")
    w = F.col("dur_sum").cast("double") / F.col("n_started").cast("double")
    l_meas = F.col("wip_days").cast("double") / F.col("days_in_year").cast("double")
    return per.select(
        "y",
        "n_started",
        lam.alias("lambda_per_day"),
        w.alias("w_days"),
        (lam * w).alias("l_little"),
        l_meas.alias("l_measured"),
    ).orderBy("y")


ORDERS_LITTLE_LAW_SQL = """
WITH done AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS finish
  FROM lineitem GROUP BY 1
),
span AS (
  SELECT CAST(o_orderdate AS DATE) AS start, d.finish,
         datediff('day', CAST(o_orderdate AS DATE), d.finish) + 1 AS dur_days
  FROM orders o JOIN done d ON o.o_orderkey = d.l_orderkey
),
yrs AS (
  SELECT y, CAST(CAST(y AS VARCHAR) || '-01-01' AS DATE) AS ys,
            CAST(CAST(y AS VARCHAR) || '-12-31' AS DATE) AS ye
  FROM (SELECT UNNEST(range(1995, 2002)) AS y)
),
j AS (
  SELECT s.*, yrs.y, yrs.ys, yrs.ye FROM span s, yrs
  WHERE s.start <= yrs.ye AND s.finish >= yrs.ys
),
per AS (
  SELECT y,
         SUM(datediff('day', GREATEST(start, ys), LEAST(finish, ye)) + 1) AS wip_days,
         COUNT(CASE WHEN EXTRACT(year FROM start) = y THEN 1 END) AS n_started,
         SUM(CASE WHEN EXTRACT(year FROM start) = y THEN dur_days END) AS dur_sum,
         datediff('day', MAX(ys), MAX(ye)) + 1 AS days_in_year
  FROM j GROUP BY 1
)
SELECT CAST(y AS INTEGER) AS y, n_started,
       CAST(n_started AS DOUBLE) / CAST(days_in_year AS DOUBLE) AS lambda_per_day,
       CAST(dur_sum AS DOUBLE) / CAST(n_started AS DOUBLE) AS w_days,
       (CAST(n_started AS DOUBLE) / CAST(days_in_year AS DOUBLE))
         * (CAST(dur_sum AS DOUBLE) / CAST(n_started AS DOUBLE)) AS l_little,
       CAST(wip_days AS DOUBLE) / CAST(days_in_year AS DOUBLE) AS l_measured
FROM per ORDER BY y
"""

QUERIES["orders_little_law"] = orders_little_law
ORACLE["orders_little_law"] = ORDERS_LITTLE_LAW_SQL


def orders_peak_wip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak work-in-progress by boundary sweep (the interval-stabbing
    / skyline-count primitive): each order contributes +1 at its
    start day and −1 the day after its last shipment; the running
    sum over the day-boundary histogram IS the number of
    simultaneously open orders, and its per-year max (with the first
    day it is hit) is the capacity headline that complements
    orders_little_law's AVERAGE WIP — queues are provisioned for
    peaks, not means.

    Engine-exact: pure integer deltas and running sums; the argmax
    day is picked by explicit (wip DESC, day ASC) row_number — no
    floats at all.

    Scale: the fact table collapses to ±1 deltas on DISTINCT
    BOUNDARY DAYS (≤ 2·|days| rows) in one map-side-combined agg;
    the sweep is a single ordered window over that day histogram —
    the house histogram-CDF shape applied to intervals. At 100 TB
    the day histogram is still ~2500 rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("start")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    done = li.groupBy("l_orderkey").agg(F.max("ship").alias("finish"))
    span = o.join(done, o["o_orderkey"] == done["l_orderkey"])
    # r11 opt: the union of two selects over `span` re-executed the
    # orders⋈done join once per branch; one map-side explode emits
    # both boundary rows per order from a single pass (same (day, d)
    # stream, same integer agg — guide §2.4).
    deltas = (
        span.select(
            F.explode(
                F.array(
                    F.struct(F.col("start").alias("day"), F.lit(1).alias("d")),
                    F.struct(F.date_add("finish", 1).alias("day"), F.lit(-1).alias("d")),
                )
            ).alias("x")
        )
        .select("x.day", "x.d")
        .groupBy("day")
        .agg(F.sum("d").alias("delta"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    sweep = deltas.select("day", F.sum("delta").over(w).alias("wip"))
    wy = Window.partitionBy(F.year("day")).orderBy(
        F.col("wip").desc(), F.col("day").asc()
    )
    return (
        sweep.withColumn("rn", F.row_number().over(wy))
        .where(F.col("rn") == 1)
        .select(
            F.year("day").cast("int").alias("y"),
            F.date_format("day", "yyyy-MM-dd").alias("peak_day"),
            F.col("wip").alias("peak_wip"),
        )
        .orderBy("y")
    )


ORDERS_PEAK_WIP_SQL = """
WITH done AS (
  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS finish
  FROM lineitem GROUP BY 1
),
span AS (
  SELECT CAST(o_orderdate AS DATE) AS start, d.finish
  FROM orders o JOIN done d ON o.o_orderkey = d.l_orderkey
),
deltas AS (
  SELECT day, SUM(d) AS delta FROM (
    SELECT start AS day, 1 AS d FROM span
    UNION ALL
    SELECT finish + INTERVAL 1 DAY, -1 FROM span
  ) b GROUP BY 1
),
sweep AS (
  SELECT day, SUM(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS wip
  FROM deltas
),
ranked AS (
  SELECT EXTRACT(year FROM day) AS y, day, wip,
         ROW_NUMBER() OVER (PARTITION BY EXTRACT(year FROM day)
                            ORDER BY wip DESC, day ASC) AS rn
  FROM sweep
)
SELECT CAST(y AS INTEGER) AS y,
       strftime(day, '%Y-%m-%d') AS peak_day,
       CAST(wip AS BIGINT) AS peak_wip
FROM ranked WHERE rn = 1 ORDER BY y
"""

QUERIES["orders_peak_wip"] = orders_peak_wip
ORACLE["orders_peak_wip"] = ORDERS_PEAK_WIP_SQL


def lineitem_price_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand price elasticity of demand: the log-log regression
    slope of ln(quantity) on ln(unit price) across a brand's line
    items — GROUPED closed-form OLS (one slope per brand in a single
    agg), the pricing team's first-cut elasticity table; complements
    lineitem_ols_regression, which fits one global line.

    Engine-exact: per-term lns are 6dp DECIMALs (transcendental
    discipline); the five sufficient statistics are exact DECIMAL
    sums ROUNDED to 6dp before the double cast (keeping the scaled
    integer under 2^53), and slope/intercept are one identically-
    written closing IEEE expression per brand.

    Scale: one lineitem⨝part projection (join on the part hash,
    AQE-broadcast at this SF), ONE map-side-combined brand agg —
    25 output rows regardless of volume."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(p, li["l_partkey"] == p["p_partkey"]).select(
        "p_brand",
        F.round(F.log(F.col("l_extendedprice") / F.col("l_quantity")), 6)
        .cast("decimal(18,6)")
        .alias("lx"),
        F.round(F.log("l_quantity"), 6).cast("decimal(18,6)").alias("ly"),
    )
    g = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("lx"), 6).cast("double").alias("sx"),
        F.round(F.sum("ly"), 6).cast("double").alias("sy"),
        F.round(F.sum(F.col("lx") * F.col("ly")), 6).cast("double").alias("sxy"),
        F.round(F.sum(F.col("lx") * F.col("lx")), 6).cast("double").alias("sxx"),
    )
    n = F.col("n_items").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return g.select(
        "p_brand",
        "n_items",
        slope.alias("elasticity"),
        ((F.col("sy") - slope * F.col("sx")) / n).alias("intercept"),
    ).orderBy("p_brand")


LINEITEM_ELASTICITY_SQL = """
WITH j AS (
  SELECT p.p_brand,
         CAST(ROUND(LN(l_extendedprice / l_quantity), 6) AS DECIMAL(18,6)) AS lx,
         CAST(ROUND(LN(l_quantity), 6) AS DECIMAL(18,6)) AS ly
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
g AS (
  SELECT p_brand, COUNT(*) AS n_items,
         CAST(ROUND(SUM(lx), 6) AS DOUBLE) AS sx,
         CAST(ROUND(SUM(ly), 6) AS DOUBLE) AS sy,
         CAST(ROUND(SUM(lx * ly), 6) AS DOUBLE) AS sxy,
         CAST(ROUND(SUM(lx * lx), 6) AS DOUBLE) AS sxx
  FROM j GROUP BY 1
)
SELECT p_brand, n_items,
       (CAST(n_items AS DOUBLE) * sxy - sx * sy)
         / (CAST(n_items AS DOUBLE) * sxx - sx * sx) AS elasticity,
       (sy - (CAST(n_items AS DOUBLE) * sxy - sx * sy)
               / (CAST(n_items AS DOUBLE) * sxx - sx * sx) * sx)
         / CAST(n_items AS DOUBLE) AS intercept
FROM g ORDER BY p_brand
"""

QUERIES["lineitem_price_elasticity"] = lineitem_price_elasticity
ORACLE["lineitem_price_elasticity"] = LINEITEM_ELASTICITY_SQL


def parts_newsvendor_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newsvendor stocking levels per brand: the critical-fractile
    quantile q* = F⁻¹(0.8) of DAILY demand (the classic single-period
    inventory optimum at 80% service ratio), read exactly off the
    per-brand daily-demand histogram — the inventory planner's
    companion to parts_croston_forecast (Croston predicts the mean;
    the newsvendor stocks to a quantile).

    Engine-exact: daily demand is an integer quantity sum; the
    quantile is the histogram-CDF house pattern (smallest value whose
    inclusive CDF reaches ceil(0.8·n) — pure integer comparisons, no
    percentile interpolation), and achieved service is integer ppm.

    Scale: the fact table collapses in ONE agg to (brand, day)
    integers, then to the per-brand value histogram; the CDF window
    runs on histogram-sized data — never a raw-row sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.to_date("l_shipdate").alias("day"), "l_quantity"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    daily = (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "day")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
    )
    hist = daily.groupBy("p_brand", "q").agg(F.count(F.lit(1)).alias("c"))
    wcdf = Window.partitionBy("p_brand").orderBy("q").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("p_brand")
    cdf = hist.select(
        "p_brand",
        "q",
        F.sum("c").over(wcdf).alias("cum"),
        F.sum("c").over(wtot).alias("n_days"),
    )
    # smallest q with 5*cum >= 4*n  (cum/n >= 0.8 cross-multiplied)
    hit = cdf.where(F.col("cum") * 5 >= F.col("n_days") * 4)
    wmin = Window.partitionBy("p_brand").orderBy("q")
    q80 = hit.withColumn("rn", F.row_number().over(wmin)).where(F.col("rn") == 1)
    return q80.select(
        "p_brand",
        F.col("n_days").alias("n_days"),
        F.col("q").alias("stock_q80"),
        F.expr("cum * 1000000 DIV n_days").alias("service_ppm"),
    ).orderBy("p_brand")


PARTS_NEWSVENDOR_SQL = """
WITH daily AS (
  SELECT p.p_brand, CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
hist AS (SELECT p_brand, q, COUNT(*) AS c FROM daily GROUP BY 1, 2),
cdf AS (
  SELECT p_brand, q,
         SUM(c) OVER (PARTITION BY p_brand ORDER BY q ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY p_brand) AS n_days
  FROM hist
),
hit AS (
  SELECT p_brand, q, cum, n_days,
         ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY q) AS rn
  FROM cdf WHERE cum * 5 >= n_days * 4
)
SELECT p_brand, CAST(n_days AS BIGINT) AS n_days, q AS stock_q80,
       CAST(cum * 1000000 // n_days AS BIGINT) AS service_ppm
FROM hit WHERE rn = 1 ORDER BY p_brand
"""

QUERIES["parts_newsvendor_stock"] = parts_newsvendor_stock
ORACLE["parts_newsvendor_stock"] = PARTS_NEWSVENDOR_SQL


def lineitem_em_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-component 1-D Gaussian mixture on log unit price, fit by
    TWO unrolled EM iterations (Dempster 1977) with shared fixed
    variance — the soft-clustering counterpart of the hard k-means
    trajectory query: "is the price distribution one population or
    two" with responsibilities instead of assignments. Emits the
    (weight, μ₁, μ₂) trajectory per iteration; a broken E-step or a
    mis-normalized M-step shows up as a hash break in iteration 1.

    Engine-exact: x = 6dp ln; σ² and each responsibility r =
    sigmoid(L) are 6dp-rounded (absorbing libm exp/ln ulp); M-step
    numerators Σ r·x are per-term-rounded DECIMAL sums; every
    division is double-on-exact-decimals, re-rounded 6dp before the
    next iteration — the iterative-DECIMAL-update discipline. Init
    μ's are the exact 25th/75th percentiles via the histogram-CDF
    house pattern (cross-multiplied 4·cum ≥ n / ≥ 3n).

    Scale: each EM iteration is ONE map-side-combined scan agg over
    the fact table with model-sized broadcast scalars — the same
    shape as the logistic-regression trainer; the value histogram
    (distinct unit prices, part-dimension-sized) is the only sort."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.round(F.log(F.col("l_extendedprice") / F.col("l_quantity")), 6)
        .cast("decimal(18,6)")
        .alias("x")
    )
    # r10 opt: EVERY downstream read (CDF quantiles, moments, both EM
    # E-steps) depends on x alone, so the whole fit folds onto the
    # value histogram — lineitem is scanned ONCE (was 4 scans: hist +
    # moments + 2 EM passes). Per-x weighting by c is exact-DECIMAL
    # identical to the per-row sums (equal x ⇒ identical 6dp terms).
    hist = (
        li.groupBy("x").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(eager=True)
    )
    wcdf = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    cdf = hist.select(
        "x",
        F.sum("c").over(wcdf).alias("cum"),
        F.sum("c").over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    q25 = cdf.where(F.col("cum") * 4 >= F.col("n")).agg(F.min("x").alias("mu1"))
    q75 = cdf.where(F.col("cum") * 4 >= F.col("n") * 3).agg(F.min("x").alias("mu2"))
    # weighted moments off the histogram; narrow lossless recasts
    # (x ≤ 12, x² ≤ 150) keep the c-products inside DECIMAL(38)
    # without scale loss, so every sum equals the former per-row sum
    mom = hist.agg(
        F.sum("c").cast("long").alias("n"),
        F.sum(F.expr("CAST(x AS DECIMAL(8,6)) * CAST(c AS DECIMAL(20,0))")).alias("s"),
        F.round(
            F.sum(F.expr("CAST(x * x AS DECIMAL(15,12)) * CAST(c AS DECIMAL(20,0))")), 6
        ).alias("q"),
    )
    base = (
        mom.crossJoin(F.broadcast(q25))
        .crossJoin(F.broadcast(q75))
        .select(
            "n",
            F.expr(
                "CAST(ROUND((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
                " / n) / n, 6) AS DECIMAL(18,6))"
            ).alias("v"),
            "mu1",
            "mu2",
        )
    )
    state = base.select(
        "n", "v", "mu1", "mu2",
        F.lit(0.5).cast("decimal(18,6)").alias("w2"),
    )
    out = []
    for it in (1, 2):
        p = hist.crossJoin(F.broadcast(state))
        l_expr = (
            "CAST(ROUND(LN(CAST(w2 AS DOUBLE)) - LN(1.0 - CAST(w2 AS DOUBLE))"
            " + ((CAST(x AS DOUBLE) - CAST(mu1 AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(mu1 AS DOUBLE))"
            "  - (CAST(x AS DOUBLE) - CAST(mu2 AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(mu2 AS DOUBLE)))"
            " / (2.0 * CAST(v AS DOUBLE)), 6) AS DOUBLE)"
        )
        r_expr = f"CAST(ROUND(1.0 / (1.0 + EXP(-({l_expr}))), 6) AS DECIMAL(18,6))"
        scored = p.select(
            "n", "v", "x", "c", F.expr(r_expr).alias("r")
        )
        agg = scored.agg(
            F.max("n").alias("n"),
            F.max("v").alias("v"),
            F.sum(
                F.expr("CAST(r AS DECIMAL(7,6)) * CAST(c AS DECIMAL(20,0))")
            ).alias("n2"),
            F.sum(F.expr("CAST(CAST(ROUND(CAST(r AS DOUBLE) * CAST(x AS DOUBLE), 6)"
                         " AS DECIMAL(18,6)) AS DECIMAL(8,6))"
                         " * CAST(c AS DECIMAL(20,0))")).alias("sx2"),
            F.sum(F.expr("CAST(CAST(ROUND((1.0 - CAST(r AS DOUBLE)) * CAST(x AS DOUBLE), 6)"
                         " AS DECIMAL(18,6)) AS DECIMAL(8,6))"
                         " * CAST(c AS DECIMAL(20,0))")).alias("sx1"),
        )
        state = agg.select(
            "n",
            "v",
            F.expr("CAST(ROUND(CAST(sx1 AS DOUBLE) / (n - CAST(n2 AS DOUBLE)), 6)"
                   " AS DECIMAL(18,6))").alias("mu1"),
            F.expr("CAST(ROUND(CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6)"
                   " AS DECIMAL(18,6))").alias("mu2"),
            F.expr("CAST(ROUND(CAST(n2 AS DOUBLE) / n, 6) AS DECIMAL(18,6))").alias("w2"),
        )
        state = state.localCheckpoint(eager=False)
        out.append(
            state.select(
                F.lit(it).alias("iteration"),
                F.col("w2").cast("double").alias("weight2"),
                F.col("mu1").cast("double").alias("mu1"),
                F.col("mu2").cast("double").alias("mu2"),
            )
        )
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res.orderBy("iteration")


def _em_sql() -> str:
    l_expr = (
        "CAST(ROUND(LN(CAST(w2 AS DOUBLE)) - LN(1.0 - CAST(w2 AS DOUBLE))"
        " + ((CAST(x AS DOUBLE) - CAST(mu1 AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(mu1 AS DOUBLE))"
        "  - (CAST(x AS DOUBLE) - CAST(mu2 AS DOUBLE)) * (CAST(x AS DOUBLE) - CAST(mu2 AS DOUBLE)))"
        " / (2.0 * CAST(v AS DOUBLE)), 6) AS DOUBLE)"
    )
    r_expr = f"CAST(ROUND(1.0 / (1.0 + EXP(-({l_expr}))), 6) AS DECIMAL(18,6))"
    iters = []
    prev = "s0"
    for t in (1, 2):
        iters.append(
            f"""sc{t} AS MATERIALIZED (
  SELECT li.x, st.n, st.v, {r_expr} AS r
  FROM li CROSS JOIN {prev} st
),
ag{t} AS (
  SELECT MAX(n) AS n, MAX(v) AS v,
         SUM(r) AS n2,
         SUM(CAST(ROUND(CAST(r AS DOUBLE) * CAST(x AS DOUBLE), 6)
                  AS DECIMAL(18,6))) AS sx2,
         SUM(CAST(ROUND((1.0 - CAST(r AS DOUBLE)) * CAST(x AS DOUBLE), 6)
                  AS DECIMAL(18,6))) AS sx1
  FROM sc{t}
),
s{t} AS (
  SELECT n, v,
         CAST(ROUND(CAST(sx1 AS DOUBLE) / (n - CAST(n2 AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS mu1,
         CAST(ROUND(CAST(sx2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS mu2,
         CAST(ROUND(CAST(n2 AS DOUBLE) / n, 6) AS DECIMAL(18,6)) AS w2
  FROM ag{t}
)"""
        )
        prev = f"s{t}"
    body = ",\n".join(iters)
    return f"""
WITH li AS MATERIALIZED (
  SELECT CAST(ROUND(LN(l_extendedprice / l_quantity), 6) AS DECIMAL(18,6)) AS x
  FROM lineitem
),
hist AS (SELECT x, COUNT(*) AS c FROM li GROUP BY 1),
cdf AS (
  SELECT x, SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS n
  FROM hist
),
q25 AS (SELECT MIN(x) AS mu1 FROM cdf WHERE cum * 4 >= n),
q75 AS (SELECT MIN(x) AS mu2 FROM cdf WHERE cum * 4 >= n * 3),
mom AS (
  SELECT COUNT(*) AS n, SUM(x) AS s, ROUND(SUM(x * x), 6) AS q FROM li
),
s0 AS (
  SELECT mom.n,
         CAST(ROUND((CAST(mom.q AS DOUBLE) - CAST(mom.s AS DOUBLE)
                     * CAST(mom.s AS DOUBLE) / mom.n) / mom.n, 6)
              AS DECIMAL(18,6)) AS v,
         q25.mu1, q75.mu2,
         CAST(0.5 AS DECIMAL(18,6)) AS w2
  FROM mom, q25, q75
),
{body}
SELECT * FROM (
  SELECT 1 AS iteration, CAST(w2 AS DOUBLE) AS weight2,
         CAST(mu1 AS DOUBLE) AS mu1, CAST(mu2 AS DOUBLE) AS mu2 FROM s1
  UNION ALL
  SELECT 2, CAST(w2 AS DOUBLE), CAST(mu1 AS DOUBLE), CAST(mu2 AS DOUBLE) FROM s2
) r ORDER BY iteration
"""


QUERIES["lineitem_em_mixture"] = lineitem_em_mixture
ORACLE["lineitem_em_mixture"] = _em_sql()


def lineitem_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation (Neyman 1934):
    for a 10,000-row evaluation sample of lineitem stratified by
    return flag, allocate n_h ∝ N_h·σ_h (minimum-variance allocation
    for estimating mean extended price), with exact largest-
    remainder rounding so the allocations sum to the budget — the
    design table behind every stratified eval-set draw in the
    corpus tooling (balanced/systematic samplers already in §2.C
    draw; this query decides HOW MANY per stratum).

    Engine-exact: per-stratum σ come from DECIMAL moment sums
    (rounded to 0dp before the double cast — the 2^53 rule); shares
    are FLOOR-quantized integers plus a deterministic largest-
    remainder distribution (remainder DESC, flag ASC) — the final
    integer allocations are exact.

    Scale: ONE map-side-combined moment agg to 3 rows; the
    allocation arithmetic is stratum-count-sized."""
    budget = 10_000
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", money("l_extendedprice").alias("x")
    )
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("x").alias("s"),
        F.round(F.sum(F.col("x") * F.col("x")), 0).alias("q"),
    )
    sd = F.sqrt(
        (F.col("q").cast("double")
         - F.col("s").cast("double") * F.col("s").cast("double") / F.col("n_h"))
        / (F.col("n_h") - 1)
    )
    wt = g.select(
        "l_returnflag",
        "n_h",
        F.expr("CAST(FLOOR({sd} * n_h) AS BIGINT)".format(
            sd="SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)"
               " / n_h) / (n_h - 1))"
        )).alias("w"),
        sd.alias("sigma"),
    )
    tot = wt.agg(F.sum("w").alias("wsum"))
    alloc = wt.crossJoin(F.broadcast(tot)).select(
        "l_returnflag",
        "n_h",
        F.round("sigma", 6).alias("sigma"),
        F.expr(f"CAST(({budget} * w) DIV wsum AS BIGINT)").alias("base"),
        F.expr(f"({budget} * w) % wsum").alias("rem"),
    )
    wrem = Window.orderBy(F.col("rem").desc(), F.col("l_returnflag").asc())
    short = alloc.agg((F.lit(budget) - F.sum("base")).alias("short"))
    final = (
        alloc.withColumn("rk", F.row_number().over(wrem))
        .crossJoin(F.broadcast(short))
        .select(
            "l_returnflag",
            "n_h",
            "sigma",
            (F.col("base") + F.when(F.col("rk") <= F.col("short"), 1).otherwise(0)).alias(
                "n_alloc"
            ),
        )
    )
    return final.orderBy("l_returnflag")


LINEITEM_NEYMAN_SQL = """
WITH g AS (
  SELECT l_returnflag, COUNT(*) AS n_h,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS s,
         ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                   * CAST(l_extendedprice AS DECIMAL(12,2))), 0) AS q
  FROM lineitem GROUP BY 1
),
wt AS (
  SELECT l_returnflag, n_h,
         CAST(FLOOR(SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / n_h) / (n_h - 1)) * n_h) AS BIGINT) AS w,
         ROUND(SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / n_h) / (n_h - 1)), 6) AS sigma
  FROM g
),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS wsum FROM wt),
alloc AS (
  SELECT l_returnflag, n_h, sigma,
         (10000 * w) // wsum AS base,
         (10000 * w) % wsum AS rem
  FROM wt, tot
),
short AS (SELECT 10000 - SUM(base) AS short FROM alloc),
final AS (
  SELECT l_returnflag, n_h, sigma,
         base + CASE WHEN ROW_NUMBER() OVER (ORDER BY rem DESC, l_returnflag ASC)
                          <= (SELECT short FROM short)
                     THEN 1 ELSE 0 END AS n_alloc
  FROM alloc
)
SELECT l_returnflag, n_h, sigma, CAST(n_alloc AS BIGINT) AS n_alloc
FROM final ORDER BY l_returnflag
"""

QUERIES["lineitem_neyman_allocation"] = lineitem_neyman_allocation
ORACLE["lineitem_neyman_allocation"] = LINEITEM_NEYMAN_SQL


def customers_decile_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table for a propensity score: rank
    customers by account balance (the naive "rich customers buy"
    score) against the actual has-orders label, in score deciles —
    cumulative capture rate and lift per decile, the marketing-
    analytics model-evaluation table (the tabular cousin of
    ROC/AUC); a score no better than random shows lift ≈ 1
    everywhere, which is itself the finding.

    Engine-exact: deciles come from the histogram-CDF house pattern
    on the acctbal value histogram (bucket = ((cdf−1)·10) DIV total;
    equal scores share a decile — no ntile arbitrariness); capture
    and lift are integer-ppm cross-ratios.

    Scale: one customer-dim agg + left-semi orders probe; the CDF
    window runs on the value histogram, never raw rows."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    o = load_table(spark, sf_dir, "orders").select("o_custkey").distinct()
    lab = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .select(
            "c_custkey",
            "c_acctbal",
            F.when(F.col("o_custkey").isNotNull(), 1).otherwise(0).alias("buyer"),
        )
    )
    hist = lab.groupBy("c_acctbal").agg(F.count(F.lit(1)).alias("n"))
    buckets = hist.select(
        "c_acctbal",
        F.expr(
            "((sum(n) OVER (ORDER BY c_acctbal DESC ROWS UNBOUNDED PRECEDING) - 1)"
            " * 10) DIV (sum(n) OVER ()) + 1"
        ).alias("decile"),
    )
    j = lab.join(F.broadcast(buckets), "c_acctbal")
    per = j.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("buyer").alias("n_buyers"),
    )
    wcum = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return per.select(
        "decile",
        "n_customers",
        "n_buyers",
        F.expr(
            "sum(n_buyers) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)"
            " * 1000000 DIV sum(n_buyers) OVER ()"
        ).alias("cum_capture_ppm"),
        F.expr(
            "(n_buyers * (sum(n_customers) OVER ())) * 1000000"
            " DIV ((sum(n_buyers) OVER ()) * n_customers)"
        ).alias("lift_ppm"),
    ).orderBy("decile")


CUSTOMERS_DECILE_LIFT_SQL = """
WITH lab AS (
  SELECT c.c_custkey, c.c_acctbal,
         CASE WHEN o.o_custkey IS NOT NULL THEN 1 ELSE 0 END AS buyer
  FROM customer c
  LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
    ON o.o_custkey = c.c_custkey
),
hist AS (SELECT c_acctbal, COUNT(*) AS n FROM lab GROUP BY 1),
buckets AS (
  SELECT c_acctbal,
         ((SUM(n) OVER (ORDER BY c_acctbal DESC ROWS UNBOUNDED PRECEDING) - 1)
           * 10) // (SUM(n) OVER ()) + 1 AS decile
  FROM hist
),
per AS (
  SELECT b.decile, COUNT(*) AS n_customers, SUM(l.buyer) AS n_buyers
  FROM lab l JOIN buckets b ON b.c_acctbal = l.c_acctbal
  GROUP BY 1
)
SELECT CAST(decile AS BIGINT) AS decile, n_customers,
       CAST(n_buyers AS BIGINT) AS n_buyers,
       CAST(SUM(n_buyers) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
            * 1000000 // SUM(n_buyers) OVER () AS BIGINT) AS cum_capture_ppm,
       CAST((n_buyers * (SUM(n_customers) OVER ())) * 1000000
            // ((SUM(n_buyers) OVER ()) * n_customers) AS BIGINT) AS lift_ppm
FROM per ORDER BY decile
"""

QUERIES["customers_decile_lift"] = customers_decile_lift
ORACLE["customers_decile_lift"] = CUSTOMERS_DECILE_LIFT_SQL


def nations_atkinson_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atkinson inequality index (Atkinson 1970, ε = 0.5) of customer
    revenue within each nation: A = 1 − (Σ√x / n)² / (Σx / n) — the
    welfare-theoretic member that completes the suite's inequality
    family (Gini = rank-based, Theil = entropy-based, Lorenz =
    curve; Atkinson states HOW MUCH total revenue society could
    forgo under equal distribution), with its explicit inequality-
    aversion knob ε.

    Engine-exact: per-customer revenue is DECIMAL; √x terms are
    6dp-rounded into DECIMAL sums (sqrt is correctly-rounded IEEE on
    identical inputs — the rounding guards the decimal cast, not the
    sqrt); the closing A expression is identical IEEE on exact
    decimal-cast moments.

    Scale: one fact→customer agg, one √-term nation agg — both
    map-side-combinable; output is nation-sized."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    per = (
        o.groupBy("o_custkey")
        .agg(F.sum(money("o_totalprice")).alias("rev"))
        .join(c, F.col("o_custkey") == c["c_custkey"])
    )
    g = per.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("rev"), 2).cast("decimal(28,2)").alias("s"),
        F.sum(
            F.round(F.sqrt(F.col("rev").cast("double")), 6).cast("decimal(18,6)")
        ).alias("sq"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    egde = (
        (F.col("sq").cast("double") / F.col("n"))
        * (F.col("sq").cast("double") / F.col("n"))
    )
    return g.select(
        F.col("c_nationkey").alias("nationkey"),
        "n",
        (F.lit(1.0) - egde / mean).alias("atkinson_05"),
    ).orderBy("nationkey")


NATIONS_ATKINSON_SQL = """
WITH per AS (
  SELECT o.o_custkey, c.c_nationkey,
         SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
g AS (
  SELECT c_nationkey, COUNT(*) AS n,
         CAST(ROUND(SUM(rev), 2) AS DECIMAL(28,2)) AS s,
         SUM(CAST(ROUND(SQRT(CAST(rev AS DOUBLE)), 6) AS DECIMAL(18,6))) AS sq
  FROM per GROUP BY 1
)
SELECT CAST(c_nationkey AS INTEGER) AS nationkey, n,
       1.0 - (CAST(sq AS DOUBLE) / n) * (CAST(sq AS DOUBLE) / n)
           / (CAST(s AS DOUBLE) / n) AS atkinson_05
FROM g ORDER BY nationkey
"""

QUERIES["nations_atkinson_index"] = nations_atkinson_index
ORACLE["nations_atkinson_index"] = NATIONS_ATKINSON_SQL


def suppliers_topsis_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOPSIS multi-criteria supplier ranking (Hwang & Yoon 1981):
    three criteria per supplier — shipped revenue (benefit), distinct
    parts served (benefit), return rate (cost) — vector-normalized,
    scored by closeness to the ideal / anti-ideal points, ranked —
    the standard OR scorecard a procurement team runs over the
    supplier base (the suite's HHI/assortativity queries describe the
    MARKET; TOPSIS ranks the members).

    Engine-exact: criteria are integer/DECIMAL aggregates; vector
    norms are 6dp-rounded sqrt's of per-term-rounded DECIMAL sums;
    normalized cells, distances, and closeness are 6dp-rounded at
    each stage (one-shot smooth values — the tie-free rounding
    regime), and the final rank is a row_number with closeness/id
    tie-break.

    Scale: one fact agg to the supplier dimension; all TOPSIS math
    is supplier-dimension-sized with broadcast norm scalars."""
    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_suppkey").agg(
        (F.sum(money("l_extendedprice"))).alias("rev"),
        F.countDistinct("l_partkey").alias("parts"),
        F.expr(
            "SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*)"
        ).alias("ret_ppm"),
    )
    norms = per.agg(
        *[
            F.expr(
                f"CAST(ROUND(SQRT(CAST(SUM(CAST(ROUND(CAST({c} AS DOUBLE)"
                f" * CAST({c} AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE)), 6)"
                f" AS DECIMAL(28,6))"
            ).alias(f"n_{c}")
            for c in ("rev", "parts", "ret_ppm")
        ]
    )
    normed = per.crossJoin(F.broadcast(norms)).select(
        "l_suppkey",
        *[
            F.expr(
                f"CAST(ROUND(CAST({c} AS DOUBLE) / CAST(n_{c} AS DOUBLE), 6)"
                f" AS DECIMAL(18,6))"
            ).alias(f"v_{c}")
            for c in ("rev", "parts", "ret_ppm")
        ],
    )
    ideal = normed.agg(
        F.max("v_rev").alias("i_rev"),
        F.max("v_parts").alias("i_parts"),
        F.min("v_ret_ppm").alias("i_ret"),
        F.min("v_rev").alias("a_rev"),
        F.min("v_parts").alias("a_parts"),
        F.max("v_ret_ppm").alias("a_ret"),
    )
    def dist(p1, p2, p3):
        return (
            f"CAST(ROUND(SQRT("
            f"(CAST(v_rev AS DOUBLE) - CAST({p1} AS DOUBLE))"
            f" * (CAST(v_rev AS DOUBLE) - CAST({p1} AS DOUBLE))"
            f" + (CAST(v_parts AS DOUBLE) - CAST({p2} AS DOUBLE))"
            f" * (CAST(v_parts AS DOUBLE) - CAST({p2} AS DOUBLE))"
            f" + (CAST(v_ret_ppm AS DOUBLE) - CAST({p3} AS DOUBLE))"
            f" * (CAST(v_ret_ppm AS DOUBLE) - CAST({p3} AS DOUBLE))), 6)"
            f" AS DECIMAL(18,6))"
        )
    scored = normed.crossJoin(F.broadcast(ideal)).select(
        "l_suppkey",
        F.expr(dist("i_rev", "i_parts", "i_ret")).alias("d_pos"),
        F.expr(dist("a_rev", "a_parts", "a_ret")).alias("d_neg"),
    )
    close = scored.select(
        "l_suppkey",
        F.expr(
            "CAST(ROUND(CAST(d_neg AS DOUBLE)"
            " / (CAST(d_pos AS DOUBLE) + CAST(d_neg AS DOUBLE)), 6)"
            " AS DECIMAL(18,6))"
        ).alias("closeness"),
    )
    w = Window.orderBy(F.col("closeness").desc(), F.col("l_suppkey").asc())
    return (
        close.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select(
            F.col("rank"),
            F.col("l_suppkey").alias("suppkey"),
            F.col("closeness").cast("double").alias("closeness"),
        )
        .orderBy("rank")
    )


SUPPLIERS_TOPSIS_SQL = """
WITH per AS (
  SELECT l_suppkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS rev,
         COUNT(DISTINCT l_partkey) AS parts,
         SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) * 1000000
           // COUNT(*) AS ret_ppm
  FROM lineitem GROUP BY 1
),
norms AS (
  SELECT CAST(ROUND(SQRT(CAST(SUM(CAST(ROUND(CAST(rev AS DOUBLE)
                  * CAST(rev AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE)), 6)
              AS DECIMAL(28,6)) AS n_rev,
         CAST(ROUND(SQRT(CAST(SUM(CAST(ROUND(CAST(parts AS DOUBLE)
                  * CAST(parts AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE)), 6)
              AS DECIMAL(28,6)) AS n_parts,
         CAST(ROUND(SQRT(CAST(SUM(CAST(ROUND(CAST(ret_ppm AS DOUBLE)
                  * CAST(ret_ppm AS DOUBLE), 6) AS DECIMAL(38,6))) AS DOUBLE)), 6)
              AS DECIMAL(28,6)) AS n_ret_ppm
  FROM per
),
normed AS (
  SELECT l_suppkey,
         CAST(ROUND(CAST(rev AS DOUBLE) / CAST(n_rev AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS v_rev,
         CAST(ROUND(CAST(parts AS DOUBLE) / CAST(n_parts AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS v_parts,
         CAST(ROUND(CAST(ret_ppm AS DOUBLE) / CAST(n_ret_ppm AS DOUBLE), 6)
              AS DECIMAL(18,6)) AS v_ret_ppm
  FROM per, norms
),
ideal AS (
  SELECT MAX(v_rev) AS i_rev, MAX(v_parts) AS i_parts, MIN(v_ret_ppm) AS i_ret,
         MIN(v_rev) AS a_rev, MIN(v_parts) AS a_parts, MAX(v_ret_ppm) AS a_ret
  FROM normed
),
scored AS (
  SELECT l_suppkey,
         CAST(ROUND(SQRT((CAST(v_rev AS DOUBLE) - CAST(i_rev AS DOUBLE))
                * (CAST(v_rev AS DOUBLE) - CAST(i_rev AS DOUBLE))
              + (CAST(v_parts AS DOUBLE) - CAST(i_parts AS DOUBLE))
                * (CAST(v_parts AS DOUBLE) - CAST(i_parts AS DOUBLE))
              + (CAST(v_ret_ppm AS DOUBLE) - CAST(i_ret AS DOUBLE))
                * (CAST(v_ret_ppm AS DOUBLE) - CAST(i_ret AS DOUBLE))), 6)
              AS DECIMAL(18,6)) AS d_pos,
         CAST(ROUND(SQRT((CAST(v_rev AS DOUBLE) - CAST(a_rev AS DOUBLE))
                * (CAST(v_rev AS DOUBLE) - CAST(a_rev AS DOUBLE))
              + (CAST(v_parts AS DOUBLE) - CAST(a_parts AS DOUBLE))
                * (CAST(v_parts AS DOUBLE) - CAST(a_parts AS DOUBLE))
              + (CAST(v_ret_ppm AS DOUBLE) - CAST(a_ret AS DOUBLE))
                * (CAST(v_ret_ppm AS DOUBLE) - CAST(a_ret AS DOUBLE))), 6)
              AS DECIMAL(18,6)) AS d_neg
  FROM normed, ideal
),
close AS (
  SELECT l_suppkey,
         CAST(ROUND(CAST(d_neg AS DOUBLE)
                    / (CAST(d_pos AS DOUBLE) + CAST(d_neg AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS closeness
  FROM scored
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY closeness DESC, l_suppkey ASC)
            AS INTEGER) AS rank,
       l_suppkey AS suppkey, CAST(closeness AS DOUBLE) AS closeness
FROM close
QUALIFY rank <= 10
ORDER BY rank
"""

QUERIES["suppliers_topsis_scorecard"] = suppliers_topsis_scorecard
ORACLE["suppliers_topsis_scorecard"] = SUPPLIERS_TOPSIS_SQL


def customers_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch (SRM) check — the first guardrail every
    experimentation platform runs before reading ANY metric: a
    deterministic md5 coin assigns customers 50/50 to arms A/B, and
    the χ² goodness-of-fit against the planned ratio ((n_A−n_B)² /
    (n_A+n_B) for 1 df) says whether the assignment itself is broken
    (a significant SRM invalidates the experiment regardless of
    lift). Pairs with events_cuped_adjustment (variance) and
    parts_promo_did (effect) to complete the experimentation
    toolkit.

    Engine-exact: the coin is the md5-nibble house hash; cells are
    integers and the χ² is ONE division of exact integers —
    identical IEEE; the 3.841 critical-value verdict is a plain
    comparison.

    Scale: one hash-classify-and-count agg; nothing else moves."""
    c = load_table(spark, sf_dir, "customer")
    arm = F.expr(
        "locate(substring(md5(concat('srm:', CAST(c_custkey AS STRING))), 1, 1),"
        " '0123456789abcdef') - 1"
    ) < 8
    m = c.select(arm.alias("a")).agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(~F.col("a"), 1).otherwise(0)).alias("n_b"),
    )
    chi2 = (
        (F.col("n_a") - F.col("n_b")).cast("double")
        * (F.col("n_a") - F.col("n_b")).cast("double")
        / (F.col("n_a") + F.col("n_b")).cast("double")
    )
    return m.select(
        "n_a",
        "n_b",
        chi2.alias("chi2_stat"),
        (chi2 > 3.841).alias("srm_detected"),
    )


CUSTOMERS_SRM_SQL = """
WITH m AS (
  SELECT SUM(CASE WHEN (strpos('0123456789abcdef',
                               substr(md5(concat('srm:', CAST(c_custkey AS VARCHAR))),
                                      1, 1)) - 1) < 8
                  THEN 1 ELSE 0 END) AS n_a,
         SUM(CASE WHEN (strpos('0123456789abcdef',
                               substr(md5(concat('srm:', CAST(c_custkey AS VARCHAR))),
                                      1, 1)) - 1) < 8
                  THEN 0 ELSE 1 END) AS n_b
  FROM customer
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
         / CAST(n_a + n_b AS DOUBLE) AS chi2_stat,
       CAST(n_a - n_b AS DOUBLE) * CAST(n_a - n_b AS DOUBLE)
         / CAST(n_a + n_b AS DOUBLE) > 3.841 AS srm_detected
FROM m
"""

QUERIES["customers_srm_check"] = customers_srm_check
ORACLE["customers_srm_check"] = CUSTOMERS_SRM_SQL


def lineitem_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Vovk; Lei et al. 2018)
    for shipping delay: the point model is the per-priority mean
    delay fit on the deterministic calibration half (l_orderkey %
    2 = 0); the conformal quantile is the ⌈(n+1)·0.9⌉-th smallest
    absolute residual on that half (exact histogram-CDF — integer
    days); the TEST half then gets distribution-free ±q̂ intervals
    whose achieved coverage is reported per priority — the
    finite-sample-guaranteed uncertainty wrapper every point
    forecaster in the suite lacks. Coverage ≈ 90% REGARDLESS of the
    model being crude: that guarantee is the point, and the oracle
    hash-checks it.

    Engine-exact: delays and residuals are integer days; the model
    mean is floor-quantized to integer days (deterministic); the
    conformal rank threshold is a cross-multiplied integer CDF pick;
    coverage is integer ppm.

    Scale: two conditional aggs (fit + calibrate) over one scan
    shape + a residual-histogram CDF — all map-side-combinable."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    done = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("fin"))
    base = o.join(done, o["o_orderkey"] == done["l_orderkey"]).select(
        "o_orderkey",
        "o_orderpriority",
        F.datediff("fin", "o_orderdate").alias("delay"),
        (F.col("o_orderkey") % 2 == 0).alias("cal"),
    )
    model = (
        base.where("cal")
        .groupBy("o_orderpriority")
        .agg(F.expr("SUM(delay) DIV COUNT(*)").alias("pred"))
    )
    resid = (
        base.where("cal")
        .join(model, "o_orderpriority")
        .select(F.abs(F.col("delay") - F.col("pred")).alias("r"))
    )
    hist = resid.groupBy("r").agg(F.count(F.lit(1)).alias("c"))
    cdf = hist.select(
        "r",
        F.expr("sum(c) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)").alias("cum"),
        F.expr("sum(c) OVER ()").alias("n"),
    )
    qhat = (
        cdf.where(F.expr("cum * 10 >= (n + 1) * 9"))
        .agg(F.min("r").alias("qhat"))
    )
    test = (
        base.where(~F.col("cal"))
        .join(model, "o_orderpriority")
        .crossJoin(F.broadcast(qhat))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.max("qhat").alias("q_days"),
            F.expr(
                "SUM(CASE WHEN ABS(delay - pred) <= qhat THEN 1 ELSE 0 END)"
                " * 1000000 DIV COUNT(*)"
            ).alias("coverage_ppm"),
        )
    )
    return test.orderBy("o_orderpriority")


LINEITEM_CONFORMAL_SQL = """
WITH done AS (
  SELECT l_orderkey, MAX(l_shipdate) AS fin FROM lineitem GROUP BY 1
),
base AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         datediff('day', CAST(o.o_orderdate AS DATE), CAST(d.fin AS DATE)) AS delay,
         o.o_orderkey % 2 = 0 AS cal
  FROM orders o JOIN done d ON d.l_orderkey = o.o_orderkey
),
model AS (
  SELECT o_orderpriority, SUM(delay) // COUNT(*) AS pred
  FROM base WHERE cal GROUP BY 1
),
resid AS (
  SELECT ABS(b.delay - m.pred) AS r
  FROM base b JOIN model m USING (o_orderpriority) WHERE b.cal
),
hist AS (SELECT r, COUNT(*) AS c FROM resid GROUP BY 1),
cdf AS (
  SELECT r, SUM(c) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS n
  FROM hist
),
qhat AS (SELECT MIN(r) AS qhat FROM cdf WHERE cum * 10 >= (n + 1) * 9)
SELECT b.o_orderpriority, COUNT(*) AS n_test,
       CAST(MAX(q.qhat) AS BIGINT) AS q_days,
       CAST(SUM(CASE WHEN ABS(b.delay - m.pred) <= q.qhat THEN 1 ELSE 0 END)
            * 1000000 // COUNT(*) AS BIGINT) AS coverage_ppm
FROM base b JOIN model m USING (o_orderpriority) CROSS JOIN qhat q
WHERE NOT b.cal
GROUP BY 1 ORDER BY 1
"""

QUERIES["lineitem_conformal_interval"] = lineitem_conformal_interval
ORACLE["lineitem_conformal_interval"] = LINEITEM_CONFORMAL_SQL


def lineitem_post_stratification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-stratified estimation (survey sampling 101, the partner
    of lineitem_neyman_allocation): estimate TOTAL revenue from a
    deterministic ~10%% md5 sample, post-stratified by return flag —
    est = Σ_h N_h·x̄_h(sample) — and report the error against the
    true total alongside the naive (unstratified) expansion
    estimate; post-stratification should shrink the error whenever
    strata means differ. THE pattern for auditing a 100 TB table
    with a 0.1%% scan.

    Engine-exact: the sample coin is the md5-nibble hash (first
    nibble < 2 of 16 = 12.5%%); stratum means are DECIMAL sums with
    one IEEE division each, expansions are N_h-weighted IEEE
    products, and errors are integer-ppm against the exact DECIMAL
    truth.

    Scale: one full-scan conditional agg (truth + strata sizes) +
    one sample-side agg — both map-side-combinable."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        money("l_extendedprice").alias("x"),
        (
            F.expr(
                "locate(substring(md5(concat('ps:', CAST(l_orderkey AS STRING), ':',"
                " CAST(l_linenumber AS STRING))), 1, 1), '0123456789abcdef') - 1"
            )
            < 2
        ).alias("s"),
    )
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("x").alias("t_h"),
        F.count(F.when(F.col("s"), 1)).alias("m_h"),
        F.sum(F.when(F.col("s"), F.col("x"))).alias("st_h"),
    )
    tot = g.agg(
        F.sum("n_h").alias("n"),
        F.round(F.sum("t_h"), 2).cast("decimal(28,2)").alias("truth"),
        F.sum("m_h").alias("m"),
        F.round(F.sum("st_h"), 2).cast("decimal(28,2)").alias("st"),
        F.sum(
            F.expr(
                "CAST(FLOOR(n_h * (CAST(st_h AS DOUBLE) / m_h)) AS BIGINT)"
            )
        ).alias("post_strat_est"),
    )
    naive = F.expr("CAST(FLOOR(n * (CAST(st AS DOUBLE) / m)) AS BIGINT)")
    return tot.select(
        "n",
        "m",
        F.col("truth").cast("double").alias("true_total"),
        naive.alias("naive_est"),
        "post_strat_est",
        F.expr(
            "ABS(CAST(FLOOR(n * (CAST(st AS DOUBLE) / m)) AS BIGINT)"
            " - CAST(truth AS BIGINT)) * 1000000 DIV CAST(truth AS BIGINT)"
        ).alias("naive_err_ppm"),
        F.expr(
            "ABS(post_strat_est - CAST(truth AS BIGINT)) * 1000000"
            " DIV CAST(truth AS BIGINT)"
        ).alias("post_strat_err_ppm"),
    )


LINEITEM_POST_STRAT_SQL = """
WITH li AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,2)) AS x,
         (strpos('0123456789abcdef',
                 substr(md5(concat('ps:', CAST(l_orderkey AS VARCHAR), ':',
                                   CAST(l_linenumber AS VARCHAR))), 1, 1)) - 1) < 2
           AS s
  FROM lineitem
),
g AS (
  SELECT l_returnflag, COUNT(*) AS n_h, SUM(x) AS t_h,
         COUNT(CASE WHEN s THEN 1 END) AS m_h,
         SUM(CASE WHEN s THEN x END) AS st_h
  FROM li GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n_h) AS BIGINT) AS n,
         CAST(ROUND(SUM(t_h), 2) AS DECIMAL(28,2)) AS truth,
         CAST(SUM(m_h) AS BIGINT) AS m,
         CAST(ROUND(SUM(st_h), 2) AS DECIMAL(28,2)) AS st,
         CAST(SUM(CAST(FLOOR(n_h * (CAST(st_h AS DOUBLE) / m_h)) AS BIGINT))
              AS BIGINT) AS post_strat_est
  FROM g
)
SELECT n, m, CAST(truth AS DOUBLE) AS true_total,
       CAST(FLOOR(n * (CAST(st AS DOUBLE) / m)) AS BIGINT) AS naive_est,
       post_strat_est,
       CAST(ABS(CAST(FLOOR(n * (CAST(st AS DOUBLE) / m)) AS BIGINT)
                - CAST(truth AS BIGINT)) * 1000000 // CAST(truth AS BIGINT)
            AS BIGINT) AS naive_err_ppm,
       CAST(ABS(post_strat_est - CAST(truth AS BIGINT)) * 1000000
            // CAST(truth AS BIGINT) AS BIGINT) AS post_strat_err_ppm
FROM tot
"""

QUERIES["lineitem_post_stratification"] = lineitem_post_stratification
ORACLE["lineitem_post_stratification"] = LINEITEM_POST_STRAT_SQL


def orders_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capture–recapture population estimation (Lincoln–Petersen,
    with the Chapman bias correction): two INDEPENDENT deterministic
    md5 'observers' each see ~12.5%% of orders; the overlap
    m estimates the unseen total as N̂ = (n₁+1)(n₂+1)/(m+1) − 1 —
    the ecology estimator data engineers reuse to size a table
    neither scan saw fully (log dedup, crawler frontier sizing).
    Reports both estimates and the error against the true count.

    Engine-exact: both coins are independent md5-nibble draws
    (different salts); all cells are integers and Chapman is one
    truncating integer expression; error is integer ppm.

    Scale: one classify-and-count agg; nothing else moves."""
    o = load_table(spark, sf_dir, "orders")
    def coin(salt):
        return (
            F.expr(
                f"locate(substring(md5(concat('{salt}:',"
                f" CAST(o_orderkey AS STRING))), 1, 1), '0123456789abcdef') - 1"
            )
            < 2
        )
    m = o.select(coin("capA").alias("a"), coin("capB").alias("b")).agg(
        F.count(F.lit(1)).alias("true_n"),
        F.sum(F.when(F.col("a"), 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("b"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("a") & F.col("b"), 1).otherwise(0)).alias("m_both"),
    )
    chapman = F.expr("(n1 + 1) * (n2 + 1) DIV (m_both + 1) - 1")
    return m.select(
        "true_n",
        "n1",
        "n2",
        "m_both",
        chapman.alias("chapman_est"),
        F.expr(
            "ABS((n1 + 1) * (n2 + 1) DIV (m_both + 1) - 1 - true_n)"
            " * 1000000 DIV true_n"
        ).alias("err_ppm"),
    )


ORDERS_CAPTURE_SQL = """
WITH m AS (
  SELECT COUNT(*) AS true_n,
         SUM(CASE WHEN (strpos('0123456789abcdef',
               substr(md5(concat('capA:', CAST(o_orderkey AS VARCHAR))), 1, 1)) - 1) < 2
             THEN 1 ELSE 0 END) AS n1,
         SUM(CASE WHEN (strpos('0123456789abcdef',
               substr(md5(concat('capB:', CAST(o_orderkey AS VARCHAR))), 1, 1)) - 1) < 2
             THEN 1 ELSE 0 END) AS n2,
         SUM(CASE WHEN (strpos('0123456789abcdef',
               substr(md5(concat('capA:', CAST(o_orderkey AS VARCHAR))), 1, 1)) - 1) < 2
               AND (strpos('0123456789abcdef',
               substr(md5(concat('capB:', CAST(o_orderkey AS VARCHAR))), 1, 1)) - 1) < 2
             THEN 1 ELSE 0 END) AS m_both
  FROM orders
)
SELECT true_n, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(m_both AS BIGINT) AS m_both,
       CAST((n1 + 1) * (n2 + 1) // (m_both + 1) - 1 AS BIGINT) AS chapman_est,
       CAST(ABS((n1 + 1) * (n2 + 1) // (m_both + 1) - 1 - true_n) * 1000000
            // true_n AS BIGINT) AS err_ppm
FROM m
"""

QUERIES["orders_capture_recapture"] = orders_capture_recapture
ORACLE["orders_capture_recapture"] = ORDERS_CAPTURE_SQL


def customers_mahalanobis_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate outlier detection: 2-D Mahalanobis distance of
    each customer's (order count, total spend) from the population —
    the covariance-aware screen that catches a customer whose COMBO
    is anomalous (few orders, huge spend) even when each marginal
    looks normal; z-score screens (events_anomaly_zscore) are blind
    to exactly that correlation. Emits the top-10 by distance.

    Exactness: with integer features (spend in 100-dollar units) the
    whole quadratic form is INTEGER — deviations as n·v−Σv, the
    scatter matrix M = [[nΣx²−Sx², nΣxy−SxSy], [·, nΣy²−Sy²]], and
    d²·1e4 = (num·1e4·(n−1)) DIV (n·det(M)) with
    num = dx²Myy − 2dxdyMxy + dy²Mxx — one integer floor-division,
    no doubles anywhere. Spark runs it in DECIMAL(38,0), DuckDB in
    HUGEINT. The quadratic form is scale-invariant, so an adaptive
    integer downscale k = max(1, n DIV 20000) divides the deviations
    by k and the scatter entries by k² (num and den both shrink k⁴ —
    the ratio survives): every intermediate magnitude becomes
    n-INDEPENDENT (dy' ~ 20000·dev, M' ~ 20000²·var), which is what
    keeps DECIMAL(38,0) sufficient at ANY n (the unguarded form
    overflowed at the r8 sf1.0 spot gate, n=150k → num ~ 4e40). At
    n ≤ 20000 (every driver gate tier) k=1 — bit-identical to the
    recorded rounds. DIV truncation is engine-identical, negatives
    included (CLAUDE.md r7).

    Scale: ONE customer-level agg collapses orders; the moment
    totals are a broadcast scalar row; scoring is map-side; top-10
    is a TakeOrdered. No global sort, no second scan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("x"),
        F.expr("CAST(SUM(cents) AS BIGINT) DIV 10000").alias("y"),
    )
    tot = cust.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("CAST(y AS DECIMAL(38,0)) * y")).alias("syy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).alias("sxy"),
    ).withColumn("k", F.expr("GREATEST(CAST(1 AS DECIMAL(38,0)), n DIV 20000)"))
    d = "CAST({} AS DECIMAL(38,0))"
    # downscaled building blocks: deviations DIV k, scatter DIV k².
    # Spark DIV returns LONG — recast each quotient to DECIMAL(38,0)
    # so the following products stay in 38-digit arithmetic.
    dx = d.format(f"({d.format('n * x - sx')}) DIV k")
    dy = d.format(f"({d.format('n')} * y - {d.format('sy')}) DIV k")
    mxx = d.format(f"({d.format('n')} * sxx - {d.format('sx')} * sx) DIV (k * k)")
    myy = d.format(f"({d.format('n')} * syy - {d.format('sy')} * sy) DIV (k * k)")
    mxy = d.format(f"({d.format('n')} * sxy - {d.format('sx')} * sy) DIV (k * k)")
    scored = cust.crossJoin(F.broadcast(tot)).select(
        "o_custkey",
        "x",
        "y",
        F.expr(
            f"""CAST((({dx} * {dx} * {myy}
               - 2 * {dx} * {dy} * {mxy}
               + {dy} * {dy} * {mxx})
              * {d.format('n - 1')} * 10000)
             DIV ({d.format('n')} * ({mxx} * {myy} - {mxy} * {mxy}))
             AS BIGINT)"""
        ).alias("d2_e4"),
    )
    return (
        scored.select(
            F.col("o_custkey").alias("custkey"),
            F.col("x").cast("bigint").alias("n_orders"),
            F.col("y").cast("bigint").alias("spend_hundreds"),
            "d2_e4",
        )
        .orderBy(F.col("d2_e4").desc(), "custkey")
        .limit(10)
    )


MAHALANOBIS_SQL = """
WITH cust AS (
  SELECT o_custkey,
         CAST(COUNT(*) AS HUGEINT) AS x,
         CAST(CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) // 10000 AS HUGEINT) AS y
  FROM orders GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS sx, CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(x * x) AS HUGEINT) AS sxx,
         CAST(SUM(y * y) AS HUGEINT) AS syy,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         GREATEST(CAST(1 AS HUGEINT), CAST(COUNT(*) AS HUGEINT) // 20000) AS k
  FROM cust
)
SELECT CAST(o_custkey AS BIGINT) AS custkey,
       CAST(x AS BIGINT) AS n_orders,
       CAST(y AS BIGINT) AS spend_hundreds,
       CAST(((((n * x - sx) // k) * ((n * x - sx) // k)
              * ((n * syy - sy * sy) // (k * k))
            - 2 * ((n * x - sx) // k) * ((n * y - sy) // k)
              * ((n * sxy - sx * sy) // (k * k))
            + ((n * y - sy) // k) * ((n * y - sy) // k)
              * ((n * sxx - sx * sx) // (k * k)))
            * (n - 1) * 10000)
           // (n * (((n * sxx - sx * sx) // (k * k))
                    * ((n * syy - sy * sy) // (k * k))
                  - ((n * sxy - sx * sy) // (k * k))
                    * ((n * sxy - sx * sy) // (k * k))))
           AS BIGINT) AS d2_e4
FROM cust CROSS JOIN tot
ORDER BY d2_e4 DESC, custkey
LIMIT 10
"""

QUERIES["customers_mahalanobis_outliers"] = customers_mahalanobis_outliers
ORACLE["customers_mahalanobis_outliers"] = MAHALANOBIS_SQL


# ---------------------------------------------------------------------------
# orders_cohens_kappa — agreement beyond chance between two binary raters
# ---------------------------------------------------------------------------


def orders_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between two binary 'raters' on each
    order: rater A says an order is important (priority URGENT/HIGH),
    rater B says it was serviced fast (first line shipped within 30
    days) — the chance-corrected agreement measure a data team uses
    to check whether two independent labeling rules actually measure
    the same thing (raw accuracy is inflated by marginal imbalance).

    All-integer until the close: the 2x2 confusion counts are exact,
    p_o and p_e live as n-scaled integer products (po_num = n * (n_both
    + n_neither), pe_num = a1*b1 + a0*b0), and kappa = (po_num -
    pe_num) / (n*n - pe_num) is ONE IEEE division of exact BIGINTs,
    6dp-rounded.

    Scale: lineitem collapses per order in the same shuffle that
    joins orders (co-keyed); the confusion matrix is a 1-row agg."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("a"),
        "o_orderdate",
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    first_ship = l.groupBy("l_orderkey").agg(F.min("l_shipdate").alias("ship0"))
    rated = o.join(first_ship, o.o_orderkey == first_ship.l_orderkey).select(
        "a", (F.datediff("ship0", "o_orderdate") <= 30).alias("b")
    )
    cm = rated.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.expr("CAST(a AND b AS INT)")).cast("bigint").alias("n_both"),
        F.sum(F.expr("CAST(a AND NOT b AS INT)")).cast("bigint").alias("n_a_only"),
        F.sum(F.expr("CAST(b AND NOT a AS INT)")).cast("bigint").alias("n_b_only"),
        F.sum(F.expr("CAST(NOT a AND NOT b AS INT)")).cast("bigint").alias("n_neither"),
    )
    return cm.select(
        "n",
        "n_both",
        "n_a_only",
        "n_b_only",
        "n_neither",
        F.expr(
            "ROUND(CAST(n * (n_both + n_neither)"
            " - ((n_both + n_a_only) * (n_both + n_b_only)"
            "    + (n_b_only + n_neither) * (n_a_only + n_neither)) AS DOUBLE)"
            " / (n * n - ((n_both + n_a_only) * (n_both + n_b_only)"
            "             + (n_b_only + n_neither) * (n_a_only + n_neither))), 6)"
        ).alias("kappa"),
    )


ORDERS_KAPPA_SQL = """
WITH first_ship AS (
  SELECT l_orderkey, MIN(l_shipdate) AS ship0 FROM lineitem GROUP BY 1
),
rated AS (
  SELECT o.o_orderpriority IN ('1-URGENT', '2-HIGH') AS a,
         datediff('day', o.o_orderdate, f.ship0) <= 30 AS b
  FROM orders o JOIN first_ship f ON o.o_orderkey = f.l_orderkey
),
cm AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN a AND b THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_a_only,
         CAST(SUM(CASE WHEN b AND NOT a THEN 1 ELSE 0 END) AS BIGINT) AS n_b_only,
         CAST(SUM(CASE WHEN NOT a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
  FROM rated
)
SELECT n, n_both, n_a_only, n_b_only, n_neither,
       ROUND(CAST(n * (n_both + n_neither)
             - ((n_both + n_a_only) * (n_both + n_b_only)
                + (n_b_only + n_neither) * (n_a_only + n_neither)) AS DOUBLE)
             / (n * n - ((n_both + n_a_only) * (n_both + n_b_only)
                         + (n_b_only + n_neither) * (n_a_only + n_neither))), 6) AS kappa
FROM cm
"""

QUERIES["orders_cohens_kappa"] = orders_cohens_kappa
ORACLE["orders_cohens_kappa"] = ORDERS_KAPPA_SQL


# ---------------------------------------------------------------------------
# nations_rca_matrix — revealed comparative advantage per nation x brand
# ---------------------------------------------------------------------------


def nations_rca_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Balassa revealed-comparative-advantage index (Balassa 1965)
    over the supplier-nation x part-brand trade matrix:
    RCA = (x_ns / x_n) / (X_s / X) — which brands a nation supplies
    MORE intensively than the world does. Emits the top-30 (nation,
    brand) cells with RCA in exact integer ppm.

    Exactness: revenues are exact DECIMAL cents; the RCA ratio is
    one integer floor-division of two DECIMAL(38,0) products
    (x_ns*X*1e6 and x_n*X_s — each < 1e28, far under 38 digits;
    HUGEINT on DuckDB), so the ranking key is engine-identical with
    no float anywhere.

    Scale: ONE fact shuffle to (nation, brand) cells; marginals are
    window sums over the cell table (window-over-cells beats
    join-back re-aggregation on tiny cell tables — the r6 lag-MI
    A/B); top-30 is a TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", money("l_extendedprice").alias("rev")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("s_nationkey", "p_brand")
        .agg((F.sum("rev") * 100).cast("long").alias("cents"))
    )
    m = cells.select(
        "s_nationkey",
        "p_brand",
        "cents",
        F.sum("cents").over(Window.partitionBy("s_nationkey")).alias("x_n"),
        F.sum("cents").over(Window.partitionBy("p_brand")).alias("x_s"),
        F.sum("cents").over(Window.partitionBy(F.lit(1))).alias("x_tot"),
    )
    scored = m.select(
        "s_nationkey",
        "p_brand",
        "cents",
        F.expr(
            "CAST((CAST(cents AS DECIMAL(38,0)) * x_tot * 1000000)"
            " DIV (CAST(x_n AS DECIMAL(38,0)) * x_s) AS BIGINT)"
        ).alias("rca_ppm"),
    )
    return (
        scored.join(F.broadcast(n), scored.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("p_brand").alias("brand"),
            F.col("cents").alias("export_cents"),
            "rca_ppm",
        )
        .orderBy(F.col("rca_ppm").desc(), "nation", "brand")
        .limit(30)
    )


NATIONS_RCA_SQL = """
WITH cells AS (
  SELECT s.s_nationkey, p.p_brand,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) * 100 AS BIGINT)
           AS cents
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
m AS (
  SELECT s_nationkey, p_brand, cents,
         SUM(cents) OVER (PARTITION BY s_nationkey) AS x_n,
         SUM(cents) OVER (PARTITION BY p_brand) AS x_s,
         SUM(cents) OVER () AS x_tot
  FROM cells
)
SELECT n.n_name AS nation, m.p_brand AS brand,
       m.cents AS export_cents,
       CAST((CAST(m.cents AS HUGEINT) * x_tot * 1000000)
            // (CAST(x_n AS HUGEINT) * x_s) AS BIGINT) AS rca_ppm
FROM m JOIN nation n ON m.s_nationkey = n.n_nationkey
ORDER BY rca_ppm DESC, nation, brand
LIMIT 30
"""

QUERIES["nations_rca_matrix"] = nations_rca_matrix
ORACLE["nations_rca_matrix"] = NATIONS_RCA_SQL


def lineitem_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the "promo effect": do
    PROMO-type parts' per-item discounted revenues move differently
    from other parts' after the 1999-01-01 cut? The 2×2 causal
    workhorse (Card & Krueger 1994 design) — treatment = PROMO parts,
    control = everything else, outcome = mean discounted revenue per
    lineitem — plus the standard pre-period placebo (fake cut
    1997-01-01 inside the pre window): a nonzero placebo flags a
    broken parallel-trends assumption before anyone believes the
    headline number.

    Engine-exact: the four (six with placebo) cell sums are exact
    DECIMAL l_extendedprice·(1−l_discount) folded to integer 4dp;
    each mean is ONE IEEE division (sum4/n/10000.0, identical
    expression shape both engines); DiD combines four such doubles
    with the same ops in the same order.

    Scale: one broadcast-joined scan of lineitem (part is the small
    side at fixed selectivity but SCALES with SF — threshold/AQE
    decides, no forced hint), map-side-combined agg to six cells; the
    estimator is driver-math-free scalar algebra on one row."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("treated")
    )
    cells = li.join(p, li.l_partkey == p.p_partkey).select(
        "treated",
        (F.col("l_shipdate") >= F.lit("1999-01-01")).alias("post"),
        (F.col("l_shipdate") < F.lit("1997-01-01")).alias("pre_early"),
        (disc_price() * 10000).cast("bigint").alias("rev4"),
    )

    def cell(cond, col=None, alias=""):
        e = F.when(cond, F.col(col) if col else F.lit(1))
        return (F.sum(e) if col else F.count(e)).cast("bigint").alias(alias)

    t, po, pe = F.col("treated"), F.col("post"), F.col("pre_early")
    agg = cells.agg(
        cell(t & ~po, alias="n_treated_pre"),
        cell(t & po, alias="n_treated_post"),
        cell(~t & ~po, alias="n_control_pre"),
        cell(~t & po, alias="n_control_post"),
        cell(t & ~po, "rev4", "ts_pre"),
        cell(t & po, "rev4", "ts_post"),
        cell(~t & ~po, "rev4", "cs_pre"),
        cell(~t & po, "rev4", "cs_post"),
        cell(t & pe, "rev4", "ts_e"),
        cell(t & pe, alias="tn_e"),
        cell(t & ~po & ~pe, "rev4", "ts_l"),
        cell(t & ~po & ~pe, alias="tn_l"),
        cell(~t & pe, "rev4", "cs_e"),
        cell(~t & pe, alias="cn_e"),
        cell(~t & ~po & ~pe, "rev4", "cs_l"),
        cell(~t & ~po & ~pe, alias="cn_l"),
    )
    m = lambda s, n: F.col(s) / F.col(n) / 10000.0  # noqa: E731
    return agg.select(
        "n_treated_pre",
        "n_treated_post",
        "n_control_pre",
        "n_control_post",
        m("ts_pre", "n_treated_pre").alias("mean_treated_pre"),
        m("ts_post", "n_treated_post").alias("mean_treated_post"),
        m("cs_pre", "n_control_pre").alias("mean_control_pre"),
        m("cs_post", "n_control_post").alias("mean_control_post"),
        (
            (m("ts_post", "n_treated_post") - m("ts_pre", "n_treated_pre"))
            - (m("cs_post", "n_control_post") - m("cs_pre", "n_control_pre"))
        ).alias("did_estimate"),
        (
            (m("ts_l", "tn_l") - m("ts_e", "tn_e"))
            - (m("cs_l", "cn_l") - m("cs_e", "cn_e"))
        ).alias("placebo_did"),
    )


LINEITEM_DID_SQL = """
WITH cells AS (
  SELECT (p.p_type LIKE 'PROMO%') AS treated,
         (l.l_shipdate >= TIMESTAMP '1999-01-01') AS post,
         (l.l_shipdate < TIMESTAMP '1997-01-01') AS pre_early,
         CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(12,6)) - CAST(l.l_discount AS DECIMAL(12,6)))
              * 10000 AS BIGINT) AS rev4
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN treated AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_treated_pre,
    CAST(SUM(CASE WHEN treated AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_treated_post,
    CAST(SUM(CASE WHEN NOT treated AND NOT post THEN 1 ELSE 0 END) AS BIGINT) AS n_control_pre,
    CAST(SUM(CASE WHEN NOT treated AND post THEN 1 ELSE 0 END) AS BIGINT) AS n_control_post,
    CAST(SUM(CASE WHEN treated AND NOT post THEN rev4 END) AS BIGINT) AS ts_pre,
    CAST(SUM(CASE WHEN treated AND post THEN rev4 END) AS BIGINT) AS ts_post,
    CAST(SUM(CASE WHEN NOT treated AND NOT post THEN rev4 END) AS BIGINT) AS cs_pre,
    CAST(SUM(CASE WHEN NOT treated AND post THEN rev4 END) AS BIGINT) AS cs_post,
    CAST(SUM(CASE WHEN treated AND pre_early THEN rev4 END) AS BIGINT) AS ts_e,
    CAST(SUM(CASE WHEN treated AND pre_early THEN 1 ELSE 0 END) AS BIGINT) AS tn_e,
    CAST(SUM(CASE WHEN treated AND NOT post AND NOT pre_early THEN rev4 END) AS BIGINT) AS ts_l,
    CAST(SUM(CASE WHEN treated AND NOT post AND NOT pre_early THEN 1 ELSE 0 END) AS BIGINT) AS tn_l,
    CAST(SUM(CASE WHEN NOT treated AND pre_early THEN rev4 END) AS BIGINT) AS cs_e,
    CAST(SUM(CASE WHEN NOT treated AND pre_early THEN 1 ELSE 0 END) AS BIGINT) AS cn_e,
    CAST(SUM(CASE WHEN NOT treated AND NOT post AND NOT pre_early THEN rev4 END) AS BIGINT) AS cs_l,
    CAST(SUM(CASE WHEN NOT treated AND NOT post AND NOT pre_early THEN 1 ELSE 0 END) AS BIGINT) AS cn_l
  FROM cells
)
SELECT n_treated_pre, n_treated_post, n_control_pre, n_control_post,
       ts_pre / n_treated_pre / 10000.0 AS mean_treated_pre,
       ts_post / n_treated_post / 10000.0 AS mean_treated_post,
       cs_pre / n_control_pre / 10000.0 AS mean_control_pre,
       cs_post / n_control_post / 10000.0 AS mean_control_post,
       ((ts_post / n_treated_post / 10000.0) - (ts_pre / n_treated_pre / 10000.0))
       - ((cs_post / n_control_post / 10000.0) - (cs_pre / n_control_pre / 10000.0))
         AS did_estimate,
       ((ts_l / tn_l / 10000.0) - (ts_e / tn_e / 10000.0))
       - ((cs_l / cn_l / 10000.0) - (cs_e / cn_e / 10000.0)) AS placebo_did
FROM agg
"""

QUERIES["lineitem_did_estimator"] = lineitem_did_estimator
ORACLE["lineitem_did_estimator"] = LINEITEM_DID_SQL


def orders_panel_fixed_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-way fixed-effects (within) estimator on the balanced
    (customer × year) panel: yearly spend (whole dollars) regressed
    on yearly order count with customer AND year effects absorbed —
    the workhorse panel regression (Wooldridge ch.10), next to the
    naive pooled OLS slope so the bias the fixed effects remove is
    visible in one row.

    Exactness: the panel is BALANCED by construction (customer grid ×
    year grid, empty cells 0), so the within moments have the exact
    integer product form N·Σxy − C·ΣᵢSxiSyi − T·ΣₜSxtSyt + SxSy
    (denominator likewise with x) — no rational means materialize;
    each β is ONE IEEE division of two BIGINTs. Dollars (cents DIV
    100) keep every term under 2^63 past sf1 (checked: max term
    ~6e17 at sf1).

    Scale: orders → cell aggregation is one map-side-combined
    shuffle; the customer×year grid is |C|·|T| rows (grid join is
    broadcast on the tiny year list); the i- and t-marginal folds are
    one groupBy each on cell-sized data; the closing algebra is a
    cross join of three one-row frames."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    agg = o.groupBy("o_custkey", "yr").agg(
        F.count(F.lit(1)).alias("x0"),
        F.expr("CAST(SUM(cents) AS BIGINT) DIV 100").alias("y0"),
    )
    custs = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    years = o.select("yr").distinct()
    cells = (
        custs.crossJoin(F.broadcast(years))
        .join(agg, ["o_custkey", "yr"], "left")
        .select(
            "o_custkey",
            "yr",
            F.coalesce("x0", F.lit(0)).cast("bigint").alias("x"),
            F.coalesce("y0", F.lit(0)).cast("bigint").alias("y"),
        )
        .persist()
    )
    tot = cells.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.countDistinct("o_custkey").alias("c"),
        F.countDistinct("yr").alias("t"),
    )
    by_i = cells.groupBy("o_custkey").agg(
        F.sum("x").alias("sxi"), F.sum("y").alias("syi")
    ).agg(
        F.sum(F.expr("sxi * syi")).alias("sum_ixy"),
        F.sum(F.expr("sxi * sxi")).alias("sum_ixx"),
    )
    by_t = cells.groupBy("yr").agg(
        F.sum("x").alias("sxt"), F.sum("y").alias("syt")
    ).agg(
        F.sum(F.expr("sxt * syt")).alias("sum_txy"),
        F.sum(F.expr("sxt * sxt")).alias("sum_txx"),
    )
    out = (
        tot.crossJoin(by_i)
        .crossJoin(by_t)
        .select(
            F.col("c").cast("bigint").alias("n_customers"),
            F.col("t").cast("bigint").alias("n_years"),
            F.expr(
                "CAST(n * sxy - c * sum_ixy - t * sum_txy + sx * sy AS DOUBLE)"
                " / CAST(n * sxx - c * sum_ixx - t * sum_txx + sx * sx AS DOUBLE)"
            ).alias("beta_within"),
            F.expr(
                "CAST(n * sxy - sx * sy AS DOUBLE)"
                " / CAST(n * sxx - sx * sx AS DOUBLE)"
            ).alias("beta_pooled"),
        )
    )
    out = out.localCheckpoint(eager=True)
    cells.unpersist()
    return out


ORDERS_PANEL_FE_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
agg AS (
  SELECT o_custkey, yr, CAST(COUNT(*) AS BIGINT) AS x0,
         CAST(SUM(cents) AS BIGINT) // 100 AS y0
  FROM o GROUP BY 1, 2
),
cells AS (
  SELECT c.c_custkey AS o_custkey, yrs.yr,
         COALESCE(a.x0, 0) AS x, COALESCE(a.y0, 0) AS y
  FROM customer c
  CROSS JOIN (SELECT DISTINCT yr FROM o) yrs
  LEFT JOIN agg a ON a.o_custkey = c.c_custkey AND a.yr = yrs.yr
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS c,
         CAST(COUNT(DISTINCT yr) AS BIGINT) AS t
  FROM cells
),
by_i AS (
  SELECT CAST(SUM(sxi * syi) AS BIGINT) AS sum_ixy,
         CAST(SUM(sxi * sxi) AS BIGINT) AS sum_ixx
  FROM (SELECT o_custkey, SUM(x) AS sxi, SUM(y) AS syi FROM cells GROUP BY 1) z
),
by_t AS (
  SELECT CAST(SUM(sxt * syt) AS BIGINT) AS sum_txy,
         CAST(SUM(sxt * sxt) AS BIGINT) AS sum_txx
  FROM (SELECT yr, SUM(x) AS sxt, SUM(y) AS syt FROM cells GROUP BY 1) z
)
SELECT c AS n_customers, t AS n_years,
       CAST(n * sxy - c * sum_ixy - t * sum_txy + sx * sy AS DOUBLE)
       / CAST(n * sxx - c * sum_ixx - t * sum_txx + sx * sx AS DOUBLE)
         AS beta_within,
       CAST(n * sxy - sx * sy AS DOUBLE)
       / CAST(n * sxx - sx * sx AS DOUBLE) AS beta_pooled
FROM tot, by_i, by_t
"""

QUERIES["orders_panel_fixed_effects"] = orders_panel_fixed_effects
ORACLE["orders_panel_fixed_effects"] = ORDERS_PANEL_FE_SQL


def nations_gravity_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gravity model of bilateral trade (Tinbergen 1962): on the
    customer-nation → supplier-nation flow matrix (the q7 join
    collapsed to nation pairs), regress ln(flow) on
    ln(mass_origin · mass_destination) — the elasticity of trade to
    combined economic size, the single most replicated relationship
    in empirical trade economics (β ≈ 1 on real data). Emits the OLS
    fit (β, α, R²) over the positive-flow cells.

    Engine-exact: flows and nation masses are exact integer 4dp
    units (disc_price is exactly 4-decimal, so ×10000 is integral —
    ×100 would leave digits where the two engines' DECIMAL→int casts
    disagree, truncate vs round);
    each ln quantizes to e4 BEFORE the moment sums (the transcendental
    per-term rounding discipline — e4 keeps every BIGINT moment under
    2^63: 625 cells × (3e5)² × 625 ≈ 4e16); β/α/R² are IEEE
    expressions of identical shape over the integer moments.

    Scale: one fact-table aggregation to ≤|nations|² cells (dims
    broadcast per house rule — fixed cardinality); masses are window
    sums over the cell table; the regression is a one-row fold."""
    # flows in 4dp units: disc_price is exactly 4-decimal (2dp price
    # x <=2dp discount), so x10000 is INTEGRAL — x100 left fractional
    # digits where Spark's DECIMAL->long cast truncates but DuckDB's
    # rounds (the double->int rule applies to decimals too; caught at
    # the r8 gate, cell flows differed by units)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", (disc_price() * 10000).cast("long").alias("v4")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("i"), F.col("s_nationkey").alias("j"))
        .agg(F.sum("v4").alias("flow"))
    )
    m = cells.select(
        "flow",
        F.sum("flow").over(Window.partitionBy("i")).alias("mi"),
        F.sum("flow").over(Window.partitionBy("j")).alias("mj"),
    ).where(F.col("flow") > 0)
    pts = m.select(
        F.expr(
            "CAST(ROUND(LN(CAST(mi AS DOUBLE) * CAST(mj AS DOUBLE)) * 10000, 0)"
            " AS BIGINT)"
        ).alias("x"),
        F.expr("CAST(ROUND(LN(CAST(flow AS DOUBLE)) * 10000, 0) AS BIGINT)").alias(
            "y"
        ),
    )
    mom = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    return mom.select(
        F.col("n").cast("bigint").alias("n_cells"),
        F.expr(
            "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"
        ).alias("beta"),
        F.expr(
            "(CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE)"
            " / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n / 10000.0"
        ).alias("alpha"),
        F.expr(
            "(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))"
            " / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))"
        ).alias("r2"),
    )


NATIONS_GRAVITY_SQL = """
WITH cells AS (
  SELECT c.c_nationkey AS i, s.s_nationkey AS j,
         CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(12,2))
              * (CAST(1 AS DECIMAL(12,6)) - CAST(l.l_discount AS DECIMAL(12,6)))
              * 10000 AS BIGINT)) AS BIGINT) AS flow
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
m AS (
  SELECT flow,
         SUM(flow) OVER (PARTITION BY i) AS mi,
         SUM(flow) OVER (PARTITION BY j) AS mj
  FROM cells
),
pts AS (
  SELECT CAST(ROUND(LN(CAST(mi AS DOUBLE) * CAST(mj AS DOUBLE)) * 10000, 0)
              AS BIGINT) AS x,
         CAST(ROUND(LN(CAST(flow AS DOUBLE)) * 10000, 0) AS BIGINT) AS y
  FROM m WHERE flow > 0
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM pts
)
SELECT n AS n_cells,
       CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)
         AS beta,
       (CAST(sy AS DOUBLE) - (CAST(n * sxy - sx * sy AS DOUBLE)
        / CAST(n * sxx - sx * sx AS DOUBLE)) * sx) / n / 10000.0 AS alpha,
       (CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE))
       / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
         AS r2
FROM mom
"""

QUERIES["nations_gravity_model"] = nations_gravity_model
ORACLE["nations_gravity_model"] = NATIONS_GRAVITY_SQL


_KW_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


def orders_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal–Wallis rank test (1952): does order value DIFFER in
    distribution across the five priority classes? The nonparametric
    one-way ANOVA — rank-based, so outliers and skew (which order
    values have plenty of) can't fake or mask an effect the way they
    do in lineitem_anova_f's mean comparison. Emits per-group n and
    rank sums plus the tie-corrected H statistic (χ²_4 under H0).

    Engine-exact: ranks come from the histogram-CDF house pattern —
    one (value → per-group count) grid, average tie ranks kept
    integral as DOUBLED ranks (2·cum + cnt + 1); doubled rank sums
    R2_j are exact BIGINTs; each R2²/n term is computed in DOUBLE
    (R2 < 2^53) and the five terms fold in EXPLICIT priority order
    (a SUM over 5 shuffled rows would be order-dependent — fixed
    categories become fixed columns instead); the tie correction
    Σ(t³−t) is an exact BIGINT.

    Scale: ONE aggregation to the (value, priority) histogram; the
    CDF window runs on histogram-sized data; everything after is a
    five-column scalar row."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    hist = o.groupBy("cents", "o_orderpriority").agg(F.count(F.lit(1)).alias("c"))
    byval = hist.groupBy("cents").agg(
        F.sum("c").alias("tc"),
        *[
            F.sum(F.when(F.col("o_orderpriority") == p, F.col("c")).otherwise(0)).alias(
                f"g{i}"
            )
            for i, p in enumerate(_KW_PRIORITIES)
        ],
    )
    w = Window.orderBy("cents").rowsBetween(Window.unboundedPreceding, -1)
    ranked = byval.select(
        "*",
        F.coalesce(F.sum("tc").over(w), F.lit(0)).alias("cum"),
    ).select(
        "*",
        # doubled average rank of the tie group: 2*cum + tc + 1
        (F.lit(2) * F.col("cum") + F.col("tc") + 1).alias("r2"),
    )
    agg = ranked.agg(
        F.sum("tc").alias("n"),
        F.expr("SUM(CAST(tc AS BIGINT) * tc * tc - tc)").alias("ties"),
        *[F.sum(f"g{i}").alias(f"n{i}") for i in range(5)],
        *[F.expr(f"SUM(CAST(r2 AS BIGINT) * g{i})").alias(f"rs{i}") for i in range(5)],
    )
    # H = 3*sum(R2_j^2/n_j)/(N(N+1)) - 3(N+1)   (R2 = doubled ranks)
    term = " + ".join(
        f"(CAST(rs{i} AS DOUBLE) * CAST(rs{i} AS DOUBLE) / n{i})" for i in range(5)
    )
    h = f"(3.0 * ({term}) / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))"
    corr = "(1.0 - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n))"
    return agg.select(
        F.col("n").cast("bigint").alias("n_orders"),
        *[F.col(f"n{i}").cast("bigint").alias(f"n_p{i + 1}") for i in range(5)],
        *[F.col(f"rs{i}").cast("bigint").alias(f"ranksum2_p{i + 1}") for i in range(5)],
        F.expr(h).alias("h_stat"),
        F.expr(f"{h} / {corr}").alias("h_tie_corrected"),
    )


def _kw_sql() -> str:
    gcols = ",\n         ".join(
        f"SUM(CASE WHEN o_orderpriority = '{p}' THEN c ELSE 0 END) AS g{i}"
        for i, p in enumerate(_KW_PRIORITIES)
    )
    ncols = ", ".join(f"CAST(SUM(g{i}) AS BIGINT) AS n{i}" for i in range(5))
    rscols = ", ".join(
        f"CAST(SUM(CAST(r2 AS BIGINT) * g{i}) AS BIGINT) AS rs{i}" for i in range(5)
    )
    term = " + ".join(
        f"(CAST(rs{i} AS DOUBLE) * CAST(rs{i} AS DOUBLE) / n{i})" for i in range(5)
    )
    h = f"(3.0 * ({term}) / (CAST(n AS DOUBLE) * (n + 1)) - 3.0 * (n + 1))"
    corr = "(1.0 - CAST(ties AS DOUBLE) / (CAST(n AS DOUBLE) * n * n - n))"
    outn = ", ".join(f"n{i} AS n_p{i + 1}" for i in range(5))
    outr = ", ".join(f"rs{i} AS ranksum2_p{i + 1}" for i in range(5))
    return f"""
WITH o AS (
  SELECT o_orderpriority,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
hist AS (
  SELECT cents, o_orderpriority, COUNT(*) AS c FROM o GROUP BY 1, 2
),
byval AS (
  SELECT cents, SUM(c) AS tc,
         {gcols}
  FROM hist GROUP BY cents
),
ranked AS (
  SELECT *,
         2 * COALESCE(SUM(tc) OVER (ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + tc + 1 AS r2
  FROM byval
),
agg AS (
  SELECT CAST(SUM(tc) AS BIGINT) AS n,
         CAST(SUM(CAST(tc AS BIGINT) * tc * tc - tc) AS BIGINT) AS ties,
         {ncols},
         {rscols}
  FROM ranked
)
SELECT n AS n_orders, {outn}, {outr},
       {h} AS h_stat,
       {h} / {corr} AS h_tie_corrected
FROM agg
"""


QUERIES["orders_kruskal_wallis"] = orders_kruskal_wallis
ORACLE["orders_kruskal_wallis"] = _kw_sql()


def lineitem_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Levene's variance-homogeneity test, Brown–Forsythe variant
    (1974): are extended-price SPREADS equal across the three return
    flags? The assumption check every mean-comparison in this suite
    (anova_f, welch, DiD) stands on — deviations from the group
    MEDIAN (robust, unlike the classic mean form), then a one-way
    ANOVA F on those deviations. Emits per-group n + doubled medians
    and the W statistic (F_{2, N−3} under H0).

    Engine-exact: group medians come from the histogram-CDF house
    pattern kept INTEGRAL as doubled medians (lower + upper middle
    value — no .5 materializes); deviations |2x − m2| are exact
    BIGINTs; Σz goes BIGINT, Σz² goes DECIMAL(38,0) with the welch
    0dp-round-then-double discipline; the three groups land in fixed
    COLUMNS so every double fold has explicit order.

    Scale: one (flag, cents) histogram aggregation; the CDF window
    is per-flag histogram-sized; the deviation pass is one
    broadcast-joined scan; the F close is a one-row fold."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    hist = li.groupBy("l_returnflag", "cents").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        "l_returnflag",
        "cents",
        F.sum("c").over(w).alias("cum"),
        F.sum("c").over(Window.partitionBy("l_returnflag")).alias("n"),
    )
    med = cum.groupBy("l_returnflag").agg(
        F.min(F.when(F.expr("cum >= (n + 1) DIV 2"), F.col("cents"))).alias("lo"),
        F.min(F.when(F.expr("cum >= (n + 2) DIV 2"), F.col("cents"))).alias("hi"),
    ).select("l_returnflag", (F.col("lo") + F.col("hi")).alias("m2"))
    dev = li.join(F.broadcast(med), "l_returnflag").select(
        "l_returnflag", F.expr("ABS(2 * cents - m2)").alias("z")
    )
    flags = ("A", "N", "R")
    agg = dev.agg(
        *[
            F.sum(F.when(F.col("l_returnflag") == f, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{f}")
            for f in flags
        ],
        *[
            F.sum(F.when(F.col("l_returnflag") == f, F.col("z")))
            .cast("bigint")
            .alias(f"s_{f}")
            for f in flags
        ],
        *[
            F.sum(
                F.when(
                    F.col("l_returnflag") == f,
                    F.expr("CAST(z AS DECIMAL(38,0)) * z"),
                )
            )
            .cast("decimal(38,0)")
            .alias(f"q_{f}")
            for f in flags
        ],
    )
    gmeans = " + ".join(f"CAST(s_{f} AS DOUBLE)" for f in flags)
    ntot = " + ".join(f"n_{f}" for f in flags)
    between = (
        " + ".join(
            f"(CAST(s_{f} AS DOUBLE) * CAST(s_{f} AS DOUBLE) / n_{f})" for f in flags
        )
        + f" - ({gmeans}) * ({gmeans}) / ({ntot})"
    )
    within = " + ".join(
        f"(CAST(q_{f} AS DOUBLE) - CAST(s_{f} AS DOUBLE) * CAST(s_{f} AS DOUBLE) / n_{f})"
        for f in flags
    )
    cols = [F.col(f"n_{f}").alias(f"n_{f.lower()}") for f in flags] + [
        F.col(f"s_{f}").alias(f"devsum2_{f.lower()}") for f in flags
    ]
    return agg.join(
        med.groupBy().pivot("l_returnflag", list(flags)).agg(F.first("m2"))
    ).select(
        *cols,
        *[F.col(f).cast("bigint").alias(f"median2_{f.lower()}") for f in flags],
        F.expr(f"(({between}) / 2.0) / (({within}) / (({ntot}) - 3.0))").alias(
            "w_stat"
        ),
    )


def _levene_sql() -> str:
    flags = ("A", "N", "R")
    ncols = ", ".join(
        f"CAST(SUM(CASE WHEN l_returnflag = '{f}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{f}"
        for f in flags
    )
    scols = ", ".join(
        f"CAST(SUM(CASE WHEN l_returnflag = '{f}' THEN z END) AS BIGINT) AS s_{f}"
        for f in flags
    )
    qcols = ", ".join(
        f"CAST(SUM(CASE WHEN l_returnflag = '{f}' THEN CAST(z AS HUGEINT) * z END)"
        f" AS HUGEINT) AS q_{f}"
        for f in flags
    )
    gmeans = " + ".join(f"CAST(s_{f} AS DOUBLE)" for f in flags)
    ntot = " + ".join(f"n_{f}" for f in flags)
    between = (
        " + ".join(
            f"(CAST(s_{f} AS DOUBLE) * CAST(s_{f} AS DOUBLE) / n_{f})" for f in flags
        )
        + f" - ({gmeans}) * ({gmeans}) / ({ntot})"
    )
    within = " + ".join(
        f"(CAST(q_{f} AS DOUBLE) - CAST(s_{f} AS DOUBLE) * CAST(s_{f} AS DOUBLE) / n_{f})"
        for f in flags
    )
    outn = ", ".join(f"n_{f} AS n_{f.lower()}" for f in flags)
    outs = ", ".join(f"s_{f} AS devsum2_{f.lower()}" for f in flags)
    outm = ", ".join(
        f"(SELECT m2 FROM med WHERE l_returnflag = '{f}') AS median2_{f.lower()}"
        for f in flags
    )
    return f"""
WITH li AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
),
hist AS (
  SELECT l_returnflag, cents, COUNT(*) AS c FROM li GROUP BY 1, 2
),
cum AS (
  SELECT l_returnflag, cents,
         SUM(c) OVER (PARTITION BY l_returnflag ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY l_returnflag) AS n
  FROM hist
),
med AS (
  SELECT l_returnflag,
         MIN(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
         + MIN(CASE WHEN cum >= (n + 2) // 2 THEN cents END) AS m2
  FROM cum GROUP BY 1
),
dev AS (
  SELECT li.l_returnflag, ABS(2 * li.cents - m.m2) AS z
  FROM li JOIN med m ON m.l_returnflag = li.l_returnflag
),
agg AS (
  SELECT {ncols}, {scols}, {qcols} FROM dev
)
SELECT {outn}, {outs}, {outm},
       (({between}) / 2.0) / (({within}) / (({ntot}) - 3.0)) AS w_stat
FROM agg
"""


QUERIES["lineitem_levene_test"] = lineitem_levene_test
ORACLE["lineitem_levene_test"] = _levene_sql()


def orders_expected_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-at-Risk and Expected Shortfall of the order-value
    distribution at the 95th and 99th percentiles — the coherent tail
    risk pair (Artzner et al. 1999): VaR is the exact order
    statistic, ES the exact mean ABOVE it (here "risk" = exposure
    concentration: what the largest orders carry). Complements the
    winsorized/percentile family with the conditional tail mean.

    Engine-exact: the histogram-CDF house pattern — VaR_q is the
    value at integer position N − FLOOR(q·N/100) from the top (pure
    integer position math, no interpolation); the tail sum is an
    exact BIGINT cents fold over histogram cells (count-weighted,
    with the boundary cell partially included by exact count), one
    IEEE division per ES.

    Scale: one value→count aggregation; the CDF window runs on
    histogram-sized data; no global row sort anywhere."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        )
    )
    hist = o.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.desc("cents")).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "cents",
        "c",
        F.sum("c").over(w).alias("cum_top"),
        F.sum("c").over(Window.partitionBy(F.lit(1))).alias("n"),
    )
    rows = []
    for q in (95, 99):
        k = f"(n - (n * {q}) DIV 100)"  # tail size = N - floor(qN/100)
        agg = cum.agg(
            F.max("n").alias("n"),
            # the boundary cell = the LARGEST value whose top-cumulative
            # reaches the tail size (every cell below it also satisfies
            # cum_top >= k — MIN here would grab the distribution MINIMUM;
            # caught by the round-8 property test, invisible to the
            # cross-engine hash since both engines shared the bug)
            F.max(F.when(F.expr(f"cum_top >= {k}"), F.col("cents"))).alias("var_c"),
            # full cells strictly inside the tail + the boundary cell's
            # exact partial count
            F.sum(
                F.when(F.expr(f"cum_top <= {k}"), F.expr("CAST(cents AS BIGINT) * c"))
            ).alias("s_full"),
            F.sum(F.when(F.expr(f"cum_top <= {k}"), F.col("c"))).alias("c_full"),
        ).select(
            F.lit(q).cast("int").alias("level_pct"),
            F.expr(f"CAST({k} AS BIGINT)").alias("n_tail"),
            F.expr("CAST(var_c AS DOUBLE) / 100").alias("var_value"),
            F.expr(
                f"(CAST(COALESCE(s_full, 0) AS DOUBLE)"
                f" + CAST(var_c AS DOUBLE) * ({k} - COALESCE(c_full, 0)))"
                f" / {k} / 100"
            ).alias("es_value"),
        )
        rows.append(agg)
    return rows[0].unionByName(rows[1]).orderBy("level_pct")


def _es_sql() -> str:
    parts = []
    for q in (95, 99):
        k = f"(n - (n * {q}) // 100)"
        parts.append(f"""
SELECT CAST({q} AS INTEGER) AS level_pct,
       CAST({k} AS BIGINT) AS n_tail,
       CAST(MAX(CASE WHEN cum_top >= {k} THEN cents END) AS DOUBLE) / 100
         AS var_value,
       (CAST(COALESCE(SUM(CASE WHEN cum_top <= {k}
                                THEN CAST(cents AS BIGINT) * c END), 0) AS DOUBLE)
        + CAST(MAX(CASE WHEN cum_top >= {k} THEN cents END) AS DOUBLE)
          * ({k} - COALESCE(SUM(CASE WHEN cum_top <= {k} THEN c END), 0)))
       / {k} / 100 AS es_value
FROM cum GROUP BY n""")
    return """
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
hist AS (SELECT cents, COUNT(*) AS c FROM o GROUP BY 1),
cum AS (
  SELECT cents, c,
         SUM(c) OVER (ORDER BY cents DESC ROWS UNBOUNDED PRECEDING) AS cum_top,
         SUM(c) OVER () AS n
  FROM hist
)
""" + "\nUNION ALL\n".join(parts) + "\nORDER BY level_pct"


QUERIES["orders_expected_shortfall"] = orders_expected_shortfall
ORACLE["orders_expected_shortfall"] = _es_sql()


def customers_negbin_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negative-binomial fit of per-customer order counts by method
    of moments (the overdispersion workhorse behind every
    "purchases per customer" model — Poisson forces var = mean; NB's
    r, p absorb the heterogeneity): r̂ = m²/(v − m), p̂ = m/v, plus
    the dispersion index v/m that justifies leaving Poisson.
    Customers with zero orders count (the grid join) — the zero class
    is exactly what NB fits better.

    Engine-exact: integer count moments (n, Σx, Σx²) with the sample
    variance and every derived quantity closed in IEEE expressions of
    identical shape; no transcendentals anywhere.

    Scale: one orders aggregation + a customer-grid left join (the
    zero class); the fit is a one-row fold."""
    o = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("x0")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey")
    )
    x = c.join(o, "o_custkey", "left").select(
        F.coalesce("x0", F.lit(0)).cast("bigint").alias("x")
    )
    mom = x.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    mean = "(CAST(sx AS DOUBLE) / n)"
    var = "(CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))"
    return mom.select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.expr(mean).alias("mean_orders"),
        F.expr(var).alias("var_orders"),
        F.expr(f"{var} / {mean}").alias("dispersion_index"),
        F.expr(f"{mean} * {mean} / ({var} - {mean})").alias("nb_r"),
        F.expr(f"{mean} / {var}").alias("nb_p"),
    )


CUSTOMERS_NEGBIN_SQL = """
WITH x AS (
  SELECT c.c_custkey, CAST(COALESCE(o.cnt, 0) AS BIGINT) AS x
  FROM customer c
  LEFT JOIN (SELECT o_custkey, COUNT(*) AS cnt FROM orders GROUP BY 1) o
    ON o.o_custkey = c.c_custkey
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM x
)
SELECT n AS n_customers,
       (CAST(sx AS DOUBLE) / n) AS mean_orders,
       (CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
         AS var_orders,
       (CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
         / (CAST(sx AS DOUBLE) / n) AS dispersion_index,
       (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)
         / ((CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
            - (CAST(sx AS DOUBLE) / n)) AS nb_r,
       (CAST(sx AS DOUBLE) / n)
         / (CAST(n * sxx - sx * sx AS DOUBLE) / (CAST(n AS DOUBLE) * (n - 1)))
         AS nb_p
FROM mom
"""

QUERIES["customers_negbin_fit"] = customers_negbin_fit
ORACLE["customers_negbin_fit"] = CUSTOMERS_NEGBIN_SQL


_HILL_K = 200


def lineitem_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the price tail index (Hill 1975):
    α̂ = k / Σᵢ ln(xᵢ/x₍ₖ₎) over the k = 200 largest extended prices
    — the EVT answer to "how heavy is the price tail" that a plain
    variance can't give (α ≤ 2 ⇒ infinite variance). Emits k, the
    tail threshold x₍ₖ₎, the Hill α and its reciprocal (the tail
    exponent's standard error is α/√k — derivable).

    Engine-exact: the top-k tail comes from the DESC histogram-CDF
    (no global row sort — duplicates of a value are interchangeable
    in the statistic, so cell-level work is exact); each cell's
    ln(v/x₍ₖ₎) rounds to e6 BEFORE the integer count-weighting
    (transcendental discipline), and the boundary cell enters with
    its exact partial count; α is one IEEE division.

    Scale: one value→count aggregation + a histogram-sized window;
    the tail fold touches ≤ k cells."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        )
    )
    hist = li.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.desc("cents")).rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "cents", "c", F.sum("c").over(w).alias("cum_top")
    )
    xk = cum.agg(
        # largest value whose top-cumulative reaches k (MAX — see the
        # expected-shortfall boundary note)
        F.max(F.when(F.expr(f"cum_top >= {_HILL_K}"), F.col("cents"))).alias("xk")
    )
    terms = cum.crossJoin(F.broadcast(xk)).where(F.col("cents") >= F.col("xk")).select(
        "cents",
        "xk",
        # exact tail membership count for this cell (boundary partial)
        F.expr(f"LEAST(c, {_HILL_K} - (cum_top - c))").alias("k_in"),
        F.expr(
            "CAST(ROUND(LN(CAST(cents AS DOUBLE) / CAST(xk AS DOUBLE)) * 1000000, 0)"
            " AS BIGINT)"
        ).alias("l_e6"),
    )
    agg = terms.agg(
        F.max("xk").alias("xk"),
        F.sum(F.expr("l_e6 * k_in")).alias("s_e6"),
        F.sum("k_in").alias("k"),
    )
    return agg.select(
        F.col("k").cast("bigint").alias("k_tail"),
        F.expr("CAST(xk AS DOUBLE) / 100").alias("tail_threshold"),
        F.expr("CAST(s_e6 AS DOUBLE) / k / 1000000.0").alias("hill_inv_alpha"),
        F.expr("CAST(k AS DOUBLE) * 1000000.0 / s_e6").alias("hill_alpha"),
    )


LINEITEM_HILL_SQL = f"""
WITH li AS (
  SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
),
hist AS (SELECT cents, COUNT(*) AS c FROM li GROUP BY 1),
cum AS (
  SELECT cents, c,
         SUM(c) OVER (ORDER BY cents DESC ROWS UNBOUNDED PRECEDING) AS cum_top
  FROM hist
),
xk AS (SELECT MAX(CASE WHEN cum_top >= {_HILL_K} THEN cents END) AS xk FROM cum),
terms AS (
  SELECT cents, xk.xk,
         LEAST(c, {_HILL_K} - (cum_top - c)) AS k_in,
         CAST(ROUND(LN(CAST(cents AS DOUBLE) / CAST(xk.xk AS DOUBLE)) * 1000000, 0)
              AS BIGINT) AS l_e6
  FROM cum CROSS JOIN xk
  WHERE cents >= xk.xk
),
agg AS (
  SELECT MAX(xk) AS xk, CAST(SUM(l_e6 * k_in) AS BIGINT) AS s_e6,
         CAST(SUM(k_in) AS BIGINT) AS k
  FROM terms
)
SELECT k AS k_tail,
       CAST(xk AS DOUBLE) / 100 AS tail_threshold,
       CAST(s_e6 AS DOUBLE) / k / 1000000.0 AS hill_inv_alpha,
       CAST(k AS DOUBLE) * 1000000.0 / s_e6 AS hill_alpha
FROM agg
"""

QUERIES["lineitem_hill_tail"] = lineitem_hill_tail
ORACLE["lineitem_hill_tail"] = LINEITEM_HILL_SQL


def parts_price_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-dispersion decomposition (the law-of-one-price audit):
    how much of total extended-price variation is BETWEEN parts
    (catalog structure) vs WITHIN a part (the same part selling at
    different prices — quantity tiers, discount policy, or leakage)?
    One-way variance decomposition SST = SSB + SSW over ~20k part
    groups, with η² = SSB/SST and the within-part share that a
    pricing audit actually acts on.

    Engine-exact: integer cents sums; per-part Σx² in DECIMAL(38,0);
    the between term Σ S_j²/n_j quantizes PER PART as the integer
    floor S_j² DIV n_j (deterministic truncation both engines —
    summing 20k per-part DOUBLES would be shuffle-order-dependent,
    the r6 corpus_mix lesson), so every aggregate is an exact
    integer/DECIMAL before ONE IEEE close per emitted ratio.

    Scale: one part-level aggregation (map-side combine), one
    all-parts fold; no joins, no windows on raw rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    per = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("nj"),
        F.sum("cents").alias("sj"),
        F.sum(F.expr("CAST(cents AS DECIMAL(38,0)) * cents")).alias("qj"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("nj").alias("n"),
        F.sum("sj").alias("s"),
        F.sum("qj").alias("q"),
        # DIV returns LONG (r8 lesson) — recast before the 20k-part
        # sum, whose total exceeds 2^63 at sf0.1
        F.sum(
            F.expr("CAST(CAST(sj AS DECIMAL(38,0)) * sj DIV nj AS DECIMAL(38,0))")
        ).alias("b"),
    )
    sst = "(CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)"
    ssb = "(CAST(b AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)"
    return agg.select(
        F.col("n_parts").cast("bigint").alias("n_parts"),
        F.col("n").cast("bigint").alias("n_items"),
        F.expr(f"{ssb} / {sst}").alias("eta_squared"),
        F.expr(f"({sst} - {ssb}) / {sst}").alias("within_share"),
        F.expr(f"SQRT(({sst} - {ssb}) / (n - n_parts)) / 100").alias(
            "within_part_sd"
        ),
    )


PARTS_DISPERSION_SQL = """
WITH li AS (
  SELECT l_partkey,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM lineitem
),
per AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS nj,
         CAST(SUM(cents) AS BIGINT) AS sj,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS qj
  FROM li GROUP BY 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts, CAST(SUM(nj) AS BIGINT) AS n,
         CAST(SUM(sj) AS BIGINT) AS s, CAST(SUM(qj) AS HUGEINT) AS q,
         CAST(SUM(CAST(sj AS HUGEINT) * sj // nj) AS HUGEINT) AS b
  FROM per
)
SELECT n_parts, n AS n_items,
       (CAST(b AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
       / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
         AS eta_squared,
       ((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
        - (CAST(b AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n))
       / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
         AS within_share,
       SQRT(((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
             - (CAST(b AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n))
            / (n - n_parts)) / 100 AS within_part_sd
FROM agg
"""

QUERIES["parts_price_dispersion"] = parts_price_dispersion
ORACLE["parts_price_dispersion"] = PARTS_DISPERSION_SQL


def orders_dupe_invoice_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-payment screen (the classic AP audit): pairs of
    orders from the SAME customer with the SAME total amount within
    30 days of each other — the signature of a double-billed /
    double-entered invoice. Emits the suspect-pair count, affected
    customers/amounts, and the total exposure.

    Engine-exact: amounts are exact integer cents, the window is an
    integer day difference (datediff-free: epoch-day subtraction on
    both engines); pair formation happens ONLY inside (customer,
    amount) groups with ≥2 orders — the self-join input is the tiny
    suspect-group table, not the fact table.

    Scale: one (custkey, cents) aggregation prunes the universe to
    multi-hit groups; Σ group² is bounded by the duplicate rate
    (pathological amounts would need the max_df-style guard — counts
    here are per-customer, naturally small)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        F.expr(
            "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000"
            " AS BIGINT)"
        ).alias("day"),
    )
    grp = o.groupBy("o_custkey", "cents").agg(F.count(F.lit(1)).alias("g"))
    cand = o.join(
        grp.where(F.col("g") >= 2).select("o_custkey", "cents"),
        ["o_custkey", "cents"],
    )
    a = cand.select(
        "o_custkey", "cents",
        F.col("o_orderkey").alias("k1"), F.col("day").alias("d1"),
    )
    b = cand.select(
        F.col("o_custkey").alias("c2"), F.col("cents").alias("v2"),
        F.col("o_orderkey").alias("k2"), F.col("day").alias("d2"),
    )
    pairs = a.join(
        b,
        (a.o_custkey == b.c2) & (a.cents == b.v2) & (a.k1 < b.k2),
    ).where(F.expr("ABS(d1 - d2) <= 30"))
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_suspect_pairs"),
        F.countDistinct("o_custkey").cast("bigint").alias("n_customers"),
        F.countDistinct("cents").cast("bigint").alias("n_amounts"),
        F.expr("CAST(SUM(cents) AS DOUBLE) / 100").alias("exposure_value"),
        F.expr("CAST(MIN(ABS(d1 - d2)) AS BIGINT)").alias("min_gap_days"),
    )


ORDERS_DUPE_INVOICE_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         epoch_us(o_orderdate) // 86400000000 AS day
  FROM orders
),
grp AS (
  SELECT o_custkey, cents FROM o GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
cand AS (
  SELECT o.* FROM o JOIN grp USING (o_custkey, cents)
),
pairs AS (
  SELECT a.o_custkey, a.cents, ABS(a.day - b.day) AS gap
  FROM cand a JOIN cand b
    ON a.o_custkey = b.o_custkey AND a.cents = b.cents
   AND a.o_orderkey < b.o_orderkey
  WHERE ABS(a.day - b.day) <= 30
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_suspect_pairs,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
       CAST(COUNT(DISTINCT cents) AS BIGINT) AS n_amounts,
       CAST(SUM(cents) AS DOUBLE) / 100 AS exposure_value,
       CAST(MIN(gap) AS BIGINT) AS min_gap_days
FROM pairs
"""

QUERIES["orders_dupe_invoice_audit"] = orders_dupe_invoice_audit
ORACLE["orders_dupe_invoice_audit"] = ORDERS_DUPE_INVOICE_SQL


def lineitem_tail_dependence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical upper-tail dependence λ_U(q) = P(price > price_q |
    qty > qty_q) at q ∈ {90, 95, 99} — the copula-diagnostic behind
    joint-extremes risk (do the BIGGEST orders also carry the biggest
    revenue, or do the tails decouple?), complementing the marginal
    tail fits (lineitem_hill_tail, orders_expected_shortfall) with a
    BIVARIATE read. λ_U ≈ 1−q under independence; → constant > 1−q
    under tail dependence.

    Engine-exact: quantile boundaries are exact order statistics off
    the value→count histogram (min value with cum·100 ≥ q·n — integer
    compare, no interpolation); tail counts are integers; λ_U is one
    IEEE division rounded 6dp.

    Scale: two histogram aggs (map-side combined) + CDF windows on
    histogram cells; the final tail counts are ONE conditional scan
    agg against 6 broadcast boundary scalars."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("decimal(12,2)").alias("qty"),
        money("l_extendedprice").alias("price"),
    )

    def bounds(col: str) -> DataFrame:
        hist = li.groupBy(col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
            "tot", F.sum("cnt").over(Window.partitionBy())
        )
        return cum.agg(
            *[
                F.min(
                    F.when(F.col("cum") * 100 >= F.lit(q) * F.col("tot"), F.col(col))
                ).alias(f"{col}_q{q}")
                for q in (90, 95, 99)
            ]
        )
    b = bounds("qty").join(bounds("price"))
    agg = li.join(F.broadcast(b)).agg(
        *[
            x
            for q in (90, 95, 99)
            for x in (
                F.sum(F.when(F.col("qty") > F.col(f"qty_q{q}"), 1).otherwise(0))
                .cast("bigint")
                .alias(f"nx{q}"),
                F.sum(
                    F.when(
                        (F.col("qty") > F.col(f"qty_q{q}"))
                        & (F.col("price") > F.col(f"price_q{q}")),
                        1,
                    ).otherwise(0)
                )
                .cast("bigint")
                .alias(f"nj{q}"),
            )
        ],
        F.max(F.col("qty_q90").cast("double")).alias("bq90"),
        F.max(F.col("qty_q95").cast("double")).alias("bq95"),
        F.max(F.col("qty_q99").cast("double")).alias("bq99"),
        F.max(F.col("price_q90").cast("double")).alias("bp90"),
        F.max(F.col("price_q95").cast("double")).alias("bp95"),
        F.max(F.col("price_q99").cast("double")).alias("bp99"),
    )
    stacked = agg.select(
        F.expr(
            "stack(3,"
            " 90, bq90, bp90, nx90, nj90,"
            " 95, bq95, bp95, nx95, nj95,"
            " 99, bq99, bp99, nx99, nj99"
            ") AS (q_pct, qty_bound, price_bound, n_x_tail, n_joint_tail)"
        )
    )
    return stacked.select(
        F.col("q_pct").cast("int").alias("q_pct"),
        "qty_bound",
        "price_bound",
        "n_x_tail",
        "n_joint_tail",
        F.round(
            F.col("n_joint_tail").cast("double")
            / F.greatest(F.col("n_x_tail"), F.lit(1)).cast("double"),
            6,
        ).alias("lambda_u"),
    ).orderBy("q_pct")


LINEITEM_TAILDEP_SQL = """
WITH li AS (
  SELECT CAST(l_quantity AS DECIMAL(12,2)) AS qty,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS price
  FROM lineitem
),
qh AS (SELECT qty AS v, COUNT(*) AS cnt FROM li GROUP BY 1),
qc AS (
  SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS tot
  FROM qh
),
ph AS (SELECT price AS v, COUNT(*) AS cnt FROM li GROUP BY 1),
pc AS (
  SELECT v, SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER () AS tot
  FROM ph
),
b AS (
  SELECT
    (SELECT MIN(CASE WHEN cum * 100 >= 90 * tot THEN v END) FROM qc) AS bq90,
    (SELECT MIN(CASE WHEN cum * 100 >= 95 * tot THEN v END) FROM qc) AS bq95,
    (SELECT MIN(CASE WHEN cum * 100 >= 99 * tot THEN v END) FROM qc) AS bq99,
    (SELECT MIN(CASE WHEN cum * 100 >= 90 * tot THEN v END) FROM pc) AS bp90,
    (SELECT MIN(CASE WHEN cum * 100 >= 95 * tot THEN v END) FROM pc) AS bp95,
    (SELECT MIN(CASE WHEN cum * 100 >= 99 * tot THEN v END) FROM pc) AS bp99
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN qty > bq90 THEN 1 ELSE 0 END) AS BIGINT) AS nx90,
    CAST(SUM(CASE WHEN qty > bq90 AND price > bp90 THEN 1 ELSE 0 END) AS BIGINT) AS nj90,
    CAST(SUM(CASE WHEN qty > bq95 THEN 1 ELSE 0 END) AS BIGINT) AS nx95,
    CAST(SUM(CASE WHEN qty > bq95 AND price > bp95 THEN 1 ELSE 0 END) AS BIGINT) AS nj95,
    CAST(SUM(CASE WHEN qty > bq99 THEN 1 ELSE 0 END) AS BIGINT) AS nx99,
    CAST(SUM(CASE WHEN qty > bq99 AND price > bp99 THEN 1 ELSE 0 END) AS BIGINT) AS nj99,
    CAST(MAX(bq90) AS DOUBLE) AS bq90d, CAST(MAX(bq95) AS DOUBLE) AS bq95d,
    CAST(MAX(bq99) AS DOUBLE) AS bq99d, CAST(MAX(bp90) AS DOUBLE) AS bp90d,
    CAST(MAX(bp95) AS DOUBLE) AS bp95d, CAST(MAX(bp99) AS DOUBLE) AS bp99d
  FROM li, b
)
SELECT q_pct, qty_bound, price_bound, n_x_tail, n_joint_tail,
       ROUND(CAST(n_joint_tail AS DOUBLE)
             / CAST(GREATEST(n_x_tail, 1) AS DOUBLE), 6) AS lambda_u
FROM (
  SELECT 90 AS q_pct, bq90d AS qty_bound, bp90d AS price_bound,
         nx90 AS n_x_tail, nj90 AS n_joint_tail FROM agg
  UNION ALL
  SELECT 95, bq95d, bp95d, nx95, nj95 FROM agg
  UNION ALL
  SELECT 99, bq99d, bp99d, nx99, nj99 FROM agg
)
ORDER BY q_pct
"""

QUERIES["lineitem_tail_dependence"] = lineitem_tail_dependence
ORACLE["lineitem_tail_dependence"] = LINEITEM_TAILDEP_SQL


def lineitem_rdd_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharp regression-discontinuity estimate at the 5% discount
    cutoff (Thistlethwaite & Campbell 1960; the causal design next to
    DiD/ITS/CUPED in the suite): does crossing the discount threshold
    JUMP ordered quantity, beyond the smooth trend? Local linear fits
    on both sides of c = 0.05 within bandwidth h = 0.03 (left
    window [0.02, 0.05), right [0.05, 0.08]), centered running
    variable x = discount − c; the RDD estimate is the intercept gap
    ŷ_R(c) − ŷ_L(c).

    Engine-exact: every sufficient statistic (n, Σx, Σy, Σxy, Σx²) is
    an exact DECIMAL sum (x as DECIMAL(12,6) — the raw column is 2dp
    so products are exactly representable); slopes/intercepts are
    identical IEEE expressions over the exact sums, rounded 6dp.

    Scale: ONE conditional scan aggregation (map-side combined), a
    1-row model after."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_discount").cast("decimal(12,6)") - F.lit(0.05).cast("decimal(12,6)"))
        .cast("decimal(12,6)")
        .alias("x"),
        F.col("l_quantity").cast("decimal(12,2)").alias("y"),
    ).where((F.col("x") >= -0.03) & (F.col("x") <= 0.03))

    def side(cond, p):
        return [
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"n_{p}"),
            F.sum(F.when(cond, F.col("x"))).alias(f"sx_{p}"),
            F.sum(F.when(cond, F.col("y"))).alias(f"sy_{p}"),
            F.sum(F.when(cond, F.col("x") * F.col("y"))).alias(f"sxy_{p}"),
            F.sum(F.when(cond, F.col("x") * F.col("x"))).alias(f"sxx_{p}"),
        ]

    agg = li.agg(*side(F.col("x") < 0, "l"), *side(F.col("x") >= 0, "r"))

    def fit(p):
        n = F.col(f"n_{p}").cast("double")
        sx = F.col(f"sx_{p}").cast("double")
        sy = F.col(f"sy_{p}").cast("double")
        sxy = F.col(f"sxy_{p}").cast("double")
        sxx = F.col(f"sxx_{p}").cast("double")
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        intercept = (sy - slope * sx) / n
        return slope, intercept

    sl, il = fit("l")
    sr, ir = fit("r")
    return agg.select(
        F.col("n_l").alias("n_left"),
        F.col("n_r").alias("n_right"),
        F.round(il, 6).alias("intercept_left"),
        F.round(ir, 6).alias("intercept_right"),
        F.round(sl, 6).alias("slope_left"),
        F.round(sr, 6).alias("slope_right"),
        F.round(ir - il, 6).alias("rdd_jump"),
    )


LINEITEM_RDD_SQL = """
WITH li AS (
  SELECT CAST(CAST(l_discount AS DECIMAL(12,6))
              - CAST(0.05 AS DECIMAL(12,6)) AS DECIMAL(12,6)) AS x,
         CAST(l_quantity AS DECIMAL(12,2)) AS y
  FROM lineitem
  WHERE CAST(l_discount AS DECIMAL(12,6)) - CAST(0.05 AS DECIMAL(12,6))
          BETWEEN -0.03 AND 0.03
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN x < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_l,
    SUM(CASE WHEN x < 0 THEN x END) AS sx_l,
    SUM(CASE WHEN x < 0 THEN y END) AS sy_l,
    SUM(CASE WHEN x < 0 THEN x * y END) AS sxy_l,
    SUM(CASE WHEN x < 0 THEN x * x END) AS sxx_l,
    CAST(SUM(CASE WHEN x >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_r,
    SUM(CASE WHEN x >= 0 THEN x END) AS sx_r,
    SUM(CASE WHEN x >= 0 THEN y END) AS sy_r,
    SUM(CASE WHEN x >= 0 THEN x * y END) AS sxy_r,
    SUM(CASE WHEN x >= 0 THEN x * x END) AS sxx_r
  FROM li
)
SELECT n_l AS n_left, n_r AS n_right,
  ROUND((CAST(sy_l AS DOUBLE)
         - ((CAST(n_l AS DOUBLE) * CAST(sxy_l AS DOUBLE) - CAST(sx_l AS DOUBLE) * CAST(sy_l AS DOUBLE))
            / (CAST(n_l AS DOUBLE) * CAST(sxx_l AS DOUBLE) - CAST(sx_l AS DOUBLE) * CAST(sx_l AS DOUBLE)))
           * CAST(sx_l AS DOUBLE)) / CAST(n_l AS DOUBLE), 6) AS intercept_left,
  ROUND((CAST(sy_r AS DOUBLE)
         - ((CAST(n_r AS DOUBLE) * CAST(sxy_r AS DOUBLE) - CAST(sx_r AS DOUBLE) * CAST(sy_r AS DOUBLE))
            / (CAST(n_r AS DOUBLE) * CAST(sxx_r AS DOUBLE) - CAST(sx_r AS DOUBLE) * CAST(sx_r AS DOUBLE)))
           * CAST(sx_r AS DOUBLE)) / CAST(n_r AS DOUBLE), 6) AS intercept_right,
  ROUND((CAST(n_l AS DOUBLE) * CAST(sxy_l AS DOUBLE) - CAST(sx_l AS DOUBLE) * CAST(sy_l AS DOUBLE))
        / (CAST(n_l AS DOUBLE) * CAST(sxx_l AS DOUBLE) - CAST(sx_l AS DOUBLE) * CAST(sx_l AS DOUBLE)), 6)
    AS slope_left,
  ROUND((CAST(n_r AS DOUBLE) * CAST(sxy_r AS DOUBLE) - CAST(sx_r AS DOUBLE) * CAST(sy_r AS DOUBLE))
        / (CAST(n_r AS DOUBLE) * CAST(sxx_r AS DOUBLE) - CAST(sx_r AS DOUBLE) * CAST(sx_r AS DOUBLE)), 6)
    AS slope_right,
  ROUND(((CAST(sy_r AS DOUBLE)
          - ((CAST(n_r AS DOUBLE) * CAST(sxy_r AS DOUBLE) - CAST(sx_r AS DOUBLE) * CAST(sy_r AS DOUBLE))
             / (CAST(n_r AS DOUBLE) * CAST(sxx_r AS DOUBLE) - CAST(sx_r AS DOUBLE) * CAST(sx_r AS DOUBLE)))
            * CAST(sx_r AS DOUBLE)) / CAST(n_r AS DOUBLE))
        - ((CAST(sy_l AS DOUBLE)
          - ((CAST(n_l AS DOUBLE) * CAST(sxy_l AS DOUBLE) - CAST(sx_l AS DOUBLE) * CAST(sy_l AS DOUBLE))
             / (CAST(n_l AS DOUBLE) * CAST(sxx_l AS DOUBLE) - CAST(sx_l AS DOUBLE) * CAST(sx_l AS DOUBLE)))
            * CAST(sx_l AS DOUBLE)) / CAST(n_l AS DOUBLE)), 6) AS rdd_jump
FROM agg
"""

QUERIES["lineitem_rdd_discount"] = lineitem_rdd_discount
ORACLE["lineitem_rdd_discount"] = LINEITEM_RDD_SQL


def parts_experience_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wright's-law experience curve per brand (Wright 1936; the
    learning-curve economics BCG popularized): regress ln(average
    unit price) on ln(cumulative shipped quantity) over monthly
    cells — the elasticity b says price drops b% per 1% of
    accumulated volume; procurement uses it to forecast component
    cost, pricing uses it to detect brands NOT riding their curve.

    Engine determinism: monthly cells carry DECIMAL-exact price and
    quantity sums; each cell contributes TWO one-shot e6-rounded
    logs (ln of an IEEE division of exact decimals — the per-term
    transcendental rule), and the per-brand OLS slope closes in
    integer e6 algebra with one final DIV on DECIMAL(38,0) products
    (e6·e6 sums overflow LONG).

    Scale: one fact scan to (brand, month) grain — map-side combined
    agg against the broadcast part dim; the regression runs on
    |brands|·|months| cells."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        money("l_extendedprice").alias("price"),
        money("l_quantity").alias("qty"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "month")
        .agg(
            F.sum("price").cast("decimal(28,2)").alias("rev"),
            F.sum("qty").cast("decimal(28,2)").alias("vol"),
        )
    )
    wcum = Window.partitionBy("p_brand").orderBy("month").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ln_cells = cells.withColumn(
        "cumvol", F.sum("vol").over(wcum).cast("decimal(28,2)")
    ).select(
        "p_brand",
        F.round(
            F.log(F.col("rev").cast("double") / F.col("vol").cast("double")) * 1e6
        )
        .cast("bigint")
        .alias("lp_e6"),
        F.round(F.log(F.col("cumvol").cast("double")) * 1e6)
        .cast("bigint")
        .alias("lq_e6"),
    )
    agg = ln_cells.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum("lq_e6").cast("decimal(38,0)").alias("sx"),
        F.sum("lp_e6").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("CAST(lq_e6 AS DECIMAL(38,0)) * CAST(lq_e6 AS DECIMAL(38,0))"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.expr("CAST(lq_e6 AS DECIMAL(38,0)) * CAST(lp_e6 AS DECIMAL(38,0))"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    return (
        agg.where(F.col("n_cells") >= 3)  # a 1-2 cell brand has no curve (zero denom)
        .select(
            F.col("p_brand").alias("brand"),
            "n_cells",
            F.expr(
                "CAST((CAST(n_cells AS DECIMAL(38,0)) * sxy - sx * sy)"
                " * CAST(1000000 AS DECIMAL(38,0))"
                " DIV (CAST(n_cells AS DECIMAL(38,0)) * sxx - sx * sx) AS BIGINT)"
            ).alias("elasticity_ppm"),
        )
        .orderBy("brand")
    )


PARTS_EXPERIENCE_SQL = """
WITH cells AS (
  SELECT p.p_brand, date_trunc('month', l.l_shipdate) AS month,
         SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS rev,
         SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS vol
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
ln_cells AS (
  SELECT p_brand,
         CAST(ROUND(ln(CAST(rev AS DOUBLE) / CAST(vol AS DOUBLE)) * 1000000)
              AS BIGINT) AS lp_e6,
         CAST(ROUND(ln(CAST(CAST(SUM(vol) OVER (PARTITION BY p_brand ORDER BY month
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(28,2))
                AS DOUBLE)) * 1000000) AS BIGINT) AS lq_e6
  FROM cells
),
agg AS (
  SELECT p_brand,
         CAST(COUNT(*) AS BIGINT) AS n_cells,
         CAST(SUM(lq_e6) AS HUGEINT) AS sx,
         CAST(SUM(lp_e6) AS HUGEINT) AS sy,
         CAST(SUM(CAST(lq_e6 AS HUGEINT) * lq_e6) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(lq_e6 AS HUGEINT) * lp_e6) AS HUGEINT) AS sxy
  FROM ln_cells GROUP BY 1
)
SELECT p_brand AS brand, n_cells,
       CAST((n_cells * sxy - sx * sy) * 1000000
            // (n_cells * sxx - sx * sx) AS BIGINT) AS elasticity_ppm
FROM agg
WHERE n_cells >= 3
ORDER BY brand
"""

QUERIES["parts_experience_curve"] = parts_experience_curve
ORACLE["parts_experience_curve"] = PARTS_EXPERIENCE_SQL


def parts_demand_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Syntetos–Boylan demand-pattern classification (2005) of every
    part into the four forecastability quadrants — smooth /
    intermittent / erratic / lumpy — by average inter-demand
    interval (ADI, cutoff 1.32) and squared coefficient of variation
    of nonzero monthly demand (CV², cutoff 0.49). The triage that
    decides WHICH forecaster a part gets (smooth → Holt/theta,
    intermittent → Croston, lumpy → don't bother) before anyone
    spends model budget.

    FULLY INTEGER both engines: monthly quantities ride ×100 cents
    scaling (DECIMAL(12,2) is exactly 2dp); ADI ≥ 1.32 becomes
    100·total_months ≥ 132·active_months; CV² ≥ 0.49 becomes
    100·(nΣq² − S²) ≥ 49·S² on DECIMAL(38,0) products — no division
    anywhere until the final share ppm.

    Scale: one fact scan to (part, month) grain, one part-grain agg,
    4 output rows; the global month horizon is an in-plan broadcast
    scalar (no driver count)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        (money("l_quantity") * 100).cast("decimal(38,0)").alias("q_c"),
    )
    cells = li.groupBy("l_partkey", "month").agg(
        F.sum("q_c").cast("decimal(38,0)").alias("q")
    )
    horizon = cells.agg(
        F.countDistinct("month").cast("bigint").alias("total_months")
    )
    per_part = cells.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_months"),
        F.sum("q").cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("q * q")).cast("decimal(38,0)").alias("qq"),
    )
    j = per_part.crossJoin(F.broadcast(horizon))
    adi_high = F.expr("100 * total_months >= 132 * active_months")
    cv2_high = F.expr(
        "CAST(100 AS DECIMAL(38,0)) * (CAST(active_months AS DECIMAL(38,0)) * qq - s * s)"
        " >= CAST(49 AS DECIMAL(38,0)) * s * s"
    )
    cls = (
        F.when(adi_high & cv2_high, "lumpy")
        .when(adi_high, "intermittent")
        .when(cv2_high, "erratic")
        .otherwise("smooth")
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        j.select(cls.alias("demand_class"))
        .groupBy("demand_class")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .withColumn("total", F.sum("n_parts").over(wall))
        .select(
            "demand_class",
            "n_parts",
            F.expr("CAST(n_parts * 1000000 DIV total AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("demand_class")
    )


PARTS_DEMAND_CLASS_SQL = """
WITH cells AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS month,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS DECIMAL(38,0)))
              AS HUGEINT) AS q
  FROM lineitem GROUP BY 1, 2
),
horizon AS (SELECT CAST(COUNT(DISTINCT month) AS BIGINT) AS total_months FROM cells),
per_part AS (
  SELECT l_partkey,
         CAST(COUNT(*) AS BIGINT) AS active_months,
         CAST(SUM(q) AS HUGEINT) AS s,
         CAST(SUM(q * q) AS HUGEINT) AS qq
  FROM cells GROUP BY 1
),
classed AS (
  SELECT CASE
           WHEN 100 * h.total_months >= 132 * p.active_months
                AND 100 * (p.active_months * p.qq - p.s * p.s) >= 49 * p.s * p.s
             THEN 'lumpy'
           WHEN 100 * h.total_months >= 132 * p.active_months THEN 'intermittent'
           WHEN 100 * (p.active_months * p.qq - p.s * p.s) >= 49 * p.s * p.s
             THEN 'erratic'
           ELSE 'smooth' END AS demand_class
  FROM per_part p, horizon h
)
SELECT demand_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(COUNT(*) * 1000000 // SUM(COUNT(*)) OVER () AS BIGINT) AS share_ppm
FROM classed
GROUP BY 1
ORDER BY demand_class
"""

QUERIES["parts_demand_classification"] = parts_demand_classification
ORACLE["parts_demand_classification"] = PARTS_DEMAND_CLASS_SQL


def customers_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nelson–Aalen cumulative-hazard estimator of the customer
    repurchase interval — the additive sibling of customers_survival_km
    (same gaps, same right-censoring at the corpus horizon): H(t) =
    Σ_{tᵢ≤t} dᵢ/nᵢ. Preferred over −ln(KM) for small risk sets and
    the natural input to proportional-hazards diagnostics (a straight
    H(t) on log-t is Weibull-consistent).

    Engine-exact: each hazard increment is an integer-ppm TRUNCATING
    DIV (dᵢ·10⁶ DIV nᵢ — never a ROUND of an exact rational, which
    can sit on .5 ties), and the curve is a cumulative BIGINT sum;
    at-risk counts come from the same histogram-CDF machinery as KM
    (never a sort of raw gaps).

    Scale: one (custkey, orderdate) window for gaps, then the
    duration histogram (time-bounded)."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    nxt = F.lead("o_orderdate").over(w)
    spans = (
        o.withColumn("nxt", nxt)
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("nxt").isNotNull(), F.datediff("nxt", "o_orderdate"))
            .otherwise(F.datediff("h", "o_orderdate"))
            .alias("t"),
            F.col("nxt").isNotNull().alias("is_event"),
        )
        .where(F.col("t") > 0)
    )
    hist = spans.groupBy("t").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("tot"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wcum_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        hist.withColumn("total", F.sum("tot").over(wall).cast("bigint"))
        .withColumn(
            "n_at_risk",
            F.col("total") - F.coalesce(F.sum("tot").over(wcum_prev), F.lit(0)),
        )
        .where(F.col("d") > 0)
    )
    term = F.expr("CAST(d * 1000000 DIV n_at_risk AS BIGINT)")
    return (
        curve.withColumn("term_ppm", term)
        .withColumn("cum_hazard_ppm", F.sum("term_ppm").over(wcum).cast("bigint"))
        .select(
            F.col("t").cast("int").alias("gap_days"),
            "d",
            F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
            "cum_hazard_ppm",
        )
        .orderBy("gap_days")
    )


CUSTOMERS_NELSON_AALEN_SQL = """
WITH o AS (SELECT o_custkey, o_orderdate FROM orders),
h AS (SELECT MAX(o_orderdate) AS h FROM o),
spans AS (
  SELECT CASE WHEN nxt IS NOT NULL THEN date_diff('day', o_orderdate, nxt)
              ELSE date_diff('day', o_orderdate, h.h) END AS t,
         nxt IS NOT NULL AS is_event
  FROM (SELECT o_custkey, o_orderdate,
               LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS nxt
        FROM o) s, h
),
good AS (SELECT * FROM spans WHERE t > 0),
hist AS (
  SELECT t, CAST(SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS tot
  FROM good GROUP BY 1
),
curve AS (
  SELECT t, d,
         CAST(SUM(tot) OVER () AS BIGINT)
           - CAST(COALESCE(SUM(tot) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_at_risk
  FROM hist
),
ev AS (
  SELECT t, d, n_at_risk, CAST(d * 1000000 // n_at_risk AS BIGINT) AS term_ppm
  FROM curve WHERE d > 0
)
SELECT CAST(t AS INTEGER) AS gap_days, d, n_at_risk,
       CAST(SUM(term_ppm) OVER (ORDER BY t
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_hazard_ppm
FROM ev
ORDER BY gap_days
"""

QUERIES["customers_nelson_aalen"] = customers_nelson_aalen
ORACLE["customers_nelson_aalen"] = CUSTOMERS_NELSON_AALEN_SQL


def lineitem_iv_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Instrumental-variables (2SLS, one instrument) estimate of the
    quantity-on-discount effect with PART SIZE as the instrument —
    the econometric workhorse when the regressor is endogenous
    (discounts respond to demand, so OLS is biased; a cost-side
    attribute shifts the discount without entering the demand
    equation): β_IV = cov(z,y)/cov(z,x), the Wald ratio. Emits OLS
    alongside (the endogeneity gap IS the finding) and the
    first-stage cov(z,x) sign/scale as the weak-instrument check.

    Engine-exact: all five sufficient statistics are DECIMAL-exact
    (discount cents-scaled, quantity 2dp, size integer); both betas
    are integer e6 via DECIMAL(38,0) cross products and ONE DIV.

    Scale: one fact-dim join (AQE decides broadcast) and one
    map-side-combined 6-scalar agg — model-sized output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (money("l_quantity") * 100).cast("decimal(38,0)").alias("y"),
        (F.col("l_discount").cast("decimal(5,2)") * 100).cast("decimal(38,0)").alias("x"),
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_size").cast("decimal(38,0)").alias("z")
    )
    j = li.join(p, li.l_partkey == p.p_partkey)
    agg = j.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum("z").cast("decimal(38,0)").alias("sz"),
        F.sum(F.expr("x * y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.expr("z * y")).cast("decimal(38,0)").alias("szy"),
        F.sum(F.expr("z * x")).cast("decimal(38,0)").alias("szx"),
        F.sum(F.expr("x * x")).cast("decimal(38,0)").alias("sxx"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.expr(
            "CAST((n * szy - sz * sy) * CAST(1000000 AS DECIMAL(38,0))"
            " DIV (n * szx - sz * sx) AS BIGINT)"
        ).alias("beta_iv_e6"),
        F.expr(
            "CAST((n * sxy - sx * sy) * CAST(1000000 AS DECIMAL(38,0))"
            " DIV (n * sxx - sx * sx) AS BIGINT)"
        ).alias("beta_ols_e6"),
        F.expr("CAST(n * szx - sz * sx AS BIGINT)").alias("first_stage_cov_scaled"),
    )


LINEITEM_IV_SQL = """
WITH j AS (
  SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS HUGEINT) AS y,
         CAST(CAST(l_discount AS DECIMAL(5,2)) * 100 AS HUGEINT) AS x,
         CAST(p_size AS HUGEINT) AS z
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(z) AS sz,
         SUM(x * y) AS sxy, SUM(z * y) AS szy, SUM(z * x) AS szx, SUM(x * x) AS sxx
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST((n * szy - sz * sy) * 1000000 // (n * szx - sz * sx) AS BIGINT) AS beta_iv_e6,
       CAST((n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS BIGINT) AS beta_ols_e6,
       CAST(n * szx - sz * sx AS BIGINT) AS first_stage_cov_scaled
FROM agg
"""

QUERIES["lineitem_iv_regression"] = lineitem_iv_regression
ORACLE["lineitem_iv_regression"] = LINEITEM_IV_SQL


def orders_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran–Armitage trend test: does the fulfilled-order share
    rise MONOTONICALLY with order priority (scores 1..5 from the
    '1-URGENT'..'5-LOW' prefixes)? The right test when the grouping
    is ORDERED — a plain chi-square throws the ordering away and
    loses power exactly where ops care (is priority handling
    actually prioritized?).

    Determinism: the five sufficient statistics (N, X, T = Σwx,
    W1 = Σwn, W2 = Σw²n) are exact integers; z² is one IEEE double
    expression over those integers, identical on both engines (the
    p-chart contract: same inputs + same expression tree =
    bit-identical), emitted at a one-shot 6dp ROUND.

    Scale: one order-grain scan agg to 5 rows, then scalars."""
    o = load_table(spark, sf_dir, "orders").select(
        F.substring("o_orderpriority", 1, 1).cast("bigint").alias("w"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("x"),
    )
    g = o.groupBy("w").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("xs"),
    )
    s = g.agg(
        F.sum("n").cast("bigint").alias("nn"),
        F.sum("xs").cast("bigint").alias("xx"),
        F.sum(F.expr("w * xs")).cast("bigint").alias("t"),
        F.sum(F.expr("w * n")).cast("bigint").alias("w1"),
        F.sum(F.expr("w * w * n")).cast("bigint").alias("w2"),
    )
    num = "(CAST(nn AS DOUBLE) * t - CAST(xx AS DOUBLE) * w1)"
    den = (
        "(CAST(xx AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(xx AS DOUBLE))"
        " * (CAST(nn AS DOUBLE) * w2 - CAST(w1 AS DOUBLE) * w1))"
    )
    return s.select(
        F.col("nn").alias("n_orders"),
        F.col("xx").alias("n_fulfilled"),
        F.expr(f"ROUND({num} * {num} * CAST(nn AS DOUBLE) / {den}, 6)").alias("z2"),
        F.expr(f"CASE WHEN {num} > 0 THEN 1 WHEN {num} < 0 THEN -1 ELSE 0 END").alias(
            "trend_sign"
        ),
    )


ORDERS_COCHRAN_ARMITAGE_SQL = """
WITH o AS (
  SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS w,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS x
  FROM orders
),
g AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS xs
  FROM o GROUP BY 1
),
s AS (
  SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(xs) AS BIGINT) AS xx,
         CAST(SUM(w * xs) AS BIGINT) AS t,
         CAST(SUM(w * n) AS BIGINT) AS w1,
         CAST(SUM(w * w * n) AS BIGINT) AS w2
  FROM g
)
SELECT nn AS n_orders, xx AS n_fulfilled,
       ROUND((CAST(nn AS DOUBLE) * t - CAST(xx AS DOUBLE) * w1)
             * (CAST(nn AS DOUBLE) * t - CAST(xx AS DOUBLE) * w1)
             * CAST(nn AS DOUBLE)
             / (CAST(xx AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(xx AS DOUBLE))
                * (CAST(nn AS DOUBLE) * w2 - CAST(w1 AS DOUBLE) * w1)), 6) AS z2,
       CASE WHEN CAST(nn AS DOUBLE) * t - CAST(xx AS DOUBLE) * w1 > 0 THEN 1
            WHEN CAST(nn AS DOUBLE) * t - CAST(xx AS DOUBLE) * w1 < 0 THEN -1
            ELSE 0 END AS trend_sign
FROM s
"""

QUERIES["orders_cochran_armitage"] = orders_cochran_armitage
ORACLE["orders_cochran_armitage"] = ORDERS_COCHRAN_ARMITAGE_SQL


def parts_price_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-stickiness micro-statistics (Bils–Klenow 2004 style):
    how often does a part's observed monthly average selling price
    actually CHANGE, and how long are the constant-price spells?
    Per brand: observation months, price changes, change frequency
    (ppm of month-to-month comparisons), and the mean completed
    spell length — the menu-cost diagnostic for pricing teams (rigid
    brands lag cost shocks; jumpy brands churn customers).

    Engine-exact: the monthly price point is an exact DECIMAL ratio
    compared via CROSS-MULTIPLIED integers (rev_t·vol_{t−1} ≠
    rev_{t−1}·vol_t — never a rounded unit price, which would make
    "change" depend on rounding); spell stats are integer window
    counts; frequencies are integer ppm DIVs.

    Scale: fact scan to (part, month) grain, part-keyed lag windows,
    brand-grain rollup."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        money("l_extendedprice").alias("price"),
        money("l_quantity").alias("qty"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.groupBy("l_partkey", "month")
        .agg(
            (F.sum("price") * 100).cast("decimal(38,0)").alias("rev_c"),
            (F.sum("qty") * 100).cast("decimal(38,0)").alias("vol_c"),
        )
    )
    wpart = Window.partitionBy("l_partkey").orderBy("month")
    ann = (
        cells.withColumn("prev_rev", F.lag("rev_c").over(wpart))
        .withColumn("prev_vol", F.lag("vol_c").over(wpart))
        .withColumn(
            "changed",
            F.when(
                F.col("prev_rev").isNotNull()
                & (F.expr("rev_c * prev_vol") != F.expr("prev_rev * vol_c")),
                1,
            ).otherwise(0),
        )
        .withColumn("has_prev", F.when(F.col("prev_rev").isNotNull(), 1).otherwise(0))
    )
    per_part = ann.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("months"),
        F.sum("has_prev").cast("bigint").alias("comparisons"),
        F.sum("changed").cast("bigint").alias("changes"),
    )
    joined = per_part.join(p, per_part.l_partkey == p.p_partkey)
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("months").cast("bigint").alias("obs_months"),
            F.sum("comparisons").cast("bigint").alias("n_comparisons"),
            F.sum("changes").cast("bigint").alias("n_changes"),
        )
        .select(
            F.col("p_brand").alias("brand"),
            "n_parts",
            "obs_months",
            "n_changes",
            F.expr(
                "CAST(n_changes * 1000000 DIV GREATEST(n_comparisons, 1) AS BIGINT)"
            ).alias("change_freq_ppm"),
            # mean completed spell length: comparisons split into
            # (changes + 1 per part) spells => obs months per spell
            F.expr(
                "CAST(obs_months * 1000000 DIV GREATEST(n_changes + n_parts, 1) AS BIGINT)"
            ).alias("mean_spell_months_e6"),
        )
        .orderBy("brand")
    )


PARTS_PRICE_STICKINESS_SQL = """
WITH cells AS (
  SELECT l_partkey, date_trunc('month', l_shipdate) AS month,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) * 100 AS HUGEINT) AS rev_c,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) * 100 AS HUGEINT) AS vol_c
  FROM lineitem GROUP BY 1, 2
),
ann AS (
  SELECT l_partkey,
         CASE WHEN prev_rev IS NOT NULL AND rev_c * prev_vol <> prev_rev * vol_c
              THEN 1 ELSE 0 END AS changed,
         CASE WHEN prev_rev IS NOT NULL THEN 1 ELSE 0 END AS has_prev
  FROM (
    SELECT l_partkey, rev_c, vol_c,
           LAG(rev_c) OVER (PARTITION BY l_partkey ORDER BY month) AS prev_rev,
           LAG(vol_c) OVER (PARTITION BY l_partkey ORDER BY month) AS prev_vol
    FROM cells
  )
),
per_part AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS months,
         CAST(SUM(has_prev) AS BIGINT) AS comparisons,
         CAST(SUM(changed) AS BIGINT) AS changes
  FROM ann GROUP BY 1
)
SELECT p.p_brand AS brand,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(months) AS BIGINT) AS obs_months,
       CAST(SUM(changes) AS BIGINT) AS n_changes,
       CAST(CAST(SUM(changes) AS HUGEINT) * 1000000
            // GREATEST(SUM(comparisons), 1) AS BIGINT) AS change_freq_ppm,
       CAST(CAST(SUM(months) AS HUGEINT) * 1000000
            // GREATEST(SUM(changes) + COUNT(*), 1) AS BIGINT) AS mean_spell_months_e6
FROM per_part pp JOIN part p ON p.p_partkey = pp.l_partkey
GROUP BY 1
ORDER BY brand
"""

QUERIES["parts_price_stickiness"] = parts_price_stickiness
ORACLE["parts_price_stickiness"] = PARTS_PRICE_STICKINESS_SQL


def nations_matched_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matched-control difference-in-differences: ASIA nations are
    the "treated" market; each is matched to its nearest
    non-ASIA control by PRE-period revenue (1995–1997 vs post
    1998–2000), and the effect is the DiD on matched pairs — the
    selection-on-observables upgrade over the pooled DiD
    (lineitem_did_estimator): comparing Japan to the average of all
    controls mixes in markets a tenth its size; matching compares
    like with like. ATT = mean pair DiD.

    Engine-exact: revenues are DECIMAL cents; the 1-NN match
    minimizes the exact integer |pre_t − pre_c| with (diff, control
    name) tie-breaks via one window over the |treated|×|controls|
    grid (≤ ~5×20 rows — nations are a fixed dimension); pair DiDs
    and the ATT are integer cents with one SUM DIV close.

    Scale: one fact scan to (nation, period) cells; everything
    after is dimension-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", money("l_extendedprice").alias("price"), "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.expr("year(l_shipdate) BETWEEN 1995 AND 2000"))
        .groupBy("n_name", "r_name")
        .agg(
            F.sum(
                F.when(F.expr("year(l_shipdate) <= 1997"), F.col("price"))
            ).cast("decimal(38,2)").alias("pre"),
            F.sum(
                F.when(F.expr("year(l_shipdate) >= 1998"), F.col("price"))
            ).cast("decimal(38,2)").alias("post"),
        )
        .select(
            "n_name",
            (F.col("r_name") == "ASIA").alias("treated"),
            F.expr("CAST(COALESCE(pre, 0) * 100 AS DECIMAL(38,0))").alias("pre_c"),
            F.expr("CAST(COALESCE(post, 0) * 100 AS DECIMAL(38,0))").alias("post_c"),
        )
    )
    t = cells.where(F.col("treated")).select(
        F.col("n_name").alias("nation"),
        F.col("pre_c").alias("pre_t"),
        F.col("post_c").alias("post_t"),
    )
    ctl = cells.where(~F.col("treated")).select(
        F.col("n_name").alias("control"),
        F.col("pre_c").alias("pre_ctl"),
        F.col("post_c").alias("post_ctl"),
    )
    grid = t.crossJoin(F.broadcast(ctl)).withColumn(
        "adiff", F.expr("abs(pre_t - pre_ctl)")
    )
    wbest = Window.partitionBy("nation").orderBy("adiff", "control")
    pairs = grid.withColumn("rk", F.row_number().over(wbest)).where(F.col("rk") == 1)
    did = F.expr("CAST((post_t - pre_t) - (post_ctl - pre_ctl) AS BIGINT)")
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        pairs.withColumn("did_cents", did)
        .withColumn("np", F.count(F.lit(1)).over(wall).cast("bigint"))
        .withColumn("att_sum", F.sum("did_cents").over(wall).cast("bigint"))
        .select(
            "nation",
            "control",
            F.col("pre_t").cast("bigint").alias("pre_treated_cents"),
            F.col("pre_ctl").cast("bigint").alias("pre_control_cents"),
            "did_cents",
            F.expr(
                "CAST(CASE WHEN att_sum >= 0 THEN att_sum DIV np"
                " ELSE -((-att_sum) DIV np) END AS BIGINT)"
            ).alias("att_cents"),
        )
        .orderBy("nation")
    )


NATIONS_MATCHED_DID_SQL = """
WITH cells AS (
  SELECT n.n_name,
         r.r_name = 'ASIA' AS treated,
         CAST(COALESCE(SUM(CASE WHEN year(l.l_shipdate) <= 1997
               THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) END), 0) * 100
              AS HUGEINT) AS pre_c,
         CAST(COALESCE(SUM(CASE WHEN year(l.l_shipdate) >= 1998
               THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) END), 0) * 100
              AS HUGEINT) AS post_c
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE year(l.l_shipdate) BETWEEN 1995 AND 2000
  GROUP BY 1, 2
),
grid AS (
  SELECT t.n_name AS nation, c.n_name AS control,
         t.pre_c AS pre_t, t.post_c AS post_t,
         c.pre_c AS pre_ctl, c.post_c AS post_ctl,
         abs(t.pre_c - c.pre_c) AS adiff
  FROM (SELECT * FROM cells WHERE treated) t,
       (SELECT * FROM cells WHERE NOT treated) c
),
pairs AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY nation ORDER BY adiff, control) AS rk
    FROM grid
  ) WHERE rk = 1
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS np,
         CAST(SUM((post_t - pre_t) - (post_ctl - pre_ctl)) AS HUGEINT) AS att_sum
  FROM pairs
)
SELECT p.nation, p.control,
       CAST(p.pre_t AS BIGINT) AS pre_treated_cents,
       CAST(p.pre_ctl AS BIGINT) AS pre_control_cents,
       CAST((p.post_t - p.pre_t) - (p.post_ctl - p.pre_ctl) AS BIGINT) AS did_cents,
       CAST(CASE WHEN a.att_sum >= 0 THEN a.att_sum // a.np
                 ELSE -((-a.att_sum) // a.np) END AS BIGINT) AS att_cents
FROM pairs p, agg a
ORDER BY p.nation
"""

QUERIES["nations_matched_did"] = nations_matched_did
ORACLE["nations_matched_did"] = NATIONS_MATCHED_DID_SQL


def customers_competing_risks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aalen–Johansen cumulative incidence for COMPETING risks on the
    repurchase gaps: the next order either FULFILLS ('F' status) or
    stays OPEN ('O'/'P') — two competing event types ending each
    spell, with the usual right-censoring at the horizon. Naively
    applying 1 − KM per cause overstates both incidences (the
    textbook competing-risks mistake); the AJ estimator splits each
    event time's hazard by cause and weights it by overall
    survival-so-far: CIF_k(t) = Σ_{tᵢ≤t} S(tᵢ₋₁)·d_{k,i}/nᵢ.

    Determinism: d_F, d_O, n are exact histogram integers; S(tᵢ₋₁)
    follows the KM exp(Σ ln) discipline (identical IEEE both
    engines); increments and their ordered cumulative sums are
    identical double chains; emission rounds 6dp. The identity
    CIF_F + CIF_O + S = 1 (at event times, pre-censoring-only tail)
    is property-tested.

    Scale: same (custkey, orderdate) gap window + duration-histogram
    machinery as KM/Nelson–Aalen — never a raw-gap sort."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderstatus"
    )
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    # same-day orders make LEAD(status) tie-dependent — the KM/NA
    # twins only read the DATE so dates alone sufficed; the cause
    # label needs the full (date, orderkey) deterministic order
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    spans = (
        o.withColumn("nxt", F.lead("o_orderdate").over(w))
        .withColumn("nxt_status", F.lead("o_orderstatus").over(w))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(F.col("nxt").isNotNull(), F.datediff("nxt", "o_orderdate"))
            .otherwise(F.datediff("h", "o_orderdate"))
            .alias("t"),
            F.when(F.col("nxt").isNull(), F.lit(None))
            .when(F.col("nxt_status") == "F", "F")
            .otherwise("O")
            .alias("cause"),
        )
        .where(F.col("t") > 0)
    )
    hist = spans.groupBy("t").agg(
        F.sum(F.when(F.col("cause") == "F", 1).otherwise(0)).cast("bigint").alias("d_f"),
        F.sum(F.when(F.col("cause") == "O", 1).otherwise(0)).cast("bigint").alias("d_o"),
        F.count(F.lit(1)).cast("bigint").alias("tot"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wprev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    curve = (
        hist.withColumn("total", F.sum("tot").over(wall).cast("bigint"))
        .withColumn(
            "n_at_risk",
            F.col("total") - F.coalesce(F.sum("tot").over(wprev), F.lit(0)),
        )
        .where((F.col("d_f") + F.col("d_o")) > 0)
    )
    lnterm = F.when(
        F.col("n_at_risk") > F.col("d_f") + F.col("d_o"),
        F.log(
            (F.col("n_at_risk") - F.col("d_f") - F.col("d_o")).cast("double")
            / F.col("n_at_risk").cast("double")
        ),
    )
    ann = curve.withColumn(
        "s_prev",
        F.exp(F.coalesce(F.sum(lnterm).over(wprev), F.lit(0.0))),
    )
    inc_f = F.col("s_prev") * F.col("d_f").cast("double") / F.col("n_at_risk").cast("double")
    inc_o = F.col("s_prev") * F.col("d_o").cast("double") / F.col("n_at_risk").cast("double")
    return (
        ann.withColumn("cif_f", F.round(F.sum(inc_f).over(wcum), 6))
        .withColumn("cif_o", F.round(F.sum(inc_o).over(wcum), 6))
        .select(
            F.col("t").cast("int").alias("gap_days"),
            "d_f",
            "d_o",
            F.col("n_at_risk").cast("bigint").alias("n_at_risk"),
            "cif_f",
            "cif_o",
        )
        .orderBy("gap_days")
    )


CUSTOMERS_COMPETING_RISKS_SQL = """
WITH o AS (SELECT o_custkey, o_orderkey, o_orderdate, o_orderstatus FROM orders),
h AS (SELECT MAX(o_orderdate) AS h FROM o),
spans AS (
  SELECT CASE WHEN nxt IS NOT NULL THEN date_diff('day', o_orderdate, nxt)
              ELSE date_diff('day', o_orderdate, h.h) END AS t,
         CASE WHEN nxt IS NULL THEN NULL
              WHEN nxt_status = 'F' THEN 'F' ELSE 'O' END AS cause
  FROM (SELECT o_custkey, o_orderdate,
               LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS nxt,
               LEAD(o_orderstatus) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS nxt_status
        FROM o) s, h
),
good AS (SELECT * FROM spans WHERE t > 0),
hist AS (
  SELECT t,
         CAST(SUM(CASE WHEN cause = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS d_f,
         CAST(SUM(CASE WHEN cause = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS d_o,
         CAST(COUNT(*) AS BIGINT) AS tot
  FROM good GROUP BY 1
),
curve AS (
  SELECT t, d_f, d_o,
         CAST(SUM(tot) OVER () AS BIGINT)
           - CAST(COALESCE(SUM(tot) OVER (ORDER BY t
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS n_at_risk
  FROM hist
),
ev AS (SELECT * FROM curve WHERE d_f + d_o > 0),
ann AS (
  SELECT t, d_f, d_o, n_at_risk,
         exp(COALESCE(SUM(CASE WHEN n_at_risk > d_f + d_o
               THEN ln(CAST(n_at_risk - d_f - d_o AS DOUBLE) / n_at_risk) END)
             OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0))
           AS s_prev
  FROM ev
)
SELECT CAST(t AS INTEGER) AS gap_days, d_f, d_o, n_at_risk,
       ROUND(SUM(s_prev * d_f / n_at_risk) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cif_f,
       ROUND(SUM(s_prev * d_o / n_at_risk) OVER (ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cif_o
FROM ann
ORDER BY gap_days
"""

QUERIES["customers_competing_risks"] = customers_competing_risks
ORACLE["customers_competing_risks"] = CUSTOMERS_COMPETING_RISKS_SQL


def parts_eoq_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inventory policy per brand: Economic Order Quantity
    √(2DK/h) (Harris 1913; K = 100 order cost, h = 2 annual
    holding cost per unit — policy constants, not data) plus safety
    stock z·σ_d·√L (z = 1.645 for a 95% cycle service level, L = 0.25
    years lead time) and the reorder point D·L + SS — the planning
    triplet behind every min/max setting.

    Determinism: annual demand D and its per-month variance come
    from exact cents-scaled integers; the three closing expressions
    (two sqrt, products) are IDENTICAL IEEE doubles on both engines
    (sqrt is correctly rounded; the z constant is a literal), each
    emitted at a one-shot 2dp ROUND — no accumulation of rounded
    values anywhere.

    Scale: one fact scan to (brand, month) cells, brand-grain moment
    agg, |brands| rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        (money("l_quantity") * 100).cast("decimal(38,0)").alias("q_c"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "month")
        .agg(F.sum("q_c").cast("decimal(38,0)").alias("q"))
    )
    agg = cells.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        F.sum("q").cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("q * q")).cast("decimal(38,0)").alias("qq"),
    )
    mean_mo = "(CAST(s AS DOUBLE) / 100.0 / CAST(n_months AS DOUBLE))"
    var_mo = (
        "((CAST(n_months AS DOUBLE) * CAST(qq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
        " / (CAST(n_months AS DOUBLE) * CAST(n_months AS DOUBLE)) / 10000.0)"
    )
    annual_d = f"(12.0 * {mean_mo})"
    eoq = f"sqrt(2.0 * {annual_d} * 100.0 / 2.0)"
    ss = f"(1.645 * sqrt({var_mo} * 3.0))"  # σ over L = 3 months of variance
    return agg.select(
        F.col("p_brand").alias("brand"),
        "n_months",
        F.expr(f"ROUND({annual_d}, 2)").alias("annual_demand"),
        F.expr(f"ROUND({eoq}, 2)").alias("eoq_units"),
        F.expr(f"ROUND({ss}, 2)").alias("safety_stock"),
        F.expr(f"ROUND({annual_d} * 0.25 + {ss}, 2)").alias("reorder_point"),
    ).orderBy("brand")


PARTS_EOQ_SQL = """
WITH cells AS (
  SELECT p.p_brand, date_trunc('month', l.l_shipdate) AS month,
         CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS HUGEINT))
              AS HUGEINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
agg AS (
  SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_months,
         CAST(SUM(q) AS HUGEINT) AS s, CAST(SUM(q * q) AS HUGEINT) AS qq
  FROM cells GROUP BY 1
)
SELECT p_brand AS brand, n_months,
       ROUND(12.0 * (CAST(s AS DOUBLE) / 100.0 / CAST(n_months AS DOUBLE)), 2)
         AS annual_demand,
       ROUND(sqrt(2.0 * (12.0 * (CAST(s AS DOUBLE) / 100.0 / CAST(n_months AS DOUBLE)))
                  * 100.0 / 2.0), 2) AS eoq_units,
       ROUND(1.645 * sqrt(((CAST(n_months AS DOUBLE) * CAST(qq AS DOUBLE)
                            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                           / (CAST(n_months AS DOUBLE) * CAST(n_months AS DOUBLE))
                           / 10000.0) * 3.0), 2) AS safety_stock,
       ROUND((12.0 * (CAST(s AS DOUBLE) / 100.0 / CAST(n_months AS DOUBLE))) * 0.25
             + 1.645 * sqrt(((CAST(n_months AS DOUBLE) * CAST(qq AS DOUBLE)
                              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                             / (CAST(n_months AS DOUBLE) * CAST(n_months AS DOUBLE))
                             / 10000.0) * 3.0), 2) AS reorder_point
FROM agg
ORDER BY brand
"""

QUERIES["parts_eoq_policy"] = parts_eoq_policy
ORACLE["parts_eoq_policy"] = PARTS_EOQ_SQL


def orders_bullwhip_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bullwhip-effect ratio (Lee, Padmanabhan & Whang 1997): demand
    variability amplification between supply tiers, measured as
    CV²(monthly shipped quantity) / CV²(monthly order count) — the
    downstream lineitem signal is the "factory" view, the order
    count the "customer" view; a ratio ≫ 1 says batching/forecasting
    policies amplify noise as demand propagates upstream.

    Determinism: both tiers' first/second moments are exact integers
    (cents-scaled quantities, order counts); each CV² is exact
    integer cross-multiplied algebra; the ratio is ONE identical
    IEEE double (p-chart contract) with a one-shot 6dp ROUND — and
    the exact integer comparison amplifies = CV²_down·den_up >
    CV²_up·den_down rides alongside so the VERDICT never depends on
    float rounding.

    Scale: two month-grain map-side aggs; scalar close."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    )
    om = o.groupBy("month").agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    li = load_table(spark, sf_dir, "lineitem").select(
        F.date_trunc("month", "l_shipdate").cast("date").alias("month"),
        (money("l_quantity") * 100).cast("decimal(38,0)").alias("q"),
    )
    lm = li.groupBy("month").agg(F.sum("q").cast("decimal(38,0)").alias("y"))

    def moments(df, cast):
        return df.agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("y").cast(cast).alias("s"),
            F.sum(F.expr(f"CAST(y AS {cast}) * CAST(y AS {cast})")).cast(cast).alias("qq"),
        )

    up = moments(om, "decimal(38,0)").select(
        F.col("n").alias("n_up"), F.col("s").alias("s_up"), F.col("qq").alias("q_up")
    )
    dn = moments(lm, "decimal(38,0)").select(
        F.col("n").alias("n_dn"), F.col("s").alias("s_dn"), F.col("qq").alias("q_dn")
    )
    j = up.crossJoin(F.broadcast(dn))
    cv2 = "((CAST({n} AS DOUBLE) * CAST({q} AS DOUBLE) - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE)) / (CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE)))"
    cvu = cv2.format(n="n_up", q="q_up", s="s_up")
    cvd = cv2.format(n="n_dn", q="q_dn", s="s_dn")
    amp = (
        "(CAST(n_dn AS DECIMAL(38,0)) * q_dn - s_dn * s_dn) * (s_up * s_up)"
        " > (CAST(n_up AS DECIMAL(38,0)) * q_up - s_up * s_up) * (s_dn * s_dn)"
    )
    return j.select(
        F.col("n_up").alias("n_months"),
        F.expr(f"ROUND({cvd} / {cvu}, 6)").alias("bullwhip_ratio"),
        F.expr(f"ROUND({cvu}, 6)").alias("cv2_orders"),
        F.expr(f"ROUND({cvd}, 6)").alias("cv2_shipments"),
        F.expr(amp).alias("amplifies"),
    )


ORDERS_BULLWHIP_SQL = """
WITH om AS (
  SELECT date_trunc('month', o_orderdate) AS month, CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
lm AS (
  SELECT date_trunc('month', l_shipdate) AS month,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS HUGEINT) AS y
  FROM lineitem GROUP BY 1
),
up AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_up, CAST(SUM(y) AS HUGEINT) AS s_up,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS q_up
  FROM om
),
dn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_dn, CAST(SUM(y) AS HUGEINT) AS s_dn,
         CAST(SUM(y * y) AS HUGEINT) AS q_dn
  FROM lm
)
SELECT n_up AS n_months,
       ROUND(((CAST(n_dn AS DOUBLE) * CAST(q_dn AS DOUBLE)
               - CAST(s_dn AS DOUBLE) * CAST(s_dn AS DOUBLE))
              / (CAST(s_dn AS DOUBLE) * CAST(s_dn AS DOUBLE)))
             / ((CAST(n_up AS DOUBLE) * CAST(q_up AS DOUBLE)
                 - CAST(s_up AS DOUBLE) * CAST(s_up AS DOUBLE))
                / (CAST(s_up AS DOUBLE) * CAST(s_up AS DOUBLE))), 6) AS bullwhip_ratio,
       ROUND((CAST(n_up AS DOUBLE) * CAST(q_up AS DOUBLE)
              - CAST(s_up AS DOUBLE) * CAST(s_up AS DOUBLE))
             / (CAST(s_up AS DOUBLE) * CAST(s_up AS DOUBLE)), 6) AS cv2_orders,
       ROUND((CAST(n_dn AS DOUBLE) * CAST(q_dn AS DOUBLE)
              - CAST(s_dn AS DOUBLE) * CAST(s_dn AS DOUBLE))
             / (CAST(s_dn AS DOUBLE) * CAST(s_dn AS DOUBLE)), 6) AS cv2_shipments,
       (CAST(n_dn AS HUGEINT) * q_dn - s_dn * s_dn) * (s_up * s_up)
         > (CAST(n_up AS HUGEINT) * q_up - s_up * s_up) * (s_dn * s_dn) AS amplifies
FROM up, dn
"""

QUERIES["orders_bullwhip_effect"] = orders_bullwhip_effect
ORACLE["orders_bullwhip_effect"] = ORDERS_BULLWHIP_SQL


def nations_complexity_proximity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-space proximity (Hidalgo–Hausmann 2007): for every
    brand pair, φ = |nations with RCA ≥ 1 in BOTH| / max(ubiquity) —
    the conditional-probability backbone of economic-complexity
    analysis ("countries diversify into products PROXIMATE to what
    they already export"); per brand, the density (mean proximity to
    the rest of the space) ranks how central each product line is.
    Builds directly on nations_rca_matrix's Balassa cells.

    Engine-exact: the RCA ≥ 1 flag is the integer cross-multiplied
    compare x_ns·X ≥ x_n·X_s (cents-scaled DECIMAL products — no
    division); co-occurrence counts are integers; φ and density are
    integer ppm DIVs. Output is the |brands|² ≤ 625-cell proximity
    aggregate — top-15 pairs plus each member's density.

    Scale: ONE fact shuffle to (nation, brand) cells; the M matrix
    is |nations|·|brands| ≤ 625 rows, so the pair join is
    model-sized."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", money("l_extendedprice").alias("rev")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("s_nationkey", "p_brand")
        .agg((F.sum("rev") * 100).cast("decimal(38,0)").alias("cents"))
    )
    m = cells.select(
        "s_nationkey",
        "p_brand",
        "cents",
        F.sum("cents").over(Window.partitionBy("s_nationkey")).alias("x_n"),
        F.sum("cents").over(Window.partitionBy("p_brand")).alias("x_s"),
        F.sum("cents").over(Window.partitionBy(F.lit(1))).alias("x_tot"),
    ).where(F.expr("cents * x_tot >= x_n * x_s"))  # RCA >= 1
    mm = m.select("s_nationkey", "p_brand").localCheckpoint(eager=True)
    ubiq = mm.groupBy("p_brand").agg(F.count(F.lit(1)).cast("bigint").alias("u"))
    a = mm.select(F.col("s_nationkey").alias("n"), F.col("p_brand").alias("b1"))
    b = mm.select(F.col("s_nationkey").alias("n"), F.col("p_brand").alias("b2"))
    co = (
        a.join(b, "n")
        .where(F.col("b1") < F.col("b2"))
        .groupBy("b1", "b2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("both"))
    )
    prox = (
        co.join(ubiq.select(F.col("p_brand").alias("b1"), F.col("u").alias("u1")), "b1")
        .join(ubiq.select(F.col("p_brand").alias("b2"), F.col("u").alias("u2")), "b2")
        .select(
            "b1",
            "b2",
            "both",
            F.expr("CAST(both * 1000000 DIV GREATEST(u1, u2) AS BIGINT)").alias(
                "proximity_ppm"
            ),
        )
    )
    w = Window.orderBy(F.desc("proximity_ppm"), "b1", "b2")
    return (
        prox.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 15)
        .select(
            F.col("rk").cast("int").alias("rank"),
            F.col("b1").alias("brand_a"),
            F.col("b2").alias("brand_b"),
            "both",
            "proximity_ppm",
        )
        .orderBy("rank")
    )


NATIONS_PROXIMITY_SQL = """
WITH cells AS (
  SELECT s.s_nationkey, p.p_brand,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) * 100 AS HUGEINT) AS cents
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
),
m AS (
  SELECT s_nationkey, p_brand FROM (
    SELECT s_nationkey, p_brand, cents,
           SUM(cents) OVER (PARTITION BY s_nationkey) AS x_n,
           SUM(cents) OVER (PARTITION BY p_brand) AS x_s,
           SUM(cents) OVER () AS x_tot
    FROM cells
  ) WHERE cents * x_tot >= x_n * x_s
),
ubiq AS (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS u FROM m GROUP BY 1),
co AS (
  SELECT a.p_brand AS b1, b.p_brand AS b2, CAST(COUNT(*) AS BIGINT) AS both_n
  FROM m a JOIN m b ON a.s_nationkey = b.s_nationkey AND a.p_brand < b.p_brand
  GROUP BY 1, 2
),
prox AS (
  SELECT c.b1, c.b2, c.both_n,
         CAST(c.both_n * 1000000 // GREATEST(u1.u, u2.u) AS BIGINT) AS proximity_ppm
  FROM co c JOIN ubiq u1 ON u1.p_brand = c.b1 JOIN ubiq u2 ON u2.p_brand = c.b2
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY proximity_ppm DESC, b1, b2) AS INTEGER) AS rank,
       b1 AS brand_a, b2 AS brand_b, both_n AS both, proximity_ppm
FROM prox
QUALIFY rank <= 15
ORDER BY rank
"""

QUERIES["nations_complexity_proximity"] = nations_complexity_proximity
ORACLE["nations_complexity_proximity"] = NATIONS_PROXIMITY_SQL


def lineitem_clustered_se(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-robust (Liang–Zeger sandwich) standard error for the
    quantity-on-discount OLS slope, clustered by part BRAND — the
    inference fix for the error every naive regression on grouped
    data makes: line items of one brand share shocks, so iid SEs
    overstate precision; the se_cluster/se_iid inflation ratio IS
    the finding. Var̂(β) = Σ_g u_g² / Sxx_c², u_g = Σ_{i∈g} x̃ᵢeᵢ =
    (x̃ỹ)_g − β(x̃x̃)_g from centered per-group cross moments.

    Determinism: all moments are exact cents-scaled integers; each
    u_g is ONE identical IEEE double expression per group
    (the p-chart contract), e6-rounded PER GROUP before the integer
    square-and-sum (a float Σu² across shuffled groups would be
    order-dependent — the per-term rule, applied to groups), with an
    in-plan n-independent downscale (DIV k, k = GREATEST(1, n DIV
    1e7) — k = 1 at every gate tier) keeping squares inside
    DECIMAL(38,0) at any scale; both SEs close as identical IEEE
    doubles, one-shot 6dp.

    Scale: one fact-dim join, one brand-grain moment agg; the
    sandwich runs on |brands| rows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (money("l_quantity") * 100).cast("decimal(38,0)").alias("y"),
        (F.col("l_discount").cast("decimal(5,2)") * 100).cast("decimal(38,0)").alias("x"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(p, li.l_partkey == p.p_partkey)
    g = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("ng"),
        F.sum("x").cast("decimal(38,0)").alias("sx_g"),
        F.sum("y").cast("decimal(38,0)").alias("sy_g"),
        F.sum(F.expr("x * y")).cast("decimal(38,0)").alias("sxy_g"),
        F.sum(F.expr("x * x")).cast("decimal(38,0)").alias("sxx_g"),
        F.sum(F.expr("y * y")).cast("decimal(38,0)").alias("syy_g"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tot = (
        g.withColumn("n", F.sum("ng").over(wall).cast("decimal(38,0)"))
        .withColumn("sx", F.sum("sx_g").over(wall).cast("decimal(38,0)"))
        .withColumn("sy", F.sum("sy_g").over(wall).cast("decimal(38,0)"))
        .withColumn("sxy", F.sum("sxy_g").over(wall).cast("decimal(38,0)"))
        .withColumn("sxx", F.sum("sxx_g").over(wall).cast("decimal(38,0)"))
        .withColumn("syy", F.sum("syy_g").over(wall).cast("decimal(38,0)"))
        .withColumn("gcount", F.count(F.lit(1)).over(wall).cast("bigint"))
    )
    nD = "CAST(n AS DOUBLE)"
    beta = (
        f"(({nD} * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        f" / ({nD} * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
    )
    xbar = f"(CAST(sx AS DOUBLE) / {nD})"
    ybar = f"(CAST(sy AS DOUBLE) / {nD})"
    # u_g = [Sxy_g − x̄Sy_g − ȳSx_g + n_g·x̄ȳ] − β[Sxx_g − 2x̄Sx_g + n_g·x̄²]
    u_g = (
        f"((CAST(sxy_g AS DOUBLE) - {xbar} * CAST(sy_g AS DOUBLE)"
        f" - {ybar} * CAST(sx_g AS DOUBLE) + CAST(ng AS DOUBLE) * {xbar} * {ybar})"
        f" - {beta} * (CAST(sxx_g AS DOUBLE) - CAST(2 AS DOUBLE) * {xbar} * CAST(sx_g AS DOUBLE)"
        f" + CAST(ng AS DOUBLE) * {xbar} * {xbar}))"
    )
    kdiv = "GREATEST(CAST(1 AS BIGINT), CAST(n AS BIGINT) DIV 10000000)"
    scaled = tot.withColumn(
        "u_e6",
        F.expr(
            f"CAST(ROUND({u_g} * CAST(1000000 AS DOUBLE)) AS DECIMAL(38,0))"
            f" DIV CAST({kdiv} AS DECIMAL(38,0))"
        ).cast("decimal(38,0)"),
    )
    agg = scaled.agg(
        F.first("n").alias("n"),
        F.first("sx").alias("sx"),
        F.first("sy").alias("sy"),
        F.first("sxy").alias("sxy"),
        F.first("sxx").alias("sxx"),
        F.first("syy").alias("syy"),
        F.first("gcount").alias("gcount"),
        F.sum(F.expr("u_e6 * u_e6")).cast("decimal(38,0)").alias("sum_u2"),
        F.first(F.expr(f"CAST({kdiv} AS BIGINT)")).alias("kk"),
    )
    sxxc = f"(({nD} * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / {nD})"
    sxyc = f"(({nD} * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / {nD})"
    syyc = f"(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / {nD})"
    se_cl = (
        f"(sqrt(CAST(sum_u2 AS DOUBLE)) * CAST(kk AS DOUBLE)"
        f" / CAST(1000000 AS DOUBLE) / {sxxc})"
    )
    se_iid = (
        f"sqrt(({syyc} - {beta} * {sxyc})"
        f" / (({nD} - CAST(2 AS DOUBLE)) * {sxxc}))"
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("gcount").alias("n_clusters"),
        F.expr(f"ROUND({beta} * CAST(1000000 AS DOUBLE), 6)").alias("beta_e6"),
        F.expr(f"ROUND({se_iid} * CAST(1000000 AS DOUBLE), 6)").alias("se_iid_e6"),
        F.expr(f"ROUND({se_cl} * CAST(1000000 AS DOUBLE), 6)").alias("se_cluster_e6"),
        F.expr(f"ROUND({se_cl} / {se_iid}, 6)").alias("se_inflation"),
    )


def _clustered_se_sql() -> str:
    nD = "CAST(n AS DOUBLE)"
    beta = (
        f"(({nD} * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        f" / ({nD} * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
    )
    xbar = f"(CAST(sx AS DOUBLE) / {nD})"
    ybar = f"(CAST(sy AS DOUBLE) / {nD})"
    u_g = (
        f"((CAST(sxy_g AS DOUBLE) - {xbar} * CAST(sy_g AS DOUBLE)"
        f" - {ybar} * CAST(sx_g AS DOUBLE) + CAST(ng AS DOUBLE) * {xbar} * {ybar})"
        f" - {beta} * (CAST(sxx_g AS DOUBLE) - CAST(2 AS DOUBLE) * {xbar} * CAST(sx_g AS DOUBLE)"
        f" + CAST(ng AS DOUBLE) * {xbar} * {xbar}))"
    )
    kdiv = "GREATEST(CAST(1 AS BIGINT), CAST(n AS BIGINT) // 10000000)"
    sxxc = f"(({nD} * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / {nD})"
    sxyc = f"(({nD} * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / {nD})"
    syyc = f"(CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / {nD})"
    se_cl = (
        f"(sqrt(CAST(sum_u2 AS DOUBLE)) * CAST(kk AS DOUBLE)"
        f" / CAST(1000000 AS DOUBLE) / {sxxc})"
    )
    se_iid = (
        f"sqrt(({syyc} - {beta} * {sxyc}) / (({nD} - CAST(2 AS DOUBLE)) * {sxxc}))"
    )
    return f"""
WITH j AS (
  SELECT p.p_brand,
         CAST(CAST(l.l_quantity AS DECIMAL(12,2)) * 100 AS HUGEINT) AS y,
         CAST(CAST(l.l_discount AS DECIMAL(5,2)) * 100 AS HUGEINT) AS x
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
g AS (
  SELECT p_brand, CAST(COUNT(*) AS HUGEINT) AS ng,
         SUM(x) AS sx_g, SUM(y) AS sy_g,
         SUM(x * y) AS sxy_g, SUM(x * x) AS sxx_g, SUM(y * y) AS syy_g
  FROM j GROUP BY 1
),
tot AS (
  SELECT g.*, t.n, t.sx, t.sy, t.sxy, t.sxx, t.syy, t.gcount
  FROM g, (SELECT CAST(SUM(ng) AS HUGEINT) AS n, CAST(SUM(sx_g) AS HUGEINT) AS sx,
                  CAST(SUM(sy_g) AS HUGEINT) AS sy, CAST(SUM(sxy_g) AS HUGEINT) AS sxy,
                  CAST(SUM(sxx_g) AS HUGEINT) AS sxx, CAST(SUM(syy_g) AS HUGEINT) AS syy,
                  CAST(COUNT(*) AS BIGINT) AS gcount
           FROM g) t
),
scaled AS (
  SELECT *, CAST(ROUND({u_g} * CAST(1000000 AS DOUBLE)) AS HUGEINT)
            // CAST({kdiv} AS HUGEINT) AS u_e6
  FROM tot
),
agg AS (
  SELECT MIN(n) AS n, MIN(sx) AS sx, MIN(sy) AS sy, MIN(sxy) AS sxy,
         MIN(sxx) AS sxx, MIN(syy) AS syy, MIN(gcount) AS gcount,
         CAST(SUM(u_e6 * u_e6) AS HUGEINT) AS sum_u2,
         MIN(CAST({kdiv} AS BIGINT)) AS kk
  FROM scaled
)
SELECT CAST(n AS BIGINT) AS n_rows,
       gcount AS n_clusters,
       ROUND({beta} * CAST(1000000 AS DOUBLE), 6) AS beta_e6,
       ROUND({se_iid} * CAST(1000000 AS DOUBLE), 6) AS se_iid_e6,
       ROUND({se_cl} * CAST(1000000 AS DOUBLE), 6) AS se_cluster_e6,
       ROUND({se_cl} / {se_iid}, 6) AS se_inflation
FROM agg
"""


QUERIES["lineitem_clustered_se"] = lineitem_clustered_se
ORACLE["lineitem_clustered_se"] = _clustered_se_sql()


# ---------------------------------------------------------------------------
# orders_friedman_test — nonparametric randomized-block test (round 10)
# ---------------------------------------------------------------------------


def orders_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman rank test (Friedman 1937) for priority effects on
    order value across month blocks: does o_orderpriority shift
    spend, controlling for month? Each complete month-block ranks its
    k = 5 priority cells; Q = 12/(n·k·(k+1))·ΣRⱼ² − 3·n·(k+1) is
    χ²(k−1) under H₀ — the nonparametric ANOVA a reporting pipeline
    uses when monthly spend is skewed enough that the F-test's
    normality assumption is indefensible (kruskal_wallis is the
    unblocked sibling).

    Engine-exact: the per-cell metric is exact integer cents divided
    once in IEEE (sum_e2·1.0/cnt — both operands exact integers, one
    deterministic division), so the within-block rank order is
    bit-identical cross-engine; ranks are then integers and
    Q_ppm = 12e6·ΣRⱼ² DIV (n·k·(k+1)) − 3e6·n·(k+1) is pure integer
    arithmetic. Incomplete months (missing a priority) are dropped —
    Friedman requires complete blocks.

    Scale: one hash agg to the (month, priority) grain (≤ 80·5
    cells), window ranks on cell-sized data, one final agg."""
    o = load_table(spark, sf_dir, "orders")
    cells = (
        o.select(
            (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("block"),
            F.col("o_orderpriority").alias("treatment"),
            F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias("cents"),
        )
        .groupBy("block", "treatment")
        .agg(F.sum("cents").cast("bigint").alias("s"), F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    k = 5
    complete = (
        cells.withColumn("kk", F.count(F.lit(1)).over(Window.partitionBy("block")))
        .where(F.col("kk") == k)
        .drop("kk")
    )
    wb = Window.partitionBy("block").orderBy(F.expr("CAST(s AS DOUBLE) / c"), "treatment")
    ranked = complete.withColumn("r", F.row_number().over(wb))
    rsums = ranked.groupBy("treatment").agg(F.sum("r").cast("bigint").alias("rj"))
    nb = ranked.agg(F.countDistinct("block").cast("bigint").alias("n_blocks"))
    return (
        rsums.agg(
            F.count(F.lit(1)).cast("int").alias("k"),
            F.sum(F.col("rj") * F.col("rj")).cast("bigint").alias("sum_rj2"),
        )
        .crossJoin(F.broadcast(nb))
        .select(
            "n_blocks",
            "k",
            "sum_rj2",
            F.expr(
                "CAST(12 * sum_rj2 * 1000000 DIV (n_blocks * k * (k + 1))"
                " - CAST(3000000 AS BIGINT) * n_blocks * (k + 1) AS BIGINT)"
            ).alias("q_ppm"),
        )
    )


FRIEDMAN_SQL = """
WITH cells AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INTEGER) AS block,
         o_orderpriority AS treatment,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM orders GROUP BY 1, 2
),
complete AS (
  SELECT * FROM (
    SELECT cells.*, COUNT(*) OVER (PARTITION BY block) AS kk FROM cells
  ) WHERE kk = 5
),
ranked AS (
  SELECT block, treatment,
         ROW_NUMBER() OVER (PARTITION BY block
                            ORDER BY CAST(s AS DOUBLE) / c, treatment) AS r
  FROM complete
),
rsums AS (
  SELECT treatment, CAST(SUM(r) AS BIGINT) AS rj FROM ranked GROUP BY 1
),
nb AS (SELECT CAST(COUNT(DISTINCT block) AS BIGINT) AS n FROM ranked)
SELECT nb.n AS n_blocks,
       CAST(COUNT(*) AS INTEGER) AS k,
       CAST(SUM(rj * rj) AS BIGINT) AS sum_rj2,
       CAST(12 * CAST(SUM(rj * rj) AS BIGINT) * 1000000 // (nb.n * COUNT(*) * (COUNT(*) + 1))
            - 3000000 * nb.n * (COUNT(*) + 1) AS BIGINT) AS q_ppm
FROM rsums, nb
GROUP BY nb.n
"""

QUERIES["orders_friedman_test"] = orders_friedman_test
ORACLE["orders_friedman_test"] = FRIEDMAN_SQL


# ---------------------------------------------------------------------------
# orders_erlang_staffing — Erlang-C staffing calculator (round 10)
# ---------------------------------------------------------------------------


def orders_erlang_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Erlang-C staffing table from the order stream: peak daily
    arrival rate λ (busiest day), per-agent service rate μ =
    GREATEST(λ DIV 20, 1) (data-adaptive in-plan per the r9 rule —
    offered load a = λ/μ stays ~20 erlangs at every SF), and the
    MINIMUM agent count c* whose Erlang-C delay probability
    C(c, a) = (a^c/c!)·c/(c−a) / (Σ_{k<c} a^k/k! + (a^c/c!)·c/(c−a))
    drops to ≤ 20% — the queueing-theory staffing answer
    (call-center/ops sizing; pairs with orders_little_law and
    orders_peak_wip).

    Engine-exact: a^k/k! is NEVER computed via factorial (Spark's
    factorial() is LONG-only, k! overflows at 21) — each term is
    exp(Σ_{j≤k} ln(a/j)) with the log increments FLOOR-quantized to
    integer e6 (identical doubles → identical floor; exact integer
    cumulative sums — the r10 'sum across groups' rule) and ONE
    exp+ROUND per term; the Σ_{k<c} denominator is a DECIMAL
    cumulative sum of the 6dp terms.

    Scale: the fact table collapses to the daily-count agg; the
    Erlang table is 80 static rows."""
    o = load_table(spark, sf_dir, "orders")
    lam = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).agg(F.max("c").cast("bigint").alias("lam"))
    grid = lam.select(
        "lam",
        F.expr("CAST(GREATEST(lam DIV 20, 1) AS BIGINT)").alias("mu"),
        F.explode(F.expr("sequence(1, 80)")).alias("k"),
    ).select(
        "lam",
        "mu",
        "k",
        F.expr("CAST(lam AS DOUBLE) / mu").alias("a"),
        F.expr(
            "CAST(FLOOR(LN(CAST(lam AS DOUBLE) / mu / k) * 1000000) AS BIGINT)"
        ).alias("dlog_e6"),
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    terms = grid.select(
        "lam",
        "mu",
        "k",
        "a",
        F.expr("ROUND(EXP(CAST(SUM(dlog_e6) OVER (ORDER BY k) AS DOUBLE) / 1000000), 6)").alias(
            "term"
        ),
    )
    cum = terms.select(
        "lam",
        "mu",
        "k",
        "a",
        "term",
        (
            F.lit(1)
            + F.coalesce(
                F.sum(F.col("term").cast("decimal(28,6)")).over(
                    Window.orderBy("k").rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("decimal(28,6)")
        ).alias("s_below"),  # 1 (= a^0/0!) + Σ_{0<j<k} term_j
    )
    ec = cum.where(F.expr("k > a")).select(
        "lam",
        "mu",
        "k",
        F.expr(
            "ROUND(term * (k / (k - a))"
            " / (CAST(s_below AS DOUBLE) + term * (k / (k - a))) * 1000000) "
        ).alias("ec_ppm_raw"),
    ).select(
        "lam", "mu", "k", F.expr("CAST(ec_ppm_raw AS BIGINT)").alias("ec_ppm")
    )
    return ec.groupBy().agg(
        F.max("lam").alias("lambda_peak"),
        F.max("mu").alias("mu"),
        F.min(F.when(F.col("ec_ppm") <= 200000, F.col("k"))).cast("int").alias("c_star"),
        # EC decreases in k, so the MAX over qualifying rows is EC AT c*
        F.max(F.when(F.col("ec_ppm") <= 200000, F.col("ec_ppm"))).alias("note_ec_ppm_at_first_k"),
    ).select(
        "lambda_peak",
        "mu",
        "c_star",
        F.col("note_ec_ppm_at_first_k").cast("bigint").alias("erlang_c_ppm"),
    )


ERLANG_SQL = """
WITH lam AS (
  SELECT CAST(MAX(c) AS BIGINT) AS lam FROM (
    SELECT CAST(COUNT(*) AS BIGINT) AS c FROM orders GROUP BY CAST(o_orderdate AS DATE)
  )
),
grid AS (
  SELECT lam, CAST(GREATEST(lam // 20, 1) AS BIGINT) AS mu, k,
         CAST(lam AS DOUBLE) / GREATEST(lam // 20, 1) AS a,
         CAST(FLOOR(LN(CAST(lam AS DOUBLE) / GREATEST(lam // 20, 1) / k) * 1000000)
              AS BIGINT) AS dlog_e6
  FROM lam, LATERAL (SELECT unnest(generate_series(1, 80)) AS k) g
),
terms AS (
  SELECT lam, mu, k, a,
         ROUND(EXP(CAST(SUM(dlog_e6) OVER (ORDER BY k) AS DOUBLE) / 1000000), 6) AS term
  FROM grid
),
cum AS (
  SELECT lam, mu, k, a, term,
         CAST(1 + COALESCE(SUM(CAST(term AS DECIMAL(28,6))) OVER (
             ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS DECIMAL(28,6)) AS s_below
  FROM terms
),
ec AS (
  SELECT lam, mu, k,
         CAST(ROUND(term * (k / (k - a))
              / (CAST(s_below AS DOUBLE) + term * (k / (k - a))) * 1000000) AS BIGINT) AS ec_ppm
  FROM cum WHERE k > a
)
SELECT MAX(lam) AS lambda_peak, MAX(mu) AS mu,
       CAST(MIN(CASE WHEN ec_ppm <= 200000 THEN k END) AS INTEGER) AS c_star,
       CAST(MAX(CASE WHEN ec_ppm <= 200000 THEN ec_ppm END) AS BIGINT) AS erlang_c_ppm
FROM ec
"""

QUERIES["orders_erlang_staffing"] = orders_erlang_staffing
ORACLE["orders_erlang_staffing"] = ERLANG_SQL


# ---------------------------------------------------------------------------
# lineitem_oaxaca_blinder — wage-gap-style decomposition (round 10)
# ---------------------------------------------------------------------------

# Shared close over per-group exact-integer OLS sums (a = returned,
# b = kept): beta/alpha per group, twofold decomposition at group-B
# coefficients. One string, two engines.
_OAXACA_CLOSE = """
  ROUND(CAST(sy_a AS DOUBLE) / n_a / 100 - CAST(sy_b AS DOUBLE) / n_b / 100, 6) AS gap,
  ROUND(CAST(CAST(n_b AS DECIMAL(38,0)) * sxy_b - CAST(sx_b AS DECIMAL(38,0)) * sy_b AS DOUBLE)
        / CAST(CAST(n_b AS DECIMAL(38,0)) * sxx_b - CAST(sx_b AS DECIMAL(38,0)) * sx_b AS DOUBLE)
        * (CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b) / 100, 6) AS explained,
  ROUND((CAST(sy_a AS DOUBLE) / n_a / 100 - CAST(sy_b AS DOUBLE) / n_b / 100)
        - CAST(CAST(n_b AS DECIMAL(38,0)) * sxy_b - CAST(sx_b AS DECIMAL(38,0)) * sy_b AS DOUBLE)
        / CAST(CAST(n_b AS DECIMAL(38,0)) * sxx_b - CAST(sx_b AS DECIMAL(38,0)) * sx_b AS DOUBLE)
        * (CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b) / 100, 6) AS unexplained,
  ROUND(CAST(CAST(n_a AS DECIMAL(38,0)) * sxy_a - CAST(sx_a AS DECIMAL(38,0)) * sy_a AS DOUBLE)
        / CAST(CAST(n_a AS DECIMAL(38,0)) * sxx_a - CAST(sx_a AS DECIMAL(38,0)) * sx_a AS DOUBLE), 6) AS beta_a,
  ROUND(CAST(CAST(n_b AS DECIMAL(38,0)) * sxy_b - CAST(sx_b AS DECIMAL(38,0)) * sy_b AS DOUBLE)
        / CAST(CAST(n_b AS DECIMAL(38,0)) * sxx_b - CAST(sx_b AS DECIMAL(38,0)) * sx_b AS DOUBLE), 6) AS beta_b
"""


def lineitem_oaxaca_blinder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oaxaca–Blinder decomposition (Oaxaca 1973; Blinder 1973) of
    the mean line-value gap between RETURNED (l_returnflag = 'R') and
    kept line items, explained by quantity: gap = ȳ_R − ȳ_K splits
    into the ENDOWMENT part β_K·(x̄_R − x̄_K) (returned lines simply
    order different quantities) and the residual COEFFICIENT part
    (returned lines are priced differently AT the same quantity) —
    the canonical two-group audit for "is this segment different
    because of its mix or its treatment" (pay-gap studies, churn-
    cohort revenue, refund abuse).

    Engine-exact: per-group OLS from integer-cents sums (products
    lifted to DECIMAL(38,0) before n·Σxy — the r8 rule; scale-0
    DECIMAL→DOUBLE is a plain int128 round-to-nearest on both
    engines); the close is ONE shared IEEE expression string.

    Scale: one two-group agg over the facts; close on 1 row."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").alias("is_a"),
        F.expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)").alias("x"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias("y"),
    )
    g = li.groupBy("is_a").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * y")).cast("decimal(38,0)").alias("sxy"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * x")).cast("decimal(38,0)").alias("sxx"),
    )
    a = g.where("is_a").select(
        F.col("n").alias("n_a"),
        F.col("sx").alias("sx_a"),
        F.col("sy").alias("sy_a"),
        F.col("sxy").alias("sxy_a"),
        F.col("sxx").alias("sxx_a"),
    )
    b = g.where("NOT is_a").select(
        F.col("n").alias("n_b"),
        F.col("sx").alias("sx_b"),
        F.col("sy").alias("sy_b"),
        F.col("sxy").alias("sxy_b"),
        F.col("sxx").alias("sxx_b"),
    )
    wide = a.crossJoin(b)
    return wide.selectExpr(
        "n_a", "n_b", *[e for e in _OAXACA_CLOSE.strip().split(",\n  ")]
    )


# Units: x, y are e2 integers (·100), so β = Δy_e2/Δx_e2 is already
# $/unit-qty; the /100 in gap/explained converts cents → dollars
# (β·Δx̄_e2 is in cents). The property test recomputes all five.
OAXACA_SQL = f"""
WITH li AS (
  SELECT (l_returnflag = 'R') AS is_a,
         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
  FROM lineitem
),
g AS (
  SELECT is_a, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS DECIMAL(38,0)) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS DECIMAL(38,0)) AS sxx
  FROM li GROUP BY 1
),
a AS (SELECT n AS n_a, sx AS sx_a, sy AS sy_a, sxy AS sxy_a, sxx AS sxx_a FROM g WHERE is_a),
b AS (SELECT n AS n_b, sx AS sx_b, sy AS sy_b, sxy AS sxy_b, sxx AS sxx_b FROM g WHERE NOT is_a)
SELECT n_a, n_b,
{_OAXACA_CLOSE}
FROM a, b
"""

QUERIES["lineitem_oaxaca_blinder"] = lineitem_oaxaca_blinder
ORACLE["lineitem_oaxaca_blinder"] = OAXACA_SQL


# ---------------------------------------------------------------------------
# orders_shift_share — shift-share growth decomposition (round 10)
# ---------------------------------------------------------------------------


def orders_shift_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shift-share decomposition of 1996→1999 revenue growth per
    customer nation: each (nation, mktsegment) cell's growth splits
    into a NATIONAL component (cell base revenue × economy-wide
    growth), a MIX component (× segment growth minus economy growth —
    was the nation in fast- or slow-growing segments?), and a
    COMPETITIVE component (× cell growth minus segment growth — did
    the nation out- or under-perform its segments?). The regional-
    economics classic (Dunn 1960), and the bireme-warehouse answer to
    "is this nation growing because of its portfolio or its
    execution".

    Engine-exact: period revenues are DECIMAL-exact o_totalprice
    sums; the three growth rates are one IEEE division each of
    exact-decimal doubles, and every per-cell component is
    FLOOR-quantized to integer cents BEFORE the per-nation sum (Σ of
    6dp doubles across shuffled cells is order-dependent; Σ of
    integers is not — the round-10 per-frequency rule).

    Scale: orders filtered to two years joins customer on custkey
    (AQE-sized shuffle; customer scales with SF so no broadcast
    hint), nation broadcast; everything after the first agg runs on
    |nations|×|segments| ≤ 125 cells."""
    o = (
        load_table(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey"),
            F.year("o_orderdate").alias("yr"),
            money("o_totalprice").alias("rev"),
        )
        .where(F.col("yr").isin(1996, 1999))
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment"
    )
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_mktsegment")
        .agg(
            F.sum(F.when(F.col("yr") == 1996, F.col("rev"))).alias("r0"),
            F.sum(F.when(F.col("yr") == 1999, F.col("rev"))).alias("r1"),
        )
        .where(F.col("r0").isNotNull() & (F.col("r0") > 0) & F.col("r1").isNotNull())
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wseg = Window.partitionBy("c_mktsegment").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r0d = F.col("r0").cast("double")
    r1d = F.col("r1").cast("double")
    g_nat = (
        F.sum("r1").over(wall).cast("double") - F.sum("r0").over(wall).cast("double")
    ) / F.sum("r0").over(wall).cast("double")
    g_seg = (
        F.sum("r1").over(wseg).cast("double") - F.sum("r0").over(wseg).cast("double")
    ) / F.sum("r0").over(wseg).cast("double")
    g_cell = (r1d - r0d) / r0d
    comp = cells.select(
        "n_name",
        F.col("r0"),
        F.col("r1"),
        F.floor(r0d * g_nat * F.lit(100)).cast("bigint").alias("nat_c2"),
        F.floor(r0d * (g_seg - g_nat) * F.lit(100)).cast("bigint").alias("mix_c2"),
        F.floor(r0d * (g_cell - g_seg) * F.lit(100)).cast("bigint").alias("comp_c2"),
    )
    return (
        comp.groupBy("n_name")
        .agg(
            (F.sum("r0") * 100).cast("bigint").alias("rev_1996_cents"),
            (F.sum("r1") * 100).cast("bigint").alias("rev_1999_cents"),
            F.sum("nat_c2").cast("bigint").alias("national_cents"),
            F.sum("mix_c2").cast("bigint").alias("segment_mix_cents"),
            F.sum("comp_c2").cast("bigint").alias("competitive_cents"),
        )
        .orderBy("n_name")
    )


SHIFT_SHARE_SQL = """
WITH cells AS (
  SELECT n_name, c_mktsegment,
         SUM(CASE WHEN CAST(year(o_orderdate) AS INTEGER) = 1996
                  THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS r0,
         SUM(CASE WHEN CAST(year(o_orderdate) AS INTEGER) = 1999
                  THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS r1
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  WHERE CAST(year(o_orderdate) AS INTEGER) IN (1996, 1999)
  GROUP BY 1, 2
),
f AS (
  SELECT * FROM cells WHERE r0 IS NOT NULL AND r0 > 0 AND r1 IS NOT NULL
),
g AS (
  SELECT n_name, c_mktsegment,
         CAST(r0 AS DOUBLE) AS r0d, CAST(r1 AS DOUBLE) AS r1d, r0, r1,
         (CAST(SUM(r1) OVER () AS DOUBLE) - CAST(SUM(r0) OVER () AS DOUBLE))
           / CAST(SUM(r0) OVER () AS DOUBLE) AS g_nat,
         (CAST(SUM(r1) OVER (PARTITION BY c_mktsegment) AS DOUBLE)
          - CAST(SUM(r0) OVER (PARTITION BY c_mktsegment) AS DOUBLE))
           / CAST(SUM(r0) OVER (PARTITION BY c_mktsegment) AS DOUBLE) AS g_seg
  FROM f
)
SELECT n_name,
       CAST(SUM(r0) * 100 AS BIGINT) AS rev_1996_cents,
       CAST(SUM(r1) * 100 AS BIGINT) AS rev_1999_cents,
       CAST(SUM(CAST(FLOOR(r0d * g_nat * 100) AS BIGINT)) AS BIGINT) AS national_cents,
       CAST(SUM(CAST(FLOOR(r0d * (g_seg - g_nat) * 100) AS BIGINT)) AS BIGINT) AS segment_mix_cents,
       CAST(SUM(CAST(FLOOR(r0d * ((r1d - r0d) / r0d - g_seg) * 100) AS BIGINT)) AS BIGINT) AS competitive_cents
FROM g
GROUP BY 1
ORDER BY 1
"""

QUERIES["orders_shift_share"] = orders_shift_share
ORACLE["orders_shift_share"] = SHIFT_SHARE_SQL


# ---------------------------------------------------------------------------
# lineitem_tukey_hsd — Tukey-Kramer post-hoc pairwise comparisons (round 10)
# ---------------------------------------------------------------------------


def lineitem_tukey_hsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-Kramer HSD post-hoc pairwise comparisons of mean
    l_quantity across the three l_returnflag groups — the step AFTER
    lineitem_anova_f rejects "all equal": WHICH pairs differ, with
    the studentized-range statistic q = |mean_i − mean_j| /
    sqrt((MSW/2)(1/n_i + 1/n_j)) against the fixed k=3, df=∞, α=.05
    critical value 3.314.

    Engine-exact: per-group n/Σq/Σq² are DECIMAL-exact (quantity is
    2dp-bounded); each group's within-SS collapses to an integer
    (FLOOR·1e3) BEFORE the cross-group sum (order-independent per the
    house per-group quantization rule), and the q statistic is one
    IEEE chain of exact inputs with a single one-shot 6dp round
    (smooth sqrt — measure-zero tie risk).

    Scale: ONE map-side-combined agg over lineitem to 3 rows; the
    pair formation is a 3×3 self-join on the driver-free 3-row
    frame. Σq² stays under 2^53 scale-adjusted through sf1; beyond,
    pre-downscale deviations per the Mahalanobis rule."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_quantity").cast("decimal(9,2)").alias("q")
    )
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("q").alias("sq"),
        F.sum(F.col("q") * F.col("q")).alias("sq2"),
    )
    nd = F.col("n").cast("double")
    ssw_e3 = F.floor(
        (
            F.col("sq2").cast("double")
            - F.col("sq").cast("double") * F.col("sq").cast("double") / nd
        )
        * F.lit(1000)
    ).cast("bigint")
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per = g.select(
        "l_returnflag",
        "n",
        (F.col("sq").cast("double") / nd).alias("mean"),
        F.sum(ssw_e3).over(wall).cast("bigint").alias("ssw_tot_e3"),
        F.sum("n").over(wall).cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("k"),
    )
    a = per.select(
        F.col("l_returnflag").alias("flag_a"),
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"),
        "ssw_tot_e3",
        "n_tot",
        "k",
    )
    b = per.select(
        F.col("l_returnflag").alias("flag_b"),
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"),
    )
    msw = (
        F.col("ssw_tot_e3").cast("double")
        / F.lit(1000)
        / (F.col("n_tot") - F.col("k")).cast("double")
    )
    q_stat = F.round(
        F.abs(F.col("mean_a") - F.col("mean_b"))
        / F.sqrt(
            msw / F.lit(2)
            * (F.lit(1) / F.col("n_a").cast("double") + F.lit(1) / F.col("n_b").cast("double"))
        ),
        6,
    )
    return (
        a.join(b, F.col("flag_a") < F.col("flag_b"))
        .select(
            "flag_a",
            "flag_b",
            "n_a",
            "n_b",
            F.round("mean_a", 6).alias("mean_a"),
            F.round("mean_b", 6).alias("mean_b"),
            q_stat.alias("q_stat"),
            (q_stat > F.expr("CAST(3.314 AS DOUBLE)")).cast("int").alias("significant"),
        )
        .orderBy("flag_a", "flag_b")
    )


TUKEY_HSD_SQL = """
WITH li AS (
  SELECT l_returnflag, CAST(l_quantity AS DECIMAL(9,2)) AS q FROM lineitem
),
g AS (
  SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(q) AS sq, SUM(q * q) AS sq2
  FROM li GROUP BY 1
),
per AS (
  SELECT l_returnflag, n,
         CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
         CAST(SUM(CAST(FLOOR((CAST(sq2 AS DOUBLE)
               - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)) * 1000)
             AS BIGINT)) OVER () AS BIGINT) AS ssw_tot_e3,
         CAST(SUM(n) OVER () AS BIGINT) AS n_tot,
         CAST(COUNT(*) OVER () AS BIGINT) AS k
  FROM g
),
pairs AS (
  SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b,
         a.n AS n_a, b.n AS n_b, a.mean AS mean_a, b.mean AS mean_b,
         a.ssw_tot_e3, a.n_tot, a.k
  FROM per a JOIN per b ON a.l_returnflag < b.l_returnflag
)
SELECT flag_a, flag_b, n_a, n_b,
       ROUND(mean_a, 6) AS mean_a, ROUND(mean_b, 6) AS mean_b,
       ROUND(ABS(mean_a - mean_b)
             / SQRT(CAST(ssw_tot_e3 AS DOUBLE) / 1000
                    / CAST(n_tot - k AS DOUBLE) / 2
                    * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6) AS q_stat,
       CAST(ROUND(ABS(mean_a - mean_b)
             / SQRT(CAST(ssw_tot_e3 AS DOUBLE) / 1000
                    / CAST(n_tot - k AS DOUBLE) / 2
                    * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE))), 6)
            > CAST(3.314 AS DOUBLE) AS INTEGER) AS significant
FROM pairs
ORDER BY flag_a, flag_b
"""

QUERIES["lineitem_tukey_hsd"] = lineitem_tukey_hsd
ORACLE["lineitem_tukey_hsd"] = TUKEY_HSD_SQL


# ---------------------------------------------------------------------------
# orders_vintage_analysis — cohort fill-rate curves (round 10)
# ---------------------------------------------------------------------------


def orders_vintage_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vintage analysis of order fulfilment: for each order-month
    cohort ("vintage"), the cumulative share of the cohort's
    lineitems shipped by month-age — the loan-book vintage-curve
    idiom applied to a warehouse ("are newer cohorts shipping
    slower?"). Complements lineitem_shipping_sla (per-item lag
    percentiles) with the cohort-maturation view.

    Engine-exact: pure integer counts; the fill share is integer ppm
    via DIV. Month age is calendar arithmetic on year()/month()
    integers — no timestamp subtraction, no timezone exposure.

    Scale: lineitem→orders joins on the natural l_orderkey (AQE
    shuffle), collapses map-side to (vintage, age) cells — ≤ 80
    months × handful of ages — then windows run cell-sized."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("vintage"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("om"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("sm"),
    )
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select("vintage", (F.col("sm") - F.col("om")).cast("int").alias("age"))
        .groupBy("vintage", "age")
        .agg(F.count(F.lit(1)).cast("bigint").alias("shipped"))
    )
    wv = Window.partitionBy("vintage").orderBy("age")
    wtot = Window.partitionBy("vintage").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        cells.select(
            "vintage",
            "age",
            "shipped",
            F.sum("shipped").over(wv).cast("bigint").alias("cum_shipped"),
            F.sum("shipped").over(wtot).cast("bigint").alias("cohort_total"),
        )
        .select(
            "vintage",
            "age",
            "shipped",
            "cum_shipped",
            F.expr("CAST(cum_shipped * 1000000 DIV cohort_total AS BIGINT)").alias(
                "fill_ppm"
            ),
        )
        .orderBy("vintage", "age")
    )


VINTAGE_SQL = """
WITH cells AS (
  SELECT strftime(o_orderdate, '%Y-%m') AS vintage,
         CAST((CAST(year(l_shipdate) AS INTEGER) * 12 + CAST(month(l_shipdate) AS INTEGER))
            - (CAST(year(o_orderdate) AS INTEGER) * 12 + CAST(month(o_orderdate) AS INTEGER))
            AS INTEGER) AS age,
         CAST(COUNT(*) AS BIGINT) AS shipped
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  GROUP BY 1, 2
)
SELECT vintage, age, shipped,
       CAST(SUM(shipped) OVER (PARTITION BY vintage ORDER BY age) AS BIGINT) AS cum_shipped,
       CAST(CAST(SUM(shipped) OVER (PARTITION BY vintage ORDER BY age) AS BIGINT) * 1000000
            // CAST(SUM(shipped) OVER (PARTITION BY vintage) AS BIGINT) AS BIGINT) AS fill_ppm
FROM cells
ORDER BY vintage, age
"""

QUERIES["orders_vintage_analysis"] = orders_vintage_analysis
ORACLE["orders_vintage_analysis"] = VINTAGE_SQL


# ---------------------------------------------------------------------------
# nations_meta_analysis — Cochran's Q / I² / DerSimonian-Laird τ² (round 10)
# ---------------------------------------------------------------------------


def nations_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Meta-analysis of one per-nation "study" each: the effect is
    the mean order-value gap between high-priority (1-URGENT/2-HIGH)
    and low-priority orders, and the question is whether nations
    agree — Cochran's Q heterogeneity test, the I² share of variance
    that is BETWEEN-nation rather than sampling noise, and the
    DerSimonian-Laird random-effects τ². The cross-entity
    effect-pooling idiom (every experimentation platform's
    "is the treatment effect consistent across markets").

    Engine-exact: per-nation sufficient statistics are integer cents
    and DECIMAL(38,0) cents² (variance via the (nΣx²−(Σx)²) DIV
    (n(n−1)) integer quantization); inverse-variance weights are
    FLOOR-quantized at 1e12 and effects at cents, so the pooled mean,
    Q, I² and τ² are integer/DIV arithmetic with one IEEE close —
    no order-dependent float sum anywhere. At 100 TB the cents²
    products need the in-plan DIV-k downscale (Mahalanobis rule);
    they hold through sf1 as-is.

    Scale: one conditional agg over orders⋈customer (AQE shuffle) to
    ≤25 nation rows; everything else is window math on those rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr(
            "CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)"
        ).alias("cents"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("hi"),
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    x18 = F.expr("CAST(cents AS DECIMAL(18,0))")
    g = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.when(F.col("hi"), 1).otherwise(0)).cast("bigint").alias("n_hi"),
            F.sum(F.when(~F.col("hi"), 1).otherwise(0)).cast("bigint").alias("n_lo"),
            F.sum(F.when(F.col("hi"), F.col("cents"))).cast("bigint").alias("sx_hi"),
            F.sum(F.when(~F.col("hi"), F.col("cents"))).cast("bigint").alias("sx_lo"),
            F.sum(F.when(F.col("hi"), x18 * x18)).cast("decimal(38,0)").alias("sxx_hi"),
            F.sum(F.when(~F.col("hi"), x18 * x18)).cast("decimal(38,0)").alias("sxx_lo"),
        )
        .where((F.col("n_hi") > 1) & (F.col("n_lo") > 1))
    )
    per = g.select(
        "n_name",
        "n_hi",
        "n_lo",
        F.expr(
            "(CAST(sx_hi AS DOUBLE) / CAST(n_hi AS DOUBLE)"
            " - CAST(sx_lo AS DOUBLE) / CAST(n_lo AS DOUBLE)) / 100"
        ).alias("theta_d"),
        F.expr(
            "CAST((CAST(n_hi AS DECIMAL(38,0)) * sxx_hi"
            "  - CAST(sx_hi AS DECIMAL(38,0)) * CAST(sx_hi AS DECIMAL(38,0)))"
            " DIV (CAST(n_hi AS DECIMAL(38,0)) * CAST(n_hi - 1 AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ).alias("s2hi_c4"),
        F.expr(
            "CAST((CAST(n_lo AS DECIMAL(38,0)) * sxx_lo"
            "  - CAST(sx_lo AS DECIMAL(38,0)) * CAST(sx_lo AS DECIMAL(38,0)))"
            " DIV (CAST(n_lo AS DECIMAL(38,0)) * CAST(n_lo - 1 AS DECIMAL(38,0)))"
            " AS BIGINT)"
        ).alias("s2lo_c4"),
    ).select(
        "n_name",
        "n_hi",
        "n_lo",
        "theta_d",
        F.expr(
            "CAST(s2hi_c4 AS DOUBLE) / 10000 / CAST(n_hi AS DOUBLE)"
            " + CAST(s2lo_c4 AS DOUBLE) / 10000 / CAST(n_lo AS DOUBLE)"
        ).alias("var_theta"),
    ).select(
        "n_name",
        "n_hi",
        "n_lo",
        "theta_d",
        "var_theta",
        F.expr("CAST(FLOOR(1000000000000 / var_theta) AS BIGINT)").alias("w_e12"),
        F.expr("CAST(FLOOR(theta_d * 100) AS BIGINT)").alias("th_c2"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sw = F.sum(F.expr("CAST(w_e12 AS DECIMAL(38,0))")).over(wall)
    swt = F.sum(F.expr("CAST(w_e12 AS DECIMAL(38,0)) * CAST(th_c2 AS DECIMAL(38,0))")).over(wall)
    sww = F.sum(
        F.expr("CAST(w_e12 AS DECIMAL(38,0)) * CAST(w_e12 AS DECIMAL(38,0))")
    ).over(wall)
    k = F.count(F.lit(1)).over(wall).cast("bigint")
    pooled = per.select(
        "n_name",
        "n_hi",
        "n_lo",
        F.round("theta_d", 6).alias("theta"),
        F.round(F.sqrt("var_theta"), 6).alias("se_theta"),
        F.expr("CAST(w_e12 AS DECIMAL(38,0))").alias("w38"),
        "w_e12",
        "th_c2",
        sw.alias("sw"),
        swt.alias("swt"),
        sww.alias("sww"),
        k.alias("k"),
    ).select(
        "n_name",
        "n_hi",
        "n_lo",
        "theta",
        "se_theta",
        F.expr("CAST(w_e12 * 1000000 DIV CAST(sw AS BIGINT) AS BIGINT)").alias(
            "weight_ppm"
        ),
        "w38",
        "th_c2",
        "sw",
        "sww",
        "k",
        F.expr("CAST(swt DIV sw AS BIGINT)").alias("thbar_c2"),
    )
    qterm = F.expr(
        "w38 * CAST(th_c2 - thbar_c2 AS DECIMAL(38,0))"
        " * CAST(th_c2 - thbar_c2 AS DECIMAL(38,0))"
    )
    q_e4 = F.expr("CAST(q_scaled DIV 1000000000000 AS BIGINT)")
    final = pooled.withColumn("q_scaled", F.sum(qterm).over(wall)).withColumn(
        "q_e4", q_e4
    )
    # DL denominator C = Σw − Σw²/Σw, in e12 units (integer)
    c_e12 = F.expr("CAST(sw - sww DIV sw AS BIGINT)")
    return final.select(
        "n_name",
        "n_hi",
        "n_lo",
        "theta",
        "se_theta",
        "weight_ppm",
        F.expr("CAST(q_e4 AS DOUBLE) / 10000").alias("q_stat"),
        F.expr(
            "CAST(GREATEST(0, q_e4 - (k - 1) * 10000) * 1000000"
            " DIV GREATEST(q_e4, 1) AS BIGINT)"
        ).alias("i2_ppm"),
        F.round(
            F.expr("GREATEST(CAST(0 AS DOUBLE), CAST(q_e4 AS DOUBLE) / 10000"
                   " - CAST(k - 1 AS DOUBLE))")
            * F.lit(1000000000000).cast("double")
            / c_e12.cast("double"),
            6,
        ).alias("tau2"),
    ).orderBy("n_name")


META_ANALYSIS_SQL = """
WITH o AS (
  SELECT o_custkey,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         o_orderpriority IN ('1-URGENT', '2-HIGH') AS hi
  FROM orders
),
g AS (
  SELECT n_name,
         CAST(SUM(CASE WHEN hi THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
         CAST(SUM(CASE WHEN NOT hi THEN 1 ELSE 0 END) AS BIGINT) AS n_lo,
         CAST(SUM(CASE WHEN hi THEN cents END) AS BIGINT) AS sx_hi,
         CAST(SUM(CASE WHEN NOT hi THEN cents END) AS BIGINT) AS sx_lo,
         SUM(CASE WHEN hi THEN CAST(cents AS HUGEINT) * cents END) AS sxx_hi,
         SUM(CASE WHEN NOT hi THEN CAST(cents AS HUGEINT) * cents END) AS sxx_lo
  FROM o
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY 1
  HAVING n_hi > 1 AND n_lo > 1
),
per AS (
  SELECT n_name, n_hi, n_lo,
         (CAST(sx_hi AS DOUBLE) / CAST(n_hi AS DOUBLE)
          - CAST(sx_lo AS DOUBLE) / CAST(n_lo AS DOUBLE)) / 100 AS theta_d,
         CAST((CAST(n_hi AS HUGEINT) * sxx_hi
               - CAST(sx_hi AS HUGEINT) * sx_hi)
              // (CAST(n_hi AS HUGEINT) * (n_hi - 1)) AS BIGINT) AS s2hi_c4,
         CAST((CAST(n_lo AS HUGEINT) * sxx_lo
               - CAST(sx_lo AS HUGEINT) * sx_lo)
              // (CAST(n_lo AS HUGEINT) * (n_lo - 1)) AS BIGINT) AS s2lo_c4
  FROM g
),
w AS (
  SELECT n_name, n_hi, n_lo, theta_d,
         CAST(s2hi_c4 AS DOUBLE) / 10000 / CAST(n_hi AS DOUBLE)
         + CAST(s2lo_c4 AS DOUBLE) / 10000 / CAST(n_lo AS DOUBLE) AS var_theta
  FROM per
),
qw AS (
  SELECT n_name, n_hi, n_lo, theta_d, var_theta,
         CAST(FLOOR(1000000000000 / var_theta) AS BIGINT) AS w_e12,
         CAST(FLOOR(theta_d * 100) AS BIGINT) AS th_c2
  FROM w
),
pooled AS (
  SELECT n_name, n_hi, n_lo, theta_d, var_theta, w_e12, th_c2,
         SUM(CAST(w_e12 AS HUGEINT)) OVER () AS sw,
         SUM(CAST(w_e12 AS HUGEINT) * th_c2) OVER () AS swt,
         SUM(CAST(w_e12 AS HUGEINT) * w_e12) OVER () AS sww,
         CAST(COUNT(*) OVER () AS BIGINT) AS k
  FROM qw
),
cent AS (
  SELECT *, CAST(swt // sw AS BIGINT) AS thbar_c2 FROM pooled
),
fin AS (
  SELECT *,
         SUM(CAST(w_e12 AS HUGEINT)
             * CAST(th_c2 - thbar_c2 AS HUGEINT)
             * CAST(th_c2 - thbar_c2 AS HUGEINT)) OVER () AS q_scaled
  FROM cent
)
SELECT n_name, n_hi, n_lo,
       ROUND(theta_d, 6) AS theta,
       ROUND(SQRT(var_theta), 6) AS se_theta,
       CAST(w_e12 * 1000000 // CAST(sw AS BIGINT) AS BIGINT) AS weight_ppm,
       CAST(CAST(q_scaled // 1000000000000 AS BIGINT) AS DOUBLE) / 10000 AS q_stat,
       CAST(GREATEST(0, CAST(q_scaled // 1000000000000 AS BIGINT) - (k - 1) * 10000)
            * 1000000 // GREATEST(CAST(q_scaled // 1000000000000 AS BIGINT), 1)
            AS BIGINT) AS i2_ppm,
       ROUND(GREATEST(CAST(0 AS DOUBLE),
                      CAST(CAST(q_scaled // 1000000000000 AS BIGINT) AS DOUBLE) / 10000
                      - CAST(k - 1 AS DOUBLE))
             * CAST(1000000000000 AS DOUBLE)
             / CAST(CAST(sw - sww // sw AS BIGINT) AS DOUBLE), 6) AS tau2
FROM fin
ORDER BY n_name
"""

QUERIES["nations_meta_analysis"] = nations_meta_analysis
ORACLE["nations_meta_analysis"] = META_ANALYSIS_SQL


# ---------------------------------------------------------------------------
# customers_cox_regression — Cox proportional hazards, Newton on the
# Breslow partial likelihood (round 10)
# ---------------------------------------------------------------------------


def customers_cox_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cox (1972) proportional-hazards regression of the customer
    repurchase hazard on a binary covariate (BUILDING market segment
    vs rest), the survival-REGRESSION step beyond the repo's KM /
    Nelson-Aalen / competing-risks curve estimators: β̂ maximizes the
    Breslow partial likelihood; emits the hazard ratio e^β, its SE
    from the observed information, and the Wald z. Durations are the
    same repurchase spans as customers_survival_km (gap to next order
    = event; gap to corpus end = censored).

    Engine-exact: the likelihood collapses to the (t, x) duration
    histogram (d_x events, a_x entries per day); risk sets are suffix
    sums. Each Newton step's score/information terms are INTEGER
    rationals in eb_e6 = FLOOR(exp(β)·1e6) — one transcendental per
    iteration, quantized ONCE so per-term math cannot split — with
    positive-operand integer division only (// vs DIV negative
    semantics never reached); β is FLOOR-quantized at 1e9 per step.
    Spark folds the 4 Newton steps over the histogram in ONE Arrow
    batch with Python bigints (no overflow at any SF); the oracle
    runs the same integers through chained MATERIALIZED CTEs in
    HUGEINT. The I-term product d·n1·eb·n0·1e12 holds in HUGEINT
    through sf1×100; beyond, downscale risk counts in-plan (DIV k).

    Scale: the only data-sized work is the spans window (shuffle on
    custkey) and the histogram agg; the sequential part touches a
    ≤|days|×2 model frame, never rows."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_mktsegment") == "BUILDING").alias("x")
    )
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    spans = (
        o.withColumn("nxt", F.lead("o_orderdate").over(w))
        .crossJoin(F.broadcast(horizon))
        .join(cust, o.o_custkey == cust.c_custkey)
        .select(
            F.when(
                F.col("nxt").isNotNull(), F.datediff("nxt", "o_orderdate")
            ).otherwise(F.datediff("h", "o_orderdate")).alias("t"),
            F.col("nxt").isNotNull().alias("is_event"),
            "x",
        )
        .where(F.col("t") > 0)
    )
    hist = spans.groupBy("t", "x").agg(
        F.sum(F.when(F.col("is_event"), 1).otherwise(0)).cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("a"),
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        pdf = pdf.sort_values(["t", "x"])
        ts = sorted(pdf["t"].unique())
        d1 = {}; d0 = {}; a1 = {}; a0 = {}
        for r in pdf.itertuples():
            (d1 if r.x else d0)[r.t] = int(r.d)
            (a1 if r.x else a0)[r.t] = int(r.a)
        n1 = sum(a1.values()); n0 = sum(a0.values())
        n1_total, n0_total = n1, n0
        cells = []  # (d, d1, n1_at_risk, n0_at_risk) per event time
        r1, r0 = n1, n0
        for t in ts:
            dd1, dd0 = d1.get(t, 0), d0.get(t, 0)
            if dd1 + dd0 > 0:
                cells.append((dd1 + dd0, dd1, r1, r0))
            r1 -= a1.get(t, 0)
            r0 -= a0.get(t, 0)
        be9 = 0
        u_e6 = i_e6 = 0
        for _ in range(4):
            eb = int(math.floor(math.exp(be9 / 1e9) * 1_000_000))
            u_e6 = 0
            i_e6 = 0
            for d, dd1, rr1, rr0 in cells:
                denom = rr1 * eb + rr0 * 1_000_000
                u_e6 += dd1 * 1_000_000 - (d * rr1 * eb * 1_000_000) // denom
                i_e6 += (d * rr1 * eb * rr0 * 1_000_000 * 1_000_000) // (
                    denom * denom
                )
            be9 = int(math.floor((be9 / 1e9 + u_e6 / i_e6) * 1e9))
        beta = be9 / 1e9
        se = 1000.0 / math.sqrt(i_e6)
        return pd.DataFrame(
            {
                "n_event_times": [len(cells)],
                "n_events": [sum(c[0] for c in cells)],
                "n_treated": [n1_total],
                "n_control": [n0_total],
                "beta": [beta],
                "hazard_ratio": [round(math.exp(beta), 6)],
                "se": [round(se, 6)],
                "wald_z": [round(beta / se, 6)],
            }
        )

    schema = (
        "n_event_times bigint, n_events bigint, n_treated bigint,"
        " n_control bigint, beta double, hazard_ratio double,"
        " se double, wald_z double"
    )
    return hist.withColumn("g", F.lit(1)).groupBy("g").applyInPandas(fold, schema)


COX_REGRESSION_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS nxt
  FROM orders
),
spans AS (
  SELECT CASE WHEN nxt IS NOT NULL
              THEN datediff('day', o_orderdate, nxt)
              ELSE datediff('day', o_orderdate, (SELECT MAX(o_orderdate) FROM orders)) END AS t,
         nxt IS NOT NULL AS is_event,
         c_mktsegment = 'BUILDING' AS x
  FROM o JOIN customer ON c_custkey = o_custkey
),
spans_f AS (SELECT * FROM spans WHERE t > 0),
hist AS (
  SELECT t, x,
         CAST(SUM(CASE WHEN is_event THEN 1 ELSE 0 END) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS a
  FROM spans_f GROUP BY 1, 2
),
bytime AS (
  SELECT t,
         CAST(SUM(CASE WHEN x THEN a ELSE 0 END) AS BIGINT) AS a1,
         CAST(SUM(CASE WHEN NOT x THEN a ELSE 0 END) AS BIGINT) AS a0,
         CAST(SUM(CASE WHEN x THEN d ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(d) AS BIGINT) AS d
  FROM hist GROUP BY 1
),
risk AS (
  SELECT t, d, d1,
         CAST(SUM(a1) OVER (ORDER BY t DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n1,
         CAST(SUM(a0) OVER (ORDER BY t DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n0
  FROM bytime
),
cells AS MATERIALIZED (SELECT * FROM risk WHERE d > 0),
tot AS MATERIALIZED (
  SELECT CAST(SUM(CASE WHEN x THEN a ELSE 0 END) AS BIGINT) AS n1_total,
         CAST(SUM(CASE WHEN NOT x THEN a ELSE 0 END) AS BIGINT) AS n0_total
  FROM hist
),
it0 AS (SELECT CAST(0 AS BIGINT) AS be9),
eb1 AS (SELECT CAST(FLOOR(exp(CAST(be9 AS DOUBLE) / 1e9) * 1000000) AS BIGINT) AS eb, be9 FROM it0),
s1 AS MATERIALIZED (
  SELECT e.be9, e.eb,
         SUM(d1 * 1000000
             - (CAST(d AS HUGEINT) * n1 * e.eb * 1000000)
               // (CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000)) AS u,
         SUM((CAST(d AS HUGEINT) * n1 * e.eb * n0 * 1000000 * 1000000)
             // ((CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000)
                * (CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000))) AS i
  FROM cells, eb1 e GROUP BY 1, 2
),
it1 AS (SELECT CAST(FLOOR((CAST(be9 AS DOUBLE) / 1e9 + CAST(u AS DOUBLE) / CAST(i AS DOUBLE)) * 1e9) AS BIGINT) AS be9 FROM s1),
eb2 AS (SELECT CAST(FLOOR(exp(CAST(be9 AS DOUBLE) / 1e9) * 1000000) AS BIGINT) AS eb, be9 FROM it1),
s2 AS MATERIALIZED (
  SELECT e.be9, e.eb,
         SUM(d1 * 1000000
             - (CAST(d AS HUGEINT) * n1 * e.eb * 1000000)
               // (CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000)) AS u,
         SUM((CAST(d AS HUGEINT) * n1 * e.eb * n0 * 1000000 * 1000000)
             // ((CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000)
                * (CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000))) AS i
  FROM cells, eb2 e GROUP BY 1, 2
),
it2 AS (SELECT CAST(FLOOR((CAST(be9 AS DOUBLE) / 1e9 + CAST(u AS DOUBLE) / CAST(i AS DOUBLE)) * 1e9) AS BIGINT) AS be9 FROM s2),
eb3 AS (SELECT CAST(FLOOR(exp(CAST(be9 AS DOUBLE) / 1e9) * 1000000) AS BIGINT) AS eb, be9 FROM it2),
s3 AS MATERIALIZED (
  SELECT e.be9, e.eb,
         SUM(d1 * 1000000
             - (CAST(d AS HUGEINT) * n1 * e.eb * 1000000)
               // (CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000)) AS u,
         SUM((CAST(d AS HUGEINT) * n1 * e.eb * n0 * 1000000 * 1000000)
             // ((CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000)
                * (CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000))) AS i
  FROM cells, eb3 e GROUP BY 1, 2
),
it3 AS (SELECT CAST(FLOOR((CAST(be9 AS DOUBLE) / 1e9 + CAST(u AS DOUBLE) / CAST(i AS DOUBLE)) * 1e9) AS BIGINT) AS be9 FROM s3),
eb4 AS (SELECT CAST(FLOOR(exp(CAST(be9 AS DOUBLE) / 1e9) * 1000000) AS BIGINT) AS eb, be9 FROM it3),
s4 AS MATERIALIZED (
  SELECT e.be9, e.eb,
         SUM(d1 * 1000000
             - (CAST(d AS HUGEINT) * n1 * e.eb * 1000000)
               // (CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000)) AS u,
         SUM((CAST(d AS HUGEINT) * n1 * e.eb * n0 * 1000000 * 1000000)
             // ((CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000)
                * (CAST(n1 AS HUGEINT) * e.eb + CAST(n0 AS HUGEINT) * 1000000))) AS i
  FROM cells, eb4 e GROUP BY 1, 2
),
it4 AS (SELECT CAST(FLOOR((CAST(be9 AS DOUBLE) / 1e9 + CAST(u AS DOUBLE) / CAST(i AS DOUBLE)) * 1e9) AS BIGINT) AS be9,
               i AS i_e6 FROM s4)
SELECT CAST((SELECT COUNT(*) FROM cells) AS BIGINT) AS n_event_times,
       CAST((SELECT SUM(d) FROM cells) AS BIGINT) AS n_events,
       t.n1_total AS n_treated,
       t.n0_total AS n_control,
       CAST(f.be9 AS DOUBLE) / 1e9 AS beta,
       ROUND(exp(CAST(f.be9 AS DOUBLE) / 1e9), 6) AS hazard_ratio,
       ROUND(1000.0 / SQRT(CAST(f.i_e6 AS DOUBLE)), 6) AS se,
       ROUND((CAST(f.be9 AS DOUBLE) / 1e9)
             / (1000.0 / SQRT(CAST(f.i_e6 AS DOUBLE))), 6) AS wald_z
FROM it4 f, tot t
"""

QUERIES["customers_cox_regression"] = customers_cox_regression
ORACLE["customers_cox_regression"] = COX_REGRESSION_SQL


# ---------------------------------------------------------------------------
# lineitem_partial_correlation — three-variable partial correlations
# (round 10)
# ---------------------------------------------------------------------------


def lineitem_partial_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial correlations among extended price (x), net revenue
    y = round(x*(1-discount), 2) and discount (z) per return flag:
    each pairwise Pearson r plus the three partials r_xy.z, r_xz.y,
    r_yz.x. The classic SUPPRESSION demo on real money columns: the
    raw revenue-discount correlation is ~0 (price variance swamps
    it), but partialing price out exposes the near-deterministic
    negative discount effect (pr_yz_x -> -0.87) — the screen that
    separates a direct association from one masked by a confounder.
    NOTE the 2dp revenue rounding: DuckDB's decimal->decimal CAST
    TRUNCATES while Spark's rounds half-up — the oracle must spell
    ROUND(x, 2) (half-up on both) or every .xx5 tie splits.

    Engine-exact: sufficient statistics are SCALE-0 integers (cents
    for x and the 2dp-DECIMAL-rounded revenue, percent for z) summed
    as DECIMAL(38,0)/HUGEINT — a DECIMAL(38,4) sum here is the
    documented engine split (DuckDB divides the int128 by 10^s in
    binary, a double rounding that diverges 1 ulp from Java past
    2^53 and flipped a ROUND boundary at sf0.1); integer->double
    casts are single correctly-rounded conversions on BOTH engines
    at any magnitude. The closed-form combination then runs on those
    identical doubles with the identical expression shape; outputs
    are FLOOR-e6 integers (this fixture lands pr_yz.x within 1e-16
    of a .5e-6 ROUND tie at sf0.1 — the percent_rank lesson: ROUND
    tie SEMANTICS differ across engines even on identical doubles,
    FLOOR of identical doubles is bit-deterministic).

    Scale: one map-side-combinable agg to |flags| rows; no joins, no
    windows, no Python. Sums stay exact DECIMAL(38,0) through ~1e12
    rows; beyond, downscale cents in-plan (ratio-preserving DIV-k)."""
    li = load_table(spark, sf_dir, "lineitem")
    xc = F.expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
    yc = F.expr(
        "CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))"
        " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))"
        " AS DECIMAL(14,2)) * 100 AS BIGINT)"
    )
    zp = F.expr("CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)")
    b = li.select(
        "l_returnflag", xc.alias("x"), yc.alias("y"), zp.alias("z")
    )
    x18 = F.expr("CAST(x AS DECIMAL(18,0))")
    y18 = F.expr("CAST(y AS DECIMAL(18,0))")
    z18 = F.expr("CAST(z AS DECIMAL(18,0))")
    d38 = "decimal(38,0)"
    stats = b.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(d38)).alias("sx"),
        F.sum(F.col("y").cast(d38)).alias("sy"),
        F.sum(F.col("z").cast(d38)).alias("sz"),
        F.sum(x18 * x18).cast(d38).alias("sxx"),
        F.sum(y18 * y18).cast(d38).alias("syy"),
        F.sum(z18 * z18).cast(d38).alias("szz"),
        F.sum(x18 * y18).cast(d38).alias("sxy"),
        F.sum(x18 * z18).cast(d38).alias("sxz"),
        F.sum(y18 * z18).cast(d38).alias("syz"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sz = F.col("sz").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    szz = F.col("szz").cast("double")
    sxy = F.col("sxy").cast("double")
    sxz = F.col("sxz").cast("double")
    syz = F.col("syz").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    vz = n * szz - sz * sz
    rxy = (n * sxy - sx * sy) / F.sqrt(vx * vy)
    rxz = (n * sxz - sx * sz) / F.sqrt(vx * vz)
    ryz = (n * syz - sy * sz) / F.sqrt(vy * vz)
    pr_xy_z = (rxy - rxz * ryz) / F.sqrt((1 - rxz * rxz) * (1 - ryz * ryz))
    pr_xz_y = (rxz - rxy * ryz) / F.sqrt((1 - rxy * rxy) * (1 - ryz * ryz))
    pr_yz_x = (ryz - rxy * rxz) / F.sqrt((1 - rxy * rxy) * (1 - rxz * rxz))
    e6 = F.lit(1000000.0)
    return stats.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.floor(rxy * e6).cast("bigint").alias("r_xy_e6"),
        F.floor(rxz * e6).cast("bigint").alias("r_xz_e6"),
        F.floor(ryz * e6).cast("bigint").alias("r_yz_e6"),
        F.floor(pr_xy_z * e6).cast("bigint").alias("pr_xy_z_e6"),
        F.floor(pr_xz_y * e6).cast("bigint").alias("pr_xz_y_e6"),
        F.floor(pr_yz_x * e6).cast("bigint").alias("pr_yz_x_e6"),
    ).orderBy("l_returnflag")


PARTIAL_CORR_SQL = """
WITH base AS (
  SELECT l_returnflag,
         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
         -- ROUND, not CAST: DuckDB's decimal->decimal CAST TRUNCATES
         -- while Spark's rounds half-up; ROUND(x, 2) is half-up here too
         CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))), 2)
              * 100 AS BIGINT) AS y,
         CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS z
  FROM lineitem
),
stats AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(z AS HUGEINT)) AS sz,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy,
         SUM(CAST(z AS HUGEINT) * z) AS szz,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * z) AS sxz,
         SUM(CAST(y AS HUGEINT) * z) AS syz
  FROM base GROUP BY 1
),
r AS (
  SELECT l_returnflag, CAST(n AS BIGINT) AS n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
         (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
           / SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
         (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
           / SQRT((CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
  FROM stats
)
SELECT l_returnflag, n,
       CAST(FLOOR(rxy * CAST(1000000 AS DOUBLE)) AS BIGINT) AS r_xy_e6,
       CAST(FLOOR(rxz * CAST(1000000 AS DOUBLE)) AS BIGINT) AS r_xz_e6,
       CAST(FLOOR(ryz * CAST(1000000 AS DOUBLE)) AS BIGINT) AS r_yz_e6,
       CAST(FLOOR((rxy - rxz * ryz)
             / SQRT((CAST(1 AS DOUBLE) - rxz * rxz) * (CAST(1 AS DOUBLE) - ryz * ryz))
             * CAST(1000000 AS DOUBLE)) AS BIGINT) AS pr_xy_z_e6,
       CAST(FLOOR((rxz - rxy * ryz)
             / SQRT((CAST(1 AS DOUBLE) - rxy * rxy) * (CAST(1 AS DOUBLE) - ryz * ryz))
             * CAST(1000000 AS DOUBLE)) AS BIGINT) AS pr_xz_y_e6,
       CAST(FLOOR((ryz - rxy * rxz)
             / SQRT((CAST(1 AS DOUBLE) - rxy * rxy) * (CAST(1 AS DOUBLE) - rxz * rxz))
             * CAST(1000000 AS DOUBLE)) AS BIGINT) AS pr_yz_x_e6
FROM r
ORDER BY l_returnflag
"""

QUERIES["lineitem_partial_correlation"] = lineitem_partial_correlation
ORACLE["lineitem_partial_correlation"] = PARTIAL_CORR_SQL



# ---------------------------------------------------------------------------
# lineitem_heteroskedasticity_bp — Breusch-Pagan LM test on the price~qty
# OLS residuals (round 10)
# ---------------------------------------------------------------------------


def lineitem_heteroskedasticity_bp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Breusch-Pagan heteroskedasticity screen on the net-revenue-
    vs-discount regression (the diagnostic that tells you whether
    plain OLS standard errors can be trusted, and
    lineitem_clustered_se is needed): fit y=a+bx by OLS, regress the
    squared residuals on x, LM = n*R²_aux ~ χ²(1). With
    y = round(price*(1-disc), 2), the residual variance is
    (1-z)²·var(price) — it SHRINKS with discount by construction
    (LM ≈ 298 already at sf0.01, n-proportional), so the test fires
    at every tier — real structure, not a null placeholder (the
    price~qty pair is independent on this fixture; probed first,
    r9 rule).

    Engine-exact: stage 1 emits FLOOR-quantized integer coefficients
    (b_e6 cents/unit, a_e6 cents — trunc-DIV on both engines,
    negatives safe), broadcast back; each residual e_e6 = y*1e6 -
    a_e6 - b_e6*x is then EXACT integer arithmetic, squared in
    DECIMAL(38,0) and DIV-1e12 requantized to cents² before the aux
    sums (the per-group S² DIV n discipline — no order-dependent
    float anywhere). The aux R² closes on individually-double-cast
    sums, identical shape both engines, FLOOR-e6 emission (ROUND-tie
    immune). The χ² compare uses CAST(3.841 AS DOUBLE) (bare-literal
    rule).

    Scale: two data passes (stats agg, then residual agg with the
    1-row model broadcast-joined); Σu² ≈ n·cents⁴ holds in
    DECIMAL(38,0) through ~sf100; beyond, DIV-k downscale u in-plan."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)").alias("x"),
        F.expr(
            "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))"
            " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))), 2)"
            " * 100 AS BIGINT)"
        ).alias("y"),
    )
    d38 = "decimal(38,0)"
    x38 = F.expr("CAST(x AS DECIMAL(38,0))")
    y38 = F.expr("CAST(y AS DECIMAL(38,0))")
    s1 = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x38).cast(d38).alias("sx"),
        F.sum(y38).cast(d38).alias("sy"),
        F.sum(x38 * x38).cast(d38).alias("sxx"),
        F.sum(x38 * y38).cast(d38).alias("sxy"),
    ).select(
        "n",
        F.expr(
            "CAST((n * sxy - sx * sy) * 1000000 DIV (n * sxx - sx * sx)"
            " AS DECIMAL(38,0))"
        ).alias("b_e6"),
        "sx",
        "sy",
    ).select(
        "n",
        "b_e6",
        F.expr("CAST((sy * 1000000 - b_e6 * sx) DIV n AS DECIMAL(38,0))").alias("a_e6"),
    )
    r = li.crossJoin(F.broadcast(s1)).select(
        "n",
        "b_e6",
        "a_e6",
        F.expr("CAST(x AS DECIMAL(38,0))").alias("xd"),
        F.expr(
            "CAST(y AS DECIMAL(38,0)) * 1000000 - a_e6"
            " - b_e6 * CAST(x AS DECIMAL(38,0))"
        ).alias("e_e6"),
    ).select(
        "n",
        "b_e6",
        "a_e6",
        "xd",
        F.expr("CAST(e_e6 * e_e6 DIV 1000000000000 AS DECIMAL(38,0))").alias("u"),
    )
    aux = r.groupBy("n", "b_e6", "a_e6").agg(
        F.sum("xd").cast(d38).alias("sx"),
        F.sum("u").cast(d38).alias("su"),
        F.sum(F.expr("xd * xd")).cast(d38).alias("sxx"),
        F.sum(F.expr("xd * u")).cast(d38).alias("sxu"),
        F.sum(F.expr("u * u")).cast(d38).alias("suu"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    su = F.col("su").cast("double")
    sxx = F.col("sxx").cast("double")
    sxu = F.col("sxu").cast("double")
    suu = F.col("suu").cast("double")
    cov = n * sxu - sx * su
    vx = n * sxx - sx * sx
    vu = n * suu - su * su
    r2 = (cov * cov) / (vx * vu)
    return aux.select(
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST(b_e6 AS BIGINT)").alias("b_e6"),
        F.expr("CAST(a_e6 AS BIGINT)").alias("a_e6"),
        F.floor(r2 * F.lit(1000000.0)).cast("bigint").alias("r2_aux_e6"),
        F.floor(n * r2 * F.lit(1000000.0)).cast("bigint").alias("lm_e6"),
        (n * r2 > F.expr("CAST(3.841 AS DOUBLE)")).alias("heteroskedastic_5pct"),
    )


BP_HETERO_SQL = """
WITH li AS (
  SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
         -- ROUND, not CAST: DuckDB's decimal->decimal CAST truncates
         CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))), 2)
              * 100 AS BIGINT) AS y
  FROM lineitem
),
s1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
  FROM li
),
coef AS (
  SELECT n,
         (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx) AS b_e6,
         sx, sy
  FROM s1
),
coef2 AS (
  SELECT n, b_e6, (sy * 1000000 - b_e6 * sx) // n AS a_e6 FROM coef
),
res AS (
  SELECT c.n, c.b_e6, c.a_e6,
         CAST(l.x AS HUGEINT) AS xd,
         (CAST(l.y AS HUGEINT) * 1000000 - c.a_e6 - c.b_e6 * l.x)
           * (CAST(l.y AS HUGEINT) * 1000000 - c.a_e6 - c.b_e6 * l.x)
           // 1000000000000 AS u
  FROM li l CROSS JOIN coef2 c
),
aux AS (
  SELECT n, b_e6, a_e6,
         CAST(SUM(xd) AS HUGEINT) AS sx,
         CAST(SUM(u) AS HUGEINT) AS su,
         CAST(SUM(xd * xd) AS HUGEINT) AS sxx,
         CAST(SUM(xd * u) AS HUGEINT) AS sxu,
         CAST(SUM(u * u) AS HUGEINT) AS suu
  FROM res GROUP BY 1, 2, 3
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(b_e6 AS BIGINT) AS b_e6,
       CAST(a_e6 AS BIGINT) AS a_e6,
       CAST(FLOOR(((CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE)))
                  / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)))
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS r2_aux_e6,
       CAST(FLOOR(CAST(n AS DOUBLE)
                  * ((CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE)))
                  / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                     * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)))
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS lm_e6,
       CAST(n AS DOUBLE)
         * ((CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(sxu AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(su AS DOUBLE)))
         / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * (CAST(n AS DOUBLE) * CAST(suu AS DOUBLE) - CAST(su AS DOUBLE) * CAST(su AS DOUBLE)))
         > CAST(3.841 AS DOUBLE) AS heteroskedastic_5pct
FROM aux
"""

QUERIES["lineitem_heteroskedasticity_bp"] = lineitem_heteroskedasticity_bp
ORACLE["lineitem_heteroskedasticity_bp"] = BP_HETERO_SQL


# ---------------------------------------------------------------------------
# lineitem_cusum_of_squares — variance-stability structural break test
# (round 10)
# ---------------------------------------------------------------------------


def lineitem_cusum_of_squares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM-of-squares structural-break test on the daily revenue
    series (Brown–Durbin–Evans): C_t = Σ_{i<=t} x_i² / Σx² should
    track t/T under variance stability; the statistic is
    D = max_t |C_t − t/T| with the break located at the argmax. The
    variance sibling of orders_cusum_control (which watches the
    MEAN) — a fleet monitor alarms on this when a fat-tailed day mix
    appears even though the mean holds.

    Engine-exact: x_t is the exact daily cents sum; the deviation
    C_t − t/T is the cross-multiplied integer C_t_num·T − t·C_T
    (DECIMAL(38,0) — cents² cumulative ~2.4e21·T at sf1, n-bounded
    headroom to ~sf100, DIV-k beyond); max and argmax are integer
    compares (argmax tie → earliest day, an integer MIN). One
    closing double division + the Brown critical compare
    D·√T > CAST(1.358 AS DOUBLE) (bare-literal rule).

    Scale: one day agg (span-bounded ~2500 rows), one ordered window
    on that tiny frame, one closing agg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.to_date("l_shipdate").alias("d"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    daily = li.groupBy("d").agg(F.sum("cents").cast("bigint").alias("x"))
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    x38 = F.expr("CAST(x AS DECIMAL(38,0))")
    c = (
        daily.withColumn("t", F.row_number().over(Window.orderBy("d")).cast("bigint"))
        .withColumn("csq", F.sum(x38 * x38).over(wcum))
        .withColumn("ctot", F.sum(x38 * x38).over(wall))
        .withColumn("bigt", F.count(F.lit(1)).over(wall).cast("bigint"))
        .withColumn(
            "dev",
            F.expr("CAST(csq * bigt - CAST(t AS DECIMAL(38,0)) * ctot AS DECIMAL(38,0))"),
        )
        .withColumn("absdev", F.expr("CAST(ABS(dev) AS DECIMAL(38,0))"))
    )
    # one pass: the max deviation is a window over the (tiny) day
    # frame, so locating the argmax needs no second lineitem scan
    out = (
        c.withColumn("mx", F.max("absdev").over(wall))
        .where(F.col("absdev") == F.col("mx"))
        .agg(
            F.max("bigt").alias("bigt"),
            F.max("ctot").alias("ctot"),
            F.max("absdev").alias("maxdev"),
            F.min("d").alias("break_day"),
            F.min("t").cast("bigint").alias("break_t"),
        )
    )
    d_stat = F.expr(
        "CAST(maxdev AS DOUBLE) / (CAST(ctot AS DOUBLE) * CAST(bigt AS DOUBLE))"
    )
    return out.select(
        F.col("bigt").cast("bigint").alias("n_days"),
        F.date_format("break_day", "yyyy-MM-dd").alias("break_day"),
        "break_t",
        F.floor(d_stat * F.lit(1000000.0)).cast("bigint").alias("d_stat_e6"),
        (
            d_stat * F.sqrt(F.col("bigt").cast("double"))
            > F.expr("CAST(1.358 AS DOUBLE)")
        ).alias("variance_break_5pct"),
    )


CUSUM_SQUARES_SQL = """
WITH daily AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT))
              AS BIGINT) AS x
  FROM lineitem GROUP BY 1
),
c AS (
  SELECT d,
         CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS t,
         SUM(CAST(x AS HUGEINT) * x) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS csq,
         SUM(CAST(x AS HUGEINT) * x) OVER () AS ctot,
         CAST(COUNT(*) OVER () AS BIGINT) AS bigt
  FROM daily
),
cd AS (
  SELECT d, t, csq, ctot, bigt,
         ABS(csq * bigt - CAST(t AS HUGEINT) * ctot) AS absdev
  FROM c
),
mx AS (
  SELECT *, MAX(absdev) OVER () AS mx FROM cd
),
agg AS (
  SELECT MAX(bigt) AS bigt, MAX(ctot) AS ctot, MAX(absdev) AS maxdev,
         MIN(d) AS break_day, CAST(MIN(t) AS BIGINT) AS break_t
  FROM mx WHERE absdev = mx
)
SELECT CAST(a.bigt AS BIGINT) AS n_days,
       strftime(a.break_day, '%Y-%m-%d') AS break_day,
       a.break_t,
       CAST(FLOOR(CAST(a.maxdev AS DOUBLE)
                  / (CAST(a.ctot AS DOUBLE) * CAST(a.bigt AS DOUBLE))
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS d_stat_e6,
       CAST(a.maxdev AS DOUBLE) / (CAST(a.ctot AS DOUBLE) * CAST(a.bigt AS DOUBLE))
         * SQRT(CAST(a.bigt AS DOUBLE)) > CAST(1.358 AS DOUBLE) AS variance_break_5pct
FROM agg a
"""

QUERIES["lineitem_cusum_of_squares"] = lineitem_cusum_of_squares
ORACLE["lineitem_cusum_of_squares"] = CUSUM_SQUARES_SQL


# ---------------------------------------------------------------------------
# orders_price_heaping_audit — last-two-digit heaping / digit-preference
# test (round 10)
# ---------------------------------------------------------------------------


def orders_price_heaping_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Digit-preference (heaping) audit on the cents digits of order
    totals — the forensic sibling of orders_benford_audit: human-
    entered or post-processed amounts heap on round numbers (.00,
    .50), which a uniformity χ²(99) over the last two digits exposes
    even when first digits look Benford-clean. Two segments are
    audited side by side: the ORGANIC feed, and a PLANTED segment
    (orders with key % 10 == 0, amounts rounded to whole dollars
    in-plan) where the test must fire — the audit demonstrates its
    own power on data that can expose it (r10 quality_classifier
    lesson: a screen whose input can never trip it is untested).

    Engine-exact: integer digit-pair counts; χ² = Σ(o_i−e)²/e as the
    integer Σ(100·o_i−n)² DIV'd once into a FLOOR-e6 emission —
    cross-multiplied so no per-cell float; the df=99 critical value
    rides CAST(123.225 AS DOUBLE). Scale: one conditional agg to
    ≤200 (segment, digit-pair) cells, χ² on that tiny frame."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        (F.col("o_orderkey") % 10 == 0).alias("plantable"),
    )
    seg = o.select(
        F.lit("organic").alias("segment"), (F.col("cents") % 100).alias("d2")
    ).unionAll(
        o.where("plantable").select(
            F.lit("planted_rounded").alias("segment"),
            F.expr("CAST((cents DIV 100) * 100 AS BIGINT) % 100").alias("d2"),
        )
    )
    cells = seg.groupBy("segment", "d2").agg(
        F.count(F.lit(1)).cast("bigint").alias("o")
    )
    wseg = Window.partitionBy("segment")
    c = (
        cells.withColumn("n", F.sum("o").over(wseg).cast("bigint"))
        .withColumn("mxo", F.max("o").over(wseg).cast("bigint"))
    )
    agg = c.groupBy("segment").agg(
        F.max("n").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("digit_pairs_seen"),
        F.sum(
            F.expr(
                "CAST(100 * o - n AS DECIMAL(38,0)) * CAST(100 * o - n AS DECIMAL(38,0))"
            )
        ).alias("ssq"),
        # deterministic tie-break: smallest digit pair among the modes
        # (max_by ties are engine/shuffle-order dependent)
        F.min(F.when(F.col("o") == F.col("mxo"), F.col("d2"))).cast("bigint").alias("top_pair"),
        F.max("o").cast("bigint").alias("top_count"),
    )
    # chi2 = sum over ALL 100 cells of (o-n/100)^2/(n/100); absent
    # cells contribute (n/100)^2/(n/100) = n/100 each:
    # = ssq/(100*n) + (100-seen)*n/10000 — one closing double
    chi2 = F.expr(
        "CAST(ssq AS DOUBLE) / (CAST(100 AS DOUBLE) * CAST(n AS DOUBLE))"
        " + CAST(100 - digit_pairs_seen AS DOUBLE) * CAST(n AS DOUBLE)"
        " / CAST(10000 AS DOUBLE)"
    )
    return agg.select(
        "segment",
        "n",
        "digit_pairs_seen",
        F.floor(chi2 * F.lit(1000000.0)).cast("bigint").alias("chi2_e6"),
        (chi2 > F.expr("CAST(123.225 AS DOUBLE)")).alias("heaping_rejected_5pct"),
        "top_pair",
        F.expr("CAST(top_count * 1000000 DIV n AS BIGINT)").alias("top_share_ppm"),
    ).orderBy("segment")


PRICE_HEAPING_SQL = """
WITH o AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
         o_orderkey % 10 = 0 AS plantable
  FROM orders
),
seg AS (
  SELECT 'organic' AS segment, cents % 100 AS d2 FROM o
  UNION ALL
  SELECT 'planted_rounded', CAST((cents // 100) * 100 AS BIGINT) % 100
  FROM o WHERE plantable
),
cells AS (
  SELECT segment, d2, CAST(COUNT(*) AS BIGINT) AS o FROM seg GROUP BY 1, 2
),
c AS (
  SELECT segment, d2, o,
         CAST(SUM(o) OVER (PARTITION BY segment) AS BIGINT) AS n,
         CAST(MAX(o) OVER (PARTITION BY segment) AS BIGINT) AS mxo
  FROM cells
),
agg AS (
  SELECT segment,
         CAST(MAX(n) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS digit_pairs_seen,
         CAST(SUM(CAST(100 * o - n AS HUGEINT) * CAST(100 * o - n AS HUGEINT))
              AS HUGEINT) AS ssq,
         CAST(MIN(CASE WHEN o = mxo THEN d2 END) AS BIGINT) AS top_pair,
         CAST(MAX(o) AS BIGINT) AS top_count
  FROM c GROUP BY 1
)
SELECT segment, n, digit_pairs_seen,
       CAST(FLOOR((CAST(ssq AS DOUBLE) / (CAST(100 AS DOUBLE) * CAST(n AS DOUBLE))
                   + CAST(100 - digit_pairs_seen AS DOUBLE) * CAST(n AS DOUBLE)
                     / CAST(10000 AS DOUBLE)) * CAST(1000000 AS DOUBLE))
            AS BIGINT) AS chi2_e6,
       (CAST(ssq AS DOUBLE) / (CAST(100 AS DOUBLE) * CAST(n AS DOUBLE))
        + CAST(100 - digit_pairs_seen AS DOUBLE) * CAST(n AS DOUBLE)
          / CAST(10000 AS DOUBLE)) > CAST(123.225 AS DOUBLE) AS heaping_rejected_5pct,
       top_pair,
       CAST(top_count * 1000000 // n AS BIGINT) AS top_share_ppm
FROM agg
ORDER BY segment
"""

QUERIES["orders_price_heaping_audit"] = orders_price_heaping_audit
ORACLE["orders_price_heaping_audit"] = PRICE_HEAPING_SQL


# ---------------------------------------------------------------------------
# lineitem_twoway_anova — 2x2 factorial ANOVA with interaction
# (round 10)
# ---------------------------------------------------------------------------


def lineitem_twoway_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2x2 factorial ANOVA with interaction on net revenue — factor A
    = returned line (l_returnflag = 'R'), factor B = deep discount
    (l_discount >= 0.05): unweighted-means Type-III contrasts on the
    four cell means (L_A = m11+m10-m01-m00 pattern), F = L² /
    (MSE·Σ1/n_ij), the factorial step beyond lineitem_anova_f's
    one-way F. By construction B fires hard (revenue = price·(1-z)),
    A and the interaction are near-null — the property test asserts
    exactly that asymmetry plus a full numpy recompute.

    Engine-exact: per-cell sufficient statistics are integer cents /
    DECIMAL(38,0) cents²; each cell's within-SS is the house
    (nΣx²-(Σx)²) DIV n integer quantization (order-proof), summed as
    DECIMAL(38,0); means and contrasts close in identically-shaped
    doubles; F values FLOOR-e6, significance vs CAST(3.842 AS
    DOUBLE) (F(1,∞) 5%). Scale: ONE map-side-combinable agg to 4
    cells; everything else is on the 4-row frame."""
    li = load_table(spark, sf_dir, "lineitem").select(
        (F.col("l_returnflag") == "R").alias("a"),
        F.expr("CAST(l_discount AS DECIMAL(12,2)) >= CAST(0.05 AS DECIMAL(12,2))").alias("b"),
        F.expr(
            "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))"
            " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))), 2)"
            " * 100 AS BIGINT)"
        ).alias("y"),
    )
    y18 = F.expr("CAST(y AS DECIMAL(18,0))")
    cells = li.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("s"),
        F.sum(y18 * y18).cast("decimal(38,0)").alias("ss"),
    )
    c = cells.select(
        "a",
        "b",
        "n",
        "s",
        # quantize at DOLLARS² (DIV n*1e4): the cents² quotient is
        # ~1.7e19 at sf1 — past Long.MAX, and Spark DIV returns LONG
        # and silently WRAPS (r8 rule, quotient-itself edition; the
        # sf1 tier caught the negative cell)
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * ss - s * s)"
            " DIV (CAST(n AS DECIMAL(38,0)) * 10000) AS DECIMAL(38,0))"
        ).alias("wss_d2"),
    )
    g = c.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.sum("wss_d2").alias("sse_d2"),
        F.sum(F.expr("CASE WHEN a AND b THEN n END")).cast("bigint").alias("n11"),
        F.sum(F.expr("CASE WHEN a AND NOT b THEN n END")).cast("bigint").alias("n10"),
        F.sum(F.expr("CASE WHEN NOT a AND b THEN n END")).cast("bigint").alias("n01"),
        F.sum(F.expr("CASE WHEN NOT a AND NOT b THEN n END")).cast("bigint").alias("n00"),
        F.sum(F.expr("CASE WHEN a AND b THEN s END")).alias("s11"),
        F.sum(F.expr("CASE WHEN a AND NOT b THEN s END")).alias("s10"),
        F.sum(F.expr("CASE WHEN NOT a AND b THEN s END")).alias("s01"),
        F.sum(F.expr("CASE WHEN NOT a AND NOT b THEN s END")).alias("s00"),
    )
    m = lambda s_, n_: (  # noqa: E731 — cell mean in dollars, identical shape
        F.expr(f"CAST({s_} AS DOUBLE) / CAST({n_} AS DOUBLE) / CAST(100 AS DOUBLE)")
    )
    m11, m10, m01, m00 = m("s11", "n11"), m("s10", "n10"), m("s01", "n01"), m("s00", "n00")
    mse = F.expr("CAST(sse_d2 AS DOUBLE) / CAST(n_total - 4 AS DOUBLE)")
    hsum = F.expr(
        "CAST(1 AS DOUBLE) / CAST(n11 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n10 AS DOUBLE)"
        " + CAST(1 AS DOUBLE) / CAST(n01 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n00 AS DOUBLE)"
    )
    la = m11 + m10 - m01 - m00
    lb = m11 - m10 + m01 - m00
    li_ = m11 - m10 - m01 + m00
    fa = la * la / (mse * hsum)
    fb = lb * lb / (mse * hsum)
    fi = li_ * li_ / (mse * hsum)
    e6 = F.lit(1000000.0)
    crit = F.expr("CAST(3.842 AS DOUBLE)")
    return g.select(
        F.col("n_total").alias("n"),
        "n11", "n10", "n01", "n00",
        F.floor(fa * e6).cast("bigint").alias("f_returned_e6"),
        F.floor(fb * e6).cast("bigint").alias("f_discount_e6"),
        F.floor(fi * e6).cast("bigint").alias("f_interaction_e6"),
        (fa > crit).alias("returned_sig_5pct"),
        (fb > crit).alias("discount_sig_5pct"),
        (fi > crit).alias("interaction_sig_5pct"),
    )


TWOWAY_ANOVA_SQL = """
WITH li AS (
  SELECT l_returnflag = 'R' AS a,
         CAST(l_discount AS DECIMAL(12,2)) >= CAST(0.05 AS DECIMAL(12,2)) AS b,
         CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))), 2)
              * 100 AS BIGINT) AS y
  FROM lineitem
),
cells AS (
  SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS s,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS ss
  FROM li GROUP BY 1, 2
),
c AS (
  SELECT a, b, n, s,
         (CAST(n AS HUGEINT) * ss - s * s) // (CAST(n AS HUGEINT) * 10000) AS wss_d2
  FROM cells
),
g AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         SUM(wss_d2) AS sse_d2,
         CAST(SUM(CASE WHEN a AND b THEN n END) AS BIGINT) AS n11,
         CAST(SUM(CASE WHEN a AND NOT b THEN n END) AS BIGINT) AS n10,
         CAST(SUM(CASE WHEN NOT a AND b THEN n END) AS BIGINT) AS n01,
         CAST(SUM(CASE WHEN NOT a AND NOT b THEN n END) AS BIGINT) AS n00,
         SUM(CASE WHEN a AND b THEN s END) AS s11,
         SUM(CASE WHEN a AND NOT b THEN s END) AS s10,
         SUM(CASE WHEN NOT a AND b THEN s END) AS s01,
         SUM(CASE WHEN NOT a AND NOT b THEN s END) AS s00
  FROM c
)
SELECT n_total AS n, n11, n10, n01, n00,
       CAST(FLOOR(
         POW(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / CAST(100 AS DOUBLE)
             + CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / CAST(100 AS DOUBLE)
             - CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / CAST(100 AS DOUBLE)
             - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / CAST(100 AS DOUBLE), 2)
         / (CAST(sse_d2 AS DOUBLE) / CAST(n_total - 4 AS DOUBLE)
            * (CAST(1 AS DOUBLE) / CAST(n11 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n10 AS DOUBLE)
               + CAST(1 AS DOUBLE) / CAST(n01 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n00 AS DOUBLE)))
         * CAST(1000000 AS DOUBLE)) AS BIGINT) AS f_returned_e6,
       CAST(FLOOR(
         POW(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / CAST(100 AS DOUBLE)
             - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / CAST(100 AS DOUBLE)
             + CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / CAST(100 AS DOUBLE)
             - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / CAST(100 AS DOUBLE), 2)
         / (CAST(sse_d2 AS DOUBLE) / CAST(n_total - 4 AS DOUBLE)
            * (CAST(1 AS DOUBLE) / CAST(n11 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n10 AS DOUBLE)
               + CAST(1 AS DOUBLE) / CAST(n01 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n00 AS DOUBLE)))
         * CAST(1000000 AS DOUBLE)) AS BIGINT) AS f_discount_e6,
       CAST(FLOOR(
         POW(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / CAST(100 AS DOUBLE)
             - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / CAST(100 AS DOUBLE)
             - CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / CAST(100 AS DOUBLE)
             + CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / CAST(100 AS DOUBLE), 2)
         / (CAST(sse_d2 AS DOUBLE) / CAST(n_total - 4 AS DOUBLE)
            * (CAST(1 AS DOUBLE) / CAST(n11 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n10 AS DOUBLE)
               + CAST(1 AS DOUBLE) / CAST(n01 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n00 AS DOUBLE)))
         * CAST(1000000 AS DOUBLE)) AS BIGINT) AS f_interaction_e6,
       POW(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / CAST(100 AS DOUBLE)
           + CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / CAST(100 AS DOUBLE)
           - CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / CAST(100 AS DOUBLE)
           - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / CAST(100 AS DOUBLE), 2)
       / (CAST(sse_d2 AS DOUBLE) / CAST(n_total - 4 AS DOUBLE)
          * (CAST(1 AS DOUBLE) / CAST(n11 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n10 AS DOUBLE)
             + CAST(1 AS DOUBLE) / CAST(n01 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n00 AS DOUBLE)))
         > CAST(3.842 AS DOUBLE) AS returned_sig_5pct,
       POW(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / CAST(100 AS DOUBLE)
           - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / CAST(100 AS DOUBLE)
           + CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / CAST(100 AS DOUBLE)
           - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / CAST(100 AS DOUBLE), 2)
       / (CAST(sse_d2 AS DOUBLE) / CAST(n_total - 4 AS DOUBLE)
          * (CAST(1 AS DOUBLE) / CAST(n11 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n10 AS DOUBLE)
             + CAST(1 AS DOUBLE) / CAST(n01 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n00 AS DOUBLE)))
         > CAST(3.842 AS DOUBLE) AS discount_sig_5pct,
       POW(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / CAST(100 AS DOUBLE)
           - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / CAST(100 AS DOUBLE)
           - CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / CAST(100 AS DOUBLE)
           + CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / CAST(100 AS DOUBLE), 2)
       / (CAST(sse_d2 AS DOUBLE) / CAST(n_total - 4 AS DOUBLE)
          * (CAST(1 AS DOUBLE) / CAST(n11 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n10 AS DOUBLE)
             + CAST(1 AS DOUBLE) / CAST(n01 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST(n00 AS DOUBLE)))
         > CAST(3.842 AS DOUBLE) AS interaction_sig_5pct
FROM g
"""

QUERIES["lineitem_twoway_anova"] = lineitem_twoway_anova
ORACLE["lineitem_twoway_anova"] = TWOWAY_ANOVA_SQL


# ---------------------------------------------------------------------------
# orders_wilcoxon_signed_rank — paired nonparametric first-vs-second-half
# test (round 10)
# ---------------------------------------------------------------------------


def orders_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test on PAIRED per-customer spend — did
    each customer's average order value shift between the first and
    second half of the history (split at 1998-06-01, the span
    midpoint — orders run 1995..2001, r5 lesson: check ranges)? The
    paired sibling of lineitem_mannwhitney_u / orders_friedman_test:
    signs and ranks of within-customer differences, robust to the
    heavy price tails.

    Engine-exact: the pair difference is floor-mean cents (s DIV n
    per half — deterministic quantization on both engines); |d|
    ranks come from the histogram-CDF with the integer average-rank
    trick (2·avg_rank = 2·cum_before + t + 1), so 2·W⁺, the tie
    term Σ(t³−t) and n(n+1)(2n+1) are exact integers; one closing
    double z-expression with every literal CAST AS DOUBLE.

    Scale: one orders shuffle to (customer, half) cells, pairs via
    the 2-row-per-customer agg, then a |distinct |d||-row CDF."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.col("o_orderdate") < F.lit("1998-06-01").cast("date")).alias("h1"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    halves = o.groupBy("o_custkey", "h1").agg(
        F.sum("cents").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    pairs = (
        halves.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("nh"),
            F.max(F.when(F.col("h1"), F.expr("s DIV n"))).alias("m1"),
            F.max(F.when(~F.col("h1"), F.expr("s DIV n"))).alias("m2"),
        )
        .where(F.col("nh") == 2)
        .select((F.col("m2") - F.col("m1")).cast("bigint").alias("d"))
    )
    nz = pairs.where(F.col("d") != 0).select(
        F.abs(F.col("d")).alias("ad"), (F.col("d") > 0).alias("pos")
    )
    hist = nz.groupBy("ad").agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint").alias("tp"),
    )
    wcdf = Window.orderBy("ad").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.withColumn(
        "cum_before", F.coalesce(F.sum("t").over(wcdf), F.lit(0)).cast("bigint")
    )
    agg = ranked.agg(
        F.sum("t").cast("bigint").alias("n"),
        F.sum(F.expr("tp * (2 * cum_before + t + 1)")).cast("bigint").alias("w2"),
        F.sum(F.expr("t * t * t - t")).cast("bigint").alias("tc"),
    )
    total = pairs.agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    out = agg.crossJoin(F.broadcast(total))
    z = F.expr(
        "(CAST(w2 AS DOUBLE) / CAST(2 AS DOUBLE)"
        " - CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) / CAST(4 AS DOUBLE))"
        " / SQRT(CAST(n AS DOUBLE) * CAST(n + 1 AS DOUBLE) * CAST(2 * n + 1 AS DOUBLE)"
        "        / CAST(24 AS DOUBLE) - CAST(tc AS DOUBLE) / CAST(48 AS DOUBLE))"
    )
    return out.select(
        "n_pairs",
        F.col("n").alias("n_nonzero"),
        F.col("w2").alias("w_plus_x2"),
        F.col("tc").alias("tie_term"),
        F.floor(z * F.lit(1000000.0)).cast("bigint").alias("z_e6"),
        (F.abs(z) > F.expr("CAST(1.96 AS DOUBLE)")).alias("shift_sig_5pct"),
    )


WILCOXON_SQL = """
WITH o AS (
  SELECT o_custkey,
         o_orderdate < DATE '1998-06-01' AS h1,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
halves AS (
  SELECT o_custkey, h1, CAST(SUM(cents) AS BIGINT) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM o GROUP BY 1, 2
),
pairs AS (
  SELECT CAST(MAX(CASE WHEN NOT h1 THEN s // n END)
              - MAX(CASE WHEN h1 THEN s // n END) AS BIGINT) AS d
  FROM halves GROUP BY o_custkey HAVING COUNT(*) = 2
),
nz AS (
  SELECT ABS(d) AS ad, d > 0 AS pos FROM pairs WHERE d <> 0
),
hist AS (
  SELECT ad, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS tp
  FROM nz GROUP BY 1
),
ranked AS (
  SELECT ad, t, tp,
         CAST(COALESCE(SUM(t) OVER (ORDER BY ad
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM hist
),
agg AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(tp * (2 * cum_before + t + 1)) AS BIGINT) AS w2,
         CAST(SUM(t * t * t - t) AS BIGINT) AS tc
  FROM ranked
),
total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs)
SELECT t.n_pairs,
       a.n AS n_nonzero,
       a.w2 AS w_plus_x2,
       a.tc AS tie_term,
       CAST(FLOOR((CAST(a.w2 AS DOUBLE) / CAST(2 AS DOUBLE)
                   - CAST(a.n AS DOUBLE) * CAST(a.n + 1 AS DOUBLE) / CAST(4 AS DOUBLE))
                  / SQRT(CAST(a.n AS DOUBLE) * CAST(a.n + 1 AS DOUBLE)
                         * CAST(2 * a.n + 1 AS DOUBLE) / CAST(24 AS DOUBLE)
                         - CAST(a.tc AS DOUBLE) / CAST(48 AS DOUBLE))
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS z_e6,
       ABS((CAST(a.w2 AS DOUBLE) / CAST(2 AS DOUBLE)
            - CAST(a.n AS DOUBLE) * CAST(a.n + 1 AS DOUBLE) / CAST(4 AS DOUBLE))
           / SQRT(CAST(a.n AS DOUBLE) * CAST(a.n + 1 AS DOUBLE)
                  * CAST(2 * a.n + 1 AS DOUBLE) / CAST(24 AS DOUBLE)
                  - CAST(a.tc AS DOUBLE) / CAST(48 AS DOUBLE)))
         > CAST(1.96 AS DOUBLE) AS shift_sig_5pct
FROM agg a, total t
"""

QUERIES["orders_wilcoxon_signed_rank"] = orders_wilcoxon_signed_rank
ORACLE["orders_wilcoxon_signed_rank"] = WILCOXON_SQL


# ---------------------------------------------------------------------------
# orders_lognormal_fit — log-normal moment fit + back-transform check
# (round 10)
# ---------------------------------------------------------------------------


def orders_lognormal_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-normal fit of the order-value distribution by log-moment
    matching (μ̂ = mean ln x, σ̂² = var ln x) with the back-transform
    reality check exp(μ̂+σ̂²/2) vs the actual mean — the distribution
    every revenue simulator assumes for basket values, and the check
    that tells you whether it holds here (the ratio IS the output;
    a multiplicative process gives ≈1, the synthetic uniform-ish
    fixture gives <1 — the finding). Complements orders_weibull_fit
    (durations) and the Gumbel/Hill tail ops.

    Engine-exact: each ln lands as the house per-term e6 integer
    (ROUND(ln(x)·1e6) — C-vs-Java ulp absorbed, powerlaw spelling);
    Σ and Σ² accumulate as BIGINT/DECIMAL(38,0) (order-proof);
    variance via the (nΣl²−(Σl)²) DIV n quantization; one closing
    double exp/ratio, FLOOR-e6 emission. Scale: one
    map-side-combinable agg; ln is whole-stage-codegen JVM work."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr(
            "CAST(ROUND(ln(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))"
            " * 1000000) AS BIGINT)"
        ).alias("l"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    l38 = F.expr("CAST(l AS DECIMAL(38,0))")
    g = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("l").cast("bigint").alias("sl"),
        F.sum(l38 * l38).cast("decimal(38,0)").alias("sll"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("sc"),
    ).select(
        "n",
        "sl",
        "sc",
        F.expr(
            "CAST((CAST(n AS DECIMAL(38,0)) * sll - CAST(sl AS DECIMAL(38,0)) * sl)"
            " DIV (CAST(n AS DECIMAL(38,0)) * 1000000) AS BIGINT)"
        ).alias("var_e6"),
    )
    mu = F.expr("CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) / CAST(1000000 AS DOUBLE)")
    # var_e6 is n·Var·1e6 … no: (nΣl²−(Σl)²) DIV (n·1e6) = n·Var(l_e6)/1e6
    # = n·Var(ln)·1e6, so Var(ln) = var_e6 / n / 1e6
    sig2 = F.expr(
        "CAST(var_e6 AS DOUBLE) / CAST(n AS DOUBLE) / CAST(1000000 AS DOUBLE)"
        " / CAST(1000000 AS DOUBLE)"
    )
    implied = F.exp(mu + sig2 / F.lit(2.0))
    actual = F.expr("CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)")
    return g.select(
        "n",
        F.floor(mu * F.lit(1000000.0)).cast("bigint").alias("mu_e6"),
        F.floor(F.sqrt(sig2) * F.lit(1000000.0)).cast("bigint").alias("sigma_e6"),
        F.floor(implied).cast("bigint").alias("implied_mean_cents"),
        F.floor(actual).cast("bigint").alias("actual_mean_cents"),
        F.floor(implied / actual * F.lit(1000000.0)).cast("bigint").alias(
            "lognormality_ratio_e6"
        ),
    )


LOGNORMAL_SQL = """
WITH o AS (
  SELECT CAST(ROUND(ln(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT))
              * 1000000) AS BIGINT) AS l,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders
),
g AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(l) AS BIGINT) AS sl,
         CAST(SUM(CAST(l AS HUGEINT) * l) AS HUGEINT) AS sll,
         CAST(SUM(CAST(cents AS HUGEINT)) AS HUGEINT) AS sc
  FROM o
),
q AS (
  SELECT n, sl, sc,
         CAST((CAST(n AS HUGEINT) * sll - CAST(sl AS HUGEINT) * sl)
              // (CAST(n AS HUGEINT) * 1000000) AS BIGINT) AS var_e6
  FROM g
)
SELECT n,
       CAST(FLOOR(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) / CAST(1000000 AS DOUBLE)
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS mu_e6,
       CAST(FLOOR(SQRT(CAST(var_e6 AS DOUBLE) / CAST(n AS DOUBLE)
                       / CAST(1000000 AS DOUBLE) / CAST(1000000 AS DOUBLE))
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS sigma_e6,
       CAST(FLOOR(EXP(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) / CAST(1000000 AS DOUBLE)
                      + CAST(var_e6 AS DOUBLE) / CAST(n AS DOUBLE)
                        / CAST(1000000 AS DOUBLE) / CAST(1000000 AS DOUBLE)
                        / CAST(2 AS DOUBLE))) AS BIGINT) AS implied_mean_cents,
       CAST(FLOOR(CAST(sc AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT) AS actual_mean_cents,
       CAST(FLOOR(EXP(CAST(sl AS DOUBLE) / CAST(n AS DOUBLE) / CAST(1000000 AS DOUBLE)
                      + CAST(var_e6 AS DOUBLE) / CAST(n AS DOUBLE)
                        / CAST(1000000 AS DOUBLE) / CAST(1000000 AS DOUBLE)
                        / CAST(2 AS DOUBLE))
                  / (CAST(sc AS DOUBLE) / CAST(n AS DOUBLE))
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS lognormality_ratio_e6
FROM q
"""

QUERIES["orders_lognormal_fit"] = orders_lognormal_fit
ORACLE["orders_lognormal_fit"] = LOGNORMAL_SQL


# ---------------------------------------------------------------------------
# lineitem_intraclass_correlation — one-way random-effects ICC(1)
# (round 10)
# ---------------------------------------------------------------------------


def lineitem_intraclass_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intraclass correlation ICC(1) of line net revenue within
    orders — the variance-components question behind
    lineitem_clustered_se: how much of revenue variance lives BETWEEN
    orders vs within them? One-way random-effects ANOVA: MSB/MSW from
    group (order) sums, unbalanced k̄ = (N − Σn_g²/N)/(G−1), ICC =
    (MSB−MSW)/(MSB+(k̄−1)·MSW). Near zero here (synthetic lines are
    independent — the honest finding, property-asserted as
    consistency); on real data this is the number that says whether
    order-clustered errors are mandatory.

    Engine-exact: per-order integer cents sums; SSW = Σ_g (n_g·Σx² −
    (Σx)²) DIV (n_g·1e4) (dollars² — the twoway-ANOVA lesson: the
    cents² quotient passes Long.MAX at sf1); SSB from group sums via
    the same dollars² quantization; one closing double. Scale: one
    shuffle to per-order cells (~N/4 groups — the natural key, no
    skew), then one histogram-free agg; nothing driver-side."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr(
            "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))"
            " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))), 2)"
            " * 100 AS BIGINT)"
        ).alias("y"),
    )
    y18 = F.expr("CAST(y AS DECIMAL(18,0))")
    g = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("ng"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sg"),
        F.sum(y18 * y18).cast("decimal(38,0)").alias("ssg"),
    )
    per = g.select(
        "ng",
        "sg",
        F.expr(
            "CAST((CAST(ng AS DECIMAL(38,0)) * ssg - sg * sg)"
            " DIV (CAST(ng AS DECIMAL(38,0)) * 10000) AS DECIMAL(38,0))"
        ).alias("ssw_d2"),
    )
    agg = per.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("grp"),
        F.sum(F.expr("CAST(ng AS DECIMAL(38,0)) * ng")).alias("sn2"),
        F.sum("ssw_d2").alias("ssw_d2"),
        F.sum("sg").alias("st"),
        F.sum(F.expr("sg * sg DIV (CAST(ng AS DECIMAL(38,0)) * 10000)")).alias(
            "sbterm_d2"
        ),
    )
    # SSB_d2 = Σ sg²/ng − (Σsg)²/N, both terms dollars²-quantized
    out = agg.select(
        "n",
        "grp",
        F.expr(
            "CAST(sbterm_d2 - st * st DIV (CAST(n AS DECIMAL(38,0)) * 10000)"
            " AS DECIMAL(38,0))"
        ).alias("ssb_d2"),
        "ssw_d2",
        "sn2",
    )
    msb = F.expr("CAST(ssb_d2 AS DOUBLE) / CAST(grp - 1 AS DOUBLE)")
    msw = F.expr("CAST(ssw_d2 AS DOUBLE) / CAST(n - grp AS DOUBLE)")
    kbar = F.expr(
        "(CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(n AS DOUBLE))"
        " / CAST(grp - 1 AS DOUBLE)"
    )
    icc = (msb - msw) / (msb + (kbar - F.lit(1.0)) * msw)
    return out.select(
        "n",
        F.col("grp").alias("n_groups"),
        F.floor(kbar * F.lit(1000.0)).cast("bigint").alias("kbar_x1000"),
        F.floor(msb / msw * F.lit(1000000.0)).cast("bigint").alias("f_ratio_e6"),
        F.floor(icc * F.lit(1000000.0)).cast("bigint").alias("icc_e6"),
    )


ICC_SQL = """
WITH li AS (
  SELECT l_orderkey,
         CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))), 2)
              * 100 AS BIGINT) AS y
  FROM lineitem
),
g AS (
  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS ng,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sg,
         CAST(SUM(CAST(y AS HUGEINT) * y) AS HUGEINT) AS ssg
  FROM li GROUP BY 1
),
per AS (
  SELECT ng, sg,
         (CAST(ng AS HUGEINT) * ssg - sg * sg) // (CAST(ng AS HUGEINT) * 10000)
           AS ssw_d2
  FROM g
),
agg AS (
  SELECT CAST(SUM(ng) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS grp,
         CAST(SUM(CAST(ng AS HUGEINT) * ng) AS HUGEINT) AS sn2,
         CAST(SUM(ssw_d2) AS HUGEINT) AS ssw_d2,
         CAST(SUM(sg) AS HUGEINT) AS st,
         CAST(SUM(sg * sg // (CAST(ng AS HUGEINT) * 10000)) AS HUGEINT) AS sbterm_d2
  FROM per
)
SELECT n, grp AS n_groups,
       CAST(FLOOR((CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(n AS DOUBLE))
                  / CAST(grp - 1 AS DOUBLE) * CAST(1000 AS DOUBLE)) AS BIGINT)
         AS kbar_x1000,
       CAST(FLOOR((CAST(sbterm_d2 - st * st // (CAST(n AS HUGEINT) * 10000) AS DOUBLE)
                   / CAST(grp - 1 AS DOUBLE))
                  / (CAST(ssw_d2 AS DOUBLE) / CAST(n - grp AS DOUBLE))
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS f_ratio_e6,
       CAST(FLOOR((
           (CAST(sbterm_d2 - st * st // (CAST(n AS HUGEINT) * 10000) AS DOUBLE)
            / CAST(grp - 1 AS DOUBLE))
           - (CAST(ssw_d2 AS DOUBLE) / CAST(n - grp AS DOUBLE)))
         / ((CAST(sbterm_d2 - st * st // (CAST(n AS HUGEINT) * 10000) AS DOUBLE)
             / CAST(grp - 1 AS DOUBLE))
            + ((CAST(n AS DOUBLE) - CAST(sn2 AS DOUBLE) / CAST(n AS DOUBLE))
               / CAST(grp - 1 AS DOUBLE) - CAST(1 AS DOUBLE))
              * (CAST(ssw_d2 AS DOUBLE) / CAST(n - grp AS DOUBLE)))
         * CAST(1000000 AS DOUBLE)) AS BIGINT) AS icc_e6
FROM agg
"""

QUERIES["lineitem_intraclass_correlation"] = lineitem_intraclass_correlation
ORACLE["lineitem_intraclass_correlation"] = ICC_SQL


# ---------------------------------------------------------------------------
# lineitem_taguchi_sn — Taguchi signal-to-noise ratios on fulfillment
# latency (round 10)
# ---------------------------------------------------------------------------


def lineitem_taguchi_sn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Taguchi signal-to-noise ratios on order→ship latency per ship
    year — the robust-design scorecard: smaller-is-better
    SN_S = −10·log10(Σx²/n) penalizes BOTH slow mean and high
    variance in one number (unlike the mean-only SLA view of
    lineitem_shipping_sla), and larger-is-better SN_L =
    −10·log10(Σ(1/x²)/n) applied to the same latencies exposes the
    near-zero outliers. A year whose SN_S drifts down is getting
    slower OR sloppier — the single-number trend a fleet review
    wants.

    Engine-exact: latency is integer days (datediff), Σx² integer
    DECIMAL(38,0); the reciprocal sum is e12-quantized integer
    (1e12 DIV x², x floored at 1) — both engines trunc; the two
    log10 are ONE-SHOT transcendentals each, ROUND 6 (measure-zero
    ties). Scale: one lineitem⋈orders join (orderkey — the natural
    co-partition), one year agg."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.year("l_shipdate").cast("int").alias("ship_year"),
        F.greatest(F.datediff("l_shipdate", "o_orderdate"), F.lit(1))
        .cast("bigint")
        .alias("x"),
    )
    x38 = F.expr("CAST(x AS DECIMAL(38,0))")
    g = j.groupBy("ship_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(x38 * x38).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.expr("1000000000000 DIV (x * x)")).cast("bigint").alias("srecip_e12"),
    )
    sn_s = F.expr(
        "ROUND(-10 * log10(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)), 6)"
    )
    sn_l = F.expr(
        "ROUND(-10 * log10(CAST(srecip_e12 AS DOUBLE) / CAST(n AS DOUBLE)"
        " / CAST(1000000000000 AS DOUBLE)), 6)"
    )
    return g.select(
        "ship_year",
        "n",
        F.expr("CAST(sx * 1000 DIV n AS BIGINT)").alias("mean_days_x1000"),
        sn_s.alias("sn_smaller_db"),
        sn_l.alias("sn_larger_db"),
    ).orderBy("ship_year")


TAGUCHI_SQL = """
WITH j AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS ship_year,
         CAST(GREATEST(datediff('day', o_orderdate, l_shipdate), 1) AS BIGINT) AS x
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
g AS (
  SELECT ship_year, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
         CAST(SUM(1000000000000 // (x * x)) AS BIGINT) AS srecip_e12
  FROM j GROUP BY 1
)
SELECT ship_year, n,
       CAST(sx * 1000 // n AS BIGINT) AS mean_days_x1000,
       ROUND(-10 * log10(CAST(sxx AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS sn_smaller_db,
       ROUND(-10 * log10(CAST(srecip_e12 AS DOUBLE) / CAST(n AS DOUBLE)
             / CAST(1000000000000 AS DOUBLE)), 6) AS sn_larger_db
FROM g
ORDER BY ship_year
"""

QUERIES["lineitem_taguchi_sn"] = lineitem_taguchi_sn
ORACLE["lineitem_taguchi_sn"] = TAGUCHI_SQL


# ---------------------------------------------------------------------------
# orders_quantile_treatment_effect — distributional effect at p25/p50/p75
# (round 10)
# ---------------------------------------------------------------------------


def orders_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects — the distributional complement to
    mean-effect ops (DiD/CUPED): at p25/p50/p75, how much does the
    order-value distribution of the BUILDING segment differ from the
    rest? A mean effect of zero can hide opposite-sign tail effects;
    QTE is what an experimentation review reads next. Order-statistic
    confidence bounds (Woodruff/binomial rank bounds at ~95%: rank ±
    1.96·√(n·q·(1−q))) come free from the same CDF — no bootstrap.

    Engine-exact: cents histogram per group, ceil-rank order
    statistics and the rank bounds via cross-multiplied integer
    predicates (the ±z√· bound is FLOOR-quantized from one double —
    identical on both engines); effects are integer cents
    differences. Scale: two |distinct cents|-sized CDFs (histogram-
    CDF house pattern — never a global sort), 3-row output."""
    o = load_table(spark, sf_dir, "orders").join(
        load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        F.col("o_custkey") == F.col("c_custkey"),
    ).select(
        (F.col("c_mktsegment") == "BUILDING").alias("treated"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
    )
    hist = o.groupBy("treated", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    wg = Window.partitionBy("treated").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("treated")
    cdf = hist.withColumn("cum", F.sum("c").over(wg).cast("bigint")).withColumn(
        "n", F.sum("c").over(wall).cast("bigint")
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(25), F.lit(50), F.lit(75))).alias("q")
    )
    j = cdf.crossJoin(F.broadcast(qs))
    # ceil-rank target r = ceil(n*q/100) via cum*100 >= n*q; the ~95%
    # rank bounds r ± 1.96*sqrt(n*(q/100)*(1-q/100)) floor-quantized
    per = j.groupBy("treated", "q").agg(
        F.max("n").alias("n"),
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * F.col("q"), F.col("cents"))).alias(
            "qv"
        ),
        F.min(
            F.when(
                F.col("cum")
                >= F.expr(
                    "CAST(CEIL(CAST(n AS DOUBLE) * CAST(q AS DOUBLE) / 100"
                    " - CAST(1.96 AS DOUBLE) * SQRT(CAST(n AS DOUBLE)"
                    "   * (CAST(q AS DOUBLE) / 100)"
                    "   * (CAST(1 AS DOUBLE) - CAST(q AS DOUBLE) / 100))) AS BIGINT)"
                ),
                F.col("cents"),
            )
        ).alias("qlo"),
        F.min(
            F.when(
                F.col("cum")
                >= F.expr(
                    "CAST(CEIL(CAST(n AS DOUBLE) * CAST(q AS DOUBLE) / 100"
                    " + CAST(1.96 AS DOUBLE) * SQRT(CAST(n AS DOUBLE)"
                    "   * (CAST(q AS DOUBLE) / 100)"
                    "   * (CAST(1 AS DOUBLE) - CAST(q AS DOUBLE) / 100))) AS BIGINT)"
                ),
                F.col("cents"),
            )
        ).alias("qhi"),
    )
    # r11 opt: `per` (6 rows) is read by BOTH the treated and control
    # branches of the closing self-join — without a cut each branch
    # re-executes the orders⋈customer join + histogram-CDF (guide
    # §2.1; lazy per the r7 minhash_eval precedent for tiny frames).
    per = per.localCheckpoint(eager=False)
    t = per.where("treated").select(
        "q",
        F.col("n").alias("n_treated"),
        F.col("qv").alias("q_treated"),
        F.col("qlo").alias("t_lo"),
        F.col("qhi").alias("t_hi"),
    )
    c = per.where(~F.col("treated")).select(
        "q",
        F.col("n").alias("n_control"),
        F.col("qv").alias("q_control"),
        F.col("qlo").alias("c_lo"),
        F.col("qhi").alias("c_hi"),
    )
    return (
        t.join(c, "q")
        .select(
            F.col("q").cast("bigint").alias("quantile_pct"),
            "n_treated",
            "n_control",
            "q_treated",
            "q_control",
            (F.col("q_treated") - F.col("q_control")).cast("bigint").alias("qte_cents"),
            # conservative CI: effect bounds from opposite-side rank bounds
            (F.col("t_lo") - F.col("c_hi")).cast("bigint").alias("qte_lo_cents"),
            (F.col("t_hi") - F.col("c_lo")).cast("bigint").alias("qte_hi_cents"),
        )
        .orderBy("quantile_pct")
    )


QTE_SQL = """
WITH o AS (
  SELECT c_mktsegment = 'BUILDING' AS treated,
         CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
hist AS (
  SELECT treated, cents, CAST(COUNT(*) AS BIGINT) AS c FROM o GROUP BY 1, 2
),
cdf AS (
  SELECT treated, cents, c,
         CAST(SUM(c) OVER (PARTITION BY treated ORDER BY cents
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY treated) AS BIGINT) AS n
  FROM hist
),
qs AS (SELECT q FROM (VALUES (25), (50), (75)) v(q)),
per AS (
  SELECT treated, q,
         MAX(n) AS n,
         MIN(CASE WHEN cum * 100 >= n * q THEN cents END) AS qv,
         MIN(CASE WHEN cum >= CAST(CEIL(CAST(n AS DOUBLE) * CAST(q AS DOUBLE) / 100
                  - CAST(1.96 AS DOUBLE) * SQRT(CAST(n AS DOUBLE)
                    * (CAST(q AS DOUBLE) / 100)
                    * (CAST(1 AS DOUBLE) - CAST(q AS DOUBLE) / 100))) AS BIGINT)
                  THEN cents END) AS qlo,
         MIN(CASE WHEN cum >= CAST(CEIL(CAST(n AS DOUBLE) * CAST(q AS DOUBLE) / 100
                  + CAST(1.96 AS DOUBLE) * SQRT(CAST(n AS DOUBLE)
                    * (CAST(q AS DOUBLE) / 100)
                    * (CAST(1 AS DOUBLE) - CAST(q AS DOUBLE) / 100))) AS BIGINT)
                  THEN cents END) AS qhi
  FROM cdf CROSS JOIN qs
  GROUP BY 1, 2
)
SELECT CAST(t.q AS BIGINT) AS quantile_pct,
       t.n AS n_treated,
       c.n AS n_control,
       t.qv AS q_treated,
       c.qv AS q_control,
       CAST(t.qv - c.qv AS BIGINT) AS qte_cents,
       CAST(t.qlo - c.qhi AS BIGINT) AS qte_lo_cents,
       CAST(t.qhi - c.qlo AS BIGINT) AS qte_hi_cents
FROM (SELECT * FROM per WHERE treated) t
JOIN (SELECT * FROM per WHERE NOT treated) c USING (q)
ORDER BY 1
"""

QUERIES["orders_quantile_treatment_effect"] = orders_quantile_treatment_effect
ORACLE["orders_quantile_treatment_effect"] = QTE_SQL


# ---------------------------------------------------------------------------
# lineitem_fwl_partialled_regression — Frisch-Waugh-Lovell two-stage
# partialling (round 10)
# ---------------------------------------------------------------------------


def lineitem_fwl_partialled_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frisch–Waugh–Lovell partialled regression — the double-ML
    skeleton: the effect of discount on net revenue CONTROLLING for
    quantity, computed by residualizing BOTH sides on the control and
    regressing residual-on-residual (provably equal to the
    multivariate OLS coefficient — the property test checks exactly
    that against numpy's 2-regressor solve). The naive uncontrolled
    slope is emitted beside it; on this fixture quantity is
    independent of discount so the two agree — the honest null for
    the confounding GAP, while the estimator itself is fully
    exercised.

    Engine-exact: stage-1 coefficients are FLOOR-e6/trunc-DIV
    integers broadcast back (the BP discipline); residuals are exact
    e6-scaled integers; the stage-2 slope is ONE integer division
    (Σe_y·e_z·1e6 DIV Σe_z² — trunc on both engines, quotient
    n-independent). Scale: two passes (stats agg + residual agg),
    model-sized broadcast between."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT)").alias("q"),
        F.expr("CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)").alias("z"),
        F.expr(
            "CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))"
            " * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))), 2)"
            " * 100 AS BIGINT)"
        ).alias("y"),
    )
    d38 = "decimal(38,0)"
    q38 = F.expr("CAST(q AS DECIMAL(38,0))")
    y38 = F.expr("CAST(y AS DECIMAL(38,0))")
    z38 = F.expr("CAST(z AS DECIMAL(38,0))")
    s1 = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(q38).cast(d38).alias("sq"),
        F.sum(y38).cast(d38).alias("sy"),
        F.sum(z38).cast(d38).alias("sz"),
        F.sum(q38 * q38).cast(d38).alias("sqq"),
        F.sum(q38 * y38).cast(d38).alias("sqy"),
        F.sum(q38 * z38).cast(d38).alias("sqz"),
        F.sum(z38 * z38).cast(d38).alias("szz"),
        F.sum(z38 * y38).cast(d38).alias("szy"),
    ).select(
        "n",
        "sq",
        "sy",
        "sz",
        "szz",
        "szy",
        F.expr(
            "CAST((n * sqy - sq * sy) * 1000000 DIV (n * sqq - sq * sq)"
            " AS DECIMAL(38,0))"
        ).alias("byq_e6"),
        F.expr(
            "CAST((n * sqz - sq * sz) * 1000000 DIV (n * sqq - sq * sq)"
            " AS DECIMAL(38,0))"
        ).alias("bzq_e6"),
    ).select(
        "n",
        "byq_e6",
        "bzq_e6",
        "szz",
        "szy",
        "sz",
        "sy",
        F.expr("CAST((sy * 1000000 - byq_e6 * sq) DIV n AS DECIMAL(38,0))").alias(
            "ayq_e6"
        ),
        F.expr("CAST((sz * 1000000 - bzq_e6 * sq) DIV n AS DECIMAL(38,0))").alias(
            "azq_e6"
        ),
    )
    r = li.crossJoin(F.broadcast(s1)).select(
        "n",
        "byq_e6",
        "bzq_e6",
        "szz",
        "szy",
        "sz",
        "sy",
        F.expr(
            "CAST(y AS DECIMAL(38,0)) * 1000000 - ayq_e6"
            " - byq_e6 * CAST(q AS DECIMAL(38,0))"
        ).alias("ey"),
        F.expr(
            "CAST(z AS DECIMAL(38,0)) * 1000000 - azq_e6"
            " - bzq_e6 * CAST(q AS DECIMAL(38,0))"
        ).alias("ez"),
    )
    agg = r.groupBy("n", "byq_e6", "bzq_e6", "szz", "szy", "sz", "sy").agg(
        F.sum(F.expr("ey * ez DIV 1000000")).cast(d38).alias("seyz_e6"),
        F.sum(F.expr("ez * ez DIV 1000000")).cast(d38).alias("sezz_e6"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.expr("CAST(byq_e6 AS BIGINT)").alias("b_y_on_qty_e6"),
        F.expr("CAST(bzq_e6 AS BIGINT)").alias("b_disc_on_qty_e6"),
        F.expr("CAST(seyz_e6 * 1000000 DIV sezz_e6 AS BIGINT)").alias(
            "partialled_effect_e6"
        ),
        F.expr(
            "CAST((n * szy - sz * sy) * 1000000 DIV (n * szz - sz * sz) AS BIGINT)"
        ).alias("naive_effect_e6"),
    )


FWL_SQL = """
WITH li AS (
  SELECT CAST(CAST(l_quantity AS DECIMAL(12,2)) AS BIGINT) AS q,
         CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS z,
         CAST(ROUND(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2))), 2)
              * 100 AS BIGINT) AS y
  FROM lineitem
),
s1 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(q AS HUGEINT)) AS HUGEINT) AS sq,
         CAST(SUM(CAST(y AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(z AS HUGEINT)) AS HUGEINT) AS sz,
         CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS sqq,
         CAST(SUM(CAST(q AS HUGEINT) * y) AS HUGEINT) AS sqy,
         CAST(SUM(CAST(q AS HUGEINT) * z) AS HUGEINT) AS sqz,
         CAST(SUM(CAST(z AS HUGEINT) * z) AS HUGEINT) AS szz,
         CAST(SUM(CAST(z AS HUGEINT) * y) AS HUGEINT) AS szy
  FROM li
),
coef AS (
  SELECT n, sq, sy, sz, szz, szy,
         (n * sqy - sq * sy) * 1000000 // (n * sqq - sq * sq) AS byq_e6,
         (n * sqz - sq * sz) * 1000000 // (n * sqq - sq * sq) AS bzq_e6
  FROM s1
),
coef2 AS (
  SELECT n, byq_e6, bzq_e6, szz, szy, sz, sy,
         (sy * 1000000 - byq_e6 * sq) // n AS ayq_e6,
         (sz * 1000000 - bzq_e6 * sq) // n AS azq_e6,
         sq
  FROM coef
),
res AS (
  SELECT c.n, c.byq_e6, c.bzq_e6, c.szz, c.szy, c.sz, c.sy,
         (CAST(l.y AS HUGEINT) * 1000000 - c.ayq_e6 - c.byq_e6 * l.q) AS ey,
         (CAST(l.z AS HUGEINT) * 1000000 - c.azq_e6 - c.bzq_e6 * l.q) AS ez
  FROM li l CROSS JOIN coef2 c
),
agg AS (
  SELECT n, byq_e6, bzq_e6, szz, szy, sz, sy,
         CAST(SUM(ey * ez // 1000000) AS HUGEINT) AS seyz_e6,
         CAST(SUM(ez * ez // 1000000) AS HUGEINT) AS sezz_e6
  FROM res GROUP BY 1, 2, 3, 4, 5, 6, 7
)
SELECT CAST(n AS BIGINT) AS n,
       CAST(byq_e6 AS BIGINT) AS b_y_on_qty_e6,
       CAST(bzq_e6 AS BIGINT) AS b_disc_on_qty_e6,
       CAST(seyz_e6 * 1000000 // sezz_e6 AS BIGINT) AS partialled_effect_e6,
       CAST((n * szy - sz * sy) * 1000000 // (n * szz - sz * sz) AS BIGINT)
         AS naive_effect_e6
FROM agg
"""

QUERIES["lineitem_fwl_partialled_regression"] = lineitem_fwl_partialled_regression
ORACLE["lineitem_fwl_partialled_regression"] = FWL_SQL


# ---------------------------------------------------------------------------
# customers_log_rank_test — two-group survival comparison (round 10)
# ---------------------------------------------------------------------------


def customers_log_rank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank (Mantel–Cox) test comparing the repurchase-interval
    survival curves of the AUTOMOBILE vs BUILDING market segments —
    the hypothesis test that belongs NEXT TO customers_survival_km:
    KM draws the two curves, the log-rank statistic says whether the
    gap between them is noise. Uses the exact same span derivation
    (consecutive-order gaps are events, the tail to the corpus
    horizon is right-censored).

    Determinism: at each event time the hypergeometric terms
    E₁ₜ = d·r₁/n and Vₜ = d·r₁·r₂·(n−d)/(n²(n−1)) are integer-DIV'd
    at 1e9 scale per term (both engines truncate identically), all
    sufficient statistics exact DECIMAL(38,0)/HUGEINT; ONE double
    division at emission for χ². Denominators stay decimal so n²(n−1)
    survives any corpus size.

    Scale: one custkey-window pass over orders (+ a key join to
    customer — no broadcast hint: the dim scales with SF, AQE
    decides), then everything runs on the duration histogram."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    seg = c.where(F.col("c_mktsegment").isin("AUTOMOBILE", "BUILDING")).select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(2).alias("g"),
    )
    oo = o.join(seg, o.o_custkey == seg.c_custkey).select("o_custkey", "o_orderdate", "g")
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    spans = (
        oo.withColumn("nxt", F.lead("o_orderdate").over(w))
        .crossJoin(F.broadcast(horizon))
        .select(
            "g",
            F.when(F.col("nxt").isNotNull(), F.datediff("nxt", "o_orderdate"))
            .otherwise(F.datediff("h", "o_orderdate"))
            .alias("t"),
            F.col("nxt").isNotNull().alias("is_event"),
        )
        .where(F.col("t") > 0)
    )
    hist = spans.groupBy("t").agg(
        F.expr("CAST(SUM(CASE WHEN g = 1 AND is_event THEN 1 ELSE 0 END) AS BIGINT)").alias("d1"),
        F.expr("CAST(SUM(CASE WHEN g = 2 AND is_event THEN 1 ELSE 0 END) AS BIGINT)").alias("d2"),
        F.expr("CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)").alias("tot1"),
        F.expr("CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT)").alias("tot2"),
    )
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    risk = hist.select(
        "t",
        "d1",
        "d2",
        (F.sum("tot1").over(wall) - F.coalesce(F.sum("tot1").over(wcum), F.lit(0))).alias("r1"),
        (F.sum("tot2").over(wall) - F.coalesce(F.sum("tot2").over(wcum), F.lit(0))).alias("r2"),
    ).where((F.col("d1") + F.col("d2")) > 0)
    terms = risk.select(
        "d1",
        F.expr(
            "CAST((CAST(d1 + d2 AS DECIMAL(38,0)) * r1 * 1000000000)"
            " DIV CAST(r1 + r2 AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("e1_e9"),
        F.expr(
            "CASE WHEN r1 + r2 > 1 THEN CAST("
            "(CAST(d1 + d2 AS DECIMAL(38,0)) * r1 * r2 * (r1 + r2 - d1 - d2) * 1000000000)"
            " DIV (CAST(r1 + r2 AS DECIMAL(38,0)) * (r1 + r2) * (r1 + r2 - 1)) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("v_e9"),
    )
    agg = terms.agg(
        F.expr("CAST(SUM(d1) AS DECIMAL(38,0))").alias("o1"),
        F.expr("CAST(SUM(e1_e9) AS DECIMAL(38,0))").alias("e1"),
        F.expr("CAST(SUM(v_e9) AS DECIMAL(38,0))").alias("v"),
    )
    tots = spans.groupBy().agg(
        F.expr("CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)").alias("n1_spans"),
        F.expr("CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT)").alias("n2_spans"),
    )
    return agg.crossJoin(F.broadcast(tots)).select(
        "n1_spans",
        "n2_spans",
        F.expr("CAST(o1 AS BIGINT)").alias("observed_g1"),
        F.expr("ROUND(CAST(e1 AS DOUBLE) / CAST(1000000000 AS DOUBLE), 6)").alias("expected_g1"),
        F.expr(
            "ROUND((CAST(o1 * 1000000000 - e1 AS DOUBLE) / CAST(1000000000 AS DOUBLE))"
            " * (CAST(o1 * 1000000000 - e1 AS DOUBLE) / CAST(1000000000 AS DOUBLE))"
            " / (CAST(v AS DOUBLE) / CAST(1000000000 AS DOUBLE)), 6)"
        ).alias("chi2"),
        F.expr(
            "CASE WHEN o1 * 1000000000 > e1 THEN 1 WHEN o1 * 1000000000 < e1 THEN -1 ELSE 0 END"
        ).alias("direction_g1"),
    )


CUSTOMERS_LOGRANK_SQL = """
WITH seg AS (
  SELECT c_custkey, CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 2 END AS g
  FROM customer WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING')
),
oo AS (
  SELECT o.o_custkey, o.o_orderdate, s.g
  FROM orders o JOIN seg s ON o.o_custkey = s.c_custkey
),
spans AS (
  SELECT g,
         COALESCE(date_diff('day', o_orderdate, LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate)),
                  date_diff('day', o_orderdate, (SELECT MAX(o_orderdate) FROM orders))) AS t,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) IS NOT NULL AS is_event
  FROM oo
),
spans2 AS (SELECT * FROM spans WHERE t > 0),
hist AS (
  SELECT t,
         CAST(SUM(CASE WHEN g = 1 AND is_event THEN 1 ELSE 0 END) AS BIGINT) AS d1,
         CAST(SUM(CASE WHEN g = 2 AND is_event THEN 1 ELSE 0 END) AS BIGINT) AS d2,
         CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tot1,
         CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS tot2
  FROM spans2 GROUP BY 1
),
risk AS (
  SELECT t, d1, d2,
         SUM(tot1) OVER () - COALESCE(SUM(tot1) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r1,
         SUM(tot2) OVER () - COALESCE(SUM(tot2) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS r2
  FROM hist
),
terms AS (
  SELECT d1,
         CAST((CAST(d1 + d2 AS HUGEINT) * r1 * 1000000000) // CAST(r1 + r2 AS HUGEINT) AS BIGINT) AS e1_e9,
         CASE WHEN r1 + r2 > 1 THEN CAST(
           (CAST(d1 + d2 AS HUGEINT) * r1 * r2 * (r1 + r2 - d1 - d2) * 1000000000)
           // (CAST(r1 + r2 AS HUGEINT) * (r1 + r2) * (r1 + r2 - 1)) AS BIGINT)
         ELSE CAST(0 AS BIGINT) END AS v_e9
  FROM risk WHERE d1 + d2 > 0
),
agg AS (
  SELECT CAST(SUM(d1) AS HUGEINT) AS o1,
         CAST(SUM(e1_e9) AS HUGEINT) AS e1,
         CAST(SUM(v_e9) AS HUGEINT) AS v
  FROM terms
),
tots AS (
  SELECT CAST(SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_spans,
         CAST(SUM(CASE WHEN g = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2_spans
  FROM spans2
)
SELECT t.n1_spans, t.n2_spans,
       CAST(a.o1 AS BIGINT) AS observed_g1,
       ROUND(CAST(a.e1 AS DOUBLE) / CAST(1000000000 AS DOUBLE), 6) AS expected_g1,
       ROUND((CAST(a.o1 * 1000000000 - a.e1 AS DOUBLE) / CAST(1000000000 AS DOUBLE))
             * (CAST(a.o1 * 1000000000 - a.e1 AS DOUBLE) / CAST(1000000000 AS DOUBLE))
             / (CAST(a.v AS DOUBLE) / CAST(1000000000 AS DOUBLE)), 6) AS chi2,
       CASE WHEN a.o1 * 1000000000 > a.e1 THEN 1 WHEN a.o1 * 1000000000 < a.e1 THEN -1 ELSE 0 END AS direction_g1
FROM agg a, tots t
"""

QUERIES["customers_log_rank_test"] = customers_log_rank_test
ORACLE["customers_log_rank_test"] = CUSTOMERS_LOGRANK_SQL


# ---------------------------------------------------------------------------
# customers_interpurchase_cv — purchase-regularity classification
# (round 10)
# ---------------------------------------------------------------------------


def customers_interpurchase_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpurchase-time regularity per market segment: CV² of the
    day gaps between a customer's consecutive orders classifies the
    segment's buying process — CV² ≪ 1 is clockwork (replenishment),
    ≈ 1 memoryless (Poisson), ≫ 1 bursty (promotion-driven) — the
    one-number diagnostic that says whether the survival-analysis
    machinery (customers_survival_km and friends) should model
    renewal or clustering.

    Engine-exact: gaps are integer days; CV² = (m·Σg² − (Σg)²)·1e6
    DIV (Σg)² is one cross-multiplied integer-ppm form (BIGINT-safe
    by construction: gaps partition a bounded span, so Σg² ≤
    max_g·Σg — the r7 inter-arrival moment bound); the class label
    is a CASE on the same integer.

    Scale: one custkey-window pass + a |segments| agg."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    gaps = (
        o.withColumn("nxt", F.lead("o_orderdate").over(w))
        .where(F.col("nxt").isNotNull())
        .select("o_custkey", F.datediff("nxt", "o_orderdate").cast("bigint").alias("g"))
        .where(F.col("g") > 0)
    )
    seg = gaps.join(c, gaps.o_custkey == c.c_custkey).groupBy("c_mktsegment").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("m"),
        F.expr("CAST(SUM(g) AS DECIMAL(38,0))").alias("s1"),
        F.expr("CAST(SUM(g * g) AS DECIMAL(38,0))").alias("s2"),
    )
    return seg.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("m").alias("n_gaps"),
        F.expr("CAST(s1 * 1000 DIV m AS BIGINT)").alias("mean_gap_days_x1000"),
        F.expr("CAST((m * s2 - s1 * s1) * 1000000 DIV (s1 * s1) AS BIGINT)").alias(
            "cv2_ppm"
        ),
        F.expr(
            "CASE WHEN (m * s2 - s1 * s1) * 1000000 DIV (s1 * s1) < 700000"
            " THEN 'regular' WHEN (m * s2 - s1 * s1) * 1000000 DIV (s1 * s1) <= 1300000"
            " THEN 'poisson' ELSE 'bursty' END"
        ).alias("regime"),
    ).orderBy("segment")


CUSTOMERS_IPCV_SQL = """
WITH gaps AS (
  SELECT o_custkey,
         CAST(date_diff('day', o_orderdate,
              LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate)) AS BIGINT) AS g
  FROM orders
),
gaps2 AS (SELECT * FROM gaps WHERE g > 0),
seg AS (
  SELECT c.c_mktsegment,
         CAST(COUNT(*) AS BIGINT) AS m,
         CAST(SUM(g) AS HUGEINT) AS s1,
         CAST(SUM(g * g) AS HUGEINT) AS s2
  FROM gaps2 g JOIN customer c ON g.o_custkey = c.c_custkey
  GROUP BY 1
)
SELECT c_mktsegment AS segment,
       m AS n_gaps,
       CAST(s1 * 1000 // m AS BIGINT) AS mean_gap_days_x1000,
       CAST((m * s2 - s1 * s1) * 1000000 // (s1 * s1) AS BIGINT) AS cv2_ppm,
       CASE WHEN (m * s2 - s1 * s1) * 1000000 // (s1 * s1) < 700000 THEN 'regular'
            WHEN (m * s2 - s1 * s1) * 1000000 // (s1 * s1) <= 1300000 THEN 'poisson'
            ELSE 'bursty' END AS regime
FROM seg
ORDER BY segment
"""

QUERIES["customers_interpurchase_cv"] = customers_interpurchase_cv
ORACLE["customers_interpurchase_cv"] = CUSTOMERS_IPCV_SQL


# ---------------------------------------------------------------------------
# nations_correspondence_analysis — contingency CA first axis
# (round 10)
# ---------------------------------------------------------------------------

_CA_ITERS = 60


def _ca_tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — matches Spark DIV and
    DuckDB // on negatives (the house rule: never Python // in a
    fold an oracle checks)."""
    return abs(a) // b * (1 if a >= 0 else -1)


def nations_correspondence_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correspondence analysis (first principal axis) of the
    nation × order-priority contingency table: which priorities
    load which way on the dominant association axis, how much of
    the total inertia (χ²/N) that axis explains, and each
    priority's mass — the dimensionality view that
    orders_chi2_independence's single number can't give (χ² says
    "dependent"; CA says HOW).

    Determinism: standardized residuals A_ij = (N·n_ij − R_iC_j) /
    (√N·√(R_iC_j)) are computed from exact integers in one shared
    double expression and e6-rounded PER CELL; M = AᵀA is an exact
    integer 5×5; the power iteration runs 60 steps of PURE INTEGER
    ops (w = M·v; v' = w·1e6 DIV max|w|, truncation toward zero)
    — the model-sized matrix crosses the driver (house contract:
    corpus touched once, only the MODEL iterates), and the DuckDB
    oracle replays the identical integer recursion as a recursive
    CTE, so the gate checks the WHOLE pipeline including the
    eigensolve. Sign fixed by the first nonzero coordinate.

    Scale: one join+groupBy to 125 cells; everything after is
    5×5-sized."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_nationkey", "o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    wr = Window.partitionBy("c_nationkey")
    wc = Window.partitionBy("o_orderpriority")
    wall = Window.partitionBy()
    wj = Window.orderBy("o_orderpriority")
    a = cells.select(
        "c_nationkey",
        "o_orderpriority",
        F.expr("CAST(SUM(n) OVER (PARTITION BY c_nationkey) AS BIGINT)").alias("ri"),
        F.expr("CAST(SUM(n) OVER (PARTITION BY o_orderpriority) AS BIGINT)").alias("cj"),
        F.expr("CAST(SUM(n) OVER () AS BIGINT)").alias("nn"),
        "n",
    ).select(
        "c_nationkey",
        "o_orderpriority",
        "cj",
        "nn",
        F.expr(
            "CAST(ROUND(CAST(nn * n - ri * cj AS DOUBLE)"
            " / (SQRT(CAST(nn AS DOUBLE)) * SQRT(CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)))"
            " * CAST(1000000 AS DOUBLE)) AS BIGINT)"
        ).alias("a_e6"),
    )
    jdx = (
        a.select("o_orderpriority")
        .distinct()
        .select("o_orderpriority", F.row_number().over(wj).alias("j"))
    )
    aj = a.join(F.broadcast(jdx), "o_orderpriority")
    m = (
        aj.alias("x")
        .join(aj.alias("y"), F.expr("x.c_nationkey = y.c_nationkey"))
        .groupBy(F.expr("x.j").alias("j"), F.expr("y.j").alias("k"))
        .agg(F.expr("CAST(SUM(x.a_e6 * y.a_e6) AS BIGINT)").alias("m"))
    )
    mrows = {(int(r["j"]), int(r["k"])): int(r["m"]) for r in m.collect()}
    inertia_e6 = sum(v for (j, k), v in mrows.items() if j == k) // 10**6
    masses = {
        r["o_orderpriority"]: (int(r["j"]), int(r["cj"]), int(r["nn"]))
        for r in aj.select("o_orderpriority", "j", "cj", "nn").distinct().collect()
    }
    dim = max(j for j, _, _ in masses.values())
    v = [10**6] * dim
    for _ in range(_CA_ITERS):
        w = [sum(mrows.get((j + 1, k + 1), 0) * v[j] for j in range(dim)) for k in range(dim)]
        mx = max(max(abs(x) for x in w), 1)
        v = [_ca_tdiv(x * 10**6, mx) for x in w]
    first = next(x for x in v if x != 0)
    if first < 0:
        v = [-x for x in v]
    vmv = sum(v[j] * mrows.get((j + 1, k + 1), 0) * v[k] for j in range(dim) for k in range(dim))
    vv = sum(x * x for x in v)
    trace = sum(v2 for (j, k), v2 in mrows.items() if j == k)
    # share = (vᵀMv)·1e6 DIV (vᵀv · trace) with full-precision ints
    share_ppm = _ca_tdiv(vmv * 10**6, max(vv * trace, 1))
    rows = [
        (
            prio,
            j,
            int(v[j - 1]),
            cj * 10**6 // nn,
            int(inertia_e6),
            int(share_ppm),
            int(nn),
        )
        for prio, (j, cj, nn) in sorted(masses.items())
    ]
    return spark.createDataFrame(
        rows,
        "priority STRING, j INT, axis1_coord_e6 BIGINT, col_mass_ppm BIGINT,"
        " total_inertia_e6 BIGINT, axis1_share_ppm BIGINT, n_orders BIGINT",
    )


_CA_W = lambda k, dim: " + ".join(f"mr.m{j}{k} * it.v{j}" for j in range(1, dim + 1))

NATIONS_CA_SQL = f"""
WITH RECURSIVE
o2 AS (
  SELECT c.c_nationkey, o.o_orderpriority
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS MATERIALIZED (
  SELECT c_nationkey, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
  FROM o2 GROUP BY 1, 2
),
a AS MATERIALIZED (
  SELECT c_nationkey, o_orderpriority, cj, nn,
         CAST(ROUND(CAST(nn * n - ri * cj AS DOUBLE)
              / (SQRT(CAST(nn AS DOUBLE)) * SQRT(CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE)))
              * CAST(1000000 AS DOUBLE)) AS BIGINT) AS a_e6
  FROM (
    SELECT c_nationkey, o_orderpriority, n,
           CAST(SUM(n) OVER (PARTITION BY c_nationkey) AS BIGINT) AS ri,
           CAST(SUM(n) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS cj,
           CAST(SUM(n) OVER () AS BIGINT) AS nn
    FROM cells
  )
),
jdx AS MATERIALIZED (
  SELECT o_orderpriority, CAST(ROW_NUMBER() OVER (ORDER BY o_orderpriority) AS INTEGER) AS j
  FROM (SELECT DISTINCT o_orderpriority FROM a)
),
aj AS MATERIALIZED (
  SELECT a.*, jdx.j FROM a JOIN jdx ON a.o_orderpriority = jdx.o_orderpriority
),
m AS MATERIALIZED (
  SELECT x.j AS j, y.j AS k, CAST(SUM(x.a_e6 * y.a_e6) AS HUGEINT) AS m
  FROM aj x JOIN aj y ON x.c_nationkey = y.c_nationkey
  GROUP BY 1, 2
),
mr AS MATERIALIZED (
  SELECT {", ".join(f"SUM(CASE WHEN j = {j} AND k = {k} THEN m ELSE CAST(0 AS HUGEINT) END) AS m{j}{k}" for j in range(1, 6) for k in range(1, 6))}
  FROM m
),
it AS (
  SELECT 0 AS step, {", ".join(f"CAST(1000000 AS HUGEINT) AS v{k}" for k in range(1, 6))}
  UNION ALL
  SELECT it.step + 1,
         {", ".join(f"(({_CA_W(k, 5)}) * 1000000) // GREATEST(GREATEST({', '.join(f'ABS({_CA_W(kk, 5)})' for kk in range(1, 6))}), 1)" for k in range(1, 6))}
  FROM it, mr WHERE it.step < {_CA_ITERS}
),
fin0 AS (SELECT * FROM it WHERE step = {_CA_ITERS}),
fin AS (
  SELECT {", ".join(f"CASE WHEN sgn < 0 THEN -v{k} ELSE v{k} END AS v{k}" for k in range(1, 6))}
  FROM (
    SELECT *, CASE WHEN v1 <> 0 THEN SIGN(v1) WHEN v2 <> 0 THEN SIGN(v2)
                   WHEN v3 <> 0 THEN SIGN(v3) WHEN v4 <> 0 THEN SIGN(v4)
                   ELSE SIGN(v5) END AS sgn
    FROM fin0
  )
),
stats AS (
  SELECT
    ({" + ".join(f"f.v{j} * mr.m{j}{k} * f.v{k}" for j in range(1, 6) for k in range(1, 6))}) AS vmv,
    ({" + ".join(f"f.v{k} * f.v{k}" for k in range(1, 6))}) AS vv,
    ({" + ".join(f"mr.m{k}{k}" for k in range(1, 6))}) AS trace
  FROM fin f, mr
),
scal AS (
  SELECT CAST((SELECT SUM(a_e6 * a_e6) FROM a) // 1000000 AS BIGINT) AS total_inertia_e6,
         CAST(s.vmv * 1000000 // GREATEST(s.vv * s.trace, 1) AS BIGINT) AS axis1_share_ppm
  FROM stats s
)
SELECT jd.o_orderpriority AS priority,
       jd.j,
       CAST(CASE jd.j {" ".join(f"WHEN {k} THEN f.v{k}" for k in range(1, 6))} END AS BIGINT) AS axis1_coord_e6,
       CAST(mass.cj * 1000000 // mass.nn AS BIGINT) AS col_mass_ppm,
       sc.total_inertia_e6,
       sc.axis1_share_ppm,
       CAST(mass.nn AS BIGINT) AS n_orders
FROM jdx jd
JOIN (SELECT DISTINCT o_orderpriority, cj, nn FROM a) mass
  ON jd.o_orderpriority = mass.o_orderpriority,
fin f, scal sc
ORDER BY priority
"""

QUERIES["nations_correspondence_analysis"] = nations_correspondence_analysis
ORACLE["nations_correspondence_analysis"] = NATIONS_CA_SQL


# ---------------------------------------------------------------------------
# lineitem_quantile_regression_profile — L1 trend via slope scan
# (round 10)
# ---------------------------------------------------------------------------


def lineitem_quantile_regression_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median (τ=0.5) regression of daily revenue on time by a
    deterministic profile scan: 21 integer slope candidates spread
    ±100% around the OLS slope; for each, the L1-optimal intercept
    is the LOW MEDIAN of the residuals (exact — that's the quantile
    regression normal equation at fixed slope) and the loss is the
    exact integer Σ|r − a|. The emitted loss profile is the robust
    answer to "is the OLS trend dragged by outlier days" —
    read the argmin against the OLS column (a displaced argmin =
    heavy-tailed revenue days, exactly when orders_durbin_watson's
    OLS machinery needs the robust cross-check).

    Determinism: slopes/intercepts/losses are exact integers at the
    cents·×1000 scale; argmin ties break to the smallest slope.

    Scale: the fixed ~2400-day frame crossJoins a 21-row broadcast
    grid; medians are per-candidate sorted 2400-arrays; one agg."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    daily = o.groupBy("d").agg(F.expr("CAST(SUM(cents) AS DECIMAL(38,0))").alias("y"))
    mind = daily.agg(F.min("d").alias("d0"))
    base = (
        daily.crossJoin(F.broadcast(mind))
        .select(F.expr("CAST(DATEDIFF(d, d0) AS BIGINT)").alias("t"), "y")
        .localCheckpoint(eager=True)
    )
    stats = base.agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("n"),
        F.expr("CAST(SUM(t) AS DECIMAL(38,0))").alias("st"),
        F.expr("SUM(y)").alias("sy"),
        F.expr("CAST(SUM(t * t) AS DECIMAL(38,0))").alias("stt"),
        F.expr("SUM(CAST(t AS DECIMAL(38,0)) * y)").alias("sty"),
    ).select(
        F.expr(
            "CAST((n * sty - st * sy) * 1000 DIV (n * stt - st * st) AS BIGINT)"
        ).alias("b_ols_e3")
    )
    grid = spark.range(0, 21).select(F.expr("CAST(id AS INT)").alias("j"))
    cand = (
        stats.crossJoin(grid)
        .select(
            "j",
            "b_ols_e3",
            F.expr(
                "b_ols_e3 + (j - 10) * GREATEST(ABS(b_ols_e3) DIV 10, CAST(1 AS BIGINT))"
            ).alias("b_e3"),
        )
        .localCheckpoint(eager=True)
    )
    resid = base.crossJoin(F.broadcast(cand)).select(
        "j", "b_e3", "b_ols_e3", F.expr("y * 1000 - CAST(b_e3 AS DECIMAL(38,0)) * t").alias("r")
    )
    med = resid.groupBy("j", "b_e3", "b_ols_e3").agg(
        F.expr(
            "element_at(array_sort(collect_list(r)), CAST((COUNT(*) + 1) DIV 2 AS INT))"
        ).alias("a")
    )
    loss = (
        resid.join(F.broadcast(med.select("j", "a")), "j")
        .groupBy("j", "b_e3", "b_ols_e3")
        .agg(F.expr("CAST(SUM(ABS(r - a)) AS DECIMAL(38,0))").alias("l1"))
    )
    wmin = Window.partitionBy()
    return (
        loss.join(F.broadcast(med.select("j", "a")), "j")
        .withColumn("lmin", F.expr("MIN(l1) OVER ()"))
        .withColumn("jbest", F.expr("MIN(CASE WHEN l1 = lmin THEN j END) OVER ()"))
        .select(
            "j",
            F.col("b_e3").alias("slope_cents_per_day_x1000"),
            F.col("b_ols_e3").alias("ols_slope_x1000"),
            F.expr("CAST(a DIV 1000 AS BIGINT)").alias("intercept_cents"),
            F.expr("CAST(l1 DIV 1000 AS BIGINT)").alias("l1_loss_cents"),
            F.expr("CAST(CASE WHEN j = jbest THEN 1 ELSE 0 END AS INT)").alias("is_best"),
        )
        .orderBy("j")
    )


LINEITEM_QRP_SQL = """
WITH daily AS MATERIALIZED (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS y
  FROM orders GROUP BY 1
),
base AS MATERIALIZED (
  SELECT CAST(date_diff('day', (SELECT MIN(d) FROM daily), d) AS BIGINT) AS t, y
  FROM daily
),
stats AS (
  SELECT CAST((n * sty - st * sy) * 1000 // (n * stt - st * st) AS BIGINT) AS b_ols_e3
  FROM (
    SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(t) AS HUGEINT) AS st, SUM(y) AS sy,
           CAST(SUM(t * t) AS HUGEINT) AS stt, SUM(CAST(t AS HUGEINT) * y) AS sty
    FROM base
  )
),
cand AS MATERIALIZED (
  SELECT CAST(g.j AS INTEGER) AS j, s.b_ols_e3,
         s.b_ols_e3 + (g.j - 10) * GREATEST(ABS(s.b_ols_e3) // 10, 1) AS b_e3
  FROM stats s, (SELECT UNNEST(generate_series(0, 20)) AS j) g
),
resid AS MATERIALIZED (
  SELECT c.j, c.b_e3, c.b_ols_e3, b.y * 1000 - CAST(c.b_e3 AS HUGEINT) * b.t AS r
  FROM base b, cand c
),
med AS MATERIALIZED (
  SELECT j, b_e3, b_ols_e3,
         list_extract(list_sort(list(r)), CAST((COUNT(*) + 1) // 2 AS BIGINT)) AS a
  FROM resid GROUP BY 1, 2, 3
),
loss AS (
  SELECT r.j, r.b_e3, r.b_ols_e3, m.a, CAST(SUM(ABS(r.r - m.a)) AS HUGEINT) AS l1
  FROM resid r JOIN med m ON r.j = m.j
  GROUP BY 1, 2, 3, 4
)
SELECT j,
       CAST(b_e3 AS BIGINT) AS slope_cents_per_day_x1000,
       CAST(b_ols_e3 AS BIGINT) AS ols_slope_x1000,
       CAST(a // 1000 AS BIGINT) AS intercept_cents,
       CAST(l1 // 1000 AS BIGINT) AS l1_loss_cents,
       CAST(CASE WHEN j = (SELECT MIN(CASE WHEN l1 = m2 THEN j END)
                           FROM loss, (SELECT MIN(l1) AS m2 FROM loss))
            THEN 1 ELSE 0 END AS INTEGER) AS is_best
FROM loss
ORDER BY j
"""

QUERIES["lineitem_quantile_regression_profile"] = lineitem_quantile_regression_profile
ORACLE["lineitem_quantile_regression_profile"] = LINEITEM_QRP_SQL


# ---------------------------------------------------------------------------
# nations_product_diversity — assortment diversity indices (round 10)
# ---------------------------------------------------------------------------


def nations_product_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-assortment diversity per supplier nation: Hurlbert's
    PIE / Simpson diversity 1 − Σnₜ(nₜ−1)/(N(N−1)) (the probability
    two random shipped items differ in part type — exact, no
    plug-in bias) and Shannon entropy over part-type shares — the
    assortment-breadth ranking a category planner reads next to
    suppliers_hhi_concentration (HHI measures supplier dominance;
    this measures what the nation actually ships).

    Engine-exact: Simpson is one cross-multiplied integer-ppm form
    in DECIMAL/HUGEINT (N² survives any SF); Shannon terms are
    e6-rounded per type (transcendental rule) and integer-summed.

    Scale: two key joins (supplier is NOT broadcast-hinted — it
    scales with SF, AQE decides; nation is fixed-cardinality), one
    (nation, type) agg, a |nations| close."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("s_nationkey", "p_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    wn = Window.partitionBy("s_nationkey")
    terms = cells.select(
        "s_nationkey",
        "c",
        F.expr("CAST(SUM(c) OVER (PARTITION BY s_nationkey) AS BIGINT)").alias("nn"),
    ).select(
        "s_nationkey",
        "nn",
        F.expr("CAST(c AS DECIMAL(38,0)) * (c - 1)").alias("pair2"),
        F.expr(
            "CAST(ROUND(-(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))"
            " * LN(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))"
            " * CAST(1000000 AS DOUBLE)) AS BIGINT)"
        ).alias("h_e6"),
    )
    agg = terms.groupBy("s_nationkey", "nn").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_types"),
        F.expr("CAST(SUM(pair2) AS DECIMAL(38,0))").alias("same2"),
        F.expr("CAST(SUM(h_e6) AS BIGINT)").alias("shannon_e6"),
    )
    return (
        agg.join(F.broadcast(n), agg.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("nn").alias("n_items"),
            "n_types",
            F.expr(
                "CAST((CAST(nn AS DECIMAL(38,0)) * (nn - 1) - same2) * 1000000"
                " DIV (CAST(nn AS DECIMAL(38,0)) * (nn - 1)) AS BIGINT)"
            ).alias("simpson_pie_ppm"),
            "shannon_e6",
        )
        .orderBy("nation")
    )


NATIONS_DIVERSITY_SQL = """
WITH cells AS (
  SELECT s.s_nationkey, p.p_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
terms AS (
  SELECT s_nationkey, nn,
         CAST(c AS HUGEINT) * (c - 1) AS pair2,
         CAST(ROUND(-(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
              * LN(CAST(c AS DOUBLE) / CAST(nn AS DOUBLE))
              * CAST(1000000 AS DOUBLE)) AS BIGINT) AS h_e6
  FROM (
    SELECT s_nationkey, c,
           CAST(SUM(c) OVER (PARTITION BY s_nationkey) AS BIGINT) AS nn
    FROM cells
  )
),
agg AS (
  SELECT s_nationkey, nn,
         CAST(COUNT(*) AS BIGINT) AS n_types,
         CAST(SUM(pair2) AS HUGEINT) AS same2,
         CAST(SUM(h_e6) AS BIGINT) AS shannon_e6
  FROM terms GROUP BY 1, 2
)
SELECT n.n_name AS nation,
       a.nn AS n_items,
       a.n_types,
       CAST((CAST(a.nn AS HUGEINT) * (a.nn - 1) - a.same2) * 1000000
            // (CAST(a.nn AS HUGEINT) * (a.nn - 1)) AS BIGINT) AS simpson_pie_ppm,
       a.shannon_e6
FROM agg a JOIN nation n ON a.s_nationkey = n.n_nationkey
ORDER BY nation
"""

QUERIES["nations_product_diversity"] = nations_product_diversity
ORACLE["nations_product_diversity"] = NATIONS_DIVERSITY_SQL


# ---------------------------------------------------------------------------
# customers_dormancy_reactivation — win-back analytics (round 10)
# ---------------------------------------------------------------------------


def customers_dormancy_reactivation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dormancy/reactivation profile per market segment: a dormancy
    spell is an interpurchase gap above the global p90 gap; every
    closed spell IS a reactivation (the next order ends it), and the
    censored tail (last order → horizon, > p90, no next order) is an
    open dormancy — the win-back funnel numbers
    (rate, typical overshoot) a retention team reads next to the
    survival stack, which models time-to-event but not "how many
    came back".

    Engine-exact: the threshold is a ceil-rank order statistic from
    the closed-gap histogram; rates are integer ppm; the mean
    dormancy overshoot (gap − u) is an exact integer DIV ×1000.

    Scale: one custkey window pass, one histogram-CDF, one segment
    agg."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    horizon = o.agg(F.max("o_orderdate").alias("h"))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate")
    spans = (
        o.withColumn("nxt", F.lead("o_orderdate").over(w))
        .crossJoin(F.broadcast(horizon))
        .select(
            "o_custkey",
            F.when(F.col("nxt").isNotNull(), F.datediff("nxt", "o_orderdate"))
            .otherwise(F.datediff("h", "o_orderdate"))
            .alias("t"),
            F.col("nxt").isNotNull().alias("is_closed"),
        )
        .where(F.col("t") > 0)
        .localCheckpoint(eager=True)
    )
    hist = spans.where("is_closed").groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    thr = (
        hist.withColumn("cum", F.sum("cnt").over(wc).cast("bigint"))
        .withColumn("n", F.sum("cnt").over(wall).cast("bigint"))
        .agg(F.min(F.when(F.col("cum") * 100 >= F.col("n") * 90, F.col("t"))).alias("u"))
    )
    seg = (
        spans.crossJoin(F.broadcast(thr))
        .where(F.col("t") > F.col("u"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment", "u")
        .agg(
            F.expr("CAST(SUM(CASE WHEN is_closed THEN 1 ELSE 0 END) AS BIGINT)").alias(
                "reactivated"
            ),
            F.expr("CAST(SUM(CASE WHEN is_closed THEN 0 ELSE 1 END) AS BIGINT)").alias(
                "still_dormant"
            ),
            F.expr(
                "CAST(SUM(CASE WHEN is_closed THEN CAST(t - u AS DECIMAL(38,0)) ELSE 0 END)"
                " AS DECIMAL(38,0))"
            ).alias("excess_sum"),
        )
    )
    return seg.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("u").cast("bigint").alias("dormancy_threshold_days"),
        "reactivated",
        "still_dormant",
        F.expr("reactivated * 1000000 DIV (reactivated + still_dormant)").alias(
            "reactivation_rate_ppm"
        ),
        F.expr("CAST(excess_sum * 1000 DIV GREATEST(reactivated, 1) AS BIGINT)").alias(
            "mean_overshoot_days_x1000"
        ),
    ).orderBy("segment")


CUSTOMERS_DORMANCY_SQL = """
WITH spans AS MATERIALIZED (
  SELECT o_custkey,
         COALESCE(date_diff('day', o_orderdate,
              LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate)),
              date_diff('day', o_orderdate, (SELECT MAX(o_orderdate) FROM orders))) AS t,
         LEAD(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) IS NOT NULL AS is_closed
  FROM orders
),
spans2 AS MATERIALIZED (SELECT * FROM spans WHERE t > 0),
hist AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt FROM spans2 WHERE is_closed GROUP BY 1
),
cdf AS (
  SELECT t, CAST(SUM(cnt) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM hist
),
thr AS (SELECT MIN(CASE WHEN cum * 100 >= n * 90 THEN t END) AS u FROM cdf),
seg AS (
  SELECT c.c_mktsegment, thr.u,
         CAST(SUM(CASE WHEN s.is_closed THEN 1 ELSE 0 END) AS BIGINT) AS reactivated,
         CAST(SUM(CASE WHEN s.is_closed THEN 0 ELSE 1 END) AS BIGINT) AS still_dormant,
         CAST(SUM(CASE WHEN s.is_closed THEN CAST(s.t - thr.u AS HUGEINT) ELSE 0 END) AS HUGEINT) AS excess_sum
  FROM spans2 s
  JOIN customer c ON s.o_custkey = c.c_custkey
  CROSS JOIN thr
  WHERE s.t > thr.u
  GROUP BY 1, 2
)
SELECT c_mktsegment AS segment,
       CAST(u AS BIGINT) AS dormancy_threshold_days,
       reactivated,
       still_dormant,
       CAST(reactivated * 1000000 // (reactivated + still_dormant) AS BIGINT) AS reactivation_rate_ppm,
       CAST(excess_sum * 1000 // GREATEST(reactivated, 1) AS BIGINT) AS mean_overshoot_days_x1000
FROM seg
ORDER BY segment
"""

QUERIES["customers_dormancy_reactivation"] = customers_dormancy_reactivation
ORACLE["customers_dormancy_reactivation"] = CUSTOMERS_DORMANCY_SQL


# ---------------------------------------------------------------------------
# orders_gini_yearly_trend — inequality trajectory (round 10)
# ---------------------------------------------------------------------------


def orders_gini_yearly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-by-year Gini of order values plus the linear trend — is
    revenue concentration rising? nation_revenue_gini is one static
    snapshot; concentration POLICY questions are about the
    derivative, and this emits the exact per-year coefficients with
    an exact integer OLS slope over them.

    Engine-exact: per year, Gini comes from the value histogram with
    tie-block rank sums (Σ over a c-block at value v after cumlow =
    v·(c·cumlow + c(c+1) DIV 2) — exact cents integers), closed as
    the cross-multiplied ppm (2S − (n+1)T)·1e6 DIV (n·T); the trend
    slope is the exact rational Num·1000 DIV D over (year, gini_ppm)
    points.

    Scale: one (year, value) histogram shuffle; the CDF windows run
    per year on histogram-sized frames; the trend closes on ≤7
    rows."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("CAST(year(o_orderdate) AS INT)").alias("yr"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("v"),
    )
    hist = o.groupBy("yr", "v").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wcum = Window.partitionBy("yr").orderBy("v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = hist.select(
        "yr",
        "v",
        "c",
        F.expr("COALESCE(SUM(c) OVER (PARTITION BY yr ORDER BY v"
               " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)").alias("cumlow"),
    )
    per = ranked.groupBy("yr").agg(
        F.expr("CAST(SUM(c) AS BIGINT)").alias("n_orders"),
        F.expr("CAST(SUM(CAST(v AS DECIMAL(38,0)) * c) AS DECIMAL(38,0))").alias("t"),
        F.expr(
            "CAST(SUM(CAST(v AS DECIMAL(38,0)) * (c * cumlow + c * (c + 1) DIV 2))"
            " AS DECIMAL(38,0))"
        ).alias("s"),
    ).select(
        "yr",
        "n_orders",
        F.expr(
            "CAST((2 * s - (n_orders + 1) * t) * 1000000"
            " DIV (CAST(n_orders AS DECIMAL(38,0)) * t) AS BIGINT)"
        ).alias("gini_ppm"),
    ).localCheckpoint(eager=True)
    trend = per.agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("k"),
        F.expr("CAST(SUM(yr) AS DECIMAL(38,0))").alias("sy"),
        F.expr("CAST(SUM(gini_ppm) AS DECIMAL(38,0))").alias("sg"),
        F.expr("CAST(SUM(CAST(yr AS DECIMAL(38,0)) * yr) AS DECIMAL(38,0))").alias("syy"),
        F.expr("CAST(SUM(CAST(yr AS DECIMAL(38,0)) * gini_ppm) AS DECIMAL(38,0))").alias("syg"),
    ).select(
        F.expr(
            "CAST((k * syg - sy * sg) * 1000 DIV (k * syy - sy * sy) AS BIGINT)"
        ).alias("gini_trend_ppm_per_year_x1000")
    )
    return (
        per.crossJoin(F.broadcast(trend))
        .select("yr", "n_orders", "gini_ppm", "gini_trend_ppm_per_year_x1000")
        .orderBy("yr")
    )


ORDERS_GINI_TREND_SQL = """
WITH o AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS v
  FROM orders
),
hist AS (
  SELECT yr, v, CAST(COUNT(*) AS BIGINT) AS c FROM o GROUP BY 1, 2
),
ranked AS (
  SELECT yr, v, c,
         COALESCE(SUM(c) OVER (PARTITION BY yr ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumlow
  FROM hist
),
per AS MATERIALIZED (
  SELECT yr,
         CAST(SUM(c) AS BIGINT) AS n_orders,
         CAST((2 * CAST(SUM(CAST(v AS HUGEINT) * (c * cumlow + c * (c + 1) // 2)) AS HUGEINT)
               - (CAST(SUM(c) AS HUGEINT) + 1) * CAST(SUM(CAST(v AS HUGEINT) * c) AS HUGEINT))
              * 1000000
              // (CAST(SUM(c) AS HUGEINT) * CAST(SUM(CAST(v AS HUGEINT) * c) AS HUGEINT))
              AS BIGINT) AS gini_ppm
  FROM ranked GROUP BY 1
),
trend AS (
  SELECT CAST((k * syg - sy * sg) * 1000 // (k * syy - sy * sy) AS BIGINT)
           AS gini_trend_ppm_per_year_x1000
  FROM (
    SELECT CAST(COUNT(*) AS HUGEINT) AS k, CAST(SUM(yr) AS HUGEINT) AS sy,
           CAST(SUM(gini_ppm) AS HUGEINT) AS sg,
           CAST(SUM(CAST(yr AS HUGEINT) * yr) AS HUGEINT) AS syy,
           CAST(SUM(CAST(yr AS HUGEINT) * gini_ppm) AS HUGEINT) AS syg
    FROM per
  )
)
SELECT p.yr, p.n_orders, p.gini_ppm, t.gini_trend_ppm_per_year_x1000
FROM per p, trend t
ORDER BY p.yr
"""

QUERIES["orders_gini_yearly_trend"] = orders_gini_yearly_trend
ORACLE["orders_gini_yearly_trend"] = ORDERS_GINI_TREND_SQL


# ---------------------------------------------------------------------------
# nations_dissimilarity_index — Duncan & Duncan (1955) dissimilarity
# index of each supplier nation's product-type mix vs the global mix.


def nations_dissimilarity_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duncan dissimilarity index D_n = ½·Σ_t |c_nt/C_n − g_t/G| of
    each supplier nation's lineitem mix over part types vs the global
    type mix — the share of a nation's volume that would have to move
    between product types to match the world profile (the segregation
    complement to nations_rca_matrix, which scores one cell at a time;
    D_n scores the whole profile's distance).

    Determinism: everything is exact integer arithmetic on lineitem
    COUNTS — the per-cell term is |c_nt·G − g_t·C_n| over the common
    denominator C_n·G, summed as DECIMAL(38,0), scaled by 5·10⁵
    (½·1e6) and closed with one truncating DIV (both engines truncate
    positive quotients identically). No doubles anywhere.

    Scale: lineitem is scanned ONCE, projected to (l_suppkey,
    l_partkey) at the scan (column pruning), joined to the two
    SF-scaled dims on their keys (no broadcast hint — AQE/threshold
    decides, per the fixed-cardinality-only house rule) and collapsed
    map-side into |nations|×|types| cells; every later step (grid
    completion, marginal windows, the D fold) runs on ≤150 rows.
    Numerator magnitude is Σ_t|...|·5e5 ≤ 1e6·C_n·G ~ n², inside
    DECIMAL(38,0) through ~1e15 lineitems."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_partkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("s_nationkey", "p_type")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("c"))
    )
    nats = cells.select("s_nationkey").distinct()
    typs = cells.select("p_type").distinct()
    grid = (
        nats.crossJoin(F.broadcast(typs))
        .join(cells, ["s_nationkey", "p_type"], "left")
        .select(
            "s_nationkey",
            "p_type",
            F.expr("COALESCE(c, CAST(0 AS BIGINT))").alias("c"),
        )
    )
    w_nat = Window.partitionBy("s_nationkey")
    w_typ = Window.partitionBy("p_type")
    w_all = Window.partitionBy()
    terms = grid.select(
        "s_nationkey",
        F.col("c"),
        F.sum("c").over(w_nat).alias("cn"),
        F.sum("c").over(w_typ).alias("gt"),
        F.sum("c").over(w_all).alias("g"),
    )
    agg = terms.groupBy("s_nationkey").agg(
        F.expr("CAST(MAX(cn) AS BIGINT)").alias("n_items"),
        F.expr(
            "CAST(SUM(ABS(CAST(c AS DECIMAL(38,0)) * g - CAST(gt AS DECIMAL(38,0)) * cn)) * 500000"
            " DIV (CAST(GREATEST(MAX(cn), 1) AS DECIMAL(38,0)) * MAX(g)) AS BIGINT)"
        ).alias("dissim_ppm"),
    )
    return (
        agg.join(F.broadcast(nation), agg.s_nationkey == nation.n_nationkey)
        .select("n_name", "n_items", "dissim_ppm")
        .orderBy("n_name")
    )


NATIONS_DISSIMILARITY_SQL = """
WITH cells AS (
  SELECT s.s_nationkey, p.p_type, CAST(COUNT(*) AS BIGINT) AS c
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
),
grid AS (
  SELECT n.s_nationkey, t.p_type, COALESCE(c.c, CAST(0 AS BIGINT)) AS c
  FROM (SELECT DISTINCT s_nationkey FROM cells) n
  CROSS JOIN (SELECT DISTINCT p_type FROM cells) t
  LEFT JOIN cells c ON c.s_nationkey = n.s_nationkey AND c.p_type = t.p_type
),
terms AS (
  SELECT s_nationkey, c,
         SUM(c) OVER (PARTITION BY s_nationkey) AS cn,
         SUM(c) OVER (PARTITION BY p_type) AS gt,
         SUM(c) OVER () AS g
  FROM grid
),
agg AS (
  SELECT s_nationkey,
         CAST(MAX(cn) AS BIGINT) AS n_items,
         CAST(SUM(ABS(CAST(c AS HUGEINT) * g - CAST(gt AS HUGEINT) * cn)) * 500000
              // (CAST(GREATEST(MAX(cn), 1) AS HUGEINT) * MAX(g)) AS BIGINT) AS dissim_ppm
  FROM terms
  GROUP BY 1
)
SELECT nn.n_name, a.n_items, a.dissim_ppm
FROM agg a JOIN nation nn ON a.s_nationkey = nn.n_nationkey
ORDER BY nn.n_name
"""

QUERIES["nations_dissimilarity_index"] = nations_dissimilarity_index
ORACLE["nations_dissimilarity_index"] = NATIONS_DISSIMILARITY_SQL


# ---------------------------------------------------------------------------
# nations_trade_reciprocity — directional trade reciprocity and the
# most asymmetric nation pairs.


def nations_trade_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade reciprocity of the directional nation matrix (customer
    nation → supplier nation, lineitem-count weighted — the
    graph_pagerank edge build): global reciprocity R = Σ min(x_ij,
    x_ji) / Σ x_ij over off-diagonal pairs (Garlaschelli & Loffredo
    2004's weighted form) plus the top-10 most asymmetric pairs by
    |x_ij − x_ji| — the dependency-direction audit the symmetric
    gravity/RCA views can't give (who NET-supplies whom, and is the
    relationship one-way?).

    Determinism: pure integer — counts, min/abs folds, ppm closes by
    truncating DIV; pair ordering key is (asymmetry DESC, nation ids)
    so no MAX_BY shuffle ties. Output is the top-10 pair rows plus
    one 'TOTAL' row carrying the global index (same schema, nation
    names 'TOTAL'/'TOTAL').

    Scale: ONE fact join collapsed to ≤n² nation cells (nations are
    fixed-cardinality — broadcast per house rule); the pair fold is a
    self-join of that ≤625-row cell table on the reversed key."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(F.col("c_nationkey").alias("i"), F.col("s_nationkey").alias("j"))
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("x"))
        # i <> j filters the 625-row CELL table, never the fact rows:
        # pushing the inequality into the fact join makes DuckDB pick
        # a quasi-cross customer x supplier join order (>300s at sf1
        # vs 0.6s; found by the sf1 tier) - and on the Spark side the
        # post-agg filter costs nothing
        .where(F.col("i") != F.col("j"))
        .localCheckpoint(eager=True)
    )
    rev = cells.select(F.col("j").alias("i"), F.col("i").alias("j"), F.col("x").alias("xr"))
    pairs = cells.join(rev, ["i", "j"], "left").select(
        "i",
        "j",
        "x",
        F.expr("COALESCE(xr, CAST(0 AS BIGINT))").alias("xr"),
    )
    total = pairs.groupBy().agg(
        F.expr("CAST(SUM(LEAST(x, xr)) AS BIGINT)").alias("recip"),
        F.expr("CAST(SUM(x) AS BIGINT)").alias("tot"),
    )
    ni = n.select(F.col("n_nationkey").alias("i"), F.col("n_name").alias("cust_nation"))
    nj = n.select(F.col("n_nationkey").alias("j"), F.col("n_name").alias("supp_nation"))
    top = (
        pairs.where(F.col("i") < F.col("j"))
        .select(
            "i",
            "j",
            F.expr("x + xr").alias("volume"),
            F.expr("ABS(x - xr)").alias("asymmetry"),
            F.expr("CAST(ABS(x - xr) * 1000000 DIV GREATEST(x + xr, 1) AS BIGINT)").alias("metric_ppm"),
        )
        .orderBy(F.col("asymmetry").desc(), "i", "j")
        .limit(10)
        .join(F.broadcast(ni), "i")
        .join(F.broadcast(nj), "j")
        .select("cust_nation", "supp_nation", "volume", "asymmetry", "metric_ppm")
    )
    tot_row = total.select(
        F.lit("TOTAL").alias("cust_nation"),
        F.lit("TOTAL").alias("supp_nation"),
        F.col("tot").alias("volume"),
        F.expr("tot - recip").alias("asymmetry"),
        F.expr("CAST(recip * 1000000 DIV GREATEST(tot, 1) AS BIGINT)").alias("metric_ppm"),
    )
    return top.unionByName(tot_row).orderBy(
        F.col("asymmetry").desc(), "cust_nation", "supp_nation"
    )


NATIONS_RECIPROCITY_SQL = """
WITH cells AS MATERIALIZED (
  SELECT c.c_nationkey AS i, s.s_nationkey AS j, CAST(COUNT(*) AS BIGINT) AS x
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
offd AS MATERIALIZED (SELECT * FROM cells WHERE i <> j),
pairs AS MATERIALIZED (
  SELECT a.i, a.j, a.x, COALESCE(b.x, CAST(0 AS BIGINT)) AS xr
  FROM offd a LEFT JOIN offd b ON b.i = a.j AND b.j = a.i
),
total AS (
  SELECT CAST(SUM(LEAST(x, xr)) AS BIGINT) AS recip, CAST(SUM(x) AS BIGINT) AS tot
  FROM pairs
),
top AS (
  SELECT ni.n_name AS cust_nation, nj.n_name AS supp_nation,
         p.x + p.xr AS volume,
         ABS(p.x - p.xr) AS asymmetry,
         CAST(ABS(p.x - p.xr) * 1000000 // GREATEST(p.x + p.xr, 1) AS BIGINT) AS metric_ppm
  FROM (
    SELECT * FROM pairs WHERE i < j
    ORDER BY ABS(x - xr) DESC, i, j LIMIT 10
  ) p
  JOIN nation ni ON ni.n_nationkey = p.i
  JOIN nation nj ON nj.n_nationkey = p.j
)
SELECT * FROM (
  SELECT cust_nation, supp_nation, volume, asymmetry, metric_ppm FROM top
  UNION ALL
  SELECT 'TOTAL', 'TOTAL', tot, tot - recip,
         CAST(recip * 1000000 // GREATEST(tot, 1) AS BIGINT)
  FROM total
)
ORDER BY asymmetry DESC, cust_nation, supp_nation
"""

QUERIES["nations_trade_reciprocity"] = nations_trade_reciprocity
ORACLE["nations_trade_reciprocity"] = NATIONS_RECIPROCITY_SQL


# ---------------------------------------------------------------------------
# lineitem_price_volume_bridge — FP&A price/volume bridge between two
# fiscal years, per brand.


def lineitem_price_volume_bridge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume bridge (the standard FP&A revenue-change
    decomposition) from fiscal 1996 to 1997, per part brand: Δrev =
    PRICE effect (p₂−p₁)·q₂ + VOLUME effect (q₂−q₁)·p₁, where p_y is
    the realized average unit price r_y/q_y — the "why did revenue
    move" waterfall nations_revenue_decomposition gives for shares,
    here in absolute currency per brand.

    Determinism: revenue is DECIMAL-exact in e4 units (disc_price is
    exactly 4dp — the r8 rule); quantities are integral doubles CAST
    to BIGINT (exact). The rational effects are cross-multiplied to
    the common denominator q₁ — price·q₁ = r₂·q₁ − r₁·q₂ and
    volume·q₁ = (q₂−q₁)·r₁ are EXACT DECIMAL(38,0) integers — and
    closed with one truncating DIV each (negatives truncate toward
    zero on both engines), so price + volume may differ from Δrev by
    ≤ 2 e4-units of truncation, never more (documented contract;
    delta_e4 itself is exact).

    Scale: ONE lineitem scan (shipdate-filtered, column-pruned)
    joined to part on partkey and collapsed map-side to
    |brands|×2 year cells; the bridge algebra runs on ≤25 rows."""
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between("1996-01-01", "1997-12-31")
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    cells = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            "p_brand",
            F.expr("year(l_shipdate)").alias("yr"),
        )
        .agg(
            F.expr(
                "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))"
                " * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2))))"
                " * 10000 AS DECIMAL(38,0))"
            ).alias("r_e4"),
            F.expr("CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)").alias("q"),
        )
    )
    y1 = cells.where(F.col("yr") == 1996).select(
        "p_brand", F.col("r_e4").alias("r1"), F.col("q").alias("q1")
    )
    y2 = cells.where(F.col("yr") == 1997).select(
        "p_brand", F.col("r_e4").alias("r2"), F.col("q").alias("q2")
    )
    return (
        y1.join(y2, "p_brand")
        .select(
            "p_brand",
            F.expr("CAST(r1 AS BIGINT)").alias("rev_1996_e4"),
            F.expr("CAST(r2 AS BIGINT)").alias("rev_1997_e4"),
            F.expr("CAST(r2 - r1 AS BIGINT)").alias("delta_e4"),
            F.expr("CAST((r2 * q1 - r1 * q2) DIV q1 AS BIGINT)").alias("price_effect_e4"),
            F.expr("CAST((q2 - q1) * r1 DIV q1 AS BIGINT)").alias("volume_effect_e4"),
        )
        .orderBy("p_brand")
    )


LINEITEM_PVB_SQL = """
WITH cells AS (
  SELECT p.p_brand, CAST(year(l.l_shipdate) AS INTEGER) AS yr,
         CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(5,2)) - CAST(l.l_discount AS DECIMAL(5,2))))
              * 10000 AS HUGEINT) AS r_e4,
         CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE l.l_shipdate BETWEEN '1996-01-01' AND '1997-12-31'
  GROUP BY 1, 2
)
SELECT a.p_brand,
       CAST(a.r_e4 AS BIGINT) AS rev_1996_e4,
       CAST(b.r_e4 AS BIGINT) AS rev_1997_e4,
       CAST(b.r_e4 - a.r_e4 AS BIGINT) AS delta_e4,
       CAST((b.r_e4 * a.q - a.r_e4 * b.q) // a.q AS BIGINT) AS price_effect_e4,
       CAST((b.q - a.q) * a.r_e4 // a.q AS BIGINT) AS volume_effect_e4
FROM cells a JOIN cells b ON a.p_brand = b.p_brand AND a.yr = 1996 AND b.yr = 1997
ORDER BY a.p_brand
"""

QUERIES["lineitem_price_volume_bridge"] = lineitem_price_volume_bridge
ORACLE["lineitem_price_volume_bridge"] = LINEITEM_PVB_SQL


# ---------------------------------------------------------------------------
# orders_net_revenue_retention — NRR / GRR by base-year customer cohort.


def orders_net_revenue_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net and gross revenue retention per adjacent year pair: take
    every customer active in base year y, then NRR = (their year-y+1
    revenue) / (their year-y revenue) — expansion included — and
    GRR = Σ min(rev_y, rev_{y+1}) / Σ rev_y — expansion capped, so
    churn and contraction can't be masked (the SaaS-standard pair;
    customers_churn_setops counts heads, this weighs WALLETS).

    Determinism: o_totalprice is 2dp — all revenue is exact integer
    CENTS (DECIMAL-cast before ×100); the per-customer GRR cap
    LEAST(rev_y, rev_{y+1}) and both ppm closes are pure integer
    with truncating DIV. New-logo revenue in y+1 is excluded by
    construction (left join from the base cohort).

    Scale: ONE orders scan into (custkey, year) revenue cells — one
    shuffle on the customer key; the adjacent-year self-join is
    co-partitioned on that same key (no second shuffle of the fact
    table); year-pair aggregation is the only other exchange, onto
    ≤6 rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("year(o_orderdate)").alias("yr"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS DECIMAL(38,0))").alias("cents"),
    )
    cy = o.groupBy("o_custkey", "yr").agg(
        F.expr("CAST(SUM(cents) AS DECIMAL(38,0))").alias("rev")
    )
    base = cy.select("o_custkey", F.col("yr").alias("base_year"), F.col("rev").alias("rev0"))
    nxt = cy.select(
        "o_custkey", F.expr("yr - 1").alias("base_year"), F.col("rev").alias("rev1")
    )
    paired = base.join(nxt, ["o_custkey", "base_year"], "left").select(
        "base_year",
        "rev0",
        F.expr("COALESCE(rev1, CAST(0 AS DECIMAL(38,0)))").alias("rev1"),
    )
    agg = paired.groupBy("base_year").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_base_customers"),
        F.expr("CAST(SUM(CASE WHEN rev1 > 0 THEN 1 ELSE 0 END) AS BIGINT)").alias("n_retained"),
        F.expr("CAST(SUM(rev0) AS DECIMAL(38,0))").alias("base_rev_cents"),
        F.expr("CAST(SUM(rev1) AS DECIMAL(38,0))").alias("retained_rev_cents"),
        F.expr("CAST(SUM(LEAST(rev0, rev1)) AS DECIMAL(38,0))").alias("capped_rev_cents"),
    )
    # the last data year has no y+1 — drop it (its NRR would read 0)
    last = agg.agg(F.expr("MAX(base_year)").alias("maxy"))
    return (
        agg.crossJoin(F.broadcast(last))
        .where(F.col("base_year") < F.col("maxy"))
        .select(
            "base_year",
            "n_base_customers",
            "n_retained",
            F.expr("CAST(base_rev_cents AS BIGINT)").alias("base_rev_cents"),
            F.expr("CAST(retained_rev_cents AS BIGINT)").alias("retained_rev_cents"),
            F.expr("CAST(retained_rev_cents * 1000000 DIV base_rev_cents AS BIGINT)").alias("nrr_ppm"),
            F.expr("CAST(capped_rev_cents * 1000000 DIV base_rev_cents AS BIGINT)").alias("grr_ppm"),
        )
        .orderBy("base_year")
    )


ORDERS_NRR_SQL = """
WITH cy AS (
  SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS HUGEINT) AS rev
  FROM orders GROUP BY 1, 2
),
paired AS (
  SELECT b.yr AS base_year, b.rev AS rev0,
         COALESCE(n.rev, CAST(0 AS HUGEINT)) AS rev1
  FROM cy b LEFT JOIN cy n ON n.o_custkey = b.o_custkey AND n.yr = b.yr + 1
),
agg AS (
  SELECT base_year,
         CAST(COUNT(*) AS BIGINT) AS n_base_customers,
         CAST(SUM(CASE WHEN rev1 > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
         CAST(SUM(rev0) AS HUGEINT) AS base_rev_cents,
         CAST(SUM(rev1) AS HUGEINT) AS retained_rev_cents,
         CAST(SUM(LEAST(rev0, rev1)) AS HUGEINT) AS capped_rev_cents
  FROM paired GROUP BY 1
)
SELECT base_year, n_base_customers, n_retained,
       CAST(base_rev_cents AS BIGINT) AS base_rev_cents,
       CAST(retained_rev_cents AS BIGINT) AS retained_rev_cents,
       CAST(retained_rev_cents * 1000000 // base_rev_cents AS BIGINT) AS nrr_ppm,
       CAST(capped_rev_cents * 1000000 // base_rev_cents AS BIGINT) AS grr_ppm
FROM agg
WHERE base_year < (SELECT MAX(base_year) FROM agg)
ORDER BY base_year
"""

QUERIES["orders_net_revenue_retention"] = orders_net_revenue_retention
ORACLE["orders_net_revenue_retention"] = ORDERS_NRR_SQL


# ---------------------------------------------------------------------------
# orders_otif_rate — on-time-in-full rate per priority class.


def orders_otif_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OTIF (on-time-in-full) per order priority: an order counts
    ONLY if EVERY line shipped within the 90-day SLA of the order
    date — the all-or-nothing per-ORDER service metric retailers
    contract on (lineitem_shipping_sla scores lines independently;
    one late line there dilutes into an average instead of failing
    the order). Also emits the partial rate (≥1 on-time line) so the
    gap between the two reads as the multi-line coordination cost.

    Determinism: pure integer — per-order MIN/MAX of the ship delay
    in days (datediff/date_diff, exact), flags folded with
    conditional counts, one truncating-DIV ppm close per rate.

    Scale: one lineitem scan joined to orders on the orderkey (the
    natural co-partition), collapsed FIRST to one row per order
    (max/min delay) — the per-priority agg then touches |orders|
    rows, and output is |priorities|."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.expr(
                "CAST(MAX(datediff(CAST(l_shipdate AS DATE), o_orderdate)) AS BIGINT)"
            ).alias("max_delay"),
            F.expr(
                "CAST(MIN(datediff(CAST(l_shipdate AS DATE), o_orderdate)) AS BIGINT)"
            ).alias("min_delay"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_lines"),
        )
    )
    return (
        per_order.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_orders"),
            F.expr("CAST(SUM(CASE WHEN max_delay <= 90 THEN 1 ELSE 0 END) AS BIGINT)").alias("n_otif"),
            F.expr("CAST(SUM(CASE WHEN min_delay <= 90 THEN 1 ELSE 0 END) AS BIGINT)").alias("n_partial"),
            F.expr("CAST(SUM(n_lines) AS BIGINT)").alias("n_lines"),
        )
        .select(
            "priority",
            "n_orders",
            "n_otif",
            "n_partial",
            "n_lines",
            F.expr("CAST(n_otif * 1000000 DIV n_orders AS BIGINT)").alias("otif_ppm"),
            F.expr("CAST(n_partial * 1000000 DIV n_orders AS BIGINT)").alias("partial_ppm"),
        )
        .orderBy("priority")
    )


ORDERS_OTIF_SQL = """
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         CAST(MAX(date_diff('day', o.o_orderdate, CAST(l.l_shipdate AS DATE))) AS BIGINT) AS max_delay,
         CAST(MIN(date_diff('day', o.o_orderdate, CAST(l.l_shipdate AS DATE))) AS BIGINT) AS min_delay,
         CAST(COUNT(*) AS BIGINT) AS n_lines
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN max_delay <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_otif,
       CAST(SUM(CASE WHEN min_delay <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS n_partial,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN max_delay <= 90 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS otif_ppm,
       CAST(SUM(CASE WHEN min_delay <= 90 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS partial_ppm
FROM per_order
GROUP BY 1 ORDER BY 1
"""

QUERIES["orders_otif_rate"] = orders_otif_rate
ORACLE["orders_otif_rate"] = ORDERS_OTIF_SQL


# ---------------------------------------------------------------------------
# lineitem_shipment_consolidation — how fragmented is order
# fulfilment, per priority?


def lineitem_shipment_consolidation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipment-consolidation audit per order priority: an order's
    lines ship on k distinct dates — every extra date is an extra
    shipment (pick, pack, freight). Emits lines/order, distinct
    ship-dates/order, the single-shipment rate, and the consolidation
    ratio extra-shipments/extra-opportunities = Σ(k−1)/Σ(lines−1) —
    0 ⇒ perfectly consolidated, 1e6 ⇒ every line ships alone (the
    ops waterfall orders_otif_rate's service view doesn't cover:
    OTIF asks was it on time, this asks what it COST).

    Determinism: pure integer — per-order COUNT/COUNT DISTINCT
    collapse first (the ship date is exact), conditional counts,
    truncating-DIV ppm closes with a GREATEST(·,1) guard on the
    single-line-orders denominator.

    Scale: one lineitem⋈orders co-partitioned join, one per-order
    collapse, |priorities|-row output."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_lines"),
            F.expr("CAST(COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT)").alias("n_ships"),
        )
    )
    return (
        per_order.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_orders"),
            F.expr("CAST(SUM(n_lines) AS BIGINT)").alias("n_lines"),
            F.expr("CAST(SUM(n_ships) AS BIGINT)").alias("n_shipments"),
            F.expr("CAST(SUM(CASE WHEN n_ships = 1 THEN 1 ELSE 0 END) AS BIGINT)").alias("n_single"),
            F.expr("CAST(SUM(n_ships - 1) AS BIGINT)").alias("extra_ships"),
            F.expr("CAST(SUM(n_lines - 1) AS BIGINT)").alias("extra_opps"),
        )
        .select(
            "priority",
            "n_orders",
            "n_lines",
            "n_shipments",
            F.expr("CAST(n_single * 1000000 DIV n_orders AS BIGINT)").alias("single_shipment_ppm"),
            F.expr(
                "CAST(extra_ships * 1000000 DIV GREATEST(extra_opps, 1) AS BIGINT)"
            ).alias("fragmentation_ppm"),
        )
        .orderBy("priority")
    )


LINEITEM_CONSOL_SQL = """
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         CAST(COUNT(DISTINCT CAST(l.l_shipdate AS DATE)) AS BIGINT) AS n_ships
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
)
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(n_lines) AS BIGINT) AS n_lines,
       CAST(SUM(n_ships) AS BIGINT) AS n_shipments,
       CAST(SUM(CASE WHEN n_ships = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS single_shipment_ppm,
       CAST(SUM(n_ships - 1) * 1000000 // GREATEST(SUM(n_lines - 1), 1) AS BIGINT) AS fragmentation_ppm
FROM per_order
GROUP BY 1 ORDER BY 1
"""

QUERIES["lineitem_shipment_consolidation"] = lineitem_shipment_consolidation
ORACLE["lineitem_shipment_consolidation"] = LINEITEM_CONSOL_SQL
