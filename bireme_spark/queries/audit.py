"""Warehouse audit & robust-analytics queries.

A CDC-synced warehouse (the reference's end state after
``ChangeLoader`` applies a batch — bireme validates sync health with
row checksums, ``sbin/bireme`` + ``etc/`` checksum scripts) also
needs *semantic* validation: referential integrity after a sync,
robust statistics that survive corrupt outliers, fuzzy key matching
across systems, and graph-shaped audits of co-occurrence structure.
These are re-expressed Spark-first: every query is a declarative
DataFrame plan whose only shuffles are keyed joins/aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bireme_spark.functions.money import MONEY, dsum, money
from bireme_spark.sources.tables import load_table

QUERIES: dict = {}
ORACLE: dict = {}


# ---------------------------------------------------------------------------
# fk_integrity_audit — orphan-key check after a sync
# ---------------------------------------------------------------------------

_FK_RELATIONS = (
    # (child table, child key, parent table, parent key)
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
)


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit over every FK edge of the schema:
    for each child→parent relation, how many DISTINCT child keys
    exist and how many have no parent row (orphans after a partial /
    out-of-order sync).

    Scale design: the child side is reduced to DISTINCT keys first —
    a map-side partial distinct collapses the fact table to its key
    cardinality before any join, so the per-relation exchange carries
    keys only (one column). The parent side is likewise key-only; the
    left join shuffles on the key (or broadcasts when the parent is
    small — AQE decides). The five one-row results union driver-free.
    """
    parts = []
    for child, ckey, parent, pkey in _FK_RELATIONS:
        ck = load_table(spark, sf_dir, child).select(F.col(ckey).alias("k")).distinct()
        pk = (
            load_table(spark, sf_dir, parent)
            .select(F.col(pkey).alias("k"))
            .distinct()
            .withColumn("hit", F.lit(1))
        )
        rel = f"{child}.{ckey}->{parent}.{pkey}"
        parts.append(
            ck.join(pk, "k", "left")
            .agg(
                F.count(F.lit(1)).alias("child_keys"),
                F.count(F.when(F.col("hit").isNull(), F.lit(1))).alias("orphan_keys"),
            )
            .select(F.lit(rel).alias("relation"), "child_keys", "orphan_keys")
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("relation")


FK_INTEGRITY_SQL = """
WITH
ck1 AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
ck2 AS (SELECT DISTINCT l_partkey AS k FROM lineitem),
ck3 AS (SELECT DISTINCT l_suppkey AS k FROM lineitem),
ck4 AS (SELECT DISTINCT o_custkey AS k FROM orders),
ck5 AS (SELECT DISTINCT c_nationkey AS k FROM customer)
SELECT relation, child_keys, orphan_keys FROM (
  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS relation,
         COUNT(*) AS child_keys,
         COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS orphan_keys
  FROM ck1 LEFT JOIN orders o ON ck1.k = o.o_orderkey
  UNION ALL
  SELECT 'lineitem.l_partkey->part.p_partkey',
         COUNT(*), COUNT(CASE WHEN p.p_partkey IS NULL THEN 1 END)
  FROM ck2 LEFT JOIN part p ON ck2.k = p.p_partkey
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
         COUNT(*), COUNT(CASE WHEN s.s_suppkey IS NULL THEN 1 END)
  FROM ck3 LEFT JOIN supplier s ON ck3.k = s.s_suppkey
  UNION ALL
  SELECT 'orders.o_custkey->customer.c_custkey',
         COUNT(*), COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END)
  FROM ck4 LEFT JOIN customer c ON ck4.k = c.c_custkey
  UNION ALL
  SELECT 'customer.c_nationkey->nation.n_nationkey',
         COUNT(*), COUNT(CASE WHEN n.n_nationkey IS NULL THEN 1 END)
  FROM ck5 LEFT JOIN nation n ON ck5.k = n.n_nationkey
)
ORDER BY relation
"""


# ---------------------------------------------------------------------------
# lineitem_winsorized_stats — exact robust stats via a grouped histogram
# ---------------------------------------------------------------------------


def lineitem_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5%-winsorized and 5%-trimmed mean of l_extendedprice per
    return flag — robust location estimates a data-quality monitor
    uses where a plain mean is corrupted by bad rows.

    Scale design: prices are 2-dp with bounded range, so the row
    stream FIRST collapses to a (flag, price) → count histogram in
    one map-side-combined hash aggregate; the exact cumulative
    distribution then runs as a window over the tiny histogram, never
    over raw rows. The naive plan — cume_dist over all rows
    partitioned by a 3-value flag — would put the whole fact table
    into 3 skewed sort partitions; the histogram plan's only
    row-scale exchange is the hash agg. All means are DECIMAL-exact
    sums divided as doubles (deterministic IEEE op on exact inputs).
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", money("l_extendedprice").alias("price")
    )
    hist = li.groupBy("l_returnflag", "price").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("l_returnflag").orderBy("price")
    wtot = Window.partitionBy("l_returnflag")
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "tot", F.sum("cnt").over(wtot)
    )
    # cd = exact cumulative fraction at-or-below this price (peers inclusive)
    cum = cum.withColumn("cd", F.col("cum").cast("double") / F.col("tot").cast("double"))
    bounds = cum.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("cd") >= 0.05, F.col("price"))).alias("p05"),
        F.min(F.when(F.col("cd") >= 0.95, F.col("price"))).alias("p95"),
    )
    j = cum.join(F.broadcast(bounds), "l_returnflag")
    clamped = (
        F.when(F.col("price") < F.col("p05"), F.col("p05"))
        .when(F.col("price") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("price"))
    )
    in_core = (F.col("price") >= F.col("p05")) & (F.col("price") <= F.col("p95"))
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum("cnt").alias("n_items"),
            F.max(F.col("p05").cast("double")).alias("p05"),
            F.max(F.col("p95").cast("double")).alias("p95"),
            F.sum(clamped * F.col("cnt")).alias("_wsum"),
            F.sum(F.when(in_core, F.col("price") * F.col("cnt"))).alias("_tsum"),
            F.sum(F.when(in_core, F.col("cnt"))).alias("_tn"),
        )
        .select(
            "l_returnflag",
            "n_items",
            "p05",
            "p95",
            (F.col("_wsum").cast("double") / F.col("n_items").cast("double")).alias(
                "winsorized_mean"
            ),
            (F.col("_tsum").cast("double") / F.col("_tn").cast("double")).alias(
                "trimmed_mean"
            ),
        )
        .orderBy("l_returnflag")
    )


WINSORIZED_SQL = """
WITH hist AS (
  SELECT l_returnflag, CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT *,
         CAST(SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY price) AS DOUBLE)
           / CAST(SUM(cnt) OVER (PARTITION BY l_returnflag) AS DOUBLE) AS cd
  FROM hist
),
bounds AS (
  SELECT l_returnflag,
         MIN(CASE WHEN cd >= 0.05 THEN price END) AS p05,
         MIN(CASE WHEN cd >= 0.95 THEN price END) AS p95
  FROM cum GROUP BY 1
)
SELECT c.l_returnflag,
       CAST(SUM(cnt) AS BIGINT) AS n_items,
       CAST(MAX(b.p05) AS DOUBLE) AS p05,
       CAST(MAX(b.p95) AS DOUBLE) AS p95,
       CAST(SUM((CASE WHEN price < b.p05 THEN b.p05
                      WHEN price > b.p95 THEN b.p95
                      ELSE price END) * cnt) AS DOUBLE)
         / CAST(SUM(cnt) AS DOUBLE) AS winsorized_mean,
       CAST(SUM(CASE WHEN price BETWEEN b.p05 AND b.p95 THEN price * cnt END) AS DOUBLE)
         / CAST(SUM(CASE WHEN price BETWEEN b.p05 AND b.p95 THEN cnt END) AS DOUBLE)
         AS trimmed_mean
FROM cum c JOIN bounds b ON c.l_returnflag = b.l_returnflag
GROUP BY c.l_returnflag
ORDER BY c.l_returnflag
"""


# ---------------------------------------------------------------------------
# parts_fuzzy_match — blocked Levenshtein entity resolution
# ---------------------------------------------------------------------------


def parts_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy name matching over part names: pairs whose names share
    their first token (the blocking key) and are within Levenshtein
    distance ≤ 15, reported as pair counts per distance — the
    entity-resolution primitive for reconciling product catalogs
    across synced systems.

    Scale design: names repeat heavily (a bounded catalog
    vocabulary), so the expensive function NEVER runs on raw rows:
    collapse to DISTINCT (name, count) first — one map-side-combined
    agg — and evaluate Levenshtein only on distinct-name pairs inside
    each first-token block, weighting each by cnt_a·cnt_b (and C(n,2)
    for exact-duplicate names at distance 0). The id-pair counts are
    identical to the naive id×id self-join, but the distance work is
    O(V²/blocks) in vocabulary size V, independent of corpus row
    count (measured: 38.8s → sub-second at sf0.1). Widening the
    block key to a 2-token prefix is the knob when V itself grows.
    """
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_name").alias("name"),
        F.substring_index("p_name", " ", 1).alias("blk"),
    )
    names = p.groupBy("blk", "name").agg(F.count(F.lit(1)).alias("cnt"))
    a = names.select("blk", F.col("name").alias("name_a"), F.col("cnt").alias("cnt_a"))
    b = names.select("blk", F.col("name").alias("name_b"), F.col("cnt").alias("cnt_b"))
    cross = (
        a.join(b, "blk")
        .where(F.col("name_a") < F.col("name_b"))
        .select(
            F.levenshtein("name_a", "name_b").alias("distance"),
            (F.col("cnt_a") * F.col("cnt_b")).alias("w"),
        )
        .where(F.col("distance") <= 15)
    )
    same = names.select(
        F.lit(0).alias("distance"),
        (F.col("cnt") * (F.col("cnt") - 1) / 2).cast("long").alias("w"),
    ).where(F.col("w") > 0)
    return (
        cross.unionByName(same)
        .groupBy("distance")
        .agg(F.sum("w").alias("n_pairs"))
        .orderBy("distance")
    )


FUZZY_MATCH_SQL = """
WITH names AS (
  SELECT CASE WHEN strpos(p_name, ' ') > 0
              THEN substr(p_name, 1, strpos(p_name, ' ') - 1)
              ELSE p_name END AS blk,
         p_name AS name, COUNT(*) AS cnt
  FROM part GROUP BY 1, 2
),
pairs AS (
  SELECT CAST(levenshtein(a.name, b.name) AS INTEGER) AS distance,
         a.cnt * b.cnt AS w
  FROM names a JOIN names b ON a.blk = b.blk AND a.name < b.name
  WHERE levenshtein(a.name, b.name) <= 15
  UNION ALL
  SELECT 0, cnt * (cnt - 1) // 2 FROM names WHERE cnt > 1
)
SELECT distance, CAST(SUM(w) AS BIGINT) AS n_pairs
FROM pairs GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# graph_triangle_count — degree-oriented distributed triangle counting
# ---------------------------------------------------------------------------


def _copurchase_edges(
    spark: SparkSession, sf_dir: str, pre_distinct_filter=None, node_filter=None
) -> DataFrame:
    """Distinct part co-purchase edges (u < v), built per-order so a
    hot part cannot explode the pair stream (fan-out ≤ C(7,2)).

    ``pre_distinct_filter``: optional predicate over (u, v) applied
    to the RAW pair stream, BEFORE the edge distinct — a filter that
    depends only on the edge key (e.g. a sampling coin) must run here
    so the big dedup shuffle shrinks with it (measured 13.0s → 9.7s
    for the DOULION twin at sf0.1 — the remaining floor is the
    per-order pair formation, which no edge-key filter can cut)."""
    pairs = _order_pairs(spark, sf_dir, node_filter=node_filter)
    if pre_distinct_filter is not None:
        pairs = pairs.where(pre_distinct_filter)
    return pairs.distinct()


def _order_pairs(spark: SparkSession, sf_dir: str, node_filter=None) -> DataFrame:
    """RAW per-order co-purchase pair stream (u < v; one row per
    (order, pair), so pairs repeat across orders). ONE order-keyed
    exchange builds the per-basket part sets — the (ok, pk) distinct
    folds into ``collect_set`` and the u < v pair enumeration is a
    map-side generator over the sorted array (r10 opt: replaces the
    distinct → self-join build — 3 exchanges + a sort-merge join →
    1 exchange; fan-out stays ≤ C(|basket|, 2))."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    if node_filter is not None:
        # node-level sampling prunes BEFORE pair formation — the one
        # place an edge-key filter can't reach (colorful counting:
        # the pair join and its dedup both shrink quadratically)
        li = li.where(node_filter)
    arrs = li.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("arr")
    )
    return arrs.select(
        F.explode(
            F.expr(
                "flatten(transform(arr, (x, i) ->"
                " transform(slice(arr, i + 2, size(arr) - i - 1),"
                " y -> struct(x AS u, y AS v))))"
            )
        ).alias("p")
    ).select("p.u", "p.v")


def _chain_edges(spark: SparkSession, sf_dir: str, order_mod: int) -> DataFrame:
    """Per-order consecutive-rank chain pairs (u = k-th smallest
    distinct part of the order, v = (k+1)-th; u < v by construction)
    for the sampled part-flow graph fixtures. Built map-side from ONE
    ``groupBy(l_orderkey)`` — ``sort_array(collect_set)`` replaces
    the distinct → row_number window → (ok, rn) self-join build
    (3 exchanges + a sort-merge join → 1 exchange; r10 opt). The
    emitted pair stream is row-identical, so every downstream edge
    op and oracle is unchanged. NOT deduplicated across orders —
    call sites keep their own ``.distinct()``."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % order_mod == 0)
    arrs = (
        li.select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("arr"))
    )
    return (
        arrs.where(F.size("arr") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(arr) - 1),"
                    " i -> struct(arr[i - 1] AS u, arr[i] AS v))"
                )
            ).alias("p")
        )
        .select("p.u", "p.v")
    )


def _count_triangles(edges: DataFrame) -> tuple[int, int, int]:
    """(n_nodes, n_edges, n_triangles) of an undirected (u<v) edge
    set via the degree-ordered orientation + sorted-adjacency
    intersection (the edge-iterator algorithm): each oriented edge
    (lo, hi) contributes |N⁺(lo) ∩ N⁺(hi)| triangles, computed as a
    map-side ``array_intersect`` after two co-partitioned joins with
    the out-adjacency table — the same O(m^1.5) work bound as the
    wedge join (out-degrees are O(√m) under the orientation, so
    adjacency arrays stay small) but with NO exploded wedge shuffle
    and no closing-edge join (A/B at sf0.1: 9.7s → 7.8s for the
    counting stage). The inner join on ``hi`` drops edges whose head
    has no out-neighbors — they contribute zero, so the prune is
    free. Caller provides a persisted frame if reuse matters; this
    executes eagerly."""
    # r11 opt: deg persisted — the |V|-row degree table is otherwise
    # computed TWICE (once inside the triangle DAG's orientation
    # joins, once for the closing n_nodes/n_edges agg), and each
    # computation reads the persisted edge stream twice (profiled
    # ~2.4 s/computation at sf0.1 vs a 20k-row cache).
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    try:
        lo_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        e = (
            edges.join(deg.withColumnRenamed("x", "u").withColumnRenamed("deg", "du"), "u")
            .join(deg.withColumnRenamed("x", "v").withColumnRenamed("deg", "dv"), "v")
            .select(
                F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
                F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
            )
        )
        adj = e.groupBy("lo").agg(F.sort_array(F.collect_set("hi")).alias("nbrs"))
        # e ⋈ adj on lo is adj itself re-exploded (every oriented edge is
        # one (lo, nbrs[i]) element) — deriving it map-side from adj saves
        # a full sort-merge join of the edge stream (r10 opt)
        j = adj.select(
            "lo", F.explode("nbrs").alias("hi"), F.col("nbrs").alias("n_lo")
        ).join(adj.select(F.col("lo").alias("hi"), F.col("nbrs").alias("n_hi")), "hi")
        # r11 opt: n_nodes and n_edges from ONE agg over deg — every
        # edge contributes exactly 1 to each endpoint's degree, so
        # SUM(deg) = 2·|edges|; replaces two separate count jobs.
        # Collected FIRST so the deg cache is materialized by the
        # cheap job and the triangle DAG's two orientation joins read
        # it warm.
        drow = deg.agg(
            F.count(F.lit(1)).alias("n"), F.sum("deg").alias("twom")
        ).collect()[0]
        tri = (
            j.select(F.size(F.array_intersect("n_lo", "n_hi")).alias("c"))
            .agg(F.sum("c").alias("t"))
            .collect()[0]["t"]
        )
    finally:
        deg.unpersist()
    return int(drow["n"]), int(drow["twom"] or 0) // 2, int(tri or 0)


def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count of the part co-purchase graph (parts are
    adjacent iff some order contains both) — the structural audit
    behind clustering-coefficient / community health checks.

    Scale design: edges form per-order (fan-out ≤ C(7,2) per basket,
    so a hot part cannot explode the pair stream), then deduplicate
    on the edge key. Triangles are counted with the degree-ordered
    orientation (each edge points low-degree → high-degree, ties by
    id): every wedge join then fans out from the LOW-degree endpoint,
    bounding the join work by Σ d_lo(v)² ≈ O(m^1.5) instead of
    Σ deg(v)² (quadratic in the hottest vertex). The oracle uses the
    plain id orientation — triangle count is invariant under any
    acyclic orientation, so both give the same answer while the Spark
    plan is the one that survives a power-law degree distribution.
    """
    edges = _copurchase_edges(spark, sf_dir).persist()
    try:
        # wedges root at the low-degree endpoint; wedge endpoints are
        # emitted id-ordered (b < c), so the closing probe
        # canonicalizes each oriented edge back to (min id, max id) —
        # ONE table, not a 2× orientation union (measured 24-29s →
        # 14-17s at sf0.1: halving the probe side of the biggest join
        # is the whole win).
        n_nodes, n_edges, n_tri = _count_triangles(edges)
    finally:
        edges.unpersist()
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_tri)],
        "n_nodes bigint, n_edges bigint, n_triangles bigint",
    )


TRIANGLE_SQL = """
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
nodes AS (SELECT u AS x FROM e UNION SELECT v FROM e)
SELECT
  (SELECT COUNT(*) FROM nodes) AS n_nodes,
  (SELECT COUNT(*) FROM e) AS n_edges,
  (SELECT COUNT(*)
   FROM e e1 JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
             JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v) AS n_triangles
"""


QUERIES["fk_integrity_audit"] = fk_integrity_audit
ORACLE["fk_integrity_audit"] = FK_INTEGRITY_SQL
QUERIES["lineitem_winsorized_stats"] = lineitem_winsorized_stats
ORACLE["lineitem_winsorized_stats"] = WINSORIZED_SQL
QUERIES["parts_fuzzy_match"] = parts_fuzzy_match
ORACLE["parts_fuzzy_match"] = FUZZY_MATCH_SQL
QUERIES["graph_triangle_count"] = graph_triangle_count
ORACLE["graph_triangle_count"] = TRIANGLE_SQL


_TRI_KEEP_NIBBLES = 5  # keep an edge iff md5 first nibble < 5 → p_e = 5/16
_TRI_NODE_KEEP_NIBBLES = 12  # keep a node iff md5 first nibble < 12 → p_v = 12/16


def graph_triangle_count_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DOULION-style approximate triangle count (Tsourakakis et al.,
    KDD 2009): sparsify the edge set by keeping each edge with
    probability p, count triangles on the sample, scale by 1/p³ —
    E[estimate] = true count, at ~1/p² less wedge-join work. The
    monitoring-frequency twin of ``graph_triangle_count`` (the exact
    count's cost is inherently superlinear in graph size), COMPOSED
    with colorful node sampling (Pagh & Tsourakakis 2012): nodes keep
    with p_v = 12/16 BEFORE pair formation — the one stage an
    edge-level coin cannot reach, and the stage that dominates this
    graph's cost (per-order pair join + edge dedup both shrink
    ~quadratically) — then surviving edges keep with p_e = 5/16
    before the dedup. E[estimate] = count with scale 1/(p_v³·p_e³).

    Engine-portable determinism: both coins are first-nibble
    md5 buckets (``'node:' ‖ pk`` and ``'tri:' ‖ u ‖ '_' ‖ v``), so
    the sampled subgraph, its triangle count, and the estimate are
    bit-identical in DuckDB and the whole pipeline is oracle-checked,
    not rows-only. The estimate is one IEEE division of exact
    integers. Accuracy vs the exact count is property-tested
    (tests/test_graph.py; measured 3.3% at sf0.001, 0.2% at
    sf0.01)."""
    node_nib = F.expr(
        "locate(substring(md5(concat('node:', CAST(l_partkey AS STRING))), 1, 1),"
        " '0123456789abcdef') - 1"
    )
    edge_nib = F.expr(
        "locate(substring(md5(concat('tri:', CAST(u AS STRING), '_', "
        "CAST(v AS STRING))), 1, 1), '0123456789abcdef') - 1"
    )
    edges = _copurchase_edges(
        spark,
        sf_dir,
        pre_distinct_filter=edge_nib < _TRI_KEEP_NIBBLES,
        node_filter=node_nib < _TRI_NODE_KEEP_NIBBLES,
    ).persist()
    try:
        n_nodes, n_edges, n_tri = _count_triangles(edges)
    finally:
        edges.unpersist()
    est = float(n_tri * 16**6) / (_TRI_NODE_KEEP_NIBBLES**3 * _TRI_KEEP_NIBBLES**3)
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_tri, est)],
        "n_sampled_nodes bigint, n_sampled_edges bigint, "
        "n_sampled_triangles bigint, est_triangles double",
    )


TRIANGLE_APPROX_SQL = f"""
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
            WHERE strpos('0123456789abcdef',
                         substr(md5(concat('node:', CAST(l_partkey AS VARCHAR))), 1, 1)) - 1
                  < {_TRI_NODE_KEEP_NIBBLES}),
e0 AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
e AS (
  SELECT u, v FROM e0
  WHERE strpos('0123456789abcdef',
               substr(md5(concat('tri:', CAST(u AS VARCHAR), '_',
                                 CAST(v AS VARCHAR))), 1, 1)) - 1
        < {_TRI_KEEP_NIBBLES}
),
nodes AS (SELECT u AS x FROM e UNION SELECT v FROM e),
tri AS (
  SELECT COUNT(*) AS n
  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT
  (SELECT COUNT(*) FROM nodes) AS n_sampled_nodes,
  (SELECT COUNT(*) FROM e) AS n_sampled_edges,
  (SELECT n FROM tri) AS n_sampled_triangles,
  (SELECT CAST(n * 16777216 AS DOUBLE)
     / {_TRI_NODE_KEEP_NIBBLES**3 * _TRI_KEEP_NIBBLES**3} FROM tri)
    AS est_triangles
"""

QUERIES["graph_triangle_count_approx"] = graph_triangle_count_approx
ORACLE["graph_triangle_count_approx"] = TRIANGLE_APPROX_SQL


# ---------------------------------------------------------------------------
# orders_column_profile — one-pass table profiler
# ---------------------------------------------------------------------------

_PROFILE_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_orderpriority",
    "o_orderdate",
)


def orders_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingestion-time column profiler (the first thing run on a
    freshly synced table): per column — null count, exact distinct
    count, lexicographic min/max rendered as strings. One wide
    aggregate computes every statistic in a single pass; the result
    unpivots to a row per column.

    Scale design: the multi-column exact COUNT(DISTINCT) compiles to
    ONE Expand-based aggregate (rows × |cols| intermediate, the
    standard exact-profiler cost — swap in HLL sketches per column
    when approximate is acceptable at 100 TB); min/max/null-count
    piggyback on the same pass, so the table is scanned exactly once.
    The unpivot is a zero-shuffle Expand over a single row.
    """
    o = load_table(spark, sf_dir, "orders").select(*_PROFILE_COLS)
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    wide = o.agg(F.count(F.lit(1)).alias("__n"), *aggs)
    stack = ", ".join(
        f"'{c}', {c}__nulls, {c}__distinct, {c}__min, {c}__max" for c in _PROFILE_COLS
    )
    return (
        wide.select(
            F.col("__n").alias("n_rows"),
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack})"
                " as (col_name, n_nulls, n_distinct, min_val, max_val)"
            ),
        )
        .select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")
        .orderBy("col_name")
    )


_PROFILE_SQL_ROWS = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name, (SELECT COUNT(*) FROM orders) AS n_rows,
       COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN(CAST({c} AS VARCHAR)) AS min_val,
       MAX(CAST({c} AS VARCHAR)) AS max_val
FROM orders"""
    for c in _PROFILE_COLS
)
COLUMN_PROFILE_SQL = f"SELECT * FROM (\n{_PROFILE_SQL_ROWS}\n) ORDER BY col_name"

QUERIES["orders_column_profile"] = orders_column_profile
ORACLE["orders_column_profile"] = COLUMN_PROFILE_SQL


# ---------------------------------------------------------------------------
# orders_benford_audit — first-digit law conformance
# ---------------------------------------------------------------------------


def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law audit of order values: observed first-digit
    frequencies of o_totalprice vs the Benford expectation
    log10(1+1/d), with the per-digit chi-square contribution — the
    standard fabricated-data / corrupted-feed screen.

    Scale design: the first digit is a map-side string expression on
    the DECIMAL-rendered value (no float log10 edge cases), so the
    whole audit is ONE 9-cell hash aggregate; expectations and chi²
    terms are computed on the 9-row result. Rounded at 6dp so the
    statistic is engine-identical.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.substring(money("o_totalprice").cast("string"), 1, 1).alias("digit")
    )
    counts = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n_orders"))
    tot = counts.agg(F.sum("n_orders").alias("tot"))
    expected = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6)
    observed = F.round(F.col("n_orders").cast("double") / F.col("tot").cast("double"), 6)
    return (
        counts.join(F.broadcast(tot))
        .select(
            F.col("digit").cast("int").alias("digit"),
            "n_orders",
            observed.alias("observed_freq"),
            expected.alias("benford_freq"),
            F.round(
                F.pow(observed - expected, F.lit(2.0)) / expected, 6
            ).alias("chi2_term"),
        )
        .orderBy("digit")
    )


BENFORD_SQL = """
WITH counts AS (
  SELECT substr(CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR), 1, 1) AS digit,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
),
tot AS (SELECT SUM(n_orders) AS tot FROM counts)
SELECT CAST(digit AS INTEGER) AS digit,
       CAST(n_orders AS BIGINT) AS n_orders,
       ROUND(CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS observed_freq,
       ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS benford_freq,
       ROUND(POW(ROUND(CAST(n_orders AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                 - ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6), 2)
             / ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6), 6) AS chi2_term
FROM counts CROSS JOIN tot
ORDER BY digit
"""

QUERIES["orders_benford_audit"] = orders_benford_audit
ORACLE["orders_benford_audit"] = BENFORD_SQL


# ---------------------------------------------------------------------------
# graph_reachability_bfs — recursive-CTE bounded BFS
# ---------------------------------------------------------------------------

_BFS_SQL_BODY = """
WITH RECURSIVE reach(pk, hop) AS (
  SELECT (SELECT MIN(u) FROM {e}) AS pk, 0 AS hop
  UNION ALL
  SELECT DISTINCT d.v, r.hop + 1
  FROM reach r JOIN {d} d ON d.u = r.pk
  WHERE r.hop < 3
),
m AS (SELECT pk, MIN(hop) AS hop FROM reach GROUP BY pk)
SELECT hop, COUNT(*) AS n_parts,
       MIN(pk) AS min_partkey, MAX(pk) AS max_partkey
FROM m GROUP BY hop ORDER BY hop
"""


def graph_reachability_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS (3 hops) from the smallest part key over the part
    co-purchase graph, via Spark 4's recursive CTE — parts reachable
    per hop distance. Declarative recursion: the SAME SQL text runs
    on Spark and DuckDB (ANSI `WITH RECURSIVE`), over an edge view
    built with the bounded per-basket fan-out of
    ``graph_triangle_count``.

    Scale design: the recursive term is `SELECT DISTINCT` over the
    frontier — the textbook distributed-BFS frontier dedup. Under
    working-table semantics (identical in Spark and DuckDB) each
    iteration emits ≤|nodes| rows, so accumulated rows are bounded by
    |nodes|×hops; plain UNION ALL recursion multiplies paths and blew
    Spark's 1M recursion-row limit at sf0.01 already. Revisited nodes
    reappear at a later hop and the final MIN(hop) rollup restores
    BFS distance — engine-identical. For UNBOUNDED traversals the
    right operator is the star-contraction loop of
    ``operators/dedup.py::connected_components`` (O(log n) rounds,
    per-round checkpoint); the recursive CTE is the concise form for
    shallow neighborhoods.
    """
    # keeps the self-join edge build (NOT _copurchase_edges): the
    # recursive CTE re-executes the un-checkpointed base per hop, and
    # re-running the collect_set array build each hop measured SLOWER
    # than re-running the join (r10 opt A/B: old 8.1s vs new 12.6s
    # min-of-3, quiet box) — the map-side build only pays off when the
    # pair stream is consumed once or checkpointed.
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    po = li.distinct().select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
    a = po.select("ok", F.col("pk").alias("u"))
    b = po.select("ok", F.col("pk").alias("v"))
    # r11 opt (VERDICT #4): eager checkpoint on the edge base — the
    # recursive CTE re-executes the referenced views per hop, so the
    # distinct+self-join+distinct edge build otherwise re-runs 3x
    # (graph_closeness_sample already cut this in r10; reachability
    # only ever A/B'd the edge-BUILD swap, not the lineage cut).
    e = (
        a.join(b, "ok")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # r11 opt (VERDICT #4): persisted iterative BFS replaces the
    # recursive CTE on the SPARK side only (oracle text unchanged).
    # Equivalence: the CTE's working table revisits nodes and the
    # closing MIN(hop) keeps each pk's FIRST hop — exactly what an
    # anti-join-pruned frontier emits directly, so `m` is row-identical
    # by construction. The CTE paid ~2s/iteration of planning plus a
    # full frontier⋈d re-expansion of already-seen nodes per hop; the
    # loop's frontier only carries NEW nodes. Closing rollup stays the
    # letter-identical SQL text (type/rounding parity with the oracle).
    d = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    srow = e.agg(F.min("u").alias("s")).collect()[0]
    src = srow["s"]  # None on an empty edge list == the CTE's NULL seed
    # r11: per-hop checkpoints LAZY (the graph_effective_diameter
    # lesson) — the LogicalRDD swap alone dedups the two readers of
    # each hop (next frontier + final union); one closing action
    # materializes the whole cascade instead of a blocking job per hop.
    lvl = spark.createDataFrame([(src, 0)], "pk bigint, hop int").localCheckpoint(
        eager=False
    )
    levels = [lvl]
    seen = lvl.select("pk")
    for h in range(1, 4):
        lvl = (
            d.join(lvl.select(F.col("pk").alias("u")), "u")
            .select(F.col("v").alias("pk"))
            .distinct()
            .join(seen, "pk", "left_anti")
            .select("pk", F.lit(h).cast("int").alias("hop"))
            .localCheckpoint(eager=False)
        )
        levels.append(lvl)
        seen = seen.unionByName(lvl.select("pk"))
    m = levels[0]
    for nxt in levels[1:]:
        m = m.unionByName(nxt)
    m.createOrReplaceTempView("bireme_bfs_m")
    return spark.sql(
        "SELECT hop, COUNT(*) AS n_parts,"
        " MIN(pk) AS min_partkey, MAX(pk) AS max_partkey"
        " FROM bireme_bfs_m GROUP BY hop ORDER BY hop"
    )


GRAPH_BFS_SQL = (
    """
WITH RECURSIVE
po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
d AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
"""
    + _BFS_SQL_BODY.replace("WITH RECURSIVE reach", "reach", 1)
    .replace("{e}", "e")
    .replace("{d}", "d")
    .lstrip()
)

QUERIES["graph_reachability_bfs"] = graph_reachability_bfs
ORACLE["graph_reachability_bfs"] = GRAPH_BFS_SQL


# ---------------------------------------------------------------------------
# graph_clustering_coefficient — per-node local CC over the co-purchase graph
# ---------------------------------------------------------------------------


def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local clustering coefficient (2·tri_v / deg_v·(deg_v−1)) for
    the 20 highest-degree parts of the co-purchase graph — how
    clique-like each hub's neighborhood is, the community-structure
    audit next to the global triangle count.

    Scale design: same bounded edge construction and degree-ordered
    wedge counting as ``graph_triangle_count`` (the skew-safe
    O(m^1.5) plan); each found triangle then explodes map-side into
    its 3 member nodes and ONE node-key agg yields per-node triangle
    counts. The oracle enumerates the same triangle SET with the
    simple id orientation — per-node counts are orientation-invariant.
    Top-20 is TakeOrdered by (degree desc, id).
    """
    edges = _copurchase_edges(spark, sf_dir)
    edges = edges.persist()
    try:
        # r11 opt: deg persisted — the |V|-row table feeds BOTH
        # orientation joins AND the closing top-20 join, so its agg
        # subtree otherwise executes 3× in one DAG (the
        # _count_triangles profile: ~2.4 s/computation at sf0.1).
        deg = (
            edges.select(F.col("u").alias("x"))
            .unionAll(edges.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("deg"))
            .persist()
        )
        lo_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        e = (
            edges.join(deg.withColumnRenamed("x", "u").withColumnRenamed("deg", "du"), "u")
            .join(deg.withColumnRenamed("x", "v").withColumnRenamed("deg", "dv"), "v")
            .select(
                F.when(lo_first, F.col("u")).otherwise(F.col("v")).alias("lo"),
                F.when(lo_first, F.col("v")).otherwise(F.col("u")).alias("hi"),
            )
        )
        # r10 opt: sorted-adjacency intersection (the _count_triangles
        # plan) instead of the exploded wedge join + closing-edge join —
        # each oriented edge (lo, hi) yields its triangles map-side as
        # the common out-neighbors w, so the wedge fan-out never hits a
        # shuffle; the (lo, hi, w) stream enumerates each triangle
        # exactly once and per-node counts are orientation-invariant.
        adj = e.groupBy("lo").agg(F.sort_array(F.collect_set("hi")).alias("nbrs"))
        # e ⋈ adj on lo == adj re-exploded map-side (see _count_triangles)
        tri = (
            adj.select("lo", F.explode("nbrs").alias("hi"), F.col("nbrs").alias("n_lo"))
            .join(adj.select(F.col("lo").alias("hi"), F.col("nbrs").alias("n_hi")), "hi")
            .select("lo", "hi", F.explode(F.array_intersect("n_lo", "n_hi")).alias("w"))
        )
        tri_per_node = (
            tri.select(F.explode(F.array("lo", "hi", "w")).alias("x"))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("n_triangles"))
        )
        out = (
            deg.join(tri_per_node, "x", "left")
            .select(
                F.col("x").alias("p_partkey"),
                "deg",
                F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
                F.round(
                    F.lit(2.0)
                    * F.coalesce("n_triangles", F.lit(0)).cast("double")
                    / (F.col("deg").cast("double") * (F.col("deg") - 1).cast("double")),
                    6,
                ).alias("clustering_coeff"),
            )
            .orderBy(F.col("deg").desc(), "p_partkey")
            .limit(20)
        )
        out = out.localCheckpoint(eager=True)
    finally:
        deg.unpersist()
        edges.unpersist()
    return out


CLUSTERING_COEFF_SQL = """
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
deg AS (
  SELECT x, COUNT(*) AS deg FROM (
    SELECT u AS x FROM e UNION ALL SELECT v FROM e
  ) GROUP BY 1
),
tri AS (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM e e1 JOIN e e2 ON e2.u = e1.u AND e1.v < e2.v
            JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
),
tpn AS (
  SELECT x, COUNT(*) AS n_triangles FROM (
    SELECT a AS x FROM tri UNION ALL SELECT b FROM tri UNION ALL SELECT c FROM tri
  ) GROUP BY 1
)
SELECT d.x AS p_partkey, CAST(d.deg AS BIGINT) AS deg,
       CAST(COALESCE(t.n_triangles, 0) AS BIGINT) AS n_triangles,
       ROUND(2.0 * COALESCE(t.n_triangles, 0)
             / (CAST(d.deg AS DOUBLE) * (d.deg - 1)), 6) AS clustering_coeff
FROM deg d LEFT JOIN tpn t ON d.x = t.x
ORDER BY d.deg DESC, p_partkey
LIMIT 20
"""

QUERIES["graph_clustering_coefficient"] = graph_clustering_coefficient
ORACLE["graph_clustering_coefficient"] = CLUSTERING_COEFF_SQL


# ---------------------------------------------------------------------------
# orders_totalprice_reconciliation — cross-table consistency audit
# ---------------------------------------------------------------------------


def orders_totalprice_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table reconciliation: does each order's header total
    equal the DECIMAL-exact sum of its line charges
    (extendedprice·(1−disc)·(1+tax))? The post-sync consistency check
    a finance pipeline runs nightly — reported as a banded histogram
    of |header − Σ lines| so drift magnitude is visible, never
    swallowed into a single boolean.

    Scale design: ONE order-key shuffle aggregates line charges; the
    header join rides the same key; banding is a map-side CASE and
    the final agg is 4 cells. All money math is DECIMAL-exact, so
    the bands are engine-identical.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            money("l_extendedprice")
            * (F.lit(1).cast("decimal(5,2)") - F.col("l_discount").cast("decimal(5,2)"))
            * (F.lit(1).cast("decimal(5,2)") + F.col("l_tax").cast("decimal(5,2)"))
        ).alias("charge"),
    )
    per_order = li.groupBy("l_orderkey").agg(F.sum("charge").alias("line_total"))
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", money("o_totalprice").alias("header_total")
    )
    j = o.join(per_order, o.o_orderkey == per_order.l_orderkey, "left").select(
        F.abs(
            F.col("header_total").cast("decimal(24,6)")
            - F.coalesce(F.col("line_total"), F.lit(0)).cast("decimal(24,6)")
        ).alias("absdiff"),
        F.col("header_total").cast("decimal(24,6)").alias("header"),
    ).withColumn(
        "ratio", F.col("absdiff").cast("double") / F.col("header").cast("double")
    )
    band = (
        F.when(F.col("absdiff") == 0, "0_exact")
        .when(F.col("ratio") <= 0.25, "1_upto_25pct")
        .when(F.col("ratio") <= 0.50, "2_upto_50pct")
        .when(F.col("ratio") <= 1.00, "3_upto_100pct")
        .otherwise("4_over_100pct")
    )
    return (
        j.select(band.alias("band"), "absdiff")
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            # round the exact DECIMAL sum to 2dp BEFORE the double
            # cast: above ~9e9 the 6dp-scaled integer exceeds 2^53
            # and DuckDB's decimal→double (int128 scale-divide in
            # binary) differs from Java's correctly-rounded
            # BigDecimal.doubleValue by one ulp (sf0.1 gate catch)
            F.round(F.sum(F.col("absdiff")), 2).cast("double").alias(
                "total_abs_drift"
            ),
        )
        .orderBy("band")
    )


TOTALPRICE_RECON_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (1 - CAST(l_discount AS DECIMAL(5,2)))
             * (1 + CAST(l_tax AS DECIMAL(5,2)))) AS line_total
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT ABS(CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DECIMAL(24,6))
             - CAST(COALESCE(p.line_total, 0) AS DECIMAL(24,6))) AS absdiff,
         CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DECIMAL(24,6)) AS header
  FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
),
r AS (
  SELECT absdiff, CAST(absdiff AS DOUBLE) / CAST(header AS DOUBLE) AS ratio FROM j
)
SELECT CASE WHEN absdiff = 0 THEN '0_exact'
            WHEN ratio <= 0.25 THEN '1_upto_25pct'
            WHEN ratio <= 0.50 THEN '2_upto_50pct'
            WHEN ratio <= 1.00 THEN '3_upto_100pct'
            ELSE '4_over_100pct' END AS band,
       COUNT(*) AS n_orders,
       CAST(ROUND(SUM(absdiff), 2) AS DOUBLE) AS total_abs_drift
FROM r GROUP BY 1 ORDER BY 1
"""

QUERIES["orders_totalprice_reconciliation"] = orders_totalprice_reconciliation
ORACLE["orders_totalprice_reconciliation"] = TOTALPRICE_RECON_SQL


def graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the part co-purchase graph (Newman
    2002): the Pearson correlation of endpoint degrees over edges —
    do hub parts co-purchase with other hubs (r > 0) or with
    peripherals (r < 0)? The one-number structure summary beside
    triangle count and clustering coefficient.

    Scale design: reuses the per-order-bounded edge builder; degrees
    are one key-count agg joined onto edges (id-only traffic). Both
    edge orientations contribute (the undirected convention), so the
    sufficient statistics are symmetric: Σd_u+d_v, Σd_u², Σd_u·d_v —
    ALL exact integers (degrees are ints); r is one closing IEEE
    expression, identical on both engines."""
    # r11: a node-moment rewrite (deg join once onto the directed view,
    # closing agg over |V| rows: s1 = Σdx², s2 = Σdx³, sp2 = Σdx·sd_x)
    # A/B-LOST here: old 6.488 / new 7.365 min-of-3 — the doubled
    # directed-view join + extra groupBy costs more than the second
    # |E| join it removes. Keep the two-join form.
    edges = _copurchase_edges(spark, sf_dir).persist()
    try:
        # r11 opt: deg persisted — its agg subtree otherwise executes
        # once per orientation join in the same DAG (the triangle-
        # family lesson: exchange reuse does not fire across
        # AQE-replanned subtrees). A/B in OPTIMIZATION_r11.md.
        deg = (
            edges.select(F.col("u").alias("x"))
            .unionAll(edges.select(F.col("v").alias("x")))
            .groupBy("x")
            .agg(F.count(F.lit(1)).alias("deg"))
            .persist()
        )
        e = edges.join(
            deg.withColumnRenamed("x", "u").withColumnRenamed("deg", "du"), "u"
        ).join(deg.withColumnRenamed("x", "v").withColumnRenamed("deg", "dv"), "v")
        # symmetric statistics over both orientations: 2m pairs
        stats = e.agg(
            F.count(F.lit(1)).cast("long").alias("m"),
            F.sum(F.col("du") + F.col("dv")).cast("long").alias("s1"),
            F.sum(
                F.col("du") * F.col("du") + F.col("dv") * F.col("dv")
            ).cast("long").alias("s2"),
            F.sum(F.col("du") * F.col("dv")).cast("long").alias("sp"),
        ).collect()[0]
    finally:
        deg.unpersist()
        edges.unpersist()
    m2 = 2 * stats["m"]  # directed pair count
    raw = spark.createDataFrame(
        [(stats["m"], m2, stats["s1"], stats["s2"], 2 * stats["sp"])],
        "n_edges long, n_pairs long, s1 long, s2 long, sp2 long",
    )
    # r = (sp/m2 − (s1/m2)²) / (s2/m2 − (s1/m2)²) with symmetric
    # marginals; all inputs exact ints → one IEEE expression
    mean = F.col("s1").cast("double") / F.col("n_pairs").cast("double")
    num = F.col("sp2").cast("double") / F.col("n_pairs").cast("double") - mean * mean
    den = F.col("s2").cast("double") / F.col("n_pairs").cast("double") - mean * mean
    return raw.select(
        "n_edges",
        F.round(num / den, 6).alias("assortativity"),
    )


GRAPH_ASSORTATIVITY_SQL = """
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
deg AS (
  SELECT x, COUNT(*) AS d FROM (
    SELECT u AS x FROM e UNION ALL SELECT v FROM e
  ) GROUP BY 1
),
j AS (
  SELECT du.d AS du, dv.d AS dv
  FROM e JOIN deg du ON du.x = e.u JOIN deg dv ON dv.x = e.v
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m,
         CAST(2 * COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(du + dv) AS BIGINT) AS s1,
         CAST(SUM(du * du + dv * dv) AS BIGINT) AS s2,
         CAST(2 * SUM(du * dv) AS BIGINT) AS sp2
  FROM j
)
SELECT m AS n_edges,
       ROUND((CAST(sp2 AS DOUBLE) / n_pairs
              - (CAST(s1 AS DOUBLE) / n_pairs) * (CAST(s1 AS DOUBLE) / n_pairs))
             / (CAST(s2 AS DOUBLE) / n_pairs
                - (CAST(s1 AS DOUBLE) / n_pairs) * (CAST(s1 AS DOUBLE) / n_pairs)), 6)
         AS assortativity
FROM stats
"""

QUERIES["graph_assortativity"] = graph_assortativity
ORACLE["graph_assortativity"] = GRAPH_ASSORTATIVITY_SQL


def orders_simpson_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simpson's-paradox audit: does the PROMO vs non-PROMO revenue
    gap keep its sign inside every supplier nation, or does the
    aggregate direction reverse once stratified? The aggregation
    trap every self-serve dashboard eventually hits — surfaced as a
    per-stratum report with an 'ALL' row, each stratum flagged when
    its gap sign contradicts the aggregate's.

    Scale design: one partkey join + one supplier/nation join, then
    ONE map-side-combined agg to ≤2·(|nations|+1) DECIMAL cells;
    gaps are IEEE divisions of exact sums. Grouping-sets emit the
    stratified and aggregate rows in the same pass (no second
    scan)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (
            money("l_extendedprice")
            * (F.lit(1).cast("decimal(5,2)") - F.col("l_discount").cast("decimal(5,2)"))
        ).alias("rev"),
    )
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_type").startswith("PROMO").alias("promo")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(F.col("n_name").alias("nation"), "promo", "rev")
    )
    cells = base.cube("nation", "promo").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("rev").alias("s")
    ).where(F.col("promo").isNotNull())  # keep nation strata + ALL (nation null)
    mean = F.col("s").cast("double") / F.col("cnt").cast("double")
    wide = (
        cells.groupBy("nation")
        .agg(
            F.max(F.when(F.col("promo"), mean)).alias("promo_mean"),
            F.max(F.when(~F.col("promo"), mean)).alias("other_mean"),
        )
        .select(
            F.coalesce("nation", F.lit("ALL")).alias("stratum"),
            F.round("promo_mean", 6).alias("promo_mean"),
            F.round("other_mean", 6).alias("other_mean"),
            (F.col("promo_mean") - F.col("other_mean")).alias("_gap"),
        )
    )
    overall = wide.where(F.col("stratum") == "ALL").select(
        F.col("_gap").alias("_overall_gap")
    )
    return (
        wide.crossJoin(F.broadcast(overall))
        .select(
            "stratum",
            "promo_mean",
            "other_mean",
            F.round("_gap", 6).alias("gap"),
            (
                (F.col("stratum") != "ALL")
                & (F.signum("_gap") != F.signum("_overall_gap"))
            ).alias("reversed"),
        )
        .orderBy("stratum")
    )


ORDERS_SIMPSON_SQL = """
WITH base AS (
  SELECT n.n_name AS nation,
         p.p_type LIKE 'PROMO%' AS promo,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * (CAST(1 AS DECIMAL(5,2)) - CAST(l.l_discount AS DECIMAL(5,2))) AS rev
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
),
cells AS (
  SELECT nation, promo, COUNT(*) AS cnt, SUM(rev) AS s
  FROM base GROUP BY CUBE (nation, promo)
),
wide AS (
  SELECT COALESCE(nation, 'ALL') AS stratum,
         MAX(CASE WHEN promo THEN CAST(s AS DOUBLE) / cnt END) AS promo_mean,
         MAX(CASE WHEN NOT promo THEN CAST(s AS DOUBLE) / cnt END) AS other_mean
  FROM cells WHERE promo IS NOT NULL
  GROUP BY 1
),
overall AS (SELECT promo_mean - other_mean AS og FROM wide WHERE stratum = 'ALL')
SELECT stratum,
       ROUND(promo_mean, 6) AS promo_mean,
       ROUND(other_mean, 6) AS other_mean,
       ROUND(promo_mean - other_mean, 6) AS gap,
       (stratum <> 'ALL' AND SIGN(promo_mean - other_mean) <> SIGN(og)) AS reversed
FROM wide, overall
ORDER BY stratum
"""

QUERIES["orders_simpson_audit"] = orders_simpson_audit
ORACLE["orders_simpson_audit"] = ORDERS_SIMPSON_SQL


def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-coefficient link prediction on the part co-purchase
    graph (Liben-Nowell & Kleinberg 2003): for every NON-adjacent
    pair with ≥2 common neighbors, score = |N(u)∩N(v)| / |N(u)∪N(v)|;
    emit the top-20 predicted links — the "parts bought together
    next" recommender baseline.

    Exactness: common-neighbor counts and degrees are integers; the
    score is exact integer ppm ((∩ × 1e6) DIV ∪ on both engines) so
    ranking and values hash-match. Ties break on the id pair.

    Scale design: the wedge stream is Σ C(deg(u),2) rows — bounded
    here because co-purchase degrees are basket-limited (≤7 parts per
    order ⇒ deg grows with order count, not catastrophically); ONE
    (u,v) groupBy counts common neighbors, existing edges leave via a
    broadcast-free anti-join on the same key, degrees join from the
    node-count-sized table. At 100 TB you'd additionally cap
    super-hub roots (drop deg > K wedge roots before pairing — the
    standard approximation); the plan is otherwise unchanged.

    The graph is built from a DETERMINISTIC 12.5% basket sample
    (l_orderkey % 8 == 0) — link-prediction scores on a uniform
    basket sample are the standard scale mitigation (the wedge
    stream shrinks quadratically with degree), and the oracle mirrors
    the same sample, so the metric stays exact on the subgraph."""
    # r11: an eager edge checkpoint A/B-LOST here (old 3.711 / new
    # 4.420 min-of-3 HASH-EQ) even though the twin rewrite won on
    # graph_label_propagation/assortativity/powerlaw — this sampled
    # 1/8 edge build is cheap enough that the blocking checkpoint
    # job + cache scans cost more than the duplicate derivations.
    edges = _copurchase_edges(
        spark, sf_dir, node_filter=F.col("l_orderkey") % 8 == 0
    )
    adj = edges.select(F.col("u").alias("n"), F.col("v").alias("nb")).unionByName(
        edges.select(F.col("v").alias("n"), F.col("u").alias("nb"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    a = adj.select(F.col("n").alias("root"), F.col("nb").alias("x"))
    b = adj.select(F.col("n").alias("root"), F.col("nb").alias("y"))
    wedges = (
        a.join(b, "root")
        .where(F.col("x") < F.col("y"))
        .groupBy(F.col("x").alias("u"), F.col("y").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"))
        .where(F.col("common") >= 2)
    )
    cand = wedges.join(edges, ["u", "v"], "left_anti")
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("deg_u"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("deg_v"))
    scored = (
        cand.join(du, "u")
        .join(dv, "v")
        .select(
            "u",
            "v",
            "common",
            (F.col("deg_u") + F.col("deg_v") - F.col("common")).alias("union_size"),
            F.expr("(common * 1000000) DIV (deg_u + deg_v - common)").alias(
                "jaccard_ppm"
            ),
        )
    )
    return scored.orderBy(
        F.col("jaccard_ppm").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(20)


GRAPH_LINK_PREDICTION_SQL = """
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             FROM lineitem WHERE l_orderkey % 8 = 0),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
adj AS (SELECT u AS n, v AS nb FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT n, COUNT(*) AS deg FROM adj GROUP BY 1),
wedges AS (
  SELECT a.nb AS u, b.nb AS v, COUNT(*) AS common
  FROM adj a JOIN adj b ON a.n = b.n AND a.nb < b.nb
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
cand AS (
  SELECT w.u, w.v, w.common FROM wedges w
  ANTI JOIN e ON e.u = w.u AND e.v = w.v
),
scored AS (
  SELECT c.u, c.v, c.common,
         du.deg + dv.deg - c.common AS union_size,
         (c.common * 1000000) // (du.deg + dv.deg - c.common) AS jaccard_ppm
  FROM cand c
  JOIN deg du ON du.n = c.u
  JOIN deg dv ON dv.n = c.v
)
SELECT u, v, CAST(common AS BIGINT) AS common,
       CAST(union_size AS BIGINT) AS union_size,
       CAST(jaccard_ppm AS BIGINT) AS jaccard_ppm
FROM scored
ORDER BY jaccard_ppm DESC, u ASC, v ASC
LIMIT 20
"""

QUERIES["graph_link_prediction"] = graph_link_prediction
ORACLE["graph_link_prediction"] = GRAPH_LINK_PREDICTION_SQL


def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-core extraction by synchronized peeling (Seidman 1983;
    Batagelj-Zaveršnik at scale): 8 SYNCHRONIZED rounds of "drop
    every node with current degree < 3" over the sampled co-purchase
    graph, reporting the surviving subgraph per round — the dense-
    community skeleton (the 3-core is where triangle/link-prediction
    structure concentrates). Eight rounds is the deterministic SPEC,
    not an approximation knob: both engines run the identical
    unrolled peel, and the per-round census EXPOSES convergence (the
    last rounds repeat once the core stabilizes).

    Scale: each round is one degree agg + one semi-join on the
    shrinking edge set — k-core peels are the textbook iterate-to-
    fixpoint Spark workload (Pregel-style), and the synchronized
    variant needs no driver-side loop state beyond plan depth. Graph
    sampled at 12.5% of baskets like graph_link_prediction."""
    edges = _copurchase_edges(
        spark, sf_dir, node_filter=F.col("l_orderkey") % 8 == 0
    )
    # Per-round localCheckpoint: each peel reads the prior edge set
    # THREE times (degree union + both semi-joins); without cutting
    # lineage the plan grows 3^rounds and the optimizer drowns (the
    # dedup_components star-contraction rule). Eager checkpoint keeps
    # every round one small job.
    out = None
    e = edges.localCheckpoint(eager=True)
    for rnd in range(1, 9):
        deg = (
            e.select(F.col("u").alias("n"))
            .unionByName(e.select(F.col("v").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        keep = deg.where(F.col("d") >= 3).select("n")
        e = (
            e.join(keep.select(F.col("n").alias("u")), "u")
            .join(keep.select(F.col("n").alias("v")), "v")
            .select("u", "v")
            # r11: the eager→LAZY flip (graph_effective_diameter
            # lesson) A/B'd tie then OLD-WINS (5.569 vs 5.894
            # min-of-3 HASH-EQ on the re-run) — unlike graph_scc,
            # each round here feeds a census broadcast that re-enters
            # the lazy cascade mid-job. Keep EAGER.
            .localCheckpoint(eager=True)
        )
        nodes = e.select(F.col("u").alias("n")).unionByName(
            e.select(F.col("v").alias("n"))
        ).distinct()
        census = e.agg(F.count(F.lit(1)).alias("n_edges")).join(
            F.broadcast(nodes.agg(F.count(F.lit(1)).alias("n_nodes"))), F.lit(True)
        ).select(F.lit(rnd).alias("round"), "n_nodes", "n_edges")
        out = census if out is None else out.unionByName(census)
    return out.orderBy("round")


def _kcore_sql() -> str:
    """Unrolled 8-round peel — generated once so the Spark loop and
    the oracle share the same round count and k by construction."""
    parts = [
        "WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk",
        "            FROM lineitem WHERE l_orderkey % 8 = 0),",
        "e0 AS MATERIALIZED (SELECT DISTINCT a.pk AS u, b.pk AS v",
        "       FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk),",
    ]
    for r in range(1, 9):
        p = r - 1
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT n FROM (SELECT u AS n FROM e{p} UNION ALL"
            f" SELECT v FROM e{p}) t GROUP BY 1 HAVING COUNT(*) >= 3),"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT e{p}.u, e{p}.v FROM e{p}"
            f" JOIN k{r} a ON a.n = e{p}.u JOIN k{r} b ON b.n = e{p}.v),"
        )
    parts[-1] = parts[-1].rstrip(",")
    selects = [
        f"SELECT {r} AS round,"
        f" (SELECT COUNT(*) FROM (SELECT u FROM e{r} UNION SELECT v FROM e{r}) t)"
        f" AS n_nodes,"
        f" (SELECT COUNT(*) FROM e{r}) AS n_edges"
        for r in range(1, 9)
    ]
    return "\n".join(parts) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY round"


QUERIES["graph_kcore_peel"] = graph_kcore_peel
ORACLE["graph_kcore_peel"] = _kcore_sql()


def graph_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic–Adar link prediction on the part co-purchase graph
    (Adamic & Adar 2003; Liben-Nowell & Kleinberg 2003): for
    non-adjacent pairs with ≥2 common neighbors, score =
    Σ_{w ∈ Γ(u)∩Γ(v)} 1/ln(deg(w)) — the rare-shared-neighbor
    refinement of graph_link_prediction's plain Jaccard (a common
    neighbor that co-occurs with everything carries almost no
    signal; Adamic–Adar discounts it by its degree).

    Engine-exact: each wedge center's weight is an INTEGER
    micro-score (ROUND(1e6/ln(deg), 0) — a 1-ulp ln() difference
    would need the quotient within 1e-10 of .5 to flip, impossible
    across the finitely many degree values); the per-pair score is a
    BIGINT sum of those integers, so ranking and values hash-match.
    Ties break on the id pair.

    Scale: same bucketed wedge plan as graph_link_prediction
    (deterministic 12.5% basket sample, per-order fan-out ≤ C(7,2),
    ONE (u,v) groupBy, anti-join on the same key); the weight join
    adds one node-dimension-sized lookup on the wedge root. At
    100 TB cap super-hub roots before pairing, as documented there."""
    # r11: an eager edge checkpoint A/B'd a TIE here (old 4.372 / new
    # 4.504 min-of-3 HASH-EQ; the graph_link_prediction loss's twin)
    # — keep the simpler uncheckpointed form.
    edges = _copurchase_edges(spark, sf_dir, node_filter=F.col("l_orderkey") % 8 == 0)
    adj = edges.select(F.col("u").alias("n"), F.col("v").alias("nb")).unionByName(
        edges.select(F.col("v").alias("n"), F.col("u").alias("nb"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    wdeg = deg.where(F.col("deg") >= 2).select(
        "n",
        F.expr("CAST(ROUND(1000000.0 / LN(CAST(deg AS DOUBLE)), 0) AS BIGINT)").alias(
            "w_micro"
        ),
    )
    a = adj.select(F.col("n").alias("root"), F.col("nb").alias("x"))
    b = adj.select(F.col("n").alias("root"), F.col("nb").alias("y"))
    wedges = (
        a.join(b, "root")
        .where(F.col("x") < F.col("y"))
        .join(wdeg.withColumnRenamed("n", "root"), "root")
        .groupBy(F.col("x").alias("u"), F.col("y").alias("v"))
        .agg(F.count(F.lit(1)).alias("common"), F.sum("w_micro").alias("aa_micro"))
        .where(F.col("common") >= 2)
    )
    cand = wedges.join(edges, ["u", "v"], "left_anti")
    return cand.orderBy(
        F.col("aa_micro").desc(), F.col("u").asc(), F.col("v").asc()
    ).limit(20)


GRAPH_ADAMIC_ADAR_SQL = """
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             FROM lineitem WHERE l_orderkey % 8 = 0),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
adj AS (SELECT u AS n, v AS nb FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT n, COUNT(*) AS deg FROM adj GROUP BY 1),
wdeg AS (
  SELECT n, CAST(ROUND(1000000.0 / LN(CAST(deg AS DOUBLE)), 0) AS BIGINT) AS w_micro
  FROM deg WHERE deg >= 2
),
wedges AS (
  SELECT a.nb AS u, b.nb AS v, COUNT(*) AS common,
         CAST(SUM(w.w_micro) AS BIGINT) AS aa_micro
  FROM adj a JOIN adj b ON a.n = b.n AND a.nb < b.nb
  JOIN wdeg w ON w.n = a.n
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT w.u, w.v, CAST(w.common AS BIGINT) AS common, w.aa_micro
FROM wedges w
ANTI JOIN e ON e.u = w.u AND e.v = w.v
ORDER BY aa_micro DESC, u ASC, v ASC
LIMIT 20
"""

QUERIES["graph_adamic_adar"] = graph_adamic_adar
ORACLE["graph_adamic_adar"] = GRAPH_ADAMIC_ADAR_SQL


def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan
    et al. 2007), 3 unrolled rounds with the deterministic
    (count DESC, label ASC) tie-break: every node starts as its own
    community and adopts its neighborhood's plurality label each
    round — the near-linear community primitive (vs the modularity
    ladder's cost) over the sampled co-purchase graph; output is the
    community-size census (size → how many communities), the shape a
    catalog team reads for assortment clusters.

    Engine-exact: labels are ids and votes are integer counts; the
    plurality pick is an explicit ROW_NUMBER over (cnt DESC, label
    ASC) on both engines — no floats anywhere.

    Scale: each round is one edge-hash shuffle (adj ⨝ labels) + one
    (node, label) map-side-combined agg — the synchronous
    Pregel-superstep plan; 3 unrolled rounds, no driver loop, no
    lineage blow-up (the frames are joins, not recursion)."""
    # r11 opt: eager checkpoint — each of the 3 label rounds re-joins
    # adj, which otherwise re-derives the whole edge build per round
    # inside one DAG (the graph_link_prediction twin). A/B numbers in
    # OPTIMIZATION_r11.md.
    edges = _copurchase_edges(
        spark, sf_dir, node_filter=F.col("l_orderkey") % 8 == 0
    ).localCheckpoint(eager=True)
    adj = edges.select(F.col("u").alias("n"), F.col("v").alias("nb")).unionByName(
        edges.select(F.col("v").alias("n"), F.col("u").alias("nb"))
    )
    labels = adj.select(F.col("n")).distinct().select("n", F.col("n").alias("lbl"))
    w = Window.partitionBy("n").orderBy(F.col("cnt").desc(), F.col("lbl").asc())
    for _ in range(3):
        votes = (
            adj.join(labels.withColumnRenamed("n", "nb"), "nb")
            .groupBy("n", "lbl")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("n", "lbl")
        )
    comm = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("size"))
    return (
        comm.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_communities"))
        .orderBy("size")
    )


def _lpa_sql() -> str:
    rounds = []
    prev = "l0"
    for r in (1, 2, 3):
        rounds.append(
            f"""v{r} AS (
  SELECT a.n, p.lbl, COUNT(*) AS cnt
  FROM adj a JOIN {prev} p ON p.n = a.nb
  GROUP BY 1, 2
),
l{r} AS (
  SELECT n, lbl FROM (
    SELECT n, lbl, ROW_NUMBER() OVER (PARTITION BY n ORDER BY cnt DESC, lbl ASC) AS rn
    FROM v{r}
  ) t WHERE rn = 1
)"""
        )
        prev = f"l{r}"
    body = ",\n".join(rounds)
    return f"""
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             FROM lineitem WHERE l_orderkey % 8 = 0),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
adj AS (SELECT u AS n, v AS nb FROM e UNION ALL SELECT v, u FROM e),
l0 AS (SELECT DISTINCT n, n AS lbl FROM adj),
{body},
comm AS (SELECT lbl, COUNT(*) AS size FROM l3 GROUP BY 1)
SELECT CAST(size AS BIGINT) AS size, COUNT(*) AS n_communities
FROM comm GROUP BY 1 ORDER BY 1
"""


QUERIES["graph_label_propagation"] = graph_label_propagation
ORACLE["graph_label_propagation"] = _lpa_sql()


def graph_hits_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) on the bipartite
    customer→part purchase graph: hub scores over customers, authority
    scores over parts, three unrolled mutual-reinforcement rounds
    with max-normalization — "which parts do the broadest buyers
    buy" vs plain popularity (degree); the bipartite companion of
    embedding_knn_pagerank's eigenvector-centrality family.

    Engine-exact: the iterative-DECIMAL-update discipline — each
    normalized score is ROUND(sum/max, 6) as DECIMAL, so all three
    rounds are bit-identical; top-10 ties break on the part key.

    Scale: the edge list is one distinct (cust,part) projection of a
    deterministic 12.5% order sample; each round is two edge-hash
    aggs (map-side-combined) + a scalar max broadcast — synchronous
    supersteps, no driver loop."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") % 8 == 0)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        o.select("o_orderkey", "o_custkey")
        .join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # the edge list feeds all six per-round joins — checkpoint once
    # so the order-sample distinct shuffle doesn't recompute 6x
    edges = edges.localCheckpoint(eager=False)
    hub = edges.select("c").distinct().select(
        "c", F.lit(1).cast("decimal(18,6)").alias("h")
    )
    auth = None
    for _ in range(3):
        araw = (
            edges.join(hub, "c")
            .groupBy("p")
            .agg(F.sum("h").alias("raw"))
        )
        amax = araw.agg(F.max("raw").alias("mx"))
        auth = araw.crossJoin(F.broadcast(amax)).select(
            "p",
            F.expr("CAST(ROUND(CAST(raw AS DOUBLE) / CAST(mx AS DOUBLE), 6)"
                   " AS DECIMAL(18,6))").alias("a"),
        )
        hraw = (
            edges.join(auth, "p")
            .groupBy("c")
            .agg(F.sum("a").alias("raw"))
        )
        hmax = hraw.agg(F.max("raw").alias("mx"))
        hub = hraw.crossJoin(F.broadcast(hmax)).select(
            "c",
            F.expr("CAST(ROUND(CAST(raw AS DOUBLE) / CAST(mx AS DOUBLE), 6)"
                   " AS DECIMAL(18,6))").alias("h"),
        )
    return (
        auth.select(F.col("p").alias("partkey"), F.col("a").cast("double").alias("authority"))
        .orderBy(F.col("authority").desc(), F.col("partkey").asc())
        .limit(10)
    )


def _hits_sql() -> str:
    iters = []
    prev_h = "h0"
    for t in (1, 2, 3):
        iters.append(
            f"""ar{t} AS MATERIALIZED (
  SELECT e.p, SUM(h.h) AS raw FROM e JOIN {prev_h} h USING (c) GROUP BY 1
),
a{t} AS (
  SELECT p, CAST(ROUND(CAST(raw AS DOUBLE)
                       / CAST((SELECT MAX(raw) FROM ar{t}) AS DOUBLE), 6)
                 AS DECIMAL(18,6)) AS a
  FROM ar{t}
),
hr{t} AS MATERIALIZED (
  SELECT e.c, SUM(a.a) AS raw FROM e JOIN a{t} a USING (p) GROUP BY 1
),
h{t} AS (
  SELECT c, CAST(ROUND(CAST(raw AS DOUBLE)
                       / CAST((SELECT MAX(raw) FROM hr{t}) AS DOUBLE), 6)
                 AS DECIMAL(18,6)) AS h
  FROM hr{t}
)"""
        )
        prev_h = f"h{t}"
    body = ",\n".join(iters)
    return f"""
WITH e AS MATERIALIZED (
  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderkey % 8 = 0
),
h0 AS (SELECT DISTINCT c, CAST(1 AS DECIMAL(18,6)) AS h FROM e),
{body}
SELECT p AS partkey, CAST(a AS DOUBLE) AS authority
FROM a3
ORDER BY authority DESC, partkey ASC
LIMIT 10
"""


QUERIES["graph_hits_authorities"] = graph_hits_authorities
ORACLE["graph_hits_authorities"] = _hits_sql()


def graph_rich_club(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rich-club coefficient φ(k) of the sampled co-purchase graph
    (Zhou & Mondragón 2004): among nodes of degree > k, the realized
    edge density — does the hub set wire preferentially to itself
    (the "rich club" that makes assortativity positive at the top
    end)? Reported for a fixed k grid — the hub-structure census
    that complements degree assortativity (one number) and k-core
    (pruning-based) with the explicit density curve.

    Engine-exact: degrees and hub-edge counts are integers; φ is
    integer ppm (2·E_k·1e6 DIV (n_k·(n_k−1))). Rows with n_k < 2
    drop identically on both engines.

    Scale: degrees from one edge agg; each k-level is a semi-join
    of the edge list against the hub set — k-grid-sized passes over
    the node-dimension table."""
    edges = _copurchase_edges(spark, sf_dir, node_filter=F.col("l_orderkey") % 8 == 0)
    edges = edges.localCheckpoint(eager=False)
    adj = edges.select(F.col("u").alias("n"), F.col("v").alias("nb")).unionByName(
        edges.select(F.col("v").alias("n"), F.col("u").alias("nb"))
    )
    deg = adj.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    ks = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in (2, 4, 8, 16)])).alias("k")
    )
    hubs = deg.crossJoin(F.broadcast(ks)).where(F.col("deg") > F.col("k")).select(
        "k", "n"
    )
    nk = hubs.groupBy("k").agg(F.count(F.lit(1)).alias("n_k"))
    hu = hubs.select("k", F.col("n").alias("u"))
    hv = hubs.select(F.col("k").alias("k2"), F.col("n").alias("hv_n"))
    he = (
        edges.join(hu, "u")
        .join(hv, (F.col("v") == F.col("hv_n")) & (F.col("k") == F.col("k2")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e_k"))
    )
    return (
        nk.join(he, "k", "left")
        .where(F.col("n_k") >= 2)
        .select(
            "k",
            "n_k",
            F.coalesce("e_k", F.lit(0)).alias("e_k"),
            F.expr(
                "COALESCE(e_k, 0) * 2000000 DIV (n_k * (n_k - 1))"
            ).alias("phi_ppm"),
        )
        .orderBy("k")
    )


GRAPH_RICH_CLUB_SQL = """
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             FROM lineitem WHERE l_orderkey % 8 = 0),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
adj AS (SELECT u AS n, v AS nb FROM e UNION ALL SELECT v, u FROM e),
deg AS (SELECT n, COUNT(*) AS deg FROM adj GROUP BY 1),
ks AS (SELECT UNNEST([2, 4, 8, 16]) AS k),
hubs AS (
  SELECT ks.k, deg.n FROM deg CROSS JOIN ks WHERE deg.deg > ks.k
),
nk AS (SELECT k, COUNT(*) AS n_k FROM hubs GROUP BY 1),
he AS (
  SELECT hu.k, COUNT(*) AS e_k
  FROM e
  JOIN hubs hu ON hu.n = e.u
  JOIN hubs hv ON hv.n = e.v AND hv.k = hu.k
  GROUP BY 1
)
SELECT nk.k, CAST(nk.n_k AS BIGINT) AS n_k,
       CAST(COALESCE(he.e_k, 0) AS BIGINT) AS e_k,
       CAST(COALESCE(he.e_k, 0) * 2000000 // (nk.n_k * (nk.n_k - 1)) AS BIGINT)
         AS phi_ppm
FROM nk LEFT JOIN he ON he.k = nk.k
WHERE nk.n_k >= 2
ORDER BY nk.k
"""

QUERIES["graph_rich_club"] = graph_rich_club
ORACLE["graph_rich_club"] = GRAPH_RICH_CLUB_SQL


def graph_boruvka_msf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Borůvka minimum-spanning-forest rounds (Borůvka 1926 — THE
    distributed MST algorithm: GHS, MST-on-MapReduce and GraphX all
    run it) over the sampled co-purchase graph with distance
    d = 1e6 − co-purchase-count (strong affinities = cheap edges):
    TWO unrolled rounds of "every component picks its cheapest
    outgoing edge, components contract along the picked edges" with
    a deterministic (d, u, v) struct-min tie-break and BOUNDED
    pointer resolution — 2-cycle roots take min(c, partner), chains
    follow THREE unrolled pointer jumps (the same bounded-unrolling
    contract as the kcore peel: both engines run the identical spec,
    and the census shows convergence). Per round: component count,
    edges admitted to the forest, admitted weight.

    Engine-exact: distances and ids are integers; every min is a
    struct-ordered min_by with full (d,u,v) tie-break; pointer jumps
    are self-joins — no floats anywhere.

    Scale: each round is one min-edge agg keyed by component + a
    constant number of label-table self-joins (Pregel supersteps);
    the edge list checkpoints once."""
    edges = (
        _order_pairs(spark, sf_dir, node_filter=F.col("l_orderkey") % 8 == 0)
        .groupBy("u", "v")
        .agg((F.lit(1000000) - F.count(F.lit(1))).alias("d"))
    )
    edges = edges.localCheckpoint(eager=False)
    nodes = edges.select(F.col("u").alias("n")).unionByName(
        edges.select(F.col("v").alias("n"))
    ).distinct()
    comp = nodes.select("n", F.col("n").alias("c"))
    rows = []
    for rnd in (1, 2):
        ec = (
            edges.join(comp.select(F.col("n").alias("u"), F.col("c").alias("cu")), "u")
            .join(comp.select(F.col("n").alias("v"), F.col("c").alias("cv")), "v")
            .where(F.col("cu") != F.col("cv"))
        )
        # cheapest outgoing edge per component, struct tie-break
        pick_u = ec.select(F.col("cu").alias("c"), "d", "u", "v", F.col("cv").alias("pc"))
        pick_v = ec.select(F.col("cv").alias("c"), "d", "u", "v", F.col("cu").alias("pc"))
        picks = (
            pick_u.unionByName(pick_v)
            .groupBy("c")
            .agg(
                F.min_by(
                    F.struct("d", "u", "v", "pc"), F.struct("d", "u", "v")
                ).alias("e")
            )
            .select("c", "e.d", "e.u", "e.v", F.col("e.pc").alias("t"))
        )
        picks = picks.localCheckpoint(eager=False)
        # 2-cycle base + 3 unrolled pointer jumps
        t1 = picks.select("c", "t")
        cyc = (
            t1.join(t1.select(F.col("c").alias("t"), F.col("t").alias("tt")), "t")
            .select(
                "c",
                F.when(F.col("tt") == F.col("c"), F.least("c", "t"))
                .otherwise(F.col("t"))
                .alias("p"),
            )
        )
        p = cyc
        for _ in range(3):
            p = (
                p.join(
                    cyc.select(F.col("c").alias("p"), F.col("p").alias("pp")),
                    "p",
                    "left",
                )
                .select("c", F.coalesce("pp", "p").alias("p"))
            )
        comp = (
            comp.join(p.withColumnRenamed("c", "c_old"), comp["c"] == F.col("c_old"), "left")
            .select("n", F.coalesce("p", "c").alias("c"))
        )
        comp = comp.localCheckpoint(eager=False)
        forest = picks.select("d", "u", "v").distinct()
        rows.append(
            comp.agg(F.countDistinct("c").alias("n_components"))
            .crossJoin(
                F.broadcast(
                    forest.agg(
                        F.count(F.lit(1)).alias("n_edges_added"),
                        F.sum("d").alias("weight_added"),
                    )
                )
            )
            .select(
                F.lit(rnd).alias("round"),
                "n_components",
                "n_edges_added",
                "weight_added",
            )
        )
    res = rows[0]
    for df in rows[1:]:
        res = res.unionByName(df)
    return res.orderBy("round")


def _boruvka_sql() -> str:
    parts = []
    prev = "c0"
    for rnd in (1, 2):
        parts.append(
            f"""ec{rnd} AS MATERIALIZED (
  SELECT e.u, e.v, e.d, pu.c AS cu, pv.c AS cv
  FROM e JOIN {prev} pu ON pu.n = e.u JOIN {prev} pv ON pv.n = e.v
  WHERE pu.c <> pv.c
),
picks{rnd} AS MATERIALIZED (
  SELECT c, d, u, v, pc AS t FROM (
    SELECT c, d, u, v, pc,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY d, u, v) AS rn
    FROM (
      SELECT cu AS c, d, u, v, cv AS pc FROM ec{rnd}
      UNION ALL
      SELECT cv, d, u, v, cu FROM ec{rnd}
    ) both_dirs
  ) q WHERE rn = 1
),
cyc{rnd} AS MATERIALIZED (
  SELECT a.c,
         CASE WHEN b.t = a.c THEN LEAST(a.c, a.t) ELSE a.t END AS p
  FROM picks{rnd} a JOIN picks{rnd} b ON b.c = a.t
),
j{rnd}a AS (
  SELECT x.c, COALESCE(y.p, x.p) AS p
  FROM cyc{rnd} x LEFT JOIN cyc{rnd} y ON y.c = x.p
),
j{rnd}b AS (
  SELECT x.c, COALESCE(y.p, x.p) AS p
  FROM j{rnd}a x LEFT JOIN cyc{rnd} y ON y.c = x.p
),
j{rnd}c AS (
  SELECT x.c, COALESCE(y.p, x.p) AS p
  FROM j{rnd}b x LEFT JOIN cyc{rnd} y ON y.c = x.p
),
c{rnd} AS MATERIALIZED (
  SELECT pc.n, COALESCE(j.p, pc.c) AS c
  FROM {prev} pc LEFT JOIN j{rnd}c j ON j.c = pc.c
),
stats{rnd} AS (
  SELECT {rnd} AS round,
         (SELECT COUNT(DISTINCT c) FROM c{rnd}) AS n_components,
         (SELECT COUNT(*) FROM (SELECT DISTINCT d, u, v FROM picks{rnd}) f)
           AS n_edges_added,
         (SELECT CAST(SUM(d) AS BIGINT)
          FROM (SELECT DISTINCT d, u, v FROM picks{rnd}) f) AS weight_added
)"""
        )
        prev = f"c{rnd}"
    body = ",\n".join(parts)
    return f"""
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             FROM lineitem WHERE l_orderkey % 8 = 0),
e AS MATERIALIZED (
  SELECT a.pk AS u, b.pk AS v, 1000000 - COUNT(*) AS d
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
  GROUP BY 1, 2
),
nodes AS (SELECT DISTINCT n FROM (SELECT u AS n FROM e UNION ALL SELECT v FROM e) x),
c0 AS (SELECT n, n AS c FROM nodes),
{body}
SELECT CAST(round AS INTEGER) AS round,
       CAST(n_components AS BIGINT) AS n_components,
       CAST(n_edges_added AS BIGINT) AS n_edges_added, weight_added
FROM (SELECT * FROM stats1 UNION ALL SELECT * FROM stats2) s
ORDER BY round
"""


QUERIES["graph_boruvka_msf"] = graph_boruvka_msf
ORACLE["graph_boruvka_msf"] = _boruvka_sql()


# ---------------------------------------------------------------------------
# graph_pagerank — damped PageRank over the nation trade graph
# ---------------------------------------------------------------------------

_PR_ITERS = 5
_PR_D_E9 = 850_000_000  # damping 0.85 in e9 fixed point
_PR_ONE_E9 = 1_000_000_000


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (Page et al. 1999) over the nation-level trade
    graph: edge cust_nation -> supp_nation weighted by lineitem count
    (the q7 join collapsed to nation pairs). Five synchronous
    power-iteration supersteps in e9 FIXED-POINT integers — every
    update is (rank*weight) DIV out_weight per edge, then one
    (1-d)/n + d*mass close per node, all BIGINT with FLOOR-by-DIV,
    so both engines walk bit-identical rank vectors (the house
    engine-portable-iteration discipline; doubles would 1-ulp-split
    and amplify across iterations). Dangling nations (appear only as
    suppliers) leak their mass by design — documented classic
    PageRank-without-dangling-patch semantics, deterministic.

    Scale: the fact join collapses to a <=n^2-row edge list in one
    aggregation (nations are fixed cardinality -> broadcast hints per
    house rule); each superstep is an edge-sized join + node-sized
    agg on a localCheckpointed base — the textbook distributed
    PageRank plan, node state never touches the driver."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("u"), F.col("s_nationkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("w"))
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("u").alias("nk"))
        .unionByName(edges.select(F.col("v").alias("nk")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outw = edges.groupBy("u").agg(F.sum("w").alias("outw"))
    n_nodes = nodes.count()  # one tiny count; the node set is fixed-cardinality
    base_e9 = (_PR_ONE_E9 - _PR_D_E9) // n_nodes
    rank = nodes.select("nk", F.lit(_PR_ONE_E9 // n_nodes).alias("r"))
    for _ in range(_PR_ITERS):
        contrib = (
            edges.join(outw, "u")
            .join(rank, edges.u == rank.nk)
            .select(
                F.col("v").alias("nk"),
                F.expr("CAST(r AS BIGINT) * w DIV outw").alias("m"),
            )
            .groupBy("nk")
            .agg(F.sum("m").alias("mass"))
        )
        rank = nodes.join(contrib, "nk", "left").select(
            "nk",
            F.expr(
                f"CAST({base_e9} + {_PR_D_E9} * COALESCE(mass, 0)"
                f" DIV {_PR_ONE_E9} AS BIGINT)"
            ).alias("r"),
        )
    return (
        rank.join(F.broadcast(n), rank.nk == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("r").alias("rank_e9"),
        )
        .orderBy(F.col("rank_e9").desc(), "nation")
    )


def _pagerank_sql() -> str:
    iters = []
    prev = "r0"
    for i in range(1, _PR_ITERS + 1):
        iters.append(
            f"""r{i} AS (
  SELECT n.nk,
         CAST({{base}} + {_PR_D_E9} * COALESCE(SUM(p.r * e.w // o.outw), 0)
              // {_PR_ONE_E9} AS BIGINT) AS r
  FROM nodes n
  LEFT JOIN (edges e JOIN outw o ON e.u = o.u
             JOIN {prev} p ON e.u = p.nk) ON e.v = n.nk
  GROUP BY n.nk
)"""
        )
        prev = f"r{i}"
    return (
        """
WITH edges AS (
  SELECT c.c_nationkey AS u, s.s_nationkey AS v, COUNT(*) AS w
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
),
nodes AS (
  SELECT u AS nk FROM edges UNION SELECT v FROM edges
),
outw AS (SELECT u, SUM(w) AS outw FROM edges GROUP BY 1),
nn AS (SELECT COUNT(*) AS n_nodes FROM nodes),
r0 AS (
  SELECT nk, CAST(1000000000 // n_nodes AS BIGINT) AS r FROM nodes, nn
),
"""
        + ",\n".join(iters).replace(
            "{base}",
            f"(1000000000 - {_PR_D_E9}) // (SELECT n_nodes FROM nn)",
        )
        + f"""
SELECT n_name AS nation, r AS rank_e9
FROM {prev} JOIN nation ON nk = n_nationkey
ORDER BY rank_e9 DESC, nation
"""
    )


QUERIES["graph_pagerank"] = graph_pagerank
ORACLE["graph_pagerank"] = _pagerank_sql()


# ---------------------------------------------------------------------------
# graph_closeness_sample — sampled-source bounded closeness centrality
# ---------------------------------------------------------------------------

_CLOSENESS_SQL_BODY = """
WITH RECURSIVE reach(src, pk, hop) AS (
  SELECT u AS src, u AS pk, 0 AS hop
  FROM (SELECT DISTINCT u FROM {e} ORDER BY u LIMIT 4) seeds
  UNION ALL
  SELECT DISTINCT r.src, d.v, r.hop + 1
  FROM reach r JOIN {d} d ON d.u = r.pk
  WHERE r.hop < 3
),
m AS (SELECT src, pk, MIN(hop) AS dist FROM reach GROUP BY src, pk),
nn AS (SELECT COUNT(DISTINCT u) AS n_nodes FROM {d}),
agg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reached,
         CAST(SUM(dist) AS BIGINT) AS sum_dist
  FROM m GROUP BY src
)
SELECT src, n_reached, sum_dist,
       CAST(FLOOR((n_reached - 1) * (n_reached - 1) * 1000000.0
                  / ((n_nodes - 1) * sum_dist)) AS BIGINT) AS closeness_e6
FROM agg, nn
ORDER BY src
"""


def graph_closeness_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-source closeness centrality (Wasserman-Faust variant,
    which stays comparable on disconnected graphs) over the part
    co-purchase graph: bounded BFS (3 hops) from 4 deterministic
    seed parts IN ONE recursion — the (src, node) frontier carries
    the source id, so k sources cost one traversal, not k — then
    closeness = (r-1)^2 / ((n-1) * sum_dist) per source, emitted as
    FLOOR e6 over exact integer counts. This is the per-landmark
    half of the standard landmark/pivot closeness approximation
    (Eppstein-Wang 2004): at 100 TB you sample O(log n / eps^2)
    sources, and each adds one column to the SAME frontier relation,
    not a new pass.

    Same declarative-recursion discipline as
    ``graph_reachability_bfs``: SELECT DISTINCT frontier dedup keeps
    accumulated rows <= sources x nodes x hops (Spark's 1M recursion
    cap holds at sf0.1), MIN(hop) restores BFS distance, identical
    SQL text runs on both engines."""
    # checkpoint the edge base ONCE (the HITS/k-core lesson): the
    # directed view, the seed subquery and the node count all re-read
    # it, and without the cut each pays the pair build again.
    # keeps the self-join edge build (NOT _copurchase_edges): with the
    # recursion dominating, the checkpointed collect_set build A/B-LOST
    # (r10 opt: old 6.98 vs new 8.66 min-of-3, same pattern as
    # graph_betweenness_sample / graph_reachability_bfs)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    po = li.distinct().select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    a = po.select("ok", F.col("pk").alias("u"))
    b = po.select("ok", F.col("pk").alias("v"))
    e = (
        a.join(b, "ok")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=True)
    )
    # r11 opt (VERDICT #4): persisted iterative multi-source BFS
    # replaces the recursive CTE on the SPARK side only (oracle text
    # unchanged). Equivalence: the CTE revisits nodes and the closing
    # MIN(hop) keeps each (src, pk)'s FIRST hop — exactly what the
    # anti-join-pruned frontier emits, so `m` is row-identical by
    # construction; the closing rollup keeps the letter-identical SQL
    # text (1000000.0 decimal-literal semantics included) with the
    # same COUNT(DISTINCT u) node count over the directed view.
    d = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    d.createOrReplaceTempView("bireme_clo_d")
    lvl = (
        e.select("u")
        .distinct()
        .orderBy("u")
        .limit(4)
        .select(
            F.col("u").alias("src"),
            F.col("u").alias("pk"),
            F.lit(0).cast("int").alias("hop"),
        )
        # r11: the eager→LAZY per-hop flip A/B'd tie then OLD-WINS
        # (8.356 vs 9.957 min-of-3 HASH-EQ on the re-run; the
        # reachability twin KEPT lazy — its seed is a 1-row
        # createDataFrame, this one is a limit-4 sort the eager job
        # materializes while the box is otherwise idle). Keep EAGER.
        .localCheckpoint(eager=True)
    )
    levels = [lvl]
    seen = lvl.select("src", "pk")
    for h in range(1, 4):
        lvl = (
            d.join(lvl.select("src", F.col("pk").alias("u")), "u")
            .select("src", F.col("v").alias("pk"))
            .distinct()
            .join(seen, ["src", "pk"], "left_anti")
            .select("src", "pk", F.lit(h).cast("int").alias("hop"))
            .localCheckpoint(eager=True)
        )
        levels.append(lvl)
        seen = seen.unionByName(lvl.select("src", "pk"))
    m = levels[0]
    for nxt in levels[1:]:
        m = m.unionByName(nxt)
    m.createOrReplaceTempView("bireme_clo_m")
    return spark.sql(
        """
WITH m AS (SELECT src, pk, MIN(hop) AS dist FROM bireme_clo_m GROUP BY src, pk),
nn AS (SELECT COUNT(DISTINCT u) AS n_nodes FROM bireme_clo_d),
agg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reached,
         CAST(SUM(dist) AS BIGINT) AS sum_dist
  FROM m GROUP BY src
)
SELECT src, n_reached, sum_dist,
       CAST(FLOOR((n_reached - 1) * (n_reached - 1) * 1000000.0
                  / ((n_nodes - 1) * sum_dist)) AS BIGINT) AS closeness_e6
FROM agg, nn
ORDER BY src
"""
    )


GRAPH_CLOSENESS_SQL = (
    """
WITH RECURSIVE
po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
d AS (SELECT u, v FROM e UNION ALL SELECT v AS u, u AS v FROM e),
"""
    + _CLOSENESS_SQL_BODY.replace("WITH RECURSIVE reach", "reach", 1)
    .replace("{e}", "e")
    .replace("{d}", "d")
    .lstrip()
)

QUERIES["graph_closeness_sample"] = graph_closeness_sample
ORACLE["graph_closeness_sample"] = GRAPH_CLOSENESS_SQL


# ---------------------------------------------------------------------------
# events_k_anonymity — quasi-identifier re-identification audit
# ---------------------------------------------------------------------------


def events_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002) of the event stream under the
    quasi-identifier (event_type, hour-of-day, value decade): the
    privacy screen a warehouse runs BEFORE exporting 'anonymized'
    analytics — any QI class with few distinct users re-identifies
    them. Emits the k-band histogram (k=1 unique, 2-4, 5-9, 10+):
    classes, user-rows at risk, and the share of the stream below
    k=5 in integer ppm.

    Exactness: k = COUNT(DISTINCT user) per QI class (exact two-level
    hash agg, map-side partial); value decade = FLOOR(value) DIV 10
    (FLOOR of identical doubles, then pure integers); band edges are
    integer comparisons.

    Scale: one (QI -> k) aggregation — the distinct rides the same
    shuffle; the band rollup is |classes|-sized. No window, no sort
    beyond the 4-row presentation."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("hh"),
        F.expr("CAST(FLOOR(value) AS BIGINT) DIV 10").alias("vband"),
        "user_id",
    )
    cls = e.groupBy("event_type", "hh", "vband").agg(
        F.countDistinct("user_id").alias("k"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    banded = cls.select(
        F.expr(
            "CASE WHEN k = 1 THEN '1-unique' WHEN k < 5 THEN '2-4'"
            " WHEN k < 10 THEN '5-9' ELSE '10+' END"
        ).alias("k_band"),
        "k",
        "n_rows",
    )
    tot = banded.agg(F.sum("n_rows").alias("n_total"))
    return (
        banded.groupBy("k_band")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_classes"),
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.min("k").cast("bigint").alias("min_k"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "k_band",
            "n_classes",
            "n_rows",
            "min_k",
            F.expr("CAST(n_rows * 1000000 DIV n_total AS BIGINT)").alias(
                "share_ppm"
            ),
        )
        .orderBy("k_band")
    )


EVENTS_K_ANONYMITY_SQL = """
WITH cls AS (
  SELECT event_type, CAST(hour(ts) AS INTEGER) AS hh,
         CAST(FLOOR(value) AS BIGINT) // 10 AS vband,
         COUNT(DISTINCT user_id) AS k, COUNT(*) AS n_rows
  FROM events GROUP BY 1, 2, 3
),
banded AS (
  SELECT CASE WHEN k = 1 THEN '1-unique' WHEN k < 5 THEN '2-4'
              WHEN k < 10 THEN '5-9' ELSE '10+' END AS k_band,
         k, n_rows
  FROM cls
),
tot AS (SELECT SUM(n_rows) AS n_total FROM banded)
SELECT k_band,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(n_rows) AS BIGINT) AS n_rows,
       CAST(MIN(k) AS BIGINT) AS min_k,
       CAST(SUM(n_rows) * 1000000 // MAX(n_total) AS BIGINT) AS share_ppm
FROM banded, tot
GROUP BY k_band ORDER BY k_band
"""

QUERIES["events_k_anonymity"] = events_k_anonymity
ORACLE["events_k_anonymity"] = EVENTS_K_ANONYMITY_SQL


_BTW_H = 3  # bounded shortest-path horizon
_BTW_SRC = 4  # sampled sources


def graph_betweenness_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sampled-source betweenness centrality (Brandes 2001, the
    pivot-sampling estimator of Brandes & Pich 2007) over the part
    co-purchase graph, bounded to shortest paths of length ≤ 3 — the
    broker/bridge score that closeness and PageRank both miss (a
    low-degree part wiring two communities scores high ONLY here).
    4 deterministic md5-min seed sources; forward BFS levels carry
    exact integer path counts σ; the backward pass accumulates
    Brandes' δ(v) = Σ_w (σ_v/σ_w)(1+δ_w) ENTIRELY in integers:
    δ in e6 units via per-edge truncating division
    σ_v·(10⁶+δ_w) DIV σ_w with DECIMAL(38,0) products (σ grows
    multiplicatively with degree — the r8 overflow rule). Emits the
    top-15 parts by accumulated δ.

    Engine-exact: σ, δ_e6 and every term are integers; level
    frontiers dedup by anti-join, so both engines walk identical
    BFS DAGs (ties don't exist — σ sums over ALL shortest
    predecessors, the Brandes contract).

    Scale: each level is one frontier⋈edges shuffle (node-keyed);
    per-level frames persist (the kcenter persisted-loop rule —
    each level feeds the next level AND the backward pass); k
    sources ride ONE frontier relation with a src column, so
    sampling more pivots widens rows, not passes. The oracle replays
    the identical algebra as chained MATERIALIZED CTEs."""
    # keeps the self-join edge build (NOT _copurchase_edges): the
    # checkpointed collect_set build A/B-LOST here (r10 opt: old
    # 10.14 vs new 11.91 min-of-3 — same pattern as
    # graph_closeness_sample / graph_reachability_bfs)
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    po = li.distinct().select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    )
    a = po.select("ok", F.col("pk").alias("u"))
    b = po.select("ok", F.col("pk").alias("v"))
    e = (
        a.join(b, "ok")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint(eager=True)
    )  # shared base: both directions + seeds
    d = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    seeds = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .withColumn("h", F.md5(F.concat(F.lit("btw:"), F.col("node").cast("string"))))
        .orderBy("h")
        .limit(_BTW_SRC)
        .select(F.col("node").alias("src"))
    )
    handles = []
    lvl = {0: seeds.select("src", F.col("src").alias("node"), F.lit(1).cast("long").alias("sigma")).persist()}
    handles.append(lvl[0])
    seen = lvl[0].select("src", "node").persist()
    handles.append(seen)
    for h in range(1, _BTW_H + 1):
        cand = (
            lvl[h - 1]
            .join(d, lvl[h - 1]["node"] == d["u"])
            .select("src", F.col("v").alias("node"), "sigma")
        )
        agg = cand.groupBy("src", "node").agg(F.sum("sigma").cast("long").alias("sigma"))
        lvl[h] = agg.join(seen, ["src", "node"], "left_anti").persist()
        handles.append(lvl[h])
        seen = seen.unionByName(lvl[h].select("src", "node")).persist()
        handles.append(seen)
    # backward: δ in e6; term = σ_v·(1e6+δ_w) DIV σ_w, DECIMAL(38,0)
    delta = {
        _BTW_H: lvl[_BTW_H].select(
            "src", "node", "sigma", F.lit(0).cast("long").alias("delta_e6")
        ).persist()
    }
    handles.append(delta[_BTW_H])
    for h in range(_BTW_H - 1, -1, -1):
        wside = delta[h + 1].select(
            F.col("src").alias("wsrc"),
            F.col("node").alias("wnode"),
            F.col("sigma").alias("wsigma"),
            F.col("delta_e6").alias("wdelta"),
        )
        left = lvl[h].select(
            F.col("src").alias("lsrc"),
            F.col("node").alias("lnode"),
            F.col("sigma").alias("lsigma"),
        )
        terms = (
            left.join(d, left["lnode"] == d["u"])
            .select("lsrc", "lnode", "lsigma", F.col("v").alias("wnode"))
            .join(wside, ["wnode"])
            .where(F.col("lsrc") == F.col("wsrc"))
            .select(
                F.col("lsrc").alias("src"),
                F.col("lnode").alias("node"),
                F.expr(
                    "CAST(CAST(lsigma AS DECIMAL(38,0)) * (1000000 + wdelta)"
                    " AS DECIMAL(38,0)) DIV CAST(wsigma AS DECIMAL(38,0))"
                ).cast("long").alias("term"),
            )
        )
        acc = terms.groupBy("src", "node").agg(F.sum("term").cast("long").alias("dsum"))
        delta[h] = (
            lvl[h]
            .join(acc, ["src", "node"], "left")
            .select(
                "src",
                "node",
                "sigma",
                F.coalesce(F.col("dsum"), F.lit(0)).cast("long").alias("delta_e6"),
            )
            .persist()
        )
        handles.append(delta[h])
    inner = None
    for h in range(1, _BTW_H):  # levels 1..H-1 get credit; src excluded
        part = delta[h].select("node", "delta_e6")
        inner = part if inner is None else inner.unionByName(part)
    btw = inner.groupBy("node").agg(F.sum("delta_e6").cast("bigint").alias("betweenness_e6"))
    wtop = Window.orderBy(F.desc("betweenness_e6"), F.asc("node"))
    out = (
        btw.withColumn("rank", F.row_number().over(wtop))
        .where(F.col("rank") <= 15)
        .select("rank", F.col("node").alias("p_partkey"), "betweenness_e6")
        .orderBy("rank")
    )
    from bireme_spark.operators.dedup import _attach_persisted

    return _attach_persisted(out, handles)


def _betweenness_sql() -> str:
    H, S = _BTW_H, _BTW_SRC
    parts = [f"""
WITH po AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
e AS MATERIALIZED (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM po a JOIN po b ON a.ok = b.ok AND a.pk < b.pk
),
d AS MATERIALIZED (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
seeds AS (
  SELECT node AS src FROM (
    SELECT DISTINCT u AS node FROM e UNION SELECT DISTINCT v FROM e
  ) ORDER BY md5('btw:' || CAST(node AS VARCHAR)) LIMIT {S}
),
f0 AS MATERIALIZED (SELECT src, src AS node, CAST(1 AS BIGINT) AS sigma FROM seeds)"""]
    seen_union = "SELECT src, node FROM f0"
    for h in range(1, H + 1):
        parts.append(f""",
f{h} AS MATERIALIZED (
  SELECT src, node, CAST(SUM(sigma) AS BIGINT) AS sigma FROM (
    SELECT p.src, d.v AS node, p.sigma
    FROM f{h - 1} p JOIN d ON d.u = p.node
  ) c
  WHERE NOT EXISTS (
    SELECT 1 FROM ({seen_union}) s WHERE s.src = c.src AND s.node = c.node
  )
  GROUP BY src, node)""")
        seen_union += f" UNION ALL SELECT src, node FROM f{h}"
    parts.append(f""",
b{H} AS MATERIALIZED (SELECT src, node, sigma, CAST(0 AS BIGINT) AS delta_e6 FROM f{H})""")
    for h in range(H - 1, -1, -1):
        parts.append(f""",
b{h} AS MATERIALIZED (
  SELECT f.src, f.node, f.sigma,
         CAST(COALESCE((
           SELECT SUM(CAST(CAST(f.sigma AS HUGEINT) * (1000000 + w.delta_e6)
                           // CAST(w.sigma AS HUGEINT) AS BIGINT))
           FROM d JOIN b{h + 1} w ON w.node = d.v AND w.src = f.src
           WHERE d.u = f.node
         ), 0) AS BIGINT) AS delta_e6
  FROM f{h} f)""")
    inner_union = "\nUNION ALL ".join(
        f"SELECT node, delta_e6 FROM b{h}" for h in range(1, H)
    )
    parts.append(f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY betweenness_e6 DESC, node ASC) AS INTEGER)
         AS rank,
       node AS p_partkey, betweenness_e6
FROM (
  SELECT node, CAST(SUM(delta_e6) AS BIGINT) AS betweenness_e6
  FROM ({inner_union}) GROUP BY node
)
QUALIFY rank <= 15
ORDER BY rank""")
    return "".join(parts)


QUERIES["graph_betweenness_sample"] = graph_betweenness_sample
ORACLE["graph_betweenness_sample"] = _betweenness_sql()


def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman modularity Q (Newman & Girvan 2004) of the part
    co-purchase graph under the catalog's BRAND partition — "do
    same-brand parts co-purchase more than chance?": Q = sum_c
    [e_c/m - (d_c/2m)^2] with m = edges, e_c = within-community
    edges, d_c = total degree of community c. The quality score every
    community-detection pipeline reports; here evaluated for the
    given (brand) partition, the building block graph_label_propagation's
    output would be scored with.

    Engine-exact: Q * 4m^2 = sum_c (4m*e_c - d_c^2) is an exact
    integer — per-community contributions and the total are emitted
    as integer ppb via DECIMAL(38,0) products and one DIV (both
    engines truncate toward zero, verified on negatives — a
    contribution CAN be negative when a hub brand's degree mass
    outruns its internal edges). At 100 TB: m ~ 1e12 edges ->
    4m*e_c*1e9 ~ 4e33 and d_c^2*1e9 ~ 1e35, both inside
    DECIMAL(38,0).

    Scale: the edge list is built per-order (fan-out <= C(7,2)) and
    localCheckpointed ONCE (three consumers — m, degrees,
    within-edges — would each re-derive the distinct otherwise; the
    r5 HITS lesson); community joins shuffle node-keyed edges
    against the part dim (AQE decides broadcast — part scales with
    SF); everything after is |brands|-sized."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("c")
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    by_c = (
        deg.join(part, "node")
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum("deg").cast("decimal(38,0)").alias("d_c"),
        )
    )
    ew = (
        edges.join(part.select(F.col("node").alias("u"), F.col("c").alias("cu")), "u")
        .join(part.select(F.col("node").alias("v"), F.col("c").alias("cv")), "v")
        .where(F.col("cu") == F.col("cv"))
        .groupBy(F.col("cu").alias("c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("e_within"))
    )
    mrow = edges.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("m"))
    j = (
        by_c.join(ew, "c", "left")
        .na.fill({"e_within": 0})
        .crossJoin(F.broadcast(mrow))
    )
    num = F.expr(
        "CAST(4 AS DECIMAL(38,0)) * m * CAST(e_within AS DECIMAL(38,0)) - d_c * d_c"
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    withnum = j.withColumn("num", num).withColumn(
        "tot_num", F.sum("num").over(wall).cast("decimal(38,0)")
    )
    ppb = "CAST({x} * CAST(1000000000 AS DECIMAL(38,0)) DIV (CAST(4 AS DECIMAL(38,0)) * m * m) AS BIGINT)"
    return withnum.select(
        F.col("c").alias("brand"),
        "n_nodes",
        F.col("d_c").cast("bigint").alias("degree_sum"),
        "e_within",
        F.expr(ppb.format(x="num")).alias("q_contrib_ppb"),
        F.expr(ppb.format(x="tot_num")).alias("q_total_ppb"),
    ).orderBy("brand")


def _modularity_sql() -> str:
    return """
WITH in_order AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM in_order a JOIN in_order b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
m AS (SELECT CAST(COUNT(*) AS HUGEINT) AS m FROM edges),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT u AS node FROM edges UNION ALL SELECT v AS node FROM edges
  ) GROUP BY 1
),
by_c AS (
  SELECT p.p_brand AS c, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d.deg) AS HUGEINT) AS d_c
  FROM deg d JOIN part p ON p.p_partkey = d.node
  GROUP BY 1
),
ew AS (
  SELECT pu.p_brand AS c, CAST(COUNT(*) AS BIGINT) AS e_within
  FROM edges e
  JOIN part pu ON pu.p_partkey = e.u
  JOIN part pv ON pv.p_partkey = e.v
  WHERE pu.p_brand = pv.p_brand
  GROUP BY 1
),
j AS (
  SELECT b.c, b.n_nodes, b.d_c, COALESCE(w.e_within, 0) AS e_within,
         4 * m.m * COALESCE(w.e_within, 0) - b.d_c * b.d_c AS num, m.m AS m
  FROM by_c b LEFT JOIN ew w ON w.c = b.c CROSS JOIN m
)
SELECT c AS brand, n_nodes, CAST(d_c AS BIGINT) AS degree_sum,
       CAST(e_within AS BIGINT) AS e_within,
       CAST(num * 1000000000 // (4 * m * m) AS BIGINT) AS q_contrib_ppb,
       CAST(SUM(num) OVER () * 1000000000 // (4 * m * m) AS BIGINT) AS q_total_ppb
FROM j
ORDER BY brand
"""


QUERIES["graph_modularity"] = graph_modularity
ORACLE["graph_modularity"] = _modularity_sql()


def graph_powerlaw_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill/Clauset-style power-law exponent of the co-purchase
    degree distribution — "is this graph scale-free, and how heavy
    is its hub tail?": α̂ = 1 + n_tail / Σ ln(d_i / d_min) over
    degrees ≥ d_min (the discrete Hill MLE), with d_min fixed at the
    degree distribution's 90th-percentile boundary via the house
    histogram-CDF (an order statistic, not a magic constant). The
    diagnostic that says whether degree-targeted interventions
    (hub caching, hot-key salting) will pay off.

    Engine determinism: the degree HISTOGRAM collapses first
    (degrees are bounded, ≪ nodes — the distinct-value-histogram
    rule), so there is ONE e6-rounded ln per distinct tail degree,
    weighted by its count; d_min is an exact integer cumulative-count
    boundary; α̂ closes as one integer DIV.

    Scale: edge list → node-degree agg → |distinct degrees| histogram;
    the quantile never sorts raw nodes."""
    # r11 opt: eager checkpoint — the degree union's two branches
    # otherwise re-derive the whole edge build twice in one DAG
    # (triangle-family lesson). A/B numbers in OPTIMIZATION_r11.md.
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    deg = (
        edges.select(F.col("u").alias("x"))
        .unionAll(edges.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    hist = deg.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wcum = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cdf = hist.withColumn("cum", F.sum("cnt").over(wcum).cast("bigint")).withColumn(
        "n", F.sum("cnt").over(wall).cast("bigint")
    )
    # d_min = smallest degree whose cumulative count reaches 90% of nodes
    dmin_row = cdf.where(F.expr("cum * 10 >= n * 9")).agg(
        F.min("d").cast("bigint").alias("d_min")
    )
    tail = cdf.crossJoin(F.broadcast(dmin_row)).where(F.col("d") >= F.col("d_min"))
    scored = tail.select(
        "d_min",
        "cnt",
        F.round(
            F.log(F.col("d").cast("double") / F.col("d_min").cast("double")) * 1e6
        )
        .cast("bigint")
        .alias("ln_e6"),
    )
    agg = scored.groupBy("d_min").agg(
        F.sum("cnt").cast("bigint").alias("n_tail"),
        F.sum(F.expr("cnt * ln_e6")).cast("bigint").alias("sum_ln_e6"),
    )
    # α̂ = 1 + n_tail / (Σcnt·ln / 1e6): ppm = 1e6 + n_tail·1e12 DIV Σ
    return agg.select(
        "d_min",
        "n_tail",
        F.expr(
            "CAST(1000000 + CAST(n_tail AS DECIMAL(38,0)) * CAST(1000000000000 AS DECIMAL(38,0))"
            " DIV CAST(GREATEST(sum_ln_e6, 1) AS DECIMAL(38,0)) AS BIGINT)"
        ).alias("alpha_ppm"),
    )


GRAPH_POWERLAW_SQL = """
WITH in_order AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM in_order a JOIN in_order b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
deg AS (
  SELECT x, COUNT(*) AS d FROM (
    SELECT u AS x FROM edges UNION ALL SELECT v AS x FROM edges
  ) GROUP BY 1
),
hist AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS cnt FROM deg GROUP BY 1),
cdf AS (
  SELECT d, cnt,
         CAST(SUM(cnt) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER () AS BIGINT) AS n
  FROM hist
),
dmin AS (SELECT CAST(MIN(d) AS BIGINT) AS d_min FROM cdf WHERE cum * 10 >= n * 9),
scored AS (
  SELECT m.d_min, c.cnt,
         CAST(ROUND(ln(CAST(c.d AS DOUBLE) / m.d_min) * 1000000) AS BIGINT) AS ln_e6
  FROM cdf c, dmin m WHERE c.d >= m.d_min
),
agg AS (
  SELECT d_min,
         CAST(SUM(cnt) AS BIGINT) AS n_tail,
         CAST(SUM(cnt * ln_e6) AS BIGINT) AS sum_ln_e6
  FROM scored GROUP BY 1
)
SELECT d_min, n_tail,
       CAST(1000000 + CAST(n_tail AS HUGEINT) * 1000000000000
            // GREATEST(sum_ln_e6, 1) AS BIGINT) AS alpha_ppm
FROM agg
"""

QUERIES["graph_powerlaw_fit"] = graph_powerlaw_fit
ORACLE["graph_powerlaw_fit"] = GRAPH_POWERLAW_SQL


def graph_conductance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conductance φ(C) = cut(C) / min(vol(C), 2m − vol(C)) of every
    brand community in the part co-purchase graph — the
    community-quality measure that catches what modularity misses
    (a community can score well on Q yet leak half its edges; low
    conductance certifies a real boundary). Same partition and edge
    machinery as graph_modularity, so the two reports read together.

    Engine-exact: cut and volume are integer counts; φ is an integer
    ppm DIV with a GREATEST(·,1) guard. Scale: edge list built
    per-order and localCheckpointed once (degree + cross-community
    consumers), node-keyed dim joins, |brands| output rows."""
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node"), F.col("p_brand").alias("c")
    )
    lab = (
        edges.join(part.select(F.col("node").alias("u"), F.col("c").alias("cu")), "u")
        .join(part.select(F.col("node").alias("v"), F.col("c").alias("cv")), "v")
    )
    # volume via degrees: vol(C) = Σ_{x∈C} deg(x); cut = edges with
    # exactly one endpoint in C
    per_c = (
        lab.select(F.col("cu").alias("c"), (F.col("cu") != F.col("cv")).alias("x"))
        .unionAll(
            lab.select(F.col("cv").alias("c"), (F.col("cu") != F.col("cv")).alias("x"))
        )
        .groupBy("c")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("vol"),
            F.sum(F.when(F.col("x"), 1).otherwise(0)).cast("bigint").alias("cut"),
        )
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        per_c.withColumn("two_m", F.sum("vol").over(wall).cast("bigint"))
        .select(
            F.col("c").alias("brand"),
            "vol",
            "cut",
            F.expr(
                "CAST(cut * 1000000 DIV GREATEST(LEAST(vol, two_m - vol), 1) AS BIGINT)"
            ).alias("conductance_ppm"),
        )
        .orderBy("brand")
    )


GRAPH_CONDUCTANCE_SQL = """
WITH in_order AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
edges AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM in_order a JOIN in_order b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_partkey < b.l_partkey
),
lab AS (
  SELECT pu.p_brand AS cu, pv.p_brand AS cv
  FROM edges e
  JOIN part pu ON pu.p_partkey = e.u
  JOIN part pv ON pv.p_partkey = e.v
),
per_c AS (
  SELECT c, CAST(COUNT(*) AS BIGINT) AS vol,
         CAST(SUM(CASE WHEN x THEN 1 ELSE 0 END) AS BIGINT) AS cut
  FROM (
    SELECT cu AS c, cu <> cv AS x FROM lab
    UNION ALL
    SELECT cv AS c, cu <> cv AS x FROM lab
  ) GROUP BY 1
)
SELECT c AS brand, vol, cut,
       CAST(cut * 1000000 // GREATEST(LEAST(vol, SUM(vol) OVER () - vol), 1) AS BIGINT)
         AS conductance_ppm
FROM per_c
ORDER BY brand
"""

QUERIES["graph_conductance"] = graph_conductance
ORACLE["graph_conductance"] = GRAPH_CONDUCTANCE_SQL


# ---------------------------------------------------------------------------
# graph_scc — forward-backward min-label SCC peeling round (round 10)
# ---------------------------------------------------------------------------

_SCC_HOPS = 6


def graph_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of a DIRECTED part-flow graph:
    per sampled order (key % 40 — the co-purchase pair graph is so
    dense that ANY orientation is one giant SCC; probed live), parts
    chain in key order u→v, and pairs with even u+v get the back
    edge v→u — sparse enough for real SCC structure (~100 components,
    sizes 1-34 at sf0.01). Computed via the first peeling round of the forward-backward coloring
    algorithm (Fleischer–Hendrickson–Pitsianis 2000, the distributed
    SCC workhorse): A(v) = min id that reaches v within 6 hops,
    B(v) = min id v reaches within 6 hops; every v with A(v) = B(v)
    = m is in SCC(m) (mutual reachability through the minimum), and
    the residual — nodes whose smallest ancestor differs from their
    smallest descendant — is what the next peeling round would
    recolor. Emits the top-10 SCCs by size plus assigned/residual
    totals; exact for every SCC whose min-labels stabilize within 6
    hops (the fixture's do — property-tested vs a full transitive
    closure on a planted graph).

    Engine-exact: pure integer min-label propagation. Scale: edge
    formation is a per-order self-join on consecutive ranks (linear,
    not quadratic; orders sampled key%40=0 in BOTH engines); each of
    the 6+6 rounds is one join against the |V|-row label table with
    map-side MIN combine; labels never exceed |V| rows."""
    fwd = _chain_edges(spark, sf_dir, 40).distinct()
    edges = (
        fwd.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionByName(
            fwd.where((F.col("u") + F.col("v")) % 2 == 0).select(
                F.col("v").alias("s"), F.col("u").alias("d")
            )
        )
        .localCheckpoint(eager=True)  # the shared BASE (HITS lesson)
    )
    nodes = (
        edges.select(F.col("s").alias("id"))
        .unionByName(edges.select(F.col("d").alias("id")))
        .distinct()
    )
    a = nodes.select("id", F.col("id").alias("lbl"))
    b = nodes.select("id", F.col("id").alias("lbl"))
    # r11 opt: per-level eager checkpoints — each level is read TWICE
    # by the next one (the union branch AND the edge join), so the
    # uncheckpointed 6-round recursion re-derived O(2^t) subtrees (the
    # r10 HyperANF multi-reader rule; "checkpoint only the base" is
    # for single-reader iterates).
    # (r11 second pass: LAZY — the graph_effective_diameter lesson;
    # the LogicalRDD swap dedups readers, one closing action
    # materializes all levels in one cascade)
    for _ in range(_SCC_HOPS):
        a = (
            a.unionByName(
                edges.join(a.withColumnRenamed("id", "s"), "s").select(
                    F.col("d").alias("id"), "lbl"
                )
            )
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
        b = (
            b.unionByName(
                edges.join(b.withColumnRenamed("id", "d"), "d").select(
                    F.col("s").alias("id"), "lbl"
                )
            )
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    lab = a.withColumnRenamed("lbl", "fwd_min").join(
        b.withColumnRenamed("lbl", "bwd_min"), "id"
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sccs = (
        lab.where(F.col("fwd_min") == F.col("bwd_min"))
        .groupBy(F.col("fwd_min").alias("scc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
    )
    totals = lab.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
        F.sum(F.when(F.col("fwd_min") == F.col("bwd_min"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_assigned"),
    )
    wtop = Window.orderBy(F.desc("size"), "scc_id")
    return (
        sccs.withColumn("rank", F.row_number().over(wtop))
        .where(F.col("rank") <= 10)
        .crossJoin(F.broadcast(totals))
        .select(
            F.col("rank").cast("int").alias("rank"),
            "scc_id",
            "size",
            "n_assigned",
            (F.col("n_nodes") - F.col("n_assigned")).cast("bigint").alias("n_residual"),
        )
        .orderBy("rank")
    )


def _scc_level_sql(tag: str, i: int, src: str, dst: str) -> str:
    return f"""
{tag}{i} AS MATERIALIZED (
  SELECT id, MIN(lbl) AS lbl FROM (
    SELECT id, lbl FROM {tag}{i - 1}
    UNION ALL
    SELECT e.{dst} AS id, t.lbl FROM se e JOIN {tag}{i - 1} t ON t.id = e.{src}
  ) GROUP BY 1
)"""


GRAPH_SCC_SQL = (
    """
WITH po AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
  WHERE l_orderkey % 40 = 0
),
seq AS MATERIALIZED (
  SELECT ok, pk, ROW_NUMBER() OVER (PARTITION BY ok ORDER BY pk) AS rn FROM po
),
fwd AS MATERIALIZED (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM seq a JOIN seq b ON a.ok = b.ok AND b.rn = a.rn + 1
),
se AS MATERIALIZED (
  SELECT u AS s, v AS d FROM fwd
  UNION ALL
  SELECT v, u FROM fwd WHERE (u + v) % 2 = 0
),
nodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT s AS id FROM se UNION ALL SELECT d FROM se)
),
a0 AS MATERIALIZED (SELECT id, id AS lbl FROM nodes),
b0 AS MATERIALIZED (SELECT id, id AS lbl FROM nodes),"""
    + ",".join(_scc_level_sql("a", i, "s", "d") for i in range(1, _SCC_HOPS + 1))
    + ","
    + ",".join(_scc_level_sql("b", i, "d", "s") for i in range(1, _SCC_HOPS + 1))
    + f""",
lab AS MATERIALIZED (
  SELECT a.id, a.lbl AS fwd_min, b.lbl AS bwd_min
  FROM a{_SCC_HOPS} a JOIN b{_SCC_HOPS} b ON b.id = a.id
),
sccs AS (
  SELECT fwd_min AS scc_id, CAST(COUNT(*) AS BIGINT) AS size
  FROM lab WHERE fwd_min = bwd_min GROUP BY 1
),
totals AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(CASE WHEN fwd_min = bwd_min THEN 1 ELSE 0 END) AS BIGINT) AS n_assigned
  FROM lab
)
SELECT CAST(rank AS INTEGER) AS rank, scc_id, size, n_assigned,
       CAST(n_nodes - n_assigned AS BIGINT) AS n_residual
FROM (
  SELECT scc_id, size, ROW_NUMBER() OVER (ORDER BY size DESC, scc_id) AS rank
  FROM sccs
), totals
WHERE rank <= 10
ORDER BY rank
"""
)

QUERIES["graph_scc"] = graph_scc
ORACLE["graph_scc"] = GRAPH_SCC_SQL


# ---------------------------------------------------------------------------
# graph_effective_diameter — HyperANF neighborhood function (round 10)
# ---------------------------------------------------------------------------

_ANF_HOPS = 8
# 16-register HLL: alpha_16 * m^2 * 2^49 (same scale discipline as
# events_hll_distinct's 256-register constant — empties contribute
# 2^49, occupied 2^(49-M))
_ANF_C = repr(0.673 * 256.0 * float(1 << 49))
_ANF_RHO_CASE = (
    "CASE "
    + " ".join(f"WHEN w >= {1 << (47 - k)} THEN {k + 1}" for k in range(48))
    + " ELSE 49 END"
)
_ANF_W_DUCK = " + ".join(
    f"CAST(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1 AS BIGINT) * {16 ** (13 - i)}"
    for i in range(2, 14)
)
# per-node ball estimate from (n_regs, ssum): raw HLL with the
# 16-register linear-counting branch (raw ≤ 2.5·m·1e4) — shared text
_ANF_EST = (
    f"CASE WHEN 16 - n_regs > 0 AND"
    f" CAST(FLOOR({_ANF_C} / CAST(ssum + CAST(16 - n_regs AS BIGINT) * {1 << 49}"
    f" AS DOUBLE) * 10000) AS BIGINT) <= 400000"
    f" THEN CAST(FLOOR(16 * ROUND(LN(16.0 / (16 - n_regs)), 6) * 10000) AS BIGINT)"
    f" ELSE CAST(FLOOR({_ANF_C} / CAST(ssum + CAST(16 - n_regs AS BIGINT) * {1 << 49}"
    f" AS DOUBLE) * 10000) AS BIGINT) END"
)


def graph_effective_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective diameter of the (undirected) sparse part-flow graph
    via HyperANF (Boldi, Rosa & Vigna, WWW'11): every node carries a
    16-register HLL sketch of its t-ball; one hop is a bucket-wise
    register MAX over neighbors (HLL union is max — the property that
    makes the neighborhood function N(t) = Σ_v |ball(v,t)| computable
    in O(hops) linear passes instead of all-pairs BFS). Emits N(t)
    for t = 0..8 (the fixture plateaus at t≈5; probed live) and flags the first t with N(t) ≥ 90% of N(8) — the
    effective-diameter readout monitoring uses to see a graph
    compacting (fraud rings closing) or fragmenting.

    Engine-exact: registers from md5 nibbles (bucket = first nibble,
    rho = leading zeros of the next 48 bits + 1 via the generated
    comparison chain); per-node estimates are the house HLL integer
    discipline (FLOOR(C/ssum·1e4), 6dp-rounded ln in the
    linear-count branch) and N(t) is an exact integer sum of e4
    estimates. Sketch-vs-exact accuracy is property-tested against a
    full BFS recompute (the r6 lesson: cross-engine hashes can't see
    a shared estimator bug).

    Scale: |V|·16 register rows; each hop is one join against the
    edge list + one MAX agg — never a pairs blowup; 7 output rows."""
    fwd = _chain_edges(spark, sf_dir, 4).distinct()
    edges = (
        fwd.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionByName(fwd.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .localCheckpoint(eager=True)
    )
    nodes = edges.select(F.col("s").alias("id")).distinct()
    reg = nodes.select(
        "id",
        F.md5(F.col("id").cast("string")).alias("h"),
    ).select(
        "id",
        F.conv(F.substring("h", 1, 1), 16, 10).cast("int").alias("bucket"),
        F.expr(
            "CASE "
            + _ANF_RHO_CASE.replace("w", "CAST(conv(substring(h, 2, 12), 16, 10) AS BIGINT)")[5:]
        ).alias("m"),
    )

    def nfun(r: DataFrame, t: int) -> DataFrame:
        agg = r.groupBy("id").agg(
            F.count(F.lit(1)).cast("int").alias("n_regs"),
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - m)")).cast("bigint").alias("ssum"),
        )
        return agg.agg(
            F.lit(t).cast("int").alias("t"),
            F.sum(F.expr(_ANF_EST)).cast("bigint").alias("n_pairs_e4"),
        )

    # each register level is read TWICE (next hop + its N(t) agg) and
    # the final union reads all nine — uncheckpointed, every reader
    # re-derives the whole chain (O(hops²) recompute, measured 45s →
    # ~7s at sf0.01); one checkpoint per level caps lineage. r11: LAZY
    # per-level checkpoints (r7 three-arm discipline) — the LogicalRDD
    # swap alone dedups the readers, and the single closing action
    # materializes all nine levels in one job cascade instead of nine
    # blocking jobs; A/B numbers in OPTIMIZATION_r11.md.
    r = reg.localCheckpoint(eager=False)
    out = nfun(r, 0)
    for t in range(1, _ANF_HOPS + 1):
        r = (
            r.unionByName(
                edges.join(r.withColumnRenamed("id", "s"), "s").select(
                    F.col("d").alias("id"), "bucket", "m"
                )
            )
            .groupBy("id", "bucket")
            .agg(F.max("m").alias("m"))
            .localCheckpoint(eager=False)
        )
        out = out.unionByName(nfun(r, t))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return out.select(
        "t",
        "n_pairs_e4",
        F.expr("CAST(CAST(n_pairs_e4 AS DECIMAL(38,0)) * 1000000 DIV MAX(n_pairs_e4) OVER () AS BIGINT)").alias(
            "frac_ppm_of_final"
        ),
        F.expr("n_pairs_e4 * 10 >= MAX(n_pairs_e4) OVER () * 9").alias("reaches_90pct"),
    ).orderBy("t")


def _anf_level_sql(i: int) -> str:
    return f"""
r{i} AS MATERIALIZED (
  SELECT id, bucket, MAX(m) AS m FROM (
    SELECT id, bucket, m FROM r{i - 1}
    UNION ALL
    SELECT e.d AS id, t.bucket, t.m FROM ed e JOIN r{i - 1} t ON t.id = e.s
  ) GROUP BY 1, 2
)"""


def _anf_nfun_sql(i: int) -> str:
    return f"""
SELECT {i} AS t, CAST(SUM({_ANF_EST}) AS BIGINT) AS n_pairs_e4 FROM (
  SELECT id, CAST(COUNT(*) AS INTEGER) AS n_regs,
         CAST(SUM(CAST(1 AS BIGINT) << (49 - m)) AS BIGINT) AS ssum
  FROM r{i} GROUP BY 1
)"""


GRAPH_ANF_SQL = (
    """
WITH po AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
  WHERE l_orderkey % 4 = 0
),
seq AS MATERIALIZED (
  SELECT ok, pk, ROW_NUMBER() OVER (PARTITION BY ok ORDER BY pk) AS rn FROM po
),
fwd AS MATERIALIZED (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM seq a JOIN seq b ON a.ok = b.ok AND b.rn = a.rn + 1
),
ed AS MATERIALIZED (
  SELECT u AS s, v AS d FROM fwd UNION ALL SELECT v, u FROM fwd
),
nodes AS MATERIALIZED (SELECT DISTINCT s AS id FROM ed),
hs AS MATERIALIZED (SELECT id, md5(CAST(id AS VARCHAR)) AS h FROM nodes),
bits AS (
  SELECT id,
         CAST(strpos('0123456789abcdef', substr(h, 1, 1)) - 1 AS INTEGER) AS bucket,
         """
    + _ANF_W_DUCK
    + """ AS w
  FROM hs
),
r0 AS MATERIALIZED (
  SELECT id, bucket, """
    + _ANF_RHO_CASE
    + """ AS m
  FROM bits
),"""
    + ",".join(_anf_level_sql(i) for i in range(1, _ANF_HOPS + 1))
    + f""",
nf AS ({" UNION ALL ".join(_anf_nfun_sql(i) for i in range(_ANF_HOPS + 1))})
SELECT CAST(t AS INTEGER) AS t, n_pairs_e4,
       CAST(CAST(n_pairs_e4 AS HUGEINT) * 1000000 // MAX(n_pairs_e4) OVER () AS BIGINT) AS frac_ppm_of_final,
       n_pairs_e4 * 10 >= MAX(n_pairs_e4) OVER () * 9 AS reaches_90pct
FROM nf
ORDER BY t
"""
)

QUERIES["graph_effective_diameter"] = graph_effective_diameter
ORACLE["graph_effective_diameter"] = GRAPH_ANF_SQL


# ---------------------------------------------------------------------------
# graph_bipartite_projection — supplier co-supply projection census
# (round 10)
# ---------------------------------------------------------------------------


def graph_bipartite_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite part→supplier projection census: how connected is
    the supplier co-supply graph (two suppliers linked iff they ship
    the same part)? The TOTAL pair-incidence mass Σ_p C(s_p, 2) is
    computed EXACTLY from the per-part degree histogram — no pair is
    ever formed for it (the trap in naive projections: this fixture
    already makes 8.7M pairs at sf0.1 and the blowup is quadratic).
    The pair-level view (distinct co-supply edges, max/mean edge
    weight) runs on a doubly-bounded sample: an md5 part coin keeps
    ~1500 parts at ANY corpus size (cross-multiplied in-plan
    threshold) and an md5-rank caps suppliers per part at 40, so
    sampled pair work is ≤ 1500·C(40,2) regardless of SF.

    Engine-portable determinism: both the coin and the per-part rank
    are md5 of the key strings; weights/means are exact integers and
    ppm DIVs. Scale: one distinct shuffle + one degree agg for the
    exact half; bounded pair join for the sampled half."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    sp = li.distinct().localCheckpoint(eager=True)
    deg = sp.groupBy("l_partkey").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    exact = deg.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_parts"),
        F.expr("CAST(SUM(s * (s - 1) DIV 2) AS BIGINT)").alias("total_copair_incidences"),
        F.expr("CAST(MAX(s) AS BIGINT)").alias("max_suppliers_per_part"),
    )
    nsupp = sp.agg(F.expr("CAST(COUNT(DISTINCT l_suppkey) AS BIGINT)").alias("n_suppliers"))
    coin = (
        "(CAST(position(substr(md5(concat('part:', CAST(l_partkey AS STRING))), 1, 1)"
        " IN '0123456789abcdef') - 1 AS BIGINT) * 16"
        " + CAST(position(substr(md5(concat('part:', CAST(l_partkey AS STRING))), 2, 1)"
        " IN '0123456789abcdef') - 1 AS BIGINT))"
    )
    wr = Window.partitionBy("l_partkey").orderBy(
        F.md5(F.concat(F.lit("rk:"), F.col("l_suppkey").cast("string"))), "l_suppkey"
    )
    samp = (
        sp.crossJoin(F.broadcast(exact.select("n_parts")))
        .where(F.expr(f"{coin} * n_parts < 256 * 1500"))
        .withColumn("rn", F.row_number().over(wr))
        .where(F.col("rn") <= 40)
        .select("l_partkey", "l_suppkey")
        .localCheckpoint(eager=True)
    )
    a = samp.alias("a")
    b = samp.alias("b")
    pairs = (
        a.join(b, F.expr("a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey"))
        .groupBy(F.expr("a.l_suppkey").alias("s1"), F.expr("b.l_suppkey").alias("s2"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("wgt"))
    )
    sampled = pairs.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("sampled_copair_edges"),
        F.expr("CAST(SUM(wgt) AS BIGINT)").alias("sampled_incidences"),
        F.expr("CAST(MAX(wgt) AS BIGINT)").alias("max_edge_weight"),
    )
    nsp = samp.agg(F.expr("CAST(COUNT(DISTINCT l_partkey) AS BIGINT)").alias("n_parts_sampled"))
    return (
        exact.crossJoin(F.broadcast(nsupp))
        .crossJoin(F.broadcast(nsp))
        .crossJoin(F.broadcast(sampled))
        .select(
            "n_parts",
            "n_suppliers",
            "total_copair_incidences",
            "max_suppliers_per_part",
            "n_parts_sampled",
            "sampled_copair_edges",
            "sampled_incidences",
            "max_edge_weight",
            F.expr(
                "CAST(sampled_incidences * 1000000"
                " DIV GREATEST(sampled_copair_edges, 1) AS BIGINT)"
            ).alias("mean_edge_weight_ppm"),
        )
    )


GRAPH_BIPARTITE_SQL = """
WITH sp AS MATERIALIZED (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
deg AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS s FROM sp GROUP BY 1
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(s * (s - 1) // 2) AS BIGINT) AS total_copair_incidences,
         CAST(MAX(s) AS BIGINT) AS max_suppliers_per_part
  FROM deg
),
nsupp AS (SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers FROM sp),
samp AS MATERIALIZED (
  SELECT l_partkey, l_suppkey FROM (
    SELECT l_partkey, l_suppkey,
           ROW_NUMBER() OVER (PARTITION BY l_partkey
             ORDER BY md5(concat('rk:', CAST(l_suppkey AS VARCHAR))), l_suppkey) AS rn
    FROM sp, exact
    WHERE (CAST(position(substr(md5(concat('part:', CAST(l_partkey AS VARCHAR))), 1, 1)
                IN '0123456789abcdef') - 1 AS BIGINT) * 16
           + CAST(position(substr(md5(concat('part:', CAST(l_partkey AS VARCHAR))), 2, 1)
                IN '0123456789abcdef') - 1 AS BIGINT)) * n_parts < 256 * 1500
  ) WHERE rn <= 40
),
pairs AS (
  SELECT a.l_suppkey AS s1, b.l_suppkey AS s2, CAST(COUNT(*) AS BIGINT) AS wgt
  FROM samp a JOIN samp b ON a.l_partkey = b.l_partkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
),
sampled AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS sampled_copair_edges,
         CAST(SUM(wgt) AS BIGINT) AS sampled_incidences,
         CAST(MAX(wgt) AS BIGINT) AS max_edge_weight
  FROM pairs
),
nsp AS (SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts_sampled FROM samp)
SELECT e.n_parts, u.n_suppliers, e.total_copair_incidences, e.max_suppliers_per_part,
       p.n_parts_sampled, s.sampled_copair_edges, s.sampled_incidences, s.max_edge_weight,
       CAST(s.sampled_incidences * 1000000 // GREATEST(s.sampled_copair_edges, 1) AS BIGINT)
         AS mean_edge_weight_ppm
FROM exact e, nsupp u, nsp p, sampled s
"""

QUERIES["graph_bipartite_projection"] = graph_bipartite_projection
ORACLE["graph_bipartite_projection"] = GRAPH_BIPARTITE_SQL


# ---------------------------------------------------------------------------
# lineitem_benford_second_digit — forensic follow-up screen (round 10)
# ---------------------------------------------------------------------------

# expected second-digit probability: P(d) = Σ_{d1=1..9} log10(1 + 1/(10·d1 + d)),
# generated ONCE as a shared double-expression per digit (every
# literal CAST AS DOUBLE; log10 engine-ulp absorbed by the one-shot
# 6dp round, same discipline as orders_benford_audit)
_B2_EXPECTED = {
    d: " + ".join(
        f"LOG10(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) / CAST({10 * d1 + d} AS DOUBLE))"
        for d1 in range(1, 10)
    )
    for d in range(10)
}
_B2_EXPECTED_CASE = (
    "CASE CAST(digit AS INT) "
    + " ".join(f"WHEN {d} THEN ({expr})" for d, expr in _B2_EXPECTED.items())
    + " END"
)


def lineitem_benford_second_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford SECOND-digit audit of line-item extended prices — the
    standard forensic follow-up when the first-digit screen
    (orders_benford_audit) passes: fabricated or rounded-by-policy
    values often survive the first digit but pile up on 0/5 in the
    second (price-point clustering), and the second-digit law
    P(d) = Σ log10(1 + 1/(10·d₁+d)) is flat enough to expose it.

    Determinism: the digit is a map-side substring of the
    DECIMAL-rendered value (no float log10 on the data path; values
    < 10 are excluded, where no second digit exists); expectations
    and per-digit χ² contributions close with one-shot 6dp rounds of
    shared expression strings.

    Scale: ONE 10-cell hash aggregate over a string projection."""
    li = load_table(spark, sf_dir, "lineitem").select(
        money("l_extendedprice").alias("p")
    )
    digits = li.where(F.col("p") >= 10).select(
        F.substring(F.col("p").cast("string"), 2, 1).alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    tot = counts.agg(F.expr("CAST(SUM(n) AS BIGINT)").alias("tot"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            F.expr("CAST(digit AS INT)").alias("second_digit"),
            "n",
            F.expr("ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6)").alias("observed"),
            F.expr(f"ROUND({_B2_EXPECTED_CASE}, 6)").alias("expected"),
            F.expr(
                f"ROUND(CAST(tot AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)"
                f" - ({_B2_EXPECTED_CASE})) * (CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)"
                f" - ({_B2_EXPECTED_CASE})) / ({_B2_EXPECTED_CASE}), 6)"
            ).alias("chi2_contrib"),
        )
        .orderBy("second_digit")
    )


LINEITEM_B2_SQL = f"""
WITH digits AS (
  SELECT substr(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) AS VARCHAR), 2, 1) AS digit
  FROM lineitem WHERE CAST(l_extendedprice AS DECIMAL(12,2)) >= 10
),
counts AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM digits GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM counts)
SELECT CAST(digit AS INTEGER) AS second_digit, n,
       ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS observed,
       ROUND({_B2_EXPECTED_CASE.replace("CAST(digit AS INT)", "CAST(digit AS INTEGER)")}, 6) AS expected,
       ROUND(CAST(tot AS DOUBLE) * (CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
             - ({_B2_EXPECTED_CASE.replace("CAST(digit AS INT)", "CAST(digit AS INTEGER)")}))
             * (CAST(n AS DOUBLE) / CAST(tot AS DOUBLE)
             - ({_B2_EXPECTED_CASE.replace("CAST(digit AS INT)", "CAST(digit AS INTEGER)")}))
             / ({_B2_EXPECTED_CASE.replace("CAST(digit AS INT)", "CAST(digit AS INTEGER)")}), 6) AS chi2_contrib
FROM counts, tot
ORDER BY second_digit
"""

QUERIES["lineitem_benford_second_digit"] = lineitem_benford_second_digit
ORACLE["lineitem_benford_second_digit"] = LINEITEM_B2_SQL


# ---------------------------------------------------------------------------
# graph_spectral_bisection — Fiedler-vector partition (round 10)
# ---------------------------------------------------------------------------

_SB_ITERS = 24
_SB_START = (
    "(CAST(position(substr(md5(concat('sb:', CAST(node AS STRING))), 1, 1)"
    " IN '0123456789abcdef') - 1 AS BIGINT) * 16"
    " + CAST(position(substr(md5(concat('sb:', CAST(node AS STRING))), 2, 1)"
    " IN '0123456789abcdef') - 1 AS BIGINT) - 128) * 7813"
)


def graph_spectral_bisection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral bisection of the undirected part-chain graph (the
    graph_scc fixture, symmetrized): the sign pattern of the Fiedler
    vector — the second-smallest Laplacian eigenvector — is the
    classic sparsest-cut heuristic (Fiedler 1973), and this emits the
    partition's cut size, conductance, and the Rayleigh λ₂ estimate;
    graph_conductance SCORES a given community, this one FINDS the
    global cut.

    PURE INTEGER eigensolve, gate-checked end to end: power
    iteration on cI − L (c = 2·max degree keeps it PSD) with the
    constant eigenvector DEFLATED each step by integer mean
    subtraction (w ← w − ΣwDIVn; the ≤1/entry truncation remainder
    is re-projected every step, so the ones-component stays O(1)
    against the 1e6-normalized signal), md5-byte start vector
    (stride-proof, generically non-orthogonal to the Fiedler
    direction), v' = w·1e6 DIV max|w|. The Spark side iterates a
    checkpointed |V|-frame (each level has THREE readers — A·v join,
    mean agg, max agg — the r10 HyperANF multi-reader lesson); the
    oracle unrolls the identical 24 integer levels as MATERIALIZED
    CTEs, so the gate hashes the eigensolve itself.

    Scale: edge formation is the linear consecutive-rank chain join
    (orders sampled key%%40 in BOTH engines); each iteration is one
    |E|-row join + |V|-row aggregates."""
    # r10 opt: the loop's scalars (c once; per-step m, mx) collect to
    # the driver (model-sized traffic, the kcenter/BPE precedent) and
    # inline as literals; each step then needs ONE eager checkpoint
    # (w) + one tiny agg on it instead of two checkpoints + two
    # broadcast-agg sub-jobs (≈4 jobs/step → 2, and the 2nd is a
    # scan of the just-checkpointed |V| frame). und/nodes checkpoint
    # once so the closing cut/sides aggregates re-read frames, not
    # the whole edge build. Values are bit-identical: same integer
    # exprs, and MAX(ABS(w-m)) ≡ GREATEST(MAX(w)-m, m-MIN(w)).
    und = _chain_edges(spark, sf_dir, 40).distinct().localCheckpoint(eager=True)
    edges = (
        und.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionByName(und.select(F.col("v").alias("s"), F.col("u").alias("d")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.groupBy(F.col("s").alias("node"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("deg"))
        .localCheckpoint(eager=True)
    )
    # guard the collected scalars (ADVICE r10): on an EMPTY edge list
    # every agg below returns NULL — neutral literals (c=0, m=0, mx=1)
    # keep the plan valid and the closing aggregates still emit the
    # same degenerate row the old broadcast-crossJoin form produced.
    crow = nodes.agg(F.expr("CAST(2 * MAX(deg) AS BIGINT)").alias("c")).collect()[0]
    c_lit = int(crow["c"]) if crow["c"] is not None else 0
    v = nodes.select("node", F.expr(_SB_START).alias("val"))
    for _ in range(_SB_ITERS):
        av = (
            edges.join(v, edges["s"] == v["node"])
            .groupBy(F.col("d").alias("node"))
            .agg(F.expr("CAST(SUM(val) AS BIGINT)").alias("nbr"))
        )
        w = (
            nodes.join(v, "node")
            .join(av, "node", "left")
            .select(
                "node",
                F.expr(
                    f"(CAST({c_lit} AS BIGINT) - deg) * val"
                    " + COALESCE(nbr, CAST(0 AS BIGINT))"
                ).alias("w"),
            )
            .localCheckpoint(eager=True)
        )
        srow = w.agg(
            F.expr("CAST(SUM(w) DIV COUNT(*) AS BIGINT)").alias("m"),
            F.expr(
                "CAST(GREATEST(MAX(w) - SUM(w) DIV COUNT(*),"
                " SUM(w) DIV COUNT(*) - MIN(w), 1) AS BIGINT)"
            ).alias("mx"),
        ).collect()[0]
        m_lit = int(srow["m"]) if srow["m"] is not None else 0
        mx_lit = int(srow["mx"]) if srow["mx"] is not None else 1
        v = w.select(
            "node",
            F.expr(
                f"CAST((w - CAST({m_lit} AS BIGINT)) * 1000000"
                f" DIV CAST({mx_lit} AS BIGINT) AS BIGINT)"
            ).alias("val"),
        )
    half = und.join(v.select(F.col("node").alias("u"), F.col("val").alias("vu")), "u").join(
        v.select(F.col("node").alias("v"), F.col("val").alias("vv")), "v"
    )
    cutagg = half.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_edges"),
        F.expr(
            "CAST(SUM(CASE WHEN (vu >= 0) <> (vv >= 0) THEN 1 ELSE 0 END) AS BIGINT)"
        ).alias("cut_edges"),
        F.expr("CAST(SUM(CAST((vu - vv) AS DECIMAL(38,0)) * (vu - vv)) AS DECIMAL(38,0))").alias("vlv"),
    )
    sides = nodes.join(v, "node").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_nodes"),
        F.expr("CAST(SUM(CASE WHEN val >= 0 THEN 1 ELSE 0 END) AS BIGINT)").alias("side_a_nodes"),
        F.expr("CAST(SUM(CASE WHEN val < 0 THEN 1 ELSE 0 END) AS BIGINT)").alias("side_b_nodes"),
        F.expr("CAST(SUM(CASE WHEN val >= 0 THEN deg ELSE 0 END) AS BIGINT)").alias("vol_a"),
        F.expr("CAST(SUM(CASE WHEN val < 0 THEN deg ELSE 0 END) AS BIGINT)").alias("vol_b"),
        F.expr("CAST(SUM(CAST(val AS DECIMAL(38,0)) * val) AS DECIMAL(38,0))").alias("vv2"),
    )
    return cutagg.crossJoin(F.broadcast(sides)).select(
        "n_nodes",
        "n_edges",
        "side_a_nodes",
        "side_b_nodes",
        "cut_edges",
        F.expr(
            "CAST(cut_edges * 1000000 DIV GREATEST(LEAST(vol_a, vol_b) DIV 2, 1) AS BIGINT)"
        ).alias("conductance_ppm"),
        F.expr("CAST((vlv * 1000000) DIV GREATEST(vv2, 1) AS BIGINT)").alias("lambda2_e6"),
    )


def _sb_sql() -> str:
    lvls = []
    prev = "lvl0"
    for k in range(1, _SB_ITERS + 1):
        lvls.append(f"""
w{k} AS MATERIALIZED (
  SELECT n.node, (cc.c - n.deg) * l.val + COALESCE(adj.nbr, CAST(0 AS BIGINT)) AS w
  FROM nodes n
  JOIN {prev} l ON n.node = l.node
  LEFT JOIN (
    SELECT e.d AS node, CAST(SUM(l2.val) AS BIGINT) AS nbr
    FROM edges e JOIN {prev} l2 ON e.s = l2.node GROUP BY 1
  ) adj ON n.node = adj.node, cc
),
m{k} AS (SELECT CAST(SUM(w) // COUNT(*) AS BIGINT) AS m FROM w{k}),
x{k} AS MATERIALIZED (SELECT node, w - m AS w FROM w{k}, m{k}),
mx{k} AS (SELECT GREATEST(MAX(ABS(w)), 1) AS mx FROM x{k}),
lvl{k} AS MATERIALIZED (SELECT node, CAST(w * 1000000 // mx AS BIGINT) AS val FROM x{k}, mx{k})""")
        prev = f"lvl{k}"
    start = _SB_START.replace("node", "n.node")
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 40 = 0
),
po AS (SELECT DISTINCT l_orderkey, l_partkey FROM li),
seq AS (
  SELECT l_partkey, l_orderkey,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) AS rn
  FROM po
),
und AS MATERIALIZED (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM seq a JOIN seq b ON a.l_orderkey = b.l_orderkey AND a.rn = b.rn - 1
  WHERE a.l_partkey <> b.l_partkey
),
edges AS MATERIALIZED (
  SELECT u AS s, v AS d FROM und UNION SELECT v, u FROM und
),
nodes AS MATERIALIZED (
  SELECT s AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM edges GROUP BY 1
),
cc AS (SELECT CAST(2 * MAX(deg) AS BIGINT) AS c FROM nodes),
lvl0 AS MATERIALIZED (
  SELECT n.node, {start} AS val FROM nodes n
),{",".join(lvls)},
fin AS MATERIALIZED (SELECT node, val FROM lvl{_SB_ITERS}),
half AS (
  SELECT und.u, und.v, a.val AS vu, b.val AS vv
  FROM und JOIN fin a ON und.u = a.node JOIN fin b ON und.v = b.node
),
cutagg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
         CAST(SUM(CASE WHEN (vu >= 0) <> (vv >= 0) THEN 1 ELSE 0 END) AS BIGINT) AS cut_edges,
         CAST(SUM(CAST(vu - vv AS HUGEINT) * (vu - vv)) AS HUGEINT) AS vlv
  FROM half
),
sides AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(CASE WHEN f.val >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS side_a_nodes,
         CAST(SUM(CASE WHEN f.val < 0 THEN 1 ELSE 0 END) AS BIGINT) AS side_b_nodes,
         CAST(SUM(CASE WHEN f.val >= 0 THEN n.deg ELSE 0 END) AS BIGINT) AS vol_a,
         CAST(SUM(CASE WHEN f.val < 0 THEN n.deg ELSE 0 END) AS BIGINT) AS vol_b,
         CAST(SUM(CAST(f.val AS HUGEINT) * f.val) AS HUGEINT) AS vv2
  FROM nodes n JOIN fin f ON n.node = f.node
)
SELECT s.n_nodes, c.n_edges, s.side_a_nodes, s.side_b_nodes, c.cut_edges,
       CAST(c.cut_edges * 1000000 // GREATEST(LEAST(s.vol_a, s.vol_b) // 2, 1) AS BIGINT) AS conductance_ppm,
       CAST((c.vlv * 1000000) // GREATEST(s.vv2, 1) AS BIGINT) AS lambda2_e6
FROM cutagg c, sides s
"""


QUERIES["graph_spectral_bisection"] = graph_spectral_bisection
ORACLE["graph_spectral_bisection"] = _sb_sql()


# ---------------------------------------------------------------------------
# graph_random_walk_restart — personalized PageRank (random walk with
# restart) from a deterministic seed set over the part-flow graph.

_RWR_ITERS = 6
_RWR_D_E9 = 850_000_000  # restart probability 0.15 in e9 fixed point
_RWR_ONE_E9 = 1_000_000_000
_RWR_SEEDS = 10


def graph_random_walk_restart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank / random-walk-with-restart (Tong et al.
    2006) from a deterministic seed set (the 10 smallest part ids in
    the node set) over the directed part-flow graph (the graph_scc
    fixture: per sampled order key%40, parts chain u→v in key order,
    even-sum pairs get the back edge — probed to carry real sparse
    structure). Global PageRank says which nodes matter overall; RWR
    says which matter RELATIVE TO a query set — the proximity
    primitive behind recommendation and seed-expansion labeling.

    Determinism: six synchronous supersteps in e9 fixed-point BIGINT
    (per-edge contribution r DIV outdeg, per-node close teleport +
    d·mass DIV 1e9 — truncating DIV on both engines); the teleport
    mass lands ONLY on seeds. Dangling nodes leak mass by design
    (classic unpatched semantics, deterministic on both engines).
    Ranking key is (score DESC, part id) — no MAX_BY ties.

    Scale: edge formation is a per-order consecutive-rank self-join
    (linear); each superstep is one edge-sized join + node-sized agg
    on the localCheckpointed edge base (single-reader iterate — no
    per-round checkpoint, the HITS rule); node state never crosses
    the driver. The oracle replays the identical integer recursion
    as 6 unrolled MATERIALIZED levels."""
    fwd = _chain_edges(spark, sf_dir, 40).distinct()
    edges = (
        fwd.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionByName(
            fwd.where((F.col("u") + F.col("v")) % 2 == 0).select(
                F.col("v").alias("s"), F.col("u").alias("d")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("s").alias("nk"))
        .unionByName(edges.select(F.col("d").alias("nk")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    outw = edges.groupBy("s").agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("ow"))
    # r11 opt: edges⋈outw is superstep-INVARIANT but was re-derived
    # inside all 6 contrib joins (6 degree aggs + 6 joins); checkpoint
    # the weighted adjacency once — each step becomes one ew⋈rank join
    # + agg (the cached-weighted-adjacency PageRank shape, guide §2.1).
    ew = edges.join(outw, "s").select("s", "d", "ow").localCheckpoint(eager=True)
    seeds = nodes.orderBy("nk").limit(_RWR_SEEDS).select(F.col("nk").alias("sk"))
    ns = seeds.count()  # <=10 by construction; model-sized driver scalar
    init = _RWR_ONE_E9 // ns
    tele = (_RWR_ONE_E9 - _RWR_D_E9) // ns
    marked = nodes.join(F.broadcast(seeds), nodes.nk == seeds.sk, "left").select(
        "nk", F.expr("CAST(sk IS NOT NULL AS BOOLEAN)").alias("is_seed")
    ).localCheckpoint(eager=True)
    rank = marked.select(
        "nk", F.expr(f"CAST(CASE WHEN is_seed THEN {init} ELSE 0 END AS BIGINT)").alias("r")
    )
    for _ in range(_RWR_ITERS):
        contrib = (
            ew.join(rank, ew.s == rank.nk)
            .select(F.col("d").alias("nk"), F.expr("r DIV ow").alias("m"))
            .groupBy("nk")
            .agg(F.expr("CAST(SUM(m) AS BIGINT)").alias("mass"))
        )
        rank = marked.join(contrib, "nk", "left").select(
            "nk",
            F.expr(
                f"CAST(CASE WHEN is_seed THEN {tele} ELSE 0 END"
                f" + ({_RWR_D_E9} * COALESCE(mass, 0)) DIV {_RWR_ONE_E9} AS BIGINT)"
            ).alias("r"),
        )
    out = marked.join(rank.select("nk", "r"), "nk")
    return (
        out.orderBy(F.col("r").desc(), F.col("nk"))
        .limit(20)
        .select(
            F.col("nk").alias("part_id"),
            F.col("r").alias("ppr_e9"),
            F.expr("CAST(is_seed AS INT)").alias("is_seed"),
        )
    )


def _rwr_oracle_sql() -> str:
    levels = []
    prev = "r0"
    for i in range(1, _RWR_ITERS + 1):
        levels.append(
            f"""m{i} AS MATERIALIZED (
  SELECT e.d AS nk, CAST(SUM(r.r // o.ow) AS BIGINT) AS mass
  FROM edges e JOIN outw o ON e.s = o.s JOIN {prev} r ON r.nk = e.s
  GROUP BY 1
),
r{i} AS MATERIALIZED (
  SELECT n.nk, n.is_seed,
         CAST(CASE WHEN n.is_seed THEN ({_RWR_ONE_E9} - {_RWR_D_E9}) // ns.ns ELSE 0 END
              + ({_RWR_D_E9} * COALESCE(m.mass, 0)) // {_RWR_ONE_E9} AS BIGINT) AS r
  FROM marked n LEFT JOIN m{i} m ON m.nk = n.nk, ns
)"""
        )
        prev = f"r{i}"
    lvl = ",\n".join(levels)
    return f"""
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 40 = 0
),
po AS (SELECT DISTINCT l_orderkey, l_partkey FROM li),
seq AS (
  SELECT l_orderkey AS ok, l_partkey,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) AS rn
  FROM po
),
fwd AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM seq a JOIN seq b ON a.ok = b.ok AND b.rn = a.rn + 1
),
edges AS MATERIALIZED (
  SELECT u AS s, v AS d FROM fwd
  UNION
  SELECT v AS s, u AS d FROM fwd WHERE (u + v) % 2 = 0
),
nodes AS MATERIALIZED (
  SELECT s AS nk FROM edges UNION SELECT d FROM edges
),
outw AS MATERIALIZED (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS ow FROM edges GROUP BY 1
),
seeds AS MATERIALIZED (
  SELECT nk AS sk FROM nodes ORDER BY nk LIMIT {_RWR_SEEDS}
),
ns AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM seeds),
marked AS MATERIALIZED (
  SELECT n.nk, (s.sk IS NOT NULL) AS is_seed
  FROM nodes n LEFT JOIN seeds s ON s.sk = n.nk
),
r0 AS MATERIALIZED (
  SELECT nk, is_seed,
         CAST(CASE WHEN is_seed THEN {_RWR_ONE_E9} // ns.ns ELSE 0 END AS BIGINT) AS r
  FROM marked, ns
),
{lvl}
SELECT nk AS part_id, r AS ppr_e9, CAST(is_seed AS INTEGER) AS is_seed
FROM r{_RWR_ITERS}
ORDER BY r DESC, nk
LIMIT 20
"""


QUERIES["graph_random_walk_restart"] = graph_random_walk_restart
ORACLE["graph_random_walk_restart"] = _rwr_oracle_sql()


# ---------------------------------------------------------------------------
# graph_square_count — exact 4-cycle (square) census of the undirected
# part-flow graph via wedge-pair closure.


def graph_square_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact square (4-cycle) census of the undirected part-flow
    graph: squares = Σ_{u<v} C(W_uv, 2) where W_uv is the number of
    common neighbors (wedge centers) of the pair — every square
    u–c–v–c′–u is one unordered center pair {c, c′} of its diagonal
    {u, v}. Triangles (graph_triangle_count) measure local closure;
    squares are the bipartite-style closure that co-occurrence graphs
    exhibit even when triangle-free — the complementary motif the
    graph family lacked.

    Determinism: pure integer counting; wedge formation enumerates
    per-center neighbor pairs (the chain graph's degree is ~constant
    in SF — per-node fan-out C(d,2) stays bounded, the triangle-count
    precedent), and the diagonal aggregation is one shuffle on the
    (u,v) pair key. squares_per_million_wedges closes with a single
    truncating DIV.

    Scale: edge formation is the linear per-order consecutive-rank
    self-join (orders sampled key%40 in BOTH engines); wedges are
    one self-join of the O(E) directed adjacency on the center;
    everything after is pair-histogram sized."""
    # chain pairs arrive u < v (sorted distinct set) — the old
    # LEAST/GREATEST canonicalization is a no-op on this stream
    und = _chain_edges(spark, sf_dir, 40).distinct().localCheckpoint(eager=True)
    adj = und.select(F.col("u").alias("c"), F.col("v").alias("d")).unionByName(
        und.select(F.col("v").alias("c"), F.col("u").alias("d"))
    )
    x = adj.alias("x")
    y = adj.alias("y")
    wedges = (
        x.join(y, (F.expr("x.c = y.c")) & (F.expr("x.d < y.d")))
        .groupBy(F.expr("x.d").alias("u"), F.expr("y.d").alias("v"))
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("w"))
    )
    stats = wedges.groupBy().agg(
        F.expr("CAST(SUM(w) AS BIGINT)").alias("n_wedges"),
        F.expr("CAST(SUM(w * (w - 1) DIV 2) AS BIGINT)").alias("n_squares"),
    )
    counts = und.groupBy().agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_edges"))
    nodes = adj.select(F.col("c").alias("nk")).distinct().groupBy().agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_nodes")
    )
    return (
        stats.crossJoin(F.broadcast(counts))
        .crossJoin(F.broadcast(nodes))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_squares",
            F.expr(
                "CAST(n_squares * 1000000 DIV GREATEST(n_wedges, 1) AS BIGINT)"
            ).alias("squares_per_million_wedges"),
        )
    )


GRAPH_SQUARES_SQL = """
WITH li AS (
  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 40 = 0
),
po AS (SELECT DISTINCT l_orderkey, l_partkey FROM li),
seq AS (
  SELECT l_orderkey AS ok, l_partkey,
         ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_partkey) AS rn
  FROM po
),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(a.l_partkey, b.l_partkey) AS u,
                  GREATEST(a.l_partkey, b.l_partkey) AS v
  FROM seq a JOIN seq b ON a.ok = b.ok AND b.rn = a.rn + 1
  WHERE a.l_partkey <> b.l_partkey
),
adj AS MATERIALIZED (
  SELECT u AS c, v AS d FROM und UNION ALL SELECT v AS c, u AS d FROM und
),
wedges AS (
  SELECT x.d AS u, y.d AS v, CAST(COUNT(*) AS BIGINT) AS w
  FROM adj x JOIN adj y ON x.c = y.c AND x.d < y.d
  GROUP BY 1, 2
),
stats AS (
  SELECT CAST(SUM(w) AS BIGINT) AS n_wedges,
         CAST(SUM(w * (w - 1) // 2) AS BIGINT) AS n_squares
  FROM wedges
),
counts AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und),
nodes AS (SELECT CAST(COUNT(DISTINCT c) AS BIGINT) AS n_nodes FROM adj)
SELECT n.n_nodes, c.n_edges, s.n_wedges, s.n_squares,
       CAST(s.n_squares * 1000000 // GREATEST(s.n_wedges, 1) AS BIGINT) AS squares_per_million_wedges
FROM stats s, counts c, nodes n
"""

QUERIES["graph_square_count"] = graph_square_count
ORACLE["graph_square_count"] = GRAPH_SQUARES_SQL


# ---------------------------------------------------------------------------
# graph_bowtie_decomposition — bow-tie census (CORE / IN / OUT /
# BRIDGE / OTHER) of the directed part-flow graph.

_BT_HOPS = 6  # SCC label rounds (matches graph_scc)
_BT_REACH = 4  # core-reachability rounds


def graph_bowtie_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bow-tie decomposition (Broder et al. 2000) of the directed
    part-flow graph: find the largest SCC (the CORE) via the same
    6-hop forward/backward min-label peeling as graph_scc, then
    classify every node by bounded-hop core reachability — IN
    (reaches the core within 4 hops), OUT (reached by the core),
    BRIDGE (both, without being in the core — path-through nodes the
    hop bound hasn't merged), OTHER (neither). The web-graph census
    that says whether a flow graph is one navigable mass or
    fragmented islands; graph_scc lists components, this SHAPES them.

    Determinism: pure integer min-label and set propagation; both
    hop bounds are fixed constants replayed identically by the
    oracle's unrolled MATERIALIZED levels, so the gate checks the
    whole peeling + reachability pipeline. Class precedence CORE >
    BRIDGE > IN > OUT > OTHER is total — no ties anywhere.

    Scale: each round is one edge-sized join + node-sized
    distinct/MIN agg against the localCheckpointed edge base (the
    HITS single-reader rule: checkpoint the base only); node state
    never crosses the driver."""
    fwd = _chain_edges(spark, sf_dir, 40).distinct()
    edges = (
        fwd.select(F.col("u").alias("s"), F.col("v").alias("d"))
        .unionByName(
            fwd.where((F.col("u") + F.col("v")) % 2 == 0).select(
                F.col("v").alias("s"), F.col("u").alias("d")
            )
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        edges.select(F.col("s").alias("id"))
        .unionByName(edges.select(F.col("d").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    a = nodes.select("id", F.col("id").alias("lbl"))
    b = nodes.select("id", F.col("id").alias("lbl"))
    # r11 opt: per-level eager checkpoints (each level read twice by
    # the next — union + join; the graph_scc/HyperANF multi-reader
    # rule, which "checkpoint the base only" above understated)
    # (r11 second pass: LAZY per level A/B-LOST here — old 5.147 /
    # new 5.567 min-of-3 HASH-EQ, unlike the identical graph_scc shape
    # where lazy won 4.52→4.21: bowtie's core_id broadcast + two reach
    # chains re-enter the lazy cascade mid-job and the blocking eager
    # materialization wins. Keep EAGER.)
    for _ in range(_BT_HOPS):
        a = (
            a.unionByName(
                edges.join(a.withColumnRenamed("id", "s"), "s").select(
                    F.col("d").alias("id"), "lbl"
                )
            )
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        b = (
            b.unionByName(
                edges.join(b.withColumnRenamed("id", "d"), "d").select(
                    F.col("s").alias("id"), "lbl"
                )
            )
            .groupBy("id")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
    lab = (
        a.withColumnRenamed("lbl", "fwd_min")
        .join(b.withColumnRenamed("lbl", "bwd_min"), "id")
        .localCheckpoint(eager=True)
    )
    sccs = (
        lab.where(F.col("fwd_min") == F.col("bwd_min"))
        .groupBy(F.col("fwd_min").alias("scc_id"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("size"))
    )
    wtop = Window.orderBy(F.desc("size"), "scc_id")
    core_id = (
        sccs.withColumn("rank", F.row_number().over(wtop))
        .where(F.col("rank") == 1)
        .select(F.col("scc_id").alias("core_id"))
    )
    core = (
        lab.crossJoin(F.broadcast(core_id))
        .where(F.expr("fwd_min = bwd_min AND fwd_min = core_id"))
        .select("id")
        .localCheckpoint(eager=True)
    )
    rc = core
    fc = core
    for _ in range(_BT_REACH):
        rc = (
            rc.unionByName(
                edges.join(rc.withColumnRenamed("id", "d"), "d").select(F.col("s").alias("id"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        fc = (
            fc.unionByName(
                edges.join(fc.withColumnRenamed("id", "s"), "s").select(F.col("d").alias("id"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
    cls = (
        nodes.join(core.select("id", F.lit(1).alias("in_core")), "id", "left")
        .join(rc.select("id", F.lit(1).alias("rch")).distinct(), "id", "left")
        .join(fc.select("id", F.lit(1).alias("fch")).distinct(), "id", "left")
        .select(
            F.expr(
                "CASE WHEN in_core = 1 THEN 'CORE'"
                " WHEN rch = 1 AND fch = 1 THEN 'BRIDGE'"
                " WHEN rch = 1 THEN 'IN'"
                " WHEN fch = 1 THEN 'OUT'"
                " ELSE 'OTHER' END"
            ).alias("component")
        )
    )
    tot = nodes.agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_total"))
    return (
        cls.groupBy("component")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_nodes"))
        .crossJoin(F.broadcast(tot))
        .select(
            "component",
            "n_nodes",
            F.expr("CAST(n_nodes * 1000000 DIV n_total AS BIGINT)").alias("share_ppm"),
        )
        .orderBy("component")
    )


def _bt_reach_sql(tag: str, i: int, src: str, dst: str) -> str:
    return f"""
{tag}{i} AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT id FROM {tag}{i - 1}
    UNION ALL
    SELECT e.{src} AS id FROM se e JOIN {tag}{i - 1} t ON t.id = e.{dst}
  )
)"""


def _bowtie_oracle_sql() -> str:
    a_levels = "".join("," + _scc_level_sql("a", i, "s", "d") for i in range(1, _BT_HOPS + 1))
    b_levels = "".join("," + _scc_level_sql("b", i, "d", "s") for i in range(1, _BT_HOPS + 1))
    rc_levels = "".join("," + _bt_reach_sql("rc", i, "s", "d") for i in range(1, _BT_REACH + 1))
    fc_levels = "".join("," + _bt_reach_sql("fc", i, "d", "s") for i in range(1, _BT_REACH + 1))
    return f"""
WITH po AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
  WHERE l_orderkey % 40 = 0
),
seq AS MATERIALIZED (
  SELECT ok, pk, ROW_NUMBER() OVER (PARTITION BY ok ORDER BY pk) AS rn FROM po
),
fwd AS MATERIALIZED (
  SELECT DISTINCT a.pk AS u, b.pk AS v
  FROM seq a JOIN seq b ON a.ok = b.ok AND b.rn = a.rn + 1
),
se AS MATERIALIZED (
  SELECT u AS s, v AS d FROM fwd
  UNION
  SELECT v AS s, u AS d FROM fwd WHERE (u + v) % 2 = 0
),
nodes AS MATERIALIZED (
  SELECT s AS id FROM se UNION SELECT d FROM se
),
a0 AS MATERIALIZED (SELECT id, id AS lbl FROM nodes),
b0 AS MATERIALIZED (SELECT id, id AS lbl FROM nodes)
{a_levels}
{b_levels},
lab AS MATERIALIZED (
  SELECT a.id, a.lbl AS fwd_min, b.lbl AS bwd_min
  FROM a{_BT_HOPS} a JOIN b{_BT_HOPS} b ON b.id = a.id
),
core_id AS MATERIALIZED (
  SELECT fwd_min AS core_id FROM lab WHERE fwd_min = bwd_min
  GROUP BY 1 ORDER BY COUNT(*) DESC, fwd_min LIMIT 1
),
rc0 AS MATERIALIZED (
  SELECT id FROM lab, core_id
  WHERE fwd_min = bwd_min AND fwd_min = core_id
),
fc0 AS MATERIALIZED (SELECT id FROM rc0)
{rc_levels}
{fc_levels},
cls AS (
  SELECT CASE WHEN c.id IS NOT NULL THEN 'CORE'
              WHEN r.id IS NOT NULL AND f.id IS NOT NULL THEN 'BRIDGE'
              WHEN r.id IS NOT NULL THEN 'IN'
              WHEN f.id IS NOT NULL THEN 'OUT'
              ELSE 'OTHER' END AS component
  FROM nodes n
  LEFT JOIN rc0 c ON c.id = n.id
  LEFT JOIN rc{_BT_REACH} r ON r.id = n.id
  LEFT JOIN fc{_BT_REACH} f ON f.id = n.id
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM nodes)
SELECT component, CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(COUNT(*) * 1000000 // t.n_total AS BIGINT) AS share_ppm
FROM cls, tot t
GROUP BY 1, t.n_total ORDER BY 1
"""


QUERIES["graph_bowtie_decomposition"] = graph_bowtie_decomposition
ORACLE["graph_bowtie_decomposition"] = _bowtie_oracle_sql()
