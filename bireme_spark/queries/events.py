"""Event-stream analytics queries (SURVEY.md §2.B): sessionization,
time windows, top-k, as-of join, pivot — the batch twins of the
streaming operators (same plans run under Structured Streaming with
watermarks; see bireme_spark/streaming)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bireme_spark.operators.windows import asof_join, sessionize
from bireme_spark.sources.tables import load_table

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30-min) per user; one shuffle on user_id."""
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", 1800, tiebreak_cols=("event_id",))
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


EVENTS_SESSIONIZE_SQL = """
WITH numbered AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  -- the running sum MUST use the same (ts, event_id) total order as
  -- the lag window above: with two equal-ts events per user a
  -- ts-only ROWS frame is order-ambiguous
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM numbered
)
SELECT user_id, session_id, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS session_value
FROM sessioned
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (F.window — the exact
    construct the streaming path uses with a watermark)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 1-hour window every 30 minutes, per
    event type. F.window with a slide duration fans each event into
    its two covering windows map-side (no pre-shuffle explode), then
    one hash aggregation — the same operator Structured Streaming uses
    with a watermark, so the batch and streaming plans agree."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


EVENTS_SLIDING_SQL = """
WITH fanned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type, value
  FROM events
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM fanned
GROUP BY 1, 2
ORDER BY 1, 2
"""


def events_topk_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 users per event type by activity (rank window over
    a pre-aggregated frame — aggregation shrinks before the sort)."""
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "user_id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy(F.desc("n"), F.asc("user_id"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .orderBy("event_type", "rank")
    )


EVENTS_TOPK_SQL = """
SELECT event_type, user_id, n, rank
FROM (
  SELECT event_type, user_id, COUNT(*) AS n,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY COUNT(*) DESC, user_id ASC) AS INTEGER) AS rank
  FROM events
  GROUP BY event_type, user_id
) t
WHERE rank <= 5
ORDER BY event_type, rank
"""


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event picks up the user's most
    recent order at-or-before the event time (union-timeline + one
    ordered window — no range-explosion join)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderkey", "o_orderdate"
    )
    joined = asof_join(
        e.select("user_id", "event_id", "ts"),
        o,
        on="user_id",
        left_ts="ts",
        right_ts="o_orderdate",
        right_payload=("o_orderdate", "o_orderkey"),
    )
    return joined.select("event_id", "user_id", "ts", "o_orderkey", "o_orderdate").orderBy(
        "event_id"
    )


ASOF_JOIN_SQL = """
SELECT event_id, user_id, ts, o_orderkey, o_orderdate
FROM (
  SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_orderdate,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY o.o_orderdate DESC NULLS LAST,
                                     o.o_orderkey DESC NULLS LAST) AS rn
  FROM events e
  LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
  WHERE e.event_type = 'purchase'
) t
WHERE rn = 1
ORDER BY event_id
"""


def pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type count matrix via pivot."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("user_id")
    )


PIVOT_SQL = """
SELECT user_id,
       COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
       COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
       COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
       COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
       COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → click → purchase: one
    aggregation pass computes each user's first time per step
    (conditional MIN — no per-step scans or joins), then counts users
    completing each ordered prefix. Two tiny shuffles regardless of
    event volume."""
    e = load_table(spark, sf_dir, "events")
    first = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
    )
    step1 = F.col("t_signup").isNotNull()
    step2 = step1 & F.col("t_click").isNotNull() & (F.col("t_click") > F.col("t_signup"))
    step3 = step2 & F.col("t_purchase").isNotNull() & (F.col("t_purchase") > F.col("t_click"))
    return first.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(step1.cast("bigint")).alias("n_signup"),
        F.sum(step2.cast("bigint")).alias("n_signup_click"),
        F.sum(step3.cast("bigint")).alias("n_full_funnel"),
    )


EVENTS_FUNNEL_SQL = """
WITH first AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events GROUP BY user_id
)
SELECT COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_signup_click,
       CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                      AND t_purchase > t_click
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_full_funnel
FROM first
"""


def unpivot_event_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot's inverse: per-type aggregate measures melted to long
    (event_type, measure, value) rows via DataFrame.unpivot — the
    melt happens map-side after the aggregation shrinks the frame, so
    the only shuffle is the groupBy."""
    e = load_table(spark, sf_dir, "events")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        F.countDistinct("user_id").cast("double").alias("n_users"),
    )
    return agg.unpivot(
        ids=["event_type"],
        values=["n_events", "total_value", "n_users"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("event_type", "measure")


UNPIVOT_SQL = """
WITH a AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value,
         CAST(COUNT(DISTINCT user_id) AS DOUBLE) AS n_users
  FROM events GROUP BY event_type
)
SELECT event_type, measure, value FROM (
  SELECT event_type, 'n_events' AS measure, n_events AS value FROM a
  UNION ALL
  SELECT event_type, 'total_value', total_value FROM a
  UNION ALL
  SELECT event_type, 'n_users', n_users FROM a
) u
ORDER BY event_type, measure
"""


QUERIES = {
    "events_sessionize": events_sessionize,
    "events_tumbling_window": events_tumbling_window,
    "events_sliding_window": events_sliding_window,
    "events_topk_by_type": events_topk_by_type,
    "asof_join": asof_join_events_orders,
    "pivot_event_types": pivot_event_types,
    "unpivot_event_measures": unpivot_event_measures,
    "events_funnel": events_funnel,
}

ORACLE = {
    "events_sessionize": EVENTS_SESSIONIZE_SQL,
    "events_tumbling_window": EVENTS_TUMBLING_SQL,
    "events_sliding_window": EVENTS_SLIDING_SQL,
    "events_topk_by_type": EVENTS_TOPK_SQL,
    "asof_join": ASOF_JOIN_SQL,
    "unpivot_event_measures": UNPIVOT_SQL,
    "events_funnel": EVENTS_FUNNEL_SQL,
    "pivot_event_types": PIVOT_SQL,
}


def events_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type latency/value distribution: exact p50/p90/p99
    (SQL PERCENTILE is a single-shuffle sort-based aggregate; the
    approx_percentile twin is the sketch path at 100 TB — same plan
    shape, mergeable partial sketches)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
            F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
        )
        .orderBy("event_type")
    )


EVENTS_PERCENTILES_SQL = """
SELECT event_type, COUNT(*) AS n_events,
       ROUND(quantile_cont(value, 0.5), 6) AS p50,
       ROUND(quantile_cont(value, 0.9), 6) AS p90,
       ROUND(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["events_value_percentiles"] = events_value_percentiles
ORACLE["events_value_percentiles"] = EVENTS_PERCENTILES_SQL


def events_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path at 100 TB: HyperLogLog++ distinct users
    (approx_count_distinct, rsd 2%) and KLL-style approx percentiles
    (percentile_approx) per event type. Both sketches are MERGEABLE
    partial aggregates — map-side partials, constant-size state, one
    shuffle — which is the whole point vs their exact twins (exact
    distinct shuffles every user_id; exact percentile sorts values).

    Rows-only at the gate: sketch estimates are engine-specific, so
    there is no cross-engine oracle; tests/test_sketches.py bounds
    the error against the exact aggregates instead."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.percentile_approx("value", 0.5, 10000).alias("p50_approx"),
            F.percentile_approx("value", 0.99, 10000).alias("p99_approx"),
        )
        .orderBy("event_type")
    )


QUERIES["events_approx_sketches"] = events_approx_sketches  # rows-only


def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the ``props`` JSON column
    with a typed ``from_json`` (schema'd parse → codegen'd struct
    field access, pushdown-friendly — never string-hack JSON with
    regex) and aggregate the extracted field per event type."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        F.from_json("props", "k INT").getField("k").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("k").alias("n_parsed"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(COUNT(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS n_parsed,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["events_json_extract"] = events_json_extract
ORACLE["events_json_extract"] = EVENTS_JSON_SQL


def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen
    week, counted by how many distinct users of that cohort return
    in each later week. Two shuffles total: one on user_id
    collecting each user's distinct active weeks (collect_set is a
    partial-aggregatable set, bounded by weeks-per-user), one on the
    (cohort, offset) cells — the per-cell rows are already unique
    per user, so the final count needs no distinct."""
    e = load_table(spark, sf_dir, "events")
    wk = F.date_trunc("week", F.col("ts"))
    per_user = e.groupBy("user_id").agg(F.sort_array(F.collect_set(wk)).alias("weeks"))
    x = per_user.select(
        F.col("weeks")[0].alias("cohort_week"),
        F.explode("weeks").alias("act_week"),
    )
    return (
        x.groupBy(
            F.col("cohort_week"),
            (F.datediff("act_week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


EVENTS_RETENTION_SQL = """
WITH acts AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
), first AS (
  SELECT user_id, MIN(act_week) AS cohort_week FROM acts GROUP BY user_id
)
SELECT f.cohort_week,
       CAST(date_diff('day', f.cohort_week, a.act_week) / 7 AS INTEGER) AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM acts a JOIN first f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""

QUERIES["events_retention_cohorts"] = events_retention_cohorts
ORACLE["events_retention_cohorts"] = EVENTS_RETENTION_SQL


def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type Markov transition matrix: for every ordered
    (prev_type → next_type) step in a user's timeline, the global
    count and the row-normalized transition probability.

    Plan shape: ONE shuffle on user_id for the lag window (the same
    partitioning any per-user sequence feature reuses), then a hash
    aggregation whose key space is |types|² — tiny — so the
    normalization window runs on a handful of rows. Ties on ts are
    broken by event_id so both engines see identical sequences."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(F.col("prev_type").isNotNull())
    )
    counts = steps.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    norm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        F.round(F.col("n_transitions") / F.sum("n_transitions").over(norm), 6).alias("prob"),
    ).orderBy("prev_type", "next_type")


EVENTS_TRANSITION_SQL = """
WITH steps AS (
  SELECT user_id,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
         event_type AS next_type
  FROM events
), counts AS (
  SELECT prev_type, next_type, COUNT(*) AS n_transitions
  FROM steps WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type, CAST(n_transitions AS BIGINT) AS n_transitions,
       ROUND(n_transitions / SUM(n_transitions) OVER (PARTITION BY prev_type), 6) AS prob
FROM counts
ORDER BY 1, 2
"""

QUERIES["events_transition_matrix"] = events_transition_matrix
ORACLE["events_transition_matrix"] = EVENTS_TRANSITION_SQL


def events_attribution_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition attribution over a salted big-big join: every event
    joins to its user's FIRST event (the acquisition touchpoint), then
    rolls up to an acquisition_type × event_type matrix with per-user
    reach.

    The user_id join is the canonical skewed big-big shape at 100 TB
    (hot users own outsized event shares; the firsts side is |users|
    rows — far beyond broadcast). `salted_join` spreads each hot user
    over 8 reducers; the result is provably identical to the plain
    join (the oracle IS the plain join). Firsts are computed with one
    min_by-struct aggregation — no window sort — and ties on ts break
    by event_id so both engines agree."""
    from bireme_spark.operators.joins import salted_join

    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    firsts = e.groupBy("user_id").agg(
        F.min(F.struct("ts", "event_id", "event_type")).getField("event_type").alias(
            "acq_type"
        )
    )
    joined = salted_join(e, firsts, ["user_id"], n_salts=8)
    return (
        joined.groupBy("acq_type", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy("acq_type", "event_type")
    )


EVENTS_ATTRIBUTION_SQL = """
WITH firsts AS (
  SELECT user_id, event_type AS acq_type
  FROM (
    SELECT user_id, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
    FROM events
  ) t WHERE rn = 1
)
SELECT f.acq_type, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
FROM events e JOIN firsts f USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""

QUERIES["events_attribution_salted"] = events_attribution_salted
ORACLE["events_attribution_salted"] = EVENTS_ATTRIBUTION_SQL


def events_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch-persistence pattern at 100 TB: build per-(type, day)
    HyperLogLog sketches ONCE (Datasketches HLL via hll_sketch_agg),
    then answer the weekly distinct-user question by UNIONING the
    daily sketches (hll_union_agg) — the raw stream is never
    rescanned for a new window. This is how a warehouse serves
    arbitrary-range COUNT(DISTINCT) from precomputed daily state:
    sketch unions are associative, so day → week → month rollups all
    merge the same constant-size registers.

    Rows-only at the gate (register contents are engine-specific);
    tests/test_sketches.py asserts (a) merged-daily == direct-weekly
    sketch estimates EXACTLY (mergeability) and (b) estimates within
    rsd bounds of exact distincts."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    # year-safe week key (date_trunc, not bare weekofyear — ISO week
    # numbers collide across years on multi-year data)
    weekly = (
        daily.groupBy(
            "event_type", F.date_trunc("week", "day").cast("date").alias("week_start")
        )
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_days_merged"),
        )
    )
    return weekly.select(
        "event_type",
        F.date_format("week_start", "yyyy-MM-dd").alias("week_start"),
        F.col("approx_users").cast("bigint").alias("approx_users"),
        F.col("n_days_merged").cast("int").alias("n_days_merged"),
    ).orderBy("event_type", "week_start")


QUERIES["events_sketch_rollup"] = events_sketch_rollup  # rows-only


_PATH_TOPK = 25


def events_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 3-step behavioral paths (the Sankey/flow view product
    analytics ships): consecutive event-type trigrams per user,
    counted corpus-wide. Extends the 2-step transition matrix to
    path shape.

    Scale: ONE shuffle on user_id; the lead window sorts inside each
    user partition (ties break by event_id on both engines); the path
    agg is ≤ |types|³ groups with map-side combine; top-k is
    TakeOrdered."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        e.select(
            "user_id",
            F.col("event_type").alias("s0"),
            F.lead("event_type", 1).over(w).alias("s1"),
            F.lead("event_type", 2).over(w).alias("s2"),
        )
        .where(F.col("s2").isNotNull())
        .select(F.concat_ws(">", "s0", "s1", "s2").alias("path"))
    )
    return (
        tri.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("path", F.col("n").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(_PATH_TOPK)
    )


EVENTS_USER_PATHS_SQL = f"""
WITH tri AS (
  SELECT event_type AS s0,
         LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s1,
         LEAD(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS s2
  FROM events
)
SELECT s0 || '>' || s1 || '>' || s2 AS path, CAST(COUNT(*) AS BIGINT) AS n
FROM tri WHERE s2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT {_PATH_TOPK}
"""

QUERIES["events_user_paths"] = events_user_paths
ORACLE["events_user_paths"] = EVENTS_USER_PATHS_SQL


def events_value_rank_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-standing window functions — percent_rank and
    cume_dist of each event's value within its (type, day) cohort
    (the "where does this transaction sit in today's distribution"
    question fraud/alerting queries ask).

    Determinism: both functions are RANK-based, so tied values get
    identical outputs regardless of intra-tie order. Emitted as exact
    integer PARTS-PER-MILLION (floor((rank−1)·10⁶/(n−1)) etc.), not
    rounded doubles: percent_rank values like 41/640 sit exactly on a
    .5·10⁻⁶ boundary where Spark's decimal-string ROUND and DuckDB's
    binary round(x·10⁶)/10⁶ disagree by one ulp (caught by the sf0.1
    gate tier; integer floor math is engine-identical at any scale).

    Scale: the windows partition on (type, day) — cohort-sized
    sorts that stay small at any corpus scale (vs a per-type-only
    partition, which would grow with the data); ONE shuffle."""
    e = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    w = Window.partitionBy("event_type", day).orderBy("value")
    wle = (
        Window.partitionBy("event_type", day)
        .orderBy("value")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type", day)
    n = F.count(F.lit(1)).over(wall)
    rk = F.rank().over(w)
    cle = F.count(F.lit(1)).over(wle)  # rows with value ≤ current (peers incl.)
    ranked = e.select(
        "event_id",
        "event_type",
        F.date_format(day, "yyyy-MM-dd").alias("day"),
        "value",
        rk.alias("rk"),
        cle.alias("cle"),
        n.alias("n"),
    )
    return (
        ranked.select(
            "event_id",
            "event_type",
            "day",
            "value",
            F.expr(
                "CAST(CASE WHEN n > 1 THEN ((rk - 1) * 1000000) DIV (n - 1)"
                " ELSE 0 END AS BIGINT)"
            ).alias("pct_rank_ppm"),
            F.expr("CAST((cle * 1000000) DIV n AS BIGINT)").alias("cume_dist_ppm"),
        )
        .orderBy("event_id")
    )


EVENTS_VALUE_RANK_SQL = """
WITH r AS (
  SELECT event_id, event_type,
         strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         value,
         RANK() OVER w AS rk,
         COUNT(*) OVER (PARTITION BY event_type, CAST(ts AS DATE)
                        ORDER BY value
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cle,
         COUNT(*) OVER (PARTITION BY event_type, CAST(ts AS DATE)) AS n
  FROM events
  WINDOW w AS (PARTITION BY event_type, CAST(ts AS DATE) ORDER BY value)
)
SELECT event_id, event_type, day, value,
       CAST(CASE WHEN n > 1 THEN ((rk - 1) * 1000000) // (n - 1) ELSE 0 END AS BIGINT)
         AS pct_rank_ppm,
       CAST((cle * 1000000) // n AS BIGINT) AS cume_dist_ppm
FROM r
ORDER BY event_id
"""

QUERIES["events_value_rank_daily"] = events_value_rank_daily
ORACLE["events_value_rank_daily"] = EVENTS_VALUE_RANK_SQL


def events_entropy_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-shift monitoring: Shannon entropy of the daily
    event-type mix (a collapsing mix — errors crowding out clicks —
    moves H before any single count alarms).

    Exactness: per-type terms −(c/n)·ln(c/n) are rounded at 6dp and
    DECIMAL-summed (the unigram-logprob discipline), so H is
    engine-identical.

    Scale: ONE (day, type) map-side-combined agg collapses the
    stream; the entropy fold runs on |days|×|types| rows."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = daily.groupBy("day").agg(F.sum("c").alias("n"))
    terms = daily.join(tot, "day").select(
        "day",
        F.round(-(F.col("c") / F.col("n")) * F.log(F.col("c") / F.col("n")), 6)
        .cast("decimal(18,6)")
        .alias("h_term"),
        "c",
    )
    return (
        terms.groupBy("day")
        .agg(
            F.sum("c").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("int").alias("n_types"),
            F.round(F.sum("h_term").cast("double"), 6).alias("entropy"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "n_types",
            "entropy",
        )
        .orderBy("day")
    )


EVENTS_ENTROPY_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
tot AS (SELECT day, SUM(c) AS n FROM daily GROUP BY 1),
terms AS (
  SELECT d.day, d.c,
         CAST(ROUND(-(d.c / CAST(t.n AS DOUBLE)) * LN(d.c / CAST(t.n AS DOUBLE)), 6)
              AS DECIMAL(18,6)) AS h_term
  FROM daily d JOIN tot t USING (day)
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(SUM(c) AS BIGINT) AS n_events,
       CAST(COUNT(*) AS INTEGER) AS n_types,
       ROUND(CAST(SUM(h_term) AS DOUBLE), 6) AS entropy
FROM terms GROUP BY day
ORDER BY day
"""

QUERIES["events_entropy_daily"] = events_entropy_daily
ORACLE["events_entropy_daily"] = EVENTS_ENTROPY_SQL


def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """View→purchase conversion latency: for each user, time from
    their FIRST view to the first purchase at-or-after it; one-row
    summary (conversion rate + exact min/median/mean/max seconds).

    Scale design: both passes shuffle only on user_id (first-view
    agg, then purchase min after a key-equi join); the latency
    distribution then collapses to a seconds→count histogram in a
    map-side-combined agg, so the exact-median window runs on
    histogram-sized data, never a global row sort. All stats are
    integer-µs exact; the final divisions are IEEE doubles of exact
    integers (engine-identical).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    viewers = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("us").alias("v_us"))
    )
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .join(viewers, "user_id")
        .where(F.col("us") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("us").alias("p_us"), F.min("v_us").alias("v_us"))
        .select(F.expr("(p_us - v_us) div 1000000").alias("lat_s"))
    )
    hist = conv.groupBy("lat_s").agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("lat_s").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = hist.withColumn("cum", F.sum("n").over(w)).withColumn(
        "tot", F.sum("n").over(wall)
    )
    s2 = cum.agg(
        F.sum("n").alias("n_converted"),
        F.min("lat_s").alias("min_latency_s"),
        F.min(F.when(F.lit(2) * F.col("cum") >= F.col("tot"), F.col("lat_s"))).alias(
            "median_latency_s"
        ),
        F.sum(F.col("lat_s") * F.col("n")).alias("_lsum"),
        F.max("lat_s").alias("max_latency_s"),
    )
    s1 = viewers.agg(F.count(F.lit(1)).alias("n_viewers"))
    return s1.crossJoin(s2).select(
        "n_viewers",
        "n_converted",
        (F.col("n_converted").cast("double") / F.col("n_viewers").cast("double")).alias(
            "conversion_rate"
        ),
        "min_latency_s",
        "median_latency_s",
        (F.col("_lsum").cast("double") / F.col("n_converted").cast("double")).alias(
            "mean_latency_s"
        ),
        "max_latency_s",
    )


CONVERSION_LATENCY_SQL = """
WITH viewers AS (
  SELECT user_id, MIN(epoch_us(ts)) AS v_us
  FROM events WHERE event_type = 'view' GROUP BY 1
),
conv AS (
  SELECT (MIN(epoch_us(e.ts)) - MIN(v.v_us)) // 1000000 AS lat_s
  FROM events e JOIN viewers v ON e.user_id = v.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v_us
  GROUP BY e.user_id
),
hist AS (SELECT lat_s, COUNT(*) AS n FROM conv GROUP BY 1),
cum AS (
  SELECT *,
         SUM(n) OVER (ORDER BY lat_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(n) OVER () AS tot
  FROM hist
),
s2 AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_converted,
         MIN(lat_s) AS min_latency_s,
         MIN(CASE WHEN 2 * cum >= tot THEN lat_s END) AS median_latency_s,
         CAST(SUM(lat_s * n) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS mean_latency_s,
         MAX(lat_s) AS max_latency_s
  FROM cum
),
s1 AS (SELECT COUNT(*) AS n_viewers FROM viewers)
SELECT n_viewers, n_converted,
       CAST(n_converted AS DOUBLE) / CAST(n_viewers AS DOUBLE) AS conversion_rate,
       min_latency_s, median_latency_s, mean_latency_s, max_latency_s
FROM s1, s2
"""

QUERIES["events_conversion_latency"] = events_conversion_latency
ORACLE["events_conversion_latency"] = CONVERSION_LATENCY_SQL


def events_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact DAU / WAU (7-day) / stickiness per day — the
    metric-engine staple that CANNOT be a window sum of daily counts
    (users repeat across days; rolling distinct needs dedup inside
    every window).

    Scale design: the stream collapses to DISTINCT (user, day) ONCE
    (map-side partial distinct); each user-day then fans out
    map-side to the ≤7 window-end days it supports, and a second
    distinct-agg on (day, user) counts each user once per window —
    cost is 7×|user-days|, shuffled on the (day, user-hash) key,
    never a per-day re-scan of the raw stream. DAU rides the same
    user-day frame. Stickiness is an IEEE division of exact counts.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    user_days = ev.distinct()
    dau = user_days.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fan = user_days.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"), "day", "user_id"
    ).select(F.date_add("day", F.col("off")).alias("wday"), "user_id")
    # a user-day supports windows ending day..day+6; keep only window
    # ends that exist as observed days so the report stays dense-real
    wau = (
        fan.distinct()
        .groupBy("wday")
        .agg(F.count(F.lit(1)).alias("wau"))
        .withColumnRenamed("wday", "day")
    )
    return (
        dau.join(wau, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(F.col("dau").cast("double") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("day")
    )


ACTIVE_USERS_SQL = """
WITH user_days AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
dau AS (SELECT day, COUNT(*) AS dau FROM user_days GROUP BY 1),
fan AS (
  SELECT DISTINCT day + CAST(o.off AS INTEGER) AS wday, user_id
  FROM user_days, (SELECT unnest(generate_series(0, 6)) AS off) o
),
wau AS (SELECT wday AS day, COUNT(*) AS wau FROM fan GROUP BY 1)
SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w.wau,
       ROUND(CAST(d.dau AS DOUBLE) / CAST(w.wau AS DOUBLE), 6) AS stickiness
FROM dau d JOIN wau w ON d.day = w.day
ORDER BY day
"""

QUERIES["events_active_users_rolling"] = events_active_users_rolling
ORACLE["events_active_users_rolling"] = ACTIVE_USERS_SQL


def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic between the
    value distributions of 'click' and 'purchase' events — the
    distribution-shift test that needs no binning choices (unlike
    the chi-square) and catches shape differences the mean/variance
    monitors miss.

    Scale design: each sample collapses to a value→count histogram
    (map-side-combined agg); the two histograms full-outer-join on
    the value grid, cumulative counts run as ONE ordered window over
    the merged histogram (histogram-sized, never raw rows), and
    D = max |ecdf₁ − ecdf₂| is a single max-agg. ECDFs are IEEE
    divisions of exact integers; D is rounded at 6dp.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    h1 = (
        ev.where(F.col("event_type") == "click")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    h2 = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("c2"))
    )
    m = h1.join(h2, "value", "full_outer").select(
        "value",
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c2", F.lit(0)).alias("c2"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    cum = (
        m.withColumn("cum1", F.sum("c1").over(w))
        .withColumn("cum2", F.sum("c2").over(w))
        .withColumn("n1", F.sum("c1").over(wall))
        .withColumn("n2", F.sum("c2").over(wall))
    )
    d = F.abs(
        F.col("cum1").cast("double") / F.col("n1").cast("double")
        - F.col("cum2").cast("double") / F.col("n2").cast("double")
    )
    return cum.agg(
        F.max("n1").alias("n_click"),
        F.max("n2").alias("n_purchase"),
        F.round(F.max(d), 6).alias("ks_statistic"),
    )


KS_TEST_SQL = """
WITH h1 AS (
  SELECT value, COUNT(*) AS c1 FROM events WHERE event_type = 'click' GROUP BY 1
),
h2 AS (
  SELECT value, COUNT(*) AS c2 FROM events WHERE event_type = 'purchase' GROUP BY 1
),
m AS (
  SELECT COALESCE(h1.value, h2.value) AS value,
         COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
  FROM h1 FULL OUTER JOIN h2 ON h1.value = h2.value
),
cum AS (
  SELECT SUM(c1) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum1,
         SUM(c2) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2,
         SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
  FROM m
)
SELECT CAST(MAX(n1) AS BIGINT) AS n_click,
       CAST(MAX(n2) AS BIGINT) AS n_purchase,
       ROUND(MAX(ABS(CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                   - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))), 6) AS ks_statistic
FROM cum
"""

QUERIES["events_ks_test"] = events_ks_test
ORACLE["events_ks_test"] = KS_TEST_SQL


def events_type_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types co-occurring
    for the SAME USER — the unordered complement of the sequential
    transition matrix (which types go together in a user's lifetime,
    regardless of order).

    Scale design: the stream collapses to DISTINCT (user, type)
    first; per-user type pairs fan out map-side (≤C(|types|,2) per
    user — a power user cannot explode the pair stream), and both
    the pair counts and the per-type marginals re-aggregate that one
    distinct frame. PMI = ln(N·c_ab/(c_a·c_b)) on the ≤|types|² cell
    table, 6dp-rounded.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    # the distinct (user,type) frame feeds FOUR branches (both pair
    # sides, marginals, user total): checkpoint so the stream
    # collapses once (plan audit: 5 events scans)
    ut = ev.distinct().localCheckpoint(eager=True)
    a = ut.select("user_id", F.col("event_type").alias("t_a"))
    b = ut.select("user_id", F.col("event_type").alias("t_b"))
    pairs = (
        a.join(b, "user_id")
        .where(F.col("t_a") < F.col("t_b"))
        .groupBy("t_a", "t_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    marg = ut.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    n_users = ut.select("user_id").distinct().agg(F.count(F.lit(1)).alias("n"))
    return (
        pairs.join(marg.select(F.col("event_type").alias("t_a"), F.col("c").alias("c_a")), "t_a")
        .join(marg.select(F.col("event_type").alias("t_b"), F.col("c").alias("c_b")), "t_b")
        .crossJoin(F.broadcast(n_users))
        .select(
            "t_a",
            "t_b",
            "c_ab",
            F.round(
                F.log(
                    (F.col("n") * F.col("c_ab")).cast("double")
                    / (F.col("c_a") * F.col("c_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy("t_a", "t_b")
    )


TYPE_PMI_SQL = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
pairs AS (
  SELECT a.event_type AS t_a, b.event_type AS t_b, COUNT(*) AS c_ab
  FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
),
marg AS (SELECT event_type, COUNT(*) AS c FROM ut GROUP BY 1),
n AS (SELECT COUNT(DISTINCT user_id) AS n FROM ut)
SELECT p.t_a, p.t_b, CAST(p.c_ab AS BIGINT) AS c_ab,
       ROUND(LN(CAST(n.n * p.c_ab AS DOUBLE) / CAST(ma.c * mb.c AS DOUBLE)), 6) AS pmi
FROM pairs p
JOIN marg ma ON ma.event_type = p.t_a
JOIN marg mb ON mb.event_type = p.t_b
CROSS JOIN n
ORDER BY t_a, t_b
"""

QUERIES["events_type_pmi"] = events_type_pmi
ORACLE["events_type_pmi"] = TYPE_PMI_SQL


def events_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE error-budget burn-down: daily error rate vs a 25% SLO and
    the cumulative share of the period's error budget consumed — the
    reliability rollup a sync pipeline's on-call watches.

    Scale design: ONE (day) hash agg with conditional counts collapses
    the stream; the burn-down cumulative window runs on the
    |days|-sized series. Budget math is exact integers; rates are
    IEEE divisions rounded at 6dp.
    """
    slo = 0.25  # allowed error fraction per period
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        (F.col("event_type") == "error").cast("int").alias("is_err"),
    )
    daily = ev.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("is_err").alias("n_errors"),
    )
    wall = Window.partitionBy()
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    d = daily.withColumn("budget", (F.lit(slo) * F.sum("n_events").over(wall).cast("double"))).withColumn(
        "cum_errors", F.sum("n_errors").over(w)
    )
    return (
        d.select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_events",
            "n_errors",
            F.round(
                F.col("n_errors").cast("double") / F.col("n_events").cast("double"), 6
            ).alias("error_rate"),
            F.round(F.col("cum_errors").cast("double") / F.col("budget"), 6).alias(
                "budget_burned"
            ),
        )
        .orderBy("day")
    )


ERROR_BUDGET_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
  FROM events GROUP BY 1
),
d AS (
  SELECT *,
         0.25 * CAST(SUM(n_events) OVER () AS DOUBLE) AS budget,
         SUM(n_errors) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_errors
  FROM daily
)
SELECT strftime(day, '%Y-%m-%d') AS day, n_events, n_errors,
       ROUND(CAST(n_errors AS DOUBLE) / CAST(n_events AS DOUBLE), 6) AS error_rate,
       ROUND(CAST(cum_errors AS DOUBLE) / budget, 6) AS budget_burned
FROM d ORDER BY day
"""

QUERIES["events_error_budget"] = events_error_budget
ORACLE["events_error_budget"] = ERROR_BUDGET_SQL


def events_markov_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction baseline: predict each user's next event
    type as the corpus-wide most-likely transition (first-order
    Markov argmax) and report per-type accuracy — the floor any
    sequence model must beat, evaluated in-engine.

    Scale design: consecutive (from, to) pairs come from ONE user-key
    shuffle + lead window (the transition-matrix plan); the argmax
    table is |types|² cells reduced to |types| rows (ties break
    lexicographically — deterministic) and broadcasts back onto the
    same pair stream for scoring. Accuracy is an IEEE division of
    exact counts.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .select(F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type"))
    )
    trans = pairs.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wmax = Window.partitionBy("from_type").orderBy(F.col("n").desc(), "to_type")
    pred = (
        trans.withColumn("rk", F.row_number().over(wmax))
        .where(F.col("rk") == 1)
        .select("from_type", F.col("to_type").alias("predicted_next"))
    )
    scored = pairs.join(F.broadcast(pred), "from_type").select(
        "from_type",
        "predicted_next",
        (F.col("to_type") == F.col("predicted_next")).cast("int").alias("hit"),
    )
    return (
        scored.groupBy("from_type", "predicted_next")
        .agg(F.count(F.lit(1)).alias("n_transitions"), F.sum("hit").alias("n_correct"))
        .select(
            "from_type",
            "predicted_next",
            "n_transitions",
            "n_correct",
            F.round(
                F.col("n_correct").cast("double") / F.col("n_transitions").cast("double"),
                6,
            ).alias("accuracy"),
        )
        .orderBy("from_type")
    )


MARKOV_BASELINE_SQL = """
WITH seq AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS to_type
  FROM events
),
pairs AS (SELECT from_type, to_type FROM seq WHERE to_type IS NOT NULL),
trans AS (SELECT from_type, to_type, COUNT(*) AS n FROM pairs GROUP BY 1, 2),
pred AS (
  SELECT from_type, to_type AS predicted_next FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY from_type
                                 ORDER BY n DESC, to_type) AS rk
    FROM trans
  ) WHERE rk = 1
)
SELECT p.from_type, d.predicted_next,
       COUNT(*) AS n_transitions,
       CAST(SUM(CASE WHEN p.to_type = d.predicted_next THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       ROUND(CAST(SUM(CASE WHEN p.to_type = d.predicted_next THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS accuracy
FROM pairs p JOIN pred d ON p.from_type = d.from_type
GROUP BY 1, 2 ORDER BY 1
"""

QUERIES["events_markov_baseline"] = events_markov_baseline
ORACLE["events_markov_baseline"] = MARKOV_BASELINE_SQL


def events_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-vs-returning user split — the growth-accounting
    metric every product dashboard leads with: a user is NEW on their
    first-ever active day, RETURNING after.

    Scale design: first-seen day is ONE per-user MIN agg over the
    distinct (user, day) frame; the classification join rides the
    same user key, and the daily rollup is map-side-combined. No
    window over raw events anywhere.
    """
    ud = (
        load_table(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    j = ud.join(first, "user_id").select(
        "day", (F.col("day") == F.col("first_day")).cast("int").alias("is_new")
    )
    return (
        j.groupBy("day")
        .agg(
            F.sum("is_new").alias("new_users"),
            F.sum(F.lit(1) - F.col("is_new")).alias("returning_users"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "new_users",
            "returning_users",
            F.round(
                F.col("new_users").cast("double")
                / (F.col("new_users") + F.col("returning_users")).cast("double"),
                6,
            ).alias("new_share"),
        )
        .orderBy("day")
    )


NEW_VS_RETURNING_SQL = """
WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
first AS (SELECT user_id, MIN(day) AS first_day FROM ud GROUP BY 1),
j AS (
  SELECT ud.day, CASE WHEN ud.day = f.first_day THEN 1 ELSE 0 END AS is_new
  FROM ud JOIN first f ON ud.user_id = f.user_id
)
SELECT strftime(day, '%Y-%m-%d') AS day,
       CAST(SUM(is_new) AS BIGINT) AS new_users,
       CAST(SUM(1 - is_new) AS BIGINT) AS returning_users,
       ROUND(CAST(SUM(is_new) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS new_share
FROM j GROUP BY day ORDER BY day
"""

QUERIES["events_new_vs_returning"] = events_new_vs_returning
ORACLE["events_new_vs_returning"] = NEW_VS_RETURNING_SQL


_CEP_WINDOW_S = 1800


def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-event-processing pattern match — the MATCH_RECOGNIZE
    workload (SQL:2016) Spark lacks natively, expressed as ONE
    per-user ordered window pass: a PURCHASE matches when the user's
    most recent CLICK is within 30 minutes AND no ERROR occurred
    strictly after that click (click → [no error] → purchase). Emits
    per-user match counts and exact mean click→purchase latency.

    Scale design: no self-join and no per-pattern explode — running
    "last click ts" / "last error ts" states are two window
    aggregates over the (user, time)-sorted stream (one shuffle on
    user_id, the same layout every per-user CEP engine partition
    uses); the match predicate is then a pure map-side expression.
    Latency sums are exact integer seconds; the mean divides once."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("s")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ann = ev.withColumn(
        "last_click_s", F.last(F.when(F.col("event_type") == "click", F.col("s")), True).over(w)
    ).withColumn(
        "last_error_s", F.last(F.when(F.col("event_type") == "error", F.col("s")), True).over(w)
    )
    m = ann.where(
        (F.col("event_type") == "purchase")
        & F.col("last_click_s").isNotNull()
        & (F.col("s") - F.col("last_click_s") <= _CEP_WINDOW_S * 1_000_000)
        & (
            F.col("last_error_s").isNull()
            | (F.col("last_error_s") <= F.col("last_click_s"))
        )
    )
    return (
        m.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum(F.col("s") - F.col("last_click_s")).alias("lat_sum"),
        )
        .select(
            "user_id",
            "n_matches",
            F.round(
                F.col("lat_sum").cast("double")
                / (F.col("n_matches").cast("double") * 1e6),
                6,
            ).alias("mean_latency_s"),
        )
        .orderBy("user_id")
    )


EVENTS_CEP_SQL = f"""
WITH ann AS (
  SELECT user_id, event_type, epoch_us(ts) AS s,
         MAX(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_s,
         MAX(CASE WHEN event_type = 'error' THEN epoch_us(ts) END)
           OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_error_s
  FROM events
),
m AS (
  SELECT user_id, s - last_click_s AS lat
  FROM ann
  WHERE event_type = 'purchase' AND last_click_s IS NOT NULL
    AND s - last_click_s <= {_CEP_WINDOW_S} * 1000000
    AND (last_error_s IS NULL OR last_error_s <= last_click_s)
)
SELECT user_id, COUNT(*) AS n_matches,
       ROUND(CAST(SUM(lat) AS DOUBLE) / (COUNT(*) * 1e6), 6) AS mean_latency_s
FROM m GROUP BY user_id ORDER BY user_id
"""

QUERIES["events_cep_pattern"] = events_cep_pattern
ORACLE["events_cep_pattern"] = EVENTS_CEP_SQL


def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap sessionization via Spark's NATIVE ``session_window`` TVF —
    the engine-side session operator (whole-stage codegen session
    merge, no custom state code): same 30-minute gap rule as the
    custom batch/streaming sessionizers, value-checked against the
    SQL gap-sessionization oracle. A session_window's end is
    max(ts) + gap by definition, so the oracle emits the same bound.

    Plan: one shuffle on user_id into the native session aggregation
    — the operator exists precisely so sessionization needs no
    window-sort or applyInPandas at 100 TB."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


SESSION_WINDOW_NATIVE_SQL = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
numbered AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 1800 SECOND AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""

QUERIES["events_session_window_native"] = events_session_window_native
ORACLE["events_session_window_native"] = SESSION_WINDOW_NATIVE_SQL


def events_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral bot screen — the trust-and-safety composite every
    event pipeline runs before analytics trust the traffic: per user,
    volume (events per active hour), night share (00-06 UTC), and
    type concentration (top event-type share), each gated RELATIVE
    to the population mean (baselined screens survive traffic-shape
    drift; absolute gates don't). Emits every ≥20-event user with the
    evidence ratios and how many gates they exceed — the triage list
    a reviewer consumes.

    Scale design: ONE pass collapses the stream to per-(user, hour)
    and per-(user, type) counts (map-side combine); every later step
    is user-cardinality; the population baseline is a one-row
    broadcast. Ratios are IEEE divisions of exact integer counts,
    identical on both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("hour", "ts").alias("hr"),
        F.hour("ts").alias("hod"),
        "event_type",
    )
    base = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("hr").alias("active_hours"),
        F.sum(F.when(F.col("hod") < 6, 1).otherwise(0)).alias("night_events"),
    )
    top_type = (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").alias("top_type_events"))
    )
    j = base.join(top_type, "user_id")
    rate = F.col("n_events").cast("double") / F.col("active_hours").cast("double")
    night = F.col("night_events").cast("double") / F.col("n_events").cast("double")
    conc = F.col("top_type_events").cast("double") / F.col("n_events").cast("double")
    pop = j.agg(
        F.avg(rate).alias("ar"), F.avg(night).alias("an"), F.avg(conc).alias("ac")
    )
    j = j.crossJoin(F.broadcast(pop))
    score = (
        F.when(rate > 1.03 * F.col("ar"), 1).otherwise(0)
        + F.when(night > 1.15 * F.col("an"), 1).otherwise(0)
        + F.when(conc > 1.10 * F.col("ac"), 1).otherwise(0)
    )
    return (
        j.where(F.col("n_events") >= 20)
        .select(
            "user_id",
            "n_events",
            F.round(rate, 6).alias("events_per_hour"),
            F.round(night, 6).alias("night_share"),
            F.round(conc, 6).alias("type_concentration"),
            score.cast("int").alias("signals"),
        )
        .orderBy("user_id")
    )


EVENTS_BOT_SCREEN_SQL = """
WITH base AS (
  SELECT user_id, COUNT(*) AS n_events,
         COUNT(DISTINCT date_trunc('hour', ts)) AS active_hours,
         SUM(CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END) AS night_events
  FROM events GROUP BY 1
),
tt AS (
  SELECT user_id, MAX(c) AS top_type_events FROM (
    SELECT user_id, event_type, COUNT(*) AS c FROM events GROUP BY 1, 2
  ) GROUP BY 1
),
scored AS (
  SELECT b.user_id, b.n_events,
         CAST(b.n_events AS DOUBLE) / b.active_hours AS rate,
         CAST(b.night_events AS DOUBLE) / b.n_events AS night,
         CAST(t.top_type_events AS DOUBLE) / b.n_events AS conc
  FROM base b JOIN tt t ON b.user_id = t.user_id
),
pop AS (SELECT AVG(rate) AS ar, AVG(night) AS an, AVG(conc) AS ac FROM scored)
SELECT user_id, n_events,
       ROUND(rate, 6) AS events_per_hour,
       ROUND(night, 6) AS night_share,
       ROUND(conc, 6) AS type_concentration,
       CAST((CASE WHEN rate > 1.03 * ar THEN 1 ELSE 0 END)
          + (CASE WHEN night > 1.15 * an THEN 1 ELSE 0 END)
          + (CASE WHEN conc > 1.10 * ac THEN 1 ELSE 0 END) AS INTEGER) AS signals
FROM scored, pop
WHERE n_events >= 20
ORDER BY user_id
"""

QUERIES["events_bot_screen"] = events_bot_screen
ORACLE["events_bot_screen"] = EVENTS_BOT_SCREEN_SQL


def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed strict-order funnel (ClickHouse ``windowFunnel``
    semantics): signup → click → purchase must occur IN ORDER within
    one hour of the anchoring signup; a user's depth is the deepest
    prefix any of their signup anchors achieves. Unlike
    ``events_funnel`` (global first-times, unbounded horizon) this is
    the time-bounded conversion metric a growth team actually quotes
    ("converted within the hour").

    Scale design: three filtered projections of ONE scan; each stage
    is a per-user equi-join with a range predicate whose right side is
    the (small) anchor table, then a map-side-combinable MIN per
    anchor — the round-5 groupBy-plus-candidate-join discipline, no
    window function ever touches the raw stream. All time math in
    exact integer microseconds on both engines."""
    w_us = 3_600_000_000  # 1 hour
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    sign = e.where(F.col("event_type") == "signup").select(
        "user_id", F.col("t").alias("t0")
    )
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("t").alias("tc")
    )
    purch = e.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("t").alias("tp")
    )
    a1 = (
        sign.join(
            clicks,
            (F.col("cu") == F.col("user_id"))
            & (F.col("tc") > F.col("t0"))
            & (F.col("tc") <= F.col("t0") + F.lit(w_us)),
            "left",
        )
        .groupBy("user_id", "t0")
        .agg(F.min("tc").alias("t1"))
    )
    a2 = (
        a1.join(
            purch,
            (F.col("pu") == F.col("user_id"))
            & (F.col("tp") > F.col("t1"))
            & (F.col("tp") <= F.col("t0") + F.lit(w_us)),
            "left",
        )
        .groupBy("user_id", "t0", "t1")
        .agg(F.min("tp").alias("t2"))
    )
    depth = (
        a2.groupBy("user_id")
        .agg(
            F.max(
                F.lit(1)
                + F.col("t1").isNotNull().cast("int")
                + F.col("t2").isNotNull().cast("int")
            ).alias("depth")
        )
    )
    return (
        depth.groupBy("depth")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("depth")
    )


EVENTS_WINDOW_FUNNEL_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
s AS (SELECT user_id, t AS t0 FROM e WHERE event_type = 'signup'),
c AS (SELECT user_id AS cu, t AS tc FROM e WHERE event_type = 'click'),
p AS (SELECT user_id AS pu, t AS tp FROM e WHERE event_type = 'purchase'),
a1 AS (
  SELECT s.user_id, t0, MIN(tc) AS t1
  FROM s LEFT JOIN c ON cu = s.user_id AND tc > t0 AND tc <= t0 + 3600000000
  GROUP BY 1, 2
),
a2 AS (
  SELECT a1.user_id, t0, t1, MIN(tp) AS t2
  FROM a1 LEFT JOIN p ON pu = a1.user_id AND tp > t1 AND tp <= t0 + 3600000000
  GROUP BY 1, 2, 3
),
d AS (
  SELECT user_id,
         MAX(1 + CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
               + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END) AS depth
  FROM a2 GROUP BY 1
)
SELECT depth, COUNT(*) AS n_users FROM d GROUP BY 1 ORDER BY 1
"""

QUERIES["events_window_funnel"] = events_window_funnel
ORACLE["events_window_funnel"] = EVENTS_WINDOW_FUNNEL_SQL


def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch (Cormode & Muthukrishnan 2005) heavy-hitter
    estimation over event actors: a d=4 × w=256 sketch built with the
    engine-portable md5-nibble hash family, then the top-20 exact
    heavy hitters re-estimated THROUGH the sketch — emitting exact
    count, CMS estimate, and the (provably ≥ 0) overcount so the
    sketch's error behavior is value-checked, not just its plumbing.

    Scale design: CMS is LINEAR, so the sketch is built from the
    per-key count histogram (one map-side-combined groupBy — the
    distinct-value-histogram discipline), never by exploding the raw
    stream ×d; cells are d·w = 1024 rows, candidates are 20 — every
    join after the first agg is broadcast-sized. At 100 TB the sketch
    mergeability (cell-wise sum) is what a per-partition/per-day
    rollup exploits; same plan."""
    d_seeds = [1, 2, 3, 4]
    e = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), F.col("user_id").cast("string").alias("u")
    )
    exact = e.groupBy("uid", "u").agg(F.count(F.lit(1)).alias("exact_count"))
    seeded = exact.select(
        "uid",
        "u",
        "exact_count",
        F.explode(F.array(*[F.lit(s) for s in d_seeds])).alias("seed"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("seed"), F.col("u"))), 1, 2),
            16,
            10,
        ).cast("int"),
    )
    cells = seeded.groupBy("seed", "bucket").agg(
        F.sum("exact_count").cast("bigint").alias("c")
    )
    top = exact.orderBy(F.col("exact_count").desc(), F.col("uid").asc()).limit(20)
    cand = top.select(
        "uid",
        "u",
        "exact_count",
        F.explode(F.array(*[F.lit(s) for s in d_seeds])).alias("seed"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(F.md5(F.concat_ws(":", F.col("seed"), F.col("u"))), 1, 2),
            16,
            10,
        ).cast("int"),
    )
    est = (
        cand.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("uid", "exact_count")
        .agg(F.min("c").alias("cms_estimate"))
    )
    return est.select(
        F.col("uid").alias("user_id"),
        "exact_count",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_count")).cast("bigint").alias("overcount"),
    ).orderBy(F.col("exact_count").desc(), "user_id")


EVENTS_CMS_SQL = """
WITH exact AS (
  SELECT user_id AS uid, CAST(user_id AS VARCHAR) AS u, COUNT(*) AS exact_count
  FROM events GROUP BY 1, 2
),
seeded AS (
  SELECT uid, u, exact_count, seed,
         16 * (strpos('0123456789abcdef', substr(md5(seed || ':' || u), 1, 1)) - 1)
            + (strpos('0123456789abcdef', substr(md5(seed || ':' || u), 2, 1)) - 1) AS bucket
  FROM exact, UNNEST(['1', '2', '3', '4']) AS t(seed)
),
cells AS (
  SELECT seed, bucket, CAST(SUM(exact_count) AS BIGINT) AS c
  FROM seeded GROUP BY 1, 2
),
top AS (
  SELECT uid, u, exact_count FROM exact
  ORDER BY exact_count DESC, uid ASC LIMIT 20
),
cand AS (
  SELECT uid, u, exact_count, seed,
         16 * (strpos('0123456789abcdef', substr(md5(seed || ':' || u), 1, 1)) - 1)
            + (strpos('0123456789abcdef', substr(md5(seed || ':' || u), 2, 1)) - 1) AS bucket
  FROM top, UNNEST(['1', '2', '3', '4']) AS t(seed)
),
est AS (
  SELECT uid, exact_count, MIN(c) AS cms_estimate
  FROM cand JOIN cells USING (seed, bucket)
  GROUP BY 1, 2
)
SELECT uid AS user_id, CAST(exact_count AS BIGINT) AS exact_count,
       cms_estimate, CAST(cms_estimate - exact_count AS BIGINT) AS overcount
FROM est
ORDER BY exact_count DESC, user_id
"""

QUERIES["events_cms_heavy_hitters"] = events_cms_heavy_hitters
ORACLE["events_cms_heavy_hitters"] = EVENTS_CMS_SQL


def events_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Shapley-value conversion attribution (Shapley 1953, the
    marketing-attribution formulation): each converting user's
    channel-touch SET (channels seen strictly before their first
    purchase) is a coalition; v(S) = conversions whose touch-set ⊆ S;
    a channel's credit is the exact Shapley average of its marginal
    contributions. With 4 channels this is EXACT — no sampling — and
    every quantity is integer: weights are scaled by n!=24
    (s!(n-1-s)! ∈ {6,2,2,6}), so `shapley_x24` is a bigint and the
    single /24.0 division is the only IEEE step (1/24 is
    non-terminating in decimal, so the 6dp ROUND can never sit on a
    .5e-6 boundary — the sf0.1 engine-split trap does not apply).

    Scale design: the stream collapses to ONE user-grain agg (first
    purchase time and the touch bitmask in the same two-pass
    candidate join + conditional-MAX), then to the ≤15-row mask
    histogram; the subset lattice (16 masks), v() subset-sums, and
    the 64-row channel×coalition table are broadcast-sized bit-math
    joins — identical cost at any event volume."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("t")
    )
    fp = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "purchase", F.col("t"))).alias("fp")
    )
    touched = e.join(fp, "user_id").where(
        F.col("fp").isNotNull()
        & (F.col("t") < F.col("fp"))
        & (F.col("event_type") != "purchase")
    )
    m = touched.groupBy("user_id").agg(
        (
            F.max(F.when(F.col("event_type") == "click", 1).otherwise(0))
            + 2 * F.max(F.when(F.col("event_type") == "error", 1).otherwise(0))
            + 4 * F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
            + 8 * F.max(F.when(F.col("event_type") == "view", 1).otherwise(0))
        ).alias("mask")
    )
    mc = m.groupBy("mask").agg(F.count(F.lit(1)).alias("cnt"))
    masks = spark.range(16).select(F.col("id").cast("int").alias("s"))
    v = (
        masks.join(F.broadcast(mc), F.expr("(mask & s) = mask"), "left")
        .groupBy("s")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("v"))
    )
    channels = spark.createDataFrame(
        [("click", 1), ("error", 2), ("signup", 4), ("view", 8)],
        "channel string, bit int",
    )
    pairs = channels.join(F.broadcast(masks), F.expr("(s & bit) = 0"))
    v1 = v.select(F.col("s").alias("s1"), F.col("v").alias("v_s"))
    v2 = v.select(F.col("s").alias("s2"), F.col("v").alias("v_si"))
    d = (
        pairs.join(F.broadcast(v1), F.col("s1") == F.col("s"))
        .join(F.broadcast(v2), F.expr("s2 = (s | bit)"))
        .select(
            "channel",
            (
                F.expr(
                    "CASE bit_count(s) WHEN 0 THEN 6 WHEN 1 THEN 2"
                    " WHEN 2 THEN 2 ELSE 6 END"
                )
                * (F.col("v_si") - F.col("v_s"))
            ).alias("wd"),
        )
    )
    return (
        d.groupBy("channel")
        .agg(F.sum("wd").cast("bigint").alias("shapley_x24"))
        .select(
            "channel",
            "shapley_x24",
            F.round(F.col("shapley_x24") / 24.0, 6).alias("shapley"),
        )
        .orderBy("channel")
    )


EVENTS_SHAPLEY_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
fp AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'purchase' THEN t END) AS fp
  FROM e GROUP BY 1
),
touched AS (
  SELECT e.user_id, event_type
  FROM e JOIN fp ON fp.user_id = e.user_id
  WHERE fp IS NOT NULL AND t < fp AND event_type <> 'purchase'
),
m AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
       + 2 * MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
       + 4 * MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
       + 8 * MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS mask
  FROM touched GROUP BY 1
),
mc AS (SELECT mask, COUNT(*) AS cnt FROM m GROUP BY 1),
masks AS (SELECT CAST(s AS INTEGER) AS s FROM generate_series(0, 15) t(s)),
v AS (
  SELECT s, CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS v
  FROM masks LEFT JOIN mc ON (mask & s) = mask GROUP BY 1
),
ch(channel, bit) AS (VALUES ('click', 1), ('error', 2), ('signup', 4), ('view', 8)),
pairs AS (SELECT channel, bit, s FROM ch, masks WHERE (s & bit) = 0),
d AS (
  SELECT channel,
         CASE bit_count(pairs.s) WHEN 0 THEN 6 WHEN 1 THEN 2
              WHEN 2 THEN 2 ELSE 6 END * (v2.v - v1.v) AS wd
  FROM pairs
  JOIN v v1 ON v1.s = pairs.s
  JOIN v v2 ON v2.s = (pairs.s | bit)
)
SELECT channel, CAST(SUM(wd) AS BIGINT) AS shapley_x24,
       ROUND(CAST(SUM(wd) AS BIGINT) / 24.0, 6) AS shapley
FROM d GROUP BY 1 ORDER BY 1
"""

QUERIES["events_shapley_attribution"] = events_shapley_attribution
ORACLE["events_shapley_attribution"] = EVENTS_SHAPLEY_SQL


def events_watermark_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness audit — the observability metric behind
    every `withWatermark` tuning decision: for each event, lateness =
    (highest event-time already seen on its partition) − (its own
    event time), i.e. how far behind the per-partition frontier it
    arrived; the histogram of that lateness is what you read to pick
    a delay threshold that drops <0.1% of data. The synthetic stream
    is perfectly time-ordered, so ARRIVAL disorder is synthesized
    deterministically: arrival = event time + an md5-keyed jitter of
    0–119 s (network/multi-source interleave), identical on both
    engines. Partitions are the kafka-partition residue (user_id%8).

    Exactness: pure integer µs math; jitter from the md5-nibble
    idiom; buckets are explicit FLOOR(10-second classes) with a
    terminal 120 s+ class. Scale: the running MAX window is
    PARTITIONED by kafka partition (arrival order only means
    anything within one), so the frontier scan parallelizes per
    partition — never a global ordered window on the raw stream."""
    e = load_table(spark, sf_dir, "events").select(
        (F.col("user_id") % 8).alias("part"),
        "event_id",
        F.unix_micros("ts").alias("t"),
    ).withColumn(
        "arrival",
        F.col("t")
        + (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("j:"), F.col("event_id").cast("string"))), 1, 2
                ),
                16,
                10,
            ).cast("bigint")
            % 120
        )
        * 1_000_000,
    )
    w = Window.partitionBy("part").orderBy("arrival", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    late = e.select("part", (F.max("t").over(w) - F.col("t")).alias("late_us"))
    bucket = F.when(F.col("late_us") >= 120_000_000, F.lit(12)).otherwise(
        F.expr("CAST(FLOOR(late_us / 10000000.0) AS INT)")
    )
    return (
        late.select(bucket.alias("late_10s_bucket"))
        .groupBy("late_10s_bucket")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .orderBy("late_10s_bucket")
    )


EVENTS_WATERMARK_LATENESS_SQL = """
WITH e AS (
  SELECT user_id % 8 AS part, event_id, epoch_us(ts) AS t,
         epoch_us(ts)
         + (CAST(16 * (strpos('0123456789abcdef',
                              substr(md5('j:' || CAST(event_id AS VARCHAR)), 1, 1)) - 1)
               + (strpos('0123456789abcdef',
                         substr(md5('j:' || CAST(event_id AS VARCHAR)), 2, 1)) - 1)
               AS BIGINT) % 120) * 1000000 AS arrival
  FROM events
),
late AS (
  SELECT part,
         MAX(t) OVER (PARTITION BY part ORDER BY arrival, event_id
                      ROWS UNBOUNDED PRECEDING) - t AS late_us
  FROM e
)
SELECT CASE WHEN late_us >= 120000000 THEN 12
            ELSE CAST(FLOOR(late_us / 10000000.0) AS INTEGER) END
         AS late_10s_bucket,
       COUNT(*) AS n_events
FROM late
GROUP BY 1 ORDER BY 1
"""

QUERIES["events_watermark_lateness"] = events_watermark_lateness
ORACLE["events_watermark_lateness"] = EVENTS_WATERMARK_LATENESS_SQL


def events_poisson_rate_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Poisson rate test, weekday vs weekend traffic: is
    the weekend arrival rate different, as a z-statistic under the
    pooled-rate normal approximation — the capacity-planning
    hypothesis test that pairs with events_hurst_exponent (burstiness)
    and the interarrival stats (shape): λ̂ = (n₁+n₂)/(t₁+t₂),
    z = (n₁/t₁ − n₂/t₂)/√(λ̂(1/t₁+1/t₂)).

    Engine-exact: weekday classification is pure integer epoch math
    ((days_since_epoch + 4) % 7 — never the engine-divergent
    dayofweek builtins: Spark counts 1=Sunday, DuckDB 0=Sunday);
    exposures are integer hour counts from the fixed Jan-2024 span;
    the closing z expression is identically-written IEEE on exact
    integers.

    Scale: one classify-and-count agg over the stream; the rest is
    two-row arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) DIV 86400000000")
    dow = (day + 4) % 7
    weekend = dow.isin(0, 6)
    m = ev.select(weekend.alias("we")).agg(
        F.count(F.when(~F.col("we"), 1)).alias("n_wd"),
        F.count(F.when(F.col("we"), 1)).alias("n_we"),
    )
    # Jan 1..30 2024: 22 weekdays (528h), 8 weekend days (192h)
    t1, t2 = F.lit(528.0), F.lit(192.0)
    r1 = F.col("n_wd").cast("double") / t1
    r2 = F.col("n_we").cast("double") / t2
    lam = (F.col("n_wd") + F.col("n_we")).cast("double") / (t1 + t2)
    z = (r1 - r2) / F.sqrt(lam * (F.lit(1.0) / t1 + F.lit(1.0) / t2))
    return m.select(
        F.col("n_wd").alias("n_weekday"),
        F.col("n_we").alias("n_weekend"),
        r1.alias("rate_weekday_per_hour"),
        r2.alias("rate_weekend_per_hour"),
        z.alias("z_stat"),
        (F.abs(z) > 1.96).alias("significant_5pct"),
    )


EVENTS_POISSON_RATE_SQL = """
WITH cls AS (
  SELECT (epoch_us(ts) // 86400000000 + 4) % 7 IN (0, 6) AS we FROM events
),
m AS (
  SELECT COUNT(CASE WHEN NOT we THEN 1 END) AS n_wd,
         COUNT(CASE WHEN we THEN 1 END) AS n_we
  FROM cls
)
SELECT n_wd AS n_weekday, n_we AS n_weekend,
       CAST(n_wd AS DOUBLE) / 528.0 AS rate_weekday_per_hour,
       CAST(n_we AS DOUBLE) / 192.0 AS rate_weekend_per_hour,
       (CAST(n_wd AS DOUBLE) / 528.0 - CAST(n_we AS DOUBLE) / 192.0)
         / SQRT(CAST(n_wd + n_we AS DOUBLE) / (528.0 + 192.0)
                * (1.0 / 528.0 + 1.0 / 192.0)) AS z_stat,
       ABS((CAST(n_wd AS DOUBLE) / 528.0 - CAST(n_we AS DOUBLE) / 192.0)
           / SQRT(CAST(n_wd + n_we AS DOUBLE) / (528.0 + 192.0)
                  * (1.0 / 528.0 + 1.0 / 192.0))) > 1.96 AS significant_5pct
FROM m
"""

QUERIES["events_poisson_rate_test"] = events_poisson_rate_test
ORACLE["events_poisson_rate_test"] = EVENTS_POISSON_RATE_SQL


def events_bottomk_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) distinct-count sketch per event type (Bar-Yossef
    2002; Beyer 2007): keep each type's k=32 smallest md5(user)
    hashes; D̂ = (k−1)/u₍ₖ₎ where u₍ₖ₎ is the k-th smallest hash as a
    fraction — the MERGEABLE sketch family the suite's CMS (counts),
    Bloom (membership) and HLL (rows-only) siblings don't cover with
    an exact oracle: KMV both estimates distincts AND yields a
    uniform sample of them. The 'ALL' row is computed by MERGING the
    per-type sketches (min-k of their union) — merged-vs-direct
    equality is the property that makes per-partition/per-day
    sketches valid at 100 TB, and the oracle hash-checks the merge
    path's estimate exactly.

    Engine-exact: hashes are the first 12 hex chars of md5 (fixed-
    width lowercase hex: STRING order == numeric order — the
    portable-MinHash trick); the estimate is pure integer
    FLOOR((k−1)·16¹² / v_k); errors are integer ppm against the
    exact distinct count.

    Scale: one (type, user) distinct, one per-type top-k window on
    the hash (map-side prunable at 100 TB via partial bottom-k per
    partition); the merge is sketch-sized."""
    k = 32
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    hashed = tu.select(
        "event_type",
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12).alias("h"),
    )
    wk = Window.partitionBy("event_type").orderBy("h")
    kept = hashed.withColumn("rn", F.row_number().over(wk)).where(F.col("rn") <= k)
    exact = tu.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    vk = kept.groupBy("event_type").agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("kk")
    )
    est = F.expr(
        f"CAST(FLOOR(CAST(({k} - 1) AS DOUBLE) * 281474976710656"
        f" / CAST(conv(hk, 16, 10) AS DOUBLE)) AS BIGINT)"
    )
    per_type = (
        vk.join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            F.when(F.col("kk") < k, F.col("exact_distinct")).otherwise(est).alias(
                "kmv_estimate"
            ),
        )
    )
    # merged 'ALL' sketch: min-k of the UNION of per-type sketches
    wg = Window.orderBy("h")
    merged = (
        kept.select("h")
        .distinct()
        .withColumn("rn", F.row_number().over(wg))
        .where(F.col("rn") <= k)
    )
    gm = merged.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("kk"))
    gexact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    all_row = gm.crossJoin(F.broadcast(gexact)).select(
        F.lit("ALL_MERGED").alias("event_type"),
        "exact_distinct",
        F.when(F.col("kk") < k, F.col("exact_distinct")).otherwise(est).alias(
            "kmv_estimate"
        ),
    )
    out = per_type.unionByName(all_row)
    err = F.expr(
        "CAST(ABS(kmv_estimate - exact_distinct) * 1000000 DIV exact_distinct"
        " AS BIGINT)"
    )
    return out.select(
        "event_type", "exact_distinct", "kmv_estimate", err.alias("error_ppm")
    ).orderBy("event_type")


EVENTS_BOTTOMK_SQL = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
hashed AS (
  SELECT event_type, substr(md5(CAST(user_id AS VARCHAR)), 1, 12) AS h FROM tu
),
kept AS (
  SELECT event_type, h FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
  ) q WHERE rn <= 32
),
exact AS (
  SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
  FROM tu GROUP BY 1
),
vk AS (
  SELECT event_type, MAX(h) AS hk, COUNT(*) AS kk FROM kept GROUP BY 1
),
per_type AS (
  SELECT vk.event_type, exact.exact_distinct,
         CASE WHEN vk.kk < 32 THEN exact.exact_distinct
              ELSE CAST(FLOOR(31.0 * 281474976710656
                              / CAST(CAST('0x' || vk.hk AS BIGINT) AS DOUBLE)) AS BIGINT)
         END AS kmv_estimate
  FROM vk JOIN exact USING (event_type)
),
merged AS (
  SELECT h FROM (
    SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn
    FROM (SELECT DISTINCT h FROM kept) u
  ) q WHERE rn <= 32
),
gm AS (SELECT MAX(h) AS hk, COUNT(*) AS kk FROM merged),
gexact AS (SELECT COUNT(DISTINCT user_id) AS exact_distinct FROM events),
all_row AS (
  SELECT 'ALL_MERGED' AS event_type, gexact.exact_distinct,
         CASE WHEN gm.kk < 32 THEN gexact.exact_distinct
              ELSE CAST(FLOOR(31.0 * 281474976710656
                              / CAST(CAST('0x' || gm.hk AS BIGINT) AS DOUBLE)) AS BIGINT)
         END AS kmv_estimate
  FROM gm, gexact
),
unioned AS (SELECT * FROM per_type UNION ALL SELECT * FROM all_row)
SELECT event_type, exact_distinct, kmv_estimate,
       CAST(ABS(kmv_estimate - exact_distinct) * 1000000 // exact_distinct
            AS BIGINT) AS error_ppm
FROM unioned ORDER BY event_type
"""

QUERIES["events_bottomk_sketch"] = events_bottomk_sketch
ORACLE["events_bottomk_sketch"] = EVENTS_BOTTOMK_SQL


def events_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral association as an odds ratio with a Woolf 95% CI:
    for each candidate behavior (click / view / signup / error), the
    2×2 user-grain table against PURCHASE — OR = (a·d)/(b·c), ln-CI
    = ln(OR) ± 1.96·√(1/a+1/b+1/c+1/d) — the case-control-style
    effect size the funnel/PMI queries don't give (PMI is symmetric
    co-occurrence; the OR conditions on the margins), plus the
    "does the CI exclude 1" verdict.

    Engine-exact: the 2×2 cells are one conditional user-grain agg
    (exact integers, Haldane +0.5 correction applied as ×2 integers
    to stay exact); OR and the CI bounds are identical closing IEEE
    expressions (EXP/LN 6dp-rounded per the transcendental
    discipline).

    Scale: one user-grain bitmask agg over the stream (map-side
    combine), then 4 rows of arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    flags = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
        *[
            F.max(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(t)
            for t in ("click", "view", "signup", "error")
        ],
    )
    rows = []
    for t in ("click", "view", "signup", "error"):
        rows.append(
            flags.agg(
                F.lit(t).alias("behavior"),
                F.sum(F.expr(f"CASE WHEN {t} = 1 AND y = 1 THEN 1 ELSE 0 END")).alias("a"),
                F.sum(F.expr(f"CASE WHEN {t} = 1 AND y = 0 THEN 1 ELSE 0 END")).alias("b"),
                F.sum(F.expr(f"CASE WHEN {t} = 0 AND y = 1 THEN 1 ELSE 0 END")).alias("c"),
                F.sum(F.expr(f"CASE WHEN {t} = 0 AND y = 0 THEN 1 ELSE 0 END")).alias("d"),
            )
        )
    cells = rows[0]
    for df in rows[1:]:
        cells = cells.unionByName(df)
    # Haldane-Anscombe: a+0.5 etc., kept exact via doubled integers
    a2, b2, c2, d2 = [F.col(x) * 2 + 1 for x in ("a", "b", "c", "d")]
    orr = (a2.cast("double") * d2.cast("double")) / (
        b2.cast("double") * c2.cast("double")
    )
    lnor = F.expr(
        "CAST(ROUND(LN(((a * 2 + 1) * (d * 2 + 1)) / (((b * 2 + 1)) * ((c * 2 + 1.0)))), 6)"
        " AS DECIMAL(18,6))"
    )
    se = F.expr(
        "CAST(ROUND(SQRT(2.0 / (a * 2 + 1) + 2.0 / (b * 2 + 1)"
        " + 2.0 / (c * 2 + 1) + 2.0 / (d * 2 + 1)), 6) AS DECIMAL(18,6))"
    )
    staged = cells.select(
        "behavior", "a", "b", "c", "d", orr.alias("odds_ratio"),
        lnor.alias("lnor"), se.alias("se")
    )
    ci_lo = F.expr(
        "CAST(ROUND(EXP(CAST(lnor AS DOUBLE) - 1.96 * CAST(se AS DOUBLE)), 6)"
        " AS DOUBLE)"
    )
    ci_hi = F.expr(
        "CAST(ROUND(EXP(CAST(lnor AS DOUBLE) + 1.96 * CAST(se AS DOUBLE)), 6)"
        " AS DOUBLE)"
    )
    return (
        staged.select(
            "behavior", "a", "b", "c", "d", "odds_ratio",
            ci_lo.alias("ci_lo"), ci_hi.alias("ci_hi"),
        )
        .withColumn(
            "significant", (F.col("ci_lo") > 1.0) | (F.col("ci_hi") < 1.0)
        )
        .orderBy("behavior")
    )


EVENTS_ODDS_RATIO_SQL = """
WITH flags AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view,
         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS signup,
         MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS error
  FROM events GROUP BY 1
),
cells AS (
  SELECT 'click' AS behavior,
         SUM(CASE WHEN click = 1 AND y = 1 THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN click = 1 AND y = 0 THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN click = 0 AND y = 1 THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN click = 0 AND y = 0 THEN 1 ELSE 0 END) AS d
  FROM flags
  UNION ALL
  SELECT 'view',
         SUM(CASE WHEN view = 1 AND y = 1 THEN 1 ELSE 0 END),
         SUM(CASE WHEN view = 1 AND y = 0 THEN 1 ELSE 0 END),
         SUM(CASE WHEN view = 0 AND y = 1 THEN 1 ELSE 0 END),
         SUM(CASE WHEN view = 0 AND y = 0 THEN 1 ELSE 0 END)
  FROM flags
  UNION ALL
  SELECT 'signup',
         SUM(CASE WHEN signup = 1 AND y = 1 THEN 1 ELSE 0 END),
         SUM(CASE WHEN signup = 1 AND y = 0 THEN 1 ELSE 0 END),
         SUM(CASE WHEN signup = 0 AND y = 1 THEN 1 ELSE 0 END),
         SUM(CASE WHEN signup = 0 AND y = 0 THEN 1 ELSE 0 END)
  FROM flags
  UNION ALL
  SELECT 'error',
         SUM(CASE WHEN error = 1 AND y = 1 THEN 1 ELSE 0 END),
         SUM(CASE WHEN error = 1 AND y = 0 THEN 1 ELSE 0 END),
         SUM(CASE WHEN error = 0 AND y = 1 THEN 1 ELSE 0 END),
         SUM(CASE WHEN error = 0 AND y = 0 THEN 1 ELSE 0 END)
  FROM flags
),
calc AS (
  SELECT behavior, CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
         CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
         CAST((a * 2 + 1) AS DOUBLE) * CAST((d * 2 + 1) AS DOUBLE)
           / (CAST((b * 2 + 1) AS DOUBLE) * CAST((c * 2 + 1) AS DOUBLE))
           AS odds_ratio,
         CAST(ROUND(LN(((a * 2 + 1) * (d * 2 + 1))
                       / (((b * 2 + 1)) * ((c * 2 + 1.0)))), 6)
              AS DECIMAL(18,6)) AS lnor,
         CAST(ROUND(SQRT(2.0 / (a * 2 + 1) + 2.0 / (b * 2 + 1)
                         + 2.0 / (c * 2 + 1) + 2.0 / (d * 2 + 1)), 6)
              AS DECIMAL(18,6)) AS se
  FROM cells
)
SELECT behavior, a, b, c, d, odds_ratio,
       CAST(ROUND(EXP(CAST(lnor AS DOUBLE) - 1.96 * CAST(se AS DOUBLE)), 6)
            AS DOUBLE) AS ci_lo,
       CAST(ROUND(EXP(CAST(lnor AS DOUBLE) + 1.96 * CAST(se AS DOUBLE)), 6)
            AS DOUBLE) AS ci_hi,
       (CAST(ROUND(EXP(CAST(lnor AS DOUBLE) - 1.96 * CAST(se AS DOUBLE)), 6)
             AS DOUBLE) > 1.0
        OR CAST(ROUND(EXP(CAST(lnor AS DOUBLE) + 1.96 * CAST(se AS DOUBLE)), 6)
                AS DOUBLE) < 1.0) AS significant
FROM calc ORDER BY behavior
"""

QUERIES["events_odds_ratio"] = events_odds_ratio
ORACLE["events_odds_ratio"] = EVENTS_ODDS_RATIO_SQL


def events_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013 — the experiment-
    platform standard): using each user's PRE-period activity (event
    count, days 1–14) as the covariate for their POST-period value
    (sum of event values, days 15–30), estimate θ = cov(pre,post)/
    var(pre) and the achievable variance reduction ρ² — the number
    that tells an A/B platform how much smaller its experiments can
    be. Complements parts_promo_did (which estimates an effect;
    CUPED shrinks the error bars).

    Engine-exact: pre counts are integers; post values are 6dp-
    rounded per-user DECIMAL sums; all five moment sums are DECIMAL
    (rounded to 6dp before the double cast), and θ/ρ² close in one
    identically-written IEEE expression.

    Scale: one user-grain conditional agg over the stream + one
    moment agg — both map-side-combinable."""
    ev = load_table(spark, sf_dir, "events")
    day = F.expr("unix_micros(ts) DIV 86400000000") - 19723  # 2024-01-01
    per_user = ev.select(
        "user_id",
        day.alias("d"),
        F.round(F.col("value"), 6).cast("decimal(18,6)").alias("v"),
    ).groupBy("user_id").agg(
        F.count(F.when(F.col("d") < 14, 1)).alias("pre"),
        F.sum(F.when(F.col("d") >= 14, F.col("v")).otherwise(F.lit(0).cast("decimal(18,6)"))).alias(
            "post"
        ),
    )
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pre").alias("sx"),
        F.sum(F.col("pre") * F.col("pre")).alias("sxx"),
        F.round(F.sum("post"), 6).cast("decimal(28,6)").alias("sy"),
        F.round(F.sum(F.col("post") * F.col("post")), 6).cast("decimal(28,6)").alias("syy"),
        F.round(F.sum(F.col("pre") * F.col("post")), 6).cast("decimal(28,6)").alias("sxy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast(
        "double"
    ) / n
    varx = F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col(
        "sx"
    ).cast("double") / n
    vary = F.col("syy").cast("double") - F.col("sy").cast("double") * F.col(
        "sy"
    ).cast("double") / n
    theta = cov / varx
    rho2 = cov * cov / (varx * vary)
    return m.select(
        "n",
        theta.alias("theta"),
        rho2.alias("rho_sq"),
        (F.lit(100.0) * rho2).alias("variance_reduction_pct"),
    )


EVENTS_CUPED_SQL = """
WITH per_user AS (
  SELECT user_id,
         COUNT(CASE WHEN epoch_us(ts) // 86400000000 - 19723 < 14 THEN 1 END) AS pre,
         SUM(CASE WHEN epoch_us(ts) // 86400000000 - 19723 >= 14
                  THEN CAST(ROUND(value, 6) AS DECIMAL(18,6))
                  ELSE CAST(0 AS DECIMAL(18,6)) END) AS post
  FROM events GROUP BY 1
),
m AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(pre) AS BIGINT) AS sx,
         CAST(SUM(pre * pre) AS BIGINT) AS sxx,
         CAST(ROUND(SUM(post), 6) AS DECIMAL(28,6)) AS sy,
         CAST(ROUND(SUM(post * post), 6) AS DECIMAL(28,6)) AS syy,
         CAST(ROUND(SUM(pre * post), 6) AS DECIMAL(28,6)) AS sxy
  FROM per_user
)
SELECT n,
       (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         / (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
         AS theta,
       (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
         AS rho_sq,
       100.0 * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         * (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
         / ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
            * (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)))
         AS variance_reduction_pct
FROM m
"""

QUERIES["events_cuped_adjustment"] = events_cuped_adjustment
ORACLE["events_cuped_adjustment"] = EVENTS_CUPED_SQL


def events_gini_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump induction by exact Gini impurity (the CART
    split criterion; Holte's 1R baseline): over the 24 hour-of-day
    split candidates, find the threshold h that best separates
    purchase events from the rest by weighted Gini of the two
    branches — the one-node tree that seeds any boosted/бagged
    ensemble and the interpretable "when do purchases happen"
    answer. Emits every candidate's impurity so the whole search is
    hash-checked, not just the argmin.

    Engine-exact: class counts per hour are integers; each branch's
    Gini 2p(n−p)/n² is a truncating-integer ppm (2e6·p·q DIV n² —
    products cap at 5e15, BIGINT-safe at any SF), and the weighted
    score is a second truncating combine (gL·nL + gR·nR) DIV nT —
    the two-stage quantization is identical on both engines, so
    ranking and values hash-match with zero floating point.

    Scale: one (hour, class) count agg (24×2 cells); the split
    search is constant-size."""
    ev = load_table(spark, sf_dir, "events")
    hr = F.expr("unix_micros(ts) DIV 3600000000") % 24
    cells = ev.select(
        hr.alias("h"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    ).groupBy("h").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("p")
    )
    wc = Window.orderBy("h").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cum = cells.select(
        "h",
        F.sum("n").over(wc).alias("nl"),
        F.sum("p").over(wc).alias("pl"),
        F.sum("n").over(wt).alias("nt"),
        F.sum("p").over(wt).alias("pt"),
    ).where(F.col("h") < 23)
    g = F.expr(
        "CAST(((2000000 * pl * (nl - pl) DIV (nl * nl)) * nl"
        " + (2000000 * (pt - pl) * ((nt - nl) - (pt - pl))"
        "    DIV ((nt - nl) * (nt - nl))) * (nt - nl)) DIV nt AS BIGINT)"
    )
    scored = cum.select(
        F.col("h").alias("split_hour"), g.alias("weighted_gini_ppm")
    )
    wbest = Window.orderBy(
        F.col("weighted_gini_ppm").asc(), F.col("split_hour").asc()
    )
    return scored.withColumn("rank", F.row_number().over(wbest)).orderBy(
        "split_hour"
    )


EVENTS_GINI_STUMP_SQL = """
WITH cells AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS h, COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p
  FROM events GROUP BY 1
),
cum AS (
  SELECT h,
         SUM(n) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS nl,
         SUM(p) OVER (ORDER BY h ROWS UNBOUNDED PRECEDING) AS pl,
         SUM(n) OVER () AS nt, SUM(p) OVER () AS pt
  FROM cells QUALIFY h < 23
),
scored AS (
  SELECT h AS split_hour,
         CAST(((2000000 * pl * (nl - pl) // (nl * nl)) * nl
               + (2000000 * (pt - pl) * ((nt - nl) - (pt - pl))
                  // ((nt - nl) * (nt - nl))) * (nt - nl)) // nt
              AS BIGINT) AS weighted_gini_ppm
  FROM cum
)
SELECT CAST(split_hour AS BIGINT) AS split_hour, weighted_gini_ppm,
       CAST(ROW_NUMBER() OVER (ORDER BY weighted_gini_ppm ASC, split_hour ASC)
            AS INTEGER) AS rank
FROM scored ORDER BY split_hour
"""

QUERIES["events_gini_stump"] = events_gini_stump
ORACLE["events_gini_stump"] = EVENTS_GINI_STUMP_SQL


def events_eb_shrinkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical-Bayes shrinkage of per-user purchase rates (the
    beta-binomial / James–Stein "batting average" estimator,
    Efron & Morris 1975): raw rates p̂ᵢ = kᵢ/nᵢ are noisy for
    low-activity users; shrink toward the pooled rate with a
    method-of-moments prior strength m, p̃ᵢ = (kᵢ + m·p̄)/(nᵢ + m) —
    the ranking-safe rate every leaderboard should use instead of
    raw ratios. Reports the shrinkage distribution by activity band
    (how much low-n users move vs high-n users).

    Engine-exact: per-user (kᵢ, nᵢ) are integers; p̄ and the moment
    estimate m are FLOOR-quantized integer ppm (bit-deterministic);
    shrunk rates are integer-ppm arithmetic on those; bands are
    explicit integer ranges.

    Scale: one user-grain agg + one moment agg + one banded rollup —
    all map-side-combinable."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("k"),
    )
    mom = per.agg(
        F.count(F.lit(1)).alias("u"),
        F.sum("k").alias("sk"),
        F.sum("n").alias("sn"),
        F.sum(F.expr("k * 1000000 DIV n")).alias("sp"),
        F.sum(
            F.expr("(k * 1000000 DIV n) * (k * 1000000 DIV n)")
        ).alias("spp"),
    )
    # pooled rate and prior strength, both in integer ppm:
    #   pbar_ppm = sk*1e6 DIV sn
    #   var of raw ppm rates: (u*spp - sp^2) / u^2  (kept n-scaled)
    #   m = pbar*(1e6-pbar)/var  (floor, clamped to >= 1)
    params = mom.select(
        "u",
        F.expr("sk * 1000000 DIV sn").alias("pbar_ppm"),
        F.expr(
            "GREATEST(CAST(1 AS BIGINT), CAST(FLOOR("
            " CAST(sk * 1000000 DIV sn AS DOUBLE)"
            " * (1000000 - sk * 1000000 DIV sn)"
            " / (CAST(u * spp - sp * sp AS DOUBLE) / (CAST(u AS DOUBLE) * u))"
            " / 1000000) AS BIGINT))"
        ).alias("m"),
    )
    shrunk = per.crossJoin(F.broadcast(params)).select(
        "n",
        F.expr("k * 1000000 DIV n").alias("raw_ppm"),
        F.expr("(k * 1000000 + m * pbar_ppm) DIV (n + m)").alias("eb_ppm"),
        F.when(F.col("n") < 5, "lo")
        .when(F.col("n") < 15, "mid")
        .otherwise("hi")
        .alias("band"),
    )
    return (
        shrunk.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.expr("SUM(ABS(raw_ppm - eb_ppm)) DIV COUNT(*)").alias(
                "mean_abs_shift_ppm"
            ),
            F.max(F.expr("ABS(raw_ppm - eb_ppm)")).alias("max_shift_ppm"),
        )
        .orderBy("band")
    )


EVENTS_EB_SHRINKAGE_SQL = """
WITH per AS (
  SELECT user_id, COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS k
  FROM events GROUP BY 1
),
mom AS (
  SELECT COUNT(*) AS u, CAST(SUM(k) AS BIGINT) AS sk,
         CAST(SUM(n) AS BIGINT) AS sn,
         CAST(SUM(k * 1000000 // n) AS BIGINT) AS sp,
         CAST(SUM((k * 1000000 // n) * (k * 1000000 // n)) AS BIGINT) AS spp
  FROM per
),
params AS (
  SELECT u, sk * 1000000 // sn AS pbar_ppm,
         GREATEST(CAST(1 AS BIGINT), CAST(FLOOR(
           CAST(sk * 1000000 // sn AS DOUBLE)
           * (1000000 - sk * 1000000 // sn)
           / (CAST(u * spp - sp * sp AS DOUBLE) / (CAST(u AS DOUBLE) * u))
           / 1000000) AS BIGINT)) AS m
  FROM mom
),
shrunk AS (
  SELECT per.n,
         per.k * 1000000 // per.n AS raw_ppm,
         (per.k * 1000000 + p.m * p.pbar_ppm) // (per.n + p.m) AS eb_ppm,
         CASE WHEN per.n < 5 THEN 'lo' WHEN per.n < 15 THEN 'mid'
              ELSE 'hi' END AS band
  FROM per, params p
)
SELECT band, COUNT(*) AS n_users,
       CAST(SUM(ABS(raw_ppm - eb_ppm)) // COUNT(*) AS BIGINT)
         AS mean_abs_shift_ppm,
       CAST(MAX(ABS(raw_ppm - eb_ppm)) AS BIGINT) AS max_shift_ppm
FROM shrunk GROUP BY 1 ORDER BY 1
"""

QUERIES["events_eb_shrinkage"] = events_eb_shrinkage
ORACLE["events_eb_shrinkage"] = EVENTS_EB_SHRINKAGE_SQL


def events_dwell_semi_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-Markov dwell-time profile: how long a user SITS in each
    state before their next event — the time dimension the
    transition-matrix query (pure jump probabilities) discards, and
    the difference between a Markov chain and the semi-Markov
    process real clickstreams follow. Per state: spell count, mean
    dwell, and the EXACT median dwell via a histogram-CDF on
    whole-second buckets.

    Engine-exact: dwells are integer µs LEAD differences per user
    (the µs-epoch discipline); means are truncating integer DIV;
    medians are cross-multiplied integer CDF picks on the
    second-granularity histogram.

    Scale: one user-partition LEAD window over the stream, one
    (state, second) histogram agg, histogram-sized CDF windows —
    never a raw-row quantile sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("us")
    dw = (
        ev.select(
            "user_id",
            "event_type",
            F.expr("unix_micros(ts)").alias("us"),
        )
        .withColumn("nxt", F.lead("us").over(w))
        .where(F.col("nxt").isNotNull())
        .select("event_type", (F.col("nxt") - F.col("us")).alias("dwell_us"))
    )
    hist = (
        dw.select("event_type", F.expr("dwell_us DIV 1000000").alias("sec"))
        .groupBy("event_type", "sec")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcdf = Window.partitionBy("event_type").orderBy("sec").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wtot = Window.partitionBy("event_type")
    cdf = hist.select(
        "event_type",
        "sec",
        F.sum("c").over(wcdf).alias("cum"),
        F.sum("c").over(wtot).alias("n"),
    )
    med = (
        cdf.where(F.expr("cum * 2 >= n"))
        .groupBy("event_type")
        .agg(F.min("sec").alias("median_dwell_sec"))
    )
    agg = dw.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_spells"),
        F.expr("SUM(dwell_us) DIV COUNT(*) DIV 1000000").alias("mean_dwell_sec"),
    )
    return agg.join(med, "event_type").orderBy("event_type")


EVENTS_DWELL_SQL = """
WITH dw AS (
  SELECT event_type,
         LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
           - epoch_us(ts) AS dwell_us
  FROM events
  QUALIFY dwell_us IS NOT NULL
),
hist AS (
  SELECT event_type, dwell_us // 1000000 AS sec, COUNT(*) AS c
  FROM dw GROUP BY 1, 2
),
cdf AS (
  SELECT event_type, sec,
         SUM(c) OVER (PARTITION BY event_type ORDER BY sec
                      ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER (PARTITION BY event_type) AS n
  FROM hist
),
med AS (
  SELECT event_type, CAST(MIN(sec) AS BIGINT) AS median_dwell_sec
  FROM cdf WHERE cum * 2 >= n GROUP BY 1
),
agg AS (
  SELECT event_type, COUNT(*) AS n_spells,
         CAST(SUM(dwell_us) // COUNT(*) // 1000000 AS BIGINT) AS mean_dwell_sec
  FROM dw GROUP BY 1
)
SELECT agg.event_type, agg.n_spells, agg.mean_dwell_sec, med.median_dwell_sec
FROM agg JOIN med USING (event_type)
ORDER BY event_type
"""

QUERIES["events_dwell_semi_markov"] = events_dwell_semi_markov
ORACLE["events_dwell_semi_markov"] = EVENTS_DWELL_SQL


# ---------------------------------------------------------------------------
# Portable HyperLogLog — engine-exact sketch registers
# ---------------------------------------------------------------------------

# rho = leading-zero count + 1 of the 48-bit hash tail (column `w`),
# i.e. 49 - bit_length(w): generated ONCE and shared verbatim by both
# engines (the shift/mask house rule) — 48 integer comparisons, no
# floats, no log2 near-power-boundary ulp risk.
_HLL_RHO_CASE = (
    "CASE "
    + " ".join(f"WHEN w >= {1 << (47 - k)} THEN {k + 1}" for k in range(48))
    + " ELSE 49 END"
)
# alpha_256 * m^2 * 2^49 (the HLL bias constant folded with the
# register-sum scaling): one double literal parsed identically by both
# engines; the estimate is then a SINGLE IEEE division by the exact
# integer register sum. The scale MUST match the register terms:
# occupied registers contribute 2^(49-M) (M ranges 1..49, so the
# largest term is 2^48) and EMPTY registers contribute 2^(49-0) =
# 2^49 — round 6 shipped empties and this constant at 2^48, which
# halved the raw estimate outside the linear-counting regime
# (ADVICE r6, high).
_HLL_C = repr(0.7213 / (1 + 1.079 / 256) * 65536.0 * float(1 << 49))
# Σ_{i=3..14} nibble_i * 16^(14-i): DuckDB lacks conv(), so the 48-bit
# tail is a generated positional sum over the md5 hex string `h`.
_HLL_W_DUCK = " + ".join(
    f"(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1) * {16 ** (14 - i)}"
    for i in range(3, 15)
)


def events_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-portable HyperLogLog (Flajolet et al. 2007) distinct
    users per event type — the ORACLE-CHECKED twin of the rows-only
    ``events_approx_sketches``: registers are built from the md5 hex
    string (bucket = first 2 nibbles, rho = leading zeros of the next
    48 bits + 1), so Spark and DuckDB materialize bit-identical
    sketches and the HASH compare covers the whole estimator —
    registers, raw estimate, and the small-range linear-counting
    correction — not just plumbing.

    Scale design: the only full-width work is ONE distinct on
    (event_type, user_id) — map-side partial dedup, one shuffle; the
    sketch itself is 256 registers per type (mergeable MAX cells, the
    same map-side-combine shape a per-partition/per-day 100 TB rollup
    exploits) and everything downstream is |types|-row arithmetic.
    The exact count for the error column rides the SAME register
    aggregation (per-bucket COUNT(*) summed) — single lineage, one
    scan, no second distinct.

    Determinism: register math is pure integers (generated comparison
    chain, shifted-integer 2^(49-M) sums); the raw estimate is one
    IEEE division C/S of identical doubles; ln() in the linear-count
    branch gets the house 6dp per-term rounding."""
    pairs = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.col("user_id").cast("string").alias("u"))
        .distinct()
    )
    hashed = pairs.select(
        "event_type",
        F.md5(F.col("u")).alias("h"),
    ).select(
        "event_type",
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int").alias("bucket"),
        F.conv(F.substring("h", 3, 12), 16, 10).cast("bigint").alias("w"),
    )
    reg = (
        hashed.select("event_type", "bucket", F.expr(_HLL_RHO_CASE).alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m"), F.count(F.lit(1)).alias("cnt"))
    )
    agg = reg.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_registers"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 49 - m)")).alias("ssum"),
        F.sum("cnt").cast("bigint").alias("exact_users"),
    )
    est = agg.select(
        "event_type",
        "n_registers",
        (F.lit(256) - F.col("n_registers")).cast("int").alias("v_empty"),
        F.expr(
            f"CAST(FLOOR({_HLL_C} / CAST(ssum + CAST(256 - n_registers AS BIGINT)"
            f" * {1 << 49} AS DOUBLE) * 10000) AS BIGINT)"
        ).alias("raw_est_e4"),
        "exact_users",
    ).select(
        "event_type",
        "n_registers",
        "v_empty",
        "raw_est_e4",
        F.expr(
            "CASE WHEN v_empty > 0 AND raw_est_e4 <= 6400000"
            " THEN CAST(FLOOR(256 * ROUND(LN(256.0 / v_empty), 6) * 10000) AS BIGINT)"
            " ELSE raw_est_e4 END"
        ).alias("est_e4"),
        "exact_users",
    )
    return est.select(
        "event_type",
        "n_registers",
        "v_empty",
        "raw_est_e4",
        "est_e4",
        "exact_users",
        F.expr("ABS(est_e4 - exact_users * 10000)").alias("abs_err_e4"),
    ).orderBy("event_type")


EVENTS_HLL_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT event_type, CAST(user_id AS VARCHAR) AS u FROM events
),
hashed AS MATERIALIZED (
  SELECT event_type, md5(u) AS h FROM pairs
),
bits AS (
  SELECT event_type,
         16 * (strpos('0123456789abcdef', substr(h, 1, 1)) - 1)
           + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1) AS bucket,
         {_HLL_W_DUCK} AS w
  FROM hashed
),
reg AS (
  SELECT event_type, bucket, MAX({_HLL_RHO_CASE}) AS m, COUNT(*) AS cnt
  FROM bits GROUP BY 1, 2
),
agg AS (
  SELECT event_type, COUNT(*) AS n_registers,
         SUM(CAST(1 AS BIGINT) << (49 - m)) AS ssum,
         CAST(SUM(cnt) AS BIGINT) AS exact_users
  FROM reg GROUP BY 1
),
est AS (
  SELECT event_type, n_registers,
         CAST(256 - n_registers AS INTEGER) AS v_empty,
         CAST(FLOOR({_HLL_C} / CAST(ssum + CAST(256 - n_registers AS BIGINT)
                    * {1 << 49} AS DOUBLE) * 10000) AS BIGINT) AS raw_est_e4,
         exact_users
  FROM agg
),
fin AS (
  SELECT event_type, n_registers, v_empty, raw_est_e4,
         CASE WHEN v_empty > 0 AND raw_est_e4 <= 6400000
              THEN CAST(FLOOR(256 * ROUND(LN(256.0 / v_empty), 6) * 10000) AS BIGINT)
              ELSE raw_est_e4 END AS est_e4,
         exact_users
  FROM est
)
SELECT event_type, n_registers, v_empty, raw_est_e4, est_e4,
       exact_users, ABS(est_e4 - exact_users * 10000) AS abs_err_e4
FROM fin
ORDER BY event_type
"""

QUERIES["events_hll_distinct"] = events_hll_distinct
ORACLE["events_hll_distinct"] = EVENTS_HLL_SQL


# ---------------------------------------------------------------------------
# events_circular_stats — circular time-of-day statistics per type
# ---------------------------------------------------------------------------

_TWO_PI = repr(6.283185307179586)
_DAY_US = 86_400_000_000


def events_circular_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Circular (directional) statistics of the time-of-day each
    event type fires: mean direction (as a mean second-of-day),
    mean resultant length R, and the Rayleigh uniformity statistic
    z = nR² — the correct way to average clock times, where the
    arithmetic mean of 23:50 and 00:10 is 12:00 but the circular
    mean is midnight (Fisher, Statistical Analysis of Circular Data,
    §2.3). Events here are near-uniform over the day, so R ~ 0 and
    z stays small — a peaked type would stand out.

    Determinism: the angle is exact integer µs-of-day scaled by one
    shared 2π literal; cos/sin get the house 6dp PER-TERM rounding
    and sum as exact BIGINT e6 integers, so C and S are
    engine-identical; R/z/mean-angle are IEEE chains over those
    exact integers, emitted via FLOOR (bit-deterministic) and
    one-shot 6dp rounds of smooth atan2 values.

    Scale: one map-side projection + one groupBy(event_type) — a
    5-row aggregate; nothing else shuffles."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_micros("ts") % _DAY_US).alias("us_day"),
    )
    terms = e.select(
        "event_type",
        F.expr(
            f"CAST(ROUND(COS({_TWO_PI} * us_day / {_DAY_US}) * 1000000, 0) AS BIGINT)"
        ).alias("c_e6"),
        F.expr(
            f"CAST(ROUND(SIN({_TWO_PI} * us_day / {_DAY_US}) * 1000000, 0) AS BIGINT)"
        ).alias("s_e6"),
    )
    agg = terms.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("c_e6").alias("c_sum_e6"),
        F.sum("s_e6").alias("s_sum_e6"),
    )
    return agg.select(
        "event_type",
        "n",
        F.expr(
            "CAST(FLOOR(SQRT(CAST(c_sum_e6 AS DOUBLE) * c_sum_e6"
            " + CAST(s_sum_e6 AS DOUBLE) * s_sum_e6) / n) AS BIGINT)"
        ).alias("r_e6"),
        F.expr(
            "CAST(FLOOR(SQRT(CAST(c_sum_e6 AS DOUBLE) * c_sum_e6"
            " + CAST(s_sum_e6 AS DOUBLE) * s_sum_e6)"
            " * SQRT(CAST(c_sum_e6 AS DOUBLE) * c_sum_e6"
            " + CAST(s_sum_e6 AS DOUBLE) * s_sum_e6)"
            " / (CAST(n AS DOUBLE) * 1000000000000)) AS BIGINT)"
        ).alias("rayleigh_z_e0"),
        F.expr(
            f"ROUND(ATAN2(CAST(s_sum_e6 AS DOUBLE), CAST(c_sum_e6 AS DOUBLE)), 6)"
        ).alias("mean_angle_rad"),
    ).orderBy("event_type")


EVENTS_CIRCULAR_SQL = f"""
WITH terms AS (
  SELECT event_type,
         CAST(ROUND(COS({_TWO_PI} * (epoch_us(ts) % {_DAY_US}) / {_DAY_US})
                    * 1000000, 0) AS BIGINT) AS c_e6,
         CAST(ROUND(SIN({_TWO_PI} * (epoch_us(ts) % {_DAY_US}) / {_DAY_US})
                    * 1000000, 0) AS BIGINT) AS s_e6
  FROM events
),
agg AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c_e6) AS BIGINT) AS c_sum_e6,
         CAST(SUM(s_e6) AS BIGINT) AS s_sum_e6
  FROM terms GROUP BY 1
)
SELECT event_type, n,
       CAST(FLOOR(SQRT(CAST(c_sum_e6 AS DOUBLE) * c_sum_e6
                       + CAST(s_sum_e6 AS DOUBLE) * s_sum_e6) / n) AS BIGINT) AS r_e6,
       CAST(FLOOR(SQRT(CAST(c_sum_e6 AS DOUBLE) * c_sum_e6
                       + CAST(s_sum_e6 AS DOUBLE) * s_sum_e6)
                  * SQRT(CAST(c_sum_e6 AS DOUBLE) * c_sum_e6
                         + CAST(s_sum_e6 AS DOUBLE) * s_sum_e6)
                  / (CAST(n AS DOUBLE) * 1000000000000)) AS BIGINT) AS rayleigh_z_e0,
       ROUND(ATAN2(CAST(s_sum_e6 AS DOUBLE), CAST(c_sum_e6 AS DOUBLE)), 6)
         AS mean_angle_rad
FROM agg ORDER BY event_type
"""

QUERIES["events_circular_stats"] = events_circular_stats
ORACLE["events_circular_stats"] = EVENTS_CIRCULAR_SQL


# ---------------------------------------------------------------------------
# events_entropy_rate — Markov entropy rate of per-user type transitions
# ---------------------------------------------------------------------------


def events_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy rate of the per-user event-type Markov chain: for each
    from-state i the conditional next-step entropy
    H_i = -sum_j p(j|i) ln p(j|i), plus i's empirical weight in the
    transition stream — the summary that says how PREDICTABLE the
    next event is given the current one (H ~ ln 5 = perfectly
    random; H ~ 0 = deterministic funnels). Complements
    ``events_markov_baseline`` (the matrix itself) and
    ``events_type_pmi`` (pairwise association) with the
    information-rate rollup.

    Determinism: cell probabilities are IEEE divisions of exact
    integer counts; each p·ln(p) term gets the house 6dp per-term
    rounding and the per-state sum is an exact e6 BIGINT; weights
    are integer ppm via DIV.

    Scale: ONE shuffle on user_id for the lag pairs (the same
    sessionize partitioning), then a |types|^2-cell aggregate —
    everything after the pair count is 25-row arithmetic."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    pairs = e.select(
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    cells = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("c_ij")
    )
    rows = cells.select(
        "from_type",
        "to_type",
        "c_ij",
        F.sum("c_ij").over(Window.partitionBy("from_type")).alias("c_i"),
        F.sum("c_ij").over(Window.partitionBy(F.lit(1))).alias("n_total"),
    )
    terms = rows.select(
        "from_type",
        "c_i",
        "n_total",
        F.expr(
            "CAST(ROUND(-(CAST(c_ij AS DOUBLE) / c_i)"
            " * LN(CAST(c_ij AS DOUBLE) / c_i) * 1000000, 0) AS BIGINT)"
        ).alias("t_e6"),
    )
    return (
        terms.groupBy("from_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dest_types"),
            F.max("c_i").cast("bigint").alias("n_out"),
            F.sum("t_e6").cast("bigint").alias("cond_entropy_e6"),
            F.expr("CAST(MAX(c_i) * 1000000 DIV MAX(n_total) AS BIGINT)").alias(
                "weight_ppm"
            ),
        )
        .orderBy("from_type")
    )


EVENTS_ENTROPY_RATE_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS from_type
  FROM events
),
cells AS (
  SELECT from_type, event_type AS to_type, COUNT(*) AS c_ij
  FROM seq WHERE from_type IS NOT NULL GROUP BY 1, 2
),
rows_ AS (
  SELECT from_type, c_ij,
         SUM(c_ij) OVER (PARTITION BY from_type) AS c_i,
         SUM(c_ij) OVER () AS n_total
  FROM cells
),
terms AS (
  SELECT from_type, c_i, n_total,
         CAST(ROUND(-(CAST(c_ij AS DOUBLE) / c_i)
              * LN(CAST(c_ij AS DOUBLE) / c_i) * 1000000, 0) AS BIGINT) AS t_e6
  FROM rows_
)
SELECT from_type,
       CAST(COUNT(*) AS BIGINT) AS n_dest_types,
       CAST(MAX(c_i) AS BIGINT) AS n_out,
       CAST(SUM(t_e6) AS BIGINT) AS cond_entropy_e6,
       CAST(MAX(c_i) * 1000000 // MAX(n_total) AS BIGINT) AS weight_ppm
FROM terms GROUP BY 1 ORDER BY 1
"""

QUERIES["events_entropy_rate"] = events_entropy_rate
ORACLE["events_entropy_rate"] = EVENTS_ENTROPY_RATE_SQL


def _hex12_int(h: str) -> str:
    """Engine-portable 12-hex-nibble → BIGINT expression (ANSI
    `position(c IN alphabet)`, valid in both Spark SQL and DuckDB) —
    the KMV hash value in [0, 16^12)."""
    terms = [
        f"CAST(position(substr({h}, {i + 1}, 1) IN '0123456789abcdef') - 1 AS BIGINT)"
        + (f" * {16 ** (11 - i)}" if i < 11 else "")
        for i in range(12)
    ]
    return "(" + " + ".join(terms) + ")"


_THETA_K = 64
# shared post-hash fragment: runs over a `bireme_theta_hashes(event_type, h)`
# relation — Spark materializes it ONCE (eager localCheckpoint: six
# downstream references otherwise re-scan the raw stream per branch;
# interleaved min-of-3 at sf0.1: 2.25s plain vs 1.83s checkpointed,
# value-identical), the oracle builds it as a CTE.
_THETA_SETS_SQL = f"""
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rnk,
         COUNT(*) OVER (PARTITION BY event_type) AS nd
  FROM bireme_theta_hashes
),
pair_u AS (
  SELECT DISTINCT h FROM bireme_theta_hashes WHERE event_type IN ('click', 'view')
),
pair_ranked AS (
  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rnk, COUNT(*) OVER () AS nd
  FROM pair_u
),
pair_i AS (
  SELECT h FROM bireme_theta_hashes WHERE event_type IN ('click', 'view')
  GROUP BY h HAVING COUNT(*) = 2
),
per_type AS (
  SELECT event_type AS set_name,
         CAST(MAX(nd) AS BIGINT) AS n_exact,
         CASE WHEN MAX(nd) <= {_THETA_K} THEN CAST(MAX(nd) AS DOUBLE)
              ELSE ({_THETA_K} - 1)
                   / (MAX(CASE WHEN rnk = {_THETA_K}
                          THEN {_hex12_int('h')} END) / 281474976710656.0)
         END AS kmv_estimate
  FROM ranked GROUP BY event_type
),
union_row AS (
  SELECT 'click_union_view' AS set_name,
         CAST(MAX(nd) AS BIGINT) AS n_exact,
         CASE WHEN MAX(nd) <= {_THETA_K} THEN CAST(MAX(nd) AS DOUBLE)
              ELSE ({_THETA_K} - 1)
                   / (MAX(CASE WHEN rnk = {_THETA_K}
                          THEN {_hex12_int('h')} END) / 281474976710656.0)
         END AS kmv_estimate
  FROM pair_ranked
),
inter_row AS (
  -- KMV intersection: rho = |union-sketch entries in both sets| over
  -- the union sketch's ACTUAL size LEAST(k, nd) — when the union is
  -- small-set exact (nd < k) the sketch holds only nd entries and
  -- dividing by k would underestimate by nd/k (r8 ADVICE);
  -- estimate = rho * union-estimate (Beyer et al. 2007)
  SELECT 'click_intersect_view' AS set_name,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM pair_i) AS n_exact,
         ((SELECT CAST(COUNT(*) AS DOUBLE) FROM pair_ranked pr
           WHERE pr.rnk <= {_THETA_K}
             AND pr.h IN (SELECT h FROM pair_i))
          / (SELECT LEAST({_THETA_K}, MAX(nd)) FROM pair_ranked))
         * (SELECT kmv_estimate FROM union_row) AS kmv_estimate
)
SELECT set_name, n_exact, kmv_estimate FROM per_type
UNION ALL SELECT * FROM union_row
UNION ALL SELECT * FROM inter_row
ORDER BY set_name
"""


def events_theta_sketch_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/KMV sketch set algebra over per-type (user, active-day)
    sets: bottom-k (k=64) sketches per event type with the classic
    (k−1)/θ distinct estimate, plus sketch UNION (k smallest of the
    merged stream) and INTERSECTION (ρ·union, ρ = fraction of the
    union sketch present in both operands — Beyer et al. 2007, the
    set-operation family Apache DataSketches' theta sketch serves).
    Exact counts ride along so the estimate error is auditable.

    Engine-exact: md5 hex STRINGS are the sketch order (fixed-width
    lowercase hex — lexicographic == numeric, the portable MinHash
    trick); only the k-th value converts to an integer (generated
    nibble expression, ANSI `position` in both engines) and the
    estimate is two IEEE divisions in identical shape. Small sets
    (n ≤ k) take the exact linear branch.

    Scale: the sketch is ONE rank window per type over the distinct
    (type, user, day) stream — the same shuffle the exact count
    needs; everything after runs on ≤ k rows per set. At 100 TB the
    distinct-collapse is the map-side-combined heavy stage and the
    sketch add is free riding on it."""
    e = load_table(spark, sf_dir, "events")
    bireme_theta_hashes = (
        e.select(
            "event_type",
            F.expr(
                "substr(md5(CAST(user_id AS STRING) || ':'"
                " || date_format(ts, 'yyyy-MM-dd')), 1, 12)"
            ).alias("h"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    bireme_theta_hashes.createOrReplaceTempView("bireme_theta_hashes")
    return spark.sql("WITH " + _THETA_SETS_SQL)


EVENTS_THETA_SKETCH_SQL = f"""
WITH bireme_theta_hashes AS (
  SELECT DISTINCT event_type,
         substr(md5(CAST(user_id AS STRING) || ':'
                    || strftime(ts, '%Y-%m-%d')), 1, 12) AS h
  FROM events
),
{_THETA_SETS_SQL}
"""

QUERIES["events_theta_sketch_ops"] = events_theta_sketch_ops
ORACLE["events_theta_sketch_ops"] = EVENTS_THETA_SKETCH_SQL


# shared post-grid fragment over an `bireme_te_hours(bucket, x, y)` relation —
# Spark checkpoints the tiny grid once (the downstream window/pair
# branches re-scanned the raw stream 8x otherwise; interleaved
# min-of-3 at sf0.1: 1.23s plain vs 1.06s checkpointed).
_TE_SHARED_SQL = """
tot AS (
  SELECT SUM(x) AS sx, SUM(y) AS sy, COUNT(*) AS nb FROM bireme_te_hours
),
bin AS (
  -- binary state: strictly above the mean rate (exact integer
  -- compare c*nb > total — no rational mean materialized)
  SELECT bucket,
         CAST(x * nb > sx AS INT) AS xb,
         CAST(y * nb > sy AS INT) AS yb,
         ROW_NUMBER() OVER (ORDER BY bucket) AS rn
  FROM bireme_te_hours CROSS JOIN tot
),
dirs AS (
  SELECT 'x_to_y' AS dir, cur.yb AS s1, prev.yb AS s0, prev.xb AS e0
  FROM bin cur JOIN bin prev ON cur.rn = prev.rn + 1
  UNION ALL
  SELECT 'y_to_x' AS dir, cur.xb AS s1, prev.xb AS s0, prev.yb AS e0
  FROM bin cur JOIN bin prev ON cur.rn = prev.rn + 1
),
cells AS (
  SELECT dir, s1, s0, e0, COUNT(*) AS c FROM dirs GROUP BY dir, s1, s0, e0
),
marg AS (
  SELECT dir, s1, s0, e0, c,
         SUM(c) OVER (PARTITION BY dir, s0, e0) AS c_se,
         SUM(c) OVER (PARTITION BY dir, s1, s0) AS c_ss,
         SUM(c) OVER (PARTITION BY dir, s0) AS c_s0,
         SUM(c) OVER (PARTITION BY dir) AS n
  FROM cells
)
SELECT dir,
       CAST(MAX(n) AS BIGINT) AS n_pairs,
       CAST(SUM(CAST(ROUND((CAST(c AS DOUBLE) / n)
             * LN((CAST(c AS DOUBLE) * c_s0) / (CAST(c_se AS DOUBLE) * c_ss))
             * 1000000, 0) AS BIGINT)) AS BIGINT) AS te_e6
FROM marg GROUP BY dir ORDER BY dir
"""


def events_transfer_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transfer entropy between the click and purchase HOURLY rate
    series, both directions (Schreiber 2000): the binary-state
    (above/below mean rate) plug-in estimator
    TE(X→Y) = Σ p(y₁,y₀,x₀)·ln[p(y₁|y₀,x₀)/p(y₁|y₀)] — the
    DIRECTIONAL sibling of ``events_lag_mutual_information`` (MI is
    symmetric; TE asks which stream predicts the other's next step
    beyond its own history). TE ≥ 0; 0 iff X adds nothing.

    Determinism: binarization is an exact integer compare (c·nb >
    total, no rational mean); all eight cells and their marginals are
    integer counts; each p·ln term takes the house 6dp per-term
    rounding into an exact e6 BIGINT sum (one LN per cell — the
    Markov-marginal window pattern of events_entropy_rate).

    Scale: raw stream → hours-sized grid in one map-side-combined
    agg; pairing is a rank self-join on the tiny grid; cells are ≤ 8
    rows per direction — window-over-cells, never join-back
    (lag-MI A/B lesson)."""
    e = load_table(spark, sf_dir, "events")
    bireme_te_hours = (
        e.where(F.col("event_type").isin("click", "purchase"))
        .select(F.date_format("ts", "yyyy-MM-dd HH").alias("bucket"), "event_type")
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    bireme_te_hours.createOrReplaceTempView("bireme_te_hours")
    return spark.sql("WITH " + _TE_SHARED_SQL)


EVENTS_TRANSFER_ENTROPY_SQL = f"""
WITH hourly AS (
  SELECT strftime(ts, '%Y-%m-%d %H') AS bucket, event_type
  FROM events WHERE event_type IN ('click', 'purchase')
),
bireme_te_hours AS (
  SELECT bucket,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM hourly GROUP BY bucket
),
{_TE_SHARED_SQL}
"""

QUERIES["events_transfer_entropy"] = events_transfer_entropy
ORACLE["events_transfer_entropy"] = EVENTS_TRANSFER_ENTROPY_SQL


def events_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test (1947) on within-user conversion change:
    did users who purchased in the FIRST half of the stream (before
    2024-01-16) keep purchasing in the second half? The paired-binary
    sibling of orders_chi2_independence — independence tests are
    WRONG for before/after on the same users; McNemar conditions on
    the discordant pairs only. Emits the 2×2 concordance cells, the
    χ²₁ statistic (b−c)²/(b+c) and the continuity-corrected variant.

    Engine-exact: the per-user period flags are exact boolean
    aggregations (fixed timestamp literal); all four cells are
    integer counts; each statistic is one IEEE division of integers.

    Scale: ONE user-level aggregation collapses the stream (map-side
    combine); the test is a one-row fold over four integers."""
    e = load_table(spark, sf_dir, "events")
    users = e.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") < F.lit("2024-01-16").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("p1"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("ts") >= F.lit("2024-01-16").cast("timestamp")),
                1,
            ).otherwise(0)
        ).alias("p2"),
    )
    cells = users.agg(
        F.sum(F.expr("CAST(p1 = 1 AND p2 = 1 AS INT)")).cast("bigint").alias("both"),
        F.sum(F.expr("CAST(p1 = 1 AND p2 = 0 AS INT)")).cast("bigint").alias("only_first"),
        F.sum(F.expr("CAST(p1 = 0 AND p2 = 1 AS INT)")).cast("bigint").alias("only_second"),
        F.sum(F.expr("CAST(p1 = 0 AND p2 = 0 AS INT)")).cast("bigint").alias("neither"),
    )
    return cells.select(
        F.col("both").alias("n_both"),
        F.col("only_first").alias("n_only_first"),
        F.col("only_second").alias("n_only_second"),
        F.col("neither").alias("n_neither"),
        F.expr(
            "CAST((only_first - only_second) * (only_first - only_second) AS DOUBLE)"
            " / GREATEST(only_first + only_second, 1)"
        ).alias("chi2"),
        F.expr(
            "CAST((ABS(only_first - only_second) - 1)"
            " * (ABS(only_first - only_second) - 1) AS DOUBLE)"
            " / GREATEST(only_first + only_second, 1)"
        ).alias("chi2_cc"),
    )


EVENTS_MCNEMAR_SQL = """
WITH users AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase'
                   AND ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS p1,
         MAX(CASE WHEN event_type = 'purchase'
                   AND ts >= TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS p2
  FROM events GROUP BY user_id
),
cells AS (
  SELECT CAST(SUM(CASE WHEN p1 = 1 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         CAST(SUM(CASE WHEN p1 = 1 AND p2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_first,
         CAST(SUM(CASE WHEN p1 = 0 AND p2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_only_second,
         CAST(SUM(CASE WHEN p1 = 0 AND p2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
  FROM users
)
SELECT n_both, n_only_first, n_only_second, n_neither,
       CAST((n_only_first - n_only_second) * (n_only_first - n_only_second)
            AS DOUBLE) / GREATEST(n_only_first + n_only_second, 1) AS chi2,
       CAST((ABS(n_only_first - n_only_second) - 1)
            * (ABS(n_only_first - n_only_second) - 1)
            AS DOUBLE) / GREATEST(n_only_first + n_only_second, 1) AS chi2_cc
FROM cells
"""

QUERIES["events_mcnemar_test"] = events_mcnemar_test
ORACLE["events_mcnemar_test"] = EVENTS_MCNEMAR_SQL


_DOWNTIME_GAP_US = 60_000_000  # 60s of silence = an outage


def events_downtime_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream downtime report: silent intervals longer than 60s in
    the event stream (the monitoring view an ops team keeps on a CDC
    ingest — a silent source is indistinguishable from a healthy
    idle one WITHOUT this). Emits the top-10 longest outages with
    start/end and a summary row (total outages, total silent time).

    Engine-exact: pure integer µs arithmetic on unix_micros (the
    sub-second truncation trap — never unix_timestamp); interval
    bounds emit as formatted strings (the DATE-round-trip rule).

    Scale: ONE global lag over event time — legitimately a single
    total order (the stream clock is one series); at 100 TB the same
    report runs per source/partition key with partitionBy added."""
    e = load_table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.orderBy("us", "event_id")
    gaps = e.select(
        F.lag("us").over(w).alias("prev_us"), F.col("us").alias("cur_us")
    ).where(
        F.col("prev_us").isNotNull()
        & (F.col("cur_us") - F.col("prev_us") > _DOWNTIME_GAP_US)
    )
    top = gaps.select(
        F.date_format(F.timestamp_micros("prev_us"), "yyyy-MM-dd HH:mm:ss").alias(
            "outage_start"
        ),
        F.date_format(F.timestamp_micros("cur_us"), "yyyy-MM-dd HH:mm:ss").alias(
            "outage_end"
        ),
        (F.col("cur_us") - F.col("prev_us")).alias("gap_us"),
    ).orderBy(F.desc("gap_us"), "outage_start").limit(10)
    summary = gaps.agg(
        F.lit("TOTAL").alias("outage_start"),
        F.lit("").alias("outage_end"),
        F.sum(F.col("cur_us") - F.col("prev_us")).cast("bigint").alias("gap_us"),
    )
    return top.unionByName(summary).orderBy(F.desc("gap_us"), "outage_start")


EVENTS_DOWNTIME_SQL = f"""
WITH e AS (
  SELECT epoch_us(ts) AS us, event_id FROM events
),
gaps AS (
  SELECT LAG(us) OVER (ORDER BY us, event_id) AS prev_us, us AS cur_us
  FROM e
  QUALIFY prev_us IS NOT NULL AND cur_us - prev_us > {_DOWNTIME_GAP_US}
),
top AS (
  SELECT strftime(make_timestamp(prev_us), '%Y-%m-%d %H:%M:%S') AS outage_start,
         strftime(make_timestamp(cur_us), '%Y-%m-%d %H:%M:%S') AS outage_end,
         cur_us - prev_us AS gap_us
  FROM gaps ORDER BY gap_us DESC, outage_start LIMIT 10
)
SELECT * FROM top
UNION ALL
SELECT 'TOTAL', '', CAST(SUM(cur_us - prev_us) AS BIGINT) FROM gaps
ORDER BY gap_us DESC, outage_start
"""

QUERIES["events_downtime_report"] = events_downtime_report
ORACLE["events_downtime_report"] = EVENTS_DOWNTIME_SQL


def events_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar seasonality strength of the event stream (the FPP
    strength-of-seasonality measure, one row per cycle): how much of
    the hourly-count variance do hour-of-day and day-of-week explain?
    Strength = 1 − SSW/SST over the calendar bins plus the peak bin
    and the integer-ppm amplitude — the quick answer to "is this
    stream diurnal or weekly" before fitting anything heavier.

    Engine-exact: hour-of-day and day-of-week come from pure integer
    µs arithmetic ((us MOD day) DIV hour; (days + 4) MOD 7 — NEVER
    the engines' dayofweek, whose origin differs); per-bin S²/n
    quantizes as integer DIV (order-independent — the r6 double-fold
    lesson); peak bins compare integer-ppm means with min-bin ties.

    Scale: one hourly aggregation, then bin-sized arithmetic."""
    e = load_table(spark, sf_dir, "events").select(F.unix_micros("ts").alias("us"))
    hours = e.groupBy(F.expr("us DIV 3600000000").alias("h")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    binned = hours.select(
        "cnt",
        F.expr("CAST(h % 24 AS BIGINT)").alias("hod"),
        F.expr("CAST((h DIV 24 + 4) % 7 AS BIGINT)").alias("dow"),
    )
    out = []
    for comp, col in (("hour_of_day", "hod"), ("day_of_week", "dow")):
        per = binned.groupBy(col).agg(
            F.count(F.lit(1)).alias("nj"),
            F.sum("cnt").alias("sj"),
        )
        tot = binned.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cnt").alias("s"),
            F.sum(F.expr("CAST(cnt AS BIGINT) * cnt")).alias("q"),
        )
        b = per.agg(
            F.count(F.lit(1)).alias("n_bins"),
            F.sum(F.expr("CAST(sj AS BIGINT) * sj DIV nj")).alias("b"),
            F.max(F.expr(f"struct(sj * 1000000 DIV nj AS m, -{col} AS negk)")).alias(
                "pk"
            ),
        )
        sst = "(CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)"
        ssb = "(CAST(b AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)"
        out.append(
            tot.crossJoin(b).select(
                F.lit(comp).alias("component"),
                F.col("n_bins").cast("bigint").alias("n_bins"),
                F.expr(f"GREATEST({ssb} / {sst}, 0.0)").alias("strength"),
                F.expr("CAST(-pk.negk AS BIGINT)").alias("peak_bin"),
                F.expr("CAST(pk.m AS BIGINT)").alias("peak_mean_ppm"),
            )
        )
    return out[0].unionByName(out[1]).orderBy("component")


def _seasonality_sql() -> str:
    parts = []
    for comp, col in (("hour_of_day", "hod"), ("day_of_week", "dow")):
        parts.append(f"""
SELECT '{comp}' AS component,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT DISTINCT {col} FROM binned) z)
         AS n_bins,
       GREATEST(
         ((SELECT CAST(SUM(CAST(sj AS BIGINT) * sj // nj) AS BIGINT)
           FROM (SELECT {col}, COUNT(*) AS nj, SUM(cnt) AS sj
                 FROM binned GROUP BY {col}) p)
          - CAST((SELECT SUM(cnt) FROM binned) AS DOUBLE)
            * (SELECT SUM(cnt) FROM binned) / (SELECT COUNT(*) FROM binned))
         / (CAST((SELECT SUM(CAST(cnt AS BIGINT) * cnt) FROM binned) AS DOUBLE)
            - CAST((SELECT SUM(cnt) FROM binned) AS DOUBLE)
              * (SELECT SUM(cnt) FROM binned) / (SELECT COUNT(*) FROM binned)),
         0.0) AS strength,
       (SELECT CAST({col} AS BIGINT)
        FROM (SELECT {col}, SUM(cnt) * 1000000 // COUNT(*) AS m
              FROM binned GROUP BY {col}) p
        ORDER BY m DESC, {col} LIMIT 1) AS peak_bin,
       (SELECT CAST(m AS BIGINT)
        FROM (SELECT {col}, SUM(cnt) * 1000000 // COUNT(*) AS m
              FROM binned GROUP BY {col}) p
        ORDER BY m DESC, {col} LIMIT 1) AS peak_mean_ppm""")
    return """
WITH e AS (SELECT epoch_us(ts) AS us FROM events),
hours AS (SELECT us // 3600000000 AS h, COUNT(*) AS cnt FROM e GROUP BY 1),
binned AS MATERIALIZED (
  SELECT cnt, CAST(h % 24 AS BIGINT) AS hod,
         CAST((h // 24 + 4) % 7 AS BIGINT) AS dow
  FROM hours
)
""" + "\nUNION ALL\n".join(parts) + "\nORDER BY component"


QUERIES["events_seasonality_strength"] = events_seasonality_strength
ORACLE["events_seasonality_strength"] = _seasonality_sql()


def events_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROC AUC of `value` as a purchase classifier — THE evaluation
    primitive every model-assisted curation loop needs server-side
    (quality classifiers, dedup scorers, rerankers): does a higher
    event value really rank purchase events above the rest? AUC via
    the rank-sum identity AUC = (R₊ − n₊(n₊+1)/2)/(n₊·n₋) with exact
    midrank tie handling — the probabilistic Mann–Whitney reading.

    Engine-exact: values histogram to integer e6 cells; DOUBLED
    midranks (2·cum + cnt + 1) keep tie averaging integral (the
    Kruskal–Wallis machinery); the doubled positive rank sum is an
    exact BIGINT and AUC is one IEEE expression. Also emits the
    Gini coefficient 2·AUC − 1.

    Scale: one value→(count, positive-count) histogram aggregation;
    the CDF runs RANGE-PARTITIONED over histogram cells (two-pass
    rank): cells group into fixed-width value buckets, per-bucket
    totals prefix-sum on the tiny bucket table, and the within-bucket
    cumulative window is partitioned by bucket — so CONTINUOUS scores
    (cells ≈ rows) never funnel through a single-task global window;
    bucket count is domain/width, independent of n. No per-row
    ranking anywhere."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(ROUND(value * 1000000, 0) AS BIGINT)").alias("v"),
        (F.col("event_type") == "purchase").cast("int").alias("pos"),
    )
    hist = e.groupBy("v").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("cp")
    ).withColumn("bkt", F.expr("v DIV 1048576"))
    # pass 1: per-bucket totals, prefix-summed on the bucket table
    # (STRICTLY-PRECEDING buckets via a ROWS frame — exact integers)
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        hist.groupBy("bkt")
        .agg(F.sum("c").alias("bc"))
        .select("bkt", F.coalesce(F.sum("bc").over(wb), F.lit(0)).alias("off"))
    )
    # pass 2: within-bucket cumulative, partitioned by bucket
    wv = Window.partitionBy("bkt").orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = hist.join(F.broadcast(offsets), "bkt").select(
        "c",
        "cp",
        (
            F.lit(2)
            * (F.col("off") + F.coalesce(F.sum("c").over(wv), F.lit(0)))
            + F.col("c")
            + 1
        ).alias("r2"),
    )
    agg = ranked.agg(
        F.sum("c").alias("n"),
        F.sum("cp").alias("np"),
        F.sum(F.expr("CAST(r2 AS BIGINT) * cp")).alias("rp2"),
    )
    auc = (
        "(CAST(rp2 AS DOUBLE) / 2 - CAST(np AS DOUBLE) * (np + 1) / 2)"
        " / (CAST(np AS DOUBLE) * (n - np))"
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_events"),
        F.col("np").cast("bigint").alias("n_positive"),
        F.expr(auc).alias("auc"),
        F.expr(f"2 * ({auc}) - 1").alias("gini"),
    )


EVENTS_ROC_AUC_SQL = """
WITH e AS (
  SELECT CAST(ROUND(value * 1000000, 0) AS BIGINT) AS v,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
),
hist AS (
  SELECT v, COUNT(*) AS c, SUM(pos) AS cp FROM e GROUP BY 1
),
ranked AS (
  SELECT c, cp,
         2 * COALESCE(SUM(c) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + c + 1 AS r2
  FROM hist
),
agg AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(SUM(cp) AS BIGINT) AS np,
         CAST(SUM(CAST(r2 AS BIGINT) * cp) AS BIGINT) AS rp2
  FROM ranked
)
SELECT n AS n_events, np AS n_positive,
       (CAST(rp2 AS DOUBLE) / 2 - CAST(np AS DOUBLE) * (np + 1) / 2)
       / (CAST(np AS DOUBLE) * (n - np)) AS auc,
       2 * ((CAST(rp2 AS DOUBLE) / 2 - CAST(np AS DOUBLE) * (np + 1) / 2)
            / (CAST(np AS DOUBLE) * (n - np))) - 1 AS gini
FROM agg
"""

QUERIES["events_roc_auc"] = events_roc_auc
ORACLE["events_roc_auc"] = EVENTS_ROC_AUC_SQL


def events_stickiness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU stickiness per calendar month — THE product-engagement
    ratio (what fraction of a month's actives show up on an average
    day): avg daily distinct users over monthly distinct users.

    Engine-exact: both numerators are exact integer distinct counts
    (dau_total = Σ over days of |distinct users that day|); the ratio
    is ONE IEEE division of exact BIGINTs, rounded 6dp.

    Scale: one (day, user) distinct collapse feeds BOTH counts (the
    month rollup re-aggregates the day grain — no second pass over
    raw events); distinct-user-per-month is the only other shuffle,
    map-side combined."""
    e = load_table(spark, sf_dir, "events")
    du = e.select(
        F.date_format("ts", "yyyy-MM").alias("month"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        "user_id",
    ).distinct()
    daily = du.groupBy("month", "day").agg(F.count(F.lit(1)).alias("dau"))
    per_month = daily.groupBy("month").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("dau").cast("bigint").alias("dau_total"),
    )
    mau = du.groupBy("month").agg(
        F.countDistinct("user_id").cast("bigint").alias("mau")
    )
    return (
        per_month.join(mau, "month")
        .select(
            "month",
            "n_days",
            "dau_total",
            "mau",
            F.round(
                F.col("dau_total").cast("double")
                / (F.col("n_days") * F.col("mau")).cast("double"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("month")
    )


EVENTS_STICKINESS_SQL = """
WITH du AS (
  SELECT DISTINCT strftime(ts, '%Y-%m') AS month,
         strftime(ts, '%Y-%m-%d') AS day, user_id
  FROM events
),
daily AS (SELECT month, day, COUNT(*) AS dau FROM du GROUP BY 1, 2),
pm AS (
  SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(dau) AS BIGINT) AS dau_total
  FROM daily GROUP BY 1
),
mau AS (
  SELECT month, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau FROM du GROUP BY 1
)
SELECT pm.month, pm.n_days, pm.dau_total, mau.mau,
       ROUND(CAST(pm.dau_total AS DOUBLE)
             / CAST(pm.n_days * mau.mau AS DOUBLE), 6) AS stickiness
FROM pm JOIN mau ON mau.month = pm.month
ORDER BY pm.month
"""

QUERIES["events_stickiness_ratio"] = events_stickiness_ratio
ORACLE["events_stickiness_ratio"] = EVENTS_STICKINESS_SQL


_ABSORB_H = 8  # finite horizon: absorption probability within h steps


def _absorb_levels_sql() -> str:
    """h1..h8 chained CTEs (AS MATERIALIZED — each level is referenced
    by the next level AND the final union; without materialization the
    chain re-executes 2^h times, the kcenter lesson)."""
    lvls = []
    prev = None
    for h in range(1, _ABSORB_H + 1):
        if prev is None:
            body = "SELECT src AS state, r1e6 // n AS p FROM basis"
        else:
            body = f"""
  SELECT b.src AS state,
         (b.r1e6 + COALESCE(SUM(c.cnt * p.p), 0)) // b.n AS p
  FROM basis b
  LEFT JOIN cells c ON c.src = b.src
  LEFT JOIN {prev} p ON p.state = c.dst
  GROUP BY b.src, b.r1e6, b.n"""
        lvls.append(f"h{h} AS MATERIALIZED ({body})")
        prev = f"h{h}"
    union = "\nUNION ALL ".join(
        f"SELECT state, {h} AS horizon, CAST(p AS BIGINT) AS p_absorb_ppm FROM h{h}"
        for h in range(1, _ABSORB_H + 1)
    )
    return ",\n".join(lvls) + f"\nSELECT * FROM ({union}) ORDER BY state, horizon"


def events_absorption_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Absorbing-Markov-chain absorption profile: for every
    non-purchase event type, the probability the NEXT h user steps
    reach 'purchase' (h = 1..8) — the finite-horizon fundamental-
    matrix read (Kemeny & Snell 1960) behind "how convertible is a
    user currently in state X", complementing events_transition_matrix
    (one-step) and events_user_paths (raw paths).

    Engine-exact: the empirical chain is integer transition counts;
    the iteration p_{h+1}(i) = (r_i·10⁶ + Σ_j c_ij·p_h(j)) DIV n_i is
    pure BIGINT with ONE truncating division per state per level
    (monotone non-decreasing in h; Σ_j c_ij·p_h(j) ≤ n_i·10⁶ — no
    overflow at any SF). States with no observed outgoing transition
    report 0 (no evidence). The Spark side folds the model-sized
    (|types|² ≤ 25-cell) count matrix in exact Python ints — the
    house state-sized-sequential-fold rule (recursive-CTE planning
    costs ~2s/level on Spark); DuckDB chains h-level MATERIALIZED
    CTEs over the same integers.

    Scale: ONE (user-key) shuffle builds transitions; everything
    after runs on the |types|²-cell model. The collect is the model,
    never rows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("nxt", F.lead("event_type").over(w))
        .where(F.col("nxt").isNotNull() & (F.col("event_type") != "purchase"))
    )
    cells = {
        (r["event_type"], r["nxt"]): r["cnt"]
        for r in trans.groupBy("event_type", "nxt")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    states = sorted(
        {r["event_type"] for r in e.select("event_type").distinct().collect()}
        - {"purchase"}
    )
    n = {s: sum(c for (src, _), c in cells.items() if src == s) for s in states}
    r = {s: cells.get((s, "purchase"), 0) for s in states}
    q = {
        s: {d: c for (src, d), c in cells.items() if src == s and d != "purchase"}
        for s in states
    }
    p = {s: 0 for s in states}
    rows = []
    for h in range(1, _ABSORB_H + 1):
        p = {
            s: (
                (r[s] * 1_000_000 + sum(c * p.get(d, 0) for d, c in q[s].items()))
                // n[s]
                if n[s]
                else 0
            )
            for s in states
        }
        rows.extend((s, h, p[s]) for s in states)
    return spark.createDataFrame(
        sorted(rows), "state string, horizon int, p_absorb_ppm bigint"
    ).orderBy("state", "horizon")


EVENTS_ABSORPTION_SQL = f"""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events
),
cells AS (
  SELECT event_type AS src, nxt AS dst, COUNT(*) AS cnt
  FROM seq WHERE nxt IS NOT NULL AND event_type <> 'purchase'
  GROUP BY 1, 2
),
st AS (SELECT DISTINCT event_type AS src FROM events WHERE event_type <> 'purchase'),
basis AS (
  -- n guarded to 1: a state with no observed outgoing transition has
  -- r1e6 = 0 and an empty Q row, so every level reports exactly 0
  SELECT st.src,
         GREATEST(COALESCE(SUM(c.cnt), 0), 1) AS n,
         COALESCE(SUM(CASE WHEN c.dst = 'purchase' THEN c.cnt END), 0) * 1000000
           AS r1e6
  FROM st LEFT JOIN cells c ON c.src = st.src
  GROUP BY st.src
),
cellsq AS (SELECT src, dst, cnt FROM cells WHERE dst <> 'purchase'),
{_absorb_levels_sql()}
"""

# the generated levels reference `cells` for Q — point them at cellsq
EVENTS_ABSORPTION_SQL = EVENTS_ABSORPTION_SQL.replace(
    "LEFT JOIN cells c ON c.src = b.src", "LEFT JOIN cellsq c ON c.src = b.src"
)

QUERIES["events_absorption_profile"] = events_absorption_profile
ORACLE["events_absorption_profile"] = EVENTS_ABSORPTION_SQL


def events_fdr_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple-testing anomaly screen with Benjamini–Hochberg FDR
    control (1995): every (event_type, hour-of-day) cell is tested
    against the uniform-rate null λ = type_total/24 via the Chernoff
    upper bound on the Poisson upper tail, p ≤ exp(λ−x)·(λ/x)^{-x}
    (in −log10 form; 0 when x ≤ λ), and BH picks the largest rank k
    with p_(k) ≤ α·k/m at α = 0.05 — the report a monitoring stack
    needs when it runs 120 tests at once and per-test α would flood
    it with false alarms. Screening on a valid upper BOUND keeps the
    FDR guarantee conservative.

    Engine-exact: cell counts and type totals are integers; the ONE
    transcendental per cell (ln(x/λ)) rounds 6dp before use (the
    C-vs-Java ulp rule), the −log10 bound and the BH threshold
    log10(20m/i) each round 6dp; every comparison is between
    identically-rounded doubles.

    Scale: one (type, hour) agg collapses the stream; every window
    after runs on the ≤|types|·24-cell table."""
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        "event_type",
        (F.expr("unix_micros(ts) DIV 3600000000") % 24).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("x"))
    wt = Window.partitionBy("event_type")
    wall = Window.partitionBy()
    c = cells.withColumn("tot", F.sum("x").over(wt)).withColumn(
        "m", F.count(F.lit(1)).over(wall)
    )
    lam = F.col("tot").cast("double") / F.lit(24.0)
    t6 = F.round(F.log(F.col("x").cast("double") / lam), 6)
    nl10 = F.when(
        F.col("x").cast("double") <= lam, F.lit(0.0)
    ).otherwise(
        F.round(
            (lam - F.col("x").cast("double") + F.col("x").cast("double") * t6)
            / F.lit(2.302585092994046),
            6,
        )
    )
    scored = c.withColumn("nl10_bound", nl10)
    wr = Window.orderBy(F.desc("nl10_bound"), F.asc("event_type"), F.asc("hr"))
    ranked = scored.withColumn("rank", F.row_number().over(wr)).withColumn(
        "thr",
        F.round(
            F.log10(F.lit(20.0) * F.col("m").cast("double") / F.col("rank").cast("double")),
            6,
        ),
    )
    kstar = ranked.withColumn(
        "kstar",
        F.max(F.when(F.col("nl10_bound") >= F.col("thr"), F.col("rank"))).over(wall),
    )
    return kstar.select(
        "event_type",
        "hr",
        F.col("x").cast("bigint").alias("x"),
        F.round(lam, 6).alias("expected"),
        "nl10_bound",
        "rank",
        F.when(F.col("rank") <= F.coalesce(F.col("kstar"), F.lit(0)), 1)
        .otherwise(0)
        .alias("rejected"),
    ).orderBy("event_type", "hr")


EVENTS_FDR_SQL = """
WITH cells AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hr, COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
c AS (
  SELECT event_type, hr, x,
         SUM(x) OVER (PARTITION BY event_type) AS tot,
         COUNT(*) OVER () AS m
  FROM cells
),
scored AS (
  SELECT event_type, hr, x, tot, m,
         CASE WHEN CAST(x AS DOUBLE) <= CAST(tot AS DOUBLE) / 24.0 THEN 0.0
              ELSE ROUND((CAST(tot AS DOUBLE) / 24.0 - CAST(x AS DOUBLE)
                          + CAST(x AS DOUBLE)
                            * ROUND(ln(CAST(x AS DOUBLE)
                                       / (CAST(tot AS DOUBLE) / 24.0)), 6))
                         / 2.302585092994046, 6)
         END AS nl10_bound
  FROM c
),
ranked AS (
  SELECT *,
         CAST(ROW_NUMBER() OVER (ORDER BY nl10_bound DESC, event_type ASC, hr ASC)
              AS INTEGER) AS rank
  FROM scored
),
thr AS (
  SELECT *,
         ROUND(log10(20.0 * CAST(m AS DOUBLE) / CAST(rank AS DOUBLE)), 6) AS thr
  FROM ranked
),
ks AS (
  SELECT *, MAX(CASE WHEN nl10_bound >= thr THEN rank END) OVER () AS kstar
  FROM thr
)
SELECT event_type, hr, CAST(x AS BIGINT) AS x,
       ROUND(CAST(tot AS DOUBLE) / 24.0, 6) AS expected,
       nl10_bound, rank,
       CASE WHEN rank <= COALESCE(kstar, 0) THEN 1 ELSE 0 END AS rejected
FROM ks
ORDER BY event_type, hr
"""

QUERIES["events_fdr_screen"] = events_fdr_screen
ORACLE["events_fdr_screen"] = EVENTS_FDR_SQL


def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the capacity-planning
    number behind connection pools and autoscaling floors: gap-based
    sessions (30 min, the events_sessionize cut) become ±1 boundary
    events (half-open [start, end): ends apply BEFORE starts at the
    same µs), and the maximum of the running sum within each day is
    the day's peak.

    Scale design: the running sum over ALL boundaries is the textbook
    single-task global window — instead it runs as the house two-pass
    range partition (the events_roc_auc pattern): per-HOUR net deltas
    prefix-sum on the tiny hour table (broadcast back), and the
    within-hour cumulative window partitions by hour. Exact at every
    boundary, no global sort of the boundary stream.

    Engine-exact: all integers; boundary order (t, delta, user) is
    total enough — rows tied on (t, delta) are interchangeable for
    the within-group MAX of partial sums."""
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, "user_id", "ts", 1800, tiebreak_cols=("event_id",))
    sess = s.groupBy("user_id", "session_id").agg(
        F.min(F.expr("unix_micros(ts)")).alias("s_us"),
        F.max(F.expr("unix_micros(ts)")).alias("e_us"),
    )
    bounds = sess.select(
        F.col("s_us").alias("t"), F.lit(1).alias("delta")
    ).unionByName(sess.select(F.col("e_us").alias("t"), F.lit(-1).alias("delta")))
    b = bounds.withColumn("hr", F.expr("t DIV 3600000000"))
    whr = Window.orderBy("hr").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        b.groupBy("hr")
        .agg(F.sum("delta").alias("net"))
        .select("hr", F.coalesce(F.sum("net").over(whr), F.lit(0)).alias("off"))
    )
    wrun = Window.partitionBy("hr").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, 0
    )
    run = b.join(F.broadcast(offsets), "hr").select(
        "t",
        "delta",
        (F.col("off") + F.sum("delta").over(wrun)).alias("running"),
    )
    day = F.expr("date_format(timestamp_micros(t), 'yyyy-MM-dd')")
    return (
        run.groupBy(day.alias("day"))
        .agg(
            F.max("running").cast("bigint").alias("peak_concurrent"),
            F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_sessions_started"),
        )
        .orderBy("day")
    )


EVENTS_PEAK_CONCURRENCY_SQL = """
WITH numbered AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(epoch(ts)) OVER w IS NULL
                   OR epoch(ts) - lag(epoch(ts)) OVER w > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessioned AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_id
  FROM numbered
),
sess AS (
  SELECT user_id, session_id,
         MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
  FROM sessioned GROUP BY 1, 2
),
bounds AS (
  SELECT s_us AS t, 1 AS delta FROM sess
  UNION ALL
  SELECT e_us AS t, -1 AS delta FROM sess
),
run AS (
  SELECT t, delta,
         SUM(delta) OVER (ORDER BY t, delta
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS running
  FROM bounds
)
SELECT strftime(make_timestamp(t), '%Y-%m-%d') AS day,
       CAST(MAX(running) AS BIGINT) AS peak_concurrent,
       CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sessions_started
FROM run GROUP BY 1 ORDER BY 1
"""

QUERIES["events_peak_concurrency"] = events_peak_concurrency
ORACLE["events_peak_concurrency"] = EVENTS_PEAK_CONCURRENCY_SQL


def events_sprt_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's Sequential Probability Ratio Test (1945) over the daily
    purchase-conversion stream — the always-valid sequential monitor
    an experimentation platform runs instead of a fixed-horizon test
    (peeking at a classic test inflates false positives; the SPRT's
    log-likelihood-ratio walk with ln((1−β)/α) boundaries is immune):
    H₀ p = 4% vs H₁ p = 5% purchase share, α = β = 0.05. Emits the
    cumulative LLR per day and the STICKY decision (the first
    boundary crossing freezes the verdict — sequential tests stop).

    Engine-exact: daily (events, purchases) are integers; the two
    log-likelihood increments are e6-rounded constants folded from
    literals (ONE transcendental each, the house rule), so the
    cumulative LLR is an exact BIGINT dot product; boundaries are
    e6 integers; stickiness is a window min over crossing days —
    no recursion anywhere.

    Scale: one day-grain agg (map-side combined); the walk is a
    cumulative window over |days| rows."""
    import math as _math

    p0, p1 = 0.04, 0.05
    l1_e6 = round(_math.log(p1 / p0) * 1e6)  # purchase increment
    l0_e6 = round(_math.log((1 - p1) / (1 - p0)) * 1e6)  # non-purchase
    a_e6 = round(_math.log(0.95 / 0.05) * 1e6)  # accept H1 boundary
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("x"),
    )
    wcum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    walk = daily.withColumn(
        "llr_e6",
        F.sum(
            F.col("x") * F.lit(l1_e6) + (F.col("n") - F.col("x")) * F.lit(l0_e6)
        ).over(wcum).cast("bigint"),
    )
    up = F.when(F.col("llr_e6") >= a_e6, F.col("day"))
    dn = F.when(F.col("llr_e6") <= -a_e6, F.col("day"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    dec = walk.withColumn("d_up", F.min(up).over(wall)).withColumn(
        "d_dn", F.min(dn).over(wall)
    )
    verdict = (
        F.when(
            F.col("d_up").isNotNull()
            & (F.col("d_dn").isNull() | (F.col("d_up") <= F.col("d_dn")))
            & (F.col("day") >= F.col("d_up")),
            "accept_h1",
        )
        .when(
            F.col("d_dn").isNotNull()
            & (F.col("d_up").isNull() | (F.col("d_dn") < F.col("d_up")))
            & (F.col("day") >= F.col("d_dn")),
            "accept_h0",
        )
        .otherwise("continue")
    )
    return dec.select(
        "day",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("x").cast("bigint").alias("n_purchases"),
        "llr_e6",
        verdict.alias("decision"),
    ).orderBy("day")


def _sprt_sql() -> str:
    import math as _math

    p0, p1 = 0.04, 0.05
    l1 = round(_math.log(p1 / p0) * 1e6)
    l0 = round(_math.log((1 - p1) / (1 - p0)) * 1e6)
    a = round(_math.log(0.95 / 0.05) * 1e6)
    return f"""
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1
),
walk AS (
  SELECT day, n, x,
         CAST(SUM(x * {l1} + (n - x) * ({l0})) OVER (
           ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS BIGINT) AS llr_e6
  FROM daily
),
dec AS (
  SELECT *,
         MIN(CASE WHEN llr_e6 >= {a} THEN day END) OVER () AS d_up,
         MIN(CASE WHEN llr_e6 <= -{a} THEN day END) OVER () AS d_dn
  FROM walk
)
SELECT day, CAST(n AS BIGINT) AS n_events, CAST(x AS BIGINT) AS n_purchases,
       llr_e6,
       CASE WHEN d_up IS NOT NULL AND (d_dn IS NULL OR d_up <= d_dn)
                 AND day >= d_up THEN 'accept_h1'
            WHEN d_dn IS NOT NULL AND (d_up IS NULL OR d_dn < d_up)
                 AND day >= d_dn THEN 'accept_h0'
            ELSE 'continue' END AS decision
FROM dec ORDER BY day
"""


QUERIES["events_sprt_monitor"] = events_sprt_monitor
ORACLE["events_sprt_monitor"] = _sprt_sql()


def events_ams_f2_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS "tug-of-war" sketch (Alon–Matias–Szegedy 1996) estimating
    the second frequency moment F2 = Σ_u count_u² of the per-user
    event distribution — the self-join-size / skew statistic a query
    planner or shuffle-skew monitor reads without materializing the
    join. 64 estimators: counter_j = Σ_u sign(j,u)·count_u with
    sign(j,u) = ±1 from the md5(j‖':'‖user) first-nibble parity
    (engine-portable 4-wise-ish hash family); estimate = mean of the
    64 squared counters. Completes the house sketch family (CMS
    point-frequency, HLL/theta/KMV distinct, bottom-k order
    statistics — AMS covers the L2 moment).

    Engine-exact: signs and counters are integers; squares and sums
    ride DECIMAL(38,0) (counter² ~ 1e28 at 100 TB); the estimate and
    the relative error are integer DIVs — zero floating point. The
    absolute property test (not the cross-engine hash, which a shared
    constant bug would fool — the r6 HLL lesson) pins the estimate
    against exact F2.

    Scale: events collapse to the user-grain count FIRST (map-side
    combined), the ×64 estimator fan-out touches only the user table,
    and exact F2 rides the same user-grain frame — the event stream
    is scanned ONCE."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("cnt"))
    per_user = per_user.localCheckpoint(eager=True)  # two consumers: sketch + exact
    exact = per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum(F.expr("CAST(cnt AS DECIMAL(38,0)) * CAST(cnt AS DECIMAL(38,0))"))
        .cast("decimal(38,0)")
        .alias("f2_exact"),
    )
    fan = per_user.select(
        "user_id", "cnt", F.explode(F.sequence(F.lit(0), F.lit(63))).alias("j")
    )
    sgn = F.expr(
        "1 - 2 * (CAST(conv(substring(md5(concat(CAST(j AS STRING), ':',"
        " CAST(user_id AS STRING))), 1, 1), 16, 10) AS INT) % 2)"
    )
    counters = (
        fan.select("j", (sgn * F.col("cnt")).alias("term"))
        .groupBy("j")
        .agg(F.sum("term").cast("decimal(38,0)").alias("c"))
    )
    est = counters.agg(
        F.expr(
            "CAST(SUM(c * c) DIV CAST(64 AS DECIMAL(38,0)) AS DECIMAL(38,0))"
        ).alias("f2_est")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "n_users",
        F.col("f2_exact").cast("bigint").alias("f2_exact"),
        F.col("f2_est").cast("bigint").alias("f2_est"),
        F.expr(
            "CAST(abs(CAST(f2_est AS DECIMAL(38,0)) - f2_exact) * CAST(1000000 AS DECIMAL(38,0))"
            " DIV f2_exact AS BIGINT)"
        ).alias("rel_err_ppm"),
    )


EVENTS_AMS_F2_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1
),
exact AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
         CAST(SUM(CAST(cnt AS HUGEINT) * cnt) AS HUGEINT) AS f2_exact
  FROM per_user
),
fan AS (
  SELECT u.user_id, u.cnt, g.j,
         1 - 2 * ((strpos('0123456789abcdef',
                          substr(md5(concat(CAST(g.j AS VARCHAR), ':',
                                            CAST(u.user_id AS VARCHAR))), 1, 1)) - 1)
                  % 2) AS sgn
  FROM per_user u CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS j) g
),
counters AS (
  SELECT j, CAST(SUM(sgn * cnt) AS HUGEINT) AS c FROM fan GROUP BY 1
),
est AS (
  SELECT CAST(SUM(c * c) // 64 AS HUGEINT) AS f2_est FROM counters
)
SELECT e.n_users,
       CAST(e.f2_exact AS BIGINT) AS f2_exact,
       CAST(s.f2_est AS BIGINT) AS f2_est,
       CAST(abs(s.f2_est - e.f2_exact) * 1000000 // e.f2_exact AS BIGINT) AS rel_err_ppm
FROM est s, exact e
"""

QUERIES["events_ams_f2_sketch"] = events_ams_f2_sketch
ORACLE["events_ams_f2_sketch"] = EVENTS_AMS_F2_SQL


def events_hawkes_declustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-declustering estimate of the Hawkes branching ratio per
    event type — "what fraction of this event stream is self-excited
    follow-on activity vs exogenous arrivals?": an event is an
    IMMIGRANT (cluster head) if its user produced nothing in the
    preceding 60 minutes, else OFFSPRING; branching ratio n̂ = 1 −
    immigrants/N and implied mean cluster size N/immigrants — the
    moment identity E[cluster] = 1/(1−n) every aftershock /
    virality / retry-storm analysis starts from (Hawkes 1971 via the
    standard declustering shortcut, not MLE).

    Engine-exact: the immigrant flag is an integer millisecond lag
    compare inside a per-user window (unix_millis and epoch_ms both
    FLOOR to ms); counts are integers and the two ratios are integer
    ppm DIVs with a GREATEST guard.

    Scale: one window pass partitioned by user (per-user streams are
    short), one type-grain agg — no joins, no global windows."""
    e = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts")
    ann = e.select(
        "event_type",
        (
            F.unix_millis(F.col("ts")) - F.unix_millis(F.lag("ts").over(wu))
        ).alias("gap_ms"),
    )
    flagged = ann.select(
        "event_type",
        F.when(F.col("gap_ms").isNull() | (F.col("gap_ms") > 3_600_000), 1)
        .otherwise(0)
        .alias("immigrant"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("immigrant").cast("bigint").alias("n_immigrants"),
        )
        .select(
            "event_type",
            "n_events",
            "n_immigrants",
            F.expr(
                "CAST((n_events - n_immigrants) * 1000000 DIV n_events AS BIGINT)"
            ).alias("branching_ppm"),
            F.expr(
                "CAST(n_events * 1000000 DIV GREATEST(n_immigrants, 1) AS BIGINT)"
            ).alias("cluster_size_ppm"),
        )
        .orderBy("event_type")
    )


EVENTS_HAWKES_SQL = """
WITH ann AS (
  SELECT event_type,
         epoch_ms(ts) - epoch_ms(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
           AS gap_ms
  FROM events
),
flagged AS (
  SELECT event_type,
         CASE WHEN gap_ms IS NULL OR gap_ms > 3600000 THEN 1 ELSE 0 END AS immigrant
  FROM ann
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(immigrant) AS BIGINT) AS n_immigrants,
       CAST((COUNT(*) - SUM(immigrant)) * 1000000 // COUNT(*) AS BIGINT)
         AS branching_ppm,
       CAST(COUNT(*) * 1000000 // GREATEST(SUM(immigrant), 1) AS BIGINT)
         AS cluster_size_ppm
FROM flagged
GROUP BY 1
ORDER BY event_type
"""

QUERIES["events_hawkes_declustering"] = events_hawkes_declustering
ORACLE["events_hawkes_declustering"] = EVENTS_HAWKES_SQL


def events_western_electric_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Western Electric run rules (the 1956 WECO handbook battery)
    over the daily event-count control chart — the pattern tests SPC
    practitioners layer on a Shewhart chart to catch drifts a single
    3σ point misses: R1 one point beyond 3σ; R2 two of three
    consecutive beyond 2σ, same side; R3 four of five beyond 1σ,
    same side; R4 eight consecutive on one side of the center line.

    FULLY INTEGER via cross-multiplied compares (the ewma-chart
    pattern): with S = Σx, Q = Σx², n = days, the test |x−μ| > kσ is
    exactly (n·x − S)² > k²·(n·Q − S²) — DECIMAL(38,0) squares, no
    sqrt, no division; sides are signs of (n·x − S); the run rules
    are window counts of ±flags over 3/5/8-row frames.

    Scale: one day-grain agg; everything after runs on the
    time-span-bounded |days| table."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    ).localCheckpoint(eager=True)
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(F.expr("CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0))"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    j = daily.crossJoin(F.broadcast(tot))
    dev = "(CAST(n AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)) - s)"
    var = "(CAST(n AS DECIMAL(38,0)) * q - s * s)"
    ann = j.select(
        "day",
        "x",
        F.expr(f"CASE WHEN {dev} > 0 THEN 1 WHEN {dev} < 0 THEN -1 ELSE 0 END").alias(
            "side"
        ),
        F.expr(f"CASE WHEN {dev} * {dev} > 9 * {var} THEN 1 ELSE 0 END").alias("b3"),
        F.expr(f"CASE WHEN {dev} * {dev} > 4 * {var} THEN 1 ELSE 0 END").alias("b2"),
        F.expr(f"CASE WHEN {dev} * {dev} > {var} THEN 1 ELSE 0 END").alias("b1"),
    )
    w3 = Window.orderBy("day").rowsBetween(-2, 0)
    w5 = Window.orderBy("day").rowsBetween(-4, 0)
    w8 = Window.orderBy("day").rowsBetween(-7, 0)
    rules = ann.select(
        "day",
        "x",
        "side",
        (F.col("b3") == 1).alias("rule1"),
        (
            (F.sum(F.expr("CASE WHEN b2 = 1 AND side = 1 THEN 1 ELSE 0 END")).over(w3) >= 2)
            | (F.sum(F.expr("CASE WHEN b2 = 1 AND side = -1 THEN 1 ELSE 0 END")).over(w3) >= 2)
        ).alias("rule2"),
        (
            (F.sum(F.expr("CASE WHEN b1 = 1 AND side = 1 THEN 1 ELSE 0 END")).over(w5) >= 4)
            | (F.sum(F.expr("CASE WHEN b1 = 1 AND side = -1 THEN 1 ELSE 0 END")).over(w5) >= 4)
        ).alias("rule3"),
        (
            (F.count(F.lit(1)).over(w8) == 8)
            & (F.abs(F.sum("side").over(w8)) == 8)
        ).alias("rule4"),
    )
    return rules.select(
        "day",
        "x",
        "side",
        "rule1",
        "rule2",
        "rule3",
        "rule4",
        (F.col("rule1") | F.col("rule2") | F.col("rule3") | F.col("rule4")).alias(
            "out_of_control"
        ),
    ).orderBy("day")


def _weco_sql() -> str:
    dev = "(CAST(n AS HUGEINT) * x - s)"
    var = "(CAST(n AS HUGEINT) * q - s * s)"
    return f"""
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS s,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS q
  FROM daily
),
ann AS (
  SELECT day, x,
         CASE WHEN {dev} > 0 THEN 1 WHEN {dev} < 0 THEN -1 ELSE 0 END AS side,
         CASE WHEN {dev} * {dev} > 9 * {var} THEN 1 ELSE 0 END AS b3,
         CASE WHEN {dev} * {dev} > 4 * {var} THEN 1 ELSE 0 END AS b2,
         CASE WHEN {dev} * {dev} > {var} THEN 1 ELSE 0 END AS b1
  FROM daily, tot
),
rules AS (
  SELECT day, x, side,
         b3 = 1 AS rule1,
         (SUM(CASE WHEN b2 = 1 AND side = 1 THEN 1 ELSE 0 END) OVER (
            ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2
          OR SUM(CASE WHEN b2 = 1 AND side = -1 THEN 1 ELSE 0 END) OVER (
            ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) >= 2) AS rule2,
         (SUM(CASE WHEN b1 = 1 AND side = 1 THEN 1 ELSE 0 END) OVER (
            ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) >= 4
          OR SUM(CASE WHEN b1 = 1 AND side = -1 THEN 1 ELSE 0 END) OVER (
            ORDER BY day ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) >= 4) AS rule3,
         (COUNT(*) OVER (ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) = 8
          AND ABS(SUM(side) OVER (
            ORDER BY day ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)) = 8) AS rule4
  FROM ann
)
SELECT day, x, side, rule1, rule2, rule3, rule4,
       (rule1 OR rule2 OR rule3 OR rule4) AS out_of_control
FROM rules
ORDER BY day
"""


QUERIES["events_western_electric_rules"] = events_western_electric_rules
ORACLE["events_western_electric_rules"] = _weco_sql()


_ATTR_H = 8
_ATTR_CHANNELS = ("click", "error", "signup", "view")  # fixture vocabulary minus the conversion


def events_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2016 —
    the data-driven alternative to last-touch): model user journeys
    as START → events → {purchase | null}, compute the finite-horizon
    conversion probability from START (h = 8, same fundamental-matrix
    read as events_absorption_profile), then re-compute it with each
    channel REMOVED (its incoming transitions re-routed to null:
    numerator drops, denominator keeps the mass); a channel's credit
    is the conversion it would take with it. Complements
    events_shapley_attribution (path-coalition view) with the
    chain view production attribution stacks actually run.

    Engine-exact: integer transition counts; the p-iteration is the
    absorption profile's pure-BIGINT (r·10⁶ + Σc·p) DIV n recurrence
    per variant (base + one per channel); removal effects are exact
    ppm differences (provably ≥ 0 — removing paths only loses
    conversion mass) and shares are integer DIVs. Spark folds the
    (|types|+1)²-cell model in Python ints (the state-sized-fold
    rule); the oracle chains 8 MATERIALIZED CTE levels per variant.

    Scale: ONE user-keyed window pass builds starts/steps/ends;
    everything after is model-sized."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ann = e.select(
        "user_id",
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.lead("event_type").over(w).alias("nxt"),
    )
    starts = ann.where(F.col("rn") == 1).select(
        F.lit("__start__").alias("src"), F.col("event_type").alias("dst")
    )
    steps = ann.where(
        F.col("nxt").isNotNull() & (F.col("event_type") != "purchase")
    ).select(F.col("event_type").alias("src"), F.col("nxt").alias("dst"))
    ends = ann.where(
        F.col("nxt").isNull() & (F.col("event_type") != "purchase")
    ).select(F.col("event_type").alias("src"), F.lit("__null__").alias("dst"))
    cells = {
        (r["src"], r["dst"]): r["cnt"]
        for r in starts.unionByName(steps)
        .unionByName(ends)
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    states = ["__start__", *_ATTR_CHANNELS]
    n = {s: sum(c for (src, _), c in cells.items() if src == s) for s in states}
    r = {s: cells.get((s, "purchase"), 0) for s in states}

    def conv_ppm(removed: str | None) -> int:
        q = {
            s: {
                d: c
                for (src, d), c in cells.items()
                if src == s and d not in ("purchase", "__null__") and d != removed
            }
            for s in states
        }
        p = {s: 0 for s in states}
        for _h in range(_ATTR_H):
            p = {
                s: (
                    (r[s] * 1_000_000 + sum(c * p.get(d, 0) for d, c in q[s].items()))
                    // n[s]
                    if n[s]
                    else 0
                )
                for s in states
            }
        return p["__start__"]

    base = conv_ppm(None)
    effects = {ch: base - conv_ppm(ch) for ch in _ATTR_CHANNELS}
    tot = sum(effects.values())
    rows = [
        (ch, base, base - eff, eff, eff * 1_000_000 // max(tot, 1))
        for ch, eff in sorted(effects.items())
    ]
    return spark.createDataFrame(
        rows,
        "channel string, p_base_ppm bigint, p_removed_ppm bigint,"
        " removal_effect_ppm bigint, attribution_ppm bigint",
    ).orderBy("channel")


def _attr_sql() -> str:
    variants = [("base", None)] + [(f"rm_{c}", c) for c in _ATTR_CHANNELS]
    parts = []
    for tag, removed in variants:
        filt = "c.dst NOT IN ('purchase', '__null__')"
        if removed is not None:
            filt += f" AND c.dst <> '{removed}'"
        prev = None
        for h in range(1, _ATTR_H + 1):
            if prev is None:
                body = "SELECT src AS state, r1e6 // n AS p FROM basis"
            else:
                body = f"""
  SELECT b.src AS state,
         (b.r1e6 + COALESCE(SUM(CASE WHEN {filt} THEN c.cnt * p.p END), 0)) // b.n AS p
  FROM basis b
  LEFT JOIN cells c ON c.src = b.src
  LEFT JOIN {tag}_h{prev} p ON p.state = c.dst
  GROUP BY b.src, b.r1e6, b.n"""
            parts.append(f"{tag}_h{h} AS MATERIALIZED ({body})")
            prev = h
    finals = "\nUNION ALL ".join(
        f"SELECT '{c}' AS channel,"
        f" (SELECT p FROM base_h{_ATTR_H} WHERE state = '__start__') AS pb,"
        f" (SELECT p FROM rm_{c}_h{_ATTR_H} WHERE state = '__start__') AS pr"
        for c in _ATTR_CHANNELS
    )
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events
),
trans AS (
  SELECT '__start__' AS src, event_type AS dst FROM seq WHERE rn = 1
  UNION ALL
  SELECT event_type, nxt FROM seq WHERE nxt IS NOT NULL AND event_type <> 'purchase'
  UNION ALL
  SELECT event_type, '__null__' FROM seq WHERE nxt IS NULL AND event_type <> 'purchase'
),
cells AS MATERIALIZED (SELECT src, dst, COUNT(*) AS cnt FROM trans GROUP BY 1, 2),
st AS (SELECT unnest(['__start__', 'click', 'error', 'signup', 'view']) AS src),
basis AS MATERIALIZED (
  SELECT st.src,
         GREATEST(COALESCE(SUM(c.cnt), 0), 1) AS n,
         COALESCE(SUM(CASE WHEN c.dst = 'purchase' THEN c.cnt END), 0) * 1000000 AS r1e6
  FROM st LEFT JOIN cells c ON c.src = st.src
  GROUP BY st.src
),
{",".join(parts)},
fin AS ({finals}),
tot AS (SELECT SUM(pb - pr) AS t FROM fin)
SELECT channel,
       CAST(pb AS BIGINT) AS p_base_ppm,
       CAST(pr AS BIGINT) AS p_removed_ppm,
       CAST(pb - pr AS BIGINT) AS removal_effect_ppm,
       CAST((pb - pr) * 1000000 // GREATEST(tot.t, 1) AS BIGINT) AS attribution_ppm
FROM fin, tot
ORDER BY channel
"""


QUERIES["events_markov_attribution"] = events_markov_attribution
ORACLE["events_markov_attribution"] = _attr_sql()


# ---------------------------------------------------------------------------
# events_ddsketch_quantiles — relative-error quantile sketch (round 10)
# ---------------------------------------------------------------------------

_DD_GAMMA = 1.02  # alpha = (gamma-1)/(gamma+1) ~ 0.99% relative error


def events_ddsketch_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch quantiles per event type (Masson, Rim & Lee, VLDB'19:
    "DDSketch: a fast and fully-mergeable quantile sketch with
    relative-error guarantees"): values collapse onto logarithmic
    buckets i = ⌊ln(x)/ln(γ)⌋ with γ = 1.02, so any quantile read
    back as 2γ^{i+1}/(γ+1) (the error-minimizing midpoint of
    [γ^i, γ^{i+1})) is within α = (γ−1)/(γ+1) ≈ 1% RELATIVE error — the
    sketch a metrics pipeline keeps per series because, unlike KLL /
    t-digest, it is deterministic, trivially mergeable (bucket-wise
    sum), and its memory is O(log(max/min)/log γ) regardless of n.
    Emits p50/p90/p95/p99 estimates per event type plus the bucket
    count the sketch actually used.

    Engine-exact: the ONLY transcendentals are the one-shot per-value
    ln (6dp-rounded before FLOOR — the house discipline that absorbs
    C-vs-Java ulp differences) and the one-shot γ^b readback (ROUND
    6). Quantile positions are integer: pos_q = ⌈n·q/100⌉ via
    (n·q + 99) DIV 100; bucket selection is MIN(bucket | cum ≥ pos).

    Scale: one map-side bucket projection, ONE hash agg to the
    (type, bucket) grain (~|types|·log₁.₀₂(max/min) ≈ a few hundred
    cells at ANY corpus size), a histogram-sized CDF window, one
    conditional agg — the sketch property means no raw-row sort ever
    happens (the r5 histogram-CDF rule is structural here)."""
    e = load_table(spark, sf_dir, "events")
    lg = "CAST(1.02 AS DOUBLE)"
    # DDSketch's zero bucket (paper §3.1): non-positive values get a
    # sentinel below every real log bucket (NULL would order
    # differently across engines); a quantile landing there reads 0.
    b = e.select(
        "event_type",
        F.expr(
            "CASE WHEN value <= 0 THEN CAST(-1000000000 AS BIGINT) "
            f"ELSE CAST(FLOOR(ROUND(LN(CAST(value AS DOUBLE)) / LN({lg}), 6)) AS BIGINT) END"
        ).alias("bucket"),
    )
    hist = b.groupBy("event_type", "bucket").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    return ddsketch_readout(hist)


def ddsketch_readout(hist: DataFrame) -> DataFrame:
    """Quantile readout over a (event_type, bucket, c) DDSketch
    histogram — shared by the batch query and the streaming rollup
    (bucket counts are integers, so an incrementally merged state is
    BIT-IDENTICAL to the one-shot histogram and both readouts
    hash-match the same oracle)."""
    lg = "CAST(1.02 AS DOUBLE)"
    wcdf = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "bucket",
        F.sum("c").over(wcdf).cast("bigint").alias("cum"),
        F.sum("c").over(wall).cast("bigint").alias("n"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n_buckets"),
    )
    picks = [
        F.min(F.when(F.col("cum") >= F.expr(f"(n * {q} + 99) DIV 100"), F.col("bucket"))).alias(
            f"b{q}"
        )
        for q in (50, 90, 95, 99)
    ]
    agg = cum.groupBy("event_type").agg(
        F.max("n").alias("n"), F.max("n_buckets").alias("n_buckets"), *picks
    )
    est = lambda c: F.expr(  # noqa: E731
        f"CASE WHEN {c} = -1000000000 THEN CAST(0 AS DOUBLE) ELSE "
        f"ROUND(CAST(2 AS DOUBLE) * POWER({lg}, {c} + 1) / (CAST(1.02 AS DOUBLE) + CAST(1 AS DOUBLE)), 6) END"
    )
    return agg.select(
        "event_type",
        "n",
        "n_buckets",
        est("b50").alias("p50_est"),
        est("b90").alias("p90_est"),
        est("b95").alias("p95_est"),
        est("b99").alias("p99_est"),
    ).orderBy("event_type")


DDSKETCH_BUCKET_EXPR = (
    "CASE WHEN value <= 0 THEN CAST(-1000000000 AS BIGINT) "
    "ELSE CAST(FLOOR(ROUND(LN(CAST(value AS DOUBLE)) / LN(CAST(1.02 AS DOUBLE)), 6))"
    " AS BIGINT) END"
)


EVENTS_DDSKETCH_SQL = """
WITH b AS (
  SELECT event_type,
         CASE WHEN value <= 0 THEN CAST(-1000000000 AS BIGINT)
              ELSE CAST(FLOOR(ROUND(LN(CAST(value AS DOUBLE)) / LN(CAST(1.02 AS DOUBLE)), 6))
                        AS BIGINT) END AS bucket
  FROM events
),
hist AS (
  SELECT event_type, bucket, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bucket) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_buckets
  FROM hist
)
SELECT event_type, MAX(n) AS n, MAX(n_buckets) AS n_buckets,
       CASE WHEN MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket END) = -1000000000
            THEN CAST(0 AS DOUBLE)
            ELSE ROUND(CAST(2 AS DOUBLE) * POWER(CAST(1.02 AS DOUBLE),
                 MIN(CASE WHEN cum >= (n * 50 + 99) // 100 THEN bucket END) + 1)
                 / (CAST(1.02 AS DOUBLE) + CAST(1 AS DOUBLE)), 6) END AS p50_est,
       CASE WHEN MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN bucket END) = -1000000000
            THEN CAST(0 AS DOUBLE)
            ELSE ROUND(CAST(2 AS DOUBLE) * POWER(CAST(1.02 AS DOUBLE),
                 MIN(CASE WHEN cum >= (n * 90 + 99) // 100 THEN bucket END) + 1)
                 / (CAST(1.02 AS DOUBLE) + CAST(1 AS DOUBLE)), 6) END AS p90_est,
       CASE WHEN MIN(CASE WHEN cum >= (n * 95 + 99) // 100 THEN bucket END) = -1000000000
            THEN CAST(0 AS DOUBLE)
            ELSE ROUND(CAST(2 AS DOUBLE) * POWER(CAST(1.02 AS DOUBLE),
                 MIN(CASE WHEN cum >= (n * 95 + 99) // 100 THEN bucket END) + 1)
                 / (CAST(1.02 AS DOUBLE) + CAST(1 AS DOUBLE)), 6) END AS p95_est,
       CASE WHEN MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) = -1000000000
            THEN CAST(0 AS DOUBLE)
            ELSE ROUND(CAST(2 AS DOUBLE) * POWER(CAST(1.02 AS DOUBLE),
                 MIN(CASE WHEN cum >= (n * 99 + 99) // 100 THEN bucket END) + 1)
                 / (CAST(1.02 AS DOUBLE) + CAST(1 AS DOUBLE)), 6) END AS p99_est
FROM cum
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["events_ddsketch_quantiles"] = events_ddsketch_quantiles
ORACLE["events_ddsketch_quantiles"] = EVENTS_DDSKETCH_SQL


# ---------------------------------------------------------------------------
# events_bimodality_coefficient — SAS bimodality screen per event type
# (round 10)
# ---------------------------------------------------------------------------


def events_bimodality_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bimodality coefficient BC = (g1²+1)/(g2 + 3(n−1)²/((n−2)(n−3)))
    per event type — the one-pass screen (SAS's heuristic) that flags
    a metric whose distribution has split into modes (mixed
    populations, a/b leakage, bot+human blends) BEFORE anyone fits a
    mixture model (lineitem_em_mixture is the expensive follow-up).
    BC > 0.555 (the uniform's value) suggests bimodality.

    Engine-exact: values quantize to e3 integers once (ROUND(v·1e3),
    measure-zero ties); Σx..Σx⁴ accumulate as DECIMAL(38,0)/HUGEINT
    (scale-0 casts are correctly rounded at any magnitude — the
    partial-correlation lesson); the central-moment expansion closes
    in identically-shaped doubles; FLOOR-e6 emission and a
    CAST(0.555 AS DOUBLE) threshold. Scale: ONE map-side-combinable
    agg to |types| rows; Σx⁴ holds exactly through ~sf100 (DIV-k
    beyond, documented)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ROUND(value * 1000) AS BIGINT)").alias("x"),
    )
    x38 = F.expr("CAST(x AS DECIMAL(38,0))")
    d38 = "decimal(38,0)"
    g = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x38).cast(d38).alias("s1"),
        F.sum(x38 * x38).cast(d38).alias("s2"),
        F.sum(x38 * x38 * x38).cast(d38).alias("s3"),
        F.sum(x38 * x38 * x38 * x38).cast(d38).alias("s4"),
    )
    n = F.expr("CAST(n AS DOUBLE)")
    s1 = F.expr("CAST(s1 AS DOUBLE)")
    s2 = F.expr("CAST(s2 AS DOUBLE)")
    s3 = F.expr("CAST(s3 AS DOUBLE)")
    s4 = F.expr("CAST(s4 AS DOUBLE)")
    mu = s1 / n
    m2 = s2 / n - mu * mu
    m3 = s3 / n - F.lit(3.0) * mu * s2 / n + F.lit(2.0) * mu * mu * mu
    m4 = (
        s4 / n
        - F.lit(4.0) * mu * s3 / n
        + F.lit(6.0) * mu * mu * s2 / n
        - F.lit(3.0) * mu * mu * mu * mu
    )
    g1 = m3 / (m2 * F.sqrt(m2))
    g2 = m4 / (m2 * m2) - F.lit(3.0)
    corr = F.lit(3.0) * (n - F.lit(1.0)) * (n - F.lit(1.0)) / (
        (n - F.lit(2.0)) * (n - F.lit(3.0))
    )
    bc = (g1 * g1 + F.lit(1.0)) / (g2 + corr)
    return g.select(
        "event_type",
        F.col("n").alias("n"),
        F.floor(mu).cast("bigint").alias("mean_x1000"),
        F.floor(g1 * F.lit(1000000.0)).cast("bigint").alias("skew_e6"),
        F.floor(g2 * F.lit(1000000.0)).cast("bigint").alias("excess_kurtosis_e6"),
        F.floor(bc * F.lit(1000000.0)).cast("bigint").alias("bc_e6"),
        (bc > F.expr("CAST(0.555 AS DOUBLE)")).alias("bimodal_suspect"),
    ).orderBy("event_type")


BIMODALITY_SQL = """
WITH e AS (
  SELECT event_type, CAST(ROUND(value * 1000) AS BIGINT) AS x FROM events
),
g AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2,
         CAST(SUM(CAST(x AS HUGEINT) * x * x) AS HUGEINT) AS s3,
         CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS HUGEINT) AS s4
  FROM e GROUP BY 1
),
m AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS m2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
           - CAST(3 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
           + CAST(2 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS m3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
           - CAST(4 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
           + CAST(6 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
           - CAST(3 AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS m4
  FROM g
)
SELECT event_type, n,
       CAST(FLOOR(mu) AS BIGINT) AS mean_x1000,
       CAST(FLOOR(m3 / (m2 * SQRT(m2)) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS skew_e6,
       CAST(FLOOR((m4 / (m2 * m2) - CAST(3 AS DOUBLE)) * CAST(1000000 AS DOUBLE)) AS BIGINT)
         AS excess_kurtosis_e6,
       CAST(FLOOR(((m3 / (m2 * SQRT(m2))) * (m3 / (m2 * SQRT(m2))) + CAST(1 AS DOUBLE))
                  / ((m4 / (m2 * m2) - CAST(3 AS DOUBLE))
                     + CAST(3 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))
                       * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))
                       / ((CAST(n AS DOUBLE) - CAST(2 AS DOUBLE)) * (CAST(n AS DOUBLE) - CAST(3 AS DOUBLE))))
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS bc_e6,
       ((m3 / (m2 * SQRT(m2))) * (m3 / (m2 * SQRT(m2))) + CAST(1 AS DOUBLE))
         / ((m4 / (m2 * m2) - CAST(3 AS DOUBLE))
            + CAST(3 AS DOUBLE) * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))
              * (CAST(n AS DOUBLE) - CAST(1 AS DOUBLE))
              / ((CAST(n AS DOUBLE) - CAST(2 AS DOUBLE)) * (CAST(n AS DOUBLE) - CAST(3 AS DOUBLE))))
         > CAST(0.555 AS DOUBLE) AS bimodal_suspect
FROM m
ORDER BY event_type
"""

QUERIES["events_bimodality_coefficient"] = events_bimodality_coefficient
ORACLE["events_bimodality_coefficient"] = BIMODALITY_SQL


# ---------------------------------------------------------------------------
# events_anderson_darling — two-sample AD test, fully integer (round 10)
# ---------------------------------------------------------------------------


def events_anderson_darling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Anderson–Darling test between purchase and click
    value distributions — the tail-weighted sibling of events_ks_test
    (KS sees the biggest CDF gap; AD integrates ALL gaps with
    1/(F(1−F)) tail emphasis, catching tail-only drift KS misses).
    Pettitt's rank form on the pooled sample: A² = (1/(n·m)) ·
    Σ_{i=1}^{N−1} (M_i·N − i·n)² / (i·(N−i)), M_i = count of sample-1
    values among the smallest i.

    FULLY INTEGER: the pooled histogram-CDF gives every distinct
    value's rank block; within a block of tied values the summand is
    constant per unit rank only at block edges — the exact
    block-closed form Σ_{i=lo..hi} with constant M_i is evaluated
    per-rank via an EXPLODED bounded rank walk? No — ties make M_i
    interpolate; the standard discrete-tie treatment (Scholz–Stephens
    midranks) is heavy, so this op uses the UNIQUE-RANK variant on
    e3-quantized values where each pooled rank i carries the exact
    integer term (M_i·N − i·n)²·1e9 DIV (i·(N−i)) accumulated over a
    per-distinct-value SEQUENCE EXPLODE bounded by the block width —
    every term integer, no float until the final 1e9/(n·m) close.

    Scale: histogram-CDF (|distinct e3 values| rows) + a rank explode
    bounded by Σ block widths = N… the explode is N rows TOTAL — one
    linear pass, same cost class as a sort-free rank walk."""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    ).select(
        (F.col("event_type") == "purchase").alias("is_a"),
        F.expr("CAST(ROUND(value * 1000) AS BIGINT)").alias("x"),
    )
    hist = e.groupBy("x").agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("ta"),
    )
    wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    blocks = (
        hist.withColumn("cum_before", F.coalesce(F.sum("t").over(wc), F.lit(0)).cast("bigint"))
        .withColumn("ca_before", F.coalesce(F.sum("ta").over(wc), F.lit(0)).cast("bigint"))
        .withColumn("nn", F.sum("t").over(wall).cast("bigint"))
        .withColumn("na", F.sum("ta").over(wall).cast("bigint"))
    )
    # walk ranks i = cum_before+1 .. cum_before+t within each block;
    # M_i interpolates linearly through the tie block in arrival
    # order of the quantized values (deterministic: the e3 grid IS
    # the order) — j-th rank of the block adds ta*j DIV t of sample A
    ranks = blocks.select(
        "nn",
        "na",
        "cum_before",
        "ca_before",
        "t",
        "ta",
        F.expr("explode(sequence(CAST(1 AS BIGINT), t))").alias("j"),
    ).select(
        "nn",
        "na",
        (F.col("cum_before") + F.col("j")).alias("i"),
        (F.col("ca_before") + F.expr("ta * j DIV t")).alias("mi"),
    ).where(F.col("i") < F.col("nn"))
    terms = ranks.select(
        "nn",
        "na",
        F.expr(
            "(CAST(mi AS DECIMAL(38,0)) * nn - CAST(i AS DECIMAL(38,0)) * na)"
            " * (CAST(mi AS DECIMAL(38,0)) * nn - CAST(i AS DECIMAL(38,0)) * na)"
            " * 1000000000 DIV (CAST(i AS DECIMAL(38,0)) * (nn - i))"
        ).alias("term_e9"),
    )
    agg = terms.groupBy("nn", "na").agg(
        F.sum(F.expr("CAST(term_e9 AS DECIMAL(38,0))")).alias("s_e9")
    )
    a2 = F.expr(
        "CAST(s_e9 AS DOUBLE) / CAST(1000000000 AS DOUBLE)"
        " / (CAST(na AS DOUBLE) * CAST(nn - na AS DOUBLE))"
    )
    return agg.select(
        F.col("nn").cast("bigint").alias("n_pooled"),
        F.col("na").cast("bigint").alias("n_purchase"),
        (F.col("nn") - F.col("na")).cast("bigint").alias("n_click"),
        F.floor(a2 * F.lit(1000000.0)).cast("bigint").alias("a2_e6"),
        (a2 > F.expr("CAST(2.492 AS DOUBLE)")).alias("distributions_differ_5pct"),
    )


ANDERSON_DARLING_SQL = """
WITH e AS (
  SELECT event_type = 'purchase' AS is_a,
         CAST(ROUND(value * 1000) AS BIGINT) AS x
  FROM events WHERE event_type IN ('purchase', 'click')
),
hist AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS t,
         CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ta
  FROM e GROUP BY 1
),
blocks AS (
  SELECT x, t, ta,
         CAST(COALESCE(SUM(t) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before,
         CAST(COALESCE(SUM(ta) OVER (ORDER BY x
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS ca_before,
         CAST(SUM(t) OVER () AS BIGINT) AS nn,
         CAST(SUM(ta) OVER () AS BIGINT) AS na
  FROM hist
),
ranks AS (
  SELECT nn, na,
         cum_before + j.j AS i,
         ca_before + ta * j.j // t AS mi
  FROM blocks, LATERAL (SELECT unnest(generate_series(CAST(1 AS BIGINT), t)) AS j) j
  WHERE cum_before + j.j < nn
),
terms AS (
  SELECT nn, na,
         (CAST(mi AS HUGEINT) * nn - CAST(i AS HUGEINT) * na)
           * (CAST(mi AS HUGEINT) * nn - CAST(i AS HUGEINT) * na)
           * 1000000000 // (CAST(i AS HUGEINT) * (nn - i)) AS term_e9
  FROM ranks
),
agg AS (
  SELECT nn, na, CAST(SUM(term_e9) AS HUGEINT) AS s_e9 FROM terms GROUP BY 1, 2
)
SELECT CAST(nn AS BIGINT) AS n_pooled,
       CAST(na AS BIGINT) AS n_purchase,
       CAST(nn - na AS BIGINT) AS n_click,
       CAST(FLOOR(CAST(s_e9 AS DOUBLE) / CAST(1000000000 AS DOUBLE)
                  / (CAST(na AS DOUBLE) * CAST(nn - na AS DOUBLE))
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS a2_e6,
       CAST(s_e9 AS DOUBLE) / CAST(1000000000 AS DOUBLE)
         / (CAST(na AS DOUBLE) * CAST(nn - na AS DOUBLE))
         > CAST(2.492 AS DOUBLE) AS distributions_differ_5pct
FROM agg
"""

QUERIES["events_anderson_darling"] = events_anderson_darling
ORACLE["events_anderson_darling"] = ANDERSON_DARLING_SQL


# ---------------------------------------------------------------------------
# events_extremal_index — extreme-value clustering (round 10)
# ---------------------------------------------------------------------------


def events_extremal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs-declustering extremal index θ per event type: exceedances
    above the type's p95 value arrive in CLUSTERS when extremes are
    dependent, and θ̂ = clusters/exceedances (run gap 2h) measures it
    — θ≈1 says extremes are isolated (the POT/GPD fit of
    events_pot_gpd_tail can treat them i.i.d.), θ≪1 says one storm
    is being counted many times and the return-level math must
    decluster first. This is the missing prerequisite check of the
    extreme-value family (Gumbel/GPD/MRL are all fitted here).

    Engine-exact: the threshold is a ceil-rank order statistic from
    the millis histogram-CDF (cross-multiplied); exceedance times
    are integer µs; a cluster break is gap > 7200e6 µs; θ and the
    mean cluster size are integer-ppm DIVs.

    Scale: one histogram-CDF per type + ONE window over the
    exceedance subset (5% of rows) — the full stream is never
    sorted."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(ROUND(value * 1000) AS BIGINT)").alias("x"),
        F.expr("unix_micros(ts)").alias("us"),
    )
    hist = e.groupBy("event_type", "x").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wc = Window.partitionBy("event_type").orderBy("x").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wall = Window.partitionBy("event_type")
    thr = (
        hist.withColumn("cum", F.sum("c").over(wc).cast("bigint"))
        .withColumn("n", F.sum("c").over(wall).cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.min(F.when(F.col("cum") * 100 >= F.col("n") * 95, F.col("x"))).alias("u")
        )
    )
    exc = e.join(F.broadcast(thr), "event_type").where(F.col("x") > F.col("u"))
    wt = Window.partitionBy("event_type").orderBy("us")
    runs = exc.withColumn("prev", F.lag("us").over(wt)).select(
        "event_type",
        "u",
        F.expr(
            "CASE WHEN prev IS NULL OR us - prev > 7200000000 THEN 1 ELSE 0 END"
        ).alias("new_cluster"),
    )
    return (
        runs.groupBy("event_type", "u")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_exceedances"),
            F.expr("CAST(SUM(new_cluster) AS BIGINT)").alias("n_clusters"),
        )
        .select(
            "event_type",
            F.col("u").alias("threshold_x1000"),
            "n_exceedances",
            "n_clusters",
            F.expr("n_clusters * 1000000 DIV n_exceedances").alias("theta_ppm"),
            F.expr("n_exceedances * 1000000 DIV GREATEST(n_clusters, 1)").alias(
                "mean_cluster_size_ppm"
            ),
        )
        .orderBy("event_type")
    )


EVENTS_EXTREMAL_SQL = """
WITH e AS (
  SELECT event_type, CAST(ROUND(value * 1000) AS BIGINT) AS x, epoch_us(ts) AS us
  FROM events
),
hist AS (
  SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2
),
cdf AS (
  SELECT event_type, x,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM hist
),
thr AS (
  SELECT event_type, MIN(CASE WHEN cum * 100 >= n * 95 THEN x END) AS u
  FROM cdf GROUP BY 1
),
exc AS (
  SELECT e.event_type, t.u, e.us
  FROM e JOIN thr t ON e.event_type = t.event_type
  WHERE e.x > t.u
),
runs AS (
  SELECT event_type, u,
         CASE WHEN LAG(us) OVER (PARTITION BY event_type ORDER BY us) IS NULL
                   OR us - LAG(us) OVER (PARTITION BY event_type ORDER BY us) > 7200000000
              THEN 1 ELSE 0 END AS new_cluster
  FROM exc
)
SELECT event_type,
       u AS threshold_x1000,
       CAST(COUNT(*) AS BIGINT) AS n_exceedances,
       CAST(SUM(new_cluster) AS BIGINT) AS n_clusters,
       CAST(SUM(new_cluster) * 1000000 // COUNT(*) AS BIGINT) AS theta_ppm,
       CAST(COUNT(*) * 1000000 // GREATEST(SUM(new_cluster), 1) AS BIGINT) AS mean_cluster_size_ppm
FROM runs
GROUP BY 1, 2
ORDER BY event_type
"""

QUERIES["events_extremal_index"] = events_extremal_index
ORACLE["events_extremal_index"] = EVENTS_EXTREMAL_SQL


# ---------------------------------------------------------------------------
# events_cramers_v_matrix — Cramér's V effect-size matrix over the
# categorical event attributes.


def events_cramers_v_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V for every pair of the three categorical event
    attributes (event_type, weekday, 6-hour band): V = √(χ²/(n·(m−1)))
    with m = min(rows, cols) — the EFFECT-SIZE matrix a χ² test alone
    can't give (χ² grows with n; V is the [0,1] association strength
    you can compare across pairs and across corpus sizes — the
    screening step before building any type×time seasonal model).

    Determinism: weekday is epoch-day % 7 (identical on both engines —
    never dayofweek, whose origin differs); each χ² cell term
    (n·o − r·c)²/(n·r·c) is computed from exact integers in ONE
    shared double expression, e6-rounded PER CELL and BIGINT-summed
    (the orders_chi2 discipline); the V close is one IEEE sqrt over
    exact integers, 6dp.

    Scale: ONE events scan collapses to the ≤|types|·7·4 cell cube;
    all three pair contingencies are map-side re-aggregations of that
    cell table (the lag-MI window-over-cells rule) — no second scan,
    no row-sized transcendentals."""
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("t"),
        F.expr("CAST(datediff(CAST(ts AS DATE), DATE'1970-01-01') % 7 AS INT)").alias("wd"),
        F.expr("CAST(hour(ts) DIV 6 AS INT)").alias("hb"),
    )
    cube = ev.groupBy("t", "wd", "hb").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("c")
    ).localCheckpoint(eager=True)

    def pair_v(a: str, b: str, label: str) -> DataFrame:
        cells = cube.groupBy(a, b).agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("o"))
        wr = Window.partitionBy(a)
        wc = Window.partitionBy(b)
        wall = Window.partitionBy()
        t = cells.select(
            F.col(a),
            F.col(b),
            F.expr("CAST(SUM(o) OVER () AS BIGINT)").alias("n"),
            F.sum("o").over(wr).alias("r"),
            F.sum("o").over(wc).alias("cc"),
            "o",
        )
        return t.groupBy().agg(
            F.expr("MAX(n)").alias("n"),
            F.expr(f"CAST((COUNT(DISTINCT {a}) - 1) * (COUNT(DISTINCT {b}) - 1) AS BIGINT)").alias("df"),
            F.expr(f"CAST(LEAST(COUNT(DISTINCT {a}), COUNT(DISTINCT {b})) AS BIGINT)").alias("m"),
            F.expr(
                "CAST(SUM(CAST(ROUND("
                " CAST(n * o - r * cc AS DOUBLE) * CAST(n * o - r * cc AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(cc AS DOUBLE))"
                " * 1000000) AS BIGINT)) AS BIGINT)"
            ).alias("chi2_e6"),
        ).select(
            F.lit(label).alias("pair"),
            F.expr("CAST(n AS BIGINT)").alias("n"),
            "df",
            "chi2_e6",
            F.expr(
                "ROUND(SQRT(CAST(chi2_e6 AS DOUBLE)"
                " / (CAST(1000000 AS DOUBLE) * n * (m - 1))), 6)"
            ).alias("cramers_v"),
        )

    return (
        pair_v("t", "wd", "type_x_weekday")
        .unionByName(pair_v("t", "hb", "type_x_hourband"))
        .unionByName(pair_v("wd", "hb", "weekday_x_hourband"))
        .orderBy("pair")
    )


_CRAMERS_PAIR_SQL = """
  SELECT '{label}' AS pair, n, df, chi2_e6,
         ROUND(SQRT(CAST(chi2_e6 AS DOUBLE)
               / (CAST(1000000 AS DOUBLE) * n * (m - 1))), 6) AS cramers_v
  FROM (
    SELECT MAX(n) AS n,
           CAST((COUNT(DISTINCT {a}) - 1) * (COUNT(DISTINCT {b}) - 1) AS BIGINT) AS df,
           CAST(LEAST(COUNT(DISTINCT {a}), COUNT(DISTINCT {b})) AS BIGINT) AS m,
           CAST(SUM(CAST(ROUND(
             CAST(n * o - r * cc AS DOUBLE) * CAST(n * o - r * cc AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(cc AS DOUBLE))
             * 1000000) AS BIGINT)) AS BIGINT) AS chi2_e6
    FROM (
      SELECT {a}, {b}, o,
             CAST(SUM(o) OVER () AS BIGINT) AS n,
             CAST(SUM(o) OVER (PARTITION BY {a}) AS BIGINT) AS r,
             CAST(SUM(o) OVER (PARTITION BY {b}) AS BIGINT) AS cc
      FROM (SELECT {a}, {b}, CAST(SUM(c) AS BIGINT) AS o FROM cube GROUP BY 1, 2)
    )
  )
"""

EVENTS_CRAMERS_SQL = (
    """
WITH cube AS MATERIALIZED (
  SELECT event_type AS t,
         CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 7 AS INTEGER) AS wd,
         CAST(hour(ts) // 6 AS INTEGER) AS hb,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1, 2, 3
)
"""
    + _CRAMERS_PAIR_SQL.format(label="type_x_weekday", a="t", b="wd")
    + "UNION ALL"
    + _CRAMERS_PAIR_SQL.format(label="type_x_hourband", a="t", b="hb")
    + "UNION ALL"
    + _CRAMERS_PAIR_SQL.format(label="weekday_x_hourband", a="wd", b="hb")
    + "ORDER BY pair"
)

QUERIES["events_cramers_v_matrix"] = events_cramers_v_matrix
ORACLE["events_cramers_v_matrix"] = EVENTS_CRAMERS_SQL
