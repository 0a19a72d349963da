"""Time-series warehouse queries over the events stream: gap filling
(dense calendar grid + LOCF), fixed-width histograms, and z-score
anomaly detection. These are the "served" analytics a bireme user
runs over synced event tables (the reference keeps the warehouse
current — `ChangeLoader.java:205-330` — and the warehouse answers
exactly this class of query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from bireme_spark.functions.money import dsum, money
from bireme_spark.sources.tables import load_table

_BUCKET = "15 minutes"


def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense per-type 15-minute series: every bucket between a type's
    first and last event exists, empty buckets carry n_events=0 and
    the last observed bucket value (LOCF).

    Scale shape: the raw stream is aggregated FIRST (one shuffle on
    (event_type, bucket), map-side combine), so the grid generation,
    join and LOCF window all run on series-sized data (|types| ×
    |buckets|), never on raw events. The LOCF window partitions by
    the series key — parallelism is the number of series, which is
    the natural layout for per-series post-processing."""
    e = load_table(spark, sf_dir, "events")
    agg = (
        e.groupBy(F.window("ts", _BUCKET).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value").cast("decimal(12,2)"), "bucket_value"),
        )
        .select(F.col("w.start").alias("bucket"), "event_type", "n_events", "bucket_value")
    )
    grid = (
        agg.groupBy("event_type")
        .agg(F.min("bucket").alias("lo"), F.max("bucket").alias("hi"))
        .select(
            "event_type",
            F.explode(F.expr(f"sequence(lo, hi, interval {_BUCKET})")).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(agg, ["event_type", "bucket"], "left")
        .select(
            "event_type",
            "bucket",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.round(F.last("bucket_value", ignorenulls=True).over(w), 6).alias("locf_value"),
        )
        .orderBy("event_type", "bucket")
    )


EVENTS_GAP_FILL_SQL = """
WITH agg AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS bucket, event_type,
         COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS bucket_value
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 15 MINUTE)) AS bucket
  FROM (SELECT event_type, MIN(bucket) lo, MAX(bucket) hi FROM agg GROUP BY 1)
)
SELECT g.event_type, g.bucket,
       CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
       ROUND(last_value(a.bucket_value IGNORE NULLS)
             OVER (PARTITION BY g.event_type ORDER BY g.bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS locf_value
FROM grid g LEFT JOIN agg a ON a.event_type = g.event_type AND a.bucket = g.bucket
ORDER BY 1, 2
"""


def events_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (20 buckets of 25
    over [0, 500)). Pure scan → map-side bucket id → one hash
    aggregation; bucket edges are computed from the id, so nothing
    but (type, bucket) ever shuffles."""
    e = load_table(spark, sf_dir, "events")
    bucket = F.least(F.greatest(F.floor(F.col("value") / 25), F.lit(0)), F.lit(19))
    return (
        e.groupBy("event_type", bucket.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bucket",
            (F.col("bucket") * 25.0).alias("lo"),
            ((F.col("bucket") + 1) * 25.0).alias("hi"),
            "n",
        )
        .orderBy("event_type", "bucket")
    )


EVENTS_HISTOGRAM_SQL = """
SELECT event_type,
       CAST(LEAST(GREATEST(FLOOR(value / 25), 0), 19) AS INTEGER) AS bucket,
       CAST(LEAST(GREATEST(FLOOR(value / 25), 0), 19) * 25.0 AS DOUBLE) AS lo,
       CAST((LEAST(GREATEST(FLOOR(value / 25), 0), 19) + 1) * 25.0 AS DOUBLE) AS hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2, 3, 4
ORDER BY 1, 2
"""


def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly counts (|z| > 3 against the type's
    own mean/stddev).

    Exactness: mean and variance come from DECIMAL-exact sums of
    value and value² (shuffle-order-independent), converted to
    double only for the final arithmetic — so both engines compute
    bit-identical mean/std, and every per-row z comparison agrees.
    Plan: one aggregation shuffle for the stats, then the 5-row
    stats table broadcasts back onto the scan."""
    e = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(12,2)")
    stats = (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec).cast("double").alias("s1"),
            F.sum(dec * dec).cast("double").alias("s2"),
        )
        .select(
            "event_type",
            "n",
            (F.col("s1") / F.col("n")).alias("mean"),
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1)
            ).alias("std"),
        )
    )
    z = (F.col("value") - F.col("mean")) / F.col("std")
    return (
        e.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").alias("n"),
            F.round(F.max("mean"), 6).alias("mean"),
            F.round(F.max("std"), 6).alias("std"),
            F.sum(F.when(F.abs(z) > 3, 1).otherwise(0)).cast("bigint").alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


EVENTS_ANOMALY_SQL = """
WITH stats AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS s2
  FROM events GROUP BY 1
), m AS (
  SELECT event_type, n, s1 / n AS mean,
         SQRT((s2 - s1 * s1 / n) / (n - 1)) AS std
  FROM stats
)
SELECT e.event_type, CAST(MAX(m.n) AS BIGINT) AS n,
       ROUND(MAX(m.mean), 6) AS mean, ROUND(MAX(m.std), 6) AS std,
       CAST(SUM(CASE WHEN ABS((e.value - m.mean) / m.std) > 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_anomalies
FROM events e JOIN m USING (event_type)
GROUP BY 1 ORDER BY 1
"""


def events_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day × day-of-week activity heatmap per event type —
    the ops-dashboard rollup over a synced event table. Pure integer
    aggregation on derived calendar keys (≤ |types|·168 cells), one
    map-side-combined shuffle; DECIMAL-exact value sums."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            "event_type",
            F.dayofweek("ts").alias("dow"),
            F.hour("ts").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value").cast("decimal(12,2)"), "total_value"),
        )
        .orderBy("event_type", "dow", "hour")
    )


EVENTS_HEATMAP_SQL = """
SELECT event_type,
       CAST(dayofweek(ts) + 1 AS INTEGER) AS dow,
       CAST(hour(ts) AS INTEGER) AS hour,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type anomaly counts via median absolute deviation:
    |x − median| > 3 · 1.4826 · MAD. Unlike the z-score sibling, a few
    extreme outliers cannot inflate the threshold and mask each other
    (the breakdown point of mean/std is 0; MAD's is 50%) — the filter
    monitoring pipelines actually deploy on heavy-tailed metrics.

    Two stats passes (exact median, then median of |x − med|), each a
    per-type aggregation with the tiny |types|-row result broadcast
    back — the raw stream shuffles only into per-type percentile
    aggs, never row-to-row."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = (
        e.join(F.broadcast(med), "event_type")
        .select("event_type", "med", F.abs(F.col("value") - F.col("med")).alias("adev"))
        .groupBy("event_type")
        .agg(F.max("med").alias("med"), F.expr("percentile(adev, 0.5)").alias("mad"))
    )
    thresh = F.lit(3 * 1.4826) * F.col("mad")
    return (
        e.join(F.broadcast(dev), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum(F.when(F.abs(F.col("value") - F.col("med")) > thresh, 1).otherwise(0))
            .cast("bigint")
            .alias("n_anomalies"),
        )
        .orderBy("event_type")
    )


EVENTS_ANOMALY_MAD_SQL = """
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY 1
), dev AS (
  SELECT e.event_type, MAX(m.med) AS med,
         quantile_cont(ABS(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY 1
)
SELECT e.event_type,
       ROUND(MAX(d.med), 6) AS med, ROUND(MAX(d.mad), 6) AS mad,
       CAST(SUM(CASE WHEN ABS(e.value - d.med) > 3 * 1.4826 * d.mad
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
FROM events e JOIN dev d USING (event_type)
GROUP BY 1 ORDER BY 1
"""


def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional as-of with tolerance (pandas merge_asof / kdb aj
    surface): each purchase attaches the NEAREST click of the same
    user within ±30 minutes — either side, equal distance resolves
    backward, no match leaves nulls. One shuffle on user_id, two
    ordered window carries (operators/windows.asof_join_directional);
    the oracle is a correlated nearest-neighbor subquery with the
    identical distance/side/id tie-break chain."""
    from bireme_spark.operators.windows import asof_join_directional

    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    c = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    out = asof_join_directional(
        p,
        c,
        on="user_id",
        left_ts="pts",
        right_ts="cts",
        right_payload=("click_id",),
        direction="nearest",
        tolerance_seconds=1800,
    )
    return out.select("user_id", "purchase_id", "click_id").orderBy("purchase_id")


ASOF_NEAREST_SQL = """
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS pts
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, event_id AS click_id, ts AS cts
  FROM events WHERE event_type = 'click'
)
SELECT p.user_id, p.purchase_id,
       (SELECT c.click_id FROM c
         WHERE c.user_id = p.user_id
           AND abs(epoch(c.cts) - epoch(p.pts)) <= 1800
         ORDER BY abs(epoch(c.cts) - epoch(p.pts)),
                  CASE WHEN c.cts <= p.pts THEN 0 ELSE 1 END,
                  c.click_id
         LIMIT 1) AS click_id
FROM p
ORDER BY purchase_id
"""


def events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type on the daily-count
    series: the day maximizing |S_i|, S_i = Σ_{j≤i}(x_j − mean), is
    the classic single-changepoint estimator (Page 1954 / binary
    segmentation's first split).

    Exactness: with integer daily counts, n·S_i = n·Σ_{j≤i}x_j − i·Σx
    is INTEGER — computing the scaled statistic avoids float means
    entirely, so the argmax and magnitude are bit-identical across
    engines (no rounding discipline needed).

    Scale: the raw stream collapses in ONE (type, day) hash agg with
    map-side combine; every later step (totals join, cumulative
    window, argmax) runs on series-sized data (|types| × days rows).
    At 100 TB the per-type window sorts ≤ days rows — trivial."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.col("event_type"), F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).alias("c"))
    tot = daily.groupBy("event_type").agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("nd")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    cum = (
        daily.join(tot, "event_type")
        .withColumn("cs", F.sum("c").over(w))
        .withColumn("i", F.row_number().over(w))
        .withColumn("sv", F.col("nd") * F.col("cs") - F.col("i") * F.col("total"))
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("sv")).desc(), F.col("day").asc()
    )
    return (
        cum.withColumn("rn", F.row_number().over(pick))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            # string day: DuckDB DATE round-trips through pandas as a
            # midnight datetime, so a raw DATE column hash-mismatches
            F.date_format("day", "yyyy-MM-dd").alias("cp_day"),
            F.abs(F.col("sv")).cast("bigint").alias("cusum_abs"),
            F.col("nd").cast("int").alias("n_days"),
            F.col("total").cast("bigint").alias("total_events"),
        )
        .orderBy("event_type")
    )


EVENTS_CHANGEPOINT_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(SUM(c) AS BIGINT) AS total, COUNT(*) AS nd
  FROM daily GROUP BY 1
),
cum AS (
  SELECT d.event_type, d.day,
         CAST(SUM(d.c) OVER (PARTITION BY d.event_type ORDER BY d.day) AS BIGINT) AS cs,
         ROW_NUMBER() OVER (PARTITION BY d.event_type ORDER BY d.day) AS i,
         t.total, t.nd
  FROM daily d JOIN tot t USING (event_type)
),
s AS (
  SELECT event_type, day, nd * cs - i * total AS sv, nd, total FROM cum
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                               ORDER BY ABS(sv) DESC, day ASC) AS rn
  FROM s
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS cp_day,
       CAST(ABS(sv) AS BIGINT) AS cusum_abs,
       CAST(nd AS INTEGER) AS n_days,
       CAST(total AS BIGINT) AS total_events
FROM r WHERE rn = 1
ORDER BY event_type
"""


_ACF_MAX_LAG = 7


def events_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..7 autocorrelation of the daily event-count series per
    type (the ACF a seasonality/forecasting pass reads; lag-7 spikes
    = weekly cycle).

    Exactness: on the dense per-type day grid (0-filled gaps), with
    integer counts x_t and S = Σx over n grid days, the n-scaled
    deviations n·x_t − S are INTEGERS, so numerator
    N_k = Σ(n·x_t−S)(n·x_{t+k}−S) and denominator D = Σ(n·x_t−S)² are
    exact and acf = round(N_k/D, 6) is engine-identical — the same
    no-float-mean trick as events_changepoint.

    Scale: one (type,day) map-side-combined agg collapses the raw
    stream; the dense grid, totals join, ×7 lag fan-out and final
    (type,lag) agg all run on series-sized data."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("event_type"), F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    span = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    series = grid.join(daily, ["event_type", "day"], "left").select(
        "event_type", "day", F.coalesce("c", F.lit(0)).alias("x")
    )
    tot = series.groupBy("event_type").agg(
        F.sum("x").alias("S"), F.count(F.lit(1)).alias("n")
    )
    # dev feeds THREE branches (denominator, lag side, join side):
    # checkpoint the series-sized frame so the raw stream collapses
    # once — the plan audit counted 12 events scans through the
    # duplicated lineage (A/B at sf0.1: 1.02 vs 1.04s, equal values;
    # the scan collapse is the 100 TB win)
    dev = series.join(tot, "event_type").select(
        "event_type",
        "day",
        (F.col("n") * F.col("x") - F.col("S")).alias("d"),
    ).localCheckpoint(eager=True)
    denom = dev.groupBy("event_type").agg(F.sum(F.col("d") * F.col("d")).alias("D"))
    lags = spark.range(1, _ACF_MAX_LAG + 1).select(F.col("id").cast("int").alias("lag"))
    lagged = dev.crossJoin(F.broadcast(lags)).select(
        "event_type", "lag", F.date_add("day", F.col("lag")).alias("day"),
        F.col("d").alias("d_prev"),
    )
    pairs = dev.join(lagged, ["event_type", "day"]).groupBy("event_type", "lag").agg(
        F.sum(F.col("d") * F.col("d_prev")).alias("N")
    )
    return (
        pairs.join(denom, "event_type")
        .select(
            "event_type",
            "lag",
            F.round(F.col("N").cast("double") / F.col("D"), 6).alias("acf"),
        )
        .orderBy("event_type", "lag")
    )


EVENTS_ACF_SQL = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
span AS (
  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY 1
),
grid AS (
  SELECT event_type, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
),
series AS (
  SELECT g.event_type, g.day, COALESCE(d.c, 0) AS x
  FROM grid g LEFT JOIN daily d USING (event_type, day)
),
tot AS (
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS S, COUNT(*) AS n
  FROM series GROUP BY 1
),
dev AS (
  SELECT s.event_type, s.day, t.n * s.x - t.S AS d
  FROM series s JOIN tot t USING (event_type)
),
denom AS (
  SELECT event_type, CAST(SUM(d * d) AS BIGINT) AS D FROM dev GROUP BY 1
),
pairs AS (
  SELECT a.event_type, l.lag, CAST(SUM(a.d * b.d) AS BIGINT) AS N
  FROM dev a
  CROSS JOIN (SELECT CAST(unnest(generate_series(1, {_ACF_MAX_LAG})) AS INTEGER) AS lag) l
  JOIN dev b ON b.event_type = a.event_type AND b.day = a.day + l.lag * INTERVAL 1 DAY
  GROUP BY 1, 2
)
SELECT p.event_type, p.lag,
       ROUND(CAST(p.N AS DOUBLE) / dn.D, 6) AS acf
FROM pairs p JOIN denom dn USING (event_type)
ORDER BY event_type, lag
"""


def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling revenue per event type via a RANGE-frame window
    (rangeBetween −6..0 days over the integer day number) — the frame
    handles calendar gaps natively, no dense grid needed: a missing
    day simply contributes nothing and the in-window day count says
    how many days the average divides by.

    DECIMAL-exact: daily revenue stays DECIMAL through the rolling
    sum; only the final surfaced columns cast to double (money.py
    discipline). One (type,day) raw agg, then a per-type window over
    series-sized data."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("event_type"), F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(12,2)")).alias("rev_d")
    )
    dn = F.unix_date(F.col("day"))
    w = (
        Window.partitionBy("event_type")
        .orderBy(dn)
        .rangeBetween(-6, Window.currentRow)
    )
    return (
        daily.select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("rev_d").cast("double").alias("revenue"),
            F.sum("rev_d").over(w).cast("double").alias("rev_7d"),
            F.count(F.lit(1)).over(w).cast("int").alias("days_in_window"),
            F.round(
                F.sum("rev_d").over(w).cast("double") / F.count(F.lit(1)).over(w), 6
            ).alias("avg_7d"),
        )
        .orderBy("event_type", "day")
    )


EVENTS_ROLLING_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(12,2))) AS rev_d
  FROM events GROUP BY 1, 2
),
dn AS (
  SELECT *, day - DATE '1970-01-01' AS day_num FROM daily
)
SELECT event_type, strftime(day, '%Y-%m-%d') AS day,
       CAST(rev_d AS DOUBLE) AS revenue,
       CAST(SUM(rev_d) OVER w AS DOUBLE) AS rev_7d,
       CAST(COUNT(*) OVER w AS INTEGER) AS days_in_window,
       ROUND(CAST(SUM(rev_d) OVER w AS DOUBLE) / COUNT(*) OVER w, 6) AS avg_7d
FROM dn
WINDOW w AS (PARTITION BY event_type ORDER BY day_num
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
ORDER BY event_type, day
"""


def time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of ``value`` per user over the event
    stream (the TimescaleDB ``time_weight('LOCF')`` hypertable
    aggregate): each reading holds until the next one, so its weight
    is the µs interval it was in force; twa = Σ value·Δt / Σ Δt.
    Irregular sampling is exactly why plain AVG is wrong here.

    Exactness: Δt in integer microseconds (unix_micros of the nanos-
    truncated LTZ timestamps), value as DECIMAL(12,2) — the weighted
    sum is an exact DECIMAL product-sum; ties on ts break by
    event_id in the ordering window on both engines.

    Scale: ONE shuffle on the series key (user_id); the lead window
    sorts within each user partition — the same partitioning every
    hypertable op here uses."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = (
        e.select(
            "user_id",
            "event_id",
            "ts",
            F.col("value").cast("decimal(12,2)").alias("v"),
        )
        .withColumn("next_us", F.unix_micros(F.lead("ts").over(w)))
        .where(F.col("next_us").isNotNull())
        .select(
            "user_id",
            "v",
            (F.col("next_us") - F.unix_micros(F.col("ts"))).alias("dt_us"),
        )
    )
    return (
        iv.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dt_us").cast("bigint").alias("span_us"),
            F.round(
                F.sum(F.col("v") * F.col("dt_us")).cast("double") / F.sum("dt_us"), 6
            ).alias("twa"),
        )
        .orderBy("user_id")
    )


TIME_WEIGHTED_AVG_SQL = """
WITH iv AS (
  SELECT user_id, CAST(value AS DECIMAL(12,2)) AS v,
         epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
           - epoch_us(ts) AS dt_us
  FROM events
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dt_us) AS BIGINT) AS span_us,
       ROUND(CAST(SUM(v * dt_us) AS DOUBLE) / SUM(dt_us), 6) AS twa
FROM iv WHERE dt_us IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""


QUERIES = {
    "events_rolling_7d": events_rolling_7d,
    "time_weighted_average": time_weighted_average,
    "events_autocorrelation": events_autocorrelation,
    "events_changepoint": events_changepoint,
    "asof_join_nearest": asof_join_nearest,
    "events_anomaly_mad": events_anomaly_mad,
    "events_heatmap": events_heatmap,
    "events_gap_fill": events_gap_fill,
    "events_histogram": events_histogram,
    "events_anomaly_zscore": events_anomaly_zscore,
}

ORACLE = {
    "events_rolling_7d": EVENTS_ROLLING_SQL,
    "time_weighted_average": TIME_WEIGHTED_AVG_SQL,
    "events_autocorrelation": EVENTS_ACF_SQL,
    "events_changepoint": EVENTS_CHANGEPOINT_SQL,
    "asof_join_nearest": ASOF_NEAREST_SQL,
    "events_anomaly_mad": EVENTS_ANOMALY_MAD_SQL,
    "events_heatmap": EVENTS_HEATMAP_SQL,
    "events_gap_fill": EVENTS_GAP_FILL_SQL,
    "events_histogram": EVENTS_HISTOGRAM_SQL,
    "events_anomaly_zscore": EVENTS_ANOMALY_SQL,
}


def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrival-process characterization per event type: exact
    mean/median/p95 of inter-arrival gaps (consecutive events of the
    same type), the burstiness profile capacity planning and anomaly
    baselines read.

    Exactness: gaps are integer microseconds from the lead window
    (ties break by event_id); exact percentiles on integers are
    engine-identical; the mean is an integer-sum / count rounded 6dp.

    Scale: ONE shuffle on event_type; gaps and the percentile agg
    ride that partitioning. (Per-type partitions grow with the
    stream — at 100 TB the same query runs per (type, day) the way
    events_value_rank_daily does; type-level here matches the
    baseline use.)"""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    gaps = (
        e.select(
            "event_type", F.unix_micros(F.col("ts")).alias("us"), "event_id"
        )
        .withColumn("gap_us", F.col("us") - F.lag("us").over(w))
        .where(F.col("gap_us").isNotNull())
    )
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.round(F.sum("gap_us").cast("double") / F.count(F.lit(1)) / 1e6, 6).alias(
                "mean_gap_s"
            ),
            F.round(F.expr("percentile(gap_us, 0.5)") / 1e6, 6).alias("p50_gap_s"),
            F.round(F.expr("percentile(gap_us, 0.95)") / 1e6, 6).alias("p95_gap_s"),
        )
        .orderBy("event_type")
    )


EVENTS_INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY event_type
                                                ORDER BY ts, event_id) AS gap_us
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) / 1e6, 6) AS mean_gap_s,
       ROUND(quantile_cont(gap_us, 0.5) / 1e6, 6) AS p50_gap_s,
       ROUND(quantile_cont(gap_us, 0.95) / 1e6, 6) AS p95_gap_s
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["events_interarrival_stats"] = events_interarrival_stats
ORACLE["events_interarrival_stats"] = EVENTS_INTERARRIVAL_SQL


def events_type_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix of the daily-count series of every
    event-type pair — do error spikes track purchase spikes? The
    co-movement screen run before any causal digging.

    Scale design: the stream collapses ONCE to the (day, type) count
    grid (map-side-combined agg); the pairwise stats come from a
    |days|-sized self-join on the day grid, and every sufficient
    statistic (n, Σx, Σy, Σxy, Σx², Σy²) is an EXACT integer sum —
    the final correlation is one IEEE expression of exact ints,
    engine-identical with no incremental float accumulation.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    grid = ev.groupBy("day", "event_type").agg(F.count(F.lit(1)).alias("n"))
    a = grid.select("day", F.col("event_type").alias("t_a"), F.col("n").alias("x"))
    b = grid.select("day", F.col("event_type").alias("t_b"), F.col("n").alias("y"))
    j = a.join(b, "day").where(F.col("t_a") < F.col("t_b"))
    s = j.groupBy("t_a", "t_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    # Degenerate pairs (a constant series, or a single co-occurring
    # day) have den = 0 and no defined correlation — drop them, same
    # contract as timeseries_similar_users.
    return (
        s.where(
            (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
            & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
        )
        .select("t_a", "t_b", "n", F.round(num / den, 6).alias("pearson_r"))
        .orderBy("t_a", "t_b")
    )


TYPE_CORRELATION_SQL = """
WITH grid AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
j AS (
  SELECT a.event_type AS t_a, b.event_type AS t_b, a.n AS x, b.n AS y
  FROM grid a JOIN grid b ON a.day = b.day AND a.event_type < b.event_type
),
s AS (
  SELECT t_a, t_b, COUNT(*) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM j GROUP BY 1, 2
)
SELECT t_a, t_b, CAST(n AS BIGINT) AS n,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS pearson_r
FROM s
WHERE n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
ORDER BY t_a, t_b
"""

QUERIES["events_type_correlation"] = events_type_correlation
ORACLE["events_type_correlation"] = TYPE_CORRELATION_SQL


def timeseries_similar_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k similarity search over user activity series (EDBT
    top-k-similarity shape): restrict to the 20 most-active users
    (the candidate-pruning step that makes pairwise search tractable
    — 190 pairs instead of |users|²), then rank user pairs by Pearson
    correlation of their daily event counts over the days BOTH were
    active.

    Scale design: candidate pruning is a TakeOrdered top-20 on the
    per-user totals (deterministic user_id tiebreak); the day-grid
    self-join runs only between candidates (inner join on day ⇒
    co-active days). Sufficient statistics are exact integer sums;
    ties rank by (user_a, user_b). Pairs with fewer than 5 co-active
    days are dropped as unstable (counted implicitly by n_days).
    """
    k = 20
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    per_user = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("total"))
    top = per_user.orderBy(F.col("total").desc(), "user_id").limit(k).select("user_id")
    # candidate grid feeds both self-join sides (plan audit: 4 events
    # scans through the duplicated prune+grid lineage): checkpoint the
    # (day, user, n) frame — 20 users x |days|, tiny at any scale
    grid = (
        ev.join(F.broadcast(top), "user_id")
        .groupBy("day", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    a = grid.select("day", F.col("user_id").alias("u_a"), F.col("n").alias("x"))
    b = grid.select("day", F.col("user_id").alias("u_b"), F.col("n").alias("y"))
    j = a.join(b, "day").where(F.col("u_a") < F.col("u_b"))
    s = j.groupBy("u_a", "u_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    ).where(F.col("n_days") >= 5)
    num = (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    ) * F.sqrt(
        (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    scored = s.where(den != 0).select(
        "u_a", "u_b", "n_days", F.round(num / den, 6).alias("pearson_r")
    )
    return scored.orderBy(F.col("pearson_r").desc(), "u_a", "u_b").limit(10)


SIMILAR_USERS_SQL = """
WITH per_user AS (
  SELECT user_id, COUNT(*) AS total FROM events GROUP BY 1
),
top AS (
  SELECT user_id FROM per_user ORDER BY total DESC, user_id LIMIT 20
),
grid AS (
  SELECT CAST(e.ts AS DATE) AS day, e.user_id, COUNT(*) AS n
  FROM events e JOIN top t ON e.user_id = t.user_id
  GROUP BY 1, 2
),
j AS (
  SELECT a.user_id AS u_a, b.user_id AS u_b, a.n AS x, b.n AS y
  FROM grid a JOIN grid b ON a.day = b.day AND a.user_id < b.user_id
),
s AS (
  SELECT u_a, u_b, COUNT(*) AS n_days,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
         SUM(x * x) AS sxx, SUM(y * y) AS syy
  FROM j GROUP BY 1, 2
  HAVING COUNT(*) >= 5
)
SELECT u_a, u_b, CAST(n_days AS BIGINT) AS n_days,
       ROUND(CAST(n_days * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))), 6) AS pearson_r
FROM s
WHERE (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE))
       * sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))) <> 0
ORDER BY pearson_r DESC, u_a, u_b
LIMIT 10
"""

QUERIES["timeseries_similar_users"] = timeseries_similar_users
ORACLE["timeseries_similar_users"] = SIMILAR_USERS_SQL


_HOLT_SQL_BODY = """
WITH RECURSIVE
series AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY month) AS INTEGER) AS rn,
         CAST(y AS DECIMAL(28,6)) AS y
  FROM {monthly}
),
holt(rn, level, trend) AS (
  SELECT 1, (SELECT y FROM series WHERE rn = 1), CAST(0 AS DECIMAL(28,6))
  UNION ALL
  SELECT s.rn,
         CAST(ROUND(CAST(0.5 AS DECIMAL(8,6)) * s.y
                    + CAST(0.5 AS DECIMAL(8,6)) * (h.level + h.trend), 6)
              AS DECIMAL(28,6)),
         CAST(ROUND(CAST(0.3 AS DECIMAL(8,6))
                      * (CAST(ROUND(CAST(0.5 AS DECIMAL(8,6)) * s.y
                                    + CAST(0.5 AS DECIMAL(8,6)) * (h.level + h.trend), 6)
                              AS DECIMAL(28,6)) - h.level)
                    + CAST(0.7 AS DECIMAL(8,6)) * h.trend, 6)
              AS DECIMAL(28,6))
  FROM holt h JOIN series s ON s.rn = h.rn + 1
),
fin AS (
  SELECT level, trend FROM holt WHERE rn = (SELECT MAX(rn) FROM holt)
)
SELECT CAST(h.horizon AS INTEGER) AS horizon,
       CAST(level + h.horizon * trend AS DOUBLE) AS forecast,
       (SELECT MAX(rn) FROM holt) AS n_months
FROM fin, (VALUES (0), (1), (2), (3)) AS h(horizon)
ORDER BY horizon
"""


def orders_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear-trend forecast of monthly order revenue (α=0.5,
    β=0.3), horizons 0–3 months. The ORACLE runs the fold as one
    recursive CTE (pure ANSI SQL); the Spark side folds the same
    DECIMAL recurrence (quantize HALF_UP == DuckDB decimal ROUND —
    double rounding is engine-ambiguous at scaled-tie values) inside
    a single Arrow batch over the
    |months|-row series — bit-identical trajectories, but one job
    instead of one Spark job per recursion step (measured: the
    recursive-CTE execution costs ~2s of planning per iteration on
    Spark, 45s for 24 months; the fold is sub-second).

    Scale design: the fact table collapses to a |months|-row DECIMAL
    revenue series first (map-side-combined agg) — the sequential
    part touches state, not data, exactly like the streaming EWMA
    monitor; only the 4 forecast rows leave the fold.
    """
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        money("o_totalprice").alias("price"),
    )
    monthly = o.groupBy("month").agg(F.sum("price").cast("double").alias("y"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("1e-6")
        half, a3, a7 = Decimal("0.5"), Decimal("0.3"), Decimal("0.7")
        pdf = pdf.sort_values("month")
        # repr() round-trips the exact 2dp revenue (≤15 sig digits)
        ys = [Decimal(repr(float(v))) for v in pdf["y"]]
        level, trend = ys[0], Decimal(0)
        for y in ys[1:]:
            new_level = (half * y + half * (level + trend)).quantize(q6, ROUND_HALF_UP)
            trend = (a3 * (new_level - level) + a7 * trend).quantize(q6, ROUND_HALF_UP)
            level = new_level
        return pd.DataFrame(
            {
                "horizon": [0, 1, 2, 3],
                "forecast": [float(level + h * trend) for h in range(4)],
                "n_months": [len(ys)] * 4,
            }
        )

    return (
        monthly.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(fold, "horizon int, forecast double, n_months int")
        .orderBy("horizon")
    )


HOLT_FORECAST_SQL = (
    """
WITH RECURSIVE
monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS y
  FROM orders GROUP BY 1
),
"""
    + _HOLT_SQL_BODY.format(monthly="monthly").replace("WITH RECURSIVE\n", "", 1).lstrip()
)

QUERIES["orders_holt_forecast"] = orders_holt_forecast
ORACLE["orders_holt_forecast"] = HOLT_FORECAST_SQL


def orders_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the daily order-
    revenue series (trend = centered 7-day moving mean, seasonal =
    day-of-week mean of the detrended series) — the weekly-pattern
    profile behind staffing/capacity planning and the first step of
    any anomaly monitor on business metrics.

    Scale design: the order stream collapses ONCE to the |days|-sized
    daily-revenue series (map-side-combined DECIMAL agg); the
    centered window and the day-of-week aggregation run on that
    series, never the raw rows (the histogram-CDF house pattern).

    Engine-exact math: daily revenue is a DECIMAL sum; the detrended
    value is kept as 7·value − Σwindow (exact DECIMAL — no division
    inside the pipeline) and divided back by 7·n only in the final
    IEEE expression. Day-of-week is integer epoch-day math
    ((days_since_1970 + 4) mod 7, Sunday=0) — identical on both
    engines, immune to dayofweek() convention differences. Edge days
    without a full 7-day window are excluded (count = 7 filter),
    matching the textbook centered-MA convention."""
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"), money("o_totalprice").alias("rev")
    )
    daily = o.groupBy("day").agg(dsum(F.col("rev"), "rev"))
    w = Window.orderBy("day").rowsBetween(-3, 3)
    trended = daily.select(
        "day",
        "rev",
        F.sum("rev").over(w).alias("win_sum"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    ).where(F.col("win_n") == 7)
    # detrended ×7, exact DECIMAL: 7·rev − Σwindow
    det = trended.select(
        ((F.datediff(F.col("day"), F.lit("1970-01-01").cast("date")) + 4) % 7).alias(
            "dow"
        ),
        (F.col("rev") * 7 - F.col("win_sum")).alias("det7"),
    )
    return (
        det.groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("det7").alias("s7"),
        )
        .select(
            F.col("dow").cast("int").alias("dow"),
            "n_days",
            F.round(
                F.col("s7").cast("double") / (F.lit(7.0) * F.col("n_days")), 6
            ).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


SEASONAL_DECOMPOSE_SQL = """
WITH daily AS (
  SELECT o_orderdate AS day,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
trended AS (
  SELECT day, rev,
         SUM(rev) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win_sum,
         COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS win_n
  FROM daily
),
det AS (
  SELECT CAST((datediff('day', DATE '1970-01-01', day) + 4) % 7 AS INTEGER) AS dow,
         rev * 7 - win_sum AS det7
  FROM trended WHERE win_n = 7
)
SELECT dow, COUNT(*) AS n_days,
       ROUND(CAST(SUM(det7) AS DOUBLE) / (7.0 * COUNT(*)), 6) AS seasonal_index
FROM det GROUP BY dow ORDER BY dow
"""

QUERIES["orders_seasonal_decompose"] = orders_seasonal_decompose
ORACLE["orders_seasonal_decompose"] = SEASONAL_DECOMPOSE_SQL


def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test per event type on the daily-count
    series (Mann 1945, Kendall 1975) — the standard nonparametric
    "is this metric drifting" monitor: S = Σ_{i<j} sgn(x_j − x_i),
    Kendall τ_a, and the tie-corrected normal-approximation Z.

    Scale design: the raw stream collapses ONCE to the (type, day)
    count grid (map-side combine); the pairwise sign sum is a
    series×series self-join per type — |days|² pairs of a
    histogram-sized frame, never raw rows (the house series-sized
    rule); tie groups come from one more tiny agg on the same grid.
    Everything is INTEGER until the final τ/Z expressions (one IEEE
    division + sqrt each, identical on both engines)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    grid = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("x"))
    a = grid.select("event_type", F.col("day").alias("da"), F.col("x").alias("xa"))
    b = grid.select("event_type", F.col("day").alias("db"), F.col("x").alias("xb"))
    s = (
        a.join(b, "event_type")
        .where(F.col("da") < F.col("db"))
        .groupBy("event_type")
        .agg(F.sum(F.signum(F.col("xb") - F.col("xa")).cast("long")).alias("s"))
    )
    n = grid.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        grid.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_term")
        )
    )
    j = s.join(n, "event_type").join(ties, "event_type")
    var = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ).cast("double") / 18.0
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double") / F.sqrt(var))
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / F.sqrt(var))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        "n",
        "s",
        F.round(
            F.col("s").cast("double")
            / (F.col("n") * (F.col("n") - 1)).cast("double")
            * 2.0,
            6,
        ).alias("tau"),
        F.round(z, 6).alias("z"),
    ).orderBy("event_type")


MANN_KENDALL_SQL = """
WITH grid AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS x
  FROM events GROUP BY 1, 2
),
s AS (
  SELECT a.event_type,
         CAST(SUM(CASE WHEN b.x > a.x THEN 1 WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT) AS s
  FROM grid a JOIN grid b ON a.event_type = b.event_type AND a.day < b.day
  GROUP BY 1
),
n AS (SELECT event_type, COUNT(*) AS n FROM grid GROUP BY 1),
ties AS (
  SELECT event_type,
         CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term
  FROM (SELECT event_type, x, COUNT(*) AS t FROM grid GROUP BY 1, 2)
  GROUP BY 1
)
SELECT s.event_type, CAST(n.n AS BIGINT) AS n, s.s,
       ROUND(CAST(s.s AS DOUBLE) / CAST(n.n * (n.n - 1) AS DOUBLE) * 2.0, 6) AS tau,
       ROUND(CASE
         WHEN s.s > 0 THEN CAST(s.s - 1 AS DOUBLE)
              / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term AS DOUBLE) / 18.0)
         WHEN s.s < 0 THEN CAST(s.s + 1 AS DOUBLE)
              / sqrt(CAST(n.n * (n.n - 1) * (2 * n.n + 5) - ties.tie_term AS DOUBLE) / 18.0)
         ELSE 0.0 END, 6) AS z
FROM s JOIN n ON s.event_type = n.event_type
JOIN ties ON ties.event_type = s.event_type
ORDER BY s.event_type
"""

QUERIES["events_mann_kendall"] = events_mann_kendall
ORACLE["events_mann_kendall"] = MANN_KENDALL_SQL


def orders_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test (1940) on the direction of the daily
    order-revenue series: are up-days and down-days randomly
    interleaved, or does the series trend/mean-revert? The cheap
    serial-dependence screen run before any autocorrelation model.

    Scale design: one map-side-combined DECIMAL agg collapses the
    stream to the |days| revenue series; signs, run boundaries and
    counts all come from ONE ordered window pass over that series
    (histogram-sized); zero-change days are dropped (the classic
    two-category convention). Sufficient statistics (n₊, n₋, R) are
    exact integers; μ_R, σ_R and Z are one closed-form IEEE
    expression each, identical on both engines, rounded at 6dp."""
    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"), money("o_totalprice").alias("rev")
    )
    daily = o.groupBy("day").agg(dsum(F.col("rev"), "rev"))
    w = Window.orderBy("day")
    diff = (F.col("rev") - F.lag("rev").over(w))
    signed = (
        daily.withColumn("diff", diff)
        .where(F.col("diff").isNotNull() & (F.col("diff") != 0))
        .withColumn("up", (F.col("diff") > 0).cast("int"))
    )
    w2 = Window.orderBy("day")
    runs = signed.withColumn(
        "new_run",
        F.when(F.lag("up").over(w2).isNull() | (F.lag("up").over(w2) != F.col("up")), 1)
        .otherwise(0),
    )
    agg = runs.agg(
        F.sum("up").cast("bigint").alias("n_up"),
        F.sum(1 - F.col("up")).cast("bigint").alias("n_down"),
        F.sum("new_run").cast("bigint").alias("n_runs"),
    )
    n1, n2, r = F.col("n_up"), F.col("n_down"), F.col("n_runs")
    mu = 2.0 * n1 * n2 / (n1 + n2).cast("double") + 1.0
    var = (
        (2.0 * n1 * n2 * (2.0 * n1 * n2 - n1 - n2))
        / ((n1 + n2) * (n1 + n2) * (n1 + n2 - 1)).cast("double")
    )
    return agg.select(
        "n_up",
        "n_down",
        "n_runs",
        F.round(mu, 6).alias("expected_runs"),
        F.round((r.cast("double") - mu) / F.sqrt(var), 6).alias("z"),
    )


ORDERS_RUNS_TEST_SQL = """
WITH daily AS (
  SELECT o_orderdate AS day, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1
),
d AS (
  SELECT day, rev - lag(rev) OVER (ORDER BY day) AS diff FROM daily
),
signed AS (
  SELECT day, CASE WHEN diff > 0 THEN 1 ELSE 0 END AS up
  FROM d WHERE diff IS NOT NULL AND diff <> 0
),
runs AS (
  SELECT up,
         CASE WHEN lag(up) OVER (ORDER BY day) IS NULL
                OR lag(up) OVER (ORDER BY day) <> up THEN 1 ELSE 0 END AS new_run
  FROM signed
),
agg AS (
  SELECT CAST(SUM(up) AS BIGINT) AS n_up,
         CAST(SUM(1 - up) AS BIGINT) AS n_down,
         CAST(SUM(new_run) AS BIGINT) AS n_runs
  FROM runs
)
SELECT n_up, n_down, n_runs,
       ROUND(2.0 * n_up * n_down / CAST(n_up + n_down AS DOUBLE) + 1.0, 6) AS expected_runs,
       ROUND((CAST(n_runs AS DOUBLE)
              - (2.0 * n_up * n_down / CAST(n_up + n_down AS DOUBLE) + 1.0))
             / SQRT((2.0 * n_up * n_down * (2.0 * n_up * n_down - n_up - n_down))
                    / CAST((n_up + n_down) * (n_up + n_down) * (n_up + n_down - 1) AS DOUBLE)), 6)
         AS z
FROM agg
"""

QUERIES["orders_runs_test"] = orders_runs_test
ORACLE["orders_runs_test"] = ORDERS_RUNS_TEST_SQL


def events_extreme_value_gumbel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extreme-value analysis of event volume: fit a Gumbel
    distribution to the DAILY MAXIMA of hourly counts
    (method-of-moments: β = s·√6/π, μ = m − γ·β) and report the
    30-day return level — the capacity-planning question "what
    hourly peak should a month see?". (Block = day, observation =
    hourly rate: the synthetic events span ~one month, so day-blocks
    give a real maxima sample; at production spans the same plan
    fits monthly maxima of daily counts.)

    Scale design: the raw stream collapses to the |hours| count
    series, then to |days| maxima (two map-side-combined aggs);
    the fit runs on exact integer sufficient statistics (Σx, Σx² of
    the maxima) with the closing expressions in identical IEEE on
    both engines (γ and π as shared literals)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hr")
    )
    hourly = ev.groupBy("hr").agg(F.count(F.lit(1)).alias("n"))
    daily_max = hourly.groupBy(F.to_date("hr").alias("day")).agg(
        F.max("n").alias("mx")
    )
    agg = daily_max.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("mx").cast("long").alias("s1"),
        F.sum(F.col("mx") * F.col("mx")).cast("long").alias("s2"),
    )
    k = F.col("k").cast("double")
    mean = F.col("s1").cast("double") / k
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * mean) / (k - 1)
    beta = F.sqrt(var) * F.lit(0.7796968012336092)  # √6/π
    gamma = F.lit(0.5772156649015329)
    mu = mean - gamma * beta
    # 30-period return level: μ − β·ln(−ln(1 − 1/30))
    rl = mu - beta * F.log(-F.log(F.lit(1.0) - F.lit(1.0) / 30.0))
    return agg.select(
        F.col("k").cast("bigint").alias("n_blocks"),
        F.round(mean, 6).alias("mean_max"),
        F.round(F.sqrt(var), 6).alias("std_max"),
        F.round(mu, 6).alias("gumbel_mu"),
        F.round(beta, 6).alias("gumbel_beta"),
        F.round(rl, 6).alias("return_level_30d"),
    )


GUMBEL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr, COUNT(*) AS n FROM events GROUP BY 1
),
daily_max AS (
  SELECT CAST(hr AS DATE) AS day, MAX(n) AS mx FROM hourly GROUP BY 1
),
agg AS (
  SELECT COUNT(*) AS k, CAST(SUM(mx) AS BIGINT) AS s1,
         CAST(SUM(mx * mx) AS BIGINT) AS s2
  FROM daily_max
)
SELECT CAST(k AS BIGINT) AS n_blocks,
       ROUND(CAST(s1 AS DOUBLE) / k, 6) AS mean_max,
       ROUND(SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / k))
                  / (k - 1)), 6) AS std_max,
       ROUND(CAST(s1 AS DOUBLE) / k
             - 0.5772156649015329
               * (SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / k))
                       / (k - 1)) * 0.7796968012336092), 6) AS gumbel_mu,
       ROUND(SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / k))
                  / (k - 1)) * 0.7796968012336092, 6) AS gumbel_beta,
       ROUND(CAST(s1 AS DOUBLE) / k
             - 0.5772156649015329
               * (SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / k))
                       / (k - 1)) * 0.7796968012336092)
             - (SQRT((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) / k))
                     / (k - 1)) * 0.7796968012336092)
               * LN(-LN(1.0 - 1.0 / 30.0)), 6) AS return_level_30d
FROM agg
"""

QUERIES["events_extreme_value_gumbel"] = events_extreme_value_gumbel
ORACLE["events_extreme_value_gumbel"] = GUMBEL_SQL


def events_snaive_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline evaluation per event type: the seasonal-naive
    forecast (ŷ_d = y_{d−7}) scored with MASE (Hyndman & Koehler
    2006) — MAE of the seasonal forecast over MAE of the naive lag-1
    forecast. MASE < 1 ⇒ weekly seasonality carries real signal; this
    is the sanity bar every fancier forecaster must clear.

    Scale design: the stream collapses once to the (type, day) count
    grid; both lag columns come from ONE ordered window pass per type
    (series-sized); absolute errors are exact integers and MASE is
    one IEEE division, 6dp."""
    ev = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "event_type"
    )
    grid = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("y"))
    w = Window.partitionBy("event_type").orderBy("day")
    lagged = grid.withColumn("y1", F.lag("y", 1).over(w)).withColumn(
        "y7", F.lag("y", 7).over(w)
    )
    scored = lagged.where(F.col("y1").isNotNull() & F.col("y7").isNotNull())
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum(F.abs(F.col("y") - F.col("y7"))).cast("long").alias("ae_snaive"),
            F.sum(F.abs(F.col("y") - F.col("y1"))).cast("long").alias("ae_naive1"),
        )
        .select(
            "event_type",
            "n_days",
            F.round(
                F.col("ae_snaive").cast("double") / F.col("n_days").cast("double"), 6
            ).alias("mae_snaive"),
            F.round(
                F.col("ae_naive1").cast("double") / F.col("n_days").cast("double"), 6
            ).alias("mae_naive1"),
            F.round(
                F.col("ae_snaive").cast("double") / F.col("ae_naive1").cast("double"),
                6,
            ).alias("mase"),
        )
        .orderBy("event_type")
    )


EVENTS_SNAIVE_MASE_SQL = """
WITH grid AS (
  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS y
  FROM events GROUP BY 1, 2
),
lagged AS (
  SELECT event_type, y,
         lag(y, 1) OVER (PARTITION BY event_type ORDER BY day) AS y1,
         lag(y, 7) OVER (PARTITION BY event_type ORDER BY day) AS y7
  FROM grid
),
scored AS (SELECT * FROM lagged WHERE y1 IS NOT NULL AND y7 IS NOT NULL)
SELECT event_type,
       COUNT(*) AS n_days,
       ROUND(CAST(SUM(ABS(y - y7)) AS DOUBLE) / COUNT(*), 6) AS mae_snaive,
       ROUND(CAST(SUM(ABS(y - y1)) AS DOUBLE) / COUNT(*), 6) AS mae_naive1,
       ROUND(CAST(SUM(ABS(y - y7)) AS DOUBLE) / CAST(SUM(ABS(y - y1)) AS DOUBLE), 6)
         AS mase
FROM scored GROUP BY 1 ORDER BY 1
"""

QUERIES["events_snaive_mase"] = events_snaive_mase
ORACLE["events_snaive_mase"] = EVENTS_SNAIVE_MASE_SQL


def parts_croston_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (1972) for INTERMITTENT demand — the standard
    forecaster when most periods have zero demand (spare parts, slow
    movers), where Holt/seasonal methods collapse to noise: two
    exponential smoothers (α=0.2) over the nonzero-demand events
    only — demand size z and inter-demand interval p (days) — with
    forecast-per-day = z/p. Completes the forecasting battery
    (Holt, seasonal-naive+MASE, seasonal decompose) with the
    sparse-series case, run on the single part's daily demand series.

    Engine-exact: the fold is the Holt discipline — exact Decimal
    state quantized HALF_UP at 6dp each step (== DuckDB decimal
    ROUND), one Arrow-batch fold on the Spark side (a recursive CTE
    costs ~2s planning per step on Spark), a recursive CTE on the
    DuckDB side; gaps are integer datediffs; the single z/p division
    is the only IEEE step.

    Scale design: the fact table collapses to ONE part's |days|-row
    event series (pushed-down partkey filter + map-side agg); the
    sequential part touches only (z, p) state. Forecasting ALL parts
    at once would applyInPandas over partkey groups — same fold,
    partition-parallel."""
    import pandas as pd

    l = load_table(spark, sf_dir, "lineitem")
    pk = l.agg(F.min("l_partkey")).first()[0]  # model-sized driver scalar
    ev = (
        l.where(F.col("l_partkey") == pk)
        .groupBy(F.col("l_shipdate").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("y"))
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("1e-6")
        a2, a8 = Decimal("0.2"), Decimal("0.8")
        pdf = pdf.sort_values("day").reset_index(drop=True)
        ys = [Decimal(repr(float(v))).quantize(q6, ROUND_HALF_UP) for v in pdf["y"]]
        days = list(pdf["day"])
        z, p = ys[0], Decimal("1").quantize(q6)
        for i in range(1, len(ys)):
            gap = Decimal((days[i] - days[i - 1]).days)
            z = (a2 * ys[i] + a8 * z).quantize(q6, ROUND_HALF_UP)
            p = (a2 * gap + a8 * p).quantize(q6, ROUND_HALF_UP)
        return pd.DataFrame(
            {
                "n_events": [len(ys)],
                "smoothed_demand": [float(z)],
                "smoothed_interval": [float(p)],
                "croston_forecast": [float(z) / float(p)],
            }
        )

    return (
        ev.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            fold,
            "n_events int, smoothed_demand double,"
            " smoothed_interval double, croston_forecast double",
        )
    )


PARTS_CROSTON_SQL = """
WITH RECURSIVE
ev0 AS (
  SELECT l_shipdate AS day, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS y
  FROM lineitem
  WHERE l_partkey = (SELECT MIN(l_partkey) FROM lineitem)
  GROUP BY 1
),
ev AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS INTEGER) AS rn,
         CAST(y AS DECIMAL(28,6)) AS y,
         CAST(COALESCE(datediff('day', LAG(day) OVER (ORDER BY day), day), 0)
              AS DECIMAL(28,6)) AS gap
  FROM ev0
),
cro(rn, z, p) AS (
  SELECT 1, (SELECT y FROM ev WHERE rn = 1), CAST(1 AS DECIMAL(28,6))
  UNION ALL
  SELECT e.rn,
         CAST(ROUND(CAST(0.2 AS DECIMAL(8,6)) * e.y
                    + CAST(0.8 AS DECIMAL(8,6)) * c.z, 6) AS DECIMAL(28,6)),
         CAST(ROUND(CAST(0.2 AS DECIMAL(8,6)) * e.gap
                    + CAST(0.8 AS DECIMAL(8,6)) * c.p, 6) AS DECIMAL(28,6))
  FROM cro c JOIN ev e ON e.rn = c.rn + 1
),
fin AS (SELECT z, p FROM cro WHERE rn = (SELECT MAX(rn) FROM cro))
SELECT (SELECT MAX(rn) FROM cro) AS n_events,
       CAST(z AS DOUBLE) AS smoothed_demand,
       CAST(p AS DOUBLE) AS smoothed_interval,
       CAST(z AS DOUBLE) / CAST(p AS DOUBLE) AS croston_forecast
FROM fin
"""

QUERIES["parts_croston_forecast"] = parts_croston_forecast
ORACLE["parts_croston_forecast"] = PARTS_CROSTON_SQL


def orders_cusum_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM control chart (Page 1954) on daily order
    revenue: S⁺_t = max(0, S⁺_{t-1} + x_t − μ − k) with reference μ =
    mean of the first 100 days, slack k = 5% of μ, alarm h = 20% of μ
    — the online drift detector that raises BEFORE a fixed-window
    changepoint test can; complements events_changepoint (offline
    AMOC) and streaming_ewma_monitor (level smoothing) with the
    cumulative-deviation chart.

    Engine-exact: daily revenue is a DECIMAL sum; μ, k, h are 6dp
    roundings of values exact at ≤6 decimals (2dp sum ÷ 100 and ×
    0.05/0.2 — never on a .5e-6 tie); the fold quantizes HALF_UP at
    6dp per step (== DuckDB decimal ROUND) in ONE Arrow batch, vs a
    recursive CTE oracle. GREATEST(0, ·) is exact on both engines.

    Scale: the stream collapses once to the |days| series; the
    sequential part touches only S⁺ state (the Holt/Croston fold
    shape)."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("day"), money("o_totalprice").alias("rev")
    )
    daily = o.groupBy("day").agg(F.sum("rev").alias("rev"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("1e-6")
        pdf = pdf.sort_values("day").reset_index(drop=True)
        xs = [Decimal(str(v)) for v in pdf["rev"]]
        days = list(pdf["day"])
        n_ref = min(100, len(xs))
        mu = Decimal(repr(float(sum(xs[:n_ref])) / n_ref)).quantize(q6, ROUND_HALF_UP)
        k = Decimal(repr(float(mu) * 0.05)).quantize(q6, ROUND_HALF_UP)
        h = Decimal(repr(float(mu) * 0.2)).quantize(q6, ROUND_HALF_UP)
        sp = Decimal(0)
        n_sig, first_sig, max_sp = 0, None, Decimal(0)
        for d, x in zip(days, xs):
            sp = max(Decimal(0), (sp + x - mu - k).quantize(q6, ROUND_HALF_UP))
            max_sp = max(max_sp, sp)
            if sp > h:
                n_sig += 1
                if first_sig is None:
                    first_sig = d
        return pd.DataFrame(
            {
                "n_days": [len(xs)],
                "n_signals": [n_sig],
                "first_signal_day": [
                    first_sig.strftime("%Y-%m-%d") if first_sig else "none"
                ],
                "max_cusum": [float(max_sp)],
            }
        )

    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            fold,
            "n_days int, n_signals int, first_signal_day string, max_cusum double",
        )
    )


ORDERS_CUSUM_SQL = """
WITH RECURSIVE
daily AS (
  SELECT o_orderdate AS day, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY 1
),
series AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS INTEGER) AS rn, day,
         CAST(rev AS DECIMAL(28,6)) AS x
  FROM daily
),
params AS (
  SELECT CAST(ROUND(CAST((SELECT SUM(x) FROM series WHERE rn <= 100) AS DOUBLE)
                    / (SELECT LEAST(100, MAX(rn)) FROM series), 6)
              AS DECIMAL(28,6)) AS mu
),
pk AS (
  SELECT mu,
         CAST(ROUND(CAST(mu AS DOUBLE) * 0.05, 6) AS DECIMAL(28,6)) AS k,
         CAST(ROUND(CAST(mu AS DOUBLE) * 0.2, 6) AS DECIMAL(28,6)) AS h
  FROM params
),
cus(rn, sp) AS (
  SELECT 0, CAST(0 AS DECIMAL(28,6))
  UNION ALL
  SELECT s.rn,
         GREATEST(CAST(0 AS DECIMAL(28,6)),
                  CAST(ROUND(c.sp + s.x - (SELECT mu FROM pk) - (SELECT k FROM pk), 6)
                       AS DECIMAL(28,6)))
  FROM cus c JOIN series s ON s.rn = c.rn + 1
),
sig AS (
  SELECT c.rn, c.sp, s.day FROM cus c JOIN series s ON s.rn = c.rn
  WHERE c.sp > (SELECT h FROM pk)
)
SELECT (SELECT MAX(rn) FROM series) AS n_days,
       (SELECT CAST(COUNT(*) AS INTEGER) FROM sig) AS n_signals,
       COALESCE((SELECT strftime(MIN(day), '%Y-%m-%d')
                 FROM sig WHERE rn = (SELECT MIN(rn) FROM sig)), 'none')
         AS first_signal_day,
       (SELECT CAST(MAX(sp) AS DOUBLE) FROM cus) AS max_cusum
"""

QUERIES["orders_cusum_control"] = orders_cusum_control
ORACLE["orders_cusum_control"] = ORDERS_CUSUM_SQL


def events_periodogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete-Fourier periodogram of the daily event-count series
    at candidate periods {3,4,5,6,7,14} days: power(P) = (Σc_t·cos
    (2πt/P))² + (Σc_t·sin(2πt/P))² — the frequency-domain seasonality
    detector (a weekly cycle lights up P=7) complementing the
    time-domain ACF and seasonal-decompose views.

    Engine-exact: counts are integers and t is a dense rank; each
    cos/sin term is rounded at 6dp and DECIMAL-summed (the entropy
    discipline — C and Java trig can differ in the last ulp), with π
    embedded as the same 17-digit literal on both engines; the final
    A²+B² is one IEEE expression of exact decimals, rounded 6dp.

    Scale: ONE day agg collapses the stream; the trig grid is
    |days|×6 rows on the collapsed series (histogram-CDF family);
    the period table broadcasts."""
    pi = "3.141592653589793"
    e = load_table(spark, sf_dir, "events").select(F.to_date("ts").alias("day"))
    daily = e.groupBy("day").agg(F.count(F.lit(1)).alias("c"))
    t = (F.row_number().over(Window.orderBy("day")) - 1).alias("t")
    series = daily.select("day", "c").select("c", t)
    periods = spark.createDataFrame([(3,), (4,), (5,), (6,), (7,), (14,)], "period int")
    g = series.join(F.broadcast(periods), F.lit(True))
    ang = F.expr(f"CAST(2 AS DOUBLE) * CAST({pi} AS DOUBLE) * t / period")
    terms = g.select(
        "period",
        F.round(F.col("c") * F.cos(ang), 6).cast("decimal(28,6)").alias("ac"),
        F.round(F.col("c") * F.sin(ang), 6).cast("decimal(28,6)").alias("bs"),
    )
    return (
        terms.groupBy("period")
        .agg(
            F.round(
                F.pow(F.sum("ac").cast("double"), 2)
                + F.pow(F.sum("bs").cast("double"), 2),
                6,
            ).alias("power")
        )
        .orderBy("period")
    )


EVENTS_PERIODOGRAM_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events GROUP BY 1
),
series AS (
  SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) - 1 AS t FROM daily
),
g AS (
  SELECT period, c, t
  FROM series, (VALUES (3), (4), (5), (6), (7), (14)) AS p(period)
),
terms AS (
  SELECT period,
         CAST(ROUND(c * COS(CAST(2 AS DOUBLE) * CAST(3.141592653589793 AS DOUBLE) * t / period), 6)
              AS DECIMAL(28,6)) AS ac,
         CAST(ROUND(c * SIN(CAST(2 AS DOUBLE) * CAST(3.141592653589793 AS DOUBLE) * t / period), 6)
              AS DECIMAL(28,6)) AS bs
  FROM g
)
SELECT period,
       ROUND(POW(CAST(SUM(ac) AS DOUBLE), 2)
             + POW(CAST(SUM(bs) AS DOUBLE), 2), 6) AS power
FROM terms
GROUP BY 1 ORDER BY 1
"""

QUERIES["events_periodogram"] = events_periodogram
ORACLE["events_periodogram"] = EVENTS_PERIODOGRAM_SQL


def orders_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen estimator (Theil 1950, Sen 1968) of the monthly
    revenue trend: the MEDIAN of all pairwise slopes — the robust
    trend line a single promo-spike month cannot drag, complementing
    events_mann_kendall (which tests the trend's existence; Sen's
    slope quantifies it).

    Engine-exact: monthly revenue collapses to integer CENTS; each
    pairwise slope is integer milli-cents-per-month via truncating
    integer division (Spark ``DIV`` == DuckDB ``//``, both
    truncate-toward-zero — verified, and kept identical by using the
    same operator on both sides); the median of integers is picked by
    explicit row_number (avg of the two middles on even counts —
    .5-exact), so no percentile interpolation is in play.

    Scale: the fact table collapses in ONE agg to |months| rows;
    the O(months²) pair join (~3k rows) and the median sort are
    constant-size regardless of data volume."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1).alias(
                "m"
            )
        )
        .agg((F.sum(money("o_totalprice")) * 100).cast("long").alias("cents"))
    )
    a = monthly.select(F.col("m").alias("i"), F.col("cents").alias("ci"))
    b = monthly.select(F.col("m").alias("j"), F.col("cents").alias("cj"))
    slopes = (
        a.join(b, F.col("i") < F.col("j"))
        .select(
            F.expr("(cj - ci) * 1000 DIV (j - i)").alias("slope_milli")
        )
    )
    w = Window.orderBy("slope_milli")
    ranked = slopes.select(
        "slope_milli",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("np"),
    )
    mid = ranked.where(F.expr("rn = (np + 1) DIV 2 OR rn = np DIV 2 + 1"))
    return mid.agg(
        F.max("np").alias("n_pairs"),
        (F.avg(F.col("slope_milli")) / 1000.0).alias("sen_slope_cents_per_month"),
    )


ORDERS_THEIL_SEN_SQL = """
WITH monthly AS (
  SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
           + EXTRACT(month FROM o_orderdate) - 1 AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
slopes AS (
  SELECT (b.cents - a.cents) * 1000 // (b.m - a.m) AS slope_milli
  FROM monthly a JOIN monthly b ON a.m < b.m
),
ranked AS (
  SELECT slope_milli, ROW_NUMBER() OVER (ORDER BY slope_milli) AS rn,
         COUNT(*) OVER () AS np
  FROM slopes
)
SELECT MAX(np) AS n_pairs,
       AVG(slope_milli) / 1000.0 AS sen_slope_cents_per_month
FROM ranked
WHERE rn = (np + 1) // 2 OR rn = np // 2 + 1
"""

QUERIES["orders_theil_sen"] = orders_theil_sen
ORACLE["orders_theil_sen"] = ORDERS_THEIL_SEN_SQL


def orders_isotonic_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (monotone non-decreasing) regression of monthly
    revenue on time, via the minimax identity iso_i = max_{j≤i}
    min_{k≥i} mean(y[j..k]) — the closed form whose result equals the
    pool-adjacent-violators fit (Barlow et al. 1972) but is pure
    relational algebra, so BOTH engines evaluate the same O(n³)
    formula over the collapsed series instead of a sequential fold:
    the calibration-curve primitive (and the monotone trend a
    forecaster clamps to).

    Engine-exact: interval means come from DECIMAL prefix sums
    ((P_k − P_{j−1}) cast to double, ÷ integer length — exact inputs,
    identical IEEE division); min/max over identical doubles are
    exact, so the fit needs NO rounding anywhere.

    Scale: the fact table collapses in ONE map-side-combined agg to
    |months| (~80) rows; the (j,i,k) expansion is months³/6 ≈ 90k
    constant-size rows — independent of data volume."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).alias("m")
        )
        .agg(F.sum(money("o_totalprice")).alias("rev"))
    )
    w = Window.orderBy("m")
    pre = monthly.select(
        F.row_number().over(w).alias("i"),
        F.col("m"),
        F.col("rev"),
        F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("p"),
    )
    jk = (
        pre.select(F.col("i").alias("j"), (F.col("p") - F.col("rev")).alias("pj1"))
        .join(pre.select(F.col("i").alias("k"), F.col("p").alias("pk")), F.col("j") <= F.col("k"))
        .select(
            "j",
            "k",
            (
                (F.col("pk") - F.col("pj1")).cast("double")
                / (F.col("k") - F.col("j") + 1).cast("double")
            ).alias("seg_mean"),
        )
    )
    mids = pre.select(F.col("i").alias("i"))
    expanded = jk.join(
        mids, (F.col("j") <= F.col("i")) & (F.col("i") <= F.col("k"))
    )
    inner = expanded.groupBy("i", "j").agg(F.min("seg_mean").alias("tmin"))
    iso = inner.groupBy("i").agg(F.max("tmin").alias("iso_fit"))
    return (
        pre.join(iso, "i")
        .select("m", F.col("rev").cast("double").alias("revenue"), "iso_fit")
        .orderBy("m")
    )


ORDERS_ISOTONIC_SQL = """
WITH monthly AS (
  SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
           + EXTRACT(month FROM o_orderdate) AS m,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY 1
),
pre AS (
  SELECT ROW_NUMBER() OVER (ORDER BY m) AS i, m, rev,
         SUM(rev) OVER (ORDER BY m ROWS UNBOUNDED PRECEDING) AS p
  FROM monthly
),
jk AS (
  SELECT a.i AS j, b.i AS k,
         CAST(b.p - (a.p - a.rev) AS DOUBLE) / CAST(b.i - a.i + 1 AS DOUBLE)
           AS seg_mean
  FROM pre a JOIN pre b ON a.i <= b.i
),
inner_min AS (
  SELECT c.i, jk.j, MIN(jk.seg_mean) AS tmin
  FROM jk JOIN pre c ON jk.j <= c.i AND c.i <= jk.k
  GROUP BY 1, 2
),
iso AS (SELECT i, MAX(tmin) AS iso_fit FROM inner_min GROUP BY 1)
SELECT pre.m, CAST(pre.rev AS DOUBLE) AS revenue, iso.iso_fit
FROM pre JOIN iso ON pre.i = iso.i
ORDER BY pre.m
"""

QUERIES["orders_isotonic_fit"] = orders_isotonic_fit
ORACLE["orders_isotonic_fit"] = ORDERS_ISOTONIC_SQL


def events_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the hourly event-count series by rescaled-
    range (R/S) analysis (Hurst 1951; Mandelbrot & Wallis 1969):
    chunk the 720-hour series at sizes s ∈ {8,16,32,64}, compute each
    chunk's range-of-cumulative-deviations over its standard
    deviation, and fit log(R/S) ~ H·log(s) — H≈0.5 is memoryless
    traffic, H>0.5 long-range dependence (the burstiness diagnostic
    that decides whether capacity planning can use Poisson math).

    Engine-exact: chunk sizes are POWERS OF TWO, so chunk means and
    every deviation/cumulative-deviation/squared-deviation is a
    dyadic rational — exact in binary on both engines, and their
    sums are order-independent (no decimal discipline needed until
    the averaging step); per-chunk R/S is identical-IEEE, rounded
    6dp into DECIMAL for the cross-chunk average; the log-log OLS
    runs on 6dp-rounded LN terms (the transcendental discipline)
    with DECIMAL 4-point sums.

    Scale: the stream collapses once to 720 integer counts; all R/S
    work is on the |hours|×4 expansion — constant-size regardless of
    event volume."""
    ev = load_table(spark, sf_dir, "events")
    # hour index relative to 2024-01-01T00Z (epoch hour 473352);
    # the synthetic feed spans 2024-01-01..01-30 at every SF
    t = F.expr("unix_micros(ts) DIV 3600000000") - 473352
    counts = (
        ev.select(t.alias("t"))
        .where((F.col("t") >= 0) & (F.col("t") < 720))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = spark.range(720).select(F.col("id").alias("t"))
    series = spine.join(counts, "t", "left").select(
        "t", F.coalesce("cnt", F.lit(0)).alias("x")
    )
    sizes = spark.range(1).select(
        F.explode(F.array(*[F.lit(s).cast("long") for s in (8, 16, 32, 64)])).alias("s")
    )
    ch = (
        series.crossJoin(F.broadcast(sizes))
        .where(F.expr("t DIV s < 720 DIV s"))
        .select("s", F.expr("t DIV s").alias("c"), F.expr("t % s").alias("pos"), "x")
    )
    wseq = Window.partitionBy("s", "c").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wch = Window.partitionBy("s", "c")
    mean = F.sum("x").over(wch) / F.col("s")
    z = F.sum("x").over(wseq).cast("double") - (F.col("pos") + 1) * mean
    dev2 = (F.col("x") - mean) * (F.col("x") - mean)
    per_chunk = (
        ch.select("s", "c", z.alias("z"), dev2.alias("d2"))
        .groupBy("s", "c")
        .agg(
            (F.max("z") - F.min("z")).alias("r"),
            F.sqrt(F.sum("d2") / F.col("s")).alias("sd"),
        )
        .where(F.col("sd") > 0)
        .select("s", F.round(F.col("r") / F.col("sd"), 6).cast("decimal(18,6)").alias("rs"))
    )
    per_s = per_chunk.groupBy("s").agg(
        (F.sum("rs").cast("double") / F.count(F.lit(1))).alias("avg_rs")
    )
    pts = per_s.select(
        "s",
        "avg_rs",
        F.round(F.log(F.col("s").cast("double")), 6).cast("decimal(18,6)").alias("lx"),
        F.round(F.log("avg_rs"), 6).cast("decimal(18,6)").alias("ly"),
    )
    fit = pts.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        *[
            F.max(F.when(F.col("s") == sv, F.col("avg_rs"))).alias(f"rs_{sv}")
            for sv in (8, 16, 32, 64)
        ],
    )
    hurst = (
        (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
        / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    )
    return fit.select(
        "rs_8", "rs_16", "rs_32", "rs_64", hurst.alias("hurst")
    )


EVENTS_HURST_SQL = """
WITH counts AS (
  SELECT epoch_us(ts) // 3600000000 - 473352 AS t, COUNT(*) AS cnt
  FROM events
  WHERE epoch_us(ts) // 3600000000 - 473352 >= 0
    AND epoch_us(ts) // 3600000000 - 473352 < 720
  GROUP BY 1
),
series AS (
  SELECT g.t, COALESCE(c.cnt, 0) AS x
  FROM (SELECT UNNEST(range(0, 720)) AS t) g LEFT JOIN counts c ON c.t = g.t
),
ch AS (
  SELECT sz.s, se.t // sz.s AS c, se.t % sz.s AS pos, se.x
  FROM series se, (SELECT UNNEST([8, 16, 32, 64]) AS s) sz
  WHERE se.t // sz.s < 720 // sz.s
),
zstep AS (
  SELECT s, c, pos, x,
         SUM(x) OVER (PARTITION BY s, c) / s AS mean,
         CAST(SUM(x) OVER (PARTITION BY s, c ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           - (pos + 1) * (SUM(x) OVER (PARTITION BY s, c) / s) AS z
  FROM ch
),
per_chunk AS (
  SELECT s, c, MAX(z) - MIN(z) AS r,
         SQRT(SUM((x - mean) * (x - mean)) / s) AS sd
  FROM zstep GROUP BY 1, 2
),
rs AS (
  SELECT s, CAST(ROUND(r / sd, 6) AS DECIMAL(18,6)) AS rs
  FROM per_chunk WHERE sd > 0
),
per_s AS (
  SELECT s, CAST(SUM(rs) AS DOUBLE) / COUNT(*) AS avg_rs FROM rs GROUP BY 1
),
pts AS (
  SELECT s, avg_rs,
         CAST(ROUND(LN(CAST(s AS DOUBLE)), 6) AS DECIMAL(18,6)) AS lx,
         CAST(ROUND(LN(avg_rs), 6) AS DECIMAL(18,6)) AS ly
  FROM per_s
),
fit AS (
  SELECT COUNT(*) AS k, SUM(lx) AS sx, SUM(ly) AS sy,
         SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx,
         MAX(CASE WHEN s = 8 THEN avg_rs END) AS rs_8,
         MAX(CASE WHEN s = 16 THEN avg_rs END) AS rs_16,
         MAX(CASE WHEN s = 32 THEN avg_rs END) AS rs_32,
         MAX(CASE WHEN s = 64 THEN avg_rs END) AS rs_64
  FROM pts
)
SELECT rs_8, rs_16, rs_32, rs_64,
       CAST(k * sxy - sx * sy AS DOUBLE) / CAST(k * sxx - sx * sx AS DOUBLE) AS hurst
FROM fit
"""

QUERIES["events_hurst_exponent"] = events_hurst_exponent
ORACLE["events_hurst_exponent"] = EVENTS_HURST_SQL


def orders_ar2_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) one-step revenue forecast by Yule–Walker (the workhorse
    autoregressive closed form): lag-1/lag-2 autocorrelations of the
    monthly series give φ₁ = r₁(1−r₂)/(1−r₁²), φ₂ = (r₂−r₁²)/(1−r₁²),
    and the next-month forecast mean + φ₁(yₙ−ȳ) + φ₂(yₙ₋₁−ȳ) —
    the AR complement to orders_holt_forecast (exponential smoothing)
    and events_autocorrelation (which reports the r's; this one
    closes the loop into coefficients and a forecast).

    Engine-exact: the series is rounded to integer kilo-dollars, so
    the n-scaled deviations dᵢ = n·yᵢ − S are exact BIGINTs and the
    autocovariance products Σdᵢdᵢ₊ₖ stay under 2⁶³ (int64→double
    casts are correctly rounded on both engines); r₁, r₂, φ's and
    the forecast are one identically-written closing IEEE
    expression.

    Scale: one collapse to |months| integers; everything after is
    constant-size."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).alias("m")
    ).agg(
        # half-up k$ rounding in pure integer cents: (C + 50000) DIV 1e5
        # (decimal/int division coerces differently across engines)
        F.expr(
            "(CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)"
            " + 50000) DIV 100000"
        ).alias("y")
    )
    w = Window.orderBy("m")
    lagged = monthly.select(
        "m",
        "y",
        F.lag("y", 1).over(w).alias("y1"),
        F.lag("y", 2).over(w).alias("y2"),
        F.count(F.lit(1))
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("n"),
        F.sum("y")
        .over(Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("s"),
        F.row_number().over(w).alias("rn"),
    )
    d = F.col("n") * F.col("y") - F.col("s")
    d1 = F.col("n") * F.col("y1") - F.col("s")
    d2 = F.col("n") * F.col("y2") - F.col("s")
    agg = lagged.agg(
        F.max("n").alias("n"),
        F.max("s").alias("s"),
        F.sum(d * d).alias("c0"),
        F.sum(F.when(F.col("y1").isNotNull(), d * d1)).alias("c1"),
        F.sum(F.when(F.col("y2").isNotNull(), d * d2)).alias("c2"),
        F.max(F.when(F.col("rn") == F.col("n"), F.col("y"))).alias("yn"),
        F.max(F.when(F.col("rn") == F.col("n") - 1, F.col("y"))).alias("yn1"),
    )
    r1 = F.col("c1").cast("double") / F.col("c0").cast("double")
    r2 = F.col("c2").cast("double") / F.col("c0").cast("double")
    phi1 = r1 * (F.lit(1.0) - r2) / (F.lit(1.0) - r1 * r1)
    phi2 = (r2 - r1 * r1) / (F.lit(1.0) - r1 * r1)
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    fc = mean + phi1 * (F.col("yn") - mean) + phi2 * (F.col("yn1") - mean)
    return agg.select(
        F.col("n").alias("n_months"),
        r1.alias("acf1"),
        r2.alias("acf2"),
        phi1.alias("phi1"),
        phi2.alias("phi2"),
        fc.alias("forecast_next_kusd"),
    )


ORDERS_AR2_SQL = """
WITH monthly AS (
  SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
           + EXTRACT(month FROM o_orderdate) AS m,
         (CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT)
            + 50000) // 100000 AS y
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT m, y,
         LAG(y, 1) OVER (ORDER BY m) AS y1,
         LAG(y, 2) OVER (ORDER BY m) AS y2,
         COUNT(*) OVER () AS n,
         SUM(y) OVER () AS s,
         ROW_NUMBER() OVER (ORDER BY m) AS rn
  FROM monthly
),
agg AS (
  SELECT MAX(n) AS n, MAX(s) AS s,
         CAST(SUM((n * y - s) * (n * y - s)) AS BIGINT) AS c0,
         CAST(SUM(CASE WHEN y1 IS NOT NULL
                       THEN (n * y - s) * (n * y1 - s) END) AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN y2 IS NOT NULL
                       THEN (n * y - s) * (n * y2 - s) END) AS BIGINT) AS c2,
         MAX(CASE WHEN rn = n THEN y END) AS yn,
         MAX(CASE WHEN rn = n - 1 THEN y END) AS yn1
  FROM lagged
)
SELECT CAST(n AS BIGINT) AS n_months,
       CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE) AS acf1,
       CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE) AS acf2,
       CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)
         * (1.0 - CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE))
         / (1.0 - CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)
                  * (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE))) AS phi1,
       (CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE)
          - CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)
            * (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)))
         / (1.0 - CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)
                  * (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE))) AS phi2,
       CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
         + CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)
             * (1.0 - CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE))
             / (1.0 - CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)
                      * (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)))
             * (yn - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         + (CAST(c2 AS DOUBLE) / CAST(c0 AS DOUBLE)
              - CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)
                * (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)))
             / (1.0 - CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)
                      * (CAST(c1 AS DOUBLE) / CAST(c0 AS DOUBLE)))
             * (yn1 - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS forecast_next_kusd
FROM agg
"""

QUERIES["orders_ar2_forecast"] = orders_ar2_forecast
ORACLE["orders_ar2_forecast"] = ORDERS_AR2_SQL


def orders_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric bootstrap 95% CI for MEAN MONTHLY revenue (Efron
    1979), with md5-deterministic resampling: replicate b redraws the
    n-month series by index idx(b,i) = md5('boot:b:i')₄nibbles mod n —
    pseudorandom but REPRODUCIBLE and engine-portable (the
    shuffle-shard md5 discipline), so the full CI is oracle-checked,
    not just its width. The CI a finance dashboard puts around the
    revenue run-rate without normality assumptions.

    Engine-exact: each replicate mean is an integer-cents sum ÷ n
    (one IEEE division); percentile bounds are EXPLICIT order
    statistics (5th and 196th of 200 sorted replicate means — no
    interpolating percentile), and the md5-nibble index math is
    generated from one shared recipe per engine.

    Scale: the fact table collapses once to n months; the B×n draw
    grid (16k rows) is constant-size, joins the month table on the
    index hash, and aggregates map-side. B scales free of data
    volume."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).alias("mm")
        )
        .agg((F.sum(money("o_totalprice")) * 100).cast("long").alias("cents"))
    )
    w = Window.orderBy("mm")
    months = monthly.select(F.row_number().over(w).alias("rn"), "cents")
    nrow = months.agg(F.count(F.lit(1)).alias("n"))
    b = spark.range(200).select(F.col("id").alias("b"))
    grid = (
        b.crossJoin(months.select(F.col("rn").alias("i")))
        .crossJoin(F.broadcast(nrow))
        .select(
            "b",
            "n",
            F.md5(
                F.concat(
                    F.lit("boot:"),
                    F.col("b").cast("string"),
                    F.lit(":"),
                    F.col("i").cast("string"),
                )
            ).alias("hx"),
        )
        .select(
            "b",
            F.expr(
                "((locate(substring(hx, 1, 1), '0123456789abcdef') - 1) * 4096"
                " + (locate(substring(hx, 2, 1), '0123456789abcdef') - 1) * 256"
                " + (locate(substring(hx, 3, 1), '0123456789abcdef') - 1) * 16"
                " + (locate(substring(hx, 4, 1), '0123456789abcdef') - 1)) % n + 1"
            ).alias("idx"),
        )
    )
    reps = (
        grid.join(months, grid["idx"] == months["rn"])
        .groupBy("b")
        .agg(
            (F.sum("cents").cast("double") / F.count(F.lit(1)) / 100.0).alias("mean_usd")
        )
    )
    wv = Window.orderBy("mean_usd")
    ranked = reps.select("mean_usd", F.row_number().over(wv).alias("vr"))
    obs = months.agg(
        (F.sum("cents").cast("double") / F.count(F.lit(1)) / 100.0).alias("mean_obs")
    )
    return (
        ranked.where(F.col("vr").isin(5, 196))
        .agg(
            F.count(F.lit(1)).alias("n_bounds"),
            F.min("mean_usd").alias("ci_lo"),
            F.max("mean_usd").alias("ci_hi"),
        )
        .crossJoin(F.broadcast(obs))
        .select(F.lit(200).alias("n_boot"), "mean_obs", "ci_lo", "ci_hi")
    )


ORDERS_BOOTSTRAP_SQL = """
WITH monthly AS (
  SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
           + EXTRACT(month FROM o_orderdate) AS mm,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
months AS (
  SELECT ROW_NUMBER() OVER (ORDER BY mm) AS rn, cents FROM monthly
),
nrow AS (SELECT COUNT(*) AS n FROM months),
grid AS (
  SELECT b.b, m.rn AS i,
         md5(concat('boot:', CAST(b.b AS VARCHAR), ':', CAST(m.rn AS VARCHAR))) AS hx,
         nrow.n
  FROM (SELECT UNNEST(range(0, 200)) AS b) b
  CROSS JOIN months m CROSS JOIN nrow
),
draws AS (
  SELECT b,
         ((strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096
          + (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256
          + (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16
          + (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)) % n + 1 AS idx
  FROM grid
),
reps AS (
  SELECT d.b, CAST(SUM(m.cents) AS DOUBLE) / COUNT(*) / 100.0 AS mean_usd
  FROM draws d JOIN months m ON m.rn = d.idx
  GROUP BY 1
),
ranked AS (
  SELECT mean_usd, ROW_NUMBER() OVER (ORDER BY mean_usd) AS vr FROM reps
),
obs AS (
  SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100.0 AS mean_obs FROM months
)
SELECT 200 AS n_boot, obs.mean_obs,
       MIN(mean_usd) AS ci_lo, MAX(mean_usd) AS ci_hi
FROM ranked, obs
WHERE vr IN (5, 196)
GROUP BY obs.mean_obs
"""

QUERIES["orders_bootstrap_ci"] = orders_bootstrap_ci
ORACLE["orders_bootstrap_ci"] = ORDERS_BOOTSTRAP_SQL


def events_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization + motif census (Lin et al. 2003): z-normalize
    the 720-hour traffic series, PAA-compress 24-hour segments, map
    each to a 3-letter alphabet (breakpoints ±0.4307, the standard
    N(0,1) terciles), slide a 5-segment window into SAX words, and
    count each word's occurrences — the classic cheap motif/novelty
    index for long series (repeated words = recurring daily shapes;
    hapax words = anomalous days).

    Engine-exact: μ and σ come from exact integer sums (identical
    IEEE); z-scores are 6dp DECIMALs; PAA never divides — symbol
    thresholds are CROSS-MULTIPLIED (Σz vs 24·breakpoint as exact
    decimal literals); words assemble via LEAD over the segment
    index. No floats survive into the grouping key.

    Scale: the stream collapses once to 720 integers; everything
    after is constant-size (30 segments, 26 words)."""
    ev = load_table(spark, sf_dir, "events")
    t = F.expr("unix_micros(ts) DIV 3600000000") - 473352
    counts = (
        ev.select(t.alias("t"))
        .where((F.col("t") >= 0) & (F.col("t") < 720))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = spark.range(720).select(F.col("id").alias("t"))
    series = spine.join(counts, "t", "left").select(
        "t", F.coalesce("cnt", F.lit(0)).alias("x")
    )
    stats = series.agg(
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )
    z = series.crossJoin(F.broadcast(stats)).select(
        "t",
        F.expr(
            "CAST(ROUND((x - CAST(s AS DOUBLE) / n)"
            " / SQRT((s2 - CAST(s AS DOUBLE) * s / n) / n), 6) AS DECIMAL(18,6))"
        ).alias("z"),
    )
    segs = (
        z.groupBy(F.expr("t DIV 24").alias("seg"))
        .agg(F.sum("z").alias("zsum"))
        .select(
            "seg",
            F.when(F.col("zsum") < F.expr("CAST(-10.3368 AS DECIMAL(18,6))"), "a")
            .when(F.col("zsum") > F.expr("CAST(10.3368 AS DECIMAL(18,6))"), "c")
            .otherwise("b")
            .alias("sym"),
        )
    )
    w = Window.orderBy("seg")
    words = segs.select(
        "seg",
        F.concat(
            "sym",
            F.lead("sym", 1).over(w),
            F.lead("sym", 2).over(w),
            F.lead("sym", 3).over(w),
            F.lead("sym", 4).over(w),
        ).alias("word"),
    ).where(F.col("word").isNotNull())
    return (
        words.groupBy("word")
        .agg(F.count(F.lit(1)).alias("n_occurrences"), F.min("seg").alias("first_seg"))
        .orderBy(F.col("n_occurrences").desc(), F.col("word").asc())
    )


EVENTS_SAX_SQL = """
WITH counts AS (
  SELECT epoch_us(ts) // 3600000000 - 473352 AS t, COUNT(*) AS cnt
  FROM events
  WHERE epoch_us(ts) // 3600000000 - 473352 >= 0
    AND epoch_us(ts) // 3600000000 - 473352 < 720
  GROUP BY 1
),
series AS (
  SELECT g.t, COALESCE(c.cnt, 0) AS x
  FROM (SELECT UNNEST(range(0, 720)) AS t) g LEFT JOIN counts c ON c.t = g.t
),
stats AS (
  SELECT CAST(SUM(x) AS BIGINT) AS s, CAST(SUM(x * x) AS BIGINT) AS s2,
         COUNT(*) AS n
  FROM series
),
z AS (
  SELECT t,
         CAST(ROUND((x - CAST(s AS DOUBLE) / n)
                    / SQRT((s2 - CAST(s AS DOUBLE) * s / n) / n), 6)
              AS DECIMAL(18,6)) AS z
  FROM series CROSS JOIN stats
),
segs AS (
  SELECT t // 24 AS seg, SUM(z) AS zsum FROM z GROUP BY 1
),
syms AS (
  SELECT seg,
         CASE WHEN zsum < CAST(-10.3368 AS DECIMAL(18,6)) THEN 'a'
              WHEN zsum > CAST(10.3368 AS DECIMAL(18,6)) THEN 'c'
              ELSE 'b' END AS sym
  FROM segs
),
words AS (
  SELECT seg,
         sym || LEAD(sym, 1) OVER (ORDER BY seg)
             || LEAD(sym, 2) OVER (ORDER BY seg)
             || LEAD(sym, 3) OVER (ORDER BY seg)
             || LEAD(sym, 4) OVER (ORDER BY seg) AS word
  FROM syms
)
SELECT word, COUNT(*) AS n_occurrences, CAST(MIN(seg) AS BIGINT) AS first_seg
FROM words WHERE word IS NOT NULL
GROUP BY 1 ORDER BY 2 DESC, 1 ASC
"""

QUERIES["events_sax_motifs"] = events_sax_motifs
ORACLE["events_sax_motifs"] = EVENTS_SAX_SQL


def events_burst_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-state burst detection on hourly traffic by exact Viterbi
    decoding (the Kleinberg 2002 burst-automaton shape with quadratic
    emission costs): states normal (μ) and burst (2μ), transition
    penalty γ, minimum-total-cost state path over the 720-hour
    series — the episode segmentation an on-call dashboard wants
    (contiguous burst RUNS, not per-hour flags; contrast the
    memoryless z-score/MAD detectors already in the suite).

    Engine-exact — EXACT INTEGER Viterbi: μ is half-up integer
    ((S+360) DIV 720), so every emission cost (x−μ)² and the whole
    DP is integer arithmetic with a deterministic stay-on-tie rule;
    the decoded path travels as a '0'/'1' STRING through the DP (the
    backtrack-free trick), so both engines must produce the
    byte-identical path — Spark folds it in ONE Arrow batch (the
    CUSUM/Holt house shape: state-sized sequential work never goes
    through a 2s/iteration Spark recursive CTE), while the oracle
    runs the same recurrence as a DuckDB recursive CTE.

    Scale: the stream collapses once to 720 integers; the fold is
    O(hours) on one executor — series-sized, not data-sized."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    t = F.expr("unix_micros(ts) DIV 3600000000") - 473352
    counts = (
        ev.select(t.alias("t"))
        .where((F.col("t") >= 0) & (F.col("t") < 720))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = spark.range(720).select(F.col("id").alias("t"))
    series = spine.join(counts, "t", "left").select(
        "t", F.coalesce("cnt", F.lit(0)).alias("x")
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("t").reset_index(drop=True)
        xs = [int(v) for v in pdf["x"]]
        n = len(xs)
        s = sum(xs)
        mu = (s + n // 2) // n
        mub = 2 * mu
        gamma = mu * mu // 4
        cn, cb = (xs[0] - mu) ** 2, (xs[0] - mub) ** 2
        pn, pb = "0", "1"
        for x in xs[1:]:
            en, eb = (x - mu) ** 2, (x - mub) ** 2
            # stay-on-tie: <= prefers the same-state predecessor
            ncn, npn = (
                (cn + en, pn + "0") if cn <= cb + gamma else (cb + gamma + en, pb + "0")
            )
            ncb, npb = (
                (cb + eb, pb + "1") if cb <= cn + gamma else (cn + gamma + eb, pn + "1")
            )
            cn, cb, pn, pb = ncn, ncb, npn, npb
        cost, path = (cn, pn) if cn <= cb else (cb, pb)
        import re

        runs = re.findall("1+", path)
        first = path.find("1")
        return pd.DataFrame(
            {
                "n_hours": [n],
                "mu": [mu],
                "total_cost": [cost],
                "n_burst_hours": [path.count("1")],
                "n_episodes": [len(runs)],
                "first_burst_hour": [first],
            }
        )

    return (
        series.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            fold,
            "n_hours int, mu long, total_cost long, n_burst_hours int,"
            " n_episodes int, first_burst_hour int",
        )
    )


EVENTS_BURST_VITERBI_SQL = """
WITH RECURSIVE counts AS (
  SELECT epoch_us(ts) // 3600000000 - 473352 AS t, COUNT(*) AS cnt
  FROM events
  WHERE epoch_us(ts) // 3600000000 - 473352 >= 0
    AND epoch_us(ts) // 3600000000 - 473352 < 720
  GROUP BY 1
),
series AS (
  SELECT g.t, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS x
  FROM (SELECT UNNEST(range(0, 720)) AS t) g LEFT JOIN counts c ON c.t = g.t
),
params AS (
  SELECT COUNT(*) AS n,
         (SUM(x) + COUNT(*) // 2) // COUNT(*) AS mu
  FROM series
),
dp(t, cn, cb, pn, pb) AS (
  SELECT 0,
         (s.x - p.mu) * (s.x - p.mu),
         (s.x - 2 * p.mu) * (s.x - 2 * p.mu),
         '0', '1'
  FROM series s, params p WHERE s.t = 0
  UNION ALL
  SELECT s.t,
         CASE WHEN d.cn <= d.cb + (p.mu * p.mu // 4)
              THEN d.cn ELSE d.cb + (p.mu * p.mu // 4) END
           + (s.x - p.mu) * (s.x - p.mu),
         CASE WHEN d.cb <= d.cn + (p.mu * p.mu // 4)
              THEN d.cb ELSE d.cn + (p.mu * p.mu // 4) END
           + (s.x - 2 * p.mu) * (s.x - 2 * p.mu),
         CASE WHEN d.cn <= d.cb + (p.mu * p.mu // 4) THEN d.pn ELSE d.pb END || '0',
         CASE WHEN d.cb <= d.cn + (p.mu * p.mu // 4) THEN d.pb ELSE d.pn END || '1'
  FROM dp d JOIN series s ON s.t = d.t + 1, params p
),
final AS (
  SELECT CASE WHEN cn <= cb THEN cn ELSE cb END AS cost,
         CASE WHEN cn <= cb THEN pn ELSE pb END AS path
  FROM dp WHERE t = 719
)
SELECT CAST(p.n AS INTEGER) AS n_hours,
       CAST(p.mu AS BIGINT) AS mu,
       CAST(f.cost AS BIGINT) AS total_cost,
       CAST(length(f.path) - length(replace(f.path, '1', '')) AS INTEGER)
         AS n_burst_hours,
       CAST(len(regexp_extract_all(f.path, '1+')) AS INTEGER) AS n_episodes,
       CAST(strpos(f.path, '1') - 1 AS INTEGER) AS first_burst_hour
FROM final f, params p
"""

QUERIES["events_burst_viterbi"] = events_burst_viterbi
ORACLE["events_burst_viterbi"] = EVENTS_BURST_VITERBI_SQL


def orders_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt–Winters ADDITIVE-SEASONAL forecast of monthly revenue
    (α=0.4, β=0.2, γ=0.3, period 12) — the third rung of the
    exponential-smoothing ladder (EWMA → Holt → Holt-Winters), the
    first that can follow the Q4 bump: standard init (level = mean of
    season 1, trend = (mean₂ − mean₁)/12, seasonals = season-1
    deviations), then the classic three-equation recurrence; emits
    horizon 1–3 forecasts.

    Engine-exact: the Holt discipline extended with seasonal state —
    every update quantizes HALF_UP at 6dp (== DuckDB decimal ROUND);
    the 12-slot seasonal vector travels through the oracle's
    recursive CTE as a DECIMAL LIST rebuilt per step via
    list_transform (a Spark recursive CTE would pay ~2s planning per
    month — the fold runs in ONE Arrow batch instead).

    Scale: fact table → |months| DECIMAL series in one agg; the
    sequential part is state-sized."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        money("o_totalprice").alias("price"),
    )
    monthly = o.groupBy("month").agg(F.sum("price").cast("double").alias("y"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("1e-6")
        al, be, ga = Decimal("0.4"), Decimal("0.2"), Decimal("0.3")
        one = Decimal(1)
        pdf = pdf.sort_values("month").reset_index(drop=True)
        ys = [Decimal(repr(float(v))) for v in pdf["y"]]
        n = len(ys)
        # init divisions in pure integer micro-dollars with explicit
        # half-up — decimal/12 quotients can land exactly on .5e-6
        # (d·1e6 ≡ 6 mod 12), where double-path ROUND is ambiguous
        mu = 1_000_000
        s1u = int(sum(ys[:12]) * mu)
        s2u = int(sum(ys[12:24]) * mu)
        m1u = (s1u + 6) // 12
        m2u = (s2u + 6) // 12
        diff = m2u - m1u
        tru = (diff + 6) // 12 if diff >= 0 else -((-diff + 6) // 12)
        m1 = Decimal(m1u) / mu
        m2 = Decimal(m2u) / mu
        level = m1
        trend = Decimal(tru) / mu
        seas = [(ys[i] - m1).quantize(q6, ROUND_HALF_UP) for i in range(12)]
        for t in range(12, n):
            idx = t % 12
            prev_l = level
            level = (al * (ys[t] - seas[idx]) + (one - al) * (level + trend)).quantize(
                q6, ROUND_HALF_UP
            )
            trend = (be * (level - prev_l) + (one - be) * trend).quantize(
                q6, ROUND_HALF_UP
            )
            seas[idx] = (ga * (ys[t] - level) + (one - ga) * seas[idx]).quantize(
                q6, ROUND_HALF_UP
            )
        rows = {"horizon": [], "forecast": []}
        for h in (1, 2, 3):
            rows["horizon"].append(h)
            rows["forecast"].append(
                float(level + Decimal(h) * trend + seas[(n + h - 1) % 12])
            )
        return pd.DataFrame(rows)

    return (
        monthly.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(fold, "horizon int, forecast double")
        .select("horizon", "forecast")
        .orderBy("horizon")
    )


ORDERS_HOLT_WINTERS_SQL = """
WITH RECURSIVE monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS y
  FROM orders GROUP BY 1
),
series AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY month) AS INTEGER) AS t,
         CAST(y AS DECIMAL(28,6)) AS y
  FROM monthly
),
raw AS (
  SELECT CAST((SELECT SUM(y) FROM series WHERE t <= 12) * 1000000 AS BIGINT) AS s1u,
         CAST((SELECT SUM(y) FROM series WHERE t BETWEEN 13 AND 24) * 1000000
              AS BIGINT) AS s2u,
         (SELECT MAX(t) FROM series) AS n
),
init AS (
  -- ×1e-6 multiplication (never division: DuckDB division always
  -- goes double) rebuilds the exact 6dp decimal from integer micros
  SELECT CAST(CAST((s1u + 6) // 12 AS DECIMAL(28,6))
              * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS m1,
         CAST(CAST((s2u + 6) // 12 AS DECIMAL(28,6))
              * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(28,6)) AS m2,
         n,
         (s2u + 6) // 12 - (s1u + 6) // 12 AS diffu
  FROM raw
),
hw(t, l, b, s) AS (
  SELECT 12, CAST(m1 AS DECIMAL(28,6)),
         CAST(CAST(CASE WHEN diffu >= 0 THEN (diffu + 6) // 12
                        ELSE -((-diffu + 6) // 12) END AS DECIMAL(28,6))
              * CAST(0.000001 AS DECIMAL(7,6)) AS DECIMAL(28,6)),
         (SELECT list(CAST(ROUND(sv.y - i.m1, 6) AS DECIMAL(28,6)) ORDER BY sv.t)
          FROM series sv, init i WHERE sv.t <= 12)
  FROM init
  UNION ALL
  SELECT s2.t,
         CAST(ROUND(0.4 * (s2.y - h.s[(s2.t - 1) % 12 + 1])
                    + 0.6 * (h.l + h.b), 6) AS DECIMAL(28,6)),
         CAST(ROUND(0.2 * (CAST(ROUND(0.4 * (s2.y - h.s[(s2.t - 1) % 12 + 1])
                                      + 0.6 * (h.l + h.b), 6) AS DECIMAL(28,6)) - h.l)
                    + 0.8 * h.b, 6) AS DECIMAL(28,6)),
         list_transform(range(1, 13), i ->
           CASE WHEN i = (s2.t - 1) % 12 + 1
                THEN CAST(ROUND(0.3 * (s2.y
                         - CAST(ROUND(0.4 * (s2.y - h.s[(s2.t - 1) % 12 + 1])
                                      + 0.6 * (h.l + h.b), 6) AS DECIMAL(28,6)))
                         + 0.7 * h.s[i], 6) AS DECIMAL(28,6))
                ELSE h.s[i] END)
  FROM hw h JOIN series s2 ON s2.t = h.t + 1
),
final AS (
  SELECT h.l, h.b, h.s, i.n FROM hw h, init i WHERE h.t = i.n
)
SELECT hz.h AS horizon,
       CAST(l + hz.h * b + s[(n + hz.h - 1) % 12 + 1] AS DOUBLE) AS forecast
FROM final, (SELECT UNNEST([1, 2, 3]) AS h) hz
ORDER BY horizon
"""

QUERIES["orders_holt_winters"] = orders_holt_winters
ORACLE["orders_holt_winters"] = ORDERS_HOLT_WINTERS_SQL


def orders_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin forecast backtest (Tashman 2000): six monthly
    origins held out at the end of the revenue series, each
    forecast 1-step-ahead by TWO closed-form baselines — seasonal
    naive (y[t−12]) and the drift method (y[t−1] + (y[t−1] −
    y[1])/(t−2)) — scored by absolute error in cents; the
    out-of-sample leaderboard that decides which fancier model
    (Holt, Holt-Winters, AR2 — all in the suite) actually earns its
    keep. Closed-form forecasters keep the whole backtest pure
    relational algebra: no per-origin refitting loop.

    Engine-exact: the series is integer cents; seasonal-naive errors
    are integers; drift forecasts are FLOOR-quantized to integer
    cents (floor of identical IEEE doubles — no rounding-tie
    exposure), so every error and the per-method MAE comparison is
    exact integer math.

    Scale: one collapse to |months|; the backtest is a 6-row lag
    projection."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).alias("mm")
        )
        .agg((F.sum(money("o_totalprice")) * 100).cast("long").alias("cents"))
    )
    w = Window.orderBy("mm")
    ser = monthly.select(
        F.row_number().over(w).alias("t"),
        "cents",
        F.lag("cents", 1).over(w).alias("y1"),
        F.lag("cents", 12).over(w).alias("y12"),
        F.first("cents").over(
            w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("yfirst"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    )
    folds = ser.where(F.col("t") > F.col("n") - 6).select(
        "t",
        "cents",
        F.col("y12").alias("fc_snaive"),
        F.expr(
            "CAST(FLOOR(CAST(y1 AS DOUBLE) + (CAST(y1 AS DOUBLE) - CAST(yfirst AS DOUBLE))"
            " / (t - 2)) AS BIGINT)"
        ).alias("fc_drift"),
    )
    per_fold = folds.select(
        "t",
        F.abs(F.col("cents") - F.col("fc_snaive")).alias("ae_snaive"),
        F.abs(F.col("cents") - F.col("fc_drift")).alias("ae_drift"),
    )
    return per_fold.agg(
        F.count(F.lit(1)).alias("n_folds"),
        F.expr("CAST(SUM(ae_snaive) DIV 100 AS DOUBLE)").alias("sum_ae_snaive_usd"),
        F.expr("CAST(SUM(ae_drift) DIV 100 AS DOUBLE)").alias("sum_ae_drift_usd"),
        F.sum(
            F.when(F.col("ae_snaive") < F.col("ae_drift"), 1).otherwise(0)
        ).alias("snaive_wins"),
    )


ORDERS_BACKTEST_SQL = """
WITH monthly AS (
  SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
           + EXTRACT(month FROM o_orderdate) AS mm,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
ser AS (
  SELECT ROW_NUMBER() OVER (ORDER BY mm) AS t, cents,
         LAG(cents, 1) OVER (ORDER BY mm) AS y1,
         LAG(cents, 12) OVER (ORDER BY mm) AS y12,
         FIRST_VALUE(cents) OVER (ORDER BY mm) AS yfirst,
         COUNT(*) OVER () AS n
  FROM monthly
),
folds AS (
  SELECT t, cents, y12 AS fc_snaive,
         CAST(FLOOR(CAST(y1 AS DOUBLE)
                    + (CAST(y1 AS DOUBLE) - CAST(yfirst AS DOUBLE)) / (t - 2))
              AS BIGINT) AS fc_drift
  FROM ser WHERE t > n - 6
)
SELECT COUNT(*) AS n_folds,
       CAST(SUM(ABS(cents - fc_snaive)) // 100 AS DOUBLE) AS sum_ae_snaive_usd,
       CAST(SUM(ABS(cents - fc_drift)) // 100 AS DOUBLE) AS sum_ae_drift_usd,
       CAST(SUM(CASE WHEN ABS(cents - fc_snaive) < ABS(cents - fc_drift)
                     THEN 1 ELSE 0 END) AS BIGINT) AS snaive_wins
FROM folds
"""

QUERIES["orders_forecast_backtest"] = orders_forecast_backtest
ORACLE["orders_forecast_backtest"] = ORDERS_BACKTEST_SQL


def events_esd_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalized ESD outlier detection (Rosner 1983; the engine
    inside Twitter's S-H-ESD): THREE unrolled rounds of "remove the
    largest |z| day, recompute mean/std" over the daily event-count
    series, reporting each round's candidate day, its test statistic
    R, and the sample size — the multi-outlier test that masking
    breaks plain z-score detectors on (the suite's zscore/MAD
    detectors flag against FIXED stats; ESD re-estimates after each
    removal).

    Engine-exact: each round's mean/std come from exact integer
    sums of the SURVIVING days (layered CTEs, no recursion); R =
    |x−μ|/σ is one identical IEEE expression; the argmax day breaks
    ties on (R DESC via exact comparisons, day ASC). No rounding.

    Scale: the stream collapses once to ~30 integer day counts;
    three rounds of day-count-sized arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.expr("unix_micros(ts) DIV 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    daily = daily.localCheckpoint(eager=False)
    surviving = daily
    rows = []
    for rnd in (1, 2, 3):
        stats = surviving.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("s"),
            F.sum(F.col("x") * F.col("x")).alias("q"),
        )
        scored = surviving.crossJoin(F.broadcast(stats)).select(
            "day",
            "x",
            F.expr(
                "ABS(x - CAST(s AS DOUBLE) / n)"
                " / SQRT((q - CAST(s AS DOUBLE) * s / n) / (n - 1))"
            ).alias("r"),
            "n",
        )
        wmax = Window.orderBy(F.col("r").desc(), F.col("day").asc())
        top = scored.withColumn("rn", F.row_number().over(wmax)).where(
            F.col("rn") == 1
        )
        top = top.localCheckpoint(eager=False)
        rows.append(
            top.select(
                F.lit(rnd).alias("round"),
                F.col("day").cast("long").alias("candidate_day"),
                F.col("x").alias("day_count"),
                F.col("r").alias("esd_stat"),
                F.col("n").alias("sample_size"),
            )
        )
        surviving = surviving.join(
            top.select(F.col("day").alias("rm")), surviving["day"] == F.col("rm"), "left_anti"
        )
    res = rows[0]
    for df in rows[1:]:
        res = res.unionByName(df)
    return res.orderBy("round")


def _esd_sql() -> str:
    parts = []
    prev = "d0"
    for rnd in (1, 2, 3):
        parts.append(
            f"""st{rnd} AS (
  SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS q
  FROM {prev}
),
sc{rnd} AS (
  SELECT d.day, d.x,
         ABS(d.x - CAST(st.s AS DOUBLE) / st.n)
           / SQRT((st.q - CAST(st.s AS DOUBLE) * st.s / st.n) / (st.n - 1)) AS r,
         st.n
  FROM {prev} d, st{rnd} st
),
top{rnd} AS (
  SELECT * FROM (
    SELECT day, x, r, n, ROW_NUMBER() OVER (ORDER BY r DESC, day ASC) AS rn
    FROM sc{rnd}
  ) q WHERE rn = 1
),
d{rnd} AS (
  SELECT d.day, d.x FROM {prev} d ANTI JOIN top{rnd} t ON t.day = d.day
)"""
        )
        prev = f"d{rnd}"
    body = ",\n".join(parts)
    rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS round, CAST(day AS BIGINT) AS candidate_day,"
        f" CAST(x AS BIGINT) AS day_count, r AS esd_stat,"
        f" CAST(n AS BIGINT) AS sample_size FROM top{r}"
        for r in (1, 2, 3)
    )
    return f"""
WITH d0 AS (
  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x
  FROM events GROUP BY 1
),
{body}
SELECT * FROM ({rows}) z ORDER BY round
"""


QUERIES["events_esd_outliers"] = events_esd_outliers
ORACLE["events_esd_outliers"] = _esd_sql()


def orders_running_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact RUNNING median of monthly revenue — the robust
    expanding-window center a finance dashboard tracks next to the
    running mean (which one outlier month drags): for each month t,
    the median of months 1..t, via the cumulative-histogram
    formulation rather than any percentile window (no interpolation,
    no per-prefix sort): month t's median is the smallest value v
    whose count-of-≤v among the first t months reaches ⌈t/2⌉ (odd t)
    — and the mean of that v with the next distinct prefix value
    when t is even and the split lands between ranks.

    Engine-exact: revenue is integer cents; prefix rank counts are
    an O(months²) integer self-join (constant-size — 80² = 6,400
    pairs); even-t midpoints are exact .5 cents emitted as ×2
    integer ("doubled median") to stay integer-pure end to end.

    Scale: fact table collapses once; the quadratic part is
    month-count-sized forever."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).alias("mm")
        )
        .agg((F.sum(money("o_totalprice")) * 100).cast("long").alias("cents"))
    )
    w = Window.orderBy("mm")
    # the 80-row month series feeds a/b/v plus the lo/hi closes (7
    # orders scans) — a checkpoint A/B-LOST at sf0.1 (plain 0.52 /
    # lazy 0.62 / eager 0.85 min-of-3; the monthly collapse is cheap)
    ser = monthly.select(F.row_number().over(w).alias("t"), "cents")
    a = ser.select(F.col("t"))
    b = ser.select(F.col("t").alias("s"), F.col("cents").alias("u"))
    v = ser.select(F.col("t").alias("r"), F.col("cents").alias("x"))
    # rank of each prefix candidate u within prefix 1..t: the O(n³)
    # integer triple join is month-count-sized (80³/2 ≈ 256k rows)
    ranks = (
        a.join(b, F.col("s") <= F.col("t"))
        .join(v, F.col("r") <= F.col("t"))
        .groupBy("t", "u")
        .agg(F.count(F.when(F.expr("x <= u"), 1)).alias("le"))
    )
    # lo = smallest u with le >= ceil(t/2); hi = smallest u with le >= t/2 + 1
    lo = (
        ranks.where(F.expr("le * 2 >= t"))
        .groupBy("t")
        .agg(F.min("u").alias("lo"))
    )
    hi = (
        ranks.where(F.expr("le * 2 >= t + 2 - (t % 2) * 2"))
        .groupBy("t")
        .agg(F.min("u").alias("hi"))
    )
    med = lo.join(hi, "t").select(
        "t",
        F.when(F.expr("t % 2 = 1"), F.col("hi") * 2)
        .otherwise(F.col("lo") + F.col("hi"))
        .alias("median_x2_cents"),
    )
    return (
        ser.join(med, "t")
        .select(
            "t",
            (F.col("cents").cast("double") / 100).alias("revenue_usd"),
            (F.col("median_x2_cents").cast("double") / 200).alias("running_median_usd"),
        )
        .orderBy("t")
    )


ORDERS_RUNNING_MEDIAN_SQL = """
WITH monthly AS (
  SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
           + EXTRACT(month FROM o_orderdate) AS mm,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
ser AS (SELECT ROW_NUMBER() OVER (ORDER BY mm) AS t, cents FROM monthly),
ranks AS (
  SELECT a.t, b.cents AS u,
         COUNT(CASE WHEN v.cents <= b.cents THEN 1 END) AS le
  FROM ser a JOIN ser b ON b.t <= a.t JOIN ser v ON v.t <= a.t
  GROUP BY 1, 2
),
lo AS (SELECT t, MIN(u) AS lo FROM ranks WHERE le * 2 >= t GROUP BY 1),
hi AS (
  SELECT t, MIN(u) AS hi FROM ranks
  WHERE le * 2 >= t + 2 - (t % 2) * 2 GROUP BY 1
),
med AS (
  SELECT lo.t,
         CASE WHEN lo.t % 2 = 1 THEN hi.hi * 2 ELSE lo.lo + hi.hi END
           AS median_x2_cents
  FROM lo JOIN hi ON hi.t = lo.t
)
SELECT ser.t, CAST(ser.cents AS DOUBLE) / 100 AS revenue_usd,
       CAST(med.median_x2_cents AS DOUBLE) / 200 AS running_median_usd
FROM ser JOIN med ON med.t = ser.t
ORDER BY ser.t
"""

QUERIES["orders_running_median"] = orders_running_median
ORACLE["orders_running_median"] = ORDERS_RUNNING_MEDIAN_SQL


def orders_xbar_r_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X̄-R control chart (Shewhart; the SPC workhorse): daily
    revenues grouped into consecutive 5-day subgroups; per subgroup
    the mean X̄ and range R, then the chart constants for n=5
    (A2=0.577, D3=0, D4=2.114) give the control limits X̄̄ ± A2·R̄ and
    [D3·R̄, D4·R̄]; emits the limits and every out-of-control
    subgroup — the assignable-cause detector that complements CUSUM
    (cumulative drift) and EWMA (level smoothing) with the classic
    subgroup chart.

    Engine-exact: daily revenue is integer cents; subgroup sums and
    ranges are integers, so X̄ values are exact cents/5 (sums kept
    ×5-scaled until the final projection); the grand means and every
    limit comparison are cross-multiplied integer arithmetic — NO
    floating point until display.

    Scale: the fact table collapses once to |days|; subgroup math is
    day-count-sized."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg((F.sum(money("o_totalprice")) * 100).cast("long").alias("cents"))
    )
    w = Window.orderBy("day")
    idx = daily.select("day", "cents", ((F.row_number().over(w) - 1)).alias("i"))
    sub = (
        idx.select(F.expr("i DIV 5").alias("g"), "cents", "i")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("cents").alias("s5"),
            (F.max("cents") - F.min("cents")).alias("r"),
        )
        .where(F.col("cnt") == 5)
    )
    tot = sub.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("s5").alias("ss"),
        F.sum("r").alias("sr"),
    )
    # out-of-control tests in scaled integers:
    #   xbar test: |s5/5 - ss/(5k)| > 0.577*sr/k
    #     ⟺ |k*s5 - ss| * 1000 > 5 * 577 * sr   (×5k, ×1000)
    #   range test: r*k*1000 > 2114*sr  or  r*k*1000 < 0*sr
    flagged = sub.crossJoin(F.broadcast(tot)).select(
        "g",
        "s5",
        "r",
        "k",
        "ss",
        "sr",
        (F.abs(F.col("k") * F.col("s5") - F.col("ss")) * 1000
         > F.lit(5) * 577 * F.col("sr")).alias("xbar_ooc"),
        (F.col("r") * F.col("k") * 1000 > F.lit(2114) * F.col("sr")).alias("r_ooc"),
    )
    return flagged.agg(
        F.max("k").alias("n_subgroups"),
        (F.max("ss").cast("double") / (F.max("k") * 5) / 100).alias("xbarbar_usd"),
        (F.max("sr").cast("double") / F.max("k") / 100).alias("rbar_usd"),
        F.sum(F.when(F.col("xbar_ooc"), 1).otherwise(0)).alias("n_xbar_violations"),
        F.sum(F.when(F.col("r_ooc"), 1).otherwise(0)).alias("n_range_violations"),
    )


ORDERS_XBAR_R_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
idx AS (
  SELECT day, cents, ROW_NUMBER() OVER (ORDER BY day) - 1 AS i FROM daily
),
sub AS (
  SELECT i // 5 AS g, COUNT(*) AS cnt, CAST(SUM(cents) AS BIGINT) AS s5,
         MAX(cents) - MIN(cents) AS r
  FROM idx GROUP BY 1 HAVING COUNT(*) = 5
),
tot AS (
  SELECT COUNT(*) AS k, CAST(SUM(s5) AS BIGINT) AS ss,
         CAST(SUM(r) AS BIGINT) AS sr
  FROM sub
),
flagged AS (
  SELECT sub.g, sub.s5, sub.r, tot.k, tot.ss, tot.sr,
         ABS(tot.k * sub.s5 - tot.ss) * 1000 > 5 * 577 * tot.sr AS xbar_ooc,
         sub.r * tot.k * 1000 > 2114 * tot.sr AS r_ooc
  FROM sub, tot
)
SELECT MAX(k) AS n_subgroups,
       CAST(MAX(ss) AS DOUBLE) / (MAX(k) * 5) / 100 AS xbarbar_usd,
       CAST(MAX(sr) AS DOUBLE) / MAX(k) / 100 AS rbar_usd,
       CAST(SUM(CASE WHEN xbar_ooc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_xbar_violations,
       CAST(SUM(CASE WHEN r_ooc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_range_violations
FROM flagged
"""

QUERIES["orders_xbar_r_chart"] = orders_xbar_r_chart
ORACLE["orders_xbar_r_chart"] = ORDERS_XBAR_R_SQL


def orders_weibull_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weibull fit of order fulfillment time by median-rank
    regression (the reliability-engineering standard: linearize
    F(t) = 1 − exp(−(t/η)^β) as ln(−ln(1−F)) = β·ln t − β·ln η and
    OLS on the Benard median ranks (i−0.3)/(n+0.4)) — the shape
    parameter β says whether fulfillment hazard rises (β>1, aging
    backlog) or falls with time, which no mean/percentile summary
    reveals. Fits on the day-granular duration HISTOGRAM.

    Engine-exact: durations are integer days; median ranks come from
    exact histogram-CDF integer midpoint ranks; every ln / ln(−ln)
    term is FLOOR-quantized to INTEGER MICROS (the power-iteration
    discipline — decimal×bigint sums would hit Spark's precision-
    loss rescaling, and ROUND has tie exposure), weighted sums stay
    BIGINT with a per-term 1e6 scale-down on the quadratic products,
    and β / η close in one identical IEEE expression with a single
    6dp-rounded EXP.

    Scale: fact table → duration histogram in one agg; the
    regression runs on ≤ a few hundred histogram cells."""
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    done = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("fin"))
    dur = (
        o.join(done, o["o_orderkey"] == done["l_orderkey"])
        .select((F.datediff("fin", "o_orderdate") + 1).alias("t"))
        .where(F.col("t") > 0)
    )
    hist = dur.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    wc = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ranked = hist.select(
        "t",
        "c",
        F.sum("c").over(wc).alias("cum"),
        F.sum("c").over(wt).alias("n"),
    )
    terms = ranked.select(
        "c",
        F.expr("CAST(FLOOR(LN(CAST(t AS DOUBLE)) * 1e6) AS BIGINT)").alias("lxu"),
        F.expr(
            "CAST(FLOOR(LN(-LN(1.0 - (2.0 * cum - c + 0.4)"
            " / (2.0 * n + 0.8))) * 1e6) AS BIGINT)"
        ).alias("lyu"),
    )
    m = terms.agg(
        F.sum("c").alias("nw"),
        F.sum(F.col("lxu") * F.col("c")).alias("sx"),
        F.sum(F.col("lyu") * F.col("c")).alias("sy"),
        F.sum(F.expr("((lxu * lyu) DIV 1000000) * c")).alias("sxy"),
        F.sum(F.expr("((lxu * lxu) DIV 1000000) * c")).alias("sxx"),
    )
    n = F.col("nw").cast("double")
    sxd = F.col("sx").cast("double") / F.lit(1e6)
    syd = F.col("sy").cast("double") / F.lit(1e6)
    sxyd = F.col("sxy").cast("double") / F.lit(1e6)
    sxxd = F.col("sxx").cast("double") / F.lit(1e6)
    beta = (n * sxyd - sxd * syd) / (n * sxxd - sxd * sxd)
    ln_eta = (sxd * beta - syd) / (n * beta)
    return m.select(
        F.col("nw").alias("n_orders"),
        beta.alias("weibull_shape"),
        F.round(F.exp(ln_eta), 6).alias("weibull_scale_days"),
    )


ORDERS_WEIBULL_SQL = """
WITH done AS (
  SELECT l_orderkey, MAX(l_shipdate) AS fin FROM lineitem GROUP BY 1
),
dur AS (
  SELECT t FROM (
    SELECT datediff('day', CAST(o.o_orderdate AS DATE), CAST(d.fin AS DATE)) + 1 AS t
    FROM orders o JOIN done d ON d.l_orderkey = o.o_orderkey
  ) q WHERE t > 0
),
hist AS (SELECT t, COUNT(*) AS c FROM dur GROUP BY 1),
ranked AS (
  SELECT t, c,
         SUM(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS n
  FROM hist
),
terms AS (
  SELECT c,
         CAST(FLOOR(LN(CAST(t AS DOUBLE)) * 1e6) AS BIGINT) AS lxu,
         CAST(FLOOR(LN(-LN(1.0 - (2.0 * cum - c + 0.4)
                           / (2.0 * n + 0.8))) * 1e6) AS BIGINT) AS lyu
  FROM ranked
),
m AS (
  SELECT CAST(SUM(c) AS BIGINT) AS nw,
         CAST(SUM(lxu * c) AS BIGINT) AS sx,
         CAST(SUM(lyu * c) AS BIGINT) AS sy,
         CAST(SUM(((lxu * lyu) // 1000000) * c) AS BIGINT) AS sxy,
         CAST(SUM(((lxu * lxu) // 1000000) * c) AS BIGINT) AS sxx
  FROM terms
)
SELECT nw AS n_orders,
       (CAST(nw AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e6)
          - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))
         / (CAST(nw AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e6)
            - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))
         AS weibull_shape,
       ROUND(EXP(((CAST(sx AS DOUBLE) / 1e6)
              * ((CAST(nw AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e6)
                  - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))
                 / (CAST(nw AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e6)
                    - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6)))
            - (CAST(sy AS DOUBLE) / 1e6))
           / (CAST(nw AS DOUBLE)
              * ((CAST(nw AS DOUBLE) * (CAST(sxy AS DOUBLE) / 1e6)
                  - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sy AS DOUBLE) / 1e6))
                 / (CAST(nw AS DOUBLE) * (CAST(sxx AS DOUBLE) / 1e6)
                    - (CAST(sx AS DOUBLE) / 1e6) * (CAST(sx AS DOUBLE) / 1e6))))), 6)
         AS weibull_scale_days
FROM m
"""

QUERIES["orders_weibull_fit"] = orders_weibull_fit
ORACLE["orders_weibull_fit"] = ORDERS_WEIBULL_SQL


def events_pelt_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal multi-changepoint segmentation of daily traffic by
    penalized exact dynamic programming (the optimal-partitioning
    core of PELT, Killick 2012): F(t) = min_s F(s) + SSE(s,t) + λ
    with λ = 2·ln(n)·σ̂² — finds ALL level shifts at once where the
    suite's AMOC changepoint finds one and CUSUM/Viterbi assume
    fixed alternatives; emits the breakpoint set (as a sortable
    comma-joined index string), segment count, and total penalized
    cost.

    Engine-exact: segment SSEs are FLOOR-quantized integer micros
    (prefix-sum rationals → identical IEEE → floor, the bit-
    deterministic quantizer), λ likewise, so the whole DP is integer
    arithmetic with a first-minimum (smallest s) tie rule — Spark
    folds it in ONE Arrow batch; the oracle's recursive CTE carries
    the F and argmin LISTS through the recursion (the Holt-Winters
    list-state trick) and backtracks with a second recursive CTE.

    Scale: the stream collapses once to |days|; the O(n²) DP is
    day-count-sized."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.expr("unix_micros(ts) DIV 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        pdf = pdf.sort_values("day").reset_index(drop=True)
        xs = [int(v) for v in pdf["x"]]
        n = len(xs)
        S = [0] * (n + 1)
        Q = [0] * (n + 1)
        for i, x in enumerate(xs, 1):
            S[i] = S[i - 1] + x
            Q[i] = Q[i - 1] + x * x
        var = (Q[n] - S[n] * S[n] / n) / n
        lam = math.floor(2.0 * math.log(n) * var * 1e6)

        def cost(s, t):
            d = S[t] - S[s]
            return math.floor((Q[t] - Q[s] - d * d / (t - s)) * 1e6)

        Fv = [-lam] + [0] * n
        arg = [0] * (n + 1)
        for t in range(1, n + 1):
            best, bs = None, 0
            for s in range(t):
                v = Fv[s] + lam + cost(s, t)
                if best is None or v < best:
                    best, bs = v, s
            Fv[t], arg[t] = best, bs
        cps = []
        t = n
        while t > 0:
            s = arg[t]
            if s > 0:
                cps.append(s)
            t = s
        cps.reverse()
        return pd.DataFrame(
            {
                "n_days": [n],
                "n_segments": [len(cps) + 1],
                "breakpoints": [",".join(str(c) for c in cps) or "none"],
                "total_cost_mu": [Fv[n]],
            }
        )

    return (
        daily.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(
            fold,
            "n_days int, n_segments int, breakpoints string, total_cost_mu long",
        )
    )


EVENTS_PELT_SQL = """
WITH RECURSIVE daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x
  FROM events GROUP BY 1
),
ser AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS INTEGER) AS t, x FROM daily
),
pre AS (
  SELECT (SELECT COUNT(*) FROM ser) AS n,
         (SELECT list_prepend(CAST(0 AS BIGINT),
                 list(s ORDER BY t))
          FROM (SELECT t, CAST(SUM(x) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                             AS BIGINT) AS s FROM ser) ps) AS sl,
         (SELECT list_prepend(CAST(0 AS BIGINT),
                 list(q ORDER BY t))
          FROM (SELECT t, CAST(SUM(x * x) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                             AS BIGINT) AS q FROM ser) qs) AS ql
),
lamv AS (
  SELECT n, sl, ql,
         CAST(FLOOR(2.0 * LN(n)
              * ((ql[n + 1] - CAST(sl[n + 1] AS DOUBLE) * sl[n + 1] / n) / n)
              * 1e6) AS BIGINT) AS lam
  FROM pre
),
dp(t, fs, args) AS (
  SELECT 0, [-lam], [0] FROM lamv
  UNION ALL
  SELECT d.t + 1,
         list_append(d.fs,
           list_min(list_transform(range(1, d.t + 2), i ->
             d.fs[i] + l.lam
             + CAST(FLOOR((l.ql[d.t + 2] - l.ql[i]
                 - CAST(l.sl[d.t + 2] - l.sl[i] AS DOUBLE)
                   * (l.sl[d.t + 2] - l.sl[i]) / (d.t + 2 - i)) * 1e6) AS BIGINT)))),
         list_append(d.args,
           list_position(list_transform(range(1, d.t + 2), i ->
             d.fs[i] + l.lam
             + CAST(FLOOR((l.ql[d.t + 2] - l.ql[i]
                 - CAST(l.sl[d.t + 2] - l.sl[i] AS DOUBLE)
                   * (l.sl[d.t + 2] - l.sl[i]) / (d.t + 2 - i)) * 1e6) AS BIGINT)),
             list_min(list_transform(range(1, d.t + 2), i ->
               d.fs[i] + l.lam
               + CAST(FLOOR((l.ql[d.t + 2] - l.ql[i]
                   - CAST(l.sl[d.t + 2] - l.sl[i] AS DOUBLE)
                     * (l.sl[d.t + 2] - l.sl[i]) / (d.t + 2 - i)) * 1e6) AS BIGINT))))
           - 1)
  FROM dp d, lamv l WHERE d.t < l.n
),
fin AS (
  SELECT d.fs, d.args, l.n FROM dp d, lamv l WHERE d.t = l.n
),
bt(t, path) AS (
  SELECT n, CAST('' AS VARCHAR) FROM fin
  UNION ALL
  SELECT f.args[b.t + 1],
         CASE WHEN f.args[b.t + 1] > 0
              THEN CAST(f.args[b.t + 1] AS VARCHAR)
                   || CASE WHEN b.path = '' THEN '' ELSE ',' END || b.path
              ELSE b.path END
  FROM bt b, fin f WHERE b.t > 0
),
bp AS (SELECT path FROM bt WHERE t = 0)
SELECT CAST(f.n AS INTEGER) AS n_days,
       CAST(CASE WHEN bp.path = '' THEN 1
                 ELSE length(bp.path) - length(replace(bp.path, ',', '')) + 2 END
            AS INTEGER) AS n_segments,
       CASE WHEN bp.path = '' THEN 'none' ELSE bp.path END AS breakpoints,
       CAST(f.fs[f.n + 1] AS BIGINT) AS total_cost_mu
FROM fin f, bp
"""

QUERIES["events_pelt_segmentation"] = events_pelt_segmentation
ORACLE["events_pelt_segmentation"] = EVENTS_PELT_SQL


def events_kpss_stationarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS level-stationarity test (Kwiatkowski et al. 1992) on the
    daily count series — the null-of-stationarity complement to
    Mann-Kendall (null of no trend): with n-scaled integer
    deviations Dₜ = n·xₜ − S and their partial sums Pₜ, the statistic
    collapses to the EXACT integer ratio ΣPₜ² / (n·ΣDₜ²) — no
    variance estimate, no rounding, no floating point until the one
    final division (both numerator and denominator stay under 2^53,
    so even the doubles are exact). Verdict against the 0.463 5%
    critical value (short-run variance lags omitted — the λ=0 form,
    documented).

    Scale: one collapse to |days| integers; the partial-sum window
    is day-count-sized."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.expr("unix_micros(ts) DIV 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    d = daily.select(
        "day",
        "x",
        F.sum("x").over(wt).alias("s"),
        F.count(F.lit(1)).over(wt).alias("n"),
    ).select(
        "day",
        "n",
        (F.col("n") * F.col("x") - F.col("s")).alias("dev"),
    )
    p = d.select(
        "n", F.sum("dev").over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)).alias("pt"), "dev"
    )
    m = p.agg(
        F.max("n").alias("n"),
        F.sum(F.col("pt") * F.col("pt")).alias("sp2"),
        F.sum(F.col("dev") * F.col("dev")).alias("sd2"),
    )
    kpss = F.col("sp2").cast("double") / (
        F.col("n").cast("double") * F.col("sd2").cast("double")
    )
    return m.select(
        F.col("n").alias("n_days"),
        kpss.alias("kpss_stat"),
        (kpss > 0.463).alias("reject_stationarity_5pct"),
    )


EVENTS_KPSS_SQL = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x
  FROM events GROUP BY 1
),
d AS (
  SELECT day,
         COUNT(*) OVER () AS n,
         COUNT(*) OVER () * x - SUM(x) OVER () AS dev
  FROM daily
),
p AS (
  SELECT n, dev,
         SUM(dev) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS pt
  FROM d
),
m AS (
  SELECT MAX(n) AS n, CAST(SUM(pt * pt) AS BIGINT) AS sp2,
         CAST(SUM(dev * dev) AS BIGINT) AS sd2
  FROM p
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(sp2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sd2 AS DOUBLE)) AS kpss_stat,
       CAST(sp2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(sd2 AS DOUBLE)) > 0.463
         AS reject_stationarity_5pct
FROM m
"""

QUERIES["events_kpss_stationarity"] = events_kpss_stationarity
ORACLE["events_kpss_stationarity"] = EVENTS_KPSS_SQL


def orders_dtw_yearly_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic-time-warping distance (Sakoe & Chiba 1978) between
    consecutive years' 12-month revenue profiles — "did the seasonal
    SHAPE repeat, allowing for phase shift" — reported next to the
    rigid month-by-month L1 distance (DTW ≤ L1 always; a large gap
    means the shape repeated but SHIFTED, which timeseries_similar_
    users' aligned correlation cannot see). One row per adjacent
    year pair 1995..2000.

    Engine-exact: monthly revenues are integer cents; the 12×12 DTW
    dynamic program is pure integer min/add — Spark folds every
    year-pair in ONE Arrow batch; the oracle's recursive CTE walks
    the DP row by row carrying the current row as a LIST (the PELT
    list-state pattern), per pair.

    Scale: the fact table collapses once to |months| integers; each
    DP is a constant 144 cells."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.year("o_orderdate").alias("y"), F.month("o_orderdate").alias("m")
        )
        .agg((F.sum(money("o_totalprice")) * 100).cast("long").alias("cents"))
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        series = {}
        for _, r in pdf.iterrows():
            series.setdefault(int(r["y"]), {})[int(r["m"])] = int(r["cents"])
        rows = {"year_a": [], "year_b": [], "dtw_usd": [], "l1_usd": []}
        for ya in range(1995, 2001):
            yb = ya + 1
            # only complete 12-month years pair up (2001 ends in Aug)
            if len(series.get(ya, {})) != 12 or len(series.get(yb, {})) != 12:
                continue
            a = [series[ya][m] for m in range(1, 13)]
            b = [series[yb][m] for m in range(1, 13)]
            INF = 1 << 62
            prev = [0] + [INF] * 12
            for i in range(1, 13):
                cur = [INF] * 13
                for j in range(1, 13):
                    c = abs(a[i - 1] - b[j - 1])
                    cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
                prev = cur
            rows["year_a"].append(ya)
            rows["year_b"].append(yb)
            rows["dtw_usd"].append(prev[12] // 100)
            rows["l1_usd"].append(
                sum(abs(x - y) for x, y in zip(a, b)) // 100
            )
        return pd.DataFrame(rows)

    return (
        monthly.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(fold, "year_a int, year_b int, dtw_usd long, l1_usd long")
        .orderBy("year_a")
    )


ORDERS_DTW_SQL = """
WITH RECURSIVE monthly AS (
  SELECT EXTRACT(year FROM o_orderdate) AS y, EXTRACT(month FROM o_orderdate) AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
full_years AS (
  SELECT y FROM monthly GROUP BY y HAVING COUNT(*) = 12
),
pairs AS (
  SELECT a.y AS year_a, a.y + 1 AS year_b,
         (SELECT list(m2.cents ORDER BY m2.m) FROM monthly m2
          WHERE m2.y = a.y) AS va,
         (SELECT list(m2.cents ORDER BY m2.m) FROM monthly m2
          WHERE m2.y = a.y + 1) AS vb
  FROM full_years a
  WHERE a.y BETWEEN 1995 AND 2000
    AND EXISTS (SELECT 1 FROM full_years f WHERE f.y = a.y + 1)
),
-- cell-stepping DP: state = (i, j, prev row D(i-1,0..12), cur prefix
-- D(i,0..j)); j==12 rolls to the next i with prev := cur
dp(year_a, year_b, va, vb, i, j, prev, cur) AS (
  SELECT year_a, year_b, va, vb, 1, 0,
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(range(1, 13), x -> CAST(4611686018427387904 AS BIGINT))),
         CAST([CAST(4611686018427387904 AS BIGINT)] AS BIGINT[])
  FROM pairs
  UNION ALL
  SELECT d.year_a, d.year_b, d.va, d.vb,
         CASE WHEN d.j = 12 THEN d.i + 1 ELSE d.i END,
         CASE WHEN d.j = 12 THEN 0 ELSE d.j + 1 END,
         CASE WHEN d.j = 12 THEN d.cur ELSE d.prev END,
         CASE WHEN d.j = 12 THEN CAST([CAST(4611686018427387904 AS BIGINT)] AS BIGINT[])
              ELSE list_append(d.cur,
                     ABS(d.va[d.i] - d.vb[d.j + 1])
                     + LEAST(d.prev[d.j + 2], d.cur[d.j + 1], d.prev[d.j + 1]))
         END
  FROM dp d
  WHERE NOT (d.i = 12 AND d.j = 12)
),
fin AS (
  SELECT year_a, year_b, cur[13] AS dtw_cents, va, vb
  FROM dp WHERE i = 12 AND j = 12
),
l1 AS (
  SELECT year_a, year_b, dtw_cents,
         (SELECT SUM(ABS(va[g.j] - vb[g.j])) FROM generate_series(1, 12) g(j))
           AS l1_cents
  FROM fin
)
SELECT CAST(year_a AS INTEGER) AS year_a, CAST(year_b AS INTEGER) AS year_b,
       CAST(dtw_cents // 100 AS BIGINT) AS dtw_usd,
       CAST(l1_cents // 100 AS BIGINT) AS l1_usd
FROM l1 ORDER BY year_a
"""

QUERIES["orders_dtw_yearly_shape"] = orders_dtw_yearly_shape
ORACLE["orders_dtw_yearly_shape"] = ORDERS_DTW_SQL


def orders_pinball_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probabilistic-forecast evaluation by pinball (quantile) loss:
    seasonal-naive point forecasts on the last 6 held-out months are
    widened into q ∈ {0.1, 0.5, 0.9} quantile forecasts by adding
    the matching EXACT quantiles of the historical seasonal-naive
    residuals (histogram-CDF on integer cents), then scored with the
    pinball loss L_q = q·(y−f)⁺ + (1−q)·(f−y)⁺ — the proper scoring
    rule for quantile forecasts, completing the forecasting bench
    (backtest picks the point model, conformal wraps intervals,
    pinball grades the full distribution).

    Engine-exact: residuals, quantile offsets (cross-multiplied
    integer CDF picks), forecasts, and losses are ALL integer cents
    (loss kept ×10-scaled so q=0.1 stays integer); output divides
    once per row.

    Scale: one collapse to |months|; everything after is
    month-count-sized."""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).alias("mm")
        )
        .agg((F.sum(money("o_totalprice")) * 100).cast("long").alias("cents"))
    )
    w = Window.orderBy("mm")
    ser = monthly.select(
        F.row_number().over(w).alias("t"),
        "cents",
        F.lag("cents", 12).over(w).alias("y12"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("n"),
    ).where(F.col("y12").isNotNull())
    resid_hist = (
        ser.where(F.col("t") <= F.col("n") - 6)
        .select((F.col("cents") - F.col("y12")).alias("r"))
        .groupBy("r")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cdf = resid_hist.select(
        "r",
        F.expr("sum(c) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING)").alias("cum"),
        F.expr("sum(c) OVER ()").alias("nr"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(1), F.lit(5), F.lit(9))).alias("q10")
    )
    offs = (
        cdf.crossJoin(F.broadcast(qs))
        .where(F.expr("cum * 10 >= nr * q10"))
        .groupBy("q10")
        .agg(F.min("r").alias("off"))
    )
    holdout = ser.where(F.col("t") > F.col("n") - 6)
    scored = holdout.crossJoin(F.broadcast(offs)).select(
        "q10",
        (F.col("y12") + F.col("off")).alias("f"),
        "cents",
    )
    return (
        scored.groupBy("q10")
        .agg(
            F.count(F.lit(1)).alias("n_folds"),
            F.expr(
                "CAST(SUM(CASE WHEN cents >= f THEN q10 * (cents - f)"
                " ELSE (10 - q10) * (f - cents) END) DIV (COUNT(*) * 1000)"
                " AS BIGINT)"
            ).alias("mean_pinball_usd"),
        )
        .select(
            (F.col("q10").cast("double") / 10).alias("quantile"),
            "n_folds",
            "mean_pinball_usd",
        )
        .orderBy("quantile")
    )


ORDERS_PINBALL_SQL = """
WITH monthly AS (
  SELECT (EXTRACT(year FROM o_orderdate) - 1995) * 12
           + EXTRACT(month FROM o_orderdate) AS mm,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
ser AS (
  SELECT t, cents, y12, n FROM (
    SELECT ROW_NUMBER() OVER (ORDER BY mm) AS t, cents,
           LAG(cents, 12) OVER (ORDER BY mm) AS y12,
           COUNT(*) OVER () AS n
    FROM monthly
  ) s WHERE y12 IS NOT NULL
),
resid_hist AS (
  SELECT cents - y12 AS r, COUNT(*) AS c
  FROM ser WHERE t <= n - 6 GROUP BY 1
),
cdf AS (
  SELECT r, SUM(c) OVER (ORDER BY r ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(c) OVER () AS nr
  FROM resid_hist
),
offs AS (
  SELECT q10, CAST(MIN(r) AS BIGINT) AS off
  FROM cdf, (SELECT UNNEST([1, 5, 9]) AS q10) q
  WHERE cum * 10 >= nr * q10
  GROUP BY 1
),
scored AS (
  SELECT o.q10, s.y12 + o.off AS f, s.cents
  FROM ser s CROSS JOIN offs o
  WHERE s.t > s.n - 6
)
SELECT CAST(q10 AS DOUBLE) / 10 AS quantile, COUNT(*) AS n_folds,
       CAST(SUM(CASE WHEN cents >= f THEN q10 * (cents - f)
                     ELSE (10 - q10) * (f - cents) END)
            // (COUNT(*) * 1000) AS BIGINT) AS mean_pinball_usd
FROM scored GROUP BY q10 ORDER BY quantile
"""

QUERIES["orders_pinball_eval"] = orders_pinball_eval
ORACLE["orders_pinball_eval"] = ORDERS_PINBALL_SQL


def events_recurrence_quantification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recurrence quantification analysis (Eckmann 1987; Zbilut &
    Webber RQA) of daily traffic: recurrence rate RR = fraction of
    day pairs whose counts lie within ε = 5% of the mean, and
    determinism DET = fraction of those recurrences sitting on
    diagonal line structures (pair (i,j) AND (i+1,j+1) both
    recurrent) — the nonlinear-dynamics texture metric separating
    deterministic rhythms from noise, complementing Hurst (memory)
    and SAX (shape motifs).

    Engine-exact: the ε-test is fully cross-multiplied integer
    arithmetic (20·n·|xᵢ−xⱼ| ≤ S, no division anywhere); RR/DET are
    integer ppm of exact pair counts.

    Scale: the stream collapses to |days| integers; the O(days²)
    pair join (~900 cells) is constant-size."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(F.expr("unix_micros(ts) DIV 86400000000").alias("day"))
        .groupBy("day")
        .agg(F.count(F.lit(1)).alias("x"))
    )
    w = Window.orderBy("day")
    ser = daily.select(F.row_number().over(w).alias("t"), "x")
    tot = ser.agg(F.count(F.lit(1)).alias("n"), F.sum("x").alias("s"))
    a = ser.select(F.col("t").alias("i"), F.col("x").alias("xi"))
    b = ser.select(F.col("t").alias("j"), F.col("x").alias("xj"))
    pairs = (
        a.join(b, F.col("i") < F.col("j"))
        .crossJoin(F.broadcast(tot))
        .select(
            "i",
            "j",
            F.expr("20 * n * ABS(xi - xj) <= s").alias("rec"),
        )
    )
    pairs = pairs.localCheckpoint(eager=False)
    diag = (
        pairs.where("rec")
        .select(F.col("i").alias("i0"), F.col("j").alias("j0"))
        .join(
            pairs.where("rec").select(
                (F.col("i") - 1).alias("i0"), (F.col("j") - 1).alias("j0")
            ),
            ["i0", "j0"],
        )
        .agg(F.count(F.lit(1)).alias("n_diag"))
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("rec"), 1).otherwise(0)).alias("n_rec"),
    )
    return (
        m.crossJoin(F.broadcast(diag))
        .select(
            "n_pairs",
            "n_rec",
            F.expr("n_rec * 1000000 DIV n_pairs").alias("recurrence_ppm"),
            "n_diag",
            F.expr(
                "CASE WHEN n_rec > 0 THEN n_diag * 1000000 DIV n_rec"
                " ELSE 0 END"
            ).alias("determinism_ppm"),
        )
    )


EVENTS_RQA_SQL = """
WITH daily AS (
  SELECT epoch_us(ts) // 86400000000 AS day, COUNT(*) AS x
  FROM events GROUP BY 1
),
ser AS (SELECT ROW_NUMBER() OVER (ORDER BY day) AS t, x FROM daily),
tot AS (SELECT COUNT(*) AS n, CAST(SUM(x) AS BIGINT) AS s FROM ser),
pairs AS (
  SELECT a.t AS i, b.t AS j,
         20 * tot.n * ABS(a.x - b.x) <= tot.s AS rec
  FROM ser a JOIN ser b ON a.t < b.t CROSS JOIN tot
),
diag AS (
  SELECT COUNT(*) AS n_diag
  FROM (SELECT i, j FROM pairs WHERE rec) p1
  JOIN (SELECT i - 1 AS i0, j - 1 AS j0 FROM pairs WHERE rec) p2
    ON p2.i0 = p1.i AND p2.j0 = p1.j
),
m AS (
  SELECT COUNT(*) AS n_pairs,
         SUM(CASE WHEN rec THEN 1 ELSE 0 END) AS n_rec
  FROM pairs
)
SELECT m.n_pairs, CAST(m.n_rec AS BIGINT) AS n_rec,
       CAST(m.n_rec * 1000000 // m.n_pairs AS BIGINT) AS recurrence_ppm,
       diag.n_diag,
       CAST(CASE WHEN m.n_rec > 0 THEN diag.n_diag * 1000000 // m.n_rec
                 ELSE 0 END AS BIGINT) AS determinism_ppm
FROM m, diag
"""

QUERIES["events_recurrence_quantification"] = events_recurrence_quantification
ORACLE["events_recurrence_quantification"] = EVENTS_RQA_SQL


def events_matrix_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided matrix profile (Yeh et al. 2016, ICDM) over the
    720-hour traffic series: for each stride-4 window start, the
    z-normalized Euclidean distance to its nearest non-overlapping
    neighbor window (m=24, exclusion zone |i−j| ≥ m) plus that
    neighbor's index — low profile values = recurring daily motifs,
    high values = discord hours that no other day resembles. The
    modern exact replacement for SAX's symbolized motif census
    (events_sax_motifs), value-comparable per window.

    Scale design: the stream collapses ONCE to 720 integers (hour
    histogram, map-side combined — scale-free like the SAX/ACF
    series family); the series rides as a single broadcast array and
    every window sum / dot product is a JVM higher-order fold over
    array slices (aggregate/zip_with) — no n²·m join, no Python, and
    the pair fan-out (175×175 strided) is constant at ANY data
    scale.

    Determinism: window sums and dot products are exact integers
    (list folds); r and dist² are identical IEEE chains (sqrt is
    correctly rounded), quantized FLOOR(·1e6); flat windows (σ=0)
    are CASE-pinned to r=0."""
    ev = load_table(spark, sf_dir, "events")
    t = F.expr("unix_micros(ts) DIV 3600000000") - 473352
    counts = (
        ev.select(t.alias("t"))
        .where((F.col("t") >= 0) & (F.col("t") < 720))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = spark.range(720).select(F.col("id").alias("t"))
    series = spine.join(counts, "t", "left").select(
        "t", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("x")
    )
    arr = (
        series.agg(
            F.expr("map_from_entries(collect_list(struct(t, x)))").alias("m")
        )
        .select(
            F.expr("transform(sequence(0, 719), tt -> element_at(m, tt))").alias("xs")
        )
        # one-row array: checkpoint cuts the a/b window branches'
        # duplicated lineage — ONE fact scan instead of two at scale
        # (A/B 1.24 vs 1.31s at sf0.1, and the scan halving is the
        # real win at 100 TB)
        .localCheckpoint(eager=True)
    )
    win = arr.select(
        "xs", F.explode(F.expr("sequence(0, 696, 4)")).alias("i")
    ).select(
        "xs",
        "i",
        F.expr("aggregate(slice(xs, i + 1, 24), CAST(0 AS BIGINT), (a, v) -> a + v)").alias("s"),
        F.expr(
            "aggregate(slice(xs, i + 1, 24), CAST(0 AS BIGINT), (a, v) -> a + v * v)"
        ).alias("s2"),
    )
    a = win.select("xs", F.col("i"), F.col("s").alias("si"), F.col("s2").alias("s2i"))
    b = win.select(F.col("i").alias("j"), F.col("s").alias("sj"), F.col("s2").alias("s2j"))
    pairs = a.join(b, F.expr("abs(i - j) >= 24")).select(
        "i",
        "j",
        F.expr(
            "aggregate(zip_with(slice(xs, i + 1, 24), slice(xs, j + 1, 24),"
            " (p, q) -> p * q), CAST(0 AS BIGINT), (a, v) -> a + v)"
        ).alias("dot"),
        "si",
        "s2i",
        "sj",
        "s2j",
    )
    d = pairs.select(
        "i",
        "j",
        F.expr(
            "CAST(FLOOR(CASE WHEN (24 * s2i - si * si) <= 0 OR (24 * s2j - sj * sj) <= 0"
            " THEN 48000000.0"
            " ELSE 48.0 * (1 - (24.0 * dot - CAST(si AS DOUBLE) * sj)"
            "   / (SQRT(CAST(24 * s2i - si * si AS DOUBLE))"
            "      * SQRT(CAST(24 * s2j - sj * sj AS DOUBLE)))) * 1000000 END)"
            " AS BIGINT)"
        ).alias("dist2_e6"),
    )
    # window-min argmax over the tiny pair frame (r10 opt: the
    # agg+join-back re-executed the whole 175×151 fold fan-out twice)
    out = (
        d.withColumn("nn_dist2_e6", F.min("dist2_e6").over(Window.partitionBy("i")))
        .where(F.col("dist2_e6") == F.col("nn_dist2_e6"))
        .groupBy("i", "nn_dist2_e6")
        .agg(F.min("j").alias("nn_j"))
    )
    return out.select("i", "nn_j", "nn_dist2_e6").orderBy("i")


MATRIX_PROFILE_SQL = """
WITH counts AS (
  SELECT epoch_us(ts) // 3600000000 - 473352 AS t, COUNT(*) AS cnt
  FROM events
  WHERE epoch_us(ts) // 3600000000 - 473352 >= 0
    AND epoch_us(ts) // 3600000000 - 473352 < 720
  GROUP BY 1
),
series AS (
  SELECT g.t, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS x
  FROM (SELECT UNNEST(range(0, 720)) AS t) g LEFT JOIN counts c ON c.t = g.t
),
arr AS MATERIALIZED (
  SELECT list(x ORDER BY t) AS xs FROM series
),
win AS MATERIALIZED (
  SELECT i,
         CAST(list_sum(list_transform(generate_series(1, 24), k -> xs[i + k]))
              AS BIGINT) AS s,
         CAST(list_sum(list_transform(generate_series(1, 24), k -> xs[i + k] * xs[i + k]))
              AS BIGINT) AS s2
  FROM arr, (SELECT UNNEST(range(0, 697, 4)) AS i) starts
),
pairs AS (
  SELECT a.i, b.i AS j,
         CAST(list_sum(list_transform(generate_series(1, 24),
                                      k -> xs[a.i + k] * xs[b.i + k]))
              AS BIGINT) AS dot,
         a.s AS si, a.s2 AS s2i, b.s AS sj, b.s2 AS s2j
  FROM win a, win b, arr
  WHERE abs(a.i - b.i) >= 24
),
d AS (
  SELECT i, j,
         CAST(FLOOR(CASE WHEN (24 * s2i - si * si) <= 0 OR (24 * s2j - sj * sj) <= 0
              THEN 48000000.0
              ELSE 48.0 * (1 - (24.0 * dot - CAST(si AS DOUBLE) * sj)
                / (SQRT(CAST(24 * s2i - si * si AS DOUBLE))
                   * SQRT(CAST(24 * s2j - sj * sj AS DOUBLE)))) * 1000000 END)
              AS BIGINT) AS dist2_e6
  FROM pairs
),
nn AS (
  SELECT i, MIN(dist2_e6) AS nn_dist2_e6 FROM d GROUP BY 1
)
SELECT d.i, MIN(d.j) AS nn_j, nn.nn_dist2_e6
FROM d JOIN nn ON d.i = nn.i AND d.dist2_e6 = nn.nn_dist2_e6
GROUP BY d.i, nn.nn_dist2_e6
ORDER BY d.i
"""

QUERIES["events_matrix_profile"] = events_matrix_profile
ORACLE["events_matrix_profile"] = MATRIX_PROFILE_SQL


def events_lag_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information vs lag over the 720-hour traffic series —
    the NONLINEAR dependence profile that the autocorrelation family
    (events_autocorrelation) misses: hourly counts are discretized
    into terciles (histogram-CDF cuts, the house exact-quantile
    pattern) and MI(L) = Σ p(a,b)·ln(p(a,b)/(p(a)p(b))) is computed
    over the 3×3 symbol-pair table at lags 1/2/3/6/12/24h. A daily
    cycle shows as an MI spike at L=24 even when the relationship is
    non-monotone.

    Scale design: the stream collapses once to 720 integers; tercile
    boundaries come from the value histogram's CDF (histogram-sized
    window, boundaries broadcast back); each lag's pair table is a
    self-join of the 720-row symbol frame on t+L — constant work at
    any data scale. Marginals re-aggregate from the pair counts
    (no second pass).

    Determinism: all counts exact integers; ln gets the house 6dp
    per-term rounding, terms are FLOOR-quantized to integers BEFORE
    the sum (never a shuffle-order double sum), and the final
    normalization is one identical IEEE division."""
    ev = load_table(spark, sf_dir, "events")
    t = F.expr("unix_micros(ts) DIV 3600000000") - 473352
    counts = (
        ev.select(t.alias("t"))
        .where((F.col("t") >= 0) & (F.col("t") < 720))
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    spine = spark.range(720).select(F.col("id").alias("t"))
    # 720-row collapsed series feeds THREE branches (histogram cuts,
    # lag side a, lag side b): checkpoint so the fact table is
    # scanned once, not three times — the matrix-profile scan-halving
    # rule applied here
    series = (
        spine.join(counts, "t", "left")
        .select("t", F.coalesce("cnt", F.lit(0)).cast("bigint").alias("x"))
        .localCheckpoint(eager=True)
    )
    hist = series.groupBy("x").agg(F.count(F.lit(1)).alias("c"))
    cdf = hist.select(
        "x",
        F.sum("c").over(Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    cuts = cdf.agg(
        F.min(F.when(F.col("cum") * 3 >= 720, F.col("x"))).alias("t1"),
        F.min(F.when(F.col("cum") * 3 >= 1440, F.col("x"))).alias("t2"),
    )
    sym = series.crossJoin(F.broadcast(cuts)).select(
        "t",
        F.expr("CASE WHEN x <= t1 THEN 0 WHEN x <= t2 THEN 1 ELSE 2 END").alias("s"),
    )
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(v) for v in (1, 2, 3, 6, 12, 24)])).alias("lag")
    )
    a = sym.crossJoin(F.broadcast(lags)).select(
        "lag", (F.col("t") + F.col("lag")).alias("tb"), F.col("s").alias("sa")
    )
    b = sym.select(F.col("t").alias("tb"), F.col("s").alias("sb"))
    pairs = a.join(b, "tb").select("lag", "sa", "sb")
    cell = pairs.groupBy("lag", "sa", "sb").agg(F.count(F.lit(1)).alias("n_ab"))
    # marginals as windows over the 54-row cell table (constant-size at
    # any data scale) — the join-back variant recomputed the pair join
    # per marginal branch and A/B-lost 2.0s vs 1.2s at sf0.1
    terms = cell.select(
        "lag",
        F.sum("n_ab").over(Window.partitionBy("lag")).alias("n"),
        "n_ab",
        F.sum("n_ab").over(Window.partitionBy("lag", "sa")).alias("n_a"),
        F.sum("n_ab").over(Window.partitionBy("lag", "sb")).alias("n_b"),
    ).select(
        "lag",
        "n",
        F.expr(
            "CAST(FLOOR(n_ab * ROUND(LN(CAST(n AS DOUBLE) * n_ab"
            " / (CAST(n_a AS DOUBLE) * n_b)), 6) * 1000000) AS BIGINT)"
        ).alias("term_e6"),
    )
    return (
        terms.groupBy("lag", "n")
        .agg(F.sum("term_e6").alias("sum_e6"), F.count(F.lit(1)).alias("n_cells"))
        .select(
            "lag",
            F.col("n").cast("bigint").alias("n_pairs"),
            "n_cells",
            F.expr("CAST(FLOOR(CAST(sum_e6 AS DOUBLE) / n) AS BIGINT)").alias("mi_e6"),
        )
        .orderBy("lag")
    )


LAG_MI_SQL = """
WITH counts AS (
  SELECT epoch_us(ts) // 3600000000 - 473352 AS t, COUNT(*) AS cnt
  FROM events
  WHERE epoch_us(ts) // 3600000000 - 473352 >= 0
    AND epoch_us(ts) // 3600000000 - 473352 < 720
  GROUP BY 1
),
series AS MATERIALIZED (
  SELECT g.t, CAST(COALESCE(c.cnt, 0) AS BIGINT) AS x
  FROM (SELECT UNNEST(range(0, 720)) AS t) g LEFT JOIN counts c ON c.t = g.t
),
hist AS (
  SELECT x, COUNT(*) AS c FROM series GROUP BY 1
),
cdf AS (
  SELECT x, SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum FROM hist
),
cuts AS (
  SELECT MIN(CASE WHEN cum * 3 >= 720 THEN x END) AS t1,
         MIN(CASE WHEN cum * 3 >= 1440 THEN x END) AS t2
  FROM cdf
),
sym AS MATERIALIZED (
  SELECT t, CASE WHEN x <= t1 THEN 0 WHEN x <= t2 THEN 1 ELSE 2 END AS s
  FROM series CROSS JOIN cuts
),
pairs AS (
  SELECT lag, a.s AS sa, b.s AS sb
  FROM (SELECT UNNEST([1, 2, 3, 6, 12, 24]) AS lag) l, sym a
  JOIN sym b ON b.t = a.t + lag
),
cell AS MATERIALIZED (
  SELECT lag, sa, sb, COUNT(*) AS n_ab FROM pairs GROUP BY 1, 2, 3
),
ma AS (SELECT lag, sa, SUM(n_ab) AS n_a FROM cell GROUP BY 1, 2),
mb AS (SELECT lag, sb, SUM(n_ab) AS n_b FROM cell GROUP BY 1, 2),
nn AS (SELECT lag, SUM(n_ab) AS n FROM cell GROUP BY 1),
terms AS (
  SELECT cell.lag, nn.n,
         CAST(FLOOR(n_ab * ROUND(LN(CAST(n AS DOUBLE) * n_ab
              / (CAST(n_a AS DOUBLE) * n_b)), 6) * 1000000) AS BIGINT) AS term_e6
  FROM cell JOIN ma USING (lag, sa) JOIN mb USING (lag, sb) JOIN nn USING (lag)
)
SELECT lag, CAST(n AS BIGINT) AS n_pairs, COUNT(*) AS n_cells,
       CAST(FLOOR(CAST(SUM(term_e6) AS DOUBLE) / n) AS BIGINT) AS mi_e6
FROM terms
GROUP BY lag, n
ORDER BY lag
"""

QUERIES["events_lag_mutual_information"] = events_lag_mutual_information
ORACLE["events_lag_mutual_information"] = LAG_MI_SQL


# Shared Granger F-statistic arithmetic: scatter-matrix entries are
# EXACT BIGINTs (n-scaled covariance integers, the ACF discipline);
# the closing Cramer-rule chain runs in doubles — identical inputs +
# identical op order ⇒ identical IEEE results on both engines; the
# smooth F gets one-shot 6dp rounding.
_GRANGER_F = (
    "CASE WHEN s11 <= 0 OR (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12) <= 0"
    " THEN NULL ELSE ROUND("
    " ((CAST(syy AS DOUBLE) - CAST(sy1 AS DOUBLE) * sy1 / s11)"
    "  - (CAST(syy AS DOUBLE)"
    "     - ((CAST(sy1 AS DOUBLE) * s22 - CAST(sy2 AS DOUBLE) * s12) * sy1"
    "        + (CAST(sy2 AS DOUBLE) * s11 - CAST(sy1 AS DOUBLE) * s12) * sy2)"
    "       / (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)))"
    " * (n - 3)"
    " / (CAST(syy AS DOUBLE)"
    "    - ((CAST(sy1 AS DOUBLE) * s22 - CAST(sy2 AS DOUBLE) * s12) * sy1"
    "       + (CAST(sy2 AS DOUBLE) * s11 - CAST(sy1 AS DOUBLE) * s12) * sy2)"
    "      / (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)), 6) END"
)


def events_granger_causality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Granger causality at lag 1 between the hourly click and
    purchase series, BOTH directions: does yesterday's x improve the
    AR(1) forecast of y? F = ((RSS_r − RSS_a)/1)/(RSS_a/(T−3)) from
    the restricted (y ~ y₋₁) vs augmented (y ~ y₋₁ + x₋₁)
    regressions — the DIRECTIONAL complement to the symmetric
    dependence family (events_autocorrelation linear,
    events_lag_mutual_information nonlinear).

    Engine-exact: the two series collapse once to 720 integers
    (checkpointed — ONE fact scan); every scatter entry is an exact
    n-scaled BIGINT (the ACF integer-deviation discipline); the
    closing Cramer chain is a SHARED generated expression evaluated
    identically by both engines, one-shot 6dp-rounded (smooth
    statistic, no grid ties).

    Scale: all regression work happens on the constant 719-row lag
    frame; the output is 2 rows."""
    ev = load_table(spark, sf_dir, "events")
    t = F.expr("unix_micros(ts) DIV 3600000000") - 473352
    counts = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .select(t.alias("t"), "event_type")
        .where((F.col("t") >= 0) & (F.col("t") < 720))
        .groupBy("t")
        .agg(
            F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("xc"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
                "yc"
            ),
        )
    )
    spine = spark.range(720).select(F.col("id").alias("t"))
    series = (
        spine.join(counts, "t", "left")
        .select(
            "t",
            F.coalesce("xc", F.lit(0)).cast("bigint").alias("x"),
            F.coalesce("yc", F.lit(0)).cast("bigint").alias("y"),
        )
        .localCheckpoint(eager=True)
    )
    prev = series.select(
        (F.col("t") + 1).alias("t"), F.col("x").alias("xp"), F.col("y").alias("yp")
    )
    lagged = series.join(prev, "t")
    dirs = lagged.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("click_causes_purchase").alias("direction"),
                    F.col("y").alias("dep"),
                    F.col("yp").alias("l1"),
                    F.col("xp").alias("l2"),
                ),
                F.struct(
                    F.lit("purchase_causes_click").alias("direction"),
                    F.col("x").alias("dep"),
                    F.col("xp").alias("l1"),
                    F.col("yp").alias("l2"),
                ),
            )
        ).alias("s")
    ).select("s.direction", "s.dep", "s.l1", "s.l2")
    sums = dirs.groupBy("direction").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dep").alias("sd"),
        F.sum("l1").alias("sl1"),
        F.sum("l2").alias("sl2"),
        F.sum(F.expr("dep * dep")).alias("sdd"),
        F.sum(F.expr("dep * l1")).alias("sdl1"),
        F.sum(F.expr("dep * l2")).alias("sdl2"),
        F.sum(F.expr("l1 * l1")).alias("sl11"),
        F.sum(F.expr("l2 * l2")).alias("sl22"),
        F.sum(F.expr("l1 * l2")).alias("sl12"),
    )
    scatter = sums.select(
        "direction",
        "n",
        F.expr("n * sdd - sd * sd").alias("syy"),
        F.expr("n * sdl1 - sd * sl1").alias("sy1"),
        F.expr("n * sdl2 - sd * sl2").alias("sy2"),
        F.expr("n * sl11 - sl1 * sl1").alias("s11"),
        F.expr("n * sl22 - sl2 * sl2").alias("s22"),
        F.expr("n * sl12 - sl1 * sl2").alias("s12"),
    )
    return (
        scatter.select(
            "direction",
            F.col("n").cast("bigint").alias("n_obs"),
            F.expr(_GRANGER_F).alias("f_stat"),
        )
        .orderBy("direction")
    )


GRANGER_SQL = f"""
WITH counts AS (
  SELECT epoch_us(ts) // 3600000000 - 473352 AS t,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS xc,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS yc
  FROM events
  WHERE event_type IN ('click', 'purchase')
    AND epoch_us(ts) // 3600000000 - 473352 >= 0
    AND epoch_us(ts) // 3600000000 - 473352 < 720
  GROUP BY 1
),
series AS MATERIALIZED (
  SELECT g.t, CAST(COALESCE(c.xc, 0) AS BIGINT) AS x,
         CAST(COALESCE(c.yc, 0) AS BIGINT) AS y
  FROM (SELECT UNNEST(range(0, 720)) AS t) g LEFT JOIN counts c ON c.t = g.t
),
lagged AS (
  SELECT a.t, a.x, a.y, b.x AS xp, b.y AS yp
  FROM series a JOIN series b ON a.t = b.t + 1
),
dirs AS (
  SELECT 'click_causes_purchase' AS direction, y AS dep, yp AS l1, xp AS l2 FROM lagged
  UNION ALL
  SELECT 'purchase_causes_click' AS direction, x AS dep, xp AS l1, yp AS l2 FROM lagged
),
sums AS (
  SELECT direction, COUNT(*) AS n,
         CAST(SUM(dep) AS BIGINT) AS sd, CAST(SUM(l1) AS BIGINT) AS sl1,
         CAST(SUM(l2) AS BIGINT) AS sl2,
         CAST(SUM(dep * dep) AS BIGINT) AS sdd,
         CAST(SUM(dep * l1) AS BIGINT) AS sdl1,
         CAST(SUM(dep * l2) AS BIGINT) AS sdl2,
         CAST(SUM(l1 * l1) AS BIGINT) AS sl11,
         CAST(SUM(l2 * l2) AS BIGINT) AS sl22,
         CAST(SUM(l1 * l2) AS BIGINT) AS sl12
  FROM dirs GROUP BY 1
),
scatter AS (
  SELECT direction, n,
         n * sdd - sd * sd AS syy,
         n * sdl1 - sd * sl1 AS sy1,
         n * sdl2 - sd * sl2 AS sy2,
         n * sl11 - sl1 * sl1 AS s11,
         n * sl22 - sl2 * sl2 AS s22,
         n * sl12 - sl1 * sl2 AS s12
  FROM sums
)
SELECT direction, CAST(n AS BIGINT) AS n_obs,
       {_GRANGER_F} AS f_stat
FROM scatter
ORDER BY direction
"""

QUERIES["events_granger_causality"] = events_granger_causality
ORACLE["events_granger_causality"] = GRANGER_SQL


# ---------------------------------------------------------------------------
# events_allan_variance — timing-stability of the event rate
# ---------------------------------------------------------------------------

_AVAR_TAUS = (1, 2, 4, 8, 16)  # averaging windows, hours
_HOUR_US = 3_600_000_000


def events_allan_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Allan variance of the hourly event arrival rate at averaging
    times tau = 1..16 h — the clock-stability statistic (Allan 1966,
    IEEE 54(2)) repurposed as a rate-stability audit: white
    (independent) rate noise shows avar ~ 1/tau, while drift or
    daily seasonality bends the curve upward at large tau.

    All-integer pipeline: hourly counts on the absolute-hour grid
    (gap-filled with zeros), per-tau NON-OVERLAPPING block sums
    (integer), first differences of neighboring block sums
    (integer), and one IEEE division per tau at the very end:
    avar(tau) = sum(d^2) / (2*(M-1)*tau^2), emitted as FLOOR e6.

    Scale: the raw stream collapses to ~hours rows in ONE shuffle;
    the 5-tau block/diff work runs on that tiny series (single
    window partition by design — it IS the global hourly series, the
    same shape every house series query uses)."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr(f"unix_micros(ts) DIV {_HOUR_US}").alias("h")
    )
    # two branches read cnt (bounds agg + grid join) — a checkpoint
    # here A/B-LOST at sf0.1 (0.52 -> 0.66s; the perplexity-filter
    # precedent: 2 branches don't amortize the materialization)
    cnt = e.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    bounds = cnt.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(F.explode(F.sequence("h0", "h1")).alias("h"), "h0")
    dense = grid.join(cnt, "h", "left").select(
        (F.col("h") - F.col("h0")).alias("i"),
        F.coalesce("cnt", F.lit(0)).alias("cnt"),
    )
    taus = spark.range(len(_AVAR_TAUS)).select(
        F.element_at(F.array(*[F.lit(t) for t in _AVAR_TAUS]), (F.col("id") + 1).cast("int")).alias("tau")
    )
    blocks = (
        dense.crossJoin(F.broadcast(taus))
        .groupBy("tau", F.expr("i DIV tau").alias("k"))
        .agg(F.sum("cnt").alias("s"), F.count(F.lit(1)).alias("n_h"))
        .where(F.col("n_h") == F.col("tau"))  # full blocks only
    )
    w = Window.partitionBy("tau").orderBy("k")
    diffs = blocks.select(
        "tau", "k", "s", (F.col("s") - F.lag("s").over(w)).alias("d")
    ).where(F.col("d").isNotNull())
    return (
        diffs.groupBy("tau")
        .agg(
            (F.count(F.lit(1)) + 1).cast("bigint").alias("m_blocks"),
            F.sum(F.expr("d * d")).cast("bigint").alias("sum_sq_diff"),
        )
        .select(
            F.col("tau").cast("int").alias("tau_hours"),
            "m_blocks",
            "sum_sq_diff",
            F.expr(
                "CAST(FLOOR(CAST(sum_sq_diff AS DOUBLE) * 1000000"
                " / (2.0 * (m_blocks - 1) * tau * tau)) AS BIGINT)"
            ).alias("avar_e6"),
        )
        .orderBy("tau_hours")
    )


EVENTS_ALLAN_SQL = f"""
WITH cnt AS (
  SELECT epoch_us(ts) // {_HOUR_US} AS h, COUNT(*) AS cnt
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(h) AS h0, MAX(h) AS h1 FROM cnt),
grid AS (
  SELECT unnest(generate_series(h0, h1)) AS h, h0 FROM bounds
),
dense AS (
  SELECT g.h - g.h0 AS i, COALESCE(c.cnt, 0) AS cnt
  FROM grid g LEFT JOIN cnt c ON g.h = c.h
),
taus AS (SELECT unnest([{", ".join(str(t) for t in _AVAR_TAUS)}]) AS tau),
blocks AS (
  SELECT tau, i // tau AS k, SUM(cnt) AS s, COUNT(*) AS n_h
  FROM dense, taus GROUP BY 1, 2
  HAVING COUNT(*) = tau
),
diffs AS (
  SELECT tau, s - LAG(s) OVER (PARTITION BY tau ORDER BY k) AS d
  FROM blocks
)
SELECT CAST(tau AS INTEGER) AS tau_hours,
       CAST(COUNT(*) + 1 AS BIGINT) AS m_blocks,
       CAST(SUM(d * d) AS BIGINT) AS sum_sq_diff,
       CAST(FLOOR(CAST(SUM(d * d) AS DOUBLE) * 1000000
                  / (2.0 * COUNT(*) * tau * tau)) AS BIGINT) AS avar_e6
FROM diffs WHERE d IS NOT NULL
GROUP BY tau ORDER BY 1
"""

QUERIES["events_allan_variance"] = events_allan_variance
ORACLE["events_allan_variance"] = EVENTS_ALLAN_SQL


# ---------------------------------------------------------------------------
# events_page_hinkley — sequential mean-shift drift detector
# ---------------------------------------------------------------------------

_PH_LAMBDA_E6 = 3_000_000  # alarm threshold on the PH statistic (e6 value units)


def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-Hinkley mean-shift detector (Page 1954; the standard
    streaming-drift test in river/MOA) over the daily mean event
    value: cum_t = sum_{i<=t}(x_i - prefix_mean_i), PH_t = cum_t -
    min(cum_1..t), alarm when PH_t exceeds lambda — flags a sustained
    upward shift of the metric a monitor watches.

    Declarative sequentiality: the prefix mean makes this look like a
    fold, but every term is a PREFIX WINDOW over the day series —
    prefix_mean via cumulative sum/count, cum via a second cumulative
    sum, min_cum via cumulative min; no recursion, no Arrow fold, and
    the identical window SQL runs on DuckDB. All integer: daily means
    are e6-scaled FLOOR divisions of exact DECIMAL-cent sums, so both
    engines walk the same PH trajectory bit-for-bit.

    Scale: the stream collapses to ~days rows in one shuffle;
    the windows run on that tiny series."""
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"),
        F.col("value").cast("decimal(18,6)").alias("v"),
    )
    daily = e.groupBy("d").agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    )
    x = daily.select(
        "d",
        F.expr("CAST(s * 1000000 AS DECIMAL(38,0)) DIV c").cast("bigint").alias("x_e6"),
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    pm = x.select(
        "d",
        "x_e6",
        F.sum("x_e6").over(w).alias("sx"),
        F.count(F.lit(1)).over(w).alias("t"),
    ).select(
        "d", "x_e6", "t", F.expr("sx DIV t").alias("pmean_e6")
    )
    cum = pm.select(
        "d",
        "x_e6",
        "t",
        "pmean_e6",
        F.sum(F.col("x_e6") - F.col("pmean_e6")).over(Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)).alias("cum_e6"),
    )
    ph = cum.select(
        "d",
        "x_e6",
        F.col("t").cast("bigint").alias("t"),
        "cum_e6",
        (F.col("cum_e6") - F.min("cum_e6").over(
            Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
        )).alias("ph_e6"),
    )
    return ph.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "t",
        "x_e6",
        "cum_e6",
        "ph_e6",
        (F.col("ph_e6") > _PH_LAMBDA_E6).alias("alarm"),
    ).orderBy("day")


EVENTS_PAGE_HINKLEY_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CAST(value AS DECIMAL(18,6))) AS s, COUNT(*) AS c
  FROM events GROUP BY 1
),
x AS (
  SELECT d, CAST(CAST(s * 1000000 AS HUGEINT) // c AS BIGINT) AS x_e6 FROM daily
),
pm AS (
  SELECT d, x_e6,
         COUNT(*) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS t,
         SUM(x_e6) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
           // COUNT(*) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS pmean_e6
  FROM x
),
cum AS (
  SELECT d, x_e6, t, pmean_e6,
         SUM(x_e6 - pmean_e6) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS cum_e6
  FROM pm
)
SELECT strftime(d, '%Y-%m-%d') AS day, CAST(t AS BIGINT) AS t, x_e6,
       CAST(cum_e6 AS BIGINT) AS cum_e6,
       CAST(cum_e6 - MIN(cum_e6) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS ph_e6,
       (cum_e6 - MIN(cum_e6) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING))
         > {_PH_LAMBDA_E6} AS alarm
FROM cum ORDER BY day
"""

QUERIES["events_page_hinkley"] = events_page_hinkley
ORACLE["events_page_hinkley"] = EVENTS_PAGE_HINKLEY_SQL


# ---------------------------------------------------------------------------
# orders_seasonal_mann_kendall — seasonal trend test on monthly revenue
# ---------------------------------------------------------------------------


def orders_seasonal_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch-Slack 1984) on
    monthly revenue: the plain MK statistic computed WITHIN each
    month-of-year series across years (January vs January...), so an
    annual cycle cannot masquerade as trend — S = sum of S_m,
    Var = sum n_m(n_m-1)(2n_m+5)/18, z with the S>0 continuity
    correction. The seasonal complement to ``events_mann_kendall``.

    All-integer: revenues are exact DECIMAL cents, every sign pair
    is integer, Var is carried x18 to stay integral; the single IEEE
    step is z = (S -/+ 1)/sqrt(Var), one-shot 6dp-rounded. Emits one
    row per month (n_m, s_m) with the overall S and z repeated — the
    detail and the verdict in one sorted frame.

    Scale: the fact table collapses to (year, month) cells in one
    shuffle; the pair joins are per-month across years (<= C(7,2)
    pairs per month — season-count-sized forever)."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        money("o_totalprice").alias("rev"),
    )
    cells = o.groupBy("y", "m").agg(
        (F.sum("rev") * 100).cast("long").alias("cents")
    )
    a = cells.select("m", F.col("y").alias("y1"), F.col("cents").alias("c1"))
    b = cells.select("m", F.col("y").alias("y2"), F.col("cents").alias("c2"))
    pairs = a.join(b, "m").where(F.col("y1") < F.col("y2"))
    per_m = pairs.groupBy("m").agg(
        F.sum(F.expr("CASE WHEN c2 > c1 THEN 1 WHEN c2 < c1 THEN -1 ELSE 0 END"))
        .cast("bigint")
        .alias("s_m"),
    )
    nm = cells.groupBy("m").agg(F.count(F.lit(1)).cast("bigint").alias("n_m"))
    d = per_m.join(nm, "m")
    tot = d.agg(
        F.sum("s_m").cast("bigint").alias("s_total"),
        F.sum(F.expr("n_m * (n_m - 1) * (2 * n_m + 5)")).cast("bigint").alias(
            "var_x18"
        ),
    )
    return (
        d.crossJoin(F.broadcast(tot))
        .select(
            F.col("m").cast("int").alias("month"),
            "n_m",
            "s_m",
            "s_total",
            "var_x18",
            F.expr(
                "ROUND(CASE WHEN s_total > 0 THEN (s_total - 1) / SQRT(var_x18 / 18.0)"
                " WHEN s_total < 0 THEN (s_total + 1) / SQRT(var_x18 / 18.0)"
                " ELSE 0.0 END, 6)"
            ).alias("z"),
        )
        .orderBy("month")
    )


ORDERS_SEASONAL_MK_SQL = """
WITH cells AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS y,
         CAST(month(o_orderdate) AS INTEGER) AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.m,
         CASE WHEN b.cents > a.cents THEN 1
              WHEN b.cents < a.cents THEN -1 ELSE 0 END AS sgn
  FROM cells a JOIN cells b ON a.m = b.m AND a.y < b.y
),
per_m AS (SELECT m, CAST(SUM(sgn) AS BIGINT) AS s_m FROM pairs GROUP BY 1),
nm AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS n_m FROM cells GROUP BY 1),
d AS (SELECT nm.m, n_m, s_m FROM per_m JOIN nm ON per_m.m = nm.m),
tot AS (
  SELECT CAST(SUM(s_m) AS BIGINT) AS s_total,
         CAST(SUM(n_m * (n_m - 1) * (2 * n_m + 5)) AS BIGINT) AS var_x18
  FROM d
)
SELECT m AS month, n_m, s_m, s_total, var_x18,
       ROUND(CASE WHEN s_total > 0 THEN (s_total - 1) / SQRT(var_x18 / 18.0)
                  WHEN s_total < 0 THEN (s_total + 1) / SQRT(var_x18 / 18.0)
                  ELSE 0.0 END, 6) AS z
FROM d, tot
ORDER BY month
"""

QUERIES["orders_seasonal_mann_kendall"] = orders_seasonal_mann_kendall
ORACLE["orders_seasonal_mann_kendall"] = ORDERS_SEASONAL_MK_SQL


# ---------------------------------------------------------------------------
# orders_interrupted_time_series — segmented regression around a cut date
# ---------------------------------------------------------------------------

# shared generated OLS expressions (the granger discipline): identical
# IEEE chains over exact integer scatter sums on both engines
_ITS_SLOPE = (
    "(CAST({p}n AS DOUBLE) * {p}sty - CAST({p}st AS DOUBLE) * {p}sy)"
    " / (CAST({p}n AS DOUBLE) * {p}stt - CAST({p}st AS DOUBLE) * {p}st)"
)
_ITS_ICEPT = (
    "(CAST({p}sy AS DOUBLE) - (" + _ITS_SLOPE + ") * {p}st) / {p}n"
)


def orders_interrupted_time_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interrupted time-series analysis (segmented regression;
    Wagner et al. 2002) of monthly revenue around a 1998-01 policy
    cut: independent OLS level+trend fits on the pre and post
    segments, reporting the LEVEL change (post intercept minus the
    pre line's counterfactual projection at the cut month) and the
    SLOPE change — the causal-inference sibling of
    ``parts_promo_did`` when there is no control group, only time.

    Determinism: monthly revenues are exact DECIMAL cents and the
    month index is an integer, so all five scatter sums per segment
    are exact BIGINTs; both OLS closes are ONE shared generated IEEE
    expression (the granger/Cramer discipline), one-shot 6dp-rounded.

    Scale: the fact table collapses to ~80 month cells in one
    map-side-combined shuffle; both fits are 1-row scalar aggs."""
    o = load_table(spark, sf_dir, "orders").select(
        ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).alias("t"),
        money("o_totalprice").alias("rev"),
    )
    cells = o.groupBy("t").agg((F.sum("rev") * 100).cast("long").alias("y"))
    t0 = 37  # 1998-01 (t is 1-based from 1995-01)
    seg = cells.select(
        "t", "y", (F.col("t") >= t0).alias("post")
    )
    scat = seg.groupBy("post").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("t").cast("bigint").alias("st"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.expr("CAST(t AS BIGINT) * t")).alias("stt"),
        F.sum(F.expr("CAST(t AS BIGINT) * y")).alias("sty"),
    )
    wide = scat.groupBy().agg(
        *[
            F.max(F.when(F.col("post") == (p == "b_"), F.col(c))).alias(f"{p}{c}")
            for p in ("a_", "b_")
            for c in ("n", "st", "sy", "stt", "sty")
        ]
    )
    pre_s = _ITS_SLOPE.format(p="a_")
    post_s = _ITS_SLOPE.format(p="b_")
    pre_i = _ITS_ICEPT.format(p="a_")
    post_i = _ITS_ICEPT.format(p="b_")
    return wide.select(
        F.col("a_n").alias("n_pre"),
        F.col("b_n").alias("n_post"),
        F.expr(f"ROUND({pre_s}, 6)").alias("pre_slope_cents"),
        F.expr(f"ROUND({post_s}, 6)").alias("post_slope_cents"),
        F.expr(f"ROUND(({post_s}) - ({pre_s}), 6)").alias("slope_change_cents"),
        F.expr(
            f"ROUND((({post_i}) + ({post_s}) * {t0})"
            f" - (({pre_i}) + ({pre_s}) * {t0}), 6)"
        ).alias("level_change_cents"),
    )


ORDERS_ITS_SQL = f"""
WITH cells AS (
  SELECT (CAST(year(o_orderdate) AS INTEGER) - 1995) * 12
           + CAST(month(o_orderdate) AS INTEGER) AS t,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS y
  FROM orders GROUP BY 1
),
scat AS (
  SELECT t >= 37 AS post,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(t) AS BIGINT) AS st,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(CAST(t AS BIGINT) * t) AS BIGINT) AS stt,
         CAST(SUM(CAST(t AS BIGINT) * y) AS BIGINT) AS sty
  FROM cells GROUP BY 1
),
wide AS (
  SELECT
    MAX(CASE WHEN NOT post THEN n END) AS a_n,
    MAX(CASE WHEN NOT post THEN st END) AS a_st,
    MAX(CASE WHEN NOT post THEN sy END) AS a_sy,
    MAX(CASE WHEN NOT post THEN stt END) AS a_stt,
    MAX(CASE WHEN NOT post THEN sty END) AS a_sty,
    MAX(CASE WHEN post THEN n END) AS b_n,
    MAX(CASE WHEN post THEN st END) AS b_st,
    MAX(CASE WHEN post THEN sy END) AS b_sy,
    MAX(CASE WHEN post THEN stt END) AS b_stt,
    MAX(CASE WHEN post THEN sty END) AS b_sty
  FROM scat
)
SELECT a_n AS n_pre, b_n AS n_post,
       ROUND({_ITS_SLOPE.format(p="a_")}, 6) AS pre_slope_cents,
       ROUND({_ITS_SLOPE.format(p="b_")}, 6) AS post_slope_cents,
       ROUND(({_ITS_SLOPE.format(p="b_")}) - ({_ITS_SLOPE.format(p="a_")}), 6)
         AS slope_change_cents,
       ROUND((({_ITS_ICEPT.format(p="b_")}) + ({_ITS_SLOPE.format(p="b_")}) * 37)
             - (({_ITS_ICEPT.format(p="a_")}) + ({_ITS_SLOPE.format(p="a_")}) * 37), 6)
         AS level_change_cents
FROM wide
"""

QUERIES["orders_interrupted_time_series"] = orders_interrupted_time_series
ORACLE["orders_interrupted_time_series"] = ORDERS_ITS_SQL


# ---------------------------------------------------------------------------
# events_burstiness_memory — the (B, M) plane of inter-arrival dynamics
# ---------------------------------------------------------------------------


def events_burstiness_memory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh-Barabási burstiness/memory plane (EPL 81, 2008) per event
    type: B = (sigma - mu)/(sigma + mu) of inter-arrival times
    (B ~ 0 Poisson, B -> 1 bursty trains) and M = lag-1 Pearson
    correlation of consecutive gaps (M > 0: long gaps follow long
    gaps) — separates burstiness caused by fat-tailed gaps from
    burstiness caused by correlations, which ACF/Hurst alone
    conflate.

    Exactness: gaps are integer MILLISECONDS (total span bounds
    Sum(tau^2) <= max_tau * Sum(tau) <= span^2 = 6.9e18 < 2^63, so
    every moment is BIGINT-safe by construction); B uses the
    n-scaled identity (sqrt(n*Stt - S^2) - S)/(sqrt(n*Stt - S^2) + S)
    — ONE IEEE sqrt over exact integers; M is the Pearson close over
    exact lag-pair sums, 6dp one-shot.

    Scale: one shuffle partitions by type for the two lag windows;
    moments are a |types|-row agg."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    # tau_i = t_i - t_{i-1}; tau_next pairs it with the following gap
    # off the SAME window ordering — one sort, two window reads.
    # Integer DIV, never /1000-then-cast: DuckDB rounds double->int
    # casts while Spark truncates (the documented engine trap).
    g = e.select(
        "event_type",
        F.expr("(us - lag(us) OVER (PARTITION BY event_type ORDER BY us, event_id))"
               " DIV 1000").alias("tau"),
        F.expr("(lead(us) OVER (PARTITION BY event_type ORDER BY us, event_id) - us)"
               " DIV 1000").alias("tau_next"),
    ).where(F.col("tau").isNotNull())
    mom = g.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("tau").cast("bigint").alias("s"),
        F.sum(F.expr("tau * tau")).cast("bigint").alias("stt"),
        F.count("tau_next").cast("bigint").alias("np"),
        F.sum(F.when(F.col("tau_next").isNotNull(), F.col("tau"))).cast("bigint").alias("sx"),
        F.sum("tau_next").cast("bigint").alias("sy"),
        F.sum(F.expr("CASE WHEN tau_next IS NOT NULL THEN tau * tau END")).cast("bigint").alias("sxx"),
        F.sum(F.expr("tau_next * tau_next")).cast("bigint").alias("syy"),
        F.sum(F.expr("tau * tau_next")).cast("bigint").alias("sxy"),
    )
    return mom.select(
        "event_type",
        "n",
        F.expr("CAST(s DIV n AS BIGINT)").alias("mean_gap_ms"),
        F.expr(
            "ROUND((SQRT(CAST(n AS DOUBLE) * stt - CAST(s AS DOUBLE) * s) - s)"
            " / (SQRT(CAST(n AS DOUBLE) * stt - CAST(s AS DOUBLE) * s) + s), 6)"
        ).alias("burstiness_b"),
        F.expr(
            "ROUND((CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / SQRT((CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            "        * (CAST(np AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)"
        ).alias("memory_m"),
    ).orderBy("event_type")


EVENTS_BURSTINESS_SQL = """
WITH g AS (
  SELECT event_type,
         (epoch_us(ts) - LAG(epoch_us(ts)) OVER w) // 1000 AS tau,
         (LEAD(epoch_us(ts)) OVER w - epoch_us(ts)) // 1000 AS tau_next
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id)
),
mom AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(tau) AS BIGINT) AS s,
         CAST(SUM(tau * tau) AS BIGINT) AS stt,
         CAST(COUNT(tau_next) AS BIGINT) AS np,
         CAST(SUM(CASE WHEN tau_next IS NOT NULL THEN tau END) AS BIGINT) AS sx,
         CAST(SUM(tau_next) AS BIGINT) AS sy,
         CAST(SUM(CASE WHEN tau_next IS NOT NULL THEN tau * tau END) AS BIGINT) AS sxx,
         CAST(SUM(tau_next * tau_next) AS BIGINT) AS syy,
         CAST(SUM(tau * tau_next) AS BIGINT) AS sxy
  FROM g WHERE tau IS NOT NULL
  GROUP BY 1
)
SELECT event_type, n,
       CAST(s // n AS BIGINT) AS mean_gap_ms,
       ROUND((SQRT(CAST(n AS DOUBLE) * stt - CAST(s AS DOUBLE) * s) - s)
             / (SQRT(CAST(n AS DOUBLE) * stt - CAST(s AS DOUBLE) * s) + s), 6)
         AS burstiness_b,
       ROUND((CAST(np AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / SQRT((CAST(np AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                    * (CAST(np AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
         AS memory_m
FROM mom ORDER BY event_type
"""

QUERIES["events_burstiness_memory"] = events_burstiness_memory
ORACLE["events_burstiness_memory"] = EVENTS_BURSTINESS_SQL


def orders_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal-trend decomposition of monthly
    revenue (the moving-average STL ancestor, Hyndman & Athanasopoulos
    FPP §6.3): trend = centered 2×12-MA, seasonal index = per
    month-of-year mean of the detrended series re-centered to sum 0,
    remainder = y − trend − seasonal. The decomposition every
    forecasting rung in this suite (snaive/Holt/Holt-Winters/AR2)
    implicitly assumes — here emitted explicitly per month.

    Engine-exact: all components in integer 4dp (hundredths of a
    cent) — the 24-term centered MA is (Σ24 cents × 100) DIV 24 and
    the seasonal means use DIV (both engines truncate toward zero,
    CLAUDE.md r7); one IEEE division per emitted value. BIGINT-safe:
    24 months of cents × 100 stays < 2^63 past sf10.

    Scale: fact table → 80-month DECIMAL series in one map-side-
    combined agg; every window below runs on the 80-row frame."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        money("o_totalprice").alias("price"),
    )
    monthly = o.groupBy("month").agg(
        (F.sum("price") * 100).cast("bigint").alias("cents")
    )
    w1 = Window.orderBy("month").rowsBetween(-6, 5)
    w2 = Window.orderBy("month").rowsBetween(-5, 6)
    t = monthly.select(
        "month",
        "cents",
        F.month("month").alias("moy"),
        F.when(
            (F.count("cents").over(w1) == 12) & (F.count("cents").over(w2) == 12),
            F.expr(
                "(sum(cents) OVER (ORDER BY month ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)"
                " + sum(cents) OVER (ORDER BY month ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING))"
                " * 100 DIV 24"
            ),
        ).alias("trend4"),
    )
    detr = t.withColumn("detr4", F.col("cents") * 100 - F.col("trend4"))
    # per month-of-year mean of the detrended values (DIV truncation,
    # identical on both engines), then re-center the 12 indices to
    # sum ~0 (again DIV)
    idx = (
        detr.where(F.col("trend4").isNotNull())
        .groupBy("moy")
        .agg(F.expr("sum(detr4) DIV count(*)").alias("raw_idx4"))
    )
    centered = idx.crossJoin(
        idx.agg(F.expr("sum(raw_idx4) DIV 12").alias("mean_idx4"))
    ).select("moy", (F.col("raw_idx4") - F.col("mean_idx4")).alias("seasonal4"))
    out = t.join(F.broadcast(centered), "moy").select(
        F.date_format("month", "yyyy-MM").alias("month"),
        (F.col("cents") / 100.0).alias("revenue"),
        (F.col("trend4") / 10000.0).alias("trend"),
        (F.col("seasonal4") / 10000.0).alias("seasonal"),
        ((F.col("cents") * 100 - F.col("trend4") - F.col("seasonal4")) / 10000.0).alias(
            "remainder"
        ),
    )
    return out.orderBy("month")


ORDERS_STL_DECOMPOSE_SQL = """
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) * 100 AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
t AS (
  SELECT month, cents, CAST(month(month) AS INTEGER) AS moy,
         CASE WHEN COUNT(cents) OVER (ORDER BY month
                     ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) = 12
               AND COUNT(cents) OVER (ORDER BY month
                     ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING) = 12
              THEN (SUM(cents) OVER (ORDER BY month
                      ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)
                    + SUM(cents) OVER (ORDER BY month
                      ROWS BETWEEN 5 PRECEDING AND 6 FOLLOWING)) * 100 // 24
         END AS trend4
  FROM monthly
),
idx AS (
  SELECT moy, SUM(cents * 100 - trend4) // COUNT(*) AS raw_idx4
  FROM t WHERE trend4 IS NOT NULL GROUP BY moy
),
centered AS (
  SELECT moy, raw_idx4 - (SELECT SUM(raw_idx4) // 12 FROM idx) AS seasonal4
  FROM idx
)
SELECT strftime(t.month, '%Y-%m') AS month,
       t.cents / 100.0 AS revenue,
       t.trend4 / 10000.0 AS trend,
       c.seasonal4 / 10000.0 AS seasonal,
       (t.cents * 100 - t.trend4 - c.seasonal4) / 10000.0 AS remainder
FROM t JOIN centered c USING (moy)
ORDER BY month
"""

QUERIES["orders_stl_decompose"] = orders_stl_decompose
ORACLE["orders_stl_decompose"] = ORDERS_STL_DECOMPOSE_SQL


def orders_bass_diffusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bass diffusion fit (Bass 1969) on customer adoption: monthly
    NEW customers n_t regressed on cumulative adopters
    n_t = a + b·N_{t−1} + c·N²_{t−1} (the discrete Bass form), then
    the innovation/imitation split p̂ = a/m̂, q̂ = p̂ + b with market
    size m̂ the positive root of c·m² + b·m + a — the canonical
    adoption-curve model every growth forecast quotes.

    Engine-exact: adopters and cumulatives are exact integers; the
    3×3 normal equations use integer power sums up to ΣX⁴ in
    DECIMAL(38,0)/HUGEINT (X ~ 1.5e5 at sf1 → ΣX⁴ ≈ 4e22, far under
    38 digits); Cramer determinants and the quadratic root are IEEE
    expressions of identical shape on both engines.

    Scale: one first-order-per-customer aggregation → an ~80-month
    series; everything after is series-sized."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").cast("date").alias("m")
    )
    first = o.groupBy("o_custkey").agg(F.min("m").alias("m"))
    monthly = first.groupBy("m").agg(F.count(F.lit(1)).alias("n_t"))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    series = monthly.select(
        "n_t", F.coalesce(F.sum("n_t").over(w), F.lit(0)).alias("x")
    )
    d38 = "CAST({} AS DECIMAL(38,0))"
    mom = series.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("x").alias("s1"),
        F.sum(F.expr(d38.format("x") + " * x")).alias("s2"),
        F.sum(F.expr(d38.format("x") + " * x * x")).alias("s3"),
        F.sum(F.expr(d38.format("x") + " * x * x * x")).alias("s4"),
        F.sum("n_t").alias("sy"),
        F.sum(F.expr(d38.format("x") + " * n_t")).alias("sxy"),
        F.sum(F.expr(d38.format("x") + " * x * n_t")).alias("sxxy"),
    )
    # Cramer's rule on [[k,s1,s2],[s1,s2,s3],[s2,s3,s4]]·[a,b,c] = [sy,sxy,sxxy]
    D = (
        "(CAST(k AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    Da = (
        "(CAST(sy AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(sxxy AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s3 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) * CAST(sxxy AS DOUBLE)))"
    )
    Db = (
        "(CAST(k AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(sxxy AS DOUBLE) * CAST(s3 AS DOUBLE))"
        " - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(sxxy AS DOUBLE)"
        " - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    Dc = (
        "(CAST(k AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(sxxy AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(sxy AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(sxxy AS DOUBLE)"
        " - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    a, b, c = f"({Da} / {D})", f"({Db} / {D})", f"({Dc} / {D})"
    m_hat = f"((-{b} - SQRT({b} * {b} - 4 * {a} * {c})) / (2 * {c}))"
    return mom.select(
        F.col("k").cast("bigint").alias("n_months"),
        F.expr(a).alias("coef_a"),
        F.expr(b).alias("coef_b"),
        F.expr(c).alias("coef_c"),
        F.expr(m_hat).alias("market_size"),
        F.expr(f"{a} / {m_hat}").alias("p_innovation"),
        F.expr(f"{a} / {m_hat} + {b}").alias("q_imitation"),
    )


def _bass_sql() -> str:
    D = (
        "(CAST(k AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    Da = (
        "(CAST(sy AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(sxxy AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s3 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) * CAST(sxxy AS DOUBLE)))"
    )
    Db = (
        "(CAST(k AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(sxxy AS DOUBLE) * CAST(s3 AS DOUBLE))"
        " - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(sxxy AS DOUBLE)"
        " - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    Dc = (
        "(CAST(k AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(sxxy AS DOUBLE)"
        " - CAST(s3 AS DOUBLE) * CAST(sxy AS DOUBLE))"
        " - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(sxxy AS DOUBLE)"
        " - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE))"
        " + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE)"
        " - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)))"
    )
    a, b, c = f"({Da} / {D})", f"({Db} / {D})", f"({Dc} / {D})"
    m_hat = f"((-{b} - SQRT({b} * {b} - 4 * {a} * {c})) / (2 * {c}))"
    return f"""
WITH first AS (
  SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS m
  FROM orders GROUP BY 1
),
monthly AS (SELECT m, COUNT(*) AS n_t FROM first GROUP BY 1),
series AS (
  SELECT n_t,
         COALESCE(SUM(n_t) OVER (ORDER BY m
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS x
  FROM monthly
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(x) AS BIGINT) AS s1,
         CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS s2,
         CAST(SUM(CAST(x AS HUGEINT) * x * x) AS HUGEINT) AS s3,
         CAST(SUM(CAST(x AS HUGEINT) * x * x * x) AS HUGEINT) AS s4,
         CAST(SUM(n_t) AS BIGINT) AS sy,
         CAST(SUM(CAST(x AS HUGEINT) * n_t) AS HUGEINT) AS sxy,
         CAST(SUM(CAST(x AS HUGEINT) * x * n_t) AS HUGEINT) AS sxxy
  FROM series
)
SELECT k AS n_months,
       {a} AS coef_a, {b} AS coef_b, {c} AS coef_c,
       {m_hat} AS market_size,
       {a} / {m_hat} AS p_innovation,
       {a} / {m_hat} + {b} AS q_imitation
FROM mom
"""


QUERIES["orders_bass_diffusion"] = orders_bass_diffusion
ORACLE["orders_bass_diffusion"] = _bass_sql()


def events_ewma_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA control chart (Roberts 1959) over daily event counts,
    λ = 1/5 — the small-shift detector next to the CUSUM (orders_
    cusum_control) and X̄-R (orders_xbar_r_chart) siblings: the chart
    statistic z_t = (1−λ)z_{t-1} + λx_t with time-varying limits
    μ ± 3σ_z(t), σ_z²(t) = σ²·(λ/(2−λ))·(1−(1−λ)^{2t}).

    Engine-exact, fully integer: z in e6 units via the truncating
    recurrence z_t = (4·z_{t-1} + x_t·10⁶) DIV 5 (z_1 = x_1·10⁶);
    (1−λ)^{2t} in e12 units via g_t = g_{t-1}·16 DIV 25 (g_0 = 10¹²);
    and with λ = 1/5 the 3σ rule collapses to 9·(λ/(2−λ)) = 1, so the
    out-of-band flag is the EXACT integer compare
    (z_t·n − S·10⁶)² > (n·SS − S²)·(10¹² − g_t) with DECIMAL(38,0)
    products (BIGINT-overflow-safe at any SF; S = Σx, SS = Σx²).
    No floating point anywhere — both engines run identical integer
    folds (Spark: one driver fold over the day-count series, the
    house state-sized-sequential rule; DuckDB: a recursive CTE).

    Scale: raw stream → day grain in ONE map-side-combined agg; the
    fold touches |days| integers."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .orderBy("day")
        .collect()
    )
    xs = [(r["day"], int(r["x"])) for r in daily]
    n = len(xs)
    S = sum(x for _, x in xs)
    SS = sum(x * x for _, x in xs)
    var_num = n * SS - S * S  # σ²·n²
    rows = []
    z = g = None
    for t, (day, x) in enumerate(xs, start=1):
        if t == 1:
            z, g = x * 1_000_000, (10**12 * 16) // 25
        else:
            z = (4 * z + x * 1_000_000) // 5
            g = g * 16 // 25
        # (z/1e6 − S/n)² > σ²·(1 − g/1e12): multiply both sides by
        # 1e12·n² → (z·n − S·1e6)² > var_num·(1e12 − g), exact ints
        oob = (z * n - S * 1_000_000) ** 2 > var_num * (10**12 - g)
        rows.append((t, day, x, z, 1 if oob else 0))
    return spark.createDataFrame(
        rows, "t int, day string, x bigint, z_e6 bigint, oob int"
    ).orderBy("t")


EVENTS_EWMA_SQL = """
WITH RECURSIVE daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, CAST(COUNT(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
ser AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS INTEGER) AS t, day, x FROM daily
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
         CAST(SUM(x * x) AS BIGINT) AS ss
  FROM ser
),
walk AS (
  SELECT t, day, x, x * 1000000 AS z,
         CAST(1000000000000 * 16 // 25 AS BIGINT) AS g
  FROM ser WHERE t = 1
  UNION ALL
  SELECT s.t, s.day, s.x, (4 * w.z + s.x * 1000000) // 5, w.g * 16 // 25
  FROM walk w JOIN ser s ON s.t = w.t + 1
)
SELECT t, day, x, z AS z_e6,
       CASE WHEN CAST(z * n - s * 1000000 AS HUGEINT)
                 * CAST(z * n - s * 1000000 AS HUGEINT)
               > CAST(n * ss - s * s AS HUGEINT)
                 * CAST(1000000000000 - g AS HUGEINT)
            THEN 1 ELSE 0 END AS oob
FROM walk, tot
ORDER BY t
"""

QUERIES["events_ewma_chart"] = events_ewma_chart
ORACLE["events_ewma_chart"] = EVENTS_EWMA_SQL


def events_p_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shewhart p-chart (attribute control chart) on the daily
    purchase-conversion proportion — the SPC chart for a RATE with a
    varying subgroup size, completing the house control-chart family
    (xbar-R for means, EWMA for drift, CUSUM for small shifts, SPRT
    for sequential tests): center line p_bar = total purchases /
    total events; per-day 3-sigma limits p_bar +- 3*sqrt(p_bar *
    (1 - p_bar) / n_t) (wider on quiet days, tighter on busy ones).

    Engine determinism: daily (n, x) are integers; p_ppm is integer
    ppm via DIV (no rounding ties); the limits involve one sqrt —
    IEEE-754 sqrt is correctly rounded, so identical double inputs
    give bit-identical limits on both engines, and the out-of-control
    FLAG compares RAW doubles built by the same expression tree (the
    e6 ROUND on the emitted limits is display-only, never compared
    against). One-shot ROUND of a smooth irrational is measure-zero
    safe (house rule).

    Scale: one day-grain map-side-combined agg; the chart itself is
    |days| rows (time-span-bounded, not corpus-bounded)."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("x"),
    )
    tot = daily.agg(
        F.sum("n").cast("bigint").alias("tn"), F.sum("x").cast("bigint").alias("tx")
    )
    j = daily.crossJoin(F.broadcast(tot))
    pbar = F.col("tx").cast("double") / F.col("tn").cast("double")
    sig = F.sqrt(pbar * (F.lit(1.0) - pbar) / F.col("n").cast("double"))
    ucl = pbar + F.lit(3.0) * sig
    lcl = pbar - F.lit(3.0) * sig
    phat = F.col("x").cast("double") / F.col("n").cast("double")
    flag = (
        F.when(phat > ucl, F.lit("high"))
        .when(phat < lcl, F.lit("low"))
        .otherwise(F.lit("in"))
    )
    return j.select(
        "day",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("x").cast("bigint").alias("n_purchases"),
        F.expr("CAST(x * 1000000 DIV n AS BIGINT)").alias("p_ppm"),
        F.round(ucl, 6).alias("ucl"),
        F.round(lcl, 6).alias("lcl"),
        flag.alias("control"),
    ).orderBy("day")


EVENTS_P_CHART_SQL = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(x) AS BIGINT) AS tx FROM daily)
SELECT day,
       CAST(n AS BIGINT) AS n_events,
       CAST(x AS BIGINT) AS n_purchases,
       CAST(x * 1000000 // n AS BIGINT) AS p_ppm,
       ROUND(CAST(tx AS DOUBLE) / tn
             + 3.0 * sqrt((CAST(tx AS DOUBLE) / tn) * (1.0 - CAST(tx AS DOUBLE) / tn)
                          / CAST(n AS DOUBLE)), 6) AS ucl,
       ROUND(CAST(tx AS DOUBLE) / tn
             - 3.0 * sqrt((CAST(tx AS DOUBLE) / tn) * (1.0 - CAST(tx AS DOUBLE) / tn)
                          / CAST(n AS DOUBLE)), 6) AS lcl,
       CASE WHEN CAST(x AS DOUBLE) / n
               > CAST(tx AS DOUBLE) / tn
                 + 3.0 * sqrt((CAST(tx AS DOUBLE) / tn) * (1.0 - CAST(tx AS DOUBLE) / tn)
                              / CAST(n AS DOUBLE)) THEN 'high'
            WHEN CAST(x AS DOUBLE) / n
               < CAST(tx AS DOUBLE) / tn
                 - 3.0 * sqrt((CAST(tx AS DOUBLE) / tn) * (1.0 - CAST(tx AS DOUBLE) / tn)
                              / CAST(n AS DOUBLE)) THEN 'low'
            ELSE 'in' END AS control
FROM daily, tot
ORDER BY day
"""

QUERIES["events_p_chart"] = events_p_chart
ORACLE["events_p_chart"] = EVENTS_P_CHART_SQL


def events_sample_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample entropy (Richman & Moorman 2000) of the daily
    event-count series, m = 2 — the regularity statistic
    physiologic/ops monitoring uses where spectral methods fail:
    SampEn = -ln(A/B) with B = matching template pairs of length m
    and A = of length m+1 (Chebyshev distance <= r, self-matches
    excluded). Low SampEn = self-similar/regular load; high = noise.

    Engine determinism: the series is integer counts; the tolerance
    r = (max - min) DIV 10 is integer (no sd/sqrt in the tolerance,
    which would couple r to float rounding); template matching is
    pure integer comparisons, so A and B are exact integers on both
    engines; the single transcendental ln(B/A) is a one-shot e6
    ROUND of a ratio of integers (measure-zero ties, house rule).

    Scale: SampEn needs every template PAIR, but the series is
    |days| rows — TIME-SPAN-bounded, not corpus-bounded: the
    day-grain agg is the only corpus scan (localCheckpointed once,
    since three branches — templates, tolerance, template count —
    would otherwise each re-scan the corpus); the pair join is a
    broadcast nested-loop over <=~2.4k rows (~3M integer compares)
    at ANY corpus size."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    ).localCheckpoint(eager=True)
    w = Window.orderBy("day")
    ser = daily.select(
        F.row_number().over(w).alias("t"),
        F.col("y").cast("bigint").alias("y0"),
        F.lead("y", 1).over(w).cast("bigint").alias("y1"),
        F.lead("y", 2).over(w).cast("bigint").alias("y2"),
    ).where(F.col("y2").isNotNull())
    # integer tolerance from the full-series range (same rows: y0 of
    # the trimmed frame misses the last 2 days; recompute on daily)
    rng = daily.agg(
        F.expr("CAST((MAX(y) - MIN(y)) DIV 10 AS BIGINT)").alias("r")
    )
    a = ser.select(
        F.col("t").alias("i"),
        F.col("y0").alias("a0"),
        F.col("y1").alias("a1"),
        F.col("y2").alias("a2"),
    )
    b = ser.select(
        F.col("t").alias("j"),
        F.col("y0").alias("b0"),
        F.col("y1").alias("b1"),
        F.col("y2").alias("b2"),
    )
    pairs = (
        a.join(F.broadcast(b), F.col("i") < F.col("j"))
        .crossJoin(F.broadcast(rng))
        .select(
            (
                (F.abs(F.col("a0") - F.col("b0")) <= F.col("r"))
                & (F.abs(F.col("a1") - F.col("b1")) <= F.col("r"))
            ).alias("m_match"),
            (
                (F.abs(F.col("a0") - F.col("b0")) <= F.col("r"))
                & (F.abs(F.col("a1") - F.col("b1")) <= F.col("r"))
                & (F.abs(F.col("a2") - F.col("b2")) <= F.col("r"))
            ).alias("m1_match"),
        )
    )
    agg = pairs.agg(
        F.sum(F.when(F.col("m_match"), 1).otherwise(0)).cast("bigint").alias("b_count"),
        F.sum(F.when(F.col("m1_match"), 1).otherwise(0)).cast("bigint").alias("a_count"),
    )
    n_tpl = ser.count()
    return agg.crossJoin(F.broadcast(rng)).select(
        F.lit(int(n_tpl)).cast("bigint").alias("n_templates"),
        F.col("r").cast("bigint").alias("r_tol"),
        "b_count",
        "a_count",
        F.when(
            (F.col("a_count") > 0) & (F.col("b_count") > 0),
            F.round(
                F.log(F.col("b_count").cast("double") / F.col("a_count").cast("double"))
                * 1e6
            ).cast("bigint"),
        ).alias("sampen_e6"),
    )


EVENTS_SAMPEN_SQL = """
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS y FROM events GROUP BY 1
),
rng AS (
  SELECT CAST((MAX(y) - MIN(y)) // 10 AS BIGINT) AS r FROM daily
),
ser AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) AS t,
         CAST(y AS BIGINT) AS y0,
         CAST(LEAD(y, 1) OVER (ORDER BY day) AS BIGINT) AS y1,
         CAST(LEAD(y, 2) OVER (ORDER BY day) AS BIGINT) AS y2
  FROM daily
),
tpl AS (SELECT * FROM ser WHERE y2 IS NOT NULL),
pairs AS (
  SELECT CASE WHEN abs(a.y0 - b.y0) <= r.r AND abs(a.y1 - b.y1) <= r.r
              THEN 1 ELSE 0 END AS m_match,
         CASE WHEN abs(a.y0 - b.y0) <= r.r AND abs(a.y1 - b.y1) <= r.r
                   AND abs(a.y2 - b.y2) <= r.r
              THEN 1 ELSE 0 END AS m1_match
  FROM tpl a JOIN tpl b ON a.t < b.t CROSS JOIN rng r
),
agg AS (
  SELECT CAST(SUM(m_match) AS BIGINT) AS b_count,
         CAST(SUM(m1_match) AS BIGINT) AS a_count
  FROM pairs
)
SELECT CAST((SELECT COUNT(*) FROM tpl) AS BIGINT) AS n_templates,
       r.r AS r_tol,
       a.b_count,
       a.a_count,
       CASE WHEN a.a_count > 0 AND a.b_count > 0
            THEN CAST(ROUND(ln(CAST(a.b_count AS DOUBLE) / a.a_count) * 1000000)
                      AS BIGINT)
            END AS sampen_e6
FROM agg a, rng r
"""

QUERIES["events_sample_entropy"] = events_sample_entropy
ORACLE["events_sample_entropy"] = EVENTS_SAMPEN_SQL


def events_dfa_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detrended fluctuation analysis (Peng et al. 1994) of the daily
    event-count series — the long-range-correlation exponent that,
    unlike the R/S Hurst twin (events_hurst_exponent), stays valid
    under nonstationarity: integrate the mean-centered series into a
    profile, split into boxes of s ∈ {4, 8, 16, 32} days, OLS-detrend
    each box, and regress log F²(s) on log s; α = slope/2 (α ≈ 0.5
    white noise, > 0.5 persistent, ≈ 1 pink/1-over-f load).

    Engine-exact: per-day deviations are n-INDEPENDENT downscaled
    integers (d_i = (N·y_i − S) DIV k, k = GREATEST(1, S DIV 1e7)
    computed IN-PLAN from the same agg — k = 1 at every driver tier
    so recorded rounds stay bit-identical, and at 100 TB the
    DECIMAL(38,0) quadratic forms stay bounded: the r8 Mahalanobis
    rule); per-box SSE·n·B = C·B − A² is an exact integer in the
    standard scaled OLS form (A = nΣτY − ΣτΣY, B = nΣτ² − (Στ)², C =
    nΣY² − (ΣY)²); the only floats are FOUR one-shot e6-rounded
    ln(F²(s)) values and the closing 4-point regression is integer
    e6 algebra with one final DIV.

    Scale: one corpus scan to day grain (localCheckpointed — profile,
    scale guard, and box stats all read it); everything after is
    |days|×4 rows."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(F.count(F.lit(1)).alias("y"))
    ).localCheckpoint(eager=True)
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("nn"),
        F.sum("y").cast("bigint").alias("s_tot"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    prof = (
        daily.crossJoin(F.broadcast(tot))
        .withColumn("k", F.expr("GREATEST(CAST(1 AS BIGINT), s_tot DIV 10000000)"))
        .withColumn("d", F.expr("(nn * y - s_tot) DIV k"))
        .withColumn("t", F.row_number().over(Window.orderBy("day")))
        .withColumn("yy", F.sum("d").over(w).cast("bigint"))
        .select("t", "yy", "nn")
    )
    boxed = prof.select(
        "t",
        "yy",
        "nn",
        F.explode(F.array(F.lit(4), F.lit(8), F.lit(16), F.lit(32))).alias("s"),
    ).where(
        F.expr("(t - 1) DIV s < nn DIV s")  # full boxes only
    )
    dec = "CAST({x} AS DECIMAL(38,0))"
    per_box = (
        boxed.withColumn("box", F.expr("(t - 1) DIV s"))
        .withColumn("tau", F.expr("t - ((t - 1) DIV s) * s"))
        .groupBy("s", "box")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("tau").cast("bigint").alias("st"),
            F.sum(F.expr("tau * tau")).cast("bigint").alias("stt"),
            F.sum(F.expr(dec.format(x="yy"))).cast("decimal(38,0)").alias("sy"),
            F.sum(F.expr(dec.format(x="yy") + " * " + dec.format(x="yy")))
            .cast("decimal(38,0)")
            .alias("syy"),
            F.sum(F.expr("CAST(tau AS DECIMAL(38,0)) * CAST(yy AS DECIMAL(38,0))"))
            .cast("decimal(38,0)")
            .alias("sty"),
        )
    )
    per_s = (
        per_box.withColumn(
            "a_",
            F.expr(
                "CAST(n AS DECIMAL(38,0)) * sty - CAST(st AS DECIMAL(38,0)) * sy"
            ).cast("decimal(38,0)"),
        )
        .withColumn(
            "b_",
            F.expr("CAST(n * stt - st * st AS DECIMAL(38,0))"),
        )
        .withColumn(
            "c_",
            F.expr("CAST(n AS DECIMAL(38,0)) * syy - sy * sy").cast("decimal(38,0)"),
        )
        .withColumn("ssenum", F.expr("c_ * b_ - a_ * a_").cast("decimal(38,0)"))
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_boxes"),
            F.sum("ssenum").cast("decimal(38,0)").alias("sum_ssenum"),
            F.first("b_").alias("bconst"),
            F.first("n").alias("nconst"),
        )
    )
    lf2 = F.round(
        F.log(
            F.col("sum_ssenum").cast("double")
            / (
                F.col("nconst").cast("double")
                * F.col("nconst").cast("double")
                * F.col("bconst").cast("double")
                * F.col("n_boxes").cast("double")
            )
        )
        * 1e6
    ).cast("bigint")
    import math as _math

    ls_map = {s: round(_math.log(s) * 1e6) for s in (4, 8, 16, 32)}
    ls_expr = (
        F.when(F.col("s") == 4, ls_map[4])
        .when(F.col("s") == 8, ls_map[8])
        .when(F.col("s") == 16, ls_map[16])
        .otherwise(ls_map[32])
        .cast("bigint")
    )
    pts = per_s.select(
        "s", "n_boxes", lf2.alias("lf2_e6"), ls_expr.alias("ls_e6")
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    closed = pts.select(
        "s",
        "n_boxes",
        "lf2_e6",
        F.count(F.lit(1)).over(wall).alias("np"),
        F.sum("ls_e6").over(wall).alias("sl"),
        F.sum(F.expr("ls_e6 * ls_e6")).over(wall).alias("sll"),
        F.sum("lf2_e6").over(wall).alias("sf"),
        F.sum(F.expr("ls_e6 * lf2_e6")).over(wall).alias("slf"),
    )
    # slope of lf2 on ls is 2α → α_ppm = num·1e6 DIV (2·den); the
    # e6·e6 cross products overflow LONG, so the algebra rides
    # DECIMAL(38,0) (DuckDB's window SUMs are HUGEINT already)
    alpha = F.expr(
        "CAST((CAST(np AS DECIMAL(38,0)) * CAST(slf AS DECIMAL(38,0))"
        " - CAST(sl AS DECIMAL(38,0)) * CAST(sf AS DECIMAL(38,0)))"
        " * CAST(1000000 AS DECIMAL(38,0))"
        " DIV (CAST(2 AS DECIMAL(38,0)) * (CAST(np AS DECIMAL(38,0)) * CAST(sll AS DECIMAL(38,0))"
        " - CAST(sl AS DECIMAL(38,0)) * CAST(sl AS DECIMAL(38,0)))) AS BIGINT)"
    )
    return closed.select(
        F.col("s").cast("int").alias("box_size"),
        "n_boxes",
        "lf2_e6",
        alpha.alias("alpha_ppm"),
    ).orderBy("box_size")


def _dfa_sql() -> str:
    import math as _math

    ls_case = " ".join(
        f"WHEN s = {s} THEN {round(_math.log(s) * 1e6)}" for s in (4, 8, 16, 32)
    )
    return f"""
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS y FROM events GROUP BY 1
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(y) AS BIGINT) AS s_tot FROM daily
),
prof AS (
  SELECT ROW_NUMBER() OVER (ORDER BY day) AS t,
         CAST(SUM((tot.nn * y - tot.s_tot)
                  // GREATEST(CAST(1 AS BIGINT), tot.s_tot // 10000000))
              OVER (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS yy,
         tot.nn AS nn
  FROM daily, tot
),
boxed AS (
  SELECT s, (t - 1) // s AS box, t - ((t - 1) // s) * s AS tau, yy
  FROM prof, (SELECT unnest([4, 8, 16, 32]) AS s) sz
  WHERE (t - 1) // s < nn // s
),
per_box AS (
  SELECT s, box, COUNT(*) AS n,
         CAST(SUM(tau) AS BIGINT) AS st,
         CAST(SUM(tau * tau) AS BIGINT) AS stt,
         CAST(SUM(CAST(yy AS HUGEINT)) AS HUGEINT) AS sy,
         CAST(SUM(CAST(yy AS HUGEINT) * yy) AS HUGEINT) AS syy,
         CAST(SUM(CAST(tau AS HUGEINT) * yy) AS HUGEINT) AS sty
  FROM boxed GROUP BY 1, 2
),
per_s AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS n_boxes,
         SUM((CAST(n AS HUGEINT) * syy - sy * sy) * (CAST(n AS HUGEINT) * stt - st * st)
             - (CAST(n AS HUGEINT) * sty - CAST(st AS HUGEINT) * sy)
               * (CAST(n AS HUGEINT) * sty - CAST(st AS HUGEINT) * sy)) AS sum_ssenum,
         MIN(CAST(n AS HUGEINT) * stt - st * st) AS bconst,
         MIN(n) AS nconst
  FROM per_box GROUP BY 1
),
pts AS (
  SELECT s, n_boxes,
         CAST(ROUND(ln(CAST(sum_ssenum AS DOUBLE)
                       / (CAST(nconst AS DOUBLE) * CAST(nconst AS DOUBLE)
                          * CAST(bconst AS DOUBLE) * CAST(n_boxes AS DOUBLE))) * 1000000)
              AS BIGINT) AS lf2_e6,
         CAST(CASE {ls_case} END AS BIGINT) AS ls_e6
  FROM per_s
),
closed AS (
  SELECT s, n_boxes, lf2_e6,
         COUNT(*) OVER () AS np,
         SUM(ls_e6) OVER () AS sl,
         SUM(ls_e6 * ls_e6) OVER () AS sll,
         SUM(lf2_e6) OVER () AS sf,
         SUM(ls_e6 * lf2_e6) OVER () AS slf
  FROM pts
)
SELECT CAST(s AS INTEGER) AS box_size, n_boxes, lf2_e6,
       CAST((np * slf - sl * sf) * 1000000 // (2 * (np * sll - sl * sl)) AS BIGINT)
         AS alpha_ppm
FROM closed
ORDER BY box_size
"""


QUERIES["events_dfa_exponent"] = events_dfa_exponent
ORACLE["events_dfa_exponent"] = _dfa_sql()


def orders_theta_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-method forecast (Assimakopoulos & Nikolopoulos 2000 —
    the M3-competition winner and the benchmark every forecasting
    paper still reports) of monthly order counts, horizons 1–4:
    decompose into the θ=0 line (the OLS linear trend) and the θ=2
    line (2y_t − trend_t, double-curvature), smooth the θ=2 line
    with SES (α = 1/2), and combine ŷ(T+h) = ½·trend(T+h) + ½·SES
    level.

    FULLY INTEGER, both engines: with D = T·(T·Στ² − (Στ)²), the
    θ=2 line scales to U_t = 2y_t·D − (Σy·Bd − Bn·Στ + T·Bn·t)
    (exact BIGINT/py-int); α = 1/2 makes SES the truncating integer
    recurrence s_t = (U_t + s_{t−1}) DIV 2 (trunc-toward-zero on
    BOTH engines — Python's floor // is corrected for negatives in
    the fold); the forecast closes as one integer e6 DIV by 2D. No
    rounding anywhere, so no half-even/half-away trap (the r4 Holt
    lesson) and no recursive-CTE cost on Spark (state-sized fold in
    one Arrow batch; DuckDB keeps the recursion).

    Scale: orders collapse map-side to the |months| count series;
    the sequential part touches state, not data."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    )
    monthly = o.groupBy("month").agg(F.count(F.lit(1)).cast("bigint").alias("y"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("month")
        ys = [int(v) for v in pdf["y"]]
        T = len(ys)
        st = T * (T + 1) // 2
        stt = T * (T + 1) * (2 * T + 1) // 6
        sy = sum(ys)
        sty = sum((i + 1) * y for i, y in enumerate(ys))
        bn = T * sty - st * sy  # slope numerator
        bd = T * stt - st * st  # slope denominator
        D = T * bd

        def trunc_half(v: int) -> int:
            return -((-v) // 2) if v < 0 else v // 2

        s = None
        for t, y in enumerate(ys, start=1):
            u = 2 * y * D - (sy * bd - bn * st + T * bn * t)
            s = u if s is None else trunc_half(u + s)
        rows = []
        for h in range(1, 5):
            v = sy * bd - bn * st + T * bn * (T + h)  # trend(T+h)·D
            num = (v + s) * 1_000_000
            den = 2 * D
            fc = num // den if num >= 0 else -((-num) // den)
            rows.append((h, fc, T))
        return pd.DataFrame(rows, columns=["horizon", "forecast_e6", "n_months"])

    return (
        monthly.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(fold, "horizon int, forecast_e6 long, n_months int")
        .orderBy("horizon")
    )


ORDERS_THETA_SQL = """
WITH RECURSIVE
monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month, COUNT(*) AS y
  FROM orders GROUP BY 1
),
series AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY month) AS BIGINT) AS t,
         CAST(y AS HUGEINT) AS y
  FROM monthly
),
c AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS tn,
         CAST(SUM(t) AS HUGEINT) AS st,
         CAST(SUM(t * t) AS HUGEINT) AS stt,
         CAST(SUM(y) AS HUGEINT) AS sy,
         CAST(SUM(t * y) AS HUGEINT) AS sty
  FROM series
),
k AS (
  SELECT tn, st, sy,
         tn * sty - st * sy AS bn,
         tn * stt - st * st AS bd,
         tn * (tn * stt - st * st) AS d
  FROM c
),
u AS (
  SELECT s.t, 2 * s.y * k.d - (k.sy * k.bd - k.bn * k.st + k.tn * k.bn * s.t) AS u
  FROM series s, k
),
ses(t, s) AS (
  SELECT CAST(1 AS BIGINT), (SELECT u FROM u WHERE t = 1)
  UNION ALL
  SELECT w.t + 1, (nxt.u + w.s) // 2
  FROM ses w JOIN u nxt ON nxt.t = w.t + 1
),
fin AS (SELECT s FROM ses WHERE t = (SELECT MAX(t) FROM ses))
SELECT CAST(h.horizon AS INTEGER) AS horizon,
       CAST(((k.sy * k.bd - k.bn * k.st + k.tn * k.bn * (k.tn + h.horizon)) + fin.s)
            * 1000000 // (2 * k.d) AS BIGINT) AS forecast_e6,
       CAST(k.tn AS INTEGER) AS n_months
FROM fin, k, (VALUES (1), (2), (3), (4)) AS h(horizon)
ORDER BY horizon
"""

QUERIES["orders_theta_forecast"] = orders_theta_forecast
ORACLE["orders_theta_forecast"] = ORDERS_THETA_SQL


_ADSTOCK_W = 20  # geometric λ=1/2 carryover is < 1e-6 past 20 periods


def _adstock_frag(cast: str) -> str:
    """Σ_{k=0..19} lag_k(x)·2^(19−k) — the λ=1/2 geometric adstock
    scaled by 2^19, generated ONCE as an explicit term list so both
    engines run the identical integer expression (no pow(), no
    recursion; the window is the |months| table)."""
    terms = [
        f"CAST(COALESCE(LAG(x, {k}) OVER (ORDER BY month), 0) AS {cast})"
        f" * {2 ** (_ADSTOCK_W - 1 - k)}"
        for k in range(_ADSTOCK_W)
    ]
    return " + ".join(terms)


def orders_adstock_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adstock (geometric-decay carryover, λ = 1/2) marketing-mix
    regression: monthly revenue on the ADSTOCKED urgent-order count —
    the MMM building block where raw same-period regression
    misattributes carryover effects (this period's demand partly
    reflects last period's push). Urgent-order volume stands in for
    the media variable; the adstock transform IS the operator.

    Engine-exact: the adstock is an exact integer (20-term 2-power
    dot product over lagged counts — λ=1/2 makes every weight a
    power of two, no floats, window truncation < 1e-6 of mass, then
    ONE truncating ÷2¹⁹ to e6 scale); revenue is DECIMAL cents; the
    OLS slope closes in DECIMAL(38,0) integer algebra and R² is one
    identical IEEE double expression (p-chart contract), one-shot
    6dp ROUND.

    Scale: one order-grain scan to the |months| series; the lag
    window and regression run on time-bounded rows."""
    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
        F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0).alias("u"),
        (money("o_totalprice") * 100).cast("decimal(38,0)").alias("cents"),
    )
    monthly = o.groupBy("month").agg(
        F.sum("u").cast("bigint").alias("x"),
        F.sum("cents").cast("decimal(38,0)").alias("y"),
    )
    ad = monthly.withColumn(
        "a_e6",
        F.expr(
            f"CAST(({_adstock_frag('DECIMAL(38,0)')}) * 1000000"
            f" DIV {2 ** (_ADSTOCK_W - 1)} AS DECIMAL(38,0))"
        ),
    )
    agg = ad.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("a_e6").cast("decimal(38,0)").alias("sa"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("a_e6 * y")).cast("decimal(38,0)").alias("say"),
        F.sum(F.expr("a_e6 * a_e6")).cast("decimal(38,0)").alias("saa"),
        F.sum(F.expr("y * y")).cast("decimal(38,0)").alias("syy"),
    )
    num = "(n * say - sa * sy)"
    return agg.select(
        F.col("n").cast("bigint").alias("n_months"),
        F.expr(
            f"CAST({num} * CAST(1000000000 AS DECIMAL(38,0))"
            " DIV (n * saa - sa * sa) AS BIGINT)"
        ).alias("slope_e9"),
        F.expr(
            f"ROUND(CAST({num} AS DOUBLE) * CAST({num} AS DOUBLE)"
            " / (CAST(n * saa - sa * sa AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)"
        ).alias("r2"),
    )


def _adstock_sql() -> str:
    return f"""
WITH monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS x,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS HUGEINT) AS y
  FROM orders GROUP BY 1
),
ad AS (
  SELECT month, x, y,
         CAST(({_adstock_frag('HUGEINT')}) * 1000000 // {2 ** (_ADSTOCK_W - 1)}
              AS HUGEINT) AS a_e6
  FROM monthly
),
agg AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         SUM(a_e6) AS sa, SUM(y) AS sy,
         SUM(a_e6 * y) AS say, SUM(a_e6 * a_e6) AS saa, SUM(y * y) AS syy
  FROM ad
)
SELECT CAST(n AS BIGINT) AS n_months,
       CAST((n * say - sa * sy) * 1000000000 // (n * saa - sa * sa) AS BIGINT) AS slope_e9,
       ROUND(CAST(n * say - sa * sy AS DOUBLE) * CAST(n * say - sa * sy AS DOUBLE)
             / (CAST(n * saa - sa * sa AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)), 6)
         AS r2
FROM agg
"""


QUERIES["orders_adstock_regression"] = orders_adstock_regression
ORACLE["orders_adstock_regression"] = _adstock_sql()


def events_adwin_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADWIN-style adaptive-window drift scan (Bifet & Gavaldà 2007)
    over the daily purchase-share series: for EVERY split of the
    day window into prefix/suffix, test |μ₁ − μ₂| ≥ ε_cut(n₁, n₂) =
    √(ln(4N/δ) / 2m), m the harmonic count — the change detector
    that needs no tuning window, completing the drift family
    (Page–Hinkley for resets, CUSUM for small shifts, PSI/Wasserstein
    for distributions). δ = 0.05.

    Determinism: daily shares are integer ppm (x·10⁶ DIV n); split
    means compare CROSS-MULTIPLIED (|S₁k₂ − S₂k₁| vs ε·k₁k₂ — no
    float means); ε_cut carries the only transcendentals (one ln +
    one sqrt per split, e6-rounded one-shot on the
    time-span-bounded split table).

    Scale: one day-grain corpus agg; the split table is |days|−1
    rows with two cumulative windows."""
    import math as _math

    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(F.date_format("ts", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("x"),
        )
        .select("day", F.expr("CAST(x * 1000000 DIV n AS BIGINT)").alias("p_ppm"))
    ).localCheckpoint(eager=True)
    w = Window.orderBy("day")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ln4d = round(_math.log(4.0 / 0.05) * 1e6)  # ln(4/δ) e6; +ln N folded below
    ann = (
        daily.withColumn("k1", F.row_number().over(w).cast("bigint"))
        .withColumn("s1", F.sum("p_ppm").over(wcum).cast("bigint"))
        .withColumn("nn", F.count(F.lit(1)).over(wall).cast("bigint"))
        .withColumn("st", F.sum("p_ppm").over(wall).cast("bigint"))
        .where(F.col("k1") < F.col("nn"))
    )
    # ε_cut in ppm units of the share: 1e6·sqrt(ln(4N/δ)/(2m));
    # one-shot e6 ROUND of a smooth irrational per split
    eps = (
        "CAST(ROUND(1000000.0 * sqrt((ln(CAST(nn AS DOUBLE)) + " + str(ln4d / 1e6) + ")"
        " * (CAST(k1 AS DOUBLE) + CAST(nn - k1 AS DOUBLE))"
        " / (2.0 * CAST(k1 AS DOUBLE) * CAST(nn - k1 AS DOUBLE)))) AS BIGINT)"
    )
    return ann.select(
        F.col("day").alias("split_day"),
        F.col("k1").alias("n_before"),
        (F.col("nn") - F.col("k1")).alias("n_after"),
        F.expr(
            "CAST(abs(s1 * (nn - k1) - (st - s1) * k1) DIV (k1 * (nn - k1)) AS BIGINT)"
        ).alias("mean_diff_ppm"),
        F.expr(eps).alias("eps_cut_ppm"),
        F.expr(
            f"abs(s1 * (nn - k1) - (st - s1) * k1) >= {eps} * k1 * (nn - k1)"
        ).alias("drift"),
    ).orderBy("split_day")


def _adwin_sql() -> str:
    import math as _math

    ln4d = round(_math.log(4.0 / 0.05) * 1e6) / 1e6
    eps = (
        f"CAST(ROUND(1000000.0 * sqrt((ln(CAST(nn AS DOUBLE)) + {ln4d})"
        " * (CAST(k1 AS DOUBLE) + CAST(nn - k1 AS DOUBLE))"
        " / (2.0 * CAST(k1 AS DOUBLE) * CAST(nn - k1 AS DOUBLE)))) AS BIGINT)"
    )
    return f"""
WITH daily AS (
  SELECT strftime(ts, '%Y-%m-%d') AS day,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 1000000
              // COUNT(*) AS BIGINT) AS p_ppm
  FROM events GROUP BY 1
),
ann AS (
  SELECT day,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS k1,
         CAST(SUM(p_ppm) OVER (ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
         CAST(COUNT(*) OVER () AS BIGINT) AS nn,
         CAST(SUM(p_ppm) OVER () AS BIGINT) AS st
  FROM daily
)
SELECT day AS split_day,
       k1 AS n_before,
       nn - k1 AS n_after,
       CAST(abs(s1 * (nn - k1) - (st - s1) * k1) // (k1 * (nn - k1)) AS BIGINT)
         AS mean_diff_ppm,
       {eps} AS eps_cut_ppm,
       abs(s1 * (nn - k1) - (st - s1) * k1) >= {eps} * k1 * (nn - k1) AS drift
FROM ann WHERE k1 < nn
ORDER BY split_day
"""


QUERIES["events_adwin_drift"] = events_adwin_drift
ORACLE["events_adwin_drift"] = _adwin_sql()


def orders_hierarchical_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical forecast reconciliation (nation → total) with
    seasonal-naive base forecasts: the coherence problem every
    rolled-up planning stack hits — nation-level forecasts summed
    (BOTTOM-UP) never equal the independently-forecast total, and
    TOP-DOWN shares hide nation dynamics; this emits both
    reconciliations plus the incoherence gap per nation, the report
    that decides which way the hierarchy is reconciled (Hyndman's
    hts framing, base method = snaive so every number stays an
    exact integer).

    Engine-exact: base forecasts are lag-12 integer counts; shares
    are integer ppm (nation pre-total DIV grand total); top-down
    allocations are one truncating DIV; gaps are integer
    differences. No floats anywhere.

    Scale: one fact-dim join to (nation, month) cells, lag windows
    partitioned by nation, |nations| output rows."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    cells = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "month")
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    last = cells.agg(F.max("month").alias("mx"))
    j = cells.crossJoin(F.broadcast(last))
    # snaive for the month AFTER the horizon = value 11 months back
    base_fc = j.where(
        F.expr("month = add_months(mx, -11)")
    ).select(F.col("n_name").alias("nation"), F.col("y").alias("snaive_fc"))
    totals = j.groupBy("n_name").agg(F.sum("y").cast("bigint").alias("hist"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    shares = totals.withColumn(
        "grand", F.sum("hist").over(wall).cast("bigint")
    ).select(
        F.col("n_name").alias("nation"),
        "hist",
        F.expr("CAST(hist * 1000000 DIV grand AS BIGINT)").alias("share_ppm"),
    )
    out = base_fc.join(shares, "nation")
    wagg = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        out.withColumn("bu_total", F.sum("snaive_fc").over(wagg).cast("bigint"))
        .select(
            "nation",
            "snaive_fc",
            "share_ppm",
            F.expr("CAST(bu_total * share_ppm DIV 1000000 AS BIGINT)").alias("td_fc"),
            F.expr(
                "CAST(snaive_fc - bu_total * share_ppm DIV 1000000 AS BIGINT)"
            ).alias("coherence_gap"),
            "bu_total",
        )
        .orderBy("nation")
    )


ORDERS_HIER_FC_SQL = """
WITH cells AS (
  SELECT n.n_name, date_trunc('month', o.o_orderdate) AS month,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
last AS (SELECT MAX(month) AS mx FROM cells),
base_fc AS (
  SELECT n_name AS nation, y AS snaive_fc
  FROM cells, last WHERE month = mx - INTERVAL 11 MONTH
),
shares AS (
  SELECT n_name AS nation, CAST(SUM(y) AS BIGINT) AS hist,
         CAST(SUM(y) * 1000000 // SUM(SUM(y)) OVER () AS BIGINT) AS share_ppm
  FROM cells GROUP BY 1
),
j AS (
  SELECT b.nation, b.snaive_fc, s.share_ppm,
         CAST(SUM(b.snaive_fc) OVER () AS BIGINT) AS bu_total
  FROM base_fc b JOIN shares s ON s.nation = b.nation
)
SELECT nation, snaive_fc, share_ppm,
       CAST(bu_total * share_ppm // 1000000 AS BIGINT) AS td_fc,
       CAST(snaive_fc - bu_total * share_ppm // 1000000 AS BIGINT) AS coherence_gap,
       bu_total
FROM j
ORDER BY nation
"""

QUERIES["orders_hierarchical_forecast"] = orders_hierarchical_forecast
ORACLE["orders_hierarchical_forecast"] = ORDERS_HIER_FC_SQL


# ---------------------------------------------------------------------------
# round 10: spectral entropy, Haar wavelet energy, Kalman local level
# ---------------------------------------------------------------------------


def events_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spectral entropy of the hourly event-rate series: Shannon
    entropy of the normalized periodogram over the Fourier
    frequencies k = 1..min(n/2, 256) — the single-number
    "how forecastable is this series" score (white noise → 1.0,
    a pure cycle → ~0) that forecasting pipelines (e.g. the
    tsfeatures/M4 literature) use to route series between naive and
    seasonal models. Complements events_periodogram (fixed candidate
    periods) with the full-spectrum view.

    Engine-exact: the series is DEMEANED IN INTEGERS (dev_num =
    n·c_t − S, exact BIGINT; the /n happens once in IEEE inside each
    trig term), each cos/sin term is 6dp-rounded and DECIMAL-summed
    (periodogram discipline), per-frequency power is one IEEE
    A²+B² ROUND 6, then quantized to integer e3 via FLOOR (identical
    doubles → identical floor) so the TOTAL power is an exact integer
    sum — never a float Σ across frequencies; p·ln p terms are
    6dp-rounded DECIMALs (transcendental discipline) and the final
    normalization is one IEEE division by ln(m).

    Scale: the stream collapses to ≤|hours| cells first; the trig
    grid is |hours|·min(n/2,256) rows on the COLLAPSED series —
    corpus-size-independent (span², not rows)."""
    pi = "3.141592653589793"
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour")
    )
    hourly = e.groupBy("hour").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    series = hourly.select(
        (F.row_number().over(Window.orderBy("hour")) - 1).cast("bigint").alias("t"),
        "c",
        F.sum("c").over(wall).cast("bigint").alias("s"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
    )
    ks = series.select(
        "t", "c", "s", "n", F.explode(F.expr("sequence(1, LEAST(n DIV 2, 256))")).alias("k")
    )
    ang = F.expr(f"CAST(2 AS DOUBLE) * CAST({pi} AS DOUBLE) * k * t / n")
    terms = ks.select(
        "k",
        "n",
        F.round(F.expr("CAST(n * c - s AS DOUBLE) / n") * F.cos(ang), 6)
        .cast("decimal(28,6)")
        .alias("a"),
        F.round(F.expr("CAST(n * c - s AS DOUBLE) / n") * F.sin(ang), 6)
        .cast("decimal(28,6)")
        .alias("b"),
    )
    power = terms.groupBy("k").agg(
        F.max("n").alias("n"),
        F.expr(
            "CAST(FLOOR(ROUND(POW(CAST(SUM(a) AS DOUBLE), 2)"
            " + POW(CAST(SUM(b) AS DOUBLE), 2), 6) * 1000) AS BIGINT)"
        ).alias("pe3"),
    )
    kept = power.where(F.col("pe3") > 0).select(
        "k",
        "n",
        "pe3",
        F.sum("pe3").over(wall).cast("bigint").alias("stot"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("m_kept"),
    )
    contrib = kept.select(
        "n",
        "m_kept",
        F.expr(
            "CAST(ROUND(-(CAST(pe3 AS DOUBLE) / CAST(stot AS DOUBLE))"
            " * LN(CAST(pe3 AS DOUBLE) / CAST(stot AS DOUBLE)), 6) AS DECIMAL(28,6))"
        ).alias("h"),
    )
    return contrib.groupBy().agg(
        F.max("n").cast("bigint").alias("n_hours"),
        F.max("m_kept").cast("bigint").alias("m_freqs"),
        F.round(F.sum("h").cast("double"), 6).alias("entropy"),
        F.expr(
            "ROUND(CAST(SUM(h) AS DOUBLE) / LN(CAST(MAX(m_kept) AS DOUBLE)), 6)"
        ).alias("entropy_norm"),
    )


SPECTRAL_ENTROPY_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
series AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY hour) AS BIGINT) - 1 AS t, c,
         CAST(SUM(c) OVER () AS BIGINT) AS s,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM hourly
),
ks AS (
  SELECT t, c, s, n, k
  FROM series, LATERAL (SELECT unnest(generate_series(1, 256)) AS k) g
  WHERE k <= n // 2
),
terms AS (
  SELECT k, n,
         CAST(ROUND(CAST(n * c - s AS DOUBLE) / n
              * COS(CAST(2 AS DOUBLE) * CAST(3.141592653589793 AS DOUBLE) * k * t / n), 6) AS DECIMAL(28,6)) AS a,
         CAST(ROUND(CAST(n * c - s AS DOUBLE) / n
              * SIN(CAST(2 AS DOUBLE) * CAST(3.141592653589793 AS DOUBLE) * k * t / n), 6) AS DECIMAL(28,6)) AS b
  FROM ks
),
power AS (
  SELECT k, MAX(n) AS n,
         CAST(FLOOR(ROUND(POW(CAST(SUM(a) AS DOUBLE), 2)
              + POW(CAST(SUM(b) AS DOUBLE), 2), 6) * 1000) AS BIGINT) AS pe3
  FROM terms GROUP BY 1
),
kept AS (
  SELECT n, pe3,
         CAST(SUM(pe3) OVER () AS BIGINT) AS stot,
         CAST(COUNT(*) OVER () AS BIGINT) AS m_kept
  FROM power WHERE pe3 > 0
),
contrib AS (
  SELECT n, m_kept,
         CAST(ROUND(-(CAST(pe3 AS DOUBLE) / CAST(stot AS DOUBLE))
              * LN(CAST(pe3 AS DOUBLE) / CAST(stot AS DOUBLE)), 6)
              AS DECIMAL(28,6)) AS h
  FROM kept
)
SELECT CAST(MAX(n) AS BIGINT) AS n_hours,
       CAST(MAX(m_kept) AS BIGINT) AS m_freqs,
       ROUND(CAST(SUM(h) AS DOUBLE), 6) AS entropy,
       ROUND(CAST(SUM(h) AS DOUBLE) / LN(CAST(MAX(m_kept) AS DOUBLE)), 6) AS entropy_norm
FROM contrib
"""

QUERIES["events_spectral_entropy"] = events_spectral_entropy
ORACLE["events_spectral_entropy"] = SPECTRAL_ENTROPY_SQL


def events_wavelet_haar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Haar discrete-wavelet energy decomposition of the hourly
    event-rate series, levels 1–6 (2h → 64h scales): detail
    coefficient d_{j,k} = B_{j−1}(2k) − B_{j−1}(2k+1) where B_j(m)
    sums counts over dyadic block m of width 2^j; per-level energy
    Σd² localizes WHERE the variance lives in time-scale — the
    multi-resolution complement to the periodogram (a daily cycle
    concentrates at the 8–32h levels; bursty traffic loads the
    finest level). The series truncates to the largest multiple of
    2^6 so every level sees complete pairs.

    Engine-exact: counts are integers, so block sums, details,
    energies, and the ppm shares are PURE INTEGER arithmetic —
    no float appears anywhere.

    Scale: one hash agg to hourly cells, a 6-level explode of the
    collapsed series (|hours|·6 rows), two integer aggs."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour")
    )
    hourly = e.groupBy("hour").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    series = hourly.select(
        (F.row_number().over(Window.orderBy("hour")) - 1).cast("bigint").alias("t"),
        "c",
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
    ).where(F.expr("t < (n DIV 64) * 64"))
    lv = series.select(
        "c", "t", F.explode(F.expr("sequence(1, 6)")).alias("level")
    ).select(
        "level",
        F.expr("t DIV CAST(POW(2, level - 1) AS BIGINT)").alias("hb"),
        F.expr(
            "CASE WHEN (t DIV CAST(POW(2, level - 1) AS BIGINT)) % 2 = 0"
            " THEN c ELSE -c END"
        ).alias("sc"),
    )
    details = lv.groupBy("level", F.expr("hb DIV 2").alias("pair")).agg(
        F.sum("sc").cast("bigint").alias("d")
    )
    energy = details.groupBy("level").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("energy"),
    )
    return energy.select(
        F.col("level").cast("int").alias("level"),
        "n_pairs",
        "energy",
        F.expr("CAST(energy * 1000000 DIV GREATEST(SUM(energy) OVER (), 1) AS BIGINT)").alias(
            "share_ppm"
        ),
    ).orderBy("level")


WAVELET_HAAR_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
series AS (
  SELECT * FROM (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY hour) AS BIGINT) - 1 AS t, c,
           CAST(COUNT(*) OVER () AS BIGINT) AS n
    FROM hourly
  ) WHERE t < (n // 64) * 64
),
lv AS (
  SELECT level,
         t // CAST(POW(2, level - 1) AS BIGINT) AS hb,
         CASE WHEN (t // CAST(POW(2, level - 1) AS BIGINT)) % 2 = 0
              THEN c ELSE -c END AS sc
  FROM series, LATERAL (SELECT unnest(generate_series(1, 6)) AS level) g
),
details AS (
  SELECT level, hb // 2 AS pair, CAST(SUM(sc) AS BIGINT) AS d
  FROM lv GROUP BY 1, 2
),
energy AS (
  SELECT level, CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(d * d) AS BIGINT) AS energy
  FROM details GROUP BY 1
)
SELECT CAST(level AS INTEGER) AS level, n_pairs, energy,
       CAST(energy * 1000000 // GREATEST(SUM(energy) OVER (), 1) AS BIGINT) AS share_ppm
FROM energy
ORDER BY level
"""

QUERIES["events_wavelet_haar"] = events_wavelet_haar
ORACLE["events_wavelet_haar"] = WAVELET_HAAR_SQL


def orders_kalman_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-level Kalman filter over the monthly order-count series
    (state-space twin of simple exponential smoothing with a
    PRINCIPLED, data-adaptive gain): level_t = level + K_t(y_t −
    level), K_t = P⁻/(P⁻ + R), P⁻ = P + Q with Q = 25 (state noise),
    R = 400 (observation noise), P₀ = 1000 — the steady-state gain
    the filter converges to is the optimal smoothing constant the
    Holt/EWMA family asks the user to guess. Emits the filtered
    terminal state: one-step forecast (= level), error variance, and
    converged gain.

    Engine discipline (the Holt/adstock sequential-fold pattern):
    Spark folds the recurrence in ONE Arrow batch over the
    |months|-row series with exact Decimals; the gain is quantized
    by FLOOR(x·1e6) of an IEEE division of identical doubles (the
    r5 iterative rule — ROUND ties amplify over 80 steps, floor of
    identical doubles cannot split), and level/variance updates
    quantize HALF_UP 6dp (== DuckDB decimal ROUND). The oracle runs
    the same recurrence as a recursive CTE.

    Scale: the fact table collapses to ≤|months| cells map-side;
    the sequential part touches a 3-number state, never data."""
    import pandas as pd

    o = load_table(spark, sf_dir, "orders").select(
        F.date_trunc("month", "o_orderdate").cast("date").alias("month")
    )
    monthly = o.groupBy("month").agg(F.count(F.lit(1)).cast("bigint").alias("y"))

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import math
        from decimal import ROUND_HALF_UP, Decimal

        q6 = Decimal("1e-6")
        Q, R = Decimal(25), Decimal(400)
        pdf = pdf.sort_values("month")
        ys = [Decimal(int(v)) for v in pdf["y"]]
        level, p = ys[0], Decimal(1000)
        k = Decimal(0)
        for y in ys[1:]:
            p_pred = p + Q
            k_e6 = int(math.floor(float(p_pred) / (float(p_pred) + float(R)) * 1_000_000))
            k = Decimal(k_e6).scaleb(-6)
            level = (level + k * (y - level)).quantize(q6, ROUND_HALF_UP)
            p = ((Decimal(1) - k) * p_pred).quantize(q6, ROUND_HALF_UP)
        return pd.DataFrame(
            {
                "n_months": [len(ys)],
                "level": [float(level)],
                "p_var": [float(p)],
                "gain": [float(k)],
            }
        )

    return (
        monthly.withColumn("g", F.lit(1))
        .groupBy("g")
        .applyInPandas(fold, "n_months int, level double, p_var double, gain double")
    )


KALMAN_LEVEL_SQL = """
WITH RECURSIVE
monthly AS (
  SELECT date_trunc('month', o_orderdate) AS month, CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
series AS (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY month) AS INTEGER) AS rn,
         CAST(y AS DECIMAL(28,6)) AS y
  FROM monthly
),
kal(rn, level, p, k) AS (
  SELECT 1, (SELECT y FROM series WHERE rn = 1),
         CAST(1000 AS DECIMAL(28,6)), CAST(0 AS DECIMAL(8,6))
  UNION ALL
  SELECT s.rn,
         CAST(ROUND(kk.level + g.k2 * (s.y - kk.level), 6) AS DECIMAL(28,6)),
         CAST(ROUND((1 - g.k2) * (kk.p + 25), 6) AS DECIMAL(28,6)),
         g.k2
  FROM kal kk
  JOIN series s ON s.rn = kk.rn + 1
  CROSS JOIN LATERAL (
    SELECT CAST(
        CAST(FLOOR(CAST(kk.p + 25 AS DOUBLE)
                   / (CAST(kk.p + 25 AS DOUBLE) + 400) * 1000000) AS BIGINT)
        AS DECIMAL(14,0)) / 1000000 AS k2
  ) g
)
SELECT CAST((SELECT MAX(rn) FROM kal) AS INTEGER) AS n_months,
       CAST(level AS DOUBLE) AS level,
       CAST(p AS DOUBLE) AS p_var,
       CAST(k AS DOUBLE) AS gain
FROM kal WHERE rn = (SELECT MAX(rn) FROM kal)
"""

QUERIES["orders_kalman_level"] = orders_kalman_level
ORACLE["orders_kalman_level"] = KALMAN_LEVEL_SQL


def events_cointegration_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engle–Granger cointegration test between the hourly 'click'
    and 'view' count series: stage 1 regresses view on click (exact
    integer-sums OLS), stage 2 runs a lag-1 Dickey–Fuller regression
    on the residuals (Δu_t = ρ·u_{t−1} + e); a strongly negative
    ADF t-statistic means the two streams share a common stochastic
    trend — the diagnostics a metrics platform runs before alerting
    on one series using another as its baseline (a spurious
    regression between two drifting-but-unrelated series is the
    classic false-alarm generator; Engle & Granger 1987).

    Engine-exact: stage-1 OLS is pure BIGINT sums with ONE IEEE
    division per coefficient; residuals are then deterministic
    doubles, and every stage-2 sum (Σu²_{t−1}, Σu_{t−1}Δu, Σe²)
    follows the 6dp-per-term + DECIMAL-sum discipline; LAG orders by
    the unique hour index (r9 tie rule is moot — t is unique).

    Scale: two hash aggs collapse the streams to ≤|hours| cells;
    everything after runs on the collapsed series."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    )
    x = e.where(F.col("event_type") == "click").groupBy("hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("x")
    )
    y = e.where(F.col("event_type") == "view").groupBy("hour").agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    s = x.join(y, "hour")
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    ols = s.select(
        "hour",
        "x",
        "y",
        F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        F.sum("x").over(wall).cast("bigint").alias("sx"),
        F.sum("y").over(wall).cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(wall).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(wall).cast("bigint").alias("sxx"),
    ).select(
        "hour",
        "x",
        "y",
        "n",
        F.expr("CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx)").alias("b"),
        F.expr(
            "(CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)"
            " / (n * sxx - sx * sx) * sx) / n"
        ).alias("a"),
    )
    resid = ols.select(
        "n",
        (F.row_number().over(Window.orderBy("hour"))).alias("t"),
        (F.col("y") - F.col("a") - F.col("b") * F.col("x")).alias("u"),
        F.first("b").over(wall).alias("beta"),
    )
    lagged = resid.select(
        "n",
        "beta",
        F.lag("u").over(Window.orderBy("t")).alias("ul"),
        "u",
    ).where(F.col("ul").isNotNull())
    terms = lagged.select(
        "n",
        "beta",
        F.round(F.col("ul") * (F.col("u") - F.col("ul")), 6).cast("decimal(28,6)").alias("s1"),
        F.round(F.col("ul") * F.col("ul"), 6).cast("decimal(28,6)").alias("s2"),
        "ul",
        "u",
    )
    rho = terms.select(
        "n",
        "beta",
        "ul",
        "u",
        F.expr("CAST(SUM(s1) OVER () AS DOUBLE) / CAST(SUM(s2) OVER () AS DOUBLE)").alias("rho"),
        F.expr("CAST(SUM(s2) OVER () AS DOUBLE)").alias("ss2"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("m"),
    )
    sse = rho.select(
        "n",
        "beta",
        "rho",
        "ss2",
        "m",
        F.round(
            (F.col("u") - F.col("ul") - F.col("rho") * F.col("ul"))
            * (F.col("u") - F.col("ul") - F.col("rho") * F.col("ul")),
            6,
        )
        .cast("decimal(28,6)")
        .alias("e2"),
    )
    return sse.groupBy().agg(
        F.max("n").cast("bigint").alias("n_hours"),
        F.round(F.max("beta"), 6).alias("beta"),
        F.round(F.max("rho"), 6).alias("rho"),
        F.expr(
            "ROUND(MAX(rho) / SQRT(CAST(SUM(e2) AS DOUBLE) / (MAX(m) - 1) / MAX(ss2)), 6)"
        ).alias("adf_t"),
        F.expr(
            "MAX(rho) / SQRT(CAST(SUM(e2) AS DOUBLE) / (MAX(m) - 1) / MAX(ss2))"
            " < CAST(-3.34 AS DOUBLE)"
        ).alias("cointegrated_5pct"),
    )


COINTEGRATION_SQL = """
WITH x AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS x
  FROM events WHERE event_type = 'click' GROUP BY 1
),
y AS (
  SELECT date_trunc('hour', ts) AS hour, CAST(COUNT(*) AS BIGINT) AS y
  FROM events WHERE event_type = 'view' GROUP BY 1
),
s AS (SELECT x.hour, x.x, y.y FROM x JOIN y ON y.hour = x.hour),
ols AS (
  SELECT hour, x, y,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(x) OVER () AS BIGINT) AS sx,
         CAST(SUM(y) OVER () AS BIGINT) AS sy,
         CAST(SUM(x * y) OVER () AS BIGINT) AS sxy,
         CAST(SUM(x * x) OVER () AS BIGINT) AS sxx
  FROM s
),
coef AS (
  SELECT hour, x, y, n,
         CAST(n * sxy - sx * sy AS DOUBLE) / (n * sxx - sx * sx) AS b,
         (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
          / (n * sxx - sx * sx) * sx) / n AS a
  FROM ols
),
resid AS (
  SELECT n, ROW_NUMBER() OVER (ORDER BY hour) AS t,
         y - a - b * x AS u,
         FIRST_VALUE(b) OVER () AS beta
  FROM coef
),
lagged AS (
  SELECT * FROM (
    SELECT n, beta, LAG(u) OVER (ORDER BY t) AS ul, u FROM resid
  ) WHERE ul IS NOT NULL
),
terms AS (
  SELECT n, beta, ul, u,
         CAST(ROUND(ul * (u - ul), 6) AS DECIMAL(28,6)) AS s1,
         CAST(ROUND(ul * ul, 6) AS DECIMAL(28,6)) AS s2
  FROM lagged
),
rho AS (
  SELECT n, beta, ul, u,
         CAST(SUM(s1) OVER () AS DOUBLE) / CAST(SUM(s2) OVER () AS DOUBLE) AS rho,
         CAST(SUM(s2) OVER () AS DOUBLE) AS ss2,
         CAST(COUNT(*) OVER () AS BIGINT) AS m
  FROM terms
),
sse AS (
  SELECT n, beta, rho, ss2, m,
         CAST(ROUND((u - ul - rho * ul) * (u - ul - rho * ul), 6)
              AS DECIMAL(28,6)) AS e2
  FROM rho
)
SELECT CAST(MAX(n) AS BIGINT) AS n_hours,
       ROUND(MAX(beta), 6) AS beta,
       ROUND(MAX(rho), 6) AS rho,
       ROUND(MAX(rho) / SQRT(CAST(SUM(e2) AS DOUBLE) / (MAX(m) - 1) / MAX(ss2)), 6) AS adf_t,
       MAX(rho) / SQRT(CAST(SUM(e2) AS DOUBLE) / (MAX(m) - 1) / MAX(ss2))
         < CAST(-3.34 AS DOUBLE) AS cointegrated_5pct
FROM sse
"""

QUERIES["events_cointegration_test"] = events_cointegration_test
ORACLE["events_cointegration_test"] = COINTEGRATION_SQL


# ---------------------------------------------------------------------------
# events_poisson_regression — Poisson GLM (log link) on the daily event
# count series (round 10)
# ---------------------------------------------------------------------------


def events_poisson_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson GLM with log link on the daily event-count series:
    log mu_t = b0 + b1*t over the gap-filled day index, fit by 3 IRLS
    (Fisher-scoring) steps — the canonical count-trend regression an
    observability stack runs to ask "is event volume growing, and how
    fast per day" with a variance model that is honest for counts
    (reference parity: bireme exposes per-table row/op counters via its
    state server, bireme_server/StateServer.java; this is the trend
    model you fit on that series — studied, not copied).

    Engine-exact iteration (the customers_cox_regression discipline):
    the ONLY transcendentals are ln(mean) once and exp(b0), exp(b1)
    once per IRLS step, each FLOOR-quantized (e6/e12) the instant it
    is computed; mu_t then rolls SEQUENTIALLY as the integer
    recurrence mu_t = mu_{t-1}*r_e12 DIV 1e12 (exact in both engines),
    so weights, working responses z_t_e9, and the 2x2 normal-equation
    solve are pure integer arithmetic — truncating division on both
    sides (Python emulates trunc-toward-zero; DuckDB // truncates).
    Weights are globally rescaled by k = max(e0 DIV 1e9, 1) — an
    n-INDEPENDENT downscale (WLS solutions are invariant to weight
    scale) that keeps every HUGEINT product under ~1e36 at any SF.

    Scale: the data-sized work is one groupBy(day) count agg; the
    sequential IRLS touches a |days|-row frame in ONE Arrow batch
    (span is time-bounded, not SF-scaled). The oracle runs the same
    integers through WITH RECURSIVE mu rolls, one per step."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(F.to_date("ts").alias("d"))
    daily = ev.groupBy("d").agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    bounds = daily.agg(F.min("d").alias("dmin"))
    cells = daily.crossJoin(F.broadcast(bounds)).select(
        F.datediff("d", "dmin").cast("bigint").alias("t"), "y"
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        ys = {int(r.t): int(r.y) for r in pdf.itertuples()}
        T = max(ys) + 1
        cells = [(t, ys.get(t, 0)) for t in range(T)]
        nev = sum(y for _, y in cells)

        def tdiv(a: int, b: int) -> int:
            q = abs(a) // abs(b)
            return q if (a >= 0) == (b >= 0) else -q

        def roll(b0: int, b1: int):
            e0 = int(math.floor(math.exp(b0 / 1e9) * 1e6))
            r = int(math.floor(math.exp(b1 / 1e9) * 1e12))
            kk = max(e0 // 10**9, 1)
            m = e0
            mus = []
            for t in range(T):
                if t:
                    m = max(m * r // 10**12, 1)
                mus.append(m)
            return e0, r, kk, mus

        b0 = int(math.floor(math.log(nev / T) * 1e9))
        b1 = 0
        for _ in range(3):
            _, _, kk, mus = roll(b0, b1)
            s0 = s1 = s2 = q0 = q1 = 0
            for (t, y), mt in zip(cells, mus):
                w = mt // kk
                z = (b0 + b1 * t) + (y * 10**15) // mt - 10**9
                s0 += w
                s1 += w * t
                s2 += w * t * t
                q0 += w * z
                q1 += w * z * t
            det = s0 * s2 - s1 * s1
            b0, b1 = tdiv(s2 * q0 - s1 * q1, det), tdiv(s0 * q1 - s1 * q0, det)
        _, _, kk, mus = roll(b0, b1)
        s0 = s1 = s2 = 0
        for (t, _), mt in zip(cells, mus):
            w = mt // kk
            s0 += w
            s1 += w * t
            s2 += w * t * t
        # double-cast each sum BEFORE combining — the oracle's SQRT
        # expression works on individually-cast doubles, and an exact
        # bigint det here would round differently
        s0d, s1d, s2d = float(s0), float(s1), float(s2)
        se = math.sqrt(s0d / (s0d * s2d - s1d * s1d) * 1e6 / float(kk))
        return pd.DataFrame(
            {
                "n_days": [T],
                "n_events": [nev],
                "b0_e9": [b0],
                "b1_e9": [b1],
                "rate_ratio_per_day": [round(math.exp(b1 / 1e9), 6)],
                "fitted_first_e6": [mus[0]],
                "fitted_last_e6": [mus[-1]],
                "se_beta1": [round(se, 6)],
                "wald_z": [round(b1 / 1e9 / se, 6)],
            }
        )

    schema = (
        "n_days bigint, n_events bigint, b0_e9 bigint, b1_e9 bigint,"
        " rate_ratio_per_day double, fitted_first_e6 bigint,"
        " fitted_last_e6 bigint, se_beta1 double, wald_z double"
    )
    return cells.withColumn("g", F.lit(1)).groupBy("g").applyInPandas(fold, schema)


POISSON_REG_SQL = """
WITH RECURSIVE
daily AS MATERIALIZED (
  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1
),
bounds AS MATERIALIZED (
  SELECT MIN(d) AS dmin,
         CAST(datediff('day', MIN(d), MAX(d)) AS BIGINT) AS maxt
  FROM daily
),
cells AS MATERIALIZED (
  -- static series + WHERE bound (DuckDB rejects lateral series
  -- bounds); the span is the fixture's time RANGE, not SF-scaled
  SELECT gs.t, COALESCE(dy.y, 0) AS y
  FROM (SELECT CAST(i AS BIGINT) AS t FROM generate_series(0, 3650) g(i)) gs
  CROSS JOIN bounds b
  LEFT JOIN (SELECT datediff('day', (SELECT dmin FROM bounds), d) AS t, y
             FROM daily) dy ON dy.t = gs.t
  WHERE gs.t <= b.maxt
),
tot AS MATERIALIZED (
  SELECT CAST(SUM(y) AS BIGINT) AS nev, CAST(COUNT(*) AS BIGINT) AS nd FROM cells
),
it0 AS (
  SELECT CAST(FLOOR(ln(CAST(nev AS DOUBLE) / CAST(nd AS DOUBLE)) * 1e9) AS BIGINT) AS b0,
         CAST(0 AS BIGINT) AS b1
  FROM tot
),
p1 AS MATERIALIZED (
  SELECT b0, b1,
         CAST(FLOOR(exp(CAST(b0 AS DOUBLE) / 1e9) * 1e6) AS HUGEINT) AS e0,
         CAST(FLOOR(exp(CAST(b1 AS DOUBLE) / 1e9) * 1e12) AS HUGEINT) AS r,
         GREATEST(CAST(FLOOR(exp(CAST(b0 AS DOUBLE) / 1e9) * 1e6) AS HUGEINT)
                  // 1000000000, 1) AS kk
  FROM it0
),
mu1(t, m) AS (
  SELECT CAST(0 AS BIGINT), (SELECT e0 FROM p1)
  UNION ALL
  SELECT t + 1, GREATEST(m * (SELECT r FROM p1) // 1000000000000, 1)
  FROM mu1 WHERE t + 1 <= (SELECT maxt FROM bounds)
),
s1 AS MATERIALIZED (
  SELECT b0p, b1p, kk,
         SUM(w) AS s0, SUM(w * t) AS s1, SUM(w * t * t) AS s2,
         SUM(w * z) AS q0, SUM(w * z * t) AS q1
  FROM (
    SELECT c.t, m.m // p.kk AS w,
           (p.b0 + p.b1 * c.t)
             + (CAST(c.y AS HUGEINT) * 1000000000000000) // m.m
             - 1000000000 AS z,
           p.b0 AS b0p, p.b1 AS b1p, p.kk AS kk
    FROM cells c JOIN mu1 m ON m.t = c.t CROSS JOIN p1 p
  ) GROUP BY 1, 2, 3
),
it1 AS (
  SELECT CAST((s2 * q0 - s1 * q1) // (s0 * s2 - s1 * s1) AS BIGINT) AS b0,
         CAST((s0 * q1 - s1 * q0) // (s0 * s2 - s1 * s1) AS BIGINT) AS b1
  FROM s1
),
p2 AS MATERIALIZED (
  SELECT b0, b1,
         CAST(FLOOR(exp(CAST(b0 AS DOUBLE) / 1e9) * 1e6) AS HUGEINT) AS e0,
         CAST(FLOOR(exp(CAST(b1 AS DOUBLE) / 1e9) * 1e12) AS HUGEINT) AS r,
         GREATEST(CAST(FLOOR(exp(CAST(b0 AS DOUBLE) / 1e9) * 1e6) AS HUGEINT)
                  // 1000000000, 1) AS kk
  FROM it1
),
mu2(t, m) AS (
  SELECT CAST(0 AS BIGINT), (SELECT e0 FROM p2)
  UNION ALL
  SELECT t + 1, GREATEST(m * (SELECT r FROM p2) // 1000000000000, 1)
  FROM mu2 WHERE t + 1 <= (SELECT maxt FROM bounds)
),
s2i AS MATERIALIZED (
  SELECT b0p, b1p, kk,
         SUM(w) AS s0, SUM(w * t) AS s1, SUM(w * t * t) AS s2,
         SUM(w * z) AS q0, SUM(w * z * t) AS q1
  FROM (
    SELECT c.t, m.m // p.kk AS w,
           (p.b0 + p.b1 * c.t)
             + (CAST(c.y AS HUGEINT) * 1000000000000000) // m.m
             - 1000000000 AS z,
           p.b0 AS b0p, p.b1 AS b1p, p.kk AS kk
    FROM cells c JOIN mu2 m ON m.t = c.t CROSS JOIN p2 p
  ) GROUP BY 1, 2, 3
),
it2 AS (
  SELECT CAST((s2 * q0 - s1 * q1) // (s0 * s2 - s1 * s1) AS BIGINT) AS b0,
         CAST((s0 * q1 - s1 * q0) // (s0 * s2 - s1 * s1) AS BIGINT) AS b1
  FROM s2i
),
p3 AS MATERIALIZED (
  SELECT b0, b1,
         CAST(FLOOR(exp(CAST(b0 AS DOUBLE) / 1e9) * 1e6) AS HUGEINT) AS e0,
         CAST(FLOOR(exp(CAST(b1 AS DOUBLE) / 1e9) * 1e12) AS HUGEINT) AS r,
         GREATEST(CAST(FLOOR(exp(CAST(b0 AS DOUBLE) / 1e9) * 1e6) AS HUGEINT)
                  // 1000000000, 1) AS kk
  FROM it2
),
mu3(t, m) AS (
  SELECT CAST(0 AS BIGINT), (SELECT e0 FROM p3)
  UNION ALL
  SELECT t + 1, GREATEST(m * (SELECT r FROM p3) // 1000000000000, 1)
  FROM mu3 WHERE t + 1 <= (SELECT maxt FROM bounds)
),
s3i AS MATERIALIZED (
  SELECT b0p, b1p, kk,
         SUM(w) AS s0, SUM(w * t) AS s1, SUM(w * t * t) AS s2,
         SUM(w * z) AS q0, SUM(w * z * t) AS q1
  FROM (
    SELECT c.t, m.m // p.kk AS w,
           (p.b0 + p.b1 * c.t)
             + (CAST(c.y AS HUGEINT) * 1000000000000000) // m.m
             - 1000000000 AS z,
           p.b0 AS b0p, p.b1 AS b1p, p.kk AS kk
    FROM cells c JOIN mu3 m ON m.t = c.t CROSS JOIN p3 p
  ) GROUP BY 1, 2, 3
),
it3 AS (
  SELECT CAST((s2 * q0 - s1 * q1) // (s0 * s2 - s1 * s1) AS BIGINT) AS b0,
         CAST((s0 * q1 - s1 * q0) // (s0 * s2 - s1 * s1) AS BIGINT) AS b1
  FROM s3i
),
pF AS MATERIALIZED (
  SELECT b0, b1,
         CAST(FLOOR(exp(CAST(b0 AS DOUBLE) / 1e9) * 1e6) AS HUGEINT) AS e0,
         CAST(FLOOR(exp(CAST(b1 AS DOUBLE) / 1e9) * 1e12) AS HUGEINT) AS r,
         GREATEST(CAST(FLOOR(exp(CAST(b0 AS DOUBLE) / 1e9) * 1e6) AS HUGEINT)
                  // 1000000000, 1) AS kk
  FROM it3
),
muF(t, m) AS (
  SELECT CAST(0 AS BIGINT), (SELECT e0 FROM pF)
  UNION ALL
  SELECT t + 1, GREATEST(m * (SELECT r FROM pF) // 1000000000000, 1)
  FROM muF WHERE t + 1 <= (SELECT maxt FROM bounds)
),
muFm AS MATERIALIZED (SELECT t, m FROM muF),
sF AS MATERIALIZED (
  SELECT p.b0, p.b1, p.kk,
         SUM(m.m // p.kk) AS s0,
         SUM((m.m // p.kk) * m.t) AS s1,
         SUM((m.m // p.kk) * m.t * m.t) AS s2
  FROM muFm m CROSS JOIN pF p GROUP BY 1, 2, 3
)
SELECT t.nd AS n_days,
       t.nev AS n_events,
       f.b0 AS b0_e9,
       f.b1 AS b1_e9,
       ROUND(exp(CAST(f.b1 AS DOUBLE) / 1e9), 6) AS rate_ratio_per_day,
       CAST((SELECT m FROM muFm WHERE t = 0) AS BIGINT) AS fitted_first_e6,
       CAST((SELECT m FROM muFm WHERE t = (SELECT maxt FROM bounds)) AS BIGINT)
         AS fitted_last_e6,
       ROUND(SQRT(CAST(f.s0 AS DOUBLE)
                  / (CAST(f.s0 AS DOUBLE) * CAST(f.s2 AS DOUBLE)
                     - CAST(f.s1 AS DOUBLE) * CAST(f.s1 AS DOUBLE))
                  * CAST(1000000 AS DOUBLE) / CAST(f.kk AS DOUBLE)), 6) AS se_beta1,
       ROUND((CAST(f.b1 AS DOUBLE) / 1e9)
             / SQRT(CAST(f.s0 AS DOUBLE)
                    / (CAST(f.s0 AS DOUBLE) * CAST(f.s2 AS DOUBLE)
                       - CAST(f.s1 AS DOUBLE) * CAST(f.s1 AS DOUBLE))
                    * CAST(1000000 AS DOUBLE) / CAST(f.kk AS DOUBLE)), 6) AS wald_z
FROM sF f, tot t
"""

QUERIES["events_poisson_regression"] = events_poisson_regression
ORACLE["events_poisson_regression"] = POISSON_REG_SQL


# ---------------------------------------------------------------------------
# events_harmonic_regression — daily-cycle amplitude/phase via harmonic OLS
# (round 10)
# ---------------------------------------------------------------------------


def events_harmonic_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Harmonic regression of the hourly event-count series on the
    24h fundamental (cos/sin pair): amplitude, phase and R² of the
    daily cycle — the parametric sibling of events_periodogram (which
    scans frequencies; this FITS the known one, the load-shaping
    question every capacity planner asks). The organic series is
    diurnally flat (probed: ~2% amplitude), so a corpus-scaled
    deterministic diurnal component M·(1e6+cos_e6) DIV 1e6 with
    M = GREATEST(mean DIV 3, 2) is planted IN-PLAN (r9 trending-terms
    precedent; the GREATEST floor keeps the plant RECOVERABLE at the
    smallest tier, where hourly noise would swamp a unit amplitude)
    — the property test asserts the estimator RECOVERS the planted
    amplitude and phase.

    Engine-exact: the regressors are per-term ROUND(trig·1e6)
    integers (one cos/sin per hour-of-day, 24 transcendentals
    total, memoized by h = hour mod 24 — identical values feed the
    plant and the fit); the response is the n-scaled integer
    deviation d_t = y_t·n − Σy (house changepoint trick — no float
    mean); the 2×2 normal equations and determinant solve are exact
    DECIMAL(38,0)/HUGEINT; amplitude/phase/R² close in identically-
    shaped doubles (atan2 one-shot ROUND 6). Scale: one hour agg
    (span-bounded ~720 cells), window + agg on that tiny frame."""
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hr")
    )
    hourly = ev.groupBy("hr").agg(F.count(F.lit(1)).cast("bigint").alias("y0"))
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base = (
        hourly.withColumn("h", F.hour("hr").cast("bigint"))
        .withColumn(
            "c_e6",
            F.expr(
                "CAST(ROUND(cos(CAST(h AS DOUBLE) * 2 * acos(CAST(-1 AS DOUBLE)) / 24)"
                " * 1000000) AS BIGINT)"
            ),
        )
        .withColumn(
            "s_e6",
            F.expr(
                "CAST(ROUND(sin(CAST(h AS DOUBLE) * 2 * acos(CAST(-1 AS DOUBLE)) / 24)"
                " * 1000000) AS BIGINT)"
            ),
        )
        .withColumn(
            "m",
            F.expr(
                "CAST(GREATEST(SUM(y0) OVER () DIV COUNT(*) OVER () DIV 3, 2)"
                " AS BIGINT)"
            ),
        )
        .withColumn("y", F.expr("y0 + m * (1000000 + c_e6) DIV 1000000"))
    )
    cells = base.withColumn("n", F.count(F.lit(1)).over(wall).cast("bigint")).withColumn(
        "sy", F.sum("y").over(wall).cast("bigint")
    )
    d38 = "decimal(38,0)"
    stats = cells.select(
        "n",
        "m",
        F.expr("CAST(y AS DECIMAL(38,0)) * n - sy").alias("d"),
        F.expr("CAST(c_e6 AS DECIMAL(38,0))").alias("c"),
        F.expr("CAST(s_e6 AS DECIMAL(38,0))").alias("s"),
    ).agg(
        F.max("n").alias("n"),
        F.max("m").cast("bigint").alias("planted_m"),
        F.sum(F.expr("c * c")).cast(d38).alias("scc"),
        F.sum(F.expr("s * s")).cast(d38).alias("sss"),
        F.sum(F.expr("c * s")).cast(d38).alias("scs"),
        F.sum(F.expr("c * d")).cast(d38).alias("scd"),
        F.sum(F.expr("s * d")).cast(d38).alias("ssd"),
        F.sum(F.expr("d * d")).cast(d38).alias("sdd"),
    )
    # a,b solve (response d = y·n − Σy, regressors e6-trig):
    # a = (Sss·Scd − Scs·Ssd)/det, b = (Scc·Ssd − Scs·Scd)/det
    # amplitude in count units = sqrt(a²+b²)·1e6 / n  (d carries ·n,
    # trig carries ·1e-6)
    a = F.expr(
        "(CAST(sss AS DOUBLE) * CAST(scd AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(ssd AS DOUBLE))"
        " / (CAST(scc AS DOUBLE) * CAST(sss AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scs AS DOUBLE))"
    )
    b = F.expr(
        "(CAST(scc AS DOUBLE) * CAST(ssd AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scd AS DOUBLE))"
        " / (CAST(scc AS DOUBLE) * CAST(sss AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scs AS DOUBLE))"
    )
    nn = F.expr("CAST(n AS DOUBLE)")
    amp = F.sqrt(a * a + b * b) * F.lit(1000000.0) / nn
    # R² = (a·Scd + b·Ssd) / Sdd  (explained SS over total, same units)
    r2 = (
        a * F.expr("CAST(scd AS DOUBLE)") + b * F.expr("CAST(ssd AS DOUBLE)")
    ) / F.expr("CAST(sdd AS DOUBLE)")
    phase = F.atan2(F.lit(-1.0) * b, a)
    return stats.select(
        F.col("n").cast("bigint").alias("n_hours"),
        "planted_m",
        F.floor(amp * F.lit(1000.0)).cast("bigint").alias("amplitude_x1000"),
        F.round(phase, 6).alias("phase_rad"),
        F.floor(r2 * F.lit(1000000.0)).cast("bigint").alias("r2_e6"),
    )


HARMONIC_REG_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS y0
  FROM events GROUP BY 1
),
base AS (
  SELECT hr, y0,
         CAST(hour(hr) AS BIGINT) AS h,
         CAST(ROUND(cos(CAST(hour(hr) AS DOUBLE) * 2 * acos(CAST(-1 AS DOUBLE)) / 24)
              * 1000000) AS BIGINT) AS c_e6,
         CAST(ROUND(sin(CAST(hour(hr) AS DOUBLE) * 2 * acos(CAST(-1 AS DOUBLE)) / 24)
              * 1000000) AS BIGINT) AS s_e6,
         CAST(GREATEST(SUM(y0) OVER () // COUNT(*) OVER () // 3, 2) AS BIGINT) AS m
  FROM hourly
),
cells AS (
  SELECT h, c_e6, s_e6, m,
         y0 + m * (1000000 + c_e6) // 1000000 AS y,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(y0 + m * (1000000 + c_e6) // 1000000) OVER () AS BIGINT) AS sy
  FROM base
),
stats AS (
  SELECT MAX(n) AS n, CAST(MAX(m) AS BIGINT) AS planted_m,
         CAST(SUM(CAST(c_e6 AS HUGEINT) * c_e6) AS HUGEINT) AS scc,
         CAST(SUM(CAST(s_e6 AS HUGEINT) * s_e6) AS HUGEINT) AS sss,
         CAST(SUM(CAST(c_e6 AS HUGEINT) * s_e6) AS HUGEINT) AS scs,
         CAST(SUM(CAST(c_e6 AS HUGEINT) * (CAST(y AS HUGEINT) * n - sy)) AS HUGEINT) AS scd,
         CAST(SUM(CAST(s_e6 AS HUGEINT) * (CAST(y AS HUGEINT) * n - sy)) AS HUGEINT) AS ssd,
         CAST(SUM((CAST(y AS HUGEINT) * n - sy) * (CAST(y AS HUGEINT) * n - sy)) AS HUGEINT) AS sdd
  FROM cells
)
SELECT CAST(n AS BIGINT) AS n_hours,
       planted_m,
       CAST(FLOOR(SQRT(
           POW((CAST(sss AS DOUBLE) * CAST(scd AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(ssd AS DOUBLE))
               / (CAST(scc AS DOUBLE) * CAST(sss AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scs AS DOUBLE)), 2)
           + POW((CAST(scc AS DOUBLE) * CAST(ssd AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scd AS DOUBLE))
                 / (CAST(scc AS DOUBLE) * CAST(sss AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scs AS DOUBLE)), 2))
         * CAST(1000000 AS DOUBLE) / CAST(n AS DOUBLE) * CAST(1000 AS DOUBLE)) AS BIGINT)
         AS amplitude_x1000,
       ROUND(atan2(CAST(-1 AS DOUBLE)
                   * ((CAST(scc AS DOUBLE) * CAST(ssd AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scd AS DOUBLE))
                      / (CAST(scc AS DOUBLE) * CAST(sss AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scs AS DOUBLE))),
                   (CAST(sss AS DOUBLE) * CAST(scd AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(ssd AS DOUBLE))
                   / (CAST(scc AS DOUBLE) * CAST(sss AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scs AS DOUBLE))), 6)
         AS phase_rad,
       CAST(FLOOR((
           (CAST(sss AS DOUBLE) * CAST(scd AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(ssd AS DOUBLE))
           / (CAST(scc AS DOUBLE) * CAST(sss AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scs AS DOUBLE))
           * CAST(scd AS DOUBLE)
           + (CAST(scc AS DOUBLE) * CAST(ssd AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scd AS DOUBLE))
             / (CAST(scc AS DOUBLE) * CAST(sss AS DOUBLE) - CAST(scs AS DOUBLE) * CAST(scs AS DOUBLE))
             * CAST(ssd AS DOUBLE))
         / CAST(sdd AS DOUBLE) * CAST(1000000 AS DOUBLE)) AS BIGINT) AS r2_e6
FROM stats
"""

QUERIES["events_harmonic_regression"] = events_harmonic_regression
ORACLE["events_harmonic_regression"] = HARMONIC_REG_SQL


# ---------------------------------------------------------------------------
# events_pot_gpd_tail — peaks-over-threshold GPD tail fit (round 10)
# ---------------------------------------------------------------------------


def events_pot_gpd_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peaks-over-threshold Generalized Pareto fit of the event-value
    tail — the third classical EVT estimator in the repo (Gumbel
    block-maxima fits the max law, Hill assumes a pure power tail;
    GPD-over-threshold is what an SRE capacity model actually uses
    for "what does the p99.9 look like"): threshold u = in-plan p95
    (histogram-CDF), method-of-moments σ̂ = ½·m̄·(m̄²/s²+1), ξ̂ =
    ½·(1−m̄²/s²) on the excesses, plus the implied 100× return level
    u + σ̂/ξ̂·((N/n_exc·0.01)^ξ̂ − 1) — and an honest exponentiality
    verdict (ξ̂ ≈ 0 ⇒ the simpler exponential tail suffices).

    Engine-exact: values e3-quantized once; the threshold is an
    integer from cross-multiplied ceil-rank predicates; excess
    moments are integer sums (the per-group S² DIV n quantization);
    the MoM close and the one POW are one-shot doubles, FLOOR-e6.
    Scale: one histogram-CDF (never a sort), one filtered agg."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(ROUND(value * 1000) AS BIGINT)").alias("x")
    )
    hist = e.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cdf = hist.withColumn("cum", F.sum("c").over(wc).cast("bigint")).withColumn(
        "n", F.sum("c").over(wall).cast("bigint")
    )
    thr = cdf.agg(
        F.max("n").cast("bigint").alias("n_total"),
        F.min(F.when(F.col("cum") * 100 >= F.col("n") * 95, F.col("x"))).alias("u"),
    )
    exc = (
        hist.crossJoin(F.broadcast(thr))
        .where(F.col("x") > F.col("u"))
        .select(
            "n_total",
            "u",
            "c",
            F.expr("CAST(x - u AS DECIMAL(38,0))").alias("y"),
        )
    )
    g = exc.groupBy("n_total", "u").agg(
        F.sum("c").cast("bigint").alias("n_exc"),
        F.sum(F.expr("y * c")).cast("decimal(38,0)").alias("sy"),
        F.sum(F.expr("y * y * c")).cast("decimal(38,0)").alias("syy"),
    ).select(
        "n_total",
        "u",
        "n_exc",
        "sy",
        F.expr(
            "CAST((CAST(n_exc AS DECIMAL(38,0)) * syy - sy * sy)"
            " DIV CAST(n_exc AS DECIMAL(38,0)) AS DECIMAL(38,0))"
        ).alias("nvar"),
    )
    m = F.expr("CAST(sy AS DOUBLE) / CAST(n_exc AS DOUBLE)")
    s2 = F.expr("CAST(nvar AS DOUBLE) / CAST(n_exc AS DOUBLE)")
    ratio = m * m / s2
    xi = (F.lit(1.0) - ratio) / F.lit(2.0)
    sigma = m * (ratio + F.lit(1.0)) / F.lit(2.0)
    # 100x return level: u + sigma/xi*((n_total/n_exc*0.01)^(-xi)-1)
    # (exceedance prob 1%, i.e. the p99 of the FULL distribution
    # implied by the tail model)
    lvl = F.col("u").cast("double") + sigma / xi * (
        F.pow(
            F.expr("CAST(n_total AS DOUBLE) / CAST(n_exc AS DOUBLE)")
            * F.expr("CAST(0.01 AS DOUBLE)"),
            -xi,
        )
        - F.lit(1.0)
    )
    return g.select(
        "n_total",
        F.col("u").cast("bigint").alias("threshold_x1000"),
        "n_exc",
        F.floor(m * F.lit(1000.0)).cast("bigint").alias("mean_excess_e3x1000"),
        F.floor(xi * F.lit(1000000.0)).cast("bigint").alias("xi_e6"),
        F.floor(sigma * F.lit(1000.0)).cast("bigint").alias("sigma_x1000"),
        F.floor(lvl).cast("bigint").alias("implied_p99_x1000"),
        (F.abs(xi) < F.expr("CAST(0.05 AS DOUBLE)")).alias("exponential_tail_ok"),
    )


POT_GPD_SQL = """
WITH e AS (
  SELECT CAST(ROUND(value * 1000) AS BIGINT) AS x FROM events
),
hist AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1
),
cdf AS (
  SELECT x, c,
         CAST(SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM hist
),
thr AS (
  SELECT MAX(n) AS n_total,
         MIN(CASE WHEN cum * 100 >= n * 95 THEN x END) AS u
  FROM cdf
),
g AS (
  SELECT t.n_total, t.u,
         CAST(SUM(h.c) AS BIGINT) AS n_exc,
         CAST(SUM(CAST(h.x - t.u AS HUGEINT) * h.c) AS HUGEINT) AS sy,
         CAST(SUM(CAST(h.x - t.u AS HUGEINT) * (h.x - t.u) * h.c) AS HUGEINT) AS syy
  FROM hist h CROSS JOIN thr t
  WHERE h.x > t.u
  GROUP BY 1, 2
),
q AS (
  SELECT n_total, u, n_exc, sy,
         (CAST(n_exc AS HUGEINT) * syy - sy * sy) // CAST(n_exc AS HUGEINT) AS nvar
  FROM g
),
d AS (
  SELECT n_total, u, n_exc,
         CAST(sy AS DOUBLE) / CAST(n_exc AS DOUBLE) AS m,
         (CAST(sy AS DOUBLE) / CAST(n_exc AS DOUBLE))
           * (CAST(sy AS DOUBLE) / CAST(n_exc AS DOUBLE))
           / (CAST(nvar AS DOUBLE) / CAST(n_exc AS DOUBLE)) AS ratio
  FROM q
)
SELECT CAST(n_total AS BIGINT) AS n_total,
       CAST(u AS BIGINT) AS threshold_x1000,
       n_exc,
       CAST(FLOOR(m * CAST(1000 AS DOUBLE)) AS BIGINT) AS mean_excess_e3x1000,
       CAST(FLOOR((CAST(1 AS DOUBLE) - ratio) / CAST(2 AS DOUBLE)
                  * CAST(1000000 AS DOUBLE)) AS BIGINT) AS xi_e6,
       CAST(FLOOR(m * (ratio + CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE)
                  * CAST(1000 AS DOUBLE)) AS BIGINT) AS sigma_x1000,
       CAST(FLOOR(CAST(u AS DOUBLE)
                  + (m * (ratio + CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE))
                    / ((CAST(1 AS DOUBLE) - ratio) / CAST(2 AS DOUBLE))
                    * (POW(CAST(n_total AS DOUBLE) / CAST(n_exc AS DOUBLE)
                           * CAST(0.01 AS DOUBLE),
                           -((CAST(1 AS DOUBLE) - ratio) / CAST(2 AS DOUBLE))) - CAST(1 AS DOUBLE)))
            AS BIGINT) AS implied_p99_x1000,
       ABS((CAST(1 AS DOUBLE) - ratio) / CAST(2 AS DOUBLE)) < CAST(0.05 AS DOUBLE)
         AS exponential_tail_ok
FROM d
"""

QUERIES["events_pot_gpd_tail"] = events_pot_gpd_tail
ORACLE["events_pot_gpd_tail"] = POT_GPD_SQL


# ---------------------------------------------------------------------------
# orders_ljung_box — portmanteau whiteness test on daily order counts
# (round 10)
# ---------------------------------------------------------------------------


def orders_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung–Box portmanteau test on the daily order-count series —
    the whiteness gate a forecasting pipeline runs BEFORE shipping a
    model's residuals (here applied to the raw series: is there ANY
    autocorrelation worth modelling at lags 1..10, or is order flow
    white noise?). Q = n(n+2)·Σ_{k≤10} ρ̂_k²/(n−k) ~ χ²(10).

    FULLY INTEGER: the events_autocorrelation machinery (gap-filled
    grid, n-scaled integer deviations, exact integer N_k and D)
    feeds ρ̂_k as the e9-trunc integer N_k·1e9 DIV D; per-lag terms
    t_k² DIV (n−k) and the n(n+2) product stay DECIMAL(38,0), and
    the χ²(10) 5% compare is the integer literal 18307·1e15 — no
    float ANYWHERE in the statistic.

    Scale: one day agg (span-bounded), a ×10 lag fan-out on the tiny
    series, exact integer sums."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_orderdate").alias("day"))
    daily = o.groupBy("day").agg(F.count(F.lit(1)).alias("c"))
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = span.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    series = grid.join(daily, ["day"], "left").select(
        "day", F.coalesce("c", F.lit(0)).alias("x")
    )
    tot = series.agg(F.sum("x").alias("S"), F.count(F.lit(1)).alias("n"))
    dev = series.crossJoin(F.broadcast(tot)).select(
        "day", "n", (F.col("n") * F.col("x") - F.col("S")).alias("d")
    ).localCheckpoint(eager=True)
    denom = dev.groupBy("n").agg(
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d")).alias("D")
    )
    lags = spark.range(1, 11).select(F.col("id").cast("int").alias("lag"))
    lagged = dev.crossJoin(F.broadcast(lags)).select(
        "lag", F.date_add("day", F.col("lag")).alias("day"), F.col("d").alias("d_prev")
    )
    pairs = dev.join(lagged, ["day"]).groupBy("lag").agg(
        F.sum(F.expr("CAST(d AS DECIMAL(38,0)) * d_prev")).alias("Nk")
    )
    rho = pairs.crossJoin(F.broadcast(denom)).select(
        "lag",
        "n",
        F.expr("CAST(Nk * 1000000000 DIV D AS DECIMAL(38,0))").alias("t_e9"),
    )
    q = rho.groupBy("n").agg(
        F.sum(
            F.expr("CAST(t_e9 * t_e9 DIV (n - lag) AS DECIMAL(38,0))")
        ).alias("s_e18")
    ).select(
        "n",
        F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * (n + 2) * s_e18 AS DECIMAL(38,0))"
        ).alias("q_e18x"),
    )
    return q.select(
        F.col("n").cast("bigint").alias("n_days"),
        F.lit(10).cast("bigint").alias("max_lag"),
        F.expr("CAST(q_e18x DIV 1000000000000 AS BIGINT)").alias("q_e6"),
        F.expr(
            "q_e18x > CAST(18307 AS DECIMAL(38,0)) * 1000000000000000"
        ).alias("autocorrelated_5pct"),
    )


LJUNG_BOX_SQL = """
WITH daily AS (
  SELECT o_orderdate AS day, COUNT(*) AS c FROM orders GROUP BY 1
),
span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
grid AS (
  SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day FROM span
),
series AS (
  SELECT g.day, CAST(COALESCE(d.c, 0) AS BIGINT) AS x
  FROM grid g LEFT JOIN daily d ON g.day = d.day
),
tot AS (SELECT CAST(SUM(x) AS BIGINT) AS S, CAST(COUNT(*) AS BIGINT) AS n FROM series),
dev AS (
  SELECT s.day, t.n, CAST(t.n * s.x - t.S AS HUGEINT) AS d
  FROM series s CROSS JOIN tot t
),
denom AS (SELECT n, CAST(SUM(d * d) AS HUGEINT) AS D FROM dev GROUP BY 1),
lags AS (SELECT CAST(k AS INTEGER) AS lag FROM generate_series(1, 10) g(k)),
pairs AS (
  SELECT l.lag, CAST(SUM(a.d * b.d) AS HUGEINT) AS Nk
  FROM dev a
  CROSS JOIN lags l
  JOIN dev b ON b.day = a.day + CAST(l.lag AS BIGINT) * INTERVAL 1 DAY
  GROUP BY 1
),
rho AS (
  SELECT p.lag, d.n, Nk * 1000000000 // D AS t_e9
  FROM pairs p CROSS JOIN denom d
),
q AS (
  SELECT n,
         CAST(SUM(t_e9 * t_e9 // (n - lag)) AS HUGEINT) AS s_e18
  FROM rho GROUP BY 1
)
SELECT CAST(n AS BIGINT) AS n_days,
       CAST(10 AS BIGINT) AS max_lag,
       CAST(CAST(n AS HUGEINT) * (n + 2) * s_e18 // 1000000000000 AS BIGINT) AS q_e6,
       CAST(n AS HUGEINT) * (n + 2) * s_e18
         > CAST(18307 AS HUGEINT) * 1000000000000000 AS autocorrelated_5pct
FROM q
"""

QUERIES["orders_ljung_box"] = orders_ljung_box
ORACLE["orders_ljung_box"] = LJUNG_BOX_SQL


# ---------------------------------------------------------------------------
# events_mean_residual_life — MRL threshold diagnostic (round 10)
# ---------------------------------------------------------------------------


def events_mean_residual_life(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-residual-life curve e(u) = E[X−u | X>u] at the value
    deciles — THE threshold-picking diagnostic for the
    events_pot_gpd_tail fit (an MRL that is linear in u above some
    u₀ certifies the GPD regime and its slope ξ/(1−ξ); a kinked MRL
    says the chosen POT threshold is too low). Emitted per decile
    threshold with exceedance counts, so the analyst reads the knee
    directly.

    FULLY INTEGER: thresholds are ceil-rank order statistics from
    the histogram-CDF (cross-multiplied predicates); each e(u) is
    the integer pair (Σ(x−u), count) emitted as mean ×1000 DIV —
    the only emission division. Scale: ONE histogram-CDF + a
    9-threshold broadcast join re-aggregated map-side."""
    e = load_table(spark, sf_dir, "events").select(
        F.expr("CAST(ROUND(value * 1000) AS BIGINT)").alias("x")
    )
    hist = e.groupBy("x").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wc = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    cdf = hist.withColumn("cum", F.sum("c").over(wc).cast("bigint")).withColumn(
        "n", F.sum("c").over(wall).cast("bigint")
    )
    qs = spark.range(1, 10).select((F.col("id") * 10).cast("bigint").alias("q"))
    thr = (
        cdf.crossJoin(F.broadcast(qs))
        .groupBy("q")
        .agg(
            F.min(
                F.when(F.col("cum") * 100 >= F.col("n") * F.col("q"), F.col("x"))
            ).alias("u")
        )
    )
    exc = hist.crossJoin(F.broadcast(thr)).where(F.col("x") > F.col("u"))
    g = exc.groupBy("q", "u").agg(
        F.sum("c").cast("bigint").alias("n_exc"),
        F.sum(F.expr("CAST(x - u AS DECIMAL(38,0)) * c")).alias("sexc"),
    )
    return g.select(
        F.col("q").alias("decile_pct"),
        F.col("u").cast("bigint").alias("threshold_x1000"),
        "n_exc",
        F.expr("CAST(sexc * 1000 DIV n_exc AS BIGINT)").alias("mrl_x1000000"),
    ).orderBy("decile_pct")


MRL_SQL = """
WITH e AS (
  SELECT CAST(ROUND(value * 1000) AS BIGINT) AS x FROM events
),
hist AS (
  SELECT x, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1
),
cdf AS (
  SELECT x, c,
         CAST(SUM(c) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS n
  FROM hist
),
qs AS (SELECT CAST(k * 10 AS BIGINT) AS q FROM generate_series(1, 9) g(k)),
thr AS (
  SELECT q, MIN(CASE WHEN cum * 100 >= n * q THEN x END) AS u
  FROM cdf CROSS JOIN qs GROUP BY 1
),
g AS (
  SELECT t.q, t.u,
         CAST(SUM(h.c) AS BIGINT) AS n_exc,
         CAST(SUM(CAST(h.x - t.u AS HUGEINT) * h.c) AS HUGEINT) AS sexc
  FROM hist h CROSS JOIN thr t
  WHERE h.x > t.u
  GROUP BY 1, 2
)
SELECT q AS decile_pct,
       CAST(u AS BIGINT) AS threshold_x1000,
       n_exc,
       CAST(sexc * 1000 // n_exc AS BIGINT) AS mrl_x1000000
FROM g
ORDER BY decile_pct
"""

QUERIES["events_mean_residual_life"] = events_mean_residual_life
ORACLE["events_mean_residual_life"] = MRL_SQL


# ---------------------------------------------------------------------------
# orders_durbin_watson — serial-correlation diagnostic on the daily
# revenue trend residuals (round 10)
# ---------------------------------------------------------------------------


def orders_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin–Watson statistic on the residuals of the OLS trend fit
    of daily order revenue — THE first-order serial-correlation check
    an analyst runs before trusting the trend regression's standard
    errors (DW ≈ 2 ⇒ independent residuals; ≪2 ⇒ positive
    autocorrelation ⇒ the OLS SEs are overconfident and a Newey-West
    correction is due). Also emits the lag-1 residual autocorrelation
    ρ̂₁ (DW ≈ 2(1−ρ̂₁)) and the fitted slope.

    FULLY INTEGER until the two emission divisions: daily revenue is
    exact cents; the residual is the cross-multiplied integer
    Ê_t = n·D·y_t − n·Num·t − (D·Σy − Num·Σt)  (D = nΣt²−(Σt)²,
    Num = nΣty−ΣtΣy), i.e. e_t scaled by the constant n·D — which
    cancels in the DW ratio. Ê is then ratio-preservingly downscaled
    in-plan (DIV k, k = GREATEST(1, max|Ê| DIV 1e13)) so squares stay
    inside DECIMAL(38,0)/HUGEINT at ANY scale factor (the r8
    n-independence rule), and DW/ρ̂₁ are integer-ppm DIVs.

    Scale: one shuffle to ~2400 daily groups (the date span is fixed
    by the data generator, not SF), every later frame is day-sized;
    the day frame is eagerly checkpointed once (4 downstream readers
    would each rescan orders)."""
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
        "n",
        "st",
        "sy",
        F.expr("n * stt - st * st").alias("dd"),
        F.expr("n * sty - st * sy").alias("num"),
    )
    resid = base.crossJoin(F.broadcast(stats)).select(
        "t",
        F.expr("n * dd * y - n * num * t - (dd * sy - num * st)").alias("eh"),
    )
    maxk = resid.agg(
        F.expr("CAST(GREATEST(CAST(1 AS BIGINT), MAX(ABS(eh)) DIV 10000000000000) AS BIGINT)").alias("k")
    )
    scaled = resid.crossJoin(F.broadcast(maxk)).select(
        "t", F.expr("CAST(eh DIV k AS DECIMAL(38,0))").alias("e")
    )
    w = Window.orderBy("t")
    lagd = scaled.withColumn("ep", F.lag("e").over(w))
    agg = lagd.agg(
        F.expr("SUM(e * e)").alias("den"),
        F.expr("SUM(CASE WHEN ep IS NULL THEN CAST(0 AS DECIMAL(38,0)) ELSE (e - ep) * (e - ep) END)").alias("numq"),
        F.expr("SUM(CASE WHEN ep IS NULL THEN CAST(0 AS DECIMAL(38,0)) ELSE e * ep END)").alias("crs"),
    )
    return agg.crossJoin(F.broadcast(stats)).select(
        F.expr("CAST(n AS BIGINT)").alias("n_days"),
        F.expr("ROUND(CAST(num AS DOUBLE) / CAST(dd AS DOUBLE), 6)").alias("slope_cents_per_day"),
        F.expr("CAST((numq * 1000000) DIV den AS BIGINT)").alias("dw_ppm"),
        F.expr("CAST((crs * 1000000) DIV den AS BIGINT)").alias("rho1_ppm"),
    )


ORDERS_DW_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS y
  FROM orders GROUP BY 1
),
base AS (
  SELECT CAST(date_diff('day', (SELECT MIN(d) FROM daily), d) AS BIGINT) AS t, y
  FROM daily
),
stats AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(t) AS HUGEINT) AS st,
         SUM(y) AS sy,
         CAST(SUM(t * t) AS HUGEINT) AS stt,
         SUM(CAST(t AS HUGEINT) * y) AS sty
  FROM base
),
stats2 AS (
  SELECT n, st, sy,
         n * stt - st * st AS dd,
         n * sty - st * sy AS num
  FROM stats
),
resid AS (
  SELECT t, s.n * s.dd * b.y - s.n * s.num * b.t - (s.dd * s.sy - s.num * s.st) AS eh
  FROM base b, stats2 s
),
maxk AS (
  SELECT GREATEST(CAST(1 AS HUGEINT), MAX(ABS(eh)) // 10000000000000) AS k FROM resid
),
scaled AS (
  SELECT t, CAST(eh // k AS HUGEINT) AS e FROM resid, maxk
),
lagd AS (
  SELECT e, LAG(e) OVER (ORDER BY t) AS ep FROM scaled
),
agg AS (
  SELECT SUM(e * e) AS den,
         SUM(CASE WHEN ep IS NULL THEN CAST(0 AS HUGEINT) ELSE (e - ep) * (e - ep) END) AS numq,
         SUM(CASE WHEN ep IS NULL THEN CAST(0 AS HUGEINT) ELSE e * ep END) AS crs
  FROM lagd
)
SELECT CAST(s.n AS BIGINT) AS n_days,
       ROUND(CAST(s.num AS DOUBLE) / CAST(s.dd AS DOUBLE), 6) AS slope_cents_per_day,
       CAST((a.numq * 1000000) // a.den AS BIGINT) AS dw_ppm,
       CAST((a.crs * 1000000) // a.den AS BIGINT) AS rho1_ppm
FROM agg a, stats2 s
"""

QUERIES["orders_durbin_watson"] = orders_durbin_watson
ORACLE["orders_durbin_watson"] = ORDERS_DW_SQL


# ---------------------------------------------------------------------------
# events_jarque_bera — moment-based normality test per event type
# (round 10)
# ---------------------------------------------------------------------------

# closing algebra generated ONCE and embedded verbatim in BOTH engines
# (house rule: shared expression text ⇒ identical IEEE trees). Every
# literal is CAST AS DOUBLE (the SSIM bare-decimal-literal rule).
_JB_MEAN = "(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"
_JB_R2 = "(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
_JB_R3 = "(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
_JB_R4 = "(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE))"
_JB_M2 = f"({_JB_R2} - {_JB_MEAN} * {_JB_MEAN})"
_JB_M3 = (
    f"({_JB_R3} - CAST(3 AS DOUBLE) * {_JB_MEAN} * {_JB_R2}"
    f" + CAST(2 AS DOUBLE) * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN})"
)
_JB_M4 = (
    f"({_JB_R4} - CAST(4 AS DOUBLE) * {_JB_MEAN} * {_JB_R3}"
    f" + CAST(6 AS DOUBLE) * {_JB_MEAN} * {_JB_MEAN} * {_JB_R2}"
    f" - CAST(3 AS DOUBLE) * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN} * {_JB_MEAN})"
)
_JB_SKEW = f"({_JB_M3} / ({_JB_M2} * SQRT({_JB_M2})))"
_JB_EXK = f"({_JB_M4} / ({_JB_M2} * {_JB_M2}) - CAST(3 AS DOUBLE))"
_JB_STAT = (
    f"(CAST(n AS DOUBLE) * ({_JB_SKEW} * {_JB_SKEW}"
    f" + {_JB_EXK} * {_JB_EXK} / CAST(4 AS DOUBLE)) / CAST(6 AS DOUBLE))"
)


def events_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque–Bera normality test per event type: JB =
    n/6·(S² + K²/4) from the sample skewness S and excess kurtosis K
    — the cheap moment-based screen (χ²₂ under H₀) that tells a
    monitoring pipeline which value distributions are fat-tailed /
    skewed BEFORE anyone fits a Gaussian control chart to them
    (pairs with events_anderson_darling: AD compares two samples, JB
    tests one sample against normality itself).

    Determinism: values quantize to integer millis; the four power
    sums Σx..Σx⁴ are exact DECIMAL(38,0)/HUGEINT integers (x⁴ ≤
    6e22·n — inside 38 digits past 1e14 rows), so the shuffle order
    can't move a bit. The closing skew/kurtosis algebra is ONE shared
    expression string evaluated on scale-0 integer casts (single
    correctly-rounded double conversions at any magnitude) with every
    literal CAST AS DOUBLE; sqrt is IEEE-exact, no transcendentals.

    Scale: one map-side-combinable groupBy over |event_type| groups;
    the moments close per group — nothing beyond the agg ever sees
    row counts."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(ROUND(value * 1000) AS BIGINT)").alias("x")
    )
    agg = e.withColumn("x2", F.expr("x * x")).groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("sx"),
        F.expr("CAST(SUM(CAST(x2 AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("s2"),
        F.expr("CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * x) AS DECIMAL(38,0))").alias("s3"),
        F.expr("CAST(SUM(CAST(x2 AS DECIMAL(38,0)) * x2) AS DECIMAL(38,0))").alias("s4"),
    )
    return agg.select(
        "event_type",
        "n",
        F.expr(f"ROUND({_JB_SKEW}, 6)").alias("skewness"),
        F.expr(f"ROUND({_JB_EXK}, 6)").alias("excess_kurtosis"),
        F.expr(f"ROUND({_JB_STAT}, 6)").alias("jb_stat"),
    ).orderBy("event_type")


EVENTS_JB_SQL = f"""
WITH e AS (
  SELECT event_type, CAST(ROUND(value * 1000) AS BIGINT) AS x,
         CAST(ROUND(value * 1000) AS BIGINT) * CAST(ROUND(value * 1000) AS BIGINT) AS x2
  FROM events
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS HUGEINT)) AS HUGEINT) AS sx,
         CAST(SUM(CAST(x2 AS HUGEINT)) AS HUGEINT) AS s2,
         CAST(SUM(CAST(x2 AS HUGEINT) * x) AS HUGEINT) AS s3,
         CAST(SUM(CAST(x2 AS HUGEINT) * x2) AS HUGEINT) AS s4
  FROM e GROUP BY 1
)
SELECT event_type, n,
       ROUND({_JB_SKEW}, 6) AS skewness,
       ROUND({_JB_EXK}, 6) AS excess_kurtosis,
       ROUND({_JB_STAT}, 6) AS jb_stat
FROM agg
ORDER BY event_type
"""

QUERIES["events_jarque_bera"] = events_jarque_bera
ORACLE["events_jarque_bera"] = EVENTS_JB_SQL


# ---------------------------------------------------------------------------
# events_permutation_entropy — ordinal-pattern complexity (round 10)
# ---------------------------------------------------------------------------

# order-3 ordinal pattern of (a, b, c) with the POSITIONAL tie rule
# (equal values rank by position, i.e. "x precedes y" ⇔ x <= y for x
# earlier) — ONE shared CASE string so both engines classify
# identically. Labels are the rank sequence of the three positions.
_PE_PATTERN = (
    "CASE WHEN a <= b THEN"
    " (CASE WHEN b <= c THEN '012' WHEN a <= c THEN '021' ELSE '201' END)"
    " ELSE"
    " (CASE WHEN a <= c THEN '102' WHEN b <= c THEN '120' ELSE '210' END)"
    " END"
)
# per-pattern entropy contribution −p·ln p, e6-quantized PER TERM
# (transcendental rule) so the cross-pattern sum is integer
_PE_TERM = (
    "CAST(ROUND(-(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))"
    " * LN(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))"
    " * CAST(1000000 AS DOUBLE)) AS BIGINT)"
)


def events_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy (Bandt & Pompe 2002, order 3) of each
    event type's hourly-count series — the model-free complexity
    score that separates periodic (PE→0), chaotic (mid) and white
    (PE→1 normalized) traffic; THE robust screen to run before
    trusting a seasonality fit, because it sees only ORDER relations
    and is immune to the value outliers that wreck spectral methods.

    Determinism: ordinal patterns are pure integer comparisons with
    a positional tie rule (one shared CASE string); the only floats
    are the −p·ln p terms, e6-rounded PER TERM (transcendental rule)
    and summed as integers; normalization divides once by ln 6.

    Scale: one groupBy to the hourly grid (span is fixed by the
    generator, so the grid is ~720 rows/type at ANY SF), per-type
    lead windows on that tiny grid, entropy over ≤6 pattern rows."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hr")
    )
    hourly = e.groupBy("event_type", "hr").agg(F.count(F.lit(1)).cast("bigint").alias("a"))
    w = Window.partitionBy("event_type").orderBy("hr")
    trip = (
        hourly.withColumn("b", F.lead("a", 1).over(w))
        .withColumn("c", F.lead("a", 2).over(w))
        .where(F.col("c").isNotNull())
        .select("event_type", F.expr(_PE_PATTERN).alias("pat"))
    )
    pats = trip.groupBy("event_type", "pat").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    wt = Window.partitionBy("event_type")
    terms = pats.withColumn("n", F.sum("cnt").over(wt)).select(
        "event_type", "n", F.expr(_PE_TERM).alias("term_e6")
    )
    return (
        terms.groupBy("event_type")
        .agg(
            F.max("n").alias("n_triples"),
            F.count(F.lit(1)).cast("bigint").alias("n_patterns"),
            F.expr("CAST(SUM(term_e6) AS BIGINT)").alias("pe_nats_e6"),
        )
        .select(
            "event_type",
            "n_triples",
            "n_patterns",
            "pe_nats_e6",
            F.expr(
                "ROUND(CAST(pe_nats_e6 AS DOUBLE)"
                " / (CAST(1000000 AS DOUBLE) * LN(CAST(6 AS DOUBLE))), 6)"
            ).alias("pe_normalized"),
        )
        .orderBy("event_type")
    )


EVENTS_PE_SQL = f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS a
  FROM events GROUP BY 1, 2
),
trip AS (
  SELECT event_type,
         a,
         LEAD(a, 1) OVER (PARTITION BY event_type ORDER BY hr) AS b,
         LEAD(a, 2) OVER (PARTITION BY event_type ORDER BY hr) AS c
  FROM hourly
),
pats AS (
  SELECT event_type, {_PE_PATTERN} AS pat, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM trip WHERE c IS NOT NULL GROUP BY 1, 2
),
terms AS (
  SELECT event_type, cnt,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM pats
),
agg AS (
  SELECT event_type,
         CAST(MAX(n) AS BIGINT) AS n_triples,
         CAST(COUNT(*) AS BIGINT) AS n_patterns,
         CAST(SUM({_PE_TERM}) AS BIGINT) AS pe_nats_e6
  FROM terms GROUP BY 1
)
SELECT event_type, n_triples, n_patterns, pe_nats_e6,
       ROUND(CAST(pe_nats_e6 AS DOUBLE)
             / (CAST(1000000 AS DOUBLE) * LN(CAST(6 AS DOUBLE))), 6) AS pe_normalized
FROM agg
ORDER BY event_type
"""

QUERIES["events_permutation_entropy"] = events_permutation_entropy
ORACLE["events_permutation_entropy"] = EVENTS_PE_SQL


# ---------------------------------------------------------------------------
# events_variance_ratio_test — Lo–MacKinlay random-walk diagnostic
# (round 10)
# ---------------------------------------------------------------------------


def orders_variance_ratio_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lo–MacKinlay variance-ratio test on the daily-revenue series:
    VR(q) = Var(y_t − y_{t−q}) / (q·Var(y_t − y_{t−1})). A random
    walk has VR = 1 at every horizon; VR > 1 says daily revenue
    shocks TREND (positive serial correlation compounds), VR < 1
    says they mean-revert — the horizon-resolved sibling of
    orders_durbin_watson (DW sees only lag 1; VR(2/4/8) sees how far
    the memory reaches).

    FULLY INTEGER: deltas are exact cents, ratio-preservingly
    downscaled by ONE shared in-plan k = GREATEST(1, max|d₁| DIV 1e8)
    (the r8 n-independence rule — k > 1 already at the sf1 tier, so
    the path is gate-exercised); each variance is the n-scaled
    integer m·Σd² − (Σd)²; VR is one cross-multiplied integer-ppm
    DIV. Gapped calendar days are handled as an observed-day series
    (documented: VR on trading-day sequences is the standard form).

    Scale: one shuffle to the fixed ~2400-day grid, ONE window pass
    computes all four lags, everything after is a 4-group agg."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("d"),
        F.expr("CAST(ROUND(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    daily = (
        o.groupBy("d")
        .agg(F.expr("CAST(SUM(cents) AS DECIMAL(38,0))").alias("y"))
        .localCheckpoint(eager=True)
    )
    w = Window.orderBy("d")
    lags = daily.select(
        "y",
        *[F.lag("y", q).over(w).alias(f"l{q}") for q in (1, 2, 4, 8)],
    )
    stacked = lags.select(
        F.expr(
            "stack(4, 1, y - l1, 2, y - l2, 4, y - l4, 8, y - l8) AS (q, d)"
        )
    ).where(F.col("d").isNotNull())
    kf = stacked.agg(
        F.expr(
            "CAST(GREATEST(CAST(1 AS BIGINT),"
            " MAX(CASE WHEN q = 1 THEN ABS(d) END) DIV 100000000) AS BIGINT)"
        ).alias("k")
    )
    sc = stacked.crossJoin(F.broadcast(kf)).select(
        "q", F.expr("CAST(d DIV k AS BIGINT)").alias("dq")
    )
    per = sc.groupBy("q").agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("m"),
        F.expr("CAST(SUM(CAST(dq AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("s1"),
        F.expr("CAST(SUM(CAST(dq AS DECIMAL(38,0)) * dq) AS DECIMAL(38,0))").alias("s2"),
    ).select("q", "m", F.expr("m * s2 - s1 * s1").alias("v"))
    base = per.where(F.col("q") == 1).select(
        F.col("m").alias("m1"), F.col("v").alias("v1")
    )
    return (
        per.where(F.col("q") > 1)
        .crossJoin(F.broadcast(base))
        .select(
            F.expr("CAST(q AS INT)").alias("q"),
            F.expr("CAST(m AS BIGINT)").alias("n_deltas"),
            F.expr(
                "CAST((v * m1 * m1 * 1000000) DIV GREATEST(q * v1 * m * m,"
                " CAST(1 AS DECIMAL(38,0))) AS BIGINT)"
            ).alias("vr_ppm"),
        )
        .orderBy("q")
    )


ORDERS_VR_SQL = """
WITH o AS (
  SELECT CAST(o_orderdate AS DATE) AS d, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
daily AS (
  SELECT d, CAST(SUM(cents) AS HUGEINT) AS y FROM o GROUP BY 1
),
lags AS (
  SELECT y,
         LAG(y, 1) OVER (ORDER BY d) AS l1,
         LAG(y, 2) OVER (ORDER BY d) AS l2,
         LAG(y, 4) OVER (ORDER BY d) AS l4,
         LAG(y, 8) OVER (ORDER BY d) AS l8
  FROM daily
),
stacked AS (
  SELECT 1 AS q, y - l1 AS dd FROM lags WHERE l1 IS NOT NULL
  UNION ALL SELECT 2, y - l2 FROM lags WHERE l2 IS NOT NULL
  UNION ALL SELECT 4, y - l4 FROM lags WHERE l4 IS NOT NULL
  UNION ALL SELECT 8, y - l8 FROM lags WHERE l8 IS NOT NULL
),
kf AS (
  SELECT GREATEST(CAST(1 AS HUGEINT), MAX(CASE WHEN q = 1 THEN ABS(dd) END) // 100000000) AS k
  FROM stacked
),
sc AS (
  SELECT q, CAST(dd // k AS HUGEINT) AS dq FROM stacked, kf
),
per AS (
  SELECT q,
         CAST(COUNT(*) AS HUGEINT) AS m,
         CAST(SUM(dq) AS HUGEINT) AS s1,
         CAST(SUM(dq * dq) AS HUGEINT) AS s2
  FROM sc GROUP BY 1
),
per2 AS (SELECT q, m, m * s2 - s1 * s1 AS v FROM per),
base AS (SELECT m AS m1, v AS v1 FROM per2 WHERE q = 1)
SELECT CAST(p.q AS INTEGER) AS q,
       CAST(p.m AS BIGINT) AS n_deltas,
       CAST((p.v * b.m1 * b.m1 * 1000000) // GREATEST(p.q * b.v1 * p.m * p.m, CAST(1 AS HUGEINT)) AS BIGINT) AS vr_ppm
FROM per2 p, base b
WHERE p.q > 1
ORDER BY p.q
"""

QUERIES["orders_variance_ratio_test"] = orders_variance_ratio_test
ORACLE["orders_variance_ratio_test"] = ORDERS_VR_SQL


# ---------------------------------------------------------------------------
# orders_newey_west — HAC-corrected trend inference (round 10)
# ---------------------------------------------------------------------------


def orders_newey_west(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newey–West (1987) HAC standard error and t-statistic for the
    daily-revenue OLS trend slope, Bartlett kernel at bandwidth L=5 —
    the CORRECTION orders_durbin_watson's diagnostic calls for: when
    DW ≪ 2 the naive OLS SE is overconfident; this emits the
    autocorrelation-robust one an analyst can actually put a CI on.

    Integer discipline: residuals are the DW query's exact
    cross-multiplied integers Ê = n·D·y − n·Num·t − C; the score
    u_t = (n·t − Σt)·Ê_t gets TWO in-plan ratio-preserving downscales
    (ê = Ê DIV k₁ off max|Ê|, u' = x̃·ê DIV k₂ off max|x̃·ê| — the r8
    rule applied twice because the score is a product of two wide
    integers); the Bartlett sum 6Γ₀ + 2Σ(6−l)Γ_l is exact
    DECIMAL(38,0)/HUGEINT. Closing algebra (one sqrt, two divisions):
    se = √(S₆/6)·k₁k₂/(n·D²), t = Num·n·D/(√(S₆/6)·k₁k₂) — every
    scale factor reappears explicitly, nothing hides in a float.

    Scale: same shape as orders_durbin_watson — one shuffle to the
    fixed ~2400-day grid (n_days is generator-fixed, so n·t − Σt
    stays ~5.8e6 at ANY SF), then day-sized frames only."""
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
        "n",
        "st",
        F.expr("n * stt - st * st").alias("dd"),
        F.expr("n * sty - st * sy").alias("num"),
        F.expr("(n * stt - st * st) * sy - (n * sty - st * sy) * st").alias("cc"),
    )
    resid = base.crossJoin(F.broadcast(stats)).select(
        "t",
        F.expr("n * dd * y - n * num * t - cc").alias("eh"),
        F.expr("n * t - st").alias("xs"),
    )
    k1f = resid.agg(
        F.expr(
            "CAST(GREATEST(CAST(1 AS BIGINT), MAX(ABS(eh)) DIV 10000000000000) AS BIGINT)"
        ).alias("k1")
    )
    sc1 = resid.crossJoin(F.broadcast(k1f)).select(
        "t", "xs", F.expr("CAST(eh DIV k1 AS DECIMAL(38,0))").alias("e")
    )
    scored = sc1.select("t", F.expr("xs * e").alias("u")).localCheckpoint(eager=True)
    k2f = scored.agg(
        F.expr(
            "CAST(GREATEST(CAST(1 AS BIGINT), MAX(ABS(u)) DIV 1000000000000000) AS BIGINT)"
        ).alias("k2")
    )
    w = Window.orderBy("t")
    lagged = (
        scored.crossJoin(F.broadcast(k2f))
        .select("t", F.expr("CAST(u DIV k2 AS DECIMAL(38,0))").alias("up"))
        .select(
            "up",
            *[F.lag("up", lag).over(w).alias(f"l{lag}") for lag in range(1, 6)],
        )
    )
    gam = lagged.agg(
        F.expr("SUM(up * up)").alias("g0"),
        *[
            F.expr(
                f"SUM(CASE WHEN l{lag} IS NULL THEN CAST(0 AS DECIMAL(38,0))"
                f" ELSE up * l{lag} END)"
            ).alias(f"g{lag}")
            for lag in range(1, 6)
        ],
    ).select(
        F.expr("6 * g0 + 2 * (5 * g1 + 4 * g2 + 3 * g3 + 2 * g4 + 1 * g5)").alias("s6")
    )
    close = (
        "SQRT(CAST(s6 AS DOUBLE) / CAST(6 AS DOUBLE)) * CAST(k1 AS DOUBLE)"
        " * CAST(k2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(dd AS DOUBLE)"
        " * CAST(dd AS DOUBLE))"
    )
    return (
        gam.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(k1f))
        .crossJoin(F.broadcast(k2f))
        .select(
            F.expr("CAST(n AS BIGINT)").alias("n_days"),
            F.expr("ROUND(CAST(num AS DOUBLE) / CAST(dd AS DOUBLE), 6)").alias(
                "slope_cents_per_day"
            ),
            F.expr(f"ROUND({close}, 6)").alias("se_hac"),
            F.expr(
                f"ROUND(CAST(num AS DOUBLE) / CAST(dd AS DOUBLE) / ({close}), 6)"
            ).alias("t_hac"),
        )
    )


ORDERS_NW_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS HUGEINT) AS y
  FROM orders GROUP BY 1
),
base AS (
  SELECT CAST(date_diff('day', (SELECT MIN(d) FROM daily), d) AS BIGINT) AS t, y
  FROM daily
),
stats0 AS (
  SELECT CAST(COUNT(*) AS HUGEINT) AS n, CAST(SUM(t) AS HUGEINT) AS st, SUM(y) AS sy,
         CAST(SUM(t * t) AS HUGEINT) AS stt, SUM(CAST(t AS HUGEINT) * y) AS sty
  FROM base
),
stats AS (
  SELECT n, st,
         n * stt - st * st AS dd,
         n * sty - st * sy AS num,
         (n * stt - st * st) * sy - (n * sty - st * sy) * st AS cc
  FROM stats0
),
resid AS (
  SELECT t, s.n * s.dd * b.y - s.n * s.num * b.t - s.cc AS eh, s.n * b.t - s.st AS xs
  FROM base b, stats s
),
k1f AS (
  SELECT GREATEST(CAST(1 AS HUGEINT), MAX(ABS(eh)) // 10000000000000) AS k1 FROM resid
),
scored AS (
  SELECT t, xs * CAST(eh // k1 AS HUGEINT) AS u FROM resid, k1f
),
k2f AS (
  SELECT GREATEST(CAST(1 AS HUGEINT), MAX(ABS(u)) // 1000000000000000) AS k2 FROM scored
),
lagged AS (
  SELECT CAST(u // k2 AS HUGEINT) AS up,
         LAG(CAST(u // k2 AS HUGEINT), 1) OVER (ORDER BY t) AS l1,
         LAG(CAST(u // k2 AS HUGEINT), 2) OVER (ORDER BY t) AS l2,
         LAG(CAST(u // k2 AS HUGEINT), 3) OVER (ORDER BY t) AS l3,
         LAG(CAST(u // k2 AS HUGEINT), 4) OVER (ORDER BY t) AS l4,
         LAG(CAST(u // k2 AS HUGEINT), 5) OVER (ORDER BY t) AS l5
  FROM scored, k2f
),
gam AS (
  SELECT 6 * SUM(up * up)
         + 2 * (5 * SUM(CASE WHEN l1 IS NULL THEN CAST(0 AS HUGEINT) ELSE up * l1 END)
              + 4 * SUM(CASE WHEN l2 IS NULL THEN CAST(0 AS HUGEINT) ELSE up * l2 END)
              + 3 * SUM(CASE WHEN l3 IS NULL THEN CAST(0 AS HUGEINT) ELSE up * l3 END)
              + 2 * SUM(CASE WHEN l4 IS NULL THEN CAST(0 AS HUGEINT) ELSE up * l4 END)
              + 1 * SUM(CASE WHEN l5 IS NULL THEN CAST(0 AS HUGEINT) ELSE up * l5 END)) AS s6
  FROM lagged
)
SELECT CAST(s.n AS BIGINT) AS n_days,
       ROUND(CAST(s.num AS DOUBLE) / CAST(s.dd AS DOUBLE), 6) AS slope_cents_per_day,
       ROUND(SQRT(CAST(g.s6 AS DOUBLE) / CAST(6 AS DOUBLE)) * CAST(k1.k1 AS DOUBLE)
             * CAST(k2.k2 AS DOUBLE) / (CAST(s.n AS DOUBLE) * CAST(s.dd AS DOUBLE)
             * CAST(s.dd AS DOUBLE)), 6) AS se_hac,
       ROUND(CAST(s.num AS DOUBLE) / CAST(s.dd AS DOUBLE)
             / (SQRT(CAST(g.s6 AS DOUBLE) / CAST(6 AS DOUBLE)) * CAST(k1.k1 AS DOUBLE)
                * CAST(k2.k2 AS DOUBLE) / (CAST(s.n AS DOUBLE) * CAST(s.dd AS DOUBLE)
                * CAST(s.dd AS DOUBLE))), 6) AS t_hac
FROM gam g, stats s, k1f k1, k2f k2
"""

QUERIES["orders_newey_west"] = orders_newey_west
ORACLE["orders_newey_west"] = ORDERS_NW_SQL


# ---------------------------------------------------------------------------
# orders_median_polish — Tukey two-way robust decomposition (round 10)
# ---------------------------------------------------------------------------

# low-median (lower of the two middles) keeps every intermediate an
# exact integer — the convention both engines share verbatim
_MP_SPARK_MED = "element_at(array_sort(collect_list({x})), CAST((COUNT(*) + 1) DIV 2 AS INT))"
_MP_DUCK_MED = "list_extract(list_sort(list({x})), CAST((COUNT(*) + 1) // 2 AS BIGINT))"


def orders_median_polish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey median polish (two full sweeps) of the week × day-of-week
    matrix of daily order counts: overall + day-of-week effects +
    residuals, fitted by MEDIANS — the robust answer to "what does
    each weekday contribute" that a mean-based two-way ANOVA gets
    wrong whenever a holiday spike contaminates a cell (the
    exploratory sibling of lineitem_twoway_anova). Emits the 7
    day-of-week effects with the overall level and residual-size
    diagnostics.

    Determinism: cells are integer counts; every median is the LOW
    median (lower middle — stays integer, shared convention string);
    week = epoch-day DIV 7 and dow = epoch-day % 7 (stride-proof
    bucket keys from the date, no ISO-week edge cases). Each polish
    level is eagerly checkpointed — every level is read twice (agg +
    join-back), so an uncheckpointed 2-sweep chain re-executes
    O(2^levels) (the r8 chained-CTE lesson; the oracle materializes
    every level for the same reason).

    Scale: one shuffle to the fixed ~2400-cell grid; all polish
    levels are grid-sized or |weeks|/7-row frames."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_orderdate").cast("date").alias("d"))
    mind = o.agg(F.min("d").alias("d0"))
    cells = (
        o.crossJoin(F.broadcast(mind))
        .groupBy(
            F.expr("CAST(DATEDIFF(d, d0) AS BIGINT) DIV 7").alias("w"),
            F.expr("CAST(DATEDIFF(d, d0) AS BIGINT) % 7").alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("v"))
        .localCheckpoint(eager=True)
    )
    med = _MP_SPARK_MED

    def polish_rows(c):
        rm = c.groupBy("w").agg(F.expr(med.format(x="v")).alias("m"))
        out = (
            c.join(rm, "w")
            .select("w", "dow", F.expr("v - m").alias("v"))
            .localCheckpoint(eager=True)
        )
        return out, rm

    def polish_cols(c):
        cm = c.groupBy("dow").agg(F.expr(med.format(x="v")).alias("m"))
        out = (
            c.join(cm, "dow")
            .select("w", "dow", F.expr("v - m").alias("v"))
            .localCheckpoint(eager=True)
        )
        return out, cm

    # sweep 1
    c1, rm1 = polish_rows(cells)
    c2, cm1 = polish_cols(c1)
    # sweep 2
    c3, rm2 = polish_rows(c2)
    c4, cm2 = polish_cols(c3)
    # effects: rows r = rm1 + rm2, cols c = cm1 + cm2; re-center each
    # by its own low median into the overall level (the polish's
    # common-value extraction)
    reff = (
        rm1.select("w", F.col("m").alias("m1"))
        .join(rm2.select("w", F.col("m").alias("m2")), "w")
        .select("w", F.expr("m1 + m2").alias("e"))
        .localCheckpoint(eager=True)
    )
    ceff = (
        cm1.select("dow", F.col("m").alias("m1"))
        .join(cm2.select("dow", F.col("m").alias("m2")), "dow")
        .select("dow", F.expr("m1 + m2").alias("e"))
        .localCheckpoint(eager=True)
    )
    gr = reff.agg(F.expr(med.format(x="e")).alias("gr"))
    gc = ceff.agg(F.expr(med.format(x="e")).alias("gc"))
    resid = c4.agg(
        F.expr("CAST(MAX(ABS(v)) AS BIGINT)").alias("max_abs_resid"),
        F.expr(med.format(x="ABS(v)")).alias("med_abs_resid"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_cells"),
    )
    return (
        ceff.crossJoin(F.broadcast(gr))
        .crossJoin(F.broadcast(gc))
        .crossJoin(F.broadcast(resid))
        .select(
            F.expr("CAST(dow AS INT)").alias("dow"),
            F.expr("CAST(e - gc AS BIGINT)").alias("dow_effect"),
            F.expr("CAST(gr + gc AS BIGINT)").alias("overall"),
            "n_cells",
            "max_abs_resid",
            F.expr("CAST(med_abs_resid AS BIGINT)").alias("med_abs_resid"),
        )
        .orderBy("dow")
    )


_MPD = _MP_DUCK_MED

ORDERS_MEDIAN_POLISH_SQL = f"""
WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders),
cells AS MATERIALIZED (
  SELECT CAST(date_diff('day', (SELECT MIN(d) FROM o), d) AS BIGINT) // 7 AS w,
         CAST(date_diff('day', (SELECT MIN(d) FROM o), d) AS BIGINT) % 7 AS dow,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM o GROUP BY 1, 2
),
rm1 AS MATERIALIZED (SELECT w, {_MPD.format(x='v')} AS m FROM cells GROUP BY w),
c1 AS MATERIALIZED (SELECT c.w, c.dow, c.v - r.m AS v FROM cells c JOIN rm1 r ON c.w = r.w),
cm1 AS MATERIALIZED (SELECT dow, {_MPD.format(x='v')} AS m FROM c1 GROUP BY dow),
c2 AS MATERIALIZED (SELECT c.w, c.dow, c.v - r.m AS v FROM c1 c JOIN cm1 r ON c.dow = r.dow),
rm2 AS MATERIALIZED (SELECT w, {_MPD.format(x='v')} AS m FROM c2 GROUP BY w),
c3 AS MATERIALIZED (SELECT c.w, c.dow, c.v - r.m AS v FROM c2 c JOIN rm2 r ON c.w = r.w),
cm2 AS MATERIALIZED (SELECT dow, {_MPD.format(x='v')} AS m FROM c3 GROUP BY dow),
c4 AS MATERIALIZED (SELECT c.w, c.dow, c.v - r.m AS v FROM c3 c JOIN cm2 r ON c.dow = r.dow),
reff AS MATERIALIZED (
  SELECT a.w, a.m + b.m AS e FROM rm1 a JOIN rm2 b ON a.w = b.w
),
ceff AS MATERIALIZED (
  SELECT a.dow, a.m + b.m AS e FROM cm1 a JOIN cm2 b ON a.dow = b.dow
),
gr AS (SELECT {_MPD.format(x='e')} AS gr FROM reff),
gc AS (SELECT {_MPD.format(x='e')} AS gc FROM ceff),
resid AS (
  SELECT CAST(MAX(ABS(v)) AS BIGINT) AS max_abs_resid,
         {_MPD.format(x='ABS(v)')} AS med_abs_resid,
         CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM c4
)
SELECT CAST(ce.dow AS INTEGER) AS dow,
       CAST(ce.e - gc.gc AS BIGINT) AS dow_effect,
       CAST(gr.gr + gc.gc AS BIGINT) AS overall,
       r.n_cells,
       r.max_abs_resid,
       CAST(r.med_abs_resid AS BIGINT) AS med_abs_resid
FROM ceff ce, gr, gc, resid r
ORDER BY dow
"""

QUERIES["orders_median_polish"] = orders_median_polish
ORACLE["orders_median_polish"] = ORDERS_MEDIAN_POLISH_SQL


# ---------------------------------------------------------------------------
# events_kde_modes — smoothed-histogram mode census (round 10)
# ---------------------------------------------------------------------------


def events_kde_modes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode census of each event type's value distribution: unit-bin
    histogram → 3 passes of the integer binomial [1,2,1] kernel
    (a discrete Gaussian-ish KDE that stays EXACT — counts scale by
    4³) → strict local maxima above a 0.1%-mass prominence guard.
    The direct histogram answer to the question
    events_bimodality_coefficient only screens for (BC is a moment
    heuristic with known torn-uniform false positives; this one
    NAMES the modes and their mass).

    Determinism: everything is integer (bins = FLOOR(value), dense
    grid via a broadcast sequence so missing bins are true zeros, not
    window-neighbor gaps; asymmetric tie rule c[b−1] < c[b] ≥ c[b+1];
    prominence cross-multiplied c·1000 > total·4³ per-mille); mode
    ranking by MIN-encoded (−mass, bin).

    Scale: one groupBy to ≤ ~500 bins/type (the value range is
    generator-bounded), all smoothing on the 5×~500 dense grid."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("CAST(FLOOR(value) AS BIGINT)").alias("b")
    )
    hist = e.groupBy("event_type", "b").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    rng = hist.agg(F.expr("CAST(MAX(b) AS BIGINT)").alias("mx"))
    types = hist.select("event_type").distinct()
    grid = (
        types.crossJoin(F.broadcast(rng))
        .select("event_type", F.expr("explode(sequence(CAST(0 AS BIGINT), mx))").alias("b"))
        .join(hist, ["event_type", "b"], "left")
        .select("event_type", "b", F.expr("COALESCE(c, CAST(0 AS BIGINT))").alias("c"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("event_type").orderBy("b")
    sm = grid
    for _ in range(3):
        sm = sm.select(
            "event_type",
            "b",
            (
                F.coalesce(F.lag("c").over(w), F.lit(0))
                + 2 * F.col("c")
                + F.coalesce(F.lead("c").over(w), F.lit(0))
            ).alias("c"),
        )
    tot = grid.groupBy("event_type").agg(F.expr("CAST(SUM(c) AS BIGINT)").alias("tot"))
    peaks = (
        sm.select(
            "event_type",
            "b",
            "c",
            F.coalesce(F.lag("c").over(w), F.lit(0)).alias("cl"),
            F.coalesce(F.lead("c").over(w), F.lit(0)).alias("cr"),
        )
        .join(F.broadcast(tot), "event_type")
        .where(
            F.expr("cl < c AND c >= cr AND c * 1000 > tot * 64")
        )
    )
    ranked = peaks.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_modes"),
        F.expr("MIN(STRUCT(-c AS nc, b AS b))").alias("m1"),
        F.expr("CAST(MAX(tot) AS BIGINT)").alias("tot"),
    )
    second = (
        peaks.join(
            ranked.select("event_type", F.expr("m1.b").alias("b1")), "event_type"
        )
        .where(F.col("b") != F.col("b1"))
        .groupBy("event_type")
        .agg(F.expr("MIN(STRUCT(-c AS nc, b AS b)).b").alias("mode2_bin"))
    )
    return (
        ranked.join(second, "event_type", "left")
        .select(
            "event_type",
            "n_modes",
            F.expr("m1.b").alias("mode1_bin"),
            F.expr("CAST((-m1.nc) * 1000000 DIV (tot * 64) AS BIGINT)").alias(
                "mode1_mass_ppm"
            ),
            F.expr("CAST(mode2_bin AS BIGINT)").alias("mode2_bin"),
        )
        .orderBy("event_type")
    )


EVENTS_KDE_MODES_SQL = """
WITH e AS (
  SELECT event_type, CAST(FLOOR(value) AS BIGINT) AS b FROM events
),
hist AS MATERIALIZED (
  SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2
),
rng AS (SELECT CAST(MAX(b) AS BIGINT) AS mx FROM hist),
grid AS MATERIALIZED (
  SELECT t.event_type, g.b, COALESCE(h.c, CAST(0 AS BIGINT)) AS c
  FROM (SELECT DISTINCT event_type FROM hist) t
  CROSS JOIN (SELECT UNNEST(generate_series(0, (SELECT mx FROM rng))) AS b) g
  LEFT JOIN hist h ON h.event_type = t.event_type AND h.b = g.b
),
s1 AS MATERIALIZED (
  SELECT event_type, b,
         COALESCE(LAG(c) OVER (PARTITION BY event_type ORDER BY b), 0) + 2 * c
         + COALESCE(LEAD(c) OVER (PARTITION BY event_type ORDER BY b), 0) AS c
  FROM grid
),
s2 AS MATERIALIZED (
  SELECT event_type, b,
         COALESCE(LAG(c) OVER (PARTITION BY event_type ORDER BY b), 0) + 2 * c
         + COALESCE(LEAD(c) OVER (PARTITION BY event_type ORDER BY b), 0) AS c
  FROM s1
),
s3 AS MATERIALIZED (
  SELECT event_type, b,
         COALESCE(LAG(c) OVER (PARTITION BY event_type ORDER BY b), 0) + 2 * c
         + COALESCE(LEAD(c) OVER (PARTITION BY event_type ORDER BY b), 0) AS c
  FROM s2
),
tot AS (SELECT event_type, CAST(SUM(c) AS BIGINT) AS tot FROM grid GROUP BY 1),
peaks AS MATERIALIZED (
  SELECT p.event_type, p.b, p.c, t.tot
  FROM (
    SELECT event_type, b, c,
           COALESCE(LAG(c) OVER (PARTITION BY event_type ORDER BY b), 0) AS cl,
           COALESCE(LEAD(c) OVER (PARTITION BY event_type ORDER BY b), 0) AS cr
    FROM s3
  ) p JOIN tot t ON p.event_type = t.event_type
  WHERE p.cl < p.c AND p.c >= p.cr AND p.c * 1000 > t.tot * 64
),
ranked AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_modes,
         MIN({'nc': -c, 'b': b}) AS m1, CAST(MAX(tot) AS BIGINT) AS tot
  FROM peaks GROUP BY 1
),
second AS (
  SELECT p.event_type, (MIN({'nc': -p.c, 'b': p.b})).b AS mode2_bin
  FROM peaks p JOIN (SELECT event_type, (m1).b AS b1 FROM ranked) r
    ON p.event_type = r.event_type
  WHERE p.b <> r.b1
  GROUP BY 1
)
SELECT r.event_type, r.n_modes,
       (r.m1).b AS mode1_bin,
       CAST((-(r.m1).nc) * 1000000 // (r.tot * 64) AS BIGINT) AS mode1_mass_ppm,
       CAST(s.mode2_bin AS BIGINT) AS mode2_bin
FROM ranked r LEFT JOIN second s ON r.event_type = s.event_type
ORDER BY r.event_type
"""

QUERIES["events_kde_modes"] = events_kde_modes
ORACLE["events_kde_modes"] = EVENTS_KDE_MODES_SQL


# ---------------------------------------------------------------------------
# orders_fano_factor_profile — windowed dispersion census (round 10)
# ---------------------------------------------------------------------------


def orders_fano_factor_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly Fano-factor (dispersion index Var/Mean) census of the
    daily order-count process: F ≈ 1 is Poisson, F > 1 overdispersed
    (bursty demand), F < 1 underdispersed (regularized/throttled) —
    the windowed, localized sibling of events_poisson_rate_test
    (which tests one global rate) and the count-process twin of
    customers_interpurchase_cv. Emits the F histogram in coarse
    bands plus the overdispersed-week share, so a capacity planner
    sees WHERE the Poisson assumption breaks, not just whether.

    Engine-exact: per complete week (7 observed days — partial weeks
    excluded), F_ppm = (m·Σc² − (Σc)²)·1e6 DIV ((m−1)·Σc) is one
    cross-multiplied integer form; bands are integer CASE cuts.

    Scale: one shuffle to the fixed ~2400-day grid, a ~343-week agg,
    a 4-band close."""
    o = load_table(spark, sf_dir, "orders").select(F.col("o_orderdate").cast("date").alias("d"))
    mind = o.agg(F.min("d").alias("d0"))
    daily = (
        o.crossJoin(F.broadcast(mind))
        .groupBy(
            F.expr("CAST(DATEDIFF(d, d0) AS BIGINT) DIV 7").alias("w"),
            F.expr("CAST(DATEDIFF(d, d0) AS BIGINT) % 7").alias("dow"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    weeks = (
        daily.groupBy("w")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("m"),
            F.expr("CAST(SUM(c) AS DECIMAL(38,0))").alias("s1"),
            F.expr("CAST(SUM(c * c) AS DECIMAL(38,0))").alias("s2"),
        )
        .where(F.col("m") == 7)
        .select(
            "w",
            F.expr("CAST((m * s2 - s1 * s1) * 1000000 DIV ((m - 1) * s1) AS BIGINT)").alias(
                "f_ppm"
            ),
        )
    )
    banded = weeks.select(
        F.expr(
            "CASE WHEN f_ppm < 500000 THEN 'under_0.5' WHEN f_ppm < 1500000 THEN 'poisson_band'"
            " WHEN f_ppm < 3000000 THEN 'over_1.5_3' ELSE 'over_3plus' END"
        ).alias("band"),
        "f_ppm",
    )
    tot = banded.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_weeks"),
        F.expr("CAST(SUM(CASE WHEN f_ppm > 1500000 THEN 1 ELSE 0 END) AS BIGINT)").alias(
            "n_overdispersed"
        ),
    )
    return (
        banded.groupBy("band")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_weeks_band"),
            F.expr("CAST(MIN(f_ppm) AS BIGINT)").alias("min_f_ppm"),
            F.expr("CAST(MAX(f_ppm) AS BIGINT)").alias("max_f_ppm"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "band",
            "n_weeks_band",
            "min_f_ppm",
            "max_f_ppm",
            "n_weeks",
            F.expr("n_overdispersed * 1000000 DIV n_weeks").alias("overdispersed_share_ppm"),
        )
        .orderBy("band")
    )


ORDERS_FANO_SQL = """
WITH o AS (SELECT CAST(o_orderdate AS DATE) AS d FROM orders),
daily AS (
  SELECT CAST(date_diff('day', (SELECT MIN(d) FROM o), d) AS BIGINT) // 7 AS w,
         CAST(date_diff('day', (SELECT MIN(d) FROM o), d) AS BIGINT) % 7 AS dow,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM o GROUP BY 1, 2
),
weeks AS MATERIALIZED (
  SELECT w, CAST((m * s2 - s1 * s1) * 1000000 // ((m - 1) * s1) AS BIGINT) AS f_ppm
  FROM (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS m,
           CAST(SUM(c) AS HUGEINT) AS s1, CAST(SUM(c * c) AS HUGEINT) AS s2
    FROM daily GROUP BY 1
  ) WHERE m = 7
),
banded AS MATERIALIZED (
  SELECT CASE WHEN f_ppm < 500000 THEN 'under_0.5' WHEN f_ppm < 1500000 THEN 'poisson_band'
              WHEN f_ppm < 3000000 THEN 'over_1.5_3' ELSE 'over_3plus' END AS band,
         f_ppm
  FROM weeks
),
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
         CAST(SUM(CASE WHEN f_ppm > 1500000 THEN 1 ELSE 0 END) AS BIGINT) AS n_overdispersed
  FROM banded
)
SELECT b.band,
       CAST(COUNT(*) AS BIGINT) AS n_weeks_band,
       CAST(MIN(b.f_ppm) AS BIGINT) AS min_f_ppm,
       CAST(MAX(b.f_ppm) AS BIGINT) AS max_f_ppm,
       t.n_weeks,
       CAST(t.n_overdispersed * 1000000 // t.n_weeks AS BIGINT) AS overdispersed_share_ppm
FROM banded b, tot t
GROUP BY b.band, t.n_weeks, t.n_overdispersed
ORDER BY b.band
"""

QUERIES["orders_fano_factor_profile"] = orders_fano_factor_profile
ORACLE["orders_fano_factor_profile"] = ORDERS_FANO_SQL


# ---------------------------------------------------------------------------
# orders_diebold_mariano — Diebold-Mariano equal-accuracy test between
# the seasonal-naive and naive one-step forecasters on monthly counts.


def orders_diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diebold–Mariano (1995) test of equal forecast accuracy between
    the two standard no-model baselines on the monthly order-count
    series — seasonal naive (ŷ_t = y_{t−12}) vs naive (ŷ_t = y_{t−1})
    — with the Newey–West (Bartlett, h=4) HAC long-run variance the
    loss-differential autocorrelation demands. orders_forecast_backtest
    ranks forecasters by point error; DM says whether the gap is
    STATISTICALLY real — the missing inference step.

    Determinism: counts are exact integers; residuals are
    ratio-preservingly downscaled IN-PLAN (DIV k, k = GREATEST(1,
    N DIV 2·10⁷) — above every gate tier, so recorded rounds stay
    bit-identical while squared terms stay n-independent-bounded at
    any scale, the r8 Mahalanobis rule) before squaring; the loss
    differential d_t, its n-scaled deviations e_t = n·d_t − S, and
    the Bartlett-weighted autocovariance fold Gw = 5·G₀ +
    2·Σ_{k=1..4}(5−k)·G_k are all exact DECIMAL(38,0) integers
    (both engines' DIV truncates toward zero on negatives); the DM
    statistic S·n·√5/√Gw is ONE shared IEEE expression over scale-0
    integers, 6dp-rounded.

    Scale: one scan collapses orders to the ~80-row monthly frame;
    every window (lags, leads, the HAC fold) runs on that frame."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate")
    monthly = o.groupBy(
        F.expr("year(o_orderdate) * 12 + month(o_orderdate)").alias("mkey")
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("y"))
    w = Window.orderBy("mkey")
    wall = Window.partitionBy()
    lagged = monthly.select(
        "mkey",
        "y",
        F.expr("SUM(y) OVER ()").alias("ntot"),
        F.lag("y", 12).over(w).alias("y12"),
        F.lag("y", 1).over(w).alias("y1"),
    ).where(F.col("y12").isNotNull() & F.col("y1").isNotNull())
    d = lagged.select(
        "mkey",
        F.expr(
            "(y - y12) DIV GREATEST(1, ntot DIV 20000000) AS ra"
        ),
        F.expr(
            "(y - y1) DIV GREATEST(1, ntot DIV 20000000) AS rb"
        ),
    ).select("mkey", F.expr("ra * ra - rb * rb").alias("d"),
             F.expr("ra * ra").alias("la"), F.expr("rb * rb").alias("lb"))
    e = d.select(
        "mkey",
        "d",
        "la",
        "lb",
        F.expr("CAST(COUNT(*) OVER () AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(d) OVER () AS BIGINT)").alias("s"),
    ).select(
        "mkey",
        "la",
        "lb",
        "n",
        "s",
        F.expr("CAST(n * d - s AS DECIMAL(38,0))").alias("e"),
    )
    wl = Window.orderBy("mkey")
    led = e.select(
        "la",
        "lb",
        "n",
        "s",
        "e",
        *[F.lead("e", k).over(wl).alias(f"e{k}") for k in range(1, 5)],
    )
    agg = led.groupBy().agg(
        F.expr("MAX(n)").alias("n_eff"),
        F.expr("MAX(s)").alias("s_d"),
        F.expr("CAST(SUM(la) AS BIGINT)").alias("sse_seasonal"),
        F.expr("CAST(SUM(lb) AS BIGINT)").alias("sse_naive"),
        F.expr("CAST(SUM(e * e) AS DECIMAL(38,0))").alias("g0"),
        *[
            F.expr(f"CAST(SUM(CASE WHEN e{k} IS NOT NULL THEN e * e{k} END) AS DECIMAL(38,0))").alias(f"g{k}")
            for k in range(1, 5)
        ],
    )
    return agg.select(
        F.expr("CAST(n_eff AS BIGINT)").alias("n_eff"),
        F.expr("CAST(s_d AS BIGINT)").alias("loss_diff_sum"),
        "sse_seasonal",
        "sse_naive",
        F.expr("CAST(sse_seasonal * 1000000 DIV GREATEST(sse_naive, 1) AS BIGINT)").alias("mse_ratio_ppm"),
        F.expr(
            "ROUND(CAST(s_d * n_eff AS DOUBLE) * SQRT(CAST(5 AS DOUBLE))"
            " / SQRT(CAST(GREATEST(5 * g0 + 2 * (4 * g1 + 3 * g2 + 2 * g3 + g4),"
            " CAST(1 AS DECIMAL(38,0))) AS DOUBLE)), 6)"
        ).alias("dm_stat"),
    )


ORDERS_DM_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mkey,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT mkey, y,
         SUM(y) OVER () AS ntot,
         LAG(y, 12) OVER (ORDER BY mkey) AS y12,
         LAG(y, 1) OVER (ORDER BY mkey) AS y1
  FROM monthly
),
d AS (
  SELECT mkey,
         ((y - y12) // GREATEST(1, ntot // 20000000)) * ((y - y12) // GREATEST(1, ntot // 20000000))
           - ((y - y1) // GREATEST(1, ntot // 20000000)) * ((y - y1) // GREATEST(1, ntot // 20000000)) AS d,
         ((y - y12) // GREATEST(1, ntot // 20000000)) * ((y - y12) // GREATEST(1, ntot // 20000000)) AS la,
         ((y - y1) // GREATEST(1, ntot // 20000000)) * ((y - y1) // GREATEST(1, ntot // 20000000)) AS lb
  FROM lagged WHERE y12 IS NOT NULL AND y1 IS NOT NULL
),
e AS (
  SELECT mkey, la, lb,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(SUM(d) OVER () AS BIGINT) AS s,
         CAST(COUNT(*) OVER () AS HUGEINT) * d - CAST(SUM(d) OVER () AS HUGEINT) AS e
  FROM d
),
led AS (
  SELECT la, lb, n, s, e,
         LEAD(e, 1) OVER (ORDER BY mkey) AS e1,
         LEAD(e, 2) OVER (ORDER BY mkey) AS e2,
         LEAD(e, 3) OVER (ORDER BY mkey) AS e3,
         LEAD(e, 4) OVER (ORDER BY mkey) AS e4
  FROM e
),
agg AS (
  SELECT MAX(n) AS n_eff, MAX(s) AS s_d,
         CAST(SUM(la) AS BIGINT) AS sse_seasonal,
         CAST(SUM(lb) AS BIGINT) AS sse_naive,
         CAST(SUM(e * e) AS HUGEINT) AS g0,
         CAST(SUM(CASE WHEN e1 IS NOT NULL THEN e * e1 END) AS HUGEINT) AS g1,
         CAST(SUM(CASE WHEN e2 IS NOT NULL THEN e * e2 END) AS HUGEINT) AS g2,
         CAST(SUM(CASE WHEN e3 IS NOT NULL THEN e * e3 END) AS HUGEINT) AS g3,
         CAST(SUM(CASE WHEN e4 IS NOT NULL THEN e * e4 END) AS HUGEINT) AS g4
  FROM led
)
SELECT CAST(n_eff AS BIGINT) AS n_eff,
       CAST(s_d AS BIGINT) AS loss_diff_sum,
       sse_seasonal, sse_naive,
       CAST(sse_seasonal * 1000000 // GREATEST(sse_naive, 1) AS BIGINT) AS mse_ratio_ppm,
       ROUND(CAST(s_d * n_eff AS DOUBLE) * SQRT(CAST(5 AS DOUBLE))
             / SQRT(CAST(GREATEST(5 * g0 + 2 * (4 * g1 + 3 * g2 + 2 * g3 + g4),
                                  CAST(1 AS HUGEINT)) AS DOUBLE)), 6) AS dm_stat
FROM agg
"""

QUERIES["orders_diebold_mariano"] = orders_diebold_mariano
ORACLE["orders_diebold_mariano"] = ORDERS_DM_SQL


# ---------------------------------------------------------------------------
# events_pacf_levinson — partial autocorrelation of the hourly event
# stream via an integer Durbin-Levinson recursion.

_PACF_K = 8


def _pacf_tdiv(a: int, b: int) -> int:
    return abs(a) // b * (1 if a >= 0 else -1)


def events_pacf_levinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PACF of the hourly event-count series, lags 1..8, via the
    Durbin–Levinson recursion on the ACF — the AR-order diagnostic
    events_autocorrelation can't give (ACF of an AR(p) decays forever;
    PACF CUTS OFF at p, which is what you read the order from).

    Determinism: the ACF is the house n-scaled-deviation integer form
    (u_t = n·c_t − S; R_k = G_k·1e6 DIV G₀ with every u product cast
    DECIMAL(38,0) BEFORE multiplying); the recursion runs e6-quantized
    PURE INTEGER steps — φ_kk = (R_k·1e6 − Σφ_j·R_{k−j})·1e6 DIV
    (1e12 − Σφ_j·R_j), φ_{k,j} updated with a per-product
    truncating DIV 1e6 — on the driver (model-sized: 8 integers
    cross; the CA eigensolve contract), and the DuckDB oracle replays
    the IDENTICAL integer recursion as 8 unrolled MATERIALIZED
    levels, so the gate checks the recursion itself. Truncation
    toward zero on negatives is engine-verified (DIV vs //).

    Scale: one scan collapses events to the ~720-row hourly frame;
    lags/folds are windows on that frame; gaps in the hourly grid are
    treated as adjacent rows (row-number time) on BOTH engines."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("date_trunc('hour', ts)").alias("h")
    )
    hourly = ev.groupBy("h").agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("c"))
    w = Window.orderBy("h")
    u = hourly.select(
        "h",
        F.expr("CAST(COUNT(*) OVER () AS BIGINT)").alias("n"),
        F.expr("CAST(CAST(COUNT(*) OVER () AS DECIMAL(38,0)) * c"
               " - SUM(c) OVER () AS DECIMAL(38,0))").alias("u"),
    )
    led = u.select(
        "n",
        "u",
        *[F.lead("u", k).over(w).alias(f"u{k}") for k in range(1, _PACF_K + 1)],
    )
    g = led.groupBy().agg(
        F.expr("MAX(n)").alias("n_hours"),
        F.expr("CAST(SUM(u * u) AS DECIMAL(38,0))").alias("g0"),
        *[
            F.expr(
                f"CAST(SUM(CASE WHEN u{k} IS NOT NULL THEN u * u{k} END) AS DECIMAL(38,0))"
            ).alias(f"g{k}")
            for k in range(1, _PACF_K + 1)
        ],
    )
    row = g.collect()[0]
    n_hours = int(row["n_hours"])
    g0 = int(row["g0"])
    R = {k: _pacf_tdiv(int(row[f"g{k}"]) * 10**6, g0) for k in range(1, _PACF_K + 1)}
    phi = {1: R[1]}
    pacf = {1: R[1]}
    for k in range(2, _PACF_K + 1):
        num = 10**6 * R[k] - sum(phi[j] * R[k - j] for j in range(1, k))
        den = max(10**12 - sum(phi[j] * R[j] for j in range(1, k)), 1)
        pkk = _pacf_tdiv(num * 10**6, den)
        phi = {j: phi[j] - _pacf_tdiv(pkk * phi[k - j], 10**6) for j in range(1, k)}
        phi[k] = pkk
        pacf[k] = pkk
    rows = [(k, n_hours, R[k], pacf[k]) for k in range(1, _PACF_K + 1)]
    return spark.createDataFrame(
        rows, "lag INT, n_hours BIGINT, acf_ppm BIGINT, pacf_ppm BIGINT"
    )


def _pacf_oracle_sql(K: int = _PACF_K) -> str:
    leads = ",\n         ".join(
        f"LEAD(u, {k}) OVER (ORDER BY h) AS u{k}" for k in range(1, K + 1)
    )
    gs = ",\n         ".join(
        f"CAST(SUM(CASE WHEN u{k} IS NOT NULL THEN u * u{k} END) AS HUGEINT) AS g{k}"
        for k in range(1, K + 1)
    )
    rsel = "\n  UNION ALL ".join(
        f"SELECT {k} AS k, g{k} * 1000000 // g0 AS r_ppm FROM g" for k in range(1, K + 1)
    )
    parts = [
        "lvl1 AS MATERIALIZED (SELECT 1 AS j, (SELECT r_ppm FROM r WHERE k = 1) AS phi)"
    ]
    for k in range(2, K + 1):
        prev = f"lvl{k - 1}"
        num = (
            f"(SELECT 1000000 * (SELECT r_ppm FROM r WHERE k = {k})"
            f" - COALESCE(SUM(p.phi * (SELECT r_ppm FROM r WHERE r.k = {k} - p.j)), 0)"
            f" FROM {prev} p)"
        )
        den = (
            f"(SELECT GREATEST(1000000000000"
            f" - COALESCE(SUM(p.phi * (SELECT r_ppm FROM r WHERE r.k = p.j)), 0), 1)"
            f" FROM {prev} p)"
        )
        parts.append(
            f"pk{k} AS MATERIALIZED (SELECT ({num}) * 1000000 // ({den}) AS pkk)"
        )
        parts.append(
            f"lvl{k} AS MATERIALIZED ("
            f"SELECT p.j, p.phi - ((SELECT pkk FROM pk{k}) * q.phi) // 1000000 AS phi"
            f" FROM {prev} p JOIN {prev} q ON q.j = {k} - p.j"
            f" UNION ALL SELECT {k} AS j, (SELECT pkk FROM pk{k}) AS phi)"
        )
    pac = "\n  UNION ALL ".join(
        ["SELECT 1 AS lag, (SELECT phi FROM lvl1) AS pacf_ppm"]
        + [f"SELECT {k} AS lag, (SELECT pkk FROM pk{k}) AS pacf_ppm" for k in range(2, K + 1)]
    )
    levels = ",\n".join(parts)
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
u AS (
  SELECT h,
         CAST(COUNT(*) OVER () AS BIGINT) AS n,
         CAST(COUNT(*) OVER () AS HUGEINT) * c - CAST(SUM(c) OVER () AS HUGEINT) AS u
  FROM hourly
),
led AS (
  SELECT h, n, u,
         {leads}
  FROM u
),
g AS MATERIALIZED (
  SELECT MAX(n) AS n_hours,
         CAST(SUM(u * u) AS HUGEINT) AS g0,
         {gs}
  FROM led
),
r AS MATERIALIZED (
  {rsel}
),
{levels},
pac AS (
  {pac}
)
SELECT r.k AS lag,
       (SELECT CAST(n_hours AS BIGINT) FROM g) AS n_hours,
       CAST(r.r_ppm AS BIGINT) AS acf_ppm,
       CAST(p.pacf_ppm AS BIGINT) AS pacf_ppm
FROM r JOIN pac p ON p.lag = r.k
ORDER BY lag
"""


QUERIES["events_pacf_levinson"] = events_pacf_levinson
ORACLE["events_pacf_levinson"] = _pacf_oracle_sql()


# ---------------------------------------------------------------------------
# orders_crps_seasonal_eval — CRPS of the empirical seasonal-climatology
# forecast, per calendar month.


def orders_crps_seasonal_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRPS (continuous ranked probability score) of the empirical
    seasonal-climatology forecast of monthly order counts: for each
    month t, the forecast DISTRIBUTION is the same-calendar-month
    counts of all strictly earlier years, and CRPS_t = E|X−y| −
    ½E|X−X'| (the energy form) scores the whole distribution against
    the realized count — the proper-scoring upgrade over
    orders_pinball_eval's fixed-quantile loss (CRPS integrates the
    pinball loss over ALL quantiles).

    Determinism: counts are exact integers; per evaluated month the
    exact rational (2k·Σ|x−y| − Σ_{i,j}|x_i−x_j|) / 2k² is quantized
    with ONE truncating DIV to e3 units (k ≤ 6 so the numerator is
    count-scaled — DECIMAL(38,0)/HUGEINT keeps it exact at any SF),
    then averaged per calendar month with a second integer DIV. No
    doubles anywhere.

    Scale: one scan collapses orders to the ~80-row monthly frame;
    the forecast-set and pair self-joins run on that frame (k ≤ 6 —
    bounded fan-out), so the whole evaluation is ~80×6×6 rows."""
    o = load_table(spark, sf_dir, "orders").select("o_orderdate")
    monthly = o.groupBy(
        F.expr("year(o_orderdate)").alias("yr"),
        F.expr("month(o_orderdate)").alias("mon"),
    ).agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("y"))
    cur = monthly.select(
        F.col("yr").alias("t_yr"), F.col("mon").alias("t_mon"), F.col("y").alias("t_y")
    )
    hist = monthly.select(
        F.col("yr").alias("h_yr"), F.col("mon").alias("h_mon"), F.col("y").alias("h_y")
    )
    fset = cur.join(
        hist,
        (F.col("t_mon") == F.col("h_mon")) & (F.col("h_yr") < F.col("t_yr")),
    )
    term1 = fset.groupBy("t_yr", "t_mon", "t_y").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("k"),
        F.expr("CAST(SUM(ABS(h_y - t_y)) AS DECIMAL(38,0))").alias("sad"),
    )
    h2 = monthly.select(
        F.col("yr").alias("g_yr"), F.col("mon").alias("g_mon"), F.col("y").alias("g_y")
    )
    pairs = (
        cur.join(
            hist,
            (F.col("t_mon") == F.col("h_mon")) & (F.col("h_yr") < F.col("t_yr")),
        )
        .join(
            h2,
            (F.col("t_mon") == F.col("g_mon")) & (F.col("g_yr") < F.col("t_yr")),
        )
        .groupBy("t_yr", "t_mon")
        .agg(F.expr("CAST(SUM(ABS(h_y - g_y)) AS DECIMAL(38,0))").alias("spp"))
    )
    per_t = term1.join(pairs, ["t_yr", "t_mon"]).select(
        "t_yr",
        "t_mon",
        F.expr(
            "CAST((2 * k * sad - spp) * 1000 DIV (2 * k * k) AS BIGINT)"
        ).alias("crps_x1000"),
    )
    return (
        per_t.groupBy(F.col("t_mon").alias("calendar_month"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_evals"),
            F.expr("CAST(SUM(crps_x1000) DIV COUNT(*) AS BIGINT)").alias("mean_crps_x1000"),
        )
        .orderBy("calendar_month")
    )


ORDERS_CRPS_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
         CAST(month(o_orderdate) AS INTEGER) AS mon,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM orders GROUP BY 1, 2
),
term1 AS (
  SELECT t.yr AS t_yr, t.mon AS t_mon,
         CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(ABS(h.y - t.y)) AS HUGEINT) AS sad
  FROM monthly t JOIN monthly h ON h.mon = t.mon AND h.yr < t.yr
  GROUP BY 1, 2
),
pairs AS (
  SELECT t.yr AS t_yr, t.mon AS t_mon,
         CAST(SUM(ABS(h.y - g.y)) AS HUGEINT) AS spp
  FROM monthly t
  JOIN monthly h ON h.mon = t.mon AND h.yr < t.yr
  JOIN monthly g ON g.mon = t.mon AND g.yr < t.yr
  GROUP BY 1, 2
),
per_t AS (
  SELECT t1.t_yr, t1.t_mon,
         CAST((2 * t1.k * t1.sad - p.spp) * 1000 // (2 * t1.k * t1.k) AS BIGINT) AS crps_x1000
  FROM term1 t1 JOIN pairs p ON p.t_yr = t1.t_yr AND p.t_mon = t1.t_mon
)
SELECT t_mon AS calendar_month,
       CAST(COUNT(*) AS BIGINT) AS n_evals,
       CAST(SUM(crps_x1000) // COUNT(*) AS BIGINT) AS mean_crps_x1000
FROM per_t
GROUP BY 1 ORDER BY 1
"""

QUERIES["orders_crps_seasonal_eval"] = orders_crps_seasonal_eval
ORACLE["orders_crps_seasonal_eval"] = ORDERS_CRPS_SQL


# ---------------------------------------------------------------------------
# events_greenwood_uniformity — Greenwood spacing statistic per event
# type: are arrivals uniform, or clustered?


def events_greenwood_uniformity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwood (1946) spacing statistic per event type: G =
    Σ τ_i² / (Σ τ_i)² over the inter-arrival gaps — the uniformity
    test built from SPACINGS (KS tests the CDF; Greenwood is the
    classic power against CLUSTERING: bursty arrivals inflate the
    squared-gap sum). Under uniformity E[G] ≈ 2/(n+1); the emitted
    ratio G/E[G] reads >1e6 ppm ⇒ clustered, <1e6 ⇒ regular.

    Determinism: gaps are exact integer MICROSECONDS (unix_micros /
    epoch_us; the µs house contract) ordered by the timestamp itself
    (LAG reads only the ordering key — tie-safe); Στ² terms CAST
    DECIMAL(38,0) BEFORE squaring (span² ~ 7e30 overflows BIGINT);
    both closes are truncating integer DIVs. No doubles anywhere.

    Scale: one scan, one per-type window for the gaps, one agg to
    |types| rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.expr("unix_micros(ts)").alias("us")
    )
    w = Window.partitionBy("event_type").orderBy("us")
    gaps = ev.select(
        "event_type",
        F.expr("us - LAG(us) OVER (PARTITION BY event_type ORDER BY us)").alias("tau"),
    ).where(F.col("tau").isNotNull())
    agg = gaps.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_gaps"),
        F.expr("CAST(SUM(CAST(tau AS DECIMAL(38,0))) AS DECIMAL(38,0))").alias("st"),
        F.expr("CAST(SUM(CAST(tau AS DECIMAL(38,0)) * tau) AS DECIMAL(38,0))").alias("st2"),
    )
    return agg.select(
        "event_type",
        "n_gaps",
        F.expr("CAST(st2 * 1000000000 DIV (st * st) AS BIGINT)").alias("greenwood_e9"),
        F.expr("CAST(2000000000 DIV (n_gaps + 1) AS BIGINT)").alias("uniform_null_e9"),
        F.expr(
            "CAST(st2 * 1000000000 DIV (st * st) * 1000000"
            " DIV (2000000000 DIV (n_gaps + 1)) AS BIGINT)"
        ).alias("clustering_ratio_ppm"),
    ).orderBy("event_type")


EVENTS_GREENWOOD_SQL = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts)) OVER (PARTITION BY event_type ORDER BY epoch_us(ts)) AS tau
  FROM events
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(CAST(tau AS HUGEINT)) AS HUGEINT) AS st,
         CAST(SUM(CAST(tau AS HUGEINT) * tau) AS HUGEINT) AS st2
  FROM gaps WHERE tau IS NOT NULL
  GROUP BY 1
)
SELECT event_type, n_gaps,
       CAST(st2 * 1000000000 // (st * st) AS BIGINT) AS greenwood_e9,
       CAST(2000000000 // (n_gaps + 1) AS BIGINT) AS uniform_null_e9,
       CAST(st2 * 1000000000 // (st * st) * 1000000
            // (2000000000 // (n_gaps + 1)) AS BIGINT) AS clustering_ratio_ppm
FROM agg
ORDER BY event_type
"""

QUERIES["events_greenwood_uniformity"] = events_greenwood_uniformity
ORACLE["events_greenwood_uniformity"] = EVENTS_GREENWOOD_SQL


# ---------------------------------------------------------------------------
# orders_trading_day_adjustment — working-day-adjusted monthly revenue
# growth (the official-statistics calendar adjustment).


def orders_trading_day_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trading-day (working-day) adjustment of monthly revenue growth:
    months differ by up to 3 weekdays, so raw month-over-month growth
    confounds calendar composition with demand — the standard
    official-statistics fix divides by the month's weekday count
    before differencing. Emits raw and adjusted MoM growth side by
    side; the gap between them IS the calendar effect.

    Determinism: revenue is exact integer cents; the weekday count
    comes from an in-plan generated calendar (epoch-day % 7 with
    1970-01-01 = Thursday ⇒ weekday residues {0,1,4,5,6} — never
    dayofweek, whose origin differs per engine); rev-per-day and both
    growth closes are truncating integer DIVs on exact integers.

    Scale: one orders scan to ~80 monthly cells; the calendar
    (≤2,500 generated rows) aggregates to the same months and joins
    on the month key. All windows run on the 80-row frame."""
    o = load_table(spark, sf_dir, "orders").select(
        F.expr("year(o_orderdate) * 12 + month(o_orderdate)").alias("mkey"),
        F.expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS DECIMAL(38,0))").alias("cents"),
    )
    monthly = o.groupBy("mkey").agg(
        F.expr("CAST(SUM(cents) AS DECIMAL(38,0))").alias("rev")
    )
    cal = (
        spark.sql(
            "SELECT explode(sequence(DATE'1995-01-01', DATE'2001-08-31',"
            " INTERVAL 1 DAY)) AS d"
        )
        .select(
            F.expr("year(d) * 12 + month(d)").alias("mkey"),
            F.expr("CAST(datediff(d, DATE'1970-01-01') % 7 AS INT)").alias("r"),
        )
        .groupBy("mkey")
        .agg(
            F.expr(
                "CAST(SUM(CASE WHEN r IN (0, 1, 4, 5, 6) THEN 1 ELSE 0 END) AS BIGINT)"
            ).alias("wdays")
        )
    )
    m = monthly.join(F.broadcast(cal), "mkey").select(
        "mkey",
        F.expr("CAST(rev AS BIGINT)").alias("rev_cents"),
        "wdays",
        F.expr("CAST(rev DIV wdays AS BIGINT)").alias("rev_per_wday_cents"),
    )
    w = Window.orderBy("mkey")
    g = m.select(
        "mkey",
        "rev_cents",
        "wdays",
        "rev_per_wday_cents",
        F.lag("rev_cents").over(w).alias("prev_rev"),
        F.lag("rev_per_wday_cents").over(w).alias("prev_rpd"),
    ).where(F.col("prev_rev").isNotNull())
    return g.select(
        "mkey",
        "rev_cents",
        "wdays",
        "rev_per_wday_cents",
        F.expr("CAST(rev_cents * 1000000 DIV prev_rev - 1000000 AS BIGINT)").alias("raw_growth_ppm"),
        F.expr(
            "CAST(rev_per_wday_cents * 1000000 DIV prev_rpd - 1000000 AS BIGINT)"
        ).alias("adjusted_growth_ppm"),
    ).orderBy("mkey")


ORDERS_TDA_SQL = """
WITH monthly AS (
  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS mkey,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS HUGEINT)) AS HUGEINT) AS rev
  FROM orders GROUP BY 1
),
cal AS (
  SELECT CAST(year(d.d) * 12 + month(d.d) AS BIGINT) AS mkey,
         CAST(SUM(CASE WHEN date_diff('day', DATE '1970-01-01', d.d) % 7 IN (0, 1, 4, 5, 6)
                       THEN 1 ELSE 0 END) AS BIGINT) AS wdays
  FROM (SELECT UNNEST(generate_series(DATE '1995-01-01', DATE '2001-08-31', INTERVAL 1 DAY)) AS d) d
  GROUP BY 1
),
m AS (
  SELECT mo.mkey, CAST(mo.rev AS BIGINT) AS rev_cents, c.wdays,
         CAST(mo.rev // c.wdays AS BIGINT) AS rev_per_wday_cents
  FROM monthly mo JOIN cal c ON c.mkey = mo.mkey
),
g AS (
  SELECT mkey, rev_cents, wdays, rev_per_wday_cents,
         LAG(rev_cents) OVER (ORDER BY mkey) AS prev_rev,
         LAG(rev_per_wday_cents) OVER (ORDER BY mkey) AS prev_rpd
  FROM m
)
SELECT mkey, rev_cents, wdays, rev_per_wday_cents,
       CAST(rev_cents * 1000000 // prev_rev - 1000000 AS BIGINT) AS raw_growth_ppm,
       CAST(rev_per_wday_cents * 1000000 // prev_rpd - 1000000 AS BIGINT) AS adjusted_growth_ppm
FROM g WHERE prev_rev IS NOT NULL
ORDER BY mkey
"""

QUERIES["orders_trading_day_adjustment"] = orders_trading_day_adjustment
ORACLE["orders_trading_day_adjustment"] = ORDERS_TDA_SQL


# ---------------------------------------------------------------------------
# events_load_duration_curve — utility-style exceedance curve + load
# factor of the hourly event load.


def events_load_duration_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load-duration curve of the hourly event stream (the
    power-systems capacity view): the load exceeded 1%, 5%, 10%,
    25%, 50% of hours, plus peak and the LOAD FACTOR mean/peak —
    the sizing numbers a capacity planner reads (provision for the
    p1 exceedance, judge utilization by the load factor;
    events_peak_concurrency gives the instant peak, this gives the
    whole tail you'd shave).

    Determinism: the house histogram-CDF pattern — hourly counts
    collapse to a (load, n_hours) histogram, the exceedance boundary
    is the SMALLEST load whose ≥-load cumulative hour count is ≤ the
    exceedance budget FLOOR(q·H DIV 100)… computed as MIN(load WHERE
    cum_ge <= budget) with the all-integer descending cumulative
    (the r8 VaR boundary rule: with a DESCENDING cumulative every
    cell past the boundary satisfies the predicate — take the
    MIN-load cell that still fits the budget, never a MAX). Load
    factor closes with one truncating DIV to ppm.

    Scale: one scan → ~720 hourly cells → ≤720-row histogram; the
    CDF window and the 5 exceedance probes run on that histogram."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("date_trunc('hour', ts)").alias("h")
    )
    hourly = ev.groupBy("h").agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("c"))
    hist = hourly.groupBy(F.col("c").alias("load")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("nh")
    )
    w = Window.orderBy(F.col("load").desc())
    cdf = hist.select(
        "load",
        F.expr("CAST(SUM(nh) OVER () AS BIGINT)").alias("hours"),
        F.sum("nh").over(w).alias("cum_ge"),
        F.expr("CAST(SUM(load * nh) OVER () AS BIGINT)").alias("total_load"),
        F.expr("CAST(MAX(load) OVER () AS BIGINT)").alias("peak"),
    )
    qs = spark.range(0, 5).select(
        F.expr("element_at(array(1, 5, 10, 25, 50), CAST(id + 1 AS INT))").alias("exceed_pct")
    )
    probes = (
        cdf.crossJoin(F.broadcast(qs))
        .where(F.expr("cum_ge <= GREATEST(exceed_pct * hours DIV 100, 1)"))
        .groupBy("exceed_pct")
        .agg(
            F.expr("CAST(MIN(load) AS BIGINT)").alias("load_exceeded"),
            F.expr("MAX(hours)").alias("hours"),
            F.expr("MAX(peak)").alias("peak"),
            F.expr("MAX(total_load)").alias("total_load"),
        )
    )
    return probes.select(
        F.expr("CAST(exceed_pct AS INT)").alias("exceed_pct"),
        "load_exceeded",
        "peak",
        F.expr("CAST(hours AS BIGINT)").alias("n_hours"),
        F.expr("CAST(total_load * 1000000 DIV (hours * peak) AS BIGINT)").alias("load_factor_ppm"),
    ).orderBy("exceed_pct")


EVENTS_LDC_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS c
  FROM events GROUP BY 1
),
hist AS (
  SELECT c AS load, CAST(COUNT(*) AS BIGINT) AS nh FROM hourly GROUP BY 1
),
cdf AS (
  SELECT load,
         CAST(SUM(nh) OVER () AS BIGINT) AS hours,
         CAST(SUM(nh) OVER (ORDER BY load DESC) AS BIGINT) AS cum_ge,
         CAST(SUM(load * nh) OVER () AS BIGINT) AS total_load,
         CAST(MAX(load) OVER () AS BIGINT) AS peak
  FROM hist
),
qs AS (SELECT UNNEST([1, 5, 10, 25, 50]) AS exceed_pct)
SELECT CAST(q.exceed_pct AS INTEGER) AS exceed_pct,
       CAST(MIN(c.load) AS BIGINT) AS load_exceeded,
       CAST(MAX(c.peak) AS BIGINT) AS peak,
       CAST(MAX(c.hours) AS BIGINT) AS n_hours,
       CAST(MAX(c.total_load) * 1000000 // (MAX(c.hours) * MAX(c.peak)) AS BIGINT) AS load_factor_ppm
FROM cdf c JOIN qs q ON c.cum_ge <= GREATEST(q.exceed_pct * c.hours // 100, 1)
GROUP BY 1 ORDER BY 1
"""

QUERIES["events_load_duration_curve"] = events_load_duration_curve
ORACLE["events_load_duration_curve"] = EVENTS_LDC_SQL
