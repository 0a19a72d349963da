"""Oracle-checked streaming stateful sessionization: the events table
replayed as a 3-batch file stream (time-split halves + a watermark
flush sentinel) through ``applyInPandasWithState``; the closed
sessions must equal the batch/SQL gap-sessionization of the same
events — a strong end-to-end check that custom streaming state
reproduces batch semantics."""

from __future__ import annotations

import atexit
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bireme_spark.sources.tables import load_table
from bireme_spark.streaming.sessionize import streaming_sessionize

GAP_SECONDS = 1800
_SENTINEL = -1


def _scratch(prefix: str) -> str:
    """mkdtemp reaped at interpreter exit — a returned plan may still
    read files under it at gate time, so cleanup must not be eager."""
    work = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return work


def streaming_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from bireme_spark.streaming.replay import read_replay, replay_to_files

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    work = _scratch("bireme_sess_")
    src = f"{work}/in"
    # State-store tasks scale with shuffle partitions and the result
    # doesn't: run the replay with few state partitions, then restore.
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        flush_ts = ev.agg((F.max("ts") + F.expr("INTERVAL 2 DAYS")).alias("f")).first().f
        # Time-split batches: with watermark 0s nothing in batch 2 is
        # late relative to batch 1's max event time.
        replay_to_files(
            ev, "ts", src,
            sentinel_row=[_SENTINEL, flush_ts],
            sentinel_schema="user_id long, ts timestamp",
        )
        stream = read_replay(spark, src, "user_id long, ts timestamp")
        # Parquet sink + read-back, NOT a memory sink: the memory
        # format materializes every row on the driver, which is
        # exactly what a 100 TB pipeline can't do. The output dir
        # outlives this call (the returned frame is lazy); only the
        # replay input and checkpoint are cleaned up.
        q = (
            streaming_sessionize(stream, gap_seconds=GAP_SECONDS, watermark="0 seconds")
            .writeStream.format("parquet")
            .option("path", f"{work}/out")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return (
            spark.read.parquet(f"{work}/out")
            .where(F.col("user_id") != _SENTINEL)
            .select("user_id", "session_start", "session_end", "n_events")
            .orderBy("user_id", "session_start")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(f"{work}/ckpt", ignore_errors=True)


STREAMING_SESSIONIZE_SQL = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > {GAP_SECONDS}
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
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM numbered
GROUP BY user_id, session_id
ORDER BY user_id, session_start
"""

QUERIES = {"streaming_sessionize": streaming_sessionize_events}
ORACLE = {"streaming_sessionize": STREAMING_SESSIONIZE_SQL}


def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-finalized tumbling-window aggregation: the events
    table replayed as ordered micro-batches through a 1-hour
    ``F.window`` groupBy in append mode — windows emit only when the
    watermark passes their end, and the flush sentinel finalizes the
    tail. Hash-matches batch SQL date_trunc aggregation."""
    from bireme_spark.streaming.replay import read_replay, replay_to_files

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    work = _scratch("bireme_tumble_")
    src = f"{work}/in"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        flush_ts = ev.agg((F.max("ts") + F.expr("INTERVAL 2 DAYS")).alias("f")).first().f
        replay_to_files(
            ev, "ts", src,
            sentinel_row=[flush_ts, "__flush", 0.0],
            sentinel_schema="ts timestamp, event_type string, value double",
        )
        stream = read_replay(spark, src, "ts timestamp, event_type string, value double")
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                # DECIMAL-exact sum: double addition is order-dependent
                # and the micro-batch partial-agg order differs from
                # the oracle's scan order (functions/money.py rationale)
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
        )
        # parquet sink + lazy read-back (see streaming_sessionize_events)
        q = (
            agg.writeStream.format("parquet")
            .option("path", f"{work}/out")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return (
            spark.read.parquet(f"{work}/out")
            .where(F.col("event_type") != "__flush")
            .orderBy("window_start", "event_type")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(f"{work}/ckpt", ignore_errors=True)


STREAMING_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY window_start, event_type
"""

QUERIES["streaming_tumbling_window"] = streaming_tumbling_window
ORACLE["streaming_tumbling_window"] = STREAMING_TUMBLING_SQL


def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-finalized HOPPING-window aggregation (1-hour window
    sliding every 30 minutes): each event fans into its two covering
    windows map-side, overlapping windows finalize independently as
    the watermark passes each window END — strictly harder eviction
    bookkeeping than tumbling (at any watermark two windows per key
    are still open). Append-mode replay + flush sentinel must
    hash-match the batch hopping aggregation exactly."""
    from bireme_spark.streaming.replay import read_replay, replay_to_files

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    work = _scratch("bireme_slide_")
    src = f"{work}/in"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        flush_ts = ev.agg((F.max("ts") + F.expr("INTERVAL 2 DAYS")).alias("f")).first().f
        replay_to_files(
            ev, "ts", src,
            sentinel_row=[flush_ts, "__flush", 0.0],
            sentinel_schema="ts timestamp, event_type string, value double",
        )
        stream = read_replay(spark, src, "ts timestamp, event_type string, value double")
        agg = (
            stream.withWatermark("ts", "0 seconds")
            .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "event_type",
                "n_events",
                "total_value",
            )
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", f"{work}/out")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return (
            spark.read.parquet(f"{work}/out")
            .where(F.col("event_type") != "__flush")
            .orderBy("window_start", "event_type")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(f"{work}/ckpt", ignore_errors=True)


STREAMING_SLIDING_SQL = """
WITH fanned AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type, value
  FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes', event_type, value
  FROM events
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
FROM fanned
GROUP BY 1, 2
ORDER BY 1, 2
"""

QUERIES["streaming_sliding_window"] = streaming_sliding_window
ORACLE["streaming_sliding_window"] = STREAMING_SLIDING_SQL


def streaming_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sketch maintenance under Structured Streaming —
    the streaming twin of ``events_sketch_rollup``: each micro-batch
    folds its events into per-(type, day) HLL sketches and
    ``hll_union_agg``-merges them into a persisted sketch-state
    table (foreachBatch, versioned state dirs); after the replay the
    weekly distinct-user estimates come from the STATE ONLY — the
    raw stream is never rescanned.

    Because sketch union is associative, the incremental state must
    equal the one-shot batch rollup EXACTLY —
    tests/test_sketches.py::TestSketchRollup asserts estimate-level
    equality with events_sketch_rollup (*rows-only* at the gate:
    register contents are engine-specific)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from bireme_spark.streaming.replay import read_replay, replay_to_files

    ev = load_table(spark, sf_dir, "events").select("ts", "user_id", "event_type")
    work = _scratch("bireme_sketch_")
    src = f"{work}/in"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        replay_to_files(ev, "ts", src)
        stream = read_replay(
            spark, src, "ts timestamp, user_id long, event_type string"
        )
        state = {"dir": None}

        def fold(batch_df, batch_id: int) -> None:
            inc = batch_df.groupBy(
                "event_type", F.to_date("ts").alias("day")
            ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
            if state["dir"] is not None:
                prev = spark.read.parquet(state["dir"])
                inc = (
                    prev.unionByName(inc)
                    .groupBy("event_type", "day")
                    .agg(F.hll_union_agg("sk").alias("sk"))
                )
            new_dir = f"{work}/state_v{batch_id}"
            inc.write.mode("overwrite").parquet(new_dir)
            state["dir"] = new_dir

        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        final = spark.read.parquet(state["dir"])
        return (
            final.groupBy(
                "event_type",
                F.date_format(
                    F.date_trunc("week", "day").cast("date"), "yyyy-MM-dd"
                ).alias("week_start"),
            )
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
                F.count(F.lit(1)).alias("n_days_merged"),
            )
            .select(
                "event_type",
                "week_start",
                F.col("approx_users").cast("bigint").alias("approx_users"),
                F.col("n_days_merged").cast("int").alias("n_days_merged"),
            )
            .orderBy("event_type", "week_start")
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


QUERIES["streaming_sketch_rollup"] = streaming_sketch_rollup  # rows-only


def streaming_ewma_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type EWMA maintained incrementally under Structured
    Streaming: each micro-batch folds its (time-ordered) values into
    the carried per-type state — injected into the executors as a
    broadcast-joined state frame, folded in Arrow-batched pandas, and
    only the |types|-row model returns to the driver per batch.

    Because every step rounds at 6dp, the trajectory is invariant to
    micro-batch boundaries: the final stream state must equal the
    one-shot batch fold (`streaming/ewma.py::ewma_batch`) EXACTLY —
    tests/test_streaming.py asserts bit-equality (*rows-only* at the
    gate: a sequential rounded fold has no closed SQL form).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from bireme_spark.streaming.ewma import _OUT_SCHEMA, _fold_group
    from bireme_spark.streaming.replay import read_replay, replay_to_files

    ev = load_table(spark, sf_dir, "events").select(
        "ts", "event_id", "event_type", "value"
    )
    work = _scratch("bireme_ewma_")
    src = f"{work}/in"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        replay_to_files(ev, "ts", src, halves=3)
        stream = read_replay(
            spark, src, "ts timestamp, event_id long, event_type string, value double"
        )
        state: dict[str, tuple] = {}  # type -> (n, ewma, mn, mx)

        def fold_batch(batch_df, batch_id: int) -> None:
            sess = batch_df.sparkSession
            if state:
                init = sess.createDataFrame(
                    [(t, e) for t, (_, e, _, _) in state.items()],
                    "event_type string, init_ewma double",
                )
            else:
                init = sess.createDataFrame([], "event_type string, init_ewma double")

            inc = (
                batch_df.select(
                    "event_type",
                    F.unix_micros("ts").alias("us"),
                    "event_id",
                    F.col("value").cast("double").alias("value"),
                )
                .join(F.broadcast(init), "event_type", "left")
                .groupBy("event_type")
                # shared sort/init/fold kernel — same code path as the
                # one-shot batch fold (streaming/ewma.py), which is
                # what makes the bit-equality property meaningful
                .applyInPandas(_fold_group, _OUT_SCHEMA)
            )
            for r in inc.collect():  # |types|-row model, not data
                n0, _, mn0, mx0 = state.get(r.event_type, (0, None, None, None))
                state[r.event_type] = (
                    n0 + r.n_events,
                    r.ewma,
                    r.min_value if mn0 is None else min(mn0, r.min_value),
                    r.max_value if mx0 is None else max(mx0, r.max_value),
                )

        q = (
            stream.writeStream.foreachBatch(fold_batch)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        rows = [
            (t, int(n), float(e), float(mn), float(mx))
            for t, (n, e, mn, mx) in sorted(state.items())
        ]
        return spark.createDataFrame(rows, _OUT_SCHEMA).orderBy("event_type")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


QUERIES["streaming_ewma_monitor"] = streaming_ewma_monitor  # rows-only


def streaming_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CEP pattern run INCREMENTALLY (streaming/cep.py): events
    replayed as 3 time-split micro-batches through per-user
    (last_click, last_error) state; matches emit at the purchase
    event. Oracle = the SAME SQL as the batch ``events_cep_pattern``
    — the gate value-checks stream ≡ batch for the pattern matcher."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from bireme_spark.queries.events import _CEP_WINDOW_S
    from bireme_spark.streaming.cep import streaming_cep
    from bireme_spark.streaming.replay import read_replay, replay_to_files

    ev = load_table(spark, sf_dir, "events").select(
        "ts", "user_id", "event_id", "event_type"
    )
    work = _scratch("bireme_cep_")
    src = f"{work}/in"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        replay_to_files(ev, "ts", src, halves=3)
        stream = read_replay(
            spark, src, "ts timestamp, user_id long, event_id long, event_type string"
        ).select(
            "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
        )
        matches = streaming_cep(stream, window_seconds=_CEP_WINDOW_S)
        q = (
            matches.writeStream.format("parquet")
            .option("path", f"{work}/out")
            .outputMode("append")
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        back = spark.read.parquet(f"{work}/out")
        return (
            back.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_matches"),
                F.sum("latency_us").alias("lat_sum"),
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
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(f"{work}/ckpt", ignore_errors=True)


from bireme_spark.queries.events import EVENTS_CEP_SQL as _EVENTS_CEP_SQL  # noqa: E402

QUERIES["streaming_cep_pattern"] = streaming_cep_pattern
ORACLE["streaming_cep_pattern"] = _EVENTS_CEP_SQL


def streaming_ddsketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental DDSketch maintenance under Structured Streaming —
    the streaming twin of ``events_ddsketch_quantiles`` and the
    payoff of choosing DDSketch over KLL/t-digest: bucket counts are
    plain integers, so per-micro-batch histograms SUM-merge into the
    persisted state and the final readout is BIT-IDENTICAL to the
    one-shot batch sketch — which is why this streaming query is
    ORACLE-CHECKED by the very same SQL as its batch twin (the HLL
    rollup's registers are engine-specific; these buckets are not).
    After the replay, quantiles come from the STATE ONLY — the raw
    stream is never rescanned.

    Scale: per-batch work is one hash agg to (type, bucket); state
    is O(|types|·log range) rows regardless of stream length."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    from bireme_spark.queries.events import DDSKETCH_BUCKET_EXPR, ddsketch_readout
    from bireme_spark.streaming.replay import read_replay, replay_to_files

    ev = load_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    work = _scratch("bireme_ddsk_")
    src = f"{work}/in"
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        replay_to_files(ev, "ts", src)
        stream = read_replay(spark, src, "ts timestamp, event_type string, value double")
        state = {"dir": None}

        def fold(batch_df, batch_id: int) -> None:
            inc = batch_df.select(
                "event_type", F.expr(DDSKETCH_BUCKET_EXPR).alias("bucket")
            ).groupBy("event_type", "bucket").agg(
                F.count(F.lit(1)).cast("bigint").alias("c")
            )
            if state["dir"] is not None:
                prev = spark.read.parquet(state["dir"])
                inc = (
                    prev.unionByName(inc)
                    .groupBy("event_type", "bucket")
                    .agg(F.sum("c").cast("bigint").alias("c"))
                )
            new_dir = f"{work}/state_v{batch_id}"
            inc.write.mode("overwrite").parquet(new_dir)
            state["dir"] = new_dir

        q = (
            stream.writeStream.foreachBatch(fold)
            .option("checkpointLocation", f"{work}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        final = spark.read.parquet(state["dir"])
        return ddsketch_readout(final)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


from bireme_spark.queries.events import EVENTS_DDSKETCH_SQL as _DDSK_SQL  # noqa: E402

QUERIES["streaming_ddsketch_rollup"] = streaming_ddsketch_rollup
# the WHOLE POINT: the incrementally merged state answers the same
# oracle as the one-shot batch sketch
ORACLE["streaming_ddsketch_rollup"] = _DDSK_SQL
