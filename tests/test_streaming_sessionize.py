"""Streaming sessionization (applyInPandasWithState) must reproduce
the batch sessionizer's session boundaries on replayed input."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from bireme_spark.operators.windows import sessionize
from bireme_spark.streaming.sessionize import streaming_sessionize

GAP = 60  # seconds


def _ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 10, minute, second)


# (user_id, ts) — user 1: two sessions (gap at 10:05→10:30);
# user 2: one session; sentinel user 99 arrives last to push the
# watermark far past every real session's timeout.
BATCH1 = [(1, _ts(0)), (1, _ts(1)), (2, _ts(0, 30)), (1, _ts(5))]
BATCH2 = [(1, _ts(30)), (2, _ts(1, 15)), (1, _ts(31))]
FLUSH = [(99, dt.datetime(2024, 1, 1, 23, 0, 0))]


@pytest.fixture()
def event_files(spark, tmp_path):
    src = tmp_path / "events_in"
    src.mkdir()
    for i, rows in enumerate([BATCH1, BATCH2, FLUSH]):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
    return src


def test_streaming_matches_batch_sessions(spark, event_files, tmp_path):
    schema = "user_id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{event_files}/*")
    )
    sessions = streaming_sessionize(stream, gap_seconds=GAP, watermark="0 seconds")
    q = (
        sessions.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM sess_out").collect()
        if r.user_id != 99
    }

    all_events = spark.createDataFrame(BATCH1 + BATCH2, schema)
    batch = (
        sessionize(all_events, "user_id", "ts", GAP)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    want = {
        (r.user_id, r.session_start, r.session_end, r.n_events) for r in batch.collect()
    }
    assert got == want
    assert len(want) == 4  # user 1 × 3 sessions (60s gap) + user 2 × 1


def test_late_in_watermark_event_extends_session_backward(spark, tmp_path):
    """ADVICE: an out-of-order event inside the watermark that sorts
    before the open session's start must chain in with batch gap
    semantics — backward extension when it bridges the gap, a separate
    earlier session when it doesn't."""
    gap = 600  # 10 minutes
    b0 = [(1, _ts(30)), (1, _ts(31))]
    # late but in-watermark: 10:29 bridges into the open session,
    # 09:00 (via minute math below) is its own earlier session
    early = dt.datetime(2024, 1, 1, 9, 0, 0)
    b1 = [(1, early), (1, _ts(29))]
    flush = [(99, dt.datetime(2024, 1, 1, 23, 0, 0))]

    src = tmp_path / "in"
    src.mkdir()
    import os

    for i, rows in enumerate([b0, b1, flush]):
        spark.createDataFrame(rows, "user_id long, ts timestamp").coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
        t = 946_684_800 + i
        for root, _, files in os.walk(src / f"b{i}"):
            for f in files:
                os.utime(os.path.join(root, f), (t, t))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/*")
    )
    sessions = streaming_sessionize(stream, gap_seconds=gap, watermark="10 hours")
    q = (
        sessions.writeStream.format("memory")
        .queryName("late_sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in spark.sql("SELECT * FROM late_sess_out").collect()
        if r.user_id != 99
    }
    assert got == {
        (1, early, early, 1),
        (1, _ts(29), _ts(31), 3),
    }
