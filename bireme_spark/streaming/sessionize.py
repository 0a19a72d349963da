"""Streaming gap-sessionization — the custom stateful operator
pattern (``applyInPandasWithState``): per-entity session state lives
in the state store, sessions emit when the watermark passes their
gap timeout.

This is the streaming twin of the batch ``operators.windows
.sessionize``; on identical (replayed) input the closed sessions
match the batch session boundaries (tested with an availableNow file
stream in tests/test_streaming_sessionize.py).

Scale: state is partitioned by the entity key across executors
(same hash shuffle as the batch window); each micro-batch touches
only the entities present in the batch plus timed-out groups. The
per-group Python work is Arrow-batched pandas.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
    ]
)

# state: (start_us, end_us, n_events) — microseconds, the full
# precision of a Spark TimestampType (ms would truncate real event
# times and drift from the batch sessionizer).
_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _close_frame(user_id: int, closes: list[tuple[int, int, int]]) -> pd.DataFrame:
    """One DataFrame for all of a group's closed sessions — per-close
    1-row frames would churn thousands of pandas objects per batch."""
    return pd.DataFrame(
        {
            "user_id": [user_id] * len(closes),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closes],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closes],
            "n_events": [n for _, _, n in closes],
        }
    )


def make_session_fn(gap_seconds: int):
    """Build the per-group state function. Events arrive as pandas
    batches per (user_id); state carries the open session; closed
    sessions are emitted as soon as a gap is observed in-batch, or
    when the event-time timeout fires (watermark passed the gap)."""
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            state.remove()
            yield _close_frame(user_id, [(start_us, end_us, n)])
            return

        ts = pd.concat(list(pdfs))["ts"]
        us = (ts.astype("int64") // 1_000).sort_values().to_numpy()
        out: list[tuple[int, int, int]] = []
        if state.exists:
            start_us, end_us, n = state.get
            # In-watermark events can still sort before the open
            # session's recorded start (out-of-order arrival). Chain
            # them exactly like the batch sessionizer: gap-split the
            # early events, then either merge the last early run into
            # the open session (gap bridged) or close it separately.
            pre = us[us < start_us]
            us = us[us >= start_us]
            if len(pre):
                c_start, c_end, c_n = int(pre[0]), int(pre[0]), 0
                for t in pre:
                    t = int(t)
                    if c_n > 0 and t - c_end > gap_us:
                        out.append((c_start, c_end, c_n))
                        c_start, c_n = t, 0
                    c_end = max(c_end, t)
                    c_n += 1
                if start_us - c_end <= gap_us:
                    start_us, n = c_start, n + c_n
                else:
                    out.append((c_start, c_end, c_n))
        else:
            start_us, end_us, n = int(us[0]), int(us[0]), 0

        for t in us:
            t = int(t)
            if n > 0 and t - end_us > gap_us:
                out.append((start_us, end_us, n))
                start_us, n = t, 0
            end_us = max(end_us, t)
            n += 1
        deadline_us = end_us + gap_us
        wm_us = state.getCurrentWatermarkMs() * 1000
        if wm_us >= deadline_us:
            # The watermark already passed this session's close time
            # (any further events for it would be dropped as late) —
            # close it now; a timeout in the past is rejected.
            out.append((start_us, end_us, n))
            state.remove()
        else:
            state.update((start_us, end_us, n))
            # timeout API is ms-granular; round up so it never fires
            # before the µs-exact deadline
            state.setTimeoutTimestamp(-(-deadline_us // 1000))
        if out:
            yield _close_frame(user_id, out)

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """events (user_id, ts, ...) stream → closed-session stream."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
