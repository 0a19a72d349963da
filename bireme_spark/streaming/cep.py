"""Streaming CEP pattern matching — MATCH_RECOGNIZE-style sequences
(click → [no error] → purchase within a window) detected INCREMENTALLY
under Structured Streaming with ``applyInPandasWithState``.

The per-user state is just the running (last_click_us, last_error_us)
pair — the same prefix state the batch window pass
(``queries/events.py::events_cep_pattern``) computes with
``last() over (rows unbounded preceding)`` — so on a replayed stream
the emitted matches are EXACTLY the batch matches (the registry query
is oracle-checked against the batch CEP SQL, proving stream ≡ batch).

Scale: state is two longs per user, hash-partitioned on the same key
a CEP engine partitions on; each micro-batch touches only the users
present in it; matches emit immediately at the purchase event (no
watermark wait — the pattern is fully determined by its prefix).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

MATCH_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("purchase_us", LongType()),
        StructField("latency_us", LongType()),
    ]
)

# state: (last_click_us, last_error_us); -1 = never seen
_STATE_SCHEMA = StructType(
    [StructField("lc", LongType()), StructField("le", LongType())]
)


def make_cep_fn(window_seconds: int):
    win_us = window_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        pdf = pd.concat(list(pdfs))
        pdf = pdf.sort_values(["us", "event_id"], kind="mergesort")
        lc, le = state.get if state.exists else (-1, -1)
        purchases, lats = [], []
        for typ, us in zip(pdf["event_type"], pdf["us"]):
            us = int(us)
            if typ == "click":
                lc = us
            elif typ == "error":
                le = us
            elif typ == "purchase" and lc >= 0 and us - lc <= win_us and le <= lc:
                purchases.append(us)
                lats.append(us - lc)
        state.update((lc, le))
        if purchases:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(purchases),
                    "purchase_us": purchases,
                    "latency_us": lats,
                }
            )

    return fn


def streaming_cep(events: DataFrame, window_seconds: int = 1800) -> DataFrame:
    """events(user_id, event_id, event_type, us) stream → match rows
    (user_id, purchase_us, latency_us), append mode, no timeouts."""
    return events.groupBy("user_id").applyInPandasWithState(
        make_cep_fn(window_seconds),
        outputStructType=MATCH_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
