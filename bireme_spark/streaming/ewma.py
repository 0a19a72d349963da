"""Exponentially-weighted moving average (EWMA) monitoring — the
classic online smoother a CDC/metrics pipeline keeps per key (cf. the
reference's row-count state tracking in its state server; studied,
not copied). Two faces of one fold:

- ``ewma_batch``: one-shot batch computation (per-type sort + fold in
  an Arrow-batched applyInPandas — the per-key series is the unit of
  work, so a 100 TB stream with K keys parallelizes over K).
- the streaming query (``queries/streaming_sessions.py``) folds the
  SAME function per micro-batch with the carried state injected via a
  broadcast-joined state frame; only the K-row model crosses the
  driver per batch.

Every step rounds at 6dp (``round(α·v + (1-α)·e, 6)``), so the
trajectory is bit-identical regardless of micro-batch boundaries —
the property tests assert stream state == batch fold EXACTLY.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHA = 0.2

_OUT_SCHEMA = (
    "event_type string, n_events long, ewma double, min_value double, max_value double"
)


def fold_series(values, init: float | None = None) -> float | None:
    """Sequential 6dp-rounded EWMA fold; the single source of truth
    used by both the batch and the per-micro-batch path."""
    e = init
    for v in values:
        v = float(v)
        e = round(v, 6) if e is None else round(ALPHA * v + (1.0 - ALPHA) * e, 6)
    return e


def _fold_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values(["us", "event_id"], kind="mergesort")
    init = None
    if "init_ewma" in pdf.columns and pd.notna(pdf["init_ewma"].iloc[0]):
        init = float(pdf["init_ewma"].iloc[0])
    e = fold_series(pdf["value"].tolist(), init)
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n_events": [len(pdf)],
            "ewma": [e],
            "min_value": [float(pdf["value"].min())],
            "max_value": [float(pdf["value"].max())],
        }
    )


def ewma_batch(events: DataFrame) -> DataFrame:
    """Per-type EWMA over the full (ts, event_id)-ordered history.
    One event_type-key shuffle; the sequential fold runs inside
    Arrow-batched pandas per key."""
    prepared = events.select(
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.col("value").cast("double").alias("value"),
    )
    return (
        prepared.groupBy("event_type")
        .applyInPandas(_fold_group, _OUT_SCHEMA)
        .orderBy("event_type")
    )
