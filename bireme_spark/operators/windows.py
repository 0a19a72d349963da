"""Time-series operators: gap sessionization and as-of joins.

Both are single-shuffle plans that survive scale:

- ``sessionize``: one shuffle on the entity key; the session id is a
  running sum over an ordered window (no self-join, no cross-session
  state on the driver).
- ``asof_join``: the classic scalable formulation — union both sides
  into one timeline, single shuffle on the join key, one ordered
  window pass carrying the latest right-side payload forward
  (``last(..., ignorenulls=True)``). No range-explosion join; at
  100 TB both sides hash-partition on the key and sort locally.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType


def _epoch(df: DataFrame, col: str):
    """Timestamp-ish column → epoch seconds as double (µs-exact up to
    2^53; NTZ interpreted in the session zone, which the registry
    pins to UTC). Numeric columns pass through."""
    dt = df.schema[col].dataType
    if isinstance(dt, (TimestampType, TimestampNTZType)):
        return F.col(col).cast("timestamp_ltz").cast("double")
    return F.col(col).cast("double")


def sessionize(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    gap_seconds: int,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Assign gap-based session ids per entity: a new session starts
    when the gap to the previous event exceeds ``gap_seconds``."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, *tiebreak_cols)
    ts_sec = _epoch(df, ts_col)
    prev = F.lag(ts_sec).over(w)
    new_session = F.when(prev.isNull() | ((ts_sec - prev) > gap_seconds), 1).otherwise(0)
    running = Window.partitionBy(entity_col).orderBy(ts_col, *tiebreak_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new_session", new_session).withColumn(
        "session_id", F.sum("_new_session").over(running)
    ).drop("_new_session")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` for the same key (left-outer semantics).

    Ties on ``right_ts`` resolve to the greatest payload tuple (order
    by the payload columns themselves), deterministically.
    """
    lcols = left.columns
    r = right.select(
        F.col(on).alias("_k"),
        _epoch(right, right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in right_payload]).alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
    )
    l = left.select(
        F.col(on).alias("_k"),
        _epoch(left, left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in lcols if c != on],
    )
    timeline = r.unionByName(l)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", F.col("_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = timeline.withColumn("_asof", F.last("_payload", ignorenulls=True).over(w))
    out = carried.where(F.col("_side") == 1).select(
        F.col("_k").alias(on),
        *[F.col(c) for c in lcols if c != on],
        *[F.col(f"_asof.{c}").alias(c) for c in right_payload],
    )
    return out
