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


def asof_join_directional(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    direction: str = "nearest",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """pandas ``merge_asof`` semantics, distributed: for each left row
    attach the right row with the nearest ``right_ts`` — ``backward``
    (≤ left_ts), ``forward`` (≥ left_ts), or ``nearest`` (either side,
    ties to backward) — optionally only within ``tolerance_seconds``.
    The kdb ``aj`` / QuestDB ASOF / feature-store point-in-time
    lookup surface.

    Same scalable shape as :func:`asof_join`: union both sides into
    one timeline, ONE shuffle on the key, then ordered window carries
    (a backward ``last(ignorenulls)`` and/or a forward
    ``first(ignorenulls)`` — two local sorts over the same hash
    partitioning, never a range-explosion join). Within equal
    timestamps the LEAST payload tuple wins on both sides, so results
    are deterministic and oracle-reproducible.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join_directional: bad direction {direction!r}")
    lcols = left.columns
    pay = F.struct(
        _epoch(right, right_ts).alias("_mt"), *[F.col(c) for c in right_payload]
    )
    r = right.select(
        F.col(on).alias("_k"),
        _epoch(right, right_ts).alias("_t"),
        F.lit(True).alias("_isr"),
        pay.alias("_payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
    )
    l = left.select(
        F.col(on).alias("_k"),
        _epoch(left, left_ts).alias("_t"),
        F.lit(False).alias("_isr"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c) for c in lcols if c != on],
    )
    timeline = r.unionByName(l)
    side = F.col("_isr").cast("int")
    cur = timeline
    if direction in ("backward", "nearest"):
        # right(1) before left(0) at equal ts (ties count as backward);
        # payload DESC so last() lands on the LEAST payload tuple
        wb = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t"), (1 - side), F.col("_payload").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        cur = cur.withColumn("_b", F.last("_payload", ignorenulls=True).over(wb))
    if direction in ("forward", "nearest"):
        # left(0) before right(1) at equal ts... but equal-ts rights
        # must still be visible forward — order right AFTER left and
        # take the first following payload (ASC → least tuple)
        wf = (
            Window.partitionBy("_k")
            .orderBy(F.col("_t"), side, F.col("_payload").asc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        cur = cur.withColumn("_f", F.first("_payload", ignorenulls=True).over(wf))
    tol = float("inf") if tolerance_seconds is None else float(tolerance_seconds)
    b = F.col("_b") if direction in ("backward", "nearest") else F.lit(None)
    f = F.col("_f") if direction in ("forward", "nearest") else F.lit(None)
    b_ok = b.isNotNull() & ((F.col("_t") - b["_mt"]) <= F.lit(tol))
    f_ok = f.isNotNull() & ((f["_mt"] - F.col("_t")) <= F.lit(tol))
    if direction == "backward":
        chosen = F.when(b_ok, b)
    elif direction == "forward":
        chosen = F.when(f_ok, f)
    else:
        b_dist = F.col("_t") - b["_mt"]
        f_dist = f["_mt"] - F.col("_t")
        chosen = (
            F.when(b_ok & (~f_ok | (b_dist <= f_dist)), b)  # tie → backward
            .when(f_ok, f)
        )
    out = cur.where(~F.col("_isr")).withColumn("_m", chosen)
    return out.select(
        F.col("_k").alias(on),
        *[F.col(c) for c in lcols if c != on],
        *[F.col(f"_m.{c}").alias(c) for c in right_payload],
    )


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
