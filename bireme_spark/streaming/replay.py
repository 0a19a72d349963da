"""Deterministic stream replay: split a batch DataFrame into
time-ordered parquet files (plus a far-future watermark-flush
sentinel) so a file source replays it as ordered micro-batches.

With ``maxFilesPerTrigger=1`` and a 0-second watermark, batch N+1
contains only events after batch N's max event time, so nothing is
late and every watermark-gated operator (windowed agg, stateful
sessionization) finalizes deterministically once the sentinel
arrives — which is what makes streaming results oracle-checkable
against batch SQL over the same rows."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Any fixed past epoch: batch i's files get mtime _MTIME_BASE + i, so
# the file source (which orders files by modification time) replays
# batches in write order without real sleeps between writes.
_MTIME_BASE = 946_684_800  # 2000-01-01T00:00:00Z


def stamp_batch_mtime(src_dir: str, batch_idx: int, seen: set[str]) -> None:
    """Give every not-yet-stamped file in ``src_dir`` the mtime slot
    for ``batch_idx``. Replaces the old ``time.sleep(1.1)`` between
    writes — same ordering guarantee, zero wall-clock cost."""
    t = _MTIME_BASE + batch_idx
    for name in os.listdir(src_dir):
        p = os.path.join(src_dir, name)
        if p in seen or not os.path.isfile(p):
            continue
        os.utime(p, (t, t))
        seen.add(p)


def replay_to_files(
    df: DataFrame,
    ts_col: str,
    src_dir: str,
    sentinel_row: list | None = None,
    sentinel_schema: str | None = None,
    halves: int = 2,
) -> None:
    """Write ``df`` as ``halves`` time-split parquet files + sentinel."""
    spark = df.sparkSession
    qs = [i / halves for i in range(1, halves)]
    bounds = df.agg(
        *[F.expr(f"percentile_approx({ts_col}, {q})").alias(f"q{i}") for i, q in enumerate(qs)]
    ).first()
    cuts = [bounds[f"q{i}"] for i in range(len(qs))]
    lo = None
    seen: set[str] = set()
    for i, cut in enumerate([*cuts, None]):
        part = df
        if lo is not None:
            part = part.where(F.col(ts_col) > F.lit(lo))
        if cut is not None:
            part = part.where(F.col(ts_col) <= F.lit(cut))
        part.coalesce(1).write.mode("append").parquet(src_dir)
        stamp_batch_mtime(src_dir, i, seen)
        lo = cut
    if sentinel_row is not None:
        spark.createDataFrame([tuple(sentinel_row)], sentinel_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)
        stamp_batch_mtime(src_dir, halves, seen)


def read_replay(spark: SparkSession, src_dir: str, schema: str):
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    )
