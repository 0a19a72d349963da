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

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


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
    for cut in [*cuts, None]:
        part = df
        if lo is not None:
            part = part.where(F.col(ts_col) > F.lit(lo))
        if cut is not None:
            part = part.where(F.col(ts_col) <= F.lit(cut))
        part.coalesce(1).write.mode("append").parquet(src_dir)
        time.sleep(1.1)  # distinct mtimes keep file-source batch order
        lo = cut
    if sentinel_row is not None:
        spark.createDataFrame([tuple(sentinel_row)], sentinel_schema).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)


def read_replay(spark: SparkSession, src_dir: str, schema: str):
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src_dir)
    )
