"""Table-maintenance queries: the standing jobs a 100 TB parquet
warehouse schedules around the CDC sink (small-file compaction —
Iceberg rewrite_data_files / Delta OPTIMIZE twin, sinks/compact.py).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bireme_spark.sinks.compact import compact_parquet
from bireme_spark.sources.tables import load_table

_N_FRAGMENTS = 32


def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end compaction run: fragment the events table into 32
    small files (the state a per-micro-batch CDC sink leaves behind),
    compact to ~16 MB targets, and report the before/after file
    counts plus the row count — which must survive the rewrite
    exactly. File counts and rows are deterministic, so the oracle is
    closed-form; byte sizes are not (encoder variance) and stay out
    of the result."""
    work = tempfile.mkdtemp(prefix="bireme_compact_")
    src = os.path.join(work, "fragmented")
    dst = os.path.join(work, "compacted")
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    e.repartition(_N_FRAGMENTS).write.mode("overwrite").parquet(src)
    plan = compact_parquet(spark, src, dst, target_bytes=16 * 1024 * 1024)
    return spark.createDataFrame(
        [(plan["n_files"], plan["n_output_files"], plan["rows"])],
        "n_files int, n_output_files int, n_rows bigint",
    ).select("n_files", "n_output_files", F.col("n_rows"))


SINK_COMPACTION_SQL = f"""
SELECT {_N_FRAGMENTS} AS n_files, 1 AS n_output_files,
       (SELECT COUNT(*) FROM events) AS n_rows
"""

QUERIES = {"sink_compaction": sink_compaction}
ORACLE = {"sink_compaction": SINK_COMPACTION_SQL}
