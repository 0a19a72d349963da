"""Small-file compaction: file-count reduction + content fidelity."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from bireme_spark.sinks.compact import compact_parquet, plan_compaction


def test_compaction_merges_small_files(spark, tmp_path):
    src = str(tmp_path / "small")
    dst = str(tmp_path / "compacted")
    # 40 tiny files
    spark.range(0, 4000).withColumn("v", F.col("id") * 2).repartition(40).write.parquet(src)
    assert len(glob.glob(f"{src}/*.parquet")) == 40

    plan = compact_parquet(spark, src, dst, target_bytes=10 * 1024 * 1024)
    out_files = glob.glob(f"{dst}/*.parquet")
    assert len(out_files) == plan["n_output_files"] == 1
    assert plan["n_files"] == 40
    assert plan["rows"] == 4000

    # content identical
    a = sorted(tuple(r) for r in spark.read.parquet(src).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(dst).collect())
    assert a == b


def test_compaction_respects_target_bytes(spark, tmp_path):
    src = str(tmp_path / "sized")
    spark.range(0, 50_000).withColumn("s", F.sha2(F.col("id").cast("string"), 256)).repartition(
        20
    ).write.parquet(src)
    plan = plan_compaction(spark, src, target_bytes=1024 * 1024)
    # ~3-4 MB of sha strings → multiple 1MB outputs, fewer than inputs
    assert 1 < plan["n_output_files"] < 20
