"""Structured-Streaming CDC pipeline: the end-to-end runtime twin of
bireme's PipeLine → RowCache → ChangeLoader chain
(``pipeline/PipeLine.java:60-200``, ``RowCache.java``,
``ChangeLoader.java``).

Shape:
    readStream (kafka | file) of envelope JSON
      → parse (Maxwell/Debezium from_json)
      → table routing (table_map filter)
      → foreachBatch: per-table compact → DELETE+COPY merge

Each micro-batch IS bireme's LoadTask: the batch compaction and the
anti-join merge are exactly the batch operators
(operators/cdc.compact / apply_changes), so batch and streaming
semantics provably agree (tested in tests/test_streaming.py).

State layout: the target table is a versioned parquet dir
(``<target>/v=<n>``) — each batch reads the latest version, merges,
writes the next. On a cluster you'd swap this sink for Delta/Iceberg
MERGE or a Greenplum/JDBC DELETE+COPY writer; versioned parquet keeps
the test environment dependency-free while exercising the same plan.
Kafka ingestion follows the same ``readStream.format("kafka")``
options bireme's consumer config maps to (``KafkaPipeLine.java:
190-208``); the file source is the test/replay path.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from bireme_spark.config import PipelineConfig, SourceConfig
from bireme_spark.operators.cdc import apply_changes, compact
from bireme_spark.operators.mapping import apply_table_mapping
from bireme_spark.sources.debezium import parse_debezium
from bireme_spark.sources.maxwell import parse_maxwell


def _latest_version(target_dir: str) -> int | None:
    if not os.path.isdir(target_dir):
        return None
    versions = [
        int(d.split("=", 1)[1])
        for d in os.listdir(target_dir)
        if d.startswith("v=") and d.split("=", 1)[1].isdigit()
    ]
    return max(versions) if versions else None


def read_state(spark: SparkSession, target_dir: str) -> DataFrame | None:
    v = _latest_version(target_dir)
    if v is None:
        return None
    return spark.read.parquet(f"{target_dir}/v={v}")


def _open_stream(spark: SparkSession, source: SourceConfig, max_files: int | None):
    if source.kind == "file" or source.path:
        reader = spark.readStream.format("text")
        if max_files:
            reader = reader.option("maxFilesPerTrigger", max_files)
        return reader.load(source.path).withColumnRenamed("value", "value")
    # Kafka path (bireme's consumer settings, KafkaPipeLine.java:190-208).
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", source.kafka_server)
        .option("subscribe", source.kafka_topic)
        .option("kafka.group.id", source.kafka_groupid)
        .option("startingOffsets", "earliest")
    )
    return reader.load().selectExpr("CAST(value AS STRING) AS value")


def run_cdc_pipeline(
    spark: SparkSession,
    config: PipelineConfig,
    data_schema: StructType,
    key_fields: Sequence[str],
    base_columns: Sequence[str],
    available_now: bool = False,
):
    """Launch the CDC sync for one source (the multi-source case runs
    one query per source, like bireme's one PipeLine per partition).

    ``base_columns``: target-table column order (key first); payload
    columns are taken from the parsed ``data`` struct.
    """
    source = config.sources[0]
    raw = _open_stream(spark, source, config.max_events_per_trigger)

    if source.kind == "debezium":
        parsed = parse_debezium(raw, "value", data_schema, key_fields, source=source.name)
    else:
        parsed = parse_maxwell(raw, "value", data_schema, key_fields, source=source.name)
    if source.table_map:
        parsed = apply_table_mapping(parsed, source.table_map)

    key_col = key_fields[0]
    payload_cols = [f.name for f in data_schema.fields if f.name not in key_fields]

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        changes = batch_df.select(
            F.col("key"),
            F.col("op"),
            F.col("produce_time_ms"),
            F.monotonically_increasing_id().alias("seq"),
            F.col("old_key") if "old_key" in batch_df.columns else F.lit(None).cast("string").alias("old_key"),
            *[F.col(f"data.{c}").alias(c) for c in payload_cols],
        )
        compacted = compact(
            changes,
            key_cols=("key",),
            order_cols=("produce_time_ms", "seq"),
            payload_cols=tuple(payload_cols),
            old_key_col="old_key",
        )
        if config.target_jdbc_url:
            # Greenplum/warehouse path: DELETE+COPY merge through the
            # staged-key JDBC transaction (ChangeLoader semantics).
            from bireme_spark.sinks.jdbc import JdbcMergeSink

            sink = JdbcMergeSink(
                url=config.target_jdbc_url,
                target_table=config.target_table or "public.target",
                key_cols=("key",),
                payload_cols=("key", *payload_cols),
                properties=config.jdbc_properties,
            )
            sink(compacted.withColumnRenamed("final_op", "op"), batch_id)
            return
        bspark = batch_df.sparkSession
        base = read_state(bspark, config.target_dir)
        if base is None:
            base = bspark.createDataFrame(
                [], ", ".join(f"{c} {_ddl(data_schema, c, key_fields, key_col)}" for c in base_columns)
            )
        merged = apply_changes(
            base,
            compacted,
            base_key_cols=(base_columns[0],),
            compact_key_cols=("key",),
            payload_map={c: c for c in base_columns[1:]},
        )
        next_v = (_latest_version(config.target_dir) or 0) + 1
        merged.write.mode("overwrite").parquet(f"{config.target_dir}/v={next_v}")

    writer = (
        parsed.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", config.checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=config.trigger_interval)
    return writer.start()


def _ddl(schema: StructType, col: str, key_fields: Sequence[str], key_col: str) -> str:
    if col in {f.name for f in schema.fields}:
        return schema[col].dataType.simpleString()
    # key column of the base table keeps the parsed-string key type
    return "string"
