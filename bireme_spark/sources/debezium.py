"""Debezium envelope parser → canonical ChangeRow columns.

Debezium envelope, per the reference's
``pipeline/DebeziumPipeLine.java:200-235`` (DebeziumRecord):
``{"payload": {"op": c|r|u|d, "ts_ms": ..., "before": {...},
"after": {...}}}`` — op r (snapshot read) and c (create) both map to
INSERT; DELETE reads its tuple from ``before``; rows without a
payload are dropped (``DebeziumPipeLine.java:91-95``).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def debezium_envelope_schema(data_schema: StructType) -> StructType:
    payload = (
        StructType()
        .add("op", "string")
        .add("ts_ms", "long")
        .add("before", data_schema)
        .add("after", data_schema)
    )
    return StructType().add("payload", payload)


def parse_debezium(
    df: DataFrame,
    json_col: str,
    data_schema: StructType,
    key_fields: Sequence[str],
    source: str = "debezium",
    topic_col: str | None = None,
) -> DataFrame:
    """Parse Debezium JSON into ChangeRow columns ``source,
    origin_table, op, produce_time_ms, key, data (struct)``.

    The effective tuple is ``after`` for c/r/u and ``before`` for d
    (DebeziumRecord constructor, ``DebeziumPipeLine.java:206-229``).
    """
    env = F.from_json(F.col(json_col), debezium_envelope_schema(data_schema))
    parsed = df.withColumn("_env", env).where(F.col("_env.payload").isNotNull())

    op_raw = F.col("_env.payload.op")
    op = (
        F.when(op_raw.isin("c", "r"), "I")
        .when(op_raw == "u", "U")
        .when(op_raw == "d", "D")
        .otherwise(F.lit(None).cast("string"))
    )
    data: Column = F.when(op_raw == "d", F.col("_env.payload.before")).otherwise(
        F.col("_env.payload.after")
    )
    origin = (
        F.col(topic_col)
        if topic_col
        else F.lit(source)
    )

    parsed = parsed.withColumn("_data", data)
    key = F.concat_ws("", *[F.col(f"_data.{k}").cast("string") for k in key_fields])
    return parsed.select(
        *df.columns,
        F.lit(source).alias("source"),
        origin.alias("origin_table"),
        op.alias("op"),
        F.col("_env.payload.ts_ms").alias("produce_time_ms"),
        key.alias("key"),
        F.col("_data").alias("data"),
    ).where(F.col("op").isNotNull())
