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


def mongo_envelope_schema() -> StructType:
    """Debezium MongoDB envelope: ``before``/``after`` are extended-
    JSON *strings*, not structs (the connector serializes the BSON
    document), so the outer schema types them as string and a second
    ``from_json`` decodes the payload."""
    payload = (
        StructType()
        .add("op", "string")
        .add("ts_ms", "long")
        .add("before", "string")
        .add("after", "string")
    )
    return StructType().add("payload", payload)


def _strip_extended_json(col: Column) -> Column:
    """Collapse the common MongoDB extended-JSON wrappers to plain
    scalars so a typed ``from_json`` can read them:

    ``{"$numberLong": "7"}`` / ``{"$numberInt": "7"}`` /
    ``{"$numberDouble": "7.5"}`` / ``{"$numberDecimal": "7.5"}`` → the
    number; ``{"$oid": "..."}`` → the hex string; ``{"$date": 123}``
    → the epoch-ms long. Pure JVM ``regexp_replace`` chain — stays in
    whole-stage codegen; wrappers we don't rewrite simply parse NULL
    for that field (typed from_json), never crash the row.
    """
    num = r'\{\s*"\$number(?:Long|Int)"\s*:\s*"(-?\d+)"\s*\}'
    dbl = r'\{\s*"\$number(?:Double|Decimal)"\s*:\s*"(-?[\d.eE+-]+)"\s*\}'
    oid = r'\{\s*"\$oid"\s*:\s*("[0-9a-fA-F]+")\s*\}'
    date = r'\{\s*"\$date"\s*:\s*(-?\d+)\s*\}'
    out = F.regexp_replace(col, num, "$1")
    out = F.regexp_replace(out, dbl, "$1")
    out = F.regexp_replace(out, oid, "$1")
    out = F.regexp_replace(out, date, "$1")
    return out


def parse_debezium_mongo(
    df: DataFrame,
    json_col: str,
    data_schema: StructType,
    key_fields: Sequence[str],
    source: str = "debezium-mongo",
    topic_col: str | None = None,
) -> DataFrame:
    """Debezium *MongoDB* envelope → canonical ChangeRow columns.

    The reference advertises MongoDB sources
    (``/root/reference/README.md:9``) and routes every connector
    through the same DebeziumRecord op mapping
    (``pipeline/DebeziumPipeLine.java:206-229``); the Mongo connector
    differs only in payload shape — ``after``/``before`` arrive as
    extended-JSON strings. Parse = outer ``from_json`` (string
    payload fields) → pick before/after by op → strip extended-JSON
    wrappers → second ``from_json`` with the caller's typed schema.
    Both passes are JVM-side; at 100 TB this is a pure map stage with
    zero shuffle.
    """
    env = F.from_json(F.col(json_col), mongo_envelope_schema())
    parsed = df.withColumn("_env", env).where(F.col("_env.payload").isNotNull())

    op_raw = F.col("_env.payload.op")
    op = (
        F.when(op_raw.isin("c", "r"), "I")
        .when(op_raw == "u", "U")
        .when(op_raw == "d", "D")
        .otherwise(F.lit(None).cast("string"))
    )
    doc = F.when(op_raw == "d", F.col("_env.payload.before")).otherwise(
        F.col("_env.payload.after")
    )
    origin = F.col(topic_col) if topic_col else F.lit(source)

    parsed = parsed.withColumn("_data", F.from_json(_strip_extended_json(doc), data_schema))
    key = F.concat_ws("", *[F.col(f"_data.{k}").cast("string") for k in key_fields])
    return parsed.select(
        *df.columns,
        F.lit(source).alias("source"),
        origin.alias("origin_table"),
        op.alias("op"),
        F.col("_env.payload.ts_ms").alias("produce_time_ms"),
        key.alias("key"),
        F.col("_data").alias("data"),
    ).where(F.col("op").isNotNull())
