"""Source-value decoders as native Spark column expressions.

Bireme decodes Maxwell/Debezium wire values while formatting COPY
tuples; each decoder here is the Spark-column twin (JVM expressions,
whole-stage codegen — no Python in the hot path):

- ``decode_bit``      ← MaxwellPipeLine.java:84-88 (int → zero-padded
  bit string at a given precision)
- ``decode_debezium_bool_bit`` ← DebeziumPipeLine.java:120-127
  (true/false → "1"/"0")
- ``decode_binary``   ← MaxwellPipeLine.java:77-81 (base64 → bytes)
- ``decode_debezium_date`` ← DebeziumPipeLine.java:173-187
  (epoch-day int → date)
- ``decode_debezium_timestamp`` ← DebeziumPipeLine.java:147-171
  (epoch-micros → timestamp)
- ``decode_debezium_numeric`` ← DebeziumPipeLine.java:196-201
  (base64 big-endian two's-complement unscaled int + scale → exact
  decimal) — supports ≤ 8-byte unscaled values JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decode_bit(col: Column, precision: int) -> Column:
    """Integer-carried bit type → zero-padded binary string."""
    return F.lpad(F.conv(col.cast("string"), 10, 2), precision, "0")


def decode_debezium_bool_bit(col: Column) -> Column:
    """Debezium bool-encoded bit(1): true/false → "1"/"0"."""
    return F.when(col == "true", "1").when(col == "false", "0").otherwise(col)


def decode_binary(col: Column) -> Column:
    """Base64 wire value → binary."""
    return F.unbase64(col)


def decode_debezium_date(col: Column) -> Column:
    """Debezium io.debezium.time.Date: days since epoch → date."""
    return F.date_add(F.lit("1970-01-01").cast("date"), col.cast("int"))


def decode_debezium_timestamp(col: Column) -> Column:
    """Debezium MicroTimestamp: microseconds since epoch → timestamp."""
    return F.timestamp_micros(col.cast("long"))


def decode_debezium_numeric(col: Column, scale: int) -> Column:
    """Base64 big-endian two's-complement unscaled int + fixed scale →
    exact decimal. Base64 → hex → bigint via ``conv``; the sign is
    fixed up by subtracting 2^(8·nbytes) when the top bit is set."""
    hexed = F.hex(F.unbase64(col))
    raw = F.conv(hexed, 16, 10).cast("decimal(20,0)")
    nbytes = F.length(F.unbase64(col))
    top_byte = F.conv(F.substring(hexed, 1, 2), 16, 10).cast("int")
    bias = F.pow(F.lit(2.0), (nbytes * 8).cast("double")).cast("decimal(20,0)")
    signed = F.when(top_byte >= 128, raw - bias).otherwise(raw)
    return (signed.cast(f"decimal(38,{scale})") / F.pow(F.lit(10.0), F.lit(scale)).cast(
        "decimal(20,0)"
    )).cast(f"decimal(20,{scale})")
