"""Parquet table loaders for the test warehouse.

The warehouse star schema mirrors the tables bireme would maintain in
Greenplum; here they are parquet directories readable by
``spark.read.parquet`` with full predicate/projection pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# The only dimensions safe to ALWAYS broadcast: nation (25 rows) and
# region (5) are fixed-cardinality at any fact scale. customer/
# supplier/part grow linearly with SF (customer = 150k×SF rows — TBs
# at 100 TB fact scale), so they get NO forced hint; the
# autoBroadcastJoinThreshold + AQE picks broadcast while they fit and
# shuffle joins when they don't.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS). How Spark surfaces it has
    # shifted across releases, so normalize every variant to a session-tz
    # TIMESTAMP (LTZ) — watermarks/windows require LTZ event time:
    #   * LongType       — legacy nanosAsLong conf honored (old PySpark):
    #                      ns → µs integer division (ns exceeds double
    #                      precision; DuckDB truncates to µs the same way).
    #   * TimestampNTZType — PySpark 4.1.x default read of TIMESTAMP(NANOS):
    #                      µs-truncated naive value; cast reinterprets it in
    #                      the session zone (forced UTC), matching DuckDB's
    #                      naive-UTC TIMESTAMP exactly.
    from pyspark.sql.types import LongType, TimestampNTZType

    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    if not names:
        names = TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register temp views so operators can also be driven via spark.sql."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)
