"""Source→target table routing.

Bireme routes each change by ``dataSource.database.table`` through
the table-map config and silently drops rows whose origin table has
no mapping (``MaxwellPipeLine.java:55-71`` filter(),
``Config.java`` table-map files). Spark-first: a literal MapType
lookup column + a null filter — codegen, broadcast-free, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_table_mapping(
    df: DataFrame, mapping: dict[str, str], origin_col: str = "origin_table"
) -> DataFrame:
    """Add ``mapped_table`` from the mapping and drop unmapped rows."""
    if not mapping:
        return df.withColumn("mapped_table", F.lit(None).cast("string")).where(F.lit(False))
    m = F.create_map(*[F.lit(x) for kv in sorted(mapping.items()) for x in kv])
    return df.withColumn("mapped_table", m[F.col(origin_col)]).where(
        F.col("mapped_table").isNotNull()
    )
