"""MERGE INTO gate queries (SURVEY.md §2.A extension).

bireme's loader can only express "delete every changed key, then
re-insert" (``ChangeLoader.java:205-330``); the warehouse it feeds
(Greenplum) grew full ANSI MERGE later. ``operators.cdc.merge_into``
re-expresses that as ONE full-outer PK-hash join so conditional
clauses can compare old vs new values in the same shuffle.

The gate query drives every clause type at once:

* base = orders with ``o_orderkey % 7 == 0`` keys missing (an
  out-of-sync replica);
* source = one compacted change per key: DELETE for ``%5==0``,
  UPDATE for ``%3==0`` (price-20 for ``%9==0`` — a stale decrease the
  conditional update must SKIP — else price+10), redelivered INSERT
  otherwise;
* WHEN MATCHED AND op='D'                      THEN DELETE
* WHEN MATCHED AND op='U' AND s.price>t.price  THEN UPDATE price
* WHEN NOT MATCHED AND op<>'D'                 THEN INSERT

The oracle derives the identical final state arithmetically from
orders, so the full-outer plan, every WHEN branch, and the
conditional-skip path are all value-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bireme_spark.operators.cdc import merge_into
from bireme_spark.sources.tables import load_table

_DEC = "decimal(12,2)"


def cdc_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional three-clause MERGE INTO an out-of-sync orders
    replica. One full-outer shuffle on the PK hash — no second base
    pass (vs DELETE+COPY's anti-join ∪ append); AQE skew-split covers
    hot keys at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    base = o.where(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.col("o_totalprice").cast(_DEC).alias("o_totalprice"),
        "o_orderstatus",
    )
    k = F.col("o_orderkey")
    source = o.select(
        k.alias("key"),
        F.when(k % 5 == 0, "D").when(k % 3 == 0, "U").otherwise("I").alias("op"),
        F.when(
            k % 9 == 0, (F.col("o_totalprice").cast(_DEC) - 20).cast(_DEC)
        )
        .otherwise((F.col("o_totalprice").cast(_DEC) + 10).cast(_DEC))
        .alias("new_price"),
        F.col("o_orderstatus").alias("new_status"),
    )
    merged = merge_into(
        base,
        source,
        base_key_cols=("o_orderkey",),
        source_key_cols=("key",),
        matched_delete=F.col("s.op") == "D",
        matched_update={"o_totalprice": F.col("s.new_price")},
        matched_update_cond=(F.col("s.op") == "U")
        & (F.col("s.new_price") > F.col("t.o_totalprice")),
        not_matched_insert={
            "o_orderkey": F.col("s.key"),
            "o_totalprice": F.col("s.new_price"),
            "o_orderstatus": F.col("s.new_status"),
        },
        not_matched_insert_cond=F.col("s.op") != "D",
    )
    return merged.select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        "o_orderstatus",
    )


# Matched rows (%7<>0): price+10 only when op='U' (%3==0) AND the new
# price is higher (%9<>0 — the %9==0 decrease is skipped by the
# conditional clause). Source-only rows (%7==0) insert the source
# price verbatim: -20 when %9==0, +10 otherwise. Deletes (%5==0)
# vanish from both branches.
CDC_MERGE_INTO_SQL = """
SELECT o_orderkey,
       CAST(CASE
         WHEN o_orderkey % 7 <> 0 THEN
           CASE WHEN o_orderkey % 3 = 0 AND o_orderkey % 9 <> 0
                THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 10 AS DECIMAL(12,2))
                ELSE CAST(o_totalprice AS DECIMAL(12,2)) END
         ELSE
           CASE WHEN o_orderkey % 9 = 0
                THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) - 20 AS DECIMAL(12,2))
                ELSE CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 10 AS DECIMAL(12,2)) END
       END AS DOUBLE) AS o_totalprice,
       o_orderstatus
FROM orders
WHERE o_orderkey % 5 <> 0
"""


QUERIES = {
    "cdc_merge_into": cdc_merge_into,
}

ORACLE = {
    "cdc_merge_into": CDC_MERGE_INTO_SQL,
}


def cdc_partial_update_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-column (patch) update application — the sparse-image
    case Debezium emits for incremental snapshots and column-filtered
    topics (the reference's Maxwell rows are always full-image;
    ``RowCache.java`` applies them whole — studied, not copied): a
    patch row carries the PK plus ONLY the changed columns, NULL
    meaning "keep the current value". Applied through the same
    ``merge_into`` operator with COALESCE(update, target) per column,
    so missing fields pass through — one PK-hash shuffle, AQE
    skew-split at 100 TB, identical to the full-image path.
    """
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        "o_orderkey",
        F.col("o_totalprice").cast(_DEC).alias("price"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderpriority").alias("priority"),
    )
    k = F.col("o_orderkey")
    # deterministic sparse patches: each touches a different column set
    patches = o.where(k % 4 != 3).select(
        k.alias("key"),
        F.when(k % 4 == 0, (F.col("o_totalprice").cast(_DEC) + 5).cast(_DEC)).alias(
            "p_price"
        ),
        F.when(k % 4 == 1, F.lit("9-PATCHED")).alias("p_priority"),
        F.when(k % 4 == 2, F.lit("P")).alias("p_status"),
    )
    merged = merge_into(
        base,
        patches,
        base_key_cols=("o_orderkey",),
        source_key_cols=("key",),
        matched_update={
            "price": F.coalesce(F.col("s.p_price"), F.col("t.price")),
            "status": F.coalesce(F.col("s.p_status"), F.col("t.status")),
            "priority": F.coalesce(F.col("s.p_priority"), F.col("t.priority")),
        },
    )
    return merged.select(
        "o_orderkey",
        F.col("price").cast("double").alias("price"),
        "status",
        "priority",
    ).orderBy("o_orderkey")


PARTIAL_UPDATE_SQL = """
WITH patches AS (
  SELECT o_orderkey AS key,
         CASE WHEN o_orderkey % 4 = 0
              THEN CAST(CAST(o_totalprice AS DECIMAL(12,2)) + 5 AS DECIMAL(12,2)) END AS p_price,
         CASE WHEN o_orderkey % 4 = 1 THEN '9-PATCHED' END AS p_priority,
         CASE WHEN o_orderkey % 4 = 2 THEN 'P' END AS p_status
  FROM orders WHERE o_orderkey % 4 <> 3
)
SELECT o.o_orderkey,
       CAST(COALESCE(p.p_price, CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS price,
       COALESCE(p.p_status, o.o_orderstatus) AS status,
       COALESCE(p.p_priority, o.o_orderpriority) AS priority
FROM orders o LEFT JOIN patches p ON o.o_orderkey = p.key
ORDER BY o.o_orderkey
"""

QUERIES["cdc_partial_update_merge"] = cdc_partial_update_merge
ORACLE["cdc_partial_update_merge"] = PARTIAL_UPDATE_SQL
