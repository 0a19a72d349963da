"""Table-level sync-verification checksum — the Spark twin of the
reference's ``bireme_tpcc_test/sqlCheckSum.py`` / ``compare.py``
(source/target table comparison after a sync run).

The reference streams rows ORDER BY key through one cursor into a
running md5 — inherently single-node. The Spark-first form is
order-INSENSITIVE so it distributes: per-row md5 over the
name-sorted, canonically-stringified columns, folded with a
commutative modular SUM (count + Σ row_hash mod 2⁶⁴). Partial
aggregation happens map-side; no global sort, no driver streaming —
the same two numbers verify a 100 TB table.

Cross-engine parity: the per-row 64-bit value is the little-endian
integer of md5 digest bytes 8..16 — exactly DuckDB's
``md5_number_lower`` — built in Spark by byte-swapping the md5 hex
tail and ``conv``-ing base 16.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SEP = "\x1f"
_NULL = "\x00<NULL>"
_MOD_64 = "CAST('18446744073709551616' AS DECIMAL(38,0))"


def row_hash64(row_repr: Column) -> Column:
    """Little-endian uint64 of md5 digest bytes 8..16 (md5_number_lower
    twin), as DECIMAL(20,0) — conv() parses the unsigned range."""
    h = F.md5(row_repr)
    le_hex = F.concat(*[F.substring(h, 31 - 2 * i, 2) for i in range(8)])
    return F.conv(le_hex, 16, 10).cast("decimal(20,0)")


def canonical_repr(df: DataFrame) -> Column:
    """Name-sorted columns, cast to string, NULLs marked, joined with
    a separator that cannot appear in the data."""
    cols = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in sorted(df.columns)
    ]
    return F.concat_ws(_SEP, *cols)


def table_checksum(df: DataFrame) -> DataFrame:
    """One row: ``(n_rows BIGINT, checksum STRING)``.

    Caller pre-projects the columns to verify, with any
    engine-ambiguous types (double, timestamp) cast to canonical
    forms (DECIMAL / DATE) — same contract as the reference script,
    which canonicalizes per-type before hashing."""
    num = row_hash64(canonical_repr(df))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(num.cast("decimal(38,0)")) % F.expr(_MOD_64))
        .cast("string")
        .alias("checksum"),
    )


def table_checksum_by_range(
    df: DataFrame, key_col: str, n_buckets: int = 16
) -> DataFrame:
    """Per key-range (n_rows, checksum) — the drift LOCALIZER the
    whole-table checksum can't give: when source and target disagree,
    comparing 16 range checksums narrows the mismatch to 1/16th of
    the key space, and re-running on that range binary-searches a
    100 TB table pair down to the divergent keys in O(log) rounds of
    table-sized (never sorted, never driver-streamed) work.

    Buckets are equal-width over [0, max(key)] (one broadcast scalar
    agg); each bucket folds the same order-insensitive modular md5
    sum as :func:`table_checksum`, map-side combined."""
    num = row_hash64(canonical_repr(df))
    mx = df.agg(F.max(F.col(key_col)).alias("_kmax"))
    bucketed = df.withColumn("_h", num).crossJoin(F.broadcast(mx)).withColumn(
        "_bucket",
        F.expr(
            f"CAST((CAST({key_col} AS BIGINT) * {n_buckets})"
            f" DIV (CAST(_kmax AS BIGINT) + 1) AS INT)"
        ),
    )
    return (
        bucketed.groupBy("_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.sum(F.col("_h").cast("decimal(38,0)")) % F.expr(_MOD_64))
            .cast("string")
            .alias("checksum"),
        )
        .select(F.col("_bucket").alias("bucket"), "n_rows", "checksum")
        .orderBy("bucket")
    )
