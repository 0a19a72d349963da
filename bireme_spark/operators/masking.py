"""Apply-time column masking: PII rules applied while syncing, so
raw values never land in the warehouse.

The reference's table mapping routes origin tables to target tables
(``MaxwellPipeLine.java:55-71``); production CDC syncs routinely
attach per-column transforms at the same seam (Debezium SMTs, GDPR
pseudonymization). Spark-first: every rule compiles to a codegen
expression in ONE projection — no Python, no extra pass, and the
masked scan pushes down/prunes exactly like the raw one.

Rules (column → spec):

* ``("hash",)``            — md5 hex pseudonym (deterministic, so
                             joins/distinct-counts still work).
* ``("sha256",)``          — sha-256 hex pseudonym.
* ``("null",)``            — suppress entirely.
* ``("band", width)``      — generalize a numeric to its band floor
                             (``floor(x / width) * width``).
* ``("partial", n)``       — keep only the last ``n`` characters,
                             star-padding the prefix to fixed width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _mask_expr(col: Column, spec: tuple) -> Column:
    kind = spec[0]
    if kind == "hash":
        return F.md5(col.cast("string"))
    if kind == "sha256":
        return F.sha2(col.cast("string"), 256)
    if kind == "null":
        return F.lit(None)
    if kind == "band":
        width = spec[1]
        return (F.floor(col / F.lit(width)) * F.lit(width)).cast("double")
    if kind == "partial":
        n = spec[1]
        s = col.cast("string")
        return F.concat(F.lit("*" * 8), F.substring(s, -n, n))
    raise ValueError(f"unknown masking rule: {spec!r}")


def mask_columns(df: DataFrame, rules: dict[str, tuple]) -> DataFrame:
    """Return ``df`` with each ruled column replaced by its masked
    form (same column name); unruled columns pass through."""
    return df.select(
        *[
            _mask_expr(F.col(c), rules[c]).alias(c) if c in rules else F.col(c)
            for c in df.columns
        ]
    )
