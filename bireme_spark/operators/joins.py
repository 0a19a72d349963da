"""Skew-safe join strategies.

At 100 TB the killer join is big×big on a key with hot values (a
handful of users/entities owning a large share of the fact rows): a
plain shuffle join sends every row of a hot key to ONE reducer, and
that straggler defines the stage's wall clock. AQE's skew-join split
handles moderate skew after the fact; deterministic salting removes
the hot reducer from the plan outright and is the idiom a pipeline
author reaches for when the skew is known (reference bireme feeds
per-table changelogs whose key distribution mirrors the source DB —
`RowCache.java:158-216` is its single-consumer analog; Spark must
instead spread the key).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "__bireme_salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    keys: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `skewed` (big, hot-keyed) with `other` (one/few rows
    per key, too large to broadcast at scale) on `keys`, spreading
    each hot key over `n_salts` reducers.

    Every skewed-side row gets a deterministic salt in [0, n_salts)
    (xxhash64 of the whole row — stable across retries, unlike
    rand()/monotonically_increasing_id, so task re-execution folds
    identically); the other side is replicated n_salts× with
    explode(sequence(...)). The join key becomes (keys…, salt), so
    rows of one hot key land on n_salts different reducers instead of
    one. Result is exactly the plain join (salt is internal and
    dropped): replication × disjoint salt partition = each matched
    pair appears exactly once.

    Cost model: replication inflates the small side n_salts×, which
    is the price of flattening the straggler; pick n_salts ≈ the
    observed hot-key multiplicity over the average, capped by the
    executor count.
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(n_salts)).cast(
        "int"
    )
    left = skewed.withColumn(_SALT, salt)
    right = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    return left.join(right, [*keys, _SALT], how).drop(_SALT)
