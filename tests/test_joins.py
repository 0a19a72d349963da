"""salted_join: result equivalence with the plain join + actual
key-spreading behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bireme_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def frames(spark):
    # skewed fact: user 1 owns 80% of rows
    rows = [(1, i, "click" if i % 3 else "buy") for i in range(80)]
    rows += [(u, 100 + u, "click") for u in range(2, 22)]
    fact = spark.createDataFrame(rows, "user_id int, event_id int, event_type string")
    dim = spark.createDataFrame(
        [(u, f"seg{u % 3}") for u in range(1, 22)], "user_id int, segment string"
    )
    return fact, dim


def test_salted_join_equals_plain_join(spark, frames):
    fact, dim = frames
    plain = fact.join(dim, "user_id").orderBy("event_id").collect()
    salted = salted_join(fact, dim, ["user_id"], n_salts=8).orderBy("event_id").collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_salted_join_left_outer(spark, frames):
    fact, dim = frames
    dim_missing = dim.where(F.col("user_id") != 1)  # hot key unmatched
    plain = fact.join(dim_missing, "user_id", "left").collect()
    salted = salted_join(fact, dim_missing, ["user_id"], n_salts=4, how="left").collect()
    assert sorted(map(tuple, salted)) == sorted(map(tuple, plain))


def test_salt_actually_spreads_hot_key(spark, frames):
    fact, _ = frames
    n_salts = 8
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    spread = (
        fact.where(F.col("user_id") == 1)
        .select(salt.alias("s"))
        .distinct()
        .count()
    )
    # 80 rows across 8 salts: all (or nearly all) buckets hit
    assert spread >= 6


def test_salt_is_deterministic(spark, frames):
    fact, dim = frames
    a = salted_join(fact, dim, ["user_id"]).orderBy("event_id", "segment").collect()
    b = salted_join(fact, dim, ["user_id"]).orderBy("event_id", "segment").collect()
    assert a == b


class TestAsofDirectional:
    """asof_join_directional ≡ pandas.merge_asof on randomized frames
    (float timestamps → ties measure-zero, so tie-rule differences
    can't blur the comparison), across all three directions with and
    without tolerance."""

    def _frames(self, seed):
        import random

        rng = random.Random(seed)
        left = [
            (k, round(rng.random() * 100, 6))
            for k in ("a", "b", "c")
            for _ in range(25)
        ]
        right = [
            (k, round(rng.random() * 100, 6), rng.randrange(1000))
            for k in ("a", "b", "c")
            for _ in range(20)
        ]
        return left, right

    def test_matches_pandas_merge_asof(self, spark):
        import pandas as pd

        from bireme_spark.operators.windows import asof_join_directional

        left, right = self._frames(11)
        ldf = spark.createDataFrame(left, "k string, lt double")
        rdf = spark.createDataFrame(right, "k string, rt double, v long")
        lp = pd.DataFrame(left, columns=["k", "lt"]).sort_values("lt")
        rp = pd.DataFrame(right, columns=["k", "rt", "v"]).sort_values("rt")
        for direction in ("backward", "forward", "nearest"):
            for tol in (None, 7.5):
                got = {
                    (r.k, r.lt): r.v
                    for r in asof_join_directional(
                        ldf, rdf, "k", "lt", "rt", ("v",),
                        direction=direction, tolerance_seconds=tol,
                    ).collect()
                }
                want_df = pd.merge_asof(
                    lp, rp, left_on="lt", right_on="rt", by="k",
                    direction=direction,
                    tolerance=tol,
                )
                want = {
                    (r.k, r.lt): (None if pd.isna(r.v) else int(r.v))
                    for r in want_df.itertuples()
                }
                assert got == want, (direction, tol)

    def test_bad_direction_raises(self, spark):
        import pytest

        from bireme_spark.operators.windows import asof_join_directional

        ldf = spark.createDataFrame([("a", 1.0)], "k string, lt double")
        with pytest.raises(ValueError, match="direction"):
            asof_join_directional(ldf, ldf, "k", "lt", "lt", (), direction="sideways")


def test_skyline_matches_bruteforce_dominance_definition(spark, sf_dir):
    """The registered skyline uses the sort+range-frame sweep (and its
    oracle the same formulation) — this pins it to the QUADRATIC
    textbook definition: no other part is >= on both axes and
    strictly better on one."""
    import duckdb

    from bireme_spark.queries.relational import parts_skyline_pareto

    got = [(r.p_partkey, r.price, r.size) for r in parts_skyline_pareto(spark, sf_dir).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'"
    )
    want = con.execute(
        """
        WITH p AS (
          SELECT p_partkey, CAST(p_retailprice AS DECIMAL(12,2)) AS price, p_size AS size
          FROM part
        )
        SELECT a.p_partkey, CAST(a.price AS DOUBLE), a.size
        FROM p a
        WHERE NOT EXISTS (
          SELECT 1 FROM p b
          WHERE b.price <= a.price AND b.size >= a.size
            AND (b.price < a.price OR b.size > a.size)
        )
        ORDER BY a.price, a.p_partkey
        """
    ).fetchall()
    assert got == [tuple(r) for r in want]
