"""Error-bound tests for the sketch aggregates (rows-only at the
gate — no cross-engine oracle exists for engine-specific sketches,
so these tests carry the correctness weight)."""

import pytest

from pyspark.sql import functions as F

from bireme_spark.registry import queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def sketch_rows(spark):
    df = queries()["events_approx_sketches"](spark, SF_DIR)
    return {r.event_type: r for r in df.collect()}


@pytest.fixture(scope="module")
def exact_rows(spark):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    df = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("users"),
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.99)").alias("p99"),
    )
    return {r.event_type: r for r in df.collect()}


def test_hll_distinct_within_bound(sketch_rows, exact_rows):
    assert set(sketch_rows) == set(exact_rows)
    for et, ex in exact_rows.items():
        approx = sketch_rows[et].approx_users
        # rsd=0.02 → 3σ ≈ 6%; allow 10% for small-cardinality bias
        assert abs(approx - ex.users) <= max(0.10 * ex.users, 2), et


def test_approx_percentiles_within_rank_error(spark, sketch_rows, exact_rows):
    e = spark.read.parquet(f"{SF_DIR}/events.parquet")
    for et, sk in sketch_rows.items():
        vals = sorted(
            r.value for r in e.where(F.col("event_type") == et).select("value").collect()
        )
        n = len(vals)
        # percentile_approx(accuracy=10000) guarantees rank error
        # ≤ n/10000; small partitions → allow a couple of ranks slack
        for q, got in ((0.5, sk.p50_approx), (0.99, sk.p99_approx)):
            target = int(q * (n - 1))
            slack = max(2, n // 10000 + 1)
            lo = vals[max(0, target - slack)]
            hi = vals[min(n - 1, target + slack)]
            assert lo <= got <= hi, (et, q, got, lo, hi)


def test_exact_count_column_matches(sketch_rows, exact_rows):
    for et, ex in exact_rows.items():
        assert sketch_rows[et].n_events == ex.n_events
