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


class TestSketchRollup:
    def test_merged_daily_equals_direct_weekly(self, spark, sf_dir):
        # sketch-union associativity: merging daily registers must give
        # the same estimate as sketching the week directly
        from pyspark.sql import functions as F

        from bireme_spark.sources.tables import load_table

        e = load_table(spark, sf_dir, "events")
        daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
            F.hll_sketch_agg("user_id", F.lit(12)).alias("sk")
        )
        wk = F.date_trunc("week", "day").cast("date").alias("week_start")
        merged = daily.groupBy("event_type", wk).agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
        )
        direct = e.groupBy(
            "event_type",
            F.date_trunc("week", F.to_date("ts")).cast("date").alias("week_start"),
        ).agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12))).alias("est"))
        m = {(r.event_type, r.week_start): r.est for r in merged.collect()}
        d = {(r.event_type, r.week_start): r.est for r in direct.collect()}
        assert m == d

    def test_rollup_estimates_near_exact(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from bireme_spark.queries.events import events_sketch_rollup
        from bireme_spark.sources.tables import load_table

        est = {
            (r.event_type, r.week_start): r.approx_users
            for r in events_sketch_rollup(spark, sf_dir).collect()
        }
        e = load_table(spark, sf_dir, "events")
        exact = {
            (r.event_type, r.week_start): r.n
            for r in e.groupBy(
                "event_type",
                F.date_format(
                    F.date_trunc("week", F.to_date("ts")).cast("date"), "yyyy-MM-dd"
                ).alias("week_start"),
            )
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert set(est) == set(exact)
        for k, n in exact.items():
            # lgK=12 ⇒ rsd ≈ 1.6%; allow 5% + small-count slack
            assert abs(est[k] - n) <= max(3, 0.05 * n), (k, est[k], n)

    def test_streaming_state_equals_batch_rollup(self, spark, sf_dir):
        # incremental foreachBatch sketch state must reproduce the
        # one-shot batch rollup EXACTLY (union associativity across
        # micro-batch boundaries)
        from bireme_spark.queries.events import events_sketch_rollup
        from bireme_spark.queries.streaming_sessions import streaming_sketch_rollup

        batch = [tuple(r) for r in events_sketch_rollup(spark, sf_dir).collect()]
        stream = [tuple(r) for r in streaming_sketch_rollup(spark, sf_dir).collect()]
        assert stream == batch
