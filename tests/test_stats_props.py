"""Structural invariants of the round-5 statistics queries — the
oracle gate checks values; these pin the mathematical shape (what a
refactor is most likely to silently break)."""

from __future__ import annotations


def test_km_survival_monotone_and_bounded(spark, sf_dir):
    from bireme_spark.queries.relational import customers_survival_km

    rows = customers_survival_km(spark, sf_dir).orderBy("t_days").collect()
    assert rows, "curve must have event steps"
    prev = 1.0
    for r in rows:
        assert 0.0 <= r.survival <= prev + 1e-9  # non-increasing from 1
        assert r.n_events <= r.n_at_risk
        prev = r.survival
    # at-risk counts shrink over time
    risks = [r.n_at_risk for r in rows]
    assert all(a >= b for a, b in zip(risks, risks[1:]))


def test_mann_kendall_tau_bounded(spark, sf_dir):
    from bireme_spark.queries.timeseries import events_mann_kendall

    for r in events_mann_kendall(spark, sf_dir).collect():
        assert -1.0 <= r.tau <= 1.0
        max_s = r.n * (r.n - 1) // 2
        assert -max_s <= r.s <= max_s


def test_runs_test_counts_consistent(spark, sf_dir):
    from bireme_spark.queries.timeseries import orders_runs_test

    r = orders_runs_test(spark, sf_dir).collect()[0]
    assert 1 <= r.n_runs <= r.n_up + r.n_down
    # expected runs is between 1 and n
    assert 1.0 <= r.expected_runs <= r.n_up + r.n_down


def test_migration_matrix_mass_conserved(spark, sf_dir):
    from pyspark.sql import functions as F

    from bireme_spark.queries.relational import customers_value_migration
    from bireme_spark.sources.tables import load_table

    m = customers_value_migration(spark, sf_dir).collect()
    total = sum(r.n_customers for r in m)
    n_cust = (
        load_table(spark, sf_dir, "orders")
        .select(F.countDistinct("o_custkey").alias("n"))
        .collect()[0]
        .n
    )
    assert total == n_cust  # every active customer lands in one cell
    assert all(0 <= r.seg_p0 <= 5 and 0 <= r.seg_p1 <= 5 for r in m)
    assert not any(r.seg_p0 == 0 and r.seg_p1 == 0 for r in m)


def test_zorder_buckets_cover_all_rows(spark, sf_dir):
    from bireme_spark.queries.maintenance import orders_zorder_layout
    from bireme_spark.sources.tables import load_table

    rows = orders_zorder_layout(spark, sf_dir).collect()
    assert sum(r.n_rows for r in rows) == load_table(spark, sf_dir, "orders").count()
    assert all(0 <= r.zbucket <= 15 for r in rows)
    # z-range buckets are date-clustered: bucket date-boxes must be
    # much tighter than the global span on average
    import datetime as dt

    spans = [
        (
            dt.date.fromisoformat(r.max_date) - dt.date.fromisoformat(r.min_date)
        ).days
        for r in rows
    ]
    gmin = min(dt.date.fromisoformat(r.min_date) for r in rows)
    gmax = max(dt.date.fromisoformat(r.max_date) for r in rows)
    assert sum(spans) / len(spans) < 0.8 * (gmax - gmin).days


def test_seasonal_indices_weighted_mean_near_zero(spark, sf_dir):
    from bireme_spark.queries.timeseries import orders_seasonal_decompose

    rows = orders_seasonal_decompose(spark, sf_dir).collect()
    assert len(rows) == 7
    tot_days = sum(r.n_days for r in rows)
    wmean = sum(r.seasonal_index * r.n_days for r in rows) / tot_days
    scale = max(abs(r.seasonal_index) for r in rows) or 1.0
    # centered-MA detrending leaves a near-zero weighted mean
    assert abs(wmean) < 0.2 * scale + 1e-6
