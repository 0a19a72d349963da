"""Facade tests: the Engine object is the product surface a user
switching from the reference daemon actually touches."""

from __future__ import annotations

import pytest

from bireme_spark.api import Engine


@pytest.fixture()
def eng(spark, sf_dir):
    return Engine(spark, sf_dir)


def test_tables_and_table_load(eng):
    assert "lineitem" in eng.tables()
    assert eng.table("nation").count() == 25
    with pytest.raises(KeyError):
        eng.table("nope")


def test_query_dispatch_matches_registry(eng):
    names = eng.queries()
    assert "q1_pricing_summary" in names and len(names) >= 170
    df = eng.query("q6_forecast_revenue")
    assert df.columns == ["revenue"]
    with pytest.raises(KeyError):
        eng.query("nope")


def test_adhoc_sql_over_registered_views(eng):
    n = eng.sql("SELECT COUNT(*) AS n FROM orders").collect()[0].n
    assert n == eng.table("orders").count()


def test_oracle_lookup(eng):
    assert "SUM" in eng.oracle_sql("q6_forecast_revenue")
    assert eng.oracle_sql("dedup_minhash_lsh") is None  # rows-only


def test_cli_list_and_oracle(capsys):
    from bireme_spark.__main__ import main

    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "q1_pricing_summary" in out and "(rows-only)" in out
    assert main(["oracle", "q6_forecast_revenue"]) == 0
    assert "SELECT" in capsys.readouterr().out
    assert main(["oracle", "dedup_minhash_lsh"]) == 1
