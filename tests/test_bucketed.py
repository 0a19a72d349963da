"""Bucketed co-located join: materialize both fact tables bucketed on
the join key, then verify the sort-merge join AND the downstream
aggregation run with ZERO shuffle exchanges. This is the 100 TB
fact-fact join story — bucketing trades one write-time shuffle for
every subsequent join/agg on that key being a local merge."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from bireme_spark.sources.tables import load_table
from tests.test_plans import _physical_plan


def test_bucketed_join_and_agg_have_no_exchange(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    loc = tempfile.mkdtemp(prefix="bireme_bucketed_")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        (
            o.write.mode("overwrite")
            .option("path", f"{loc}/orders_b")
            .bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .saveAsTable("orders_b")
        )
        (
            li.write.mode("overwrite")
            .option("path", f"{loc}/lineitem_b")
            .bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .saveAsTable("lineitem_b")
        )
        # force the sort-merge path (broadcast would hide the question)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
        j = (
            ob.join(lb, ob.o_orderkey == lb.l_orderkey)
            .groupBy("o_orderkey")
            .agg(F.sum("l_quantity").alias("total_qty"))
        )
        plan = _physical_plan(j)
        assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
        assert "SortMergeJoin" in plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
        shutil.rmtree(loc, ignore_errors=True)


def test_registered_bucketed_query_plan_is_exchange_free(spark, sf_dir):
    """The gate query `bucketed_colocated_join` must keep its promise:
    sort-merge join + per-key agg + top-k with ZERO shuffle exchanges
    (TakeOrderedAndProject collects without a range shuffle)."""
    from bireme_spark.queries.maintenance import bucketed_colocated_join

    df = bucketed_colocated_join(spark, sf_dir)
    plan = _physical_plan(df)
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, f"bucketed gate query still shuffles:\n{plan}"
    assert "TakeOrderedAndProject" in plan, plan
