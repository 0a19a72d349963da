"""End-to-end Structured Streaming CDC: the streaming pipeline's
final state must equal the batch changelog snapshot (same operators,
same semantics — bireme's LoadTask chain in micro-batches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bireme_spark.queries.streaming import streaming_cdc_pipeline
from bireme_spark.sources.tables import load_table
from bireme_spark.streaming.stats import PipelineStatListener


def test_streaming_equals_batch_snapshot(spark, sf_dir):
    listener = PipelineStatListener()
    spark.streams.addListener(listener)
    try:
        got = {
            (r.o_orderkey, round(r.o_totalprice, 2), r.o_orderstatus)
            for r in streaming_cdc_pipeline(spark, sf_dir).collect()
        }
    finally:
        spark.streams.removeListener(listener)

    o = load_table(spark, sf_dir, "orders").limit(2000)
    expected = {
        (
            r.o_orderkey,
            round(r.o_totalprice + (10.0 if r.o_orderkey % 3 == 0 else 0.0), 2),
            r.o_orderstatus,
        )
        for r in o.collect()
        if r.o_orderkey % 5 != 0
    }
    assert got == expected

    # PipeLineStat twin saw the run
    state = listener.state()["source"]
    assert state, "listener recorded no queries"
    assert sum(s.get("total_rows", 0) for s in state.values()) > 0
