"""JDBC merge-sink SQL generation (the DB-free half of the
ChangeLoader twin; the live-warehouse path needs a JDBC driver jar
and a running Greenplum/Postgres)."""

from __future__ import annotations

from bireme_spark.sinks.jdbc import (
    JdbcMergeSink,
    delete_sql,
    drop_sql,
    insert_sql,
    staging_table_name,
)


def test_staging_name_unique_per_batch():
    assert staging_table_name("public.orders", 7) != staging_table_name("public.orders", 8)
    assert "public__orders" in staging_table_name("public.orders", 7)


def test_delete_sql_composite_key():
    sql = delete_sql("public.t", "t_stage", ("k1", "k2"))
    assert sql == (
        'DELETE FROM "public"."t" WHERE EXISTS '
        '(SELECT 1 FROM "t_stage" WHERE "public"."t"."k1" = "t_stage"."k1" '
        'AND "public"."t"."k2" = "t_stage"."k2")'
    )


def test_insert_sql_excludes_deletes():
    sql = insert_sql("t", "t_stage", ("id", "val"))
    assert sql == (
        'INSERT INTO "t" ("id", "val") SELECT "id", "val" FROM "t_stage" '
        "WHERE \"op\" <> 'D'"
    )


def test_identifier_quoting_resists_injection():
    sql = drop_sql('x"; DROP TABLE users; --')
    assert sql == 'DROP TABLE IF EXISTS "x""; DROP TABLE users; --"'


def test_merge_statement_order():
    sink = JdbcMergeSink(
        url="jdbc:postgresql://db/w",
        target_table="public.orders",
        key_cols=("o_orderkey",),
        payload_cols=("o_orderkey", "o_totalprice"),
    )
    stmts = sink.merge_statements("public__orders__stage_1")
    assert [s.split()[0] for s in stmts] == ["DELETE", "INSERT", "DROP"]
    # upsert = delete-then-insert: the DELETE must come first
    assert "EXISTS" in stmts[0] and "<> 'D'" in stmts[1]
