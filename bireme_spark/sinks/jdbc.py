"""JDBC DELETE+COPY merge sink — the Spark twin of bireme's
ChangeLoader (``ChangeLoader.java:206-290`` executeTask: load the
delete set, then the insert set; ``:359`` the DELETE..WHERE EXISTS
against a staged key table; ``:460`` the ON COMMIT DELETE ROWS
temporary table).

Flow per micro-batch (from ``foreachBatch``), per target table:

1. ``df.write.jdbc`` the compacted batch into a staging table —
   Spark's parallel JDBC writer is the COPY: every partition opens
   its own connection and streams batched inserts, so load
   parallelism scales with the cluster, not one loader thread pool
   (bireme caps at loader_conn_size connections; here the executor
   count is the cap).
2. One driver-side transaction applies the merge:
   ``DELETE FROM target WHERE EXISTS (staged keys)`` then
   ``INSERT INTO target SELECT payload FROM staging WHERE op <> 'D'``,
   then drops the staging table. Keys-only SQL — the row payload
   never moves through the driver.

The SQL builders are pure functions (unit-tested without a DB); the
executor needs a JDBC driver jar on the Spark classpath and is
exercised against a live warehouse only.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def _qident(name: str) -> str:
    """Quote an SQL identifier (ANSI double-quote, doubled quotes)."""
    parts = name.split(".")
    return ".".join('"' + p.replace('"', '""') + '"' for p in parts)


def staging_table_name(target_table: str, batch_id: int) -> str:
    """Per-batch staging table (bireme reuses one temp table per
    connection; a batch-suffixed name keeps concurrent pipelines and
    retries from colliding — idempotent re-runs drop it first)."""
    return f"{target_table.replace('.', '__')}__stage_{batch_id}"


def delete_sql(target_table: str, staging_table: str, key_cols: Sequence[str]) -> str:
    """``DELETE FROM target WHERE EXISTS (SELECT 1 FROM staging ...)``
    — the exact merge-delete shape of ``ChangeLoader.java:359``, with
    the staging table carrying BOTH delete-keys and upsert-keys (an
    upsert is delete+insert, ``executeTask:212-229``)."""
    # The staging table was created UNQUOTED by Spark's JDBC writer
    # (df.write.jdbc passes dbtable through raw), so every dialect
    # case-folds it the same way on reference — quoting it here would
    # mismatch Derby (upper-fold) vs Postgres (lower-fold). Its name
    # is internally generated ([a-z0-9_]), never user input.
    on = " AND ".join(
        f"{_qident(target_table)}.{_qident(k)} = {staging_table}.{_qident(k)}"
        for k in key_cols
    )
    return (
        f"DELETE FROM {_qident(target_table)} WHERE EXISTS "
        f"(SELECT 1 FROM {staging_table} WHERE {on})"
    )


def insert_sql(
    target_table: str,
    staging_table: str,
    payload_cols: Sequence[str],
    op_col: str = "op",
) -> str:
    """Insert the surviving (non-delete) staged rows into the target."""
    cols = ", ".join(_qident(c) for c in payload_cols)
    return (
        f"INSERT INTO {_qident(target_table)} ({cols}) "
        f"SELECT {cols} FROM {staging_table} "
        f"WHERE {_qident(op_col)} <> 'D'"
    )


def drop_sql(staging_table: str, if_exists: bool = True) -> str:
    # Derby has no DROP TABLE IF EXISTS; the sink passes if_exists
    # per-dialect (the staging table always exists at this point in
    # the transaction, so plain DROP is safe there).
    opt = "IF EXISTS " if if_exists else ""
    return f"DROP TABLE {opt}{staging_table}"


@dataclass
class JdbcMergeSink:
    """foreachBatch-compatible DELETE+COPY merge into a JDBC warehouse.

    ``sink = JdbcMergeSink(url, "public.orders", ("o_orderkey",),
    ("o_orderkey", "o_totalprice"), properties={"user": ...})``
    then ``writeStream.foreachBatch(sink)``.
    """

    url: str
    target_table: str
    key_cols: Sequence[str]
    payload_cols: Sequence[str]
    properties: dict = field(default_factory=dict)
    op_col: str = "op"
    stage_write_mode: str = "overwrite"
    # the reference's optimisticMode (ChangeLoader.java:212-222):
    # insert-only workloads skip the delete scan until the first
    # duplicate-key violation proves a key pre-exists, then the sink
    # flips pessimistic ONCE and stays there (executeTask:274-289).
    optimistic: bool = False

    def merge_statements(self, staging: str, optimistic: bool = False) -> list[str]:
        """The driver-side transaction, in order (pure; testable).
        ``optimistic`` drops the delete phase (insert-only fast path)."""
        delete = (
            []
            if optimistic
            else [delete_sql(self.target_table, staging, self.key_cols)]
        )
        return [
            *delete,
            insert_sql(self.target_table, staging, self.payload_cols, self.op_col),
            drop_sql(staging, if_exists="derby" not in self.url),
        ]

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        staging = staging_table_name(self.target_table, batch_id)
        cols = list(dict.fromkeys([*self.key_cols, *self.payload_cols, self.op_col]))
        (
            batch_df.select(*cols)
            .write.mode(self.stage_write_mode)
            .options(**self.properties)
            .jdbc(self.url, staging)
        )
        spark = batch_df.sparkSession
        try:
            self._execute_transaction(
                spark, self.merge_statements(staging, optimistic=self.optimistic)
            )
        except Exception as exc:
            # Derby 23505 / Postgres 23505 both say "duplicate key
            # value"; the rollback left the staging table in place, so
            # the pessimistic redo reuses it (one-way flip + retry,
            # ChangeLoader.java:283-290 "Chang to passimistic mode").
            if self.optimistic and "duplicate key value" in str(exc):
                self.optimistic = False
                self._execute_transaction(spark, self.merge_statements(staging))
            else:
                raise

    def _execute_transaction(self, spark, statements: Sequence[str]) -> None:
        """Run the merge statements in one JDBC transaction via the
        JVM DriverManager (driver-side, keys-only SQL — no row data)."""
        jvm = spark._sc._jvm
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            props.setProperty(k, str(v))
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            conn.setAutoCommit(False)
            stmt = conn.createStatement()
            for sql in statements:
                stmt.execute(sql)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()


def get_primary_keys(
    spark, url: str, table: str, properties: dict | None = None
) -> list[str]:
    """Primary-key columns of a JDBC table, in key order — the twin of
    the reference's ``GetPrimaryKeys.java:28-95`` (which queries
    ``information_schema`` so users never hand-type key lists). Uses
    JDBC ``DatabaseMetaData.getPrimaryKeys``, which is portable across
    Postgres/Greenplum/Derby; feed the result to ``PipelineConfig`` /
    ``run_cdc_pipeline(key_fields=...)``.

    ``table`` may be schema-qualified. Unquoted identifiers are looked
    up as stored; case-folded variants (Derby upper, Postgres lower)
    are retried automatically."""
    jvm = spark._sc._jvm
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, str(v))
    schema, _, name = table.rpartition(".")
    conn = jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        md = conn.getMetaData()
        for s, t in (
            (schema or None, name),
            ((schema or "").upper() or None, name.upper()),
            ((schema or "").lower() or None, name.lower()),
        ):
            rs = md.getPrimaryKeys(None, s, t)
            keys = []
            while rs.next():
                keys.append((rs.getShort("KEY_SEQ"), rs.getString("COLUMN_NAME")))
            rs.close()
            if keys:
                return [c for _, c in sorted(keys)]
        return []
    finally:
        conn.close()


# ---------------------------------------------------------------------------
# PG COPY fast path (ChangeLoader.java:283-344 copyWorker/getCopySql,
# :458-470 createTemporaryTable) behind the functions/native.py
# import-try seam: psycopg2 when installed, JDBC-writer fallback
# otherwise. The SQL/encoding builders are pure and unit-tested; this
# container ships no psycopg2 and no Postgres, so the live path is
# exercised through a recording fake (tests/test_sinks.py).
# ---------------------------------------------------------------------------


def copy_backend() -> str:
    """'psycopg2' when the native driver is importable, else 'jdbc'
    (same dispatch pattern as functions/native.py: a deploy flips the
    fast path on by ``pip install psycopg2``, zero code changes)."""
    try:
        import psycopg2  # noqa: F401

        return "psycopg2"
    except ImportError:
        return "jdbc"


# psycopg2 connection kwargs that may legally pass through from the
# sink's Spark-JDBC `properties` dict. Everything else (driver,
# createTableColumnTypes, fetchsize, batchsize, isolationLevel, ...)
# is JDBC-writer config psycopg2.connect would reject.
_LIBPQ_KWARGS = frozenset(
    {
        "user",
        "password",
        "host",
        "port",
        "dbname",
        "sslmode",
        "sslrootcert",
        "sslcert",
        "sslkey",
        "connect_timeout",
        "application_name",
        "options",
    }
)

# JDBC-Postgres URL/property names → their libpq kwarg twins
# (https://jdbc.postgresql.org/documentation/use/ — public docs).
_JDBC_TO_LIBPQ = {
    "connectTimeout": "connect_timeout",
    "ApplicationName": "application_name",
    "applicationName": "application_name",
}


def libpq_connect_kwargs(url: str, properties: dict | None = None) -> dict:
    """Translate the sink's Spark-JDBC (url, properties) pair into
    psycopg2.connect kwargs, so ONE config drives both the COPY fast
    path and the JDBC fallback (r8 ADVICE: a working JDBC config uses
    a ``jdbc:postgresql://host:port/db`` URL and JDBC-only properties
    that psycopg2.connect rejects — passing them through verbatim
    would fail at connect time on every real deployment).

    Handles ``jdbc:postgresql://host[:port]/db[?k=v&...]``,
    ``jdbc:postgresql:db`` (localhost shorthand), and plain libpq
    URIs (``postgresql://...`` — psycopg2 takes them as dsn, only the
    whitelisted property kwargs ride along). JDBC-only keys are
    dropped; ``ssl=true`` maps to ``sslmode=require``; JDBC spellings
    (connectTimeout, ApplicationName) map to their libpq names."""
    from urllib.parse import parse_qsl, urlsplit

    kwargs: dict = {}
    raw = url.strip()
    if raw.startswith("jdbc:"):
        raw = raw[len("jdbc:"):]
    if raw.startswith(("postgresql:", "postgres:")) and "//" not in raw:
        # jdbc:postgresql:dbname — localhost shorthand
        kwargs["dbname"] = raw.split(":", 1)[1].split("?", 1)[0]
        query = raw.split("?", 1)[1] if "?" in raw else ""
    elif raw.startswith(("postgresql://", "postgres://")):
        parts = urlsplit(raw)
        if parts.hostname:
            kwargs["host"] = parts.hostname
        if parts.port:
            kwargs["port"] = parts.port
        if parts.username:
            kwargs["user"] = parts.username
        if parts.password:
            kwargs["password"] = parts.password
        db = parts.path.lstrip("/")
        if db:
            kwargs["dbname"] = db
        query = parts.query
    else:
        # not a recognizable postgres URL: hand it to psycopg2 as-is
        # (libpq key=value DSNs land here) with whitelisted kwargs
        kwargs["dsn"] = raw
        query = ""

    merged = dict(parse_qsl(query))
    merged.update(properties or {})
    for k, v in merged.items():
        k = _JDBC_TO_LIBPQ.get(k, k)
        if k == "ssl" and str(v).lower() in ("true", "1"):
            kwargs.setdefault("sslmode", "require")
        elif k in _LIBPQ_KWARGS:
            kwargs[k] = v
    return kwargs


def copy_sql(table: str, columns: Sequence[str]) -> str:
    """The reference's COPY statement, byte-for-byte
    (``ChangeLoader.java:334-344`` getCopySql): pipe delimiter, empty
    string as NULL, CSV quoting with backslash escape."""
    cols = ",".join(columns)
    return (
        f"COPY {table} ({cols}) FROM STDIN "
        "WITH DELIMITER '|' NULL '' CSV QUOTE '\"' ESCAPE E'\\\\';"
    )


def copy_encode_row(values: Sequence) -> str:
    """One COPY CSV line under the reference's options (the
    ``tupleWriter`` twin, ``ChangeLoader.java:311-316``):

    - ``None`` → the empty unquoted field (NULL '');
    - the empty STRING must be quoted ``""`` to stay distinct from
      NULL;
    - fields containing the delimiter, quote, escape, CR or LF are
      quoted, with ``\\`` before quote/backslash (ESCAPE E'\\\\');
    - everything else passes through verbatim (no float reformatting
      — callers format values; bools map to Postgres t/f)."""
    out = []
    for v in values:
        if v is None:
            out.append("")
            continue
        if isinstance(v, bool):
            out.append("t" if v else "f")
            continue
        s = str(v)
        if s == "" or any(c in s for c in ('|', '"', "\\", "\n", "\r")):
            s = '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
        out.append(s)
    return "|".join(out) + "\n"


def temp_key_table_sql(target_table: str, key_cols: Sequence[str]) -> str:
    """Session-temporary key table for the merge-delete
    (``ChangeLoader.java:458-470`` createTemporaryTable — ON COMMIT
    DELETE ROWS so retries inside one connection start clean). Keys
    only: the staged shape is the key projection of the target, not
    SELECT * — the delete never needs payload bytes."""
    cols = ", ".join(_qident(k) for k in key_cols)
    return (
        f"CREATE TEMP TABLE {copy_temp_table_name(target_table)} "
        f"ON COMMIT DELETE ROWS AS SELECT {cols} "
        f"FROM {_qident(target_table)} LIMIT 0"
    )


def copy_temp_table_name(target_table: str) -> str:
    """``getTemporaryTableName``: dots fold to underscores."""
    return target_table.replace(".", "_") + "_keys"


@dataclass
class CopyMergeSink(JdbcMergeSink):
    """DELETE+COPY merge through the native Postgres/Greenplum COPY
    protocol — the reference's actual load path (one loader
    connection per table, ``copyWorker`` streaming tuples through a
    pipe), vs the base class's staging-table merge through Spark's
    JDBC writer.

    Per micro-batch, one psycopg2 transaction:

    1. ``CREATE TEMP TABLE <target>_keys ON COMMIT DELETE ROWS`` —
       the reference's temp table, keys-only;
    2. COPY every batch key into it and ``DELETE FROM target WHERE
       EXISTS`` (``executeDelete``/``deleteWorker``) — skipped in
       optimistic mode, exactly the reference's optimisticMode:
       insert-only workloads never pay the delete scan;
    3. COPY the surviving (non-delete) payload rows straight into the
       TARGET (no staging table on this path — ``executeInsert``);
    4. on a duplicate-key failure in optimistic mode: rollback, flip
       to pessimistic, redo delete+insert (``executeTask:274-289``
       "Chang to passimistic mode"), and STAY pessimistic for later
       batches (the reference flips the flag once).

    The batch streams through the driver connection exactly like the
    reference's single loader thread — appropriate because the input
    is the COMPACTED changelog (one row per key per batch), not raw
    events. The Spark-parallel alternative stays available as the
    base class. Falls back to the base class automatically when
    psycopg2 is absent (``copy_backend() == 'jdbc'``), which keeps
    Derby/test deployments working unchanged (``optimistic`` and its
    one-way flip are inherited — both paths share the semantics)."""

    def copy_statements(self) -> dict:
        """The pure plan (testable without a DB): statement strings
        keyed by step."""
        keys_tbl = copy_temp_table_name(self.target_table)
        payload = list(self.payload_cols)
        return {
            "create_keys": temp_key_table_sql(self.target_table, self.key_cols),
            "copy_keys": copy_sql(keys_tbl, [str(k) for k in self.key_cols]),
            "delete": delete_sql(self.target_table, keys_tbl, self.key_cols),
            "copy_target": copy_sql(self.target_table, payload),
        }

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if copy_backend() != "psycopg2":
            # Derby-safe / driverless fallback: the staging-table
            # merge via Spark's JDBC writer (same semantics).
            JdbcMergeSink.__call__(self, batch_df, batch_id)
            return
        if batch_df.isEmpty():
            return
        import io

        import psycopg2

        plan = self.copy_statements()
        key_cols = list(self.key_cols)
        payload = list(self.payload_cols)
        cols = list(dict.fromkeys([*key_cols, *payload, self.op_col]))
        rows = [r.asDict() for r in batch_df.select(*cols).toLocalIterator()]
        keys_buf = io.StringIO()
        ins_buf = io.StringIO()
        for r in rows:
            keys_buf.write(copy_encode_row([r[k] for k in key_cols]))
            if r[self.op_col] != "D":
                ins_buf.write(copy_encode_row([r[c] for c in payload]))
        # the SAME url/properties drive the JDBC fallback, so they
        # arrive in Spark-JDBC shape — translate before connecting
        dsn_kwargs = libpq_connect_kwargs(self.url, self.properties)
        conn = psycopg2.connect(dsn_kwargs.pop("dsn", None), **dsn_kwargs)
        try:
            conn.autocommit = False
            cur = conn.cursor()
            try:
                if not self.optimistic:
                    self._delete_phase(cur, plan, keys_buf)
                ins_buf.seek(0)
                cur.copy_expert(plan["copy_target"], ins_buf)
                conn.commit()
            except Exception as exc:
                conn.rollback()
                if self.optimistic and "duplicate key value" in str(exc):
                    # the reference's one-way optimistic→pessimistic flip
                    self.optimistic = False
                    cur = conn.cursor()
                    self._delete_phase(cur, plan, keys_buf)
                    ins_buf.seek(0)
                    cur.copy_expert(plan["copy_target"], ins_buf)
                    conn.commit()
                else:
                    raise
        finally:
            conn.close()

    def _delete_phase(self, cur, plan: dict, keys_buf) -> None:
        cur.execute(plan["create_keys"])
        keys_buf.seek(0)
        cur.copy_expert(plan["copy_keys"], keys_buf)
        cur.execute(plan["delete"])
