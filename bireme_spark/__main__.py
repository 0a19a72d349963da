"""CLI entry point: run any registry operator (or ad-hoc SQL) from
the shell — the closest analogue of the reference's ``sbin/bireme``
launcher for a batch engine.

    python -m bireme_spark list
    python -m bireme_spark run q1_pricing_summary --sf-dir /root/testdata/sf0.01
    python -m bireme_spark sql "SELECT COUNT(*) AS n FROM lineitem" --sf-dir ...
    python -m bireme_spark oracle q1_pricing_summary   # print the SQL twin
    python -m bireme_spark serve --config etc/config.properties   # CDC sync daemon
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="bireme_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list every registered operator/query")

    p_run = sub.add_parser("run", help="run a registry query and print rows")
    p_run.add_argument("name")
    p_run.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p_run.add_argument("--limit", type=int, default=20)

    p_sql = sub.add_parser("sql", help="run ad-hoc SQL over the base tables")
    p_sql.add_argument("text")
    p_sql.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    p_sql.add_argument("--limit", type=int, default=20)

    p_or = sub.add_parser("oracle", help="print a query's ANSI-SQL oracle twin")
    p_or.add_argument("name")

    p_srv = sub.add_parser(
        "serve", help="run the CDC sync daemon (config.properties lifecycle)"
    )
    p_srv.add_argument("--config", required=True, help="path to config.properties")
    p_srv.add_argument(
        "--available-now", action="store_true", help="drain one sync pass, then exit"
    )
    p_srv.add_argument(
        "--timeout", type=float, default=None, help="stop gracefully after N seconds"
    )

    args = ap.parse_args(argv)

    if args.cmd == "serve":
        from bireme_spark.serve import serve

        return serve(args.config, available_now=args.available_now, timeout=args.timeout)

    if args.cmd == "list":
        from bireme_spark import registry

        oracles = registry.oracle_sql()
        for name in sorted(registry.queries()):
            tag = "" if name in oracles else "  (rows-only)"
            print(f"{name}{tag}")
        return 0

    if args.cmd == "oracle":
        from bireme_spark import registry

        sql = registry.oracle_sql().get(args.name)
        if sql is None:
            print(f"{args.name}: rows-only (no SQL oracle)", file=sys.stderr)
            return 1
        print(sql.strip())
        return 0

    from bireme_spark.api import Engine

    eng = Engine.local(args.sf_dir)
    df = eng.query(args.name) if args.cmd == "run" else eng.sql(args.text)
    df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
