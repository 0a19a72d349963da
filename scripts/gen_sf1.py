"""Generate a deterministic ~sf1.0 tier by FK-consistent key-offset
replication of the driver's sf0.1 parquet (REP copies; key columns
shifted by copy_index * stride; values and dates untouched, so both
engines see identical data and only MAGNITUDE grows ~10×).

Purpose: the numeric-boundary spot gate (VERDICT r7 item 4). Two
engine-divergence classes only appeared at sf0.1 (2^53 scale-adjusted
DECIMAL→DOUBLE, ROUND ties on exact rationals, transcendental ulp);
the next class scales with data, so the iterative/numeric queries get
one compare at 10× before a real cluster ever sees them.

Output: /root/repo/testdata_sf1/ (gitignored — ~1 GB of derived
parquet; regenerate with `python scripts/gen_sf1.py`).
"""

from __future__ import annotations

import os
import pathlib
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = str(pathlib.Path(__file__).resolve().parent.parent / "testdata_sf1")
REP = 10

# table -> {key_col: stride}; strides exceed each key's sf0.1 max so
# replica ranges never collide, and FK pairs share one stride so
# joins stay consistent across replicas.
OFFSETS: dict[str, dict[str, int]] = {
    "region": {},
    "nation": {},
    "customer": {"c_custkey": 1_000_000},
    "supplier": {"s_suppkey": 100_000},
    "part": {"p_partkey": 1_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "lineitem": {
        "l_orderkey": 10_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 100_000,
    },
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    # several registry queries synthesize derived ids at +1_000_000
    # (short docs, planted batch docs) — the replication stride must
    # clear that space or replica ids collide with synthetic ids
    # (r8: replica-1 doc X == short-of-doc-X, a fixture artifact that
    # looked like an engine mismatch)
    "documents": {"doc_id": 100_000_000},
    "embeddings": {"vec_id": 100_000_000},
}


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    for table, keys in OFFSETS.items():
        src = f"{SRC}/{table}.parquet"
        dst = f"{DST}/{table}.parquet"
        if os.path.exists(dst):
            print(f"{table}: exists, skipping", file=sys.stderr)
            continue
        if not keys:  # fixed dims: one copy
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)"
            )
            print(f"{table}: copied as-is", file=sys.stderr)
            continue
        cols = [
            r[0]
            for r in con.execute(f"DESCRIBE SELECT * FROM '{src}'").fetchall()
        ]
        parts = []
        for i in range(REP):
            sel = ", ".join(
                f"({c} + {i * keys[c]}) AS {c}" if c in keys else c for c in cols
            )
            parts.append(f"SELECT {sel} FROM '{src}'")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{dst}' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 262144)"
        )
        n = con.execute(f"SELECT count(*) FROM '{dst}'").fetchone()[0]
        print(f"{table}: {n} rows x{REP}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
