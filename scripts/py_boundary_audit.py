"""Python-boundary + plan-smell sweep (optimization guide §4, §3):
for every registered query, inspect the PHYSICAL plan string and flag

- BatchEvalPython   (row-at-a-time pickled UDF — the worst tier)
- ArrowEvalPython / MapInPandas / MapInArrow / FlatMapGroupsInPandas
  (counted, not flagged: the Arrow paths are the sanctioned boundary;
  >1 node of these in one plan suggests an unfused chain)
- CartesianProduct / BroadcastNestedLoopJoin (accidental cross joins)
- duplicate UDF evaluation (same udf name in 2+ Python nodes — the
  guide §4.4 filter-pushdown duplication)

Plan-only at sf0.001. Usage: python scripts/py_boundary_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bireme_spark import registry
from bireme_spark.session import get_spark


def main() -> int:
    spark = get_spark("py-boundary-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_flagged = 0
    for name, fn in registry.queries().items():
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:
            print(f"{name}: ERR {str(e)[:80]}")
            continue
        flags = []
        n_batch = plan.count("BatchEvalPython")
        n_arrow = (
            plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("PythonMapInArrow")
            + plan.count("FlatMapGroupsInPandas")
        )
        if n_batch:
            flags.append(f"BatchEvalPython x{n_batch}")
        if n_arrow > 1:
            flags.append(f"arrow-python nodes x{n_arrow}")
        if "CartesianProduct" in plan:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan:
            flags.append("BroadcastNestedLoopJoin")
        if flags:
            n_flagged += 1
            print(f"{name}: {', '.join(flags)}")
    print(f"flagged: {n_flagged} / {len(registry.queries())}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
