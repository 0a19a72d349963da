"""Plan-audit: flag registered queries whose PHYSICAL plan scans the
same parquet table more than once (duplicated lineage — the class of
flaw VERDICT r5 found in embedding_power_iteration). Run at sf0.001;
plan-only, but eager builders (sink gates) will execute their setup.

Multi-scan is not automatically wrong: self-joins (wedge builds),
unions of differently-projected filtered scans, and exchange-reused
subtrees can all be the A/B-measured winner. Use this to find
CANDIDATES, then A/B a localCheckpoint of the collapsed intermediate
per CLAUDE.md (persist is never an automatic win).

Usage: python scripts/scan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bireme_spark import registry
from bireme_spark.session import get_spark


def main() -> int:
    spark = get_spark("scan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    flagged = 0
    for name, fn in registry.queries().items():
        if name in registry._SLOW:
            continue
        try:
            df = fn(spark, sf)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # keep auditing past one bad query
            print(f"{name}: ERR {str(e)[:80]}")
            continue
        tables = re.findall(
            r"FileScan parquet \[[^\]]*\][^\n]*?([a-z_0-9]+)\.parquet", plan
        )
        dups = {t: n for t, n in Counter(tables).items() if n > 1}
        if dups:
            flagged += 1
            print(f"{name}: MULTI {dups}")
    print(f"total flagged: {flagged}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
