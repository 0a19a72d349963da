"""A/B the WORKING-TREE implementation of queries against the
committed (HEAD or given rev) implementation, monkeypatch-free:
the old module source is exec'd under a private name, and both
variants run interleaved min-of-N in ONE session with a value-hash
equality check per rep (the house three-arm discipline, two arms).

Usage:
    python scripts/ab_code.py [--rev HEAD] [--sf DIR] [--reps 3] \
        [--module bireme_spark/queries/audit.py] name [name ...]
"""

from __future__ import annotations

import hashlib
import importlib.util
import os
import subprocess
import sys
import time
import types

sys.path.insert(0, "/root/repo")


from bireme_spark.util import drop_persisted_blocks as _drop_rdd_blocks  # noqa: E402


def _hash_df(df) -> str:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    rows = sorted([str(v) for v in r] for r in pdf[cols].itertuples(index=False))
    return hashlib.md5(repr(rows).encode()).hexdigest()


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    rev = "HEAD"
    module_path = "bireme_spark/queries/audit.py"
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--reps":
            reps = int(args[i + 1])
            i += 2
        elif args[i] == "--rev":
            rev = args[i + 1]
            i += 2
        elif args[i] == "--module":
            module_path = args[i + 1]
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names:
        print("need query names")
        return 2

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from bireme_spark import registry
    from bireme_spark.session import get_spark

    spark = get_spark("ab-code")
    spark.sparkContext.setLogLevel("ERROR")
    new_qs = registry.queries()

    old_src = subprocess.run(
        ["git", "-C", "/root/repo", "show", f"{rev}:{module_path}"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    old_mod = types.ModuleType("_ab_old_module")
    old_mod.__file__ = f"<{rev}:{module_path}>"
    exec(compile(old_src, old_mod.__file__, "exec"), old_mod.__dict__)
    old_qs = old_mod.QUERIES

    new_qs["q1_pricing_summary"](spark, sf_dir).count()

    walls: dict[tuple[str, str], list[float]] = {}
    hashes: dict[str, set] = {}
    for rep in range(reps):
        for arm, qs in (("old", old_qs), ("new", new_qs)):
            for name in names:
                spark.catalog.clearCache()
                _drop_rdd_blocks(spark)
                t0 = time.perf_counter()
                df = qs[name](spark, sf_dir)
                h = _hash_df(df)
                walls.setdefault((name, arm), []).append(time.perf_counter() - t0)
                hashes.setdefault(name, set()).add(h)
    bad = [n for n, hs in hashes.items() if len(hs) != 1]
    for name in names:
        o = min(walls[(name, "old")])
        n = min(walls[(name, "new")])
        mark = "NEW-WINS" if n < o * 0.95 else ("OLD-WINS" if o < n * 0.95 else "tie")
        eq = "HASH-EQ" if name not in bad else "HASH-DIFF!!!"
        print(
            f"{name}: old={o:.3f} new={n:.3f} {mark} {eq}  "
            f"old reps {[round(x, 2) for x in walls[(name, 'old')]]} "
            f"new reps {[round(x, 2) for x in walls[(name, 'new')]]}"
        )
    if bad:
        print(f"VALUE MISMATCH in: {bad}")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
