"""A/B OPERATOR-module changes: like ab_code.py, but the old arm
execs the HEAD source of one or more operator modules AND the query
module, and installs the old operator modules into sys.modules around
each old-arm invocation (queries use both top-level and local
imports; the swap makes both resolve to the matching arm).

Usage:
    python scripts/ab_op.py [--rev HEAD] [--sf DIR] [--reps 3] \
        --module bireme_spark/queries/dedup.py \
        --ops bireme_spark/operators/dedup.py[,bireme_spark/operators/ann.py] \
        name [name ...]
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import time
import types

sys.path.insert(0, "/root/repo")

from ab_code import _drop_rdd_blocks, _hash_df  # noqa: E402


def _exec_rev(rev: str, path: str, modname: str) -> types.ModuleType:
    src = subprocess.run(
        ["git", "-C", "/root/repo", "show", f"{rev}:{path}"],
        capture_output=True,
        text=True,
        check=True,
    ).stdout
    mod = types.ModuleType(modname)
    mod.__file__ = f"<{rev}:{path}>"
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    rev = "HEAD"
    module_path = "bireme_spark/queries/dedup.py"
    op_paths: list[str] = []
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
        elif args[i] == "--ops":
            op_paths = args[i + 1].split(",")
            i += 2
        else:
            names.append(args[i])
            i += 1
    if not names or not op_paths:
        print("need query names and --ops")
        return 2

    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from bireme_spark import registry
    from bireme_spark.session import get_spark

    spark = get_spark("ab-op")
    spark.sparkContext.setLogLevel("ERROR")
    new_qs = registry.queries()

    import importlib

    op_modnames = [p.replace("/", ".")[: -len(".py")] for p in op_paths]
    new_ops = {mn: importlib.import_module(mn) for mn in op_modnames}
    old_ops = {
        mn: _exec_rev(rev, p, mn) for mn, p in zip(op_modnames, op_paths)
    }
    # exec the old QUERY module while old operator modules are installed,
    # so its top-level `from operators import fn` bind the old functions
    for mn, m in old_ops.items():
        sys.modules[mn] = m
    try:
        old_qmod = _exec_rev(rev, module_path, "_ab_old_qmodule")
    finally:
        for mn, m in new_ops.items():
            sys.modules[mn] = m
    old_qs = old_qmod.QUERIES

    new_qs["q1_pricing_summary"](spark, sf_dir).count()

    walls: dict[tuple[str, str], list[float]] = {}
    hashes: dict[str, set] = {}
    for rep in range(reps):
        for arm, qs, ops in (("old", old_qs, old_ops), ("new", new_qs, new_ops)):
            for mn, m in ops.items():
                sys.modules[mn] = m  # local imports resolve per arm
            try:
                for name in names:
                    spark.catalog.clearCache()
                    _drop_rdd_blocks(spark)
                    t0 = time.perf_counter()
                    df = qs[name](spark, sf_dir)
                    h = _hash_df(df)
                    walls.setdefault((name, arm), []).append(time.perf_counter() - t0)
                    hashes.setdefault(name, set()).add(h)
            finally:
                for mn, m in new_ops.items():
                    sys.modules[mn] = m
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
