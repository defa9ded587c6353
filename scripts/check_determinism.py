"""Determinism guard: run each registered query TWICE and compare
canonicalized results. A query that differs between its own runs (tie
broken by partition order, float reduction drift, uncapped sampling)
would fail the driver's hash gate even with correct semantics — catch it
here first.

Usage: python scripts/check_determinism.py [sf_dir] [name_filter...]
       (default: the PRIORITY_50 gate slots)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moonlink_spark.operators import PRIORITY_50, all_queries
from moonlink_spark.session import get_spark


def canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(str(r[c]) for c in cols) for r in df.select(*cols).collect()]
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    specs = all_queries()
    if filters:
        names = [n for n in specs if any(f in n for f in filters)]
    else:
        names = list(PRIORITY_50)
    spark = get_spark("determinism-check", master="local[8]")
    failed = []
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            r1 = canon(spec.fn(spark, sf_dir))
            spark.catalog.clearCache()
            r2 = canon(spec.fn(spark, sf_dir))
            ok = r1 == r2
            print(
                f"{'OK ' if ok else 'NONDETERMINISTIC'} {name:45s} "
                f"rows={len(r1)}/{len(r2)} {time.time()-t0:5.1f}s",
                flush=True,
            )
            if not ok:
                failed.append(name)
                for a, b in list(zip(r1, r2))[:5]:
                    if a != b:
                        print(f"   run1: {a}\n   run2: {b}")
        except Exception as e:
            failed.append(name)
            print(f"ERR {name:45s} {type(e).__name__}: {str(e)[:200]}")
    print(f"\n{len(names) - len(failed)}/{len(names)} deterministic")
    if failed:
        print("failed:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
