"""Optimization-round profiling loop: time individual registered queries
in isolation (noop sink, warmed session, bench-identical config) and dump
their formatted plans.

Usage:
  python scripts/profile_queries.py [--sf sf_dir] [--runs N]
      [--plans-dir DIR] [--suffix before|after] name [name ...]

Each query is warmed once at sf0.001 (Catalyst analysis + codegen, same as
bench.py), then timed --runs times at the target sf with the noop sink and
spark.catalog.clearCache() between runs (bench methodology). Prints
min/median per query and writes `<plans-dir>/<name>_<suffix>.txt` with the
`.explain("formatted")` output when --plans-dir is given.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moonlink_spark.operators import all_queries
from moonlink_spark.session import get_spark


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    spark = get_spark("profile-queries")
    specs = all_queries()
    names = []
    for n in args.names:
        if n in specs:
            names.append(n)
        else:
            matches = sorted(k for k in specs if n in k)
            if not matches:
                raise SystemExit(f"no query matches {n!r}")
            names.extend(matches)

    # bench-identical warmup of session machinery
    spark.range(1000).count()

    def _warm_py(batches):
        yield from batches

    spark.range(0, 10_000, 1, 32).mapInPandas(_warm_py, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    results = {}
    for name in names:
        spec = specs[name]
        if not args.no_warm:
            spark.sparkContext.setJobDescription(f"warm:{name}")
            _force(spec.fn(spark, "/root/testdata/sf0.001"))
            spark.catalog.clearCache()
        runs = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"time:{name}#{i}")
            t0 = time.time()
            _force(spec.fn(spark, args.sf))
            runs.append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
        results[name] = {
            "runs": runs,
            "min": min(runs),
            "median": sorted(runs)[len(runs) // 2],
        }
        print(f"{name:45s} min={min(runs):7.3f} runs={runs}", flush=True)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = spec.fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
            spark.catalog.clearCache()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
