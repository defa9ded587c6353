"""Developer loop: run every registered query against its DuckDB oracle.

Usage: python scripts/check_parity.py [sf_dir] [name_filter...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moonlink_spark.operators import all_queries
from moonlink_spark.session import get_spark
from moonlink_spark.testing import compare, duckdb_conn


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    name_filters = sys.argv[2:]
    specs = all_queries()
    if name_filters:
        specs = {
            k: v for k, v in specs.items() if any(f in k for f in name_filters)
        }
    spark = get_spark("parity-check", master="local[8]")
    con = duckdb_conn(sf_dir)
    failed = []
    for name, spec in sorted(specs.items()):
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"  {name:45s} rows-only ({n} rows) {time.time()-t0:5.1f}s")
                continue
            r = compare(df, con, spec.oracle)
            ok = r["count_match"] and r["schema_match"] and r["value_match"]
            flag = "OK " if ok else "FAIL"
            print(
                f"{flag} {name:45s} rows={r['rows_spark']}/{r['rows_oracle']} "
                f"schema={r['schema_match']} values={r['value_match']} "
                f"{time.time()-t0:5.1f}s"
            )
            if not ok:
                failed.append(name)
                if not r["schema_match"]:
                    print(f"     spark cols:  {r['cols_spark']}")
                    print(f"     oracle cols: {r['cols_oracle']}")
                for a, b in r.get("first_diffs", []):
                    print(f"     spark:  {a}")
                    print(f"     oracle: {b}")
        except Exception as e:
            failed.append(name)
            print(f"ERR  {name:45s} {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{len(specs) - len(failed)}/{len(specs)} queries match")
    if failed:
        print("failed:", failed)
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
