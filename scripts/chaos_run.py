#!/usr/bin/env python
"""Run seeded chaos sequences (chaos_test.rs --seed parity).

Usage:
  python scripts/chaos_run.py [--seed N] [--events M]
      [--option none|upsert|append_only] [--chaos-every K]
      [--key-index] [--alter] [--workdir DIR]

Defaults to a time-derived seed like the reference; always prints the
seed and the dump path so any failure is replayable via
scripts/chaos_replay.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seed", type=int, default=None)
    ap.add_argument("--events", type=int, default=150)
    ap.add_argument(
        "--option", default="none", choices=["none", "upsert", "append_only"]
    )
    ap.add_argument("--chaos-every", type=int, default=0)
    ap.add_argument("--key-index", action="store_true")
    ap.add_argument("--alter", action="store_true")
    ap.add_argument("--workdir", default=None)
    ap.add_argument(
        "--transport",
        default="local",
        choices=["local", "s3", "gcs"],
        help="where the control plane lives: local disk, or an "
        "in-process S3/GCS wire server behind the real accessor "
        "(throttles + retries on genuine protocol bytes)",
    )
    args = ap.parse_args()

    from moonlink_spark.chaos import ChaosFailure, run_chaos
    from moonlink_spark.session import get_spark

    seed = args.seed if args.seed is not None else time.time_ns() % (1 << 32)
    workdir = args.workdir or tempfile.mkdtemp(prefix="chaos-run-")
    print(f"chaos run: seed={seed} option={args.option} workdir={workdir}")
    spark = get_spark("chaos-run")
    try:
        summary = run_chaos(
            spark,
            workdir,
            seed=seed,
            n_events=args.events,
            table_option=args.option,
            key_index=args.key_index,
            chaos_every=args.chaos_every,
            with_alter=args.alter,
            transport=args.transport,
        )
    except ChaosFailure as exc:
        print(f"CHAOS FAILURE: {exc}", file=sys.stderr)
        return 1
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
