#!/usr/bin/env python
"""Replay a chaos dump (chaos_replay.rs parity).

Usage: python scripts/chaos_replay.py DUMP_FILE [--workdir DIR]

Rebuilds the table described by the dump's first line and re-executes
every recorded event with the same validations. A dump recorded from a
failing run reproduces its invariant failure deterministically — no seed
or RNG involved.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dump", help="chaos dump JSONL file")
    ap.add_argument(
        "--workdir", default=None, help="scratch dir (default: a temp dir)"
    )
    args = ap.parse_args()

    from moonlink_spark.chaos import replay
    from moonlink_spark.session import get_spark

    workdir = args.workdir or tempfile.mkdtemp(prefix="chaos-replay-")
    spark = get_spark("chaos-replay")
    try:
        summary = replay(spark, args.dump, workdir)
    except Exception as exc:  # noqa: BLE001 — the point is to reproduce
        print(f"REPLAY FAILED (reproduced): {exc}", file=sys.stderr)
        return 1
    print(json.dumps({"replay": "ok", **summary}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
