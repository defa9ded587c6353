#!/usr/bin/env python
"""Scale validation for the round-8 surfaces:

1. Bucketed warehouse amortization — build-once cost vs repeat join /
   bucket-pruned point-read cost at 1x (sf0.01) and 10x (sf0.1); the
   repeat path must never rewrite a bucket file, and the join plan must
   stay Exchange-free below the SortMergeJoin at both scales.
2. Snappy wire leg — produce/fetch round trip through the broker with
   compression none/gzip/snappy at 1x and 10x message counts: message
   fidelity, on-wire byte ratio, end-to-end msgs/s (the consumer path
   brokers default to).

Prints markdown rows for SCALE.md §9. Exits non-zero on any invariant
violation (rewritten bucket files, Exchange below the bucketed join,
wrong rows, snappy bigger than plain on compressible payloads).

Usage: python scripts/scale_r8_validation.py [--workdir DIR]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def _file_states(wh: str) -> dict[str, tuple[int, int]]:
    out = {}
    for root, _dirs, files in os.walk(wh):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[p] = (st.st_mtime_ns, st.st_size)
    return out


def bucketed_rows(spark) -> list[str]:
    from moonlink_spark.operators import all_queries
    from moonlink_spark.operators.relational import ensure_bucketed_warehouse

    specs = all_queries()
    rows_out = []
    # warm the plan compile at the smallest sf so 1x/10x timings compare
    specs["bucketed_colocated_join"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.mode("overwrite").format("noop").save()
    specs["bucketed_point_read"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.mode("overwrite").format("noop").save()
    for label, sf_dir in (("1x", "/root/testdata/sf0.01"),
                          ("10x", "/root/testdata/sf0.1")):
        # force a fresh build: drop any persisted warehouse for this key
        wh_probe = ensure_bucketed_warehouse(spark, sf_dir)
        shutil.rmtree(wh_probe, ignore_errors=True)
        spark.sql("DROP TABLE IF EXISTS mls_orders_bucketed")
        spark.sql("DROP TABLE IF EXISTS mls_lineitem_bucketed")

        t_build, wh = _timed(lambda: ensure_bucketed_warehouse(spark, sf_dir))
        states0 = _file_states(wh)

        def run_join():
            df = specs["bucketed_colocated_join"].fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            return df

        def run_point():
            specs["bucketed_point_read"].fn(spark, sf_dir).write.mode(
                "overwrite"
            ).format("noop").save()

        t_join1, df = _timed(run_join)
        t_join2, _ = _timed(run_join)
        t_point, _ = _timed(run_point)
        assert _file_states(wh) == states0, f"{label}: bucket files rewritten"

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        nodes = dict(
            (int(i), op)
            for i, op in re.findall(r"^\((\d+)\) (\w+)", plan, re.M)
        )
        smjs = [i for i, op in nodes.items() if op == "SortMergeJoin"]
        assert smjs, f"{label}: no SortMergeJoin in the bucketed join plan"
        smj = min(smjs)
        assert all(
            i > smj for i, op in nodes.items() if op == "Exchange"
        ), f"{label}: Exchange below the bucketed join"
        # bucket pruning shows on the POINT READ's plan (the join scans
        # all buckets by design)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            specs["bucketed_point_read"].fn(spark, sf_dir).explain(
                "formatted"
            )
        m = re.search(
            r"SelectedBucketsCount: (\d+) out of (\d+)", buf.getvalue()
        )
        assert m and int(m.group(1)) < int(m.group(2)), (
            f"{label}: point read did not prune buckets"
        )

        rows_out.append(
            f"| bucketed warehouse {label} | build {t_build:.1f} s "
            f"(once) | join {t_join1:.2f} s / repeat {t_join2:.2f} s | "
            f"point read {t_point:.2f} s | zero rewrites; 0 Exchange "
            f"below SMJ |"
        )
        print(f"  [bucketed {label}] build={t_build:.2f}s join={t_join1:.2f}s "
              f"rejoin={t_join2:.2f}s point={t_point:.2f}s "
              f"buckets={m.group(0) if m else 'n/a'}")
    return rows_out


def snappy_wire_rows(workdir: str) -> list[str]:
    from moonlink_spark.sources.kafka_wire import (
        KafkaWireBroker,
        KafkaWireConsumer,
        KafkaWireProducer,
    )

    rows_out = []
    payload = (
        b'{"user_id": 12345, "event_type": "click", "value": 3.14159, '
        b'"ts": "2026-08-15T12:00:00Z", "props": {"k": "vvvvvvvv"}}'
    )
    for label, n_msgs in (("1x", 20_000), ("10x", 200_000)):
        per_codec = {}
        for codec in (None, "gzip", "snappy"):
            d = os.path.join(workdir, f"kw-{label}-{codec}")
            b = KafkaWireBroker(d).start()
            try:
                msgs = [(b"k%d" % i, payload) for i in range(n_msgs)]
                prod = KafkaWireProducer(b.host, b.port, compression=codec)
                t0 = time.time()
                for i in range(0, n_msgs, 2000):
                    prod.send("t", msgs[i : i + 2000])
                t_prod = time.time() - t0
                prod.close()
                # on-WIRE bytes: the broker stores decoded frames, so
                # compression only exists in the RecordBatch payloads —
                # measure a representative encoded batch directly
                from moonlink_spark.sources.kafka_wire import (
                    encode_record_batch,
                )

                log_bytes = len(
                    encode_record_batch(0, msgs[:2000], compression=codec)
                )
                cons = KafkaWireConsumer(b.host, b.port, "t")
                t0 = time.time()
                got = 0
                floor = 0
                while got < n_msgs:
                    batch = cons.poll()
                    if not batch:
                        break
                    got += len(batch)
                    floor = batch[-1][0] + 1
                    cons.commit(floor)
                t_cons = time.time() - t0
                cons.close()
                assert got == n_msgs, f"{label}/{codec}: {got}/{n_msgs}"
                per_codec[codec or "none"] = (log_bytes, t_prod, t_cons)
            finally:
                b.stop()
                shutil.rmtree(d, ignore_errors=True)
        plain = per_codec["none"][0]
        sn_bytes, sn_prod, sn_cons = per_codec["snappy"]
        gz_bytes, _gz_prod, gz_cons = per_codec["gzip"]
        assert sn_bytes < plain, f"{label}: snappy did not compress"
        rows_out.append(
            f"| snappy wire {label} ({n_msgs/1000:.0f}k msgs) | batch bytes "
            f"{sn_bytes/plain:.2f}x of plain (gzip {gz_bytes/plain:.2f}x) | "
            f"produce {n_msgs/sn_prod/1000:.0f}k msg/s | fetch+decode "
            f"{n_msgs/sn_cons/1000:.0f}k msg/s (gzip "
            f"{n_msgs/gz_cons/1000:.0f}k) |"
        )
        print(f"  [snappy {label}] ratio={sn_bytes/plain:.2f} "
              f"prod={n_msgs/sn_prod/1000:.0f}k/s cons={n_msgs/sn_cons/1000:.0f}k/s "
              f"gzip_cons={n_msgs/gz_cons/1000:.0f}k/s")
    return rows_out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()
    import tempfile

    workdir = args.workdir or tempfile.mkdtemp(prefix="scale-r8-")

    from moonlink_spark.session import get_spark

    spark = get_spark("scale-r8", master="local[32]")
    print("== bucketed warehouse ==")
    rows = bucketed_rows(spark)
    print("== snappy wire ==")
    rows += snappy_wire_rows(workdir)
    print("\nSCALE.md rows:")
    for r in rows:
        print(r)
    spark.stop()
    shutil.rmtree(workdir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
