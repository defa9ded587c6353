#!/usr/bin/env python
"""100x scale spot-validation (r9 verdict #5): the flagship dedup
families at gen-sf0.1 vs gen-sf10 — TWO decades of growth instead of
the per-round 10x step — asserting wall growth against each family's
documented curve and bounded driver memory.

Usage: python scripts/scale_100x_validation.py [--workdir DIR] [--skip-gen]

Families and caps:
- dedup_minhash_lsh (banded equi-join, linear by design): cap 150x for
  100x data (1.5x linear slack).
- semantic_dedup_hierarchical (two-level quantizer, O(n^1.5/sqrt(t))):
  the theory ceiling for 100x data is 1000x; overhead amortization in
  practice pulls it far below. Capped at the n^1.5 curve — the claim
  this run anchors is "the two-level entry follows its documented
  curve, not the flat path's n^2".

Prints a markdown table (paste into SCALE.md §14) and exits non-zero on
a cap breach or driver RSS growth > 4 GiB.
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="/tmp/moonlink-scale-100x")
    ap.add_argument("--skip-gen", action="store_true")
    ap.add_argument(
        "--families",
        nargs="*",
        default=None,
        help="subset of case names to run (default: all)",
    )
    args = ap.parse_args()

    from moonlink_spark.operators import all_queries, load
    from moonlink_spark.operators.similarity import semantic_dedup_hierarchical
    from moonlink_spark.session import get_spark
    from scripts.gen_scale_corpus import gen

    spark = get_spark(
        "scale-100x", extra_conf={"spark.driver.memory": "24g"}
    )
    small = os.path.join(args.workdir, "gen-sf0.1")
    big = os.path.join(args.workdir, "gen-sf10")
    # every family that reads the generated corpus (the merge lifecycle
    # synthesizes its own rows via spark.range) — keep in sync with
    # `cases` below, or a --families run on a fresh workdir crashes on
    # the missing parquet (review r11)
    corpus_families = (
        "dedup_minhash_lsh",
        "semantic_dedup_hierarchical",
        "ann_index_pq_100x",
    )
    corpus_wanted = args.families is None or any(
        f in corpus_families for f in args.families
    )
    if not args.skip_gen and corpus_wanted:
        # only documents + embeddings: the tables these families read
        gen(small, 1.0, tables=("documents", "embeddings"))
        gen(big, 100.0, tables=("documents", "embeddings"))

    minhash = all_queries()["dedup_minhash_lsh"].fn

    def hier(s, sf_dir):
        emb = load(s, sf_dir, "embeddings").select("vec_id", "embedding")
        return semantic_dedup_hierarchical(s, emb, target_cluster_size=250)

    # table-plane lifecycle (r10 verdict #4): bulk seed, 8 MERGE commits
    # (upsert ~n/16 + delete ~n/40 each — DV-heavy), optimize, full
    # DV-applied scan. Data volume scales 100x between the two runs;
    # commit COUNT stays fixed (a real ingest pipeline's micro-batch
    # cadence doesn't grow with table size — its batches do). Expected
    # growth is linear in data (every commit's DV targeting is one
    # distributed join against the live view), so the cap is 150x.
    MERGE_SMALL_ROWS = 200_000

    def merge_lifecycle(s, sf_dir):
        import shutil

        from pyspark.sql import functions as F

        from moonlink_spark.table.identity import IdentityProp
        from moonlink_spark.table.maintenance import optimize
        from moonlink_spark.table.table import MoonlinkTable

        n = MERGE_SMALL_ROWS if sf_dir == small else MERGE_SMALL_ROWS * 100
        d = os.path.join(args.workdir, f"merge-{n}")
        shutil.rmtree(d, ignore_errors=True)
        fields = [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "grp", "data_type": "int64"},
            {"name": "val", "data_type": "float64"},
        ]
        t = MoonlinkTable.create(s, d, fields, IdentityProp.single("id"))
        base = s.range(n).select(
            F.col("id"),
            (F.col("id") % 97).alias("grp"),
            (F.col("id") * 1.5).cast("double").alias("val"),
        )
        t.append_df(base)
        t.commit(lsn=1)
        lsn = 1
        for c in range(8):
            lsn += 1
            upd = s.range(c, n, 16).select(
                F.col("id"),
                (F.col("id") % 89).alias("grp"),
                (F.col("id") * 2.5 + c).cast("double").alias("val"),
            )
            t.upsert_df(upd)
            t.delete_keys_df(s.range(c * 3 + 1, n, 40).select("id"))
            t.commit(lsn=lsn)
        optimize(t)
        return t.scan()

    # IVF-PQ index lifecycle (r11): build (coarse train + 8x256 codebook
    # train + code assignment), incremental update, compact, serve.
    # Every stage is O(n) in vectors (the Arrow-batched code kernel does
    # n x ksub x dsub integer work per pass; training collects are
    # bounded model state), so the cap is linear with slack.
    def pq_lifecycle(s, sf_dir):
        import shutil

        from pyspark.sql import functions as F

        from moonlink_spark.table import vecindex

        d = os.path.join(args.workdir, f"pqidx-{os.path.basename(sf_dir)}")
        shutil.rmtree(d, ignore_errors=True)
        emb = load(s, sf_dir, "embeddings").select("vec_id", "embedding")
        vecindex.build_index(
            s, emb.filter(F.col("vec_id") % 2 == 0), d, k=8, iters=2,
            pq={"m": 8, "ksub": 256, "iters": 2},
        )
        vecindex.update_index(s, emb.filter(F.col("vec_id") % 2 == 1), d)
        vecindex.compact_index(s, d)
        return vecindex.query_topk(
            s, emb, d, query_ids=list(range(10)), topk=3, nprobe=2,
            rerank=12,
        )

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    def rss_gib() -> float:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    cases = [
        ("dedup_minhash_lsh", minhash, 150.0),
        ("semantic_dedup_hierarchical", hier, 1000.0),
        ("ingest_merge_lifecycle_100x", merge_lifecycle, 150.0),
        ("ann_index_pq_100x", pq_lifecycle, 150.0),
    ]
    if args.families:
        cases = [c for c in cases if c[0] in args.families]
    results = []
    failures = []
    for name, fn, cap in cases:
        force(fn(spark, small))  # warm (compile cost excluded)
        spark.catalog.clearCache()
        t0 = time.time()
        force(fn(spark, small))
        t_small = time.time() - t0
        spark.catalog.clearCache()
        rss_before = rss_gib()
        t0 = time.time()
        force(fn(spark, big))
        t_big = time.time() - t0
        spark.catalog.clearCache()
        drss = rss_gib() - rss_before
        ratio = t_big / max(t_small, 0.05)
        results.append((name, t_small, t_big, ratio, drss, cap))
        if ratio > cap:
            failures.append(f"{name}: {ratio:.0f}x > cap {cap:.0f}x")
        if drss > 4.0:
            failures.append(f"{name}: driver RSS grew {drss:.1f} GiB")

    print("\n| family | gen-sf0.1 (s) | gen-sf10 (s) | ratio (100x data) | cap | driver ΔRSS (GiB) |")
    print("|---|---|---|---|---|---|")
    for name, a, b, r, drss, cap in results:
        print(
            f"| {name} | {a:.2f} | {b:.2f} | {r:.1f}x | {cap:.0f}x "
            f"| {max(0.0, drss):.2f} |"
        )
    if failures:
        print("\n100x SCALE FAILURES:", "; ".join(failures), file=sys.stderr)
        return 1
    print("\nboth families within their documented growth curves at 100x")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
