"""Regenerate PLANS.md: formatted physical plans for the flagship queries,
each with a note on why this is the plan we want at 100 TB.

Usage: python scripts/dump_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from moonlink_spark.operators import all_queries
from moonlink_spark.session import get_spark

# query -> why the plan shape is the scale-correct one
FLAGSHIPS = {
    "q6_forecast_revenue": (
        "All five predicates reach the parquet scan (PushedFilters) and the "
        "scan reads only the four columns the query touches (ReadSchema) — "
        "at 100 TB this is the difference between scanning terabytes and "
        "scanning the whole table."
    ),
    "q3_shipping_priority": (
        "The filtered customer dimension broadcasts; lineitem never "
        "shuffles for the join, only for the final aggregation. AQE "
        "coalesces the agg exchange."
    ),
    "full_outer_urgent_vs_returns": (
        "Full outer joins cannot broadcast, so both sides are pre-"
        "aggregated to one row per customer BEFORE the shuffle join — the "
        "join moves reduced data, not raw orders/lineitem."
    ),
    "dedup_minhash_lsh": (
        "The only at-scale shuffles are the signature aggregation and the "
        "band-bucket equi-join (posexplode over bands, signatures "
        "persisted); small inputs additionally pay one bounded "
        "parallelism-floor repartition before the md5-heavy signature map "
        "(a no-op once the scan splits, see ensure_parallelism). No "
        "cartesian anywhere: candidate pairs come from hash buckets, the "
        "quadratic verify runs only within buckets."
    ),
    "lsh_near_dup_pairs": (
        "Hyperplane-LSH banding turns embedding near-dup into a bucket "
        "equi-join + exact cosine verify on candidates only — the plan "
        "that replaces the O(N^2) all-pairs baseline at scale."
    ),
    "interval_range_join": (
        "Time-range join expressed as a bucket equi-join (bucket width == "
        "window length, 2-bucket explode) — Spark plans a hash join on the "
        "bucket key instead of a nested-loop over ranges."
    ),
    "sequence_pack_bins": (
        "Packing is a per-source window cumsum: one shuffle on source, "
        "sort bounded by docs-per-source, no global sort."
    ),
    "skew_salted_aggregation": (
        "Two-phase (key,salt) -> key aggregation: the hot key's rows "
        "spread over N_SALTS reducers in phase 1; phase 2 merges "
        "N_SALTS-row partials."
    ),
    "semantic_dedup_ivf": (
        "SemDeDup at scale: the quadratic near-dup term is bounded per "
        "cluster — centroid assignment is a 25-row broadcast map stage, "
        "the pair join is an equi-join on cluster_id (never cartesian), "
        "and per-vector norms are computed once before the join, not per "
        "pair."
    ),
    "hier_quantizer_assign": (
        "The two-level coarse quantizer (SCALE.md rule 8): the whole "
        "quantizer (super matrix + per-cell centroid lists) rides in as "
        "ONE broadcast row, and assignment is a zero-Exchange map — "
        "sqrt(k) + nprobe*(k/sqrt(k)) distance folds per vector instead "
        "of the flat path's k. The only exchange in the executed plan "
        "is the one-row BroadcastExchange; no shuffle of vectors."
    ),
    "approx_heavy_hitters": (
        "The sketch pass is mapInPandas with O(capacity) state and ZERO "
        "shuffle; the only shuffle is the exact recount of a few hundred "
        "broadcast candidates — the full-stream GROUP BY the naive plan "
        "would shuffle never happens."
    ),
    "lm_fluency_scores": (
        "The bigram model is two count aggregations whose payload is "
        "counts; scoring joins each occurrence against the broadcast "
        "model and aggregates per doc — at web scale the model tables "
        "persist and only the scoring join runs per shard."
    ),
    "embedding_gram_matrix": (
        "The PCA/covariance sufficient statistic without the N x dim^2 "
        "explode: each partition folds its Arrow batches into ONE local "
        "dim x dim int64 matrix inside mapInPandas, so the only shuffle "
        "carries partitions x dim(dim+1)/2 tiny partial rows into the "
        "final sum — a 4096x shuffle reduction at dim=64."
    ),
    "ngram_novelty_rate": (
        "Shingles hash to 60-bit BIGINT keys before any at-scale exchange "
        "(full text never shuffles once the scan splits; small inputs pay "
        "the one bounded parallelism-floor repartition) and "
        "first-ownership is a window MIN over the shingle partition "
        "instead of a groupBy + join back — one fewer shuffle of the "
        "whole shingle relation."
    ),
    "bucketed_colocated_join": (
        "Fact-fact join with ZERO Exchange below the SortMergeJoin: both "
        "sides were bucket-sorted on the join key at write time (paid "
        "once per source version), so the scans satisfy the join's "
        "distribution requirement directly — at 1000 executors the join "
        "is network-free. The exchanges above it (agg/sort) are the "
        "query's own."
    ),
    "bucketed_point_read": (
        "Equality/IN on the bucket column prunes the scan to the buckets "
        "those keys hash to (SelectedBucketsCount 3 of 8) — at 100 TB, 3 "
        "bucket files of thousands instead of a full-table scan, with "
        "zero index structure beyond the write-time bucketing."
    ),
    "approx_percentiles_by_flag": (
        "The bounded-state percentile path: percentile_approx keeps a "
        "mergeable sketch per partial aggregate, so a 3-value group key "
        "never concentrates a value->count map in 3 reducer tasks the "
        "way exact percentile does; the plan is partial->final agg with "
        "fixed-size state regardless of the distinct-value count."
    ),
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("dump-plans", master="local[8]")
    qs = all_queries()
    out = [
        "# PLANS — physical plans of the flagship queries",
        "",
        "Regenerate with `python scripts/dump_plans.py`. These are the plans",
        "`tests/test_plan_shapes.py` locks; the notes say why each shape is",
        "the one that survives a 1000-executor, 100 TB run.",
        "",
    ]
    for name, why in FLAGSHIPS.items():
        df = qs[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        # keep the operator tree, drop the verbose per-node detail section
        tree = plan.split("\n\n", 1)[0]
        block = tree.rstrip()
        if name == "q6_forecast_revenue":
            # show the scan detail so PushedFilters/ReadSchema are visible
            detail = plan.split("\n\n", 1)[1]
            scan = detail.split("\n\n")[0]
            block += "\n\n" + scan.rstrip()
        out += [f"## {name}", "", why, "", "```", block, "```", ""]
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(path, "w") as fh:
        fh.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
