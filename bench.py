"""Benchmark: headline queries + ingest throughput at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
{"metric": "...", "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Query results are forced with the noop sink (full computation, no driver
collection). The ingest scenario reproduces the reference's write-path bench
shape (bulk append + 10%-of-table MERGE upsert + delete, BASELINE.md) on a
MoonlinkTable.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from moonlink_spark.operators import all_queries, load
from moonlink_spark.session import get_spark
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.maintenance import optimize
from moonlink_spark.table.table import MoonlinkTable

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q13_customer_distribution",
    "q18_large_orders",
    "window_running_user_totals",
    "sessionize_events",
    "asof_join_purchase_click",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "lsh_near_dup_pairs",
    "text_quality_scores",
    "percentiles_by_flag",
    "contamination_check",
    "corpus_curation_pipeline",
    "bm25_retrieval",
    "knn_cosine_bruteforce",
    "ann_ivf_topk",
    "interval_range_join",
    "embedding_quantize_rerank",
    "sequence_pack_bins",
    "semantic_dedup_ivf",
    "dedup_keep_best_quality",
    "streaming_stateful_sessionize_e2e",
    "ann_ivf_multiprobe_topk",
    "lm_fluency_scores",
    "approx_heavy_hitters",
    # r4 additions: the heaviest new operators
    "ivf_kmeans_train",
    "ingest_export_iceberg_dv_scan",
    "ingest_avro_events_scan",
    # r5 additions: the broker-socket Avro feed and the exported-index
    # round trips (the heaviest new families this round)
    "ingest_kafka_wire_scan",
    "ingest_export_vecindex_ann",
    "ingest_export_sigindex_pairs",
    # r4s4 additions: the heaviest of the new operator families
    "ann_index_lifecycle_topk",
    "embedding_pca_power_scores",
    "ngram_novelty_rate",
    # r6 additions: the transport-heavy new ingest paths (PG COPY wire,
    # group-coordinated Kafka) and the cached object-store data plane
    "ingest_copy_wire_scan",
    "ingest_kafka_group_rebalance_scan",
    "ingest_cached_data_scan",
    # r10 addition: the two-level coarse quantizer (SCALE.md rule 8)
    "hier_quantizer_assign",
    # r11 additions: the IVF-PQ serving path (ADC shortlist + rerank)
    # and the authenticated replication wire e2e
    "ann_index_pq_topk",
    "ingest_replication_auth_scan",
]


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def bench_ingest(spark, sf_dir: str) -> float:
    """Bulk load lineitem, MERGE-upsert ~10%, delete ~2%, optimize, scan."""
    fields = [
        {"name": "l_orderkey", "data_type": "int64", "nullable": False},
        {"name": "l_linenumber", "data_type": "int32", "nullable": False},
        {"name": "l_quantity", "data_type": "float64"},
        {"name": "l_extendedprice", "data_type": "float64"},
        {"name": "l_returnflag", "data_type": "string"},
    ]
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    path = tempfile.mkdtemp(prefix="moonlink-bench-")
    t0 = time.time()
    try:
        t = MoonlinkTable.create(
            spark, os.path.join(path, "t"), fields,
            IdentityProp.keys(["l_orderkey", "l_linenumber"]),
        )
        t.append_df(li)
        t.commit(lsn=1)
        upserts = li.filter(F.col("l_orderkey") % 10 == 0).withColumn(
            "l_quantity", F.col("l_quantity") + 1.0
        )
        t.upsert_df(upserts)
        t.commit(lsn=2)
        t.delete_keys_df(
            li.filter(F.col("l_orderkey") % 50 == 0).select(
                "l_orderkey", "l_linenumber"
            )
        )
        t.commit(lsn=3)
        optimize(t)
        assert t.scan().count() > 0
        return time.time() - t0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def bench_batch_commits(spark, n_batches: int = 20, batch_rows: int = 10_000) -> float:
    """Reference microbench shape: 10k-row batches, commit per batch
    (microbench_write_mooncake_table.rs:26-60) — measures per-commit
    overhead of the row-buffer fast path + manifest publish."""
    fields = [
        {"name": "id", "data_type": "int32", "nullable": False},
        {"name": "name", "data_type": "string"},
        {"name": "age", "data_type": "int32"},
    ]
    path = tempfile.mkdtemp(prefix="moonlink-bench-bc-")
    t0 = time.time()
    try:
        t = MoonlinkTable.create(
            spark, os.path.join(path, "t"), fields, IdentityProp.single("id")
        )
        for b in range(n_batches):
            base = b * batch_rows
            t.append_rows(
                [
                    {"id": base + i, "name": f"user_{base + i}", "age": i % 90}
                    for i in range(batch_rows)
                ]
            )
            t.commit(lsn=b + 1)
        assert t.cardinality() == n_batches * batch_rows
        return time.time() - t0
    finally:
        shutil.rmtree(path, ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    spark = get_spark("moonlink-bench")
    specs = all_queries()
    timings: dict[str, float] = {}

    # Criterion-style warmup (the reference's own bench harness measures
    # steady-state after criterion's warm phase): run every headline shape
    # once at sf0.001 so the timed sf0.1 pass measures execution, not the
    # one-time Catalyst analysis + Janino whole-stage compile of each plan
    # (measured 2-3s per complex plan — a fixed cost that amortizes to
    # zero on any long-lived session or 100 TB job, and that the pre-r4s4
    # warmup already excluded for 3 of the shapes). The warm pass is NOT
    # counted; wall-clock cost ~25s. Cross-round comparison: r3-recorded
    # totals include cold-compile for most shapes — normalize with
    # calibration_sec, then compare per-query, before calling a trend.
    spark.range(1000).count()

    # warm the Python executor pool + streaming state store: the first
    # Arrow-batched UDF / stateful query otherwise pays worker spin-up
    # (measured ~4-8s across 32 cores) that belongs to process startup,
    # not to the operator being timed
    def _warm_py(batches):
        yield from batches

    spark.range(0, 10_000, 1, 32).mapInPandas(_warm_py, "id long").write.mode(
        "overwrite"
    ).format("noop").save()
    # The warm pass is timed too (per query, at sf0.001): this is each
    # plan's one-time analysis+compile cost, recorded SEPARATELY so
    # rounds before the r4s4 warmup change (whose totals folded this cost
    # into the timed pass) stay comparable — add cold_sf0001 back to a
    # query's warm timing to approximate its pre-warmup number.
    cold: dict[str, float] = {}
    for warm in HEADLINE:
        t0 = time.time()
        _force(specs[warm].fn(spark, "/root/testdata/sf0.001"))
        cold[warm] = round(time.time() - t0, 3)
        spark.catalog.clearCache()
    bench_ingest(spark, "/root/testdata/sf0.001")

    # SPARK_GRAFT_BENCH_REPEATS > 1: run every scenario N times and
    # report the per-query MEDIAN. The driver's per-round run keeps the
    # default (1) so round totals stay comparable; the repeated form is
    # the re-baselining tool (BASELINE_LOCAL.json) because this host's
    # boot-to-boot AND run-to-run jitter is larger than most queries
    # (q6 measured 0.5-1.9 s across identical warm runs, NOTES_r8) —
    # a single sample cannot anchor a 2x regression rule.
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "1")))
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    samples["ingest_merge_lifecycle"] = []
    samples["ingest_batch_commits"] = []
    # spaced calibration probes (see _calibration): one before the timed
    # pass, one midway through each repeat — each between query timings
    _calibration_probe(spark)
    for _ in range(repeats):
        for qi, name in enumerate(HEADLINE):
            t0 = time.time()
            _force(specs[name].fn(spark, sf_dir))
            samples[name].append(time.time() - t0)
            # queries persist() their reused subtrees; drop them so one
            # query's cache does not shift the next query's memory budget
            spark.catalog.clearCache()
            if qi == len(HEADLINE) // 2:
                _calibration_probe(spark)
        samples["ingest_merge_lifecycle"].append(bench_ingest(spark, sf_dir))
        samples["ingest_batch_commits"].append(bench_batch_commits(spark))
    for name, runs in samples.items():
        timings[name] = round(sorted(runs)[len(runs) // 2], 3)

    total = round(sum(timings.values()), 3)
    # The driver captures a fixed-size tail of stdout and parses the LAST
    # JSON line (BENCH_r05.json went `parsed: null` when cold_sf0001
    # doubled the line length). Emit the cold-compile record on its OWN
    # earlier line (and to a sidecar file for local analysis), keeping the
    # final line compact: {metric, value, unit, queries, sf, calibration}.
    cold_record = json.dumps(
        {"metric": "cold_compile_sf0001", "unit": "sec", "queries": cold}
    )
    print(cold_record)
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_cold_sf0001.json"), "w"
        ) as f:
            f.write(cold_record + "\n")
    except OSError:
        pass
    sys.stdout.flush()
    calibration = _calibration(spark)
    if repeats > 1:
        # median-of-N run: persist the medians (plus the spread, so a
        # future "is this a regression?" question can see the noise
        # floor). NOTE (r12): this file is a measurement SNAPSHOT, not
        # the comparison anchor — the anchor is BASELINE_FROZEN.json,
        # which is never re-recorded (four re-anchors in five rounds
        # made slow drift structurally invisible; the normalized-ratio
        # lines above are the drift detector now)
        try:
            with open(
                os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_LOCAL.json"), "w"
            ) as f:
                json.dump(
                    {
                        "metric": "median_of_runs",
                        "repeats": repeats,
                        "sf": sf,
                        "queries": timings,
                        "spread": {
                            k: [round(x, 3) for x in sorted(v)]
                            for k, v in samples.items()
                        },
                        "calibration_sec": calibration,
                    },
                    f,
                    indent=1,
                )
        except OSError:
            pass
    # Ratio lines vs the FROZEN anchor (BASELINE_FROZEN.json — the r10
    # median-of-3, never re-recorded; see its provenance field). Two
    # ratios per query, both on their OWN stdout line + a sidecar so the
    # driver's compact final line stays parseable:
    #   ratio_raw        = t_q / frozen_q            (host-speed-contaminated)
    #   ratio_normalized = (t_q / calibration) / (frozen_q / frozen_calib)
    # The normalized series is the drift detector: host slowdowns move
    # raw ratios together but cancel out of the normalized ones, so a
    # normalized query >= 1.5x is a REAL regression candidate (median-of-3
    # adjudication), not a shared-box artifact. Queries absent from the
    # anchor (new this round) are listed separately — they get ONE
    # first-round entry appended to the frozen file and never move again.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_FROZEN.json")
        ) as f:
            frozen = json.load(f)
        fq, fcal = frozen["queries"], float(frozen["calibration_sec"])
        if not (fcal > 0 and calibration > 0):
            raise ValueError("non-positive calibration")
        ratios = {
            name: {
                "raw": round(t / float(fq[name]), 3),
                "normalized": round(
                    (t / calibration) / (float(fq[name]) / fcal), 3
                ),
            }
            for name, t in timings.items()
            if name in fq and isinstance(fq[name], (int, float)) and fq[name] > 0
        }
        norm_vals = sorted(r["normalized"] for r in ratios.values())
        ratio_record = {
            "metric": "ratios_vs_frozen_anchor",
            "calibration_sec": calibration,
            "frozen_calibration_sec": fcal,
            "median_normalized": (
                norm_vals[len(norm_vals) // 2] if norm_vals else None
            ),
            "flagged_ge_1_5x": sorted(
                n for n, r in ratios.items() if r["normalized"] >= 1.5
            ),
            "unfrozen_queries": sorted(
                n for n in timings if n not in fq
            ),
            "queries": ratios,
        }
        print(json.dumps(ratio_record))
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_ratios.json"), "w"
        ) as f:
            json.dump(ratio_record, f, indent=1)
    except (OSError, KeyError, ValueError, TypeError, ZeroDivisionError):
        pass  # no/bad anchor: raw timings below still stand alone
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "headline_queries_plus_ingest_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                # Fixed, code-independent workload: per-round totals on this
                # harness vary with host speed (observed 1.2-2.3x boot-to-boot
                # drift, NOTES_r4); dividing two rounds' calibration values
                # normalizes their totals before comparing.
                "calibration_sec": calibration,
            }
        )
    )


_CAL_SAMPLES: list[float] = []


def _calibration_probe(spark) -> None:
    """One sample of the fixed shuffle+agg calibration job (groupBy over
    20M generated longs — a workload no code change touches), appended to
    the run's calibration pool. Probes are taken at SPACED points of the
    run (before the timed pass, midway through it, and at the end) so the
    final statistic reflects host speed across the same window the
    queries ran in. Each probe runs BETWEEN query timings, never inside
    one."""
    t0 = time.time()
    (
        spark.range(20_000_000)
        .groupBy((F.col("id") % 1024).alias("k"))
        .agg(F.sum("id"), F.count("*"))
        .write.mode("overwrite").format("noop").save()
    )
    _CAL_SAMPLES.append(time.time() - t0)


def _calibration(spark) -> float:
    """Outlier-rejected median over the run's SPACED calibration samples
    plus 3 end-of-run samples.

    The statistic must stay MEDIAN-compatible with the frozen anchor's
    calibration (BASELINE_FROZEN.json recorded a median — a min-based
    live value reads ~25-35% low on a quiet host and silently inflates
    every normalized ratio by that factor). Two poisoning modes are
    handled:
    - ADDITIVE noise (GC pauses, scheduler contention): r12 observed a
      median-of-3 of 1.97s — 4.6x the anchor — while a quiet standalone
      run read 0.38-0.42s. A poisoned-slow calibration DIVIDES AWAY real
      regressions. Mitigation: drop any sample more than 2x the fastest
      (contaminated by construction — the job is fixed).
    - a QUIET-MOMENT end-of-run burst (r12 driver run: all samples back
      to back hit a quiet instant, calibration read 0.196 vs the 0.424
      anchor, and every query's normalized ratio doubled — the drift
      detector amplified the very noise it exists to kill). Mitigation
      (r13): the median now pools probes SPACED across the whole run
      (_calibration_probe call sites in main) with the end samples, so
      one quiet or loaded instant cannot set the run's denominator."""
    for _ in range(3):
        _calibration_probe(spark)
    runs = list(_CAL_SAMPLES)
    clean = sorted(r for r in runs if r <= 2 * min(runs))
    return round(clean[len(clean) // 2], 3)


if __name__ == "__main__":
    main()
