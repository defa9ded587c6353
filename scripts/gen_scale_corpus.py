#!/usr/bin/env python
"""Generate a scaled synthetic corpus matching /root/testdata's shape.

Usage: python scripts/gen_scale_corpus.py OUT_DIR SCALE
  SCALE is relative to sf0.1 (SCALE=1 reproduces sf0.1's row counts,
  SCALE=10 is an sf1-equivalent).

Writes documents/embeddings/lineitem/orders parquet with the same
schemas and generative shape as the driver's tables (31-word vocab word
salads with near-dup pairs; 10-cluster gaussian embeddings; TPC-H-ish
lineitem/orders), fully distributed via Spark (seeded, no driver-side
row materialization). The remaining small tables are SYMLINKED from
/root/testdata/sf0.1 — plan-shape checks need them to exist; the scale
validation only exercises the four generated tables.

Used by scripts/scale_validation.py; safe to delete outputs afterwards.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup",
    "fast", "filter", "group", "hash", "join", "key", "line", "merge",
    "order", "part", "query", "row", "scan", "slow", "small", "sort",
    "spark", "stream", "table", "the", "value", "vector", "window",
]
SF01 = "/root/testdata/sf0.1"


def gen(out_dir: str, scale: float, tables: tuple = ()) -> None:
    """``tables`` limits generation to a subset (e.g. ("documents",
    "embeddings") for the 100x run, where a 60M-row lineitem would cost
    more to generate than the operators under test cost to run); skipped
    generated tables are symlinked from sf0.1 like the dims."""
    from moonlink_spark.session import get_spark

    def want(t: str) -> bool:
        return not tables or t in tables

    spark = get_spark("gen-scale-corpus")
    os.makedirs(out_dir, exist_ok=True)
    n_docs = int(5000 * scale)
    n_vecs = int(2000 * scale)
    n_line = int(600_000 * scale)
    n_orders = int(150_000 * scale)

    vocab = F.array(*[F.lit(w) for w in VOCAB])
    skipped = []
    # documents: seeded word salads, ~30-55 words; every 10th doc is a
    # near-duplicate of its predecessor (one word appended) so the dedup
    # family has real candidate structure at every scale
    base = (
        spark.range(n_docs)
        .withColumn("base_id", F.when(F.col("id") % 10 == 9, F.col("id") - 1)
                    .otherwise(F.col("id")))
        .withColumn("n_words", (F.xxhash64("base_id") % 26 + 30))
        .withColumn(
            "words",
            F.transform(
                F.sequence(F.lit(1), F.col("n_words")),
                lambda i: F.element_at(
                    vocab,
                    (F.pmod(F.xxhash64(F.col("base_id") * 1000 + i), F.lit(31)) + 1
                     ).cast("int"),
                ),
            ),
        )
        .withColumn(
            "text",
            F.when(
                F.col("id") % 10 == 9,
                F.concat_ws(" ", F.concat(F.col("words"), F.array(F.lit("dup")))),
            ).otherwise(F.concat_ws(" ", F.col("words"))),
        )
        .select(
            F.col("id").alias("doc_id"),
            "text",
            F.element_at(
                F.array(*[F.lit(x) for x in ["en", "de", "es", "fr", "zh"]]),
                (F.pmod(F.xxhash64("id"), F.lit(5)) + 1).cast("int"),
            ).alias("lang"),
            F.concat(F.lit("src"), (F.col("id") % 20).cast("string")).alias(
                "source"
            ),
            F.length("text").alias("n_chars"),
        )
    )
    if want("documents"):
        base.coalesce(max(1, n_docs // 100_000 + 1)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "documents.parquet"))
    else:
        skipped.append("documents")

    # embeddings: 10 gaussian-ish clusters in 64 dims (hash-derived
    # pseudo-noise: deterministic, executor-side, no numpy on driver)
    emb = (
        spark.range(n_vecs)
        .withColumn("label", (F.col("id") % 10).cast("int"))
        .withColumn(
            "embedding",
            F.transform(
                F.sequence(F.lit(1), F.lit(64)),
                lambda d: (
                    (F.col("label") * 2.0)
                    * F.cos(d.cast("double") * (F.col("label") + 1))
                    + (F.pmod(F.xxhash64(F.col("id") * 64 + d), F.lit(1000))
                       / 500.0 - 1.0)
                ).cast("float"),
            ),
        )
        .select(F.col("id").alias("vec_id"), "embedding", "label")
    )
    if want("embeddings"):
        emb.coalesce(max(1, n_vecs // 100_000 + 1)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "embeddings.parquet"))
    else:
        skipped.append("embeddings")

    # lineitem: the full sf0.1 schema (fk ranges match the SYMLINKED
    # sf0.1 dims so join plans analyze and run at any scale)
    li = (
        spark.range(n_line)
        .select(
            (F.col("id") / 4).cast("long").alias("l_orderkey"),
            F.pmod(F.xxhash64(F.col("id") + 10), F.lit(20000)).alias(
                "l_partkey"
            ),
            F.pmod(F.xxhash64(F.col("id") + 11), F.lit(1000)).alias(
                "l_suppkey"
            ),
            (F.col("id") % 7 + 1).cast("int").alias("l_linenumber"),
            (F.pmod(F.xxhash64("id"), F.lit(50)) + 1).cast("double").alias(
                "l_quantity"
            ),
            (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(90000)) / 100.0 + 900)
            .alias("l_extendedprice"),
            (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(100)) / 100.0 * 0.1)
            .alias("l_discount"),
            (F.pmod(F.xxhash64(F.col("id") + 3), F.lit(100)) / 100.0 * 0.08)
            .alias("l_tax"),
            F.element_at(
                F.array(F.lit("A"), F.lit("N"), F.lit("R")),
                (F.pmod(F.xxhash64(F.col("id") + 4), F.lit(3)) + 1).cast("int"),
            ).alias("l_returnflag"),
            F.element_at(
                F.array(F.lit("O"), F.lit("F")),
                (F.pmod(F.xxhash64(F.col("id") + 5), F.lit(2)) + 1).cast("int"),
            ).alias("l_linestatus"),
            F.date_add(
                F.lit("1995-01-01").cast("date"),
                F.pmod(F.xxhash64(F.col("id") + 6), F.lit(1500)).cast("int"),
            ).cast("timestamp").alias("l_shipdate"),
        )
    )
    if want("lineitem"):
        li.coalesce(max(1, n_line // 2_000_000 + 1)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "lineitem.parquet"))
    else:
        skipped.append("lineitem")

    orders = spark.range(n_orders).select(
        F.col("id").alias("o_orderkey"),
        F.pmod(F.xxhash64("id"), F.lit(15000)).alias("o_custkey"),
        F.element_at(
            F.array(F.lit("O"), F.lit("F"), F.lit("P")),
            (F.pmod(F.xxhash64(F.col("id") + 1), F.lit(3)) + 1).cast("int"),
        ).alias("o_orderstatus"),
        (F.pmod(F.xxhash64(F.col("id") + 2), F.lit(400000)) / 100.0 + 1000)
        .alias("o_totalprice"),
        F.concat(
            F.lit("P"), (F.pmod(F.xxhash64(F.col("id") + 3), F.lit(5)) + 1)
            .cast("string")
        ).alias("o_orderpriority"),
        F.date_add(
            F.lit("1995-01-01").cast("date"),
            F.pmod(F.xxhash64(F.col("id") + 4), F.lit(1500)).cast("int"),
        ).cast("timestamp").alias("o_orderdate"),
        (F.pmod(F.xxhash64(F.col("id") + 5), F.lit(2))).cast("int").alias(
            "o_shippriority"
        ),
    )
    if want("orders"):
        orders.coalesce(max(1, n_orders // 2_000_000 + 1)).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, "orders.parquet"))
    else:
        skipped.append("orders")

    # remaining tables: symlink from sf0.1 (exist for plan analysis; the
    # scale validation never scans them at scale)
    for t in [
        "region", "nation", "customer", "supplier", "part", "events",
        *skipped,
    ]:
        link = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(SF01, f"{t}.parquet"), link)
    print(f"generated scale={scale} at {out_dir}: docs={n_docs} "
          f"vecs={n_vecs} lineitem={n_line} orders={n_orders}")


if __name__ == "__main__":
    gen(sys.argv[1], float(sys.argv[2]))
