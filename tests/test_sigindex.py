"""Persisted signature index: index-served candidates must equal the
from-scratch computation; updates touch only new documents; compaction
preserves content (reference index build/lookup/merge, §2a #12-14)."""

import os

from pyspark.sql import functions as F

from moonlink_spark.operators import load
from moonlink_spark.operators.dedup import _spark_signature
from moonlink_spark.table import sigindex


def fresh_candidates(docs):
    """From-scratch banded candidates (no index)."""
    sigs = _spark_signature(docs)
    bands = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":",
                        F.col(f"h{2 * b}").cast("string"),
                        F.col(f"h{2 * b + 1}").cast("string"),
                    )
                    for b in range(sigindex.N_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("band").alias("band_b"),
        F.col("bucket").alias("bucket_b"),
    )
    return (
        a.join(
            b,
            (F.col("band") == F.col("band_b"))
            & (F.col("bucket") == F.col("bucket_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def pairs_set(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_build_update_compact_lookup(spark, tmp_path):
    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    first = docs.filter(F.col("doc_id") < 40)
    later = docs.filter((F.col("doc_id") >= 40) & (F.col("doc_id") < 60))
    dest = str(tmp_path / "sigidx")

    sigindex.build_index(first, dest)
    assert len(sigindex._sig_files(dest)) == 1
    got = pairs_set(sigindex.candidate_pairs(spark, dest))
    want = pairs_set(fresh_candidates(first))
    assert got == want

    # incremental update: one NEW file, the original is byte-untouched
    before = {f: os.path.getmtime(f) for f in sigindex._sig_files(dest)}
    sigindex.update_index(later, dest)
    files = sigindex._sig_files(dest)
    assert len(files) == 2
    for f, mtime in before.items():
        assert os.path.getmtime(f) == mtime
    both = docs.filter(F.col("doc_id") < 60)
    assert pairs_set(sigindex.candidate_pairs(spark, dest)) == pairs_set(
        fresh_candidates(both)
    )

    # compaction: one file, identical candidates (index merge parity)
    replaced = sigindex.compact_index(spark, dest)
    assert replaced == 2 and len(sigindex._sig_files(dest)) == 1
    assert pairs_set(sigindex.candidate_pairs(spark, dest)) == pairs_set(
        fresh_candidates(both)
    )
    assert sigindex.read_meta(dest)["generation"] == 2
