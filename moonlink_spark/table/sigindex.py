"""Persisted MinHash signature index: build once, update incrementally,
query for near-dup candidates without recomputing signatures.

Reference parity for the index lifecycle (SURVEY.md §2a #12-14): the
reference builds a persisted bucket hash index on flush
(``persisted_bucket_hash_map.rs:486-523``), looks rows up through it, and
merges small index files (``build_from_merge``, ``:525-574``). The
Spark-native analog for the DEDUP workload: per-document MinHash
signatures are expensive (one md5 per shingle) and immutable for
unchanged text, so they persist as parquet next to the corpus —
- **build**: one pass over the corpus writes ``sig-*.parquet`` + meta;
- **update**: signatures for NEW documents only append another file —
  O(new docs), old files untouched (the reference's index-merge shape:
  many small segment files serve together);
- **compact**: optional rewrite of many small signature files into one
  (``build_from_merge`` parity);
- **query**: the banded-LSH candidate join reads persisted signatures —
  zero signature recompute at query time.

Signature arithmetic is EXACTLY dedup.py's oracle-checked family (same
md5 prefix, same integer mixes), so candidates from the index match the
from-scratch computation bit for bit.
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.operators.dedup import N_BANDS, N_HASHES, _spark_signature

META_FILE = "sigindex.json"


def _write_meta(dest: str, meta: dict[str, Any]) -> None:
    tmp = os.path.join(dest, META_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(meta, fh, indent=1)
    os.replace(tmp, os.path.join(dest, META_FILE))


def read_meta(dest: str) -> dict[str, Any]:
    with open(os.path.join(dest, META_FILE)) as fh:
        return json.load(fh)


def _sig_files(dest: str) -> list[str]:
    return sorted(
        os.path.join(dest, n)
        for n in os.listdir(dest)
        if n.startswith("sig-") and n.endswith(".parquet")
    )


def _write_signatures(df: DataFrame, dest: str) -> str:
    """One signature parquet file from a (doc_id, text) DataFrame."""
    tmp = os.path.join(dest, f"_tmp-{uuid.uuid4().hex}")
    _spark_signature(df).coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [n for n in os.listdir(tmp) if n.endswith(".parquet")]
    assert len(part) == 1
    final = os.path.join(dest, f"sig-{uuid.uuid4().hex}.parquet")
    os.replace(os.path.join(tmp, part[0]), final)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    return final


def build_index(docs: DataFrame, dest: str) -> dict[str, Any]:
    """Create the index from a (doc_id, text) corpus."""
    os.makedirs(dest, exist_ok=True)
    _write_signatures(docs.select("doc_id", "text"), dest)
    meta = {
        "n_hashes": N_HASHES,
        "n_bands": N_BANDS,
        "generation": 1,
    }
    _write_meta(dest, meta)
    return meta


def update_index(new_docs: DataFrame, dest: str) -> dict[str, Any]:
    """Append signatures for NEW documents (caller guarantees doc_ids not
    already indexed — the ingest path knows its delta). Cost is O(new)."""
    meta = read_meta(dest)
    _write_signatures(new_docs.select("doc_id", "text"), dest)
    meta["generation"] += 1
    _write_meta(dest, meta)
    return meta


def compact_index(spark: SparkSession, dest: str) -> int:
    """Merge all signature files into one (parity build_from_merge):
    returns the number of files replaced."""
    files = _sig_files(dest)
    if len(files) <= 1:
        return 0
    merged = spark.read.parquet(*files)
    tmp = os.path.join(dest, f"_tmp-{uuid.uuid4().hex}")
    merged.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [n for n in os.listdir(tmp) if n.endswith(".parquet")]
    final = os.path.join(dest, f"sig-{uuid.uuid4().hex}.parquet")
    os.replace(os.path.join(tmp, part[0]), final)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
    for f in files:
        os.unlink(f)
    return len(files)


def signatures(spark: SparkSession, dest: str) -> DataFrame:
    """All indexed signatures (doc_id, h0..h7)."""
    return spark.read.parquet(*_sig_files(dest))


def candidate_pairs(spark: SparkSession, dest: str) -> DataFrame:
    """Banded-LSH candidate pairs from PERSISTED signatures — the lookup
    path; no text is read, no md5 is computed."""
    sigs = signatures(spark, dest).persist()
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
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band", "bucket"),
    )
    a = bands.select(
        F.col("doc_id").alias("doc_a"), "band", "bucket"
    )
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
