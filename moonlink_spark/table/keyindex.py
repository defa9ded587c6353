"""Persisted key hash index: exact delete/point-lookup file targeting.

Spark-first re-expression of the reference's persisted bucketed hash index
(``src/moonlink/src/storage/index/persisted_bucket_hash_map.rs``): the
reference builds, per flushed data file, an mmap-backed bucket array mapping
``splitmix64(key) -> (seg_idx, row_idx)`` (build ``:486-523``, lookup
``search_values`` ``:276-302``, merge ``build_from_merge`` ``:525-574``), and
persists it into Iceberg as ``mooncake-hash-index-v1`` Puffin blobs
(``storage/table/iceberg/index.rs:20-22``).

Here the same roles map onto Spark-native machinery:

- **hash function** -> ``F.xxhash64(*key_cols)`` (JVM-side, vectorized,
  whole-stage codegen; stable across sessions). Recorded in the manifest as
  ``algo`` so readers never mix hash functions.
- **index block file** -> a parquet file of ``(h, __fp, __ri)`` sorted by
  ``h``. Sorting makes parquet row-group min/max stats on ``h`` a bucket
  directory: a lookup pushes ``h IN (...)`` / min-max predicates into the
  scan and touches only matching row groups — the reference's
  ``bucket_start_offset`` seek, for free.
- **index build** -> one distributed Spark job over exactly the newly
  flushed files (O(new data), never O(table)).
- **index merge** -> ``optimize(mode="index")`` unions live index files,
  drops entries for compacted-away data files, rewrites one sorted file.
- **lookup** -> hash the (small) key batch, broadcast it against the index
  scan, return the exact set of data files (and positions) containing those
  keys. Delete targeting then opens ONLY those files instead of relying on
  min/max range overlap.

Scale story (100 TB): the index is ~16 bytes/row of parquet — three orders
of magnitude smaller than the data. A CDC delete batch of K keys costs one
broadcast of K hashes + a stats-pruned scan of the index, then a scan of just
the files that actually contain the keys. That is the same asymptotic shape
as the reference's hash lookup, expressed as a Catalyst plan.
"""

from __future__ import annotations

import os
import uuid
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moonlink_spark.table.manifest import FileEntry, Manifest

if TYPE_CHECKING:  # pragma: no cover
    from moonlink_spark.table.table import MoonlinkTable

KEYINDEX_DIR = "keyindex"
KEY_INDEX_PROP = "key_index"
# Hash algo tag recorded in the manifest; bump if the hash ever changes.
XXHASH64_ALGO = "spark-xxhash64-seed42"
# Rows per output index file (keeps one file per ~8M keys; parquet row
# groups inside remain the bucket granularity).
INDEX_FILE_ROWS = 8_000_000


def enabled(m: Manifest) -> bool:
    return isinstance(m.properties.get(KEY_INDEX_PROP), dict)


def index_entries(m: Manifest) -> list[dict[str, Any]]:
    cfg = m.properties.get(KEY_INDEX_PROP) or {}
    return list(cfg.get("entries", []))


def _key_hash(key_cols: list[str]):
    return F.xxhash64(*[F.col(c) for c in key_cols]).alias("h")


def _rel_fp(table: "MoonlinkTable"):
    """Normalize ``_metadata.file_path`` to a table-root-relative path that
    string-equals ``FileEntry.path`` in the manifest — the table's shared
    anchored normalization (table.rel_fp_expr), so index entries for
    external bulk-loaded files whose absolute path merely CONTAINS the
    data root stay intact."""
    from moonlink_spark.table.table import rel_fp_expr

    return rel_fp_expr(table.data_path)


def build_entries(
    table: "MoonlinkTable",
    files: list[FileEntry],
    key_cols: list[str],
) -> list[dict[str, Any]]:
    """Build index entries covering ``files`` (parity
    ``GlobalIndexBuilder::build_from_flush``): one Spark job reading only the
    new files, output sorted-by-hash parquet under ``keyindex/``."""
    if not files:
        return []
    schema = table.schema
    paths = [table._resolve(f.path) for f in files]
    df = (
        table.spark.read.schema(schema)
        .parquet(*paths)
        .select(
            _key_hash(key_cols),
            _rel_fp(table).alias("__fp"),
            F.col("_metadata.row_index").alias("__ri"),
        )
    )
    total_rows = sum(f.rows for f in files)
    n_out = max(1, -(-total_rows // INDEX_FILE_ROWS))
    if n_out == 1:
        df = df.coalesce(1).sortWithinPartitions("h")
    else:
        # range partitioning on h => disjoint per-file hash ranges; file and
        # row-group stats both prune at lookup time
        df = df.repartitionByRange(n_out, "h").sortWithinPartitions("h")
    rel_dir = f"{KEYINDEX_DIR}/ix-{uuid.uuid4().hex}"
    out_dir = os.path.join(table.data_path, rel_dir)
    df.write.mode("overwrite").parquet(out_dir)
    covers = [f.path for f in files]
    entries = []
    for name in sorted(table.data_fs.listdir(out_dir)):
        if not name.endswith(".parquet"):
            continue
        entries.append(
            {
                "path": f"{rel_dir}/{name}",
                "covers": covers,
                # per-FILE row count from its own footer: stamping the
                # batch total on every entry inflated exported blob
                # cardinality n_out-fold (review r10)
                "rows": _entry_rows(table, f"{rel_dir}/{name}"),
            }
        )
    return entries


def _entry_rows(table: "MoonlinkTable", rel: str) -> int:
    import pyarrow.parquet as pq

    return pq.ParquetFile(table._resolve(rel)).metadata.num_rows


def live_entries(m: Manifest) -> tuple[list[dict[str, Any]], set[str]]:
    """-> (index entries still useful, set of live data paths they cover).

    An entry whose covered files were all compacted away is dead weight and
    dropped from the returned list; partially-live entries stay (their stale
    rows are filtered at lookup by the live-file join)."""
    live_paths = {f.path for f in m.data_files}
    out: list[dict[str, Any]] = []
    covered: set[str] = set()
    for e in index_entries(m):
        alive = live_paths.intersection(e.get("covers", []))
        if alive:
            out.append(e)
            covered.update(alive)
    return out, covered


def candidate_files(
    table: "MoonlinkTable",
    m: Manifest,
    keys_df: DataFrame,
    key_cols: list[str],
    extra_files: list[FileEntry] | None = None,
) -> tuple[list[str], list[FileEntry]] | None:
    """Index lookup (parity ``GlobalIndex::search_values``): exact set of
    data files containing any of the keys.

    Returns ``(matching_covered_paths, uncovered_files)`` or ``None`` when
    the manifest has no index. ``uncovered_files`` (same-commit flushes and
    files whose index was invalidated by compaction) must still be scanned;
    correctness never depends on coverage."""
    if not enabled(m):
        return None
    entries, covered = live_entries(m)
    all_files = list(m.data_files) + list(extra_files or [])
    uncovered = [f for f in all_files if f.path not in covered]
    if not entries:
        return [], uncovered
    spark = table.spark
    idx = spark.read.parquet(
        *[table._resolve(e["path"]) for e in entries]
    )
    # hash over the TABLE's key types: xxhash64 is width-sensitive, so an
    # int-typed lookup against a bigint key column would silently miss
    # without the cast (the verify join would coerce, but the candidate
    # set would already have dropped the file)
    from moonlink_spark.schema import field_schema_to_struct

    schema = field_schema_to_struct(m.schema_fields)
    hashed = (
        keys_df.select(
            *[F.col(c).cast(schema[c].dataType).alias(c) for c in key_cols]
        )
        .dropDuplicates()
        .select(_key_hash(key_cols))
    )
    # broadcast the key-batch side: bounded by the micro-batch, never the
    # table; h min/max + row-group stats prune the index scan
    hits = (
        idx.join(F.broadcast(hashed), "h", "left_semi")
        .select("__fp")
        .distinct()
        .collect()
    )
    live_paths = {f.path for f in all_files}
    matching = sorted({r["__fp"] for r in hits} & live_paths)
    return matching, uncovered


def merge_index(table: "MoonlinkTable") -> bool:
    """Index maintenance (parity ``build_from_merge`` + the index-merge
    trigger, ``index_merge_config.rs``): union live index files, drop rows
    for dead data files, index any uncovered live files, rewrite as one
    sorted run. Returns False when the table has no index."""
    base = table.manifest
    if not enabled(base):
        return False
    from moonlink_spark.table.identity import IdentityProp

    ident = IdentityProp.from_json(base.identity)
    if ident.mode not in ("single", "keys"):
        return False
    key_cols = list(ident.columns)
    entries, covered = live_entries(base)
    live_paths = {f.path for f in base.data_files}
    uncovered = [f for f in base.data_files if f.path not in covered]

    parts: list[DataFrame] = []
    if entries:
        idx = table.spark.read.parquet(
            *[table._resolve(e["path"]) for e in entries]
        )
        # semi-join against a BROADCAST path list: isin() with one
        # literal per live file blows the Catalyst expression tree up at
        # the file counts this module advertises (1e5-1e6 live files)
        live_df = table.spark.createDataFrame(
            [(p,) for p in sorted(live_paths)], "__fp string"
        )
        parts.append(
            idx.join(F.broadcast(live_df), "__fp", "left_semi").select(
                "h", "__fp", "__ri"
            )
        )
    if uncovered:
        schema = table.schema
        parts.append(
            table.spark.read.schema(schema)
            .parquet(*[table._resolve(f.path) for f in uncovered])
            .select(
                _key_hash(key_cols),
                _rel_fp(table).alias("__fp"),
                F.col("_metadata.row_index").alias("__ri"),
            )
        )
    if not parts:
        new_entries: list[dict[str, Any]] = []
    else:
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        total_rows = sum(f.rows for f in base.data_files)
        n_out = max(1, -(-total_rows // INDEX_FILE_ROWS))
        if n_out == 1:
            df = df.coalesce(1).sortWithinPartitions("h")
        else:
            df = df.repartitionByRange(n_out, "h").sortWithinPartitions("h")
        rel_dir = f"{KEYINDEX_DIR}/ix-{uuid.uuid4().hex}"
        out_dir = os.path.join(table.data_path, rel_dir)
        df.write.mode("overwrite").parquet(out_dir)
        covers = sorted(live_paths)
        new_entries = [
            {
                "path": f"{rel_dir}/{n}",
                "covers": covers,
                "rows": _entry_rows(table, f"{rel_dir}/{n}"),
            }
            for n in sorted(table.data_fs.listdir(out_dir))
            if n.endswith(".parquet")
        ]
    cfg = dict(base.properties.get(KEY_INDEX_PROP) or {})
    cfg["entries"] = new_entries
    m = Manifest(
        version=base.version + 1,
        lsn=base.lsn,
        schema_fields=base.schema_fields,
        identity=base.identity,
        data_files=base.data_files,
        delete_files=base.delete_files,
        parent=base.version,
        operation="index-merge",
        properties={**base.properties, KEY_INDEX_PROP: cfg},
    )
    table.store.commit(m, allow_equal_lsn=True)
    return True
