"""Shared segment-store primitives for the persisted indexes
(``sigindex.py`` — MinHash signatures; ``vecindex.py`` — IVF inverted
lists).

The durability protocol (parity with ``ManifestStore``'s single-winner
commits and the reference's index-segment lifecycle,
``persisted_bucket_hash_map.rs:486-574``):

- every segment is ONE immutable parquet file written via a tmp dir +
  ``os.replace`` (atomic on POSIX);
- the index meta JSON (itself atomically replaced) carries the list of
  LIVE segment file names; readers resolve through the meta, so a
  segment only becomes visible when the meta naming it lands;
- compaction writes the merged segment FIRST, then atomically publishes
  a meta listing only the merged file, then unlinks the old files. A
  crash between publish and unlink leaves unreferenced stragglers that
  readers simply never see — never duplicate rows
  (the flaw in the pre-r4s4 replace-then-unlink order, where a crash
  mid-unlink left merged + originals simultaneously visible).

Indexes written before the meta carried ``segments`` fall back to the
prefix directory scan they used originally.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def write_single_parquet(df: DataFrame, dest: str, prefix: str) -> str:
    """Persist ``df`` as one parquet segment file; returns the file NAME
    (not path). The file is invisible to meta-resolved readers until the
    caller publishes a meta that lists it."""
    tmp = os.path.join(dest, f"_tmp-{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [n for n in os.listdir(tmp) if n.endswith(".parquet")]
    assert len(part) == 1
    name = f"{prefix}-{uuid.uuid4().hex}.parquet"
    os.replace(os.path.join(tmp, part[0]), os.path.join(dest, name))
    shutil.rmtree(tmp, ignore_errors=True)
    return name


def scan_segment_names(dest: str, prefix: str) -> list[str]:
    """Prefix directory scan — the pre-``segments``-meta fallback."""
    return sorted(
        n
        for n in os.listdir(dest)
        if n.startswith(f"{prefix}-") and n.endswith(".parquet")
    )


def live_segment_paths(dest: str, meta: dict, prefix: str) -> list[str]:
    """Paths of the segments a reader may see: the meta's ``segments``
    list when present (crash-consistent), else the directory scan."""
    names = meta.get("segments")
    if names is None:
        names = scan_segment_names(dest, prefix)
    return [os.path.join(dest, n) for n in names]


def read_segments(
    spark: SparkSession, dest: str, meta: dict, prefix: str
) -> DataFrame:
    return spark.read.parquet(*live_segment_paths(dest, meta, prefix))


def compact_segments(
    spark: SparkSession,
    dest: str,
    meta: dict,
    prefix: str,
    publish_meta,
) -> int:
    """Merge all live segments into one. ``publish_meta(meta)`` must
    atomically persist the (mutated) meta — it is called exactly once,
    AFTER the merged segment exists and with ``meta['segments']`` set to
    just the merged file. Returns the number of files replaced (0 if
    nothing to do). Stragglers from earlier crashes (written but never
    meta-referenced) are left on disk — readers never see them, and
    deleting them here could race a concurrent updater's just-written,
    not-yet-published segment."""
    live = meta.get("segments")
    if live is None:
        live = scan_segment_names(dest, prefix)
    if len(live) <= 1:
        return 0
    merged_df = spark.read.parquet(
        *[os.path.join(dest, n) for n in live]
    )
    merged = write_single_parquet(merged_df, dest, prefix)
    old = list(live)
    meta["segments"] = [merged]
    publish_meta(meta)  # the commit point: readers now see ONLY merged
    for n in old:
        try:
            os.unlink(os.path.join(dest, n))
        except FileNotFoundError:
            pass
    return len(old)
