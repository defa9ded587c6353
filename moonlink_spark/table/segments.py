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

import contextlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession


@contextlib.contextmanager
def index_write_lock(
    dest: str, timeout_s: float = 600.0, stale_s: float = 3600.0
):
    """Single-writer mutual exclusion for one index directory.

    The CDC loop's incremental updates, the maintenance ticker's
    compaction, and full rebuilds all mutate the same meta; the meta
    write is a plain atomic replace (no compare-and-swap), so two
    concurrent writers could silently drop each other's just-published
    segments (the classic lost update). This lock serializes them on one
    host via an O_EXCL lock file carrying (pid, timestamp); a lock older
    than ``stale_s`` is presumed crashed and stolen. Cross-host
    deployments need a store-level CAS instead (the object-store seam's
    ``publish_exclusive``)."""
    import uuid as _uuid

    os.makedirs(dest, exist_ok=True)
    path = os.path.join(dest, ".write-lock")
    token = _uuid.uuid4().hex
    deadline = time.monotonic() + timeout_s
    while True:
        try:
            fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.write(
                fd,
                json.dumps(
                    {"pid": os.getpid(), "ts": time.time(), "token": token}
                ).encode(),
            )
            os.close(fd)
            break
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(path)
            except FileNotFoundError:
                continue  # released between open and stat: retry now
            if age > stale_s:
                # presumed-dead holder: steal via RENAME, not unlink —
                # rename is atomic and exactly ONE stealer succeeds; a
                # plain unlink let two waiters both remove (the second
                # removing the FIRST's fresh lock) and both acquire
                # (review r10)
                grave = f"{path}.stale-{_uuid.uuid4().hex}"
                try:
                    os.rename(path, grave)
                except FileNotFoundError:
                    continue  # someone else stole/released first
                with contextlib.suppress(FileNotFoundError):
                    os.unlink(grave)
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"index write lock at {path} held too long"
                ) from None
            time.sleep(0.05)
    try:
        yield
    finally:
        # release only if WE still hold it: a holder whose lock was
        # stolen must not remove the thief's fresh lock on exit
        try:
            with open(path) as fh:
                owner = json.load(fh).get("token")
        except (OSError, ValueError):
            owner = None
        if owner == token:
            with contextlib.suppress(FileNotFoundError):
                os.unlink(path)


def maybe_write_lock(dest: str, already_locked: bool):
    """The lock, or a no-op when the caller already holds it (rebuild
    flows lock once around scan-capture + build)."""
    return (
        contextlib.nullcontext()
        if already_locked
        else index_write_lock(dest)
    )


def write_single_parquet(df: DataFrame, dest: str, prefix: str) -> str:
    """Persist ``df`` as one parquet segment file; returns the file NAME
    (not path). The file is invisible to meta-resolved readers until the
    caller publishes a meta that lists it."""
    tmp = os.path.join(dest, f"_tmp-{uuid.uuid4().hex}")
    # repartition(1), NOT coalesce(1): coalesce propagates the 1-partition
    # constraint UP through every narrow op, so the whole upstream compute
    # (MinHash signatures, IVF/PQ assignment kernels) ran in one task; the
    # repartition shuffle barrier keeps the compute at full parallelism
    # and only the final write of the (small) index rows is single-task
    # (r12; sigindex build at sf0.1 measured 4.3s -> ~1.4s)
    df.repartition(1).write.mode("overwrite").parquet(tmp)
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
    read_meta=None,
) -> int:
    """Merge all live segments into one. ``publish_meta(meta)`` must
    atomically persist the given meta dict; it is called AFTER the merged
    segment exists, with ``segments`` set to the merged file (plus any
    segment a concurrent updater published meanwhile — see below).
    Returns the number of files replaced (0 if nothing to do).
    Stragglers from earlier crashes (written but never meta-referenced)
    are left on disk — readers never see them, and deleting them here
    could race a concurrent updater's just-written, not-yet-published
    segment.

    Legacy indexes (meta without ``segments``) are MIGRATED first: a meta
    listing the directory-scanned names is published before the merged
    segment is written, so directory-scan fallback readers can never see
    merged + originals simultaneously (permanent duplicates on a crash
    between merge-write and publish — the pre-r5 hole).

    ``read_meta()`` (no-arg callable returning the current on-disk meta)
    re-reads at the commit point so segments a concurrent ``update_index``
    published between our read and our publish survive in the final list
    instead of being silently dropped. Without it the caller accepts a
    single-writer requirement on the index directory."""
    live = meta.get("segments")
    if live is None:
        # Migrate to meta-resolved reads BEFORE any new file lands in the
        # live directory: from here on, readers ignore unlisted files.
        live = scan_segment_names(dest, prefix)
        meta["segments"] = list(live)
        publish_meta(meta)
    if len(live) <= 1:
        return 0
    merged_df = spark.read.parquet(
        *[os.path.join(dest, n) for n in live]
    )
    merged = write_single_parquet(merged_df, dest, prefix)
    old = list(live)
    final = meta
    concurrent: list[str] = []
    if read_meta is not None:
        try:
            current = read_meta()
        except FileNotFoundError:
            current = meta
        # keep any segment (and meta fields, e.g. a bumped generation) a
        # concurrent updater published after our initial read
        concurrent = [
            n for n in current.get("segments", []) if n not in old
        ]
        final = current
    final["segments"] = [merged] + concurrent
    publish_meta(final)  # the commit point: old segments are now dead
    for n in old:
        try:
            os.unlink(os.path.join(dest, n))
        except FileNotFoundError:
            pass
    return len(old)
