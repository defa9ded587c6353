"""Crash-safety of the shared index segment store: readers resolve
through the meta's live-segment list, so no crash window can expose
duplicate rows."""

import os

from pyspark.sql import functions as F

from moonlink_spark.table import segments as segstore


def _meta(dest):
    return {"segments": None}


def test_reader_ignores_unpublished_segments(spark, tmp_path):
    dest = str(tmp_path / "idx")
    os.makedirs(dest)
    a = segstore.write_single_parquet(
        spark.range(0, 10).select(F.col("id")), dest, "seg"
    )
    # segment written but no meta lists it yet (a crashed writer): a
    # meta-resolved reader must not see it
    meta = {"segments": []}
    assert segstore.live_segment_paths(dest, meta, "seg") == []
    meta["segments"] = [a]
    assert segstore.read_segments(spark, dest, meta, "seg").count() == 10


def test_crash_between_merge_and_publish_is_invisible(spark, tmp_path):
    """Simulate compaction crashing AFTER writing the merged segment but
    BEFORE publishing the meta: readers still see exactly the old live
    set — never merged + originals together."""
    dest = str(tmp_path / "idx")
    os.makedirs(dest)
    a = segstore.write_single_parquet(spark.range(0, 10), dest, "seg")
    b = segstore.write_single_parquet(spark.range(10, 30), dest, "seg")
    meta = {"segments": [a, b]}

    class Boom(RuntimeError):
        pass

    def crashing_publish(m):
        raise Boom()

    try:
        segstore.compact_segments(spark, dest, dict(meta), "seg", crashing_publish)
        raise AssertionError("publish should have crashed")
    except Boom:
        pass
    # merged straggler exists on disk but the durable meta still lists
    # only [a, b]: the reader sees exactly 30 rows, no duplicates
    on_disk = segstore.scan_segment_names(dest, "seg")
    assert len(on_disk) == 3
    assert segstore.read_segments(spark, dest, meta, "seg").count() == 30


def test_crash_between_publish_and_unlink_is_consistent(spark, tmp_path):
    """Simulate a crash AFTER the meta publish but BEFORE the old files
    unlink: the published meta lists only the merged segment, so readers
    see the compacted content exactly once; stragglers are inert."""
    dest = str(tmp_path / "idx")
    os.makedirs(dest)
    a = segstore.write_single_parquet(spark.range(0, 10), dest, "seg")
    b = segstore.write_single_parquet(spark.range(10, 30), dest, "seg")
    published = {}

    class Boom(RuntimeError):
        pass

    def publish_then_crash(m):
        published.update(m)
        raise Boom()  # crash before compact_segments reaches the unlinks

    meta = {"segments": [a, b]}
    try:
        segstore.compact_segments(spark, dest, meta, "seg", publish_then_crash)
        raise AssertionError("unreachable")
    except Boom:
        pass
    # the durable state is the published meta: one merged segment
    assert len(published["segments"]) == 1
    df = segstore.read_segments(spark, dest, published, "seg")
    assert df.count() == 30
    assert df.select("id").distinct().count() == 30  # no duplicate rows
    # originals still on disk (never unlinked) — invisible to readers
    assert len(segstore.scan_segment_names(dest, "seg")) == 3
