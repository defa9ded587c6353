"""ReplicationTailer: incremental pgoutput feed -> table with checkpointed
resume (parity: postgres_source.rs confirmed_flush_lsn resume loop)."""

import os
import struct

import pytest

from moonlink_spark.ingest.replication import ReplicationTailer
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable
from tests.test_pgoutput import (
    USERS_REL,
    begin,
    commit,
    delete,
    insert,
    relation,
    stream_abort,
    stream_commit,
    stream_start,
    stream_stop,
    update,
)

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "name", "data_type": "string"},
    {"name": "age", "data_type": "int32"},
]


def frame(*payloads: bytes) -> bytes:
    return b"".join(struct.pack(">I", len(p)) + p for p in payloads)


def make_table(spark, tmp_path, name="t"):
    return MoonlinkTable.create(
        spark, str(tmp_path / name), FIELDS, IdentityProp.single("id")
    )


def test_tail_growing_feed(spark, tmp_path):
    trace = str(tmp_path / "feed.bin")
    t = make_table(spark, tmp_path)
    tailer = ReplicationTailer(t, trace)

    # nothing yet
    assert tailer.poll_once()["commits"] == 0

    with open(trace, "wb") as fh:
        fh.write(frame(
            begin(10), USERS_REL,
            insert(16385, ["1", "a", "1"]), insert(16385, ["2", "b", "2"]),
            commit(10),
        ))
    s = tailer.poll_once()
    assert s["commits"] == 1 and s["lsn"] == 10
    assert t.scan().count() == 2

    # feed grows: another transaction appended later
    with open(trace, "ab") as fh:
        fh.write(frame(
            begin(20), update(16385, ["2", "bb", "22"]),
            delete(16385, ["1", None, None]), commit(20),
        ))
    s = tailer.poll_once()
    assert s["commits"] == 1 and s["lsn"] == 20
    rows = {r.id: r.name for r in t.scan().collect()}
    assert rows == {2: "bb"}


def test_partial_transaction_not_applied_then_completed(spark, tmp_path):
    trace = str(tmp_path / "feed.bin")
    t = make_table(spark, tmp_path)
    tailer = ReplicationTailer(t, trace)
    with open(trace, "wb") as fh:
        fh.write(frame(begin(5), USERS_REL, insert(16385, ["1", "a", "1"])))
    s = tailer.poll_once()
    assert s["commits"] == 0 and t.scan().count() == 0
    with open(trace, "ab") as fh:
        fh.write(frame(insert(16385, ["2", "b", "2"]), commit(5)))
    s = tailer.poll_once()
    assert s["commits"] == 1 and t.scan().count() == 2


def test_torn_tail_frame_waits(spark, tmp_path):
    trace = str(tmp_path / "feed.bin")
    t = make_table(spark, tmp_path)
    tailer = ReplicationTailer(t, trace)
    full = frame(begin(5), USERS_REL, insert(16385, ["1", "a", "1"]), commit(5))
    with open(trace, "wb") as fh:
        fh.write(full[:len(full) - 7])  # producer mid-write
    assert tailer.poll_once()["commits"] == 0
    with open(trace, "ab") as fh:
        fh.write(full[len(full) - 7:])
    assert tailer.poll_once()["commits"] == 1
    assert t.scan().count() == 1


def test_crash_resume_skips_replayed_commit(spark, tmp_path):
    """Crash between table commit and checkpoint write: the new tailer
    re-reads the transaction and skips it via the LSN floor."""
    trace = str(tmp_path / "feed.bin")
    t = make_table(spark, tmp_path)
    tailer = ReplicationTailer(t, trace)
    with open(trace, "wb") as fh:
        fh.write(frame(
            begin(10), USERS_REL, insert(16385, ["1", "a", "1"]), commit(10),
            begin(20), insert(16385, ["2", "b", "2"]), commit(20),
        ))
    tailer.poll_once()
    assert t.scan().count() == 2

    # simulate the crash window: roll the checkpoint back to zero
    os.remove(tailer.checkpoint_path)
    t2_count_before = t.manifest.version
    tailer2 = ReplicationTailer(t, trace)
    s = tailer2.poll_once()
    assert s["skipped_replays"] == 2 and s["commits"] == 0
    assert t.scan().count() == 2
    assert t.manifest.version == t2_count_before
    # and new work after the replay still applies
    with open(trace, "ab") as fh:
        fh.write(frame(begin(30), insert(16385, ["3", "c", "3"]), commit(30)))
    assert tailer2.poll_once()["commits"] == 1
    assert t.scan().count() == 3


def test_checkpoint_resume_exact_position(spark, tmp_path):
    """A clean restart resumes from the byte position after the last
    commit — no re-decode, no skipped counters."""
    trace = str(tmp_path / "feed.bin")
    t = make_table(spark, tmp_path)
    ReplicationTailer(t, trace)  # writes nothing yet
    with open(trace, "wb") as fh:
        fh.write(frame(begin(10), USERS_REL, insert(16385, ["1", "a", "1"]),
                       commit(10)))
    t1 = ReplicationTailer(t, trace)
    t1.poll_once()
    with open(trace, "ab") as fh:
        fh.write(frame(begin(20), insert(16385, ["2", "b", "2"]), commit(20)))
    # the relation registry travels with the checkpoint: the restarted
    # tailer decodes DML without a re-sent Relation frame
    t2 = ReplicationTailer(t, trace)
    s = t2.poll_once()
    assert s["skipped_replays"] == 0 and s["commits"] == 1
    assert t.scan().count() == 2
    assert {r.id for r in t.scan().collect()} == {1, 2}


def test_streamed_xact_across_polls_with_crash(spark, tmp_path):
    trace = str(tmp_path / "feed.bin")
    t = make_table(spark, tmp_path)
    tailer = ReplicationTailer(t, trace)
    with open(trace, "wb") as fh:
        fh.write(frame(
            USERS_REL,
            stream_start(77), insert(16385, ["1", "a", "1"], xid=77),
            stream_stop(),
        ))
    s = tailer.poll_once()
    assert s["events"] == 1 and t.scan().count() == 0  # staged, not visible

    with open(trace, "ab") as fh:
        fh.write(frame(
            stream_start(77), insert(16385, ["2", "b", "2"], xid=77),
            stream_stop(), stream_commit(77, 500),
        ))
    s = tailer.poll_once()
    assert s["commits"] == 1 and t.scan().count() == 2
    assert t.last_lsn == 500

    # crash AFTER commit but BEFORE checkpoint would have been the risky
    # window; simulate a full restart with a deleted checkpoint: the whole
    # stream replays, the re-staged state is aborted, table unchanged
    os.remove(tailer.checkpoint_path)
    tailer3 = ReplicationTailer(t, trace)
    s = tailer3.poll_once()
    assert s["skipped_replays"] == 1
    assert t.scan().count() == 2 and t.last_lsn == 500


def test_streamed_abort_discards(spark, tmp_path):
    trace = str(tmp_path / "feed.bin")
    t = make_table(spark, tmp_path)
    tailer = ReplicationTailer(t, trace)
    with open(trace, "wb") as fh:
        fh.write(frame(
            USERS_REL,
            stream_start(9), insert(16385, ["1", "a", "1"], xid=9),
            stream_stop(), stream_abort(9),
        ))
    s = tailer.poll_once()
    assert s["commits"] == 0
    assert t.scan().count() == 0


def test_dml_outside_transaction_rejected(spark, tmp_path):
    trace = str(tmp_path / "feed.bin")
    t = make_table(spark, tmp_path)
    tailer = ReplicationTailer(t, trace)
    with open(trace, "wb") as fh:
        fh.write(frame(USERS_REL, insert(16385, ["1", "a", "1"])))
    with pytest.raises(ValueError, match="outside a transaction"):
        tailer.poll_once()


def test_stale_checkpoint_behind_table_unwedges(spark, tmp_path):
    """Review r10: crash BETWEEN the table commit and the checkpoint write
    leaves the checkpoint lsn behind table.last_lsn; the old resume used
    the stale lsn, re-applied the committed txn, and wedged in an
    LsnError crash loop. Resume must take max(checkpoint, table)."""
    import shutil

    trace = str(tmp_path / "feed.bin")
    t = make_table(spark, tmp_path)
    tailer = ReplicationTailer(t, trace)
    with open(trace, "wb") as fh:
        fh.write(frame(
            begin(10), USERS_REL, insert(16385, ["1", "a", "1"]), commit(10),
        ))
    tailer.poll_once()
    stale = str(tmp_path / "stale.ckpt")
    shutil.copy(tailer.checkpoint_path, stale)  # checkpoint as of lsn 10
    with open(trace, "ab") as fh:
        fh.write(frame(begin(20), insert(16385, ["2", "b", "2"]), commit(20)))
    tailer.poll_once()  # table now at lsn 20
    assert t.scan().count() == 2
    # the crash window: checkpoint rolled back, table ahead
    shutil.copy(stale, tailer.checkpoint_path)
    tailer2 = ReplicationTailer(t, trace)
    s = tailer2.poll_once()
    assert s["skipped_replays"] == 1 and s["commits"] == 0
    assert t.scan().count() == 2
    # and the tailer is NOT wedged: new work applies
    with open(trace, "ab") as fh:
        fh.write(frame(begin(30), insert(16385, ["3", "c", "3"]), commit(30)))
    assert tailer2.poll_once()["commits"] == 1
    assert t.scan().count() == 3


def test_streamed_txn_with_no_dml_is_empty_commit(spark, tmp_path):
    """Review r10: a streamed transaction whose frames decode to no DML
    for this table (logical messages only) used to raise TransactionError
    ('unknown xact') on stream-commit — a permanent crash loop. It is a
    legal EMPTY transaction."""
    trace = str(tmp_path / "feed.bin")
    t = make_table(spark, tmp_path)
    tailer = ReplicationTailer(t, trace)
    with open(trace, "wb") as fh:
        fh.write(frame(
            begin(10), USERS_REL, insert(16385, ["1", "a", "1"]), commit(10),
            stream_start(700), stream_stop(), stream_commit(700, 20),
        ))
    s = tailer.poll_once()
    assert s["commits"] == 2  # the normal txn + the empty streamed one
    assert t.scan().count() == 1
    # an abort of an unknown/empty stream is equally a no-op
    with open(trace, "ab") as fh:
        fh.write(frame(
            stream_start(701), stream_stop(), stream_abort(701),
            begin(30), insert(16385, ["2", "b", "2"]), commit(30),
        ))
    s2 = tailer.poll_once()
    assert s2["commits"] == 1
    assert t.scan().count() == 2


def test_streamed_chunk_batches_into_sink(spark, tmp_path):
    """Review r11: the tailer forwarded streamed DML one event per
    sink.apply() call, so the sink's per-key squash saw runs of length
    1 and an update-heavy streamed transaction still staged one DV job
    per event. A chunk must reach the sink as ONE batch (flushed at
    stream boundaries), with results identical to per-event replay."""
    trace = str(tmp_path / "wal.bin")
    payloads = [begin(10), USERS_REL]
    payloads += [insert(16385, [str(i), "a", "1"]) for i in range(60)]
    payloads.append(commit(10))
    # one streamed txn: a 50-update + 10-delete chunk
    payloads.append(stream_start(7))
    payloads += [
        update(16385, [str(i), "upd", "2"], xid=7) for i in range(50)
    ]
    payloads += [
        delete(16385, [str(i), None, None], xid=7) for i in range(50, 60)
    ]
    payloads.append(stream_stop())
    payloads.append(stream_commit(7, 100))
    with open(trace, "wb") as fh:
        fh.write(frame(*payloads))

    t = make_table(spark, tmp_path, "batched")
    tailer = ReplicationTailer(t, trace)
    applies = []
    orig = tailer.sink.apply

    def counting_apply(events):
        events = list(events)
        applies.append(len(events))
        return orig(events)

    tailer.sink.apply = counting_apply
    stats = tailer.poll_once()
    assert stats["commits"] == 2
    # the 60-event streamed chunk arrived as ONE batch, not 60
    assert 60 in applies, applies
    assert len(applies) <= 4, applies  # plain txn + chunk + stream_commit
    rows = {r["id"]: (r["name"], r["age"]) for r in t.scan().collect()}
    assert len(rows) == 50
    assert all(v == ("upd", 2) for v in rows.values())
