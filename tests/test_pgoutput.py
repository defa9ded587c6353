"""pgoutput logical-replication decoder over recorded byte traces
(parity: pg_replicate/postgres_source.rs + conversions/cdc_event.rs —
the reference's replication client, re-expressed as a protocol parser
the sandbox can test without a Postgres server).

The fixtures below are hand-encoded per the public PostgreSQL protocol
documentation ("Logical Replication Message Formats") — the same bytes a
START_REPLICATION slot delivers in XLogData payloads."""

import datetime as dt
import struct
from decimal import Decimal

import pytest

from moonlink_spark.errors import SchemaError
from moonlink_spark.ingest.cdc import CdcSink
from moonlink_spark.ingest.pgoutput import (
    PgoutputDecoder,
    read_trace_file,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable

# --------------------------------------------------------------------------- #
# trace encoder (test-side only: stands in for a recorded WAL capture)
# --------------------------------------------------------------------------- #


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def begin(lsn: int, ts_us: int = 0, xid: int = 1) -> bytes:
    return b"B" + struct.pack(">QqI", lsn, ts_us, xid)


def commit(lsn: int, ts_us: int = 0) -> bytes:
    return b"C" + struct.pack(">BQQq", 0, lsn, lsn + 8, ts_us)


def relation(rel_id: int, name: str, cols, identity: str = "d") -> bytes:
    """cols: list of (flags, name, type_oid)."""
    out = b"R" + struct.pack(">I", rel_id) + _cstr("public") + _cstr(name)
    out += identity.encode() + struct.pack(">h", len(cols))
    for flags, cname, oid in cols:
        out += struct.pack(">B", flags) + _cstr(cname) + struct.pack(">Ii", oid, -1)
    return out


def tuple_data(values) -> bytes:
    """values: list of None | ('u',) | str (text value)."""
    out = struct.pack(">h", len(values))
    for v in values:
        if v is None:
            out += b"n"
        elif v == ("u",):
            out += b"u"
        else:
            b = str(v).encode()
            out += b"t" + struct.pack(">i", len(b)) + b
    return out


def insert(rel_id: int, values, xid: int | None = None) -> bytes:
    pre = struct.pack(">i", xid) if xid is not None else b""
    return b"I" + pre + struct.pack(">I", rel_id) + b"N" + tuple_data(values)


def update(rel_id, new_values, old_values=None, old_kind=b"O", xid=None) -> bytes:
    pre = struct.pack(">i", xid) if xid is not None else b""
    out = b"U" + pre + struct.pack(">I", rel_id)
    if old_values is not None:
        out += old_kind + tuple_data(old_values)
    return out + b"N" + tuple_data(new_values)


def delete(rel_id, values, kind=b"K", xid=None) -> bytes:
    pre = struct.pack(">i", xid) if xid is not None else b""
    return b"D" + pre + struct.pack(">I", rel_id) + kind + tuple_data(values)


def stream_start(xid: int) -> bytes:
    return b"S" + struct.pack(">iB", xid, 1)


def stream_stop() -> bytes:
    return b"E"


def stream_commit(xid: int, lsn: int) -> bytes:
    return b"c" + struct.pack(">iBQQq", xid, 0, lsn, lsn + 8, 0)


def stream_abort(xid: int) -> bytes:
    return b"A" + struct.pack(">ii", xid, xid)


USERS_REL = relation(
    16385, "users", [(1, "id", 20), (0, "name", 25), (0, "age", 23)]
)

# --------------------------------------------------------------------------- #


def test_decode_basic_transaction():
    d = PgoutputDecoder()
    trace = [
        begin(100),
        USERS_REL,
        insert(16385, ["1", "alice", "30"]),
        insert(16385, ["2", "bob", None]),
        update(16385, ["2", "bobby", "41"]),      # key unchanged: no old tuple
        delete(16385, ["1", None, None]),          # key-only old tuple
        commit(100),
    ]
    evs = list(d.decode_stream(trace))
    assert [e.op for e in evs] == [
        "begin", "insert", "insert", "update", "delete", "commit",
    ]
    assert evs[1].row == {"id": 1, "name": "alice", "age": 30}
    assert evs[2].row == {"id": 2, "name": "bob", "age": None}
    # default replica identity, key unchanged: old row is the new key cols
    assert evs[3].old_row == {"id": 2}
    assert evs[3].row == {"id": 2, "name": "bobby", "age": 41}
    # delete 'K' tuple strips the nulled non-key columns
    assert evs[4].row == {"id": 1}
    assert evs[5].lsn == 100
    assert d.stats.inserts == 2 and d.stats.relations == 1


def test_decode_all_supported_types():
    cols = [
        (1, "c_int8", 20), (0, "c_int4", 23), (0, "c_int2", 21),
        (0, "c_bool", 16), (0, "c_f4", 700), (0, "c_f8", 701),
        (0, "c_num", 1700), (0, "c_text", 25), (0, "c_vchar", 1043),
        (0, "c_uuid", 2950), (0, "c_bytea", 17), (0, "c_date", 1082),
        (0, "c_ts", 1114), (0, "c_tstz", 1184), (0, "c_time", 1083),
        (0, "c_json", 3802), (0, "c_unknown", 99999),
    ]
    d = PgoutputDecoder()
    trace = [
        begin(5),
        relation(1, "t", cols),
        insert(1, [
            "9007199254740993", "-7", "3",
            "t", "1.5", "-2.25",
            "12345.6789", "héllo", "v",
            "A0EEBC99-9C0B-4EF8-BB6D-6BB9BD380A11", "\\xdeadbeef",
            "2024-02-29", "2024-01-01 12:34:56.789", "2024-01-01 12:34:56+02",
            "23:59:59.5", '{"k": 1}', "whatever",
        ]),
        commit(5),
    ]
    row = [e for e in d.decode_stream(trace) if e.op == "insert"][0].row
    assert row["c_int8"] == 9007199254740993 and row["c_int2"] == 3
    assert row["c_bool"] is True
    assert row["c_f8"] == -2.25
    assert row["c_num"] == Decimal("12345.6789")
    assert row["c_text"] == "héllo"
    assert row["c_uuid"] == "a0eebc99-9c0b-4ef8-bb6d-6bb9bd380a11"
    assert row["c_bytea"] == b"\xde\xad\xbe\xef"
    assert row["c_date"] == dt.date(2024, 2, 29)
    assert row["c_ts"] == dt.datetime(2024, 1, 1, 12, 34, 56, 789000)
    assert row["c_tstz"].utcoffset() == dt.timedelta(hours=2)
    assert row["c_time"] == dt.time(23, 59, 59, 500000)
    assert row["c_json"] == '{"k": 1}'
    assert row["c_unknown"] == "whatever"  # util.rs:86 Utf8 fallback


def test_replica_identity_full_and_key_change():
    d = PgoutputDecoder()
    full_rel = relation(
        2, "f", [(1, "id", 20), (0, "v", 25)], identity="f"
    )
    trace = [
        begin(7),
        full_rel,
        # REPLICA IDENTITY FULL: updates carry the whole old tuple ('O')
        update(2, ["1", "new"], old_values=["1", "old"], old_kind=b"O"),
        # key change: old key arrives as 'K'
        update(2, ["9", "moved"], old_values=["1", None], old_kind=b"K"),
        delete(2, ["9", "moved"], kind=b"O"),
        commit(7),
    ]
    evs = [e for e in d.decode_stream(trace) if e.op in ("update", "delete")]
    assert evs[0].old_row == {"id": 1, "v": "old"}
    assert evs[1].old_row == {"id": 1}          # nulled non-key stripped
    assert evs[1].row == {"id": 9, "v": "moved"}
    assert evs[2].row == {"id": 9, "v": "moved"}


def test_unchanged_toast_handling():
    d = PgoutputDecoder()
    full_rel = relation(3, "t", [(1, "id", 20), (0, "blob", 25)], identity="f")
    trace = [
        begin(9), full_rel,
        # identity full: unchanged-toast 'u' column backfills from old
        update(3, ["1", ("u",)], old_values=["1", "big-old-value"], old_kind=b"O"),
        commit(9),
    ]
    ev = [e for e in d.decode_stream(trace) if e.op == "update"][0]
    assert ev.row == {"id": 1, "blob": "big-old-value"}

    # default identity: no old tuple to backfill from -> hard error, never
    # a silently-corrupt row
    d2 = PgoutputDecoder()
    d2.decode(begin(9))
    d2.decode(relation(3, "t", [(1, "id", 20), (0, "blob", 25)]))
    with pytest.raises(SchemaError):
        d2.decode(update(3, ["1", ("u",)]))


def test_streamed_transaction_v2():
    d = PgoutputDecoder()
    evs = list(d.decode_stream([
        USERS_REL,
        stream_start(77),
        insert(16385, ["1", "a", "1"], xid=77),
        stream_stop(),
        stream_start(77),
        insert(16385, ["2", "b", "2"], xid=77),
        stream_stop(),
        stream_commit(77, 500),
        stream_start(88),
        insert(16385, ["3", "c", "3"], xid=88),
        stream_stop(),
        stream_abort(88),
    ]))
    assert [(e.op, e.xact_id) for e in evs] == [
        ("insert", 77), ("insert", 77), ("stream_commit", 77),
        ("insert", 88), ("stream_abort", 88),
    ]
    assert evs[2].lsn == 500


def test_errors():
    d = PgoutputDecoder()
    with pytest.raises(SchemaError):
        d.decode(insert(999, ["1"]))       # DML before Relation
    with pytest.raises(SchemaError):
        d.decode(b"Z")                      # unknown tag
    d.decode(USERS_REL)
    with pytest.raises(SchemaError):
        # tuple arity mismatch vs relation
        d.decode(b"I" + struct.pack(">I", 16385) + b"N" + tuple_data(["1"]))
    # binary tuple format rejected loudly
    bad = b"I" + struct.pack(">I", 16385) + b"N" + struct.pack(">h", 3)
    bad += b"b" + struct.pack(">i", 1) + b"\x01" + b"n" + b"n"
    with pytest.raises(SchemaError):
        d.decode(bad)


def test_trace_file_roundtrip(tmp_path):
    frames = [begin(3), USERS_REL, insert(16385, ["5", "x", "1"]), commit(3)]
    p = tmp_path / "trace.bin"
    with open(p, "wb") as fh:
        for f in frames:
            fh.write(struct.pack(">I", len(f)) + f)
    assert list(read_trace_file(str(p))) == frames
    d = PgoutputDecoder()
    evs = list(d.decode_stream(read_trace_file(str(p))))
    assert [e.op for e in evs] == ["begin", "insert", "commit"]


def test_apply_recorded_trace_to_table(spark, tmp_path):
    """End-to-end: recorded pgoutput bytes -> decoder -> CdcSink ->
    MoonlinkTable, same sink the polling source (test_dbpoll) feeds —
    final scan matches the transaction algebra, LSN snapshots included."""
    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "t"),
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "name", "data_type": "string"},
            {"name": "age", "data_type": "int32"},
        ],
        IdentityProp.single("id"),
    )
    d = PgoutputDecoder()
    trace = [
        begin(10), USERS_REL,
        insert(16385, ["1", "alice", "30"]),
        insert(16385, ["2", "bob", "40"]),
        insert(16385, ["3", "carol", "50"]),
        commit(10),
        begin(20),
        update(16385, ["2", "bobby", "41"]),
        delete(16385, ["3", None, None]),
        insert(16385, ["4", "dave", "60"]),
        commit(20),
    ]
    stats = CdcSink(t).apply(d.decode_stream(trace))
    assert stats.inserts == 4 and stats.updates == 1 and stats.deletes == 1
    assert stats.commits == 2

    rows = {r.id: (r.name, r.age) for r in t.scan().collect()}
    assert rows == {1: ("alice", 30), 2: ("bobby", 41), 4: ("dave", 60)}
    # time travel to the first transaction's LSN
    rows10 = {r.id: r.name for r in t.scan(lsn=10).collect()}
    assert rows10 == {1: "alice", 2: "bob", 3: "carol"}


def test_trace_to_spool_to_streaming_pipeline(spark, tmp_path):
    """Full bridge: recorded pgoutput trace -> spool JSONL ->
    StreamingIngestor micro-batch merge -> table. The replication capture
    feeds the same Structured-Streaming path REST/dbpoll use."""
    import struct as _struct

    from moonlink_spark.ingest.pgoutput import pgoutput_trace_to_spool
    from moonlink_spark.streaming.pipeline import StreamingIngestor

    trace = str(tmp_path / "trace.bin")
    frames = [
        begin(100), USERS_REL,
        insert(16385, ["1", "a", "10"]), insert(16385, ["2", "b", "20"]),
        commit(100),
        begin(200),
        update(16385, ["2", "bb", "21"]),
        delete(16385, ["1", None, None]),
        insert(16385, ["3", "c", "30"]),
        commit(200),
    ]
    with open(trace, "wb") as fh:
        for f in frames:
            fh.write(_struct.pack(">I", len(f)) + f)

    spool = str(tmp_path / "spool")
    n = pgoutput_trace_to_spool(trace, spool)
    assert n == 5  # begin/commit markers elided, 5 DML lines

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "t"),
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "name", "data_type": "string"},
            {"name": "age", "data_type": "int32"},
        ],
        IdentityProp.single("id"),
    )
    ing = StreamingIngestor(
        t, source_dir=spool, checkpoint_dir=str(tmp_path / "ckpt")
    )
    ing.run_available()
    rows = {r.id: (r.name, r.age) for r in t.scan().collect()}
    assert rows == {2: ("bb", 21), 3: ("c", 30)}

    # an uncommitted trailing transaction contributes nothing
    with open(trace, "ab") as fh:
        for f in [begin(300), insert(16385, ["9", "x", "9"])]:
            fh.write(_struct.pack(">I", len(f)) + f)
    n2 = pgoutput_trace_to_spool(trace, str(tmp_path / "spool2"))
    assert n2 == 5  # same five committed lines, nothing from the tail


def test_malformed_frames_fail_as_schema_errors():
    """A corrupt spool frame or desynced relay must fail LOUD with a
    typed SchemaError naming the tag — never a raw struct/unicode error
    the tailer cannot attribute (review finding r9)."""
    import random

    from moonlink_spark.errors import MoonlinkError

    frames = [
        begin(100),
        relation(1, "t", [(1, "id", 20), (0, "v", 25)]),
        insert(1, ["1", "a"]),
        commit(100),
    ]
    for f in frames:
        for i in range(1, len(f)):
            d = PgoutputDecoder()
            for fr in frames:
                if fr is f:
                    break
                d.decode(fr)
            try:
                d.decode(f[:i])  # some prefixes still parse: fine
            except MoonlinkError:
                pass  # the only acceptable failure type
    rng = random.Random(5)
    for _ in range(2000):
        which = rng.randrange(len(frames))
        d = PgoutputDecoder()
        try:
            for j, fr in enumerate(frames):
                if j == which:
                    b = bytearray(fr)
                    for _ in range(rng.randint(1, 4)):
                        b[rng.randrange(len(b))] = rng.randrange(256)
                    d.decode(bytes(b))
                else:
                    d.decode(fr)
        except MoonlinkError:
            pass


def test_streamed_subxact_rows_stage_under_toplevel_xid():
    """Review r10: streamed DML carries the (SUB)transaction xid in its
    per-message prefix, but Stream Commit carries the TOPLEVEL xid —
    staging by the per-message xid stranded savepoint-written rows in a
    stream no commit referenced (silently lost)."""
    d = PgoutputDecoder()
    evs = [
        e
        for e in d.decode_stream([
            USERS_REL,
            stream_start(100),
            insert(16385, ["1", "a", "1"], xid=100),   # toplevel row
            insert(16385, ["2", "b", "2"], xid=101),   # savepoint row
            stream_stop(),
            stream_commit(100, 50),
        ])
        if e is not None
    ]
    dml = [e for e in evs if e.op == "insert"]
    assert [e.xact_id for e in dml] == [100, 100]  # BOTH under toplevel
    assert evs[-1].op == "stream_commit" and evs[-1].xact_id == 100


def test_streamed_subxact_abort_fails_loud():
    """A savepoint-only rollback cannot be excised from the toplevel
    stream's staging; it must fail loud, not silently abort everything."""
    d = PgoutputDecoder()
    frames = [
        USERS_REL, stream_start(100),
        insert(16385, ["1", "a", "1"], xid=100), stream_stop(),
        b"A" + struct.pack(">ii", 100, 101),  # subxid != xid
    ]
    with pytest.raises(SchemaError, match="subtransaction"):
        list(d.decode_stream(frames))


def test_truncate_fails_loud():
    """Review r10: silently skipping TRUNCATE left every pre-truncate
    row in the table forever (unreported divergence)."""
    d = PgoutputDecoder()
    with pytest.raises(SchemaError, match="TRUNCATE"):
        list(d.decode_stream([
            USERS_REL, begin(10),
            b"T" + struct.pack(">iBI", 1, 0, 16385),
        ]))


def test_reader_overrun_raises_schema_error():
    """Review r10: a corrupt frame declaring more bytes than remain must
    raise, not silently yield a truncated value."""
    d = PgoutputDecoder()
    list(d.decode_stream([begin(10), USERS_REL]))
    good = insert(16385, ["1", "abcdef", "1"])
    # truncate the frame mid-value: the declared text length overruns
    with pytest.raises(SchemaError):
        d.decode(good[:-4])
