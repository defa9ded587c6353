"""Live-socket replication transport: pgoutput frames streamed over the
PostgreSQL copy-both wire protocol into the crash-safe tailer, with
standby status updates advancing the server's confirmed_flush_lsn
(parity: postgres_source.rs LogicalReplicationStream + :573)."""

import os
import struct
import time

from moonlink_spark.ingest.pgwire import (
    ReplicationWireClient,
    ReplicationWireServer,
    lsn_str,
    parse_lsn,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable
from tests.test_pgoutput import (
    USERS_REL,
    begin,
    commit,
    insert,
    update,
)

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "name", "data_type": "string"},
    {"name": "age", "data_type": "int32"},
]


def frame(*payloads: bytes) -> bytes:
    return b"".join(struct.pack(">I", len(p)) + p for p in payloads)


def _mk(spark, tmp_path, name="t"):
    return MoonlinkTable.create(
        spark, str(tmp_path / name), FIELDS, IdentityProp.single("id")
    )


def test_lsn_text_roundtrip():
    for v in [0, 1, 0xFFFFFFFF, 0x1_0000_0000, 0x7A_DEAD_BEEF]:
        assert parse_lsn(lsn_str(v)) == v


def test_stream_over_socket_applies_and_acks(spark, tmp_path):
    trace = str(tmp_path / "wal.bin")
    with open(trace, "wb") as fh:
        fh.write(frame(
            begin(10), USERS_REL,
            insert(16385, ["1", "a", "1"]), insert(16385, ["2", "b", "2"]),
            commit(10),
            begin(20), update(16385, ["2", "b2", "2"]), commit(20),
        ))
    srv = ReplicationWireServer(trace).start()
    try:
        t = _mk(spark, tmp_path)
        client = ReplicationWireClient(
            t, srv.host, srv.port, str(tmp_path / "spool.bin")
        )
        stats = client.stream_once()
        assert stats["frames"] == 8  # B,R,I,I,C + B,U,C
        assert stats["commits"] == 2
        assert stats["keepalives"] >= 1
        rows = {r["id"]: (r["name"], r["age"]) for r in t.scan().collect()}
        assert rows == {1: ("a", 1), 2: ("b2", 2)}
        # the ack loop advanced the slot's confirmed flush to the
        # tailer's checkpoint = the whole feed
        assert srv.confirmed_flush["moonlink"] == os.path.getsize(trace)
        assert srv.keepalives_sent >= 1
    finally:
        srv.stop()


def test_reconnect_resumes_without_duplicates(spark, tmp_path):
    """Disconnect between transactions; the feed grows; a NEW client
    session resumes from the relay position — nothing re-applied, new
    commits land exactly once (confirmed_flush_lsn resume parity)."""
    trace = str(tmp_path / "wal.bin")
    with open(trace, "wb") as fh:
        fh.write(frame(
            begin(10), USERS_REL, insert(16385, ["1", "a", "1"]), commit(10),
        ))
    srv = ReplicationWireServer(trace).start()
    try:
        t = _mk(spark, tmp_path)
        spool = str(tmp_path / "spool.bin")
        c1 = ReplicationWireClient(t, srv.host, srv.port, spool)
        assert c1.stream_once()["commits"] == 1
        assert t.scan().count() == 1

        # feed grows while no client is connected
        with open(trace, "ab") as fh:
            fh.write(frame(
                begin(20), insert(16385, ["2", "b", "2"]), commit(20),
            ))
        # fresh client object (new process shape): resume point comes
        # from the spool, not from in-memory state
        c2 = ReplicationWireClient(t, srv.host, srv.port, spool)
        s = c2.stream_once()
        assert s["commits"] == 1  # only the NEW transaction
        assert s["frames"] == 3
        assert t.scan().count() == 2
        # replaying the whole stream into the same table is a no-op
        # (crash-before-checkpoint shape): wipe the spool, keep the table
        os.unlink(spool)
        os.unlink(spool + ".checkpoint")
        c3 = ReplicationWireClient(t, srv.host, srv.port, spool)
        s3 = c3.stream_once()
        assert s3["commits"] == 0  # both commits skipped by the LSN floor
        assert t.scan().count() == 2
    finally:
        srv.stop()


def test_keepalives_flow_on_idle_feed(spark, tmp_path):
    trace = str(tmp_path / "wal.bin")
    open(trace, "wb").close()  # empty feed: nothing but keepalives
    srv = ReplicationWireServer(trace).start()
    try:
        t = _mk(spark, tmp_path)
        client = ReplicationWireClient(
            t, srv.host, srv.port, str(tmp_path / "spool.bin")
        )
        stats = client.stream_once(idle_rounds=2)
        assert stats["frames"] == 0
        assert stats["keepalives"] == 2
        assert stats["commits"] == 0
    finally:
        srv.stop()


def test_live_tail_frames_written_mid_session(spark, tmp_path):
    """Frames appended WHILE the client is connected are delivered on the
    same session (the live-socket property the file tailer lacked)."""
    import threading

    trace = str(tmp_path / "wal.bin")
    with open(trace, "wb") as fh:
        fh.write(frame(begin(10), USERS_REL,
                       insert(16385, ["1", "a", "1"]), commit(10)))
    srv = ReplicationWireServer(trace).start()
    try:
        t = _mk(spark, tmp_path)
        client = ReplicationWireClient(
            t, srv.host, srv.port, str(tmp_path / "spool.bin")
        )

        def late_producer():
            time.sleep(0.15)
            with open(trace, "ab") as fh:
                fh.write(frame(
                    begin(20), insert(16385, ["2", "b", "2"]), commit(20),
                ))

        prod = threading.Thread(target=late_producer)
        prod.start()
        stats = client.stream_once(idle_rounds=8)
        prod.join()
        assert stats["commits"] == 2  # both txns in ONE session
        assert t.scan().count() == 2
    finally:
        srv.stop()


# --------------------------------------------------------------------------- #
# Authenticated replication connections (round 11): the replication wire
# runs the SAME startup/auth path as the query wire — SCRAM, TLS with
# channel binding, and walsender gating (replication=database required).
# Reference parity: postgres_source.rs:532+ connects authenticated.
# --------------------------------------------------------------------------- #


def _trace(tmp_path, name="wal_auth.bin"):
    trace = str(tmp_path / name)
    with open(trace, "wb") as fh:
        fh.write(frame(
            begin(10), USERS_REL,
            insert(16385, ["1", "a", "1"]), insert(16385, ["2", "b", "2"]),
            commit(10),
        ))
    return trace


def test_scram_authenticated_replication_stream(spark, tmp_path):
    trace = _trace(tmp_path)
    srv = ReplicationWireServer(
        trace, password="s3cret", auth="scram-sha-256"
    ).start()
    try:
        t = _mk(spark, tmp_path, "auth_t")
        client = ReplicationWireClient(
            t, srv.host, srv.port, str(tmp_path / "spool_auth.bin"),
            password="s3cret",
        )
        stats = client.stream_once()
        assert stats["commits"] == 1
        rows = {r["id"]: r["name"] for r in t.scan().collect()}
        assert rows == {1: "a", 2: "b"}
        assert srv.confirmed_flush["moonlink"] == os.path.getsize(trace)
    finally:
        srv.stop()


def test_wrong_password_replication_refused(spark, tmp_path):
    from moonlink_spark.pg_protocol import PgServerError

    trace = _trace(tmp_path)
    srv = ReplicationWireServer(
        trace, password="s3cret", auth="scram-sha-256"
    ).start()
    try:
        t = _mk(spark, tmp_path, "badpw_t")
        client = ReplicationWireClient(
            t, srv.host, srv.port, str(tmp_path / "spool_bad.bin"),
            password="wrong",
        )
        import pytest

        # the SPECIFIC 28P01 auth refusal — an unrelated failure must
        # not vacuously pass this test (review r11)
        with pytest.raises(PgServerError) as ei:
            client.stream_once()
        assert ei.value.fields.get("C") == "28P01"
        assert t.scan().count() == 0
    finally:
        srv.stop()


def test_non_replication_connection_rejected(tmp_path):
    """A plain (no replication=database) authenticated session must not
    reach START_REPLICATION — walsender gating, like real PG."""
    from moonlink_spark.pg_protocol import PgServerError, PgWireClient

    trace = _trace(tmp_path)
    srv = ReplicationWireServer(trace, password="pw").start()
    try:
        import pytest

        with pytest.raises((PgServerError, ConnectionError, OSError)):
            # connects + authenticates WITHOUT the replication param:
            # the server refuses before ReadyForQuery
            PgWireClient(srv.host, srv.port, password="pw")
    finally:
        srv.stop()


def test_tls_scram_plus_replication_stream(spark, tmp_path):
    """Replication over TLS with SCRAM-SHA-256-PLUS channel binding:
    the client pins the CA (verify-full) and the -PLUS proof binds to
    the server cert this connection handshook with."""
    from moonlink_spark.tlsutil import mint_test_tls

    tls = mint_test_tls(str(tmp_path / "tls"))
    trace = _trace(tmp_path)
    srv = ReplicationWireServer(
        trace,
        password="s3cret",
        auth="scram-sha-256",
        ssl_cert=tls.cert_path,
        ssl_key=tls.key_path,
    ).start()
    try:
        t = _mk(spark, tmp_path, "tls_t")
        client = ReplicationWireClient(
            t, srv.host, srv.port, str(tmp_path / "spool_tls.bin"),
            password="s3cret",
            sslmode="verify-full",
            ssl_ca_file=tls.ca_path,
        )
        stats = client.stream_once()
        assert stats["commits"] == 1
        rows = {r["id"]: r["name"] for r in t.scan().collect()}
        assert rows == {1: "a", 2: "b"}
    finally:
        srv.stop()
