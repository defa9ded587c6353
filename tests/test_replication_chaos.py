"""Seeded randomized chaos at the replication-protocol level (parity:
the reference's seeded chaos tests, table_handler/chaos_test.rs, applied
to the connector): random transactions — inserts/updates/deletes, some as
streamed xacts, some aborted — serialized as pgoutput frames, fed to the
tailer through RANDOM byte-sized appends (every torn-frame boundary gets
exercised), with occasional tailer restarts from checkpoint. The table
must equal a naive Python replay of the committed transactions."""

import random
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
REL = 16385


def frame(*payloads: bytes) -> bytes:
    return b"".join(struct.pack(">I", len(p)) + p for p in payloads)


def _gen_txn(rng: random.Random, lsn: int, model: dict, streamed: bool):
    """Generate one transaction's frames + the model effect if committed.
    The reference chaos invariant holds: deletes/updates only target rows
    that exist at generation time (committed model state)."""
    ops = []
    effects = []  # applied to model only on commit
    staged = dict(model)  # rows visible to later ops in this txn
    xid = rng.randrange(2, 1 << 20) if streamed else None
    n_ops = rng.randrange(1, 6)
    for _ in range(n_ops):
        choice = rng.random()
        if choice < 0.5 or not staged:
            rid = rng.randrange(0, 10_000)
            row = (rid, f"n{rng.randrange(100)}", rng.randrange(99))
            if rid in staged:  # keep it an insert of a fresh key
                continue
            ops.append(insert(REL, [str(row[0]), row[1], str(row[2])], xid=xid))
            staged[rid] = row[1:]
            effects.append(("put", rid, row[1:]))
        elif choice < 0.8:
            rid = rng.choice(sorted(staged))
            row = (rid, f"u{rng.randrange(100)}", rng.randrange(99))
            ops.append(update(REL, [str(row[0]), row[1], str(row[2])], xid=xid))
            staged[rid] = row[1:]
            effects.append(("put", rid, row[1:]))
        else:
            rid = rng.choice(sorted(staged))
            ops.append(delete(REL, [str(rid), None, None], xid=xid))
            del staged[rid]
            effects.append(("del", rid))

    if streamed:
        aborted = rng.random() < 0.3
        frames = [stream_start(xid), *ops, stream_stop()]
        if aborted:
            frames.append(stream_abort(xid))
            return frames, []
        frames.append(stream_commit(xid, lsn))
        return frames, effects
    return [begin(lsn), *ops, commit(lsn)], effects


@pytest.mark.parametrize("seed", [3, 77, 2024])
def test_replication_chaos(spark, tmp_path, seed):
    rng = random.Random(seed)
    t = MoonlinkTable.create(
        spark, str(tmp_path / f"rc{seed}"), FIELDS, IdentityProp.single("id")
    )
    trace = str(tmp_path / f"wal{seed}.bin")
    open(trace, "wb").close()
    tailer = ReplicationTailer(t, trace)

    model: dict[int, tuple] = {}
    pending = bytearray(frame(begin(1), USERS_REL, commit(1)))
    lsn = 10
    for _ in range(12):
        frames, effects = _gen_txn(rng, lsn, model, streamed=rng.random() < 0.4)
        pending += frame(*frames)
        for eff in effects:
            if eff[0] == "put":
                model[eff[1]] = eff[2]
            else:
                model.pop(eff[1], None)
        lsn += 10

        # append a RANDOM prefix of the pending bytes (torn frames), poll,
        # sometimes restart the tailer from its checkpoint
        cut = rng.randrange(0, len(pending) + 1)
        chunk, pending = pending[:cut], pending[cut:]
        with open(trace, "ab") as fh:
            fh.write(chunk)
        tailer.poll_once()
        if rng.random() < 0.3:
            tailer = ReplicationTailer(t, trace)  # checkpoint resume

    # flush the tail and drain
    with open(trace, "ab") as fh:
        fh.write(pending)
    tailer.poll_once()

    got = {r.id: (r.name, r.age) for r in t.scan().collect()}
    assert got == model, f"diverged from model (seed={seed})"


# --------------------------------------------------------------------------- #
# Wire-level chaos (round 12): the authenticated replication wire is the
# youngest transport path — kill it mid-SCRAM, truncate the TLS
# handshake, and kill the tailer at every streamed-chunk flush boundary.
# Reference parity: table_handler/chaos_test.rs:1-7 invariants (random
# faults, final state equals the committed model) applied to the wire.
# --------------------------------------------------------------------------- #

import os
import socket
import threading

from moonlink_spark.ingest.pgwire import ReplicationWireClient, ReplicationWireServer


def _startup_bytes(replication: bool = True) -> bytes:
    kv = [("user", "moonlink"), ("database", "postgres")]
    if replication:
        kv.append(("replication", "database"))
    params = b"".join(
        k.encode() + b"\x00" + v.encode() + b"\x00" for k, v in kv
    ) + b"\x00"
    body = struct.pack(">I", 196608) + params
    return struct.pack(">I", len(body) + 4) + body


def _auth_trace(tmp_path, name="wal_chaos.bin"):
    trace = str(tmp_path / name)
    with open(trace, "wb") as fh:
        fh.write(frame(
            begin(10), USERS_REL,
            insert(REL, ["1", "a", "1"]), insert(REL, ["2", "b", "2"]),
            commit(10),
        ))
    return trace


def test_mid_scram_client_disconnects_do_not_wedge_server(spark, tmp_path):
    """Clients that vanish mid-SCRAM (after SASLInitialResponse, before
    the proof) must not wedge the walsender: each handshake runs on its
    own connection thread, so a legit client right after N aborted ones
    authenticates and streams the full feed."""
    trace = _auth_trace(tmp_path)
    srv = ReplicationWireServer(
        trace, password="s3cret", auth="scram-sha-256"
    ).start()
    try:
        for _ in range(3):
            s = socket.create_connection((srv.host, srv.port), timeout=5)
            s.sendall(_startup_bytes())
            f = s.makefile("rb")
            head = f.read(5)  # 'R' AuthenticationSASL
            assert head[:1] == b"R"
            f.read(struct.unpack(">I", head[1:])[0] - 4)
            # SASLInitialResponse with a real-looking client-first, then
            # vanish before the server's challenge is answered
            cf = b"n,,n=moonlink,r=chaosnonce0000000000"
            body = (
                b"SCRAM-SHA-256\x00"
                + struct.pack(">I", len(cf))
                + cf
            )
            s.sendall(b"p" + struct.pack(">I", len(body) + 4) + body)
            f.read(5)  # server-first arrives (or peer detects close)
            s.close()

        t = MoonlinkTable.create(
            spark, str(tmp_path / "midscram_t"), FIELDS,
            IdentityProp.single("id"),
        )
        client = ReplicationWireClient(
            t, srv.host, srv.port, str(tmp_path / "spool_ms.bin"),
            password="s3cret",
        )
        assert client.stream_once()["commits"] == 1
        assert {r.id for r in t.scan().collect()} == {1, 2}
    finally:
        srv.stop()


def test_server_killed_mid_scram_client_fails_clean_then_resumes(
    spark, tmp_path
):
    """A server that dies after issuing the SCRAM challenge must surface
    a clean error on the client (no hang, no partial apply), and the
    SAME spool resumes against a healthy server with exactly-once
    application."""
    from moonlink_spark.pg_protocol import PgProtocolError

    killer_ready = threading.Event()
    killer = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    killer.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    killer.bind(("127.0.0.1", 0))
    killer.listen(1)
    kport = killer.getsockname()[1]

    def run_killer():
        killer_ready.set()
        conn, _ = killer.accept()
        f = conn.makefile("rb")
        f.read(4)  # startup length
        # drain the rest of the startup using that length? simpler: read
        # a bounded chunk — the client blocks on OUR next message anyway
        conn.recv(4096)
        # AuthenticationSASL advertising SCRAM, then die mid-handshake
        body = struct.pack(">I", 10) + b"SCRAM-SHA-256\x00\x00"
        conn.sendall(b"R" + struct.pack(">I", len(body) + 4) + body)
        conn.recv(4096)  # client's SASLInitialResponse
        conn.close()     # <- the kill: no server-first ever arrives
        killer.close()

    threading.Thread(target=run_killer, daemon=True).start()
    killer_ready.wait(5)

    t = MoonlinkTable.create(
        spark, str(tmp_path / "killsrv_t"), FIELDS, IdentityProp.single("id")
    )
    spool = str(tmp_path / "spool_kill.bin")
    client = ReplicationWireClient(
        t, "127.0.0.1", kport, spool, password="s3cret"
    )
    with pytest.raises((ConnectionError, PgProtocolError, OSError)):
        client.stream_once()
    assert t.scan().count() == 0
    assert not os.path.exists(spool) or os.path.getsize(spool) == 0

    trace = _auth_trace(tmp_path, "wal_kill.bin")
    srv = ReplicationWireServer(
        trace, password="s3cret", auth="scram-sha-256"
    ).start()
    try:
        retry = ReplicationWireClient(
            t, srv.host, srv.port, spool, password="s3cret"
        )
        assert retry.stream_once()["commits"] == 1
        assert {r.id for r in t.scan().collect()} == {1, 2}
    finally:
        srv.stop()


def test_tls_handshake_truncation_both_sides(spark, tmp_path):
    """TLS chaos in both directions: (a) a server that answers 'S' to
    SSLRequest and then closes mid-handshake must produce a clean client
    error; (b) a client that sends SSLRequest and vanishes before the
    handshake must not wedge the real TLS server — a legit TLS+SCRAM
    client right after it streams fine."""
    import ssl as _ssl

    from moonlink_spark.tlsutil import mint_test_tls

    # (a) truncating server
    trunc = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    trunc.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    trunc.bind(("127.0.0.1", 0))
    trunc.listen(1)
    tport = trunc.getsockname()[1]

    def run_trunc():
        conn, _ = trunc.accept()
        conn.recv(8)          # SSLRequest
        conn.sendall(b"S")    # promise TLS...
        conn.recv(4096)       # client's ClientHello
        conn.close()          # ...and die mid-handshake
        trunc.close()

    threading.Thread(target=run_trunc, daemon=True).start()
    t = MoonlinkTable.create(
        spark, str(tmp_path / "tlstrunc_t"), FIELDS, IdentityProp.single("id")
    )
    client = ReplicationWireClient(
        t, "127.0.0.1", tport, str(tmp_path / "spool_trunc.bin"),
        password="pw", sslmode="require",
    )
    with pytest.raises((_ssl.SSLError, ConnectionError, OSError)):
        client.stream_once()
    assert t.scan().count() == 0

    # (b) truncating client against the real TLS walsender
    tls = mint_test_tls(str(tmp_path / "tls_chaos"))
    trace = _auth_trace(tmp_path, "wal_tls.bin")
    srv = ReplicationWireServer(
        trace, password="s3cret", auth="scram-sha-256",
        ssl_cert=tls.cert_path, ssl_key=tls.key_path,
    ).start()
    try:
        for _ in range(3):
            s = socket.create_connection((srv.host, srv.port), timeout=5)
            s.sendall(struct.pack(">II", 8, 80877103))  # SSLRequest
            assert s.recv(1) == b"S"
            s.close()  # vanish before the TLS handshake
        t2 = MoonlinkTable.create(
            spark, str(tmp_path / "tlsok_t"), FIELDS, IdentityProp.single("id")
        )
        good = ReplicationWireClient(
            t2, srv.host, srv.port, str(tmp_path / "spool_tlsok.bin"),
            password="s3cret", sslmode="verify-full", ssl_ca_file=tls.ca_path,
        )
        assert good.stream_once()["commits"] == 1
        assert {r.id for r in t2.scan().collect()} == {1, 2}
    finally:
        srv.stop()


def test_tailer_killed_at_every_stream_chunk_boundary(spark, tmp_path):
    """The r11 chunk-batching fix (streamed DML buffers and flushes at
    stream boundaries) gets its crash test: a 4-chunk streamed
    transaction plus an interleaved plain transaction land chunk by
    chunk, and after EVERY chunk the tailer is killed (fresh tailer =
    fresh in-memory staging + fresh sink, resume from checkpoint). The
    final table must equal the committed model exactly — no lost chunk,
    no double-applied chunk, regardless of which boundary died."""
    t = MoonlinkTable.create(
        spark, str(tmp_path / "chunks_t"), FIELDS, IdentityProp.single("id")
    )
    trace = str(tmp_path / "wal_chunks.bin")
    open(trace, "wb").close()
    xid = 777
    chunks = [
        frame(begin(5), USERS_REL, commit(5)),
        frame(stream_start(xid),
              insert(REL, ["1", "a", "1"], xid=xid),
              insert(REL, ["2", "b", "2"], xid=xid),
              stream_stop()),
        frame(stream_start(xid),
              update(REL, ["1", "a2", "11"], xid=xid),
              stream_stop()),
        # a plain txn interleaves between the stream's chunks (what PG
        # does: streamed xacts share the WAL with small commits)
        frame(begin(20), insert(REL, ["50", "z", "9"]), commit(20)),
        frame(stream_start(xid),
              delete(REL, ["2", None, None], xid=xid),
              insert(REL, ["3", "c", "3"], xid=xid),
              stream_stop()),
        frame(stream_start(xid),
              update(REL, ["3", "c2", "33"], xid=xid),
              stream_stop(),
              stream_commit(xid, 40)),
    ]
    expected = {1: ("a2", 11), 3: ("c2", 33), 50: ("z", 9)}

    tailer = ReplicationTailer(t, trace)
    for chunk in chunks:
        with open(trace, "ab") as fh:
            fh.write(chunk)
        tailer.poll_once()
        tailer = ReplicationTailer(t, trace)  # kill at the boundary
    tailer.poll_once()
    got = {r.id: (r.name, r.age) for r in t.scan().collect()}
    assert got == expected


def test_crash_between_stream_commit_and_checkpoint(spark, tmp_path):
    """Kill AFTER the sink applied a stream_commit but BEFORE the
    checkpoint write (the exact window the module contract declares
    safe): the restarted tailer re-stages the whole streamed xact and
    must discard it as a replay — applied exactly once."""
    t = MoonlinkTable.create(
        spark, str(tmp_path / "ckpt_t"), FIELDS, IdentityProp.single("id")
    )
    trace = str(tmp_path / "wal_ckpt.bin")
    xid = 888
    with open(trace, "wb") as fh:
        fh.write(frame(
            begin(5), USERS_REL, commit(5),
            stream_start(xid),
            insert(REL, ["7", "g", "7"], xid=xid),
            insert(REL, ["8", "h", "8"], xid=xid),
            stream_stop(),
            stream_commit(xid, 30),
        ))

    tailer = ReplicationTailer(t, trace)
    orig_save = tailer._save_checkpoint
    calls = {"n": 0}

    def dying_save(boundary_pos):
        calls["n"] += 1
        if calls["n"] == 2:  # the save AFTER the stream_commit apply
            raise RuntimeError("killed before checkpoint")
        orig_save(boundary_pos)

    tailer._save_checkpoint = dying_save
    with pytest.raises(RuntimeError):
        tailer.poll_once()
    # the table HAS the txn, the checkpoint does not
    assert {r.id for r in t.scan().collect()} == {7, 8}

    restarted = ReplicationTailer(t, trace)
    stats = restarted.poll_once()
    assert stats["skipped_replays"] == 1 and stats["commits"] == 0
    got = {r.id: (r.name, r.age) for r in t.scan().collect()}
    assert got == {7: ("g", 7), 8: ("h", 8)}


def test_torn_spool_tail_truncated_and_resumed_over_wire(spark, tmp_path):
    """A relay client that crashed mid-spool-append leaves a TORN frame
    at the spool tail. The next client must truncate to the last
    complete frame and re-request the remainder from the server (spool
    length IS the wire position) — resuming at the raw byte size would
    skip the torn frame's tail and desync the relay framing forever."""
    trace = str(tmp_path / "wal_torn.bin")
    full = frame(
        begin(10), USERS_REL,
        insert(REL, ["1", "a", "1"]), insert(REL, ["2", "b", "2"]),
        commit(10),
        begin(20), insert(REL, ["3", "c", "3"]), commit(20),
    )
    with open(trace, "wb") as fh:
        fh.write(full)
    srv = ReplicationWireServer(trace).start()
    try:
        t = MoonlinkTable.create(
            spark, str(tmp_path / "torn_t"), FIELDS, IdentityProp.single("id")
        )
        spool = str(tmp_path / "spool_torn.bin")
        c1 = ReplicationWireClient(t, srv.host, srv.port, spool)
        assert c1.stream_once()["commits"] == 2
        size = os.path.getsize(spool)

        # crash shape: the tail of the spool is a torn frame (half of
        # the last frame's bytes re-appended then cut), checkpoint intact
        with open(spool, "rb") as fh:
            data = fh.read()
        with open(spool, "wb") as fh:
            fh.write(data[: size - 7])  # cut INSIDE the last frame
        # the feed also grew while the relay was down
        with open(trace, "ab") as fh:
            fh.write(frame(begin(30), insert(REL, ["4", "d", "4"]),
                           commit(30)))

        c2 = ReplicationWireClient(t, srv.host, srv.port, spool)
        s = c2.stream_once()
        # the torn frame was re-fetched from the wire plus the new txn
        assert s["commits"] == 1  # only txn 30 is NEW to the table
        got = {r.id: (r.name, r.age) for r in t.scan().collect()}
        assert got == {1: ("a", 1), 2: ("b", 2), 3: ("c", 3), 4: ("d", 4)}
        # and the spool healed to exactly the full feed bytes
        with open(spool, "rb") as fh:
            assert fh.read() == open(trace, "rb").read()
    finally:
        srv.stop()


def test_server_death_mid_stream_clean_error_and_resume(spark, tmp_path):
    """The walsender dying while the client sits in its receive loop
    must surface as a clean error (no hang, no partial-txn application
    beyond the tailer's own guarantees); a fresh client against a
    restarted server resumes from the spool with exactly-once apply."""
    trace = str(tmp_path / "wal_die.bin")
    with open(trace, "wb") as fh:
        fh.write(frame(
            begin(10), USERS_REL, insert(REL, ["1", "a", "1"]), commit(10),
        ))
    srv = ReplicationWireServer(trace, keepalive_idle_s=10.0).start()
    t = MoonlinkTable.create(
        spark, str(tmp_path / "die_t"), FIELDS, IdentityProp.single("id")
    )
    spool = str(tmp_path / "spool_die.bin")

    killer = threading.Timer(0.5, srv.stop)
    killer.start()
    c1 = ReplicationWireClient(t, srv.host, srv.port, spool)
    # with a 10s keepalive interval the client blocks in recv when the
    # server dies; it must fail with a clean connection error, not hang
    with pytest.raises((ConnectionError, OSError)):
        c1.stream_once(timeout_s=5.0)
    killer.join()

    srv2 = ReplicationWireServer(trace).start()
    try:
        c2 = ReplicationWireClient(t, srv2.host, srv2.port, spool)
        c2.stream_once()
        got = {r.id: (r.name, r.age) for r in t.scan().collect()}
        assert got == {1: ("a", 1)}
        # replay the whole feed once more: LSN floor keeps it a no-op
        c3 = ReplicationWireClient(t, srv2.host, srv2.port, spool)
        assert c3.stream_once()["commits"] == 0
    finally:
        srv2.stop()
