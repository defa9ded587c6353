"""Initial copy over the COPY protocol (parity pg_replicate/
initial_copy.rs + initial_copy_writer.rs, e2e shape mirroring
src/moonlink_backend/tests/test_initial_copy.rs): sharded COPY readers
on executor sockets under one exported snapshot, boundary-LSN commit,
and CDC switchover where the LSN floor drops exactly the prefix the
snapshot already contains — while writes race the copy."""

import threading

import pytest

from moonlink_spark.ingest.initial_copy import (
    plan_rowid_shards,
    wire_initial_copy,
)
from moonlink_spark.pg_protocol import (
    PgMockServer,
    PgWireClient,
    parse_wal_lsn,
)
from moonlink_spark.streaming.pipeline import apply_cdc_batch, cdc_event_schema
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "name", "data_type": "string"},
]


@pytest.fixture()
def pg(tmp_path):
    srv = PgMockServer(str(tmp_path / "src.db")).start()
    yield srv
    srv.stop()


def _seed(pg, n, chunk=500):
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE src (id INTEGER, name TEXT)")
    for base in range(0, n, chunk):
        vals = ", ".join(
            f"({i}, 'seed{i}')" for i in range(base, min(base + chunk, n))
        )
        c.query(f"INSERT INTO src VALUES {vals}")
    c.close()


def test_plan_rowid_shards():
    shards = plan_rowid_shards(1, 100, 4)
    assert [s[0] for s in shards] == [0, 1, 2, 3]
    assert shards[0][1] == 1
    # contiguous, no gaps or overlap
    for (_, _, hi), (_, lo, _) in zip(shards, shards[1:]):
        assert lo == hi + 1
    # last shard is unbounded above (rows in the snapshot tail still land)
    assert shards[-1][2] == 2**62
    assert plan_rowid_shards(5, 5, 8) == [(0, 5, 2**62)]
    assert plan_rowid_shards(3, 2, 4) == []


def test_snapshot_isolated_from_later_writes(pg):
    _seed(pg, 10)
    ctl = PgWireClient(pg.host, pg.port)
    r = ctl.query("SELECT pg_export_snapshot(), pg_current_wal_lsn()")
    snap, lsn_text = r.rows[0]
    assert parse_wal_lsn(lsn_text) == 10
    # a write AFTER export is invisible through the snapshot, on ANY conn
    w = PgWireClient(pg.host, pg.port)
    w.query("INSERT INTO src VALUES (99, 'late')")
    w.close()
    other = PgWireClient(pg.host, pg.port)
    other.query(f"SET TRANSACTION SNAPSHOT '{snap}'")
    assert other.query("SELECT COUNT(*) AS n FROM src").rows == [("10",)]
    other.close()
    assert ctl.query("SELECT COUNT(*) AS n FROM src").rows == [("11",)]
    ctl.close()


def test_wire_initial_copy_seeds_table(spark, tmp_path, pg):
    _seed(pg, 1000)
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), FIELDS, IdentityProp.single("id")
    )
    s = wire_initial_copy(t, pg.host, pg.port, "src", shard_count=4)
    assert s["rows_copied"] == 1000
    assert s["shards"] == 4
    assert s["boundary_lsn"] == 1000
    assert t.scan().count() == 1000
    got = {(r["id"], r["name"]) for r in t.scan().collect()}
    assert got == {(i, f"seed{i}") for i in range(1000)}


def test_copy_races_inserts_cdc_switchover(spark, tmp_path, pg):
    """The reference's e2e: the copy races live writes; afterwards the CDC
    stream (all events, including ones the snapshot already contains)
    replays through the LSN floor and the table equals the source."""
    _seed(pg, 2000)
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), FIELDS, IdentityProp.single("id")
    )

    events = []
    stop = threading.Event()

    def feeder():
        c = PgWireClient(pg.host, pg.port)
        i = 2000
        while not stop.is_set() and i < 2400:
            if i % 10 == 5:
                c.query(f"UPDATE src SET name = 'upd{i}' WHERE id = {i - 5}")
                lsn = parse_wal_lsn(
                    c.query("SELECT pg_current_wal_lsn()").rows[0][0]
                )
                events.append(
                    {"lsn": lsn, "xact_id": None, "op": "update",
                     "row": {"id": i - 5, "name": f"upd{i}"},
                     "old_row": {"id": i - 5, "name": None}}
                )
            c.query(f"INSERT INTO src VALUES ({i}, 'cdc{i}')")
            lsn = parse_wal_lsn(
                c.query("SELECT pg_current_wal_lsn()").rows[0][0]
            )
            events.append(
                {"lsn": lsn, "xact_id": None, "op": "insert",
                 "row": {"id": i, "name": f"cdc{i}"}, "old_row": None}
            )
            i += 1
        c.close()

    th = threading.Thread(target=feeder)
    th.start()
    try:
        # let some writes land BEFORE the snapshot export so events fall on
        # both sides of the boundary (the race the test exists to exercise)
        import time

        deadline = time.time() + 10
        while len(events) < 20 and time.time() < deadline:
            time.sleep(0.05)
        s = wire_initial_copy(t, pg.host, pg.port, "src", shard_count=4)
    finally:
        stop.set()
        th.join()
    boundary = s["boundary_lsn"]
    assert s["rows_copied"] >= 2000  # snapshot may include racing inserts

    # Splice in a poison replay BELOW the floor: a mutated event for a
    # seeded row at lsn <= boundary must NOT apply (the snapshot already
    # contains that prefix).
    poison = {"lsn": boundary, "xact_id": None, "op": "update",
              "row": {"id": 0, "name": "SHOULD_NOT_APPLY"},
              "old_row": {"id": 0, "name": None}}
    ev_df = spark.createDataFrame(events + [poison], cdc_event_schema(t.schema))
    apply_cdc_batch(t, ev_df, batch_id=1)

    # final table == source model, row for row
    src = PgWireClient(pg.host, pg.port)
    model = {
        (int(a), b) for a, b in src.query("SELECT id, name FROM src").rows
    }
    src.close()
    got = {(r["id"], r["name"]) for r in t.scan().collect()}
    assert got == model
    assert ("0", "SHOULD_NOT_APPLY") not in model
    assert {r for r in got if r[0] == 0} == {(0, "seed0")}
    # and the race was real: some events fell on each side of the boundary
    assert any(e["lsn"] <= boundary for e in events)
    assert any(e["lsn"] > boundary for e in events)


def test_wire_initial_copy_empty_source(spark, tmp_path, pg):
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE src (id INTEGER, name TEXT)")
    c.close()
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), FIELDS, IdentityProp.single("id")
    )
    s = wire_initial_copy(t, pg.host, pg.port, "src", shard_count=4)
    assert s["rows_copied"] == 0 and s["shards"] == 0
    assert t.scan().count() == 0
    assert t.last_lsn == s["boundary_lsn"]


def test_boundary_lsn_excludes_open_transaction_writes(pg):
    """A snapshot exported while another connection's transaction is OPEN
    must not count that transaction's rows in the boundary LSN: the frozen
    tables cannot contain them, so counting them would make the CDC
    switchover's LSN floor drop their events — silent row loss. The WAL
    position therefore advances at COMMIT, not at statement execution."""
    _seed(pg, 5)
    w = PgWireClient(pg.host, pg.port)
    w.query("BEGIN")
    w.query("INSERT INTO src VALUES (100, 'uncommitted')")
    # export races the open transaction
    ctl = PgWireClient(pg.host, pg.port)
    ctl.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
    r = ctl.query("SELECT pg_export_snapshot(), pg_current_wal_lsn()")
    snap, lsn_text = r.rows[0]
    boundary = parse_wal_lsn(lsn_text)
    assert boundary == 5  # the in-flight row is NOT counted
    # the exporting transaction reads its own snapshot (real-PG rule)
    assert ctl.query("SELECT COUNT(*) AS n FROM src").rows == [("5",)]
    w.query("COMMIT")
    assert w.query("SELECT COUNT(*) AS n FROM src").rows == [("6",)]
    # after commit the LSN covers the row — its CDC event carries lsn=6
    # > boundary=5, so the switchover keeps it
    lsn_after = parse_wal_lsn(
        w.query("SELECT pg_current_wal_lsn()").rows[0][0]
    )
    assert lsn_after == 6
    # importing readers still see the frozen 5 rows
    other = PgWireClient(pg.host, pg.port)
    other.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
    other.query(f"SET TRANSACTION SNAPSHOT '{snap}'")
    assert other.query("SELECT COUNT(*) AS n FROM src").rows == [("5",)]
    other.query("ROLLBACK")
    # snapshot binding ended with the transaction: reads are live again
    assert other.query("SELECT COUNT(*) AS n FROM src").rows == [("6",)]
    other.close()
    ctl.query("ROLLBACK")
    ctl.close()
    w.close()


def test_autocommit_write_not_stalled_by_open_transaction(pg):
    """Lock-order regression: an autocommit write racing another
    connection's OPEN transaction must wait only for that transaction's
    COMMIT (SQLite single-writer), never mutually stall against the
    snapshot lock until busy_timeout. Both writes land and the WAL LSN
    counts both."""
    import threading
    import time

    _seed(pg, 3)
    a = PgWireClient(pg.host, pg.port)
    a.query("BEGIN")
    a.query("INSERT INTO src VALUES (50, 'txn')")

    done: list[float] = []

    def autocommit_writer():
        b = PgWireClient(pg.host, pg.port, timeout_s=20.0)
        t0 = time.time()
        b.query("INSERT INTO src VALUES (51, 'auto')")
        done.append(time.time() - t0)
        b.close()

    th = threading.Thread(target=autocommit_writer)
    th.start()
    time.sleep(0.3)  # let B block on A's write lock
    a.query("COMMIT")
    th.join(timeout=15)
    assert not th.is_alive(), "autocommit writer stalled"
    assert done and done[0] < 10.0, f"took {done[0]:.1f}s — timeout-stall"
    lsn = parse_wal_lsn(a.query("SELECT pg_current_wal_lsn()").rows[0][0])
    assert lsn == 5  # 3 seed + 1 txn + 1 autocommit, all counted
    assert a.query("SELECT COUNT(*) AS n FROM src").rows == [("5",)]
    a.close()
