"""Database-polling CDC source e2e: a live sqlite database drives the
full pipeline — outbox drain -> CDC spool -> StreamingIngestor micro-batch
merge -> MoonlinkTable (the reference's postgres_source.rs contract over
DB-API polling; see ingest/dbpoll.py)."""

import json
import os
import sqlite3

from moonlink_spark.ingest.dbpoll import DbPollingSource, snapshot_rows
from moonlink_spark.streaming.pipeline import StreamingIngestor, initial_copy
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable

USERS_FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "name", "data_type": "string"},
]


def _setup_db(db_path: str) -> None:
    con = sqlite3.connect(db_path)
    con.execute(
        "CREATE TABLE outbox (change_id INTEGER PRIMARY KEY AUTOINCREMENT, "
        "op TEXT NOT NULL, row_json TEXT, old_row_json TEXT)"
    )
    con.execute("CREATE TABLE users (id INTEGER PRIMARY KEY, name TEXT)")
    con.commit()
    con.close()


def _apply(db_path: str, op: str, row=None, old=None) -> None:
    """Apply a change to the source table AND its outbox (what a trigger
    or application-level outbox write does in production)."""
    con = sqlite3.connect(db_path)
    if op == "insert":
        con.execute("INSERT INTO users VALUES (?, ?)", (row["id"], row["name"]))
    elif op == "update":
        con.execute("UPDATE users SET name = ? WHERE id = ?", (row["name"], row["id"]))
    else:
        con.execute("DELETE FROM users WHERE id = ?", (old["id"],))
    con.execute(
        "INSERT INTO outbox (op, row_json, old_row_json) VALUES (?, ?, ?)",
        (op, json.dumps(row) if row else None, json.dumps(old) if old else None),
    )
    con.commit()
    con.close()


def test_outbox_poll_to_table(spark, tmp_path):
    db = str(tmp_path / "src.db")
    _setup_db(db)
    _apply(db, "insert", {"id": 1, "name": "a"})
    _apply(db, "insert", {"id": 2, "name": "b"})
    _apply(db, "update", {"id": 1, "name": "a2"}, {"id": 1, "name": "a"})
    _apply(db, "delete", None, {"id": 2, "name": "b"})

    spool = str(tmp_path / "spool")
    src = DbPollingSource(lambda: sqlite3.connect(db), "outbox", spool)
    assert src.poll_once() == 4
    assert src.poll_once() == 0  # cursor advanced; nothing new

    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), USERS_FIELDS, IdentityProp.single("id")
    )
    ing = StreamingIngestor(t, spool, str(tmp_path / "ckpt"))
    ing.run_available()
    assert {(r["id"], r["name"]) for r in t.scan().collect()} == {(1, "a2")}

    # late changes: poll again, incremental file, stream catches up
    _apply(db, "insert", {"id": 3, "name": "c"})
    assert src.poll_once() == 1
    ing.run_available()
    assert {(r["id"], r["name"]) for r in t.scan().collect()} == {
        (1, "a2"),
        (3, "c"),
    }
    # crash-safety: a re-emitted spool file (cursor state lost) is deduped
    # by the pipeline's LSN floor
    os.unlink(src.state_path)
    assert src.poll_once() == 5  # re-emits everything
    ing.run_available()
    assert {(r["id"], r["name"]) for r in t.scan().collect()} == {
        (1, "a2"),
        (3, "c"),
    }


def test_snapshot_then_stream(spark, tmp_path):
    """Initial copy at a captured cursor, then the stream takes over —
    outbox events at or below the snapshot cursor are skipped (parity:
    initial-copy + buffered replay)."""
    db = str(tmp_path / "src2.db")
    _setup_db(db)
    for i in range(5):
        _apply(db, "insert", {"id": i, "name": f"u{i}"})

    rows, cursor = snapshot_rows(
        lambda: sqlite3.connect(db),
        "SELECT id, name, (SELECT MAX(change_id) FROM outbox) FROM users",
        ["id", "name"],
    )
    assert len(rows) == 5 and cursor == 5

    t = MoonlinkTable.create(
        spark, str(tmp_path / "t2"), USERS_FIELDS, IdentityProp.single("id")
    )
    snap_df = spark.createDataFrame(
        [(r["id"], r["name"]) for r in rows], "id long, name string"
    )
    initial_copy(t, snap_df, snapshot_lsn=cursor)

    # post-snapshot change plus a full (overlapping) outbox drain
    _apply(db, "update", {"id": 0, "name": "u0-new"}, {"id": 0, "name": "u0"})
    spool = str(tmp_path / "spool2")
    src = DbPollingSource(lambda: sqlite3.connect(db), "outbox", spool)
    assert src.poll_once() == 6  # all events incl. pre-snapshot ones
    ing = StreamingIngestor(t, spool, str(tmp_path / "ckpt2"))
    ing.run_available()
    got = {r["id"]: r["name"] for r in t.scan().collect()}
    assert got == {0: "u0-new", 1: "u1", 2: "u2", 3: "u3", 4: "u4"}


def test_cdc_to_matview_pipeline(spark, tmp_path):
    """Full consumer chain: live DB -> outbox poll -> streaming merge ->
    incrementally-refreshed materialized view. The view must track the
    database through inserts, updates and deletes without ever rescanning
    the table after creation."""
    from moonlink_spark.table.matview import MaterializedView

    db = str(tmp_path / "src3.db")
    _setup_db(db)
    for i in range(20):
        _apply(db, "insert", {"id": i, "name": f"g{i % 3}"})

    spool = str(tmp_path / "spool3")
    src = DbPollingSource(lambda: sqlite3.connect(db), "outbox", spool)
    src.poll_once()
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t3"), USERS_FIELDS, IdentityProp.single("id")
    )
    ing = StreamingIngestor(t, spool, str(tmp_path / "ckpt3"))
    ing.run_available()

    mv = MaterializedView.create(t, str(tmp_path / "mv3"), ["name"])
    base = {r.name: r.n_rows for r in mv.read().collect()}
    assert base == {"g0": 7, "g1": 7, "g2": 6}

    # database keeps changing: group migration + delete + insert
    _apply(db, "update", {"id": 0, "name": "g2"}, {"id": 0, "name": "g0"})
    _apply(db, "delete", None, {"id": 1, "name": "g1"})
    _apply(db, "insert", {"id": 100, "name": "g9"})
    src.poll_once()
    ing.run_available()

    s = mv.refresh()
    assert s["refreshed"] and s["changed_rows"] > 0
    got = {r.name: r.n_rows for r in mv.read().collect()}
    assert got == {"g0": 6, "g1": 6, "g2": 7, "g9": 1}


def test_out_of_order_commit_not_skipped(tmp_path):
    """Review r10: a writer that allocated a lower change_id but had not
    committed when a higher id became visible must get a grace period —
    advancing the cursor past the gap lost its event forever."""
    import sqlite3
    import time

    db = str(tmp_path / "o.db")
    _setup_db(db)
    con = sqlite3.connect(db)
    # ids 1 and 3 visible; id 2 is an open transaction's allocation
    con.execute(
        "INSERT INTO outbox (change_id, op, row_json) VALUES "
        '(1, \'insert\', \'{"id": 1, "name": "a"}\')'
    )
    con.execute(
        "INSERT INTO outbox (change_id, op, row_json) VALUES "
        '(3, \'insert\', \'{"id": 3, "name": "c"}\')'
    )
    con.commit()

    spool = str(tmp_path / "spool")
    src = DbPollingSource(
        lambda: sqlite3.connect(db), "outbox", spool, gap_timeout_s=0.5
    )
    # first poll: only id 1 is safe (the id-2 gap is in grace)
    assert src.poll_once() == 1
    # the slow writer commits id 2
    con.execute(
        "INSERT INTO outbox (change_id, op, row_json) VALUES "
        '(2, \'insert\', \'{"id": 2, "name": "b"}\')'
    )
    con.commit()
    assert src.poll_once() == 2  # ids 2 AND 3, in order, nothing lost
    # permanent hole (a rolled-back allocation): skipped after the grace
    con.execute(
        "INSERT INTO outbox (change_id, op, row_json) VALUES "
        '(6, \'insert\', \'{"id": 6, "name": "f"}\')'
    )
    con.commit()
    assert src.poll_once() == 0  # id 4-5 gap in grace: 6 waits
    time.sleep(0.6)
    assert src.poll_once() == 1  # grace expired: 6 emitted
    con.close()


def test_sparse_sequence_jump_is_interval_tracked(tmp_path):
    """Review r11: outbox ids are ordered, not dense — a sequence jump of
    billions of ids (PG sequence caching, setval, crash restarts) must
    cost one gap INTERVAL, not one grace clock per missing id. Per-id
    tracking looped/allocated over the whole hole and wedged the poller."""
    import sqlite3
    import time

    db = str(tmp_path / "s.db")
    _setup_db(db)
    con = sqlite3.connect(db)
    con.execute(
        "INSERT INTO outbox (change_id, op, row_json) VALUES "
        '(1, \'insert\', \'{"id": 1, "name": "a"}\')'
    )
    # a ~10-billion-id sequence jump
    con.execute(
        "INSERT INTO outbox (change_id, op, row_json) VALUES "
        '(10000000000, \'insert\', \'{"id": 2, "name": "b"}\')'
    )
    con.commit()

    spool = str(tmp_path / "spool")
    src = DbPollingSource(
        lambda: sqlite3.connect(db), "outbox", spool, gap_timeout_s=0.3
    )
    t0 = time.monotonic()
    assert src.poll_once() == 1  # id 1; the jump span is one in-grace gap
    assert time.monotonic() - t0 < 2.0  # NOT O(span) work
    # the whole span is ONE stored interval, not billions of dict entries
    assert len(src._gap_intervals) == 1
    lo, hi, _ = src._gap_intervals[0]
    assert (lo, hi) == (2, 9999999999)
    time.sleep(0.35)
    t0 = time.monotonic()
    assert src.poll_once() == 1  # grace expired: the span is skipped whole
    assert time.monotonic() - t0 < 2.0
    assert src._load_cursor() == 10000000000
    assert src._gap_intervals == []
    con.close()


def test_gap_interval_partial_fill_keeps_clock(tmp_path):
    """A gap span that PARTIALLY fills must keep the original grace clock
    on the still-missing pieces (splitting, not resetting), and a piece
    that becomes visible mid-span must emit in order."""
    import sqlite3
    import time

    db = str(tmp_path / "p.db")
    _setup_db(db)
    con = sqlite3.connect(db)
    con.execute(
        "INSERT INTO outbox (change_id, op, row_json) VALUES "
        '(1, \'insert\', \'{"id": 1, "name": "a"}\')'
    )
    con.execute(
        "INSERT INTO outbox (change_id, op, row_json) VALUES "
        '(6, \'insert\', \'{"id": 6, "name": "f"}\')'
    )
    con.commit()
    spool = str(tmp_path / "spool")
    src = DbPollingSource(
        lambda: sqlite3.connect(db), "outbox", spool, gap_timeout_s=0.5
    )
    assert src.poll_once() == 1  # id 1; gap (2..5) in grace
    time.sleep(0.25)
    # id 4 commits mid-gap: splits (2..5) into (2..3) and (5..5),
    # both keeping the ORIGINAL first_seen
    con.execute(
        "INSERT INTO outbox (change_id, op, row_json) VALUES "
        '(4, \'insert\', \'{"id": 4, "name": "d"}\')'
    )
    con.commit()
    assert src.poll_once() == 0  # (2..3) still in grace: 4 and 6 wait
    assert [(lo, hi) for lo, hi, _ in src._gap_intervals] == [(2, 3), (5, 5)]
    t_a = src._gap_intervals[0][2]
    t_b = src._gap_intervals[1][2]
    assert t_a == t_b  # split pieces inherit one original clock
    time.sleep(0.3)  # total > 0.5 since first seen, < 0.5 since split
    assert src.poll_once() == 2  # 4 then 6: both gaps expired on the OLD clock
    assert src._load_cursor() == 6
    con.close()
