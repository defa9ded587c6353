"""Postgres-protocol metadata store (parity src/moonlink_metadata_store/
src/postgres/pg_metadata_store.rs): the SQLite store's full test matrix
replayed over the wire — a PgWireClient speaking protocol v3 against the
in-process PgMockServer — plus protocol-level checks (auth, errors,
COPY OUT) and backend recovery through the postgres store."""

import json
import sqlite3
import threading

import pytest
from pyspark.sql import types as T

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.errors import TableConfigError
from moonlink_spark.metadata_store import (
    MetadataStoreError,
    PgMetadataStore,
    serialize_table_config,
)
from moonlink_spark.pg_protocol import (
    PgMockServer,
    PgProtocolError,
    PgServerError,
    PgWireClient,
    copy_text_row,
    parse_copy_text_row,
)
from moonlink_spark.table.identity import IdentityProp

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
    ]
)


def _cfg(mode="single", cols=("id",), append_only=False, **kw):
    return serialize_table_config(
        {"mode": mode, "columns": list(cols)}, append_only, **kw
    )


@pytest.fixture(params=["plain", "tls"], autouse=True)
def pg_wire_mode(request, monkeypatch, wire_tls):
    """The entire suite runs twice: cleartext and TLS. In TLS mode the
    server class is wrapped to hold the test cert and clients pick up
    libpq's documented env knobs (PGSSLMODE / PGSSLROOTCERT) — every
    protocol/auth/COPY test below exercises the encrypted path with
    zero changes at its call sites."""
    if request.param == "tls":
        import functools

        import moonlink_spark.pg_protocol as pgmod

        wrapped = functools.partial(
            pgmod.PgMockServer,
            ssl_cert=wire_tls.cert_path,
            ssl_key=wire_tls.key_path,
        )
        monkeypatch.setattr(pgmod, "PgMockServer", wrapped)
        monkeypatch.setattr(request.module, "PgMockServer", wrapped)
        monkeypatch.setenv("PGSSLMODE", "verify-full")
        monkeypatch.setenv("PGSSLROOTCERT", wire_tls.ca_path)
    return request.param


@pytest.fixture()
def pg(tmp_path):
    srv = PgMockServer(str(tmp_path / "pg" / "meta.db")).start()
    yield srv
    srv.stop()


@pytest.fixture()
def store(pg):
    st = PgMetadataStore(pg.host, pg.port)
    yield st
    st.close()


# -- the SQLite store's matrix, over the wire --------------------------------


def test_store_and_get_all_entries(store):
    assert not store.metadata_table_exists()
    assert store.get_all_table_metadata_entries() == []

    store.store_table_metadata("db", "users", "public.users", "pg://x", _cfg())
    assert store.metadata_table_exists()
    entries = store.get_all_table_metadata_entries()
    assert len(entries) == 1
    e = entries[0]
    assert (e.database, e.table) == ("db", "users")
    assert e.src_table_name == "public.users"
    assert e.src_table_uri == "pg://x"
    mc = e.config["mooncake_table_config"]
    assert mc["row_identity"] == {"mode": "single", "columns": ["id"]}
    assert mc["append_only"] is False


def test_duplicate_store_rejected(store):
    store.store_table_metadata("db", "t", "s", "u", _cfg())
    with pytest.raises(MetadataStoreError):
        store.store_table_metadata("db", "t", "s2", "u2", _cfg())
    store.store_table_metadata("db2", "t", "s", "u", _cfg())
    assert len(store.get_all_table_metadata_entries()) == 2


def test_delete_requires_existing_row(store):
    store.store_table_metadata("db", "t", "s", "u", _cfg())
    store.delete_table_metadata("db", "t")
    assert store.get_all_table_metadata_entries() == []
    with pytest.raises(MetadataStoreError):
        store.delete_table_metadata("db", "t")


def test_store_survives_client_reconnect(pg):
    st = PgMetadataStore(pg.host, pg.port)
    st.store_table_metadata("db", "t", "s", "u", _cfg())
    st.close()
    st2 = PgMetadataStore(pg.host, pg.port)
    assert [e.table for e in st2.get_all_table_metadata_entries()] == ["t"]
    st2.close()


def test_keyed_lookup(store):
    assert store.get_table_metadata_entry("db", "t") is None
    store.store_table_metadata("db", "t", "s", "u", _cfg())
    e = store.get_table_metadata_entry("db", "t")
    assert (e.database, e.table) == ("db", "t")
    assert store.get_table_metadata_entry("db", "absent") is None


def test_corrupt_row_does_not_brick_other_tables(pg, store):
    store.store_table_metadata("db", "good", "s", "u", _cfg())
    store.store_table_metadata("db", "bad", "s", "u", _cfg())
    conn = sqlite3.connect(pg.db_path)
    conn.execute('UPDATE tables SET config = \'{"not json\' WHERE "table" = \'bad\'')
    conn.commit()
    conn.close()
    assert [e.table for e in store.get_all_table_metadata_entries()] == ["good"]
    assert store.get_table_metadata_entry("db", "good").table == "good"
    assert store.corrupt_entries() == [("db", "bad")]
    with pytest.raises(MetadataStoreError):
        store.get_table_metadata_entry("db", "bad")
    store.delete_table_metadata("db", "bad")
    assert store.corrupt_entries() == []


def test_concurrent_stores_serialize(pg):
    """8 threads, each with its OWN wire connection (the reference opens a
    client per call) — all inserts land, none lost or duplicated."""
    errs = []

    def put(i):
        st = PgMetadataStore(pg.host, pg.port)
        try:
            st.store_table_metadata("db", f"t{i}", "s", "u", _cfg())
        except Exception as e:  # pragma: no cover
            errs.append(e)
        finally:
            st.close()

    ts = [threading.Thread(target=put, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    st = PgMetadataStore(pg.host, pg.port)
    assert len(st.get_all_table_metadata_entries()) == 8
    st.close()


def test_relation_shape_matches_reference(pg, store):
    """The persisted relation mirrors postgres/sql/create_tables.sql:
    quoted database/table columns, composite PK, JSON config column."""
    store.store_table_metadata("db", "t", "s", "u", _cfg())
    conn = sqlite3.connect(pg.db_path)
    info = list(conn.execute("PRAGMA table_info(tables)"))
    cols = [r[1] for r in info]
    assert cols == ["database", "table", "src_table_name", "src_table_uri", "config"]
    assert [r[1] for r in info if r[5] > 0] == ["database", "table"]
    raw = conn.execute("SELECT config FROM tables").fetchone()[0]
    assert json.loads(raw)["mooncake_table_config"]["append_only"] is False
    conn.close()


# -- backend integration + recovery ------------------------------------------


def test_backend_postgres_lifecycle_and_recovery(spark, tmp_path, pg):
    opts = {"host": pg.host, "port": pg.port}
    wh = str(tmp_path / "wh")
    be = MoonlinkBackend(
        spark, wh, metadata_store="postgres", metadata_store_options=opts
    )
    t = be.create_table("db", "users", SCHEMA, IdentityProp.single("id"))
    t.append_rows([{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])
    t.commit(lsn=10)
    assert be.list_tables() == ["db.users"]
    with pytest.raises(TableConfigError):
        be.create_table("db", "users", SCHEMA, IdentityProp.single("id"))

    # a fresh backend recovers every table through the PG control plane
    be2 = MoonlinkBackend(
        spark, wh, metadata_store="postgres", metadata_store_options=opts
    )
    assert be2.list_tables() == ["db.users"]
    t2 = be2.get_table("db", "users")
    assert t2.identity == IdentityProp.single("id")
    assert t2.scan().count() == 2

    be2.drop_table("db", "users")
    assert be2.list_tables() == []
    be2.drop_table("db", "users")  # unknown: backend-level no-op
    with pytest.raises(TableConfigError):
        be2.get_table("db", "users")


# -- protocol-level behavior -------------------------------------------------


def test_cleartext_auth_required_and_checked(tmp_path):
    srv = PgMockServer(str(tmp_path / "auth.db"), password="sekret").start()
    try:
        with pytest.raises(PgProtocolError, match="password"):
            PgWireClient(srv.host, srv.port)  # none given
        with pytest.raises(PgServerError, match="28P01"):
            PgWireClient(srv.host, srv.port, password="wrong")
        c = PgWireClient(srv.host, srv.port, password="sekret")
        assert c.query("SELECT 1 AS one").rows == [("1",)]
        c.close()
    finally:
        srv.stop()


def test_error_response_carries_sqlstate_and_recovers(pg):
    c = PgWireClient(pg.host, pg.port)
    with pytest.raises(PgServerError):
        c.query("SELECT * FROM missing_table")
    # connection stays usable after an error (ReadyForQuery resync)
    assert c.query("SELECT 2 AS two").rows == [("2",)]
    c.close()


def test_nulls_and_quoting_roundtrip(pg):
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE q (a TEXT, b TEXT)")
    c.query("INSERT INTO q VALUES ('it''s', NULL)")
    r = c.query("SELECT a, b FROM q")
    assert r.rows == [("it's", None)]
    assert r.columns == ["a", "b"]
    c.close()


def test_copy_out_streams_text_rows(pg):
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE src (id TEXT, payload TEXT)")
    c.query("INSERT INTO src VALUES ('1', 'plain')")
    c.query("INSERT INTO src VALUES ('2', NULL)")
    c.query("INSERT INTO src VALUES ('3', 'tab\there')")
    rows = [parse_copy_text_row(d) for d in c.copy_out("COPY src TO STDOUT")]
    assert rows == [["1", "plain"], ["2", None], ["3", "tab\there"]]
    # query form too
    rows2 = [
        parse_copy_text_row(d)
        for d in c.copy_out("COPY (SELECT id FROM src WHERE id > '1') TO STDOUT")
    ]
    assert rows2 == [["2"], ["3"]]
    # the reference's exact statement shapes carry WITH (FORMAT text)
    # and a column list (pg_replicate/clients/postgres.rs:199,261) —
    # both directions accept them
    rows3 = [
        parse_copy_text_row(d)
        for d in c.copy_out("COPY src TO STDOUT WITH (FORMAT text)")
    ]
    assert rows3 == rows
    rows4 = [
        parse_copy_text_row(d)
        for d in c.copy_out('COPY src (payload) TO STDOUT WITH (FORMAT text)')
    ]
    assert rows4 == [[r[1]] for r in rows]
    assert c.copy_in(
        "COPY src FROM STDIN WITH (FORMAT text)", [("4", "via-with")]
    ) == 1
    c.close()


def test_copy_text_escaping_roundtrip():
    row = ("a\tb", "line\nbreak", None, "back\\slash", "\r\v\f\b")
    assert parse_copy_text_row(copy_text_row(row)) == [
        "a\tb", "line\nbreak", None, "back\\slash", "\r\v\f\b"
    ]


# -- COPY FROM STDIN (bulk load) -----------------------------------------------


def test_cancel_request_interrupts_running_query(pg):
    """The protocol's out-of-band cancel: BackendKeyData hands the
    session a (pid, secret key); a CancelRequest on a fresh connection
    aborts the in-flight statement with 57014 and leaves the connection
    usable. A wrong secret key must do nothing."""
    import struct as _struct
    import threading
    import time

    from moonlink_spark.pg_protocol import _CANCEL_REQUEST

    c = PgWireClient(pg.host, pg.port)
    assert c.backend_key != (0, 0)
    # a query long enough to still be running when the cancel lands
    slow = (
        "WITH RECURSIVE r(i) AS (SELECT 1 UNION ALL SELECT i + 1 FROM r "
        "WHERE i < 500000000) SELECT count(*) FROM r"
    )
    caught: dict = {}

    def run():
        try:
            c.query(slow)
            caught["done"] = True
        except PgServerError as e:
            caught["err"] = e

    t = threading.Thread(target=run)
    t.start()
    time.sleep(0.4)  # let the statement reach SQLite
    c.cancel()
    t.join(timeout=20)
    assert not t.is_alive(), "cancel did not interrupt the query"
    assert "err" in caught, "query finished before the cancel (raise i)"
    assert caught["err"].fields.get("C") == "57014"
    # the canceled connection answers the next query normally
    assert c.query("SELECT 1 AS one").rows == [("1",)]
    # wrong secret key: dispatched nowhere, session unaffected
    import socket as _socket

    pid, _key = c.backend_key
    s = _socket.create_connection((pg.host, pg.port), timeout=5)
    s.sendall(_struct.pack(">IIII", 16, _CANCEL_REQUEST, pid, 12345))
    s.close()
    assert c.query("SELECT 2 AS two").rows == [("2",)]
    c.close()


def test_multi_statement_simple_query(pg):
    """The protocol's multi-statement Query rules: top-level-semicolon
    split (never inside literals/dollar quotes), per-statement results
    with the LAST tag winning client-side, one IMPLICIT transaction for
    the whole string (an error rolls back every statement in it), and
    EmptyQueryResponse for empty / comment-only strings."""
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE ms (a INTEGER, b TEXT)")
    lsn0 = pg.lsn
    r = c.query(
        "INSERT INTO ms VALUES (1, 'x;y');"   # ';' inside a literal
        "INSERT INTO ms VALUES (2, $$a;b$$);"  # ';' inside dollar quotes
        "SELECT count(*) AS n FROM ms"
    )
    assert r.rows == [("2",)] and r.columns == ["n"]
    assert pg.lsn == lsn0 + 2  # both writes counted, atomically
    assert c.query("SELECT b FROM ms ORDER BY a").rows == [
        ("x;y",), ("a;b",)
    ]
    # implicit transaction: the first error discards EVERY statement
    with pytest.raises(PgServerError):
        c.query(
            "INSERT INTO ms VALUES (3, 'doomed'); SELECT * FROM missing"
        )
    assert c.query("SELECT count(*) FROM ms").rows == [("2",)]
    assert pg.lsn == lsn0 + 2
    assert c.txn_status == b"I"  # the implicit txn never leaks out
    # explicit control inside the string runs the normal txn machinery
    c.query("BEGIN; INSERT INTO ms VALUES (4, 'explicit'); COMMIT")
    assert c.query("SELECT count(*) FROM ms").rows == [("3",)]
    assert pg.lsn == lsn0 + 3
    # empty / comment-only strings: EmptyQueryResponse, empty tag
    assert c.query("").tag == ""
    assert c.query(" ; ;").tag == ""
    assert c.query("-- nothing here").tag == ""
    assert c.query("SELECT 1 AS one").rows == [("1",)]
    c.close()


def test_implicit_txn_detects_cte_and_comment_led_writes(pg):
    """Implicit-transaction classification is by the real statement verb
    (comments stripped, WITH-led CTE writes recognized) — a batch led by
    ``/* hint */ INSERT`` or ``WITH .. INSERT`` still gets real PG's
    all-or-nothing atomicity when a later statement errors."""
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE cte_ms (a INTEGER)")
    lsn0 = pg.lsn
    # comment-led write + failing tail: nothing survives
    with pytest.raises(PgServerError):
        c.query(
            "/* hint */ INSERT INTO cte_ms VALUES (1);"
            "SELECT * FROM missing_table"
        )
    assert c.query("SELECT count(*) FROM cte_ms").rows == [("0",)]
    # CTE-led write + failing tail: nothing survives
    with pytest.raises(PgServerError):
        c.query(
            "WITH src AS (SELECT 2 AS v) "
            "INSERT INTO cte_ms SELECT v FROM src;"
            "SELECT * FROM missing_table"
        )
    assert c.query("SELECT count(*) FROM cte_ms").rows == [("0",)]
    assert pg.lsn == lsn0  # no write ever counted
    assert c.txn_status == b"I"
    # the happy path still commits both atomically
    c.query(
        "-- leading comment\nINSERT INTO cte_ms VALUES (1);"
        "WITH src AS (SELECT 2 AS v) INSERT INTO cte_ms SELECT v FROM src"
    )
    assert c.query("SELECT count(*) FROM cte_ms").rows == [("2",)]
    assert pg.lsn == lsn0 + 2
    # comment-led ROLLBACK classifies as txn control in an aborted txn
    c.query("BEGIN")
    with pytest.raises(PgServerError):
        c.query("SELECT * FROM missing_table")
    c.query("/* sorry */ ROLLBACK")
    assert c.txn_status == b"I"
    c.close()


def test_statement_main_verb_cte_named_like_keyword():
    """ADVICE r8: a CTE named with a PG-unreserved keyword (``WITH
    delete AS (..) SELECT ..`` is legal PG) must classify by the real
    main statement, not by the CTE's name — otherwise a legal read is
    routed as a write (snapshot rewrite skipped, 25006 in reader txns,
    DELETE tag). SELECT/VALUES/TABLE are PG-reserved (never unquoted
    CTE names) and accept on sight; INSERT/UPDATE/DELETE only count
    past the CTE prologue."""
    from moonlink_spark.pg_protocol import statement_main_verb as mv

    # unreserved-keyword CTE names: reads stay reads
    assert mv("WITH delete AS (SELECT 1) SELECT * FROM delete") == "SELECT"
    assert mv("WITH update (a) AS (SELECT 1) SELECT a FROM update") == "SELECT"
    assert mv("WITH insert AS MATERIALIZED (SELECT 1) TABLE insert") == "TABLE"
    assert (
        mv("WITH delete /* c */ AS (SELECT 1) SELECT 1") == "SELECT"
    ), "comment between CTE name and AS must not unmask the name"
    assert (
        mv('WITH "delete" AS (SELECT 1) SELECT 1') == "SELECT"
    )  # quoted names were never candidates
    # real CTE-led writes still classify as writes
    assert mv("WITH x AS (SELECT 1) INSERT INTO t SELECT * FROM x") == "INSERT"
    assert (
        mv("WITH delete AS (SELECT 1), d2 AS (SELECT 2) DELETE FROM t")
        == "DELETE"
    ), "a keyword-named CTE must not hide a genuine DELETE main verb"
    assert mv("WITH update AS (SELECT 1) UPDATE t SET a = 1") == "UPDATE"
    assert mv("WITH x AS (SELECT 1) VALUES (1)") == "VALUES"
    # non-WITH statements untouched
    assert mv("DELETE FROM t") == "DELETE"
    assert mv("/* hint */ SELECT 1") == "SELECT"


def test_reader_txn_accepts_keyword_named_cte_read(pg):
    """E2E for the same ADVICE item: inside a snapshot reader
    transaction the keyword-named-CTE read must NOT be rejected with
    25006 (read-only violation). The embedded SQLite executor happens
    to reject the unquoted name with a syntax error (42601) — that is
    an executor limitation, not a routing decision; the regression
    guarded here is the sqlstate."""
    c = PgWireClient(pg.host, pg.port)
    c.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
    with pytest.raises(PgServerError) as ei:
        c.query("WITH delete AS (SELECT 1 AS x) SELECT * FROM delete")
    assert ei.value.fields.get("C") == "42601", (
        "keyword-named CTE read was routed as a write: "
        f"{ei.value.fields}"
    )
    c.query("ROLLBACK")
    c.close()


def test_nested_query_cursor_fails_loud_not_deadlock(tmp_path):
    """ADVICE r8: starting a second query_cursor on the same connection
    while one is suspended must raise PgProtocolError at first
    iteration — the guard runs BEFORE the non-reentrant lock, so the
    nested cursor cannot silently deadlock. The outer cursor keeps
    streaming afterwards and the connection stays usable."""
    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgProtocolError,
        PgWireClient,
    )

    srv = PgMockServer(str(tmp_path / "nest.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE nest (a INTEGER)")
        c.query(
            "INSERT INTO nest VALUES "
            + ",".join(f"({i})" for i in range(40))
        )
        outer = c.query_cursor("SELECT a FROM nest ORDER BY a", fetch_size=5)
        first = [next(outer) for _ in range(3)]
        assert [r[0] for r in first] == ["0", "1", "2"]
        inner = c.query_cursor("SELECT a FROM nest", fetch_size=5)
        with pytest.raises(PgProtocolError, match="streaming"):
            next(inner)
        # the outer cursor is unaffected by the refused nested start
        rest = list(outer)
        assert len(first) + len(rest) == 40
        assert c.query("SELECT count(*) FROM nest").rows == [("40",)]
        c.close()
    finally:
        srv.stop()


def test_failed_transaction_aborts_until_rollback(pg):
    """Real-PG rule: an error inside an explicit transaction aborts it —
    every later statement fails 25P02 until the block ends, COMMIT in an
    aborted transaction rolls back (ROLLBACK tag), and the ReadyForQuery
    status byte walks I -> T -> E -> I exactly as drivers track it."""
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE ab (a INTEGER)")
    lsn0 = pg.lsn
    assert c.txn_status == b"I"
    c.query("BEGIN")
    assert c.txn_status == b"T"
    c.query("INSERT INTO ab VALUES (1)")
    with pytest.raises(PgServerError):
        c.query("SELECT * FROM no_such_table")
    assert c.txn_status == b"E"
    # aborted: even a valid statement is refused until the block ends
    with pytest.raises(PgServerError) as ei:
        c.query("SELECT 1")
    assert ei.value.fields.get("C") == "25P02"
    assert c.txn_status == b"E"
    r = c.query("ROLLBACK")
    assert r.tag == "ROLLBACK"
    assert c.txn_status == b"I"
    # nothing the aborted transaction wrote survives; WAL never moved
    assert c.query("SELECT count(*) FROM ab").rows == [("0",)]
    assert pg.lsn == lsn0

    # COMMIT in an aborted transaction ALSO rolls back (ROLLBACK tag)
    c.query("BEGIN")
    c.query("INSERT INTO ab VALUES (2)")
    with pytest.raises(PgServerError):
        c.query("SELECT * FROM still_missing")
    r = c.query("COMMIT")
    assert r.tag == "ROLLBACK"
    assert c.txn_status == b"I"
    assert c.query("SELECT count(*) FROM ab").rows == [("0",)]
    assert pg.lsn == lsn0

    # extended-protocol errors abort the transaction the same way
    c.query("BEGIN")
    with pytest.raises(PgServerError):
        c.query_params("SELECT * FROM nope WHERE a = $1", [1])
    with pytest.raises(PgServerError) as ei2:
        c.query("SELECT 1")
    assert ei2.value.fields.get("C") == "25P02"
    c.query("ROLLBACK")

    # a clean transaction still commits normally afterwards
    c.query("BEGIN")
    c.query("INSERT INTO ab VALUES (3)")
    c.query("COMMIT")
    assert c.query("SELECT count(*) FROM ab").rows == [("1",)]
    assert pg.lsn == lsn0 + 1
    c.close()


def test_copy_in_round_trip_types_and_escapes(pg):
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE ld (a INTEGER, b TEXT, x REAL)")
    lsn0 = pg.lsn
    n = c.copy_in(
        "COPY ld FROM STDIN",
        [
            (1, "plain", 0.5),
            (2, None, None),
            (3, "tab\there\nand\\slash", 2.0),
            (4, "ünïcode", -1.25),
        ],
    )
    assert n == 4
    assert pg.lsn == lsn0 + 4  # autocommit COPY bumps by row count
    back = [
        parse_copy_text_row(d)
        for d in c.copy_out("COPY (SELECT * FROM ld ORDER BY a) TO STDOUT")
    ]
    assert back == [
        ["1", "plain", "0.5"],
        ["2", None, None],
        ["3", "tab\there\nand\\slash", "2.0"],
        ["4", "ünïcode", "-1.25"],
    ]
    c.close()


def test_copy_in_transaction_semantics(pg):
    """COPY inside an explicit transaction follows the INSERT rules: the
    WAL counter must not cover the rows until COMMIT (a snapshot exported
    mid-transaction would otherwise claim rows it does not contain), and
    ROLLBACK discards them entirely."""
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE tx (a INTEGER)")
    lsn0 = pg.lsn
    c.query("BEGIN")
    c.copy_in("COPY tx FROM STDIN", [(1,), (2,)])
    assert pg.lsn == lsn0  # invisible until COMMIT
    c.query("ROLLBACK")
    assert c.query("SELECT count(*) FROM tx").rows == [("0",)]
    assert pg.lsn == lsn0
    c.query("BEGIN")
    c.copy_in("COPY tx FROM STDIN", [(3,), (4,), (5,)])
    c.query("COMMIT")
    assert c.query("SELECT count(*) FROM tx").rows == [("3",)]
    assert pg.lsn == lsn0 + 3
    c.close()


def test_copy_in_copyfail_inserts_nothing(pg):
    """A row iterable that raises mid-stream sends CopyFail: the server
    aborts the COPY with nothing inserted, the original exception
    propagates, and the connection stays usable."""
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE cf (a INTEGER)")
    lsn0 = pg.lsn

    def boom():
        yield (1,)
        raise ValueError("upstream died")

    with pytest.raises(ValueError, match="upstream died"):
        c.copy_in("COPY cf FROM STDIN", boom())
    assert c.query("SELECT count(*) FROM cf").rows == [("0",)]
    assert pg.lsn == lsn0
    assert c.query("SELECT 1 AS one").rows == [("1",)]
    c.close()


def test_copy_in_error_paths(pg):
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE ep (a INTEGER, b TEXT)")
    # unknown table fails BEFORE CopyInResponse (real-PG ordering)
    with pytest.raises(PgServerError) as ei:
        c.copy_in("COPY no_such FROM STDIN", [(1, "x")])
    assert ei.value.fields.get("C") == "42P01"
    # field-count mismatch: stream consumed, nothing inserted
    with pytest.raises(PgServerError) as ei2:
        c.copy_in("COPY ep FROM STDIN", [(1,)])
    assert ei2.value.fields.get("C") == "22P04"
    assert c.query("SELECT count(*) FROM ep").rows == [("0",)]
    # read-only (snapshot) transactions reject COPY FROM like INSERT
    c.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
    with pytest.raises(PgServerError) as ei3:
        c.copy_in("COPY ep FROM STDIN", [(1, "x")])
    assert ei3.value.fields.get("C") == "25006"
    c.query("ROLLBACK")
    assert c.query("SELECT 1 AS one").rows == [("1",)]
    c.close()


def test_copy_in_malformed_frame_drains_stream(pg):
    """A CopyData frame that is not valid COPY text (here: broken UTF-8)
    must not desync the connection: the server notes the error, keeps
    DISCARDING the client's in-flight frames until CopyDone (the
    protocol's error-during-COPY-IN rule), inserts nothing, and answers
    one ErrorResponse — the next query runs normally."""
    from moonlink_spark.pg_protocol import _cstr, _msg

    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE mf (a TEXT)")
    lsn0 = pg.lsn
    with c._lock:
        c.sock.sendall(_msg(b"Q", _cstr("COPY mf FROM STDIN")))
        t, _ = __import__(
            "moonlink_spark.pg_protocol", fromlist=["_read_msg"]
        )._read_msg(c._f)
        assert t == b"G"
        c.sock.sendall(_msg(b"d", b"ok-row\n"))
        c.sock.sendall(_msg(b"d", b"\xff\xfe broken\n"))  # invalid UTF-8
        c.sock.sendall(_msg(b"d", b"after-the-error\n"))
        c.sock.sendall(_msg(b"c", b""))
        err = None
        while True:
            t, b = __import__(
                "moonlink_spark.pg_protocol", fromlist=["_read_msg"]
            )._read_msg(c._f)
            if t == b"E":
                from moonlink_spark.pg_protocol import _error_fields

                err = _error_fields(b)
            elif t == b"Z":
                break
        assert err is not None and err.get("C") == "22P04"
    assert c.query("SELECT count(*) FROM mf").rows == [("0",)]
    assert pg.lsn == lsn0
    assert c.copy_in("COPY mf FROM STDIN", [("fine",)]) == 1
    c.close()


def test_copy_in_column_list_and_multi_frame(pg):
    c = PgWireClient(pg.host, pg.port)
    c.query("CREATE TABLE cl (a INTEGER, b TEXT, x REAL)")
    assert c.copy_in('COPY cl (a, b) FROM STDIN', [(1, "only-ab")]) == 1
    assert c.query("SELECT a, b, x FROM cl").rows == [("1", "only-ab", None)]
    # enough data to straddle several 256 KiB CopyData frames — rows must
    # reassemble across frame boundaries server-side
    big = [(i, "p" * 60, i * 0.5) for i in range(20_000)]
    assert c.copy_in("COPY cl FROM STDIN", big) == 20_000
    assert c.query("SELECT count(*) FROM cl").rows == [("20001",)]
    c.close()


# -- SCRAM-SHA-256 ------------------------------------------------------------


def test_scram_sha256_end_to_end(tmp_path):
    """Full RFC 5802 exchange against a verifier-storing server: right
    password authenticates (with mutual server-signature verification),
    wrong password gets 28P01, and queries flow normally after auth."""
    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgServerError,
        PgWireClient,
    )

    srv = PgMockServer(
        str(tmp_path / "scram.db"), password="s3cret", auth="scram-sha-256"
    ).start()
    try:
        c = PgWireClient(srv.host, srv.port, password="s3cret")
        c.query("CREATE TABLE t (id INTEGER, v TEXT)")
        c.query("INSERT INTO t VALUES (1, 'x')")
        assert c.query("SELECT COUNT(*) AS n FROM t").rows == [("1",)]
        c.close()

        import pytest as _pytest

        with _pytest.raises(PgServerError, match="28P01"):
            PgWireClient(srv.host, srv.port, password="wrong")
    finally:
        srv.stop()


def test_scram_metadata_store_over_scram_server(tmp_path):
    """The PG-backed metadata store authenticates via SCRAM unchanged —
    the auth layer is transparent to the store protocol."""
    from moonlink_spark.metadata_store import (
        PgMetadataStore,
        serialize_table_config,
    )
    from moonlink_spark.pg_protocol import PgMockServer

    srv = PgMockServer(
        str(tmp_path / "scramstore.db"),
        password="pw",
        auth="scram-sha-256",
    ).start()
    try:
        store = PgMetadataStore(srv.host, srv.port, password="pw")
        store.store_table_metadata(
            "db", "t", src_table_name="db.t", src_table_uri="/x",
            config=serialize_table_config(
                {"mode": "none", "columns": []}, True, {}, table_uri="/x"
            ),
        )
        assert store.get_table_metadata_entry("db", "t") is not None
        store.close()
    finally:
        srv.stop()


# -- extended query protocol ---------------------------------------------------


def test_extended_protocol_typed_params_and_injection_safety(tmp_path):
    """Parse/Bind/Describe/Execute/Sync with text-format parameters:
    typed OIDs coerce correctly, NULL binds as SQL NULL, and a value
    full of quote metacharacters is just data — it can never terminate
    the statement, because it rides outside the SQL string."""
    from moonlink_spark.pg_protocol import PgMockServer, PgWireClient

    srv = PgMockServer(str(tmp_path / "ext.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE kv (id INTEGER, score REAL, ok INTEGER, v TEXT)")
        r = c.query_params(
            "INSERT INTO kv VALUES ($1, $2, $3, $4)",
            [7, 2.5, True, "it's'); DROP TABLE kv; --"],
        )
        assert r.tag == "INSERT 0 1"
        r = c.query_params(
            "SELECT id, score, v FROM kv WHERE id = $1", [7]
        )
        assert r.columns == ["id", "score", "v"]
        assert r.rows == [("7", "2.5", "it's'); DROP TABLE kv; --")]
        # the table survived the hostile value (it was data, not SQL)
        assert c.query("SELECT COUNT(*) AS n FROM kv").rows == [("1",)]
        # NULL parameter
        c.query_params("INSERT INTO kv VALUES ($1, $2, $3, $4)",
                       [8, None, False, None])
        r = c.query_params("SELECT v FROM kv WHERE id = $1", [8])
        assert r.rows == [(None,)]
        c.close()
    finally:
        srv.stop()


def test_extended_protocol_error_recovers_at_sync(tmp_path):
    """An error mid-exchange discards messages until Sync (the spec's
    recovery rule); the connection then works normally."""
    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgServerError,
        PgWireClient,
    )

    srv = PgMockServer(str(tmp_path / "exterr.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE t (id INTEGER PRIMARY KEY)")
        c.query_params("INSERT INTO t VALUES ($1)", [1])
        with pytest.raises(PgServerError, match="23505"):
            c.query_params("INSERT INTO t VALUES ($1)", [1])  # dup PK
        # connection recovered: both protocols still work
        assert c.query_params(
            "SELECT COUNT(*) AS n FROM t", []
        ).rows == [("1",)]
        assert c.query("SELECT COUNT(*) AS n FROM t").rows == [("1",)]
        c.close()
    finally:
        srv.stop()


def test_extended_protocol_binary_format_params(tmp_path):
    """Binary-format bind parameters (format code 1 — tokio-postgres's
    default): big-endian ints/doubles, one-byte bools, UTF-8 text, all
    decoded by declared OID. Driven with hand-built Bind messages since
    our own client sends text."""
    import socket as _socket
    import struct

    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgWireClient,
        _cstr,
        _msg,
        _read_msg,
    )

    srv = PgMockServer(str(tmp_path / "bin.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE b (id INTEGER, score REAL, ok INTEGER, v TEXT)")
        # Parse with OIDs int8, float8, bool, text
        parse = (
            _cstr("") + _cstr("INSERT INTO b VALUES ($1, $2, $3, $4)")
            + struct.pack(">h", 4)
            + struct.pack(">IIII", 20, 701, 16, 25)
        )
        vals = [
            (42).to_bytes(8, "big", signed=True),
            struct.pack(">d", 1.75),
            b"\x01",
            "héllo".encode("utf-8"),
        ]
        bind = _cstr("") + _cstr("") + struct.pack(">hh", 1, 1)  # all binary
        bind += struct.pack(">h", 4)
        for raw in vals:
            bind += struct.pack(">i", len(raw)) + raw
        bind += struct.pack(">h", 0)
        c.sock.sendall(
            _msg(b"P", parse) + _msg(b"B", bind)
            + _msg(b"E", _cstr("") + struct.pack(">i", 0)) + _msg(b"S", b"")
        )
        seen = []
        while True:
            t, body = _read_msg(c._f)
            seen.append(t)
            if t == b"Z":
                break
            assert t != b"E", body
        assert b"C" in seen
        r = c.query("SELECT id, score, ok, v FROM b")
        assert r.rows == [("42", "1.75", "1", "héllo")]
        c.close()
    finally:
        srv.stop()


def test_execute_row_limit_portal_suspended(tmp_path):
    """Execute's max-rows field (VERDICT r7 #3): a positive limit
    streams at most that many rows then PortalSuspended; re-Execute of
    the same portal resumes; limit 0 streams everything; the final
    CommandComplete row count is cumulative; after Sync OUTSIDE a
    transaction the portal is expired (34000), while inside an explicit
    transaction it survives Sync — real-PG portal lifetime, the
    mechanism behind JDBC setFetchSize."""
    import struct

    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgWireClient,
        _cstr,
        _msg,
        _read_msg,
    )

    srv = PgMockServer(str(tmp_path / "portal.db")).start()

    def drive(c, msgs):
        c.sock.sendall(msgs)
        out = []
        while True:
            t, body = _read_msg(c._f)
            out.append((t, body))
            if t == b"Z":
                return out

    def kinds(out):
        return [t for t, _ in out]

    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE p (a INTEGER)")
        c.query(
            "INSERT INTO p VALUES "
            + ",".join(f"({i})" for i in range(10))
        )
        parse = _cstr("") + _cstr("SELECT a FROM p ORDER BY a") + struct.pack(">h", 0)
        bind = _cstr("") + _cstr("") + struct.pack(">hhh", 0, 0, 0)

        def exe(n):
            return _msg(b"E", _cstr("") + struct.pack(">i", n))

        # limit 3, resumed inside one Sync window: 3+3+4 rows, one
        # suspension per partial batch, cumulative SELECT 10 at the end
        out = drive(
            c,
            _msg(b"P", parse) + _msg(b"B", bind)
            + exe(3) + exe(3) + exe(0) + _msg(b"S", b""),
        )
        ks = kinds(out)
        assert ks.count(b"D") == 10
        assert ks.count(b"s") == 2
        tags = [b for t, b in out if t == b"C"]
        assert tags and tags[-1].rstrip(b"\x00") == b"SELECT 10"
        # suspensions arrive after each 3-row batch, before the next
        assert ks.index(b"s") == ks.index(b"D") + 3

        # limit 1: one row per Execute
        out = drive(
            c,
            _msg(b"P", parse) + _msg(b"B", bind)
            + exe(1) + exe(1) + _msg(b"S", b""),
        )
        ks = kinds(out)
        assert ks.count(b"D") == 2 and ks.count(b"s") == 2
        assert b"C" not in ks  # still suspended at Sync

        # limit larger than the result: complete, no suspension
        out = drive(
            c,
            _msg(b"P", parse) + _msg(b"B", bind) + exe(99) + _msg(b"S", b""),
        )
        ks = kinds(out)
        assert ks.count(b"D") == 10 and b"s" not in ks and b"C" in ks

        # re-Execute of a COMPLETED portal (same Sync window): no more
        # rows, CommandComplete again with the cumulative count
        out = drive(
            c,
            _msg(b"P", parse) + _msg(b"B", bind)
            + exe(0) + exe(0) + _msg(b"S", b""),
        )
        ks = kinds(out)
        assert ks.count(b"D") == 10 and ks.count(b"C") == 2

        # EXPIRED portal: Sync outside a transaction destroyed it
        out = drive(c, _msg(b"P", parse) + _msg(b"B", bind) + _msg(b"S", b""))
        out = drive(c, exe(3) + _msg(b"S", b""))
        errs = [b for t, b in out if t == b"E"]
        assert errs and b"34000" in errs[0]

        # inside an explicit transaction the portal SURVIVES Sync
        c.query("BEGIN")
        out = drive(
            c, _msg(b"P", parse) + _msg(b"B", bind) + exe(4) + _msg(b"S", b"")
        )
        assert kinds(out).count(b"D") == 4
        out = drive(c, exe(0) + _msg(b"S", b""))
        ks = kinds(out)
        assert ks.count(b"D") == 6 and b"C" in ks
        c.query("COMMIT")
        c.close()
    finally:
        srv.stop()


def test_describe_statement_row_description(tmp_path):
    """Describe(statement) must answer ParameterDescription + a REAL
    RowDescription for SELECT-shaped statements (JDBC and most drivers
    map result columns from Describe(S) BEFORE any Execute) and NoData
    for DML — real PG derives this at parse time; the mock probes a
    zero-row wrapper."""
    import struct

    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgWireClient,
        _cstr,
        _msg,
        _read_msg,
    )

    srv = PgMockServer(str(tmp_path / "desc.db")).start()

    def describe_stmt(c, sql, oids=()):
        parse = (
            _cstr("ds") + _cstr(sql) + struct.pack(">h", len(oids))
            + b"".join(struct.pack(">I", o) for o in oids)
        )
        c.sock.sendall(
            _msg(b"P", parse)
            + _msg(b"D", b"S" + _cstr("ds"))
            + _msg(b"C", b"S" + _cstr("ds"))
            + _msg(b"S", b"")
        )
        seen = []
        while True:
            t, b = _read_msg(c._f)
            seen.append((t, b))
            if t == b"Z":
                return seen

    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE d (a INTEGER, b TEXT)")
        c.query("INSERT INTO d VALUES (1, 'x')")

        # SELECT: ParameterDescription + RowDescription with col names
        seen = describe_stmt(c, "SELECT a, b AS label FROM d WHERE a > $1", (23,))
        kinds = [t for t, _ in seen]
        assert b"t" in kinds and b"T" in kinds and b"n" not in kinds
        rd = next(b for t, b in seen if t == b"T")
        cols = PgWireClient._row_description(rd)
        assert cols == ["a", "label"]
        # no row was ever produced by the describe probe
        assert not [t for t, _ in seen if t == b"D"]

        # CTE-led SELECT also describes
        seen = describe_stmt(c, "WITH x AS (SELECT a FROM d) SELECT * FROM x")
        assert [t for t, _ in seen].count(b"T") == 1

        # DML without RETURNING: NoData
        seen = describe_stmt(c, "INSERT INTO d VALUES ($1, $2)", (23, 25))
        kinds = [t for t, _ in seen]
        assert b"n" in kinds and b"T" not in kinds
        # ParameterDescription carries the declared OIDs
        pd = next(b for t, b in seen if t == b"t")
        n = struct.unpack_from(">h", pd, 0)[0]
        assert n == 2
        assert struct.unpack_from(">II", pd, 2) == (23, 25)

        # the describe probe left no trace: table intact, txn idle
        assert c.query("SELECT count(*) FROM d").rows == [("1",)]
        assert c.txn_status == b"I"
        c.close()
    finally:
        srv.stop()


def test_bind_result_formats_echoed_in_row_description(tmp_path):
    """Binary RESULT formats (what tokio-postgres/psycopg3 request by
    default): the portal's RowDescription must echo the Bind's result-
    format codes. Columns are declared OID 25 (text), whose binary wire
    form is the raw UTF-8 string, so the DataRow bytes stay identical —
    the declaration is what strict clients validate."""
    import struct

    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgWireClient,
        _cstr,
        _msg,
        _read_msg,
    )

    srv = PgMockServer(str(tmp_path / "rf.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE rf (a INTEGER, b TEXT)")
        c.query("INSERT INTO rf VALUES (7, 'x')")
        parse = _cstr("") + _cstr("SELECT a, b FROM rf") + struct.pack(">h", 0)

        def roundtrip(result_fmt_block):
            bind = (
                _cstr("") + _cstr("") + struct.pack(">hh", 0, 0)
                + result_fmt_block
            )
            c.sock.sendall(
                _msg(b"P", parse) + _msg(b"B", bind)
                + _msg(b"D", b"P" + _cstr(""))
                + _msg(b"E", _cstr("") + struct.pack(">i", 0))
                + _msg(b"S", b"")
            )
            rowdesc = datarow = None
            while True:
                t, b = _read_msg(c._f)
                if t == b"T":
                    rowdesc = b
                elif t == b"D":
                    datarow = b
                elif t == b"Z":
                    return rowdesc, datarow

        def col_formats(rowdesc):
            (n,) = struct.unpack_from(">h", rowdesc, 0)
            out, pos = [], 2
            for _ in range(n):
                pos = rowdesc.index(b"\x00", pos) + 1
                out.append(struct.unpack_from(">h", rowdesc, pos + 16)[0])
                pos += 18
            return out

        # all-text (code count 0) -> formats [0, 0]
        rd, row_text = roundtrip(struct.pack(">h", 0))
        assert col_formats(rd) == [0, 0]
        # one code 1 -> applies to every column
        rd, row_bin = roundtrip(struct.pack(">hh", 1, 1))
        assert col_formats(rd) == [1, 1]
        # per-column codes
        rd, _ = roundtrip(struct.pack(">hhh", 2, 1, 0))
        assert col_formats(rd) == [1, 0]
        # binary-of-text is byte-identical to text: same DataRow
        assert row_text == row_bin
        c.close()
    finally:
        srv.stop()


def test_query_cursor_client_fetch_size(tmp_path):
    """The client's fetch-size cursor API over PortalSuspended: rows
    stream in fetch_size batches, early abandonment leaves the
    connection usable, and binary-format bind params still work
    alongside (the server decodes by format code per parameter)."""
    from moonlink_spark.pg_protocol import PgMockServer, PgServerError, PgWireClient

    srv = PgMockServer(str(tmp_path / "cur.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE big (a INTEGER, b TEXT)")
        c.query(
            "INSERT INTO big VALUES "
            + ",".join(f"({i}, 'v{i}')" for i in range(257))
        )
        rows = list(c.query_cursor("SELECT a, b FROM big ORDER BY a", fetch_size=25))
        assert len(rows) == 257
        assert rows[0] == ("0", "v0") and rows[-1] == ("256", "v256")
        # parameterized cursor
        rows = list(
            c.query_cursor(
                "SELECT a FROM big WHERE a < $1 ORDER BY a",
                fetch_size=7,
                params=[20],
            )
        )
        assert [r[0] for r in rows] == [str(i) for i in range(20)]
        # early abandonment: take 3 rows, drop the iterator, then the
        # connection still serves queries
        it = c.query_cursor("SELECT a FROM big ORDER BY a", fetch_size=5)
        got = [next(it) for _ in range(3)]
        it.close()
        assert len(got) == 3
        assert c.query("SELECT count(*) FROM big").rows == [("257",)]
        # server error surfaces as PgServerError and connection recovers
        with pytest.raises(PgServerError):
            list(c.query_cursor("SELECT nope FROM big", fetch_size=5))
        assert c.query("SELECT 1 AS one").rows == [("1",)]
        c.close()
    finally:
        srv.stop()


def test_md5_auth_end_to_end(tmp_path):
    """Legacy MD5 auth: salted double-hash exchange; wrong password gets
    28P01, right one authenticates and queries flow."""
    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgServerError,
        PgWireClient,
    )

    srv = PgMockServer(
        str(tmp_path / "md5.db"), password="pw5", auth="md5"
    ).start()
    try:
        c = PgWireClient(srv.host, srv.port, user="alice", password="pw5")
        c.query("CREATE TABLE m (id INTEGER)")
        c.query_params("INSERT INTO m VALUES ($1)", [1])
        assert c.query("SELECT COUNT(*) AS n FROM m").rows == [("1",)]
        c.close()
        with pytest.raises(PgServerError, match="28P01"):
            PgWireClient(srv.host, srv.port, user="alice", password="nope")
    finally:
        srv.stop()


def test_extended_protocol_dollar_in_string_literal_and_bad_index(tmp_path):
    """$n inside a quoted SQL literal is plain text (real-PG rule), and
    referencing a parameter that was never bound is 42P02, not a crash."""
    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgServerError,
        PgWireClient,
    )

    srv = PgMockServer(str(tmp_path / "dollar.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE d (id INTEGER, v TEXT)")
        c.query_params(
            "INSERT INTO d VALUES ($1, 'price in $2 units')", [1]
        )
        r = c.query_params("SELECT v FROM d WHERE id = $1", [1])
        assert r.rows == [("price in $2 units",)]  # literal untouched
        with pytest.raises(PgServerError, match="42P02"):
            c.query_params("SELECT $1, $3", ["a", "b"])
        # connection recovered
        assert c.query("SELECT COUNT(*) AS n FROM d").rows == [("1",)]
        c.close()
    finally:
        srv.stop()


def test_semicolon_terminated_txn_verbs_bump_lsn(tmp_path):
    """ADVICE r6: 'BEGIN;'/'COMMIT;' (external clients terminate with
    ';') must hit in_txn tracking and the LSN bump, not the bare execute
    path — otherwise committed writes are invisible to the WAL counter
    and a snapshot boundary LSN can miscover rows."""
    from moonlink_spark.pg_protocol import PgMockServer, PgWireClient

    srv = PgMockServer(str(tmp_path / "semi.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE s (id INTEGER);")
        lsn0 = int(
            c.query("SELECT pg_current_wal_lsn()").rows[0][0]
            .split("/")[1], 16,
        )
        c.query("BEGIN;")
        c.query("INSERT INTO s VALUES (1);")
        c.query("INSERT INTO s VALUES (2);")
        c.query("COMMIT;")
        lsn1 = int(
            c.query("SELECT pg_current_wal_lsn()").rows[0][0]
            .split("/")[1], 16,
        )
        assert lsn1 - lsn0 == 2  # both writes counted at COMMIT
        assert c.query("SELECT COUNT(*) AS n FROM s;").rows == [("2",)]
        # ROLLBACK; with a semicolon must also be tracked
        c.query("BEGIN;")
        c.query("INSERT INTO s VALUES (3);")
        c.query("ROLLBACK;")
        assert c.query("SELECT COUNT(*) AS n FROM s").rows == [("2",)]
        c.close()
    finally:
        srv.stop()


def test_copy_out_abandoned_generator_releases_lock(tmp_path):
    """ADVICE r6: abandoning copy_out() mid-stream must drain the COPY
    protocol and release the connection lock — the next query on the
    same client must work instead of deadlocking until GC."""
    from moonlink_spark.pg_protocol import PgMockServer, PgWireClient

    srv = PgMockServer(str(tmp_path / "copyab.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE big (id INTEGER, v TEXT)")
        c.query(
            "INSERT INTO big WITH RECURSIVE g(x) AS "
            "(SELECT 1 UNION ALL SELECT x + 1 FROM g WHERE x < 5000) "
            "SELECT x, 'v' || x FROM g"
        )
        gen = c.copy_out("COPY (SELECT * FROM big) TO STDOUT")
        first = next(gen)
        assert first.startswith(b"1\t")
        gen.close()  # abandon with thousands of rows unread
        # the connection (and its lock) must be immediately usable
        assert c.query(
            "SELECT COUNT(*) AS n FROM big"
        ).rows == [("5000",)]
        c.close()
    finally:
        srv.stop()


def test_extended_protocol_lexical_fidelity(tmp_path):
    """VERDICT r6 pin: server-side $n splicing must match real PG's
    post-parse binding across the lexer's corners — dollar-quoted
    strings, line/block comments (nested), quoted identifiers, and a
    parameter referenced twice — through BOTH bind formats."""
    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgServerError,
        PgWireClient,
    )

    srv = PgMockServer(str(tmp_path / "lex.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query('CREATE TABLE lx (id INTEGER, "$1" TEXT, v TEXT)')
        c.query_params(
            'INSERT INTO lx (id, "$1", v) VALUES ($1, $2, $2)',
            [1, "twice"],
        )
        # the same parameter used twice landed in both columns
        r = c.query_params(
            'SELECT "$1", v FROM lx WHERE id = $1', [1]
        )
        assert r.rows == [("twice", "twice")]
        # $1 inside a dollar-quoted string is data, not a parameter
        r = c.query_params(
            "SELECT $$literal $1 text$$ AS dq, $1 AS p", [7]
        )
        assert r.rows == [("literal $1 text", "7")]
        r = c.query_params(
            "SELECT $tag$keeps $2 and $tag inside$tag$ AS dq, $1 AS p",
            ["x"],
        )
        assert r.rows == [("keeps $2 and $tag inside", "x")]
        # comments: -- to EOL and nested /* /* */ */ are opaque
        r = c.query_params(
            "SELECT $1 AS a -- not a param: $9\n, $1 AS b", [5]
        )
        assert r.rows == [("5", "5")]
        r = c.query_params(
            "SELECT /* outer /* inner $9 */ $8 */ $1 AS a", [3]
        )
        assert r.rows == [("3",)]
        # unbound reference inside live SQL still errors with 42P02
        with pytest.raises(PgServerError, match="42P02"):
            c.query_params("SELECT $1, $4", ["a", "b"])
        c.close()
    finally:
        srv.stop()


def test_sqlstate_mapping_matches_pg_errcodes(tmp_path):
    """SQLite failures surface as the sqlstates a real-PG client would
    branch on (PG appendix A), identically via both protocols."""
    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgServerError,
        PgWireClient,
    )

    srv = PgMockServer(str(tmp_path / "states.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE st (id INTEGER PRIMARY KEY, v TEXT NOT NULL)")
        cases = [
            ("INSERT INTO st VALUES (1, NULL)", "23502"),
            ("SELECT * FROM no_such_rel", "42P01"),
            ("SELECT not_a_col FROM st", "42703"),
            ("SELECT definitely_not_a_function(1)", "42883"),
            ("CREATE TABLE st (id INTEGER)", "42P07"),
            ("SELECT FROM WHERE", "42601"),
        ]
        for sql, state in cases:
            with pytest.raises(PgServerError) as ei:
                c.query(sql)
            assert ei.value.fields.get("C") == state, (sql, ei.value.fields)
            # extended protocol reports the same code
            with pytest.raises(PgServerError) as ei2:
                c.query_params(sql, [])
            assert ei2.value.fields.get("C") == state
        c.query("INSERT INTO st VALUES (1, 'a')")
        with pytest.raises(PgServerError) as ei:
            c.query("INSERT INTO st VALUES (1, 'b')")
        assert ei.value.fields.get("C") == "23505"
        c.close()
    finally:
        srv.stop()


def test_describe_in_aborted_txn_errors(tmp_path):
    """Describe(statement) inside an aborted transaction must answer
    25P02 like every other command (real PG's error-recovery rule), not
    a cheerful ParameterDescription + NoData from the probe fallback."""
    import struct

    from moonlink_spark.pg_protocol import (
        PgMockServer,
        PgServerError,
        PgWireClient,
        _cstr,
        _msg,
        _read_msg,
    )

    srv = PgMockServer(str(tmp_path / "ab.db")).start()
    try:
        c = PgWireClient(srv.host, srv.port)
        c.query("CREATE TABLE a (x INTEGER)")
        c.query("BEGIN")
        with pytest.raises(PgServerError):
            c.query("SELECT * FROM missing_table")
        assert c.txn_status == b"E"
        parse = _cstr("s1") + _cstr("SELECT x FROM a") + struct.pack(">h", 0)
        c.sock.sendall(
            _msg(b"P", parse) + _msg(b"D", b"S" + _cstr("s1")) + _msg(b"S", b"")
        )
        seen = []
        while True:
            t, b = _read_msg(c._f)
            seen.append((t, b))
            if t == b"Z":
                break
        errs = [b for t, b in seen if t == b"E"]
        assert errs and b"25P02" in errs[0]
        assert not [t for t, _ in seen if t in (b"t", b"T", b"n")]
        c.query("ROLLBACK")
        assert c.query("SELECT 1 AS one").rows == [("1",)]
        c.close()
    finally:
        srv.stop()


def test_garbage_bytes_never_crash_the_server(tmp_path):
    """Pre-startup garbage, bad startup lengths, and malformed message
    bodies must be answered/refused as protocol violations — never an
    unhandled handler-thread crash or a blocking read of a negative
    length — and the server must keep serving (review finding r9)."""
    import random
    import socket
    import struct as _s

    from moonlink_spark.pg_protocol import PgMockServer, PgWireClient

    srv = PgMockServer(str(tmp_path / "fuzz.sqlite")).start()
    try:
        rng = random.Random(9)

        def startup():
            params = b"user\x00u\x00database\x00d\x00\x00"
            body = _s.pack(">I", 196608) + params
            return _s.pack(">I", len(body) + 4) + body

        for _ in range(25):  # pre-startup garbage
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=2)
            s.sendall(bytes(rng.randrange(256) for _ in range(rng.randint(1, 30))))
            s.settimeout(0.3)
            try:
                s.recv(4096)
            except (socket.timeout, ConnectionError):
                pass
            s.close()
        for _ in range(25):  # post-startup garbage
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=2)
            s.sendall(startup())
            s.settimeout(0.5)
            try:
                s.recv(65536)
            except Exception:
                pass
            s.sendall(bytes(rng.randrange(256) for _ in range(rng.randint(1, 30))))
            try:
                s.recv(4096)
            except (socket.timeout, ConnectionError):
                pass
            s.close()
        # tiny and huge startup lengths
        for n in (0, 1, 4, 7, (1 << 20) + 1, 0x7FFFFFFF):
            s = socket.create_connection(("127.0.0.1", srv.port), timeout=2)
            s.sendall(_s.pack(">I", n))
            s.settimeout(0.5)
            try:
                s.recv(4096)
            except (socket.timeout, ConnectionError):
                pass
            s.close()
        # the server still answers real clients
        c = PgWireClient("127.0.0.1", srv.port)
        assert c.query("SELECT 1 AS one").rows == [("1",)]
        c.close()
    finally:
        srv.stop()


# -- r10 review findings --------------------------------------------------


def _client(srv):
    return PgWireClient("127.0.0.1", srv.port, user="u", database="d")


def test_snapshot_rewrite_spares_string_literals(tmp_path):
    """Review r10: the frozen-table rewrite matched table names inside
    single-quoted literals, corrupting predicates like kind = 'items'."""
    srv = PgMockServer(str(tmp_path / "lit.db")).start()
    try:
        w = _client(srv)
        w.query("CREATE TABLE items (id INTEGER, kind TEXT)")
        w.query("INSERT INTO items VALUES (1, 'items'), (2, 'other')")
        r = w.query("SELECT pg_export_snapshot(), pg_current_wal_lsn()")
        snap = r.rows[0][0]
        rd = _client(srv)
        rd.query("BEGIN ISOLATION LEVEL REPEATABLE READ")
        rd.query(f"SET TRANSACTION SNAPSHOT '{snap}'")
        got = rd.query("SELECT id FROM items WHERE kind = 'items'")
        assert [r[0] for r in got.rows] == ["1"]
        # the table NAME outside literals still rewrites (frozen read)
        w.query("INSERT INTO items VALUES (3, 'items')")
        got2 = rd.query("SELECT count(*) FROM items WHERE kind = 'items'")
        assert got2.rows[0][0] == "1"  # frozen: does not see id=3
        rd.query("COMMIT")
        rd.close()
        w.close()
    finally:
        srv.stop()


def test_nested_begin_keeps_writer_txn_committable(tmp_path):
    """Review r10: a nested BEGIN ISOLATION ... used to flip an open
    writer txn into a reader txn — COMMIT then returned success without
    committing, silently losing the writes at disconnect."""
    srv = PgMockServer(str(tmp_path / "nb.db")).start()
    try:
        c = _client(srv)
        c.query("CREATE TABLE t (id INTEGER)")
        c.query("BEGIN")
        c.query("INSERT INTO t VALUES (1)")
        c.query("BEGIN ISOLATION LEVEL REPEATABLE READ")  # PG: warn+no-op
        c.query("COMMIT")
        c.close()
        c2 = _client(srv)
        assert c2.query("SELECT count(*) FROM t").rows[0][0] == "1"
        # autocommit still healthy on the same session afterwards
        c2.query("INSERT INTO t VALUES (2)")
        assert c2.query("SELECT count(*) FROM t").rows[0][0] == "2"
        c2.close()
    finally:
        srv.stop()


def test_copy_in_rejected_in_aborted_txn(tmp_path):
    """Review r10: COPY FROM STDIN bypassed the aborted-transaction
    guard — rows committed in autocommit while the WAL LSN never counted
    them."""
    srv = PgMockServer(str(tmp_path / "cf.db")).start()
    try:
        c = _client(srv)
        c.query("CREATE TABLE t (id INTEGER)")
        lsn0 = c.query("SELECT pg_current_wal_lsn()").rows[0][0]
        c.query("BEGIN")
        with pytest.raises(PgServerError):
            c.query("SELECT broken syntax here")
        with pytest.raises(PgServerError, match="25P02|aborted"):
            c.copy_in("COPY t (id) FROM STDIN", [("1",), ("2",)])
        c.query("ROLLBACK")
        assert c.query("SELECT count(*) FROM t").rows[0][0] == "0"
        lsn1 = c.query("SELECT pg_current_wal_lsn()").rows[0][0]
        assert lsn1 == lsn0  # nothing counted, nothing stored
        c.close()
    finally:
        srv.stop()


def test_exported_snapshot_files_reclaimed_on_stop(tmp_path):
    """Review r10: snapshot database files (full table copies) were
    never unlinked; they are reclaimed when the exporting server stops."""
    import glob
    import os

    db = str(tmp_path / "snapleak.db")
    srv = PgMockServer(db).start()
    try:
        c = _client(srv)
        c.query("CREATE TABLE t (id INTEGER)")
        c.query("INSERT INTO t VALUES (1)")
        for _ in range(3):
            c.query("SELECT pg_export_snapshot(), pg_current_wal_lsn()")
        c.close()
        assert len(glob.glob(db + ".snap-*.db")) == 3
    finally:
        srv.stop()
    assert glob.glob(db + ".snap-*.db") == []


def test_corrupt_row_identity_null_skipped(tmp_path):
    """Review r10: a persisted row with row_identity=null raised
    AttributeError past _parse_row's net, bricking the listing of every
    healthy table."""
    srv = PgMockServer(str(tmp_path / "cr.db")).start()
    try:
        store = PgMetadataStore("127.0.0.1", srv.port)
        store.store_table_metadata(
            "db", "good", src_table_name="s", src_table_uri="u",
            config=_cfg(),
        )
        c = _client(srv)
        c.query(
            'INSERT INTO tables ("database", "table", src_table_name,'
            " src_table_uri, config) VALUES ('db', 'bad', 's', 'u', "
            "'{\"mooncake_table_config\": {\"row_identity\": null}}')"
        )
        c.close()
        entries = store.get_all_table_metadata_entries()
        assert [e.table for e in entries] == ["good"]
        assert [t for _d, t in store.corrupt_entries()] == ["bad"]
    finally:
        srv.stop()
