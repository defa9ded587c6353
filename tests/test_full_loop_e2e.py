"""THE reference loop, end to end in one test: pgoutput CDC bytes in ->
Structured Streaming micro-batch merge -> continuous Iceberg sync with
Puffin DVs -> REST catalog registration -> two independent external read
paths (catalog metadata + DuckDB, and the RPC scan protocol + DuckDB).

This is SURVEY §3.1 + §3.2 stitched together: every hop is a component
tested in isolation elsewhere; here the whole chain carries one change
stream and every reader agrees on the final rows."""

import os
import struct

import duckdb
import pytest

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.ingest.pgoutput import pgoutput_trace_to_spool
from moonlink_spark.integrations import attach_moonlink_table
from moonlink_spark.rpc import MoonlinkRpcServer
from moonlink_spark.streaming.pipeline import StreamingIngestor
from moonlink_spark.table.iceberg_export import (
    read_iceberg_deletion_vectors,
    read_iceberg_live_files,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.rest_catalog import (
    IcebergRestCatalogServer,
    RestCatalogClient,
)
from tests.test_pgoutput import (
    USERS_REL,
    begin,
    commit,
    delete,
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


def test_pgoutput_to_iceberg_to_external_readers(spark, tmp_path):
    # ---- 1. a recorded pgoutput byte stream: 3 transactions -------------
    trace = str(tmp_path / "wal.bin")
    with open(trace, "wb") as fh:
        fh.write(
            frame(
                # txn 1: seed 10 rows
                begin(100), USERS_REL,
                *[insert(16385, [str(i), f"u{i}", str(20 + i)]) for i in range(10)],
                commit(100),
                # txn 2: update two, delete one
                begin(200),
                update(16385, ["3", "u3-renamed", "53"]),
                update(16385, ["4", "u4-renamed", "54"]),
                delete(16385, ["7", None, None]),
                commit(200),
                # txn 3: late inserts
                begin(300),
                insert(16385, ["100", "late", "99"]),
                commit(300),
            )
        )

    # ---- 2. decode -> streaming spool -----------------------------------
    spool = str(tmp_path / "spool")
    n_lines = pgoutput_trace_to_spool(trace, spool)
    assert n_lines > 0

    # ---- 3. table + catalog + continuous Iceberg sync -------------------
    be = MoonlinkBackend(spark, str(tmp_path / "wh"), metadata_store="sqlite")
    t = be.create_table("db", "users", FIELDS, IdentityProp.single("id"))
    ice = str(tmp_path / "ice")
    cat = IcebergRestCatalogServer(str(tmp_path / "catalog")).start()
    try:
        url = f"http://127.0.0.1:{cat.port}"
        RestCatalogClient(url).create_namespace("cdc")
        ing = StreamingIngestor(
            t,
            spool,
            str(tmp_path / "cp"),
            sync_iceberg=ice,
            sync_catalog=(url, "cdc", "users"),
        )
        q = ing.start(available_now=True)
        q.awaitTermination()

        # ---- 4. table state reflects the CDC semantics ------------------
        rows = {
            r.id: (r.name, r.age) for r in t.scan().collect()
        }
        assert len(rows) == 10  # 10 seeded - 1 deleted + 1 late
        assert rows[3] == ("u3-renamed", 53)
        assert rows[4] == ("u4-renamed", 54)
        assert 7 not in rows
        assert rows[100] == ("late", 99)

        # ---- 5. reader A: REST catalog -> Iceberg metadata -> DuckDB ----
        code, loaded = RestCatalogClient(url).load_table("cdc", "users")
        assert code == 200
        loc = loaded["metadata-location"]
        root = os.path.dirname(os.path.dirname(loc))
        files = read_iceberg_live_files(root)
        dvs = read_iceberg_deletion_vectors(root)
        dead = {(f, p) for f, ps in dvs.items() for p in ps}
        con = duckdb.connect()
        quoted = ", ".join(f"'{p}'" for p in files)
        got = con.sql(
            f"SELECT id, name, age, filename, file_row_number "
            f"FROM read_parquet([{quoted}], filename=true, "
            f"file_row_number=true, union_by_name=true)"
        ).fetchall()
        live_a = {
            r[0]: (r[1], r[2]) for r in got if (r[3], r[4]) not in dead
        }
        assert live_a == rows

        # ---- 6. reader B: RPC scan protocol -> DuckDB provider ----------
        srv = MoonlinkRpcServer(be).start()
        try:
            con2 = duckdb.connect()
            view = attach_moonlink_table(
                con2, "127.0.0.1", srv.port, "db", "users"
            )
            live_b = {
                r[0]: (r[1], r[2])
                for r in con2.execute(
                    f"SELECT id, name, age FROM {view}"
                ).fetchall()
            }
            assert live_b == rows
        finally:
            srv.stop()

        # ---- 7. resume: a second batch of CDC flows through the SAME
        # checkpoint and both the table and the catalog advance ------------
        with open(trace, "ab") as fh:
            fh.write(
                frame(
                    begin(400), USERS_REL,
                    delete(16385, ["1", None, None]),
                    insert(16385, ["101", "tail", "1"]),
                    commit(400),
                )
            )
        assert pgoutput_trace_to_spool(trace, spool) > 0
        # the spool bridge re-emits the whole trace; the merge pipeline's
        # batch idempotence + LSN floor make the replayed prefix a no-op
        q2 = ing.start(available_now=True)
        q2.awaitTermination()
        rows2 = {r.id: (r.name, r.age) for r in t.scan().collect()}
        assert 1 not in rows2 and rows2[101] == ("tail", 1)
        assert len(rows2) == 10
        _, loaded2 = RestCatalogClient(url).load_table("cdc", "users")
        assert loaded2["metadata-location"] != loc  # catalog advanced
    finally:
        cat.stop()
