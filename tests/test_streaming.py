"""Structured Streaming ingestion + recovery tests (parity: WAL recovery
scenarios, src/moonlink_backend/tests/test_wal_recovery.rs; checkpoint = WAL,
SURVEY.md §3.1)."""

import json
import os

from pyspark.sql import functions as F

from moonlink_spark.streaming.pipeline import (
    LAST_BATCH_PROP,
    StreamingIngestor,
    apply_cdc_batch,
    cdc_event_schema,
    initial_copy,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable

USERS = [
    {"name": "id", "data_type": "int32", "nullable": False},
    {"name": "name", "data_type": "string"},
    {"name": "age", "data_type": "int32"},
]


def _write_events(path, events):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        for e in events:
            fh.write(json.dumps(e) + "\n")
    os.rename(tmp, path)


def _ev(lsn, op, row=None, old_row=None, xact=None):
    return {"lsn": lsn, "xact_id": xact, "op": op, "row": row, "old_row": old_row}


def _row(i, name, age):
    return {"id": i, "name": name, "age": age}


def test_stream_ingest_and_recovery(spark, tmp_path):
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
    )
    src = str(tmp_path / "events")
    cp = str(tmp_path / "checkpoint")
    _write_events(
        f"{src}/b1.json",
        [
            _ev(1, "insert", _row(1, "a", 10)),
            _ev(2, "insert", _row(2, "b", 20)),
            _ev(3, "update", _row(2, "b2", 21), _row(2, "b", 20)),
        ],
    )
    ing = StreamingIngestor(t, src, cp)
    ing.run_available()
    got = {r["id"]: r["name"] for r in t.scan().collect()}
    assert got == {1: "a", 2: "b2"}
    v1 = t.manifest.version

    # "crash" and restart with the same checkpoint: old files NOT re-applied,
    # new files picked up
    _write_events(
        f"{src}/b2.json",
        [
            _ev(4, "delete", old_row=_row(1, "a", 10)),
            _ev(5, "insert", _row(3, "c", 30)),
        ],
    )
    ing2 = StreamingIngestor(t, src, cp)
    ing2.run_available()
    got = {r["id"]: r["name"] for r in t.scan().collect()}
    assert got == {2: "b2", 3: "c"}
    assert t.manifest.version > v1


def test_batch_replay_is_idempotent(spark, tmp_path):
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
    )
    schema = cdc_event_schema(t.schema)
    batch = spark.createDataFrame(
        [
            {"lsn": 1, "xact_id": None, "op": "insert", "row": _row(1, "a", 1),
             "old_row": None},
            {"lsn": 2, "xact_id": None, "op": "insert", "row": _row(2, "b", 2),
             "old_row": None},
        ],
        schema,
    )
    v = apply_cdc_batch(t, batch, batch_id=0)
    assert v is not None and t.scan().count() == 2
    # at-least-once redelivery of the same batch is a no-op
    assert apply_cdc_batch(t, batch, batch_id=0) is None
    assert t.scan().count() == 2
    assert int(t.manifest.properties[LAST_BATCH_PROP]) == 0


def test_last_writer_wins_within_batch(spark, tmp_path):
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
    )
    schema = cdc_event_schema(t.schema)
    batch = spark.createDataFrame(
        [
            {"lsn": 1, "xact_id": None, "op": "insert", "row": _row(1, "v1", 1),
             "old_row": None},
            {"lsn": 2, "xact_id": None, "op": "update", "row": _row(1, "v2", 2),
             "old_row": _row(1, "v1", 1)},
            {"lsn": 3, "xact_id": None, "op": "insert", "row": _row(2, "x", 9),
             "old_row": None},
            {"lsn": 4, "xact_id": None, "op": "delete", "row": None,
             "old_row": _row(2, "x", 9)},
        ],
        schema,
    )
    apply_cdc_batch(t, batch, batch_id=0)
    assert {tuple(r) for r in t.scan().collect()} == {(1, "v2", 2)}


def test_initial_copy_then_stream(spark, tmp_path, sf_dir):
    fields = [
        {"name": "o_orderkey", "data_type": "int64", "nullable": False},
        {"name": "o_orderstatus", "data_type": "string"},
    ]
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), fields, IdentityProp.single("o_orderkey")
    )
    snap = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderkey", "o_orderstatus")
        .limit(100)
    )
    initial_copy(t, snap, snapshot_lsn=1000)
    assert t.scan().count() == 100
    schema = cdc_event_schema(t.schema)
    # events at/below the snapshot LSN are replay duplicates -> skipped
    batch = spark.createDataFrame(
        [
            {"lsn": 900, "xact_id": None, "op": "insert",
             "row": {"o_orderkey": 999_001, "o_orderstatus": "STALE"},
             "old_row": None},
            {"lsn": 1001, "xact_id": None, "op": "insert",
             "row": {"o_orderkey": 999_002, "o_orderstatus": "NEW"},
             "old_row": None},
        ],
        schema,
    )
    apply_cdc_batch(t, batch, batch_id=0)
    tail = {
        r["o_orderkey"]: r["o_orderstatus"]
        for r in t.scan().filter(F.col("o_orderkey") > 999_000).collect()
    }
    assert tail == {999_002: "NEW"}


def test_continuous_iceberg_sync(spark, tmp_path):
    """The reference's core loop re-expressed: CDC micro-batches in,
    incremental Iceberg snapshots out per commit, registered in a REST
    catalog — deletes arrive as Puffin DVs, never rewrites."""
    import json as _json
    import os as _os

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
    from moonlink_spark.table.table import MoonlinkTable

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "t"),
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "v", "data_type": "string"},
        ],
        IdentityProp.single("id"),
    )
    spool = str(tmp_path / "spool")
    _os.makedirs(spool)
    dest = str(tmp_path / "ice")
    cat = IcebergRestCatalogServer(str(tmp_path / "cat")).start()
    try:
        ing = StreamingIngestor(
            t,
            source_dir=spool,
            checkpoint_dir=str(tmp_path / "ckpt"),
            sync_iceberg=dest,
            sync_catalog=(f"http://127.0.0.1:{cat.port}", "db", "t"),
        )

        def emit(name, events):
            with open(_os.path.join(spool, name), "w") as fh:
                for e in events:
                    fh.write(_json.dumps(e) + "\n")

        emit("b1.jsonl", [
            {"lsn": 10, "xact_id": None, "op": "insert",
             "row": {"id": i, "v": f"v{i}"}, "old_row": None}
            for i in range(50)
        ])
        ing.run_available()
        files1 = read_iceberg_live_files(dest)
        assert files1 and not read_iceberg_deletion_vectors(dest)

        emit("b2.jsonl", [
            {"lsn": 20, "xact_id": None, "op": "delete", "row": None,
             "old_row": {"id": 7, "v": None}},
            {"lsn": 21, "xact_id": None, "op": "insert",
             "row": {"id": 100, "v": "new"}, "old_row": None},
        ])
        ing.run_available()

        # second snapshot: new data file added, delete became a DV, the
        # first batch's files were NOT rewritten
        files2 = read_iceberg_live_files(dest)
        assert set(files1) <= set(files2) and len(files2) > len(files1)
        dvs = read_iceberg_deletion_vectors(dest)
        assert sum(len(v) for v in dvs.values()) == 1

        # catalog tracks the latest metadata version
        c = RestCatalogClient(f"http://127.0.0.1:{cat.port}")
        code, loaded = c.load_table("db", "t")
        assert code == 200
        assert loaded["metadata"]["current-snapshot-id"] == 2
        assert loaded["metadata"]["format-version"] == 3

        # wire read-back equals the table scan
        import duckdb

        dead = {(f, p) for f, ps in dvs.items() for p in ps}
        con = duckdb.connect()
        q = ", ".join(f"'{p}'" for p in files2)
        rows = con.sql(
            f"SELECT id, filename, file_row_number FROM "
            f"read_parquet([{q}], filename=true, file_row_number=true)"
        ).fetchall()
        live = sorted(i for i, fn, rn in rows if (fn, rn) not in dead)
        assert live == sorted(r.id for r in t.scan().collect())
        assert len(live) == 50  # 50 - 1 deleted + 1 inserted
    finally:
        cat.stop()


def test_micro_batch_file_fanin(spark, tmp_path):
    """A small micro-batch must not fan out into shuffle.partitions tiny
    files: the commit's new data lands in O(rows / 1M) files."""
    import json as _json
    import os as _os

    from moonlink_spark.streaming.pipeline import StreamingIngestor, _fan_in
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    assert _fan_in(1) == 1 and _fan_in(999_999) == 1
    assert _fan_in(1_000_001) == 2 and _fan_in(10**9) == 64

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "t"),
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "v", "data_type": "string"},
        ],
        IdentityProp.single("id"),
    )
    spool = str(tmp_path / "spool")
    _os.makedirs(spool)
    with open(_os.path.join(spool, "a.jsonl"), "w") as fh:
        for i in range(200):
            fh.write(_json.dumps(
                {"lsn": 5, "xact_id": None, "op": "insert",
                 "row": {"id": i, "v": f"x{i}"}, "old_row": None}) + "\n")
    StreamingIngestor(
        t, source_dir=spool, checkpoint_dir=str(tmp_path / "ck")
    ).run_available()
    assert t.scan().count() == 200
    # one commit, one small batch -> ONE data file (was: up to 32)
    assert len(t.manifest.data_files) == 1
