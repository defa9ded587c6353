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


def _seq_ev(lsn, seq, op, row=None, old_row=None):
    return {
        "lsn": lsn,
        "seq": seq,
        "xact_id": None,
        "op": op,
        "row": row,
        "old_row": old_row,
    }


def test_same_lsn_ties_respect_seq_and_delete_precedence(spark, tmp_path):
    """Review finding (r9): committed transactions stamp every DML row
    with the same COMMIT LSN, so per-key winners among tied events were
    nondeterministic — an insert could resurrect a deleted row. With the
    producer-stamped seq, statement order decides; without it, delete
    wins the tie (the conservative fallback)."""
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
    )
    schema = cdc_event_schema(t.schema, with_seq=True)
    # one transaction (lsn=5): insert k1; delete k1; delete k2 then
    # RE-insert k2 — net state: k1 absent, k2 present
    t.append_rows([_row(2, "old2", 2)])
    t.commit(lsn=1)
    batch = spark.createDataFrame(
        [
            _seq_ev(5, 0, "insert", _row(1, "a", 1)),
            _seq_ev(5, 1, "delete", old_row=_row(1, "a", 1)),
            _seq_ev(5, 2, "delete", old_row=_row(2, "old2", 2)),
            _seq_ev(5, 3, "insert", _row(2, "new2", 22)),
        ],
        schema,
    )
    apply_cdc_batch(t, batch, batch_id=0)
    got = {r["id"]: r["name"] for r in t.scan().collect()}
    assert got == {2: "new2"}, got

    # WITHOUT seq: delete wins the tie (documented fallback) — the
    # deleted row is never resurrected
    t2 = MoonlinkTable.create(
        spark, str(tmp_path / "t2"), USERS, IdentityProp.single("id")
    )
    t2.append_rows([_row(1, "live", 1)])
    t2.commit(lsn=1)
    batch2 = spark.createDataFrame(
        [
            _ev(5, "insert", _row(1, "zombie", 9)),
            _ev(5, "delete", old_row=_row(1, "live", 1)),
        ],
        cdc_event_schema(t2.schema),
    )
    apply_cdc_batch(t2, batch2, batch_id=0)
    assert t2.scan().count() == 0


def test_key_changing_update_deletes_old_key(spark, tmp_path):
    """Review finding (r9): an update whose replica identity changed the
    key (old_row.id=1 -> row.id=2) left the old key's row live."""
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
    )
    t.append_rows([_row(1, "a", 1), _row(3, "c", 3)])
    t.commit(lsn=1)
    batch = spark.createDataFrame(
        [_ev(2, "update", _row(2, "a2", 2), _row(1, "a", 1))],
        cdc_event_schema(t.schema),
    )
    apply_cdc_batch(t, batch, batch_id=0)
    got = {r["id"]: r["name"] for r in t.scan().collect()}
    assert got == {2: "a2", 3: "c"}, got


def test_failed_commit_replay_does_not_double_apply(spark, tmp_path, monkeypatch):
    """Review finding (r9): a failed commit restores the staged ops to
    the pending queue; the streaming replay then staged a second copy on
    top, appending every upserted row twice."""
    import pytest

    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
    )
    batch = spark.createDataFrame(
        [
            _ev(1, "insert", _row(1, "a", 1)),
            _ev(2, "insert", _row(2, "b", 2)),
        ],
        cdc_event_schema(t.schema),
    )
    real_commit = t.store.commit
    calls = {"n": 0}

    def failing_commit(m, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("injected store outage")
        return real_commit(m, **kw)

    monkeypatch.setattr(t.store, "commit", failing_commit)
    with pytest.raises(OSError):
        apply_cdc_batch(t, batch, batch_id=0)
    assert not t.has_pending(), "failed batch left staged ops behind"
    # the replayed batch applies exactly once
    v = apply_cdc_batch(t, batch, batch_id=0)
    assert v is not None
    assert t.scan().count() == 2


def test_malformed_update_without_row_fails_loud(spark, tmp_path):
    """Review finding (r9): an update event with no new row survived as
    an upsert winner and appended an all-NULL row."""
    import pytest

    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
    )
    batch = spark.createDataFrame(
        [_ev(1, "update", None, _row(1, "a", 1))],
        cdc_event_schema(t.schema),
    )
    with pytest.raises(ValueError, match="no .*row payload|row payload"):
        apply_cdc_batch(t, batch, batch_id=0)
    assert t.scan().count() == 0


def test_ingestor_validates_index_identity_and_kafka_bootstrap(spark, tmp_path):
    """Review finding (r9): vec/sig index ids come from the single
    identity column cast to bigint — composite or string keys collide or
    go NULL, so the constructor refuses them; a kafka_topic without a
    bootstrap failed opaquely at stream start."""
    import pytest

    t_str = MoonlinkTable.create(
        spark,
        str(tmp_path / "ts"),
        [
            {"name": "k", "data_type": "string", "nullable": False},
            {"name": "text", "data_type": "string"},
        ],
        IdentityProp.single("k"),
    )
    with pytest.raises(ValueError, match="integer identity"):
        StreamingIngestor(
            t_str,
            str(tmp_path / "src"),
            str(tmp_path / "cp"),
            sync_sigindex=(str(tmp_path / "sig"), "text"),
        )
    t_int = MoonlinkTable.create(
        spark, str(tmp_path / "ti"), USERS, IdentityProp.single("id")
    )
    with pytest.raises(ValueError, match="kafka_bootstrap"):
        StreamingIngestor(t_int, kafka_topic="t")


def _apply(spark, tmp_path, name, events, pre=None):
    t = MoonlinkTable.create(
        spark, str(tmp_path / name), USERS, IdentityProp.single("id")
    )
    if pre:
        t.append_rows(pre)
        t.commit(lsn=1)
    batch = spark.createDataFrame(events, cdc_event_schema(t.schema))
    apply_cdc_batch(t, batch, batch_id=0)
    return {r["id"]: r["name"] for r in t.scan().collect()}


def test_key_change_does_not_resurrect_same_batch_insert(spark, tmp_path):
    """Review finding (r9): insert id=1 then a key-change 1->2 in ONE
    batch left id=1 alive — the old-key delete never competed in the
    per-key window, so the insert won key 1's partition and was
    re-applied after the key-change's delete."""
    got = _apply(
        spark,
        tmp_path,
        "t1",
        [
            _ev(5, "insert", _row(1, "a", 1)),
            _ev(6, "update", _row(2, "a2", 2), _row(1, "a", 1)),
        ],
    )
    assert got == {2: "a2"}, got


def test_later_insert_survives_earlier_key_change(spark, tmp_path):
    # the mirror case: the old-key slot is legitimately REFILLED by a
    # later insert; the synthetic delete must lose to it by LSN
    got = _apply(
        spark,
        tmp_path,
        "t2",
        [
            _ev(5, "update", _row(20, "moved", 2), _row(10, "orig", 1)),
            _ev(6, "insert", _row(10, "new", 3)),
        ],
        pre=[_row(10, "orig", 1)],
    )
    assert got == {10: "new", 20: "moved"}, got


def test_chained_key_changes_leave_only_the_final_key(spark, tmp_path):
    # A->B->C in one batch: B is transient and must not survive (the old
    # pairwise old-key union kept B alive: the A->B winner upserted B
    # after B->C's delete)
    got = _apply(
        spark,
        tmp_path,
        "t3",
        [
            _ev(5, "update", _row(2, "b", 2), _row(1, "a", 1)),
            _ev(6, "update", _row(3, "c", 3), _row(2, "b", 2)),
        ],
        pre=[_row(1, "a", 1)],
    )
    assert got == {3: "c"}, got


def test_key_change_then_delete_of_new_key(spark, tmp_path):
    got = _apply(
        spark,
        tmp_path,
        "t4",
        [
            _ev(5, "update", _row(2, "b", 2), _row(1, "a", 1)),
            _ev(6, "delete", None, _row(2, "b", 2)),
        ],
        pre=[_row(1, "a", 1)],
    )
    assert got == {}, got


def test_index_lsn_floor_survives_interleaved_foreign_commit(spark, tmp_path):
    """Review r10: LAST_BATCH_PROP carries forward across commits, so a
    foreign commit landing between a batch's table commit and its index
    maintenance made _index_lsn_floor read the POST-batch floor from the
    wrong parent — every event filtered out, the batch's index work
    silently skipped forever. The batch's own commit is identified by
    its operation string now."""
    from moonlink_spark.streaming.pipeline import StreamingIngestor

    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), USERS, IdentityProp.single("id")
    )
    schema = cdc_event_schema(t.schema)
    batch = spark.createDataFrame(
        [
            {"lsn": 101, "xact_id": None, "op": "insert",
             "row": _row(1, "a", 1), "old_row": None},
            {"lsn": 102, "xact_id": None, "op": "insert",
             "row": _row(2, "b", 2), "old_row": None},
        ],
        schema,
    )
    v = apply_cdc_batch(t, batch, batch_id=7)
    assert v is not None
    pre_batch_floor = 0  # the floor batch 7 was judged against
    ing = StreamingIngestor(t, str(tmp_path / "spool"), str(tmp_path / "ck"))
    # immediately after the batch's own commit: parent's floor
    assert ing._index_lsn_floor(7) == pre_batch_floor
    # a foreign commit lands before index maintenance runs; props carry
    # LAST_BATCH_PROP=7 forward
    t.append_rows([{"id": 99, "name": "f", "age": 9}])
    t.commit(lsn=10_000, operation="rest-flush")
    assert int(t.manifest.properties[LAST_BATCH_PROP]) == 7
    assert ing._index_lsn_floor(7) == pre_batch_floor  # NOT 102
