"""DuckDB read integration over the RPC scan protocol (parity
src/moonlink_datafusion: external engine attaches, scans at an LSN with
deletion vectors applied)."""

import duckdb
import pytest
from pyspark.sql import types as T

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.integrations import attach_moonlink_table
from moonlink_spark.rpc import MoonlinkRpcServer

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("v", T.StringType(), True),
    ]
)


@pytest.fixture()
def backend_rpc(spark, tmp_path):
    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    srv = MoonlinkRpcServer(be).start()
    yield be, srv
    srv.stop()


def test_attach_and_scan_live_rows(backend_rpc):
    be, srv = backend_rpc
    t = be.create_table("db", "u", SCHEMA, __import__(
        "moonlink_spark.table.identity", fromlist=["IdentityProp"]
    ).IdentityProp.single("id"))
    t.append_rows([{"id": i, "v": f"v{i}"} for i in range(100)])
    t.commit(lsn=10)
    t.delete_rows([{"id": i} for i in range(0, 100, 10)])  # 10 deleted
    t.commit(lsn=20)

    con = duckdb.connect()
    view = attach_moonlink_table(con, "127.0.0.1", srv.port, "db", "u")
    assert view == "db_u"
    n, = con.execute(f"SELECT COUNT(*) FROM {view}").fetchone()
    assert n == 90
    # deleted ids are really gone; remaining values intact
    gone, = con.execute(f"SELECT COUNT(*) FROM {view} WHERE id % 10 = 0").fetchone()
    assert gone == 0
    v, = con.execute(f"SELECT v FROM {view} WHERE id = 7").fetchone()
    assert v == "v7"
    # the engine's own relational surface works over the view
    rows = con.execute(
        f"SELECT id % 3 AS g, COUNT(*) FROM {view} GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert sum(c for _, c in rows) == 90


def test_attach_at_lsn_time_travel(backend_rpc):
    be, srv = backend_rpc
    from moonlink_spark.table.identity import IdentityProp

    t = be.create_table("db", "tt", SCHEMA, IdentityProp.single("id"))
    t.append_rows([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}])
    t.commit(lsn=10)
    t.delete_rows([{"id": 1}])
    t.commit(lsn=20)

    con = duckdb.connect()
    v10 = attach_moonlink_table(
        con, "127.0.0.1", srv.port, "db", "tt", lsn=10, view_name="tt_at_10"
    )
    v20 = attach_moonlink_table(
        con, "127.0.0.1", srv.port, "db", "tt", lsn=20, view_name="tt_at_20"
    )
    assert con.execute(f"SELECT COUNT(*) FROM {v10}").fetchone()[0] == 2
    assert con.execute(f"SELECT COUNT(*) FROM {v20}").fetchone()[0] == 1
    # spark scan agrees with the external engine at both LSNs
    assert t.scan(lsn=10).count() == 2
    assert t.scan(lsn=20).count() == 1


def test_attach_empty_table_is_typed(backend_rpc):
    be, srv = backend_rpc
    from moonlink_spark.table.identity import IdentityProp

    be.create_table("db", "empty", SCHEMA, IdentityProp.single("id"))
    con = duckdb.connect()
    view = attach_moonlink_table(con, "127.0.0.1", srv.port, "db", "empty")
    assert con.execute(f"SELECT COUNT(*) FROM {view}").fetchone()[0] == 0
    cols = [d[0] for d in con.execute(f"SELECT * FROM {view}").description]
    assert cols == ["id", "v"]


def test_bad_view_name_rejected(backend_rpc):
    be, srv = backend_rpc
    con = duckdb.connect()
    with pytest.raises(ValueError):
        attach_moonlink_table(
            con, "127.0.0.1", srv.port, "db", "u",
            view_name="x; DROP TABLE y",
        )


def test_attach_after_schema_evolution(backend_rpc):
    """Added columns surface as NULL for pre-alter files, matching the
    Spark scan (union_by_name, not first-file schema)."""
    be, srv = backend_rpc
    from moonlink_spark.table.identity import IdentityProp

    t = be.create_table("db", "ev", SCHEMA, IdentityProp.single("id"))
    t.append_rows([{"id": 1, "v": "a"}])
    t.commit(lsn=1)
    t.alter(add_columns=[{"name": "extra", "data_type": "int64"}])
    t.append_rows([{"id": 2, "v": "b", "extra": 9}])
    t.commit(lsn=3)

    con = duckdb.connect()
    view = attach_moonlink_table(con, "127.0.0.1", srv.port, "db", "ev")
    rows = con.execute(
        f"SELECT id, v, extra FROM {view} ORDER BY id"
    ).fetchall()
    assert rows == [(1, "a", None), (2, "b", 9)]
    spark_rows = sorted(tuple(r) for r in t.scan().collect())
    assert spark_rows == [(1, "a", None), (2, "b", 9)]


def test_materialized_attach_survives_optimize(backend_rpc):
    """materialize=True copies the snapshot into a DuckDB table, so later
    compaction/vacuum of the source files cannot break it (the documented
    answer to view-staleness after maintenance)."""
    be, srv = backend_rpc
    from moonlink_spark.table.identity import IdentityProp

    t = be.create_table("db", "mat", SCHEMA, IdentityProp.single("id"))
    for b in range(3):  # several small files so optimize rewrites them
        t.append_rows([{"id": b * 10 + i, "v": "x"} for i in range(10)])
        t.commit(lsn=b + 1)
    con = duckdb.connect()
    view = attach_moonlink_table(
        con, "127.0.0.1", srv.port, "db", "mat",
        view_name="mat_snap", materialize=True,
    )
    be.optimize_table("db", "mat")
    from moonlink_spark.table.maintenance import vacuum

    vacuum(t, keep_versions=1)
    assert con.execute(f"SELECT COUNT(*) FROM {view}").fetchone()[0] == 30


def test_iceberg_point_lookup_prunes_files(spark, tmp_path):
    """attach_iceberg_point_lookup: an exported table's hash-index blobs
    narrow the DuckDB scan to the covering files only, with deletion
    vectors applied; a miss yields a typed empty view."""
    from pyspark.sql import functions as F

    from moonlink_spark.integrations.duckdb_provider import (
        attach_iceberg_point_lookup,
    )
    from moonlink_spark.table.iceberg_export import export_iceberg
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "t"),
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "v", "data_type": "string"},
        ],
        IdentityProp.single("id"),
        key_index=True,
    )
    # three interleaved appends: every file spans the whole id domain
    for rem in range(3):
        t.append_rows(
            [{"id": i, "v": f"v{i}"} for i in range(600) if i % 3 == rem]
        )
        t.commit(lsn=rem + 1)
    t.delete_rows([{"id": 7}])  # a DV'd probe target
    t.commit(lsn=4)
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    # probes all ≡ 1 mod 3 (one append's files), including deleted id 7
    probe_ids = [1, 7, 103, 400]
    hashes = [
        r.h
        for r in spark.createDataFrame([(i,) for i in probe_ids], "id: long")
        .select(F.xxhash64("id").alias("h"))
        .collect()
    ]
    con = duckdb.connect()
    info = attach_iceberg_point_lookup(con, dest, hashes, "pt")
    assert 0 < info["pruned_files"] < info["total_files"]
    got = sorted(
        r[0]
        for r in con.execute(
            "SELECT id FROM pt WHERE id IN (1, 7, 103, 400)"
        ).fetchall()
    )
    assert got == [1, 103, 400]  # id 7 masked by the deletion vector

    # miss: hash with no index entry -> empty but well-typed view
    info2 = attach_iceberg_point_lookup(con, dest, [123456789], "pt_miss")
    assert info2["pruned_files"] == 0
    assert con.execute("SELECT COUNT(*) FROM pt_miss").fetchone()[0] == 0
    assert [d[0] for d in con.execute("SELECT * FROM pt_miss LIMIT 0").description] == ["id", "v"]


def test_exported_ann_respects_deletion_vectors(spark, tmp_path):
    """A vector deleted AFTER indexing must never be returned as a
    neighbor from the exported table: its assignment row still sits in
    the copied index blocks, but the DV-masked live join drops it."""
    import duckdb

    from moonlink_spark.integrations.duckdb_provider import (
        attach_iceberg_ann_topk,
    )
    from moonlink_spark.table import vecindex
    from moonlink_spark.table.iceberg_export import export_iceberg
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select("vec_id", "embedding")
        .filter("vec_id < 200")
    )
    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "t"),
        [
            {"name": "vec_id", "data_type": "int64", "nullable": False},
            {
                "name": "embedding",
                "data_type": "list",
                "item": {"data_type": "float32"},
            },
        ],
        IdentityProp.single("vec_id"),
    )
    t.append_df(emb)
    t.commit(lsn=1)
    idx_dir = str(tmp_path / "t" / "vecindex" / "embedding")
    vecindex.build_index(spark, emb, idx_dir, k=4, iters=2)

    # baseline export: find some query's top neighbor, then delete it
    export_iceberg(t, str(tmp_path / "ice"))
    con = duckdb.connect()
    info = attach_iceberg_ann_topk(
        con, str(tmp_path / "ice"), "embedding",
        query_ids=[0], topk=3, nprobe=2, view_name="v0",
    )
    assert info["clusters"] == 4 and info["blocks"] >= 1
    base = con.execute(
        "SELECT neighbor_id FROM v0 ORDER BY rn"
    ).fetchall()
    assert len(base) == 3
    victim = int(base[0][0])

    t.delete_rows([{"vec_id": victim}])
    t.commit(lsn=2)
    export_iceberg(t, str(tmp_path / "ice"))  # new snapshot carries a DV
    attach_iceberg_ann_topk(
        con, str(tmp_path / "ice"), "embedding",
        query_ids=[0], topk=3, nprobe=2, view_name="v1",
    )
    after = [r[0] for r in con.execute(
        "SELECT neighbor_id FROM v1 ORDER BY rn"
    ).fetchall()]
    assert victim not in after and len(after) == 3
    # the survivors keep their relative order
    assert after[:2] == [int(base[1][0]), int(base[2][0])]
    con.close()


def test_exported_lsh_pairs_respect_deletion_vectors(spark, tmp_path):
    """A document deleted after indexing must not appear in any exported
    candidate pair: its signatures remain in the copied blocks, but both
    pair sides join to the DV-masked live rows."""
    import duckdb

    from moonlink_spark.integrations.duckdb_provider import (
        attach_iceberg_lsh_pairs,
    )
    from moonlink_spark.table import sigindex
    from moonlink_spark.table.iceberg_export import export_iceberg
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .filter("doc_id < 100")
    )
    from pyspark.sql import functions as F

    near = docs.filter("doc_id % 5 = 0").select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    corpus = docs.unionByName(near)
    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "t"),
        [
            {"name": "doc_id", "data_type": "int64", "nullable": False},
            {"name": "text", "data_type": "string"},
        ],
        IdentityProp.single("doc_id"),
    )
    t.append_df(corpus)
    t.commit(lsn=1)
    sigindex.build_index(corpus, str(tmp_path / "t" / "sigindex" / "text"))
    export_iceberg(t, str(tmp_path / "ice"))
    con = duckdb.connect()
    attach_iceberg_lsh_pairs(con, str(tmp_path / "ice"), "text", "p0")
    pairs = con.execute("SELECT doc_a, doc_b FROM p0").fetchall()
    assert pairs, "near-dup corpus must produce candidate pairs"
    victim = int(pairs[0][0])

    t.delete_rows([{"doc_id": victim}])
    t.commit(lsn=2)
    export_iceberg(t, str(tmp_path / "ice"))
    attach_iceberg_lsh_pairs(con, str(tmp_path / "ice"), "text", "p1")
    after = con.execute("SELECT doc_a, doc_b FROM p1").fetchall()
    assert all(victim not in (a, b) for a, b in after)
    # every surviving pair from before is still there
    kept = {(a, b) for a, b in pairs if victim not in (a, b)}
    assert kept <= set(after)
    con.close()


def test_hold_pin_view_survives_optimize_and_vacuum(spark, tmp_path):
    """hold_pin=True keeps the RPC scan pin open, so vacuum preserves the
    attached snapshot's files and the DuckDB view keeps answering through
    an optimize+vacuum cycle; detach() releases and the files go."""
    import duckdb

    from moonlink_spark.backend import MoonlinkBackend
    from moonlink_spark.integrations.duckdb_provider import (
        attach_moonlink_table,
    )
    from moonlink_spark.rpc import MoonlinkRpcServer
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.maintenance import optimize, vacuum

    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    t = be.create_table(
        "db",
        "pinview",
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "v", "data_type": "string"},
        ],
        IdentityProp.single("id"),
    )
    t.append_rows([{"id": i, "v": f"x{i}"} for i in range(300)])
    t.commit(lsn=1)
    srv = MoonlinkRpcServer(be).start()
    try:
        con = duckdb.connect()
        view, detach = attach_moonlink_table(
            con, "127.0.0.1", srv.port, "db", "pinview", hold_pin=True
        )
        assert con.sql(f"SELECT count(*) FROM {view}").fetchone()[0] == 300
        t.append_rows([{"id": 1000, "v": "late"}])
        t.commit(lsn=2)
        optimize(t, "data")
        vacuum(t, keep_versions=1)
        # pinned snapshot still serves (old files preserved by the pin)
        assert con.sql(f"SELECT count(*) FROM {view}").fetchone()[0] == 300
        detach()
        detach()  # idempotent
        assert vacuum(t, keep_versions=1) >= 1  # old files now reclaimed
        assert t.scan().count() == 301
    finally:
        srv.stop()
