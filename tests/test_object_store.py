"""Object-store accessor behind the control-plane seam (parity: the
reference's BaseFileSystemAccess trait + S3/GCS accessors wrapped in
retry/chaos layers — storage/filesystem/accessor_config.rs,
filesystem/accessor/filesystem_accessor_wrapper.rs).

The in-memory store implements the two primitives real object stores
give you — last-writer-wins PUT and atomic conditional PUT — and the
ManifestStore control plane runs against it unchanged through
register_fs_scheme. The data plane (Spark parquet IO) goes through
Hadoop connectors in a real deployment, so these tests exercise the
manifest/WAL layer, which is exactly what the seam isolates."""

import threading

import pytest

from moonlink_spark.errors import CommitConflictError, TableConfigError
from moonlink_spark.table.fs import (
    ChaosPolicy,
    CommitRaceLost,
    InMemoryObjectStore,
    ObjectStoreFS,
    TransientStoreError,
    fs_for,
    register_fs_scheme,
)
from moonlink_spark.table.manifest import Manifest, ManifestStore

USERS = [
    {"name": "id", "data_type": "int32", "nullable": False},
    {"name": "name", "data_type": "string"},
]


@pytest.fixture()
def bucket():
    store = InMemoryObjectStore()
    register_fs_scheme("mem", lambda path, _s=store: ObjectStoreFS(_s))
    return store


def test_unknown_scheme_fails_loudly():
    with pytest.raises(TableConfigError):
        fs_for("s3weird://bucket/tbl")


def test_basic_object_semantics(bucket):
    fs = ObjectStoreFS(bucket)
    fs.makedirs("mem://b/t/dir")  # no-op: directories are prefixes
    assert not fs.isdir("mem://b/t/dir")
    fs.write_text_durable("mem://b/t/dir/a.txt", "hello")
    fs.write_text_durable("mem://b/t/dir/sub/b.txt", "world")
    assert fs.isdir("mem://b/t/dir")
    assert sorted(fs.listdir("mem://b/t/dir")) == ["a.txt", "sub"]
    assert fs.exists("mem://b/t/dir/a.txt")
    assert fs.getsize("mem://b/t/dir/a.txt") == 5
    with fs.open_read("mem://b/t/dir/a.txt") as fh:
        assert fh.read() == "hello"
    fs.append_text_durable("mem://b/t/dir/a.txt", "!")
    with fs.open_read("mem://b/t/dir/a.txt") as fh:
        assert fh.read() == "hello!"
    fs.rename("mem://b/t/dir/a.txt", "mem://b/t/dir/c.txt")
    assert not fs.exists("mem://b/t/dir/a.txt")
    assert fs.exists("mem://b/t/dir/c.txt")
    fs.rmtree("mem://b/t/dir")
    assert not fs.isdir("mem://b/t/dir")
    with pytest.raises(FileNotFoundError):
        fs.unlink("mem://b/t/nope")


def test_conditional_put_single_winner(bucket):
    fs1, fs2 = ObjectStoreFS(bucket), ObjectStoreFS(bucket)
    fs1.write_text_durable("mem://b/x.tmp1", "one")
    fs2.write_text_durable("mem://b/x.tmp2", "two")
    fs1.publish_exclusive("mem://b/x.tmp1", "mem://b/x")
    with pytest.raises(CommitRaceLost):
        fs2.publish_exclusive("mem://b/x.tmp2", "mem://b/x")
    # loser's tmp consumed, winner's object intact
    assert not fs2.exists("mem://b/x.tmp2")
    with fs1.open_read("mem://b/x") as fh:
        assert fh.read() == "one"


def test_manifest_lifecycle_on_object_store(bucket):
    """The full ManifestStore control plane against mem:// — commit,
    versions, read-back, LSN resolution — with zero POSIX calls."""
    store = ManifestStore("mem://warehouse/db/t")
    assert not store.exists()
    store.commit(Manifest(0, 0, USERS, {"mode": "none", "columns": []}))
    store.commit(Manifest(1, 10, USERS, {"mode": "none", "columns": []}))
    store.commit(Manifest(2, 20, USERS, {"mode": "none", "columns": []}))
    assert store.versions() == [0, 1, 2]
    assert store.latest().lsn == 20
    assert store.version_for_lsn(15) == 1
    assert store.read(1).lsn == 10
    # no local files were harmed in the making of this table
    assert all(k.startswith("mem://") for k in bucket.objects)


def test_two_writer_commit_race_on_object_store(bucket):
    """Two independent ManifestStore handles (= two processes against the
    same bucket) race to version 1: the conditional PUT admits exactly
    one; the loser sees CommitConflictError and the winner's manifest is
    the one readable afterwards."""
    a = ManifestStore("mem://warehouse/db/race")
    b = ManifestStore("mem://warehouse/db/race")
    a.commit(Manifest(0, 0, USERS, {"mode": "none", "columns": []}))
    results = []
    barrier = threading.Barrier(2)

    def committer(store, tag):
        m = Manifest(1, 10, USERS, {"mode": "none", "columns": []}, operation=tag)
        barrier.wait()
        try:
            store.commit(m)
            results.append(("ok", tag))
        except CommitConflictError:
            results.append(("conflict", tag))

    threads = [
        threading.Thread(target=committer, args=(s, t))
        for s, t in ((a, "wa"), (b, "wb"))
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert sorted(r[0] for r in results) == ["conflict", "ok"]
    winner = next(tag for st, tag in results if st == "ok")
    assert a.latest().operation == winner
    assert b.latest().operation == winner
    assert a.versions() == [0, 1]


def test_chaos_transient_failures_are_retried(bucket):
    """Injected throttles on put/get are absorbed by the retry layer —
    the commit still lands and reads still succeed (parity: the accessor
    wrapper's retry-on-transient behavior)."""
    chaos = ChaosPolicy(fail_ops={"put": 2, "get": 1, "list": 1})
    register_fs_scheme(
        "mem", lambda path, _s=bucket: ObjectStoreFS(_s, chaos=chaos)
    )
    store = ManifestStore("mem://warehouse/db/chaotic")
    store.commit(Manifest(0, 0, USERS, {"mode": "none", "columns": []}))
    store.commit(Manifest(1, 7, USERS, {"mode": "none", "columns": []}))
    assert store.latest().lsn == 7
    assert chaos.injected == 4  # every scripted failure actually fired


def test_chaos_exhausted_retries_surface(bucket):
    fs = ObjectStoreFS(
        bucket, chaos=ChaosPolicy(fail_ops={"put": 99}), retries=3
    )
    with pytest.raises(TransientStoreError):
        fs.write_text_durable("mem://b/never", "x")
    assert not ObjectStoreFS(bucket).exists("mem://b/never")


def test_wal_journal_on_object_store(bucket):
    """The REST WAL journal (append_text_durable + replay read) works on
    the flat namespace: append is read-modify-write, which is safe for
    the single-writer-per-table journal."""
    fs = ObjectStoreFS(bucket)
    wal = "mem://warehouse/db/t/_wal/journal.jsonl"
    fs.makedirs("mem://warehouse/db/t/_wal")
    fs.append_text_durable(wal, '{"op": "insert", "id": 1}\n')
    fs.append_text_durable(wal, '{"op": "insert", "id": 2}\n')
    with fs.open_read(wal) as fh:
        lines = fh.read().splitlines()
    assert len(lines) == 2 and '"id": 2' in lines[1]
    fs.unlink(wal)
    assert not fs.exists(wal)


def test_table_lifecycle_with_object_store_control_plane(spark, tmp_path, bucket):
    """Full MoonlinkTable lifecycle with manifests/WAL on the object store
    and parquet on a local data path (the split a real deployment runs:
    control plane behind the accessor, data via the cluster's readers):
    create, append, upsert, delete, LSN time travel, optimize, vacuum,
    reopen-from-store."""
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    data_dir = str(tmp_path / "staging")
    t = MoonlinkTable.create(
        spark,
        "mem://warehouse/db/split",
        USERS,
        IdentityProp.single("id"),
        data_path=data_dir,
    )
    t.append_rows([{"id": i, "name": f"n{i}"} for i in range(100)])
    t.commit(lsn=1)
    t.upsert_rows([{"id": 5, "name": "UPD"}, {"id": 200, "name": "new"}])
    t.commit(lsn=2)
    t.delete_rows([{"id": 7}])
    t.commit(lsn=3)

    assert t.scan().count() == 100  # 100 +1 new -1 deleted
    assert t.scan(lsn=1).count() == 100
    assert {r.name for r in t.scan().filter("id = 5").collect()} == {"UPD"}
    # every manifest object lives in the bucket; every parquet is local
    assert any("/_manifests/" in k for k in bucket.objects)
    assert not any(k.endswith(".parquet") for k in bucket.objects)
    import os as _os

    assert any(
        n.endswith(".parquet")
        for n in _os.listdir(_os.path.join(data_dir, "data"))
    )

    from moonlink_spark.table.maintenance import optimize, vacuum

    optimize(t)
    assert t.scan().count() == 100
    vacuum(t, keep_versions=1)
    assert t.scan().count() == 100

    # reopen purely from the object-store control plane
    t2 = MoonlinkTable.open(
        spark, "mem://warehouse/db/split", data_path=data_dir
    )
    assert t2.scan().count() == 100
    assert t2.last_lsn == t.last_lsn

    # drop clears both planes
    t2.drop()
    assert not any("db/split" in k for k in bucket.objects)
    assert not _os.path.isdir(data_dir)


def test_object_store_table_requires_data_path(spark, bucket):
    import pytest as _pytest

    from moonlink_spark.errors import TableConfigError
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    with _pytest.raises(TableConfigError, match="data_path"):
        MoonlinkTable.create(
            spark, "mem://warehouse/db/nodata", USERS, IdentityProp.single("id")
        )
