"""GCS-protocol object store end-to-end: the control-plane seam speaking
the real GCS JSON API (media upload/download, metadata GET, objects list
with pageToken, rewriteTo copy, ifGenerationMatch=0 conditional create)
against an in-process HTTP server — the code path an actual gs://
deployment exercises, minus endpoint/OAuth (parity: the reference's
accessor layer serves S3 AND GCS behind one seam,
storage/filesystem/accessor/ + gcs/gcs_test_utils.rs)."""

import threading

import pytest

from moonlink_spark.errors import CommitConflictError
from moonlink_spark.table.fs import (
    ChaosPolicy,
    CommitRaceLost,
    TransientStoreError,
    register_fs_scheme,
)
from moonlink_spark.table.gcs import GCSHttpFS, GCSMemServer
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.manifest import Manifest, ManifestStore
from moonlink_spark.table.table import MoonlinkTable

USERS = [
    {"name": "id", "data_type": "int32", "nullable": False},
    {"name": "v", "data_type": "string"},
]


@pytest.fixture(params=["plain", "tls"])
def gcs(request, monkeypatch, wire_tls):
    """Every fixture test runs twice: plaintext and HTTPS (trust via
    SSL_CERT_FILE; call sites unchanged)."""
    kw = {}
    if request.param == "tls":
        kw = {"ssl_cert": wire_tls.cert_path, "ssl_key": wire_tls.key_path}
        monkeypatch.setenv("SSL_CERT_FILE", wire_tls.ca_path)
    srv = GCSMemServer(**kw).start()
    register_fs_scheme("gcsmem", lambda path, _e=srv.endpoint: GCSHttpFS(_e))
    yield srv
    srv.stop()


def test_basic_object_semantics_over_json_api(gcs):
    fs = GCSHttpFS(gcs.endpoint)
    fs.makedirs("gcsmem://b/t/dir")  # implicit prefixes
    assert not fs.isdir("gcsmem://b/t/dir")
    fs.write_text_durable("gcsmem://b/t/dir/a.txt", "hello")
    fs.write_text_durable("gcsmem://b/t/dir/sub/b.txt", "world")
    assert fs.isdir("gcsmem://b/t/dir")
    assert sorted(fs.listdir("gcsmem://b/t/dir")) == ["a.txt", "sub"]
    assert fs.exists("gcsmem://b/t/dir/a.txt")
    assert fs.getsize("gcsmem://b/t/dir/a.txt") == 5
    with fs.open_read("gcsmem://b/t/dir/a.txt") as fh:
        assert fh.read() == "hello"
    fs.append_text_durable("gcsmem://b/t/dir/a.txt", "!")
    with fs.open_read("gcsmem://b/t/dir/a.txt") as fh:
        assert fh.read() == "hello!"
    fs.rename("gcsmem://b/t/dir/a.txt", "gcsmem://b/t/dir/c.txt")
    assert not fs.exists("gcsmem://b/t/dir/a.txt")
    assert fs.exists("gcsmem://b/t/dir/c.txt")
    fs.rmtree("gcsmem://b/t/dir")
    assert not fs.isdir("gcsmem://b/t/dir")
    with pytest.raises(FileNotFoundError):
        fs.unlink("gcsmem://b/t/nope")  # GCS 404s missing deletes


def test_conditional_create_single_winner(gcs):
    a = GCSHttpFS(gcs.endpoint)
    b = GCSHttpFS(gcs.endpoint)
    a.write_text_durable("gcsmem://b/tmp1", "one")
    b.write_text_durable("gcsmem://b/tmp2", "two")
    a.publish_exclusive("gcsmem://b/tmp1", "gcsmem://b/final")
    with pytest.raises(CommitRaceLost):
        b.publish_exclusive("gcsmem://b/tmp2", "gcsmem://b/final")
    with a.open_read("gcsmem://b/final") as fh:
        assert fh.read() == "one"
    assert not a.exists("gcsmem://b/tmp1")
    assert not a.exists("gcsmem://b/tmp2")


def test_list_pagination_with_page_token(gcs):
    fs = GCSHttpFS(gcs.endpoint)
    for i in range(25):
        fs.write_text_durable(f"gcsmem://b/page/k{i:03d}", "x")
    # force multiple objects.list round trips through maxResults=10
    import json
    import urllib.parse
    import urllib.request

    token = ""
    rounds = 0
    names = []
    while True:
        q = {"prefix": "page/", "maxResults": "10"}
        if token:
            q["pageToken"] = token
        with urllib.request.urlopen(
            f"{gcs.endpoint}/storage/v1/b/b/o?" + urllib.parse.urlencode(q)
        ) as resp:
            doc = json.loads(resp.read())
        rounds += 1
        names += [it["name"] for it in doc.get("items", [])]
        token = doc.get("nextPageToken", "")
        if not token:
            break
    assert rounds == 3
    assert names == [f"page/k{i:03d}" for i in range(25)]
    assert len(fs._list_keys("gcsmem://b/page")) == 25


def test_two_writer_commit_race_over_json_api(gcs):
    a = ManifestStore("gcsmem://warehouse/db/race")
    b = ManifestStore("gcsmem://warehouse/db/race")
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


def test_rate_limits_are_retried(gcs):
    """429 rateLimitExceeded from the endpoint (the real GCS throttle
    shape) is absorbed by the client retry loop invisibly."""
    srv = GCSMemServer(throttle_every=5).start()
    try:
        fs = GCSHttpFS(srv.endpoint, retries=6)
        for i in range(20):
            fs.write_text_durable(f"gcsmem://b/th/k{i}", f"v{i}")
        for i in range(20):
            with fs.open_read(f"gcsmem://b/th/k{i}") as fh:
                assert fh.read() == f"v{i}"
        assert srv.throttled > 0
    finally:
        srv.stop()


def test_client_chaos_exhausted_retries_surface(gcs):
    fs = GCSHttpFS(
        gcs.endpoint, chaos=ChaosPolicy(fail_ops={"put": 99}), retries=3
    )
    with pytest.raises(TransientStoreError):
        fs.write_text_durable("gcsmem://b/never", "x")
    assert not GCSHttpFS(gcs.endpoint).exists("gcsmem://b/never")


def test_full_table_lifecycle_over_gcs_protocol(spark, tmp_path, gcs):
    """MoonlinkTable with its control plane (manifests) on the GCS
    endpoint and parquet on local staging: create, append, upsert,
    delete, time travel, reopen, drop — all over the JSON API."""
    data = str(tmp_path / "data")
    t = MoonlinkTable.create(
        spark,
        "gcsmem://warehouse/db/users",
        USERS,
        IdentityProp.single("id"),
        data_path=data,
    )
    t.append_rows([{"id": i, "v": f"a{i}"} for i in range(50)])
    t.commit(lsn=1)
    t.upsert_rows([{"id": i, "v": "up"} for i in range(10)])
    t.commit(lsn=2)
    t.delete_rows([{"id": 49}])
    t.commit(lsn=3)
    assert t.scan().count() == 49
    assert t.scan(lsn=1).count() == 50
    assert {r.v for r in t.scan().filter("id < 10").collect()} == {"up"}

    t2 = MoonlinkTable.open(
        spark, "gcsmem://warehouse/db/users", data_path=data
    )
    assert t2.scan().count() == 49
    assert t2.last_lsn == 3

    t2.drop()
    fs = GCSHttpFS(gcs.endpoint)
    assert not fs.isdir("gcsmem://warehouse/db/users")


def test_chaos_suite_over_gcs_with_throttling_server(spark, tmp_path):
    """The seeded chaos harness runs its event stream with the control
    plane on a THROTTLING GCS endpoint: every injected 429 must be
    absorbed invisibly (accessor retry parity under the chaos
    generator's workload, the gcs_test_utils.rs shape)."""
    from moonlink_spark.chaos import run_chaos  # noqa: F401 (import parity)
    import moonlink_spark.chaos as chaos_mod

    srv = GCSMemServer(throttle_every=13).start()
    try:
        register_fs_scheme(
            "gcschaos", lambda path, _e=srv.endpoint: GCSHttpFS(_e, retries=6)
        )
        meta = {
            "seed": 654,
            "table_option": "none",
            "key_index": False,
            "schema": chaos_mod.FIELDS,
            "iceberg_dest": None,
        }
        model = chaos_mod.ChaosModel()
        runner = chaos_mod.ChaosRunner(
            spark,
            "gcschaos://bucket/chaos-table",
            meta,
            model,
            data_path=str(tmp_path / "data"),
        )
        gen = chaos_mod.ChaosGenerator(model, 654, "none")
        for _ in range(50):
            runner.execute(gen.next_event())
        if model.txn != "empty":
            ev = {"kind": "commit_flush", "lsn": model.take_lsn()}
            if model.txn == "stream":
                ev["xact_id"] = model.cur_xact_id
            model.commit_txn(ev["lsn"])
            runner.execute(ev)
        runner.final_check()
        assert srv.throttled > 0
    finally:
        srv.stop()


# -- bearer-token authentication ---------------------------------------------


def test_bearer_token_required_and_rotation(tmp_path):
    """A token-gated server rejects missing/invalid bearers with 401 and
    accepts a valid one; the token_provider callable supports rotation
    without rebuilding the accessor."""
    srv = GCSMemServer(valid_tokens={"tok-1", "tok-2"}).start()
    try:
        fs = GCSHttpFS(srv.endpoint, token="tok-1")
        fs.write_text_durable("gcsmem://b/x.txt", "hi")
        assert fs.open_read("gcsmem://b/x.txt").read() == "hi"

        anon = GCSHttpFS(srv.endpoint)
        with pytest.raises(OSError, match="401"):
            anon.open_read("gcsmem://b/x.txt")
        bad = GCSHttpFS(srv.endpoint, token="nope")
        with pytest.raises(OSError, match="401"):
            bad.write_text_durable("gcsmem://b/y.txt", "x")

        current = {"tok": "tok-1"}
        rot = GCSHttpFS(srv.endpoint, token_provider=lambda: current["tok"])
        assert rot.exists("gcsmem://b/x.txt")
        current["tok"] = "tok-2"  # rotated: provider picks it up per request
        assert rot.open_read("gcsmem://b/x.txt").read() == "hi"
        current["tok"] = "expired"
        with pytest.raises(OSError, match="401"):
            rot.open_read("gcsmem://b/x.txt")
    finally:
        srv.stop()


# -- resumable upload --------------------------------------------------------


def test_resumable_upload_probe_resume_under_throttling(tmp_path):
    """Resumable upload with a ZERO client retry budget against a
    throttling, token-gated server: every 429 surfaces, the client
    probes the committed offset (bytes */total -> 308 + Range) and
    resumes from exactly there; the object round-trips byte-exact and
    the finalized session is dropped."""
    import os

    srv = GCSMemServer(valid_tokens={"tok"}, throttle_every=5).start()
    try:
        fs = GCSHttpFS(srv.endpoint, token="tok", retries=0)
        data = os.urandom(2 * 1024 * 1024 + 777)
        fs.upload_resumable("gcsmem://b/big.bin", data, chunk_size=256 * 1024)
        # read back with a retry budget: the zero-retry constraint is the
        # UPLOAD's resilience claim; the verify read just needs the bytes
        fs_read = GCSHttpFS(srv.endpoint, token="tok", retries=8)
        assert fs_read.open_read_binary("gcsmem://b/big.bin").read() == data
        assert srv.throttled > 0  # faults actually fired
        assert not srv.sessions  # finalized session dropped
    finally:
        srv.stop()


def test_resumable_partial_session_is_invisible(tmp_path):
    """A half-sent session never materializes as an object: only the
    final chunk's 200 commits (atomic visibility, like a real GCS
    resumable finalize)."""
    srv = GCSMemServer().start()
    try:
        fs = GCSHttpFS(srv.endpoint)
        import urllib.parse

        q = urllib.parse.urlencode(
            {"uploadType": "resumable", "name": "partial.bin"}
        )
        _s, _b, h = fs._request(
            "resumable-init", "POST", f"/upload/storage/v1/b/b/o?{q}",
            with_headers=True,
        )
        session = h["location"]
        status, _b2, rh = fs._request(
            "resumable-chunk", "PUT", session, body=b"x" * 100,
            headers={"Content-Range": "bytes 0-99/200"},
            ok=(200, 308), with_headers=True,
        )
        assert status == 308 and rh["range"] == "bytes=0-99"
        assert not fs.exists("gcsmem://b/partial.bin")  # invisible
        status, _b3, _rh = fs._request(
            "resumable-chunk", "PUT", session, body=b"y" * 100,
            headers={"Content-Range": "bytes 100-199/200"},
            ok=(200, 308), with_headers=True,
        )
        assert status == 200
        assert fs.open_read_binary("gcsmem://b/partial.bin").read() == (
            b"x" * 100 + b"y" * 100
        )

        fs.write_bytes("gcsmem://b/auto.bin", b"z" * 4096,
                       resumable_threshold=1024)
        assert fs.open_read_binary("gcsmem://b/auto.bin").read() == b"z" * 4096
    finally:
        srv.stop()


def test_upload_file_streams_resumable(tmp_path):
    """upload_file streams a local file chunk-at-a-time through the
    resumable protocol (seek-back on probe/resume) under throttling."""
    import os

    srv = GCSMemServer(valid_tokens={"tok"}, throttle_every=7).start()
    try:
        fs = GCSHttpFS(srv.endpoint, token="tok", retries=0)
        big = tmp_path / "big.bin"
        payload = os.urandom(2 * 1024 * 1024 + 123)
        big.write_bytes(payload)
        fs.upload_file(str(big), "gcsmem://b/big.bin", resumable_threshold=256 * 1024)
        rd = GCSHttpFS(srv.endpoint, token="tok", retries=8)
        assert rd.open_read_binary("gcsmem://b/big.bin").read() == payload
        assert srv.throttled > 0 and not srv.sessions
        small = tmp_path / "small.bin"
        small.write_bytes(b"tiny")
        GCSHttpFS(srv.endpoint, token="tok", retries=8).upload_file(
            str(small), "gcsmem://b/small.bin"
        )
        assert rd.open_read_binary("gcsmem://b/small.bin").read() == b"tiny"
    finally:
        srv.stop()
