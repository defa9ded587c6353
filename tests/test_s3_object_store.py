"""S3-protocol object store end-to-end: the control-plane seam speaking
real S3 REST (PUT/GET/HEAD/DELETE, ListObjectsV2 + continuation,
CopyObject, If-None-Match conditional PUT) against an in-process HTTP
server — the code path an actual s3:// deployment exercises, minus
endpoint/signing (parity: storage/filesystem/accessor/ + the reference's
local-S3 test harness, s3_test_utils.rs)."""

import threading

import pytest

from moonlink_spark.table.fs import (
    ChaosPolicy,
    CommitRaceLost,
    TransientStoreError,
    register_fs_scheme,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.errors import CommitConflictError
from moonlink_spark.table.manifest import Manifest, ManifestStore
from moonlink_spark.table.s3 import S3HttpFS, S3MemServer
from moonlink_spark.table.table import MoonlinkTable

USERS = [
    {"name": "id", "data_type": "int32", "nullable": False},
    {"name": "v", "data_type": "string"},
]


@pytest.fixture(params=["plain", "tls"])
def s3(request, monkeypatch, wire_tls):
    """Every fixture test runs twice: plaintext and HTTPS. In TLS mode
    trust flows through SSL_CERT_FILE (the system-trust-store knob the
    stdlib ssl module honors) — call sites unchanged."""
    kw = {}
    if request.param == "tls":
        kw = {"ssl_cert": wire_tls.cert_path, "ssl_key": wire_tls.key_path}
        # AWS_CA_BUNDLE outranks SSL_CERT_FILE in the accessor's
        # precedence chain (and this host exports it globally) — pin it
        monkeypatch.setenv("AWS_CA_BUNDLE", wire_tls.ca_path)
        monkeypatch.setenv("SSL_CERT_FILE", wire_tls.ca_path)
    srv = S3MemServer(**kw).start()
    register_fs_scheme("s3mem", lambda path, _e=srv.endpoint: S3HttpFS(_e))
    yield srv
    srv.stop()


def test_basic_object_semantics_over_http(s3):
    fs = S3HttpFS(s3.endpoint)
    fs.makedirs("s3mem://b/t/dir")  # implicit prefixes
    assert not fs.isdir("s3mem://b/t/dir")
    fs.write_text_durable("s3mem://b/t/dir/a.txt", "hello")
    fs.write_text_durable("s3mem://b/t/dir/sub/b.txt", "world")
    assert fs.isdir("s3mem://b/t/dir")
    assert sorted(fs.listdir("s3mem://b/t/dir")) == ["a.txt", "sub"]
    assert fs.exists("s3mem://b/t/dir/a.txt")
    assert fs.getsize("s3mem://b/t/dir/a.txt") == 5
    with fs.open_read("s3mem://b/t/dir/a.txt") as fh:
        assert fh.read() == "hello"
    fs.append_text_durable("s3mem://b/t/dir/a.txt", "!")
    with fs.open_read("s3mem://b/t/dir/a.txt") as fh:
        assert fh.read() == "hello!"
    fs.rename("s3mem://b/t/dir/a.txt", "s3mem://b/t/dir/c.txt")
    assert not fs.exists("s3mem://b/t/dir/a.txt")
    assert fs.exists("s3mem://b/t/dir/c.txt")
    fs.rmtree("s3mem://b/t/dir")
    assert not fs.isdir("s3mem://b/t/dir")
    with pytest.raises(FileNotFoundError):
        fs.unlink("s3mem://b/t/nope")


def test_conditional_put_single_winner_over_http(s3):
    a = S3HttpFS(s3.endpoint)
    b = S3HttpFS(s3.endpoint)
    a.write_text_durable("s3mem://b/tmp1", "one")
    b.write_text_durable("s3mem://b/tmp2", "two")
    a.publish_exclusive("s3mem://b/tmp1", "s3mem://b/final")
    with pytest.raises(CommitRaceLost):
        b.publish_exclusive("s3mem://b/tmp2", "s3mem://b/final")
    with a.open_read("s3mem://b/final") as fh:
        assert fh.read() == "one"
    # both tmps consumed
    assert not a.exists("s3mem://b/tmp1")
    assert not a.exists("s3mem://b/tmp2")


def test_list_pagination_with_continuation(s3):
    fs = S3HttpFS(s3.endpoint)
    for i in range(25):
        fs.write_text_durable(f"s3mem://b/page/k{i:03d}", "x")
    # force multiple ListObjectsV2 round trips through max-keys=10
    bucket_keys = []
    import urllib.parse
    import urllib.request

    token = ""
    rounds = 0
    while True:
        q = {"list-type": "2", "prefix": "page/", "max-keys": "10"}
        if token:
            q["continuation-token"] = token
        with urllib.request.urlopen(
            f"{s3.endpoint}/b?" + urllib.parse.urlencode(q)
        ) as resp:
            body = resp.read().decode()
        rounds += 1
        from xml.etree import ElementTree

        root = ElementTree.fromstring(body)
        bucket_keys += [c.text for c in root.findall("Contents/Key")]
        if root.findtext("IsTruncated") != "true":
            break
        token = root.findtext("NextContinuationToken")
    assert rounds == 3
    assert bucket_keys == [f"page/k{i:03d}" for i in range(25)]
    # and the client's own pagination sees everything too
    assert len(fs._list_keys("s3mem://b/page")) == 25


def test_two_writer_commit_race_over_http(s3):
    a = ManifestStore("s3mem://warehouse/db/race")
    b = ManifestStore("s3mem://warehouse/db/race")
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


def test_server_throttles_are_retried(s3):
    """503 SlowDown from the endpoint (the real S3 throttle shape) is
    absorbed by the client retry loop with no caller-visible effect."""
    srv = S3MemServer(throttle_every=5).start()
    try:
        fs = S3HttpFS(srv.endpoint, retries=6)
        for i in range(20):
            fs.write_text_durable(f"s3mem://b/th/k{i}", f"v{i}")
        for i in range(20):
            with fs.open_read(f"s3mem://b/th/k{i}") as fh:
                assert fh.read() == f"v{i}"
        assert srv.throttled > 0
    finally:
        srv.stop()


def test_client_chaos_exhausted_retries_surface(s3):
    fs = S3HttpFS(
        s3.endpoint, chaos=ChaosPolicy(fail_ops={"put": 99}), retries=3
    )
    with pytest.raises(TransientStoreError):
        fs.write_text_durable("s3mem://b/never", "x")
    assert not S3HttpFS(s3.endpoint).exists("s3mem://b/never")


def test_full_table_lifecycle_over_s3_protocol(spark, tmp_path, s3):
    """MoonlinkTable with its control plane (manifests) on the S3
    endpoint and parquet on local staging: create, append, upsert,
    delete, time travel, reopen, drop — all over HTTP."""
    data = str(tmp_path / "data")
    t = MoonlinkTable.create(
        spark,
        "s3mem://warehouse/db/users",
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

    # a second handle (another process) reads the same state
    t2 = MoonlinkTable.open(
        spark, "s3mem://warehouse/db/users", data_path=data
    )
    assert t2.scan().count() == 49
    assert t2.last_lsn == 3

    t2.drop()
    fs = S3HttpFS(s3.endpoint)
    assert not fs.isdir("s3mem://warehouse/db/users")


def test_chaos_suite_over_s3_with_throttling_server(spark, tmp_path):
    """The seeded chaos harness runs its full event stream with the
    control plane on a THROTTLING S3 endpoint: every injected 503 must
    be absorbed invisibly (accessor retry parity under the chaos
    generator's workload)."""
    from moonlink_spark.chaos import run_chaos

    srv = S3MemServer(throttle_every=13).start()
    try:
        register_fs_scheme(
            "s3chaos", lambda path, _e=srv.endpoint: S3HttpFS(_e, retries=6)
        )
        import moonlink_spark.chaos as chaos_mod

        # run over the s3 scheme: reuse run_chaos' plumbing by pointing
        # the table path at the endpoint-backed scheme
        meta = {
            "seed": 321,
            "table_option": "none",
            "key_index": False,
            "schema": chaos_mod.FIELDS,
            "iceberg_dest": None,
        }
        model = chaos_mod.ChaosModel()
        runner = chaos_mod.ChaosRunner(
            spark,
            "s3chaos://bucket/chaos-table",
            meta,
            model,
            data_path=str(tmp_path / "data"),
        )
        gen = chaos_mod.ChaosGenerator(model, 321, "none")
        for _ in range(50):
            runner.execute(gen.next_event())
        if model.txn != "empty":
            ev = {"kind": "commit_flush", "lsn": model.take_lsn()}
            if model.txn == "stream":
                ev["xact_id"] = model.cur_xact_id
            model.commit_txn(ev["lsn"])
            runner.execute(ev)
        runner.final_check()
        assert srv.throttled > 0  # throttles actually fired mid-run
    finally:
        srv.stop()


# -- SigV4 authentication ----------------------------------------------------


def test_sigv4_signing_key_known_vector():
    """AWS's published derivation example (docs: 'Example: signing key'):
    secret wJalr.../20150830/us-east-1/iam -> known hex."""
    from moonlink_spark.table.sigv4 import signing_key

    k = signing_key(
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        "20150830",
        "us-east-1",
        "iam",
    )
    assert k.hex() == (
        "c4afb1cc5771d871763a393e44b703571b55cc28424d1a5e86da6ed3c154a4b9"
    )


def test_sigv4_sign_verify_roundtrip_and_tamper():
    from moonlink_spark.table.sigv4 import sign_request, verify_request

    url = "/bucket/key%20with%20space?list-type=2&prefix=a%2Fb"
    headers = sign_request(
        "PUT", url, {"Host": "h:1"}, b"payload", "AK", "SK"
    )
    ok, _ = verify_request(
        "PUT", url, headers, b"payload", {"AK": "SK"}.get
    )
    assert ok
    # wrong secret on the server side
    ok, code = verify_request("PUT", url, headers, b"payload", {"AK": "XX"}.get)
    assert not ok and code == "SignatureDoesNotMatch"
    # tampered payload
    ok, code = verify_request("PUT", url, headers, b"tampered", {"AK": "SK"}.get)
    assert not ok and code == "XAmzContentSHA256Mismatch"
    # unknown key id
    ok, code = verify_request("PUT", url, headers, b"payload", {}.get)
    assert not ok and code == "InvalidAccessKeyId"


def test_signed_lifecycle_and_unsigned_rejected(tmp_path):
    """A credentialed server accepts only correctly-signed requests: the
    signed accessor runs the full object lifecycle (put/get/list/copy/
    conditional-put race) while unsigned and wrong-secret clients get
    403s that surface as OSError (non-retriable, fail-loud)."""
    srv = S3MemServer(credentials={"AK": "SK"}).start()
    try:
        fs = S3HttpFS(srv.endpoint, access_key="AK", secret_key="SK")
        fs.write_text_durable("s3mem://b/dir/a.txt", "hello")
        assert fs.open_read("s3mem://b/dir/a.txt").read() == "hello"
        assert fs.exists("s3mem://b/dir/a.txt")
        assert fs.getsize("s3mem://b/dir/a.txt") == 5
        fs.copyfile("s3mem://b/dir/a.txt", "s3mem://b/dir/b.txt")
        assert sorted(fs.listdir("s3mem://b/dir")) == ["a.txt", "b.txt"]
        # single-winner conditional PUT still works signed
        fs.write_text_durable("s3mem://b/t1", "x")
        fs.publish_exclusive("s3mem://b/t1", "s3mem://b/final")
        with pytest.raises(Exception):
            fs.write_text_durable("s3mem://b/t2", "y") or fs.publish_exclusive(
                "s3mem://b/t2", "s3mem://b/final"
            )

        unsigned = S3HttpFS(srv.endpoint)
        with pytest.raises(OSError, match="403"):
            unsigned.open_read("s3mem://b/dir/a.txt")
        wrong = S3HttpFS(srv.endpoint, access_key="AK", secret_key="WRONG")
        with pytest.raises(OSError, match="403"):
            wrong.write_text_durable("s3mem://b/evil", "x")
        # HEAD-based exists: 403 also refuses (no information leak)
        assert fs.exists("s3mem://b/dir/a.txt")
    finally:
        srv.stop()


# -- multipart upload --------------------------------------------------------


def test_multipart_upload_lifecycle_signed_and_throttled(tmp_path):
    """Initiate/UploadPart/Complete with every request SigV4-signed and
    503s injected: the retry layer absorbs throttles per part, the
    assembled object round-trips byte-exact, write_bytes auto-routes by
    size, and a completed upload leaves no pending state."""
    import os

    srv = S3MemServer(credentials={"AK": "SK"}, throttle_every=9).start()
    try:
        fs = S3HttpFS(srv.endpoint, access_key="AK", secret_key="SK", retries=8)
        data = os.urandom(3 * 1024 * 1024 + 12345)
        fs.upload_multipart("s3mem://b/big.bin", data, part_size=512 * 1024)
        assert fs.open_read_binary("s3mem://b/big.bin").read() == data
        assert srv.throttled > 0
        assert not srv.uploads  # complete dropped the session

        fs.write_bytes("s3mem://b/auto.bin", data, multipart_threshold=1 << 20)
        assert fs.open_read_binary("s3mem://b/auto.bin").read() == data
        fs.write_bytes("s3mem://b/small.bin", b"tiny")
        assert fs.open_read_binary("s3mem://b/small.bin").read() == b"tiny"
    finally:
        srv.stop()


def test_multipart_bad_etag_rejected_and_abort_leaves_no_object():
    """Complete with a tampered ETag gets InvalidPart (the object never
    materializes); a failed upload aborts its session best-effort."""
    srv = S3MemServer().start()
    try:
        fs = S3HttpFS(srv.endpoint)
        url = fs._obj_url("s3mem://b/x.bin")
        _s, body = fs._request("mpu-init", "POST", url + "?uploads")
        import re

        uid = re.search(rb"<UploadId>([^<]+)</UploadId>", body).group(1).decode()
        fs._request(
            "mpu-part", "PUT", f"{url}?partNumber=1&uploadId={uid}", body=b"abc"
        )
        xml = (
            '<CompleteMultipartUpload><Part><PartNumber>1</PartNumber>'
            '<ETag>"deadbeef"</ETag></Part></CompleteMultipartUpload>'
        )
        with pytest.raises(OSError, match="400"):
            fs._request(
                "mpu-complete", "POST", f"{url}?uploadId={uid}",
                body=xml.encode(),
            )
        assert not fs.exists("s3mem://b/x.bin")  # nothing materialized
        fs._request("mpu-abort", "DELETE", f"{url}?uploadId={uid}")
        assert not srv.uploads
    finally:
        srv.stop()


def test_upload_file_streams_multipart(tmp_path):
    """upload_file streams a local file per part (flat memory) and the
    object round-trips; small files take the single PUT."""
    import os

    srv = S3MemServer(credentials={"AK": "SK"}).start()
    try:
        fs = S3HttpFS(srv.endpoint, access_key="AK", secret_key="SK")
        big = tmp_path / "big.bin"
        payload = os.urandom(3 * 1024 * 1024 + 999)
        big.write_bytes(payload)
        fs.upload_file(str(big), "s3mem://b/big.bin", multipart_threshold=512 * 1024)
        assert fs.open_read_binary("s3mem://b/big.bin").read() == payload
        assert not srv.uploads
        small = tmp_path / "small.bin"
        small.write_bytes(b"tiny")
        fs.upload_file(str(small), "s3mem://b/small.bin")
        assert fs.open_read_binary("s3mem://b/small.bin").read() == b"tiny"
    finally:
        srv.stop()


def test_sts_session_token_required_and_verified(tmp_path):
    """STS temporary credentials: the session token rides signed on every
    request; the server requires the right token per access key —
    missing or wrong tokens get 403 InvalidToken, and since the header
    is signed, a tampered token also breaks the signature."""
    srv = S3MemServer(
        credentials={"ASIA123": "SK"},
        session_tokens={"ASIA123": "tok-abc"},
    ).start()
    try:
        good = S3HttpFS(
            srv.endpoint,
            access_key="ASIA123",
            secret_key="SK",
            session_token="tok-abc",
        )
        good.write_text_durable("s3mem://b/x.txt", "hello")
        assert good.open_read("s3mem://b/x.txt").read() == "hello"

        no_token = S3HttpFS(
            srv.endpoint, access_key="ASIA123", secret_key="SK", retries=0
        )
        with pytest.raises(OSError, match="403"):
            no_token.write_text_durable("s3mem://b/y.txt", "nope")

        wrong = S3HttpFS(
            srv.endpoint,
            access_key="ASIA123",
            secret_key="SK",
            session_token="tok-OTHER",
            retries=0,
        )
        with pytest.raises(OSError, match="403"):
            wrong.open_read("s3mem://b/x.txt")
    finally:
        srv.stop()
