"""Keep-alive connection pool for the object-store accessors.

The reference's accessors ride a pooling HTTP client (reqwest behind
``storage/filesystem/accessor/filesystem_accessor.rs``); ours is
``table/httppool.py``. These tests prove the three properties that
matter at scale: requests REUSE connections (no per-request TCP/TLS
handshake), a server-side close of an idle kept-alive connection is
absorbed silently (one fresh-connection resend, invisible to the
accessor's retry budget), and error responses never poison the
connection (bodies are drained, protocol state stays clean).
"""

import threading

import pytest

from moonlink_spark.table import httppool
from moonlink_spark.table.gcs import GCSHttpFS, GCSMemServer
from moonlink_spark.table.s3 import S3HttpFS, S3MemServer


@pytest.fixture(autouse=True)
def _fresh_pool():
    httppool.close_thread_connections()
    yield
    httppool.close_thread_connections()


def test_s3_sequential_ops_share_one_connection():
    srv = S3MemServer().start()
    try:
        fs = S3HttpFS(srv.endpoint)
        for i in range(10):
            fs.write_text_durable(f"s3mem://b/k{i}", f"v{i}")
        for i in range(10):
            assert fs.open_read(f"s3mem://b/k{i}").read() == f"v{i}"
        assert fs.listdir("s3mem://b")  # list leg too
        assert srv.connections <= 2, (
            f"expected keep-alive reuse, server accepted {srv.connections} "
            "connections for 21 requests"
        )
    finally:
        srv.stop()


def test_s3_pool_shared_across_accessor_instances():
    # fs_for() builds a fresh accessor per call; the pool is keyed by
    # endpoint, so even throwaway instances reuse the warm connection
    srv = S3MemServer().start()
    try:
        for i in range(8):
            S3HttpFS(srv.endpoint).write_text_durable(f"s3mem://b/k{i}", "x")
        assert srv.connections <= 2
    finally:
        srv.stop()


def test_gcs_sequential_ops_share_one_connection():
    srv = GCSMemServer().start()
    try:
        fs = GCSHttpFS(srv.endpoint)
        for i in range(10):
            fs.write_text_durable(f"gcsmem://b/k{i}", f"v{i}")
        for i in range(10):
            assert fs.open_read(f"gcsmem://b/k{i}").read() == f"v{i}"
        assert srv.connections <= 2
    finally:
        srv.stop()


def test_stale_keepalive_is_absorbed_without_burning_retries():
    # kill the server between requests and bring a new one up on the
    # same port: the pooled connection is dead, and an accessor with a
    # ZERO retry budget must still succeed (the silent resend is the
    # pool's, not the retry loop's)
    srv = S3MemServer().start()
    port = srv.port
    fs = S3HttpFS(srv.endpoint, retries=0)
    fs.write_text_durable("s3mem://b/a", "1")
    srv.stop()
    srv2 = S3MemServer(port=port).start()
    try:
        fs2 = S3HttpFS(srv2.endpoint, retries=0)
        fs2.write_text_durable("s3mem://b/b", "2")
        assert fs2.open_read("s3mem://b/b").read() == "2"
    finally:
        srv2.stop()


def test_error_responses_do_not_poison_the_connection():
    # a PUT rejected by throttling carries an unread body unless the
    # server drains it first; the NEXT request on the same connection
    # must still parse cleanly
    srv = S3MemServer(throttle_every=3).start()
    try:
        fs = S3HttpFS(srv.endpoint, retries=8)
        for i in range(12):
            fs.write_text_durable(f"s3mem://b/k{i}", "payload" * 64)
        assert srv.throttled > 0  # throttling actually happened
        for i in range(12):
            assert fs.open_read(f"s3mem://b/k{i}").read() == "payload" * 64
    finally:
        srv.stop()


def test_threads_do_not_share_connections():
    srv = S3MemServer().start()
    try:
        errs: list[Exception] = []

        def work(n):
            try:
                fs = S3HttpFS(srv.endpoint)
                for i in range(5):
                    fs.write_text_durable(f"s3mem://b/t{n}-{i}", str(i))
                httppool.close_thread_connections()
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [threading.Thread(target=work, args=(n,)) for n in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errs
        # one connection per thread (not per request, not one global)
        assert 4 <= srv.connections <= 8
    finally:
        srv.stop()


def test_multipart_upload_over_pooled_connection():
    srv = S3MemServer().start()
    try:
        fs = S3HttpFS(srv.endpoint)
        blob = b"x" * (3 * 1024 * 1024)
        fs.upload_multipart("s3mem://b/big", blob, part_size=1 << 20)
        assert fs.open_read_binary("s3mem://b/big").read() == blob
        assert srv.connections <= 2
    finally:
        srv.stop()


def test_gcs_resumable_upload_handles_absolute_session_uri():
    # real GCS returns an absolute Location; the accessor must reduce it
    # to a request-target against its pinned endpoint
    srv = GCSMemServer().start()
    try:
        fs = GCSHttpFS(srv.endpoint)
        orig = fs._request

        def patched(op, method, url, **kw):
            if op == "resumable-init":
                status, body, h = orig(op, method, url, **kw)
                h = dict(h)
                h["location"] = srv.endpoint + h["location"]
                return status, body, h
            return orig(op, method, url, **kw)

        fs._request = patched
        blob = b"y" * (2 * 1024 * 1024 + 17)
        fs.upload_resumable("gcsmem://b/big", blob, chunk_size=1 << 20)
        assert fs.open_read_binary("gcsmem://b/big").read() == blob
    finally:
        srv.stop()


def test_transparent_retry_only_for_idempotent_requests():
    """ADVICE r9: a lost-response resend of a conditional PUT or a POST
    (S3 complete-multipart, GCS if-generation-match create) could make a
    put-if-absent caller observe 412/409 for a race it WON. The pool's
    silent one-shot retry must cover only verbs whose resend cannot
    change observable state."""
    assert httppool._retry_safe("GET", None)
    assert httppool._retry_safe("HEAD", {"Range": "bytes=0-1"})
    assert httppool._retry_safe("DELETE", None)
    assert httppool._retry_safe("PUT", {"Content-Type": "text/plain"})
    # conditional PUTs and every POST propagate the connection error
    assert not httppool._retry_safe("PUT", {"If-Match": '"abc"'})
    assert not httppool._retry_safe("PUT", {"x-goog-if-generation-match": "0"})
    assert not httppool._retry_safe(
        "PUT", {"X-Goog-If-Generation-Match": "0"}
    )
    assert not httppool._retry_safe("POST", None)


def test_nonidempotent_stale_keepalive_propagates_to_caller():
    # inject a fake "stale" cached connection that dies on use: a GET
    # silently retries on a fresh connection and succeeds, but a POST
    # must propagate the transport error to the caller's retry loop
    srv = S3MemServer().start()

    class _Stale:
        def request(self, *a, **kw):
            raise ConnectionResetError("stale keep-alive")

        def close(self):
            pass

    try:
        key = ("127.0.0.1", srv.port, False, "", 10.0)
        httppool._conns()[key] = _Stale()
        status, _b, _h = httppool.request(
            "127.0.0.1", srv.port, "GET", "/b/nokey", timeout=10.0
        )
        assert status in (200, 404)  # silent resend happened
        httppool._conns()[key] = _Stale()
        with pytest.raises(ConnectionResetError):
            httppool.request(
                "127.0.0.1", srv.port, "POST", "/b/x?uploads",
                body=b"", timeout=10.0,
            )
        # conditional PUT is equally unsafe to resend
        httppool._conns()[key] = _Stale()
        with pytest.raises(ConnectionResetError):
            httppool.request(
                "127.0.0.1", srv.port, "PUT", "/b/y", body=b"v",
                headers={"x-goog-if-generation-match": "0"}, timeout=10.0,
            )
    finally:
        srv.stop()


def test_conn_cache_closes_sockets_when_thread_dies():
    """ADVICE r9: executor/task threads exit without calling
    close_thread_connections(); the per-thread cache must close its
    sockets on GC instead of stranding fds."""
    srv = S3MemServer().start()
    socks = []
    try:
        def work():
            fs = S3HttpFS(srv.endpoint, retries=0)
            fs.write_text_durable("s3mem://b/t", "v")
            conns = httppool._conns()
            assert conns, "expected a cached connection"
            socks.extend(c.sock for c in conns.values())
        t = threading.Thread(target=work)
        t.start()
        t.join()
        del t
        import gc
        gc.collect()
        assert socks
        assert all(s.fileno() == -1 for s in socks), (
            "thread-local cache did not close its sockets on GC"
        )
    finally:
        srv.stop()
