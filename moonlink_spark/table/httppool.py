"""Thread-local keep-alive HTTP connection pool for the object-store
accessors.

Parity: the reference's accessors sit on a pooling HTTP client (reqwest
behind ``storage/filesystem/accessor/filesystem_accessor.rs``), so a
manifest commit or a cache fetch does not pay a TCP+TLS handshake per
request. ``S3HttpFS``/``GCSHttpFS`` are constructed per ``fs_for`` call,
so the pool lives here at module level: connections are keyed by
(host, port, tls, context-key, timeout) and owned by the calling thread
— no cross-thread sharing, no locks on the hot path, and each Spark
executor thread ends up with exactly one warm connection per endpoint.

Reuse safety: a kept-alive connection the server has since closed fails
on the NEXT request with a connection-level error before any response
bytes arrive. That failure gets ONE transparent retry on a fresh
connection — invisible to the caller's bounded retry budget, which is
reserved for real transport faults. Errors on a fresh connection (and
all timeouts) propagate to the caller's retry loop unchanged.

The transparent retry is restricted to idempotent requests: GET / HEAD /
DELETE, and PUT without a precondition header. A conditional PUT (GCS
``ifGenerationMatch=0`` via ``x-goog-if-generation-match``, S3
``If-Match``) or any POST (S3 complete-multipart) may have been applied
by the server before the connection died — silently resending could
observe 409/412 and make a put-if-absent caller believe it LOST a race
it actually won. Those propagate the connection error so the caller's
retry loop can re-check state first.
"""

from __future__ import annotations

import http.client
import socket
import threading

_local = threading.local()


class _ConnCache(dict):
    """Per-thread connection cache that closes its sockets on GC.

    Spark executor/task threads and ThreadPoolExecutor workers exit
    without calling close_thread_connections(); when the thread dies its
    thread-local storage is collected, this dict is dropped, and __del__
    closes the sockets instead of stranding fds until process exit.
    """

    def __del__(self):
        for conn in self.values():
            try:
                conn.close()
            except Exception:
                pass


def _retry_safe(method: str, headers: dict | None) -> bool:
    """True when a lost-response resend cannot change observable state."""
    if method in ("GET", "HEAD", "DELETE"):
        return True
    if method == "PUT":
        return not any(
            k.lower().startswith(("if-", "x-goog-if-", "x-amz-copy-source-if-"))
            for k in (headers or {})
        )
    return False

# Bound per-thread cached connections; distinct endpoints per process are
# few (one warehouse + maybe one metadata store), so this is a backstop
# against endpoint churn in long-lived executor threads, not a tuning knob.
_MAX_CONNS_PER_THREAD = 8


def _conns() -> dict:
    d = getattr(_local, "conns", None)
    if d is None:
        d = _ConnCache()
        _local.conns = d
    return d


def close_thread_connections() -> None:
    """Drop this thread's cached connections (tests / server teardown)."""
    d = getattr(_local, "conns", None)
    if d:
        for conn in d.values():
            try:
                conn.close()
            except OSError:
                pass
        d.clear()


def request(
    host: str,
    port: int,
    method: str,
    url: str,
    body: bytes | None = None,
    headers: dict | None = None,
    *,
    tls: bool = False,
    ssl_ctx=None,
    ctx_key: str = "",
    timeout: float = 10.0,
) -> tuple[int, bytes, dict]:
    """One HTTP exchange over a per-thread kept-alive connection.

    Returns ``(status, body, lowercase-response-headers)``. ``ctx_key``
    distinguishes TLS configurations (e.g. the CA bundle path) so two
    accessors with different trust roots never share a socket.
    """
    key = (host, port, tls, ctx_key, timeout)
    conns = _conns()
    conn = conns.pop(key, None)
    fresh = conn is None
    while True:
        if conn is None:
            if tls:
                conn = http.client.HTTPSConnection(
                    host, port, timeout=timeout, context=ssl_ctx
                )
            else:
                conn = http.client.HTTPConnection(host, port, timeout=timeout)
            conn.connect()
            # without TCP_NODELAY, Nagle + delayed ACK turns every
            # kept-alive round trip into ~40 ms (the reuse would be
            # slower than reconnecting); SSLSocket delegates setsockopt
            # to the raw socket
            conn.sock.setsockopt(
                socket.IPPROTO_TCP, socket.TCP_NODELAY, 1
            )
            fresh = True
        try:
            conn.request(method, url, body=body, headers=headers or {})
            resp = conn.getresponse()
            data = resp.read()
            status = resp.status
            resp_headers = {k.lower(): v for k, v in resp.getheaders()}
            keep = not resp.will_close
        except (ConnectionError, http.client.HTTPException):
            try:
                conn.close()
            except OSError:
                pass
            if fresh or not _retry_safe(method, headers):
                raise
            # stale keep-alive: the server closed between requests; retry
            # once on a fresh connection without charging the caller
            conn = None
            continue
        except BaseException:
            # timeout / chaos / anything else: never cache a connection in
            # an unknown protocol state
            try:
                conn.close()
            except OSError:
                pass
            raise
        if keep and len(conns) < _MAX_CONNS_PER_THREAD:
            conns[key] = conn
        else:
            conn.close()
        return status, data, resp_headers
