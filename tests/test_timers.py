"""Periodic maintenance timers (parity table_handler_timer.rs): tick
mechanics, error survival, and the service-level auto-flush that makes
async-ingested rows visible without an explicit POST /flush."""

import json
import threading
import time
import urllib.request

import pytest

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.service import MoonlinkService
from moonlink_spark.table.timers import TableHandlerTimers, Ticker


def test_ticker_fires_and_stops():
    hits = []
    t = Ticker(0.02, lambda: hits.append(1), "t").start()
    time.sleep(0.2)
    t.stop()
    n = len(hits)
    assert n >= 3
    time.sleep(0.1)
    assert len(hits) == n  # no ticks after stop


def test_ticker_survives_exceptions():
    hits = []

    def boom():
        hits.append(1)
        raise RuntimeError("tick failed")

    t = Ticker(0.02, boom, "boom").start()
    time.sleep(0.15)
    t.stop()
    assert len(hits) >= 2  # kept ticking past the first failure


def test_timer_bundle_snapshot_and_force():
    snap, force = [], []
    timers = TableHandlerTimers(
        snapshot_fn=lambda: snap.append(1),
        force_fn=lambda: force.append(1),
        snapshot_interval_s=0.02,
        force_interval_s=0.05,
    ).start()
    time.sleep(0.3)
    timers.stop()
    # fast tick fires more often than the slow one (500ms vs 300s in the
    # reference's defaults, table_handler_timer.rs:19-20)
    assert len(snap) > len(force) >= 2


def _req(port, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=data, method=method
    )
    if data:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req) as resp:
        return resp.status, json.loads(resp.read())


USERS_REQ = {
    "schema": [
        {"name": "id", "data_type": "int64", "nullable": False},
        {"name": "name", "data_type": "string"},
    ],
    "identity": {"mode": "single", "columns": ["id"]},
}


def test_service_auto_flush_commits_async_ingest(spark, tmp_path):
    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    svc = MoonlinkService(be, auto_flush_ms=100).start()
    try:
        _req(svc.port, "POST", "/tables/db1/users", USERS_REQ)
        # async: acked uncommitted; the snapshot tick must surface it
        code, r = _req(
            svc.port,
            "POST",
            "/ingest/db1/users",
            {"operation": "insert", "data": {"id": 1, "name": "a"},
             "request_mode": "async"},
        )
        assert code == 200 and not r["committed"]
        deadline = time.time() + 5.0
        count = 0
        while time.time() < deadline:
            _, scan = _req(svc.port, "GET", "/scan/db1/users")
            count = scan["count"]
            if count:
                break
            time.sleep(0.05)
        assert count == 1  # visible without any POST /flush
        # dropping the table stops its timer
        _req(svc.port, "DELETE", "/tables/db1/users")
        assert svc._timers == {}
    finally:
        svc.stop()


def test_service_without_auto_flush_keeps_flush_explicit(spark, tmp_path):
    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    svc = MoonlinkService(be).start()
    try:
        _req(svc.port, "POST", "/tables/db1/users", USERS_REQ)
        _req(
            svc.port,
            "POST",
            "/ingest/db1/users",
            {"operation": "insert", "data": {"id": 1, "name": "a"},
             "request_mode": "async"},
        )
        time.sleep(0.5)
        _, scan = _req(svc.port, "GET", "/scan/db1/users")
        assert scan["count"] == 0  # still buffered: no timer, no flush
        _req(svc.port, "POST", "/tables/db1/users/flush", {})
        _, scan = _req(svc.port, "GET", "/scan/db1/users")
        assert scan["count"] == 1
    finally:
        svc.stop()
