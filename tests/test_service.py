"""HTTP service e2e (parity: src/moonlink_service/src/test.rs:18-776 —
ingest JSON, scan, optimize, flush, schema errors, multi-table)."""

import json
import urllib.request

import pytest

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.service import MoonlinkService


@pytest.fixture()
def svc(spark, tmp_path):
    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    s = MoonlinkService(be).start()
    yield s
    s.stop()


def _req(svc, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{svc.port}{path}", data=data, method=method
    )
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


USERS_REQ = {
    "schema": [
        {"name": "id", "data_type": "int32", "nullable": False},
        {"name": "name", "data_type": "string"},
        {"name": "age", "data_type": "int32"},
    ],
    "identity": {"mode": "single", "columns": ["id"]},
}


def test_full_rest_lifecycle(svc):
    code, _ = _req(svc, "POST", "/tables/db1/users", USERS_REQ)
    assert code == 200
    code, out = _req(svc, "GET", "/tables")
    assert out["tables"] == ["db1.users"]

    # sync insert: committed immediately, consecutive lsns
    code, r1 = _req(svc, "POST", "/ingest/db1/users",
                    {"operation": "insert", "data": {"id": 1, "name": "a", "age": 30}})
    assert code == 200 and r1["committed"] and r1["commit_lsn"] == r1["row_lsn"] + 1
    _req(svc, "POST", "/ingest/db1/users",
         {"operation": "upsert", "data": {"id": 1, "name": "a2", "age": 31}})
    _req(svc, "POST", "/ingest/db1/users",
         {"operation": "insert", "data": {"id": 2, "name": "b", "age": 20}})
    _req(svc, "POST", "/ingest/db1/users", {"operation": "delete", "data": {"id": 2}})

    code, scan = _req(svc, "GET", "/scan/db1/users")
    assert code == 200
    assert {(r["id"], r["name"]) for r in scan["rows"]} == {(1, "a2")}

    # read-at-LSN via the service
    code, hist = _req(svc, "GET", f"/scan/db1/users?lsn={r1['commit_lsn']}")
    assert [(r["id"], r["name"]) for r in hist["rows"]] == [(1, "a")]

    # async + flush
    _req(svc, "POST", "/ingest/db1/users",
         {"operation": "insert", "data": {"id": 3, "name": "c", "age": 3},
          "request_mode": "async"})
    code, scan = _req(svc, "GET", "/scan/db1/users")
    assert scan["count"] == 1  # not visible yet
    code, fl = _req(svc, "POST", "/tables/db1/users/flush")
    assert code == 200 and fl["version"] is not None
    code, scan = _req(svc, "GET", "/scan/db1/users")
    assert scan["count"] == 2

    # optimize + drop
    code, opt = _req(svc, "POST", "/tables/db1/users/optimize", {"mode": "full"})
    assert code == 200
    code, _ = _req(svc, "DELETE", "/tables/db1/users")
    assert code == 200
    code, out = _req(svc, "GET", "/tables")
    assert out["tables"] == []


def test_error_paths(svc):
    _req(svc, "POST", "/tables/db1/t", USERS_REQ)
    # schema violation -> 400 with error type (parity: service schema errors)
    code, err = _req(svc, "POST", "/ingest/db1/t",
                     {"operation": "insert", "data": {"id": "oops", "name": "x"}})
    assert code == 400 and "JsonConvertError" in err["error"]
    # unknown operation
    code, err = _req(svc, "POST", "/ingest/db1/t",
                     {"operation": "merge", "data": {"id": 1}})
    assert code == 400
    # unknown table
    code, err = _req(svc, "GET", "/scan/db1/nope")
    assert code == 400
    # unknown route
    code, err = _req(svc, "GET", "/wat")
    assert code == 404
    # duplicate create
    code, err = _req(svc, "POST", "/tables/db1/t", USERS_REQ)
    assert code == 400


def test_scan_serializes_typed_columns(svc):
    """timestamp/date/decimal/binary cells must serialize over /scan
    (round-1 ADVICE: bare json.dumps raised TypeError -> 500)."""
    req = {
        "schema": [
            {"name": "id", "data_type": "int32", "nullable": False},
            {"name": "ts", "data_type": "timestamp_ntz"},
            {"name": "d", "data_type": "date32"},
            {"name": "amount", "data_type": "decimal(10,2)"},
            {"name": "blob", "data_type": "binary"},
        ],
        "identity": {"mode": "single", "columns": ["id"]},
    }
    code, _ = _req(svc, "POST", "/tables/db1/typed", req)
    assert code == 200
    code, r = _req(svc, "POST", "/ingest/db1/typed", {
        "operation": "insert",
        "data": {
            "id": 1,
            "ts": "2026-01-02T03:04:05.000006",
            "d": "2026-01-02",
            "amount": "12.34",
            "blob": "aGVsbG8=",  # base64 "hello"
        },
    })
    assert code == 200 and r["committed"]
    code, scan = _req(svc, "GET", "/scan/db1/typed")
    assert code == 200 and scan["count"] == 1
    row = scan["rows"][0]
    assert row["ts"].startswith("2026-01-02T03:04:05")
    assert row["d"] == "2026-01-02"
    assert row["amount"] == "12.34"
    import base64

    assert base64.b64decode(row["blob"]) == b"hello"
