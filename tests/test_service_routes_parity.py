"""The six reference routes added for full rest_api.rs:407-423 parity:
/health, GET /schema, /ingestpb (protobuf rows), /kafka schema+ingest
(raw Avro datums), /upload (bulk files), and /tables/.../snapshot."""

import base64
import json
import urllib.request

import pytest

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.service import MoonlinkService
from moonlink_spark.sources.avro_binary import encode_datum
from moonlink_spark.sources.converters import encode_moonlink_row


@pytest.fixture()
def svc(spark, tmp_path):
    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    s = MoonlinkService(be).start()
    yield s
    s.stop()


def _req(svc, method, path, body=None, raw=None):
    if raw is not None:
        data = raw
    else:
        data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{svc.port}{path}", data=data, method=method
    )
    if data and raw is None:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


USERS_REQ = {
    "schema": [
        {"name": "id", "data_type": "int64", "nullable": False},
        {"name": "name", "data_type": "string"},
    ],
    "identity": {"mode": "single", "columns": ["id"]},
}


def test_health(svc):
    code, out = _req(svc, "GET", "/health")
    assert code == 200
    assert out["status"] == "healthy"
    assert out["service"] == "moonlink-rest-api"
    assert isinstance(out["timestamp"], int)


def test_fetch_schema_roundtrips_create_dsl(svc):
    _req(svc, "POST", "/tables/db/users", USERS_REQ)
    code, out = _req(svc, "GET", "/schema/db/users")
    assert code == 200
    assert out["identity"] == {"mode": "single", "columns": ["id"]}
    names = [f["name"] for f in out["schema"]]
    assert names == ["id", "name"]
    # the returned DSL recreates an identical table
    code, _ = _req(
        svc, "POST", "/tables/db/users2",
        {"schema": out["schema"], "identity": out["identity"]},
    )
    assert code == 200
    code, out2 = _req(svc, "GET", "/schema/db/users2")
    assert out2["schema"] == out["schema"]
    code, out = _req(svc, "GET", "/schema/db/absent")
    assert code == 400


def test_ingest_protobuf_row(svc):
    _req(svc, "POST", "/tables/db/users", USERS_REQ)
    # moonlink_proto wire format: ordered row values; strings travel as
    # ByteArray (RowValue::ByteArray covers Binary AND Utf8, moonlink_row.rs)
    pb = encode_moonlink_row([7, b"alice"])
    code, r = _req(
        svc, "POST", "/ingestpb/db/users",
        {"operation": "insert",
         "data": base64.b64encode(pb).decode(),
         "request_mode": "sync"},
    )
    assert code == 200 and r["committed"]
    code, scan = _req(svc, "GET", "/scan/db/users")
    assert scan["rows"] == [{"id": 7, "name": "alice"}]
    # upsert through the same path replaces by identity
    pb2 = encode_moonlink_row([7, b"bob"])
    _req(svc, "POST", "/ingestpb/db/users",
         {"operation": "upsert", "data": base64.b64encode(pb2).decode()})
    code, scan = _req(svc, "GET", "/scan/db/users")
    assert scan["rows"] == [{"id": 7, "name": "bob"}]


AVRO_SCHEMA = {
    "type": "record",
    "name": "user",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "name", "type": ["null", "string"]},
    ],
}


def test_kafka_avro_schema_then_ingest(svc):
    _req(svc, "POST", "/tables/db/users", USERS_REQ)
    # ingest before schema registration is a 400
    datum = encode_datum(AVRO_SCHEMA, {"id": 1, "name": "a"})
    code, out = _req(svc, "POST", "/kafka/db/users/ingest", raw=datum)
    assert code == 400 and out["error"] == "NoAvroSchema"

    code, _ = _req(svc, "POST", "/kafka/db/users/schema",
                   {"avro_schema": AVRO_SCHEMA})
    assert code == 200
    code, r = _req(svc, "POST", "/kafka/db/users/ingest", raw=datum)
    assert code == 200 and r["committed"] and r["operation"] == "insert"
    datum2 = encode_datum(AVRO_SCHEMA, {"id": 2, "name": None})
    _req(svc, "POST", "/kafka/db/users/ingest", raw=datum2)
    code, scan = _req(svc, "GET", "/scan/db/users")
    assert {(r["id"], r["name"]) for r in scan["rows"]} == {(1, "a"), (2, None)}


def test_kafka_schema_survives_service_restart(spark, tmp_path):
    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    s1 = MoonlinkService(be).start()
    try:
        _req(s1, "POST", "/tables/db/users", USERS_REQ)
        _req(s1, "POST", "/kafka/db/users/schema", {"avro_schema": AVRO_SCHEMA})
    finally:
        s1.stop()
    # a new service over the same warehouse recovers the schema from the
    # table properties commit
    be2 = MoonlinkBackend(spark, str(tmp_path / "wh"))
    s2 = MoonlinkService(be2).start()
    try:
        datum = encode_datum(AVRO_SCHEMA, {"id": 9, "name": "z"})
        code, r = _req(s2, "POST", "/kafka/db/users/ingest", raw=datum)
        assert code == 200 and r["committed"]
        code, scan = _req(s2, "GET", "/scan/db/users")
        assert scan["rows"] == [{"id": 9, "name": "z"}]
    finally:
        s2.stop()


def test_upload_files_both_operations(svc, spark, tmp_path):
    _req(svc, "POST", "/tables/db/users", USERS_REQ)
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, name string"
    ).coalesce(1).write.parquet(src)
    files = [
        str(p) for p in __import__("pathlib").Path(src).glob("*.parquet")
    ]
    # 'upload': footer-only bulk registration
    code, r = _req(svc, "POST", "/upload/db/users",
                   {"operation": "upload", "files": files})
    assert code == 200 and r["files"] == len(files)
    code, scan = _req(svc, "GET", "/scan/db/users")
    assert len(scan["rows"]) == 3

    # 'insert': rows flow through the ingestion path
    src2 = str(tmp_path / "src2.parquet")
    spark.createDataFrame([(4, "d")], "id long, name string").write.parquet(src2)
    files2 = [str(p) for p in __import__("pathlib").Path(src2).glob("*.parquet")]
    code, r = _req(svc, "POST", "/upload/db/users",
                   {"operation": "insert", "files": files2})
    assert code == 200
    code, scan = _req(svc, "GET", "/scan/db/users")
    assert len(scan["rows"]) == 4
    code, out = _req(svc, "POST", "/upload/db/users",
                     {"operation": "bogus", "files": files2})
    assert code == 400


def test_snapshot_forces_commit(svc):
    _req(svc, "POST", "/tables/db/users", USERS_REQ)
    # async ingest buffers without committing
    _req(svc, "POST", "/ingest/db/users",
         {"operation": "insert", "data": {"id": 1, "name": "a"},
          "request_mode": "async"})
    code, scan = _req(svc, "GET", "/scan/db/users")
    assert scan["rows"] == []
    code, r = _req(svc, "POST", "/tables/db/users/snapshot", {})
    assert code == 200 and r["version"] >= 1
    code, scan = _req(svc, "GET", "/scan/db/users")
    assert len(scan["rows"]) == 1
    # snapshot with nothing pending returns the current version unchanged
    code, r2 = _req(svc, "POST", "/tables/db/users/snapshot", {})
    assert code == 200 and r2["version"] == r["version"]


def test_drop_invalidates_avro_schema_cache(svc):
    _req(svc, "POST", "/tables/db/users", USERS_REQ)
    _req(svc, "POST", "/kafka/db/users/schema", {"avro_schema": AVRO_SCHEMA})
    _req(svc, "DELETE", "/tables/db/users")
    _req(svc, "POST", "/tables/db/users", USERS_REQ)
    # the recreated table must NOT inherit the dropped table's schema
    datum = encode_datum(AVRO_SCHEMA, {"id": 1, "name": "a"})
    code, out = _req(svc, "POST", "/kafka/db/users/ingest", raw=datum)
    assert code == 400 and out["error"] == "NoAvroSchema"


def test_malformed_bodies_are_client_errors(svc):
    _req(svc, "POST", "/tables/db/users", USERS_REQ)
    code, out = _req(svc, "POST", "/upload/db/users", {})
    assert code == 400
    code, out = _req(svc, "POST", "/upload/db/users",
                     {"operation": "insert", "files": []})
    assert code == 400
    code, out = _req(svc, "POST", "/ingestpb/db/users", {"operation": "insert"})
    assert code == 400
