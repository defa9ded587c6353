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
    # parity ListTablesResponse (rest_api.rs:216-219): TableStatus objects
    assert [(t["database"], t["table"]) for t in out["tables"]] == [("db1", "users")]
    assert set(out["tables"][0]) == {
        "database", "table", "commit_lsn", "flush_lsn",
        "cardinality", "iceberg_warehouse_location",
    }

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


OTLP_LOGS_REQ = {
    "resourceLogs": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "checkout"}}]},
        "scopeLogs": [{
            "scope": {"name": "applog"},
            "logRecords": [
                {"timeUnixNano": "1700000000000000000",
                 "severityText": "INFO",
                 "body": {"stringValue": "user logged in"},
                 "attributes": [
                     {"key": "user_id", "value": {"intValue": "42"}}],
                 "traceId": "0af7651916cd43dd8448eb211c80319c",
                 "spanId": "b7ad6b7169203331"},
                {"timeUnixNano": "1700000001000000000",
                 "severityText": "ERROR",
                 "body": {"stringValue": "payment failed"}},
            ],
        }],
    }]
}

OTLP_METRICS_REQ = {
    "resourceMetrics": [{
        "resource": {"attributes": [
            {"key": "host", "value": {"stringValue": "node-1"}}]},
        "scopeMetrics": [{
            "scope": {"name": "runtime"},
            "metrics": [
                {"name": "cpu_usage", "unit": "1", "gauge": {"dataPoints": [
                    {"timeUnixNano": "1700000000000000000", "asDouble": 0.75},
                    {"timeUnixNano": "1700000001000000000", "asDouble": 0.80},
                ]}},
                {"name": "requests_total", "sum": {
                    "aggregationTemporality": 2, "isMonotonic": True,
                    "dataPoints": [
                        {"timeUnixNano": "1700000000000000000", "asInt": "1234",
                         "attributes": [{"key": "route",
                                          "value": {"stringValue": "/api"}}]},
                    ]}},
                {"name": "latency_ms", "histogram": {
                    "aggregationTemporality": 2,
                    "dataPoints": [
                        {"timeUnixNano": "1700000000000000000",
                         "count": "100", "sum": 250.5, "min": 0.4, "max": 30.2,
                         "explicitBounds": [1, 5, 25],
                         "bucketCounts": ["60", "30", "8", "2"]},
                    ]}},
            ],
        }],
    }]
}

OTLP_TRACES_REQ = {
    "resourceSpans": [{
        "resource": {"attributes": [
            {"key": "service.name", "value": {"stringValue": "checkout"}}]},
        "scopeSpans": [{
            "scope": {"name": "http"},
            "spans": [
                {"traceId": "0af7651916cd43dd8448eb211c80319c",
                 "spanId": "b7ad6b7169203331",
                 "name": "GET /cart", "kind": 2,
                 "startTimeUnixNano": "1700000000000000000",
                 "endTimeUnixNano": "1700000000150000000",
                 "attributes": [{"key": "http.status_code",
                                  "value": {"intValue": "200"}}],
                 "status": {"code": 1}},
                {"traceId": "0af7651916cd43dd8448eb211c80319c",
                 "spanId": "00f067aa0ba902b7",
                 "parentSpanId": "b7ad6b7169203331",
                 "name": "SELECT cart", "kind": 3,
                 "startTimeUnixNano": "1700000000010000000"},
            ],
        }],
    }]
}


def test_otel_ingest_and_scan(svc):
    """OTLP/JSON export requests land in append-only otel.* tables and scan
    back over the service (parity: the reference's OTLP/HTTP endpoint +
    moonlink_service/src/test.rs OTEL scenarios)."""
    code, r = _req(svc, "POST", "/otel/v1/logs", OTLP_LOGS_REQ)
    assert code == 200 and r["ingested"] == 2 and r["table"] == "otel.logs"
    code, r = _req(svc, "POST", "/otel/v1/metrics", OTLP_METRICS_REQ)
    assert code == 200 and r["ingested"] == 4  # 2 gauge + 1 sum + 1 histogram
    code, r = _req(svc, "POST", "/otel/v1/traces", OTLP_TRACES_REQ)
    assert code == 200 and r["ingested"] == 2

    # second batch appends (append-only table, LSN advances)
    code, r2 = _req(svc, "POST", "/otel/v1/logs", OTLP_LOGS_REQ)
    assert r2["version"] > r["version"] or r2["table"] != r["table"]

    code, scan = _req(svc, "GET", "/scan/otel/logs")
    assert code == 200 and scan["count"] == 4
    sev = sorted(row["severity_text"] for row in scan["rows"])
    assert sev == ["ERROR", "ERROR", "INFO", "INFO"]
    info = next(row for row in scan["rows"] if row["severity_text"] == "INFO")
    assert info["body"]["string_value"] == "user logged in"
    assert info["attributes"][0]["key"] == "user_id"
    assert info["attributes"][0]["value"]["int_value"] == 42
    assert info["resource_attributes"][0]["value"]["string_value"] == "checkout"

    code, scan = _req(svc, "GET", "/scan/otel/metrics")
    assert scan["count"] == 4
    by_kind = {}
    for row in scan["rows"]:
        by_kind.setdefault(row["kind"], []).append(row)
    assert len(by_kind["gauge"]) == 2
    [s] = by_kind["sum"]
    assert s["metric_name"] == "requests_total" and s["number_int"] == 1234
    assert s["is_monotonic"] is True and s["temporality"] == 2
    [h] = by_kind["histogram"]
    assert h["hist_count"] == 100 and h["bucket_counts"] == [60, 30, 8, 2]
    assert h["explicit_bounds"] == [1.0, 5.0, 25.0]

    code, scan = _req(svc, "GET", "/scan/otel/traces")
    assert scan["count"] == 2
    child = next(r for r in scan["rows"] if r["name"] == "SELECT cart")
    import base64

    assert base64.b64decode(child["parent_span_id"]).hex() == "b7ad6b7169203331"
    assert child["end_time_unix_nano"] is None


def test_export_and_matview_routes(svc, tmp_path):
    _req(svc, "POST", "/tables/db4/items", USERS_REQ)
    for i in range(30):
        _req(svc, "POST", "/ingest/db4/items",
             {"operation": "insert",
              "data": {"id": i, "name": f"g{i % 3}", "age": 20 + i}})

    # iceberg + delta exports over HTTP
    ice = str(tmp_path / "svc_ice")
    code, out = _req(svc, "POST", "/tables/db4/items/export",
                     {"format": "iceberg", "dest": ice})
    assert code == 200 and out["rows"] == 30 and out["metadata_version"] == 1
    code, out = _req(svc, "POST", "/tables/db4/items/export",
                     {"format": "delta", "dest": str(tmp_path / "svc_delta")})
    assert code == 200 and out["delta_version"] == 0
    code, out = _req(svc, "POST", "/tables/db4/items/export",
                     {"format": "nope", "dest": "x"})
    assert code == 400

    # matview create + delta refresh over HTTP
    mv_dest = str(tmp_path / "svc_mv")
    code, out = _req(svc, "POST", "/tables/db4/items/matview",
                     {"dest": mv_dest, "group_by": ["name"], "sums": ["age"]})
    assert code == 200
    _req(svc, "POST", "/ingest/db4/items",
         {"operation": "insert", "data": {"id": 100, "name": "g0", "age": 99}})
    _req(svc, "POST", "/ingest/db4/items", {"operation": "delete", "data": {"id": 1}})
    code, out = _req(svc, "POST", "/tables/db4/items/matview/refresh",
                     {"dest": mv_dest})
    assert code == 200 and out["refreshed"] and out["changed_rows"] > 0

    # the refreshed view matches a direct aggregate via /sql
    code, out = _req(svc, "POST", "/sql",
                     {"query": "SELECT name, COUNT(*) AS n FROM items "
                               "GROUP BY name ORDER BY name",
                      "database": "db4"})
    direct = {r["name"]: r["n"] for r in out["rows"]}
    from moonlink_spark.table.matview import MaterializedView

    mv = MaterializedView(svc.backend.get_table("db4", "items"), mv_dest)
    got = {r.name: r.n_rows for r in mv.read().collect()}
    assert got == direct


def test_scan_where_param(svc):
    _req(svc, "POST", "/tables/db5/pts", USERS_REQ)
    for i in range(10):
        _req(svc, "POST", "/ingest/db5/pts",
             {"operation": "insert", "data": {"id": i, "name": f"n{i}", "age": i}})
    code, out = _req(svc, "GET", "/scan/db5/pts?where=age%20BETWEEN%203%20AND%205")
    assert code == 200 and out["count"] == 3
    assert sorted(r["id"] for r in out["rows"]) == [3, 4, 5]


def test_changes_route(svc):
    _req(svc, "POST", "/tables/db6/cdf", USERS_REQ)
    for i in range(5):
        _req(svc, "POST", "/ingest/db6/cdf",
             {"operation": "insert", "data": {"id": i, "name": f"n{i}", "age": i}})
    t = svc.backend.get_table("db6", "cdf")
    base_lsn = t.last_lsn
    _req(svc, "POST", "/ingest/db6/cdf",
         {"operation": "upsert", "data": {"id": 0, "name": "UPD", "age": 99}})
    _req(svc, "POST", "/ingest/db6/cdf",
         {"operation": "insert", "data": {"id": 50, "name": "new", "age": 1}})
    _req(svc, "POST", "/ingest/db6/cdf", {"operation": "delete", "data": {"id": 4}})

    code, out = _req(svc, "GET", f"/changes/db6/cdf?from={base_lsn}")
    assert code == 200 and out["count"] == 3
    by_id = {r["id"]: r for r in out["rows"]}
    assert by_id[0]["_change_type"] == "update" and by_id[0]["after"]["name"] == "UPD"
    assert by_id[50]["_change_type"] == "insert" and by_id[50]["before"] is None
    assert by_id[4]["_change_type"] == "delete" and by_id[4]["after"] is None

    code, _ = _req(svc, "GET", "/changes/db6/cdf")
    assert code == 400  # from is required


def test_scan_where_rejects_expressions(svc):
    """Untrusted where= only admits the simple conjunct grammar — no
    server-side Spark SQL evaluation (ADVICE r3 medium)."""
    from urllib.parse import quote

    _req(svc, "POST", "/tables/db9/sec", USERS_REQ)
    _req(svc, "POST", "/ingest/db9/sec",
         {"operation": "insert", "data": {"id": 1, "name": "a", "age": 5}})
    for bad in [
        "reflect('java.lang.Runtime','getRuntime') IS NOT NULL",
        "java_method('java.lang.System','getProperty','user.dir') != ''",
        "age = 5 OR 1 = 1",
        "length(name) > 0",
        "nosuchcol = 1",
    ]:
        code, out = _req(svc, "GET", f"/scan/db9/sec?where={quote(bad)}")
        assert code == 400 and out["error"] == "BadCondition", (bad, out)
    # the simple grammar still works
    code, out = _req(svc, "GET", "/scan/db9/sec?where=age%20%3D%205")
    assert code == 200 and out["count"] == 1


def test_export_with_catalog_registration(svc, tmp_path):
    """POST /export format=iceberg&catalog=... registers the new metadata
    version in the REST catalog and the table is then loadable from it."""
    from moonlink_spark.table.rest_catalog import (
        IcebergRestCatalogServer,
        RestCatalogClient,
    )

    cat = IcebergRestCatalogServer(str(tmp_path / "cat")).start()
    try:
        _req(svc, "POST", "/tables/db10/ct", USERS_REQ)
        for i in range(5):
            _req(svc, "POST", "/ingest/db10/ct",
                 {"operation": "insert", "data": {"id": i, "name": f"n{i}", "age": i}})
        dest = str(tmp_path / "ice")
        code, out = _req(svc, "POST", "/tables/db10/ct/export",
                         {"format": "iceberg", "dest": dest,
                          "catalog": f"http://127.0.0.1:{cat.port}"})
        assert code == 200 and out["catalog"]["metadata-location"].endswith(
            "v1.metadata.json"
        )
        c = RestCatalogClient(f"http://127.0.0.1:{cat.port}")
        code, loaded = c.load_table("db10", "ct")
        assert code == 200 and loaded["metadata"]["current-snapshot-id"] == 1

        # unreachable catalog -> 502, export itself still reported
        code, out = _req(svc, "POST", "/tables/db10/ct/export",
                         {"format": "iceberg", "dest": dest,
                          "catalog": "http://127.0.0.1:9"})
        assert code == 502 and out["error"] == "CatalogRegistrationFailed"
        assert out["export"]["metadata_version"] == 2
    finally:
        cat.stop()


def test_export_with_glue_catalog_registration(svc, tmp_path):
    """POST /export catalog_type=glue registers through the Glue-protocol
    endpoint (glue_catalog.rs parity at the service surface)."""
    from moonlink_spark.table.glue_catalog import GlueCatalogClient, GlueMockServer

    glue = GlueMockServer(str(tmp_path / "glue")).start()
    try:
        _req(svc, "POST", "/tables/db11/gt", USERS_REQ)
        for i in range(3):
            _req(svc, "POST", "/ingest/db11/gt",
                 {"operation": "insert", "data": {"id": i, "name": f"n{i}", "age": i}})
        dest = str(tmp_path / "ice")
        code, out = _req(svc, "POST", "/tables/db11/gt/export",
                         {"format": "iceberg", "dest": dest,
                          "catalog": glue.endpoint, "catalog_type": "glue"})
        assert code == 200
        assert out["catalog"]["metadata-location"].endswith("v1.metadata.json")
        c = GlueCatalogClient(glue.endpoint)
        code, loaded = c.load_table("db11", "gt")
        assert code == 200 and loaded["metadata"]["current-snapshot-id"] == 1
    finally:
        glue.stop()


def test_kafka_connect_disconnect_feed(svc, tmp_path):
    """POST /kafka/{db}/{t}/connect owns a broker feed (ticker-driven
    wire consumer into the table); disconnect stops it; a second connect
    for the same topic 409s while connected."""
    import time

    from moonlink_spark.sources.avro_binary import encode_datum
    from moonlink_spark.sources.kafka_wire import (
        KafkaWireBroker,
        KafkaWireProducer,
    )

    schema = {
        "type": "record",
        "name": "e",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "v", "type": "string"},
        ],
    }
    code, _ = _req(
        svc,
        "POST",
        "/tables/db/feed",
        {
            "schema": [
                {"name": "id", "data_type": "int64", "nullable": False},
                {"name": "v", "data_type": "string"},
            ],
            "identity": {"mode": "single", "columns": ["id"]},
        },
    )
    assert code == 200
    broker = KafkaWireBroker(str(tmp_path / "logs")).start()
    try:
        prod = KafkaWireProducer(broker.host, broker.port)
        prod.send(
            "ev",
            [
                (str(i).encode(), encode_datum(schema, {"id": i, "v": f"v{i}"}))
                for i in range(7)
            ],
        )
        prod.close()

        # no schema registered and none passed -> 400
        code, body = _req(
            svc, "POST", "/kafka/db/feed/connect",
            {"host": broker.host, "port": broker.port, "topic": "ev"},
        )
        assert code == 400 and body["error"] == "NoAvroSchema"

        code, _ = _req(
            svc, "POST", "/kafka/db/feed/connect",
            {"host": broker.host, "port": broker.port, "topic": "ev",
             "avro_schema": schema, "interval_ms": 100},
        )
        assert code == 200
        code, body = _req(
            svc, "POST", "/kafka/db/feed/connect",
            {"host": broker.host, "port": broker.port, "topic": "ev",
             "avro_schema": schema},
        )
        assert code == 409 and body["error"] == "AlreadyConnected"

        def rows():
            _, b = _req(svc, "GET", "/scan/db/feed?limit=100")
            return {(r["id"], r["v"]) for r in b["rows"]}

        deadline = time.time() + 20
        while time.time() < deadline and len(rows()) < 7:
            time.sleep(0.2)
        assert rows() == {(i, f"v{i}") for i in range(7)}

        code, body = _req(svc, "POST", "/kafka/db/feed/disconnect", {})
        assert code == 200 and body["disconnected"] == 1
        # after disconnect, new produces do NOT land
        prod2 = KafkaWireProducer(broker.host, broker.port)
        prod2.send("ev", [(b"9", encode_datum(schema, {"id": 99, "v": "x"}))])
        prod2.close()
        time.sleep(0.6)
        assert len(rows()) == 7
        # and reconnect works (409 cleared), draining the tail
        code, _ = _req(
            svc, "POST", "/kafka/db/feed/connect",
            {"host": broker.host, "port": broker.port, "topic": "ev",
             "avro_schema": schema, "interval_ms": 100},
        )
        assert code == 200
        deadline = time.time() + 20
        while time.time() < deadline and len(rows()) < 8:
            time.sleep(0.2)
        assert (99, "x") in rows()
    finally:
        broker.stop()
