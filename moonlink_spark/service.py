"""HTTP ingestion/query service over MoonlinkBackend.

Parity with the reference service REST API
(``src/moonlink_service/src/rest_api.rs``, routes at ``:407-423``):

- ``POST /tables/{db}/{table}``             create (schema DSL + identity)
- ``DELETE /tables/{db}/{table}``           drop
- ``GET  /tables``                          list
- ``POST /ingest/{db}/{table}``             {operation: insert|upsert|delete,
                                             data, request_mode: sync|async}
- ``POST /tables/{db}/{table}/flush``       commit buffered async requests
- ``POST /tables/{db}/{table}/snapshot``    force-commit pending ops
- ``POST /tables/{db}/{table}/optimize``    {mode: data|index|full}
- ``GET  /health``                          liveness (same response fields)
- ``GET  /schema/{db}/{table}``             schema as the create DSL
- ``POST /ingestpb/{db}/{table}``           protobuf-row ingest (base64)
- ``POST /kafka/{db}/{table}/schema``       register Avro value schema
- ``POST /kafka/{db}/{table}/ingest``       raw Avro datum body -> insert
- ``POST /kafka/{db}/{table}/connect``      own a broker feed: {host, port,
                                             topic, partition?, group?,
                                             interval_ms?, avro_schema?}
- ``POST /kafka/{db}/{table}/disconnect``   stop owned feeds ({topic?})
- ``POST /upload/{db}/{table}``             {operation: insert|upload, files}
- ``GET  /scan/{db}/{table}?lsn=&limit=``   rows as JSON (blocking lsn wait
                                             parity: ReadStateManager)
- ``POST /otel/v1/{logs|metrics|traces}``   OTLP/JSON export requests into
                                             append-only ``otel.*`` tables
                                             (parity: the OTLP/HTTP endpoint
                                             ``src/moonlink_service/src/otel/
                                             service.rs:51``, one row per
                                             log record / datapoint / span)

A stdlib ThreadingHTTPServer is deliberate: the service is control-plane
only — all data-plane work happens in Spark jobs, so the HTTP layer needs no
throughput. Every ingest request is its own transaction with consecutive
(row_lsn, commit_lsn), exactly like the reference REST source.
"""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.errors import MoonlinkError
from moonlink_spark.ingest.rest import RestSink
from moonlink_spark.table.identity import IdentityProp

_TABLE_RE = re.compile(
    r"^/tables/([^/]+)/([^/]+)"
    r"(/optimize|/flush|/snapshot|/export|/matview|/matview/refresh"
    r"|/vecindex|/vecindex/update|/vecindex/query"
    r"|/sigindex|/sigindex/update|/sigindex/maintain"
    r"|/sigindex/candidates)?$"
)
_INGEST_RE = re.compile(r"^/ingest/([^/]+)/([^/]+)$")
_INGESTPB_RE = re.compile(r"^/ingestpb/([^/]+)/([^/]+)$")
_KAFKA_RE = re.compile(
    r"^/kafka/([^/]+)/([^/]+)/(schema|ingest|connect|disconnect)$"
)
_UPLOAD_RE = re.compile(r"^/upload/([^/]+)/([^/]+)$")
_SCHEMA_RE = re.compile(r"^/schema/([^/]+)/([^/]+)$")
_SCAN_RE = re.compile(r"^/scan/([^/]+)/([^/]+)$")
_CHANGES_RE = re.compile(r"^/changes/([^/]+)/([^/]+)$")
_OTEL_RE = re.compile(r"^/otel/v1/(logs|metrics|traces)$")


def _json_default(v: Any) -> Any:
    """Serialize the non-JSON-native cell types the schema DSL supports:
    timestamp/date -> ISO-8601, decimal -> string (lossless), binary ->
    base64 (matching the ingest converter's accepted input encoding)."""
    import base64
    import datetime as _dt
    from decimal import Decimal

    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat()
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    raise TypeError(f"unserializable type {type(v).__name__}")


class MoonlinkService:
    def __init__(
        self,
        backend: MoonlinkBackend,
        host: str = "127.0.0.1",
        port: int = 0,
        auto_flush_ms: int | None = None,
    ):
        """``auto_flush_ms`` enables the reference's periodic mooncake
        snapshot tick (table_handler_timer.rs:19 — 500 ms default there):
        async-ingested rows commit within that interval without an
        explicit POST /flush. None (default) = flush stays explicit."""
        self.backend = backend
        self.auto_flush_ms = auto_flush_ms
        self._sinks: dict[tuple[str, str], RestSink] = {}
        # per-key creation locks: RestSink construction replays the WAL
        # journal (stages rows) and get_table can be slow — neither may
        # run under the service-wide lock (it stalls every unrelated
        # request) nor concurrently for the SAME key (double journal
        # replay double-stages rows)
        self._sink_creation: dict[tuple[str, str], threading.Lock] = {}
        self._timers: dict[tuple[str, str], Any] = {}
        self._avro_schemas: dict[tuple[str, str], dict] = {}
        # broker feeds the service owns: (db, table, topic) -> Ticker
        # (replication_manager.rs connection-ownership shape)
        self._kafka_conns: dict[tuple[str, str, str], Any] = {}
        self._lock = threading.Lock()
        service = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, obj: Any) -> None:
                body = json.dumps(obj, default=_json_default).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length") or 0)
                return json.loads(self.rfile.read(n) or b"{}")

            def _raw_body(self) -> bytes:
                n = int(self.headers.get("Content-Length") or 0)
                return self.rfile.read(n)

            def _route(self, method: str) -> None:
                try:
                    service._handle(self, method)
                except MoonlinkError as e:
                    self._send(400, {"error": type(e).__name__, "message": str(e)})
                except (KeyError, json.JSONDecodeError, ValueError) as e:
                    # missing required body field / unparsable body / a
                    # non-numeric query param (?from=abc) is the CLIENT's
                    # error — a 400 like every other malformed-request
                    # path, not a 500
                    self._send(
                        400,
                        {"error": "BadRequest", "message": f"missing/invalid: {e}"},
                    )
                except Exception as e:  # noqa: BLE001
                    self._send(500, {"error": type(e).__name__, "message": str(e)})

            def do_GET(self):
                self._route("GET")

            def do_POST(self):
                self._route("POST")

            def do_DELETE(self):
                self._route("DELETE")

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # ------------------------------------------------------------------ #

    def _kafka_schema(self, db: str, table: str) -> dict | None:
        """Registered Avro value schema: memory cache, falling back to the
        table properties a prior /kafka/{t}/schema commit persisted."""
        with self._lock:
            cached = self._avro_schemas.get((db, table))
            if cached is not None:
                return cached
        t = self.backend.get_table(db, table)
        schema = t.manifest.properties.get("avro_schema")
        if schema is not None:
            with self._lock:
                self._avro_schemas[(db, table)] = schema
        return schema

    def _sink(self, db: str, table: str) -> RestSink:
        key = (db, table)
        with self._lock:
            sink = self._sinks.get(key)
            if sink is not None:
                return sink
            create_lk = self._sink_creation.setdefault(key, threading.Lock())
        with create_lk:  # same-key creators serialize; other keys proceed
            with self._lock:
                sink = self._sinks.get(key)
                if sink is not None:
                    return sink
            t = self.backend.get_table(db, table)  # slow: outside _lock
            sink = RestSink(t)
            with self._lock:
                self._sinks[key] = sink
                if self.auto_flush_ms is not None:
                    from moonlink_spark.table.timers import TableHandlerTimers

                    self._timers[key] = TableHandlerTimers(
                        snapshot_fn=sink.flush,
                        snapshot_interval_s=self.auto_flush_ms / 1000.0,
                    ).start()
            return sink

    @staticmethod
    def _decode_otel(signal: str, payload: dict) -> list[dict]:
        from moonlink_spark.sources.otel import (
            decode_otlp_logs,
            decode_otlp_metrics,
            decode_otlp_traces,
        )

        return {
            "logs": decode_otlp_logs,
            "metrics": decode_otlp_metrics,
            "traces": decode_otlp_traces,
        }[signal](payload)

    def _otel_table(self, signal: str):
        """Get-or-create the append-only otel.{signal} table."""
        from moonlink_spark.sources.otel import (
            OTEL_LOGS_FIELDS,
            OTEL_METRICS_FIELDS,
            OTEL_SPANS_FIELDS,
        )

        fields = {
            "logs": OTEL_LOGS_FIELDS,
            "metrics": OTEL_METRICS_FIELDS,
            "traces": OTEL_SPANS_FIELDS,
        }[signal]
        # no service lock: the backend serializes its own catalog ops,
        # and Spark table creation under the service-wide lock stalled
        # every unrelated request (review r10). A concurrent-create loser
        # falls back to get_table.
        try:
            return self.backend.get_table("otel", signal)
        except MoonlinkError:
            pass
        try:
            return self.backend.create_table(
                "otel", signal, fields, IdentityProp.none()
            )
        except MoonlinkError:
            return self.backend.get_table("otel", signal)

    def _handle(self, h, method: str) -> None:
        from urllib.parse import parse_qs, urlparse

        url = urlparse(h.path)
        path = url.path

        if method == "GET" and path == "/health":
            # parity health_check (rest_api.rs:435-444): same response fields
            import time

            h._send(
                200,
                {
                    "service": "moonlink-rest-api",
                    "status": "healthy",
                    "timestamp": int(time.time()),
                },
            )
            return

        if method == "GET" and path == "/tables":
            # parity list_tables (rest_api.rs:684-689): ListTablesResponse
            # carries full TableStatus objects, not bare names
            h._send(200, {"tables": self.backend.list_table_status()})
            return

        if method == "GET" and path == "/metrics":
            # the engine's own latency telemetry (observability/ module
            # parity). Default = readable snapshot; ?format=otlp = the
            # OTLP/JSON ExportMetricsServiceRequest our /otel/v1/metrics
            # route (and any OTEL collector) ingests directly.
            from moonlink_spark.observability import METRICS

            if "otlp" in parse_qs(url.query).get("format", []):
                h._send(200, METRICS.to_otlp_payload())
            else:
                h._send(200, {"metrics": METRICS.snapshot()})
            return

        m = _SCHEMA_RE.match(path)
        if m and method == "GET":
            # parity fetch_schema (rest_api.rs:795): the schema travels in the
            # same JSON field DSL create_table accepts, so GET /schema output
            # can recreate the table verbatim
            from moonlink_spark.schema import struct_to_field_schema

            t = self.backend.get_table(m.group(1), m.group(2))
            h._send(
                200,
                {
                    "database": m.group(1),
                    "table": m.group(2),
                    "schema": struct_to_field_schema(t.schema),
                    "identity": t.identity.to_json(),
                },
            )
            return

        m = _TABLE_RE.match(path)
        if m:
            db, table, action = m.group(1), m.group(2), m.group(3)
            if method == "POST" and action is None:
                body = h._body()
                ident = IdentityProp.from_json(body["identity"])
                self.backend.create_table(db, table, body["schema"], ident)
                h._send(200, {"created": f"{db}.{table}"})
                return
            if method == "DELETE" and action is None:
                with self._lock:
                    self._sinks.pop((db, table), None)
                    timers = self._timers.pop((db, table), None)
                    # a recreated table must not inherit the old Avro schema
                    self._avro_schemas.pop((db, table), None)
                    conns = [
                        self._kafka_conns.pop(k)
                        for k in list(self._kafka_conns)
                        if k[0] == db and k[1] == table
                    ]
                if timers is not None:
                    timers.stop()
                for c in conns:
                    # claim placeholders expose a no-op stop(), so every
                    # stored value handles uniformly
                    c.stop()
                self.backend.drop_table(db, table)
                h._send(200, {"dropped": f"{db}.{table}"})
                return
            if method == "POST" and action == "/flush":
                v = self._sink(db, table).flush()
                h._send(200, {"version": v})
                return
            if method == "POST" and action == "/snapshot":
                # parity create_snapshot (rest_api.rs:830): force-commit any
                # buffered ops so a snapshot at >= lsn exists
                lsn = h._body().get("lsn")
                v = self.backend.create_snapshot(db, table, lsn=lsn)
                h._send(200, {"version": v})
                return
            if method == "POST" and action == "/optimize":
                mode = h._body().get("mode", "full")
                v = self.backend.optimize_table(db, table, mode)
                h._send(200, {"version": v})
                return
            if method == "POST" and action == "/export":
                body = h._body()
                fmt = body.get("format", "parquet")
                dest, lsn = body["dest"], body.get("lsn")
                if fmt == "delta":
                    s = self.backend.export_table_delta(db, table, dest, lsn=lsn)
                elif fmt == "iceberg":
                    s = self.backend.export_table_iceberg(db, table, dest, lsn=lsn)
                elif fmt == "parquet":
                    s = self.backend.export_table(db, table, dest, lsn=lsn)
                else:
                    h._send(400, {"error": "BadFormat", "format": fmt})
                    return
                # optional: register the fresh Iceberg metadata version in
                # a catalog so the export is discoverable (parity: the
                # reference syncs through its catalog trait; both of its
                # catalogs are supported — rest_catalog.rs:22 via
                # catalog_type=rest (default), glue_catalog.rs via
                # catalog_type=glue against a Glue-protocol endpoint)
                catalog_url = body.get("catalog")
                if catalog_url and fmt == "iceberg":
                    if body.get("catalog_type", "rest") == "glue":
                        from moonlink_spark.table.glue_catalog import (
                            register_export_glue as register_export,
                        )
                    else:
                        from moonlink_spark.table.rest_catalog import (
                            register_export,
                        )

                    try:
                        reg = register_export(
                            catalog_url,
                            body.get("catalog_namespace", db),
                            body.get("catalog_table", table),
                            dest,
                        )
                    except Exception as e:
                        h._send(
                            502,
                            {
                                "error": "CatalogRegistrationFailed",
                                "message": str(e),
                                "export": s,
                            },
                        )
                        return
                    s = {**s, "catalog": reg}
                h._send(200, {"format": fmt, **s})
                return
            if method == "POST" and action == "/vecindex":
                # build (or rebuild) the table-owned IVF index over an
                # array<float> column
                body = h._body()
                pq = body.get("pq")  # {"m":..,"ksub":..,"iters":..} | null
                meta = self.backend.build_vector_index(
                    db, table, body["column"],
                    k=int(body.get("k", 8)),
                    iters=int(body.get("iters", 3)),
                    # "pq": {} means PQ WITH DEFAULTS — an is-not-None
                    # check, not truthiness, or the all-defaults request
                    # silently built a flat index (review r11)
                    pq=(
                        {k2: int(v) for k2, v in pq.items()}
                        if pq is not None
                        else None
                    ),
                )
                h._send(
                    200,
                    {
                        "column": body["column"],
                        "k": meta["k"],
                        "trained_rows": meta["trained_rows"],
                        "generation": meta["generation"],
                    },
                )
                return
            if method == "POST" and action == "/vecindex/update":
                body = h._body()
                # report the meta THIS update published (passing it to
                # vector_index_status avoids a second disk read and a
                # race with a concurrent writer's publish)
                meta = self.backend.update_vector_index(
                    db, table, body["column"], int(body["since_lsn"])
                )
                h._send(
                    200,
                    self.backend.vector_index_status(
                        db, table, body["column"], meta=meta
                    ),
                )
                return
            if method == "GET" and action == "/vecindex":
                qs2 = parse_qs(urlparse(h.path).query)
                col = (qs2.get("column") or [None])[0]
                if not col:
                    h._send(400, {"error": "MissingColumn"})
                    return
                h._send(
                    200, self.backend.vector_index_status(db, table, col)
                )
                return
            if method == "POST" and action == "/vecindex/query":
                body = h._body()
                df = self.backend.query_vector_index(
                    db, table, body["column"],
                    [int(x) for x in body["query_ids"]],
                    topk=int(body.get("topk", 3)),
                    nprobe=int(body.get("nprobe", 1)),
                    # "rerank": null means default — int(None) was a 500
                    rerank=(
                        int(body["rerank"])
                        if body.get("rerank") is not None
                        else None
                    ),
                )
                rows = [
                    r.asDict() for r in df.orderBy("query_id", "rn").collect()
                ]
                h._send(200, {"rows": rows, "count": len(rows)})
                return
            if method == "POST" and action == "/sigindex":
                # build (or rebuild) the table-owned MinHash signature
                # index over a text column (r12 symmetric surface)
                body = h._body()
                meta = self.backend.build_signature_index(
                    db, table, body["column"]
                )
                h._send(
                    200,
                    {
                        "column": body["column"],
                        **self.backend.signature_index_status(
                            db, table, body["column"], meta=meta
                        ),
                    },
                )
                return
            if method == "POST" and action == "/sigindex/update":
                body = h._body()
                meta = self.backend.update_signature_index(
                    db, table, body["column"], int(body["since_lsn"])
                )
                h._send(
                    200,
                    self.backend.signature_index_status(
                        db, table, body["column"], meta=meta
                    ),
                )
                return
            if method == "GET" and action == "/sigindex":
                qs2 = parse_qs(urlparse(h.path).query)
                col = (qs2.get("column") or [None])[0]
                if not col:
                    h._send(400, {"error": "MissingColumn"})
                    return
                h._send(
                    200, self.backend.signature_index_status(db, table, col)
                )
                return
            if method == "POST" and action == "/sigindex/maintain":
                body = h._body()
                h._send(
                    200,
                    self.backend.maintain_signature_index(
                        db, table, body["column"],
                        min_segments_to_compact=int(
                            body.get("min_segments_to_compact", 4)
                        ),
                    ),
                )
                return
            if method == "POST" and action == "/sigindex/candidates":
                body = h._body()
                rows = self.backend.signature_index_candidates(
                    db, table, body["column"],
                    limit=int(body.get("limit", 1000)),
                )
                h._send(200, {"rows": rows, "count": len(rows)})
                return
            if method == "POST" and action == "/matview":
                body = h._body()
                mv = self.backend.create_materialized_view(
                    db, table, body["dest"], body["group_by"],
                    body.get("sums"),
                )
                h._send(200, {"created": body["dest"], "lsn": mv.state["lsn"]})
                return
            if method == "POST" and action == "/matview/refresh":
                from moonlink_spark.table.matview import MaterializedView

                body = h._body()
                mv = MaterializedView(
                    self.backend.get_table(db, table), body["dest"]
                )
                h._send(200, mv.refresh())
                return

        m = _INGEST_RE.match(path)
        if m and method == "POST":
            body = h._body()
            r = self._sink(m.group(1), m.group(2)).ingest(
                body["operation"],
                body["data"],
                body.get("request_mode", "sync"),
            )
            h._send(
                200,
                {
                    "operation": r.operation,
                    "row_lsn": r.row_lsn,
                    "commit_lsn": r.commit_lsn,
                    "committed": r.committed,
                    "version": r.version,
                },
            )
            return

        m = _INGESTPB_RE.match(path)
        if m and method == "POST":
            # parity ingest_data_protobuf (rest_api.rs:1026): same envelope as
            # JSON ingest but `data` is a protobuf-encoded moonlink row
            # (moonlink_proto wire format), base64 in the JSON body
            import base64

            from moonlink_spark.sources.converters import proto_bytes_to_row

            db, table = m.group(1), m.group(2)
            body = h._body()
            t = self.backend.get_table(db, table)
            row = proto_bytes_to_row(base64.b64decode(body["data"]), t.schema)
            r = self._sink(db, table).ingest(
                body["operation"], row, body.get("request_mode", "sync")
            )
            h._send(
                200,
                {
                    "operation": r.operation,
                    "row_lsn": r.row_lsn,
                    "commit_lsn": r.commit_lsn,
                    "committed": r.committed,
                    "version": r.version,
                },
            )
            return

        m = _KAFKA_RE.match(path)
        if m and method == "POST":
            db, table, what = m.group(1), m.group(2), m.group(3)
            if what == "schema":
                # parity set_avro_schema (rest_api.rs:555): register the value
                # schema for subsequent /kafka ingests; persisted in table
                # properties so a restarted service recovers it
                body = h._body()
                schema = body["avro_schema"]
                if isinstance(schema, str):
                    schema = json.loads(schema)
                self.backend.set_avro_schema(db, table, schema)
                with self._lock:
                    self._avro_schemas[(db, table)] = schema
                h._send(200, {"database": db, "table": table, "schema_set": True})
                return
            if what == "connect":
                # own a broker feed for the table (replication_manager.rs
                # connection-ownership shape over the Kafka surface):
                # a ticker-driven wire consumer group drains the topic
                # into the table until disconnect / drop / service stop
                body = h._body()
                topic = body["topic"]
                schema = body.get("avro_schema") or self._kafka_schema(
                    db, table
                )
                if schema is None:
                    h._send(
                        400,
                        {"error": "NoAvroSchema",
                         "message": f"set /kafka/{db}/{table}/schema first "
                                    "or pass avro_schema"},
                    )
                    return
                if isinstance(schema, str):
                    schema = json.loads(schema)
                key3 = (db, table, topic)
                # check-and-CLAIM atomically: reserve the key with a
                # placeholder inside one lock scope, so two concurrent
                # connects can't both pass the check and both start
                # tickers (the loser's ticker would be overwritten in the
                # dict and keep draining the group, unreachable by
                # disconnect/stop)
                class _ClaimToken:
                    # placeholder with a no-op stop() so disconnect can
                    # treat every stored value uniformly
                    def stop(self) -> None:
                        pass

                claim = _ClaimToken()
                with self._lock:
                    if key3 in self._kafka_conns:
                        h._send(
                            409,
                            {"error": "AlreadyConnected",
                             "message": f"{db}.{table} <- {topic}"},
                        )
                        return
                    self._kafka_conns[key3] = claim  # reserved
                try:
                    ticker = self.backend.start_kafka_ingest(
                        db,
                        table,
                        body["host"],
                        int(body["port"]),
                        topic,
                        schema,
                        partition=int(body.get("partition", 0)),
                        group=body.get("group"),
                        interval_s=float(body.get("interval_ms", 1000)) / 1000.0,
                    )
                except Exception:
                    with self._lock:
                        self._kafka_conns.pop(key3, None)  # roll back claim
                    raise
                with self._lock:
                    # a disconnect racing the slow start may have popped
                    # the placeholder — and a THIRD request may have
                    # re-claimed the key since, so the check must verify
                    # the stored value is still THIS request's own claim
                    # (key presence alone would steal the newer claim and
                    # orphan a running ticker)
                    if self._kafka_conns.get(key3) is claim:
                        self._kafka_conns[key3] = ticker
                        claimed = True
                    else:
                        claimed = False
                if not claimed:
                    ticker.stop()
                    h._send(
                        409,
                        {"error": "DisconnectedDuringConnect",
                         "message": f"{db}.{table} <- {topic}"},
                    )
                    return
                h._send(
                    200,
                    {"connected": f"{db}.{table}", "topic": topic},
                )
                return
            if what == "disconnect":
                body = h._body()
                topic = body.get("topic")
                with self._lock:
                    keys = [
                        k
                        for k in list(self._kafka_conns)
                        if k[0] == db and k[1] == table
                        and (topic is None or k[2] == topic)
                    ]
                    conns = [self._kafka_conns.pop(k) for k in keys]
                for c in conns:
                    # claim placeholders expose a no-op stop(), so every
                    # stored value handles uniformly
                    c.stop()
                h._send(200, {"disconnected": len(conns)})
                return
            # what == "ingest": raw Avro datum body, always insert + sync
            # (parity ingest_data_kafka, rest_api.rs:1131-1154)
            schema = self._kafka_schema(db, table)
            if schema is None:
                h._send(
                    400,
                    {"error": "NoAvroSchema",
                     "message": f"set /kafka/{db}/{table}/schema first"},
                )
                return
            from moonlink_spark.sources.avro_binary import (
                decode_record,
                row_for_spark,
            )

            row = row_for_spark(schema, decode_record(schema, h._raw_body()))
            r = self._sink(db, table).ingest("insert", row, "sync")
            h._send(
                200,
                {
                    "operation": r.operation,
                    "row_lsn": r.row_lsn,
                    "commit_lsn": r.commit_lsn,
                    "committed": r.committed,
                    "version": r.version,
                },
            )
            return

        m = _UPLOAD_RE.match(path)
        if m and method == "POST":
            # parity upload_files (rest_api.rs:699): 'upload' bulk-registers
            # parquet files by footer (LoadFiles path, no row processing);
            # 'insert' reads the rows through the ingestion path so identity
            # semantics apply
            db, table = m.group(1), m.group(2)
            body = h._body()
            op = body.get("operation", "upload")
            files = body["files"]
            if not files:
                h._send(400, {"error": "BadRequest", "message": "files is empty"})
                return
            t = self.backend.get_table(db, table)
            if op == "upload":
                t.load_files(files, copy=bool(body.get("copy", False)))
                v = t.commit(operation="file-upload")
            elif op == "insert":
                df = self.backend.spark.read.parquet(*files)
                t.append_df(df)
                v = t.commit(operation="file-insert")
            else:
                h._send(
                    400,
                    {"error": "BadOperation",
                     "message": f"operation {op!r} must be 'insert' or 'upload'"},
                )
                return
            h._send(200, {"version": v, "files": len(files)})
            return

        m = _OTEL_RE.match(path)
        if m and method == "POST":
            signal = m.group(1)
            # the reference's OTLP endpoint is HTTP **binary protobuf**
            # (otel/service.rs HttpBinary, application/x-protobuf); accept
            # both encodings — protobuf decodes to the OTLP/JSON dict shape
            # and flows through the same row builders
            ctype = (h.headers.get("Content-Type") or "").split(";")[0].strip()
            if ctype == "application/x-protobuf":
                from moonlink_spark.sources.otlp_proto import otlp_proto_to_json

                payload = otlp_proto_to_json(signal, h._raw_body())
            else:
                payload = h._body()
            rows = self._decode_otel(signal, payload)
            t = self._otel_table(signal)
            if rows:
                t.append_rows(rows)
                version = t.commit(operation=f"otel-{signal}")
            else:
                version = t.manifest.version
            h._send(200, {"ingested": len(rows), "version": version,
                          "table": f"otel.{signal}"})
            return

        m = _CHANGES_RE.match(path)
        if m and method == "GET":
            q = parse_qs(url.query)
            if "from" not in q:
                h._send(400, {"error": "MissingParam", "param": "from"})
                return
            from_lsn = int(q["from"][0])
            to_lsn = int(q["to"][0]) if "to" in q else None
            limit = int(q.get("limit", ["1000"])[0])
            t = self.backend.get_table(m.group(1), m.group(2))
            df = t.changes(from_lsn, to_lsn)
            rows = [r.asDict(recursive=True) for r in df.limit(limit).collect()]
            h._send(200, {"rows": rows, "count": len(rows)})
            return

        m = _SCAN_RE.match(path)
        if m and method == "GET":
            q = parse_qs(url.query)
            lsn = int(q["lsn"][0]) if "lsn" in q else None
            limit = int(q.get("limit", ["1000"])[0])
            where = q.get("where", [None])[0]
            t = self.backend.get_table(m.group(1), m.group(2))
            if lsn is not None:
                t.store.wait_for_lsn(lsn)
            if where:
                # untrusted input: only the simple conjunct grammar reaches
                # DataFrame.filter — no arbitrary Spark SQL (reflect(), ...)
                from moonlink_spark.table.stats import validate_scan_condition

                try:
                    validate_scan_condition(
                        where, [f.name for f in t.schema.fields]
                    )
                except ValueError as e:
                    h._send(400, {"error": "BadCondition", "message": str(e)})
                    return
            # where => filter + automatic manifest-stats file pruning
            df = t.scan_where(where, lsn=lsn) if where else t.scan(lsn=lsn)
            rows = [r.asDict(recursive=True) for r in df.limit(limit).collect()]
            h._send(200, {"rows": rows, "count": len(rows)})
            return

        if method == "POST" and path == "/sql":
            body = h._body()
            limit = int(body.get("limit", 1000))
            try:
                df = self.backend.sql(
                    body["query"],
                    database=body.get("database"),
                    lsns={k: int(v) for k, v in (body.get("lsns") or {}).items()},
                )
                rows = [r.asDict(recursive=True) for r in df.limit(limit).collect()]
            except Exception as e:  # surface planner/analysis errors as 400
                h._send(400, {"error": type(e).__name__, "message": str(e)})
                return
            h._send(200, {"rows": rows, "count": len(rows)})
            return

        h._send(404, {"error": "NotFound", "path": path})

    # ------------------------------------------------------------------ #

    def start(self) -> "MoonlinkService":
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        with self._lock:
            timers = list(self._timers.values())
            self._timers.clear()
            conns = list(self._kafka_conns.values())
            self._kafka_conns.clear()
        for t in timers:
            t.stop()
        for c in conns:
            c.stop()  # claim placeholders expose a no-op stop()
        self.httpd.shutdown()
        if self._thread:
            self._thread.join(timeout=10)
