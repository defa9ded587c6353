"""Minimal Iceberg REST catalog: server + client.

Parity: the reference registers its synced Iceberg tables in a REST
catalog (``storage/table/iceberg/rest_catalog.rs:22`` — create/load/
commit against the standard Iceberg REST spec; a Glue variant sits
beside it). This module implements the subset of the public Iceberg REST
catalog API the export path needs, so exported tables are discoverable
by catalog-speaking engines the way the reference's are:

- ``GET  /v1/config``
- ``GET|POST /v1/namespaces``
- ``GET  /v1/namespaces/{ns}/tables``            (list)
- ``POST /v1/namespaces/{ns}/register``          (register by metadata-location)
- ``GET  /v1/namespaces/{ns}/tables/{name}``     (load)
- ``DELETE /v1/namespaces/{ns}/tables/{name}``   (drop from catalog)

Registration is by metadata-location (the file ``export_iceberg`` just
wrote); load returns ``{"metadata-location": ..., "metadata": <json>}``
per the spec's LoadTableResult. State persists as one JSON file under
the server root so a restarted catalog still knows its tables."""

from __future__ import annotations

import json
import os
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any
from urllib.parse import unquote

_NS_RE = re.compile(r"^/v1/namespaces/([^/]+)/tables/?$")
_TBL_RE = re.compile(r"^/v1/namespaces/([^/]+)/tables/([^/]+)$")
_REG_RE = re.compile(r"^/v1/namespaces/([^/]+)/register$")


class IcebergRestCatalogServer:
    """In-process catalog server over a JSON state file."""

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        self.state_path = os.path.join(root, "catalog.json")
        os.makedirs(root, exist_ok=True)
        self._lock = threading.Lock()
        self._load()
        catalog = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code: int, obj: Any) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _body(self) -> dict:
                n = int(self.headers.get("Content-Length", 0))
                return json.loads(self.rfile.read(n)) if n else {}

            def do_GET(self):
                catalog._get(self)

            def do_POST(self):
                catalog._post(self)

            def do_DELETE(self):
                catalog._delete(self)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # -- state ------------------------------------------------------------

    def _load(self) -> None:
        if os.path.exists(self.state_path):
            with open(self.state_path) as fh:
                self.state = json.load(fh)
        else:
            self.state = {"namespaces": {}}

    def _save(self) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.state, fh, indent=1)
        os.replace(tmp, self.state_path)

    # -- routes -----------------------------------------------------------

    def _get(self, h) -> None:
        path = h.path.split("?")[0]
        if path == "/v1/config":
            h._send(200, {"defaults": {}, "overrides": {}})
            return
        if path in ("/v1/namespaces", "/v1/namespaces/"):
            with self._lock:
                names = sorted(self.state["namespaces"])
            h._send(200, {"namespaces": [[n] for n in names]})
            return
        m = _NS_RE.match(path)
        if m:
            ns = unquote(m.group(1))
            with self._lock:
                tables = self.state["namespaces"].get(ns)
            if tables is None:
                h._send(404, {"error": "NoSuchNamespace", "namespace": ns})
                return
            h._send(
                200,
                {
                    "identifiers": [
                        {"namespace": [ns], "name": t} for t in sorted(tables)
                    ]
                },
            )
            return
        m = _TBL_RE.match(path)
        if m:
            ns, name = unquote(m.group(1)), unquote(m.group(2))
            with self._lock:
                loc = self.state["namespaces"].get(ns, {}).get(name)
            if loc is None:
                h._send(404, {"error": "NoSuchTable", "table": f"{ns}.{name}"})
                return
            try:
                with open(loc) as fh:
                    metadata = json.load(fh)
            except OSError:
                h._send(
                    404, {"error": "MetadataMissing", "metadata-location": loc}
                )
                return
            h._send(200, {"metadata-location": loc, "metadata": metadata})
            return
        h._send(404, {"error": "NotFound", "path": path})

    def _post(self, h) -> None:
        path = h.path.split("?")[0]
        if path in ("/v1/namespaces", "/v1/namespaces/"):
            body = h._body()
            ns = ".".join(body.get("namespace", []))
            if not ns:
                h._send(400, {"error": "BadNamespace"})
                return
            with self._lock:
                self.state["namespaces"].setdefault(ns, {})
                self._save()
            h._send(200, {"namespace": [ns]})
            return
        m = _REG_RE.match(path)
        if m:
            ns = unquote(m.group(1))
            body = h._body()
            name = body.get("name")
            loc = body.get("metadata-location")
            if not name or not loc:
                h._send(400, {"error": "MissingField"})
                return
            if not os.path.exists(loc):
                h._send(400, {"error": "MetadataMissing", "metadata-location": loc})
                return
            with self._lock:
                self.state["namespaces"].setdefault(ns, {})
                self.state["namespaces"][ns][name] = loc
                self._save()
            h._send(200, {"metadata-location": loc})
            return
        h._send(404, {"error": "NotFound", "path": path})

    def _delete(self, h) -> None:
        m = _TBL_RE.match(h.path.split("?")[0])
        if m:
            ns, name = unquote(m.group(1)), unquote(m.group(2))
            with self._lock:
                existed = self.state["namespaces"].get(ns, {}).pop(name, None)
                self._save()
            if existed is None:
                h._send(404, {"error": "NoSuchTable"})
            else:
                h._send(204, {})
            return
        h._send(404, {"error": "NotFound"})

    # -- lifecycle --------------------------------------------------------

    def start(self) -> "IcebergRestCatalogServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()


class RestCatalogClient:
    """Tiny stdlib client for the server above (and any spec-compliant
    catalog for the endpoints used)."""

    def __init__(self, base_url: str):
        self.base = base_url.rstrip("/")

    def _req(self, method: str, path: str, body: dict | None = None):
        import urllib.error
        import urllib.request

        data = json.dumps(body).encode() if body is not None else None
        req = urllib.request.Request(
            f"{self.base}{path}", data=data, method=method
        )
        if data:
            req.add_header("Content-Type", "application/json")
        try:
            with urllib.request.urlopen(req) as resp:
                raw = resp.read()
                return resp.status, json.loads(raw) if raw else {}
        except urllib.error.HTTPError as e:
            raw = e.read()
            return e.code, json.loads(raw) if raw else {}

    def create_namespace(self, ns: str):
        return self._req("POST", "/v1/namespaces", {"namespace": [ns]})

    def register_table(self, ns: str, name: str, metadata_location: str):
        return self._req(
            "POST",
            f"/v1/namespaces/{ns}/register",
            {"name": name, "metadata-location": metadata_location},
        )

    def list_tables(self, ns: str):
        return self._req("GET", f"/v1/namespaces/{ns}/tables")

    def load_table(self, ns: str, name: str):
        return self._req("GET", f"/v1/namespaces/{ns}/tables/{name}")

    def drop_table(self, ns: str, name: str):
        return self._req("DELETE", f"/v1/namespaces/{ns}/tables/{name}")


def register_export(
    catalog_url: str, namespace: str, name: str, export_dest: str
) -> dict:
    """Register an ``export_iceberg`` destination's CURRENT metadata
    version in a REST catalog (the post-export hook the reference's
    syncer performs through its catalog trait)."""
    meta_dir = os.path.join(export_dest, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = int(fh.read().strip())
    loc = os.path.join(meta_dir, f"v{v}.metadata.json")
    client = RestCatalogClient(catalog_url)
    client.create_namespace(namespace)
    code, out = client.register_table(namespace, name, loc)
    if code != 200:
        raise RuntimeError(f"catalog registration failed: {code} {out}")
    return out
