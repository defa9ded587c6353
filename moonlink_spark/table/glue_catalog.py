"""Glue-shaped Iceberg catalog: client + in-process mock service.

Parity: the reference ships a Glue catalog beside its REST catalog
(``storage/table/iceberg/glue_catalog.rs`` — the same Catalog trait:
create/load/register/drop table, namespace ops — bound to the AWS Glue
Data Catalog; its tests run against a local Glue-compatible endpoint,
``glue_catalog_test_utils.rs``). This module mirrors that shape with
public protocol facts only:

- the AWS Glue API is JSON-over-HTTP: ``POST /`` with an
  ``X-Amz-Target: AWSGlue.<Operation>`` header per operation
  (CreateDatabase / GetDatabase / CreateTable / GetTable / GetTables /
  UpdateTable / DeleteTable), errors as ``{"__type": "...Exception"}``;
- Iceberg-on-Glue convention: the Glue Table carries
  ``Parameters["table_type"] = "ICEBERG"`` and
  ``Parameters["metadata_location"]`` (plus
  ``previous_metadata_location`` on update) — engines discover the
  current snapshot through that parameter, exactly like the REST
  catalog's metadata-location.

:class:`GlueCatalogClient` exposes the SAME surface as
``rest_catalog.RestCatalogClient`` (create_namespace / register_table /
list_tables / load_table / drop_table), so ``register_export_glue`` is a
drop-in sibling of ``rest_catalog.register_export`` and callers stay
catalog-agnostic. :class:`GlueMockServer` is the local fake (state
persisted to one JSON file; survives restart). A real deployment points
the client at the AWS endpoint and adds SigV4 signing in ``_req``.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any


class GlueMockServer:
    """In-process Glue Data Catalog fake over a JSON state file."""

    def __init__(self, root: str, host: str = "127.0.0.1", port: int = 0):
        self.state_path = os.path.join(root, "glue.json")
        os.makedirs(root, exist_ok=True)
        self._lock = threading.Lock()
        self._load()
        server = self

        class Handler(BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                target = self.headers.get("X-Amz-Target", "")
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n)) if n else {}
                op = target.split(".", 1)[-1]
                fn = getattr(server, f"_op_{op}", None)
                if fn is None:
                    return self._send(
                        400,
                        {"__type": "InvalidInputException",
                         "Message": f"unknown operation {target}"},
                    )
                with server._lock:
                    code, resp = fn(body)
                    server._save()
                self._send(code, resp)

            def _send(self, code: int, obj: Any) -> None:
                body = json.dumps(obj).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/x-amz-json-1.1")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._thread: threading.Thread | None = None

    # -- state -------------------------------------------------------------

    def _load(self) -> None:
        if os.path.exists(self.state_path):
            with open(self.state_path) as fh:
                self.state = json.load(fh)
        else:
            self.state = {"databases": {}}

    def _save(self) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(self.state, fh, indent=1)
        os.replace(tmp, self.state_path)

    # -- operations (AWSGlue.<Name>) ---------------------------------------

    @staticmethod
    def _not_found(what: str):
        return 400, {"__type": "EntityNotFoundException", "Message": what}

    def _op_CreateDatabase(self, body):
        name = body["DatabaseInput"]["Name"]
        if name in self.state["databases"]:
            return 400, {
                "__type": "AlreadyExistsException",
                "Message": f"database {name} exists",
            }
        self.state["databases"][name] = {"tables": {}}
        return 200, {}

    def _op_GetDatabase(self, body):
        name = body["Name"]
        if name not in self.state["databases"]:
            return self._not_found(f"database {name}")
        return 200, {"Database": {"Name": name}}

    def _op_GetDatabases(self, body):
        return 200, {
            "DatabaseList": [
                {"Name": n} for n in sorted(self.state["databases"])
            ]
        }

    def _op_DeleteDatabase(self, body):
        name = body["Name"]
        if name not in self.state["databases"]:
            return self._not_found(f"database {name}")
        del self.state["databases"][name]
        return 200, {}

    def _db(self, name):
        return self.state["databases"].get(name)

    def _op_CreateTable(self, body):
        db = self._db(body["DatabaseName"])
        if db is None:
            return self._not_found(f"database {body['DatabaseName']}")
        ti = body["TableInput"]
        if ti["Name"] in db["tables"]:
            return 400, {
                "__type": "AlreadyExistsException",
                "Message": f"table {ti['Name']} exists",
            }
        db["tables"][ti["Name"]] = ti
        return 200, {}

    def _op_UpdateTable(self, body):
        db = self._db(body["DatabaseName"])
        if db is None:
            return self._not_found(f"database {body['DatabaseName']}")
        ti = body["TableInput"]
        if ti["Name"] not in db["tables"]:
            return self._not_found(f"table {ti['Name']}")
        db["tables"][ti["Name"]] = ti
        return 200, {}

    def _op_GetTable(self, body):
        db = self._db(body["DatabaseName"])
        if db is None:
            return self._not_found(f"database {body['DatabaseName']}")
        t = db["tables"].get(body["Name"])
        if t is None:
            return self._not_found(f"table {body['Name']}")
        return 200, {"Table": t}

    def _op_GetTables(self, body):
        db = self._db(body["DatabaseName"])
        if db is None:
            return self._not_found(f"database {body['DatabaseName']}")
        return 200, {
            "TableList": [db["tables"][n] for n in sorted(db["tables"])]
        }

    def _op_DeleteTable(self, body):
        db = self._db(body["DatabaseName"])
        if db is None:
            return self._not_found(f"database {body['DatabaseName']}")
        if body["Name"] not in db["tables"]:
            return self._not_found(f"table {body['Name']}")
        del db["tables"][body["Name"]]
        return 200, {}

    # -- lifecycle ----------------------------------------------------------

    @property
    def endpoint(self) -> str:
        host, port = self.httpd.server_address
        return f"http://{host}:{port}"

    def start(self) -> "GlueMockServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, name="glue-mock", daemon=True
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5.0)


class GlueCatalogClient:
    """Glue-protocol catalog client with the RestCatalogClient surface.
    A real AWS deployment adds SigV4 signing + credentials in ``_req``."""

    def __init__(self, endpoint: str):
        self.endpoint = endpoint.rstrip("/")

    def _req(self, op: str, body: dict) -> tuple[int, dict]:
        import urllib.error
        import urllib.request

        data = json.dumps(body).encode()
        req = urllib.request.Request(
            self.endpoint + "/", data=data, method="POST"
        )
        req.add_header("Content-Type", "application/x-amz-json-1.1")
        req.add_header("X-Amz-Target", f"AWSGlue.{op}")
        try:
            with urllib.request.urlopen(req) as resp:
                raw = resp.read()
                return resp.status, json.loads(raw) if raw else {}
        except urllib.error.HTTPError as e:
            raw = e.read()
            return e.code, json.loads(raw) if raw else {}

    # -- RestCatalogClient-parity surface ----------------------------------

    def create_namespace(self, ns: str):
        return self._req("CreateDatabase", {"DatabaseInput": {"Name": ns}})

    def register_table(self, ns: str, name: str, metadata_location: str):
        """Create or update the Iceberg pointer table: current metadata
        location in Parameters, previous one preserved on update (the
        Iceberg-on-Glue commit convention)."""
        code, prior = self._req(
            "GetTable", {"DatabaseName": ns, "Name": name}
        )
        params = {
            "table_type": "ICEBERG",
            "metadata_location": metadata_location,
        }
        op = "CreateTable"
        if code == 200:
            prev = prior["Table"].get("Parameters", {}).get(
                "metadata_location"
            )
            if prev:
                params["previous_metadata_location"] = prev
            op = "UpdateTable"
        return self._req(
            op,
            {
                "DatabaseName": ns,
                "TableInput": {"Name": name, "Parameters": params},
            },
        )

    def list_tables(self, ns: str):
        code, out = self._req("GetTables", {"DatabaseName": ns})
        if code != 200:
            return code, out
        return code, {
            "identifiers": [
                {"namespace": [ns], "name": t["Name"]}
                for t in out["TableList"]
            ]
        }

    def load_table(self, ns: str, name: str):
        """LoadTableResult-shaped response: metadata-location from the
        Glue parameters plus the metadata JSON read from that location."""
        code, out = self._req("GetTable", {"DatabaseName": ns, "Name": name})
        if code != 200:
            return code, out
        loc = out["Table"].get("Parameters", {}).get("metadata_location")
        if not loc:
            return 400, {
                "__type": "InvalidInputException",
                "Message": f"{ns}.{name} is not an Iceberg table",
            }
        with open(loc) as fh:
            metadata = json.load(fh)
        return 200, {"metadata-location": loc, "metadata": metadata}

    def drop_table(self, ns: str, name: str):
        return self._req("DeleteTable", {"DatabaseName": ns, "Name": name})


def register_export_glue(
    endpoint: str, namespace: str, name: str, export_dest: str
) -> dict:
    """Register an ``export_iceberg`` destination's CURRENT metadata
    version in a Glue-shaped catalog — the sibling of
    ``rest_catalog.register_export`` through the Glue protocol
    (glue_catalog.rs register_table parity)."""
    meta_dir = os.path.join(export_dest, "metadata")
    with open(os.path.join(meta_dir, "version-hint.text")) as fh:
        v = int(fh.read().strip())
    loc = os.path.join(meta_dir, f"v{v}.metadata.json")
    client = GlueCatalogClient(endpoint)
    client.create_namespace(namespace)  # idempotent: exists -> 400 ignored
    code, out = client.register_table(namespace, name, loc)
    if code != 200:
        raise RuntimeError(f"glue registration failed: {code} {out}")
    return {"metadata-location": loc}
