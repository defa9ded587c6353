"""REST-style ingestion: each request is its own transaction.

Parity with the reference REST path (SURVEY.md §3.3):
- request shape ``{operation: insert|upsert|delete, data, request_mode:
  async|sync}`` (rest_api.rs:269-279)
- LSNs come from a per-source atomic counter; each request consumes
  ``row_lsn = ctr++`` then ``commit_lsn = ctr++``
  (rest_ingest/rest_source.rs:56,382-395)
- the sink emits Append (+Delete for upsert/delete) then Commit per request
  (moonlink_rest_sink.rs:203-265); ``sync`` mode returns only after the
  commit is durable (here: after the manifest commit), ``async`` buffers and
  commits on ``flush``.
"""

from __future__ import annotations

import itertools
import threading
from dataclasses import dataclass
from typing import Any

from moonlink_spark.errors import IdentityError
from moonlink_spark.ingest.json_convert import convert_row
from moonlink_spark.table.table import MoonlinkTable


@dataclass
class IngestResult:
    operation: str
    row_lsn: int
    commit_lsn: int
    committed: bool  # sync mode: True once the commit is visible
    version: int | None = None


class RestSink:
    """Applies REST ingest requests to one MoonlinkTable."""

    def __init__(self, table: MoonlinkTable, start_lsn: int | None = None):
        self.table = table
        base = (start_lsn if start_lsn is not None else table.last_lsn) + 1
        self._ctr = itertools.count(base)
        self._lock = threading.Lock()
        self._dirty = False

    def _next_lsn(self) -> int:
        return next(self._ctr)

    def ingest(
        self,
        operation: str,
        data: dict[str, Any],
        request_mode: str = "sync",
    ) -> IngestResult:
        if operation not in ("insert", "upsert", "delete"):
            raise IdentityError(f"unknown operation {operation!r}")
        schema = self.table.schema
        row = convert_row(data, schema)
        with self._lock:
            row_lsn = self._next_lsn()
            commit_lsn = self._next_lsn()
            if operation == "insert":
                self.table.append_rows([row])
            elif operation == "upsert":
                if self.table.identity.mode in ("single", "keys"):
                    self.table.upsert_rows([row])
                else:
                    # upsert on full_row/append-only degenerates to insert
                    # (reference delete_if_exists finds nothing first)
                    self.table.append_rows([row])
            else:  # delete
                self.table.delete_rows([row], if_exists=True)
            if request_mode == "sync":
                version = self.table.commit(lsn=commit_lsn, operation="rest-sync")
                self._dirty = False
                return IngestResult(operation, row_lsn, commit_lsn, True, version)
            self._dirty = True
            return IngestResult(operation, row_lsn, commit_lsn, False)

    def flush(self) -> int | None:
        """Commit buffered async requests (parity POST /flush,
        rest_api.rs:420-423). Returns the new version, or None if clean."""
        with self._lock:
            if not self._dirty and not self.table.has_pending():
                return None
            lsn = self._next_lsn()
            v = self.table.commit(lsn=lsn, operation="rest-flush")
            self._dirty = False
            return v
