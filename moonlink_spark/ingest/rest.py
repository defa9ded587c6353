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
- async requests are WAL-journaled BEFORE the ack (parity with the
  reference's persist-before-ack rule, table_handler.rs:851-853): every
  async request is fsync'd to ``<table>/_wal/rest.jsonl`` first, and a new
  sink replays journal entries newer than the table's last committed LSN —
  a crash between ack and flush loses nothing. The journal truncates after
  every successful commit.
"""

from __future__ import annotations

import itertools
import json
import os
import threading
from dataclasses import dataclass
from typing import Any

from moonlink_spark.errors import IdentityError
from moonlink_spark.ingest.json_convert import convert_row
from moonlink_spark.table.table import MoonlinkTable

WAL_DIR = "_wal"
WAL_FILE = "rest.jsonl"
# manifest property recording the max REST row_lsn ever committed: the
# journal-replay floor must live in the REST COUNTER's domain — comparing
# row_lsns against table.last_lsn silently dropped acked requests the
# moment any non-REST writer (queue drain, streaming batch) advanced the
# table's LSN past the counter (review r10). Properties carry forward
# across foreign commits, so the floor survives interleaved writers.
REST_APPLIED_PROP = "rest.applied_row_lsn"


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
        self._wal_path = os.path.join(table.path, WAL_DIR, WAL_FILE)
        self._lock = threading.Lock()
        self._dirty = False
        base = (start_lsn if start_lsn is not None else table.last_lsn) + 1
        self._max_row_lsn = int(
            table.manifest.properties.get(REST_APPLIED_PROP, -1)
        )
        replayed_max = self._replay_journal()
        if replayed_max is not None:
            base = max(base, replayed_max + 1)
        self._ctr = itertools.count(base)

    # -- WAL ----------------------------------------------------------------

    def _replay_journal(self) -> int | None:
        """Re-apply journaled async requests not yet committed (idempotent:
        a crash after commit but before truncate leaves entries whose
        row_lsn <= the REST_APPLIED_PROP floor — those are skipped; the
        floor is in the REST counter's own domain, so foreign writers
        advancing the TABLE's LSN never cause entries to be dropped).
        Returns the max row_lsn seen in the journal, or None if empty."""
        if not self.table.fs.exists(self._wal_path):
            return None
        last = self._max_row_lsn
        max_lsn = None
        with self.table.fs.open_read(self._wal_path) as fh:
            lines = [ln.strip() for ln in fh]
        for i, line in enumerate(lines):
            if not line:
                continue
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                if i == len(lines) - 1:
                    # torn TAIL line = crash mid-append, before the ack;
                    # the request was never acknowledged, so dropping it
                    # is correct. Mid-file corruption stays fatal.
                    break
                raise
            max_lsn = max(max_lsn or 0, e["row_lsn"])
            if e["row_lsn"] <= last:
                continue  # already committed before the crash
            self._apply(
                e["operation"], convert_row(e["data"], self.table.schema)
            )
            self._staged(e["row_lsn"])
            self._dirty = True
        return max_lsn

    def _staged(self, row_lsn: int) -> None:
        self._max_row_lsn = max(self._max_row_lsn, row_lsn)

    def _journal_append(self, operation: str, data: dict[str, Any], row_lsn: int) -> None:
        """Durably record an async request BEFORE acking it."""
        fs = self.table.fs
        fs.makedirs(os.path.dirname(self._wal_path))
        fs.append_text_durable(
            self._wal_path,
            json.dumps({"operation": operation, "data": data, "row_lsn": row_lsn})
            + "\n",
        )

    def _journal_truncate(self) -> None:
        fs = self.table.fs
        if fs.exists(self._wal_path):
            fs.unlink(self._wal_path)

    # -- ingest -------------------------------------------------------------

    def _next_lsn(self) -> int:
        return next(self._ctr)

    def _apply(self, operation: str, row: dict[str, Any]) -> None:
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
            mark = self.table.pending_mark()
            self._apply(operation, row)
            self._staged(row_lsn)
            if request_mode == "sync":
                # clamp past any foreign writer's LSN (queue drains and
                # streaming batches share tables; pipeline.py and
                # queue.py clamp the same way) and resync the counter so
                # later requests stay ahead
                commit_lsn = max(commit_lsn, self.table.last_lsn + 1)
                self._ctr = itertools.count(commit_lsn + 1)
                try:
                    version = self.table.commit(
                        lsn=commit_lsn,
                        operation="rest-sync",
                        properties_update={
                            REST_APPLIED_PROP: self._max_row_lsn
                        },
                    )
                except BaseException:
                    # commit restored EVERY pending op for retry; drop the
                    # one THIS request staged so a client retry of the
                    # failed request cannot double-apply it
                    self.table.discard_pending_since(mark)
                    raise
                self._dirty = False
                self._journal_truncate()
                return IngestResult(operation, row_lsn, commit_lsn, True, version)
            # async: journal-then-ack — the row survives a process crash
            self._journal_append(operation, data, row_lsn)
            self._dirty = True
            return IngestResult(operation, row_lsn, commit_lsn, False)

    def flush(self) -> int | None:
        """Commit buffered async requests (parity POST /flush,
        rest_api.rs:420-423). Returns the new version, or None if clean."""
        with self._lock:
            if not self._dirty and not self.table.has_pending():
                return None
            lsn = max(self._next_lsn(), self.table.last_lsn + 1)
            self._ctr = itertools.count(lsn + 1)
            v = self.table.commit(
                lsn=lsn,
                operation="rest-flush",
                properties_update={REST_APPLIED_PROP: self._max_row_lsn},
            )
            self._dirty = False
            self._journal_truncate()
            return v
