"""CDC event application: the Postgres-logical-replication-shaped path.

Parity with ``Sink::process_cdc_event``
(``src/moonlink_connectors/src/pg_replicate/moonlink_sink.rs:203-380``):
Insert -> Append, Update -> Delete(old)+Append(new) at one LSN (:295-326),
Delete -> Delete, Commit -> table commit at the transaction's end LSN;
events between Begin and Commit belong to one transaction and become one
atomic table commit (micro-batch == transaction).

Streaming transactions (xact_id set) route to per-xact staging
(transaction_stream.rs), committed/aborted independently.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Iterable

from moonlink_spark.errors import LsnError, TransactionError
from moonlink_spark.table.table import MoonlinkTable, TransactionStream


@dataclass(frozen=True)
class CdcEvent:
    """One replication event (parity CdcEvent enum,
    pg_replicate/conversions/cdc_event.rs:194-207)."""

    op: str  # begin | insert | update | delete | commit | stream_commit | stream_abort
    lsn: int = 0
    row: dict[str, Any] | None = None
    old_row: dict[str, Any] | None = None
    xact_id: int | None = None

    @staticmethod
    def begin(lsn: int = 0) -> "CdcEvent":
        return CdcEvent("begin", lsn)

    @staticmethod
    def insert(row: dict[str, Any], xact_id: int | None = None) -> "CdcEvent":
        return CdcEvent("insert", 0, row, None, xact_id)

    @staticmethod
    def update(
        old_row: dict[str, Any], row: dict[str, Any], xact_id: int | None = None
    ) -> "CdcEvent":
        return CdcEvent("update", 0, row, old_row, xact_id)

    @staticmethod
    def delete(row: dict[str, Any], xact_id: int | None = None) -> "CdcEvent":
        return CdcEvent("delete", 0, row, None, xact_id)

    @staticmethod
    def commit(lsn: int) -> "CdcEvent":
        return CdcEvent("commit", lsn)

    @staticmethod
    def stream_commit(xact_id: int, lsn: int) -> "CdcEvent":
        return CdcEvent("stream_commit", lsn, xact_id=xact_id)

    @staticmethod
    def stream_abort(xact_id: int) -> "CdcEvent":
        return CdcEvent("stream_abort", 0, xact_id=xact_id)


@dataclass
class CdcApplyStats:
    inserts: int = 0
    updates: int = 0
    deletes: int = 0
    commits: int = 0
    versions: list[int] = field(default_factory=list)


class CdcSink:
    """Applies an ordered CDC event stream to a MoonlinkTable."""

    def __init__(self, table: MoonlinkTable):
        self.table = table
        self._xacts: dict[int, TransactionStream] = {}
        self._last_commit_lsn = table.last_lsn

    def _target(self, xact_id: int | None):
        if xact_id is None:
            return self.table
        if xact_id not in self._xacts:
            # a stale open stream with this xid from a PREVIOUS sink (tailer
            # reconnect replays from the checkpointed Stream-Start) is
            # aborted and re-staged — the documented replay semantics; its
            # buffered rows are uncommitted by construction, so discarding
            # them is lossless (parity: re-streamed xacts re-send all rows)
            stale = self.table._xacts.get(xact_id)
            if stale is not None:
                stale.abort()
            self._xacts[xact_id] = self.table.begin_transaction(xact_id)
        return self._xacts[xact_id]

    def apply(self, events: Iterable[CdcEvent]) -> CdcApplyStats:
        stats = CdcApplyStats()
        ident = self.table.identity
        # Per-key SQUASH of contiguous same-transaction DML (the
        # reference's mem-slice shape: events land in an in-memory
        # buffer keyed by identity before flush, mooncake_table.rs).
        # Without it, an N-event transaction staged one delete op per
        # update/delete event, which the table materializes as one
        # distributed DV job EACH — quadratic against the accumulating
        # DVs, hours for a few thousand events (review r11). Squashing
        # is exact for key identities because keys are independent and
        # per-key net effect is computed in event order; it covers plain
        # txns AND streamed-xact chunks (netting one chunk commutes with
        # earlier chunks of the same xact: the stream's 4-way delete
        # routing sees earlier-chunk appends, so delete-then-append per
        # key equals sequential replay). full_row identity keeps the
        # per-event path (occurrence multiplicity is load-bearing).
        squash = ident.mode in ("single", "keys")
        key_cols = list(ident.columns) if squash else []

        def _key(row: dict[str, Any]) -> tuple:
            return tuple(row[c] for c in key_cols)

        events = list(events)
        n = len(events)
        i = 0
        while i < n:
            ev = events[i]
            if squash and ev.op in ("insert", "update", "delete"):
                # a run = consecutive DML of the SAME transaction
                # (xact_id None = plain txn, else a streamed xact's
                # chunk). Netting a chunk is exact regardless of what
                # earlier chunks staged: per-key net effect in event
                # order, deletes first — the stream's 4-way routing
                # makes a staged delete see rows appended by earlier
                # chunks of the same xact, identical to sequential.
                run_xid = ev.xact_id
                del_keys: dict[tuple, dict[str, Any]] = {}
                live: dict[tuple, dict[str, Any]] = {}
                j = i
                while j < n:
                    e = events[j]
                    if e.xact_id != run_xid or e.op not in (
                        "insert", "update", "delete"
                    ):
                        break
                    if e.op == "insert":
                        live[_key(e.row)] = e.row
                        stats.inserts += 1
                    elif e.op == "update":
                        # delete(old) + append(new), netted per key:
                        # a key inserted earlier in this run never
                        # existed in the table, so popping it from the
                        # buffer IS the delete
                        old = e.old_row if e.old_row is not None else e.row
                        k_old = _key(old)
                        if k_old in live:
                            live.pop(k_old)
                        else:
                            del_keys[k_old] = {c: old[c] for c in key_cols}
                        live[_key(e.row)] = e.row
                        stats.updates += 1
                    else:  # delete
                        k = _key(e.row)
                        if k in live:
                            live.pop(k)
                        else:
                            del_keys[k] = {c: e.row[c] for c in key_cols}
                        stats.deletes += 1
                    j += 1
                target = self._target(run_xid)
                if del_keys:
                    target.delete_rows(list(del_keys.values()))
                if live:
                    target.append_rows(list(live.values()))
                i = j
                continue
            i += 1
            if ev.op == "begin":
                continue
            if ev.op == "insert":
                self._target(ev.xact_id).append_rows([ev.row])
                stats.inserts += 1
            elif ev.op == "update":
                # delete(old) + append(new) at the same LSN (:295-326)
                t = self._target(ev.xact_id)
                t.delete_rows([ev.old_row])
                t.append_rows([ev.row])
                stats.updates += 1
            elif ev.op == "delete":
                self._target(ev.xact_id).delete_rows([ev.row])
                stats.deletes += 1
            elif ev.op == "commit":
                if ev.lsn <= self._last_commit_lsn:
                    raise LsnError(
                        f"commit lsn {ev.lsn} <= last {self._last_commit_lsn}"
                    )
                if self.table.has_pending():
                    stats.versions.append(
                        self.table.commit(lsn=ev.lsn, operation="cdc")
                    )
                self._last_commit_lsn = ev.lsn
                stats.commits += 1
            elif ev.op == "stream_commit":
                x = self._xacts.pop(ev.xact_id, None)
                if x is None:
                    # a streamed txn with no decoded DML for THIS table
                    # (logical messages only, or every row belonged to
                    # another relation) is a legal EMPTY transaction:
                    # advance the floor, commit nothing — raising here
                    # wedged the tailer in a crash loop (review r10)
                    self._last_commit_lsn = max(self._last_commit_lsn, ev.lsn)
                    stats.commits += 1
                else:
                    stats.versions.append(x.commit(lsn=ev.lsn))
                    self._last_commit_lsn = ev.lsn
                    stats.commits += 1
            elif ev.op == "stream_abort":
                x = self._xacts.pop(ev.xact_id, None)
                if x is not None:
                    x.abort()
                # unknown xact: nothing was staged (empty streamed txn,
                # or a replay after restart) — aborting nothing is a no-op
            else:
                raise TransactionError(f"unknown CDC op {ev.op!r}")
        return stats
