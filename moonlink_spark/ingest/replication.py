"""Replication tailer: follow a growing pgoutput byte feed into a table.

Parity: the reference's ``PostgresSource`` drives a replication slot —
it resumes from the slot's ``confirmed_flush_lsn``
(``pg_replicate/postgres_source.rs:58-119``), streams XLogData into the
CDC conversion, and acknowledges progress with status updates so the
server can discard WAL. This module is that loop with the socket
replaced by a growing length-prefixed trace file (the sandbox has no
Postgres server; on a real deployment the byte feed is a thin
``psycopg2`` replication cursor or any recorded WAL relay and the rest
of this class is unchanged).

Correctness contract:

- **resume point** = a checkpoint file holding (byte position, last
  committed LSN) — the confirmed_flush_lsn stand-in. It is written
  AFTER each table commit and never advances past (a) the Begin of a
  partially-received transaction or (b) the Stream-Start of any OPEN
  streamed transaction — both must fully replay after a crash because
  their staged state is in-memory only.
- **replayed transactions are no-ops**: a commit whose LSN is at or
  below the checkpointed LSN is skipped (normal txns) or its re-staged
  state is aborted (streamed txns) — the crash-between-commit-and-
  checkpoint window is safe.
- **transaction-atomic application**: normal-txn events buffer in
  memory and flush only on Commit; streamed events go straight into the
  table's TransactionStream staging (abortable), exactly like the
  reference's begin/commit bracketing in moonlink_sink.rs.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Iterator

from moonlink_spark.ingest.cdc import CdcEvent, CdcSink
from moonlink_spark.ingest.pgoutput import PgoutputDecoder
from moonlink_spark.table.table import MoonlinkTable


class ReplicationTailer:
    """Incrementally drain a growing pgoutput trace file into a table."""

    def __init__(
        self,
        table: MoonlinkTable,
        trace_path: str,
        checkpoint_path: str | None = None,
    ):
        self.table = table
        self.trace_path = trace_path
        self.checkpoint_path = checkpoint_path or trace_path + ".checkpoint"
        self.decoder = PgoutputDecoder()
        self.sink = CdcSink(table)
        self._pos, self._last_lsn = self._load_checkpoint()
        self._txn_buf: list[CdcEvent] = []       # in-flight normal txn
        self._txn_start_pos: int | None = None   # its Begin frame position
        self._open_streams: dict[int, int] = {}  # xid -> first S position

    # -- checkpoint --------------------------------------------------------

    def _load_checkpoint(self) -> tuple[int, int]:
        if os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as fh:
                st = json.load(fh)
            # restore the relation registry: a live Postgres session
            # re-sends Relation messages, a resumed trace does not —
            # so the registry travels with the checkpoint
            from moonlink_spark.ingest.pgoutput import (
                RelationColumn,
                RelationInfo,
            )

            for rid, r in st.get("relations", {}).items():
                self.decoder.relations[int(rid)] = RelationInfo(
                    relation_id=int(rid),
                    namespace=r["namespace"],
                    name=r["name"],
                    replica_identity=r["replica_identity"],
                    columns=tuple(
                        RelationColumn(*c) for c in r["columns"]
                    ),
                )
            # resume floor = max(checkpoint, table): a crash BETWEEN the
            # table commit and the checkpoint write leaves the table ahead
            # of the checkpoint — resuming with the stale checkpoint LSN
            # would re-apply the committed txn, which the sink/table then
            # refuse (LsnError) on every poll: a permanent wedge in
            # exactly the window the module contract declares safe. The
            # CdcSink already treats the table's LSN domain as the stream
            # domain (its own floor is table.last_lsn), so max() is
            # consistent. (review r10)
            return st["position"], max(st["lsn"], self.table.last_lsn)
        return 0, self.table.last_lsn

    def _checkpoint_floor(self, boundary_pos: int) -> int:
        """Durable resume position: never beyond in-memory-only state."""
        floor = boundary_pos
        if self._txn_start_pos is not None:
            floor = min(floor, self._txn_start_pos)
        if self._open_streams:
            floor = min(floor, min(self._open_streams.values()))
        return floor

    def _save_checkpoint(self, boundary_pos: int) -> None:
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "position": self._checkpoint_floor(boundary_pos),
                    "lsn": self._last_lsn,
                    "relations": {
                        str(rid): {
                            "namespace": r.namespace,
                            "name": r.name,
                            "replica_identity": r.replica_identity,
                            "columns": [
                                [c.flags, c.name, c.type_oid, c.type_modifier]
                                for c in r.columns
                            ],
                        }
                        for rid, r in self.decoder.relations.items()
                    },
                },
                fh,
            )
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.checkpoint_path)

    # -- frames ------------------------------------------------------------

    def _frames_from(self, pos: int) -> Iterator[tuple[int, int, bytes]]:
        """(frame_start, next_pos, payload) for complete frames from
        ``pos``; a torn tail (producer mid-write) stops iteration."""
        if not os.path.exists(self.trace_path):
            return
        with open(self.trace_path, "rb") as fh:
            fh.seek(pos)
            while True:
                start = fh.tell()
                head = fh.read(4)
                if len(head) < 4:
                    return
                (n,) = struct.unpack(">I", head)
                payload = fh.read(n)
                if len(payload) < n:
                    return
                yield start, start + 4 + n, payload

    # -- draining ----------------------------------------------------------

    def poll_once(self) -> dict[str, Any]:
        """Process every complete transaction currently in the feed.
        Safe to call in a loop, after restarts, and against feeds still
        being appended to."""
        commits = skipped = events_applied = 0
        scan_pos = self._pos
        # Streamed DML batches into per-run buffers before hitting the
        # sink: forwarding one event per apply() call gave the sink's
        # per-key squash runs of length 1, so an update-heavy STREAMED
        # transaction (exactly the large ones PG streams when
        # logical_decoding_work_mem overflows) still staged one DV job
        # per event — the quadratic pathology the squash exists to kill
        # (review r11). The buffer flushes before any other sink
        # interaction, so apply ordering is byte-identical.
        stream_buf: list[CdcEvent] = []

        def flush_stream() -> None:
            nonlocal events_applied
            if stream_buf:
                self.sink.apply(list(stream_buf))
                events_applied += len(stream_buf)
                stream_buf.clear()

        for start, nxt, payload in self._frames_from(scan_pos):
            tag = chr(payload[0])
            already_streaming = self.decoder._in_stream_xid is not None
            ev = self.decoder.decode(payload)
            scan_pos = nxt

            if tag == "S" and not already_streaming:
                xid = self.decoder._in_stream_xid
                self._open_streams.setdefault(xid, start)
                continue
            if ev is None:
                continue

            if ev.op == "begin":
                flush_stream()
                self._txn_buf = [ev]
                self._txn_start_pos = start
                continue

            if ev.op == "commit":
                flush_stream()
                self._txn_buf.append(ev)
                buf, self._txn_buf, self._txn_start_pos = self._txn_buf, [], None
                if ev.lsn <= self._last_lsn:
                    skipped += 1  # replay after crash: already in the table
                else:
                    self.sink.apply(buf)
                    self._last_lsn = ev.lsn
                    commits += 1
                    events_applied += len(buf)
                self._save_checkpoint(scan_pos)
                continue

            if ev.op == "stream_commit":
                flush_stream()
                self._open_streams.pop(ev.xact_id, None)
                if ev.lsn <= self._last_lsn:
                    # replay: discard the re-staged duplicate state
                    try:
                        self.sink.apply([CdcEvent.stream_abort(ev.xact_id)])
                    except Exception:
                        pass  # nothing staged (restart mid-replay): fine
                    skipped += 1
                else:
                    self.sink.apply([ev])
                    self._last_lsn = ev.lsn
                    commits += 1
                self._save_checkpoint(scan_pos)
                continue

            if ev.op == "stream_abort":
                flush_stream()
                self._open_streams.pop(ev.xact_id, None)
                self.sink.apply([ev])
                self._save_checkpoint(scan_pos)
                continue

            # DML
            if ev.xact_id is not None:
                # streamed: buffer the chunk; interleaved streams flush
                # on the xid switch so per-xact ordering is preserved
                if stream_buf and stream_buf[0].xact_id != ev.xact_id:
                    flush_stream()
                stream_buf.append(ev)
                continue
            if not self._txn_buf:
                raise ValueError(
                    "DML frame outside a transaction at feed position "
                    f"{start} — trace must start at a transaction boundary"
                )
            self._txn_buf.append(ev)

        # a torn streamed chunk at the feed tail still stages before the
        # poll returns (scan resumes AFTER these frames, so deferring
        # them would lose the events)
        flush_stream()
        # a partial normal txn replays from its Begin next poll (cheap:
        # its frames are re-decoded, nothing was applied); open streamed
        # xacts keep their in-memory staging and scan resumes after them
        if self._txn_start_pos is not None:
            self._pos = self._txn_start_pos
            self._txn_buf = []
            self._txn_start_pos = None
        else:
            self._pos = scan_pos
        return {
            "commits": commits,
            "skipped_replays": skipped,
            "events": events_applied,
            "position": self._pos,
            "lsn": self._last_lsn,
        }
