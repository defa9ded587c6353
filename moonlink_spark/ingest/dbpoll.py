"""Database-polling CDC source: close the loop from a live database to the
streaming pipeline without a replication wire protocol.

Parity target: the reference's primary ingress is Postgres logical
replication (``src/moonlink_connectors/src/pg_replicate/postgres_source.rs``)
— initial snapshot, then a change stream with LSNs, feeding the CDC sink.
No database server (or JDBC jar) ships in this environment, so the same
contract is re-expressed over two standard, dependency-free mechanisms:

- **Outbox polling** (``DbPollingSource``): the source database maintains a
  change-log/outbox table ``(change_id, op, row_json, old_row_json)`` —
  the standard CDC pattern when logical replication is unavailable. Each
  ``poll_once()`` drains rows past the persisted cursor and emits one CDC
  JSONL file into a spool directory that ``StreamingIngestor`` consumes
  (micro-batch merge, idempotent replay, LSN floor — all unchanged).
  Works against ANY DB-API 2.0 connection: sqlite3 (stdlib, used in
  tests), psycopg2, mysql-connector, ...
- **Initial snapshot** (``snapshot_rows``): SELECT * at a captured cursor,
  for ``initial_copy`` seeding — events at or below the snapshot cursor
  are skipped by the pipeline's LSN floor, exactly like the reference's
  buffered replay after initial copy (table_handler.rs:940-951).

On a cluster with a JDBC driver jar the snapshot side can instead use
``spark.read.jdbc`` (predicate-partitioned) with this module unchanged —
the outbox poll is driver-side by design (it is a cursor drain, not a
scan).
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

# DB-API param style per driver ('qmark' = sqlite3, 'format' = psycopg2...)
_PARAM = {"qmark": "?", "format": "%s"}


class DbPollingSource:
    """Drain an outbox table into CDC JSONL files for StreamingIngestor."""

    def __init__(
        self,
        connect: Callable[[], Any],
        outbox_table: str,
        spool_dir: str,
        state_path: str | None = None,
        paramstyle: str = "qmark",
        batch_limit: int = 10_000,
        gap_timeout_s: float = 10.0,
    ):
        """``gap_timeout_s``: how long a missing change_id below the
        batch's max may stay missing before it is presumed rolled back
        and skipped. SERIAL/AUTO_INCREMENT ids are allocated at INSERT
        but become visible at COMMIT — a writer that allocated id 5 but
        has not committed while id 6 is already visible means advancing
        the cursor to 6 would skip 5 FOREVER once it commits (the
        classic outbox gap; review r10). The cursor therefore advances
        only past ids that are visible or have been missing longer than
        this grace period."""
        self.connect = connect
        self.outbox_table = outbox_table
        self.spool_dir = spool_dir
        self.state_path = state_path or os.path.join(spool_dir, "_cursor.json")
        self.ph = _PARAM[paramstyle]
        self.batch_limit = batch_limit
        self.gap_timeout_s = gap_timeout_s
        # Missing-id spans tracked as (lo, hi, first_seen) INTERVALS, not
        # per-id entries: outbox ids are ordered but not dense (sequence
        # caching, setval, rolled-back bursts), so batch_max - cursor can be
        # arbitrarily larger than batch_limit and a per-id dict would make
        # one poll loop/allocate over the whole hole (review r11). Interval
        # count is bounded by len(visible)+1 per poll regardless of span.
        self._gap_intervals: list[tuple[int, int, float]] = []
        os.makedirs(spool_dir, exist_ok=True)

    # -- cursor persistence (crash-safe: files are emitted BEFORE the cursor
    # advances, and the pipeline's batch-id/LSN guards dedupe re-emits) ----

    def _load_cursor(self) -> int:
        if os.path.exists(self.state_path):
            with open(self.state_path) as fh:
                return int(json.load(fh)["cursor"])
        return 0

    def _save_cursor(self, cursor: int) -> None:
        tmp = self.state_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"cursor": cursor}, fh)
        os.replace(tmp, self.state_path)

    # -- polling ------------------------------------------------------------

    def poll_once(self) -> int:
        """Drain outbox rows past the cursor into ONE CDC JSONL file.
        Returns the number of change events emitted."""
        cursor = self._load_cursor()
        con = self.connect()
        try:
            cur = con.cursor()
            cur.execute(
                f"SELECT change_id, op, row_json, old_row_json "
                f"FROM {self.outbox_table} WHERE change_id > {self.ph} "
                f"ORDER BY change_id LIMIT {self.ph}",
                (cursor, self.batch_limit),
            )
            rows = cur.fetchall()
        finally:
            con.close()
        if not rows:
            return 0
        # advance only past CONTIGUOUS (or timed-out-missing) id spans: an
        # uncommitted writer holding a lower id than a visible row must
        # get a grace period to appear, or its event is lost forever.
        # Every missing span's grace clock starts NOW (not lazily as the
        # advance reaches it — a run of k missing spans would otherwise
        # need k consecutive grace periods to clear). Spans are intervals:
        # a billion-id sequence jump costs one tuple, not a billion clocks.
        import time as _time

        now = _time.monotonic()
        vis_sorted = sorted({int(r[0]) for r in rows})
        # current missing spans between cursor and batch_max
        raw_gaps: list[tuple[int, int]] = []
        prev = cursor
        for v in vis_sorted:
            if v > prev + 1:
                raw_gaps.append((prev + 1, v - 1))
            prev = v
        # carry first_seen over from prior polls: split each current gap
        # against the (ascending, disjoint) stored intervals; covered
        # pieces keep their old clock, newly-missing pieces start now
        old = self._gap_intervals
        pieces: list[tuple[int, int, float]] = []
        for lo, hi in raw_gaps:
            cur = lo
            for olo, ohi, ot in old:
                if ohi < cur or olo > hi:
                    continue
                if olo > cur:
                    pieces.append((cur, olo - 1, now))
                    cur = olo
                seg_hi = min(ohi, hi)
                if seg_hi >= cur:
                    pieces.append((cur, seg_hi, ot))
                    cur = seg_hi + 1
                if cur > hi:
                    break
            if cur <= hi:
                pieces.append((cur, hi, now))
        # advance through visible ids and EXPIRED gap spans in order;
        # stop at the first span still inside its grace period
        gap_at = {lo: (hi, t) for lo, hi, t in pieces}
        safe = cursor
        vi = 0
        while True:
            nxt = safe + 1
            if vi < len(vis_sorted) and vis_sorted[vi] == nxt:
                safe = nxt
                vi += 1
                continue
            span = gap_at.get(nxt)
            if span is not None and now - span[1] >= self.gap_timeout_s:
                # presumed rolled back (or a sequence hole): skip the span
                safe = span[0]
                continue
            break  # in-grace gap (or batch end): re-poll picks the rest up
        self._gap_intervals = [p for p in pieces if p[1] > safe]
        rows = [r for r in rows if int(r[0]) <= safe]
        if not rows:
            return 0
        events = []
        max_id = cursor
        for change_id, op, row_json, old_row_json in rows:
            max_id = max(max_id, change_id)
            events.append(
                {
                    "lsn": int(change_id),
                    "xact_id": None,
                    "op": op,
                    "row": json.loads(row_json) if row_json else None,
                    "old_row": json.loads(old_row_json) if old_row_json else None,
                }
            )
        out = os.path.join(self.spool_dir, f"poll-{cursor + 1:012d}-{max_id:012d}.jsonl")
        tmp = out + ".tmp"
        with open(tmp, "w") as fh:
            for e in events:
                fh.write(json.dumps(e) + "\n")
        os.replace(tmp, out)  # atomic: the stream never sees a torn file
        self._save_cursor(max_id)
        return len(events)


def snapshot_rows(
    connect: Callable[[], Any],
    query: str,
    columns: list[str],
) -> tuple[list[dict[str, Any]], int]:
    """Initial-copy snapshot: run ``query`` (must also select the current
    max outbox change_id as the LAST column) and return (rows, cursor).
    Feed rows to ``pipeline.initial_copy`` at lsn=cursor."""
    con = connect()
    try:
        cur = con.cursor()
        cur.execute(query)
        fetched = cur.fetchall()
    finally:
        con.close()
    rows = []
    cursor = 0
    for rec in fetched:
        cursor = max(cursor, int(rec[-1] or 0))
        rows.append({c: rec[i] for i, c in enumerate(columns)})
    return rows, cursor
