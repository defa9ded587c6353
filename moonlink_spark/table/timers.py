"""Periodic table-maintenance timers — the analog of the reference's
event timers.

Parity map (citations into /root/reference):

- ``src/moonlink/src/table_handler_timer.rs:7-23`` — ``TableHandlerTimer``
  bundles three tickers with default periods: mooncake snapshot (500 ms),
  force snapshot (300 s), WAL ops (500 ms). The mooncake-snapshot tick is
  what makes ASYNC-ingested rows visible without an explicit flush; the
  force-snapshot tick drives persistence (Iceberg) on a slow cadence.
- ``src/moonlink/src/storage/timer`` — the ``Ticker`` trait + its tokio
  implementation → :class:`Ticker` (a daemon-thread repeating tick).

Divergence, by design: the reference's WAL timer batches WAL writes; this
repo's REST journal appends durably AT REQUEST TIME (`ingest/rest.py`
``_journal_append``), so there is nothing to defer — the WAL slot exists
as an optional callback seam and defaults to off.

Ticks run table work (commit / export) that takes the table lock, so a
tick and a foreground request serialize exactly like the reference's
single event loop.
"""

from __future__ import annotations

import logging
import threading
from typing import Any, Callable

log = logging.getLogger(__name__)

# table_handler_timer.rs:19-21 default periods
MOONCAKE_SNAPSHOT_INTERVAL_S = 0.5
FORCE_SNAPSHOT_INTERVAL_S = 300.0
WAL_INTERVAL_S = 0.5


class Ticker:
    """A repeating tick on a daemon thread (parity ``Ticker`` /
    ``TokioTicker``). Ticks never overlap (the loop is sequential), and a
    tick that raises is logged and does not kill the timer — the
    reference's event loop likewise survives per-event errors."""

    def __init__(self, interval_s: float, fn: Callable[[], Any], name: str):
        self.interval_s = interval_s
        self.fn = fn
        self.name = name
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def start(self) -> "Ticker":
        if self._thread is not None:
            return self
        self._thread = threading.Thread(
            target=self._run, name=f"moonlink-ticker-{self.name}", daemon=True
        )
        self._thread.start()
        return self

    def _run(self) -> None:
        while not self._stop.wait(self.interval_s):
            try:
                self.fn()
            except Exception:  # noqa: BLE001 — a failed tick must not kill the loop
                log.exception("ticker %s tick failed", self.name)

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5.0)
            self._thread = None


class TableHandlerTimers:
    """The reference's three-timer bundle for one table
    (table_handler_timer.rs:7-23). ``snapshot_fn`` runs on the fast tick
    (commit pending ops → async ingest becomes visible), ``force_fn`` on
    the slow tick (persistence sync, e.g. an Iceberg export), ``wal_fn``
    optionally on the WAL tick."""

    def __init__(
        self,
        snapshot_fn: Callable[[], Any],
        force_fn: Callable[[], Any] | None = None,
        wal_fn: Callable[[], Any] | None = None,
        snapshot_interval_s: float = MOONCAKE_SNAPSHOT_INTERVAL_S,
        force_interval_s: float = FORCE_SNAPSHOT_INTERVAL_S,
        wal_interval_s: float = WAL_INTERVAL_S,
    ):
        self.tickers = [Ticker(snapshot_interval_s, snapshot_fn, "snapshot")]
        if force_fn is not None:
            self.tickers.append(Ticker(force_interval_s, force_fn, "force-snapshot"))
        if wal_fn is not None:
            self.tickers.append(Ticker(wal_interval_s, wal_fn, "wal"))

    def start(self) -> "TableHandlerTimers":
        for t in self.tickers:
            t.start()
        return self

    def stop(self) -> None:
        for t in self.tickers:
            t.stop()
