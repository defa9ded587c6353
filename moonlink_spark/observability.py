"""Latency telemetry — the PySpark analog of the reference's
``src/moonlink/src/observability`` module.

Parity map (all citations into /root/reference):

- ``observability/latency_exporter.rs:4-10`` — ``BaseLatencyExporter``
  (``start()`` returns a guard, ``record(duration, table_id)``) →
  :meth:`MetricsRegistry.guard` / :meth:`MetricsRegistry.record`.
- ``observability/latency_guard.rs`` — RAII guard that records on Drop →
  the :func:`MetricsRegistry.guard` context manager (records on exit,
  including the exception path, exactly like Drop).
- ``observability/snapshot_creation.rs:14-25`` — per-table u64 histogram
  ``snapshot_creation_latency`` with explicit boundaries
  ``[50,100,200,300,400,500]`` ms and the datapoint attribute
  ``moonlink.mooncake_table_id``.
- ``observability/iceberg_persistence.rs:58-84`` — five staged histograms
  (overall / data files / file indices / deletion vectors / transaction
  commit), same boundaries.
- ``observability/iceberg_table_recovery.rs:16-22`` —
  ``snapshot_load_latency``.

The reference exports through the ``opentelemetry`` crate's global meter;
here the registry renders the same shape directly as an OTLP/JSON
``ExportMetricsServiceRequest`` (:meth:`MetricsRegistry.to_otlp_payload`),
which round-trips through this repo's own OTEL ingestion
(``sources/otel.decode_otlp_metrics``) — i.e. the engine's telemetry can be
ingested into a moonlink table through the same endpoint any OTEL client
uses, closing the loop the reference's design implies.

Overhead: one ``time.monotonic()`` pair and a dict update under a lock per
instrumented operation (commits, exports, table opens — all driver-side,
none per-row), so the instrumentation is invisible next to a Spark job.
"""

from __future__ import annotations

import bisect
import threading
import time
from contextlib import contextmanager
from typing import Any, Iterator

# boundaries shared by every reference histogram (snapshot_creation.rs:21,
# iceberg_persistence.rs:63/68/73/78/83, iceberg_table_recovery.rs:22)
DEFAULT_BOUNDARIES: tuple[float, ...] = (50.0, 100.0, 200.0, 300.0, 400.0, 500.0)

# metric name -> (scope/meter name, description); names and descriptions
# are the reference's own strings so dashboards built against the
# reference read ours unchanged
METRIC_SPECS: dict[str, tuple[str, str]] = {
    "snapshot_creation_latency": (
        "snapshot_creation",
        "snapshot create latency histogram (milliseconds)",
    ),
    "snapshot_synchronization_latency": (
        "iceberg_persistence",
        "Latency (ms) for snapshot synchronization",
    ),
    "sync_data_files_latency": (
        "iceberg_persistence",
        "Latency (ms) for data files synchronization",
    ),
    "sync_file_indices_latency": (
        "iceberg_persistence",
        "Latency (ms) for file indices synchronization",
    ),
    "sync_deletion_vectors_latency": (
        "iceberg_persistence",
        "Latency (ms) for deletion vectors synchronization",
    ),
    "transaction_commit_latency": (
        "iceberg_persistence",
        "Latency (ms) for transaction commit",
    ),
    "snapshot_load_latency": (
        "iceberg_table_recovery",
        "Latency (ms) for iceberg table snapshot loading.",
    ),
}

TABLE_ID_ATTR = "moonlink.mooncake_table_id"  # snapshot_creation.rs:36


class LatencyHistogram:
    """Explicit-bounds histogram over milliseconds (OTEL data model: N
    boundaries -> N+1 buckets; bucket i counts values <= boundaries[i],
    the last bucket counts the overflow)."""

    __slots__ = ("boundaries", "bucket_counts", "count", "sum_ms", "min_ms", "max_ms")

    def __init__(self, boundaries: tuple[float, ...] = DEFAULT_BOUNDARIES):
        self.boundaries = boundaries
        self.bucket_counts = [0] * (len(boundaries) + 1)
        self.count = 0
        self.sum_ms = 0.0
        self.min_ms: float | None = None
        self.max_ms: float | None = None

    def record(self, ms: float) -> None:
        self.bucket_counts[bisect.bisect_left(self.boundaries, ms)] += 1
        self.count += 1
        self.sum_ms += ms
        self.min_ms = ms if self.min_ms is None else min(self.min_ms, ms)
        self.max_ms = ms if self.max_ms is None else max(self.max_ms, ms)

    def to_dict(self) -> dict[str, Any]:
        return {
            "count": self.count,
            "sum_ms": round(self.sum_ms, 3),
            "min_ms": self.min_ms,
            "max_ms": self.max_ms,
            "explicit_bounds": list(self.boundaries),
            "bucket_counts": list(self.bucket_counts),
        }


class MetricsRegistry:
    """Process-wide latency registry keyed by (metric, table_id)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._hists: dict[tuple[str, str], LatencyHistogram] = {}
        self._start_unix_nano = time.time_ns()

    def record(self, metric: str, table_id: str, ms: float) -> None:
        if metric not in METRIC_SPECS:
            raise KeyError(f"unknown metric {metric!r}; add it to METRIC_SPECS")
        with self._lock:
            hist = self._hists.get((metric, table_id))
            if hist is None:
                hist = self._hists[(metric, table_id)] = LatencyHistogram()
            hist.record(ms)

    @contextmanager
    def guard(self, metric: str, table_id: str) -> Iterator[None]:
        """RAII analog of latency_guard.rs: records elapsed wall time on
        exit, exception or not (Drop runs on unwind too)."""
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.record(metric, table_id, (time.monotonic() - t0) * 1000.0)

    def snapshot(self) -> dict[str, Any]:
        """{metric: {table_id: histogram-dict}} — the `/metrics` payload."""
        out: dict[str, Any] = {}
        with self._lock:
            for (metric, table_id), hist in sorted(self._hists.items()):
                out.setdefault(metric, {})[table_id] = hist.to_dict()
        return out

    def reset(self) -> None:
        with self._lock:
            self._hists.clear()
            self._start_unix_nano = time.time_ns()

    def to_otlp_payload(self, time_unix_nano: int | None = None) -> dict[str, Any]:
        """Render as an OTLP/JSON ExportMetricsServiceRequest — the same
        shape the reference's global-meter export produces, and the exact
        input ``sources/otel.decode_otlp_metrics`` consumes."""
        now = time_unix_nano if time_unix_nano is not None else time.time_ns()
        with self._lock:
            items = sorted(self._hists.items())
            start = self._start_unix_nano
        by_scope: dict[str, dict[str, list[dict[str, Any]]]] = {}
        for (metric, table_id), hist in items:
            scope, _desc = METRIC_SPECS[metric]
            point = {
                "startTimeUnixNano": str(start),
                "timeUnixNano": str(now),
                "attributes": [
                    {"key": TABLE_ID_ATTR, "value": {"stringValue": table_id}}
                ],
                "count": str(hist.count),
                "sum": hist.sum_ms,
                "min": hist.min_ms,
                "max": hist.max_ms,
                "explicitBounds": list(hist.boundaries),
                "bucketCounts": [str(c) for c in hist.bucket_counts],
            }
            by_scope.setdefault(scope, {}).setdefault(metric, []).append(point)
        scope_metrics = []
        for scope in sorted(by_scope):
            metrics = []
            for metric in sorted(by_scope[scope]):
                _, desc = METRIC_SPECS[metric]
                metrics.append(
                    {
                        "name": metric,
                        "description": desc,
                        "unit": "ms",
                        "histogram": {
                            # 2 = CUMULATIVE, the OTEL meter default the
                            # reference inherits
                            "aggregationTemporality": 2,
                            "dataPoints": by_scope[scope][metric],
                        },
                    }
                )
            scope_metrics.append({"scope": {"name": scope}, "metrics": metrics})
        return {
            "resourceMetrics": [
                {
                    "resource": {
                        "attributes": [
                            {
                                "key": "service.name",
                                "value": {"stringValue": "moonlink_spark"},
                            }
                        ]
                    },
                    "scopeMetrics": scope_metrics,
                }
            ]
        }


# the process-global registry, mirroring the reference's opentelemetry
# global meter (snapshot_creation.rs:16 `global::meter(...)`)
METRICS = MetricsRegistry()
