"""Latency telemetry (parity src/moonlink/src/observability/):
histogram bucketing, the RAII-style guard, instrumentation of
commit / iceberg export / table open, TableStatus from list_tables, and
the OTLP round trip through the repo's own OTEL decoder."""

import json
import urllib.request

import pytest

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.observability import (
    DEFAULT_BOUNDARIES,
    METRIC_SPECS,
    LatencyHistogram,
    MetricsRegistry,
    METRICS,
)
from moonlink_spark.sources.otel import decode_otlp_metrics
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.iceberg_export import export_iceberg, read_iceberg_sync
from moonlink_spark.table.table import MoonlinkTable

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "v", "data_type": "string"},
]


def _make_table(spark, path, n=20):
    t = MoonlinkTable.create(spark, path, FIELDS, IdentityProp.single("id"))
    t.append_rows([{"id": i, "v": f"v{i}"} for i in range(n)])
    t.commit(lsn=1)
    return t


def test_histogram_bucketing():
    h = LatencyHistogram()
    # boundaries are upper-inclusive per the OTEL data model; 7 buckets
    # for the reference's 6 boundaries (snapshot_creation.rs:21)
    assert len(h.bucket_counts) == len(DEFAULT_BOUNDARIES) + 1
    for ms, bucket in [(10, 0), (50, 0), (50.1, 1), (200, 2), (450, 5), (9999, 6)]:
        h.record(ms)
        assert h.bucket_counts[bucket] >= 1
    assert h.count == 6
    assert h.min_ms == 10 and h.max_ms == 9999


def test_guard_records_on_exception():
    reg = MetricsRegistry()
    with pytest.raises(ValueError):
        with reg.guard("snapshot_creation_latency", "t1"):
            raise ValueError("boom")
    snap = reg.snapshot()
    assert snap["snapshot_creation_latency"]["t1"]["count"] == 1


def test_unknown_metric_rejected():
    reg = MetricsRegistry()
    with pytest.raises(KeyError):
        reg.record("no_such_metric", "t", 1.0)


def test_commit_and_open_instrumented(spark, tmp_path):
    METRICS.reset()
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    snap = METRICS.snapshot()
    # one commit() so far (create() publishes v0 directly, not via commit)
    assert snap["snapshot_creation_latency"][t.path]["count"] == 1
    t.append_rows([{"id": 100, "v": "x"}])
    t.commit(lsn=2)
    snap = METRICS.snapshot()
    assert snap["snapshot_creation_latency"][t.path]["count"] == 2
    # re-opening the existing table records a snapshot load (recovery
    # parity: iceberg_table_recovery.rs)
    MoonlinkTable.open(spark, path)
    snap = METRICS.snapshot()
    assert snap["snapshot_load_latency"][t.path]["count"] >= 1


def test_export_stages_and_sync_sidecar(spark, tmp_path):
    METRICS.reset()
    path = str(tmp_path / "t")
    t = _make_table(spark, path)
    t.delete_rows([{"id": 3}])
    t.commit(lsn=2)
    assert read_iceberg_sync(t) is None
    dest = str(tmp_path / "ice")
    summary = export_iceberg(t, dest)
    snap = METRICS.snapshot()
    assert snap["snapshot_synchronization_latency"][t.path]["count"] == 1
    assert snap["sync_data_files_latency"][t.path]["count"] == 1
    # the delete produced a DV, so the DV stage ran
    assert snap["sync_deletion_vectors_latency"][t.path]["count"] == 1
    assert snap["transaction_commit_latency"][t.path]["count"] == 1
    # sidecar: flush LSN + warehouse location now reported per table
    sync = read_iceberg_sync(t)
    assert sync["flush_lsn"] == 2
    assert sync["location"] == summary["location"]


def test_otlp_payload_roundtrips_through_own_decoder():
    reg = MetricsRegistry()
    reg.record("snapshot_creation_latency", "tblA", 75.0)
    reg.record("snapshot_creation_latency", "tblA", 300.0)
    reg.record("snapshot_load_latency", "tblB", 20.0)
    rows = decode_otlp_metrics(reg.to_otlp_payload(time_unix_nano=123))
    assert len(rows) == 2
    by_name = {r["metric_name"]: r for r in rows}
    creation = by_name["snapshot_creation_latency"]
    assert creation["kind"] == "histogram"
    assert creation["hist_count"] == 2
    assert creation["hist_sum"] == 375.0
    assert creation["explicit_bounds"] == list(DEFAULT_BOUNDARIES)
    # 75ms -> bucket 1, 300ms -> bucket 3 (upper-inclusive bounds)
    assert creation["bucket_counts"][1] == 1 and creation["bucket_counts"][3] == 1
    # scope/description match the reference's meter strings verbatim
    assert creation["scope_name"] == METRIC_SPECS["snapshot_creation_latency"][0]
    assert creation["metric_description"] == (
        METRIC_SPECS["snapshot_creation_latency"][1]
    )
    attrs = {a["key"]: a["value"] for a in creation["point_attributes"]}
    assert attrs["moonlink.mooncake_table_id"]["string_value"] == "tblA"


def test_list_table_status_and_metrics_route(spark, tmp_path):
    from moonlink_spark.service import MoonlinkService

    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    be.create_table("db1", "users", FIELDS, IdentityProp.single("id"))
    t = be.get_table("db1", "users")
    t.append_rows([{"id": i, "v": "x"} for i in range(5)])
    t.commit(lsn=7)
    st = be.list_table_status()
    assert st == [
        {
            "database": "db1",
            "table": "users",
            "commit_lsn": 7,
            "flush_lsn": None,
            "cardinality": 5,
            "iceberg_warehouse_location": "",
        }
    ]
    # after an iceberg export the flush lsn + warehouse surface
    be.export_table_iceberg("db1", "users", str(tmp_path / "ice"))
    st = be.list_table_status()[0]
    assert st["flush_lsn"] == 7
    assert st["iceberg_warehouse_location"].endswith("ice")

    svc = MoonlinkService(be).start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{svc.port}/metrics"
        ) as resp:
            body = json.loads(resp.read())
        assert "snapshot_creation_latency" in body["metrics"]
        with urllib.request.urlopen(
            f"http://127.0.0.1:{svc.port}/metrics?format=otlp"
        ) as resp:
            otlp = json.loads(resp.read())
        assert decode_otlp_metrics(otlp)  # non-empty, decodable
    finally:
        svc.stop()
