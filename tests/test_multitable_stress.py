"""Multi-table concurrency stress: N tables ingesting concurrently
through ONE backend + service, with interleaved optimize/export, and
per-table isolation of LSN logs and manifests asserted against
independent models.

Parity: the reference runs one event loop PER TABLE behind a shared
backend (``table_handler.rs:124,204-211``); many tables progress
concurrently and never see each other's events. Here each worker thread
drives its own table through the shared MoonlinkBackend while the
HTTP service serves status reads against the same instance."""


import json
import random

import pytest
import threading
import urllib.request

from pyspark.sql import functions as F  # noqa: F401  (spark session warm)

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.service import MoonlinkService
from moonlink_spark.table.identity import IdentityProp

# full-lifecycle chaos/stress runs (10-70s each): excluded from the
# fast profile; the full run covers them (pytest -m "")
pytestmark = pytest.mark.slow

N_TABLES = 4
OPS_PER_TABLE = 30


def _drive_table(be, db, name, seed, errors, models, exports, tmp_path):
    """One worker: a randomized upsert/delete/commit/optimize/export
    stream against its own table, mirroring a per-table model."""
    try:
        rng = random.Random(seed)
        t = be.get_table(db, name)
        committed = {}
        pending = {}
        lsn = 0
        for step in range(OPS_PER_TABLE):
            action = rng.choices(
                ["upsert", "delete", "commit", "optimize", "export"],
                weights=[5, 2, 3, 1, 1],
                k=1,
            )[0]
            if action == "upsert":
                key = rng.randrange(60)
                row = {"id": key, "v": f"{name}-{step}"}
                t.upsert_rows([row])
                pending[key] = row["v"]
            elif action == "delete":
                live = {**committed, **{k: v for k, v in pending.items() if v}}
                live = {k: v for k, v in live.items() if v is not None}
                if not live:
                    continue
                key = rng.choice(sorted(live))
                t.delete_rows([{"id": key}])
                pending[key] = None
            elif action == "commit":
                if not t.has_pending():
                    continue
                lsn += rng.randrange(1, 4)
                t.commit(lsn=lsn)
                for k, v in pending.items():
                    if v is None:
                        committed.pop(k, None)
                    else:
                        committed[k] = v
                pending.clear()
            elif action == "optimize" and not t.has_pending():
                be.optimize_table(db, name)
            elif action == "export" and not t.has_pending() and committed:
                be.export_table_iceberg(
                    db, name, str(tmp_path / f"ice-{name}")
                )
                exports[name] = True
        if t.has_pending():
            lsn += 1
            t.commit(lsn=lsn)
            for k, v in pending.items():
                if v is None:
                    committed.pop(k, None)
                else:
                    committed[k] = v
        models[name] = (committed, lsn)
    except Exception as e:  # noqa: BLE001 — surface in the main thread
        errors.append((name, repr(e)))


def test_multitable_concurrent_ingest_isolated(spark, tmp_path):
    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    for i in range(N_TABLES):
        be.create_table(
            "db",
            f"t{i}",
            [
                {"name": "id", "data_type": "int32", "nullable": False},
                {"name": "v", "data_type": "string"},
            ],
            identity=IdentityProp.single("id"),
        )
    svc = MoonlinkService(be).start()
    errors: list = []
    models: dict = {}
    exports: dict = {}
    status_snapshots: list = []
    stop_status = threading.Event()

    def status_poller():
        # hammer the shared status surface WHILE ingest runs: every
        # response must be well-formed and internally consistent
        while not stop_status.is_set():
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{svc.port}/tables", timeout=5
                ) as resp:
                    status_snapshots.append(json.loads(resp.read())["tables"])
            except Exception as e:  # noqa: BLE001
                errors.append(("status", repr(e)))
                return

    try:
        workers = [
            threading.Thread(
                target=_drive_table,
                args=(be, "db", f"t{i}", 1000 + i, errors, models, exports, tmp_path),
            )
            for i in range(N_TABLES)
        ]
        poller = threading.Thread(target=status_poller, daemon=True)
        poller.start()
        for w in workers:
            w.start()
        for w in workers:
            w.join(timeout=600)
        stop_status.set()
        poller.join(timeout=10)
    finally:
        svc.stop()

    assert not errors, errors
    assert len(models) == N_TABLES

    # isolation: each table's final state equals ITS OWN model exactly
    for i in range(N_TABLES):
        name = f"t{i}"
        committed, last_lsn = models[name]
        t = be.get_table("db", name)
        got = {r["id"]: r["v"] for r in t.scan().collect()}
        assert got == committed, f"{name} diverged from its model"
        assert t.last_lsn == last_lsn
        # LSN log isolation: this table's history never contains another
        # table's rows (v values are prefixed with the table name)
        assert all(v.startswith(f"{name}-") for v in got.values())
        # manifest lineage is a clean chain
        versions = [m.version for m in t.history()]
        assert versions == sorted(versions)

    # every mid-run status snapshot was consistent: each table listed at
    # most once per snapshot, with fields of the right shape
    assert status_snapshots, "status poller never ran"
    for snap in status_snapshots:
        tables = [s["table"] for s in snap]
        assert len(tables) == len(set(tables))
        for s in snap:
            assert s["commit_lsn"] >= 0 and s["cardinality"] >= 0

    # final status equals the models
    final = {s["table"]: s for s in be.list_table_status()}
    for i in range(N_TABLES):
        name = f"t{i}"
        committed, last_lsn = models[name]
        assert final[name]["commit_lsn"] == last_lsn
        assert final[name]["cardinality"] == len(committed)
        if exports.get(name):
            assert final[name]["iceberg_warehouse_location"]
