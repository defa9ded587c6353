"""Delta-log export: structure per the public Delta PROTOCOL.md, data
parity via DuckDB reading the exported files, and incrementality (clean
files produce no new actions; DV'd files are rewritten).

No Delta engine is in the environment, so verification is two-sided:
(1) structural — the log actions carry the spec-required fields and the
schemaString round-trips through Spark's StructType.fromJson; (2) data —
DuckDB scans the replayed live file set and must match ``table.scan()``
exactly.
"""

import json
import os

import duckdb
import pytest
from pyspark.sql import types as T

from moonlink_spark.table.delta_export import (
    export_delta,
    read_delta_live_files,
    _replay_log,
    LOG_DIR,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable

SCHEMA = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "grp", "data_type": "string"},
    {"name": "val", "data_type": "float64"},
]


def make_table(spark, tmp_path):
    t = MoonlinkTable.create(
        spark, str(tmp_path / "src"), SCHEMA, IdentityProp.single("id")
    )
    t.append_rows(
        [{"id": i, "grp": f"g{i % 3}", "val": float(i)} for i in range(200)]
    )
    t.commit(lsn=1)
    return t


def duck_rows(dest):
    files = read_delta_live_files(dest)
    assert files, "no live files in delta log"
    con = duckdb.connect()
    quoted = ", ".join(f"'{p}'" for p in files)
    return con.sql(
        f"SELECT id, grp, val FROM read_parquet([{quoted}]) ORDER BY id"
    ).fetchall()


def spark_rows(t, lsn=None):
    return [
        (r.id, r.grp, r.val)
        for r in t.scan(lsn=lsn).orderBy("id").collect()
    ]


def log_actions(dest, version):
    path = os.path.join(dest, LOG_DIR, f"{version:020d}.json")
    with open(path) as fh:
        return [json.loads(l) for l in fh if l.strip()]


def test_v0_structure_and_data(spark, tmp_path):
    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    summary = export_delta(t, dest)
    assert summary["delta_version"] == 0 and summary["removes"] == 0

    actions = log_actions(dest, 0)
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "commitInfo"
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds

    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 1

    meta = next(a["metaData"] for a in actions if "metaData" in a)
    # spec-required metaData fields
    for k in ("id", "format", "schemaString", "partitionColumns", "configuration"):
        assert k in meta
    assert meta["format"]["provider"] == "parquet"
    st = T.StructType.fromJson(json.loads(meta["schemaString"]))
    assert st.fieldNames() == ["id", "grp", "val"]

    adds = [a["add"] for a in actions if "add" in a]
    n_records = 0
    for a in adds:
        p = os.path.join(dest, a["path"])
        assert os.path.isfile(p) and a["size"] == os.path.getsize(p)
        stats = json.loads(a["stats"])
        n_records += stats["numRecords"]
        assert stats["minValues"]["id"] >= 0
    assert n_records == 200

    assert duck_rows(dest) == spark_rows(t)


def test_incremental_append_only_adds(spark, tmp_path):
    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    v0_adds = {a["add"]["path"] for a in log_actions(dest, 0) if "add" in a}

    t.append_rows([{"id": i, "grp": "new", "val": 1.5} for i in range(500, 520)])
    t.commit(lsn=2)
    summary = export_delta(t, dest)
    assert summary["delta_version"] == 1

    actions = log_actions(dest, 1)
    kinds = [next(iter(a)) for a in actions]
    # unchanged schema, clean prior files: only commitInfo + new adds
    assert "metaData" not in kinds and "remove" not in kinds
    new_adds = {a["add"]["path"] for a in actions if "add" in a}
    assert new_adds and not (new_adds & v0_adds)
    assert duck_rows(dest) == spark_rows(t)


def test_dv_rewrite_and_remove(spark, tmp_path):
    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)

    t.delete_rows([{"id": i} for i in range(0, 200, 10)])
    t.commit(lsn=2)
    assert t.scan().count() == 180

    summary = export_delta(t, dest)
    actions = log_actions(dest, 1)
    removes = [a["remove"] for a in actions if "remove" in a]
    adds = [a["add"] for a in actions if "add" in a]
    # the DV'd file must be rewritten: old export removed, live rows re-added
    assert removes and adds and summary["removes"] == len(removes)
    assert duck_rows(dest) == spark_rows(t)
    # replay agrees with the summary's live accounting
    _, live, _ = _replay_log(os.path.join(dest, LOG_DIR))
    assert len(live) == summary["live_files"]
    total = sum(json.loads(a["stats"])["numRecords"] for a in live.values())
    assert total == 180


def test_idempotent_re_export_same_lsn(spark, tmp_path):
    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    summary = export_delta(t, dest)  # nothing changed
    assert summary["adds"] == 0 and summary["removes"] == 0
    assert duck_rows(dest) == spark_rows(t)


def test_schema_change_re_emits_metadata(spark, tmp_path):
    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    t.alter(add_columns=[{"name": "extra", "data_type": "int32"}])
    t.append_rows([{"id": 900, "grp": "g0", "val": 9.0, "extra": 7}])
    t.commit(lsn=t.manifest.lsn + 1)
    export_delta(t, dest)
    actions = log_actions(dest, 1)
    meta = [a["metaData"] for a in actions if "metaData" in a]
    assert meta, "schema change must re-emit metaData"
    st = T.StructType.fromJson(json.loads(meta[0]["schemaString"]))
    assert "extra" in st.fieldNames()
