"""Delta-Lake transaction-log export: publish a table snapshot (and
incremental follow-ups) in the open Delta format, with no Delta jars.

The reference persists every commit as real Iceberg metadata so external
engines read its tables in place (iceberg_table_syncer.rs; SURVEY.md §2a
#17). Iceberg manifests are Avro and need a writer library, but the Delta
transaction log is plain JSON per the public protocol spec
(github.com/delta-io/delta PROTOCOL.md): a ``_delta_log/`` directory of
``{version:020d}.json`` files whose actions (protocol, metaData, add,
remove) describe parquet data files. That makes Delta the interop format
this jar-free build can emit *natively* — any Delta-capable engine
(Spark+delta jars, DuckDB delta extension, delta-rs, Trino) can then read
the exported table, including its version history.

Mapping moonlink commits -> Delta versions:

- each ``export_delta`` call snapshots the table at an LSN into ONE new
  Delta log version;
- data files untouched by deletion vectors are **copied verbatim** (their
  exported name is a content-stable hash of source path + DV state, so a
  file that did not change between exports produces no log action at all);
- files with DV'd rows are **materialized** through a Spark anti-join
  (the same plan ``scan()`` uses) into a rewritten parquet — Delta's
  reader contract is "live rows only" for plain add files, so DVs are
  compacted away at the boundary;
- per-file ``stats`` (numRecords / minValues / maxValues / nullCount) come
  straight from parquet footers, the same source as the manifest's pruning
  stats (table/stats.py).

Scale: copy-verbatim keeps incremental exports O(changed files) — an
append-only 100 TB table exports each new commit by hard-copying only the
new files and appending one small JSON. Rewrites are per-affected-file
Spark jobs (distributed, no driver data path); the log replay that
computes "what was already exported" reads only JSON actions, never data.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Any

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from moonlink_spark.schema import field_schema_to_struct
from moonlink_spark.table.manifest import FileEntry, Manifest
from moonlink_spark.table.stats import _json_safe
from moonlink_spark.table.table import MoonlinkTable

LOG_DIR = "_delta_log"
PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}


# --------------------------------------------------------------------------- #
# parquet footer -> Delta per-file stats
# --------------------------------------------------------------------------- #
def _delta_file_stats(path: str) -> str:
    """Delta ``stats`` JSON string for one parquet file (numRecords,
    minValues, maxValues, nullCount) from footer metadata only."""
    md = pq.ParquetFile(path).metadata
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name or name in bad:
                continue
            st = col.statistics
            if st is None:
                bad.add(name)
                for d in (mins, maxs, nulls):
                    d.pop(name, None)
                continue
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count
            if not st.has_min_max:
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            mn, mx = _json_safe(st.min), _json_safe(st.max)
            if mn is None or mx is None:
                continue
            mins[name] = mn if name not in mins else min(mins[name], mn)
            maxs[name] = mx if name not in maxs else max(maxs[name], mx)
    return json.dumps(
        {
            "numRecords": md.num_rows,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        },
        sort_keys=True,
    )


# --------------------------------------------------------------------------- #
# log replay (what has already been exported)
# --------------------------------------------------------------------------- #
def _log_versions(log_dir: str) -> list[int]:
    if not os.path.isdir(log_dir):
        return []
    out = []
    for n in os.listdir(log_dir):
        if n.endswith(".json") and n[:-5].isdigit():
            out.append(int(n[:-5]))
    return sorted(out)


def _replay_log(log_dir: str) -> tuple[int, dict[str, dict], str | None]:
    """Replay existing log -> (next_version, {path: add_action},
    last schemaString)."""
    live: dict[str, dict] = {}
    schema_string: str | None = None
    versions = _log_versions(log_dir)
    for v in versions:
        with open(os.path.join(log_dir, f"{v:020d}.json")) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
                elif "metaData" in action:
                    schema_string = action["metaData"]["schemaString"]
    next_version = (versions[-1] + 1) if versions else 0
    return next_version, live, schema_string


# --------------------------------------------------------------------------- #
# export
# --------------------------------------------------------------------------- #
def _dv_files_touched(table: MoonlinkTable, m: Manifest) -> set[str]:
    """Relative data-file paths that have at least one DV'd row — read from
    the (small) DV parquet footers' file_path column values, driver-side."""
    touched: set[str] = set()
    for dv in m.delete_files:
        t = pq.read_table(table._resolve(dv.path), columns=["file_path"])
        # stored values may carry a URI scheme remnant ("file:data/…")
        touched.update(
            p.removeprefix("file:") for p in t.column("file_path").to_pylist()
        )
    return touched


def _export_name(entry: FileEntry, dv_state: str) -> str:
    key = hashlib.md5(f"{entry.path}|{entry.rows}|{dv_state}".encode()).hexdigest()
    return f"part-{key[:24]}.parquet"


def _materialize_live_file(
    table: MoonlinkTable, m: Manifest, entry: FileEntry, dest_path: str
) -> None:
    """Rewrite ONE data file with its DV'd rows removed (distributed Spark
    anti-join on row position — the scan() plan restricted to this file)."""
    spark = table.spark
    schema = field_schema_to_struct(m.schema_fields)
    df = spark.read.schema(schema).parquet(table._resolve(entry.path))
    df = df.select("*", F.col("_metadata.row_index").alias("__ri"))
    dv_paths = [table._resolve(f.path) for f in m.delete_files]
    dv = (
        spark.read.parquet(*dv_paths)
        .filter(
            F.replace(F.col("file_path"), F.lit("file:"), F.lit("")) == entry.path
        )
        .select(F.col("row_index").alias("__ri"))
    )
    out = df.join(F.broadcast(dv), ["__ri"], "left_anti").drop("__ri")
    tmp = dest_path + ".tmp.dir"
    out.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = [n for n in os.listdir(tmp) if n.endswith(".parquet")]
    assert len(part) == 1, part
    os.replace(os.path.join(tmp, part[0]), dest_path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


def export_delta(
    table: MoonlinkTable, dest: str, lsn: int | None = None
) -> dict[str, Any]:
    """Export the snapshot at ``lsn`` (default: latest) as one new Delta log
    version under ``dest``. First call writes version 0 (protocol +
    metaData + adds); later calls append incremental versions containing
    only the add/remove delta vs what the log already holds. Returns a
    summary dict."""
    m = table._resolve_manifest(lsn=lsn)
    log_dir = os.path.join(dest, LOG_DIR)
    os.makedirs(log_dir, exist_ok=True)
    version, exported, prev_schema = _replay_log(log_dir)

    touched = _dv_files_touched(table, m) if m.delete_files else set()
    desired: dict[str, FileEntry] = {}
    rewritten: dict[str, bool] = {}
    for entry in m.data_files:
        if entry.path in touched:
            dv_rows = sum(f.rows for f in m.delete_files)
            name = _export_name(entry, f"dv@{m.version}:{dv_rows}")
            rewritten[name] = True
        else:
            name = _export_name(entry, "clean")
            rewritten[name] = False
        desired[name] = entry

    adds: list[dict] = []
    for name, entry in desired.items():
        if name in exported:
            continue
        dest_path = os.path.join(dest, name)
        if rewritten[name]:
            _materialize_live_file(table, m, entry, dest_path)
        else:
            import shutil

            shutil.copyfile(table._resolve(entry.path), dest_path)
        adds.append(
            {
                "path": name,
                "partitionValues": {},
                "size": os.path.getsize(dest_path),
                "modificationTime": int(os.path.getmtime(dest_path) * 1000),
                "dataChange": True,
                "stats": _delta_file_stats(dest_path),
            }
        )
    removes = [
        {
            "path": name,
            "deletionTimestamp": m.timestamp_ms,
            "dataChange": True,
        }
        for name in exported
        if name not in desired
    ]

    schema_string = field_schema_to_struct(m.schema_fields).json()
    actions: list[dict] = [
        {
            "commitInfo": {
                "operation": "MOONLINK-EXPORT",
                "operationParameters": {
                    "sourceLsn": str(m.lsn),
                    "sourceVersion": str(m.version),
                },
                "timestamp": m.timestamp_ms,
            }
        }
    ]
    if version == 0:
        actions.append({"protocol": dict(PROTOCOL)})
    if version == 0 or schema_string != prev_schema:
        # deterministic table id: exports of the same source table converge
        actions.append(
            {
                "metaData": {
                    "id": hashlib.md5(table.path.encode()).hexdigest(),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": m.timestamp_ms,
                }
            }
        )
    actions += [{"add": a} for a in adds]
    actions += [{"remove": r} for r in removes]

    log_path = os.path.join(log_dir, f"{version:020d}.json")
    tmp = log_path + ".tmp"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a, sort_keys=True) + "\n")
    os.replace(tmp, log_path)
    return {
        "delta_version": version,
        "source_lsn": m.lsn,
        "source_version": m.version,
        "adds": len(adds),
        "removes": len(removes),
        "live_files": len(desired),
    }


def read_delta_live_files(dest: str) -> list[str]:
    """Replay the exported log -> absolute paths of live data files (what a
    Delta reader would scan). Used by tests to verify the export without a
    Delta engine."""
    _, live, _ = _replay_log(os.path.join(dest, LOG_DIR))
    return [os.path.join(dest, p) for p in sorted(live)]
