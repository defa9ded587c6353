"""Snapshot export: hand a table's contents to engines that cannot read
the native manifest format.

The reference persists real Iceberg v3 metadata + Puffin deletion vectors
(``storage/table/iceberg/iceberg_table_syncer.rs:723``) so any engine can
read its tables in place. This build's manifests are a custom JSON format
(``table/manifest.py``) — internally atomic/versioned/stats-bearing, but
private. ``export_snapshot`` closes the interop gap the portable way: the
LIVE view at an LSN (deletion vectors applied) materializes as plain
parquet plus an engine-neutral ``_export.json`` sidecar carrying the
schema DSL, source LSN/version, and row count. DuckDB/Trino/pandas read
the directory directly; re-import is ``load_files`` on the same parquet.

On a cluster with Iceberg/Delta writer jars the same ``scan()`` DataFrame
can instead be handed to ``df.writeTo(...)`` — the export path needs no
engine-private state either way.
"""

from __future__ import annotations

import json
import os
from typing import Any

from moonlink_spark.table.table import MoonlinkTable

EXPORT_META = "_export.json"


def export_snapshot(
    table: MoonlinkTable,
    dest: str,
    lsn: int | None = None,
    partitions: int | None = None,
) -> dict[str, Any]:
    """Materialize the live view (DVs applied) as plain parquet at ``dest``.
    Returns the sidecar metadata. One Spark job, fully parallel; pass
    ``partitions`` to control output file count (default: source layout)."""
    m = table._resolve_manifest(lsn=lsn)
    df = table.scan(lsn=lsn)
    if partitions:
        df = df.repartition(partitions)
    df.write.mode("error").parquet(dest)
    meta = {
        "format_version": 1,
        "source_table": table.path,
        "source_version": m.version,
        "source_lsn": m.lsn,
        "schema_fields": m.schema_fields,
        "identity": m.identity,
        "rows": m.live_rows,
    }
    with open(os.path.join(dest, EXPORT_META), "w") as fh:
        json.dump(meta, fh, indent=1)
    return meta


def read_export_meta(dest: str) -> dict[str, Any]:
    with open(os.path.join(dest, EXPORT_META)) as fh:
        return json.load(fh)
