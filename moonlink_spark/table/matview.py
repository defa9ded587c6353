"""Incrementally-maintained materialized views over MoonlinkTable commits.

The engine-API form of the ``incremental_view_maintenance`` operator
(operators/ingest_parity.py): the reference's LSN-pinned union read exists
so downstream consumers can sync "what changed since my last read"
(SURVEY.md §3.2, mooncake_table.rs read-state-at-LSN); this module is that
consumer, built in. A view is ``GROUP BY <cols> -> count + sums``; refresh
computes the lsn-to-lsn snapshot diff on the table's identity key and
applies the per-group delta algebra — each changed row contributes
(-1, -old_values) to its old group and (+1, +new_values) to its new group,
so updates that migrate rows across groups fall out of the arithmetic.

Maintainable aggregates: COUNT and SUM (AVG derives as sum/count at read
time). MIN/MAX are deliberately excluded — they are not incrementally
maintainable under deletes without a per-group recompute, and a silent
fallback would hide a table scan inside "refresh".

Scale design (100 TB): the base table is scanned ONCE ever (at create);
each refresh joins only the two snapshots on the identity key — pruned by
manifest stats/LSN lineage to files that differ — and the delta aggregate
shuffles only changed keys. Cost per refresh is O(|delta|), not O(|table|).
Sums run over DECIMAL so merge order cannot perturb results. View versions
are plain parquet with an atomic JSON state pointer, same durability story
as the table manifest itself.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moonlink_spark.errors import TableConfigError
from moonlink_spark.table.table import MoonlinkTable

STATE_FILE = "matview.json"
DEC = "decimal(25,6)"
_COUNT = "__n_rows"


class MaterializedView:
    """A persisted ``GROUP BY -> count/sum`` aggregate kept current by
    LSN-to-LSN delta application, never by rescanning the base table."""

    def __init__(self, table: MoonlinkTable, path: str):
        self.table = table
        self.path = path
        with open(os.path.join(path, STATE_FILE)) as fh:
            self.state: dict[str, Any] = json.load(fh)

    # ------------------------------------------------------------------ #
    @staticmethod
    def create(
        table: MoonlinkTable,
        path: str,
        group_by: list[str],
        sums: list[str] | None = None,
    ) -> "MaterializedView":
        """Materialize V0 from the table's CURRENT snapshot (the one full
        scan this view will ever do) and persist it with the source LSN."""
        if table.identity.mode not in ("single", "keys"):
            raise TableConfigError(
                "materialized views need key identity (single/keys); "
                f"got {table.identity.mode!r}"
            )
        sums = list(sums or [])
        os.makedirs(path, exist_ok=True)
        lsn = table.last_lsn
        v0 = _aggregate(table.scan(lsn=lsn), group_by, sums)
        _write_version(path, 0, v0)
        state = {
            "group_by": group_by,
            "sums": sums,
            "lsn": lsn,
            "version": 0,
            "key_columns": table.identity.key_columns([]),
        }
        _write_state(path, state)
        return MaterializedView(table, path)

    # ------------------------------------------------------------------ #
    def read(self) -> DataFrame:
        """Current view contents (groups with live rows only)."""
        df = self.table.spark.read.parquet(self._version_path(self.state["version"]))
        return df.filter(F.col(_COUNT) > 0).select(
            *self.state["group_by"],
            F.col(_COUNT).alias("n_rows"),
            *[F.col(f"sum_{c}") for c in self.state["sums"]],
        )

    def read_avg(self, column: str) -> DataFrame:
        """Derived AVG for a maintained SUM column."""
        if column not in self.state["sums"]:
            raise TableConfigError(f"{column!r} is not a maintained sum")
        return self.read().withColumn(
            f"avg_{column}",
            (F.col(f"sum_{column}") / F.col("n_rows")).cast("double"),
        )

    # ------------------------------------------------------------------ #
    def refresh(self) -> dict[str, Any]:
        """Apply the delta between the view's LSN and the table's current
        LSN. Returns a summary; no-op (and no new version) if unchanged."""
        old_lsn = self.state["lsn"]
        new_lsn = self.table.last_lsn
        if new_lsn == old_lsn:
            return {"refreshed": False, "lsn": old_lsn, "changed_rows": 0}
        group_by = self.state["group_by"]
        sums = self.state["sums"]
        keys = self.table.identity.key_columns([])
        payload = list(dict.fromkeys(group_by + sums))

        try:
            old_snapshot = self.table.scan(lsn=old_lsn)
        except Exception:
            # the pinned snapshot was vacuumed away (keep_versions shorter
            # than the view's refresh lag): fall back to a one-off FULL
            # recompute — correct, just not incremental. Vacuum retention
            # should normally cover the refresh cadence.
            v_new = _aggregate(self.table.scan(lsn=new_lsn), group_by, sums)
            new_version = self.state["version"] + 1
            _write_version(self.path, new_version, v_new)
            old_dir = self._version_path(self.state["version"])
            self.state.update({"lsn": new_lsn, "version": new_version})
            _write_state(self.path, self.state)
            shutil.rmtree(old_dir, ignore_errors=True)
            return {
                "refreshed": True,
                "lsn": new_lsn,
                "full_recompute": True,
                "version": new_version,
            }

        old = old_snapshot.select(
            *keys,
            *[F.col(c).alias(f"__old_{c}") for c in payload],
            F.lit(True).alias("__in_old"),
        )
        new = self.table.scan(lsn=new_lsn).select(
            *keys,
            *[F.col(c).alias(f"__new_{c}") for c in payload],
            F.lit(True).alias("__in_new"),
        )
        changed = F.col("__in_old").isNull() | F.col("__in_new").isNull()
        for c in payload:
            changed = changed | ~F.col(f"__old_{c}").eqNullSafe(F.col(f"__new_{c}"))
        d = old.join(new, keys, "full_outer").filter(changed)

        neg = d.filter(F.col("__in_old").isNotNull()).select(
            *[F.col(f"__old_{c}").alias(c) for c in group_by],
            F.lit(-1).cast("bigint").alias("__dn"),
            *[
                (-F.col(f"__old_{c}")).cast(DEC).alias(f"__ds_{c}")
                for c in sums
            ],
        )
        pos = d.filter(F.col("__in_new").isNotNull()).select(
            *[F.col(f"__new_{c}").alias(c) for c in group_by],
            F.lit(1).cast("bigint").alias("__dn"),
            *[F.col(f"__new_{c}").cast(DEC).alias(f"__ds_{c}") for c in sums],
        )
        delta = (
            neg.unionByName(pos)
            .groupBy(*group_by)
            .agg(
                F.sum("__dn").alias("__dn"),
                *[F.sum(f"__ds_{c}").alias(f"__ds_{c}") for c in sums],
            )
        )
        n_changed = delta.count()
        if n_changed == 0:
            self.state["lsn"] = new_lsn
            _write_state(self.path, self.state)
            return {"refreshed": True, "lsn": new_lsn, "changed_rows": 0}

        cur = self.table.spark.read.parquet(
            self._version_path(self.state["version"])
        )
        zero_dec = F.lit(0).cast(DEC)
        merged = cur.join(delta, group_by, "full_outer").select(
            *group_by,
            (
                F.coalesce(F.col(_COUNT), F.lit(0))
                + F.coalesce(F.col("__dn"), F.lit(0))
            )
            .cast("bigint")
            .alias(_COUNT),
            *[
                (
                    F.coalesce(F.col(f"sum_{c}"), zero_dec)
                    + F.coalesce(F.col(f"__ds_{c}"), zero_dec)
                )
                .cast(DEC)
                .alias(f"sum_{c}")
                for c in sums
            ],
        )
        new_version = self.state["version"] + 1
        _write_version(self.path, new_version, merged)
        old_dir = self._version_path(self.state["version"])
        self.state.update({"lsn": new_lsn, "version": new_version})
        _write_state(self.path, self.state)
        shutil.rmtree(old_dir, ignore_errors=True)
        return {
            "refreshed": True,
            "lsn": new_lsn,
            "changed_rows": n_changed,
            "version": new_version,
        }

    # ------------------------------------------------------------------ #
    def _version_path(self, version: int) -> str:
        return os.path.join(self.path, f"v{version}")


# ---------------------------------------------------------------------- #
def _aggregate(df: DataFrame, group_by: list[str], sums: list[str]) -> DataFrame:
    return df.groupBy(*group_by).agg(
        F.count(F.lit(1)).cast("bigint").alias(_COUNT),
        *[F.sum(F.col(c).cast(DEC)).cast(DEC).alias(f"sum_{c}") for c in sums],
    )


def _write_version(path: str, version: int, df: DataFrame) -> None:
    dest = os.path.join(path, f"v{version}")
    tmp = dest + ".tmp"
    df.write.mode("overwrite").parquet(tmp)
    shutil.rmtree(dest, ignore_errors=True)
    os.replace(tmp, dest)


def _write_state(path: str, state: dict[str, Any]) -> None:
    tmp = os.path.join(path, STATE_FILE + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(state, fh, indent=1)
    os.replace(tmp, os.path.join(path, STATE_FILE))
