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

The algebra's boundary (stated, tested, never silent):

- COUNT and SUM are fully incremental (AVG derives as sum/count at read
  time): deletes subtract, updates migrate — O(|delta|) always.
- MIN/MAX are incremental ONLY under inserts (``least/greatest`` of the
  old value and the arriving delta). Under deletes/updates they are not
  incrementally maintainable — the departed row may have BEEN the
  min/max — so refresh degrades to a PER-GROUP recompute limited to the
  groups that lost rows, and FLAGS it in the returned summary
  (``minmax_recompute_groups``). Insert-only workloads never pay it;
  a delete-heavy refresh pays one base-scan semi-joined to the affected
  group keys, not a full view rebuild.
- JOIN views are out of scope by construction (``create`` takes one
  MoonlinkTable): a join's delta is not expressible from the two
  snapshot diffs without keeping both inputs' full state. Materialize
  the join output into its own table and put the view on that.

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
        mins: list[str] | None = None,
        maxs: list[str] | None = None,
    ) -> "MaterializedView":
        """Materialize V0 from the table's CURRENT snapshot (the one full
        scan this view will ever do) and persist it with the source LSN."""
        if not isinstance(table, MoonlinkTable):
            raise TableConfigError(
                "materialized views take ONE MoonlinkTable base — join "
                "views are not incrementally maintainable from snapshot "
                "diffs; materialize the join into its own table first"
            )
        if table.identity.mode not in ("single", "keys"):
            raise TableConfigError(
                "materialized views need key identity (single/keys); "
                f"got {table.identity.mode!r}"
            )
        sums = list(sums or [])
        mins = list(mins or [])
        maxs = list(maxs or [])
        os.makedirs(path, exist_ok=True)
        lsn = table.last_lsn
        v0 = _aggregate(table.scan(lsn=lsn), group_by, sums, mins, maxs)
        _write_version(path, 0, v0)
        state = {
            "group_by": group_by,
            "sums": sums,
            "mins": mins,
            "maxs": maxs,
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
            *[F.col(f"min_{c}") for c in self.state.get("mins", [])],
            *[F.col(f"max_{c}") for c in self.state.get("maxs", [])],
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
        mins = self.state.get("mins", [])
        maxs = self.state.get("maxs", [])
        mm_cols = list(dict.fromkeys(mins + maxs))
        keys = self.table.identity.key_columns([])
        payload = list(dict.fromkeys(group_by + sums + mm_cols))

        try:
            old_snapshot = self.table.scan(lsn=old_lsn)
        except Exception:
            # the pinned snapshot was vacuumed away (keep_versions shorter
            # than the view's refresh lag): fall back to a one-off FULL
            # recompute — correct, just not incremental. Vacuum retention
            # should normally cover the refresh cadence.
            v_new = _aggregate(
                self.table.scan(lsn=new_lsn), group_by, sums, mins, maxs
            )
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
            F.lit(1).cast("bigint").alias("__nneg"),
            *[
                (-F.col(f"__old_{c}")).cast(DEC).alias(f"__ds_{c}")
                for c in sums
            ],
            # departing rows contribute nothing to min/max incrementally
            # — they are what forces the per-group recompute below.
            # (typed null: when(False, col) keeps the column's own type)
            *[
                F.when(F.lit(False), F.col(f"__old_{c}")).alias(f"__mv_{c}")
                for c in mm_cols
            ],
        )
        pos = d.filter(F.col("__in_new").isNotNull()).select(
            *[F.col(f"__new_{c}").alias(c) for c in group_by],
            F.lit(1).cast("bigint").alias("__dn"),
            F.lit(0).cast("bigint").alias("__nneg"),
            *[F.col(f"__new_{c}").cast(DEC).alias(f"__ds_{c}") for c in sums],
            *[F.col(f"__new_{c}").alias(f"__mv_{c}") for c in mm_cols],
        )
        delta = (
            neg.unionByName(pos, allowMissingColumns=False)
            .groupBy(*group_by)
            .agg(
                F.sum("__dn").alias("__dn"),
                F.sum("__nneg").alias("__nneg"),
                *[F.sum(f"__ds_{c}").alias(f"__ds_{c}") for c in sums],
                *[F.min(f"__mv_{c}").alias(f"__dmin_{c}") for c in mins],
                *[F.max(f"__mv_{c}").alias(f"__dmax_{c}") for c in maxs],
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
        # MIN/MAX algebra boundary: a group that LOST rows may have lost
        # its extremum, so those groups — and only those — get their
        # min/max recomputed from the new snapshot (semi-join-bounded
        # scan), flagged in the summary. Insert-only groups merge
        # least/greatest(old, arriving) with no base read at all.
        n_recompute_groups = 0
        rc = None
        if mm_cols:
            affected = delta.filter(F.col("__nneg") > 0).select(*group_by)
            n_recompute_groups = affected.count()
            if n_recompute_groups:
                base = self.table.scan(lsn=new_lsn)
                rc = (
                    base.join(F.broadcast(affected), group_by, "left_semi")
                    .groupBy(*group_by)
                    .agg(
                        *[F.min(c).alias(f"__rcmin_{c}") for c in mins],
                        *[F.max(c).alias(f"__rcmax_{c}") for c in maxs],
                    )
                    .withColumn("__rc", F.lit(True))
                )

        zero_dec = F.lit(0).cast(DEC)

        new_cnt = F.coalesce(F.col(_COUNT), F.lit(0)) + F.coalesce(
            F.col("__dn"), F.lit(0)
        )

        def _mm(kind: str, c: str):
            old_v = F.col(f"{kind}_{c}")
            dv = F.col(f"__d{kind}_{c}")
            inc = F.least(old_v, dv) if kind == "min" else F.greatest(old_v, dv)
            if rc is not None:
                inc = F.when(
                    F.col("__rc").isNotNull(), F.col(f"__rc{kind}_{c}")
                ).otherwise(inc)
            # an EMPTIED group must null its extrema: keeping the stale
            # min/max (the group has no rows; rc has no row to overwrite
            # with) would poison least/greatest when later inserts revive
            # the group — a revived min would stick at the dead value
            return F.when(new_cnt > 0, inc).alias(f"{kind}_{c}")

        merged = cur.join(delta, group_by, "full_outer")
        if rc is not None:
            merged = merged.join(rc, group_by, "left_outer")
        merged = merged.select(
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
            *[_mm("min", c) for c in mins],
            *[_mm("max", c) for c in maxs],
        )
        new_version = self.state["version"] + 1
        _write_version(self.path, new_version, merged)
        old_dir = self._version_path(self.state["version"])
        self.state.update({"lsn": new_lsn, "version": new_version})
        _write_state(self.path, self.state)
        shutil.rmtree(old_dir, ignore_errors=True)
        out = {
            "refreshed": True,
            "lsn": new_lsn,
            "changed_rows": n_changed,
            "version": new_version,
        }
        if mm_cols:
            out["minmax_recompute_groups"] = n_recompute_groups
        return out

    # ------------------------------------------------------------------ #
    def _version_path(self, version: int) -> str:
        return os.path.join(self.path, f"v{version}")


# ---------------------------------------------------------------------- #
def _aggregate(
    df: DataFrame,
    group_by: list[str],
    sums: list[str],
    mins: list[str] = (),
    maxs: list[str] = (),
) -> DataFrame:
    return df.groupBy(*group_by).agg(
        F.count(F.lit(1)).cast("bigint").alias(_COUNT),
        *[F.sum(F.col(c).cast(DEC)).cast(DEC).alias(f"sum_{c}") for c in sums],
        *[F.min(c).alias(f"min_{c}") for c in mins],
        *[F.max(c).alias(f"max_{c}") for c in maxs],
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
