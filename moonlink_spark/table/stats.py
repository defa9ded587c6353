"""Per-file column min/max statistics + scan-time file pruning.

Parity with the reference's Iceberg manifest stats
(``storage/table/iceberg/parquet_stats_utils.rs:34-180,335-409``): every data
file carries per-column min/max collected from its parquet FOOTER at write
time (no data read), and scans prune the file list driver-side before Spark
ever lists them. This is the engine's replacement for the reference's
persisted hash index on the read path: a point lookup or a delete-key batch
touches only the files whose key range overlaps.

At 100 TB the effect is the difference between "MERGE scans the table" and
"MERGE opens the handful of files containing the keys" — same role the
bucketed hash index plays in the reference
(``persisted_bucket_hash_map.rs``), with zero maintenance cost.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal
from typing import Any

_SUPPORTED = (int, float, str, bool)


def collect_file_stats(path: str, max_columns: int = 32) -> dict[str, list]:
    """Read footer row-group stats -> {column: [min, max]} (JSON-safe).

    Only primitive comparable types are kept; columns with missing stats in
    any row group are dropped (can't prune safely)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    out: dict[str, list] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        group = md.row_group(rg)
        for ci in range(min(group.num_columns, max_columns)):
            col = group.column(ci)
            name = col.path_in_schema
            if "." in name or name in bad:
                continue  # nested: skip
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                out.pop(name, None)
                continue
            mn, mx = _json_safe(st.min), _json_safe(st.max)
            if mn is None or mx is None:
                bad.add(name)
                out.pop(name, None)
                continue
            if name in out:
                out[name][0] = min(out[name][0], mn)
                out[name][1] = max(out[name][1], mx)
            else:
                out[name] = [mn, mx]
    return out


def _json_safe(v: Any):
    if isinstance(v, bool):
        return None  # bool min/max not useful for pruning
    if isinstance(v, _SUPPORTED):
        return v
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, (dt.datetime, dt.date)):
        return v.isoformat()
    return None


# --------------------------------------------------------------------------- #
# pruning predicates: a tiny conjunctive language evaluated on [min, max]
# --------------------------------------------------------------------------- #


class PrunePredicate:
    """Conjunction of simple per-column conditions usable for file skipping.
    Anything not expressible here simply doesn't prune (correctness is
    preserved — Spark still applies the real filter)."""

    def __init__(self, conditions: list[tuple[str, str, Any]]):
        self.conditions = conditions  # (col, op, value) op in = < <= > >= in

    @staticmethod
    def eq(col: str, value) -> "PrunePredicate":
        return PrunePredicate([(col, "=", value)])

    @staticmethod
    def isin(col: str, values: list) -> "PrunePredicate":
        return PrunePredicate([(col, "in", list(values))])

    @staticmethod
    def between(col: str, lo, hi) -> "PrunePredicate":
        return PrunePredicate([(col, ">=", lo), (col, "<=", hi)])

    def and_(self, other: "PrunePredicate") -> "PrunePredicate":
        return PrunePredicate(self.conditions + other.conditions)

    def file_may_match(self, stats: dict[str, list] | None) -> bool:
        if not stats:
            return True  # no stats: cannot prune
        for col, op, value in self.conditions:
            rng = stats.get(col)
            if rng is None:
                continue
            mn, mx = rng
            try:
                if op == "=" and not (mn <= value <= mx):
                    return False
                if op == "in" and not any(mn <= v <= mx for v in value):
                    return False
                if op == "<" and not (mn < value):
                    return False
                if op == "<=" and not (mn <= value):
                    return False
                if op == ">" and not (mx > value):
                    return False
                if op == ">=" and not (mx >= value):
                    return False
            except TypeError:
                continue  # incomparable types: don't prune
        return True


def key_batch_predicate(
    key_cols: list[str], rows: list[dict[str, Any]]
) -> PrunePredicate | None:
    """Pruning predicate for a batch of delete/upsert keys: per key column,
    the [min, max] envelope of the batch (tight enough for point deletes and
    CDC batches, trivially safe)."""
    conds: list[tuple[str, str, Any]] = []
    for c in key_cols:
        vals = [r.get(c) for r in rows if r.get(c) is not None]
        if not vals:
            return None
        try:
            lo, hi = min(vals), max(vals)
        except TypeError:
            return None
        if isinstance(lo, bool) or not isinstance(lo, (int, float, str)):
            return None
        if len(set(vals)) <= 64:
            conds.append((c, "in", sorted(set(vals))))
        else:
            conds.extend([(c, ">=", lo), (c, "<=", hi)])
    return PrunePredicate(conds) if conds else None
