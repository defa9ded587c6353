"""Row identity — the key concept powering upserts/deletes.

Parity with the reference's ``IdentityProp``
(``src/moonlink/src/row/moonlink_row.rs:271-277``):

- ``single(col)``  — one primary-key column (SinglePrimitiveKey)
- ``keys(cols)``   — composite key (Keys)
- ``full_row()``   — whole row is identity; duplicates allowed; a delete
  removes exactly ONE matching row (first by file/row position, parity
  ``mem_index.rs`` FullRow multimap semantics)
- ``none()``       — append-only: deletes/upserts rejected
  (``mooncake_table.rs:1241-1246``)

Invariant ``append_only <=> mode == none`` is enforced in MoonlinkTable
(reference ``src/moonlink_backend/src/table_config.rs:31-45``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from moonlink_spark.errors import TableConfigError


@dataclass(frozen=True)
class IdentityProp:
    mode: str  # "single" | "keys" | "full_row" | "none"
    columns: tuple[str, ...] = field(default_factory=tuple)

    @staticmethod
    def single(column: str) -> "IdentityProp":
        return IdentityProp("single", (column,))

    @staticmethod
    def keys(columns: list[str] | tuple[str, ...]) -> "IdentityProp":
        if not columns:
            raise TableConfigError("composite identity needs >=1 column")
        return IdentityProp("keys", tuple(columns))

    @staticmethod
    def full_row() -> "IdentityProp":
        return IdentityProp("full_row")

    @staticmethod
    def none() -> "IdentityProp":
        return IdentityProp("none")

    @property
    def is_append_only(self) -> bool:
        return self.mode == "none"

    def key_columns(self, all_columns: list[str]) -> list[str]:
        """Columns used for identity matching."""
        if self.mode in ("single", "keys"):
            return list(self.columns)
        if self.mode == "full_row":
            return list(all_columns)
        raise TableConfigError("append-only table has no identity columns")

    def validate(self, all_columns: list[str]) -> None:
        missing = [c for c in self.columns if c not in all_columns]
        if missing:
            raise TableConfigError(f"identity columns {missing} not in schema")

    def to_json(self) -> dict[str, Any]:
        return {"mode": self.mode, "columns": list(self.columns)}

    @staticmethod
    def from_json(obj: dict[str, Any]) -> "IdentityProp":
        return IdentityProp(obj["mode"], tuple(obj.get("columns", ())))
