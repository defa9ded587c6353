"""Table-metadata persistence stores.

Parity with the reference's ``src/moonlink_metadata_store`` crate:

- the store interface (``base_metadata_store.rs:29-68``):
  ``metadata_table_exists`` / ``get_all_table_metadata_entries`` /
  ``store_table_metadata`` / ``delete_table_metadata``;
- the SQLite implementation (``sqlite/sqlite_metadata_store.rs``) with the
  same ``tables`` relation (``sqlite/sql/create_tables.sql``): columns
  ``"database", "table", src_table_name, src_table_uri, config`` with a
  composite primary key on (database, table), config persisted as a JSON
  string;
- the persisted-config subset + defaults-on-missing semantics of
  ``config_utils.rs`` (``MoonlinkTableConfigForPersistence``): only a
  minimal, always-valid config is persisted, unknown fields are ignored and
  missing fields fall back to defaults so old and new readers interoperate;
- row-count checks: store/delete verify exactly one row was affected
  (``sqlite_metadata_store.rs`` rows_affected guards).

The default backend catalog remains the JSON file (``backend.py``); the
SQLite store is the durable multi-process variant, selected with
``MoonlinkBackend(..., metadata_store="sqlite")``. The reference's second
backend — Postgres (``postgres/pg_metadata_store.rs``) — is
:class:`PgMetadataStore` below: identical semantics, reached over the
PostgreSQL wire protocol (``pg_protocol.py``), selected with
``metadata_store="postgres"``.
"""

from __future__ import annotations

import json
import os
import sqlite3
import threading
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Any, Iterator

from moonlink_spark.errors import MoonlinkError

# Same filename as the reference (sqlite_metadata_store.rs:15).
METADATA_DATABASE_FILENAME = "moonlink_metadata_store.sqlite"

# DDL mirrors sqlite/sql/create_tables.sql verbatim in shape.
_CREATE_TABLES_SQL = """
CREATE TABLE IF NOT EXISTS tables (
    "database" TEXT,
    "table" TEXT,
    src_table_name TEXT NOT NULL,
    src_table_uri TEXT,
    config TEXT,
    PRIMARY KEY ("database", "table")
);
"""


class MetadataStoreError(MoonlinkError):
    """Row-count mismatch or malformed persisted config
    (parity ``moonlink_metadata_store/src/error.rs``)."""


# ---------------------------------------------------------------------------
# Persisted config subset (config_utils.rs parity)
# ---------------------------------------------------------------------------

# Defaults must form a VALID combination (config_utils.rs:78-88): the
# default table is append-only with no row identity.
_CONFIG_DEFAULTS: dict[str, Any] = {
    "append_only": True,
    "row_identity": {"mode": "none", "columns": []},
    "properties": {},
}


def serialize_table_config(
    identity: dict[str, Any],
    append_only: bool,
    properties: dict[str, Any] | None = None,
    table_uri: str | None = None,
) -> dict[str, Any]:
    """Produce the minimal persisted config (parity
    ``config_utils.rs parse_moonlink_table_config``): a subset of the live
    table config, always valid, JSON-serializable. The persisted shape keeps
    the reference's three-field layout
    (``MoonlinkTableConfigForPersistence``: mooncake_table_config +
    iceberg_table_config + wal_config); the table location rides in
    ``iceberg_table_config`` like the reference's warehouse URI."""
    cfg = {
        "mooncake_table_config": {
            "append_only": bool(append_only),
            "row_identity": identity,
            "properties": dict(properties or {}),
        },
        "iceberg_table_config": {"table_uri": table_uri or ""},
        "wal_config": {},
    }
    _validate_config(cfg)
    return cfg


def deserialize_table_config(obj: dict[str, Any]) -> dict[str, Any]:
    """Rehydrate a persisted config, applying defaults for missing fields
    and ignoring unknown ones (serde ``#[serde(default)]`` semantics,
    config_utils.rs:14-49 — forward AND backward compatible)."""
    mc = dict(obj.get("mooncake_table_config") or {})
    ic = dict(obj.get("iceberg_table_config") or {})
    out = {
        "mooncake_table_config": {
            "append_only": bool(mc.get("append_only", _CONFIG_DEFAULTS["append_only"])),
            "row_identity": mc.get("row_identity", dict(_CONFIG_DEFAULTS["row_identity"])),
            "properties": dict(mc.get("properties", {})),
        },
        "iceberg_table_config": {"table_uri": ic.get("table_uri", "")},
        "wal_config": dict(obj.get("wal_config") or {}),
    }
    _validate_config(out)
    return out


def _validate_config(cfg: dict[str, Any]) -> None:
    """Invariant append_only <=> row_identity none
    (config_utils.rs:54-62; table_config.rs:31-45)."""
    mc = cfg["mooncake_table_config"]
    is_none = mc["row_identity"].get("mode") == "none"
    if mc["append_only"] != is_none:
        raise MetadataStoreError(
            "persisted config invalid: append_only must equal (row_identity == none), "
            f"got append_only={mc['append_only']}, mode={mc['row_identity'].get('mode')}"
        )


# ---------------------------------------------------------------------------
# Entry + store
# ---------------------------------------------------------------------------


@dataclass
class TableMetadataEntry:
    """One row of the metadata table (base_metadata_store.rs:16-27)."""

    database: str
    table: str
    src_table_name: str
    src_table_uri: str
    config: dict[str, Any] = field(default_factory=dict)


class SqliteMetadataStore:
    """SQLite-backed metadata store (sqlite_metadata_store.rs parity).

    Thread-safe; every call opens a short-lived connection (the reference
    opens a pool per call too) so concurrent backends on the same warehouse
    interoperate through SQLite's own locking.
    """

    def __init__(self, location: str):
        # location may be a directory (new_with_directory) or a file path.
        if os.path.isdir(location) or location.endswith(os.sep):
            location = os.path.join(location, METADATA_DATABASE_FILENAME)
        parent = os.path.dirname(os.path.abspath(location))
        os.makedirs(parent, exist_ok=True)
        self.path = os.path.abspath(location)
        self._lock = threading.Lock()
        # sqlx requires the file to exist before access
        # (sqlite_metadata_store.rs create_database_file_if_non_existent);
        # sqlite3 creates it on first connect — touch for parity.
        with open(self.path, "a"):
            pass

    @contextmanager
    def _connect(self) -> Iterator[sqlite3.Connection]:
        """Short-lived connection per call (the reference pools per call
        too): commit on success, rollback on error, always closed."""
        conn = sqlite3.connect(self.path, timeout=30.0)
        try:
            conn.execute("PRAGMA busy_timeout = 30000")
            yield conn
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()

    # -- trait surface ------------------------------------------------------

    def metadata_table_exists(self) -> bool:
        with self._connect() as conn:
            return self._table_exists(conn)

    def get_all_table_metadata_entries(self) -> list[TableMetadataEntry]:
        """All entries, healthy rows first-class. A corrupt row (bad JSON or
        invariant-violating config) must not brick operations on every OTHER
        table, so bad rows are skipped here and surfaced via
        ``corrupt_entries()`` instead of raising."""
        with self._connect() as conn:
            if not self._table_exists(conn):
                return []
            rows = conn.execute(
                'SELECT "database", "table", src_table_name, src_table_uri, config '
                "FROM tables ORDER BY 1, 2"
            ).fetchall()
        out = []
        for database, table, src_name, src_uri, cfg in rows:
            entry = self._parse_row(database, table, src_name, src_uri, cfg)
            if entry is not None:
                out.append(entry)
        return out

    def get_table_metadata_entry(
        self, database: str, table: str
    ) -> TableMetadataEntry | None:
        """Keyed O(1) lookup on the composite primary key (the hot path for
        backend get/create/drop — avoids scanning and parsing every row)."""
        with self._connect() as conn:
            if not self._table_exists(conn):
                return None
            row = conn.execute(
                'SELECT "database", "table", src_table_name, src_table_uri, config '
                'FROM tables WHERE "database" = ? AND "table" = ?',
                (database, table),
            ).fetchone()
        if row is None:
            return None
        entry = self._parse_row(*row)
        if entry is None:
            raise MetadataStoreError(
                f"corrupt persisted config for {database}.{table}"
            )
        return entry

    def corrupt_entries(self) -> list[tuple[str, str]]:
        """(database, table) keys whose persisted row no longer parses —
        the operator-facing view of what get_all skipped."""
        with self._connect() as conn:
            if not self._table_exists(conn):
                return []
            rows = conn.execute(
                'SELECT "database", "table", src_table_name, src_table_uri, config '
                "FROM tables ORDER BY 1, 2"
            ).fetchall()
        return [
            (r[0], r[1]) for r in rows if self._parse_row(*r) is None
        ]

    @staticmethod
    def _parse_row(
        database: str, table: str, src_name: str, src_uri: str, cfg: str
    ) -> TableMetadataEntry | None:
        try:
            parsed = json.loads(cfg) if cfg else {}
            config = deserialize_table_config(parsed)
        except (
            json.JSONDecodeError,
            MetadataStoreError,
            TypeError,
            # e.g. "row_identity": null — a non-dict where the validator
            # calls .get(); a corrupt ROW must never brick listing the
            # healthy tables (the documented corruption-tolerance contract)
            AttributeError,
        ):
            return None
        return TableMetadataEntry(
            database=database,
            table=table,
            src_table_name=src_name,
            src_table_uri=src_uri or "",
            config=config,
        )

    @staticmethod
    def _table_exists(conn: sqlite3.Connection) -> bool:
        row = conn.execute(
            "SELECT name FROM sqlite_master WHERE type='table' AND name='tables'"
        ).fetchone()
        return row is not None

    def store_table_metadata(
        self,
        database: str,
        table: str,
        src_table_name: str,
        src_table_uri: str,
        config: dict[str, Any],
    ) -> None:
        """Insert one entry; the metadata table is created lazily on first
        store (sqlite_metadata_store.rs store_table_metadata). A duplicate
        (database, table) violates the primary key and raises."""
        _validate_config(config)
        serialized = json.dumps(config, sort_keys=True)
        with self._lock, self._connect() as conn:
            conn.executescript(_CREATE_TABLES_SQL)
            try:
                cur = conn.execute(
                    'INSERT INTO tables ("database", "table", src_table_name, '
                    "src_table_uri, config) VALUES (?, ?, ?, ?, ?)",
                    (database, table, src_table_name, src_table_uri, serialized),
                )
            except sqlite3.IntegrityError as e:
                raise MetadataStoreError(
                    f"table {database}.{table} already recorded"
                ) from e
            if cur.rowcount != 1:
                raise MetadataStoreError(
                    f"expected 1 row affected, but got {cur.rowcount}"
                )

    def delete_table_metadata(self, database: str, table: str) -> None:
        with self._lock, self._connect() as conn:
            cur = conn.execute(
                'DELETE FROM tables WHERE "database" = ? AND "table" = ?',
                (database, table),
            )
            if cur.rowcount != 1:
                raise MetadataStoreError(
                    f"expected 1 row affected, but got {cur.rowcount}"
                )


# ---------------------------------------------------------------------------
# Postgres-backed store (pg_metadata_store.rs parity, over the wire)
# ---------------------------------------------------------------------------

# Same relation as the reference's postgres/sql/create_tables.sql (JSON
# config column; SQLite-side the type name is accepted verbatim).
_PG_CREATE_TABLES_SQL = """
CREATE TABLE tables (
    "database" TEXT,
    "table" TEXT,
    src_table_name TEXT NOT NULL,
    src_table_uri TEXT,
    config JSON,
    PRIMARY KEY ("database", "table")
)
"""


class PgMetadataStore:
    """Metadata store speaking the PostgreSQL wire protocol as a client
    (parity ``src/moonlink_metadata_store/src/postgres/
    pg_metadata_store.rs`` + ``utils.rs``): the same ``tables`` relation,
    the same ``information_schema.tables`` existence probe, lazy CREATE
    on first store, BEGIN/COMMIT around mutations, and exactly-one-row
    affected guards. The deployment whose control plane lives in
    Postgres (the reference's primary story) points ``host/port`` at it;
    tests point at the in-process :class:`~moonlink_spark.pg_protocol.
    PgMockServer`, which serves genuine protocol bytes over SQLite.

    Semantics mirror :class:`SqliteMetadataStore` exactly — both stores
    pass one shared test matrix (tests/test_metadata_store.py)."""

    def __init__(
        self,
        host: str,
        port: int,
        user: str = "moonlink",
        database: str = "postgres",
        password: str | None = None,
        sslmode: str | None = None,
        ssl_ca_file: str | None = None,
    ):
        from moonlink_spark.pg_protocol import PgWireClient

        self._lock = threading.Lock()
        self._client = PgWireClient(
            host,
            port,
            user=user,
            database=database,
            password=password,
            sslmode=sslmode,
            ssl_ca_file=ssl_ca_file,
        )

    def close(self) -> None:
        self._client.close()

    # -- helpers ------------------------------------------------------------

    def _exists(self) -> bool:
        r = self._client.query(
            "SELECT 1 FROM information_schema.tables WHERE table_schema = "
            "'public' AND table_name = 'tables';"
        )
        return len(r.rows) > 0

    @staticmethod
    def _select(where: str = "") -> str:
        return (
            'SELECT t."database", t."table", t.src_table_name, '
            "t.src_table_uri, t.config FROM tables t" + where
        )

    # -- trait surface ------------------------------------------------------

    def metadata_table_exists(self) -> bool:
        with self._lock:
            return self._exists()

    def get_all_table_metadata_entries(self) -> list[TableMetadataEntry]:
        with self._lock:
            if not self._exists():
                return []
            r = self._client.query(self._select(" ORDER BY 1, 2"))
        out = []
        for row in r.rows:
            entry = SqliteMetadataStore._parse_row(*row)
            if entry is not None:
                out.append(entry)
        return out

    def get_table_metadata_entry(
        self, database: str, table: str
    ) -> TableMetadataEntry | None:
        with self._lock:
            if not self._exists():
                return None
            # extended protocol: values ride as bound parameters, never
            # inside the SQL string (tokio-postgres parity)
            r = self._client.query_params(
                self._select(' WHERE t."database" = $1 AND t."table" = $2'),
                [database, table],
            )
        if not r.rows:
            return None
        entry = SqliteMetadataStore._parse_row(*r.rows[0])
        if entry is None:
            raise MetadataStoreError(
                f"corrupt persisted config for {database}.{table}"
            )
        return entry

    def corrupt_entries(self) -> list[tuple[str, str]]:
        with self._lock:
            if not self._exists():
                return []
            r = self._client.query(self._select(" ORDER BY 1, 2"))
        return [
            (row[0], row[1])
            for row in r.rows
            if SqliteMetadataStore._parse_row(*row) is None
        ]

    def store_table_metadata(
        self,
        database: str,
        table: str,
        src_table_name: str,
        src_table_uri: str,
        config: dict[str, Any],
    ) -> None:
        from moonlink_spark.pg_protocol import PgServerError

        _validate_config(config)
        serialized = json.dumps(config, sort_keys=True)
        with self._lock:
            if not self._exists():
                try:
                    self._client.query(_PG_CREATE_TABLES_SQL)
                except PgServerError:
                    pass  # lost the create race to another backend: fine
            self._client.query("BEGIN")
            try:
                r = self._client.query_params(
                    'INSERT INTO tables ("database", "table", '
                    "src_table_name, src_table_uri, config) VALUES "
                    "($1, $2, $3, $4, $5)",
                    [database, table, src_table_name, src_table_uri,
                     serialized],
                )
                if r.rows_affected != 1:
                    raise MetadataStoreError(
                        f"expected 1 row affected, but got {r.rows_affected}"
                    )
                self._client.query("COMMIT")
            except PgServerError as e:
                self._client.query("ROLLBACK")
                if e.fields.get("C") == "23505":  # unique_violation
                    raise MetadataStoreError(
                        f"table {database}.{table} already recorded"
                    ) from e
                raise MetadataStoreError(str(e)) from e
            except MetadataStoreError:
                self._client.query("ROLLBACK")
                raise

    def delete_table_metadata(self, database: str, table: str) -> None:
        from moonlink_spark.pg_protocol import PgServerError

        with self._lock:
            self._client.query("BEGIN")
            try:
                r = self._client.query_params(
                    'DELETE FROM tables WHERE "database" = $1 '
                    'AND "table" = $2',
                    [database, table],
                )
                if r.rows_affected != 1:
                    raise MetadataStoreError(
                        f"expected 1 row affected, but got {r.rows_affected}"
                    )
                self._client.query("COMMIT")
            except PgServerError as e:
                self._client.query("ROLLBACK")
                raise MetadataStoreError(str(e)) from e
            except MetadataStoreError:
                self._client.query("ROLLBACK")
                raise
