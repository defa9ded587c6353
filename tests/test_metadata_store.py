"""SQLite metadata store (parity src/moonlink_metadata_store): the trait
surface over the same `tables` relation, config round-trip with
defaults-on-missing, and backend recovery from a restarted store
(sqlite/tests.rs scenarios re-expressed)."""

import json
import sqlite3
import threading

import pytest
from pyspark.sql import types as T

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.errors import TableConfigError
from moonlink_spark.metadata_store import (
    MetadataStoreError,
    SqliteMetadataStore,
    deserialize_table_config,
    serialize_table_config,
)
from moonlink_spark.table.identity import IdentityProp

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("name", T.StringType(), True),
    ]
)


def _cfg(mode="single", cols=("id",), append_only=False, **kw):
    return serialize_table_config(
        {"mode": mode, "columns": list(cols)}, append_only, **kw
    )


# -- store trait surface (sqlite/tests.rs parity) ---------------------------


def test_store_and_get_all_entries(tmp_path):
    st = SqliteMetadataStore(str(tmp_path))
    assert not st.metadata_table_exists()
    assert st.get_all_table_metadata_entries() == []

    st.store_table_metadata("db", "users", "public.users", "pg://x", _cfg())
    assert st.metadata_table_exists()
    entries = st.get_all_table_metadata_entries()
    assert len(entries) == 1
    e = entries[0]
    assert (e.database, e.table) == ("db", "users")
    assert e.src_table_name == "public.users"
    assert e.src_table_uri == "pg://x"
    mc = e.config["mooncake_table_config"]
    assert mc["row_identity"] == {"mode": "single", "columns": ["id"]}
    assert mc["append_only"] is False


def test_duplicate_store_rejected(tmp_path):
    st = SqliteMetadataStore(str(tmp_path))
    st.store_table_metadata("db", "t", "s", "u", _cfg())
    with pytest.raises(MetadataStoreError):
        st.store_table_metadata("db", "t", "s2", "u2", _cfg())
    # same table name under a different database is fine (composite PK)
    st.store_table_metadata("db2", "t", "s", "u", _cfg())
    assert len(st.get_all_table_metadata_entries()) == 2


def test_delete_requires_existing_row(tmp_path):
    st = SqliteMetadataStore(str(tmp_path))
    st.store_table_metadata("db", "t", "s", "u", _cfg())
    st.delete_table_metadata("db", "t")
    assert st.get_all_table_metadata_entries() == []
    with pytest.raises(MetadataStoreError):
        st.delete_table_metadata("db", "t")


def test_store_survives_reopen(tmp_path):
    SqliteMetadataStore(str(tmp_path)).store_table_metadata(
        "db", "t", "s", "u", _cfg()
    )
    st2 = SqliteMetadataStore(str(tmp_path))
    assert [e.table for e in st2.get_all_table_metadata_entries()] == ["t"]


def test_sqlite_relation_shape_matches_reference(tmp_path):
    """The persisted relation is the reference's create_tables.sql shape:
    quoted database/table columns, composite PK, config as JSON text."""
    st = SqliteMetadataStore(str(tmp_path))
    st.store_table_metadata("db", "t", "s", "u", _cfg())
    conn = sqlite3.connect(st.path)
    cols = [r[1] for r in conn.execute("PRAGMA table_info(tables)")]
    assert cols == ["database", "table", "src_table_name", "src_table_uri", "config"]
    pk = [r[1] for r in conn.execute("PRAGMA table_info(tables)") if r[5] > 0]
    assert pk == ["database", "table"]
    raw = conn.execute("SELECT config FROM tables").fetchone()[0]
    assert json.loads(raw)["mooncake_table_config"]["append_only"] is False
    conn.close()


# -- config round-trip (config_utils.rs parity) -----------------------------


def test_config_defaults_on_missing_fields():
    # empty persisted config hydrates to the valid default: append-only/none
    cfg = deserialize_table_config({})
    mc = cfg["mooncake_table_config"]
    assert mc["append_only"] is True
    assert mc["row_identity"]["mode"] == "none"
    # unknown fields are ignored (forward compatibility)
    cfg2 = deserialize_table_config(
        {"mooncake_table_config": {"future_knob": 7}, "new_top_level": {}}
    )
    assert "future_knob" not in cfg2["mooncake_table_config"]


def test_config_invariant_enforced():
    with pytest.raises(MetadataStoreError):
        serialize_table_config({"mode": "none", "columns": []}, append_only=False)
    with pytest.raises(MetadataStoreError):
        deserialize_table_config(
            {
                "mooncake_table_config": {
                    "append_only": True,
                    "row_identity": {"mode": "single", "columns": ["id"]},
                }
            }
        )


def test_config_roundtrip_preserves_identity_and_uri():
    cfg = serialize_table_config(
        {"mode": "keys", "columns": ["a", "b"]},
        False,
        properties={"k": "v"},
        table_uri="/wh/db/t",
    )
    back = deserialize_table_config(json.loads(json.dumps(cfg)))
    assert back == cfg
    assert back["iceberg_table_config"]["table_uri"] == "/wh/db/t"


def test_concurrent_stores_serialize(tmp_path):
    st = SqliteMetadataStore(str(tmp_path))
    errs = []

    def put(i):
        try:
            st.store_table_metadata("db", f"t{i}", "s", "u", _cfg())
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=put, args=(i,)) for i in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs
    assert len(st.get_all_table_metadata_entries()) == 8


# -- backend integration + recovery -----------------------------------------


def test_backend_sqlite_lifecycle_and_recovery(spark, tmp_path):
    wh = str(tmp_path / "wh")
    be = MoonlinkBackend(spark, wh, metadata_store="sqlite")
    t = be.create_table("db", "users", SCHEMA, IdentityProp.single("id"))
    t.append_rows([{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])
    t.commit(lsn=10)
    assert be.list_tables() == ["db.users"]
    with pytest.raises(TableConfigError):
        be.create_table("db", "users", SCHEMA, IdentityProp.single("id"))

    # a fresh backend over the same warehouse recovers the table from the
    # sqlite store (reference recovery: get_all_table_metadata_entries)
    be2 = MoonlinkBackend(spark, wh, metadata_store="sqlite")
    assert be2.list_tables() == ["db.users"]
    t2 = be2.get_table("db", "users")
    assert t2.identity == IdentityProp.single("id")
    assert t2.scan().count() == 2

    be2.drop_table("db", "users")
    assert be2.list_tables() == []
    # drop of an unknown table is a no-op at the backend level
    be2.drop_table("db", "users")
    with pytest.raises(TableConfigError):
        be2.get_table("db", "users")


# -- thin backend API-parity delegators --------------------------------------


def test_backend_api_delegators(spark, tmp_path):
    wh = str(tmp_path / "wh2")
    be = MoonlinkBackend(spark, wh)
    t = be.create_table("db", "t", SCHEMA, IdentityProp.single("id"))
    assert be.get_base_path() == be.warehouse
    assert be.get_table_schema("db", "t").fieldNames() == ["id", "name"]
    v = be.set_avro_schema("db", "t", '{"type": "record", "name": "r", "fields": []}')
    assert v >= 1
    assert be.get_table("db", "t").manifest.properties["avro_schema"]["name"] == "r"
    t.append_rows([{"id": 1, "name": "a"}])
    committed = t.commit(lsn=50)
    be.wait_for_wal_flush("db", "t", 50)  # returns immediately: lsn durable
    assert committed >= 2


# -- robustness fixes from review --------------------------------------------


def test_corrupt_row_does_not_brick_other_tables(tmp_path):
    st = SqliteMetadataStore(str(tmp_path))
    st.store_table_metadata("db", "good", "s", "u", _cfg())
    # corrupt a second row behind the API's back
    st.store_table_metadata("db", "bad", "s", "u", _cfg())
    conn = sqlite3.connect(st.path)
    conn.execute('UPDATE tables SET config = \'{"not json\' WHERE "table" = \'bad\'')
    conn.commit()
    conn.close()
    # healthy table still fully operable
    assert [e.table for e in st.get_all_table_metadata_entries()] == ["good"]
    assert st.get_table_metadata_entry("db", "good").table == "good"
    # corrupt row is surfaced, keyed lookup raises for it specifically
    assert st.corrupt_entries() == [("db", "bad")]
    with pytest.raises(MetadataStoreError):
        st.get_table_metadata_entry("db", "bad")
    # and it can still be deleted to repair the store
    st.delete_table_metadata("db", "bad")
    assert st.corrupt_entries() == []


def test_keyed_lookup(tmp_path):
    st = SqliteMetadataStore(str(tmp_path))
    assert st.get_table_metadata_entry("db", "t") is None
    st.store_table_metadata("db", "t", "s", "u", _cfg())
    e = st.get_table_metadata_entry("db", "t")
    assert (e.database, e.table) == ("db", "t")
    assert st.get_table_metadata_entry("db", "absent") is None


def test_backend_drop_of_corrupt_row_repairs(spark, tmp_path):
    wh = str(tmp_path / "wh3")
    be = MoonlinkBackend(spark, wh, metadata_store="sqlite")
    be.create_table("db", "x", SCHEMA, IdentityProp.single("id"))
    conn = sqlite3.connect(be._meta_store.path)
    conn.execute("UPDATE tables SET config = 'garbage'")
    conn.commit()
    conn.close()
    # list skips the corrupt row; drop removes it without raising
    assert be.list_tables() == []
    be.drop_table("db", "x")
    assert be._meta_store.corrupt_entries() == []
    # the name is creatable again (no orphan wedge: drop removed the row;
    # the old directory is recreated over by create)
