"""Iceberg REST catalog stub: exported tables become discoverable via the
standard catalog API (parity: storage/table/iceberg/rest_catalog.rs:22)."""

import os

import pytest

from moonlink_spark.table.iceberg_export import (
    export_iceberg,
    read_iceberg_live_files,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.rest_catalog import (
    IcebergRestCatalogServer,
    RestCatalogClient,
    register_export,
)
from moonlink_spark.table.table import MoonlinkTable


@pytest.fixture()
def catalog(tmp_path):
    srv = IcebergRestCatalogServer(str(tmp_path / "catalog")).start()
    yield srv
    srv.stop()


def test_catalog_api_basics(catalog):
    c = RestCatalogClient(f"http://127.0.0.1:{catalog.port}")
    assert c._req("GET", "/v1/config")[0] == 200
    assert c.create_namespace("analytics")[0] == 200
    code, out = c._req("GET", "/v1/namespaces")
    assert code == 200 and ["analytics"] in out["namespaces"]
    # unknown namespace / table -> 404
    assert c.list_tables("nope")[0] == 404
    assert c.load_table("analytics", "missing")[0] == 404
    # registering a nonexistent metadata file is rejected
    assert c.register_table("analytics", "bad", "/no/such/file.json")[0] == 400


def test_create_export_register_list_scan(spark, tmp_path, catalog):
    """The VERDICT flow: create -> export -> register -> list -> load ->
    scan via the catalog's metadata-location only."""
    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "src"),
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "v", "data_type": "string"},
        ],
        IdentityProp.single("id"),
    )
    t.append_rows([{"id": i, "v": f"v{i}"} for i in range(50)])
    t.commit(lsn=1)
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    url = f"http://127.0.0.1:{catalog.port}"
    register_export(url, "analytics", "events_t", dest)

    c = RestCatalogClient(url)
    code, out = c.list_tables("analytics")
    assert code == 200
    assert {"namespace": ["analytics"], "name": "events_t"} in out["identifiers"]

    code, loaded = c.load_table("analytics", "events_t")
    assert code == 200
    assert loaded["metadata"]["current-snapshot-id"] == 1
    # scan THROUGH the catalog answer: metadata-location -> live files
    loc = loaded["metadata-location"]
    table_root = os.path.dirname(os.path.dirname(loc))
    files = read_iceberg_live_files(table_root)
    got = spark.read.parquet(*files).count()
    assert got == 50

    # re-export + re-register updates the metadata-location version
    t.append_rows([{"id": 100, "v": "new"}])
    t.commit(lsn=2)
    export_iceberg(t, dest)
    register_export(url, "analytics", "events_t", dest)
    _, loaded2 = c.load_table("analytics", "events_t")
    assert loaded2["metadata-location"].endswith("v2.metadata.json")
    assert loaded2["metadata"]["last-sequence-number"] == 2

    # drop removes only the catalog entry
    assert c.drop_table("analytics", "events_t")[0] == 204
    assert c.load_table("analytics", "events_t")[0] == 404
    assert os.path.exists(loc)


def test_catalog_state_survives_restart(tmp_path, catalog):
    c = RestCatalogClient(f"http://127.0.0.1:{catalog.port}")
    c.create_namespace("ns1")
    meta = tmp_path / "m.json"
    meta.write_text("{}")
    assert c.register_table("ns1", "t1", str(meta))[0] == 200
    catalog.stop()

    srv2 = IcebergRestCatalogServer(
        os.path.dirname(catalog.state_path)
    ).start()
    try:
        c2 = RestCatalogClient(f"http://127.0.0.1:{srv2.port}")
        code, out = c2.list_tables("ns1")
        assert code == 200 and out["identifiers"][0]["name"] == "t1"
    finally:
        srv2.stop()
