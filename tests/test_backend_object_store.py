"""MoonlinkBackend over an object-store warehouse.

The reference backend sits on the accessor seam, so its warehouse can
be an S3/GCS bucket (``accessor_config.rs``). Ours: a ``scheme://``
warehouse routes the catalog and every table's control plane through
``table.fs.fs_for`` while parquet data stages under
``data_staging_dir``. The regression these tests pin: a URI warehouse
must never silently materialize a LOCAL directory named after the URI
(``os.makedirs("s3v:/bucket/wh")``), which is what happened before the
backend learned the seam.
"""

import os

import pytest

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.errors import TableConfigError
from moonlink_spark.table.fs import register_fs_scheme
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.s3 import S3HttpFS, S3MemServer

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "v", "data_type": "string"},
]


@pytest.fixture()
def s3wh():
    srv = S3MemServer(credentials={"AK": "SK"}).start()
    scheme = f"s3bk{srv.port}"
    register_fs_scheme(
        scheme,
        lambda path, _e=srv.endpoint: S3HttpFS(
            _e, retries=6, access_key="AK", secret_key="SK"
        ),
    )
    yield srv, f"{scheme}://bucket/wh"
    srv.stop()


def test_remote_warehouse_requires_staging_dir(spark, s3wh):
    _, wh = s3wh
    with pytest.raises(TableConfigError, match="data_staging_dir"):
        MoonlinkBackend(spark, wh)


def test_unregistered_scheme_fails_loudly(spark, tmp_path):
    with pytest.raises(TableConfigError, match="registered"):
        MoonlinkBackend(
            spark, "nosuch://bucket/wh", data_staging_dir=str(tmp_path)
        )
    # and, critically, no local directory named after the URI appeared
    assert not os.path.exists("nosuch:")


def test_remote_warehouse_rejects_sqlite_store(spark, s3wh, tmp_path):
    _, wh = s3wh
    with pytest.raises(TableConfigError, match="sqlite"):
        MoonlinkBackend(
            spark,
            wh,
            metadata_store="sqlite",
            data_staging_dir=str(tmp_path),
        )


def test_backend_lifecycle_over_s3_control_plane(spark, s3wh, tmp_path):
    srv, wh = s3wh
    be = MoonlinkBackend(spark, wh, data_staging_dir=str(tmp_path / "stage"))
    t = be.create_table("db", "t", FIELDS, IdentityProp.single("id"))
    t.append_rows([{"id": i, "v": f"v{i}"} for i in range(500)])
    t.commit(lsn=10)
    t.upsert_rows([{"id": i, "v": "UP"} for i in range(0, 500, 3)])
    t.delete_rows([{"id": i} for i in range(0, 500, 7)])
    t.commit(lsn=20)

    # the control plane actually lives in the bucket
    assert srv.store.keys_with_prefix("bucket/wh/db/t"), "no manifests in S3"
    assert srv.connections > 0

    assert be.scan_table("db", "t", lsn=10).count() == 500
    expected = 500 - len(range(0, 500, 7))
    assert be.scan_table("db", "t", lsn=20).count() == expected

    # a RESTARTED backend recovers the catalog from the bucket
    be2 = MoonlinkBackend(spark, wh, data_staging_dir=str(tmp_path / "stage"))
    assert be2.list_tables() == ["db.t"]
    assert be2.scan_table("db", "t").count() == expected

    # drop cleans BOTH planes
    be2.drop_table("db", "t")
    assert not srv.store.keys_with_prefix("bucket/wh/db/t")
    assert be2.list_tables() == []
