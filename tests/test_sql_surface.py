"""SQL read surface over catalog tables (parity SURVEY §3.2: SQL handed to
an attached engine scanning moonlink tables at an LSN — here the engine is
Spark itself via ``MoonlinkBackend.sql`` and the service ``POST /sql``)."""

import json
import urllib.request

import pytest

from moonlink_spark.backend import MoonlinkBackend
from moonlink_spark.service import MoonlinkService
from moonlink_spark.table.identity import IdentityProp

USERS = [{"name": "id", "data_type": "int64"}, {"name": "nation", "data_type": "string"}]
ORDERS = [
    {"name": "oid", "data_type": "int64"},
    {"name": "uid", "data_type": "int64"},
    {"name": "amount", "data_type": "float64"},
]


@pytest.fixture()
def be(spark, tmp_path):
    be = MoonlinkBackend(spark, str(tmp_path / "wh"))
    be.create_table("db", "users", USERS, IdentityProp.single("id"))
    be.create_table("db", "orders", ORDERS, IdentityProp.single("oid"))
    u = be.get_table("db", "users")
    u.append_rows([{"id": 1, "nation": "FR"}, {"id": 2, "nation": "DE"}])
    u.commit(lsn=1)
    u.append_rows([{"id": 3, "nation": "FR"}])
    u.commit(lsn=2)
    o = be.get_table("db", "orders")
    o.append_rows(
        [
            {"oid": 10, "uid": 1, "amount": 5.0},
            {"oid": 11, "uid": 1, "amount": 7.0},
            {"oid": 12, "uid": 3, "amount": 9.0},
        ]
    )
    o.commit(lsn=1)
    return be


def test_sql_join_over_tables(be):
    rows = be.sql(
        """
        SELECT u.nation, CAST(SUM(o.amount) AS DOUBLE) AS total
        FROM users u JOIN orders o ON o.uid = u.id
        GROUP BY u.nation ORDER BY u.nation
        """,
        database="db",
    ).collect()
    assert [(r.nation, r.total) for r in rows] == [("FR", 21.0)]


def test_sql_time_travel_lsn(be):
    # at lsn=1 user 3 does not exist yet -> its order drops out of the join
    rows = be.sql(
        "SELECT COUNT(*) AS n FROM users", database="db", lsns={"users": 1}
    ).collect()
    assert rows[0].n == 2
    rows = be.sql(
        """
        SELECT CAST(SUM(o.amount) AS DOUBLE) AS total
        FROM users u JOIN orders o ON o.uid = u.id
        """,
        database="db",
        lsns={"db.users": 1},
    ).collect()
    assert rows[0].total == 12.0


def test_sql_qualified_view_names(be):
    # db-qualified <db>_<table> views work without the database param
    rows = be.sql("SELECT COUNT(*) AS n FROM db_orders").collect()
    assert rows[0].n == 3


def _req(svc, method, path, body=None):
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(
        f"http://127.0.0.1:{svc.port}{path}", data=data, method=method
    )
    if data:
        req.add_header("Content-Type", "application/json")
    try:
        with urllib.request.urlopen(req) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_service_sql_route(be):
    svc = MoonlinkService(be).start()
    try:
        code, out = _req(
            svc,
            "POST",
            "/sql",
            {
                "query": "SELECT nation, COUNT(*) AS n FROM users "
                "GROUP BY nation ORDER BY nation",
                "database": "db",
            },
        )
        assert code == 200
        assert out["rows"] == [{"nation": "DE", "n": 1}, {"nation": "FR", "n": 2}]
        # bad SQL surfaces as 400, not a hung connection
        code, out = _req(svc, "POST", "/sql", {"query": "SELECT * FROM nope"})
        assert code == 400
    finally:
        svc.stop()
