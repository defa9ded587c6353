"""Materialized views: every refresh must land the view EXACTLY on the
direct GROUP BY of the table's current snapshot — across inserts, updates
that migrate rows between groups, deletes, and mixed batches — while only
ever scanning the base table once (at create).
"""

import pytest

from moonlink_spark.errors import TableConfigError
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.matview import MaterializedView
from moonlink_spark.table.table import MoonlinkTable

SCHEMA = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "grp", "data_type": "string"},
    {"name": "val", "data_type": "float64"},
]


def make_table(spark, tmp_path):
    t = MoonlinkTable.create(
        spark, str(tmp_path / "src"), SCHEMA, IdentityProp.single("id")
    )
    t.append_rows(
        [{"id": i, "grp": f"g{i % 4}", "val": float(i)} for i in range(100)]
    )
    t.commit(lsn=1)
    return t


def view_rows(mv):
    return {
        r.grp: (r.n_rows, float(r.sum_val))
        for r in mv.read().collect()
    }


def direct_rows(t):
    from pyspark.sql import functions as F

    agg = (
        t.scan()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("val").cast("decimal(25,6)")).alias("s"),
        )
    )
    return {r.grp: (r.n, float(r.s)) for r in agg.collect()}


def test_create_matches_direct_aggregate(spark, tmp_path):
    t = make_table(spark, tmp_path)
    mv = MaterializedView.create(t, str(tmp_path / "mv"), ["grp"], sums=["val"])
    assert view_rows(mv) == direct_rows(t)


def test_refresh_after_inserts_updates_deletes(spark, tmp_path):
    t = make_table(spark, tmp_path)
    mv = MaterializedView.create(t, str(tmp_path / "mv"), ["grp"], sums=["val"])

    # inserts into an existing and a brand-new group
    t.append_rows([{"id": 200, "grp": "g0", "val": 7.5},
                   {"id": 201, "grp": "brand_new", "val": 1.0}])
    t.commit(lsn=2)
    s = mv.refresh()
    assert s["refreshed"] and s["changed_rows"] > 0
    assert view_rows(mv) == direct_rows(t)

    # updates that MIGRATE rows across groups (the delta-algebra case)
    t.upsert_rows([{"id": i, "grp": "migrated", "val": float(i) + 0.25}
                   for i in range(0, 40, 4)])
    t.commit(lsn=3)
    mv.refresh()
    assert view_rows(mv) == direct_rows(t)

    # deletes, including one that empties a group
    t.delete_rows([{"id": 201}])
    t.delete_rows([{"id": i} for i in range(50, 60)])
    t.commit(lsn=4)
    mv.refresh()
    rows = view_rows(mv)
    assert rows == direct_rows(t)
    assert "brand_new" not in rows  # emptied group disappears from read()


def test_noop_refresh_and_idempotence(spark, tmp_path):
    t = make_table(spark, tmp_path)
    mv = MaterializedView.create(t, str(tmp_path / "mv"), ["grp"], sums=["val"])
    s = mv.refresh()
    assert s == {"refreshed": False, "lsn": 1, "changed_rows": 0}
    # identical re-upsert: keys change LSN but values are identical ->
    # value-wise diff is empty, version must not advance
    t.upsert_rows([{"id": i, "grp": f"g{i % 4}", "val": float(i)}
                   for i in range(10)])
    t.commit(lsn=2)
    s = mv.refresh()
    assert s["refreshed"] and s["changed_rows"] == 0
    assert mv.state["version"] == 0
    assert view_rows(mv) == direct_rows(t)


def test_reopen_from_disk_and_avg(spark, tmp_path):
    t = make_table(spark, tmp_path)
    MaterializedView.create(t, str(tmp_path / "mv"), ["grp"], sums=["val"])
    t.append_rows([{"id": 300, "grp": "g1", "val": 10.0}])
    t.commit(lsn=2)

    mv = MaterializedView(t, str(tmp_path / "mv"))  # fresh handle from disk
    mv.refresh()
    assert view_rows(mv) == direct_rows(t)
    avg = {r.grp: r.avg_val for r in mv.read_avg("val").collect()}
    direct = direct_rows(t)
    for g, (n, s) in direct.items():
        assert avg[g] == pytest.approx(s / n)


def test_requires_key_identity(spark, tmp_path):
    t = MoonlinkTable.create(
        spark, str(tmp_path / "fr"), SCHEMA, IdentityProp.full_row()
    )
    with pytest.raises(TableConfigError):
        MaterializedView.create(t, str(tmp_path / "mv"), ["grp"], sums=["val"])


def test_refresh_survives_vacuumed_snapshot(spark, tmp_path):
    """If vacuum retention is shorter than the view's refresh lag, the
    pinned snapshot disappears — refresh must fall back to a full
    recompute (correct, flagged) instead of failing."""
    from moonlink_spark.table.maintenance import vacuum

    t = make_table(spark, tmp_path)
    mv = MaterializedView.create(t, str(tmp_path / "mv"), ["grp"], sums=["val"])

    t.upsert_rows([{"id": i, "grp": "moved", "val": 1.0} for i in range(10)])
    t.commit(lsn=2)
    t.delete_rows([{"id": i} for i in range(90, 95)])
    t.commit(lsn=3)
    vacuum(t, keep_versions=1)  # drops the lsn=1 snapshot the view pins

    s = mv.refresh()
    assert s["refreshed"] and s.get("full_recompute") is True
    assert view_rows(mv) == direct_rows(t)

    # subsequent refreshes are incremental again
    t.append_rows([{"id": 500, "grp": "g0", "val": 5.0}])
    t.commit(lsn=4)
    s2 = mv.refresh()
    assert s2["refreshed"] and "full_recompute" not in s2
    assert view_rows(mv) == direct_rows(t)


def test_change_data_feed(spark, tmp_path):
    """table.changes(a, b): value-wise insert/update/delete classification
    with before/after images; no-op re-upserts are not changes."""
    t = make_table(spark, tmp_path)  # lsn=1: ids 0..99

    t.upsert_rows([{"id": 5, "grp": "g1", "val": 5.0}])  # identical: no-op
    t.upsert_rows([{"id": 7, "grp": "CHANGED", "val": 7.75}])
    t.append_rows([{"id": 300, "grp": "new", "val": 3.0}])
    t.delete_rows([{"id": 9}])
    t.commit(lsn=2)

    ch = {r.id: r for r in t.changes(1, 2).collect()}
    assert set(ch) == {7, 300, 9}
    assert ch[7]._change_type == "update"
    assert ch[7].before.grp == "g3" and ch[7].after.grp == "CHANGED"
    assert ch[300]._change_type == "insert" and ch[300].before is None
    assert ch[300].after.val == 3.0
    assert ch[9]._change_type == "delete" and ch[9].after is None
    assert ch[9].before.val == 9.0

    # full-row identity is rejected
    fr = MoonlinkTable.create(
        spark, str(tmp_path / "fr2"), SCHEMA, IdentityProp.full_row()
    )
    with pytest.raises(TableConfigError):
        fr.changes(0)


def test_streaming_maintained_view(spark, tmp_path):
    """refresh_views= chains matview maintenance into every micro-batch:
    after the stream drains, the view equals the direct aggregate without
    ever being refreshed by hand."""
    import json as _json
    import os as _os

    from moonlink_spark.streaming.pipeline import StreamingIngestor

    t = make_table(spark, tmp_path)
    mv = MaterializedView.create(t, str(tmp_path / "smv"), ["grp"], sums=["val"])

    spool = str(tmp_path / "spool")
    _os.makedirs(spool)

    def emit(name, events):
        with open(_os.path.join(spool, name), "w") as fh:
            for e in events:
                fh.write(_json.dumps(e) + "\n")

    emit("b1.jsonl", [
        {"op": "upsert", "lsn": 101, "row": {"id": 0, "grp": "moved", "val": 0.5}},
        {"op": "upsert", "lsn": 102, "row": {"id": 400, "grp": "g0", "val": 4.0}},
    ])
    emit("b2.jsonl", [
        {"op": "delete", "lsn": 103, "row": {"id": 50}},
    ])
    ing = StreamingIngestor(
        t, spool, str(tmp_path / "ckpt"), refresh_views=[mv]
    )
    ing.run_available()
    assert view_rows(mv) == direct_rows(t)
    assert mv.state["lsn"] == t.last_lsn


def minmax_rows(mv):
    return {
        r.grp: (r.n_rows, float(r.min_val), float(r.max_val))
        for r in mv.read().collect()
    }


def direct_minmax(t):
    from pyspark.sql import functions as F

    agg = (
        t.scan()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("val").alias("lo"),
            F.max("val").alias("hi"),
        )
    )
    return {r.grp: (r.n, float(r.lo), float(r.hi)) for r in agg.collect()}


def test_minmax_insert_only_is_incremental(spark, tmp_path):
    """Inserts maintain MIN/MAX via least/greatest — zero recomputed
    groups flagged, and the view lands exactly on the direct aggregate
    (including a new group and a new global max)."""
    t = make_table(spark, tmp_path)
    mv = MaterializedView.create(
        t, str(tmp_path / "mv"), ["grp"], mins=["val"], maxs=["val"]
    )
    assert minmax_rows(mv) == direct_minmax(t)
    t.append_rows(
        [
            {"id": 200, "grp": "g0", "val": 999.0},   # new max for g0
            {"id": 201, "grp": "g0", "val": -5.0},    # new min for g0
            {"id": 202, "grp": "gNEW", "val": 7.0},   # brand-new group
        ]
    )
    t.commit(lsn=2)
    summary = mv.refresh()
    assert summary["refreshed"] is True
    assert summary["minmax_recompute_groups"] == 0  # insert-only: free
    assert minmax_rows(mv) == direct_minmax(t)


def test_minmax_under_delete_recomputes_only_hit_groups(spark, tmp_path):
    """The documented algebra boundary: deleting a group's extremum
    cannot be maintained incrementally — refresh recomputes min/max for
    exactly the groups that lost rows (flagged in the summary) and
    leaves every other group on the incremental path."""
    t = make_table(spark, tmp_path)
    mv = MaterializedView.create(
        t, str(tmp_path / "mv"), ["grp"], sums=["val"], mins=["val"], maxs=["val"]
    )
    # delete g0's current max (96) and min (0); g1-g3 untouched by
    # deletes, g1 gets an insert (stays incremental)
    t.delete_rows([{"id": 96}, {"id": 0}])
    t.append_rows([{"id": 300, "grp": "g1", "val": 50.5}])
    t.commit(lsn=2)
    summary = mv.refresh()
    assert summary["minmax_recompute_groups"] == 1  # only g0
    assert minmax_rows(mv) == direct_minmax(t)
    # update that migrates a row ACROSS groups: source group lost a row
    # -> recompute; destination group only gained -> incremental
    t.upsert_rows([{"id": 97, "grp": "g3", "val": 97.0}])  # was g1
    t.commit(lsn=3)
    summary = mv.refresh()
    assert summary["minmax_recompute_groups"] == 1  # only g1
    assert minmax_rows(mv) == direct_minmax(t)


def test_join_views_rejected_with_clear_error(spark, tmp_path):
    """JOIN views are out of scope by construction: anything that is not
    a single MoonlinkTable base fails loud with the materialize-the-join
    guidance, never a silent wrong view."""
    t = make_table(spark, tmp_path)
    joined_df = t.scan().join(t.scan().select("id", "val"), "id")
    with pytest.raises(TableConfigError, match="join"):
        MaterializedView.create(
            joined_df, str(tmp_path / "mv"), ["grp"], sums=["val"]
        )


def test_minmax_emptied_group_revival(spark, tmp_path):
    """A group emptied by deletes must NULL its stored extrema — the
    recompute semi-join has no row to overwrite with, and a stale
    min/max would poison least/greatest when later inserts revive the
    group (the revived min would stick at the dead group's value)."""
    t = make_table(spark, tmp_path)
    mv = MaterializedView.create(
        t, str(tmp_path / "mv"), ["grp"], mins=["val"], maxs=["val"]
    )
    # empty g0 entirely (ids 0,4,8,...,96 are g0; min val 0.0)
    t.delete_rows([{"id": i} for i in range(0, 100, 4)])
    t.commit(lsn=2)
    mv.refresh()
    assert "g0" not in minmax_rows(mv)  # no live rows -> not served
    # revive g0 with values far above the dead min and below the dead max
    t.append_rows([{"id": 500, "grp": "g0", "val": 50.0}])
    t.commit(lsn=3)
    s = mv.refresh()
    assert s["minmax_recompute_groups"] == 0  # insert-only revival
    got = minmax_rows(mv)
    assert got["g0"] == (1, 50.0, 50.0), got["g0"]  # NOT (1, 0.0, 96.0)
    assert minmax_rows(mv) == direct_minmax(t)
