"""The bucketed warehouse's write-once contract (VERDICT r7 #5):
``ensure_bucketed_warehouse`` pays the bucketing shuffle exactly once
per (sf_dir, source mtime) — repeat calls adopt the existing files
without rewriting a byte, a fresh catalog re-registers over them, and a
re-stamped source invalidates the cache."""

import os

from moonlink_spark.operators.relational import ensure_bucketed_warehouse


def _file_states(wh: str) -> dict[str, tuple[int, int]]:
    out = {}
    for root, _dirs, files in os.walk(wh):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out[p] = (st.st_mtime_ns, st.st_size)
    return out


def test_second_call_reuses_without_rewrite(spark, sf_dir):
    wh = ensure_bucketed_warehouse(spark, sf_dir)
    assert os.path.exists(os.path.join(wh, "_BUCKETS_READY"))
    before = _file_states(wh)
    assert any("orders_b" in p for p in before)

    wh2 = ensure_bucketed_warehouse(spark, sf_dir)
    assert wh2 == wh
    assert _file_states(wh) == before, "repeat call rewrote bucketed files"

    # the re-registered tables serve the join and the point read
    n = (
        spark.table("mls_orders_bucketed")
        .join(
            spark.table("mls_lineitem_bucketed"),
            spark.table("mls_orders_bucketed").o_orderkey
            == spark.table("mls_lineitem_bucketed").l_orderkey,
        )
        .count()
    )
    assert n > 0
    assert _file_states(wh) == before


def test_fresh_catalog_reregisters_over_existing_files(spark, sf_dir):
    wh = ensure_bucketed_warehouse(spark, sf_dir)
    before = _file_states(wh)
    spark.sql("DROP TABLE IF EXISTS mls_orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS mls_lineitem_bucketed")
    ensure_bucketed_warehouse(spark, sf_dir)
    assert spark.catalog.tableExists("mls_orders_bucketed")
    assert spark.catalog.tableExists("mls_lineitem_bucketed")
    assert _file_states(wh) == before, "re-register rewrote bucketed files"
    # bucketed layout survives the re-register: DESCRIBE shows buckets
    detail = spark.sql("DESCRIBE EXTENDED mls_lineitem_bucketed").collect()
    text = "\n".join(f"{r[0]} {r[1]}" for r in detail)
    assert "8" in text and "l_orderkey" in text


def test_half_registered_catalog_is_repaired(spark, sf_dir):
    """ADVICE r8: the registered-location check must validate BOTH
    tables — a catalog with only one of the pair (or one pointing at
    another warehouse) is repaired, not trusted."""
    wh = ensure_bucketed_warehouse(spark, sf_dir)
    spark.sql("DROP TABLE IF EXISTS mls_lineitem_bucketed")
    ensure_bucketed_warehouse(spark, sf_dir)
    for tbl in ("mls_orders_bucketed", "mls_lineitem_bucketed"):
        assert spark.catalog.tableExists(tbl)
        loc = [
            r[1]
            for r in spark.sql(f"DESCRIBE FORMATTED {tbl}").collect()
            if r[0] == "Location"
        ][0]
        assert wh in loc
    assert spark.table("mls_lineitem_bucketed").count() > 0


def test_nonrace_rename_failure_raises_not_empty_tables(
    spark, tmp_path, monkeypatch
):
    """ADVICE r8: a rename failure with NO winner in place (permissions,
    EXDEV — not a lost publish race) must raise, because registering
    catalog tables at the missing location would create an empty
    directory and silently serve zero rows."""
    import shutil

    import pytest

    src = "/root/testdata/sf0.001"
    alt = tmp_path / "sfcopy"
    alt.mkdir()
    for f in ("orders.parquet", "lineitem.parquet"):
        shutil.copy(os.path.join(src, f), alt / f)

    real_rename = os.rename

    def failing_rename(a, b, *args, **kw):
        if "moonlink-buckets-" in str(b):
            raise PermissionError(1, "Operation not permitted")
        return real_rename(a, b, *args, **kw)

    monkeypatch.setattr(os, "rename", failing_rename)
    with pytest.raises(OSError):
        ensure_bucketed_warehouse(spark, str(alt))
    monkeypatch.undo()
    # with the failure gone, the same sf_dir builds and serves normally
    ensure_bucketed_warehouse(spark, str(alt))
    assert spark.table("mls_lineitem_bucketed").count() > 0


def test_switching_sf_dirs_reregisters_location(spark):
    """Review finding (r8): with warehouses for two sf_dirs both built,
    a session that ran queries at one sf_dir must NOT serve the other
    sf_dir's query from the stale catalog registration — the location
    check re-registers whenever the catalog points outside the active
    warehouse."""
    wh_a = ensure_bucketed_warehouse(spark, "/root/testdata/sf0.001")
    loc_a = [
        r[1]
        for r in spark.sql("DESCRIBE FORMATTED mls_lineitem_bucketed").collect()
        if r[0] == "Location"
    ][0]
    assert wh_a in loc_a
    wh_b = ensure_bucketed_warehouse(spark, "/root/testdata/sf0.01")
    assert wh_b != wh_a
    loc_b = [
        r[1]
        for r in spark.sql("DESCRIBE FORMATTED mls_lineitem_bucketed").collect()
        if r[0] == "Location"
    ][0]
    assert wh_b in loc_b, f"stale registration kept: {loc_b}"
    # and the row counts follow the active sf_dir
    n_b = spark.table("mls_lineitem_bucketed").count()
    ensure_bucketed_warehouse(spark, "/root/testdata/sf0.001")
    n_a = spark.table("mls_lineitem_bucketed").count()
    assert n_b > n_a > 0
