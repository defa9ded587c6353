"""as-of join unit semantics (the gate query asof_join_purchase_click
pins DuckDB parity at scale; these pin the edges its data never hits)."""

from pyspark.sql import functions as F

from moonlink_spark.functions.asof import asof_join


def _sides(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (2, 10, "c")],
        "k int, lt int, lv string",
    )
    right = spark.createDataFrame(
        [(1, 5, "r5"), (1, 15, None), (2, 50, "late")],
        "k int, rt int, rv string",
    )
    return left, right


def test_null_valued_match_stays_null(spark):
    """Review finding (r9): a matched right row whose VALUE is NULL must
    yield NULL — bare last(v, ignorenulls) skipped it and leaked the
    previous (older) right row's value."""
    left, right = _sides(spark)
    out = {
        (r.k, r.lt): r.rv
        for r in asof_join(
            left, right, ["k"], "lt", "rt", ["rv"], strict=True
        ).collect()
    }
    assert out[(1, 10)] == "r5"   # nearest earlier match
    assert out[(1, 20)] is None   # matched rt=15 whose value IS null
    assert out[(2, 10)] is None   # no earlier right row at all


def test_inner_keeps_null_valued_matches_drops_unmatched(spark):
    left, right = _sides(spark)
    rows = {
        (r.k, r.lt): r.rv
        for r in asof_join(
            left, right, ["k"], "lt", "rt", ["rv"], strict=True, how="inner"
        ).collect()
    }
    # (2,10) has NO match -> dropped; (1,20) matched a null value -> kept
    assert set(rows) == {(1, 10), (1, 20)}
    assert rows[(1, 20)] is None


def test_strict_excludes_equal_time(spark):
    left = spark.createDataFrame([(1, 10)], "k int, lt int")
    right = spark.createDataFrame([(1, 10, "eq")], "k int, rt int, rv string")
    strict = asof_join(left, right, ["k"], "lt", "rt", ["rv"], strict=True)
    loose = asof_join(left, right, ["k"], "lt", "rt", ["rv"], strict=False)
    assert strict.collect()[0].rv is None
    assert loose.collect()[0].rv == "eq"


def test_existence_only_asof_join_empty_right_values(spark):
    """ADVICE r9: right_values=[] (existence-only as-of) used to fail at
    plan time — F.struct() with zero columns — and `matched` could never
    be true for inner joins. The constant marker field fixes both."""
    left, right = _sides(spark)
    out = asof_join(left, right, ["k"], "lt", "rt", [], strict=True)
    assert sorted((r.k, r.lt) for r in out.collect()) == [
        (1, 10), (1, 20), (2, 10)
    ]
    inner = asof_join(
        left, right, ["k"], "lt", "rt", [], strict=True, how="inner"
    )
    # (2,10) has no earlier right row -> dropped even with no values
    assert sorted((r.k, r.lt) for r in inner.collect()) == [(1, 10), (1, 20)]
    # no internal columns leak
    assert set(out.columns) == set(left.columns)
