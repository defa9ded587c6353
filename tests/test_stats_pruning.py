"""File-level min/max stats + scan-time pruning (parity: Iceberg manifest
stats, parquet_stats_utils.rs; replaces the reference's hash-index point
lookup on the read path)."""

from pyspark.sql import functions as F

from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.stats import PrunePredicate, key_batch_predicate
from moonlink_spark.table.table import MoonlinkTable

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "bucket", "data_type": "string"},
    {"name": "v", "data_type": "float64"},
]


def _make(spark, tmp_path, n_files=5, rows_per_file=100):
    t = MoonlinkTable.create(
        spark, str(tmp_path / "t"), FIELDS, IdentityProp.single("id")
    )
    for f in range(n_files):
        base = f * rows_per_file
        t.append_rows(
            [
                {"id": base + i, "bucket": f"b{f}", "v": float(i)}
                for i in range(rows_per_file)
            ]
        )
        t.commit(lsn=f + 1)
    return t


def test_stats_collected_on_write(spark, tmp_path):
    t = _make(spark, tmp_path)
    m = t.manifest
    assert len(m.data_files) == 5
    for i, fe in enumerate(m.data_files):
        assert fe.stats is not None
        assert fe.stats["id"] == [i * 100, i * 100 + 99]
        assert fe.stats["bucket"] == [f"b{i}", f"b{i}"]


def test_point_lookup_prunes_to_one_file(spark, tmp_path):
    t = _make(spark, tmp_path)
    pred = PrunePredicate.eq("id", 250)
    df = t.scan(prune=pred)
    # only the file covering [200, 299] is read
    files = df.select(F.col("_metadata.file_path")).distinct().count()
    assert files == 1
    assert [r["id"] for r in df.filter("id = 250").collect()] == [250]
    # full scan unpruned still sees everything
    assert t.scan().count() == 500


def test_prune_never_loses_rows(spark, tmp_path):
    t = _make(spark, tmp_path)
    pred = PrunePredicate.between("id", 150, 320)
    got = sorted(
        r["id"] for r in t.scan(prune=pred).filter("id BETWEEN 150 AND 320").collect()
    )
    assert got == list(range(150, 321))


def test_key_batch_predicate_shapes():
    p = key_batch_predicate(["id"], [{"id": 5}, {"id": 9}])
    assert p.conditions == [("id", "in", [5, 9])]
    assert p.file_may_match({"id": [0, 10]})
    assert not p.file_may_match({"id": [100, 200]})
    assert p.file_may_match(None)  # no stats: never prune away
    big = key_batch_predicate(["id"], [{"id": i} for i in range(200)])
    assert big.conditions == [("id", ">=", 0), ("id", "<=", 199)]
    assert key_batch_predicate(["id"], [{"id": None}]) is None


def test_delete_targeting_uses_pruning_and_stays_correct(spark, tmp_path):
    """Point deletes touch only matching files (semantics identical)."""
    t = _make(spark, tmp_path)
    t.delete_rows([{"id": 250}, {"id": 251}])
    t.commit(lsn=99)
    assert t.scan().count() == 498
    assert t.scan().filter("id IN (250, 251)").count() == 0
    # the DV only references the single pruned file
    dv_files = t.manifest.delete_files
    assert sum(f.rows for f in dv_files) == 2


def test_scan_prune_with_dv_interaction(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.delete_rows([{"id": 250}])
    t.commit(lsn=99)
    df = t.scan(prune=PrunePredicate.between("id", 200, 299))
    assert df.count() == 99  # 100 minus the deleted row


def test_cluster_by_range_pruning(spark, tmp_path):
    """cluster_by range-sorts files on write: per-file min/max become
    non-overlapping, so a range scan prunes most files — the partition-
    layout benefit without hive directories."""
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.stats import PrunePredicate
    from moonlink_spark.table.table import MoonlinkTable

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "clustered"),
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "bucket", "data_type": "int64"},
        ],
        IdentityProp.single("id"),
        cluster_by=["bucket"],
    )
    assert t.cluster_by == ["bucket"]
    # shuffled input: without clustering every file would span all buckets
    df = (
        spark.range(20_000)
        .selectExpr("id", "(id * 7919) % 100 AS bucket")
    )
    t._cluster_files_hint = 8  # force several files (AQE would coalesce 20k rows to one)
    try:
        t.append_df(df)
        t.commit(lsn=1)
    finally:
        t._cluster_files_hint = None
    files = t.manifest.data_files
    assert len(files) > 4
    pred = PrunePredicate.between("bucket", 10, 12)
    kept = [f for f in files if pred.file_may_match(f.stats)]
    assert len(kept) < len(files) / 2, (len(kept), len(files))
    # scan with the predicate returns exactly the right rows
    got = t.scan(prune=pred).filter("bucket BETWEEN 10 AND 12").count()
    assert got == df.filter("bucket BETWEEN 10 AND 12").count()
    # compaction preserves clustering
    from moonlink_spark.table.maintenance import CompactionConfig, optimize

    optimize(t, cfg=CompactionConfig(target_file_bytes=16 * 1024))
    files2 = t.manifest.data_files
    kept2 = [f for f in files2 if pred.file_may_match(f.stats)]
    assert len(kept2) <= max(1, len(files2) // 2)
    # cluster column protected from drops
    import pytest

    from moonlink_spark.errors import TableConfigError

    with pytest.raises(TableConfigError):
        t.alter(drop_columns=["bucket"])


def test_zorder_clustering_prunes_both_dimensions(spark, tmp_path):
    """zorder cluster files cover narrow ranges in EVERY cluster column, so
    stats pruning works on either dimension — what range clustering only
    gives the first column."""
    from moonlink_spark.errors import TableConfigError
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.stats import PrunePredicate
    from moonlink_spark.table.table import MoonlinkTable

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "zordered"),
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "x", "data_type": "int64"},
            {"name": "y", "data_type": "int64"},
        ],
        IdentityProp.single("id"),
        cluster_by=["x", "y"],
        properties={"cluster_strategy": "zorder"},
    )
    # 128x128 grid in random order: unclustered, every file spans both dims
    df = spark.range(128 * 128).selectExpr(
        "id",
        "(id * 7919) % 128 AS x",
        "((id * 104729) DIV 128) % 128 AS y",
    )
    t._cluster_files_hint = 16
    try:
        t.append_df(df)
        t.commit(lsn=1)
    finally:
        t._cluster_files_hint = None
    files = t.manifest.data_files
    assert len(files) >= 8

    for col in ("x", "y"):
        pred = PrunePredicate.between(col, 10, 20)
        kept = [f for f in files if pred.file_may_match(f.stats)]
        # a narrow slice in EITHER dimension skips a good share of files
        assert len(kept) <= 3 * len(files) // 4, (col, len(kept), len(files))
        got = t.scan(prune=pred).filter(f"{col} BETWEEN 10 AND 20").count()
        assert got == df.filter(f"{col} BETWEEN 10 AND 20").count()

    # invalid configs fail loudly at create time
    import pytest as _pytest

    with _pytest.raises(TableConfigError):
        MoonlinkTable.create(
            spark,
            str(tmp_path / "bad1"),
            [
                {"name": "id", "data_type": "int64", "nullable": False},
                {"name": "s", "data_type": "string"},
            ],
            IdentityProp.single("id"),
            cluster_by=["id", "s"],
            properties={"cluster_strategy": "zorder"},
        )


def test_scan_where_auto_prunes(spark, tmp_path):
    """scan_where derives the file-skip predicate from the SQL condition —
    same pruning as hand-built PrunePredicate, same rows as a full scan."""
    from pyspark.sql import functions as F

    t = _make(spark, tmp_path)  # 5 files x 100 rows, ids 0..499 range-laid
    df = t.scan_where("id BETWEEN 150 AND 170")
    files = df.select(F.col("_metadata.file_path")).distinct().count()
    assert files == 1
    assert df.count() == 21

    # unparseable condition: no pruning, still correct
    df2 = t.scan_where("id % 100 = 0")
    assert df2.count() == 5

    # disjunction: conservative full scan, correct rows
    df3 = t.scan_where("id = 10 OR id = 450")
    assert df3.count() == 2


def test_temporal_literal_pruning_not_wrong():
    """Footer stats store datetimes as 'T'-separated isoformat; SQL
    literals come space-separated or date-only. Lexicographic compare
    would prune files that DO contain matching rows (ADVICE r3 high)."""
    from moonlink_spark.table.stats import prune_predicate_from_condition

    stats = {"ts": ["2024-01-01T00:00:00", "2024-01-31T23:59:59"]}

    # space-separated literal inside the range: must NOT prune
    p = prune_predicate_from_condition("ts = '2024-01-15 12:00:00'")
    assert p is not None and p.file_may_match(stats)
    # boundary: date-only literal == file min at midnight
    p = prune_predicate_from_condition("ts <= '2024-01-01'")
    assert p.file_may_match(stats)
    p = prune_predicate_from_condition("ts >= '2024-01-31'")
    assert p.file_may_match(stats)
    # genuinely out of range: still prunes
    p = prune_predicate_from_condition("ts = '2025-06-01 00:00:00'")
    assert not p.file_may_match(stats)
    p = prune_predicate_from_condition("ts < '2023-12-31 23:00:00'")
    assert not p.file_may_match(stats)
    # IN-lists coerce per element
    p = prune_predicate_from_condition(
        "ts IN ('2024-01-10 00:00:00', '2025-01-01 00:00:00')"
    )
    assert p.file_may_match(stats)
    # non-temporal literal vs temporal stats: incomparable -> no pruning
    p = prune_predicate_from_condition("ts = 'not-a-date'")
    assert p.file_may_match(stats)
    # plain string stats stay lexicographic
    p = prune_predicate_from_condition("bucket = 'b3'")
    assert p.file_may_match({"bucket": ["b0", "b4"]})
    assert not p.file_may_match({"bucket": ["b5", "b9"]})


def test_temporal_scan_where_end_to_end(spark, tmp_path):
    """A timestamp table scanned through scan_where with a space-separated
    literal must return every matching row (the pruner used to drop the
    file)."""
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "ts_table"),
        [
            {"name": "id", "data_type": "int64", "nullable": False},
            {"name": "ts", "data_type": "timestamp"},
        ],
        IdentityProp.single("id"),
    )
    df = spark.sql(
        "SELECT id, timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0,0,0,id*3600) AS ts "
        "FROM range(48)"
    )
    t.append_df(df)
    t.commit(lsn=1)
    got = t.scan_where("ts = '2024-01-01 05:00:00'").count()
    assert got == 1
    got = t.scan_where("ts <= '2024-01-01'").count()
    assert got == 1  # exactly midnight
    got = t.scan_where("ts BETWEEN '2024-01-01 00:00:00' AND '2024-01-01 23:00:00'").count()
    assert got == 24


def test_validate_scan_condition():
    """Strict grammar gate for the HTTP where= parameter (ADVICE r3
    medium): full-parse or reject, and columns must exist."""
    import pytest

    from moonlink_spark.table.stats import validate_scan_condition

    cols = ["id", "age", "name"]
    validate_scan_condition("age BETWEEN 3 AND 5", cols)
    validate_scan_condition("id = 7 AND name = 'x'", cols)
    validate_scan_condition("id IN (1, 2, 3)", cols)
    for bad in [
        "reflect('java.lang.Runtime','getRuntime') IS NOT NULL",
        "java_method('java.lang.System','exit',0) = ''",
        "id = 1 OR name = 'x'",          # disjunction not in grammar
        "length(name) > 3",              # function call
        "nope = 1",                      # unknown column
        "id = id",                       # col-vs-col
        "",                              # empty
    ]:
        with pytest.raises(ValueError):
            validate_scan_condition(bad, cols)


def test_zorder_key_sign_safe_many_columns(spark):
    """4+ cluster columns must never touch bit 63 or wrap shifts mod 64
    (ADVICE r3 low): key stays a non-negative bigint for k in 2..7."""
    from pyspark.sql import functions as F

    from moonlink_spark.table.zorder import ZCOL, with_zorder_key

    df = spark.range(2000).selectExpr(
        "id", "id % 97 AS a", "id % 89 AS b", "id % 83 AS c",
        "id % 79 AS d", "id % 73 AS e", "id % 71 AS f", "id % 67 AS g",
    )
    for k in (2, 4, 5, 7):
        cols = ["a", "b", "c", "d", "e", "f", "g"][:k]
        out = with_zorder_key(df, cols)
        row = out.agg(
            F.min(ZCOL).alias("mn"), F.max(ZCOL).alias("mx"),
            F.countDistinct(ZCOL).alias("nd"),
        ).collect()[0]
        assert row["mn"] >= 0, (k, row)
        assert row["mx"] < (1 << 63), (k, row)
        # the key actually varies (not scrambled into collisions/constant)
        assert row["nd"] > 100, (k, row)


def test_zorder_too_many_columns_rejected():
    import pytest
    from pyspark.sql import types as T

    from moonlink_spark.errors import TableConfigError
    from moonlink_spark.table.zorder import validate_zorder_columns

    names = [f"c{i}" for i in range(16)]
    schema = T.StructType([T.StructField(n, T.LongType()) for n in names])
    with pytest.raises(TableConfigError):
        validate_zorder_columns(schema, names)
