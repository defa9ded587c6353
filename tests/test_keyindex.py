"""Persisted key hash index: build on flush, exact-file delete targeting,
index merge, compaction rebuild, vacuum GC, Iceberg index-blob export.

Parity model: the reference's persisted bucketed hash index
(persisted_bucket_hash_map.rs — build_from_flush :486-523, search_values
:276-302, build_from_merge :525-574) and its Iceberg persistence as
mooncake-hash-index-v1 Puffin blobs (storage/table/iceberg/index.rs:20-22).
"""

import os

import pytest
from pyspark.sql import functions as F

from moonlink_spark.errors import IdentityError, TableConfigError
from moonlink_spark.table import keyindex
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.maintenance import optimize, vacuum
from moonlink_spark.table.table import MoonlinkTable

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "v", "data_type": "string"},
]


def _mk(spark, tmp_path, name="t", ident=None, **kw):
    return MoonlinkTable.create(
        spark,
        str(tmp_path / name),
        FIELDS,
        ident or IdentityProp.single("id"),
        key_index=True,
        **kw,
    )


def test_build_on_flush_covers_every_commit(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append_rows([{"id": i, "v": f"a{i}"} for i in range(100)])
    t.commit(lsn=1)
    t.append_rows([{"id": i, "v": f"b{i}"} for i in range(100, 200)])
    t.commit(lsn=2)
    m = t.manifest
    entries, covered = keyindex.live_entries(m)
    assert len(entries) == 2
    assert covered == {f.path for f in m.data_files}
    # every entry's index parquet has one row per data row
    total = sum(e["rows"] for e in entries)
    assert total == 200


def test_lookup_returns_exactly_the_containing_file(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append_rows([{"id": i, "v": "x"} for i in range(100)])
    t.commit(lsn=1)
    t.append_rows([{"id": i, "v": "x"} for i in range(100, 200)])
    t.commit(lsn=2)
    m = t.manifest
    keys = spark.createDataFrame([(150,)], "id: long")
    matching, uncovered = keyindex.candidate_files(t, m, keys, ["id"])
    assert uncovered == []
    assert len(matching) == 1
    # the second commit's file contains id=150
    assert matching[0] == m.data_files[1].path
    # a key in neither file matches nothing
    none_keys = spark.createDataFrame([(10_000,)], "id: long")
    matching2, _ = keyindex.candidate_files(t, m, none_keys, ["id"])
    assert matching2 == []


def test_delete_via_index_is_exact(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append_rows([{"id": i, "v": f"a{i}"} for i in range(300)])
    t.commit(lsn=1)
    t.delete_rows([{"id": 5}, {"id": 250}])
    t.commit(lsn=2)
    assert t.scan().count() == 298
    assert t.scan().filter("id in (5, 250)").count() == 0
    # upsert goes through the same targeting
    t.upsert_rows([{"id": 7, "v": "upd"}])
    t.commit(lsn=3)
    assert [r.v for r in t.scan().filter("id = 7").collect()] == ["upd"]


def test_strict_delete_missing_key_still_raises(spark, tmp_path):
    t = _mk(spark, tmp_path)
    t.append_rows([{"id": 1, "v": "a"}])
    t.commit(lsn=1)
    t.delete_rows([{"id": 99}], if_exists=False)
    with pytest.raises(IdentityError):
        t.commit(lsn=2)


def test_same_commit_flush_is_scanned_uncovered(spark, tmp_path):
    """A delete in the same commit as its append targets files the index
    does not yet cover — correctness never depends on coverage."""
    t = _mk(spark, tmp_path)
    t.append_rows([{"id": i, "v": "x"} for i in range(50)])
    t.delete_rows([{"id": 7}])
    t.commit(lsn=1)
    assert t.scan().count() == 49
    assert t.scan().filter("id = 7").count() == 0


def test_composite_key_index(spark, tmp_path):
    fields = [
        {"name": "a", "data_type": "int64", "nullable": False},
        {"name": "b", "data_type": "string", "nullable": False},
        {"name": "v", "data_type": "int32"},
    ]
    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "ck"),
        fields,
        IdentityProp.keys(["a", "b"]),
        key_index=True,
    )
    t.append_rows([{"a": i, "b": f"k{i % 7}", "v": i} for i in range(100)])
    t.commit(lsn=1)
    t.delete_rows([{"a": 3, "b": "k3"}])
    t.commit(lsn=2)
    assert t.scan().count() == 99
    assert t.scan().filter("a = 3").count() == 0


def test_key_index_requires_key_identity(spark, tmp_path):
    with pytest.raises(TableConfigError):
        MoonlinkTable.create(
            spark,
            str(tmp_path / "bad"),
            FIELDS,
            IdentityProp.full_row(),
            key_index=True,
        )


def test_index_merge_compacts_entries(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for c in range(4):
        t.append_rows([{"id": 100 * c + i, "v": "x"} for i in range(100)])
        t.commit(lsn=c + 1)
    assert len(keyindex.index_entries(t.manifest)) == 4
    optimize(t, mode="index")
    m = t.manifest
    entries, covered = keyindex.live_entries(m)
    assert len(entries) == 1
    assert covered == {f.path for f in m.data_files}
    keys = spark.createDataFrame([(305,)], "id: long")
    matching, uncovered = keyindex.candidate_files(t, m, keys, ["id"])
    assert uncovered == []
    assert matching == [m.data_files[3].path]


def test_compaction_rebuilds_index(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for c in range(3):
        t.append_rows([{"id": 100 * c + i, "v": "x"} for i in range(100)])
        t.commit(lsn=c + 1)
    t.delete_rows([{"id": 42}])
    t.commit(lsn=4)
    optimize(t, mode="full")
    m = t.manifest
    entries, covered = keyindex.live_entries(m)
    assert covered == {f.path for f in m.data_files}
    # deleted row is gone from the rebuilt index
    keys = spark.createDataFrame([(42,)], "id: long")
    matching, uncovered = keyindex.candidate_files(t, m, keys, ["id"])
    assert matching == [] and uncovered == []
    # live keys still resolve, and deletes still work post-compaction
    t.delete_rows([{"id": 123}])
    t.commit(lsn=5)
    assert t.scan().count() == 298


def test_vacuum_gcs_dead_index_runs(spark, tmp_path):
    t = _mk(spark, tmp_path)
    for c in range(3):
        t.append_rows([{"id": 10 * c + i, "v": "x"} for i in range(10)])
        t.commit(lsn=c + 1)
    optimize(t, mode="index")
    kid = os.path.join(t.data_path, keyindex.KEYINDEX_DIR)
    assert len(os.listdir(kid)) == 4  # 3 per-commit runs + 1 merged
    removed = vacuum(t)
    assert removed >= 3
    assert len(os.listdir(kid)) == 1  # only the merged run survives
    # table still scans and deletes correctly
    t.delete_rows([{"id": 21}])
    t.commit(lsn=10)
    assert t.scan().count() == 29


def test_iceberg_export_writes_index_blobs(spark, tmp_path):
    from moonlink_spark.table.iceberg_export import (
        export_iceberg,
        read_iceberg_key_index,
    )

    t = _mk(spark, tmp_path)
    t.append_rows([{"id": i, "v": f"a{i}"} for i in range(200)])
    t.commit(lsn=1)
    t.delete_rows([{"id": 3}])
    t.commit(lsn=2)
    dest = str(tmp_path / "ice")
    summary = export_iceberg(t, dest)
    assert summary["file_index_puffin"]
    blobs = read_iceberg_key_index(dest)
    assert len(blobs) == 1
    e = blobs[0]
    assert e["algo"] == keyindex.XXHASH64_ALGO
    assert e["cardinality"] == 200
    assert len(e["data_files"]) == len(e["source_paths"]) == 1
    assert all(os.path.exists(p) for p in e["index_block_files"])
    assert all(os.path.exists(p) for p in e["data_files"])
    # point lookup THROUGH the exported blob: hash -> (file, row) -> value
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    h = (
        spark.createDataFrame([(7,)], "id: long")
        .select(F.xxhash64("id").alias("h"))
        .collect()[0]
        .h
    )
    tbl = pq.read_table(e["index_block_files"][0])
    hit = tbl.filter(pc.equal(tbl.column("h"), h)).to_pylist()
    assert len(hit) == 1 and hit[0]["__fp"] == e["source_paths"][0]
    row = pq.read_table(e["data_files"][0]).to_pylist()[hit[0]["__ri"]]
    assert row == {"id": 7, "v": "a7"}


def test_non_indexed_table_unaffected(spark, tmp_path):
    t = MoonlinkTable.create(
        spark, str(tmp_path / "plain"), FIELDS, IdentityProp.single("id")
    )
    t.append_rows([{"id": 1, "v": "a"}])
    t.commit(lsn=1)
    assert keyindex.candidate_files(
        t, t.manifest, spark.createDataFrame([(1,)], "id: long"), ["id"]
    ) is None
    optimize(t, mode="index")  # no-op, no error
    t.delete_rows([{"id": 1}])
    t.commit(lsn=2)
    assert t.scan().count() == 0


def test_scan_keys_point_lookup(spark, tmp_path):
    """Read-path index lookup: scan_keys answers from only the containing
    files (index path) and falls back cleanly without an index."""
    t = _mk(spark, tmp_path, "lookup")
    t.append_rows([{"id": i, "v": f"a{i}"} for i in range(100)])
    t.commit(lsn=1)
    t.append_rows([{"id": i, "v": f"b{i}"} for i in range(100, 200)])
    t.commit(lsn=2)
    keys = spark.createDataFrame([(5,), (150,)], "id: long")
    got = {r.id: r.v for r in t.scan_keys(keys).collect()}
    assert got == {5: "a5", 150: "b150"}
    # historical lookup at lsn=1 sees only the first commit
    got1 = {r.id: r.v for r in t.scan_keys(keys, lsn=1).collect()}
    assert got1 == {5: "a5"}
    # deleted keys disappear
    t.delete_rows([{"id": 5}])
    t.commit(lsn=3)
    assert {r.id for r in t.scan_keys(keys).collect()} == {150}
    # fallback: same answers on a non-indexed table
    t2 = MoonlinkTable.create(
        spark, str(tmp_path / "plain2"), FIELDS, IdentityProp.single("id")
    )
    t2.append_rows([{"id": i, "v": f"a{i}"} for i in range(10)])
    t2.commit(lsn=1)
    keys2 = spark.createDataFrame([(3,)], "id: long")
    assert [r.v for r in t2.scan_keys(keys2).collect()] == ["a3"]
    # wrong identity mode raises
    t3 = MoonlinkTable.create(
        spark, str(tmp_path / "fr2"), FIELDS, IdentityProp.full_row()
    )
    with pytest.raises(IdentityError):
        t3.scan_keys(keys2)


def test_scan_where_routes_point_lookups_through_index(spark, tmp_path):
    t = _mk(spark, tmp_path, "sw")
    t.append_rows([{"id": i, "v": f"a{i}"} for i in range(200)])
    t.commit(lsn=1)
    t.append_rows([{"id": i, "v": f"b{i}"} for i in range(200, 400)])
    t.commit(lsn=2)
    # equality on the key -> index route
    assert [r.v for r in t.scan_where("id = 250").collect()] == ["b250"]
    # IN-list on the key
    got = sorted(r.id for r in t.scan_where("id IN (3, 250, 9999)").collect())
    assert got == [3, 250]
    # key equality plus extra conjunct still filters correctly
    assert t.scan_where("id = 250 AND v = 'nope'").count() == 0
    # range on the key: not a lookup, falls back to stats pruning
    assert t.scan_where("id >= 395").count() == 5
    # non-key condition untouched
    assert t.scan_where("v = 'a7'").count() == 1


def test_narrow_typed_keys_df_still_hits_index(spark, tmp_path):
    """xxhash64 is width-sensitive: an int-typed lookup against a bigint
    key column must be cast to the table type before hashing, or the
    candidate set silently drops the containing file."""
    t = _mk(spark, tmp_path, "cast")
    t.append_rows([{"id": i, "v": f"a{i}"} for i in range(50)])
    t.commit(lsn=1)
    keys_int = spark.createDataFrame([(7,)], "id: int")  # NOT long
    matching, _ = keyindex.candidate_files(t, t.manifest, keys_int, ["id"])
    assert matching == [t.manifest.data_files[0].path]
    t.delete_keys_df(keys_int)
    t.commit(lsn=2)
    assert t.scan().filter("id = 7").count() == 0
    assert t.scan().count() == 49


def test_candidate_files_match_bruteforce_random(spark, tmp_path):
    """Property: for random key sets (negatives, unicode strings), the
    candidate file set equals the true containing-file set exactly."""
    import random

    rng = random.Random(1234)
    fields = [
        {"name": "k", "data_type": "int64", "nullable": False},
        {"name": "s", "data_type": "string", "nullable": False},
        {"name": "v", "data_type": "int32"},
    ]
    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "prop"),
        fields,
        IdentityProp.keys(["k", "s"]),
        key_index=True,
    )
    pool = [
        (rng.randrange(-(10**12), 10**12), rng.choice(["α", "b", "日本", ""]))
        for _ in range(300)
    ]
    files_of: dict[tuple, set[int]] = {}
    for c in range(3):
        chunk = pool[100 * c:100 * (c + 1)]
        t.append_rows([{"k": k, "s": s, "v": i} for i, (k, s) in enumerate(chunk)])
        t.commit(lsn=c + 1)
        for key in chunk:
            files_of.setdefault(key, set()).add(c)
    m = t.manifest
    paths = [f.path for f in m.data_files]
    probe = rng.sample(pool, 20) + [(99, "missing")]
    keys_df = spark.createDataFrame(
        [{"k": k, "s": s} for k, s in probe], "k: long, s: string"
    )
    matching, uncovered = keyindex.candidate_files(t, m, keys_df, ["k", "s"])
    assert uncovered == []
    expected = set()
    for key in probe:
        expected.update(paths[c] for c in files_of.get(key, ()))
    assert set(matching) == expected


def test_exported_blob_lookup_distributed_path_matches_driver(
    spark, tmp_path, monkeypatch
):
    """iceberg_index_lookup's two legs agree: the driver-side pyarrow
    path and the Spark broadcast-join path return the same files and
    positions, and the threshold picks the leg — below it (or with no
    spark handle) the driver path runs, at/above it the block scan goes
    through Spark."""
    from moonlink_spark.table import iceberg_export
    from moonlink_spark.table.iceberg_export import (
        export_iceberg,
        iceberg_index_lookup,
    )

    t = _mk(spark, tmp_path)
    t.append_rows([{"id": i, "v": f"a{i}"} for i in range(1500)])
    t.commit(lsn=1)
    t.append_rows([{"id": i, "v": f"b{i}"} for i in range(1500, 3000)])
    t.commit(lsn=2)
    dest = str(tmp_path / "ice")
    export_iceberg(t, dest)

    keys = list(range(0, 3000, 2)) + [99_999]  # 1500 probes + one miss
    hashes = [
        r.h
        for r in spark.createDataFrame([(k,) for k in keys], "id: long")
        .select(F.xxhash64("id").alias("h"))
        .collect()
    ]

    calls = {"n": 0}
    real = iceberg_export._index_lookup_spark

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(iceberg_export, "_index_lookup_spark", counting)

    drv = iceberg_index_lookup(dest, hashes)  # no spark handle: driver leg
    assert calls["n"] == 0
    below = iceberg_index_lookup(
        dest, hashes, spark=spark, distributed_threshold=10_000
    )
    assert calls["n"] == 0  # under threshold: still the driver leg
    dist = iceberg_index_lookup(
        dest, hashes, spark=spark, distributed_threshold=512
    )
    assert calls["n"] == 1  # 1501 probes >= 512: Spark leg ran

    assert drv == below
    assert dist["files"] == drv["files"]
    assert sorted(dist["positions"]) == sorted(drv["positions"])
    assert len(drv["positions"]) == 1500  # every even key hit, miss absent


def test_index_entry_rows_are_per_file(spark, tmp_path):
    """Review r10: multi-file index builds stamped the BATCH total on
    every entry, inflating exported blob cardinality n_out-fold. Each
    entry must carry its own file's row count; they sum to the total."""
    import pyarrow.parquet as pq

    from moonlink_spark.table import keyindex as ki

    orig = ki.INDEX_FILE_ROWS
    ki.INDEX_FILE_ROWS = 500  # force several output files
    try:
        t = MoonlinkTable.create(
            spark,
            str(tmp_path / "t"),
            FIELDS,
            IdentityProp.single("id"),
            properties={"key_index": {"entries": []}},
        )
        t.append_rows([{"id": i, "v": f"v{i}"} for i in range(2000)])
        t.commit(lsn=1)
        entries = ki.index_entries(t.manifest)
        assert len(entries) >= 3
        assert sum(e["rows"] for e in entries) == 2000
        for e in entries:
            assert e["rows"] == pq.ParquetFile(
                t._resolve(e["path"])
            ).metadata.num_rows
            assert e["rows"] < 2000  # no entry claims the batch total
    finally:
        ki.INDEX_FILE_ROWS = orig
