"""Delta-log export: structure per the public Delta PROTOCOL.md, data
parity via DuckDB reading the exported files, and incrementality (clean
files produce no new actions; DV'd files are rewritten).

No Delta engine is in the environment, so verification is two-sided:
(1) structural — the log actions carry the spec-required fields and the
schemaString round-trips through Spark's StructType.fromJson; (2) data —
DuckDB scans the replayed live file set and must match ``table.scan()``
exactly.
"""

import json
import os

import duckdb
import pytest
from pyspark.sql import types as T

from moonlink_spark.table.delta_export import (
    export_delta,
    read_delta_live_files,
    _replay_log,
    LOG_DIR,
)
from moonlink_spark.table.identity import IdentityProp
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
        [{"id": i, "grp": f"g{i % 3}", "val": float(i)} for i in range(200)]
    )
    t.commit(lsn=1)
    return t


def duck_rows(dest):
    """Independent read-back: DuckDB scans the log's live files and drops
    the rows flagged by inline deletion vectors."""
    from moonlink_spark.table.delta_export import read_delta_deletion_vectors

    files = read_delta_live_files(dest)
    assert files, "no live files in delta log"
    dead = {
        (f, p)
        for f, ps in read_delta_deletion_vectors(dest).items()
        for p in ps
    }
    con = duckdb.connect()
    quoted = ", ".join(f"'{p}'" for p in files)
    rows = con.sql(
        f"SELECT id, grp, val, filename, file_row_number "
        f"FROM read_parquet([{quoted}], filename=true, file_row_number=true) "
        f"ORDER BY id"
    ).fetchall()
    return [(i, g, v) for i, g, v, fn, rn in rows if (fn, rn) not in dead]


def spark_rows(t, lsn=None):
    return [
        (r.id, r.grp, r.val)
        for r in t.scan(lsn=lsn).orderBy("id").collect()
    ]


def log_actions(dest, version):
    path = os.path.join(dest, LOG_DIR, f"{version:020d}.json")
    with open(path) as fh:
        return [json.loads(l) for l in fh if l.strip()]


def test_v0_structure_and_data(spark, tmp_path):
    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    summary = export_delta(t, dest)
    assert summary["delta_version"] == 0 and summary["removes"] == 0

    actions = log_actions(dest, 0)
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "commitInfo"
    assert "protocol" in kinds and "metaData" in kinds and "add" in kinds

    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 1

    meta = next(a["metaData"] for a in actions if "metaData" in a)
    # spec-required metaData fields
    for k in ("id", "format", "schemaString", "partitionColumns", "configuration"):
        assert k in meta
    assert meta["format"]["provider"] == "parquet"
    st = T.StructType.fromJson(json.loads(meta["schemaString"]))
    assert st.fieldNames() == ["id", "grp", "val"]

    adds = [a["add"] for a in actions if "add" in a]
    n_records = 0
    for a in adds:
        p = os.path.join(dest, a["path"])
        assert os.path.isfile(p) and a["size"] == os.path.getsize(p)
        stats = json.loads(a["stats"])
        n_records += stats["numRecords"]
        assert stats["minValues"]["id"] >= 0
    assert n_records == 200

    assert duck_rows(dest) == spark_rows(t)


def test_incremental_append_only_adds(spark, tmp_path):
    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    v0_adds = {a["add"]["path"] for a in log_actions(dest, 0) if "add" in a}

    t.append_rows([{"id": i, "grp": "new", "val": 1.5} for i in range(500, 520)])
    t.commit(lsn=2)
    summary = export_delta(t, dest)
    assert summary["delta_version"] == 1

    actions = log_actions(dest, 1)
    kinds = [next(iter(a)) for a in actions]
    # unchanged schema, clean prior files: only commitInfo + new adds
    assert "metaData" not in kinds and "remove" not in kinds
    new_adds = {a["add"]["path"] for a in actions if "add" in a}
    assert new_adds and not (new_adds & v0_adds)
    assert duck_rows(dest) == spark_rows(t)


def test_dv_inline_no_rewrite(spark, tmp_path):
    """Deletes export as inline deletion vectors on the add action
    (PROTOCOL.md reader 3 / writer 7 feature): data files stay verbatim,
    a delete-only commit appends one log version with refreshed DVs and
    a protocol upgrade, and replay-minus-DV equals the table scan."""
    from moonlink_spark.table.delta_export import read_delta_deletion_vectors

    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    data_files_v0 = {
        n for n in os.listdir(dest) if n.endswith(".parquet")
    }

    t.delete_rows([{"id": i} for i in range(0, 200, 10)])
    t.commit(lsn=2)
    assert t.scan().count() == 180

    summary = export_delta(t, dest)
    assert summary["deletion_vectors"] >= 1
    assert summary["deleted_positions"] == 20
    assert summary["removes"] == 0
    # no data file was rewritten or added
    assert {n for n in os.listdir(dest) if n.endswith(".parquet")} == data_files_v0

    actions = log_actions(dest, 1)
    kinds = [next(iter(a)) for a in actions]
    assert "remove" not in kinds
    # protocol upgraded to the DV feature in the same version
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 3 and proto["minWriterVersion"] == 7
    assert "deletionVectors" in proto["readerFeatures"]
    adds = [a["add"] for a in actions if "add" in a]
    assert adds and all("deletionVector" in a for a in adds)
    dv = adds[0]["deletionVector"]
    assert dv["storageType"] == "i" and dv["cardinality"] >= 1

    # read side: decoded positions match, DuckDB-minus-DV == scan
    dvs = read_delta_deletion_vectors(dest)
    assert sum(len(v) for v in dvs.values()) == 20
    assert duck_rows(dest) == spark_rows(t)
    # stats still count full file rows; live accounting via summary
    _, live, _, _ = _replay_log(os.path.join(dest, LOG_DIR))
    assert len(live) == summary["live_files"]
    total = sum(json.loads(a["stats"])["numRecords"] for a in live.values())
    assert total == 200

    # more deletes: same files, refreshed DVs in a new version
    t.delete_rows([{"id": i} for i in range(1, 200, 10)])
    t.commit(lsn=3)
    s2 = export_delta(t, dest)
    assert s2["deleted_positions"] == 40 and s2["removes"] == 0
    assert duck_rows(dest) == spark_rows(t)

    # appends after deletes coexist with DVs
    t.append_rows([{"id": 999, "grp": "z", "val": 9.0}])
    t.commit(lsn=4)
    export_delta(t, dest)
    assert duck_rows(dest) == spark_rows(t)


def test_delta_dv_codec_roundtrip():
    from moonlink_spark.table.delta_export import (
        _delta_dv_bytes,
        _delta_dv_positions,
        _z85_decode,
        _z85_encode,
    )

    for positions in ([0], [1, 5, 7], list(range(0, 100_000, 7))):
        raw = _delta_dv_bytes(positions)
        assert _delta_dv_positions(raw) == sorted(positions)
        enc = _z85_encode(raw)
        assert _z85_decode(enc, len(raw)) == raw
    # Z85 handles non-4-aligned input via padding + true-size trim
    for n in range(1, 9):
        blob = bytes(range(n))
        assert _z85_decode(_z85_encode(blob), n) == blob


def test_idempotent_re_export_same_lsn(spark, tmp_path):
    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    summary = export_delta(t, dest)  # nothing changed
    assert summary["adds"] == 0 and summary["removes"] == 0
    assert duck_rows(dest) == spark_rows(t)


def test_schema_change_re_emits_metadata(spark, tmp_path):
    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    t.alter(add_columns=[{"name": "extra", "data_type": "int32"}])
    t.append_rows([{"id": 900, "grp": "g0", "val": 9.0, "extra": 7}])
    t.commit(lsn=t.manifest.lsn + 1)
    export_delta(t, dest)
    actions = log_actions(dest, 1)
    meta = [a["metaData"] for a in actions if "metaData" in a]
    assert meta, "schema change must re-emit metaData"
    st = T.StructType.fromJson(json.loads(meta[0]["schemaString"]))
    assert "extra" in st.fieldNames()


def test_concurrent_export_single_version_winner(spark, tmp_path):
    """Review finding (r9): two exporters racing to the same next Delta
    version wrote the same NNN.json via os.replace — last writer silently
    destroyed the other's actions. The commit is now atomic-exclusive
    (link), and the loser replays the log and retries at the NEXT
    version, so both exports land."""
    dest = str(tmp_path / "delta_race")
    t = make_table(spark, tmp_path)
    export_delta(t, dest)  # version 0

    # simulate the racer that grabbed version 1 first: a valid log file
    # (commitInfo only) appears between our replay and our write
    import moonlink_spark.table.delta_export as de

    real_replay = de._replay_log
    injected = {"done": False}

    def racing_replay(log_dir):
        out = real_replay(log_dir)
        if not injected["done"]:
            injected["done"] = True
            with open(os.path.join(log_dir, f"{out[0]:020d}.json"), "x") as fh:
                fh.write(json.dumps({"commitInfo": {"operation": "RACER"}}) + "\n")
        return out

    t.append_rows([{"id": 999, "grp": "z", "val": 9.0}])
    t.commit()
    de._replay_log = racing_replay
    try:
        s = export_delta(t, dest)
    finally:
        de._replay_log = real_replay
    # the racer owns version 1; our export retried and landed at 2
    assert s["delta_version"] == 2, s
    assert s["adds"] >= 1
    versions = sorted(
        int(n[:-5]) for n in os.listdir(os.path.join(dest, LOG_DIR))
        if n.endswith(".json")
    )
    assert versions == [0, 1, 2]
    # replay still yields the full live set including the new row
    con = duckdb.connect()
    files = read_delta_live_files(dest)
    quoted = ", ".join(f"'{p}'" for p in files)
    n = con.sql(f"SELECT count(*) FROM read_parquet([{quoted}])").fetchone()[0]
    assert n == t.scan().count()


def test_checkpoint_every_n_versions_and_fast_replay(spark, tmp_path):
    """r9 verdict #2: 25+ incremental versions; a classic parquet
    checkpoint + _last_checkpoint lands every 10 versions, and readback
    THROUGH the checkpoint (checkpoint state + JSON tail) equals both a
    full-log replay and the source table, DVs included."""
    from moonlink_spark.table.delta_export import (
        LAST_CHECKPOINT,
        _read_checkpoint_state,
        write_delta_checkpoint,
    )

    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    lsn = 1
    for i in range(26):
        lsn += 1
        if i % 5 == 2:
            t.delete_rows([{"id": 3 * i}])
        else:
            t.append_rows(
                [{"id": 1000 + 10 * i + j, "grp": "cp", "val": 1.0}
                 for j in range(3)]
            )
        t.commit(lsn=lsn)
        export_delta(t, dest, lsn=lsn)
    log_dir = os.path.join(dest, LOG_DIR)
    assert os.path.exists(os.path.join(log_dir, LAST_CHECKPOINT))
    with open(os.path.join(log_dir, LAST_CHECKPOINT)) as fh:
        cp_meta = json.load(fh)
    assert cp_meta["version"] >= 20  # interval-10 cadence over 27 versions
    assert os.path.exists(
        os.path.join(log_dir, f"{cp_meta['version']:020d}.checkpoint.parquet")
    )
    # checkpoint state itself parses
    cp = _read_checkpoint_state(log_dir)
    assert cp is not None and cp[0] == cp_meta["version"]
    _v, cp_live, cp_schema, cp_protocol = cp
    assert cp_live and cp_schema and cp_protocol
    # replay-through-checkpoint == full JSON replay == source table
    with_cp = duck_rows(dest)
    cp_path = os.path.join(log_dir, f"{cp_meta['version']:020d}.checkpoint.parquet")
    lc_path = os.path.join(log_dir, LAST_CHECKPOINT)
    os.rename(lc_path, lc_path + ".hidden")
    full_replay = duck_rows(dest)
    os.rename(lc_path + ".hidden", lc_path)
    assert with_cp == full_replay == spark_rows(t)
    # an explicit re-checkpoint at head converges (same state)
    summary = write_delta_checkpoint(dest)
    assert summary["checkpoint_version"] == 26  # v0 + 26 incrementals
    assert duck_rows(dest) == spark_rows(t)


def test_corrupt_checkpoint_falls_back_to_log_replay(spark, tmp_path):
    from moonlink_spark.table.delta_export import (
        LAST_CHECKPOINT,
        write_delta_checkpoint,
    )

    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    t.append_rows([{"id": 5000, "grp": "x", "val": 2.0}])
    t.commit(lsn=2)
    export_delta(t, dest, lsn=2)
    write_delta_checkpoint(dest)
    expected = spark_rows(t)
    log_dir = os.path.join(dest, LOG_DIR)
    with open(os.path.join(log_dir, LAST_CHECKPOINT)) as fh:
        v = json.load(fh)["version"]
    cp_path = os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")
    # torn checkpoint: truncated parquet bytes
    with open(cp_path, "r+b") as fh:
        fh.truncate(32)
    assert duck_rows(dest) == expected
    # _last_checkpoint pointing at a missing file
    os.unlink(cp_path)
    assert duck_rows(dest) == expected
    # garbage _last_checkpoint
    with open(os.path.join(log_dir, LAST_CHECKPOINT), "w") as fh:
        fh.write("{not json")
    assert duck_rows(dest) == expected


def test_checkpoint_survives_json_metadata_cleanup(spark, tmp_path):
    """Review r11: the Delta protocol allows deleting JSON commits a
    checkpoint covers (metadata cleanup / external writers). A valid
    checkpoint with NO newer surviving JSON commit is authoritative —
    replaying only the leftover tail silently reconstructed a wrong
    live set (the pre-r11 behavior distrusted exactly this case)."""
    from moonlink_spark.table.delta_export import write_delta_checkpoint

    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    t.append_rows([{"id": 6000, "grp": "y", "val": 3.0}])
    t.commit(lsn=2)
    export_delta(t, dest, lsn=2)
    write_delta_checkpoint(dest)  # checkpoint at v1
    expected = spark_rows(t)
    log_dir = os.path.join(dest, LOG_DIR)
    # cleanup deletes the newest JSON commit the checkpoint covers:
    # checkpoint (v1) > max surviving json version (0) — still trusted
    os.unlink(os.path.join(log_dir, f"{1:020d}.json"))
    next_version, live, schema_string, protocol = _replay_log(log_dir)
    assert next_version == 2  # clears the checkpoint, not just v0
    assert schema_string and protocol
    assert duck_rows(dest) == expected  # v1 state, NOT the v0 live set
    # full cleanup: every JSON commit gone, checkpoint alone remains
    os.unlink(os.path.join(log_dir, f"{0:020d}.json"))
    next_version, live, schema_string, protocol = _replay_log(log_dir)
    assert next_version == 2
    assert live and schema_string and protocol
    assert duck_rows(dest) == expected


def test_checkpoint_version_stamp_matches_replayed_state(spark, tmp_path):
    """Review r10: the checkpoint's stamped version must come from the
    same log listing its state was replayed from — a concurrent commit
    landing between two separate listings would otherwise mislabel the
    checkpoint (v10 file containing v11 state)."""
    from unittest.mock import patch

    from moonlink_spark.table import delta_export as de

    t = make_table(spark, tmp_path)
    dest = str(tmp_path / "delta")
    export_delta(t, dest)
    t.append_rows([{"id": 7000, "grp": "z", "val": 4.0}])
    t.commit(lsn=2)
    export_delta(t, dest, lsn=2)

    # simulate the race: a v2 commit lands AFTER the checkpointer's
    # replay. The stamp must be 1 (what was replayed), never 2.
    real_replay = de._replay_log
    fired = []

    def replay_then_commit(log_dir):
        out = real_replay(log_dir)
        if not fired:  # only the checkpointer's own replay triggers it
            fired.append(True)
            t.append_rows([{"id": 7001, "grp": "z", "val": 5.0}])
            t.commit(lsn=3)
            export_delta(t, dest, lsn=3, checkpoint_interval=0)
        return out

    with patch.object(de, "_replay_log", side_effect=replay_then_commit):
        summary = de.write_delta_checkpoint(dest)
    assert summary["checkpoint_version"] == 1  # the replayed head, not 2
    # and readback through the (older) checkpoint + newer JSON tail is
    # still exactly the live state
    assert duck_rows(dest) == spark_rows(t)
