"""Structured Streaming over the moonlink format: readStream = the
table's CDC feed with LSN offsets (the reference's sync-consumer
contract carried by Spark's checkpointing); writeStream = parallel
staged-parquet appends with one idempotent manifest commit per batch."""

import time

import pytest
from pyspark.sql import types as T

from moonlink_spark.integrations.spark_datasource import (
    MoonlinkCommitMessage,
    MoonlinkStreamWriter,
    register_moonlink_source,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.maintenance import optimize
from moonlink_spark.table.table import MoonlinkTable

FIELDS = [
    {"name": "id", "data_type": "int64", "nullable": False},
    {"name": "v", "data_type": "string"},
]


def _run_to_memory(spark, path, name, start_lsn=None):
    r = spark.readStream.format("moonlink-cdc").option("path", path)
    if start_lsn is not None:
        r = r.option("startLsn", start_lsn)
    q = (
        r.load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_readstream_emits_cdc_events(spark, tmp_path):
    register_moonlink_source(spark)
    path = str(tmp_path / "t")
    t = MoonlinkTable.create(spark, path, FIELDS, IdentityProp.single("id"))
    t.append_rows([{"id": 1, "v": "a"}, {"id": 2, "v": "b"}])
    t.commit(lsn=10)
    t.upsert_rows([{"id": 2, "v": "b2"}])
    t.commit(lsn=20)
    t.delete_rows([{"id": 1}])
    t.commit(lsn=30)
    # layout-only commit: must NOT fabricate events
    optimize(t)

    out = _run_to_memory(spark, path, "cdc_all")
    events = {
        (r["change_type"], r["commit_lsn"], r["id"], r["v"])
        for r in out.collect()
    }
    assert events == {
        ("insert", 10, 1, "a"),
        ("insert", 10, 2, "b"),
        # upsert = delete(old) + insert(new)
        ("delete", 20, 2, "b"),
        ("insert", 20, 2, "b2"),
        ("delete", 30, 1, "a"),
    }


def test_readstream_start_lsn_skips_history(spark, tmp_path):
    register_moonlink_source(spark)
    path = str(tmp_path / "t")
    t = MoonlinkTable.create(spark, path, FIELDS, IdentityProp.single("id"))
    t.append_rows([{"id": 1, "v": "a"}])
    t.commit(lsn=10)
    t.append_rows([{"id": 2, "v": "b"}])
    t.commit(lsn=20)
    out = _run_to_memory(spark, path, "cdc_tail", start_lsn=10)
    assert [(r["change_type"], r["id"]) for r in out.collect()] == [("insert", 2)]


def test_readstream_checkpoint_resumes_from_offset(spark, tmp_path):
    register_moonlink_source(spark)
    path = str(tmp_path / "t")
    cp = str(tmp_path / "cp")
    sink = str(tmp_path / "sink")
    t = MoonlinkTable.create(spark, path, FIELDS, IdentityProp.single("id"))
    t.append_rows([{"id": 1, "v": "a"}])
    t.commit(lsn=10)

    def drain():
        q = (
            spark.readStream.format("moonlink-cdc")
            .option("path", path)
            .load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(120)

    drain()
    t.append_rows([{"id": 2, "v": "b"}])
    t.commit(lsn=20)
    drain()
    rows = spark.read.parquet(sink).collect()
    # each event exactly once across the two runs (offset checkpointed)
    assert sorted((r["commit_lsn"], r["id"]) for r in rows) == [(10, 1), (20, 2)]


def test_writestream_appends_with_single_commit_per_batch(spark, tmp_path):
    register_moonlink_source(spark)
    path = str(tmp_path / "t")
    MoonlinkTable.create(spark, path, FIELDS, IdentityProp.none())
    src = str(tmp_path / "src")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(100)], schema
    ).write.parquet(src)
    q = (
        spark.readStream.schema(schema)
        .parquet(src)
        .writeStream.format("moonlink")
        .option("path", path)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    t = MoonlinkTable.open(spark, path)
    assert t.scan().count() == 100
    m = t.manifest
    assert m.operation == "stream-write"
    assert m.properties["stream_writer_batch"] == 0
    assert m.lsn == 1  # one commit for the whole batch


def test_writestream_rejects_keyed_tables_and_bad_schema(spark, tmp_path):
    path = str(tmp_path / "keyed")
    MoonlinkTable.create(spark, path, FIELDS, IdentityProp.single("id"))
    schema = T.StructType([T.StructField("id", T.LongType(), False),
                           T.StructField("v", T.StringType(), True)])
    with pytest.raises(ValueError, match="append-only"):
        MoonlinkStreamWriter({"path": path}, schema)

    path2 = str(tmp_path / "ao")
    MoonlinkTable.create(spark, path2, FIELDS, IdentityProp.none())
    bad = T.StructType([T.StructField("wrong", T.LongType(), False)])
    with pytest.raises(ValueError, match="schema mismatch"):
        MoonlinkStreamWriter({"path": path2}, bad)


def test_writer_commit_is_batchid_idempotent(spark, tmp_path):
    path = str(tmp_path / "ao")
    MoonlinkTable.create(spark, path, FIELDS, IdentityProp.none())
    schema = T.StructType([T.StructField("id", T.LongType(), False),
                           T.StructField("v", T.StringType(), True)])
    w = MoonlinkStreamWriter({"path": path}, schema)
    # simulate a committed batch 0
    w.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=0)
    t = MoonlinkTable.open(spark, path)
    v1 = t.manifest.version
    # replayed batch 0 after driver restart: no new version
    w.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=0)
    assert MoonlinkTable.open(spark, path).manifest.version == v1


def test_writer_batchid_regression_raises_without_queryid(spark, tmp_path):
    """A fresh-checkpoint restart restarts batch ids at 0; with no
    queryId to scope the marker this must FAIL (not silently unlink the
    staged data as a 'replay') — ADVICE r4."""
    import os

    path = str(tmp_path / "ao")
    MoonlinkTable.create(spark, path, FIELDS, IdentityProp.none())
    schema = T.StructType([T.StructField("id", T.LongType(), False),
                           T.StructField("v", T.StringType(), True)])
    w = MoonlinkStreamWriter({"path": path}, schema)
    w.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=5)
    # stage a real file so we can check it is not silently dropped as data
    staged = "data/stream-regress.parquet"
    os.makedirs(os.path.join(path, "data"), exist_ok=True)
    with open(os.path.join(path, staged), "wb") as fh:
        fh.write(b"x")
    with pytest.raises(RuntimeError, match="regressed"):
        w.commit([MoonlinkCommitMessage(staged, 1, 1)], batchId=0)
    # nothing was committed
    assert MoonlinkTable.open(spark, path).manifest.properties[
        "stream_writer_batch"
    ] == 5


def test_writer_queryid_scopes_idempotence_marker(spark, tmp_path):
    """With queryId set, a NEW stream (fresh checkpoint, ids restart at
    0) commits normally; replays within the SAME query stay idempotent."""
    path = str(tmp_path / "ao")
    MoonlinkTable.create(spark, path, FIELDS, IdentityProp.none())
    schema = T.StructType([T.StructField("id", T.LongType(), False),
                           T.StructField("v", T.StringType(), True)])
    w1 = MoonlinkStreamWriter({"path": path, "queryid": "etl-a"}, schema)
    w1.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=0)
    w1.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=1)
    v = MoonlinkTable.open(spark, path).manifest.version
    # same query replays its last batch: no new version
    w1.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=1)
    assert MoonlinkTable.open(spark, path).manifest.version == v
    # different writer identity: batchId 0 is NOT a replay of etl-a's 0
    w2 = MoonlinkStreamWriter({"path": path, "queryid": "etl-b"}, schema)
    w2.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=0)
    m = MoonlinkTable.open(spark, path).manifest
    assert m.version == v + 1
    assert m.properties["stream_writer_query"] == "etl-b"


def test_readstream_offset_past_retention_fails_loudly(spark, tmp_path):
    from moonlink_spark.integrations.spark_datasource import _cdc_events

    path = str(tmp_path / "t")
    t = MoonlinkTable.create(spark, path, FIELDS, IdentityProp.single("id"))
    for i, lsn in enumerate([10, 20, 30]):
        t.append_rows([{"id": i, "v": "x"}])
        t.commit(lsn=lsn)
    from moonlink_spark.table.maintenance import vacuum

    vacuum(t, keep_versions=1)
    from moonlink_spark.integrations.spark_datasource import _table_arrow_schema

    arrow_schema, _ = _table_arrow_schema(path)
    with pytest.raises(ValueError, match="predates the oldest retained"):
        list(_cdc_events(path, path, 10, 30, arrow_schema))


def test_local_path_batch_read_with_dvs_and_time_travel(spark, tmp_path):
    register_moonlink_source(spark)
    path = str(tmp_path / "t")
    t = MoonlinkTable.create(spark, path, FIELDS, IdentityProp.single("id"))
    t.append_rows([{"id": i, "v": f"v{i}"} for i in range(200)])
    t.commit(lsn=1)
    t.delete_rows([{"id": i} for i in range(0, 200, 2)])
    t.commit(lsn=2)
    # server-less: no RPC server, no backend — manifests + parquet only
    df = spark.read.format("moonlink").option("path", path).load()
    assert df.count() == 100
    assert set(r["id"] % 2 for r in df.collect()) == {1}
    old = (
        spark.read.format("moonlink")
        .option("path", path)
        .option("lsn", 1)
        .load()
    )
    assert old.count() == 200


def test_batch_write_appends_with_one_commit(spark, tmp_path):
    register_moonlink_source(spark)
    path = str(tmp_path / "t")
    MoonlinkTable.create(spark, path, FIELDS, IdentityProp.none())
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(50)], schema
    ).write.format("moonlink").mode("append").option("path", path).save()
    t = MoonlinkTable.open(spark, path)
    assert t.scan().count() == 50
    assert t.manifest.operation == "batch-write"
    assert t.manifest.lsn == 1
    # round trip: the local-path reader sees the batch-written rows
    df = spark.read.format("moonlink").option("path", path).load()
    assert df.count() == 50


def test_local_batch_read_pushdown_prunes_partitions(spark, tmp_path):
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from moonlink_spark.integrations.spark_datasource import (
        MoonlinkDataSourceReader,
    )

    register_moonlink_source(spark)
    path = str(tmp_path / "t")
    t = MoonlinkTable.create(spark, path, FIELDS, IdentityProp.single("id"))
    # 4 commits -> at least 4 files with disjoint id ranges in the stats
    for b in range(4):
        t.append_rows([{"id": b * 100 + i, "v": "x"} for i in range(100)])
        t.commit(lsn=b + 1)

    reader = MoonlinkDataSourceReader({"path": path})
    total = len(reader.partitions())
    assert total >= 4
    # point filter: stats prune to the single covering file
    remaining = reader.pushFilters([EqualTo(("id",), 105)])
    assert list(remaining)  # everything handed back for Spark to re-apply
    assert len(reader.partitions()) == 1
    # range filter
    reader.pushFilters([GreaterThan(("id",), 299)])
    assert len(reader.partitions()) == 1
    # and the full read still returns the right rows (Spark re-filters)
    df = (
        spark.read.format("moonlink")
        .option("path", path)
        .load()
        .filter("id = 105")
    )
    assert [r["id"] for r in df.collect()] == [105]


def test_writer_interleaved_queryids_each_keep_their_floor(spark, tmp_path):
    """Two writers with different queryIds interleaving commits on one
    table: each identity tracks its OWN last-batch floor (the per-queryId
    marker map), so a replayed batch from either writer is suppressed even
    right after the other writer committed — ADVICE r5."""
    path = str(tmp_path / "ao")
    MoonlinkTable.create(spark, path, FIELDS, IdentityProp.none())
    schema = T.StructType([T.StructField("id", T.LongType(), False),
                           T.StructField("v", T.StringType(), True)])
    a = MoonlinkStreamWriter({"path": path, "queryid": "etl-a"}, schema)
    b = MoonlinkStreamWriter({"path": path, "queryid": "etl-b"}, schema)
    a.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=0)
    b.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=0)
    a.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=1)
    b.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=1)
    v = MoonlinkTable.open(spark, path).manifest.version
    # replays of the last batch from BOTH writers: no new versions
    a.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=1)
    b.commit([MoonlinkCommitMessage(None, 0, 0)], batchId=1)
    m = MoonlinkTable.open(spark, path).manifest
    assert m.version == v
    assert m.properties["stream_writer_batches"] == {"etl-a": 1, "etl-b": 1}


def test_kafka_jvm_reader_option_translation():
    """The documented production swap-out: moonlink-kafka options map
    mechanically onto the JVM format("kafka") option map (explicit
    assign, per-partition starting offsets)."""
    import json

    from moonlink_spark.integrations.spark_datasource import (
        kafka_jvm_reader_options,
    )

    out = kafka_jvm_reader_options(
        {"host": "broker1", "port": "9092", "topic": "t",
         "partitions": "0,2", "startingOffsets": "latest"}
    )
    assert out["kafka.bootstrap.servers"] == "broker1:9092"
    assert json.loads(out["assign"]) == {"t": [0, 2]}
    assert out["startingOffsets"] == "latest"
    assert "__from_avro__" not in out

    # integer offset expands per partition; avro schema rides along for
    # the from_avro(col("value"), schema) step
    out = kafka_jvm_reader_options(
        {"port": 9092, "topic": "t", "partitions": "1",
         "startingOffsets": "42", "valueAvroSchema": '{"type":"record"}'}
    )
    assert json.loads(out["startingOffsets"]) == {"t": {"1": 42}}
    assert out["__from_avro__"] == '{"type":"record"}'
    assert out["kafka.bootstrap.servers"] == "127.0.0.1:9092"


def test_kafka_jvm_reader_options_accepted_by_jvm_source(spark, tmp_path):
    """VERDICT r7 #6: actually FEED the translated options to
    ``spark.readStream.format("kafka")`` against the in-process broker
    (plaintext leg). With the kafka connector jars on the classpath the
    stream must load with the canonical (key, value, topic, partition,
    offset, ...) schema and value-match a small feed read through the
    Python source; without the jars (this container ships none) the
    failure must be the DATA-SOURCE LOOKUP — proving no option in the
    translated map is what breaks the swap — and the option shapes are
    pinned against the JVM source's documented contract."""
    import json

    from pyspark.errors import AnalysisException

    from moonlink_spark.integrations.spark_datasource import (
        kafka_jvm_reader_options,
    )
    from moonlink_spark.sources.kafka_wire import (
        KafkaWireBroker,
        KafkaWireProducer,
    )

    broker = KafkaWireBroker(str(tmp_path / "kafka-logs")).start()
    try:
        prod = KafkaWireProducer(broker.host, broker.port)
        feed = [(b"k%d" % i, b"v%d" % i) for i in range(10)]
        prod.send("jvmswap", feed)
        prod.close()

        raw = {
            "host": broker.host,
            "port": broker.port,
            "topic": "jvmswap",
            "partitions": "0",
            "startingOffsets": "earliest",
        }
        opts = kafka_jvm_reader_options(raw)
        # contract pins (spark.apache.org structured-streaming-kafka):
        # assign = JSON {topic: [partition...]}; startingOffsets keyword
        # or {topic: {partition: offset}}; bootstrap as host:port
        assert json.loads(opts["assign"]) == {"jvmswap": [0]}
        assert opts["startingOffsets"] in ("earliest", "latest") or (
            json.loads(opts["startingOffsets"])
        )
        host, port = opts["kafka.bootstrap.servers"].rsplit(":", 1)
        assert host == broker.host and int(port) == broker.port
        assert not any(k.startswith("__") for k in opts if k != "__from_avro__")

        try:
            sdf = (
                spark.readStream.format("kafka")
                .options(**{k: v for k, v in opts.items() if not k.startswith("__")})
                .load()
            )
        except AnalysisException as e:
            # the only acceptable failure is the connector jar being
            # absent — an option-shape rejection would name the option
            msg = str(e)
            assert "Failed to find" in msg and "kafka" in msg.lower(), (
                f"JVM source rejected the translated options: {msg}"
            )
            pytest.skip(
                "spark-sql-kafka connector jar not on this classpath; "
                "option map validated shape-only (lookup failed before "
                "any option was parsed)"
            )

        # jar present: the swapped stream must carry the canonical kafka
        # schema and value-match the Python source's read of the feed
        names = set(sdf.schema.fieldNames())
        assert {"key", "value", "topic", "partition", "offset"} <= names
        out = str(tmp_path / "jvm-out")
        q = (
            sdf.selectExpr("CAST(key AS STRING) k", "CAST(value AS STRING) v")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "jvm-ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        got = {
            (r["k"], r["v"]) for r in spark.read.parquet(out).collect()
        }
        assert got == {(k.decode(), v.decode()) for k, v in feed}
    finally:
        broker.stop()


def test_empty_table_and_fully_pruned_reads_return_zero_rows(spark, tmp_path):
    """Review finding (r9): pyspark substitutes [None] when partitions()
    is empty and calls read(None) — an empty table or a filter whose
    stats prune every file crashed with AttributeError instead of
    returning an empty DataFrame."""
    register_moonlink_source(spark)
    path = str(tmp_path / "t")
    t = MoonlinkTable.create(spark, path, FIELDS, IdentityProp.single("id"))
    # empty table: no data files at all
    df = spark.read.format("moonlink").option("path", path).load()
    assert df.count() == 0
    # all files pruned by the pushed filter's stats
    t.append_rows([{"id": i, "v": "x"} for i in range(10)])
    t.commit(lsn=1)
    df = (
        spark.read.format("moonlink")
        .option("path", path)
        .load()
        .filter("id > 1000")
    )
    assert df.count() == 0


def test_sink_rejects_type_mismatched_input(spark, tmp_path):
    """Review finding (r9): the sink validated only column NAMES and
    staged parquet with the input's types, so a string 'id' against an
    int64 table committed a file that poisoned every later scan. Staging
    now builds against the TABLE schema and fails loud in write()."""
    register_moonlink_source(spark)
    path = str(tmp_path / "t")
    MoonlinkTable.create(spark, path, FIELDS, IdentityProp.none())
    bad = spark.createDataFrame(
        [("not-a-number", "v0")],
        T.StructType(
            [
                T.StructField("id", T.StringType(), False),
                T.StructField("v", T.StringType(), True),
            ]
        ),
    )
    with pytest.raises(Exception, match="(?i)convert|cast|invalid|type"):
        bad.write.format("moonlink").mode("append").option(
            "path", path
        ).save()
    # nothing committed, table still scans clean
    t = MoonlinkTable.open(spark, path)
    assert t.scan().count() == 0
    assert t.manifest.version == 0
    # compatible values through a differently-typed frame still land
    ok = spark.createDataFrame(
        [(7, "v7")],
        T.StructType(
            [
                T.StructField("id", T.IntegerType(), False),  # int32 -> int64
                T.StructField("v", T.StringType(), True),
            ]
        ),
    )
    ok.write.format("moonlink").mode("append").option("path", path).save()
    assert MoonlinkTable.open(spark, path).scan().count() == 1


def test_sink_written_files_carry_stats_and_prune(spark, tmp_path):
    """Review finding (r9): sink commits built FileEntry without footer
    stats, so sink-written files were permanently unprunable."""
    register_moonlink_source(spark)
    path = str(tmp_path / "t")
    MoonlinkTable.create(spark, path, FIELDS, IdentityProp.none())
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    spark.createDataFrame(
        [(i, "x") for i in range(100)], schema
    ).coalesce(1).write.format("moonlink").mode("append").option(
        "path", path
    ).save()
    t = MoonlinkTable.open(spark, path)
    entries = [f for f in t.manifest.data_files]
    assert entries and all(e.stats for e in entries), "sink files lack stats"
    assert entries[0].stats["id"] == [0, 99]


def test_cdc_event_order_matches_table_semantics(spark, tmp_path):
    """Review r10: within a commit, deletes targeting PRE-EXISTING files
    (an upsert's delete-old) must come BEFORE the inserts, and deletes
    targeting the commit's OWN new files (in-txn insert-then-delete)
    AFTER them — a sequential keyed applier then reproduces the table
    state for both shapes. Inserts-first replayed an upsert as
    insert-then-delete, leaving the key absent downstream."""
    from pyspark.sql.pandas.types import to_arrow_schema

    from moonlink_spark.integrations.spark_datasource import _cdc_events
    from moonlink_spark.schema import field_schema_to_struct

    path = str(tmp_path / "t")
    t = MoonlinkTable.create(spark, path, FIELDS, IdentityProp.single("id"))
    t.append_rows([{"id": 1, "v": "a"}])
    t.commit(lsn=10)
    # one-commit upsert: delete(old 1) + insert(new 1)
    t.upsert_rows([{"id": 1, "v": "a2"}])
    t.commit(lsn=20)
    # one-commit insert-then-delete of the same NEW key
    t.append_rows([{"id": 5, "v": "x"}])
    t.delete_rows([{"id": 5}])
    t.commit(lsn=30)

    arrow_schema = to_arrow_schema(field_schema_to_struct(FIELDS))
    events = list(_cdc_events(path, path, 0, 99, arrow_schema))
    # sequential keyed replay must end in the table's final state
    state: dict = {}
    for ev in events:
        op, _lsn, key, v = ev[0], ev[1], ev[2], ev[3]
        if op == "insert":
            state[key] = v
        else:
            state.pop(key, None)
    want = {r.id: r.v for r in t.scan().collect()}
    assert state == want == {1: "a2"}
    # the lsn=20 commit orders delete(old) BEFORE insert(new)
    c20 = [e for e in events if e[1] == 20]
    assert [e[0] for e in c20] == ["delete", "insert"]
    assert c20[0][3] == "a" and c20[1][3] == "a2"
    # the lsn=30 commit orders insert BEFORE its own-file delete
    c30 = [e for e in events if e[1] == 30]
    assert [e[0] for e in c30] == ["insert", "delete"]
