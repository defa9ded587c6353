import pytest

from pyspark.sql import functions as F

from moonlink_spark.schema import field_schema_to_struct
from moonlink_spark.sources.formats import (
    avro_available,
    parse_json_rows,
    protobuf_available,
)


def test_parse_json_rows_distributed(spark):
    schema = field_schema_to_struct(
        [
            {"name": "id", "data_type": "int64"},
            {"name": "name", "data_type": "string"},
            {"name": "tags", "data_type": "list", "item": {"data_type": "string"}},
        ]
    )
    df = spark.createDataFrame(
        [('{"id": 1, "name": "a", "tags": ["x","y"]}',),
         ('{"id": 2, "name": "b", "tags": []}',)],
        "payload string",
    )
    out = parse_json_rows(df, "payload", schema).orderBy("id").collect()
    assert [tuple(r) for r in out] == [(1, "a", ["x", "y"]), (2, "b", [])]


def test_avro_gating(spark):
    # this environment lacks the spark-avro datasource jar; the gate must
    # report that honestly (on a cluster with the jar it flips to True and
    # from_avro_rows works unchanged)
    assert avro_available(spark) is False


def test_protobuf_gating():
    assert protobuf_available() is False


def test_kafka_gating(spark, tmp_path):
    """Kafka source is availability-gated like avro: without the jar the
    ingestor fails with a clear message instead of an opaque load error."""
    import pytest

    from moonlink_spark.sources.formats import kafka_available
    from moonlink_spark.streaming.pipeline import StreamingIngestor
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "kafka_t"),
        [{"name": "id", "data_type": "int64", "nullable": False}],
        IdentityProp.single("id"),
    )
    with pytest.raises(ValueError):
        StreamingIngestor(t)  # neither source given
    with pytest.raises(ValueError):
        StreamingIngestor(t, source_dir="x", kafka_topic="y")  # both given
    ing = StreamingIngestor(
        t, checkpoint_dir=str(tmp_path / "ck"),
        kafka_bootstrap="localhost:9092", kafka_topic="cdc",
    )
    if not kafka_available(spark):
        with pytest.raises(RuntimeError, match="spark-sql-kafka"):
            ing.start()
