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
