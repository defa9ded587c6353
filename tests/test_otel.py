"""Deep List<Struct> nesting stress (FIXTURES.md F5; otel_schema.rs parity)."""

from pyspark.sql import functions as F

from moonlink_spark.schema import field_schema_to_struct
from moonlink_spark.sources.otel import (
    OTEL_LOGS_FIELDS,
    OTEL_LOGS_SCHEMA,
    attr_value,
    flatten_attributes,
    synthesize_logs,
)
from moonlink_spark.table.identity import IdentityProp
from moonlink_spark.table.table import MoonlinkTable


def test_schema_dsl_roundtrip_matches_fixed_schema():
    built = field_schema_to_struct(OTEL_LOGS_FIELDS)
    # same field names/types modulo metadata
    assert [f.name for f in built.fields] == [f.name for f in OTEL_LOGS_SCHEMA.fields]
    assert built["attributes"].dataType.simpleString() == \
        OTEL_LOGS_SCHEMA["attributes"].dataType.simpleString()


def test_ingest_scan_flatten(spark, tmp_path):
    t = MoonlinkTable.create(
        spark, str(tmp_path / "otel"), OTEL_LOGS_FIELDS, IdentityProp.none()
    )
    rows = synthesize_logs(100)
    t.append_rows(rows[:60])
    t.commit(lsn=1)
    t.append_rows(rows[60:])
    t.commit(lsn=2)
    logs = t.scan()
    assert logs.count() == 100
    assert t.scan(lsn=1).count() == 60

    flat = flatten_attributes(logs)
    assert flat.count() == 200  # 2 attrs per log
    svc = (
        flat.filter(F.col("attr_key") == "service")
        .groupBy("attr_value")
        .count()
        .collect()
    )
    assert {r["attr_value"]: r["count"] for r in svc} == {
        "svc0": 34, "svc1": 33, "svc2": 33,
    }

    # no-explode point lookup inside the array
    errors_with_retries = logs.filter(
        (F.col("severity_text") == "ERROR")
        & (attr_value(logs, "retries")["int_value"] >= 3)
    )
    assert errors_with_retries.count() == 10
