"""Avro-schema and protobuf-row converter parity tests.

Mirrors the reference's converter tests
(``avro_converter.rs`` tests + ``proto_converter.rs`` round-trips): the
type-mapping rules are pure metadata, so they are fully exercisable without
the spark-avro / protobuf jars.
"""

import datetime as dt
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from moonlink_spark.sources.converters import (
    AvroSchemaError,
    PDecimal,
    PFixed,
    PInt32,
    PStruct,
    ProtoDecodeError,
    avro_schema_to_struct,
    decode_moonlink_row,
    encode_moonlink_row,
    proto_bytes_to_row,
    proto_values_to_row,
)

# --------------------------------------------------------------------------- #
# Avro schema mapping (parity: avro_converter.rs convert_avro_to_arrow_schema)
# --------------------------------------------------------------------------- #


def test_avro_primitives_and_union_nullability():
    s = avro_schema_to_struct(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "b", "type": "boolean"},
                {"name": "i", "type": "int"},
                {"name": "l", "type": "long"},
                {"name": "f", "type": "float"},
                {"name": "d", "type": "double"},
                {"name": "by", "type": "bytes"},
                {"name": "s", "type": "string"},
                {"name": "opt", "type": ["null", "long"]},
                {"name": "opt2", "type": ["int", "null"]},
            ],
        }
    )
    # primitives map 1:1 and are non-nullable unless unioned with null
    assert s["b"].dataType == T.BooleanType() and not s["b"].nullable
    assert s["i"].dataType == T.IntegerType() and not s["i"].nullable
    assert s["l"].dataType == T.LongType()
    assert s["f"].dataType == T.FloatType()
    assert s["d"].dataType == T.DoubleType()
    assert s["by"].dataType == T.BinaryType()
    assert s["s"].dataType == T.StringType()
    assert s["opt"].dataType == T.LongType() and s["opt"].nullable
    assert s["opt2"].dataType == T.IntegerType() and s["opt2"].nullable


def test_avro_logical_types():
    s = avro_schema_to_struct(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "ts", "type": {"type": "long", "logicalType": "timestamp-micros"}},
                {"name": "tsm", "type": {"type": "long", "logicalType": "timestamp-millis"}},
                {"name": "lts", "type": {"type": "long", "logicalType": "local-timestamp-micros"}},
                {"name": "day", "type": {"type": "int", "logicalType": "date"}},
                {"name": "t64", "type": {"type": "long", "logicalType": "time-micros"}},
                {"name": "dec", "type": {"type": "bytes", "logicalType": "decimal",
                                          "precision": 15, "scale": 4}},
                {"name": "decf", "type": {"type": "fixed", "name": "d16", "size": 16,
                                           "logicalType": "decimal", "precision": 38, "scale": 10}},
                {"name": "uid", "type": {"type": "string", "logicalType": "uuid"}},
            ],
        }
    )
    assert s["ts"].dataType == T.TimestampType()
    assert s["tsm"].dataType == T.TimestampType()  # canonicalized to µs
    assert s["lts"].dataType == T.TimestampNTZType()
    assert s["day"].dataType == T.DateType()
    assert s["t64"].dataType == T.LongType()  # µs-since-midnight as int64
    assert s["dec"].dataType == T.DecimalType(15, 4)
    assert s["decf"].dataType == T.DecimalType(38, 10)
    assert s["uid"].dataType == T.StringType()


def test_avro_complex_types():
    s = avro_schema_to_struct(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "tags", "type": {"type": "array", "items": "string"}},
                {"name": "opt_tags", "type": {"type": "array", "items": ["null", "int"]}},
                {"name": "attrs", "type": {"type": "map", "values": "long"}},
                {"name": "nested", "type": {
                    "type": "record", "name": "inner",
                    "fields": [{"name": "x", "type": "int"},
                               {"name": "y", "type": ["null", "string"]}]}},
                {"name": "fx", "type": {"type": "fixed", "name": "f8", "size": 8}},
            ],
        }
    )
    assert s["tags"].dataType == T.ArrayType(T.StringType(), False)
    assert s["opt_tags"].dataType == T.ArrayType(T.IntegerType(), True)
    # reference parity: avro map -> list<struct<key,value>>, NOT MapType
    # (avro_converter.rs:172-201 flattens maps to entry lists)
    assert s["attrs"].dataType == T.ArrayType(
        T.StructType(
            [
                T.StructField("key", T.StringType(), False),
                T.StructField("value", T.LongType(), False),
            ]
        ),
        False,
    )
    inner = s["nested"].dataType
    assert isinstance(inner, T.StructType)
    assert inner["x"].dataType == T.IntegerType() and not inner["x"].nullable
    assert inner["y"].dataType == T.StringType() and inner["y"].nullable
    assert s["fx"].dataType == T.BinaryType()


def test_avro_rejections():
    # top level must be a record
    with pytest.raises(AvroSchemaError):
        avro_schema_to_struct('{"type": "array", "items": "int"}')
    # complex unions unsupported (avro_converter.rs:195-223)
    with pytest.raises(AvroSchemaError):
        avro_schema_to_struct(
            {"type": "record", "name": "r",
             "fields": [{"name": "u", "type": ["null", "int", "string"]}]}
        )
    with pytest.raises(AvroSchemaError):
        avro_schema_to_struct(
            {"type": "record", "name": "r",
             "fields": [{"name": "u", "type": ["int", "string"]}]}
        )
    # enums map to their symbol text (r4: matches the reference's
    # PG-enum -> Utf8 mapping, pg_replicate/util.rs:149)
    st = avro_schema_to_struct(
        {"type": "record", "name": "r",
         "fields": [{"name": "e", "type": {"type": "enum", "name": "E",
                                            "symbols": ["A"]}}]}
    )
    assert st["e"].dataType.typeName() == "string"
    # decimal bounds
    with pytest.raises(AvroSchemaError):
        avro_schema_to_struct(
            {"type": "record", "name": "r",
             "fields": [{"name": "d", "type": {"type": "bytes",
                                                "logicalType": "decimal",
                                                "precision": 99, "scale": 0}}]}
        )


def test_avro_accepts_json_string():
    s = avro_schema_to_struct(
        '{"type":"record","name":"r","fields":[{"name":"x","type":"long"}]}'
    )
    assert s == T.StructType([T.StructField("x", T.LongType(), False)])


# --------------------------------------------------------------------------- #
# proto3 MoonlinkRow codec (parity: row.proto + proto_converter.rs)
# --------------------------------------------------------------------------- #


def test_proto_roundtrip_all_kinds():
    values = [
        PInt32(42),
        PInt32(-7),            # negative int32: 10-byte varint on the wire
        1_767_225_600_000_001,  # int64 µs timestamp
        -123456789,
        3.5,                    # float64
        True,
        False,
        b"moonlink",
        PFixed(bytes(range(16))),
        PDecimal(123450000),    # 12345.0000 at scale 4
        PDecimal(-1),
        [PInt32(1), PInt32(2), PInt32(3)],
        PStruct([b"inner", 99]),
        None,
    ]
    data = encode_moonlink_row(values)
    out = decode_moonlink_row(data)
    assert out == values
    # tag-level types survive (int32 vs int64, fixed vs bytes, struct vs array)
    assert isinstance(out[0], PInt32) and isinstance(out[2], int)
    assert isinstance(out[8], PFixed) and isinstance(out[7], bytes)
    assert isinstance(out[12], PStruct) and not isinstance(out[11], PStruct)


def test_proto_decode_errors():
    with pytest.raises(ProtoDecodeError):
        decode_moonlink_row(b"\x0a\x05\x01")  # truncated RowValue
    with pytest.raises(ProtoDecodeError):
        decode_moonlink_row(b"\x0a\x00")  # empty RowValue: kind required
    # decimal must be exactly 16 bytes (proto_converter.rs:56-60)
    bad_decimal = b"\x0a\x04" + b"\x2a\x02" + b"\x00\x00"
    with pytest.raises(ProtoDecodeError):
        decode_moonlink_row(bad_decimal)


def test_proto_bind_to_schema():
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), False),
            T.StructField("ts", T.TimestampNTZType(), True),
            T.StructField("day", T.DateType(), True),
            T.StructField("amount", T.DecimalType(15, 4), True),
            T.StructField("uid", T.StringType(), True),
            T.StructField("name", T.StringType(), True),
            T.StructField("tags", T.ArrayType(T.LongType()), True),
            T.StructField(
                "pos",
                T.StructType(
                    [
                        T.StructField("x", T.DoubleType(), False),
                        T.StructField("y", T.DoubleType(), False),
                    ]
                ),
                True,
            ),
        ]
    )
    u = PFixed(b"\x12\x34\x56\x78" * 4)
    values = [
        PInt32(7),
        1_767_225_600_000_001,           # µs -> exact microsecond
        PInt32(20_000),                  # days since epoch
        PDecimal(123450000),             # -> 12345.0000
        u,                               # 16-byte uuid
        b"doc-7",
        [1, 2, 3],
        PStruct([1.5, -2.5]),
    ]
    row = proto_bytes_to_row(encode_moonlink_row(values), schema)
    assert row["id"] == 7
    assert row["ts"] == dt.datetime(2026, 1, 1, 0, 0, 0, 1)
    assert row["day"] == dt.date(1970, 1, 1) + dt.timedelta(days=20000)
    assert row["amount"] == Decimal("12345.0000")
    assert row["uid"] == "12345678-1234-5678-1234-567812345678"
    assert row["name"] == "doc-7"
    assert row["tags"] == [1, 2, 3]
    assert row["pos"] == {"x": 1.5, "y": -2.5}


def test_proto_bind_rejects_mismatches():
    schema = T.StructType([T.StructField("id", T.IntegerType(), False)])
    with pytest.raises(ProtoDecodeError):
        proto_values_to_row([PInt32(1), PInt32(2)], schema)  # arity
    with pytest.raises(ProtoDecodeError):
        proto_values_to_row([b"nope"], schema)  # bytes into int field
    ts_schema = T.StructType([T.StructField("ts", T.TimestampType(), True)])
    with pytest.raises(ProtoDecodeError):
        proto_values_to_row([True], ts_schema)  # bool into timestamp


def test_proto_ingest_end_to_end(spark, tmp_path):
    """Decoded proto rows feed MoonlinkTable.append_rows — the full
    reference proto ingest path, minus only the gRPC transport."""
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    t = MoonlinkTable.create(
        spark,
        str(tmp_path / "proto_t"),
        [
            {"name": "id", "data_type": "int32", "nullable": False},
            {"name": "ts", "data_type": "timestamp_ntz"},
            {"name": "amount", "data_type": "decimal(15,4)"},
        ],
        IdentityProp.single("id"),
    )
    rows = [
        proto_bytes_to_row(
            encode_moonlink_row([PInt32(i), i * 1_000_000, PDecimal(i * 10000)]),
            t.schema,
        )
        for i in range(5)
    ]
    t.append_rows(rows)
    t.commit(lsn=1)
    got = {r["id"]: (r["ts"], r["amount"]) for r in t.scan().collect()}
    assert got[3] == (dt.datetime(1970, 1, 1, 0, 0, 3), Decimal("3.0000"))
    assert len(got) == 5


def test_avro_schema_creates_live_table(spark, tmp_path):
    """An Avro-declared schema drives table creation + JSON ingest: the
    two format front-ends share one table path."""
    from moonlink_spark.ingest.json_convert import convert_row
    from moonlink_spark.table.identity import IdentityProp
    from moonlink_spark.table.table import MoonlinkTable

    struct = avro_schema_to_struct(
        {
            "type": "record",
            "name": "ev",
            "fields": [
                {"name": "id", "type": "long"},
                {"name": "ts", "type": {"type": "long",
                                         "logicalType": "local-timestamp-micros"}},
                {"name": "note", "type": ["null", "string"]},
            ],
        }
    )
    t = MoonlinkTable.create(
        spark, str(tmp_path / "avro_t"), struct, IdentityProp.single("id")
    )
    t.append_rows([convert_row({"id": 1, "ts": 1_500_000, "note": None}, t.schema)])
    t.commit(lsn=1)
    [r] = t.scan().collect()
    assert r["ts"] == dt.datetime(1970, 1, 1, 0, 0, 1, 500000)
