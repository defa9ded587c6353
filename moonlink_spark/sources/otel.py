"""OTEL-shaped nested ingestion (logs subset).

Parity with the reference's fixed OTEL schemas
(``src/moonlink_service/src/otel/otel_schema.rs:22-100``): deeply nested
List<Struct> attribute shapes, and — like the whole reference row model — NO
MapType: key-value data is ``array<struct<key, value>>`` (SURVEY.md §1.1).
Append-only (no row identity), matching how the OTEL endpoint ingests.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ANY_VALUE = T.StructType(
    [
        T.StructField("string_value", T.StringType(), True),
        T.StructField("int_value", T.LongType(), True),
        T.StructField("double_value", T.DoubleType(), True),
        T.StructField("bool_value", T.BooleanType(), True),
        T.StructField("bytes_value", T.BinaryType(), True),
    ]
)

_KV = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("value", _ANY_VALUE, True),
    ]
)

OTEL_LOGS_SCHEMA = T.StructType(
    [
        T.StructField("time_unix_nano", T.LongType(), False),
        T.StructField("severity_text", T.StringType(), True),
        T.StructField("body", _ANY_VALUE, True),
        T.StructField("attributes", T.ArrayType(_KV), True),
        T.StructField("resource_attributes", T.ArrayType(_KV), True),
        T.StructField("trace_id", T.BinaryType(), True),
        T.StructField("span_id", T.BinaryType(), True),
    ]
)

OTEL_LOGS_FIELDS = [
    {"name": "time_unix_nano", "data_type": "int64", "nullable": False},
    {"name": "severity_text", "data_type": "string"},
    {
        "name": "body",
        "data_type": "struct",
        "fields": [
            {"name": "string_value", "data_type": "string"},
            {"name": "int_value", "data_type": "int64"},
            {"name": "double_value", "data_type": "float64"},
            {"name": "bool_value", "data_type": "bool"},
            {"name": "bytes_value", "data_type": "binary"},
        ],
    },
    {
        "name": "attributes",
        "data_type": "list",
        "item": {
            "data_type": "struct",
            "fields": [
                {"name": "key", "data_type": "string", "nullable": False},
                {
                    "name": "value",
                    "data_type": "struct",
                    "fields": [
                        {"name": "string_value", "data_type": "string"},
                        {"name": "int_value", "data_type": "int64"},
                        {"name": "double_value", "data_type": "float64"},
                        {"name": "bool_value", "data_type": "bool"},
                        {"name": "bytes_value", "data_type": "binary"},
                    ],
                },
            ],
        },
    },
    {
        "name": "resource_attributes",
        "data_type": "list",
        "item": {
            "data_type": "struct",
            "fields": [
                {"name": "key", "data_type": "string", "nullable": False},
                {
                    "name": "value",
                    "data_type": "struct",
                    "fields": [
                        {"name": "string_value", "data_type": "string"},
                        {"name": "int_value", "data_type": "int64"},
                        {"name": "double_value", "data_type": "float64"},
                        {"name": "bool_value", "data_type": "bool"},
                        {"name": "bytes_value", "data_type": "binary"},
                    ],
                },
            ],
        },
    },
    {"name": "trace_id", "data_type": "binary"},
    {"name": "span_id", "data_type": "binary"},
]


def synthesize_logs(n: int = 100) -> list[dict]:
    """Deterministic OTEL-ish log rows for tests."""
    sevs = ["DEBUG", "INFO", "WARN", "ERROR"]
    out = []
    for i in range(n):
        out.append(
            {
                "time_unix_nano": 1_700_000_000_000_000_000 + i * 1_000_000,
                "severity_text": sevs[i % 4],
                "body": {
                    "string_value": f"log line {i}",
                    "int_value": None,
                    "double_value": None,
                    "bool_value": None,
                    "bytes_value": None,
                },
                "attributes": [
                    {"key": "service", "value": {"string_value": f"svc{i % 3}",
                     "int_value": None, "double_value": None, "bool_value": None,
                     "bytes_value": None}},
                    {"key": "retries", "value": {"string_value": None,
                     "int_value": i % 5, "double_value": None, "bool_value": None,
                     "bytes_value": None}},
                ],
                "resource_attributes": None,
                "trace_id": hashlib.md5(f"trace{i // 10}".encode()).digest(),
                "span_id": hashlib.md5(f"span{i}".encode()).digest()[:8],
            }
        )
    return out


def flatten_attributes(logs: DataFrame) -> DataFrame:
    """Explode the nested kv attribute list into rows — the Spark-side query
    pattern for the reference's list<struct<key,value>> map surrogate."""
    return logs.select(
        "time_unix_nano",
        "severity_text",
        F.explode("attributes").alias("attr"),
    ).select(
        "time_unix_nano",
        "severity_text",
        F.col("attr.key").alias("attr_key"),
        F.coalesce(
            F.col("attr.value.string_value"),
            F.col("attr.value.int_value").cast("string"),
            F.col("attr.value.double_value").cast("string"),
            F.col("attr.value.bool_value").cast("string"),
        ).alias("attr_value"),
    )


def attr_value(logs: DataFrame, key: str):
    """Point-lookup of one attribute key without exploding (filter inside the
    array — stays codegen'd, no shuffle)."""
    return F.element_at(
        F.filter("attributes", lambda kv: kv["key"] == F.lit(key)), 1
    )["value"]
