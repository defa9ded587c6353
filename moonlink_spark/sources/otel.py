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


# --------------------------------------------------------------------------- #
# metrics / traces row schemas
# --------------------------------------------------------------------------- #

_ATTRS_FIELD_DSL = {
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
}


def _attrs(name: str) -> dict:
    return {"name": name, **_ATTRS_FIELD_DSL}


# Unified Gauge/Sum/Histogram datapoint rows, one row per point — parity
# otlp_metrics_gsh_schema (otel_schema.rs:124-297). entity_refs and
# exemplars are omitted (never populated by the reference's JSON tests);
# every scalar field and attribute list is carried.
OTEL_METRICS_FIELDS = [
    {"name": "kind", "data_type": "string", "nullable": False},
    _attrs("resource_attributes"),
    {"name": "resource_dropped_attributes_count", "data_type": "int64"},
    {"name": "resource_schema_url", "data_type": "string"},
    {"name": "scope_name", "data_type": "string"},
    {"name": "scope_version", "data_type": "string"},
    _attrs("scope_attributes"),
    {"name": "scope_dropped_attributes_count", "data_type": "int64"},
    {"name": "scope_schema_url", "data_type": "string"},
    {"name": "metric_name", "data_type": "string", "nullable": False},
    {"name": "metric_description", "data_type": "string"},
    {"name": "metric_unit", "data_type": "string"},
    {"name": "start_time_unix_nano", "data_type": "int64"},
    {"name": "time_unix_nano", "data_type": "int64", "nullable": False},
    _attrs("point_attributes"),
    {"name": "point_dropped_attributes_count", "data_type": "int64"},
    # number points (gauge/sum)
    {"name": "number_int", "data_type": "int64"},
    {"name": "number_double", "data_type": "float64"},
    {"name": "temporality", "data_type": "int32"},
    {"name": "is_monotonic", "data_type": "bool"},
    # histogram points
    {"name": "hist_count", "data_type": "int64"},
    {"name": "hist_sum", "data_type": "float64"},
    {"name": "hist_min", "data_type": "float64"},
    {"name": "hist_max", "data_type": "float64"},
    {"name": "explicit_bounds", "data_type": "list",
     "item": {"data_type": "float64"}},
    {"name": "bucket_counts", "data_type": "list",
     "item": {"data_type": "int64"}},
]

# One row per span. The reference serves only /v1/metrics today; the span
# row shape follows the same flattening conventions (resource+scope columns
# inline, attributes as kv lists) applied to the OTLP trace datamodel.
OTEL_SPANS_FIELDS = [
    {"name": "trace_id", "data_type": "binary", "nullable": False},
    {"name": "span_id", "data_type": "binary", "nullable": False},
    {"name": "parent_span_id", "data_type": "binary"},
    {"name": "name", "data_type": "string", "nullable": False},
    {"name": "span_kind", "data_type": "int32"},
    {"name": "start_time_unix_nano", "data_type": "int64", "nullable": False},
    {"name": "end_time_unix_nano", "data_type": "int64"},
    _attrs("attributes"),
    {"name": "status_code", "data_type": "int32"},
    {"name": "status_message", "data_type": "string"},
    _attrs("resource_attributes"),
    {"name": "scope_name", "data_type": "string"},
]


# --------------------------------------------------------------------------- #
# OTLP/JSON decoding (camelCase keys, int64-as-string, hex trace/span ids)
# --------------------------------------------------------------------------- #


def _otlp_int(v) -> int | None:
    """OTLP/JSON encodes int64 as a decimal string; accept both."""
    if v is None:
        return None
    return int(v)


def _otlp_hex(v) -> bytes | None:
    if v is None or v == "":
        return None
    return bytes.fromhex(v)


def _otlp_any_value(v: dict | None) -> dict | None:
    """OTLP AnyValue -> the 5-slot struct of _ANY_VALUE."""
    if v is None:
        return None
    import base64

    out = {"string_value": None, "int_value": None, "double_value": None,
           "bool_value": None, "bytes_value": None}
    if "stringValue" in v:
        out["string_value"] = v["stringValue"]
    elif "intValue" in v:
        out["int_value"] = _otlp_int(v["intValue"])
    elif "doubleValue" in v:
        out["double_value"] = float(v["doubleValue"])
    elif "boolValue" in v:
        out["bool_value"] = bool(v["boolValue"])
    elif "bytesValue" in v:
        out["bytes_value"] = base64.b64decode(v["bytesValue"])
    return out


def _otlp_attrs(attrs: list | None) -> list | None:
    if attrs is None:
        return None
    return [
        {"key": kv["key"], "value": _otlp_any_value(kv.get("value"))}
        for kv in attrs
    ]


def decode_otlp_logs(payload: dict) -> list[dict]:
    """ExportLogsServiceRequest (OTLP/JSON) -> OTEL_LOGS_FIELDS rows,
    one per logRecord."""
    rows = []
    for rl in payload.get("resourceLogs", []):
        res_attrs = _otlp_attrs(rl.get("resource", {}).get("attributes"))
        for sl in rl.get("scopeLogs", []):
            for rec in sl.get("logRecords", []):
                rows.append(
                    {
                        "time_unix_nano": _otlp_int(rec.get("timeUnixNano")) or 0,
                        "severity_text": rec.get("severityText"),
                        "body": _otlp_any_value(rec.get("body")),
                        "attributes": _otlp_attrs(rec.get("attributes")),
                        "resource_attributes": res_attrs,
                        "trace_id": _otlp_hex(rec.get("traceId")),
                        "span_id": _otlp_hex(rec.get("spanId")),
                    }
                )
    return rows


def decode_otlp_metrics(payload: dict) -> list[dict]:
    """ExportMetricsServiceRequest (OTLP/JSON) -> OTEL_METRICS_FIELDS rows,
    one per datapoint — parity with the reference's /v1/metrics handler
    (otel/service.rs:51, metrics_handler.rs): gauge/sum/histogram points
    flatten into one unified table."""
    rows = []
    for rm in payload.get("resourceMetrics", []):
        res = rm.get("resource", {})
        base_res = {
            "resource_attributes": _otlp_attrs(res.get("attributes")),
            "resource_dropped_attributes_count": _otlp_int(
                res.get("droppedAttributesCount")
            ),
            "resource_schema_url": rm.get("schemaUrl"),
        }
        for sm in rm.get("scopeMetrics", []):
            scope = sm.get("scope", {})
            base_scope = {
                "scope_name": scope.get("name"),
                "scope_version": scope.get("version"),
                "scope_attributes": _otlp_attrs(scope.get("attributes")),
                "scope_dropped_attributes_count": _otlp_int(
                    scope.get("droppedAttributesCount")
                ),
                "scope_schema_url": sm.get("schemaUrl"),
            }
            for metric in sm.get("metrics", []):
                base_m = {
                    "metric_name": metric.get("name", ""),
                    "metric_description": metric.get("description"),
                    "metric_unit": metric.get("unit"),
                }

                def point_base(p):
                    return {
                        **base_res,
                        **base_scope,
                        **base_m,
                        "start_time_unix_nano": _otlp_int(
                            p.get("startTimeUnixNano")
                        ),
                        "time_unix_nano": _otlp_int(p.get("timeUnixNano")) or 0,
                        "point_attributes": _otlp_attrs(p.get("attributes")),
                        "point_dropped_attributes_count": _otlp_int(
                            p.get("droppedAttributesCount")
                        ),
                        "number_int": None, "number_double": None,
                        "temporality": None, "is_monotonic": None,
                        "hist_count": None, "hist_sum": None,
                        "hist_min": None, "hist_max": None,
                        "explicit_bounds": None, "bucket_counts": None,
                    }

                def number_fields(p):
                    return {
                        "number_int": _otlp_int(p.get("asInt")),
                        "number_double": (
                            float(p["asDouble"]) if "asDouble" in p else None
                        ),
                    }

                if "gauge" in metric:
                    for p in metric["gauge"].get("dataPoints", []):
                        rows.append(
                            {**point_base(p), "kind": "gauge", **number_fields(p)}
                        )
                elif "sum" in metric:
                    s = metric["sum"]
                    for p in s.get("dataPoints", []):
                        rows.append(
                            {
                                **point_base(p),
                                "kind": "sum",
                                **number_fields(p),
                                "temporality": _otlp_int(
                                    s.get("aggregationTemporality")
                                ),
                                "is_monotonic": s.get("isMonotonic"),
                            }
                        )
                elif "histogram" in metric:
                    h = metric["histogram"]
                    for p in h.get("dataPoints", []):
                        rows.append(
                            {
                                **point_base(p),
                                "kind": "histogram",
                                "temporality": _otlp_int(
                                    h.get("aggregationTemporality")
                                ),
                                "hist_count": _otlp_int(p.get("count")),
                                "hist_sum": (
                                    float(p["sum"]) if "sum" in p else None
                                ),
                                "hist_min": (
                                    float(p["min"]) if "min" in p else None
                                ),
                                "hist_max": (
                                    float(p["max"]) if "max" in p else None
                                ),
                                "explicit_bounds": [
                                    float(b)
                                    for b in p.get("explicitBounds", [])
                                ] or None,
                                "bucket_counts": [
                                    _otlp_int(c)
                                    for c in p.get("bucketCounts", [])
                                ] or None,
                            }
                        )
    return rows


def decode_otlp_traces(payload: dict) -> list[dict]:
    """ExportTraceServiceRequest (OTLP/JSON) -> OTEL_SPANS_FIELDS rows,
    one per span."""
    rows = []
    for rs in payload.get("resourceSpans", []):
        res_attrs = _otlp_attrs(rs.get("resource", {}).get("attributes"))
        for ss in rs.get("scopeSpans", []):
            scope_name = ss.get("scope", {}).get("name")
            for sp in ss.get("spans", []):
                status = sp.get("status", {})
                rows.append(
                    {
                        "trace_id": _otlp_hex(sp.get("traceId")) or b"",
                        "span_id": _otlp_hex(sp.get("spanId")) or b"",
                        "parent_span_id": _otlp_hex(sp.get("parentSpanId")),
                        "name": sp.get("name", ""),
                        "span_kind": _otlp_int(sp.get("kind")),
                        "start_time_unix_nano": _otlp_int(
                            sp.get("startTimeUnixNano")
                        ) or 0,
                        "end_time_unix_nano": _otlp_int(sp.get("endTimeUnixNano")),
                        "attributes": _otlp_attrs(sp.get("attributes")),
                        "status_code": _otlp_int(status.get("code")),
                        "status_message": status.get("message"),
                        "resource_attributes": res_attrs,
                        "scope_name": scope_name,
                    }
                )
    return rows


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
