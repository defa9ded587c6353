"""Schema DSL: JSON ``FieldSchema`` <-> Spark ``StructType``.

Parity with the reference's REST DDL schema grammar
(``src/moonlink_connectors/src/rest_ingest/schema_util.rs:6-14,75-183``):
type names ``int16|int32|int64|string|text|boolean|bool|float32|float64|
date32|decimal(p[,s])|struct|list|array`` plus the extra types the PG CDC
path produces (``pg_replicate/util.rs:44-86``): ``timestamp`` (µs, UTC),
``timestamp_ntz``, ``time64`` (µs since midnight, carried as int64), ``uuid``
(canonical string), ``json`` (string), ``binary``.

Like the reference (and Iceberg), every field gets a stable integer field id
(``PARQUET:field_id`` metadata, schema_util.rs:77-80); we record ids in field
metadata so schema evolution (add/drop) keeps identity stable.

There is deliberately NO MapType: the reference has no Map anywhere in its
row model (SURVEY.md §1.1); key-value data is ``list<struct<key,value>>``.
"""

from __future__ import annotations

import re
from typing import Any

from pyspark.sql import types as T

from moonlink_spark.errors import SchemaError

_DECIMAL_RE = re.compile(r"^decimal\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$")

_PRIMITIVES: dict[str, T.DataType] = {
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int": T.IntegerType(),
    "int64": T.LongType(),
    "bigint": T.LongType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
    "float32": T.FloatType(),
    "float64": T.DoubleType(),
    "double": T.DoubleType(),
    "date32": T.DateType(),
    "date": T.DateType(),
    # µs-precision, UTC-canonicalized (reference Timestamp(µs, "UTC"))
    "timestamp": T.TimestampType(),
    "timestamptz": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    # µs since midnight, carried as int64 like the reference's Time64 path
    "time64": T.LongType(),
    "uuid": T.StringType(),
    "json": T.StringType(),
    "binary": T.BinaryType(),
    "bytea": T.BinaryType(),
}


def _parse_type(spec: dict[str, Any], next_id: list[int]) -> T.DataType:
    name = str(spec.get("data_type", "")).strip().lower()
    if not name:
        raise SchemaError(f"field {spec.get('name')!r}: missing data_type")
    if name in _PRIMITIVES:
        return _PRIMITIVES[name]
    m = _DECIMAL_RE.match(name)
    if m:
        precision = int(m.group(1))
        scale = int(m.group(2)) if m.group(2) is not None else 0
        if not (1 <= precision <= 38) or not (0 <= scale <= precision):
            raise SchemaError(f"invalid decimal({precision},{scale})")
        return T.DecimalType(precision, scale)
    if name == "struct":
        fields = spec.get("fields")
        if not fields:
            raise SchemaError(f"struct field {spec.get('name')!r} needs 'fields'")
        return T.StructType([_parse_field(f, next_id) for f in fields])
    if name in ("list", "array"):
        item = spec.get("item")
        if not item:
            raise SchemaError(f"list field {spec.get('name')!r} needs 'item'")
        item_spec = dict(item)
        item_spec.setdefault("name", "element")
        elem_nullable = bool(item_spec.get("nullable", True))
        return T.ArrayType(_parse_type(item_spec, next_id), elem_nullable)
    raise SchemaError(f"unknown data_type {name!r} for field {spec.get('name')!r}")


def _parse_field(spec: dict[str, Any], next_id: list[int]) -> T.StructField:
    if "name" not in spec:
        raise SchemaError(f"field missing 'name': {spec!r}")
    dtype = _parse_type(spec, next_id)
    fid = next_id[0]
    next_id[0] += 1
    meta = {"moonlink.field_id": fid}
    logical = str(spec.get("data_type", "")).strip().lower()
    if logical in ("uuid", "json", "time64"):
        meta["moonlink.logical_type"] = logical
    return T.StructField(
        spec["name"], dtype, nullable=bool(spec.get("nullable", True)), metadata=meta
    )


def field_schema_to_struct(fields: list[dict[str, Any]]) -> T.StructType:
    """``[{name, data_type, nullable, fields?, item?}, ...]`` -> StructType."""
    if not fields:
        raise SchemaError("schema must have at least one field")
    next_id = [1]
    names = [f.get("name") for f in fields]
    if len(set(names)) != len(names):
        raise SchemaError(f"duplicate field names in {names}")
    return T.StructType([_parse_field(f, next_id) for f in fields])


def _type_to_name(dtype: T.DataType) -> str | dict[str, Any]:
    if isinstance(dtype, T.DecimalType):
        return f"decimal({dtype.precision},{dtype.scale})"
    for name, proto in _PRIMITIVES.items():
        if dtype == proto:
            return name
    raise SchemaError(f"cannot serialize type {dtype}")


def struct_to_field_schema(schema: T.StructType) -> list[dict[str, Any]]:
    """Inverse of ``field_schema_to_struct`` (round-trips primitives,
    struct, list)."""
    out = []
    for f in schema.fields:
        out.append(_field_to_spec(f))
    return out


def _field_to_spec(f: T.StructField) -> dict[str, Any]:
    spec: dict[str, Any] = {"name": f.name, "nullable": f.nullable}
    logical = (f.metadata or {}).get("moonlink.logical_type")
    if logical:
        spec["data_type"] = logical
        return spec
    dt = f.dataType
    if isinstance(dt, T.StructType):
        spec["data_type"] = "struct"
        spec["fields"] = [_field_to_spec(sf) for sf in dt.fields]
    elif isinstance(dt, T.ArrayType):
        spec["data_type"] = "list"
        item = _field_to_spec(
            T.StructField("element", dt.elementType, dt.containsNull)
        )
        item.pop("name")
        spec["item"] = item
    else:
        spec["data_type"] = _type_to_name(dt)
    return spec
