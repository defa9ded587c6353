"""JSON payload -> typed row conversion.

Parity with the reference REST JSON converter
(``src/moonlink_connectors/src/rest_ingest/json_converter.rs``, type rules at
``:49-196``): lossless int widening, int->float promotion, decimals from
number or string, dates as 'YYYY-MM-DD', timestamps as ISO-8601 or epoch
micros (µs precision, UTC-canonicalized like pg_replicate/util.rs:50-56),
time64 as µs-since-midnight int, uuid canonical string, binary from
base64/hex, recursive struct/list. Unknown fields are rejected; missing
nullable fields become null.
"""

from __future__ import annotations

import base64
import datetime as dt
import re
import uuid as _uuid
from decimal import Decimal, InvalidOperation
from typing import Any

from pyspark.sql import types as T

from moonlink_spark.errors import SchemaError

_UUID_RE = re.compile(
    r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
)
_HEX_RE = re.compile(r"^[0-9a-fA-F]*$")

_INT_BOUNDS = {
    T.ShortType(): (-(2**15), 2**15 - 1),
    T.IntegerType(): (-(2**31), 2**31 - 1),
    T.LongType(): (-(2**63), 2**63 - 1),
}


class JsonConvertError(SchemaError):
    pass


def _conv_timestamp(v: Any, field: str) -> dt.datetime:
    if isinstance(v, bool):
        raise JsonConvertError(f"{field}: bool is not a timestamp")
    if isinstance(v, (int, float)):
        # epoch MICROseconds (reference Int64 micros-since-epoch,
        # moonlink_type.rs:8-10). Integer timedelta arithmetic: float
        # division would round the microsecond near current epochs
        # (~0.2µs ulp at 1e15).
        return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=int(v))
    if isinstance(v, str):
        s = v.replace("Z", "+00:00")
        try:
            out = dt.datetime.fromisoformat(s)
        except ValueError as e:
            raise JsonConvertError(f"{field}: bad timestamp {v!r}") from e
        if out.tzinfo is not None:
            out = out.astimezone(dt.timezone.utc).replace(tzinfo=None)
        return out
    raise JsonConvertError(f"{field}: cannot convert {type(v).__name__} to timestamp")


def convert_value(v: Any, dtype: T.DataType, field: str, logical: str | None = None):
    if v is None:
        return None
    if logical == "uuid":
        if not isinstance(v, str) or not _UUID_RE.match(v):
            raise JsonConvertError(f"{field}: invalid uuid {v!r}")
        return str(_uuid.UUID(v))  # canonical lowercase
    if logical == "time64":
        # µs since midnight, int or 'HH:MM:SS[.ffffff]'
        if isinstance(v, int) and not isinstance(v, bool):
            if not (0 <= v < 86_400_000_000):
                raise JsonConvertError(f"{field}: time64 out of range: {v}")
            return v
        if isinstance(v, str):
            try:
                t = dt.time.fromisoformat(v)
            except ValueError as e:
                raise JsonConvertError(f"{field}: bad time {v!r}") from e
            return (
                t.hour * 3_600_000_000
                + t.minute * 60_000_000
                + t.second * 1_000_000
                + t.microsecond
            )
        raise JsonConvertError(f"{field}: cannot convert to time64")

    if isinstance(dtype, (T.ShortType, T.IntegerType, T.LongType)):
        if isinstance(v, bool):
            raise JsonConvertError(f"{field}: bool is not an int")
        if isinstance(v, float):
            if v != int(v):
                raise JsonConvertError(f"{field}: lossy float->int {v}")
            v = int(v)
        if not isinstance(v, int):
            raise JsonConvertError(f"{field}: expected int, got {type(v).__name__}")
        lo, hi = _INT_BOUNDS[dtype]
        if not (lo <= v <= hi):
            raise JsonConvertError(f"{field}: {v} out of range for {dtype}")
        return v
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise JsonConvertError(f"{field}: expected number")
        return float(v)
    if isinstance(dtype, T.DecimalType):
        if isinstance(v, bool) or not isinstance(v, (int, float, str)):
            raise JsonConvertError(f"{field}: expected decimal-compatible value")
        try:
            d = Decimal(str(v))
        except InvalidOperation as e:
            raise JsonConvertError(f"{field}: bad decimal {v!r}") from e
        q = d.quantize(Decimal(1).scaleb(-dtype.scale))
        if len(q.as_tuple().digits) > dtype.precision:
            raise JsonConvertError(f"{field}: decimal overflow {v}")
        return q
    if isinstance(dtype, T.BooleanType):
        if not isinstance(v, bool):
            raise JsonConvertError(f"{field}: expected bool")
        return v
    if isinstance(dtype, T.StringType):
        if not isinstance(v, str):
            raise JsonConvertError(f"{field}: expected string")
        return v
    if isinstance(dtype, T.BinaryType):
        if isinstance(v, (bytes, bytearray)):
            return bytes(v)
        if isinstance(v, str):
            if _HEX_RE.match(v) and len(v) % 2 == 0:
                return bytes.fromhex(v)
            try:
                return base64.b64decode(v, validate=True)
            except Exception as e:
                raise JsonConvertError(f"{field}: bad binary {v!r}") from e
        raise JsonConvertError(f"{field}: cannot convert to binary")
    if isinstance(dtype, T.DateType):
        if isinstance(v, str):
            try:
                return dt.date.fromisoformat(v)
            except ValueError as e:
                raise JsonConvertError(f"{field}: bad date {v!r}") from e
        if isinstance(v, int) and not isinstance(v, bool):
            return dt.date(1970, 1, 1) + dt.timedelta(days=v)  # Date32 days
        raise JsonConvertError(f"{field}: cannot convert to date")
    if isinstance(dtype, (T.TimestampType, T.TimestampNTZType)):
        return _conv_timestamp(v, field)
    if isinstance(dtype, T.ArrayType):
        if not isinstance(v, list):
            raise JsonConvertError(f"{field}: expected list")
        return [
            convert_value(x, dtype.elementType, f"{field}[{i}]")
            for i, x in enumerate(v)
        ]
    if isinstance(dtype, T.StructType):
        if not isinstance(v, dict):
            raise JsonConvertError(f"{field}: expected object")
        return convert_row(v, dtype, prefix=f"{field}.")
    raise JsonConvertError(f"{field}: unsupported type {dtype}")


def convert_row(
    data: dict[str, Any], schema: T.StructType, prefix: str = ""
) -> dict[str, Any]:
    """Convert one JSON object to a typed row dict; rejects unknown fields
    and missing non-nullable fields (parity json_converter.rs error paths)."""
    known = {f.name for f in schema.fields}
    unknown = set(data) - known
    if unknown:
        raise JsonConvertError(f"unknown fields: {sorted(unknown)}")
    out: dict[str, Any] = {}
    for f in schema.fields:
        v = data.get(f.name)
        if v is None:
            if not f.nullable and f.name not in data:
                raise JsonConvertError(f"{prefix}{f.name}: missing non-nullable field")
            if not f.nullable and f.name in data:
                raise JsonConvertError(f"{prefix}{f.name}: null for non-nullable field")
            out[f.name] = None
            continue
        logical = (f.metadata or {}).get("moonlink.logical_type")
        out[f.name] = convert_value(v, f.dataType, f"{prefix}{f.name}", logical)
    return out
