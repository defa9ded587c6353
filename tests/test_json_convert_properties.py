"""Property-based tests for the JSON row converter (hypothesis; parity with
the reference's randomized validation strategy, SURVEY.md §5)."""

import datetime as dt
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from moonlink_spark.ingest.json_convert import JsonConvertError, convert_row
from moonlink_spark.schema import field_schema_to_struct

SCHEMA = field_schema_to_struct(
    [
        {"name": "i32", "data_type": "int32"},
        {"name": "i64", "data_type": "int64"},
        {"name": "f64", "data_type": "float64"},
        {"name": "s", "data_type": "string"},
        {"name": "b", "data_type": "bool"},
        {"name": "dec", "data_type": "decimal(18,4)"},
        {"name": "d", "data_type": "date32"},
        {"name": "ts", "data_type": "timestamp"},
        {"name": "tags", "data_type": "list", "item": {"data_type": "int64"}},
    ]
)


@settings(max_examples=200, deadline=None)
@given(
    i32=st.integers(-(2**31), 2**31 - 1),
    i64=st.integers(-(2**63), 2**63 - 1),
    f64=st.floats(allow_nan=False, allow_infinity=False),
    s=st.text(max_size=50),
    b=st.booleans(),
    dec=st.decimals(
        min_value=Decimal("-99999999999999.9999"),
        max_value=Decimal("99999999999999.9999"),
        places=4,
        allow_nan=False,
        allow_infinity=False,
    ),
    d=st.dates(dt.date(1900, 1, 1), dt.date(2100, 1, 1)),
    ts=st.datetimes(dt.datetime(1900, 1, 1), dt.datetime(2100, 1, 1)),
    tags=st.lists(st.integers(-(2**63), 2**63 - 1), max_size=5),
)
def test_valid_rows_round_trip(i32, i64, f64, s, b, dec, d, ts, tags):
    row = convert_row(
        {
            "i32": i32,
            "i64": i64,
            "f64": f64,
            "s": s,
            "b": b,
            "dec": str(dec),
            "d": d.isoformat(),
            "ts": ts.isoformat(),
            "tags": tags,
        },
        SCHEMA,
    )
    assert row["i32"] == i32 and row["i64"] == i64
    assert row["f64"] == f64 and row["s"] == s and row["b"] is b
    assert row["dec"] == dec
    assert row["d"] == d
    assert abs((row["ts"] - ts).total_seconds()) < 1e-6
    assert row["tags"] == tags


@settings(max_examples=100, deadline=None)
@given(
    v=st.one_of(
        st.integers(max_value=-(2**31) - 1),
        st.integers(min_value=2**31),
    )
)
def test_i32_overflow_always_rejected(v):
    try:
        convert_row({"i32": v}, SCHEMA)
        raise AssertionError(f"accepted out-of-range {v}")
    except JsonConvertError:
        pass


@settings(max_examples=100, deadline=None)
@given(extra=st.text(min_size=1).filter(lambda s: s not in SCHEMA.fieldNames()))
def test_unknown_fields_always_rejected(extra):
    try:
        convert_row({extra: 1}, SCHEMA)
        raise AssertionError(f"accepted unknown field {extra!r}")
    except JsonConvertError:
        pass


def test_epoch_micros_exact_integer_arithmetic():
    """Integer micros near the current epoch convert exactly: float division
    has ~0.2µs ulp at 1e15 and can round the microsecond (round-1 ADVICE)."""
    import datetime as dt

    from moonlink_spark.ingest.json_convert import _conv_timestamp

    # odd microsecond values near 2026 epoch that float division mis-rounds
    for micros in (1_767_225_600_000_001, 1_767_225_599_999_999,
                   1_234_567_890_123_457, -1, 0):
        out = _conv_timestamp(micros, "f")
        expect = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=micros)
        assert out == expect, micros
        # round-trip: back to micros is lossless
        back = round((out - dt.datetime(1970, 1, 1)).total_seconds() * 1e6)
        assert int((out - dt.datetime(1970, 1, 1)) / dt.timedelta(microseconds=1)) == micros
