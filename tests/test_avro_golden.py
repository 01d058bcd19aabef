"""Golden-vector + round-trip tests for the pure-Python Avro binary
codec (typebus_spark/codec/avro_binary.py).

The golden byte strings below are hand-derived from the public Avro 1.11
binary-encoding spec (zigzag varints, length prefixes, union indices,
zero-terminated blocks) — they pin the WIRE BYTES, independent of the
implementation, so the ``wire_format="avro"`` switch stays
byte-compatible when a spark-avro jar eventually runs the hot path.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from typebus_spark.codec.avro_binary import decode, encode
from typebus_spark.codec.envelope import (
    EVENT_META_SCHEMA,
    avro_schema_json,
    published_event_schema,
)

# ------------------------------------------------------------- primitives


def test_golden_long_zigzag():
    assert encode("long", 0) == b"\x00"
    assert encode("long", -1) == b"\x01"
    assert encode("long", 1) == b"\x02"
    assert encode("long", -2) == b"\x03"
    assert encode("long", 64) == b"\x80\x01"  # zigzag 128 spills a byte
    assert decode("long", b"\x80\x01") == 64


def test_golden_string_and_bytes():
    assert encode("string", "ab") == b"\x04ab"
    assert decode("string", b"\x04ab") == "ab"
    assert encode("bytes", b"\x00\xff") == b"\x04\x00\xff"


def test_golden_boolean_double():
    assert encode("boolean", True) == b"\x01"
    assert encode("boolean", False) == b"\x00"
    # IEEE-754 little-endian: 1.0 = 3F F0 .. reversed
    assert encode("double", 1.0) == b"\x00\x00\x00\x00\x00\x00\xf0?"


def test_golden_null_union():
    schema = ["null", "long"]
    assert encode(schema, None) == b"\x00"  # union index 0
    assert encode(schema, 5) == b"\x02\x0a"  # index 1, zigzag(5)=10
    assert decode(schema, b"\x02\x0a") == 5
    assert decode(schema, b"\x00") is None


def test_golden_record_array_map():
    rec = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": "string"},
        ],
    }
    assert encode(rec, {"a": 3, "b": "x"}) == b"\x06\x02x"
    assert decode(rec, b"\x06\x02x") == {"a": 3, "b": "x"}

    arr = {"type": "array", "items": "long"}
    assert encode(arr, [1, 2]) == b"\x04\x02\x04\x00"
    assert decode(arr, b"\x04\x02\x04\x00") == [1, 2]
    assert encode(arr, []) == b"\x00"

    mp = {"type": "map", "values": "long"}
    assert encode(mp, {"k": 7}) == b"\x02\x02k\x0e\x00"
    assert decode(mp, b"\x02\x02k\x0e\x00") == {"k": 7}


def test_golden_timestamp_micros():
    ts = {"type": "long", "logicalType": "timestamp-micros"}
    # 1970-01-01T00:00:01 = 1_000_000 us; zigzag = 2_000_000 = 0x80 89 7A
    assert encode(ts, dt.datetime(1970, 1, 1, 0, 0, 1)) == b"\x80\x89\x7a"
    assert decode(ts, b"\x80\x89\x7a") == dt.datetime(1970, 1, 1, 0, 0, 1)


# ----------------------------------------------- emitted-schema round-trips


def test_meta_schema_roundtrip():
    schema = avro_schema_json(EVENT_META_SCHEMA, "EventMeta")
    meta = {
        "event_id": "e-1",
        "event_type": "api.Purchase",
        "correlation_id": "c-9",
        "trace": True,
        "direct_reply": {"path": "tcp://h:1", "service_name": "svc"},
        "key": None,
        "socket_id": None,
        "response_to": None,
        "extra": {"k1": "v1", "k2": None},
        "occurred_at": dt.datetime(2026, 1, 2, 3, 4, 5, 123456),
    }
    assert decode(schema, encode(schema, meta)) == meta


def test_published_event_schema_roundtrip():
    payload = StructType(
        [
            StructField("user_id", LongType()),
            StructField("amount", DoubleType()),
            StructField("ok", BooleanType()),
            StructField("tags", MapType(StringType(), StringType())),
            StructField("at", TimestampType()),
        ]
    )
    schema = avro_schema_json(published_event_schema(payload))
    ev = {
        "meta": {
            "event_id": "e-2",
            "event_type": "api.Purchase",
            "correlation_id": None,
            "trace": None,
            "direct_reply": None,
            "key": "42",
            "socket_id": None,
            "response_to": None,
            "extra": None,
            "occurred_at": dt.datetime(2026, 8, 14, 12, 0, 0),
        },
        "payload": {
            "user_id": 42,
            "amount": 9.75,
            "ok": True,
            "tags": {"t": "x"},
            "at": dt.datetime(2026, 8, 14, 11, 59, 59, 500000),
        },
    }
    assert decode(schema, encode(schema, ev)) == ev


def test_negative_block_count_decodes():
    # writers may emit size-prefixed blocks (negative count + byte size);
    # [1] as -1 block: zigzag(-1)=1, size 1 byte (0x02), item, terminator
    arr = {"type": "array", "items": "long"}
    assert decode(arr, b"\x01\x02\x02\x00") == [1]


# ------------------------------------------------------- property test
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAS_HYP = True
except ImportError:  # pragma: no cover
    _HAS_HYP = False

if _HAS_HYP:
    _META_SCHEMA = avro_schema_json(EVENT_META_SCHEMA, "EventMeta")

    _meta_values = st.fixed_dictionaries(
        {
            "event_id": st.text(max_size=40),
            "event_type": st.text(max_size=40),
            "correlation_id": st.none() | st.text(max_size=20),
            "trace": st.none() | st.booleans(),
            "direct_reply": st.none()
            | st.fixed_dictionaries(
                {
                    "path": st.none() | st.text(max_size=20),
                    "service_name": st.none() | st.text(max_size=20),
                }
            ),
            "key": st.none() | st.text(max_size=20),
            "socket_id": st.none() | st.text(max_size=20),
            "response_to": st.none() | st.text(max_size=20),
            "extra": st.none()
            | st.dictionaries(
                st.text(max_size=10),
                st.none() | st.text(max_size=10),
                max_size=4,
            ),
            "occurred_at": st.none()
            | st.datetimes(
                min_value=dt.datetime(1970, 1, 1),
                max_value=dt.datetime(2100, 1, 1),
            ),  # timestamp-micros: full microsecond precision round-trips
        }
    )

    @settings(max_examples=200, deadline=None)
    @given(_meta_values)
    def test_meta_roundtrip_property(meta):
        assert decode(_META_SCHEMA, encode(_META_SCHEMA, meta)) == meta

    @settings(max_examples=200, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def test_long_roundtrip_property(n):
        assert decode("long", encode("long", n)) == n
