"""Pure-Python Avro binary codec for the schema subset that
``avro_schema_json`` emits (records, ``["null", T]`` unions, arrays,
maps, primitives, timestamp-micros/date logical types).

Why this exists: the reference's wire contract is avro4s binary
(Mapper.scala:19-67), but this environment has no spark-avro jar, so the
engine's default wire is JSON-binary with ``wire_format="avro"`` as a
documented, skip-tested switch. This module pins the BYTES of that
switch without the jar: encodings follow the public Avro 1.11 binary
spec (zigzag varint ints/longs, length-prefixed strings/bytes,
union-index prefix, zero-terminated array/map blocks), and
tests/test_avro_golden.py locks hand-derived golden vectors plus
round-trips over the real envelope schema. When a jar appears, flipping
the default is a config change whose byte-compatibility is already
proven, not a port.

Driver-side use only (schema emit, golden tests, small control-plane
payloads). Bulk data-plane decode at scale goes through the JVM
(`from_avro`) once the jar exists — a Python row codec in the hot path
would be the classic 100× slowdown.
"""

from __future__ import annotations

import datetime as _dt
import io
import json
import struct
from typing import Any

# ---------------------------------------------------------------- low level


def _zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _unzigzag(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def _write_long(out: io.BytesIO, n: int) -> None:
    n = _zigzag(n)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            return


def _read_long(src: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        raw = src.read(1)
        if not raw:
            raise EOFError("truncated varint")
        b = raw[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return _unzigzag(acc)
        shift += 7


_EPOCH = _dt.date(1970, 1, 1)


# ---------------------------------------------------------------- encode


def _encode(schema: Any, value: Any, out: io.BytesIO) -> None:
    if isinstance(schema, list):  # union: index then value
        if value is None and "null" in schema:
            _write_long(out, schema.index("null"))
            return
        for i, branch in enumerate(schema):
            if branch == "null":
                continue
            _write_long(out, i)
            _encode(branch, value, out)
            return
        raise ValueError(f"no union branch for {value!r} in {schema}")
    if isinstance(schema, dict):
        t = schema["type"]
        logical = schema.get("logicalType")
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], value.get(f["name"]), out)
            return
        if t == "array":
            items = list(value or [])
            if items:
                _write_long(out, len(items))
                for it in items:
                    _encode(schema["items"], it, out)
            _write_long(out, 0)
            return
        if t == "map":
            entries = dict(value or {})
            if entries:
                _write_long(out, len(entries))
                for k, v in entries.items():
                    _encode("string", k, out)
                    _encode(schema["values"], v, out)
            _write_long(out, 0)
            return
        if t == "long" and logical in ("timestamp-micros", "timestamp-millis"):
            if isinstance(value, _dt.datetime):
                epoch = _dt.datetime(1970, 1, 1, tzinfo=value.tzinfo)
                delta = value - epoch
                # integer arithmetic: total_seconds() is a float and
                # loses sub-microsecond precision past ~2004
                micros = (
                    delta.days * 86_400_000_000
                    + delta.seconds * 1_000_000
                    + delta.microseconds
                )
                value = (
                    micros
                    if logical == "timestamp-micros"
                    else micros // 1000
                )
            _write_long(out, int(value))
            return
        if t == "int" and logical == "date":
            if isinstance(value, _dt.date):
                value = (value - _EPOCH).days
            _write_long(out, int(value))
            return
        return _encode(t, value, out)  # {"type": "string"} style
    # primitive by name
    if schema == "null":
        return
    if schema == "boolean":
        out.write(b"\x01" if value else b"\x00")
        return
    if schema in ("int", "long"):
        _write_long(out, int(value))
        return
    if schema == "float":
        out.write(struct.pack("<f", float(value)))
        return
    if schema == "double":
        out.write(struct.pack("<d", float(value)))
        return
    if schema == "bytes":
        data = bytes(value)
        _write_long(out, len(data))
        out.write(data)
        return
    if schema == "string":
        data = str(value).encode("utf-8")
        _write_long(out, len(data))
        out.write(data)
        return
    raise TypeError(f"unsupported avro schema: {schema!r}")


# ---------------------------------------------------------------- decode


def _decode(schema: Any, src: io.BytesIO) -> Any:
    if isinstance(schema, list):
        idx = _read_long(src)
        branch = schema[idx]
        return None if branch == "null" else _decode(branch, src)
    if isinstance(schema, dict):
        t = schema["type"]
        logical = schema.get("logicalType")
        if t == "record":
            return {
                f["name"]: _decode(f["type"], src)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = _read_long(src)
                if n == 0:
                    return out
                if n < 0:  # block with byte-size prefix
                    n = -n
                    _read_long(src)
                for _ in range(n):
                    out.append(_decode(schema["items"], src))
        if t == "map":
            out = {}
            while True:
                n = _read_long(src)
                if n == 0:
                    return out
                if n < 0:
                    n = -n
                    _read_long(src)
                for _ in range(n):
                    k = _decode("string", src)
                    out[k] = _decode(schema["values"], src)
        if t == "long" and logical in ("timestamp-micros", "timestamp-millis"):
            raw = _read_long(src)
            micros = raw if logical == "timestamp-micros" else raw * 1000
            return _dt.datetime(1970, 1, 1) + _dt.timedelta(
                microseconds=micros
            )
        if t == "int" and logical == "date":
            return _EPOCH + _dt.timedelta(days=_read_long(src))
        return _decode(t, src)
    if schema == "null":
        return None
    if schema == "boolean":
        b = src.read(1)
        if not b:
            raise EOFError("truncated avro boolean")
        if b not in (b"\x00", b"\x01"):
            raise ValueError(f"invalid avro boolean byte: {b!r}")
        return b == b"\x01"
    if schema in ("int", "long"):
        return _read_long(src)
    if schema == "float":
        return struct.unpack("<f", src.read(4))[0]
    if schema == "double":
        return struct.unpack("<d", src.read(8))[0]
    if schema == "bytes":
        return src.read(_read_long(src))
    if schema == "string":
        return src.read(_read_long(src)).decode("utf-8")
    raise TypeError(f"unsupported avro schema: {schema!r}")


# ---------------------------------------------------------------- public


def _parse(schema_json: Any) -> Any:
    if isinstance(schema_json, str) and schema_json.lstrip()[:1] in "[{\"":
        return json.loads(schema_json)
    return schema_json  # bare primitive name ("long") or parsed object


def encode(schema_json: str | dict | list, value: Any) -> bytes:
    schema = _parse(schema_json)
    out = io.BytesIO()
    _encode(schema, value, out)
    return out.getvalue()


def decode(schema_json: str | dict | list, data: bytes) -> Any:
    schema = _parse(schema_json)
    src = io.BytesIO(data)
    value = _decode(schema, src)
    rest = src.read()
    if rest:
        raise ValueError(f"{len(rest)} trailing bytes after decode")
    return value
