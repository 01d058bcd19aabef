"""Property-based tests (hypothesis) for the pure-Python engine logic:
the schema-evolution gate and retry backoff — SURVEY.md §5's
property-test layer (the reference ships none; ours does)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from typebus_spark.catalog.types import (
    DeclaredType,
    check_evolution,
)
from typebus_spark.registry import BackoffShape, RetryPolicy

_TYPES = [StringType(), IntegerType(), LongType(), DoubleType()]

field_names = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    min_size=1,
    max_size=6,
    unique=True,
)


def _schema(names: list[str], types: list[int]) -> StructType:
    return StructType(
        [
            StructField(n, _TYPES[t % len(_TYPES)])
            for n, t in zip(names, types)
        ]
    )


@given(field_names, st.lists(st.integers(0, 3), min_size=6, max_size=6))
@settings(max_examples=50, deadline=None)
def test_identical_schema_always_compatible(names, types):
    s = _schema(names, types)
    a = DeclaredType("t", s, {})
    assert check_evolution("t", a, a) == []


@given(field_names, st.lists(st.integers(0, 3), min_size=6, max_size=6))
@settings(max_examples=50, deadline=None)
def test_add_field_compat_iff_defaulted(names, types):
    base = _schema(names, types)
    extended = StructType(base.fields + [StructField("zz_new", StringType())])
    old = DeclaredType("t", base, {})
    # without default → violation; with default → compatible
    assert check_evolution("t", old, DeclaredType("t", extended, {})) != []
    assert (
        check_evolution(
            "t", old, DeclaredType("t", extended, {"zz_new": "d"})
        )
        == []
    )


@given(
    field_names,
    st.lists(st.integers(0, 3), min_size=6, max_size=6),
    st.integers(0, 5),
)
@settings(max_examples=50, deadline=None)
def test_type_change_always_rejected(names, types, idx):
    base = _schema(names, types)
    i = idx % len(base.fields)
    fields = list(base.fields)
    old_t = fields[i].dataType
    new_t = next(t for t in _TYPES if t != old_t)
    fields[i] = StructField(fields[i].name, new_t)
    changed = StructType(fields)
    v = check_evolution(
        "t", DeclaredType("t", base, {}), DeclaredType("t", changed, {})
    )
    assert any("changed type" in x for x in v)


@given(
    st.integers(1, 10),
    st.floats(0.01, 100.0, allow_nan=False),
    st.integers(1, 20),
)
@settings(max_examples=100, deadline=None)
def test_backoff_monotone_and_shaped(max_attempts, delay, attempt):
    lin = RetryPolicy(max_attempts, delay, BackoffShape.LINEAR)
    exp = RetryPolicy(max_attempts, delay, BackoffShape.EXPONENTIAL)
    non = RetryPolicy(max_attempts, delay, BackoffShape.NONE)
    # shapes mirror bus/package.scala:19-29 exactly
    assert lin.backoff_seconds(attempt) == attempt * delay
    assert exp.backoff_seconds(attempt) == attempt * attempt * delay
    assert non.backoff_seconds(attempt) == delay
    # monotone non-decreasing in attempt for lin/exp
    assert lin.backoff_seconds(attempt + 1) >= lin.backoff_seconds(attempt)
    assert exp.backoff_seconds(attempt + 1) >= exp.backoff_seconds(attempt)


@given(st.integers(min_value=1, max_value=6))
@settings(max_examples=12, deadline=None)
def test_recursive_unroll_depth_property(depth):
    """declare_recursive_type(max_depth=d) yields exactly d
    self-expansions below the root, with the deepest level pruned."""
    from pyspark.sql.types import LongType, StructField, StructType

    from typebus_spark.catalog.types import TypeCatalog, ref_field

    c = TypeCatalog()
    node = StructType(
        [StructField("v", LongType()), ref_field("next", "t.N")]
    )
    s = c.declare_recursive_type("t.N", node, max_depth=depth).schema
    lvl = 0
    while "next" in [f.name for f in s.fields]:
        s = s["next"].dataType
        lvl += 1
    assert lvl == depth
    assert [f.name for f in s.fields] == ["v"]


# --------------------------------------------------------------------
# Full-envelope Avro wire property (VERDICT r5 #5): random declared
# payload shapes — Option (every avro field is a ["null", T] union),
# Map, nested struct/array, Either-shaped RPC results, and recursive
# types via the catalog's bounded unrolling — encoded and decoded
# through the SAME schema the envelope path hands to from_avro
# (avro_schema_json(published_event_schema(payload))). Only the
# spark-avro-jar comparison is skipped (jar absent in env;
# test_runtime.py::test_avro_wire_format gates that path).

import datetime as dt

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    FloatType,
    MapType,
    TimestampType,
)

from typebus_spark.codec.avro_binary import decode as _adec
from typebus_spark.codec.avro_binary import encode as _aenc
from typebus_spark.codec.envelope import (
    avro_schema_json,
    published_event_schema,
)

_TS_VALUES = st.datetimes(
    min_value=dt.datetime(1970, 1, 2),
    max_value=dt.datetime(2200, 1, 1),
)

_SCALARS: list = [
    (StringType(), st.text(max_size=12)),
    (LongType(), st.integers(-(2**63), 2**63 - 1)),
    (IntegerType(), st.integers(-(2**31), 2**31 - 1)),
    (DoubleType(), st.floats(allow_nan=False, width=64)),
    (FloatType(), st.floats(allow_nan=False, width=32)),
    (BooleanType(), st.booleans()),
    (TimestampType(), _TS_VALUES),
    (BinaryType(), st.binary(max_size=12)),
]

_FIELD_NAMES = st.lists(
    st.text(alphabet="abcdefghij", min_size=1, max_size=5),
    min_size=1,
    max_size=4,
    unique=True,
)


@st.composite
def _type_and_value(draw, depth: int):
    """Draw (Catalyst DataType, matching python value-or-None)."""
    choices = len(_SCALARS) + (3 if depth > 0 else 0)
    pick = draw(st.integers(0, choices - 1))
    if pick < len(_SCALARS):
        t, vs = _SCALARS[pick]
        return t, draw(st.none() | vs)
    kind = pick - len(_SCALARS)
    if kind == 0:  # array with nullable items
        et, _ = draw(_type_and_value(depth - 1))
        items = [
            draw(_type_and_value(depth - 1))[1]
            if draw(st.booleans())
            else None
            for _ in range(draw(st.integers(0, 3)))
        ]
        # items must all match et — redraw values against the SAME type
        items = [
            None if v is None else draw(_value_for(et, depth - 1))
            for v in items
        ]
        return ArrayType(et), items
    if kind == 1:  # map<string, nullable T>
        vt, _ = draw(_type_and_value(depth - 1))
        keys = draw(
            st.lists(st.text(max_size=6), max_size=3, unique=True)
        )
        return (
            MapType(StringType(), vt),
            {
                k: (
                    draw(_value_for(vt, depth - 1))
                    if draw(st.booleans())
                    else None
                )
                for k in keys
            },
        )
    # struct
    names = draw(_FIELD_NAMES)
    fields, value = [], {}
    for n in names:
        ft, fv = draw(_type_and_value(depth - 1))
        fields.append(StructField(n, ft))
        value[n] = fv
    return StructType(fields), value


def _value_for(t, depth: int):
    """Value strategy for an already-drawn type."""
    for st_t, vs in _SCALARS:
        if type(t) is type(st_t):
            return vs
    if isinstance(t, ArrayType):
        return st.lists(
            st.none() | _value_for(t.elementType, depth - 1), max_size=3
        )
    if isinstance(t, MapType):
        return st.dictionaries(
            st.text(max_size=6),
            st.none() | _value_for(t.valueType, depth - 1),
            max_size=3,
        )
    if isinstance(t, StructType):
        return st.fixed_dictionaries(
            {
                f.name: st.none() | _value_for(f.dataType, depth - 1)
                for f in t.fields
            }
        )
    raise TypeError(str(t))


_META = {
    "event_id": "e-1",
    "event_type": "api.T",
    "correlation_id": None,
    "trace": False,
    "direct_reply": {"path": "tcp://h:1", "service_name": "s"},
    "key": None,
    "socket_id": None,
    "response_to": None,
    "extra": {"a": "b"},
    "occurred_at": dt.datetime(2026, 8, 14, 12, 0, 0, 123456),
}


def _envelope_roundtrip(payload_schema: StructType, payload_value: dict):
    schema = avro_schema_json(published_event_schema(payload_schema))
    ev = {"meta": dict(_META), "payload": payload_value}
    assert _adec(schema, _aenc(schema, ev)) == ev


@given(_type_and_value(depth=2))
@settings(max_examples=60, deadline=None)
def test_avro_envelope_roundtrip_random_shapes(tv):
    t, v = tv
    if not isinstance(t, StructType):
        t = StructType([StructField("x", t)])
        v = {"x": v}
    if not t.fields:
        t = StructType([StructField("x", LongType())])
        v = {"x": 1}
    _envelope_roundtrip(t, v)


@given(
    st.booleans(),
    st.text(max_size=20),
    st.integers(-(2**63), 2**63 - 1),
)
@settings(max_examples=40, deadline=None)
def test_avro_envelope_roundtrip_either_shape(is_right, msg, val):
    """Either[ServiceException, T] as the RPC gather emits it
    (streaming/rpc.py; reference Client.scala:32): exactly one branch
    set, the other null — the avro union handles both sides."""
    either = StructType(
        [
            StructField(
                "left",
                StructType([StructField("message", StringType())]),
            ),
            StructField(
                "right",
                StructType([StructField("value", LongType())]),
            ),
        ]
    )
    v = (
        {"left": None, "right": {"value": val}}
        if is_right
        else {"left": {"message": msg}, "right": None}
    )
    _envelope_roundtrip(either, v)


@given(st.integers(1, 4), st.lists(st.integers(0, 2**31), max_size=4))
@settings(max_examples=25, deadline=None)
def test_avro_envelope_roundtrip_recursive_shape(depth, chain):
    """Recursive declared type (G2 bounded unrolling) through the full
    envelope schema: a linked-node chain up to the unroll depth."""
    from pyspark.sql.types import LongType as _L

    from typebus_spark.catalog.types import TypeCatalog, ref_field

    c = TypeCatalog()
    node = StructType(
        [StructField("v", _L()), ref_field("next", "t.Node")]
    )
    schema = c.declare_recursive_type(
        "t.Node", node, max_depth=depth
    ).schema
    # build a value chain no deeper than the unrolled schema allows
    val: dict | None = None
    for x in reversed(chain[:depth]):
        nxt = val
        val = {"v": x, "next": nxt}
        if nxt is not None and "next" not in nxt:
            # deepest level is pruned to just {v}
            pass
    if val is None:
        val = {"v": 0, "next": None}
    # prune the chain tail to match the pruned deepest level
    cur, lvl = val, 0
    while cur.get("next") is not None:
        cur, lvl = cur["next"], lvl + 1
    if lvl >= depth:
        cur.pop("next", None)
    _envelope_roundtrip(schema, val)


def test_exploded_shingle_rows_equals_lambda_shingles(spark):
    """Equivalence pin for the r10 lambda-free shingle stream: on a
    deterministic fuzz corpus (varying token counts incl. shorter-than-n
    docs, repeated tokens, empty-ish strings), exploded_shingle_rows
    must produce exactly the multiset explode(shingles(tokens, n))
    produces — the lambda form IS the documented semantics the oracles
    replay, so drift here would silently skew every shingle family."""
    import pyspark.sql.functions as F

    from typebus_spark.functions.text import (
        exploded_shingle_rows,
        shingles,
        tokens,
    )

    rows = []
    words = ["a", "bb", "ccc", "bb", "zz9", "#", "a"]
    for i in range(40):
        k = i % 11  # 0..10 tokens; k=0 -> empty string
        rows.append((i, " ".join(words[(i + j) % len(words)] for j in range(k))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for n in (2, 5, 8):
        lam = docs.select(
            F.col("doc_id").alias("_id"),
            F.explode(shingles(tokens("text"), n)).alias("_s"),
        )
        new = exploded_shingle_rows(docs, "doc_id", "text", n)
        cs = lambda f: sorted(
            ((r["_id"], r["_s"], r["c"]) for r in
             f.groupBy("_id", "_s").agg(F.count(F.lit(1)).alias("c")).collect())
        )
        assert cs(lam) == cs(new), n
