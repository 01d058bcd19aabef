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
