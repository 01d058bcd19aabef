"""Evolution-gate parity tests (SURVEY.md §5 item 2, G2): mirror the three
illegal changes + the legal defaulted change from Typebus.scala:423-449 and
the FIXTURES.md evolution pair."""

import pytest
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from typebus_spark.catalog.types import (
    SchemaEvolutionError,
    TypeCatalog,
)

V1 = StructType(
    [StructField("id", StringType()), StructField("a", IntegerType())]
)


def _cat():
    c = TypeCatalog()
    c.declare_type("test.V", V1)
    return c


def test_identical_redeclare_ok():
    c = _cat()
    c.declare_type("test.V", V1)
    assert len(c) == 1


def test_add_with_default_ok():
    c = _cat()
    s = StructType(V1.fields + [StructField("b", StringType())])
    c.declare_type("test.V", s, defaults={"b": "x"})
    assert c.schema_for("test.V") == s


def test_add_without_default_rejected():
    c = _cat()
    s = StructType(V1.fields + [StructField("c", StringType())])
    with pytest.raises(SchemaEvolutionError, match="added without a default"):
        c.declare_type("test.V", s)


def test_remove_no_default_rejected():
    c = _cat()
    s = StructType([StructField("id", StringType())])
    with pytest.raises(SchemaEvolutionError, match="removed but had no default"):
        c.declare_type("test.V", s)


def test_type_change_rejected():
    c = _cat()
    s = StructType(
        [StructField("id", StringType()), StructField("a", StringType())]
    )
    with pytest.raises(SchemaEvolutionError, match="changed type"):
        c.declare_type("test.V", s)


def test_remove_defaulted_field_ok():
    c = TypeCatalog()
    c.declare_type("test.W", V1, defaults={"a": 0})
    c.declare_type("test.W", StructType([StructField("id", StringType())]))


def test_nested_type_change_rejected():
    nested = StructType(
        [
            StructField("id", StringType()),
            StructField(
                "inner",
                StructType([StructField("x", IntegerType())]),
            ),
        ]
    )
    c = TypeCatalog()
    c.declare_type("test.N", nested)
    bad = StructType(
        [
            StructField("id", StringType()),
            StructField(
                "inner",
                StructType([StructField("x", StringType())]),
            ),
        ]
    )
    with pytest.raises(SchemaEvolutionError, match="inner.x"):
        c.declare_type("test.N", bad)


def test_container_element_change_rejected():
    c = TypeCatalog()
    c.declare_type(
        "test.C",
        StructType([StructField("xs", ArrayType(IntegerType()))]),
    )
    with pytest.raises(SchemaEvolutionError):
        c.declare_type(
            "test.C",
            StructType([StructField("xs", ArrayType(StringType()))]),
        )


def test_persistence_roundtrip(tmp_path):
    p = str(tmp_path / "catalog")
    c1 = TypeCatalog(p)
    c1.declare_type("test.P", V1, defaults={"a": 1})
    c2 = TypeCatalog(p)
    assert c2.schema_for("test.P") == V1
    assert c2.get("test.P").defaults == {"a": 1}
    # gate still enforced after reload
    with pytest.raises(SchemaEvolutionError):
        c2.declare_type(
            "test.P",
            StructType(
                [StructField("id", IntegerType()), StructField("a", IntegerType())]
            ),
        )


# --- recursive (self-referential) types: Mapper.scala:70-96 parity ----
# The reference ships runtime recursive codecs; here recursion is
# declared with ref_field markers and unrolled to a bounded depth
# (spark-avro/protobuf recursiveFieldMaxDepth semantics).

from pyspark.sql.types import LongType  # noqa: E402

from typebus_spark.catalog.types import ref_field  # noqa: E402


def _node_schema():
    return StructType(
        [StructField("value", LongType()), ref_field("next", "test.Node")]
    )


def test_recursive_type_unrolls_to_depth():
    c = TypeCatalog()
    c.declare_recursive_type("test.Node", _node_schema(), max_depth=2)
    s = c.schema_for("test.Node")
    # level 0: value + next
    assert [f.name for f in s.fields] == ["value", "next"]
    l1 = s["next"].dataType
    assert [f.name for f in l1.fields] == ["value", "next"]
    l2 = l1["next"].dataType
    # deepest level: the recursive field is pruned
    assert [f.name for f in l2.fields] == ["value"]


def test_recursive_ref_via_declare_type_rejected():
    c = TypeCatalog()
    with pytest.raises(ValueError, match="declare_recursive_type"):
        c.declare_type("test.Node", _node_schema())


def test_recursive_unknown_ref_rejected():
    c = TypeCatalog()
    bad = StructType([ref_field("other", "test.Missing")])
    with pytest.raises(KeyError, match="test.Missing"):
        c.declare_recursive_type("test.Bad", bad)


def test_recursive_redeclare_same_depth_ok_deeper_gated():
    c = TypeCatalog()
    c.declare_recursive_type("test.Node", _node_schema(), max_depth=2)
    # same declaration is idempotent
    c.declare_recursive_type("test.Node", _node_schema(), max_depth=2)
    # a depth change alters the unrolled shape -> the 3-rule gate fires
    with pytest.raises(SchemaEvolutionError):
        c.declare_recursive_type("test.Node", _node_schema(), max_depth=3)


def test_recursive_ref_to_declared_type_expands_concretely():
    c = TypeCatalog()
    c.declare_type(
        "test.Leaf", StructType([StructField("x", LongType())])
    )
    s = StructType(
        [ref_field("leaf", "test.Leaf"), ref_field("next", "test.Tree")]
    )
    c.declare_recursive_type("test.Tree", s, max_depth=1)
    out = c.schema_for("test.Tree")
    assert [f.name for f in out["leaf"].dataType.fields] == ["x"]
    # one self-expansion below the root, then pruned
    nxt = out["next"].dataType
    assert [f.name for f in nxt.fields] == ["leaf"]
