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
