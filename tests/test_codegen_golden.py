"""Golden-file pins for all three codegen emitters (VERDICT r5 #6).

String-fragment tests catch local regressions; these pin the ENTIRE
emitted source for a representative catalog (nullable/default/Option
combinations, nested collections, a case object, and a descriptor-driven
RpcClient) so any byte-level drift in any emitter is visible in review.
Reference parity: gen/package.scala:184-274 (AST→src emit).

Regenerate intentionally with:
    UPDATE_GOLDEN=1 python -m pytest tests/test_codegen_golden.py
"""

from __future__ import annotations

import os
import pathlib

import pytest
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from typebus_spark.catalog.codegen import to_python, to_scala, to_typescript
from typebus_spark.catalog.types import TypeCatalog

GOLDEN = pathlib.Path(__file__).parent / "golden"

ORDER = StructType(
    [
        StructField("order_id", StringType(), False),
        StructField("amount", DoubleType(), True),
        StructField("qty", IntegerType(), True),
        StructField("tags", ArrayType(StringType()), True),
        StructField("attrs", MapType(StringType(), StringType()), True),
        StructField("placed_at", TimestampType(), True),
    ]
)
CONFIRM = StructType(
    [
        StructField("order_id", StringType(), False),
        StructField("status", StringType(), False),
    ]
)
DESC = {
    "service": "order-service",
    "service_methods": [
        {"in": "api.order_placed", "out": "api.order_confirmed"}
    ],
    "types": {},
}


def _cat() -> TypeCatalog:
    c = TypeCatalog()
    c.declare_type(
        "api.order_placed",
        ORDER,
        defaults={"qty": 1},
    )
    c.declare_type(
        "api.order_confirmed", CONFIRM, defaults={"status": "ok"}
    )
    c.declare_type("api.ping", StructType([]))
    return c


def _check(name: str, emitted: str):
    path = GOLDEN / name
    if os.environ.get("UPDATE_GOLDEN") == "1":
        path.write_text(emitted)
        pytest.skip(f"golden {name} regenerated")
    assert path.exists(), (
        f"golden file {name} missing — run with UPDATE_GOLDEN=1"
    )
    assert emitted == path.read_text(), (
        f"{name} drifted from golden; if intentional, regenerate with "
        "UPDATE_GOLDEN=1"
    )


def test_python_emitter_golden():
    _check("gen_python.py.golden", to_python(_cat()))


def test_scala_emitter_golden():
    _check("gen_scala.scala.golden", to_scala(_cat(), DESC))


def test_typescript_emitter_golden():
    _check("gen_typescript.ts.golden", to_typescript(_cat()))


def test_python_golden_is_importable():
    """The pinned Python source must actually exec and instantiate."""
    ns: dict = {}
    exec(compile(to_python(_cat()), "<gen>", "exec"), ns)
    inst = ns["OrderPlaced"](order_id="o1")
    assert inst.qty == 1 and inst.amount is None


def test_scala_golden_is_balanced():
    """Regex-level syntax sanity for the Scala emit: balanced braces/
    parens, one package object, every implicit paired reader+writer."""
    src = to_scala(_cat(), DESC)
    assert src.count("{") == src.count("}")
    assert src.count("(") == src.count(")")
    assert src.count("package object ") == 1
    assert src.count("AvroByteStreamReader") == src.count(
        "AvroByteStreamWriter"
    )
