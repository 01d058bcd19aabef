"""Schema catalog: typebus's compile-time schema DB re-expressed for Spark.

Reference semantics (all file:line cite /root/reference):
- ``Typebus.declareType[T,R,W]`` walks a Scala type into a ``Term`` AST and
  persists it, one JSON file per type FQN, under
  ``src/main/resources/typebus/`` (typebus/macros/.../Typebus.scala:220-222,
  390-393; ResourceDb.scala:7-14).
- On re-declaration the new AST is diffed against the stored one
  (Typebus.scala:396-401) and the build aborts on incompatible evolution
  (Typebus.scala:403-449). The three rules (comment at :403-407):
    1. changing a field's type            → abort (:423-431)
    2. adding a field without a default   → abort (:432-440)
    3. removing a field with no default   → abort (:441-449)
  Compatible changes merge into the DB (merge :507-519, persist :452-453).
- Diffing operates on flattened path lists (``scoped`` :531-542) with
  default-bearing subtrees collapsed (``collapseTree`` :549-556).

Here the AST *is* the Spark ``StructType`` (nested structs model nested case
classes — SURVEY.md §1.2 table), defaults are an explicit ``{path: value}``
dict (Spark schemas don't carry defaults), and persistence is one JSON file
per FQN in a catalog directory. The gate is a pure-Python structural diff —
Catalyst has no equivalent; Avro schema-resolution covers only runtime.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Iterator

from pyspark.sql.types import ArrayType, DataType, MapType, StructType


TYPEREF_KEY = "__typebus_typeref__"


def ref_field(name: str, fqn: str) -> "StructField":
    """A field whose type is a named reference to a declared type —
    the way a self-referential (recursive) case class is expressed here.

    The reference carries recursive codecs natively
    (Mapper.scala:70-96, AvroRecursiveByteStreamReader/Writer); Spark's
    StructType cannot express a self-referential struct, so recursion is
    declared via this marker and unrolled to a bounded depth at
    declaration time (the same contract as spark-avro / spark-protobuf's
    ``recursiveFieldMaxDepth``: levels beyond the bound are pruned).
    """
    from pyspark.sql.types import NullType, StructField

    return StructField(name, NullType(), True, {TYPEREF_KEY: fqn})


def _has_refs(dt: DataType) -> bool:
    if isinstance(dt, StructType):
        return any(
            (f.metadata or {}).get(TYPEREF_KEY) is not None
            or _has_refs(f.dataType)
            for f in dt.fields
        )
    if isinstance(dt, ArrayType):
        return _has_refs(dt.elementType)
    if isinstance(dt, MapType):
        return _has_refs(dt.keyType) or _has_refs(dt.valueType)
    return False


def _unroll(
    dt: DataType,
    resolve: dict[str, StructType],
    budget: dict[str, int],
) -> DataType:
    """Expand ``ref_field`` markers into concrete structs, decrementing
    the per-FQN depth budget along each path; a reference whose budget
    is exhausted is PRUNED (field dropped), mirroring spark-protobuf's
    recursive-field semantics."""
    from pyspark.sql.types import StructField

    if isinstance(dt, StructType):
        fields = []
        for f in dt.fields:
            ref = (f.metadata or {}).get(TYPEREF_KEY)
            if ref is not None:
                if ref not in resolve:
                    raise KeyError(
                        f"type reference '{ref}' in field '{f.name}' "
                        "is not a declared type"
                    )
                left = budget.get(ref, 0)
                if left <= 0:
                    continue  # beyond max_depth: prune the subtree
                nb = dict(budget)
                nb[ref] = left - 1
                fields.append(
                    StructField(
                        f.name, _unroll(resolve[ref], resolve, nb), True
                    )
                )
            else:
                fields.append(
                    StructField(
                        f.name,
                        _unroll(f.dataType, resolve, budget),
                        f.nullable,
                        f.metadata,
                    )
                )
        return StructType(fields)
    if isinstance(dt, ArrayType):
        return ArrayType(
            _unroll(dt.elementType, resolve, budget), dt.containsNull
        )
    if isinstance(dt, MapType):
        return MapType(
            _unroll(dt.keyType, resolve, budget),
            _unroll(dt.valueType, resolve, budget),
            dt.valueContainsNull,
        )
    return dt


class SchemaEvolutionError(Exception):
    """Raised when a re-declared schema violates the 3-rule gate."""

    def __init__(self, fqn: str, violations: list[str]):
        self.fqn = fqn
        self.violations = violations
        super().__init__(
            f"incompatible schema evolution for {fqn}:\n  "
            + "\n  ".join(violations)
        )


def _flatten(dt: DataType, prefix: str = "") -> Iterator[tuple[str, str]]:
    """Flatten a DataType into (path, leaf-type) pairs.

    Mirrors ``scoped`` (Typebus.scala:531-542): nested products contribute
    dotted paths; containers contribute their element paths under a
    ``[]``/``{}`` marker so element-type changes are caught too.
    """
    if isinstance(dt, StructType):
        for f in dt.fields:
            path = f"{prefix}{f.name}"
            if isinstance(f.dataType, (StructType, ArrayType, MapType)):
                yield from _flatten(f.dataType, path + ".")
            else:
                yield path, f.dataType.simpleString()
    elif isinstance(dt, ArrayType):
        inner = dt.elementType
        if isinstance(inner, (StructType, ArrayType, MapType)):
            yield from _flatten(inner, prefix + "[].")
        else:
            yield prefix + "[]", inner.simpleString()
    elif isinstance(dt, MapType):
        yield prefix + "{key}", dt.keyType.simpleString()
        inner = dt.valueType
        if isinstance(inner, (StructType, ArrayType, MapType)):
            yield from _flatten(inner, prefix + "{value}.")
        else:
            yield prefix + "{value}", inner.simpleString()
    else:
        yield prefix.rstrip("."), dt.simpleString()


def _collapse(paths: dict[str, str], defaults: set[str]) -> dict[str, str]:
    """Drop subtree paths under a defaulted ancestor (collapseTree
    Typebus.scala:549-556): a default-bearing field absorbs evolution of
    everything beneath it."""
    out = {}
    for path, typ in paths.items():
        covered = any(
            path == d or path.startswith(d + ".") or path.startswith(d + "[]")
            for d in defaults
        )
        if not covered:
            out[path] = typ
    return out


@dataclass
class DeclaredType:
    fqn: str
    schema: StructType
    defaults: dict[str, Any] = field(default_factory=dict)

    def to_json(self) -> str:
        return json.dumps(
            {
                "fqn": self.fqn,
                "schema": json.loads(self.schema.json()),
                "defaults": self.defaults,
            },
            indent=2,
            sort_keys=True,
        )

    @staticmethod
    def from_json(s: str) -> "DeclaredType":
        d = json.loads(s)
        return DeclaredType(
            fqn=d["fqn"],
            schema=StructType.fromJson(d["schema"]),
            defaults=d.get("defaults", {}),
        )


def check_evolution(
    fqn: str, old: DeclaredType, new: DeclaredType
) -> list[str]:
    """Return the list of rule violations (empty = compatible).

    Rule order and wording mirror Typebus.scala:423-449.
    """
    old_paths = _collapse(dict(_flatten(old.schema)), set(old.defaults))
    new_paths = _collapse(dict(_flatten(new.schema)), set(new.defaults))
    violations: list[str] = []
    for path in sorted(old_paths.keys() & new_paths.keys()):
        if old_paths[path] != new_paths[path]:
            violations.append(
                f"field '{path}' changed type "
                f"{old_paths[path]} -> {new_paths[path]}"
            )
    for path in sorted(new_paths.keys() - old_paths.keys()):
        if path not in new.defaults:
            violations.append(f"field '{path}' added without a default value")
    for path in sorted(old_paths.keys() - new_paths.keys()):
        if path not in old.defaults:
            violations.append(
                f"field '{path}' removed but had no default value"
            )
    return violations


class TypeCatalog:
    """The schema DB: fqn → DeclaredType, persisted one JSON file per type.

    ``path=None`` keeps it in-memory (test bus parity). File names are the
    FQN, as in ResourceDb.databaseTablePath (ResourceDb.scala:7-14).
    """

    def __init__(self, path: str | None = None):
        self.path = path
        self._types: dict[str, DeclaredType] = {}
        if path:
            os.makedirs(path, exist_ok=True)
            for fn in os.listdir(path):
                if fn.endswith(".json"):
                    with open(os.path.join(path, fn)) as f:
                        t = DeclaredType.from_json(f.read())
                    self._types[t.fqn] = t

    def declare_type(
        self,
        fqn: str,
        schema: StructType,
        defaults: dict[str, Any] | None = None,
    ) -> DeclaredType:
        """Register (or re-register) a type; the evolution gate runs on
        re-registration and raises ``SchemaEvolutionError`` on violation —
        the runtime analog of typebus aborting the compile
        (Typebus.scala:403-449)."""
        if _has_refs(schema):
            raise ValueError(
                f"schema for {fqn} contains unresolved type references "
                "(ref_field markers); recursive/self-referential types "
                "must go through declare_recursive_type, which unrolls "
                "them to a bounded depth"
            )
        new = DeclaredType(fqn=fqn, schema=schema, defaults=defaults or {})
        old = self._types.get(fqn)
        if old is not None:
            violations = check_evolution(fqn, old, new)
            if violations:
                raise SchemaEvolutionError(fqn, violations)
            # merge: keep union of defaults (merge, Typebus.scala:507-519)
            merged = dict(old.defaults)
            merged.update(new.defaults)
            new = DeclaredType(fqn=fqn, schema=schema, defaults=merged)
        self._types[fqn] = new
        if self.path:
            with open(os.path.join(self.path, f"{fqn}.json"), "w") as f:
                f.write(new.to_json())
        return new

    def declare_recursive_type(
        self,
        fqn: str,
        schema: StructType,
        max_depth: int = 3,
        defaults: dict[str, Any] | None = None,
    ) -> DeclaredType:
        """Declare a self-referential type by bounded-depth unrolling.

        ``schema`` may contain :func:`ref_field` markers naming ``fqn``
        itself (self-recursion) or any already-declared type. A
        self-reference is expanded ``max_depth`` times below the root
        (so the declared type has ``max_depth + 1`` nesting levels);
        deeper levels are pruned — the ``recursiveFieldMaxDepth``
        contract of spark-avro/spark-protobuf. The reference instead ships runtime
        recursive codecs (Mapper.scala:70-96); an analytics engine needs
        a *columnar* shape, so the bounded unroll is the faithful
        Spark-first translation — and the evolution gate then applies to
        the unrolled form, so changing ``max_depth`` on re-declaration
        is itself an (intentionally) gated schema change.
        """
        if max_depth < 1:
            raise ValueError("max_depth must be >= 1")
        resolve: dict[str, StructType] = {
            name: t.schema for name, t in self._types.items()
        }
        resolve[fqn] = schema
        budget = {name: 1 for name in resolve}
        budget[fqn] = max_depth
        unrolled = _unroll(schema, resolve, budget)
        assert isinstance(unrolled, StructType)
        return self.declare_type(fqn, unrolled, defaults=defaults)

    def get(self, fqn: str) -> DeclaredType | None:
        return self._types.get(fqn)

    def schema_for(self, fqn: str) -> StructType:
        t = self._types.get(fqn)
        if t is None:
            raise KeyError(f"type not declared: {fqn}")
        return t.schema

    def fqns(self) -> list[str]:
        return sorted(self._types)

    def __contains__(self, fqn: str) -> bool:
        return fqn in self._types

    def __len__(self) -> int:
        return len(self._types)
