"""Vector expressions over ``array<float|double>`` columns — all JVM-side
Catalyst lambdas (``zip_with``/``aggregate``), no Python in the hot path.

Determinism note: every arithmetic step casts to double FIRST and folds
strictly left-to-right, so results are bit-identical to any engine doing
ordered double summation (the DuckDB oracle uses an explicit
``list_reduce`` with the same casts — verified 0.0 max abs diff).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def lit_vec(vals) -> Column:
    """A literal ``array<double>`` as ONE parsed expression.

    ``F.array(*[F.lit(float(x)) for x in vals])`` costs 2+ py4j round
    trips per element — ~45 ms for a 64-dim vector, multiplied by every
    centroid/plane in a codebook (measured: the argmax/LSH builders were
    the chattiest plan constructions in the whole inventory). One
    ``F.expr`` string is ~0.6 ms regardless of length. ``repr(float)``
    is shortest-round-trip and Spark parses double literals with
    ``Double.parseDouble``, so the plan literals are bit-identical to
    the ``F.lit`` form (asserted in tests/test_operators.py).
    """
    return F.expr(
        "array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")"
    )


def lit_vec_sql(vals) -> str:
    """The SQL text of :func:`lit_vec` — for embedding into larger
    single-parse expression strings."""
    return "array(" + ",".join(f"{float(x)!r}D" for x in vals) + ")"


from functools import lru_cache


@lru_cache(maxsize=64)
def _dot_by_name(a: str, b: str) -> Column:
    prods = F.zip_with(
        F.col(a), F.col(b), lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


# NOTE (r13, measured negative result): an unrolled fixed-dim dot
# (``0.0D + el(a,1)*el(b,1) + … + el(a,64)*el(b,64)`` as one F.expr)
# was tried against the aggregate/zip_with fold on the q_dedup_embedding
# pair stream (~200k 64-dim pairs at sf0.1): bit-identical values but
# 2.5x SLOWER (1.22 s fold vs 3.07 s unrolled, warm min-of-5, no Janino
# failures in stderr) — the 128-element_at chain compiles into a method
# past HotSpot's inlining/HugeMethodLimit sweet spot, while the
# interpreted fold is a tight loop that JITs well. The r10 HOF rule
# (rewrite lambdas out of UNBOUNDED streams) does not extend to
# bounded k-dim vector folds — keep the fold here.


def dot(a: Column | str, b: Column | str) -> Column:
    """Ordered-fold dot product in double precision (name pairs hit a
    fragment cache — the fold tree is ~15 py4j round trips)."""
    if isinstance(a, str) and isinstance(b, str):
        return _dot_by_name(a, b)
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


@lru_cache(maxsize=64)
def _norm_by_name(a: str) -> Column:
    sq = F.transform(F.col(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return _norm_by_name(a)
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    d = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double"))
    )
    return F.sqrt(F.aggregate(d, F.lit(0.0), lambda acc, v: acc + v))


def _quote_name(name: str) -> str:
    """Backtick-quote a (possibly dotted) column reference so reserved
    words ('from', 'order') parse; each path segment is quoted
    separately to keep struct-field access working."""
    return ".".join(f"`{p}`" for p in name.split("."))


def dot_lit_sql(vec_name: str, vals) -> str:
    """SQL text of the ordered-fold dot product of column ``vec_name``
    with a literal vector — textually identical semantics to
    ``dot(vec, lit_vec(vals))`` but embeddable in one-parse strings."""
    return (
        f"aggregate(zip_with({_quote_name(vec_name)}, {lit_vec_sql(vals)}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def hyperplane_signs(vec: Column | str, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(vec · plane_i),
    packed as a bit string. ``planes`` are driver-side literals (seeded),
    broadcast into the plan — no shuffle, no UDF.

    Built as ONE parsed expression when ``vec`` is a column name: the
    per-bit Column form costs ~130 py4j round trips per plane (the
    literal array alone is 2/element) — for 16 planes x 64 dims that was
    ~2 s of pure plan-construction latency per query."""
    if isinstance(vec, str):
        bits = ", ".join(
            f"CASE WHEN {dot_lit_sql(vec, p)} >= 0 THEN '1' ELSE '0' END"
            for p in planes
        )
        return F.expr(f"concat({bits})")
    bits = [
        F.when(dot(vec, lit_vec(p)) >= 0, "1").otherwise("0")
        for p in planes
    ]
    return F.concat(*bits)


def int8_quantize(vec: Column | str) -> Column:
    """Symmetric per-vector int8 quantization as a struct
    ``(scale double, q array<tinyint>)`` with
    ``q_i = round(127 * x_i / scale)``, ``scale = max|x_i|``.

    4x smaller than float32 on the wire/at rest — the standard storage
    format for a 100 TB embedding corpus (dequantize with
    ``q_i * scale / 127``). Pure Catalyst expressions: quantization
    happens scan-side with no shuffle and no UDF. A zero vector keeps
    scale 0 and quantizes to zeros.
    """
    v = _c(vec)
    mx = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    q = F.transform(
        v,
        lambda x: F.when(
            mx > 0, F.round(x.cast("double") * 127.0 / mx, 0)
        )
        .otherwise(F.lit(0.0))
        .cast("tinyint"),
    )
    return F.struct(mx.alias("scale"), q.alias("q"))


def int8_dequantize(qstruct: Column | str) -> Column:
    """Inverse of :func:`int8_quantize`: ``array<double>`` reconstruction
    ``q_i * scale / 127`` (ordered double ops — engine-portable)."""
    s = _c(qstruct)
    return F.transform(
        s.getField("q"),
        lambda x: x.cast("double") * s.getField("scale") / 127.0,
    )
