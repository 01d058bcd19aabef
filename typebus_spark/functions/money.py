"""Exact cross-engine money aggregation.

``round(sum(double), 2)`` is NOT portable: partial-aggregation order
differs between engines (and between partitionings of the same engine),
so sums differ by ~1e-9 — and once in a few thousand groups that epsilon
straddles a .005 rounding boundary and the oracle hash flips (observed:
137947.485). Double→decimal casts don't help (Spark rounds, DuckDB
truncates — verified).

The portable scheme: source money columns are 2-decimal-clean (verified
≤4e-9 from integer cents across all tables), so

1. per row: ``cents(col) = CAST(round(col*100, 0) AS BIGINT)`` — both
   engines round the SAME double that sits ~1e-9 from an integer; no
   rule can disagree.
2. aggregate in INTEGER space (sums/products exact; int64 headroom to
   ~sf10 for 3-factor revenue — use DECIMAL(38,0) sums beyond).
3. emit ``CAST(sum AS DOUBLE) / scale`` — one IEEE division of
   identical operands → bit-identical output, no rounding step at all.

SQL-side fragments mirror these exactly (``sql_cents``/``sql_money``).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


from functools import lru_cache


@lru_cache(maxsize=256)
def _cents_by_name(col: str) -> Column:
    # backticks: isidentifier() admits SQL reserved words ('from',
    # 'order'), which would fail to parse unquoted
    return F.expr(f"CAST(round(`{col}` * 100, 0) AS BIGINT)")


def cents(col: Column | str) -> Column:
    """Exact integer cents of a 2dp-clean double column.

    String inputs hit a per-name cache of one parsed expression — this
    helper is the single most frequently built fragment in the
    relational inventory (~2.4k py4j round trips per full build
    uncached). The parsed form is textually sql_cents, so Spark and
    oracle stay definitionally identical."""
    if isinstance(col, str) and col.isidentifier():
        return _cents_by_name(col)
    return F.round(_c(col) * 100, 0).cast("long")


def money(sum_expr: Column, scale: int) -> Column:
    """Integer aggregate → monetary double: one exact division."""
    return sum_expr.cast("double") / F.lit(float(scale))


def sql_cents(col: str) -> str:
    return f"CAST(round({col} * 100, 0) AS BIGINT)"


def sql_money(agg_expr: str, scale: int) -> str:
    return f"(CAST({agg_expr} AS DOUBLE) / {float(scale)})"
