"""Skew mitigation utilities: salting for hot keys.

AQE's skew-join splitting (on by default in session.py) covers sort-merge
join skew at runtime; these helpers cover the cases AQE can't:

- **salted_aggregate**: two-phase aggregation for hot-key groupBy. Phase 1
  aggregates on (key, salt) — the hot key's rows spread over N reducers —
  phase 2 merges the partials. Works for any algebraic aggregate
  (sum/count/min/max and combinations that expose a merge expression).
- **salted_join**: replicate the small side N× (one copy per salt),
  salt the big side's hot keys — the classic broadcast-unfriendly
  skewed-equi-join fix when the dim is too big to broadcast whole.

Both are pure DataFrame rewrites — no RDDs, no custom partitioners — so
Catalyst/AQE still optimize around them.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Uniform random salt in [0, n_salts) — nondeterministic by design
    (load-spreading), applied before a phase-1 aggregation."""
    return df.withColumn(salt_col, (F.rand() * n_salts).cast("int"))


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: name → (phase1_agg_expr, phase2_merge_expr) where phase2
    references the phase-1 output column by name. Example::

        salted_aggregate(df, ["k"], {
            "total": (F.sum("v"), F.sum("total")),
            "n":     (F.count(F.lit(1)), F.sum("n")),
        })
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[merge.alias(name) for name, (_, merge) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed equi-join: big side salted, small side replicated n_salts×.

    Join key becomes (on, salt) — the hot key's big-side rows land on
    n_salts different reducers instead of one. Replication cost is
    |small| × n_salts, so pick n_salts ≈ (hot-key rows / normal-key rows)
    bounded by available parallelism.
    """
    big_s = with_salt(big, n_salts)
    small_s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")
