"""Physical-plan introspection helpers — the engine's ".explain and
iterate" discipline, made assertable.

Every inventory query has plan expectations (tests/test_plans.py):
filters pushed to the parquet scan, dimension joins broadcast, no
accidental cartesian products, whole-stage codegen present. A correct
query with the wrong plan is a 100 TB incident waiting; these checks
keep plan regressions out at test time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def plan_has(df: DataFrame, *needles: str) -> dict[str, bool]:
    plan = formatted_plan(df)
    return {n: (n in plan) for n in needles}


def assert_plan(
    df: DataFrame,
    contains: list[str] | None = None,
    not_contains: list[str] | None = None,
) -> None:
    plan = formatted_plan(df)
    missing = [n for n in (contains or []) if n not in plan]
    present = [n for n in (not_contains or []) if n in plan]
    if missing or present:
        raise AssertionError(
            f"plan expectation failed: missing={missing} "
            f"unexpected={present}\n{plan}"
        )


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from every parquet scan in the plan."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line[len("PushedFilters:"):].strip())
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — column-pruning evidence."""
    plan = formatted_plan(df)
    return [
        line.strip()[len("ReadSchema:"):].strip()
        for line in plan.splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def simple_plan(df: DataFrame) -> str:
    """One-line-per-node physical plan (includes operator arguments like
    the Sort global flag, which the formatted header omits)."""
    return df._jdf.queryExecution().executedPlan().toString()


def has_global_sort(df: DataFrame) -> bool:
    """True if any Sort node sorts globally (range-partition + total
    order) — the scale-breaker pattern for top-k style queries."""
    return any(
        "Sort [" in line and "], true," in line
        for line in simple_plan(df).splitlines()
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan."""
    plan = formatted_plan(df)
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange hashpartitioning" in line or "Exchange rangepartitioning" in line
    )
