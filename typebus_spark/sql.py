"""SQL surface: register the engine's tables as temp views and run SQL.

``engine.sql(...)`` is the second half of the user contract — everything
in ``queries/`` is expressible either through the DataFrame API or
through this entry point against the same Catalyst planner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from typebus_spark.session import load_table

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> None:
    """Create/refresh one temp view per driver table (normalized via
    load_table, so e.g. events timestamps are usable)."""
    for name in tables or TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    register_tables(spark, sf_dir)
    return spark.sql(query)
