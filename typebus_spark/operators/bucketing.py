"""Bucketed (pre-shuffled) tables: co-located joins without a shuffle.

At 100 TB the dominant cost of fact⨝fact joins is the shuffle. Writing
both sides bucketed by the join key (same bucket count) lets Spark plan a
sort-merge join with NO exchange on either side — the cluster-sharding
analog of the reference (numberOfShards, cluster/Actor.scala:7), but for
data at rest. Bucket count plays the shard-count role: pick ~2-4× total
cores, keep it stable across tables that join together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Persist as a bucketed managed table (saveAsTable is required —
    bucket metadata lives in the catalog, not the files)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    w = w.sortBy(sort_col or bucket_col)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key; with matching
    bucket specs Catalyst elides both exchanges (verify with
    plans.checks.count_exchanges == 0)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
