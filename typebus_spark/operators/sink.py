"""Partition-aware parquet sinks: the write-path discipline at 100 TB.

A naive ``df.write.partitionBy(col)`` emits one file per (task ×
partition value) — a 1000-task job over 100 partition values scatters
100,000 files, and downstream scans pay an open/footer cost per file
(the classic small-files problem). The fixes composed here:

- **hash-align tasks to partition values** (``repartition(cols)``): each
  partition value lands in exactly one task → one file per directory;
- **cap file size** (``maxRecordsPerFile``): a skewed partition value
  splits into bounded files instead of one multi-GB file;
- **spread a hot value over N writers** (``files_per_partition``): salt
  appended to the repartition key when one value dominates — N files
  per directory, written in parallel.

The reference has no storage layer at all (Kafka-only; SURVEY.md §2.2
"file formats: none") — this is engine-native surface for the
training-data pipelines the north star adds.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
    max_records_per_file: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet write with bounded file counts.

    ``files_per_partition`` > 1 salts the repartition key so a hot
    partition value is written by that many tasks in parallel (useful
    when one date/language dominates the batch).
    """
    keys = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        salt = (F.rand() * files_per_partition).cast("int")
        out = df.repartition(*keys, salt)
    else:
        out = df.repartition(*keys)
    writer = out.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def compact_partitions(
    spark,
    path: str,
    partition_cols: list[str],
    files_per_partition: int = 1,
) -> None:
    """Rewrite an existing partitioned dataset with bounded file counts
    (the periodic compaction job every streaming sink needs — appends
    accumulate small files; this folds them back to
    ``files_per_partition`` per directory)."""
    df = spark.read.parquet(path)
    tmp = f"{path}__compact_tmp"
    write_partitioned(
        df, tmp, partition_cols, files_per_partition, mode="overwrite"
    )
    # swap so the dataset path is NEVER absent: old→aside, new→live,
    # then drop the aside copy. A crash mid-swap leaves either the old
    # or the new data at a discoverable path (a crash between the two
    # moves leaves the live path briefly missing but the data intact at
    # path__old — recoverable by hand). Table formats (Delta, Iceberg —
    # not on this classpath) do this transactionally.
    import shutil

    old = f"{path}__old"
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)


def zorder_key(a, b, bits: int = 8):
    """Z-order (Morton) key interleaving the low ``bits`` of two integer
    columns — sort/range-partition by this key and BOTH dimensions get
    locality, so files carry tight min/max ranges on a AND b and a scan
    filtered on either dimension prunes most files (the Delta/Iceberg
    OPTIMIZE ZORDER technique, as a pure expression).

    Unrolled to ``2*bits`` literal bit ops — engine-portable exact
    integer math, no UDF.
    """
    import pyspark.sql.functions as FF

    ac = FF.col(a) if isinstance(a, str) else a
    bc = FF.col(b) if isinstance(b, str) else b
    z = FF.lit(0).cast("long")
    for i in range(bits):
        # disjoint bit positions → plain addition IS the bitwise OR
        # (pyspark's Column `|` is logical OR, not bitwise)
        z = (
            z
            + (ac.bitwiseAND(FF.lit(1 << i)).cast("long") * (1 << i))
            + (bc.bitwiseAND(FF.lit(1 << i)).cast("long") * (1 << (i + 1)))
        )
    return z
