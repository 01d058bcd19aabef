"""Partitioned-write sink: bounded file counts per partition directory."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from typebus_spark.operators.sink import compact_partitions, write_partitioned
from typebus_spark.session import load_table


def _files_per_dir(path: str, col: str) -> dict[str, int]:
    out = {}
    for d in glob.glob(os.path.join(path, f"{col}=*")):
        out[os.path.basename(d)] = len(
            [f for f in os.listdir(d) if f.endswith(".parquet")]
        )
    return out


def test_write_partitioned_one_file_per_value(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "by_type")
    write_partitioned(ev, path, ["event_type"])
    counts = _files_per_dir(path, "event_type")
    assert counts, "no partition dirs written"
    # hash-aligned tasks: exactly one file per partition value
    assert all(n == 1 for n in counts.values()), counts
    # round-trip: nothing lost
    assert spark.read.parquet(path).count() == ev.count()


def test_write_partitioned_salted_spreads_hot_value(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "salted")
    write_partitioned(ev, path, ["event_type"], files_per_partition=4)
    counts = _files_per_dir(path, "event_type")
    assert counts
    # salting bounds files per dir at files_per_partition (rand salt may
    # produce fewer for sparse values, never more)
    assert all(1 <= n <= 4 for n in counts.values()), counts
    assert spark.read.parquet(path).count() == ev.count()


def test_max_records_per_file_splits_large_partitions(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    n = ev.count()
    path = str(tmp_path / "capped")
    write_partitioned(
        ev, path, ["event_type"], max_records_per_file=200
    )
    counts = _files_per_dir(path, "event_type")
    # the dominant values exceed 200 rows at any SF → those dirs split;
    # sparse values may legitimately stay at one file
    assert any(v > 1 for v in counts.values()), counts
    assert spark.read.parquet(path).count() == n


def test_compact_partitions_folds_small_files(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    path = str(tmp_path / "compact")
    # simulate streaming appends: several small writes accumulate files
    for i in range(3):
        write_partitioned(
            ev.filter(F.col("event_id") % 3 == i),
            path,
            ["event_type"],
            mode="append",
        )
    before = _files_per_dir(path, "event_type")
    assert all(v >= 3 for v in before.values()), before
    n = spark.read.parquet(path).count()
    compact_partitions(spark, path, ["event_type"])
    after = _files_per_dir(path, "event_type")
    assert all(v == 1 for v in after.values()), after
    assert spark.read.parquet(path).count() == n


def test_partitioned_read_prunes_partitions(spark, sf_dir, tmp_path):
    """Reading one partition value back must scan ONLY that directory:
    the predicate lands in PartitionFilters (metadata pruning — zero IO
    for other partitions), not PushedFilters/post-scan."""
    from typebus_spark.plans.checks import formatted_plan
    from typebus_spark.session import load_table

    out = str(tmp_path / "by_type")
    ev = load_table(spark, sf_dir, "events")
    write_partitioned(ev, out, ["event_type"])
    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    plan = formatted_plan(back)
    pf = [ln for ln in plan.splitlines() if "PartitionFilters:" in ln]
    assert pf and "event_type" in pf[0], plan
    n = back.count()
    assert n == ev.filter(F.col("event_type") == "purchase").count()


def test_range_partitioned_write_orders_files(spark, sf_dir, tmp_path):
    """Time-ordered layout for time-series scans: repartitionByRange +
    sortWithinPartitions gives globally range-partitioned files, so a
    time-band query prunes to a contiguous file subset (the layout for
    100 TB event history; formats with min/max file stats skip the
    rest at planning time)."""
    out = str(tmp_path / "by_range")
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    (
        ev.repartitionByRange(8, "ts")
        .sortWithinPartitions("ts")
        .write.mode("overwrite")
        .parquet(out)
    )
    import pyspark.sql.functions as FF

    back = spark.read.parquet(out)
    # per input file: [min ts, max ts] — ranges must not overlap
    spans = (
        back.groupBy(FF.input_file_name().alias("f"))
        .agg(FF.min("ts").alias("lo"), FF.max("ts").alias("hi"))
        .collect()
    )
    spans = sorted([(r["lo"], r["hi"]) for r in spans])
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (hi1, lo2)
    assert back.count() == ev.count()
