"""Scale-path mechanics: bucketed co-located joins elide shuffles; event
streams with watermarks drop late data (§2.2 late-data policy)."""

from __future__ import annotations

import pyspark.sql.functions as F

from typebus_spark.operators.bucketing import bucketed_join, write_bucketed
from typebus_spark.plans.checks import count_exchanges


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "k"), "b_orders", "k", 8,
        path=str(tmp_path / "b_orders"),
    )
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "k"), "b_lineitem", "k", 8,
        path=str(tmp_path / "b_lineitem"),
    )
    j = bucketed_join(spark, "b_orders", "b_lineitem", "k")
    # co-located: no hash exchange on either side
    assert count_exchanges(j) == 0, j._jdf.queryExecution().toString()
    # sanity: same result as the shuffled join
    plain = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert j.count() == plain
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a watermark: an event arriving after
    the watermark passed its window is DROPPED (late-data policy).

    Two micro-batch waves through one checkpoint: wave 1 advances the
    watermark far past the early window; wave 2 delivers a late event
    into that closed window — the emitted counts never include it.
    """
    d = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    emitted: list = []

    def run_once():
        stream = spark.readStream.schema("ts timestamp, v long").parquet(d)
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("h"), "n")
        )
        q = (
            agg.writeStream.foreachBatch(
                lambda df, _b: emitted.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    wave1 = spark.createDataFrame(
        [("2024-01-01 00:10:00", 1), ("2024-01-01 05:00:00", 2)],
        "ts string, v long",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    wave1.write.mode("append").parquet(d)
    run_once()
    run_once()  # empty batch advances the watermark → 00:00 window emits
    counts = {str(r["h"]): r["n"] for r in emitted}
    assert counts.get("2024-01-01 00:00:00") == 1

    # wave 2: late event into the long-closed 00:00 window
    late = spark.createDataFrame(
        [("2024-01-01 00:20:00", 3)], "ts string, v long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    late.write.mode("append").parquet(d)
    run_once()
    run_once()
    counts = {}
    for r in emitted:
        counts[str(r["h"])] = counts.get(str(r["h"]), 0) + r["n"]
    # the late row was dropped: the 00:00 window still counts exactly 1
    assert counts["2024-01-01 00:00:00"] == 1


def test_parse_delay_matches_watermark_units():
    """The append-family cutoff literal is DERIVED from the watermark
    delay string (ADVICE r8) — every unit Spark's CalendarInterval
    accepts for our delays must parse to the same duration here."""
    import datetime

    from typebus_spark.queries.dataflow import _parse_delay

    assert _parse_delay("1 hour") == datetime.timedelta(hours=1)
    assert _parse_delay("2 hours") == datetime.timedelta(hours=2)
    assert _parse_delay("30 minutes") == datetime.timedelta(minutes=30)
    assert _parse_delay("45 seconds") == datetime.timedelta(seconds=45)
    assert _parse_delay("1 day") == datetime.timedelta(days=1)
