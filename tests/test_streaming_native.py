"""Native Structured Streaming paths: applyInPandasWithState entity fold
and the watermarked stream-stream RPC join (SURVEY.md §2.1 E1/RPC1 in
their true streaming forms)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from typebus_spark.streaming.entity import streaming_fold_last
from typebus_spark.streaming.rpc import correlate_stream


def _stage_stream(spark, tmp_path, name, df):
    d = str(tmp_path / name)
    df.write.parquet(d)
    return spark.readStream.schema(df.schema).parquet(d)


def test_streaming_fold_last_applyinpandas_with_state(spark, tmp_path):
    events = spark.createDataFrame(
        [
            ("e1", "2024-01-01 00:00:00", "created", 1.0),
            ("e1", "2024-01-01 00:01:00", "paid", 2.0),
            ("e2", "2024-01-01 00:00:30", "created", 5.0),
        ],
        "id string, ts string, status string, amount double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    stream = _stage_stream(spark, tmp_path, "entity_events", events)
    folded = streaming_fold_last(
        stream,
        key_col="id",
        ts_col="ts",
        state_ddl="id string, ts timestamp, status string, amount double",
    )
    q = (
        folded.writeStream.format("memory")
        .queryName("entity_states")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["id"]: r for r in spark.table("entity_states").collect()}
    assert rows["e1"]["status"] == "paid"  # latest by event time wins
    assert rows["e2"]["status"] == "created"


def test_correlate_stream_watermarked_join(spark, tmp_path):
    reqs = spark.createDataFrame(
        [("r1", "2024-01-01 00:00:00"), ("r2", "2024-01-01 00:00:05"),
         ("rX", "2024-01-01 01:00:00")],  # late row advances the watermark
        "rid string, at string",
    ).select(
        F.struct(
            F.col("rid").alias("event_id"),
            F.lit("c").alias("correlation_id"),
            F.lit(None).cast("string").alias("response_to"),
            F.col("at").cast("timestamp").alias("occurred_at"),
        ).alias("meta"),
        F.struct(F.col("rid").alias("q")).alias("payload"),
    )
    resps = spark.createDataFrame(
        [("r1", "2024-01-01 00:00:02", "ans1"),
         ("zz", "2024-01-01 01:00:00", "keepalive")],
        "rt string, at string, a string",
    ).select(
        F.struct(
            F.lit("e").alias("event_id"),
            F.lit("c").alias("correlation_id"),
            F.col("rt").alias("response_to"),
            F.col("at").cast("timestamp").alias("occurred_at"),
        ).alias("meta"),
        F.struct(F.col("a").alias("a")).alias("payload"),
    )
    out = correlate_stream(
        _stage_stream(spark, tmp_path, "req", reqs),
        _stage_stream(spark, tmp_path, "resp", resps),
        timeout_seconds=4.0,
        watermark_delay="1 second",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("rpc_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["request_id"]: r for r in spark.table("rpc_stream").collect()}
    # r1 matched within the window
    assert rows["r1"]["status"] == "completed"
    assert rows["r1"]["right"]["a"] == "ans1"
    # r2 never answered → emitted as timeout once the watermark passed
    assert rows["r2"]["status"] == "timeout"
    assert rows["r2"]["left"]["throwable_type"].endswith("TimeoutException")


def test_streaming_fold_last_is_incremental(spark, tmp_path):
    """Second batch of files updates only the touched keys (state store
    continuity across micro-batches via checkpoint)."""
    d = str(tmp_path / "inc")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(d)
    first = spark.createDataFrame(
        [("e1", "2024-01-01 00:00:00", "created", 1.0)],
        "id string, ts string, status string, amount double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    first.write.mode("append").parquet(d)
    emitted: list = []

    def run_once():
        stream = spark.readStream.schema(
            "id string, ts timestamp, status string, amount double"
        ).parquet(d)
        folded = streaming_fold_last(
            stream, "id", "ts",
            "id string, ts timestamp, status string, amount double",
        )
        q = (
            folded.writeStream.foreachBatch(
                lambda df, _bid: emitted.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert [r["status"] for r in emitted if r["id"] == "e1"] == ["created"]
    second = spark.createDataFrame(
        [("e1", "2024-01-01 00:05:00", "paid", 2.0)],
        "id string, ts string, status string, amount double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    second.write.mode("append").parquet(d)
    run_once()  # recovery from checkpoint: only the new file is processed
    assert [r["status"] for r in emitted if r["id"] == "e1"] == [
        "created",
        "paid",
    ]  # state advanced across restarts
