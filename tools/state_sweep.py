"""State-store sweep at Nx input: {partitions} x {provider} grid over
the three append+watermark shapes (VERDICT r9 item 6 — the r9 sweep
ran the default HDFS-map provider only; the documented cluster story
is RocksDB for state > heap, so the grid must show where the crossover
sits on THIS hardware).

Protocol: ALL settings alternate inside each repetition (the pinned
interleaved-sweep discipline — a sequential sweep reliably flatters
whichever setting runs in the calmer block on this shared host); warm
min over repetitions per cell.

Usage: python tools/state_sweep.py [factor] [reps]   (default 10, 3)
Prints one JSON line per (shape, provider, partitions) cell.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from typebus_spark import get_spark  # noqa: E402
from typebus_spark.session import (  # noqa: E402
    load_table,
    no_data_microbatches_disabled,
    pinned_shuffle_partitions,
    state_store_provider,
)

PARTITIONS = (2, 4, 8)
PROVIDERS = ("hdfs", "rocksdb")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="state-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    from tools.scale_smoke import replicate

    ev = load_table(spark, sf_dir, "events")
    big = replicate(ev, "event_id", factor, 100_000_000)
    stage = tempfile.mkdtemp(prefix="sweep_ev_")
    big.select("event_id", "user_id", "event_type", "ts", "value").write.mode(
        "overwrite"
    ).parquet(stage)
    batch = spark.read.parquet(stage)

    def wsrc():
        return (
            spark.readStream.schema(batch.schema)
            .parquet(stage)
            .withColumn(
                "wts",
                F.expr(
                    "to_utc_timestamp(cast(ts as timestamp), "
                    "current_timezone())"
                ),
            )
            .withWatermark("wts", "1 hour")
        )

    def shape_hourly():
        return (
            wsrc()
            .groupBy(F.window("wts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(F.col("w.start").alias("hour_start"), "n_events")
        ), True

    def shape_session():
        return (
            wsrc()
            .groupBy(
                "user_id", F.session_window("wts", "30 minutes").alias("w")
            )
            .agg(F.count(F.lit(1)).alias("n_events"))
            .select(
                "user_id", F.col("w.start").alias("session_start"), "n_events"
            )
        ), True

    def shape_dedup():
        return (
            wsrc()
            .select("user_id", "event_type", "wts")
            .dropDuplicatesWithinWatermark(["user_id", "event_type"])
            .select("user_id", "event_type")
        ), False

    shapes = {
        "hourly_append": shape_hourly,
        "session_append": shape_session,
        "dedup_bounded": shape_dedup,
    }
    best: dict[tuple, float] = {}
    state_rows: dict[tuple, int] = {}
    for rep in range(reps):
        for parts in PARTITIONS:
            for provider in PROVIDERS:
                for sname, builder in shapes.items():
                    out, needs_no_data = builder()
                    name = f"sw_{uuid.uuid4().hex[:8]}"
                    ctx = (
                        contextlib.nullcontext()
                        if needs_no_data
                        else no_data_microbatches_disabled(spark)
                    )
                    t0 = time.perf_counter()
                    with pinned_shuffle_partitions(spark, parts), \
                            state_store_provider(spark, provider), ctx:
                        q = (
                            out.writeStream.format("memory")
                            .queryName(name)
                            .outputMode("append")
                            .trigger(availableNow=True)
                            .start()
                        )
                    q.awaitTermination(600)
                    spark.table(name).count()
                    wall = round(time.perf_counter() - t0, 2)
                    key = (sname, provider, parts)
                    best[key] = min(best.get(key, 9e9), wall)
                    prog = q.lastProgress
                    if prog and prog.get("stateOperators"):
                        state_rows[key] = prog["stateOperators"][0].get(
                            "numRowsTotal"
                        )
                    q.stop()
        print(f"# rep {rep} done", file=sys.stderr, flush=True)
    for (sname, provider, parts), wall in sorted(best.items()):
        print(
            json.dumps(
                {
                    "shape": sname,
                    "provider": provider,
                    "partitions": parts,
                    "factor": factor,
                    "min_wall_sec": wall,
                    "state_rows": state_rows.get((sname, provider, parts)),
                }
            ),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
