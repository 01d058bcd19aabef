"""Observability (SURVEY.md §2.1 C3/O1): heartbeat + engine metrics.

Reference: the ``Hb(ts)`` heartbeat event type (event/package.scala:173)
and trace side-channels. Spark-native form: a ``StreamingQueryListener``
that records per-batch progress as heartbeat rows, queryable like any
other stream — plus helpers to read them back as a DataFrame.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

HB_SCHEMA = (
    "query_id string, run_id string, batch_id long, ts string, "
    "num_input_rows long, input_rows_per_second double, "
    "process_rows_per_second double"
)


class HeartbeatListener(StreamingQueryListener):
    """Collects one Hb row per micro-batch progress event (thread-safe)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.rows: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        row = {
            "query_id": str(p.id),
            "run_id": str(p.runId),
            "batch_id": int(p.batchId),
            "ts": p.timestamp,
            "num_input_rows": int(p.numInputRows),
            "input_rows_per_second": float(p.inputRowsPerSecond or 0.0),
            "process_rows_per_second": float(p.processedRowsPerSecond or 0.0),
        }
        with self._lock:
            self.rows.append(row)

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def heartbeats(self, spark: SparkSession) -> DataFrame:
        """Hb rows as a DataFrame (the ``Hb(ts)`` analog)."""
        with self._lock:
            rows = list(self.rows)
        if not rows:
            return spark.createDataFrame([], HB_SCHEMA)
        return spark.createDataFrame(rows, HB_SCHEMA)


def attach_heartbeat(spark: SparkSession) -> HeartbeatListener:
    listener = HeartbeatListener()
    spark.streams.addListener(listener)
    return listener
