"""Runtime: materialize registered streams over a transport.

Reference pipeline (TypebusKafkaConsumer.startConsumerGraph,
/root/reference/typebus-kafka/.../KafkaBus.scala:191-242):

    source(topics) → decode → merge(retry) → route→handler → retry-state
                   → reply+commit

Spark re-expression (SURVEY.md §3.1): each registered stream becomes
``source.filter(topic==in_fqn) → from_json decode → handler transform →
to_json encode (responseTo/correlation propagated) → sink``, with
unroutable/undecodable rows to a dead-letter topic (O2), RPC replies
additionally published to the caller's service topic (RPC2,
KafkaBus.scala:157-169), and checkpointing giving exactly-once to
idempotent sinks — strictly stronger than the reference's
commit-after-publish at-least-once (O3, KafkaBus.scala:172).

``run_batch`` is the per-micro-batch function; streaming mode wraps the
same function in ``foreachBatch`` so batch tests exercise the exact code
the stream runs (typebus-testkit parity, TestBus.scala:27-169).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from typebus_spark.codec.envelope import decode_envelope, new_meta
from typebus_spark.registry import Service
from typebus_spark.streaming.retry import (
    eligible_now,
    encode_retry,
    not_yet_eligible,
    retry_topic,
    split_failures,
)

DEAD_LETTER_TOPIC = "typebus.DeadLetter"
TRACE_TOPIC = "typebus.Trace"
SOCKET_TOPIC_PREFIX = "typebus.socket."

# ServiceException shape (event/package.scala:28-33)
SERVICE_EXCEPTION_COLS = ["message", "throwable_type", "stack_trace", "extra"]


@dataclass
class BatchResult:
    """Outputs of one batch pass, keyed by destination topic."""

    outputs: dict[str, DataFrame] = field(default_factory=dict)

    def topic(self, name: str) -> DataFrame | None:
        return self.outputs.get(name)

    def _add(self, topic: str, df: DataFrame) -> None:
        cur = self.outputs.get(topic)
        self.outputs[topic] = cur.unionByName(df) if cur is not None else df


def _dead_letter(raw: DataFrame, message: str) -> DataFrame:
    """Wrap raw bus rows as ServiceException envelopes
    (produceErrorReport, bus/package.scala:93-125)."""
    payload = F.struct(
        F.lit(message).alias("message"),
        F.lit("java.lang.RuntimeException").alias("throwable_type"),
        F.array().cast("array<string>").alias("stack_trace"),
        F.map_from_arrays(
            F.array(F.lit("topic")), F.array(F.col("topic"))
        ).alias("extra"),
    )
    env = F.struct(
        new_meta("typebus.ServiceException").alias("meta"), payload.alias("payload")
    )
    return raw.select(
        F.lit(None).cast("binary").alias("key"),
        F.to_json(env).cast("binary").alias("value"),
        F.lit(DEAD_LETTER_TOPIC).alias("topic"),
    )


def run_batch(
    service: Service,
    raw: DataFrame,
    trace: bool = False,
    now_epoch: int | None = None,
    lazy: bool = False,
) -> BatchResult:
    """Route one batch of raw bus rows through every registered stream.

    ``raw`` columns: ``key binary, value binary, topic string`` — the
    transport-neutral bus row (Kafka source shape). ``now_epoch`` pins the
    retry clock for deterministic tests (wall clock otherwise).
    """
    res = BatchResult()
    now = F.lit(now_epoch) if now_epoch is not None else None

    # R1 routing: topic-per-type makes dispatch a source-level filter.
    # Retry topics route back to their base stream (U1 merge analog).
    handled = set(service.streams) | {
        retry_topic(f) for f, s in service.streams.items() if s.retry
    }
    unhandled = raw.filter(~F.col("topic").isin(*handled) if handled else F.lit(True))
    if lazy or not unhandled.isEmpty():
        res._add(DEAD_LETTER_TOPIC, _dead_letter(unhandled, "no handler for topic"))

    for in_fqn, sd in service.streams.items():
        topics = [in_fqn] + ([retry_topic(in_fqn)] if sd.retry else [])
        topic_rows = raw.filter(F.col("topic").isin(*topics))
        payload_schema = service.catalog.schema_for(in_fqn)
        decoded = decode_envelope(topic_rows, payload_schema).cache()

        if sd.retry:
            # Backoff gate: rows whose not_before hasn't passed are
            # re-queued untouched (KafkaBus.scala:188-197 merge semantics,
            # minus the 16-element dropHead load-shed — nothing is shed).
            pending = not_yet_eligible(decoded, now)
            if lazy or not pending.isEmpty():
                res._add(
                    retry_topic(in_fqn),
                    pending.select(
                        F.lit(None).cast("binary").alias("key"),
                        F.to_json(F.struct("meta", "payload"))
                        .cast("binary")
                        .alias("value"),
                        F.lit(retry_topic(in_fqn)).alias("topic"),
                    ),
                )
            decoded = eligible_now(decoded, now)

        bad = decoded.filter(F.col("payload").isNull() | F.col("meta").isNull())
        if lazy or not bad.isEmpty():
            res._add(
                DEAD_LETTER_TOPIC,
                _dead_letter(
                    bad.select(
                        F.lit(None).cast("binary").alias("key"),
                        F.to_json(F.struct("meta", "payload"))
                        .cast("binary")
                        .alias("value"),
                        F.lit(in_fqn).alias("topic"),
                    ),
                    "undecodable payload",
                ),
            )
        good = decoded.filter(
            F.col("payload").isNotNull() & F.col("meta").isNotNull()
        )

        if trace:  # O1 trace-in side output (bus/package.scala:66-90);
            # loop-guard: never trace the trace topic itself (:69-74)
            res._add(
                TRACE_TOPIC,
                good.filter(F.col("meta.event_type") != TRACE_TOPIC).select(
                    F.lit(None).cast("binary").alias("key"),
                    F.to_json(F.struct("meta", "payload")).cast("binary").alias(
                        "value"
                    ),
                    F.lit(TRACE_TOPIC).alias("topic"),
                ),
            )

        # T1: handler over (meta, payload-fields); flatten payload for
        # ergonomic expression handlers, keep meta for correlation.
        flat = good.select("meta", "payload.*")
        out = sd.handler(flat)

        # ST1/ST2 + C2: rows marked failed (``_error`` convention) are
        # re-delivered from the ORIGINAL event (semi-join on the retry
        # state key meta.event_id, KafkaBus.scala:205) with backoff, or
        # dead-lettered on give-up / when no policy is attached.
        failed = None
        if out is not None:
            out, failed = split_failures(out)
        if failed is not None and (lazy or not failed.isEmpty()):
            from typebus_spark.streaming.retry import ERROR_COL

            # ST2 selective retry: only errors matching the stream's
            # retry_on pattern are retryable (the PF.isDefinedAt analog,
            # bus/package.scala:41-45); the rest dead-letter directly.
            if sd.retry and sd.retry_on:
                retryable_ids = failed.filter(
                    F.col(ERROR_COL).rlike(sd.retry_on)
                )
                unmatched_ids = failed.filter(
                    ~F.col(ERROR_COL).rlike(sd.retry_on)
                )
            else:
                retryable_ids, unmatched_ids = failed, None

            def _orig(ids: DataFrame) -> DataFrame:
                return (
                    good.join(
                        ids.select(F.col("meta.event_id").alias("_fid")),
                        F.col("meta.event_id") == F.col("_fid"),
                        "left_semi",
                    )
                    .select("meta", "payload.*")
                )

            payload_fields = [f.name for f in payload_schema.fields]
            if sd.retry:
                retry_rows, gave_up = encode_retry(
                    _orig(retryable_ids), in_fqn, sd.retry, payload_fields, now
                )
                if lazy or not retry_rows.isEmpty():
                    res._add(retry_topic(in_fqn), retry_rows)
            else:
                gave_up = _orig(retryable_ids)
            if unmatched_ids is not None:
                gave_up = gave_up.unionByName(_orig(unmatched_ids))
            if lazy or not gave_up.isEmpty():
                res._add(
                    DEAD_LETTER_TOPIC,
                    _dead_letter(
                        gave_up.select(
                            F.lit(None).cast("binary").alias("key"),
                            F.to_json(F.struct("meta")).cast("binary").alias(
                                "value"
                            ),
                            F.lit(in_fqn).alias("topic"),
                        ),
                        "handler failed",
                    ),
                )

        if sd.out_type is None or out is None:
            continue  # T2 terminal sink stream

        # Reply encoding (replyAndCommit, KafkaBus.scala:136-169):
        # responseTo = request eventId, correlationId propagated,
        # directReply passed through (RPC3), partition key from builder.
        # The payload is projected to the DECLARED out-type schema (static
        # typing analog of O4 return-type resolution); the partition key
        # may reference any handler-output column, mirroring
        # ``withPartitionKey(U => String)`` (bus/package.scala:36-39).
        if "meta" not in out.columns:
            raise ValueError(
                f"handler for {in_fqn} must preserve the 'meta' column"
            )
        out_schema = service.catalog.schema_for(sd.out_type)
        out_cols = [f.name for f in out_schema.fields]
        missing = [c for c in out_cols if c not in out.columns]
        if missing:
            raise ValueError(
                f"handler for {in_fqn} output is missing declared "
                f"{sd.out_type} fields: {missing}"
            )
        pk = sd.partition_key
        key_col = (
            F.col(pk).cast("string")
            if isinstance(pk, str)
            else (pk.cast("string") if pk is not None else F.lit(None).cast("string"))
        )
        reply_meta = new_meta(
            sd.out_type,
            key=key_col,
            correlation_id=F.col("meta.correlation_id"),
            response_to=F.col("meta.event_id"),
            direct_reply_path=F.col("meta.direct_reply.path"),
            direct_reply_service=F.col("meta.direct_reply.service_name"),
            socket_id=F.col("meta.socket_id"),
        )
        env = F.struct(
            reply_meta.alias("meta"),
            F.struct(*[F.col(c) for c in out_cols]).alias("payload"),
        )
        encoded = out.select(
            key_col.cast("binary").alias("key"),
            F.to_json(env).cast("binary").alias("value"),
            F.lit(sd.out_type).alias("topic"),
            F.col("meta.direct_reply.service_name").alias("_reply_service"),
            F.col("meta.socket_id").alias("_socket_id"),
        )
        if lazy or not encoded.isEmpty():
            res._add(
                sd.out_type, encoded.drop("_reply_service", "_socket_id")
            )
        # RPC2: additionally publish to the caller's service-name topic
        # (KafkaBus.scala:60-73,157-169).
        rpc = encoded.filter(F.col("_reply_service").isNotNull())
        if lazy or not rpc.isEmpty():
            res._add(
                "_rpc_replies",
                rpc.select(
                    "key",
                    "value",
                    F.col("_reply_service").alias("topic"),
                ),
            )
        # SocketEvent push delivery (event/package.scala:156-159): replies
        # carrying a socket_id also land on a per-socket push topic.
        sock = encoded.filter(F.col("_socket_id").isNotNull())
        if lazy or not sock.isEmpty():
            res._add(
                "_socket_pushes",
                sock.select(
                    "key",
                    "value",
                    F.concat(
                        F.lit(SOCKET_TOPIC_PREFIX), F.col("_socket_id")
                    ).alias("topic"),
                ),
            )
    return res


def drain_batches(
    service: Service,
    raw: DataFrame,
    now_epoch: int = 1_000_000,
    clock_step: int = 10_000,
    max_rounds: int = 10,
) -> BatchResult:
    """Batch-mode retry drain: run ``run_batch``, feed retry topics back
    in with the simulated clock advanced past every backoff, until the
    retry queue is empty (the in-process analog of the streaming retry
    loop — used for deterministic tests and batch reprocessing jobs)."""
    merged = BatchResult()
    now = now_epoch
    for _ in range(max_rounds):
        # lazy routing: skip the per-branch isEmpty materializations (each
        # one re-runs the decode+handler pipeline); one emptiness check on
        # the unioned retry queue per round decides termination.
        res = run_batch(service, raw, now_epoch=now, lazy=True)
        retry_dfs = []
        for topic, df in res.outputs.items():
            if topic.endswith(".retry"):
                retry_dfs.append(df)
            else:
                merged._add(topic, df)
        if not retry_dfs:
            break
        raw = retry_dfs[0]
        for d in retry_dfs[1:]:
            raw = raw.unionByName(d)
        raw = raw.cache()
        if raw.isEmpty():
            break
        now += clock_step
    return merged


class FileBus:
    """File-backed transport: one parquet directory per topic under a root.

    Stand-in for Kafka with the same row shape ``(key, value, topic)``;
    the Kafka connector jar is absent in this environment, and the
    streaming file source supports the same read/readStream surface. On a
    real cluster ``KafkaBus`` (below) swaps in behind the same API.
    """

    RAW_SCHEMA = "key binary, value binary, topic string"

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _dir(self, topic: str) -> str:
        return os.path.join(self.root, topic)

    def publish(self, df: DataFrame, topic: str | None = None) -> None:
        for (top,) in (
            df.select("topic").distinct().collect() if topic is None else [(topic,)]
        ):
            part = df.filter(F.col("topic") == top) if topic is None else df
            part.select("key", "value", "topic").write.mode("append").parquet(
                self._dir(top)
            )

    def read(self, spark: SparkSession, topics: list[str]) -> DataFrame:
        dfs = [
            spark.read.schema(self.RAW_SCHEMA).parquet(self._dir(t))
            for t in topics
            if os.path.isdir(self._dir(t))
        ]
        if not dfs:
            return spark.createDataFrame([], self.RAW_SCHEMA)
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def read_stream(self, spark: SparkSession, topic: str) -> DataFrame:
        os.makedirs(self._dir(topic), exist_ok=True)
        return spark.readStream.schema(self.RAW_SCHEMA).parquet(self._dir(topic))


class KafkaBus:
    """Real-Kafka transport (S1/K1/K2). Requires the spark-sql-kafka
    connector on the classpath; unavailable in this container, so this is
    the documented scale path, exercised via FileBus locally."""

    def __init__(self, bootstrap_servers: str):
        self.bootstrap = bootstrap_servers

    def read_stream(self, spark: SparkSession, topics: list[str]) -> DataFrame:
        return (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("subscribe", ",".join(topics))
            .option("startingOffsets", "latest")  # auto.offset.reset=latest
            .load()
            .select("key", "value", "topic")
        )

    def write_stream(self, df: DataFrame, checkpoint: str):
        return (
            df.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap)
            .option("checkpointLocation", checkpoint)
            .start()
        )


def start_service(
    service: Service,
    bus: FileBus,
    spark: SparkSession,
    checkpoint_root: str,
    trace: bool = False,
):
    """Materialize every registered stream as ONE multiplexed Structured
    Streaming query: union of subscribed topic streams → ``foreachBatch``
    running the same ``run_batch`` as the batch path, publishing outputs
    back to the bus. Checkpointed (O3)."""
    topics = [t for t in service.subscribed_topics()]
    src = None
    for t in topics:
        s = bus.read_stream(spark, t)
        src = s if src is None else src.unionByName(s)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        result = run_batch(service, batch_df, trace=trace)
        for topic, df in result.outputs.items():
            if topic.startswith("_"):  # _rpc_replies/_socket_pushes:
                bus.publish(df)  # per-row topic column
            else:
                bus.publish(df, topic)

    return (
        src.writeStream.foreachBatch(process)
        .option("checkpointLocation", os.path.join(checkpoint_root, service.name))
        .trigger(availableNow=True)
        .start()
    )
