"""Dataflow-parity tests (SURVEY.md §5 item 2): envelope round-trip (D1-D3),
routing incl. dead-letter (R1/O2), reply correlation (RPC2/RPC3), keyed
publish (K1), trace loop-guard (O1), descriptor (C1), end-to-end streaming
via FileBus + foreachBatch (O3)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from typebus_spark.codec.envelope import decode_envelope, encode_envelope
from typebus_spark.registry import Service
from typebus_spark.runtime import (
    DEAD_LETTER_TOPIC,
    TRACE_TOPIC,
    FileBus,
    run_batch,
    start_service,
)

ORDER_SCHEMA = StructType(
    [
        StructField("order_id", StringType()),
        StructField("customer_id", StringType()),
        StructField("amount", DoubleType()),
    ]
)
CONFIRM_SCHEMA = StructType(
    [
        StructField("order_id", StringType()),
        StructField("status", StringType()),
    ]
)


@pytest.fixture()
def svc():
    s = Service("order-service")
    s.declare_type("api.OrderPlaced", ORDER_SCHEMA)
    s.declare_type("api.OrderConfirmed", CONFIRM_SCHEMA)

    def confirm(df):
        # keeps customer_id so the out-stream partition key (computed on
        # the handler OUTPUT, as in bus/package.scala:36-39) can use it
        return df.select(
            "meta",
            F.col("order_id"),
            F.col("customer_id"),
            F.when(F.col("amount") > 0, "confirmed")
            .otherwise("rejected")
            .alias("status"),
        )

    s.register_stream(
        "api.OrderPlaced",
        "api.OrderConfirmed",
        confirm,
        partition_key="customer_id",
    )
    return s


def _orders(spark, with_reply=False):
    df = spark.createDataFrame(
        [("o1", "c1", 10.0), ("o2", "c2", -5.0)],
        "order_id string, customer_id string, amount double",
    )
    meta = None
    if with_reply:
        from typebus_spark.codec.envelope import new_meta

        meta = new_meta(
            "api.OrderPlaced",
            direct_reply_path=F.lit("/user/gather-1"),
            direct_reply_service=F.lit("client-service"),
        )
    return encode_envelope(
        df, "api.OrderPlaced", key=F.col("customer_id"), meta=meta
    )


def test_envelope_roundtrip(spark):
    raw = _orders(spark)
    decoded = decode_envelope(raw, ORDER_SCHEMA)
    rows = {r["payload"]["order_id"]: r for r in decoded.collect()}
    assert set(rows) == {"o1", "o2"}
    m = rows["o1"]["meta"]
    assert m["event_type"] == "api.OrderPlaced"
    assert m["event_id"] and m["correlation_id"]
    assert rows["o1"]["payload"]["amount"] == 10.0


def test_envelope_roundtrip_nested_containers(spark):
    """§1.2 type-mapping parity: Seq[Struct], Set→array, Map, Option→null
    round-trip through the envelope codec (macro whitelist analog,
    Typebus.scala:174-214)."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        MapType,
        TimestampType,
    )

    order = StructType(
        [
            StructField("order_id", StringType()),
            StructField(
                "items",
                ArrayType(
                    StructType(
                        [
                            StructField("sku", StringType()),
                            StructField("qty", IntegerType()),
                        ]
                    )
                ),
            ),
            StructField("tags", ArrayType(StringType())),
            StructField("attrs", MapType(StringType(), StringType())),
            StructField("note", StringType()),  # Option[T] → nullable
            StructField("placed_at", TimestampType()),
        ]
    )
    df = spark.createDataFrame(
        [
            (
                "o1",
                [{"sku": "a", "qty": 2}, {"sku": "b", "qty": 1}],
                ["x", "y"],
                {"k": "v"},
                None,
                None,
            )
        ],
        order,
    )
    raw = encode_envelope(df, "api.NestedOrder")
    back = decode_envelope(raw, order).collect()[0]["payload"]
    assert back["order_id"] == "o1"
    assert [r["sku"] for r in back["items"]] == ["a", "b"]
    assert back["items"][0]["qty"] == 2
    assert back["tags"] == ["x", "y"]
    assert back["attrs"] == {"k": "v"}
    assert back["note"] is None


def test_keyed_publish_sets_kafka_key(spark):
    raw = _orders(spark)
    keys = {bytes(r["key"]).decode() for r in raw.collect()}
    assert keys == {"c1", "c2"}


def test_route_and_reply_correlation(spark, svc):
    res = run_batch(svc, _orders(spark))
    out = res.topic("api.OrderConfirmed")
    assert out is not None
    vals = [json.loads(bytes(r["value"]).decode()) for r in out.collect()]
    statuses = {v["payload"]["order_id"]: v["payload"]["status"] for v in vals}
    assert statuses == {"o1": "confirmed", "o2": "rejected"}
    for v in vals:
        assert v["meta"]["event_type"] == "api.OrderConfirmed"
        assert v["meta"]["response_to"]  # RPC join key set to request eventId
    # K1: partition key flows to the bus key column
    keys = {bytes(r["key"]).decode() for r in out.collect()}
    assert keys == {"c1", "c2"}


def test_unhandled_topic_dead_letters(spark, svc):
    df = spark.createDataFrame([("x",)], "order_id string")
    raw = encode_envelope(df, "api.Unknown")
    res = run_batch(svc, raw)
    dl = res.topic(DEAD_LETTER_TOPIC)
    assert dl is not None and dl.count() == 1
    v = json.loads(bytes(dl.collect()[0]["value"]).decode())
    assert v["payload"]["message"] == "no handler for topic"
    assert v["payload"]["extra"]["topic"] == "api.Unknown"


def test_undecodable_payload_dead_letters(spark, svc):
    raw = spark.createDataFrame(
        [(None, b"not json at all", "api.OrderPlaced")],
        "key binary, value binary, topic string",
    )
    res = run_batch(svc, raw)
    dl = res.topic(DEAD_LETTER_TOPIC)
    assert dl is not None and dl.count() == 1


def test_rpc_reply_also_published_to_caller_topic(spark, svc):
    res = run_batch(svc, _orders(spark, with_reply=True))
    rpc = res.topic("_rpc_replies")
    assert rpc is not None
    topics = {r["topic"] for r in rpc.collect()}
    assert topics == {"client-service"}  # KafkaBus.scala:157-169 parity


def test_trace_side_output_loop_guard(spark, svc):
    from typebus_spark.runtime import TRACE_IN_TOPIC, TRACE_OUT_TOPIC

    res = run_batch(svc, _orders(spark), trace=True)
    tr = res.topic(TRACE_IN_TOPIC)
    assert tr is not None and tr.count() == 2
    # typed InEventTrace wrapper: payload = (service, event) with the
    # full original envelope inside (event/package.scala:35-38)
    v = json.loads(bytes(tr.collect()[0]["value"]).decode())
    assert v["meta"]["event_type"] == TRACE_IN_TOPIC
    assert v["payload"]["service"] == "order-service"
    assert v["payload"]["event"]["meta"]["event_type"] == "api.OrderPlaced"
    # OutEventTrace at the publish site (KafkaBus.scala:75)
    out_tr = res.topic(TRACE_OUT_TOPIC)
    assert out_tr is not None and out_tr.count() == 2
    ov = json.loads(bytes(out_tr.collect()[0]["value"]).decode())
    assert ov["payload"]["event"]["meta"]["event_type"] == "api.OrderConfirmed"
    # a trace event re-entering the bus must NOT be re-traced
    svc.declare_type(TRACE_TOPIC, ORDER_SCHEMA)
    svc.register_stream(TRACE_TOPIC, None, lambda df: None)
    df = spark.createDataFrame([("t1", "c", 0.0)], ORDER_SCHEMA)
    raw = encode_envelope(df, TRACE_TOPIC)
    res2 = run_batch(svc, raw, trace=True)
    assert res2.topic(TRACE_TOPIC) is None or res2.topic(TRACE_TOPIC).count() == 0


def test_per_event_trace_flag_and_exception_trace(spark):
    """meta.trace=true traces a single event even with the global flag
    off (bus/package.scala:66-68); a handler give-up emits an
    ExceptionTrace beside the ServiceException dead-letter
    (bus/package.scala:110-124)."""
    from typebus_spark.codec.envelope import new_meta
    from typebus_spark.runtime import (
        TRACE_EXCEPTION_TOPIC,
        TRACE_IN_TOPIC,
    )

    s = Service("trace-svc")
    s.declare_type("api.T", ORDER_SCHEMA)
    s.declare_type("api.R", CONFIRM_SCHEMA)
    s.register_stream(
        "api.T",
        "api.R",
        lambda df: df.select(
            "meta",
            "order_id",
            F.lit("done").alias("status"),
            F.when(F.col("amount") < 0, "boom").alias("_error"),
        ),
    )
    df = spark.createDataFrame(
        [("ok", "c1", 1.0), ("bad", "c2", -1.0)],
        "order_id string, customer_id string, amount double",
    )
    raw = encode_envelope(
        df, "api.T", meta=new_meta("api.T", trace=True)
    )
    res = run_batch(s, raw, trace=False)  # global flag OFF
    assert res.topic(TRACE_IN_TOPIC).count() == 2  # per-event flag wins
    exc = res.topic(TRACE_EXCEPTION_TOPIC)
    assert exc is not None and exc.count() == 1
    ev = json.loads(bytes(exc.collect()[0]["value"]).decode())
    assert ev["meta"]["event_type"] == TRACE_EXCEPTION_TOPIC
    assert ev["payload"]["event"]["payload"]["order_id"] == "bad"


def test_descriptor(svc):
    d = svc.descriptor()
    assert d["service"] == "order-service"
    assert {"in": "api.OrderPlaced", "out": "api.OrderConfirmed"} in d[
        "service_methods"
    ]
    assert "api.OrderPlaced" in d["types"]
    assert svc.subscribed_topics() == sorted(
        {"api.OrderPlaced", "order-service", Service.GET_DESCRIPTOR_FQN}
    )


def test_streaming_retry_end_to_end_filebus(spark, tmp_path):
    """ST1 over the real streaming path: wave 1 fails the handler and
    publishes to the retry topic; the next start_service run (same
    checkpoint) picks the retry file up and succeeds with attempt=1."""
    from pyspark.sql.types import IntegerType

    from typebus_spark.registry import BackoffShape, RetryPolicy

    s = Service("retry-stream-svc")
    s.declare_type(
        "api.Flaky",
        StructType(
            [
                StructField("task_id", StringType()),
                StructField("fail_times", IntegerType()),
            ]
        ),
    )
    s.declare_type(
        "api.FlakyDone",
        StructType([StructField("task_id", StringType())]),
    )

    def handler(df):
        attempt = F.coalesce(
            F.col("meta.extra").getItem("attempt").cast("int"), F.lit(0)
        )
        return df.select(
            "meta",
            "task_id",
            F.when(attempt < F.col("fail_times"), F.lit("boom")).alias("_error"),
        )

    s.register_stream(
        "api.Flaky",
        "api.FlakyDone",
        handler,
        retry=RetryPolicy(3, 0.0, BackoffShape.NONE),  # immediately eligible
    )
    bus = FileBus(str(tmp_path / "bus"))
    df = spark.createDataFrame(
        [("t1", 1)], "task_id string, fail_times int"
    )
    bus.publish(encode_envelope(df, "api.Flaky"), "api.Flaky")

    q = start_service(s, bus, spark, str(tmp_path / "ck"))
    q.awaitTermination(60)
    assert bus.read(spark, ["api.FlakyDone"]).count() == 0  # failed wave 1
    assert bus.read(spark, ["api.Flaky.retry"]).count() == 1

    q2 = start_service(s, bus, spark, str(tmp_path / "ck"))
    q2.awaitTermination(60)
    done = bus.read(spark, ["api.FlakyDone"])
    assert done.count() == 1
    v = json.loads(bytes(done.collect()[0]["value"]).decode())
    assert v["payload"]["task_id"] == "t1"


def test_streaming_end_to_end_filebus(spark, svc, tmp_path):
    bus = FileBus(str(tmp_path / "bus"))
    bus.publish(_orders(spark), "api.OrderPlaced")
    q = start_service(svc, bus, spark, str(tmp_path / "ckpt"))
    q.awaitTermination(60)
    out = bus.read(spark, ["api.OrderConfirmed"])
    vals = [json.loads(bytes(r["value"]).decode()) for r in out.collect()]
    assert {v["payload"]["status"] for v in vals} == {"confirmed", "rejected"}
    # O3: re-running from the same checkpoint must not double-publish
    q2 = start_service(svc, bus, spark, str(tmp_path / "ckpt"))
    q2.awaitTermination(60)
    assert bus.read(spark, ["api.OrderConfirmed"]).count() == 2


def test_descriptor_answered_on_bus(spark, svc, tmp_path):
    """C1 on the bus (KafkaBus.scala:130-134): a GetServiceDescriptor
    envelope yields a ServiceDescriptor reply envelope via FileBus."""
    bus = FileBus(str(tmp_path / "bus"))
    req = spark.createDataFrame([("order-service",)], "service string")
    bus.publish(
        encode_envelope(req, Service.GET_DESCRIPTOR_FQN),
        Service.GET_DESCRIPTOR_FQN,
    )
    q = start_service(svc, bus, spark, str(tmp_path / "ck"))
    q.awaitTermination(60)
    out = bus.read(spark, [Service.DESCRIPTOR_FQN]).collect()
    payloads = [
        json.loads(bytes(r["value"]).decode())["payload"] for r in out
    ]
    answered = [p for p in payloads if "descriptor" in p]
    assert answered, payloads
    desc = json.loads(answered[0]["descriptor"])
    assert desc["service"] == "order-service"
    assert {"in": "api.OrderPlaced", "out": "api.OrderConfirmed"} in desc[
        "service_methods"
    ]
    # hidden control-plane stream must not leak into the method list
    assert all(
        m["in"] != Service.GET_DESCRIPTOR_FQN for m in desc["service_methods"]
    )


def test_descriptor_broadcast_on_startup(spark, svc, tmp_path):
    """KafkaBus.scala:247 parity: starting a service announces its
    descriptor even with no request in flight."""
    bus = FileBus(str(tmp_path / "bus"))
    q = start_service(svc, bus, spark, str(tmp_path / "ck"))
    q.awaitTermination(60)
    out = bus.read(spark, [Service.DESCRIPTOR_FQN]).collect()
    payloads = [
        json.loads(bytes(r["value"]).decode())["payload"] for r in out
    ]
    assert any(p.get("service") == "order-service" for p in payloads)


def test_entity_db_accessor_stream(spark):
    """T4 auto DbAccessor stream (Service.scala:66-71): register_entity
    with a snapshot installs a hidden lookup stream; requests on
    <state_type>.get are answered with current state, misses with null
    state fields."""
    from pyspark.sql.types import LongType

    state_schema = StructType(
        [
            StructField("id", StringType(), False),
            StructField("status", StringType(), True),
            StructField("amount", DoubleType(), True),
        ]
    )
    snap = spark.createDataFrame(
        [("e1", "paid", 5.0), ("e2", "open", 7.5)], state_schema
    )
    s = Service("entity-service")
    s.declare_type("api.OrderState", state_schema)
    s.register_entity("order", "api.OrderState", key_col="id", snapshot=snap)
    assert "api.OrderState.get" in s.streams
    assert s.streams["api.OrderState.get"].service_level

    reqs = spark.createDataFrame([("e1",), ("nope",)], "id string")
    raw = encode_envelope(reqs, "api.OrderState.get")
    res = run_batch(s, raw)
    replies = res.topic("api.OrderState")
    got = {
        json.loads(bytes(r["value"]).decode())["payload"]["id"]: json.loads(
            bytes(r["value"]).decode()
        )["payload"]
        for r in replies.collect()
    }
    assert got["e1"]["status"] == "paid" and got["e1"]["amount"] == 5.0
    assert got["nope"].get("status") is None  # miss → null state fields


def test_avro_wire_format(spark):
    """D1/D3 avro path: real code behind wire_format='avro'. The
    spark-avro jar is absent in this container, so the round-trip is
    skip-marked; the schema generator and the clear-error path are
    asserted either way."""
    from typebus_spark.codec.envelope import (
        _avro_available,
        avro_schema_json,
        published_event_schema,
    )

    env_schema = published_event_schema(ORDER_SCHEMA)
    sch = json.loads(avro_schema_json(env_schema))
    assert sch["type"] == "record" and sch["name"] == "PublishedEvent"
    names = {f["name"] for f in sch["fields"]}
    assert names == {"meta", "payload"}
    meta_rec = next(f for f in sch["fields"] if f["name"] == "meta")["type"][1]
    meta_names = [f["name"] for f in meta_rec["fields"]]
    assert "event_id" in meta_names and "occurred_at" in meta_names

    df = spark.createDataFrame([("o1", "c1", 1.0)], ORDER_SCHEMA)
    if not _avro_available(spark):
        with pytest.raises(RuntimeError, match="spark-avro"):
            encode_envelope(df, "api.OrderPlaced", wire_format="avro")
        pytest.skip("spark-avro jar absent: avro round-trip untestable here")
    raw = encode_envelope(df, "api.OrderPlaced", wire_format="avro")
    back = decode_envelope(raw, ORDER_SCHEMA, wire_format="avro").collect()[0]
    assert back["payload"]["order_id"] == "o1"
    assert back["meta"]["event_type"] == "api.OrderPlaced"


def test_client_wire_gather_end_to_end(spark, svc, tmp_path):
    """Client.wire parity (Client.scala:32-52): requests published with
    direct_reply = client back-channel; the service's reply lands on that
    channel (RPC2 multicast); gather() correlates into Either-shaped
    rows; an unanswered request times out to ServiceException."""
    from typebus_spark.streaming.client import Client

    bus = FileBus(str(tmp_path / "bus"))
    client = Client("client-service", bus, spark)
    reqs = spark.createDataFrame(
        [("o1", "c1", 10.0), ("o2", "c2", -5.0)],
        "order_id string, customer_id string, amount double",
    )
    wired = client.wire(reqs, "api.OrderPlaced")

    # responder: the registered service consumes the topic, replies
    q = start_service(svc, bus, spark, str(tmp_path / "ck"))
    q.awaitTermination(60)

    out = client.gather(wired, CONFIRM_SCHEMA)
    rows = {r["right"]["order_id"]: r for r in out.collect() if r["right"]}
    assert rows["o1"]["status"] == "completed"
    assert rows["o1"]["right"]["status"] == "confirmed"
    assert rows["o2"]["right"]["status"] == "rejected"

    # timeout path: a request nobody answers, clock pushed past timeout
    lonely = client.wire(
        spark.createDataFrame([("o9", "c9", 1.0)],
                              "order_id string, customer_id string, amount double"),
        "api.Unanswered" if False else "api.OrderPlaced",
    )
    late = client.gather(
        lonely, CONFIRM_SCHEMA,
        now=F.current_timestamp() + F.expr("INTERVAL 1 HOUR"),
    )
    st = {r["request_id"]: r for r in late.collect()}
    assert all(r["status"] == "timeout" and r["left"] is not None
               for r in st.values())


def test_forward_direct_reply_to_third_service(spark, svc, tmp_path):
    """RPC3 forward (Forwarding.scala:13-27): the forwarder names a
    third service as direct_reply; the responder's reply lands on THAT
    service's back-channel, not the forwarder's."""
    from typebus_spark.streaming.client import forward

    bus = FileBus(str(tmp_path / "bus"))
    reqs = spark.createDataFrame(
        [("o1", "c1", 10.0)],
        "order_id string, customer_id string, amount double",
    )
    forward(bus, reqs, "api.OrderPlaced", caller_service="third-service")
    q = start_service(svc, bus, spark, str(tmp_path / "ck"))
    q.awaitTermination(60)
    landed = bus.read(spark, ["third-service"]).collect()
    assert len(landed) == 1
    v = json.loads(bytes(landed[0]["value"]).decode())
    assert v["payload"]["status"] == "confirmed"


def test_encode_envelope_fast_path_bytes_equal_column_path(spark):
    """The single-parse encode fast path must emit byte-identical wire
    values to the Column-built path (same struct field order, same JSON
    shape) — modulo the per-row uuids/timestamp, which are masked here
    by decoding both sides and comparing the deterministic fields."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    from typebus_spark.codec.envelope import new_meta

    df = spark.range(5).select(
        F.col("id").alias("event_id"),
        (F.col("id") * 2).alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
    )
    key = F.col("user_id").cast("string")
    fast = encode_envelope(
        df, "api.T", payload_cols=["event_id", "user_id", "value"], key=key
    )
    # force the Column path by passing meta explicitly
    slow = encode_envelope(
        df,
        "api.T",
        payload_cols=["event_id", "user_id", "value"],
        key=key,
        meta=new_meta("api.T", key=key),
    )
    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    def norm(rows):
        out = []
        for r in sorted(rows, key=lambda r: json.loads(bytes(r["value"]))["payload"]["event_id"]):
            d = json.loads(bytes(r["value"]))
            meta = d["meta"]
            # mask per-row nondeterminism; everything else must match
            for k in ("event_id", "correlation_id", "occurred_at"):
                meta.pop(k, None)
            out.append(
                (bytes(r["key"] or b""), r["topic"], json.dumps(d, sort_keys=True),
                 tuple(sorted(meta.keys())), tuple(sorted(d["payload"].items())))
            )
        return out

    f_rows, s_rows = norm(fast.collect()), norm(slow.collect())
    assert [x[0] for x in f_rows] == [x[0] for x in s_rows]  # keys
    assert [x[1] for x in f_rows] == [x[1] for x in s_rows]  # topics
    # full masked JSON bodies: catches a fast-path VALUE regression in
    # deterministic meta fields (key, trace, direct_reply), which the
    # key-set compare below would miss
    assert [x[2] for x in f_rows] == [x[2] for x in s_rows]
    assert [x[3] for x in f_rows] == [x[3] for x in s_rows]  # meta keys
    assert [x[4] for x in f_rows] == [x[4] for x in s_rows]  # payloads
    # and both decode through the same schema to identical typed rows
    fd = decode_envelope(fast, schema).select("payload.*").collect()
    sd = decode_envelope(slow, schema).select("payload.*").collect()
    assert sorted(map(tuple, fd)) == sorted(map(tuple, sd))


def test_kafka_bus_plan_assertions_without_jar(spark):
    """The Kafka jar is absent in this env (CLAUDE.md), so the Kafka
    branch is asserted at the BUILDER level: subscription/offset/
    checkpoint options, the (key, value, topic) sink row contract with
    key driven by partition_key (K1, KafkaBus.scala:117,121,184), and
    signature compatibility with start_service's per-topic read_stream
    calls — a jar drop then becomes config-only."""
    from typebus_spark.codec.envelope import encode_envelope
    from typebus_spark.runtime import KafkaBus

    bus = KafkaBus("broker1:9092,broker2:9092")

    # start_service passes a SINGLE topic string per subscribed topic
    ropts = bus.reader_options("api.Task")
    assert ropts["subscribe"] == "api.Task"
    assert ropts["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert ropts["startingOffsets"] == "latest"  # auto.offset.reset parity
    assert bus.reader_options(["a.X", "a.Y"])["subscribe"] == "a.X,a.Y"

    wopts = bus.writer_options(checkpoint="/ck/svc", topic="api.Out")
    assert wopts["checkpointLocation"] == "/ck/svc"
    assert wopts["topic"] == "api.Out"
    # without an explicit topic the sink must route by the row's topic
    # column — no "topic" option pinned
    assert "topic" not in bus.writer_options(checkpoint="/ck/svc")

    # K1 keyed publish: the envelope frame IS the Kafka sink contract
    df = spark.createDataFrame([(1, "u1")], "task_id long, user string")
    env = encode_envelope(df, "api.Task", key=F.col("user"))
    assert [f.name for f in env.schema.fields[:3]] == list(bus.RAW_COLUMNS)
    assert dict(env.dtypes)["key"] == "binary"
    assert dict(env.dtypes)["value"] == "binary"
    assert dict(env.dtypes)["topic"] == "string"
    row = env.select(*bus.RAW_COLUMNS).collect()[0]
    assert bytes(row["key"]) == b"u1" and row["topic"] == "api.Task"
