"""G4/G5/C3 parity: codegen output compiles, CLI round-trips, heartbeat
listener records streaming progress."""

from __future__ import annotations

import json
import subprocess
import sys

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from typebus_spark.catalog.codegen import to_ddl, to_python, to_sql_views
from typebus_spark.catalog.types import TypeCatalog

ORDER = StructType(
    [
        StructField("order_id", StringType(), False),
        StructField("amount", DoubleType()),
        StructField("qty", IntegerType()),
        StructField("tags", ArrayType(StringType())),
        StructField("attrs", MapType(StringType(), StringType())),
        StructField("placed_at", TimestampType()),
    ]
)


def _cat(tmp_path=None):
    c = TypeCatalog(str(tmp_path / "cat") if tmp_path else None)
    c.declare_type("api.order_placed", ORDER, defaults={"qty": 1})
    return c


def test_python_codegen_compiles_and_instantiates(tmp_path):
    src = to_python(_cat())
    ns: dict = {}
    exec(compile(src, "<gen>", "exec"), ns)
    cls = ns["OrderPlaced"]
    inst = cls(order_id="o1", amount=2.5)
    assert inst.qty == 1  # default from catalog
    assert inst.tags is None  # nullable default


def test_ddl_emission():
    ddl = to_ddl(_cat())
    assert "order_id string" in ddl["api.order_placed"]
    assert "attrs map<string,string>" in ddl["api.order_placed"]


def test_sql_views():
    out = to_sql_views(_cat(), "/data")
    assert "parquet.`/data/api.order_placed.parquet`" in out


def test_cli_gen_and_describe(tmp_path):
    _cat(tmp_path)  # persists to tmp_path/cat
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "typebus_spark.cli",
            "gen",
            "-t",
            str(tmp_path / "cat"),
            "-l",
            "python",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr
    assert "class OrderPlaced" in r.stdout
    r2 = subprocess.run(
        [
            sys.executable,
            "-m",
            "typebus_spark.cli",
            "describe",
            "-t",
            str(tmp_path / "cat"),
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
    )
    assert r2.returncode == 0, r2.stderr
    desc = json.loads(r2.stdout)
    assert desc["types"] == ["api.order_placed"]


def test_heartbeat_listener_records_progress(spark, tmp_path):
    import pyspark.sql.functions as F

    from typebus_spark.streaming.observe import attach_heartbeat

    listener = attach_heartbeat(spark)
    try:
        src = str(tmp_path / "in")
        spark.range(10).select(
            F.col("id"), (F.col("id") * 2).alias("v")
        ).write.parquet(src)
        q = (
            spark.readStream.schema("id long, v long")
            .parquet(src)
            .groupBy()
            .count()
            .writeStream.format("memory")
            .queryName("hb_test")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        import time

        hb = None
        for _ in range(20):  # listener events are async
            hb = listener.heartbeats(spark)
            if hb.count() > 0:
                break
            time.sleep(0.5)
        rows = hb.collect()
        assert len(rows) >= 1
        assert rows[0]["num_input_rows"] == 10
    finally:
        spark.streams.removeListener(listener)


def test_rpc_client_codegen_end_to_end(spark, tmp_path):
    """G4 typed-RpcClient emit (gen/package.scala:112-130 parity): the
    generated class compiles AND completes a real wire->gather round
    trip against a running service over FileBus."""
    import pyspark.sql.functions as F

    from typebus_spark.catalog.codegen import to_rpc_client
    from typebus_spark.registry import Service
    from typebus_spark.runtime import FileBus, start_service

    order = StructType(
        [
            StructField("order_id", StringType(), False),
            StructField("amount", DoubleType()),
        ]
    )
    confirm = StructType(
        [
            StructField("order_id", StringType(), False),
            StructField("status", StringType()),
        ]
    )
    svc = Service("order-service")
    svc.declare_type("api.OrderPlaced", order)
    svc.declare_type("api.OrderConfirmed", confirm)
    svc.register_stream(
        "api.OrderPlaced",
        "api.OrderConfirmed",
        lambda df: df.select(
            "meta", "order_id", F.lit("confirmed").alias("status")
        ),
    )

    src = to_rpc_client(svc.descriptor())
    ns: dict = {}
    exec(compile(src, "<gen-client>", "exec"), ns)
    cls = ns["OrderServiceRpcClient"]
    assert hasattr(cls, "order_placed")
    assert hasattr(cls, "gather_order_placed")

    bus = FileBus(str(tmp_path / "bus"))
    client = cls("caller-service", bus, spark)
    wired = client.order_placed(
        spark.createDataFrame([("o1", 5.0)], "order_id string, amount double")
    )
    q = start_service(svc, bus, spark, str(tmp_path / "ck"))
    q.awaitTermination(60)
    got = client.gather_order_placed(wired).collect()
    assert len(got) == 1
    assert got[0]["status"] == "completed"
    assert got[0]["right"]["status"] == "confirmed"


def test_cli_gen_client_from_descriptor(tmp_path):
    from typebus_spark.registry import Service

    svc = Service("order-service")
    svc.declare_type(
        "api.OrderPlaced",
        StructType([StructField("order_id", StringType(), False)]),
    )
    svc.declare_type(
        "api.OrderConfirmed",
        StructType([StructField("order_id", StringType(), False)]),
    )
    svc.register_stream(
        "api.OrderPlaced", "api.OrderConfirmed", lambda df: df
    )
    desc_path = tmp_path / "desc.json"
    desc_path.write_text(json.dumps(svc.descriptor()))
    out_path = tmp_path / "client.py"
    rc = subprocess.run(
        [
            sys.executable,
            "-m",
            "typebus_spark.cli",
            "gen",
            "-t",
            str(tmp_path / "cat"),
            "-l",
            "client",
            "--descriptor",
            str(desc_path),
            "-o",
            str(out_path),
        ],
        capture_output=True,
        text=True,
    )
    assert rc.returncode == 0, rc.stderr
    src = out_path.read_text()
    assert "class OrderServiceRpcClient" in src
    assert "def order_placed" in src


def test_describe_from_bus_end_to_end(spark, tmp_path):
    """The reference's `gen -s` remote-pull workflow (CommandParser.scala:
    60-123; typebus-kafka gen/Main.scala:14-52), completed: a requester
    publishes GetServiceDescriptor over the bus, the TARGET service —
    consuming the bus via start_service — auto-answers through its
    discovery stream, and the fetched descriptor drives every codegen
    target (rebuilt catalog → python dataclasses compile; descriptor →
    RPC client compiles)."""
    import pyspark.sql.functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    from typebus_spark.catalog.codegen import to_python, to_rpc_client
    from typebus_spark.catalog.discovery import (
        await_descriptor,
        catalog_from_descriptor,
        request_descriptor,
    )
    from typebus_spark.registry import Service
    from typebus_spark.runtime import FileBus, start_service

    target = Service("order-service")
    target.declare_type(
        "api.OrderPlaced",
        StructType([StructField("order_id", StringType(), False)]),
    )
    target.declare_type(
        "api.OrderConfirmed",
        StructType(
            [
                StructField("order_id", StringType(), False),
                StructField("status", StringType(), False),
            ]
        ),
    )
    target.register_stream(
        "api.OrderPlaced",
        "api.OrderConfirmed",
        lambda df: df.select(
            "meta", "order_id", F.lit("ok").alias("status")
        ),
    )

    bus = FileBus(str(tmp_path / "bus"))
    request_descriptor(spark, bus, "order-service")
    # the target consumes the bus exactly as a deployed service would
    q = start_service(target, bus, spark, str(tmp_path / "ck"))
    q.awaitTermination(60)

    desc = await_descriptor(spark, bus, "order-service", timeout=10)
    assert desc["service"] == "order-service"
    assert {"in": "api.OrderPlaced", "out": "api.OrderConfirmed"} in (
        desc["service_methods"]
    )

    # descriptor → catalog → python codegen compiles
    cat = catalog_from_descriptor(desc)
    assert "api.OrderPlaced" in cat.fqns()
    ns: dict = {}
    exec(compile(to_python(cat), "<gen>", "exec"), ns)
    assert "OrderPlaced" in ns

    # descriptor → RPC client codegen compiles
    ns2: dict = {}
    exec(compile(to_rpc_client(desc), "<genclient>", "exec"), ns2)


def test_cli_describe_from_bus_flag_validation():
    from typebus_spark.cli import main
    import pytest

    with pytest.raises(SystemExit):
        main(["describe", "--from-bus", "/tmp/nowhere"])  # missing -s
    with pytest.raises(SystemExit):
        main(["describe"])  # neither -t nor --from-bus
    with pytest.raises(SystemExit):
        main(["gen", "-l", "python"])  # neither -t nor --from-bus


def test_scala_codegen_shape():
    """ScalaCodeWriter.writeService parity (gen/package.scala:79-160):
    case classes with Option[T] nullables + literal defaults, Avro
    implicits block, and the RpcClient wire method when a descriptor is
    supplied."""
    from typebus_spark.catalog.codegen import to_scala

    cat = _cat()
    src = to_scala(cat)
    assert "final case class OrderPlaced(" in src
    assert "order_id: String" in src  # non-nullable: bare type
    # nullable-with-default keeps Option (nullability is independent of
    # default presence): a wire null still has a representation
    assert "qty: Option[Int] = Some(1)" in src
    assert "amount: Option[Double] = None" in src  # nullable -> Option
    assert "tags: Option[Seq[String]] = None" in src
    assert "attrs: Option[Map[String, String]] = None" in src
    assert "placed_at: Option[java.time.Instant] = None" in src
    assert "implicit val OrderPlacedReader = new AvroByteStreamReader[OrderPlaced]" in src
    assert src.count("{") == src.count("}")
    assert "RpcClient" not in src  # no descriptor, no client
    # reference import block (gen/package.scala:90-96) — the RpcClient
    # section needs every one of these to pass scalac
    for imp in (
        "import akka.actor.ActorSystem",
        "import scala.concurrent.Future",
        "import io.surfkit.typebus._",
        "import io.surfkit.typebus.event.EventMeta",
        "import io.surfkit.typebus.bus.Publisher",
        "import io.surfkit.typebus.client._",
        "import io.surfkit.typebus.event.{ServiceIdentifier,"
        " ServiceException}",
    ):
        assert imp in src, imp

    desc = {
        "service": "order-service",
        "service_methods": [
            {"in": "api.order_placed", "out": "api.order_placed"}
        ],
        "types": {},
    }
    src2 = to_scala(cat, desc)
    # Client.wire signature parity (Client.scala:32): explicit
    # Option[EventMeta] second arg, forwarded — not a dropped implicit
    assert (
        "def orderPlaced(x: OrderPlaced,"
        " eventMeta: Option[EventMeta] = None):"
        " Future[Either[ServiceException, OrderPlaced]] ="
        " wire[OrderPlaced, OrderPlaced](x, eventMeta)" in src2
    )
    assert src2.count("{") == src2.count("}")


def test_typescript_codegen_shape():
    from typebus_spark.catalog.codegen import to_typescript

    src = to_typescript(_cat())
    assert "export interface OrderPlaced {" in src
    assert "order_id: string;" in src  # non-nullable: required
    assert "qty: number;" in src  # default => required, not optional
    assert "amount?: number;" in src  # nullable -> optional
    assert "tags?: string[];" in src
    assert "attrs?: Record<string, string>;" in src
    assert src.count("{") == src.count("}")


def test_cli_gen_scala_and_typescript(tmp_path):
    from typebus_spark.cli import main

    _cat(tmp_path)  # writes the catalog dir
    out_sc = tmp_path / "gen.scala"
    assert main(
        ["gen", "-t", str(tmp_path / "cat"), "-l", "scala", "-o", str(out_sc)]
    ) == 0
    assert "final case class OrderPlaced(" in out_sc.read_text()
    out_ts = tmp_path / "gen.ts"
    assert main(
        ["gen", "-t", str(tmp_path / "cat"), "-l", "typescript",
         "-o", str(out_ts)]
    ) == 0
    assert "export interface OrderPlaced" in out_ts.read_text()


def test_cli_gen_push(tmp_path):
    """`gen --push` parity (CommandParser.scala:66-67): generated source
    is written into every code_gen.push directory from the conf."""
    import json as _json

    from typebus_spark.cli import main

    _cat(tmp_path)
    proj_a = tmp_path / "svc-a" / "src"
    proj_b = tmp_path / "svc-b" / "src"
    proj_a.mkdir(parents=True)
    proj_b.mkdir(parents=True)
    conf = tmp_path / ".typebus.conf"
    conf.write_text(
        _json.dumps({"code_gen": {"push": [str(proj_a), str(proj_b)]}})
    )
    out = tmp_path / "gen.py"
    rc = main(
        [
            "gen", "-t", str(tmp_path / "cat"), "-l", "python",
            "-o", str(out), "--push", "--conf", str(conf),
        ]
    )
    assert rc == 0
    for proj in (proj_a, proj_b):
        pushed = proj / "typebus_generated.py"
        assert pushed.read_text() == out.read_text()
        assert "class OrderPlaced" in pushed.read_text()

    import pytest

    with pytest.raises(SystemExit):  # missing conf is a config error
        main(
            ["gen", "-t", str(tmp_path / "cat"), "-l", "python",
             "-o", "-", "--push", "--conf", str(tmp_path / "nope.conf")]
        )


def test_scala_codegen_edge_types():
    """Round-5 review fixes: string defaults render as Scala string
    literals (repr() would emit Char-quoted garbage), None defaults fall
    back to Option, and field-less types emit case OBJECTS whose codec
    implicits reference `Name.type` (a bare `Name` is a term and fails
    scalac)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from typebus_spark.catalog.codegen import to_scala
    from typebus_spark.catalog.types import TypeCatalog

    cat = TypeCatalog()
    cat.declare_type(
        "api.with_defaults",
        StructType(
            [
                StructField("status", StringType(), False),
                StructField("note", StringType(), True),
            ]
        ),
        defaults={"status": 'pend"ing', "note": None},
    )
    cat.declare_type("api.ping", StructType([]))
    src = to_scala(cat)
    assert 'status: String = "pend\\"ing"' in src
    assert "note: Option[String] = None" in src
    assert "final case object Ping" in src
    assert "new AvroByteStreamReader[Ping.type]" in src
    assert "AvroByteStreamReader[Ping]\n" not in src
    assert src.count("{") == src.count("}")


def test_cli_gen_scala_with_local_descriptor(tmp_path):
    """gen -l scala honors a locally supplied --descriptor for the
    RpcClient section (previously only --from-bus reached it)."""
    import json as _json

    from typebus_spark.cli import main

    _cat(tmp_path)
    desc = {
        "service": "order-service",
        "service_methods": [
            {"in": "api.order_placed", "out": "api.order_placed"}
        ],
        "types": {},
    }
    dpath = tmp_path / "desc.json"
    dpath.write_text(_json.dumps(desc))
    out = tmp_path / "gen.scala"
    rc = main(
        ["gen", "-t", str(tmp_path / "cat"), "-l", "scala",
         "--descriptor", str(dpath), "-o", str(out)]
    )
    assert rc == 0
    src = out.read_text()
    assert "class RpcClient" in src
    assert "wire[OrderPlaced, OrderPlaced](x, eventMeta)" in src
