"""CLI (SURVEY.md §2.1 G5): ``python -m typebus_spark <cmd>``.

Reference: the scopt REPL with ``gen -t <dir> -o <out>`` / ``gen --push``
(typebus/.../cli/CommandParser.scala:33-123). Subcommands here:

- ``gen``      — emit code from a catalog directory (python|ddl|views),
  or from a RUNNING service over the bus (``--from-bus <root> -s <name>``,
  the reference's ``gen -s`` remote-pull flow)
- ``describe`` — print the service-descriptor JSON for a catalog, or
  fetch a live service's descriptor over the bus
- ``bench``    — run the benchmark suite (delegates to bench.py contract)
"""

from __future__ import annotations

import argparse
import json
import sys

from typebus_spark.catalog.codegen import (
    to_ddl,
    to_python,
    to_rpc_client,
    to_sql_views,
)
from typebus_spark.catalog.types import TypeCatalog


_GEN_FILENAMES = {
    "python": "typebus_generated.py",
    "scala": "TypebusGenerated.scala",
    "typescript": "typebus_generated.ts",
    "ddl": "typebus_generated.ddl.json",
    "views": "typebus_generated_views.sql",
    "client": "typebus_generated_client.py",
}


def _push_generated(parser, args, source: str) -> None:
    """`gen --push` (CommandParser.scala:66-67; runCli walks the
    bus.code-gen.push config and writes the generated source into each
    project's source dir): here the push targets are the directories
    listed under ``code_gen.push`` in a JSON conf file. Missing
    directories are reported, not silently created — pushing into a
    project that does not exist is a config error."""
    import os

    try:
        with open(args.conf) as f:
            conf = json.load(f)
    except FileNotFoundError:
        parser.error(f"--push: config file not found: {args.conf}")
    except json.JSONDecodeError as e:
        parser.error(f"--push: invalid JSON in {args.conf}: {e}")
    paths = (conf.get("code_gen") or {}).get("push") or []
    if not paths:
        parser.error(
            f"--push: no code_gen.push paths configured in {args.conf}"
        )
    # validate EVERY target before writing ANY: erroring halfway would
    # leave projects half-synced — the exact state --push exists to avoid
    missing = [d for d in paths if not os.path.isdir(d)]
    if missing:
        parser.error(
            f"--push: target(s) not directories: {', '.join(missing)}"
        )
    fname = _GEN_FILENAMES[args.lang]
    for d in paths:
        dest = os.path.join(d, fname)
        with open(dest, "w") as f:
            f.write(source)
        print(f"pushed {args.lang} codegen to {dest}", file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="typebus_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate code from a schema catalog")
    g.add_argument("-t", "--types", help="catalog directory")
    g.add_argument("-o", "--out", default="-", help="output file (- = stdout)")
    g.add_argument(
        "-l",
        "--lang",
        choices=["python", "scala", "typescript", "ddl", "views", "client"],
        default="python",
    )
    g.add_argument("--data-dir", default=".", help="data dir for views")
    g.add_argument(
        "--descriptor",
        default=None,
        help="ServiceDescriptor JSON file (required for --lang client; "
        "the descriptor a service broadcasts on the bus)",
    )
    g.add_argument(
        "--from-bus",
        default=None,
        metavar="BUS_ROOT",
        help="fetch the descriptor from a RUNNING service over the bus "
        "at this FileBus root (reference `gen -s`, "
        "CommandParser.scala:60-123); requires -s/--service",
    )
    g.add_argument(
        "-s", "--service", default=None, help="service name to contact"
    )
    g.add_argument(
        "--timeout", type=float, default=60.0, help="bus reply timeout (s)"
    )
    g.add_argument(
        "-p",
        "--push",
        action="store_true",
        help="also write the generated source into every directory "
        "listed under code_gen.push in .typebus.conf (reference "
        "`gen --push`, CommandParser.scala:66-67 + runCli's "
        "bus.code-gen.push config walk)",
    )
    g.add_argument(
        "--conf",
        default=".typebus.conf",
        help="JSON config file holding code_gen.push paths",
    )

    d = sub.add_parser("describe", help="print catalog descriptor JSON")
    d.add_argument("-t", "--types", help="catalog directory")
    d.add_argument(
        "--from-bus",
        default=None,
        metavar="BUS_ROOT",
        help="fetch a live service's descriptor over the bus at this "
        "FileBus root; requires -s/--service",
    )
    d.add_argument(
        "-s", "--service", default=None, help="service name to contact"
    )
    d.add_argument(
        "--timeout", type=float, default=60.0, help="bus reply timeout (s)"
    )

    args = p.parse_args(argv)

    def _fetch_descriptor():
        if not args.service:
            p.error("--from-bus requires -s/--service")
        from typebus_spark import get_spark
        from typebus_spark.catalog.discovery import describe_from_bus

        spark = get_spark(app_name="typebus-cli")
        return describe_from_bus(
            spark, args.from_bus, args.service, timeout=args.timeout
        )

    if args.cmd == "gen":
        desc = None
        if args.from_bus:
            desc = _fetch_descriptor()
        elif args.descriptor:
            # a locally supplied descriptor serves every language that
            # consumes one (client, and scala's RpcClient section), not
            # just --lang client
            with open(args.descriptor) as f:
                desc = json.load(f)
        if desc is None and not args.types and args.lang != "client":
            p.error("gen requires -t/--types or --from-bus")
        if args.lang == "client":
            if desc is None:
                p.error("--lang client requires --descriptor or --from-bus")
            out = to_rpc_client(desc)
            if args.out == "-":
                print(out)
            else:
                with open(args.out, "w") as fo:
                    fo.write(out)
            return 0
        # an explicit catalog dir wins; the descriptor then only feeds
        # the targets that consume one (scala's RpcClient)
        if args.types:
            cat = TypeCatalog(args.types)
        else:
            from typebus_spark.catalog.discovery import (
                catalog_from_descriptor,
            )

            cat = catalog_from_descriptor(desc)
        if args.lang == "python":
            out = to_python(cat)
        elif args.lang == "scala":
            from typebus_spark.catalog.codegen import to_scala

            out = to_scala(cat, desc)
        elif args.lang == "typescript":
            from typebus_spark.catalog.codegen import to_typescript

            out = to_typescript(cat)
        elif args.lang == "ddl":
            out = json.dumps(to_ddl(cat), indent=2)
        else:
            out = to_sql_views(cat, args.data_dir)
        if args.out == "-":
            print(out)
        else:
            with open(args.out, "w") as f:
                f.write(out)
        if args.push:
            _push_generated(p, args, out)
        return 0

    if args.cmd == "describe":
        if args.from_bus:
            print(json.dumps(_fetch_descriptor(), indent=2, sort_keys=True))
            return 0
        if not args.types:
            p.error("describe requires -t/--types or --from-bus")
        cat = TypeCatalog(args.types)
        print(
            json.dumps(
                {
                    "types": cat.fqns(),
                    "schemas": {
                        fqn: json.loads(cat.schema_for(fqn).json())
                        for fqn in cat.fqns()
                    },
                },
                indent=2,
            )
        )
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())
