"""CLI (SURVEY.md §2.1 G5): ``python -m typebus_spark <cmd>``.

Reference: the scopt REPL with ``gen -t <dir> -o <out>`` / ``gen --push``
(typebus/.../cli/CommandParser.scala:33-123). Subcommands here:

- ``gen``      — emit code from a catalog directory (python|ddl|views)
- ``describe`` — print the service-descriptor JSON for a catalog
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


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="typebus_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("gen", help="generate code from a schema catalog")
    g.add_argument("-t", "--types", required=True, help="catalog directory")
    g.add_argument("-o", "--out", default="-", help="output file (- = stdout)")
    g.add_argument(
        "-l",
        "--lang",
        choices=["python", "ddl", "views", "client"],
        default="python",
    )
    g.add_argument("--data-dir", default=".", help="data dir for views")
    g.add_argument(
        "--descriptor",
        default=None,
        help="ServiceDescriptor JSON file (required for --lang client; "
        "the descriptor a service broadcasts on the bus)",
    )

    d = sub.add_parser("describe", help="print catalog descriptor JSON")
    d.add_argument("-t", "--types", required=True, help="catalog directory")

    args = p.parse_args(argv)

    if args.cmd == "gen":
        if args.lang == "client":
            if not args.descriptor:
                p.error("--lang client requires --descriptor")
            with open(args.descriptor) as f:
                out = to_rpc_client(json.load(f))
            if args.out == "-":
                print(out)
            else:
                with open(args.out, "w") as fo:
                    fo.write(out)
            return 0
        cat = TypeCatalog(args.types)
        if args.lang == "python":
            out = to_python(cat)
        elif args.lang == "ddl":
            out = json.dumps(to_ddl(cat), indent=2)
        else:
            out = to_sql_views(cat, args.data_dir)
        if args.out == "-":
            print(out)
        else:
            with open(args.out, "w") as f:
                f.write(out)
        return 0

    if args.cmd == "describe":
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
