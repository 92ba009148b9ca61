"""CLI — the reference's converter CLIs, Spark-native.

The reference generates three per-source Python CLIs
(data_to_orc_converter.sh:280-289, 403-415, 508-521); this module is
their single non-interactive equivalent:

    python -m universal_data_to_orc_converter_spark csv INPUT OUT \
        [--delimiter ,] [--no-header] [--no-infer] [--compression snappy]
    python -m universal_data_to_orc_converter_spark dump DUMP.sql OUT \
        [--tables a,b] [--compression snappy]
    python -m universal_data_to_orc_converter_spark mysql OUT \
        --host H --port 3306 --database DB --user U \
        [--tables a,b] [--compression snappy]

Divergence from the reference (deliberate): the MySQL password comes
from the MYSQL_PASSWORD environment variable, never argv — the
reference passes it on the command line (sh:537), visible in ``ps``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="universal_data_to_orc_converter_spark",
        description="Convert CSV / SQL dumps / MySQL tables to ORC.",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("csv", help="CSV file or directory → ORC")
    c.add_argument("input")
    c.add_argument("output")
    c.add_argument("--delimiter", default=",")
    c.add_argument("--no-header", action="store_true")
    c.add_argument("--no-infer", action="store_true")
    c.add_argument("--compression", default="snappy")
    c.add_argument("--quiet", action="store_true",
                   help="suppress per-table progress lines (stderr)")

    d = sub.add_parser("dump", help="SQL dump file → ORC")
    d.add_argument("input")
    d.add_argument("output")
    d.add_argument("--tables", default=None, help="comma list (default all)")
    d.add_argument("--compression", default="snappy")
    d.add_argument("--quiet", action="store_true",
                   help="suppress per-table progress lines (stderr)")

    w = sub.add_parser(
        "wizard",
        help="interactive prompt flow (reference data_to_orc_converter.sh parity)",
    )
    w.add_argument(
        "--answers-file",
        default=None,
        help="replay wizard answers from a file (one per line, blank = "
        "default, # = comment) instead of prompting a TTY",
    )

    m = sub.add_parser("mysql", help="MySQL database → ORC")
    m.add_argument("output")
    m.add_argument("--host", required=True)
    m.add_argument("--port", type=int, default=3306)
    m.add_argument("--database", required=True)
    m.add_argument("--user", required=True)
    m.add_argument("--tables", default=None)
    m.add_argument("--compression", default="snappy")
    m.add_argument("--quiet", action="store_true",
                   help="suppress per-table progress lines (stderr)")

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    from .session import get_spark

    spark = get_spark("udoc-cli")
    spark.sparkContext.setLogLevel("ERROR")

    tables = args.tables.split(",") if getattr(args, "tables", None) else None

    try:
        return _dispatch(args, spark, tables)
    except Exception as e:  # surface a one-line error, not a JVM traceback
        msg = str(e).splitlines()[0] if str(e) else type(e).__name__
        print(f"error: {msg}", file=sys.stderr)
        return 1


def _dispatch(args, spark, tables) -> int:
    # progress narration (reference sh:249 parity) goes to STDERR so
    # stdout stays a single machine-parseable JSON line; --quiet
    # (or report=None) suppresses it and leaves the plan hook-free
    report = (
        None
        if getattr(args, "quiet", False)
        else (lambda m: print(m, file=sys.stderr, flush=True))
    )
    if args.cmd == "wizard":
        from .wizard import run_wizard

        if getattr(args, "answers_file", None):
            from .wizard import answers_from_file

            ask = answers_from_file(args.answers_file)
            # secrets replay through the same file; fine for tests and
            # CI fixtures, which is what an answers file is for.
            return run_wizard(spark, ask=ask, ask_secret=ask)
        return run_wizard(spark)
    if args.cmd == "csv":
        from .converter import convert_csv

        written = convert_csv(
            spark,
            args.input,
            args.output,
            delimiter=args.delimiter,
            header=not args.no_header,
            infer_schema=not args.no_infer,
            compression=args.compression,
            report=report,
        )
    elif args.cmd == "dump":
        from .converter import convert_sql_dump

        written = convert_sql_dump(
            spark, args.input, args.output, args.compression, tables,
            report=report,
        )
    else:  # mysql
        password = os.environ.get("MYSQL_PASSWORD")
        if not password:
            print(
                "error: set MYSQL_PASSWORD in the environment "
                "(passwords are never accepted via argv)",
                file=sys.stderr,
            )
            return 2
        from .converter import convert_mysql
        from .sources.jdbc import JdbcConfig

        cfg = JdbcConfig(
            args.host, args.port, args.database, args.user, password
        )
        written = convert_mysql(
            spark, cfg, args.output, tables, args.compression,
            report=report,
        )

    print(json.dumps({"tables": written}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
