"""High-level conversion API — the reference's wizard surface
(data_to_orc_converter.sh:84-173), non-interactive.

One function per conversion type (mysql / sql dump / csv → ORC),
mirroring the generated converters' CLIs (sh:280-289, 403-415,
508-521) with the reference's bugs fixed: knobs actually wired,
deterministic scans, credentials out of argv, real parallelism via the
Spark scheduler.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Callable

from pyspark.sql import SparkSession

from .sinks.orc import write_orc
from .sources.csv import read_csv
from .sources.jdbc import JdbcConfig, export_tables
from .sources.sqldump import dump_to_orc


def convert_csv(
    spark: SparkSession,
    input_path: str,
    output_dir: str,
    delimiter: str = ",",
    header: bool = True,
    infer_schema: bool = True,
    compression: str = "snappy",
    report: Callable[[str], None] | None = None,
) -> dict[str, str]:
    """CSV file/dir → ORC. A directory input becomes one table per CSV
    file (the reference's file-per-table CSV layout, sh:464-465 — note
    it diverges from the dir-per-table layout of the other paths; we
    keep dir-per-table uniformly). ``report`` narrates per-table
    progress (the reference's sh:249 progress lines; see progress.py
    for the distributed analog) — None keeps the write silent and the
    plan hook-free."""
    from .progress import write_with_progress

    written = {}
    if os.path.isdir(input_path):
        files = sorted(_glob.glob(os.path.join(input_path, "*.csv")))
    else:
        files = [input_path]
    for i, f in enumerate(files, 1):
        name = os.path.splitext(os.path.basename(f))[0]
        df = read_csv(
            spark, f, delimiter=delimiter, header=header, infer_schema=infer_schema
        )
        out = os.path.join(output_dir, name)
        write_with_progress(
            spark, df, name, i, len(files), report,
            lambda d, out=out: write_orc(d, out, compression=compression),
        )
        written[name] = out
    return written


def convert_sql_dump(
    spark: SparkSession,
    dump_path: str,
    output_dir: str,
    compression: str = "snappy",
    tables: list[str] | None = None,
    report: Callable[[str], None] | None = None,
) -> dict[str, str]:
    """SQL dump → typed ORC tables (see sources/sqldump.py)."""
    return dump_to_orc(
        spark, dump_path, output_dir, compression, tables, report=report
    )


def convert_mysql(
    spark: SparkSession,
    cfg: JdbcConfig,
    output_dir: str,
    tables: list[str] | None = None,
    compression: str = "snappy",
    partition_columns: dict[str, str] | None = None,
    num_partitions: int = 8,
    report: Callable[[str], None] | None = None,
) -> dict[str, str]:
    """MySQL → ORC via range-partitioned JDBC (see sources/jdbc.py)."""
    return export_tables(
        spark,
        cfg,
        output_dir,
        tables,
        compression,
        partition_columns,
        num_partitions,
        report=report,
    )
