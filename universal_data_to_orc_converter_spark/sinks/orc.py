"""ORC sink — SURVEY.md §2.A (snk_orc_write / snk_partitioned_write).

Reference parity, Spark-native:

* **layout**: one directory per table, multiple part files; "All part
  files in a directory make up one table!" (data_to_orc_converter.sh:623,
  reference README.md:176-189). Spark's native ORC layout is exactly
  this convention.
* **codec**: snappy / zlib / none (wizard sh:168-169, writer sh:245)
  plus lzo / lz4 / zstd. The reference README lists LZO as a choice
  (README.md:241-246) its own pyarrow writer cannot produce
  (BASELINE.md); Spark's ORC writer ships a pure-JVM LZO codec, so
  here it actually works — round-trip-tested with the rest of the
  matrix.
* **chunking**: the reference writes one file per 50k-row chunk
  (chunk_size, sh:192). ``max_records_per_file`` reproduces the
  capability without the reference's driver-side pagination loop —
  executors split files as they write.

Divergences from reference bugs (deliberate, SURVEY.md §7): the
CHUNK_SIZE / PARALLEL_WORKERS knobs are actually honored (the
reference documents env vars it never reads, README.md:161-163 vs
sh:192); parallelism is the Spark scheduler, not a 4-thread pool
sharing one connection (sh:259-264).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

#: codecs the reference wizard offers (sh:168-169) plus Spark extras —
#: including the LZO the reference claims but cannot write
CODECS = ("snappy", "zlib", "none", "lzo", "lz4", "zstd")

#: the reference's chunk_size default (sh:192); README documents tuning
#: to 100k via CHUNK_SIZE (README.md:162-163)
DEFAULT_MAX_RECORDS_PER_FILE = int(os.environ.get("CHUNK_SIZE", "50000"))


def write_orc(
    df: DataFrame,
    path: str,
    compression: str = "snappy",
    max_records_per_file: int | None = DEFAULT_MAX_RECORDS_PER_FILE,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    bloom_filter_cols: list[str] | None = None,
    bloom_filter_fpp: float = 0.05,
) -> None:
    """Write a DataFrame as a directory of ORC part files.

    ``partition_by`` adds hive-style directory partitioning — the
    100 TB upgrade over the reference's flat layout: a date/tenant
    partition column turns full scans into partition-pruned scans.

    ``bloom_filter_cols`` embeds per-stripe bloom filters for the
    named columns (``orc.bloom.filter.columns``). Min/max stripe
    stats only prune RANGE predicates on clustered columns; blooms
    prune POINT predicates on high-cardinality columns the layout is
    NOT sorted by — the complement of the z-order strategy
    (operators/zorder.py). Costs ~5% file size at fpp 0.05
    (measured, tests/test_conversion.py)."""
    if compression not in CODECS:
        raise ValueError(f"unsupported codec {compression!r}; one of {CODECS}")
    writer = df.write.mode(mode).option("compression", compression)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if bloom_filter_cols:
        writer = writer.option(
            "orc.bloom.filter.columns", ",".join(bloom_filter_cols)
        ).option("orc.bloom.filter.fpp", str(bloom_filter_fpp))
    writer.orc(path)


def write_orc_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    compression: str = "snappy",
    sort_col: str | None = None,
) -> None:
    """Bucketed ORC table (saveAsTable — bucketing needs catalog
    metadata). Two tables bucketed on their join key co-locate: the
    sort-merge join of op_join_shuffle loses BOTH exchanges, which at
    100 TB is the single biggest shuffle eliminated in the engine."""
    # A managed-table location can survive from a previous session
    # whose (in-memory) catalog is gone; saveAsTable then refuses with
    # LOCATION_ALREADY_EXISTS. Drop the registration AND any orphan
    # directory so the write is idempotent across sessions.
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    writer = (
        df.write.mode("overwrite")
        .option("compression", compression)
        .format("orc")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read a table back (src_orc_scan — reference README.md:194-209
    demonstrates exactly spark.read.orc on the converter's output)."""
    return spark.read.orc(path)
