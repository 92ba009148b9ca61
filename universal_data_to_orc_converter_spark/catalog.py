"""Fixture-table catalog.

The reference's unit of data is "a directory of part files = one table"
(``data_to_orc_converter.sh:623``, README.md:189). Spark's native
``read.parquet`` / ``read.orc`` share that exact layout, so the catalog
is just a thin loader keyed by table name.

Tables (driver fixtures, one parquet per table — see TESTDATA.md):
    region nation customer supplier part orders lineitem
    events documents embeddings
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Small dimension tables that should always be broadcast when joined
#: against a fact table. At 100 TB the facts (lineitem/orders/events)
#: scale linearly while these stay tiny-to-moderate, so broadcasting
#: them removes a full shuffle of the fact side.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Lazy: nothing is read until an action.

    ``events.ts`` has shipped in two physical parquet flavors across
    fixture generations: TIMESTAMP(NANOS) (which Spark surfaces as
    bigint under ``nanosAsLong``) and plain timestamp[us] (read as
    TimestampType directly). We therefore probe the observed dtype and
    convert ns→µs only when the column arrives as bigint — never
    assume the unit. Truncating integer division matches DuckDB's
    ns→µs behavior, so oracle comparisons line up either way."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # Normalize to TIMESTAMP (ltz) so batch and stream paths
            # agree on dtype (watermarks require ltz); session tz is
            # pinned to UTC, so the cast is value-preserving.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for ``spark.sql``."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
