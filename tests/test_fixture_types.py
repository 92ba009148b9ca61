"""Fixture physical-type adaptivity audit.

Round 3's only wrong answer came from a hard-coded assumption about the
events fixture's parquet timestamp unit: the streaming reader declared
``ts long`` + ``DIV 1000`` (TIMESTAMP(NANOS) era) while the fixtures
had moved to timestamp[us], silently collapsing every event to ~1970.
The batch loader had a dtype guard; the stream reader didn't.

These tests make that class of breakage impossible to miss locally:

* every parquet-declared timestamp column must surface as a Spark
  timestamp (never a raw bigint) through the batch catalog, whatever
  physical unit the fixture generation shipped;
* the batch and stream paths must agree exactly on dtypes; and
* the batch and stream paths must agree on the VALUES (min/max ts and
  distinct hour-bucket count) — a unit mix-up shifts values by 1000x
  even when the dtype happens to look right.

Runs against every fixture scale dir that exists, so a fixture
regeneration with yet another physical type fails here before the
external driver sees it.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark import catalog
from universal_data_to_orc_converter_spark.streaming.runner import (
    read_events_stream,
    run_available_now,
)

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_DIRS = sorted(
    os.path.join(TESTDATA, d)
    for d in os.listdir(TESTDATA)
    if d.startswith("sf") and os.path.isdir(os.path.join(TESTDATA, d))
)
SMALLEST = SF_DIRS[0] if SF_DIRS else None


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("table", catalog.TABLES)
def test_parquet_timestamps_surface_as_spark_timestamps(spark, sf_dir, table):
    """Any column parquet declares as a timestamp must arrive typed —
    a bigint leak means some path forgot its unit conversion."""
    arrow_schema = pq.read_schema(catalog.table_path(sf_dir, table))
    ts_cols = [
        f.name
        for f in arrow_schema
        if str(f.type).startswith("timestamp")
    ]
    if not ts_cols:
        pytest.skip("no timestamp columns in this table")
    dtypes = dict(catalog.load(spark, sf_dir, table).dtypes)
    for col in ts_cols:
        assert dtypes[col].startswith("timestamp"), (
            f"{table}.{col} is {dtypes[col]}; the loader must convert "
            "whatever physical unit the fixture ships to a timestamp"
        )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_batch_and_stream_events_dtypes_identical(spark, sf_dir):
    batch = catalog.load(spark, sf_dir, "events")
    stream = read_events_stream(spark, sf_dir)
    assert dict(batch.dtypes) == dict(stream.dtypes)
    assert dict(batch.dtypes)["ts"] == "timestamp"


def test_batch_and_stream_events_values_identical(spark):
    """min/max ts and hour-bucket count through both paths — the check
    that turns a silent unit collapse (everything lands in ~1970, 3385
    hour windows fold into ~2) into a loud local failure."""
    def per_hour(df):
        # distinct aggs aren't allowed on streams; group per hour in
        # the (incremental) plan, finish globally on the batch sink
        return df.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour")
        ).agg(F.min("ts").alias("ts_min"), F.max("ts").alias("ts_max"))

    final = [
        F.min("ts_min").alias("ts_min"),
        F.max("ts_max").alias("ts_max"),
        F.count("*").alias("n_hours"),
    ]
    b = (
        per_hour(catalog.load(spark, SMALLEST, "events"))
        .agg(*final)
        .collect()[0]
    )
    s = (
        run_available_now(
            per_hour(read_events_stream(spark, SMALLEST)),
            output_mode="complete",
        )
        .agg(*final)
        .collect()[0]
    )
    assert b.ts_min == s.ts_min
    assert b.ts_max == s.ts_max
    assert b.n_hours == s.n_hours
    # sanity: a unit mix-up compresses years of events into ~2 buckets
    assert b.n_hours > 10
