"""Columnar sources — src_orc_scan / src_parquet_scan (SURVEY.md §2.A).

Trivial by design: the reference's "all part files in a directory make
up one table" layout (data_to_orc_converter.sh:623) is Spark's native
layout, and the README's read-back examples (reference README.md:
194-209) are one-liners here too. Kept as named functions so the
operator inventory maps 1:1 to code."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
