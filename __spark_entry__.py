"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``universal_data_to_orc_converter_spark``: the
engine's query registry provides one entry per implemented operator
from SURVEY.md §2, each paired (where SQL-expressible) with a DuckDB
oracle string. See
``universal_data_to_orc_converter_spark/registry.py`` for the
exactness conventions that make Spark and DuckDB hash-identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from universal_data_to_orc_converter_spark.registry import load_all_queries
from universal_data_to_orc_converter_spark.session import tune_session

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    specs = load_all_queries()
    return specs["flagship_revenue_by_nation"].fn(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    specs = load_all_queries()

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(spec.fn) for name, spec in specs.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; approximate/hash-seeded ops are
    omitted (driver records rows-only checks for those)."""
    specs = load_all_queries()
    return {
        name: spec.oracle for name, spec in specs.items() if spec.oracle is not None
    }
