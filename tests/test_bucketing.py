"""Bucketed-table co-location (SURVEY.md §2.A bucketing / PERF.md):
writing both join sides bucketed on the join key must remove BOTH
shuffle exchanges from the sort-merge join — the single biggest
shuffle eliminated at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from universal_data_to_orc_converter_spark.sinks.orc import write_orc_bucketed

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    write_orc_bucketed(li, "b_lineitem", "l_orderkey", n_buckets=8)
    write_orc_bucketed(o, "b_orders", "o_orderkey", n_buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    o = spark.table(o_t)
    # disable broadcast so the join must be sort-merge — the case
    # bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        plan = j._jdf.queryExecution().simpleString()
        assert "SortMergeJoin" in plan
        # the only remaining exchange is the 3-row aggregate (hashes on
        # o_orderstatus); no exchange may partition on the join keys
        for frag in plan.splitlines():
            if "Exchange hashpartitioning" in frag:
                assert "l_orderkey" not in frag and "o_orderkey" not in frag, (
                    f"join key shuffled despite bucketing: {frag}"
                )
        # and the result is correct
        got = {r["o_orderstatus"]: r["n"] for r in j.collect()}
        li_raw = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        o_raw = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        expect = {
            r["o_orderstatus"]: r["n"]
            for r in li_raw.join(o_raw, li_raw.l_orderkey == o_raw.o_orderkey)
            .groupBy("o_orderstatus")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert got == expect
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
