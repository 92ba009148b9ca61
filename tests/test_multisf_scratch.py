"""Multi-scale-factor session safety for scratch-reusing io ops.

The r7 snapshot fix gave op_partition_pruned_join a PER-FIXTURE
scratch key: its _SUCCESS reuse guard caches the hive-partitioned
fact/dim write, and before the fix a process that ran the op at two
scale factors silently served the FIRST fixture's files to the second
(wrong results in multi-sf sessions — exactly the local
sf0.1-then-sf1 perf-lap pattern). Pin the failure mode: run the op at
two sf_dirs in ONE session and hash-check both against the oracle.
"""

from __future__ import annotations

import duckdb

from universal_data_to_orc_converter_spark.catalog import TABLES, table_path
from universal_data_to_orc_converter_spark.registry import load_all_queries

from .conftest import assert_frames_match

SF_A = "/root/testdata/sf0.001"
SF_B = "/root/testdata/sf0.01"


def test_partition_pruned_join_correct_at_two_sf_dirs_in_one_session(spark):
    spec = load_all_queries()["op_partition_pruned_join"]
    for sf_dir in (SF_A, SF_B):
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.sql(
                    f"CREATE VIEW {t} AS "
                    f"SELECT * FROM '{table_path(sf_dir, t)}'"
                )
            assert_frames_match(
                spec.fn(spark, sf_dir),
                con.sql(spec.oracle),
                f"op_partition_pruned_join@{sf_dir}",
            )
        finally:
            con.close()
