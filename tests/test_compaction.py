"""File-count assertion for the compaction op (the oracle checks
content equality; this checks the thing compaction is FOR)."""

from __future__ import annotations

import glob
import os
import tempfile

from universal_data_to_orc_converter_spark.catalog import load


def test_compaction_reduces_file_count(spark):
    work = tempfile.mkdtemp(prefix="compact_t_")
    shattered = os.path.join(work, "shattered")
    compacted = os.path.join(work, "compacted")
    e = load(spark, "/root/testdata/sf0.001", "events")
    e.repartition(64).write.parquet(shattered)
    spark.read.parquet(shattered).repartition(4).write.parquet(compacted)

    n_small = len(glob.glob(os.path.join(shattered, "*.parquet")))
    n_big = len(glob.glob(os.path.join(compacted, "*.parquet")))
    assert n_small == 64
    assert n_big <= 4
    assert (
        spark.read.parquet(compacted).count()
        == spark.read.parquet(shattered).count()
    )
