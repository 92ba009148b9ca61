"""Many operator notes justify join formulations with 'AQE splits
skewed partitions'. Pin that the mechanism actually engages in this
engine's session: a Zipf-keyed sort-merge join under lowered AQE
thresholds must show AQEShuffleRead with skewed-partition splits in
the final adaptive plan."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_skew_join_splits_hot_partition(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes":
            "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {}
    for k, v in confs.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    try:
        # left: 400k rows, ~70% on key 0 (the hot user), tail uniform
        left = spark.range(400_000).select(
            F.when(F.col("id") % 10 < 7, F.lit(0))
            .otherwise(F.col("id") % 997)
            .alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(997).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("attr")
        )
        j = left.join(right, "k")
        # execute THIS DataFrame's queryExecution (count() would plan
        # a separate query and leave j's adaptive plan un-finalized)
        n = len(j.collect())
        assert n == 400_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "AQEShuffleRead" in plan, plan[:800]
        assert "skewed=" in plan or "skew=true" in plan, (
            "AQE did not mark any partition skewed — the engine's "
            "'AQE-skew-splittable' notes rest on this mechanism:\n"
            + plan[:1500]
        )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
