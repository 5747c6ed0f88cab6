"""AQE skew-join splitting: the runtime half of the skew story.

SCALE.md's static mitigations (salting, hot-shingle caps) are tested
elsewhere; this pins the dynamic one — with adaptive skew-join enabled
(session default), a join whose shuffle has one hot key gets that
partition SPLIT at runtime. Thresholds are lowered to make a ~10 MB
local hot key cross the line; on a cluster the defaults (256 MB)
express the same mechanism.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_TUNED = {
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1MB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force a shuffled join
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "64KB",
    # the downstream agg re-shuffles anyway; allow the split even though
    # it breaks the join's output partitioning
    "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
}


@pytest.fixture()
def skew_conf(spark):
    prev = {k: spark.conf.get(k) for k in _TUNED}
    for k, v in _TUNED.items():
        spark.conf.set(k, v)
    yield
    for k, v in prev.items():
        spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(spark, skew_conf):
    # fact: 400k rows, 95% on key 0 (pathological hot key), wide payload
    fact = spark.range(400_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("payload"),
    )
    dim = spark.range(400_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # inspect the execution of THIS DataFrame: a narrow projection so
    # collect() stays small and no downstream shuffle hides the join
    joined = fact.join(dim, "k").select(
        F.length("payload").alias("lp"), "v"
    )
    rows = joined.collect()
    assert len(rows) == 400_000  # every fact row matches exactly one dim row
    # the executed (post-AQE) plan must show the skewed side was split
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, final_plan[:4000]
    assert "AQEShuffleRead skewed" in final_plan
