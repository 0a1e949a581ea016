"""AQE skew-join evidence: a join with one pathological hot key must be
split by AQE's OptimizeSkewedJoin at runtime — the engine-level answer
(alongside the explicit salting operators in operators/skew.py) to hot
keys at 100 TB. The test drives thresholds down so the skew is visible
at test scale and asserts the executed plan marks the join skew=true."""

from __future__ import annotations

import pytest


@pytest.fixture()
def aqe_skew_conf(spark):
    keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # the session factory caps the ADAPTIVE threshold at 16m (r10
        # driver-OOM guard); without -1 here AQE converts the tiny right
        # side to broadcast at runtime and no skew split ever happens
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
        "spark.sql.shuffle.partitions": "8",
    }
    old = {k: spark.conf.get(k, None) for k in keys}
    for k, v in keys.items():
        spark.conf.set(k, v)
    yield
    for k, v in old.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join(spark, aqe_skew_conf):
    # one hot key (0) carries 100k fat rows; 99 cold keys carry 100 each
    hot = spark.range(0, 100_000).selectExpr(
        "0 AS k", "repeat('x', 64) AS pad"
    )
    cold = spark.range(0, 9_900).selectExpr(
        "(id % 99) + 1 AS k", "repeat('x', 64) AS pad"
    )
    left = hot.unionAll(cold)
    right = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS w")
    joined = left.join(right, "k")
    # collect() (not count()) so THIS DataFrame's QueryExecution runs and
    # finalizes — count() builds a separate execution for the agg plan
    assert len(joined.collect()) == 109_900

    # the EXECUTED adaptive plan must mark the sort-merge join skew=true
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan[:2000]
    assert "skewed" in plan  # the AQEShuffleRead split the hot partition
