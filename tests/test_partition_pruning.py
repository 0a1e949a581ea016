"""Partition-layout evidence tests: hive-partitioned writes must prune —
statically on a partition predicate, dynamically (DPP) through a join —
because at 100 TB the difference is scanning one partition vs the fleet
scanning everything."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(True)
    return buf.getvalue()


def _write_partitioned(spark, path):
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 10).alias("part_key"),
        (F.col("id") * 3).alias("val"),
    )
    df.write.partitionBy("part_key").parquet(str(path))


def test_static_partition_pruning(spark, tmp_path):
    path = tmp_path / "pt"
    _write_partitioned(spark, path)
    scan = spark.read.parquet(str(path)).filter(F.col("part_key") == 3)
    plan = _plan(scan)
    # the partition predicate must land in PartitionFilters, NOT as a
    # post-scan Filter over all partitions
    assert "PartitionFilters" in plan
    # the literal must be INSIDE the partition filter list (directory
    # pruning), not only in a post-scan data Filter
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "3" in m.group(1), plan[-1500:]
    assert scan.count() == 100


def test_dynamic_partition_pruning_through_join(spark, tmp_path):
    path = tmp_path / "fact"
    _write_partitioned(spark, path)
    fact = spark.read.parquet(str(path))
    dim = (
        spark.range(0, 10)
        .select(F.col("id").alias("part_key"), F.lit("x").alias("attr"))
        .filter(F.col("part_key") < 2)
    )
    joined = fact.join(dim, "part_key")
    plan = _plan(joined)
    # Catalyst must inject a dynamicpruning subquery on the fact scan so
    # only dim-surviving partitions are read at runtime
    assert "dynamicpruning" in plan.lower(), plan[-2000:]
    assert joined.count() == 200


def test_s13_store_prunes_month_partitions(spark):
    """The registered s13 query's scan must carry the month bounds as
    PartitionFilters (directory pruning), not as a post-scan data
    Filter — same evidence contract as the static test above.
    (inputFiles() is NOT usable here: it lists the base relation's
    files before pruning.)"""
    from n2khab_mhq_data_spark.plans.pipeline import (
        _hive_partitioned_store,
    )

    sf_dir = "/root/testdata/sf0.001"
    path = _hive_partitioned_store(spark, sf_dir)
    from pyspark.sql import functions as F

    df = spark.read.parquet(path).filter(
        (F.col("o_month") >= "1996-03") & (F.col("o_month") < "1996-06")
    )
    plan = _plan(df)
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters")[1][:200]
    assert "o_month" in pf and "1996-03" in pf
    # and pruning is real: the filtered count equals the three months
    full = spark.read.parquet(path)
    expect = full.filter(
        (F.col("o_month") >= "1996-03") & (F.col("o_month") < "1996-06")
    ).count()
    assert df.count() == expect and expect > 0
