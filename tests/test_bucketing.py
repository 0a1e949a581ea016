"""Bucketed co-located join: two tables bucketed on the join key must join
with ZERO shuffle exchanges — the storage-level answer to repeated fact-fact
joins at 100 TB (SURVEY.md §4: hash-partition facts by plot_id)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, tmp_path, no_broadcast):
    facts = spark.range(0, 1000).selectExpr(
        "id AS plot_id", "id % 7 AS v"
    )
    dims = spark.range(0, 500).selectExpr(
        "id AS plot_id", "id % 3 AS w"
    )
    for name, df in [("t_facts", facts), ("t_dims", dims)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.bucketBy(8, "plot_id")
            .sortBy("plot_id")
            .option("path", str(tmp_path / name))
            .saveAsTable(name)
        )

    joined = spark.table("t_facts").join(spark.table("t_dims"), "plot_id")
    assert joined.count() == 500

    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    # bucketing co-locates both sides: no Exchange anywhere in the join plan
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan

    for name in ("t_facts", "t_dims"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
