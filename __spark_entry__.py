"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

All queries live in ``n2khab_mhq_data_spark.plans`` (one registered entry
per implemented operator from SURVEY.md §2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from n2khab_mhq_data_spark import plans  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's minimum end-to-end slice (SURVEY.md §7.2): scan ->
    conform -> recode -> group aggregate with the complement-product cover
    roll-up (export_from_vbidwh.Rmd:88-92) -> deterministic sort.
    """
    from pyspark.sql import functions as F

    from n2khab_mhq_data_spark.catalog import load

    sf_dir = "/root/testdata/sf0.001"
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey, "inner")
        .withColumn(
            "band",
            F.when(F.col("o_totalprice") > 20000, "high").otherwise("normal"),
        )
        .groupBy(F.col("l_returnflag").alias("returnflag"), F.col("band"))
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(
                1 - F.exp(F.sum(F.log(1 - F.col("l_discount")))), 6
            ).alias("cover_mean"),
        )
        .orderBy("returnflag", "band")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    plans.ensure_loaded()
    return dict(plans.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL equivalent per query (omitted => rows-only check)."""
    plans.ensure_loaded()
    return dict(plans.ORACLES)
