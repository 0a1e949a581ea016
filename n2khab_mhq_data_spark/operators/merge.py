"""K10 — incremental append/update of published tables (the reference's
new-fieldwork-season merge, query_fieldmap_update_fieldwork2022.Rmd:943-1076):
read the published table, align schema, union the new cycle, re-check grain,
keep the most recent row per key, rewrite deterministically.

This is the batch MERGE micro-pattern; the streaming wrapper in
``n2khab_mhq_data_spark.streaming`` reuses it per micro-batch via
foreachBatch."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from n2khab_mhq_data_spark.operators.relational import dedup_keep_latest


def incremental_merge(
    published: DataFrame,
    delta: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """unionByName (schema drift tolerated: missing cols -> null) then
    latest-wins dedup on the key, with DELTA-BEATS-PUBLISHED as the
    final tiebreak: when a delta row carries exactly the same
    ``order_by`` values as the published row it corrects (a
    same-timestamp correction, common in CDC replays), the delta row
    deterministically wins — otherwise which row survives would be
    partition-order luck, and two replays of the same batch could
    publish different states. When ``order_by`` is already a total
    order (e.g. [ts.desc(), event_id.desc()] with unique ids) the tag
    never decides anything.

    Scale note: the shuffle is on ``keys`` only; at 100 TB partition the
    published table by a key prefix so the union reads prune, and let AQE
    split skewed keys."""
    if "__src" in published.columns or "__src" in delta.columns:
        raise ValueError(
            "incremental_merge reserves the '__src' column name;"
            " rename it before merging"
        )
    merged = published.withColumn("__src", F.lit(0)).unionByName(
        delta.withColumn("__src", F.lit(1)), allowMissingColumns=True
    )
    return dedup_keep_latest(
        merged, keys, list(order_by) + [F.col("__src").desc()]
    ).drop("__src")
