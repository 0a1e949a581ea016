"""K10 — incremental append/update of published tables (the reference's
new-fieldwork-season merge, query_fieldmap_update_fieldwork2022.Rmd:943-1076):
read the published table, align schema, union the new cycle, re-check grain,
keep the most recent row per key, rewrite deterministically.

This is the batch MERGE micro-pattern; the streaming wrapper in
``n2khab_mhq_data_spark.streaming`` reuses it per micro-batch via
foreachBatch."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from n2khab_mhq_data_spark.operators.relational import dedup_keep_latest


def incremental_merge(
    published: DataFrame,
    delta: DataFrame,
    keys: list[str],
    order_by: list[Column],
) -> DataFrame:
    """unionByName (schema drift tolerated: missing cols -> null) then
    latest-wins dedup on the key. ``order_by`` must totally order versions
    (e.g. [ts.desc(), event_id.desc()]).

    Scale note: the shuffle is on ``keys`` only; at 100 TB partition the
    published table by a key prefix so the union reads prune, and let AQE
    split skewed keys."""
    merged = published.unionByName(delta, allowMissingColumns=True)
    return dedup_keep_latest(merged, keys, order_by)
