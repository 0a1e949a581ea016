"""As-of join — the time-series operator Spark has no built-in for
(SURVEY.md §2 gap list; reference analog: "most recent per key then
attach", J12, generalized to row-level time alignment).

Implemented with the UNION + last-ignoring-nulls trick, the canonical
distributed shape: tag both inputs, union them, and take per key the
running ``last`` of the right payload over event-time order. ONE shuffle
(hash by key), no range-condition join — a range join would explode to
|left| x |right-per-key| candidate rows before filtering, while this
shape is linear in |left| + |right| and AQE-friendly. At 100 TB the
window per key is the only sequential axis, which matches the
semantics (per-entity timelines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    time_col: str,
    right_cols: list[str],
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``time_col`` <= the left row's ``time_col`` for the same ``key``
    (backward as-of, inclusive — DuckDB's ``ASOF JOIN ... ON l.t >= r.t``).

    ``right`` must be unique per (key, time): pre-reduce it (e.g. keep
    max id per timestamp) or ties are resolved arbitrarily. Left columns
    pass through; ``right_cols`` arrive null when no right row precedes."""
    lt = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        lt = lt.withColumn(c, F.lit(None).cast(right.schema[c].dataType))
    rt = right.select(
        key, time_col, F.lit(0).alias("_side"), *right_cols
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort BEFORE left rows at the same timestamp => inclusive
    w = (
        W.partitionBy(key)
        .orderBy(time_col, "_side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    attached = u
    for c in right_cols:
        attached = attached.withColumn(
            c, F.last(c, ignorenulls=True).over(w)
        )
    return attached.filter(F.col("_side") == 1).drop("_side")
