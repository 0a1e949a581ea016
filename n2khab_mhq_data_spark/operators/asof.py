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
from pyspark.sql.types import StructType
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
    pass through; ``right_cols`` arrive null when no right row precedes.

    The right payload is packed into ONE struct and attached with a single
    ``last(struct, ignorenulls=True)`` — whole-row semantics like DuckDB's
    ASOF JOIN. (Attaching each column independently would stitch values
    from DIFFERENT right rows whenever a newer right row legitimately
    carries NULL in one payload column.) A struct whose fields are all
    NULL is still a non-null struct, so such a row correctly shadows older
    ones rather than being skipped."""
    overlap = set(right_cols) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right_cols collide with left columns: {sorted(overlap)}; "
            "rename before joining"
        )
    # the internal tag/payload columns would silently shadow (or
    # ambiguously collide with) same-named input columns
    reserved = {"_side", "_r"} & (set(left.columns) | set(right.columns))
    if reserved:
        raise ValueError(
            f"asof_join reserves column names {sorted(reserved)};"
            " rename them before joining"
        )
    lt = left.select(
        "*",
        F.lit(1).alias("_side"),
        F.lit(None)
        .cast(StructType([right.schema[c] for c in right_cols]))
        .alias("_r"),
    )
    # DuckDB ASOF semantics: a NULL right timestamp NEVER matches
    # (l.t >= NULL is never true). Unfiltered, NULLs sort FIRST in the
    # ascending window and a NULL-time row would masquerade as the
    # "earliest" payload for every left row before the first real one.
    # A NULL right KEY likewise never matches under join equality
    # (l.key = NULL is never true) — but Window.partitionBy groups NULL
    # keys into ONE partition, so unfiltered, a NULL-key right row would
    # attach to NULL-key LEFT rows. Filter both null dimensions out of
    # the right side; NULL-key left rows then sit alone in the NULL
    # partition and correctly surface a NULL payload.
    rt = right.filter(
        F.col(time_col).isNotNull() & F.col(key).isNotNull()
    ).select(
        key, time_col, F.lit(0).alias("_side"), F.struct(*right_cols).alias("_r")
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    # right rows sort BEFORE left rows at the same timestamp => inclusive
    w = (
        W.partitionBy(key)
        .orderBy(time_col, "_side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    attached = u.withColumn("_r", F.last("_r", ignorenulls=True).over(w))
    return attached.filter(F.col("_side") == 1).select(
        *left.columns, *[F.col("_r")[c].alias(c) for c in right_cols]
    )
