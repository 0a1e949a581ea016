"""Range (interval) join — with explicit bucketing so it stays an
EQUI-join (SURVEY.md §2 gap list; Spark's optimizer turns a raw
``t BETWEEN start AND end`` join condition into a broadcast-nested-loop
or cartesian filter, which explodes to |points| x |intervals-per-key|
candidates).

Shape: intervals explode to the coarse time buckets they cover; points
map to their single bucket; the join is hash-partitioned on
(key, bucket) and the exact range predicate filters within buckets. An
interval spanning b buckets costs b rows — pick ``bucket_width`` near
the typical interval length so b is small (2-3). All bucket arithmetic
is integer division on epoch integers: epoch micros exceed double's
53-bit mantissa, so float division would corrupt bucket ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    t_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join every point row to the interval rows of the same ``key``
    with ``start_col <= t_col <= end_col`` (inclusive). ``t_col``,
    ``start_col``, ``end_col`` are INTEGER time columns (e.g. epoch
    micros) in the same unit as ``bucket_width``."""
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_width}"),
                F.expr(f"{end_col} div {bucket_width}"),
            )
        ),
    )
    pt = points.withColumn("_b", F.expr(f"{t_col} div {bucket_width}"))
    return (
        pt.join(iv, [key, "_b"])
        .filter(
            (F.col(t_col) >= F.col(start_col))
            & (F.col(t_col) <= F.col(end_col))
        )
        .drop("_b")
    )
