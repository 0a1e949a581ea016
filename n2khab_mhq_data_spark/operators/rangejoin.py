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


def interval_overlap_join_binned(
    a: DataFrame,
    b: DataFrame,
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bin_width: int,
) -> DataFrame:
    """Interval x interval OVERLAP join ([a_start,a_end] meets
    [b_start,b_end], all bounds inclusive integers) as an EQUI-join —
    the interval-interval counterpart to ``range_join_bucketed``'s
    point-in-interval shape. Without this, Spark plans a pure-theta
    overlap predicate as BroadcastNestedLoop/cartesian, which is
    |a| x |b| at any scale.

    Both sides explode to the fixed-width bins they cover; the join is
    hash-partitioned on the bin. A pair overlapping across several
    shared bins is emitted EXACTLY ONCE — by the bin that contains the
    overlap's start (``greatest(a_start, b_start)``), which both
    intervals necessarily cover — so no ``distinct`` re-shuffle is
    needed afterwards. Pick ``bin_width`` near the typical interval
    length: an interval spanning w bins costs w rows, and per-bin
    fan-out is the number of intervals alive in that bin, not the
    corpus size. Bin ids are integer ``div`` — no float bucketing.

    Column names of ``a`` and ``b`` must be disjoint (callers alias)."""
    ia = a.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{a_start} div {bin_width}"),
                F.expr(f"{a_end} div {bin_width}"),
            )
        ),
    )
    ib = b.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.expr(f"{b_start} div {bin_width}"),
                F.expr(f"{b_end} div {bin_width}"),
            )
        ),
    )
    return (
        ia.join(ib, ["_bin"])
        .filter(
            (F.col(a_start) <= F.col(b_end))
            & (F.col(b_start) <= F.col(a_end))
            & (
                F.col("_bin")
                == F.expr(f"greatest({a_start}, {b_start}) div {bin_width}")
            )
        )
        .drop("_bin")
    )
