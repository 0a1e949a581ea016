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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_seq(start_col: str, end_col: str, width: int) -> Column:
    """The bucket-range explode for one interval, failing FAST on a
    REVERSED interval (end < start): Spark's sequence() would silently
    step -1 and emit a DESCENDING bucket range — a pair can then be
    emitted for a mathematically empty interval, and one corrupt row
    with a huge start and end=0 asks sequence() for a ~1e12-element
    array that kills the whole job opaquely."""
    lo = F.expr(f"{start_col} div {width}")
    guarded = F.when(
        F.col(end_col) < F.col(start_col),
        F.raise_error(
            F.concat(
                F.lit(f"reversed interval: {end_col}="),
                F.col(end_col).cast("string"),
                F.lit(f" < {start_col}="),
                F.col(start_col).cast("string"),
            )
        ).cast("bigint"),
    ).otherwise(lo)
    return F.explode(
        F.sequence(guarded, F.expr(f"{end_col} div {width}"))
    )


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
    taken = {"_b"} & (set(points.columns) | set(intervals.columns))
    if taken:
        raise ValueError(
            "range_join_bucketed reserves the '_b' column name;"
            " rename it on the input before joining"
        )
    iv = intervals.withColumn(
        "_b", _bucket_seq(start_col, end_col, bucket_width)
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
    taken = {"_bin"} & (set(a.columns) | set(b.columns))
    if taken:
        raise ValueError(
            "interval_overlap_join_binned reserves the '_bin' column"
            " name; rename it on the input before joining"
        )
    ia = a.withColumn("_bin", _bucket_seq(a_start, a_end, bin_width))
    ib = b.withColumn("_bin", _bucket_seq(b_start, b_end, bin_width))
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
