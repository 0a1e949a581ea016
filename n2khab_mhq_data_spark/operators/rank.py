"""Distributed global order statistics — ranking without the
single-partition window trap.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY moves the
ENTIRE dataset to one task (Spark warns exactly this), which is the
canonical 100 TB scale-killer. This module implements the TeraSort-style
two-pass alternative: range-shuffle on the sort key so partitions hold
disjoint key ranges, count each partition (a bounded P-row driver
collect), broadcast the cumulative offsets back, and add them to the
per-partition ``row_number``. Every pass is fully parallel; the only
driver state is one integer per partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W


def _sum_result_type(dt: T.DataType) -> str:
    """DDL string of ``F.sum(col)``'s result type for an input type ``dt``
    (Spark widens sums: integral -> bigint, float -> double,
    decimal(p,s) -> decimal(min(38, p+10), s))."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "bigint"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "double"
    if isinstance(dt, T.DecimalType):
        return f"decimal({min(38, dt.precision + 10)},{dt.scale})"
    return dt.simpleString()


def global_rank(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """See :func:`_global_rank_n`; public form without the row count."""
    ranked, _ = _global_rank_n(df, order_by, rank_col, num_partitions)
    return ranked


def _global_rank_n(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Attach a global 1-based ``row_number`` under the total order
    ``order_by`` — distributed (no single-partition window).

    The caller's ``order_by`` must be a TOTAL order (include a unique
    tie-break column): range partitioning keeps equal keys in one
    partition, and a unique order makes ranks reproducible and range
    partitions balanced (no single hot key ever exceeds one partition).

    Mechanics: ``repartitionByRange`` is pinned with ``localCheckpoint``
    so the size-count pass and the ranking pass see the SAME partitioning
    (the range sampler is not otherwise guaranteed stable across
    recomputation); partition sizes are a <= P-row collect; offsets come
    back as a broadcast P-row dimension joined on
    ``spark_partition_id()``; final rank = offset + within-partition
    row_number. Two scans of the shuffled data, zero full sorts on one
    machine — the shape external sort-rank has had since TeraSort."""
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    part = df.repartitionByRange(p, *order_by).localCheckpoint()
    with_pid = part.withColumn("__pid", F.spark_partition_id())
    sizes = sorted(
        (r["__pid"], r["c"])
        for r in with_pid.groupBy("__pid")
        .agg(F.count("*").alias("c"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, c in sizes:
        offsets.append((pid, acc))
        acc += c
    off_dim = spark.createDataFrame(offsets, "__pid int, __offset long")
    w = W.partitionBy("__pid").orderBy(*order_by)
    ranked = (
        with_pid.join(F.broadcast(off_dim), "__pid")
        .withColumn(
            rank_col,
            (F.col("__offset") + F.row_number().over(w)).cast("long"),
        )
        .drop("__pid", "__offset")
    )
    # acc is now the exact total row count — already paid for by the
    # size-count pass; callers that need n (quantile_bins) reuse it
    # instead of re-executing the ranked plan for a count
    return ranked, acc


def quantile_bins(
    df: DataFrame,
    order_by: list[Column],
    n_bins: int = 10,
    bin_col: str = "bin",
) -> DataFrame:
    """Assign each row an exact quantile bin 0..n_bins-1 under the total
    order ``order_by`` — the curriculum/difficulty-binning primitive.

    bin = ((rank - 1) * n_bins) div n_rows — INTEGER arithmetic, so both
    engines agree exactly and bins differ in size by at most one row.
    (Deliberately NOT SQL ntile: ntile front-loads its remainder rows
    while this formula spreads them — the formula is reproducible from
    (rank, n) alone, which keeps oracles trivial.) Rides
    :func:`global_rank`, so no single-partition window; the total row
    count is the SUM of the rank pass's already-collected partition
    sizes — a driver-side integer, folded in as a literal, not a second
    execution of the ranked plan."""
    ranked, n = _global_rank_n(df, order_by, rank_col="__rank")
    if n == 0:
        return ranked.withColumn(bin_col, F.lit(None).cast("int")).drop(
            "__rank"
        )
    return ranked.withColumn(
        bin_col,
        F.expr(f"CAST(((__rank - 1) * {n_bins}) DIV {n} AS INT)"),
    ).drop("__rank")


def global_running_max(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out_col: str = "running_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach the running max of ``value_col`` over all STRICTLY EARLIER
    rows in the total order ``order_by`` (exclusive prefix max; NULL for
    the global first row) — distributed, never a single-partition window.

    Same TeraSort shape as ``global_rank``: range-shuffle on the order
    key (pinned with localCheckpoint), per-partition exclusive running
    max inside each range, then one bounded <= P-row collect of the
    per-partition value maxima whose exclusive prefix combines back in
    via a broadcast join on ``spark_partition_id()``. This is the
    streaming-watermark simulation primitive: the watermark a row sees
    is the max event time of everything that ARRIVED before it."""
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    part = df.repartitionByRange(p, *order_by).localCheckpoint()
    with_pid = part.withColumn("__pid", F.spark_partition_id())
    pmax = sorted(
        (r["__pid"], r["m"])
        for r in with_pid.groupBy("__pid")
        .agg(F.max(value_col).alias("m"))
        .collect()
    )
    # Spark orders NaN ABOVE every number (so F.max of a partition with
    # a NaN is NaN, and greatest() below propagates it); Python's `>`
    # says NaN > x is False, which would silently DROP a NaN partition
    # maximum from the prefix and hand later partitions a finite
    # running max where the window semantics (and the DuckDB oracle)
    # say NaN. Mirror the engine's ordering here.
    def _spark_gt(a, b) -> bool:
        if a != a:  # a is NaN -> greatest
            return True
        if b != b:  # b is NaN, a is not
            return False
        return a > b

    rows, run = [], None
    for pid, m in pmax:
        rows.append((pid, run))
        if m is not None and (run is None or _spark_gt(m, run)):
            run = m
    # unlike sums, F.max never widens the type, so the raw value column's
    # type is exactly the prefix type (see _sum_result_type for the sum case)
    field = df.schema[value_col].dataType.simpleString()
    off_dim = spark.createDataFrame(
        rows, f"__pid int, __prefix {field}"
    )
    w = (
        W.partitionBy("__pid")
        .orderBy(*order_by)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = F.max(value_col).over(w)
    return (
        with_pid.join(F.broadcast(off_dim), "__pid")
        .withColumn(out_col, F.greatest(local, F.col("__prefix")))
        .drop("__pid", "__prefix")
    )


def grouped_running_sum(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """INCLUSIVE running sum of ``value_col`` within each group under
    the total order ``order_by`` — distributed across partitions even
    when one group dwarfs a partition (the regime where the plain
    ``Window.partitionBy(group)`` cumsum becomes a single-task sort).

    Range-shuffle on (group, order) so each partition holds a
    contiguous slice of one-or-more groups, per-partition cumsum inside
    the slice, then a bounded collect of per-(partition, group) totals
    whose exclusive prefix (earlier partitions, same group) is
    broadcast back. The collect is P x (groups-per-partition) rows —
    use this operator for FEW-LARGE-GROUPS data (its contract); for
    many small groups the plain partitioned window is already parallel
    and this machinery is unnecessary.

    Exactness contract: use an INTEGER or DECIMAL ``value_col`` when the
    result must match a sequential window bit-for-bit (every registered
    caller does — the money-grid rule). For DOUBLE values the partition-
    local cumsum + Python-summed prefix associates additions differently
    than one sequential pass, so results can drift by ulps from a plain
    window / SQL oracle — invisible at small scale, a hash mismatch at
    sf1.0 (the r8 sweep's drift class 3)."""
    spark = df.sparkSession
    p = num_partitions or int(
        spark.conf.get("spark.sql.shuffle.partitions", "200")
    )
    gcols = [F.col(c) for c in group_cols]
    part = df.repartitionByRange(p, *gcols, *order_by).localCheckpoint()
    with_pid = part.withColumn("__pid", F.spark_partition_id())
    totals = (
        with_pid.groupBy("__pid", *group_cols)
        .agg(
            F.sum(value_col).alias("t"),
            F.count(value_col).alias("c"),  # non-null rows in the slice
        )
        .collect()
    )
    # exclusive prefix per group across ascending pid
    by_group: dict[tuple, list] = {}
    for r in totals:
        key = tuple(r[c] for c in group_cols)
        by_group.setdefault(key, []).append((r["__pid"], r["t"], r["c"]))
    # the prefix carries F.sum results, which Spark WIDENS past the input
    # type (int -> bigint, float -> double, decimal(p,s) -> decimal(p+10,s));
    # typing it as the raw value column would overflow createDataFrame for
    # large accumulated int prefixes. The Python accumulator must seed
    # with a matching zero (createDataFrame rejects int 0 for a double/
    # decimal field), and an all-null (partition, group) slice collects
    # t = None — skip it, it contributes nothing to the prefix.
    vtype = df.schema[value_col].dataType
    if isinstance(vtype, (T.FloatType, T.DoubleType)):
        zero = 0.0
    elif isinstance(vtype, T.DecimalType):
        from decimal import Decimal

        zero = Decimal(0)
    else:
        zero = 0
    rows = []
    for key, lst in by_group.items():
        acc, cnt = zero, 0
        for pid, t, c in sorted(lst):
            rows.append((pid, *key, acc, cnt))
            if t is not None:
                acc += t
            cnt += int(c)
    field = _sum_result_type(vtype)
    gschema = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in group_cols
    )
    off_dim = spark.createDataFrame(
        rows, f"__pid int, {gschema}, __prefix {field}, __pcnt long"
    )
    w = (
        W.partitionBy("__pid", *group_cols)
        .orderBy(*order_by)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # NULL semantics must match the plain partitioned window exactly
    # (partition-placement-independent): the cumsum at a row is NULL iff
    # the GROUP has no non-null value up to and including that row.
    # local NULL only says the current SLICE has none so far — earlier
    # partitions of the same group may have contributed (__pcnt > 0),
    # in which case the running sum is exactly the prefix.
    local = F.sum(value_col).over(w)
    # NULL-SAFE equality on the group keys: the plain partitioned
    # window treats NULL as an ordinary group, so the prefix join must
    # match it too (a name-list join would silently drop every
    # NULL-group row).  Only pay the null-safe comparison for keys whose
    # schema says NULLs are possible — plain equality keeps the tighter
    # hash-join codegen path for provably non-null keys.
    cond = with_pid["__pid"] == off_dim["__pid"]
    for c in group_cols:
        if df.schema[c].nullable:
            cond = cond & with_pid[c].eqNullSafe(off_dim[c])
        else:
            cond = cond & (with_pid[c] == off_dim[c])
    return (
        with_pid.join(F.broadcast(off_dim), cond)
        .drop(off_dim["__pid"])
        .drop(*[off_dim[c] for c in group_cols])
        .withColumn(
            out_col,
            F.when(
                local.isNull(),
                F.when(F.col("__pcnt") > 0, F.col("__prefix")),
            ).otherwise(local + F.col("__prefix")),
        )
        .drop("__pid", "__prefix", "__pcnt")
    )
