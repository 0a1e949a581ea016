"""Z-order (Morton) spatial clustering — the data-LAYOUT side of the
spatial story.

The spatial joins (spatial/join.py) answer queries; this module makes
them cheap at 100 TB by physically co-locating nearby geometry:
interleave the bits of the grid-cell coordinates into one z-value, then
sort / bucket / write by it. Points close in 2-D land close in z-order,
so a spatial range predicate touches a handful of buckets (files)
instead of the whole table — the same trick Delta/Iceberg `OPTIMIZE
ZORDER BY` applies, built here from plain Column arithmetic so it works
on any Spark and is replayable by the DuckDB oracle.

The interleave is pure integer bit arithmetic (shift/and/or), fully
inside whole-stage codegen — zero shuffle to compute; the one shuffle
is whatever the caller does with it (sort-before-write / bucketBy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cx: Column, cy: Column, bits: int = 7) -> Column:
    """Morton interleave of two ``bits``-bit non-negative cell ids:
    x occupies the even bit positions, y the odd ones.

    CONTRACT: inputs must already lie in ``[0, 2**bits)`` — the
    interleave reads only the low ``bits`` bits, so anything larger
    silently aliases onto ``value mod 2**bits`` (a far-away cell).
    Normalize raw domains into the grid first (``zorder_layout_stats``
    fail-fasts on out-of-grid cells; ``optimize_snapshot`` min/max-
    rescales raw columns before calling this)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(cx.cast("long"), i).bitwiseAND(1), 2 * i)
            + F.shiftleft(
                F.shiftright(cy.cast("long"), i).bitwiseAND(1), 2 * i + 1
            )
        )
    return z


def zvalue_sql(cx: str, cy: str, bits: int = 7) -> str:
    """The DuckDB spelling of :func:`zvalue` (same shift/and arithmetic)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({cx} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({cy} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


def zorder_layout_stats(
    points: DataFrame,
    x_col: str = "x",
    y_col: str = "y",
    bits: int = 7,
    bucket_shift: int = 6,
) -> DataFrame:
    """Assign each point its z-value and z-bucket (top bits of the
    z-value = one target file), then report per-bucket count + bounding
    box. A tight per-bucket bbox is the measurable payoff: range
    predicates prune on it (this is exactly the min/max file statistic
    a parquet writer records after a z-order sort)."""
    # the bit-interleave reads only the low `bits` bits of each cell
    # coordinate: anything outside [0, 2^bits) — negatives included —
    # would silently ALIAS onto a far-away cell and merge unrelated
    # regions into one bucket (the bbox stat then spans the whole
    # domain, defeating the pruning this layout exists for). Fail
    # loudly; callers rescale/offset their CRS into the grid first.
    lim = 1 << bits
    # NULL coordinates must hit the guard too: floor(NULL) < 0 is NULL,
    # which when() treats as false — without the isNull legs a NULL-
    # coordinate corpus would silently pool into a zbucket=NULL group
    guard = F.when(
        F.col(x_col).isNull()
        | F.col(y_col).isNull()
        | (F.floor(F.col(x_col)) < 0)
        | (F.floor(F.col(x_col)) >= lim)
        | (F.floor(F.col(y_col)) < 0)
        | (F.floor(F.col(y_col)) >= lim),
        F.raise_error(
            F.concat(
                F.lit(
                    f"zorder_layout_stats: coordinate outside [0, {lim})"
                    " grid (rescale/offset before layout): ("
                ),
                F.coalesce(F.col(x_col).cast("string"), F.lit("NULL")),
                F.lit(", "),
                F.coalesce(F.col(y_col).cast("string"), F.lit("NULL")),
                F.lit(")"),
            )
        ).cast("long"),
    )
    cells = points.select(
        F.coalesce(guard, F.floor(F.col(x_col)).cast("long")).alias("cx"),
        F.floor(F.col(y_col)).cast("long").alias("cy"),
        F.col(x_col).alias("x"),
        F.col(y_col).alias("y"),
    )
    z = zvalue(F.col("cx"), F.col("cy"), bits)
    with_z = cells.select(
        F.shiftright(z, bucket_shift).alias("zbucket"), "x", "y"
    )
    return with_z.groupBy("zbucket").agg(
        F.count("*").cast("long").alias("n_points"),
        F.round(F.min("x") + F.lit(1e-9), 6).alias("min_x"),
        F.round(F.max("x") + F.lit(1e-9), 6).alias("max_x"),
        F.round(F.min("y") + F.lit(1e-9), 6).alias("min_y"),
        F.round(F.max("y") + F.lit(1e-9), 6).alias("max_y"),
    )
