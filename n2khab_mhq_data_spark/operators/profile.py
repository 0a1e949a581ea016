"""One-pass table profiler — per-column completeness / cardinality /
range summary (the Deequ/ydata "profile the table" primitive).

The reference audits its inputs column by column before publishing
(missingness checks in the Rmd pipelines, COVERAGE §5 audits); this is
the generic form: ONE aggregation pass over the table computes every
column's null count, exact distinct count, and normalized min/max, then
a ``posexplode`` reshapes the single result row to one row per column.

Scale notes: the whole profile is one ``df.agg(...)`` — partial
aggregation map-side, a single 1-row exchange. The only scale caveat is
EXACT multi-column count(DISTINCT), which Spark plans with an Expand
(one duplicated stream per distinct column): cost is rows x columns. At
100 TB profile with ``exact_distinct=False`` (approx_count_distinct,
no Expand, one pass) — the exact default exists because the registered
query is differentially checked against an exact-SQL oracle.

Min/max are normalized to strings so heterogeneous columns fit one
schema: integers verbatim, floats rounded to 2 via DECIMAL(38,2) (both
engines print decimals identically; raw double->string formatting is
NOT portable), timestamps as their DATE prefix, strings as-is. A float
whose magnitude exceeds even DECIMAL(38,2) (or is NaN) falls back to
the engine's raw string — not portable, but never a silent NULL that
would masquerade as an all-null column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: column kind -> normalizer applied to the typed min/max aggregate
_NORM = {
    "int": lambda c: c.cast("string"),
    "str": lambda c: c,
    # try_cast: decimal overflow / NaN yields NULL (never an ANSI
    # throw), and the coalesce falls back to the raw string — so a
    # huge-but-present extremum is never reported as NULL
    "float": lambda c: F.coalesce(
        F.round(c, 2).try_cast("decimal(38,2)").cast("string"),
        c.cast("string"),
    ),
    "ts": lambda c: c.cast("date").cast("string"),
}


def profile_table(
    df: DataFrame,
    spec: list[tuple[str, str]],
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile the columns in ``spec`` (list of ``(name, kind)`` with
    kind in int|str|float|ts) in one aggregation pass. Returns one row
    per column: ``pos`` (the column's index in ``spec`` — the explicit
    ordering key; row order itself is not a DataFrame contract),
    ``column_name, null_count, distinct_count, min_value, max_value``."""
    aggs: list[Column] = []
    for name, kind in spec:
        norm = _NORM[kind]
        c = F.col(name)
        nd = (
            F.count_distinct(c)
            if exact_distinct
            else F.approx_count_distinct(c)
        )
        aggs += [
            # count(when), not sum(cast): sum over ZERO rows is NULL,
            # which made an empty-but-valid table profile null_count
            # NULL instead of 0
            F.count(F.when(c.isNull(), 1)).alias(f"{name}__nulls"),
            nd.cast("long").alias(f"{name}__nd"),
            norm(F.min(c)).alias(f"{name}__min"),
            norm(F.max(c)).alias(f"{name}__max"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("column_name"),
                F.col(f"{name}__nulls").alias("null_count"),
                F.col(f"{name}__nd").alias("distinct_count"),
                F.col(f"{name}__min").alias("min_value"),
                F.col(f"{name}__max").alias("max_value"),
            )
            for name, _ in spec
        ]
    )
    return one.select(F.posexplode(rows).alias("pos", "p")).select(
        F.col("pos").cast("int"), "p.*"
    )
