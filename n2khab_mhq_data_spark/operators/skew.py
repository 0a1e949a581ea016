"""Skew mitigation: salted two-stage aggregation and salted broadcast join.

At 100 TB a handful of hot keys (a viral document, a default plot id) can
pin one reducer for hours. Two standard remedies, both semantics-preserving:

- salted aggregation: append a random-ish salt to the group key, partially
  aggregate (key, salt), then re-aggregate by key. The hot key's rows spread
  over ``buckets`` reducers in stage 1; stage 2 only merges ``buckets``
  partial rows per key. Only works for algebraic aggregates (sum/count/
  min/max — anything with a merge function).
- AQE's skew-join splitting already covers the join case when statistics
  see it (session.py enables it); the salt helper here is for aggregations,
  which AQE does not rebalance.

The salt is derived deterministically from a uniform column (or the whole
row hash) — no RNG, so plans stay reproducible and re-runnable (speculative
task retries must produce identical salts for exactly-once semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(
    df: DataFrame,
    buckets: int,
    salt_col: str = "__salt",
    spread_duplicates: bool = False,
) -> DataFrame:
    """Deterministic salt in [0, buckets): xxhash64 of the full row.

    The salt is a pure function of row CONTENT — never of row position.
    A recomputed map task (speculative execution, fetch-failure retry)
    re-emits byte-identical rows, so every retry salts identically and
    the (key, salt) shuffle stays exactly-once.  Position-derived salts
    (monotonically_increasing_id, row_number without a total order)
    are the SPARK-23207 bug class: within-partition order after a
    shuffle is not stable across re-executions, so a retried task can
    route the same row to a different reducer — duplicating or losing
    it downstream.

    Known limitation of the content salt: BYTE-IDENTICAL duplicate rows
    all hash to one bucket, so a hot key composed mostly of exact
    duplicates stays pinned on a single reducer.  ``spread_duplicates=
    True`` additionally mixes ``spark_partition_id()`` into the hash,
    spreading duplicates that sit in different input partitions.  That
    is retry-safe ONLY when upstream partition MEMBERSHIP is
    deterministic — a file scan (splits are fixed) or a hash shuffle
    (membership is a pure function of content) — because a retried
    task re-reads the same partition id.  It is NOT safe downstream of
    round-robin/``repartition(n)`` or ``rand()``-derived layouts, where
    membership itself is order-dependent; leave it off there.
    """
    if salt_col in df.columns:
        raise ValueError(
            f"with_salt would overwrite existing column {salt_col!r};"
            " rename it (or pass a different salt_col) first"
        )
    parts: list = list(df.columns)
    if spread_duplicates:
        parts.append(F.spark_partition_id())
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*parts), F.lit(buckets))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) -> groupBy(keys).

    ``aggs`` maps output column name -> (stage1 aggregate over input rows,
    stage2 merge aggregate over the stage-1 partials named ``name``).
    Example: {"n": (F.count("*"), F.sum("n")),
              "total": (F.sum("x"), F.sum("total")),
              "mx": (F.max("x"), F.max("mx"))}.
    """
    if "__salt" in keys:
        raise ValueError(
            "salted_agg reserves '__salt' as the internal salt column;"
            " it cannot also be a grouping key"
        )
    salted = with_salt(df, buckets)
    stage1 = salted.groupBy(*keys, "__salt").agg(
        *[a1.alias(name) for name, (a1, _) in aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[a2.alias(name) for name, (_, a2) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted shuffle join for hot keys when the dim side is too big to
    broadcast outright: the dim side is replicated ``buckets`` times
    (explode of a literal salt array), the fact side gets a
    deterministic row-hash salt, and the join runs on (key, salt) — a
    hot fact key's rows now land on ``buckets`` different reducers
    instead of one.

    Cost: dim side grows x``buckets`` (choose buckets so that
    |dim| x buckets stays shuffle-friendly); the fact side is
    unchanged. AQE's skew-join split covers most cases at runtime —
    this operator is for the planned-ahead variant (known-hot keys,
    deterministic layout, or AQE unavailable mid-stream). The salt is
    the row hash, not rand(): speculative retries must salt
    identically.

    Only joins that never emit UNMATCHED DIM rows are supported: the
    dim replication means a dim key with no fact match would surface
    ``buckets`` duplicate null-extended rows under right/full outer —
    reject those up front rather than silently multiplying rows.
    """
    # normalize the way Spark itself does (JoinTypes accepts any case
    # and optional underscores) so "FULL" / "Right_Outer" can't slip
    # past the guard
    if how.lower().replace("_", "") in (
        "right", "rightouter", "full", "outer", "fullouter"
    ):
        raise ValueError(
            f"salted_join does not support how={how!r}: the salted dim"
            " side is replicated, so unmatched dim keys would emit"
            " one null-extended row PER BUCKET instead of one"
        )
    if "__salt" in dim.columns:
        raise ValueError(
            "salted_join would overwrite the dim side's existing"
            " '__salt' column; rename it first"
        )
    fact_s = with_salt(fact, buckets)
    dim_s = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(buckets)])),
    )
    return fact_s.join(dim_s, on + ["__salt"], how).drop("__salt")
