"""Query registry — the driver contract surface.

Every implemented operator from SURVEY.md §2 registers a named query here
(a callable ``(spark, sf_dir) -> DataFrame``) and, where SQL-expressible,
a DuckDB oracle SQL string computing the same result on the same parquet
tables. ``__spark_entry__.queries()`` / ``oracle_sql()`` read these dicts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query; ``oracle`` is the DuckDB-runnable SQL equivalent
    (omit only for genuinely non-SQL-expressible ops — the driver then
    records a weaker rows-only check)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = " ".join(oracle.split())
        return fn

    return deco


def _load_modules() -> None:
    # import for registration side effects
    from n2khab_mhq_data_spark.plans import (  # noqa: F401
        relational,
        windows,
        reshape,
        kernels,
        llm,
        pipeline,
        spatial,
    )


def _interleave_families() -> None:
    """Rebuild the registries in round-robin family order.

    The driver's CORRECTNESS file may truncate to a prefix of the
    registration order (round 1 kept only the first 50, leaving whole
    families — kernels/LLM/pipeline/spatial — with no driver-side signal).
    Interleaving one-query-per-module means ANY prefix samples every
    family. Within a family, registration order is kept (modules register
    basic shapes first)."""
    fams: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        fams.setdefault(fn.__module__, []).append(name)
    queues = list(fams.values())
    order: list[str] = []
    while queues:
        for q in queues:
            order.append(q.pop(0))
        queues = [q for q in queues if q]
    snap_q, snap_o = dict(QUERIES), dict(ORACLES)
    QUERIES.clear()
    ORACLES.clear()
    for n in order:
        QUERIES[n] = snap_q[n]
        if n in snap_o:
            ORACLES[n] = snap_o[n]


_LOADED = False


def ensure_loaded() -> None:
    global _LOADED
    if not _LOADED:
        _load_modules()
        _interleave_families()
        _LOADED = True
