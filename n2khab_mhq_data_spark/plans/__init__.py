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


_LOADED = False


def ensure_loaded() -> None:
    global _LOADED
    if not _LOADED:
        _load_modules()
        _LOADED = True
