"""Reshape operators: melt (wide->long), pivot_wide (long->wide), split
column — the reference's gather/spread/separate (SURVEY.md §2.9).

Scale notes:
- ``melt`` uses Spark's native ``unpivot`` (Spark >=3.4): a generator in the
  same stage, no shuffle, no Python.
- ``pivot_wide`` demands an explicit value list. Without one Spark runs an
  extra job to collect distinct keys — a full pass over the fact table at
  100 TB — and the column set becomes data-dependent (schema drift).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def melt(
    df: DataFrame,
    ids: list[str],
    values: list[str],
    var_name: str = "variable",
    value_name: str = "value",
    strip_prefix: str = "",
) -> DataFrame:
    """Wide->long (tidyr ``pivot_longer``; query_fieldmap.Rmd:255,417).

    ``strip_prefix`` trims a shared column prefix from the variable labels
    (the reference melts ``cover_*`` / ``layer_*`` column families).
    """
    out = df.unpivot(ids, values, var_name, value_name)
    if strip_prefix:
        import re

        # the prefix is a LITERAL, not a pattern — escape it or a '.'
        # in 'cov.1_' strips unrelated labels and '(' crashes the regex
        # compile (split_column escapes its separator the same way)
        out = out.withColumn(
            var_name,
            F.regexp_replace(var_name, f"^{re.escape(strip_prefix)}", ""),
        )
    return out


def pivot_wide(
    df: DataFrame,
    ids: list[str],
    key: str,
    agg: Column,
    values: list[str] | None = None,
    fill=None,
) -> DataFrame:
    """Long->wide (tidyr ``pivot_wider``; HT31xx_LSVI.Rmd:249-253).

    ``values`` pins the output columns (one-pass, stable schema); ``fill``
    replaces the nulls pivot produces for absent cells.
    """
    g = df.groupBy(*ids)
    p = g.pivot(key, values) if values is not None else g.pivot(key)
    out = p.agg(agg)
    if fill is not None:
        out = out.fillna(fill, subset=[c for c in out.columns if c not in ids])
    return out


def split_column(
    df: DataFrame,
    col: str,
    into: list[str],
    sep: str,
    drop: bool = True,
) -> DataFrame:
    """Split one string column into several (tidyr ``separate``;
    query_fieldmap.Rmd:410). Regex-safe literal separator."""
    import re

    parts = F.split(F.col(col), re.escape(sep), len(into))
    for i, name in enumerate(into):
        df = df.withColumn(name, parts.getItem(i))
    if drop:
        df = df.drop(col)
    return df
