"""Per-key sequential time-series kernels that plain window frames can't
express (genuinely recursive state), run as Arrow-batched grouped maps.

EWMA is the canonical example: ``s_t = alpha * v_t + (1-alpha) * s_{t-1}``
depends on its own previous OUTPUT, which Spark window functions cannot
reference (the closed form ``alpha * sum((1-alpha)^(t-i) v_i)`` exists
but needs ``(1-alpha)^{-i}`` prefix factors that overflow doubles after
~700 rows). So this is one of the few places the repo's UDF policy
allows Python: an ``applyInPandas`` grouped map — Arrow-batched,
vectorized inside pandas' C ewm loop, never row-at-a-time.

Scale: one shuffle on the key columns; each key's series is processed
by exactly one task, so the operator scales with the number of keys
(time-series cardinality), which is the natural parallelism of the
problem. A single pathological key with billions of rows would need
chunked carry-state processing (the transformWithState pattern in
streaming/sessions.py); batch corpora key series are bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import DoubleType, StructField, StructType


def ewma(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value_col: str,
    alpha: float = 0.25,
    out_col: str = "ewma",
) -> DataFrame:
    """Exponentially-weighted moving average per key group, ordered by
    ``order`` (ties must be broken by the caller's order columns —
    include a unique id). ``adjust=False`` semantics: ``s_1 = v_1``,
    then the recurrence above — matching the textbook online form.

    NULL values are REJECTED (raise): the recurrence is undefined at a
    missing observation, and pandas' ewm would neither skip nor
    propagate it — it fabricates a carried value at the NULL row and
    gap-adjusts subsequent weights (ignore_na=False), so the output
    would match NO SQL recomputation of the documented recurrence (and
    a leading NULL would leak NaN, not SQL NULL, into the column).
    Callers filter or impute first (plans/windows.py::ts_ewma
    pre-filters)."""
    import pandas as pd

    if out_col in df.columns:
        # appending blindly would declare a duplicate field to Arrow and
        # die with an opaque runtime AnalysisException
        raise ValueError(
            f"ewma: out_col {out_col!r} already exists in the input;"
            " pass a different name"
        )
    schema = StructType(
        list(df.schema.fields) + [StructField(out_col, DoubleType())]
    )

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if pdf[value_col].isna().any():
            raise ValueError(
                f"ewma: NULL/NaN in {value_col!r} — the recurrence is"
                " undefined at missing observations; filter or impute"
                " before calling"
            )
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf[out_col] = (
            pdf[value_col].ewm(alpha=alpha, adjust=False).mean()
        )
        return pdf

    from n2khab_mhq_data_spark.operators.grouped import grouped_map

    return grouped_map(df, keys, fn, schema)


def holt_linear(
    df: DataFrame,
    keys: list[str],
    order: list[str],
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.2,
    level_col: str = "level",
    trend_col: str = "trend",
) -> DataFrame:
    """Holt's linear (double exponential) smoothing per key group —
    COUPLED recursive state no window frame or single ewm pass can
    express: ``s_t = alpha*v_t + (1-alpha)*(s_{t-1} + b_{t-1})``,
    ``b_t = beta*(s_t - s_{t-1}) + (1-beta)*b_{t-1}``; init
    ``s_1 = v_1, b_1 = 0`` (documented flat-start convention, so the
    recurrence is total without a second-point special case).

    The kernel is a per-group scalar loop over the series (no
    vectorized spelling exists for the coupled pair) — still
    Arrow-batched per GROUP like :func:`ewma`, cost linear in series
    length, parallel across keys. The arithmetic mirrors the oracle's
    recursive-CTE expressions TERM FOR TERM (same literals, same
    association), so both engines walk identical doubles. NULLs are
    rejected for the same reason as :func:`ewma`."""
    import pandas as pd

    for c in (level_col, trend_col):
        if c in df.columns:
            raise ValueError(
                f"holt_linear: out col {c!r} already exists; rename"
            )
    schema = StructType(
        list(df.schema.fields)
        + [StructField(level_col, DoubleType()),
           StructField(trend_col, DoubleType())]
    )

    def fn(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if pdf[value_col].isna().any():
            raise ValueError(
                f"holt_linear: NULL/NaN in {value_col!r} — filter or"
                " impute before calling"
            )
        pdf = pdf.sort_values(order, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype="float64")
        n = len(vals)
        levels = [0.0] * n
        trends = [0.0] * n
        s = float(vals[0])
        b = 0.0
        levels[0], trends[0] = s, b
        for i in range(1, n):
            v = float(vals[i])
            s_new = alpha * v + (1 - alpha) * (s + b)
            b = beta * (s_new - s) + (1 - beta) * b
            s = s_new
            levels[i], trends[i] = s, b
        pdf[level_col] = levels
        pdf[trend_col] = trends
        return pdf

    from n2khab_mhq_data_spark.operators.grouped import grouped_map

    return grouped_map(df, keys, fn, schema)
