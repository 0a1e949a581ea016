"""K7 — the LSVI habitat-quality rule engine as a pure relational plan.

The reference calls the external ``LSVI::berekenLSVIbasis`` package
(HT31xx_LSVI.Rmd:198-205, HT3260_LSVI.Rmd:45-156): per plot x habitat type it
evaluates threshold conditions ("voorwaarden") against measured values, then
aggregates voorwaarde -> indicator -> criterium -> global status, emitting 4
result levels (processed/lsvi_mhq/*/result/: lsvi_detail, lsvi_indicator,
lsvi_criterium, lsvi_globaal).

Spark-first design (SURVEY.md §7.1.5): the rule table is a broadcast
dimension; evaluation is a when-ladder over comparison operators; the result
levels are layered aggregations with bool_and + favourable-share. No UDF, no
driver loop — the whole engine is one Catalyst plan, so it scales to any
number of plots.

Empty-group semantics: R's min() over an empty set yields Inf with a warning
(HT31xx_LSVI.Rmd:232-239); here a voorwaarde with a null measured value
evaluates to null status, and bool_and skips nulls only when the rule table
marks the voorwaarde optional — otherwise null propagates (strict).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2khab_mhq_data_spark.catalog import local_dim

RULES_SCHEMA = (
    "habitat_type string, criterium string, indicator string,"
    " voorwaarde string, operator string, threshold double"
)


def rules_dim(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    """Rule table (the reference fetches these via geefInvoervereisten,
    HT31xx_LSVI.Rmd:49-60; here they are versioned seed data)."""
    return local_dim(spark, rows, RULES_SCHEMA)


def evaluate_conditions(
    measurements: DataFrame, rules: DataFrame
) -> DataFrame:
    """lsvi_detail: one row per plot x voorwaarde with boolean status.

    ``measurements``: plot_id, habitat_type, voorwaarde, value.
    Join to the broadcast rule table, then evaluate the comparison operator
    as a when-ladder (the operator vocabulary observed in the LSVI rule
    tables: >=, >, <=, <, =).
    """
    j = measurements.join(
        F.broadcast(rules), on=["habitat_type", "voorwaarde"], how="inner"
    )
    v, t = F.col("value"), F.col("threshold")
    status = (
        F.when(F.col("operator") == ">=", v >= t)
        .when(F.col("operator") == ">", v > t)
        .when(F.col("operator") == "<=", v <= t)
        .when(F.col("operator") == "<", v < t)
        .when(F.col("operator") == "=", v == t)
    )
    return j.select(
        "plot_id",
        "habitat_type",
        "criterium",
        "indicator",
        "voorwaarde",
        F.round(v + F.signum(v) * 1e-9, 6).alias("value"),
        "operator",
        "threshold",
        status.alias("status_voorwaarde"),
    )


def aggregate_levels(detail: DataFrame) -> dict[str, DataFrame]:
    """Roll the detail up through the reference's 4 result levels."""
    indicator = detail.groupBy(
        "plot_id", "habitat_type", "criterium", "indicator"
    ).agg(F.bool_and("status_voorwaarde").alias("status_indicator"))

    criterium = indicator.groupBy("plot_id", "habitat_type", "criterium").agg(
        F.bool_and("status_indicator").alias("status_criterium"),
        F.round(
            F.avg(F.col("status_indicator").cast("int")) + F.lit(1e-9), 6
        ).alias("share_favourable_ind"),
    )

    globaal = criterium.groupBy("plot_id", "habitat_type").agg(
        F.bool_and("status_criterium").alias("status_global"),
        F.round(
            F.avg(F.col("status_criterium").cast("int")) + F.lit(1e-9), 6
        ).alias("share_favourable"),
    )
    return {
        "lsvi_detail": detail,
        "lsvi_indicator": indicator,
        "lsvi_criterium": criterium,
        "lsvi_globaal": globaal,
    }
