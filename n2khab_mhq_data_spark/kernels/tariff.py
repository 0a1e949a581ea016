"""K8 — tree volume tariffs: per-species-group parameter rows select a
polynomial by ``formule_type`` (export_from_vbidwh.Rmd:227-269; published as
processed/dwh_vbi/vol_parameters_*).

Spark mapping: broadcast the parameter dimension, compute every polynomial
as vectorized column arithmetic, select with a when-ladder. One projection,
zero shuffles beyond the broadcast."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2khab_mhq_data_spark.catalog import local_dim

TARIFF_SCHEMA = (
    "species_group string, formule_type int, a double, b double, c double,"
    " d double"
)


def tariff_dim(spark: SparkSession, rows: list[tuple]) -> DataFrame:
    return local_dim(spark, rows, TARIFF_SCHEMA)


def compute_volume(
    trees: DataFrame,
    params: DataFrame,
    group_col: str = "species_group",
    dbh_col: str = "dbh",
    height_col: str | None = None,
) -> DataFrame:
    """volume = tariff polynomial of dbh (1-input) or dbh+height (2-input).

    formule_type 1: a + b*d + c*d^2            (1-input tariff)
    formule_type 2: a + b*d + c*d^2 + d4*d^3   (cubic 1-input)
    formule_type 3: a + b*d^2 + c*d^2*h        (2-input, needs height)
    """
    j = trees.join(F.broadcast(params), on=group_col, how="left")
    dd = F.col(dbh_col).cast("double")
    ft = F.col("formule_type")
    vol = F.when(
        ft == 1, F.col("a") + F.col("b") * dd + F.col("c") * dd * dd
    ).when(
        ft == 2,
        F.col("a")
        + F.col("b") * dd
        + F.col("c") * dd * dd
        + F.col("d") * dd * dd * dd,
    )
    if height_col:
        h = F.col(height_col).cast("double")
        vol = vol.when(
            ft == 3,
            F.col("a") + F.col("b") * dd * dd + F.col("c") * dd * dd * h,
        )
    # fail FAST on rows no formula matched: unknown formule_type, a
    # species group absent from the tariff table, or a 2-input (type 3)
    # tariff when no height column was supplied — the bare when-ladder
    # yielded silent NULL vol_m3 that downstream sums then skipped,
    # under-reporting stand volume (same posture as the LSVI engine's
    # unknown-operator raise).  ALSO fail when a formula DID match but the
    # polynomial still came out NULL (NULL dbh, NULL height on a type-3
    # tariff, or NULL a/b/c/d coefficients) — the exact same silent
    # under-reporting through a different hole.
    no_formula = F.raise_error(
        F.concat(
            F.lit("compute_volume: no tariff formula for formule_type="),
            F.coalesce(
                ft.cast("string"),
                F.lit(f"NULL (unmatched {group_col})"),
            ),
            F.lit(
                "" if height_col
                else " (type-3 tariffs need height_col)"
            ),
        )
    ).cast("double")
    null_input = F.raise_error(
        F.concat(
            F.lit("compute_volume: NULL volume despite matched"
                  " formule_type="),
            ft.cast("string"),
            F.lit(" — NULL dbh/height or NULL tariff coefficient"),
        )
    ).cast("double")
    matched = ft.isin([1, 2, 3] if height_col else [1, 2])
    vol = (
        F.when(~F.coalesce(matched, F.lit(False)), no_formula)
        .when(vol.isNull(), null_input)
        .otherwise(vol)
    )
    from n2khab_mhq_data_spark.functions.scalars import eps_round

    return j.withColumn("vol_m3", eps_round(vol, 6))
