"""Spatial queries J10/J11/K5/K11 (SURVEY.md §2.3, §2.10) — pandas-UDF
geometry kernels differentially tested against closed-form SQL oracles.

Synthetic geometry: points and segment cuts are derived from customer keys
with pure integer arithmetic, so the DuckDB oracle can re-derive the exact
same coordinates; polygons are grid cells whose containment has an exact
arithmetic form. The Spark side still runs the REAL general kernels
(ray-casting, strip clipping, LCC projection)."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from n2khab_mhq_data_spark.catalog import load
from n2khab_mhq_data_spark.plans import query
from n2khab_mhq_data_spark.spatial import crs
from n2khab_mhq_data_spark.spatial.join import (
    point_in_polygon_join,
    strip_segment_areas,
)

# 5x5 grid of 20x20 cells over [0,100)^2; cell id = col + 5*row
_GRID_POLYGONS = {
    col + 5 * row: [
        (20.0 * col, 20.0 * row),
        (20.0 * (col + 1), 20.0 * row),
        (20.0 * (col + 1), 20.0 * (row + 1)),
        (20.0 * col, 20.0 * (row + 1)),
    ]
    for row in range(5)
    for col in range(5)
}


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic point per customer (never on a cell boundary: +0.05)."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("point_id"),
        ((F.col("c_custkey") * 7919 % 1000) / 10.0 + 0.05).alias("x"),
        ((F.col("c_custkey") * 104729 % 1000) / 10.0 + 0.05).alias("y"),
    )


@query(
    "j10_point_in_polygon",
    oracle="""
    WITH p AS (
      SELECT c_custkey AS point_id,
             (c_custkey * 7919 % 1000) / 10.0 + 0.05 AS x,
             (c_custkey * 104729 % 1000) / 10.0 + 0.05 AS y
      FROM customer
    )
    SELECT point_id,
           CAST(floor(x / 20) + 5 * floor(y / 20) AS BIGINT) AS polygon_id
    FROM p
    """,
)
def j10_point_in_polygon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J10 spatial point-in-polygon join (st_join(points, habitatmap),
    check_observed_habitat_type.Rmd:147-148): broadcast polygon list, bbox
    prefilter, exact ray-casting in a vectorized pandas UDF. The grid-cell
    polygon set lets the oracle verify containment with exact arithmetic —
    the Spark side runs the general kernel, the oracle the closed form."""
    return point_in_polygon_join(_points(spark, sf_dir), _GRID_POLYGONS)


_LCC_CONSTS = (
    f"SELECT {crs._E!r}::DOUBLE AS e, {crs._A!r}::DOUBLE AS a,"
    f" {float(crs._N)!r}::DOUBLE AS n,"
    f" {float(crs._BIGF)!r}::DOUBLE AS bigf,"
    f" {float(crs._RHO0)!r}::DOUBLE AS rho0,"
    f" {crs._LON0!r}::DOUBLE AS lon0, {crs._X0!r}::DOUBLE AS x0,"
    f" {crs._Y0!r}::DOUBLE AS y0"
)


@query(
    "k11_crs_transform",
    oracle=f"""
    WITH k AS ({_LCC_CONSTS}),
    pts AS (
      SELECT c_custkey AS point_id,
             radians(50.0 + (c_custkey % 100) / 100.0) AS phi,
             radians(3.0 + (c_custkey % 73) / 73.0 * 2) AS lam
      FROM customer
    ), proj AS (
      SELECT point_id,
             a * bigf * power(
               tan(pi()/4 - phi/2)
               / power((1 - e*sin(phi)) / (1 + e*sin(phi)), e/2), n) AS rho,
             n * (lam - lon0) AS theta, x0, y0, rho0
      FROM pts, k
    )
    SELECT point_id,
           round(x0 + rho * sin(theta) + 1e-9, 3) AS x,
           round(y0 + rho0 - rho * cos(theta) + 1e-9, 3) AS y
    FROM proj
    """,
)
def k11_crs_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K11 CRS transform, projection leg (BD72 lon/lat -> Lambert-72 metres):
    Snyder LCC-2SP in a vectorized pandas UDF; the oracle evaluates the same
    published formulas in SQL. The full sf::st_transform pipeline (datum
    shift + projection) is k11_crs_full_datum."""
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("point_id"),
        (50.0 + (F.col("c_custkey") % 100) / 100.0).alias("lat"),
        (3.0 + (F.col("c_custkey") % 73) / 73.0 * 2).alias("lon"),
    )
    out = pts.withColumn(
        "xy", crs.bd72_to_lambert72_udf(F.col("lon"), F.col("lat"))
    )
    return out.select(
        "point_id",
        F.round(F.col("xy.x") + F.lit(1e-9), 3).alias("x"),
        F.round(F.col("xy.y") + F.lit(1e-9), 3).alias("y"),
    )


_HELMERT_CONSTS = (
    f"SELECT {crs._WGS_A!r}::DOUBLE AS wa, {crs._WGS_E2!r}::DOUBLE AS we2,"
    f" {crs._A!r}::DOUBLE AS a2, {crs._E2!r}::DOUBLE AS e2,"
    f" {crs._TX!r}::DOUBLE AS tx, {crs._TY!r}::DOUBLE AS ty,"
    f" {crs._TZ!r}::DOUBLE AS tz, {float(crs._RX)!r}::DOUBLE AS rx,"
    f" {float(crs._RY)!r}::DOUBLE AS ry, {float(crs._RZ)!r}::DOUBLE AS rz,"
    f" {crs._DS!r}::DOUBLE AS ds"
)

# 6 unrolled iterations of the geocentric->geodetic latitude recovery
# (mirrors crs._xyz_to_geodetic's fixed-point loop exactly)
_PHI_ITER = "".join(
    f""", g{i + 1} AS (
      SELECT point_id, lmb, p, zb, e2, a2,
             atan2(zb + e2 * (a2 / sqrt(1 - e2 * sin(phi) * sin(phi)))
                   * sin(phi), p) AS phi
      FROM g{i}
    )"""
    for i in range(6)
)


@query(
    "k11_crs_full_datum",
    oracle=f"""
    WITH hk AS ({_HELMERT_CONSTS}), k AS ({_LCC_CONSTS}),
    pts AS (
      SELECT c_custkey AS point_id,
             radians(50.0 + (c_custkey % 100) / 100.0) AS phw,
             radians(3.0 + (c_custkey % 73) / 73.0 * 2) AS lmw
      FROM customer
    ), xyz0 AS (
      SELECT point_id, phw, lmw,
             wa / sqrt(1 - we2 * sin(phw) * sin(phw)) AS nu,
             tx, ty, tz, rx, ry, rz, ds, we2
      FROM pts, hk
    ), xyz AS (
      SELECT point_id,
             tx + (1 + ds) * (x - rz * y + ry * z) AS xb,
             ty + (1 + ds) * (rz * x + y - rx * z) AS yb,
             tz + (1 + ds) * (-ry * x + rx * y + z) AS zb
      FROM (
        SELECT point_id, tx, ty, tz, rx, ry, rz, ds,
               nu * cos(phw) * cos(lmw) AS x,
               nu * cos(phw) * sin(lmw) AS y,
               nu * (1 - we2) * sin(phw) AS z
        FROM xyz0
      ) q
    ), g0 AS (
      SELECT point_id, atan2(yb, xb) AS lmb,
             sqrt(xb * xb + yb * yb) AS p, zb, e2, a2,
             atan2(zb, sqrt(xb * xb + yb * yb) * (1 - e2)) AS phi
      FROM xyz, hk
    ){_PHI_ITER}, proj AS (
      SELECT point_id,
             a * bigf * power(
               tan(pi() / 4 - phi / 2)
               / power((1 - e * sin(phi)) / (1 + e * sin(phi)), e / 2), n)
               AS rho,
             n * (lmb - lon0) AS theta, x0, y0, rho0
      FROM g6, k
    )
    SELECT point_id,
           round(x0 + rho * sin(theta) + 1e-9, 3) AS x,
           round(y0 + rho0 - rho * cos(theta) + 1e-9, 3) AS y
    FROM proj
    """,
)
def k11_crs_full_datum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K11 full EPSG:31370 pipeline from true WGS84 (what sf::st_transform
    does, process_external_data.Rmd:148-152): Helmert 7-parameter shift to
    BD72 (inverse EPSG:15929) then LCC-2SP. ~100 m from the projection-only
    leg over Belgium. Oracle re-derives every step in SQL, including the
    fixed-point latitude recovery unrolled to the same 6 iterations."""
    c = load(spark, sf_dir, "customer")
    pts = c.select(
        F.col("c_custkey").alias("point_id"),
        (50.0 + (F.col("c_custkey") % 100) / 100.0).alias("lat"),
        (3.0 + (F.col("c_custkey") % 73) / 73.0 * 2).alias("lon"),
    )
    out = pts.withColumn("xy", crs.to_lambert72_udf(F.col("lon"), F.col("lat")))
    return out.select(
        "point_id",
        F.round(F.col("xy.x") + F.lit(1e-9), 3).alias("x"),
        F.round(F.col("xy.y") + F.lit(1e-9), 3).alias("y"),
    )


@query(
    "j11_segment_area_weights",
    oracle=f"""
    WITH segs AS (
      SELECT c_custkey AS plot_id, s.segment_id,
             CASE s.segment_id WHEN 1 THEN -9.0
                  ELSE -8.95 + (c_custkey % 180) / 10.0 END AS x0,
             CASE s.segment_id WHEN 1 THEN -8.95 + (c_custkey % 180) / 10.0
                  ELSE 9.0 END AS x1
      FROM customer, (VALUES (1), (2)) AS s(segment_id)
    ), area AS (
      SELECT plot_id, segment_id,
             (pi() * 81 - (81 * acos(x1 / 9.0)
                           - x1 * sqrt(81 - x1 * x1)))
             - (pi() * 81 - (81 * acos(x0 / 9.0)
                             - x0 * sqrt(81 - x0 * x0))) AS seg_area
      FROM segs
    )
    SELECT plot_id, segment_id,
           round(seg_area + 1e-9, 3) AS seg_area,
           round(seg_area / (pi() * 81) + 1e-9, 6) AS weight
    FROM area
    """,
)
def j11_segment_area_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J11/K5 segment-area weights (calc_plot_segment_area.Rmd:48-113):
    plot circle r=9 m split into two bands at a per-plot cut; intersection
    area from the vectorized strip-clipping kernel; weight = area share of
    the circle (the reference's segment weight). Oracle: the closed-form
    circular-segment formula."""
    c = load(spark, sf_dir, "customer")
    cut = (-8.95 + (F.col("c_custkey") % 180) / 10.0).alias("cut")
    segs = (
        c.select(F.col("c_custkey").alias("plot_id"), cut)
        .select(
            "plot_id",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("segment_id"),
                        F.lit(-9.0).alias("x0"),
                        F.col("cut").alias("x1"),
                    ),
                    F.struct(
                        F.lit(2).alias("segment_id"),
                        F.col("cut").alias("x0"),
                        F.lit(9.0).alias("x1"),
                    ),
                )
            ).alias("s"),
        )
        .select("plot_id", "s.segment_id", "s.x0", "s.x1")
    )
    out = strip_segment_areas(segs, radius=9.0)
    return out.select(
        "plot_id",
        "segment_id",
        F.round(F.col("seg_area") + F.lit(1e-9), 3).alias("seg_area"),
        F.round(F.col("weight") + F.lit(1e-9), 6).alias("weight"),
    )
