"""J10/J11 — spatial joins as broadcast-polygon pandas UDFs.

Pattern (SURVEY.md §7.4.1): the polygon layer is small (habitat map ~1e5
polygons) — serialize it to the executors once (closure/broadcast); the
point side streams through an Arrow-batched UDF that does a bbox prefilter
then the exact ray-casting test. The fact side never shuffles; the cost is
one projection. A Sedona-style partitioned spatial join only becomes
necessary when BOTH sides are large."""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from n2khab_mhq_data_spark.spatial.geometry import (
    Polygon,
    bbox,
    circle_strip_area,
    points_in_polygon,
)


def point_in_polygon_join(
    points: DataFrame,
    polygons: dict[int, Polygon],
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "point_id",
) -> DataFrame:
    """st_join(points, polygons) (check_observed_habitat_type.Rmd:147-148):
    returns (point_id, polygon_id) for every containment hit (points in no
    polygon are dropped, matching sf's inner st_join default)."""
    polys = [(pid, poly, bbox(poly)) for pid, poly in polygons.items()]

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = pdf[x_col].to_numpy(dtype=float)
            y = pdf[y_col].to_numpy(dtype=float)
            ids = pdf[id_col].to_numpy()
            out_ids, out_pids = [], []
            for pid, poly, (x0, y0, x1, y1) in polys:
                # bbox prefilter: cheap vectorized mask before exact test
                m = (x >= x0) & (x <= x1) & (y >= y0) & (y <= y1)
                if not m.any():
                    continue
                hit = points_in_polygon(x[m], y[m], poly)
                out_ids.append(ids[m][hit])
                out_pids.append(np.full(int(hit.sum()), pid, dtype=np.int64))
            if out_ids:
                yield pd.DataFrame(
                    {
                        "point_id": np.concatenate(out_ids),
                        "polygon_id": np.concatenate(out_pids),
                    }
                )
            else:
                yield pd.DataFrame(
                    {
                        "point_id": pd.Series([], dtype="int64"),
                        "polygon_id": pd.Series([], dtype="int64"),
                    }
                )

    return points.mapInPandas(op, "point_id long, polygon_id long")


def strip_segment_areas(
    segments: DataFrame,
    radius: float = 9.0,
    x0_col: str = "x0",
    x1_col: str = "x1",
) -> DataFrame:
    """J11/K5 — segment-band ∩ plot-circle area and weight
    (calc_plot_segment_area.Rmd:59-113): for band-shaped segments
    [x0, x1] against the radius-r circle, closed-form intersection area and
    the area share ("weight") of the full circle."""
    import math

    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def area_udf(x0: pd.Series, x1: pd.Series) -> pd.Series:
        a = circle_strip_area(
            x0.to_numpy(dtype=float), x1.to_numpy(dtype=float), radius
        )
        return pd.Series(a)

    total = math.pi * radius * radius
    out = segments.withColumn(
        "seg_area", area_udf(F.col(x0_col), F.col(x1_col))
    )
    return out.withColumn("weight", F.col("seg_area") / F.lit(total))
