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
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from n2khab_mhq_data_spark.spatial.geometry import (
    Polygon,
    bbox,
    circle_strip_area,
    points_in_polygon,
)


def _build_grid_index(
    polys: list[tuple[int, Polygon, tuple[float, float, float, float]]],
):
    """Uniform grid over the layer's bbox extent (~sqrt(P) cells per axis):
    each polygon is registered in every cell its bbox overlaps. Lookup is
    O(1) per point — per batch only the point's own cell's candidates pay a
    bbox mask + exact test, so per-batch cost is sub-linear in the polygon
    count (vs the round-1 linear scan over all P polygons per batch, which
    at the habitat map's ~1e5 polygons made every Arrow batch pay 1e5 mask
    evaluations)."""
    import math

    gx0 = min(b[0] for _, _, b in polys)
    gy0 = min(b[1] for _, _, b in polys)
    gx1 = max(b[2] for _, _, b in polys)
    gy1 = max(b[3] for _, _, b in polys)
    n = max(1, int(math.sqrt(len(polys))))
    dx = (gx1 - gx0) / n or 1.0
    dy = (gy1 - gy0) / n or 1.0
    cells: dict[int, list[int]] = {}
    for idx, (_, _, (x0, y0, x1, y1)) in enumerate(polys):
        i0 = min(max(int((x0 - gx0) / dx), 0), n - 1)
        i1 = min(max(int((x1 - gx0) / dx), 0), n - 1)
        j0 = min(max(int((y0 - gy0) / dy), 0), n - 1)
        j1 = min(max(int((y1 - gy0) / dy), 0), n - 1)
        for i in range(i0, i1 + 1):
            for j in range(j0, j1 + 1):
                cells.setdefault(i * n + j, []).append(idx)
    return gx0, gy0, gx1, gy1, dx, dy, n, cells


def point_in_polygon_join(
    points: DataFrame,
    polygons: dict[int, Polygon],
    x_col: str = "x",
    y_col: str = "y",
    id_col: str = "point_id",
) -> DataFrame:
    """st_join(points, polygons) (check_observed_habitat_type.Rmd:147-148):
    returns (point_id, polygon_id) for every containment hit (points in no
    polygon are dropped, matching sf's inner st_join default). Candidate
    lookup goes through a grid-bucket index over polygon bboxes (built once
    on the driver, shipped in the UDF closure) — see _build_grid_index."""
    polys = [(pid, poly, bbox(poly)) for pid, poly in polygons.items()]
    gx0, gy0, gx1, gy1, dx, dy, n, cells = _build_grid_index(polys)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = pdf[x_col].to_numpy(dtype=float)
            y = pdf[y_col].to_numpy(dtype=float)
            ids = pdf[id_col].to_numpy()
            out_ids, out_pids = [], []
            # points outside the layer extent can't hit any polygon
            inb = (x >= gx0) & (x <= gx1) & (y >= gy0) & (y <= gy1)
            xi, yi, idsi = x[inb], y[inb], ids[inb]
            if xi.size:
                ix = np.clip(((xi - gx0) / dx).astype(np.int64), 0, n - 1)
                iy = np.clip(((yi - gy0) / dy).astype(np.int64), 0, n - 1)
                key = ix * n + iy
                order = np.argsort(key, kind="stable")
                skey = key[order]
                bounds = np.searchsorted(
                    skey, np.unique(skey), side="left"
                ).tolist() + [skey.size]
                for b0, b1 in zip(bounds[:-1], bounds[1:]):
                    sel = order[b0:b1]
                    cand = cells.get(int(skey[b0]))
                    if not cand:
                        continue
                    cx, cy, cids = xi[sel], yi[sel], idsi[sel]
                    for idx in cand:
                        pid, poly, (x0, y0, x1, y1) = polys[idx]
                        m = (cx >= x0) & (cx <= x1) & (cy >= y0) & (cy <= y1)
                        if not m.any():
                            continue
                        hit = points_in_polygon(cx[m], cy[m], poly)
                        out_ids.append(cids[m][hit])
                        out_pids.append(
                            np.full(int(hit.sum()), pid, dtype=np.int64)
                        )
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


def wkt_circle_intersection_areas(
    segments: DataFrame,
    radius: float = 9.0,
    wkt_col: str = "wkt",
    cx_col: str = "cx",
    cy_col: str = "cy",
    id_cols: tuple[str, str] = ("plot_id", "segment_id"),
) -> DataFrame:
    """J11/K5 general form — segment POLYGON (WKT text) ∩ plot circle:
    exact intersection area + weight (area share of the circle), matching
    sf::st_intersection + st_area (calc_plot_segment_area.Rmd:59-75) for
    ARBITRARY simple polygons, not just axis-aligned bands.

    mapInPandas: per Arrow batch, parse the WKT shells into padded vertex
    matrices (row-wise string work, unavoidable), then ONE vectorized
    circle_polygon_area call over the whole batch (python loop over edge
    index only). No shuffle; the segment side streams."""
    import math

    from pyspark.sql import functions as F  # noqa: F401

    from n2khab_mhq_data_spark.spatial.geometry import circle_polygon_area
    from n2khab_mhq_data_spark.spatial.wkt import shell_vertex_arrays

    total = math.pi * radius * radius
    ida, idb = id_cols

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                yield pd.DataFrame(
                    {
                        ida: pd.Series([], dtype="int64"),
                        idb: pd.Series([], dtype="int64"),
                        "seg_area": pd.Series([], dtype="float64"),
                        "weight": pd.Series([], dtype="float64"),
                    }
                )
                continue
            X, Y, _ = shell_vertex_arrays(pdf[wkt_col].tolist())
            area = circle_polygon_area(
                X,
                Y,
                pdf[cx_col].to_numpy(dtype=float),
                pdf[cy_col].to_numpy(dtype=float),
                radius,
            )
            yield pd.DataFrame(
                {
                    ida: pdf[ida].to_numpy(),
                    idb: pdf[idb].to_numpy(),
                    "seg_area": area,
                    "weight": area / total,
                }
            )

    return segments.mapInPandas(
        op, f"{ida} long, {idb} long, seg_area double, weight double"
    )


def parse_wkt_layer(
    df: DataFrame, wkt_col: str = "wkt", id_col: str = "feature_id"
) -> DataFrame:
    """S7 — spatial-layer ingestion from a WKT text column (the engine's
    interchange path for sf::st_read'd shapefiles/GPKG,
    process_external_data.Rmd:34): validates every geometry (malformed WKT
    fails the job, matching st_read) and materializes per-feature shape
    stats + exact planar area (shoelace, holes subtracted — st_area)."""
    from n2khab_mhq_data_spark.spatial.wkt import (
        parse_wkt_polygon,
        ring_signed_area,
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_polys, n_rings, n_points, areas = [], [], [], [], []
            for fid, w in zip(pdf[id_col], pdf[wkt_col]):
                polys = parse_wkt_polygon(w)
                area = 0.0
                rings = pts = 0
                for rs in polys:
                    area += abs(ring_signed_area(rs[0]))
                    for hole in rs[1:]:
                        area -= abs(ring_signed_area(hole))
                    rings += len(rs)
                    pts += sum(len(r) for r in rs)
                ids.append(fid)
                n_polys.append(len(polys))
                n_rings.append(rings)
                n_points.append(pts)
                areas.append(area)
            yield pd.DataFrame(
                {
                    "feature_id": pd.Series(ids, dtype="int64"),
                    "n_polys": pd.Series(n_polys, dtype="int64"),
                    "n_rings": pd.Series(n_rings, dtype="int64"),
                    "n_points": pd.Series(n_points, dtype="int64"),
                    "area": pd.Series(areas, dtype="float64"),
                }
            )

    return df.mapInPandas(
        op,
        "feature_id long, n_polys long, n_rings long, n_points long,"
        " area double",
    )


def knn_join_gridded(
    points: DataFrame,
    queries: DataFrame,
    k: int,
    cell: float,
    enforce_exact: bool = True,
) -> DataFrame:
    """Exact k-nearest-neighbour join via grid buckets: each corpus
    point hashes to ONE (cx, cy) cell; each query probes its 3x3 cell
    neighbourhood; exact distances verify inside the candidate set, a
    per-query window keeps the top k.

    EXACTNESS PRECONDITION: the kth neighbour must lie within ``cell``
    of the query (the 3x3 ring's guaranteed radius). Pick ``cell`` so
    that expected k-NN distance sqrt(k / (pi * density)) is well under
    it. With ``enforce_exact`` (default) the precondition is CHECKED AT
    RUNTIME inside the plan: any query whose kth kept distance exceeds
    ``cell``, or that kept fewer than k rows while eligible points
    exist outside its ring, fails the job via ``raise_error`` — an
    inexact result can never pass silently (ADVICE r3). The guard is a
    second window over the already-qid-partitioned kept rows plus a
    broadcast 1-row corpus count: no extra shuffle, no extra job.
    Production path at unbounded scale is ring expansion: re-probe
    radius-2 cells for the (rare) flagged queries — same plan shape,
    one extra round; ``enforce_exact=False`` is for that caller, which
    re-checks after expansion.

    Scale: one shuffle each side on the cell key (query side is 9 rows
    per query — broadcastable when the query set is small); candidate
    count is bounded by 9 * cell occupancy, never O(n) per query; the
    top-k window partitions by query id only."""
    p = points.select(
        F.col("point_id").alias("nid"),
        F.col("x").alias("px"),
        F.col("y").alias("py"),
        F.floor(F.col("x") / cell).alias("cx"),
        F.floor(F.col("y") / cell).alias("cy"),
    )
    probes = queries.select(
        F.col("point_id").alias("qid"), "x", "y",
        F.explode(
            F.expr("sequence(-1, 1)")
        ).alias("dx"),
    ).select(
        "qid", "x", "y",
        (F.floor(F.col("x") / cell) + F.col("dx")).alias("cx"),
        F.explode(F.expr("sequence(-1, 1)")).alias("dy"),
    ).select(
        "qid", "x", "y", "cx",
        (F.floor(F.col("y") / cell) + F.col("dy")).alias("cy"),
    )
    d2 = (F.col("x") - F.col("px")) ** 2 + (F.col("y") - F.col("py")) ** 2
    cand = (
        probes.join(p, ["cx", "cy"])
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid", d2.alias("d2"))
    )
    w = W.partitionBy("qid").orderBy("d2", "nid")
    kept = cand.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )
    dist = F.round(F.sqrt(F.col("d2")) + F.lit(1e-9), 6)
    if enforce_exact:
        wq = W.partitionBy("qid")
        # kth kept distance beyond the ring radius, or a short result
        # while eligible points (>= corpus-1 after the self-exclusion)
        # remain outside the ring -> the true k-NN may be missed
        n_corpus = points.select(F.count("*").alias("__np"))
        kept = kept.join(F.broadcast(n_corpus))
        bad = (F.max("d2").over(wq) > F.lit(float(cell) * float(cell))) | (
            (F.count("*").over(wq) < k)
            & (F.count("*").over(wq) < F.col("__np") - 1)
        )
        dist = F.when(
            bad,
            F.raise_error(
                F.format_string(
                    "knn_join_gridded exactness breach for query %s:"
                    " kth neighbour beyond cell=%s — expand the probe"
                    " ring or enlarge cell",
                    F.col("qid"),
                    F.lit(str(cell)),
                )
            ).cast("double"),
        ).otherwise(dist)
    return kept.select(
        F.col("qid").alias("query_id"),
        F.col("nid").alias("neighbour_id"),
        F.col("rank").cast("int").alias("rank"),
        dist.alias("dist"),
    )
