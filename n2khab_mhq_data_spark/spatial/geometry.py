"""Vectorized geometry kernels (NumPy, no GEOS).

Used by the pandas-UDF spatial joins. The polygon set is assumed small
enough to broadcast (the reference's habitat map is ~1e5 polygons — fits in
a broadcast easily); the POINT side is the 100 TB side and is only ever
streamed through mapInPandas, never shuffled.
"""

from __future__ import annotations

import math

import numpy as np

Polygon = list[tuple[float, float]]  # closed implicitly (last->first edge)


def bbox(poly: Polygon) -> tuple[float, float, float, float]:
    xs, ys = zip(*poly)
    return min(xs), min(ys), max(xs), max(ys)


def points_in_polygon(
    x: np.ndarray, y: np.ndarray, poly: Polygon
) -> np.ndarray:
    """Ray-casting containment test, vectorized over the point arrays.
    Standard even-odd rule; boundary points are engine-defined (callers
    must not rely on exact-boundary semantics, same caveat as GEOS)."""
    inside = np.zeros(len(x), dtype=bool)
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        # Horizontal edges (y2 == y1) never satisfy the crossing predicate,
        # but the slope term would divide by zero — mask it out first.
        with np.errstate(divide="ignore", invalid="ignore"):
            crosses = ((y1 > y) != (y2 > y)) & (
                x < (x2 - x1) * (y - y1) / (y2 - y1) + x1
            )
        inside ^= crosses
    return inside


def circle_left_area(x: np.ndarray, r: float) -> np.ndarray:
    """Area of {X <= x} within a radius-r circle centred at 0 (closed form:
    pi*r^2 minus the circular segment right of the chord)."""
    xc = np.clip(x / r, -1.0, 1.0)
    seg = r * r * np.arccos(xc) - r * xc * np.sqrt(
        np.maximum(r * r * (1 - xc * xc), 0.0)
    )
    return math.pi * r * r - seg


def circle_strip_area(
    x0: np.ndarray, x1: np.ndarray, r: float
) -> np.ndarray:
    """Area of the vertical strip [x0, x1] within a radius-r circle at the
    origin — the reference's segment-polygon ∩ 9 m buffer kernel
    (calc_plot_segment_area.Rmd:59-75) for band-shaped segments."""
    return circle_left_area(x1, r) - circle_left_area(x0, r)


def circle_polygon_area(
    X: np.ndarray,
    Y: np.ndarray,
    cx: np.ndarray,
    cy: np.ndarray,
    r: float,
) -> np.ndarray:
    """EXACT area of (arbitrary simple polygon) ∩ (radius-r circle at
    (cx, cy)) — the general form of the reference's segment ∩ plot-buffer
    kernel (calc_plot_segment_area.Rmd:59-75, sf::st_intersection + st_area).

    ``X``/``Y`` are (n_rows, m) padded vertex matrices (closed rings,
    padding repeats the last vertex; see wkt.shell_vertex_arrays); one
    circle per row. Vectorized over ROWS with a python loop over the edge
    index only — same shape as points_in_polygon.

    Math (Green's theorem on the clipped boundary): each directed edge
    P1->P2, in circle-centred coordinates, is split at its circle
    crossings tA <= tB (ts of the line-circle quadratic clipped to [0,1];
    no real roots => tA = tB = 0). The inside piece Pa->Pb contributes the
    triangle term cross(Pa, Pb)/2; the outside pieces P1->Pa and Pb->P2
    contribute circular-sector terms r^2*atan2(cross, dot)/2 (the clipped
    region's boundary follows the ARC there, and sectors telescope across
    edges to exactly the arcs between consecutive crossings). Every branch
    of the case analysis collapses into those three terms, so the SAME
    closed form is evaluable in SQL — which is how the DuckDB oracle
    verifies this kernel differentially.

    Sign conventions make the sum orientation-signed; callers get abs().
    Padded zero-length edges contribute exactly 0."""
    x = X - cx[:, None]
    y = Y - cy[:, None]
    n_rows, m = x.shape
    total = np.zeros(n_rows)
    r2 = r * r
    for i in range(m - 1):
        x1, y1 = x[:, i], y[:, i]
        x2, y2 = x[:, i + 1], y[:, i + 1]
        dx, dy = x2 - x1, y2 - y1
        a = dx * dx + dy * dy
        b = 2.0 * (x1 * dx + y1 * dy)
        c = x1 * x1 + y1 * y1 - r2
        disc = b * b - 4.0 * a * c
        sq = np.sqrt(np.maximum(disc, 0.0))
        with np.errstate(divide="ignore", invalid="ignore"):
            tA = np.clip((-b - sq) / (2.0 * a), 0.0, 1.0)
            tB = np.clip((-b + sq) / (2.0 * a), 0.0, 1.0)
        degen = a <= 0.0
        tA = np.where(degen, 0.0, tA)
        tB = np.where(degen, 0.0, tB)
        xa, ya = x1 + tA * dx, y1 + tA * dy
        xb, yb = x1 + tB * dx, y1 + tB * dy
        tri = 0.5 * (xa * yb - xb * ya)
        sec1 = 0.5 * r2 * np.arctan2(x1 * ya - xa * y1, x1 * xa + y1 * ya)
        sec2 = 0.5 * r2 * np.arctan2(xb * y2 - x2 * yb, xb * x2 + yb * y2)
        total += np.where(degen, 0.0, tri + sec1 + sec2)
    return np.abs(total)
