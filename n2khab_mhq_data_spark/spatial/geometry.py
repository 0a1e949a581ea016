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
