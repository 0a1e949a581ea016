"""WKT ingestion — parse POLYGON / MULTIPOLYGON / POINT text columns.

The reference loads spatial layers with sf::st_read (shapefile/GPKG,
process_external_data.Rmd:34; calc_plot_segment_area.Rmd:50-52). Binary
shapefile parsing needs GDAL, which this engine deliberately avoids; the
interchange path is WKT text columns (every GIS tool exports them, and
parquet/CSV carries them), parsed here with no external geometry library.

Parsing is per-row string work and lives inside Arrow-batched mapInPandas
kernels — the geometry MATH stays vectorized (see geometry.py); only the
text -> coordinate-array step is row-wise, which is unavoidable for a
variable-length text format and is O(len(text)) per row.
"""

from __future__ import annotations

import re

import numpy as np

# rings -> list of (N,2) float arrays; polygon -> list of rings
# (ring 0 = shell, rest = holes); multipolygon -> list of polygons
Ring = np.ndarray
PolygonGeom = list[Ring]

_NUM = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"
_PAIR_RE = re.compile(rf"({_NUM})\s+({_NUM})")
_RING_RE = re.compile(r"\(([^()]+)\)")


def _parse_ring(text: str) -> Ring:
    pts = _PAIR_RE.findall(text)
    if len(pts) < 4:
        raise ValueError(f"ring needs >=4 points (closed), got {len(pts)}")
    arr = np.array(pts, dtype=float)
    if not np.allclose(arr[0], arr[-1]):
        raise ValueError("WKT ring is not closed (first point != last)")
    return arr


def parse_wkt_polygon(wkt: str) -> list[PolygonGeom]:
    """Parse one WKT string into a list of polygons (each a list of rings,
    shell first). POLYGON -> one element; MULTIPOLYGON -> many. Raises
    ValueError on anything else — a malformed spatial layer should fail
    loudly at ingestion, not produce silent empty geometry."""
    s = wkt.strip()
    head = s.split("(", 1)[0].strip().upper()
    if head == "POLYGON":
        rings = [_parse_ring(r.group(1)) for r in _RING_RE.finditer(s)]
        if not rings:
            # same fail-loudly contract as the empty-MULTIPOLYGON raise:
            # [[]] would defer the failure to an IndexError in wkt_area
            raise ValueError(f"empty POLYGON: {wkt[:80]}")
        return [rings]
    if head == "MULTIPOLYGON":
        # split polygons on ((...)...(...)) groups: find top-level groups by
        # scanning depth; rings themselves stay innermost parens
        body = s[s.index("(") + 1 : s.rindex(")")]
        polys: list[PolygonGeom] = []
        depth, start = 0, None
        for i, ch in enumerate(body):
            if ch == "(":
                if depth == 0:
                    start = i
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0 and start is not None:
                    chunk = body[start : i + 1]
                    polys.append(
                        [_parse_ring(r.group(1)) for r in _RING_RE.finditer(chunk)]
                    )
        if not polys:
            raise ValueError(f"empty MULTIPOLYGON: {wkt[:80]}")
        return polys
    raise ValueError(f"unsupported WKT type: {head!r}")


def parse_wkt_point(wkt: str) -> tuple[float, float]:
    s = wkt.strip()
    if not s.upper().startswith("POINT"):
        raise ValueError(f"not a WKT POINT: {wkt[:80]}")
    m = _PAIR_RE.search(s)
    if m is None:
        raise ValueError(f"no coordinates in POINT: {wkt[:80]}")
    return float(m.group(1)), float(m.group(2))


def ring_signed_area(ring: Ring) -> float:
    """Shoelace signed area (CCW positive)."""
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1]))


def wkt_area(wkt: str) -> float:
    """Area of a POLYGON/MULTIPOLYGON with holes: |shell| - sum(|holes|)
    per polygon, summed — matches sf::st_area on planar coordinates."""
    total = 0.0
    for rings in parse_wkt_polygon(wkt):
        total += abs(ring_signed_area(rings[0]))
        for hole in rings[1:]:
            total -= abs(ring_signed_area(hole))
    return total


def shell_vertex_arrays(
    wkts: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Batch the SHELL rings of N single-polygon WKTs into padded (N, M)
    coordinate matrices for the vectorized kernels in geometry.py.

    Padding repeats the closing vertex — zero-length edges contribute
    nothing to containment or area sums. Returns (X, Y, n_vertices)."""
    rings = [parse_wkt_polygon(w)[0][0] for w in wkts]
    n = np.array([len(r) for r in rings], dtype=np.int64)
    m = int(n.max()) if len(rings) else 0
    X = np.zeros((len(rings), m), dtype=float)
    Y = np.zeros((len(rings), m), dtype=float)
    for i, r in enumerate(rings):
        X[i, : len(r)] = r[:, 0]
        Y[i, : len(r)] = r[:, 1]
        X[i, len(r) :] = r[-1, 0]
        Y[i, len(r) :] = r[-1, 1]
    return X, Y, n


def ring_vertex_arrays(
    wkts: list[str],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Batch EVERY ring of N POLYGON/MULTIPOLYGON WKTs into padded
    (R, M) coordinate matrices plus, per ring, the source row index and
    a +1/-1 sign (+1 shells, -1 holes) — the flattening that lets one
    vectorized circle∩ring kernel pass compute exact areas for
    geometries with holes and multiple parts: for valid geometry
    (holes inside shells, disjoint parts)
    area(circle ∩ polygon) = Σ shells - Σ holes.
    Returns (X, Y, row_idx, sign)."""
    flat: list[Ring] = []
    row_idx: list[int] = []
    sign: list[float] = []
    for i, w in enumerate(wkts):
        for rings in parse_wkt_polygon(w):
            for j, r in enumerate(rings):
                flat.append(r)
                row_idx.append(i)
                sign.append(1.0 if j == 0 else -1.0)
    m = max((len(r) for r in flat), default=0)
    X = np.zeros((len(flat), m), dtype=float)
    Y = np.zeros((len(flat), m), dtype=float)
    for i, r in enumerate(flat):
        X[i, : len(r)] = r[:, 0]
        Y[i, : len(r)] = r[:, 1]
        X[i, len(r) :] = r[-1, 0]
        Y[i, len(r) :] = r[-1, 1]
    return (
        X,
        Y,
        np.array(row_idx, dtype=np.int64),
        np.array(sign, dtype=float),
    )
