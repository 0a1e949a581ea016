"""S7 — ESRI shapefile ingestion (sf::st_read parity for .shp layers).

The reference loads spatial layers with ``st_read`` from ESRI shapefile
directories (process_external_data.Rmd:34, calc_plot_segment_area.Rmd:50-52,
data_heide_groot_schietveld.Rmd:32). There is no Spark-native shapefile
source, so this module implements the (public, fixed) ESRI format directly
and converts features to WKT text — the engine's spatial interchange column
(``spatial/wkt.py``, ``parse_wkt_layer``).

Format essentials (ESRI Shapefile Technical Description, 1998):
- ``.shp``: 100-byte header (big-endian file code 9994 + file length;
  little-endian version 1000 + shape type), then records of
  [8-byte big-endian (record number, content length in 16-bit words)] +
  little-endian content: shape type, then per type:
  Point (1): x, y doubles. Polygon (5) / PolyLine (3): bbox (4 doubles),
  numParts, numPoints, parts offsets, points (x, y doubles).
- ``.shx``: same 100-byte header, then one (offset, content length) pair of
  big-endian int32 *in 16-bit words* per record — the record index.

Scale design: .shp records are variable-length, so a naive reader is
driver-serial. The ``.shx`` index is 8 bytes per record — read THAT on the
driver, split the record list into ranges, and let executors seek+parse
their ranges of the .shp in parallel (``mapInPandas`` over an offsets
DataFrame; requires the file on shared storage, which is how cluster
deployments ship reference layers). Small layers take the same path with
one range."""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_SHAPE_NULL = 0
_SHAPE_POINT = 1
_SHAPE_POLYLINE = 3
_SHAPE_POLYGON = 5


def read_shx_offsets(shx_path: str) -> list[tuple[int, int]]:
    """Record (byte offset, byte length) pairs from the .shx index."""
    out: list[tuple[int, int]] = []
    with open(shx_path, "rb") as fh:
        head = fh.read(100)
        if len(head) < 100 or struct.unpack(">i", head[:4])[0] != 9994:
            raise ValueError(f"not a shapefile index: {shx_path}")
        while True:
            rec = fh.read(8)
            if len(rec) < 8:
                break
            off_w, len_w = struct.unpack(">ii", rec)
            out.append((off_w * 2, len_w * 2))
    return out


def _parse_record(buf: bytes) -> str | None:
    """One .shp record content -> WKT (None for null shapes)."""
    (stype,) = struct.unpack_from("<i", buf, 0)
    if stype == _SHAPE_NULL:
        return None
    if stype == _SHAPE_POINT:
        x, y = struct.unpack_from("<2d", buf, 4)
        return f"POINT ({x:.10g} {y:.10g})"
    if stype in (_SHAPE_POLYLINE, _SHAPE_POLYGON):
        n_parts, n_points = struct.unpack_from("<2i", buf, 36)
        parts = list(struct.unpack_from(f"<{n_parts}i", buf, 44))
        pts_off = 44 + 4 * n_parts
        xy = struct.unpack_from(f"<{2 * n_points}d", buf, pts_off)
        bounds = parts + [n_points]
        coords = [
            [(xy[2 * i], xy[2 * i + 1]) for i in range(a, b)]
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        rings = [
            "(" + ", ".join(f"{x:.10g} {y:.10g}" for x, y in ring) + ")"
            for ring in coords
        ]
        if stype == _SHAPE_POLYLINE:
            if len(rings) == 1:
                return f"LINESTRING {rings[0]}"
            return "MULTILINESTRING (" + ", ".join(rings) + ")"
        return _polygon_wkt(coords, rings)
    raise ValueError(f"unsupported shape type {stype}")


def _polygon_wkt(coords: list, rings: list[str]) -> str:
    """ESRI polygon record -> WKT, grouping rings by orientation.

    An ESRI record may hold SEVERAL outer rings (CW, negative shoelace
    signed area) each with holes (CCW); flattening them into one WKT
    POLYGON would subtract the later outers' areas as if they were holes.
    Each CW ring starts a polygon; each CCW ring attaches to the outer
    whose interior contains its first vertex (fallback: the preceding
    outer, the common writer ordering). One outer -> POLYGON, several ->
    MULTIPOLYGON. Records that carry no CW ring at all (orientation-less
    writers) keep the legacy single-POLYGON reading."""
    import numpy as np

    from n2khab_mhq_data_spark.spatial.wkt import ring_signed_area

    outer_idx = [
        i
        for i, c in enumerate(coords)
        if ring_signed_area(np.asarray(c, dtype=float)) < 0
    ]
    if len(outer_idx) <= 1:
        return "POLYGON (" + ", ".join(rings) + ")"

    def contains(ring: list, pt: tuple) -> bool:
        x, y = pt
        inside = False
        for i in range(len(ring)):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % len(ring)]
            if (y1 > y) != (y2 > y):
                xin = x1 + (y - y1) / (y2 - y1) * (x2 - x1)
                if x < xin:
                    inside = not inside
        return inside

    groups: dict[int, list[str]] = {i: [rings[i]] for i in outer_idx}
    areas = {
        j: abs(ring_signed_area(np.asarray(coords[j], dtype=float)))
        for j in outer_idx
    }
    for i, c in enumerate(coords):
        if i in groups:
            continue
        # the INNERMOST containing outer hosts the hole (smallest area
        # among containers — in a lake-island-pond nesting the hole
        # belongs to the island, not the enclosing outer, and record
        # order must not decide); fallback: the preceding outer, the
        # common writer ordering
        containing = [j for j in outer_idx if contains(coords[j], c[0])]
        if containing:
            host = min(containing, key=lambda j: areas[j])
        else:
            host = max(
                (j for j in outer_idx if j < i), default=outer_idx[0]
            )
        groups[host].append(rings[i])
    polys = ["(" + ", ".join(g) + ")" for _, g in sorted(groups.items())]
    return "MULTIPOLYGON (" + ", ".join(polys) + ")"


def read_shapefile(
    spark: SparkSession, shp_path: str, partitions: int | None = None
) -> DataFrame:
    """Distributed .shp read: the tiny .shx index is read on the driver and
    split into record ranges; executors seek+parse their ranges in parallel
    and emit (feature_id, wkt). Compose with ``parse_wkt_layer`` /
    ``point_in_polygon_join`` / ``wkt_circle_intersection_areas`` for the
    st_read -> st_join / st_intersection pipelines."""
    shx_path = os.path.splitext(shp_path)[0] + ".shx"
    offsets = read_shx_offsets(shx_path)
    if not offsets:
        # a zero-record shapefile is legal (empty layer): return the
        # typed empty frame — pandas-frame schema inference would crash
        # on the all-object empty columns
        return spark.createDataFrame([], "feature_id long, wkt string")
    n_part = partitions or min(max(len(offsets) // 1024, 1), 64)
    ranges = [
        (i, off, ln)
        for i, (off, ln) in enumerate(offsets)
    ]
    rdf = spark.createDataFrame(
        pd.DataFrame(ranges, columns=["feature_id", "off", "len"])
    ).repartition(n_part)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        with open(shp_path, "rb") as fh:
            for pdf in batches:
                fids, wkts = [], []
                for fid, off, ln in zip(
                    pdf["feature_id"], pdf["off"], pdf["len"]
                ):
                    fh.seek(int(off) + 8)  # skip record header
                    wkt = _parse_record(fh.read(int(ln)))
                    if wkt is not None:
                        fids.append(int(fid))
                        wkts.append(wkt)
                yield pd.DataFrame({"feature_id": fids, "wkt": wkts})

    return rdf.mapInPandas(op, "feature_id long, wkt string")


# --- test/fixture support: write a minimal shapefile ---------------------


def write_shapefile(
    path: str, shapes: list[tuple[int, list[list[tuple[float, float]]]]]
) -> None:
    """Minimal .shp/.shx writer for fixtures and round-trip tests
    (``shapes``: [(shape_type, rings/points)] — Point takes one 1-point
    ring). Layout per the public spec; content lengths in 16-bit words."""
    records = []
    for stype, rings in shapes:
        if stype == _SHAPE_POINT:
            (x, y) = rings[0][0]
            content = struct.pack("<i2d", stype, x, y)
        else:
            pts = [p for r in rings for p in r]
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            parts = []
            acc = 0
            for r in rings:
                parts.append(acc)
                acc += len(r)
            content = struct.pack(
                "<i4d2i",
                stype,
                min(xs), min(ys), max(xs), max(ys),
                len(rings), len(pts),
            )
            content += struct.pack(f"<{len(parts)}i", *parts)
            content += struct.pack(
                f"<{2 * len(pts)}d", *[c for p in pts for c in p]
            )
        records.append(content)

    def header(total_words: int, stype: int) -> bytes:
        return (
            struct.pack(">i5i i", 9994, 0, 0, 0, 0, 0, total_words)
            + struct.pack("<2i", 1000, stype)
            + struct.pack("<8d", 0, 0, 0, 0, 0, 0, 0, 0)
        )

    stype0 = shapes[0][0] if shapes else _SHAPE_NULL
    shp_body = b""
    shx_body = b""
    off = 100
    for i, content in enumerate(records):
        ln_w = len(content) // 2
        shp_body += struct.pack(">2i", i + 1, ln_w) + content
        shx_body += struct.pack(">2i", off // 2, ln_w)
        off += 8 + len(content)
    with open(path, "wb") as fh:
        fh.write(header((100 + len(shp_body)) // 2, stype0))
        fh.write(shp_body)
    with open(os.path.splitext(path)[0] + ".shx", "wb") as fh:
        fh.write(header((100 + len(shx_body)) // 2, stype0))
        fh.write(shx_body)
