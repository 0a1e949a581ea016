"""S7 — GeoPackage ingestion (sf::st_read parity for .gpkg layers).

The reference reads one spatial layer from a GeoPackage
(data_heide_groot_schietveld.Rmd:32). GeoPackage is an SQLite container
(OGC 12-128r17): feature tables are listed in ``gpkg_contents``
(data_type='features'), the geometry column in ``gpkg_geometry_columns``,
and each geometry value is a GPB blob — an 8-byte header (magic 'GP',
version, flags byte whose bits 1-3 select the envelope size, little/big
endian bit 0) + optional envelope + standard OGC WKB.

Driver-side by design: the container needs random access through the
SQLite b-tree, which Python's stdlib ``sqlite3`` provides — no extra
dependency. Reference GPKG layers are dimension-sized (a habitat or
military-domain boundary layer); the distributed-file scale path for big
layers is the shapefile reader (``spatial/shapefile.py``) or WKT columns
in parquet. Attributes come along as typed columns; geometry lands as the
engine's WKT interchange column, composing with ``parse_wkt_layer`` /
``point_in_polygon_join`` / ``wkt_circle_intersection_areas``."""

from __future__ import annotations

import sqlite3
import struct

from pyspark.sql import DataFrame, SparkSession

_WKB_FMT = {1: "POINT", 2: "LINESTRING", 3: "POLYGON", 6: "MULTIPOLYGON"}

# flags bits 1-3: envelope contents -> envelope byte length
_ENVELOPE_BYTES = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}


def _rd(buf: bytes, off: int, fmt: str, little: bool):
    pref = "<" if little else ">"
    vals = struct.unpack_from(pref + fmt, buf, off)
    return vals, off + struct.calcsize(pref + fmt)


def _wkb_coords(buf: bytes, off: int, little: bool, n: int):
    (vals, off) = _rd(buf, off, f"{2 * n}d", little)
    pts = ", ".join(
        f"{vals[2 * i]:.10g} {vals[2 * i + 1]:.10g}" for i in range(n)
    )
    return pts, off


def _wkb_ring(buf: bytes, off: int, little: bool):
    ((n,), off) = _rd(buf, off, "I", little)
    pts, off = _wkb_coords(buf, off, little, n)
    return f"({pts})", off


def _wkb_geometry(buf: bytes, off: int):
    (little,) = struct.unpack_from("B", buf, off)
    little = bool(little)
    ((gtype,), off) = _rd(buf, off + 1, "I", little)
    gtype &= 0xFFFF  # strip any Z/M/SRID high bits
    if gtype == 1:  # Point
        ((x, y), off) = _rd(buf, off, "2d", little)
        return f"POINT ({x:.10g} {y:.10g})", off
    if gtype == 2:  # LineString
        ((n,), off) = _rd(buf, off, "I", little)
        pts, off = _wkb_coords(buf, off, little, n)
        return f"LINESTRING ({pts})", off
    if gtype == 3:  # Polygon
        ((nr,), off) = _rd(buf, off, "I", little)
        rings = []
        for _ in range(nr):
            r, off = _wkb_ring(buf, off, little)
            rings.append(r)
        return "POLYGON (" + ", ".join(rings) + ")", off
    if gtype == 6:  # MultiPolygon: nested full WKB geometries
        ((np_,), off) = _rd(buf, off, "I", little)
        polys = []
        for _ in range(np_):
            w, off = _wkb_geometry(buf, off)
            # inner POLYGON (...) -> (...)
            polys.append(w[len("POLYGON ") :])
        return "MULTIPOLYGON (" + ", ".join(polys) + ")", off
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkb_to_wkt(buf: bytes) -> str:
    """OGC WKB (Point/LineString/Polygon/MultiPolygon, 2D) -> WKT."""
    wkt, _ = _wkb_geometry(buf, 0)
    return wkt


def gpb_to_wkt(blob: bytes | None) -> str | None:
    """GeoPackage binary geometry -> WKT (None for SQL NULL or empty
    geometries).

    Per OGC 12-128 the flags byte is RRXYEEEB: bit 5 (X, 0b00100000) marks
    an ExtendedGeoPackageBinary payload (unsupported here — fail fast, the
    body is not plain WKB) and bit 4 (Y, 0b00010000) marks an empty
    geometry."""
    if blob is None:  # SQL NULL geometry rows are legal and common
        return None
    if len(blob) < 8 or blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    if flags & 0b00100000:
        raise ValueError("ExtendedGeoPackageBinary geometry unsupported")
    if flags & 0b00010000:  # empty-geometry flag
        return None
    env = _ENVELOPE_BYTES.get((flags >> 1) & 0b111)
    if env is None:
        raise ValueError(f"invalid GPB envelope indicator in flags {flags:#x}")
    return wkb_to_wkt(blob[8 + env :])


def list_layers(path: str) -> list[str]:
    with sqlite3.connect(path) as con:
        rows = con.execute(
            "SELECT table_name FROM gpkg_contents WHERE data_type='features'"
            " ORDER BY table_name"
        ).fetchall()
    return [r[0] for r in rows]


def read_geopackage(
    spark: SparkSession, path: str, layer: str | None = None
) -> DataFrame:
    """st_read(dsn, layer): load one feature layer (default: the only
    one) with its attributes; geometry decoded GPB->WKB->WKT into a
    ``wkt`` column."""
    layers = list_layers(path)
    if layer is None:
        if len(layers) != 1:
            raise ValueError(f"specify layer; gpkg has {layers}")
        layer = layers[0]
    elif layer not in layers:
        raise ValueError(f"no feature layer {layer!r}; gpkg has {layers}")
    with sqlite3.connect(path) as con:
        (geom_col,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns"
            " WHERE table_name = ?",
            (layer,),
        ).fetchone()
        cur = con.execute(f'SELECT * FROM "{layer}"')
        names = [d[0] for d in cur.description]
        gi = names.index(geom_col)
        out_names = [n for i, n in enumerate(names) if i != gi] + ["wkt"]
        data = []
        for row in cur.fetchall():
            attrs = [v for i, v in enumerate(row) if i != gi]
            data.append(tuple(attrs + [gpb_to_wkt(row[gi])]))
    return spark.createDataFrame(data, out_names)
