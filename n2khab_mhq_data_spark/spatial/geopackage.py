"""S7 — GeoPackage ingestion (sf::st_read parity for .gpkg layers).

The reference reads one spatial layer from a GeoPackage
(data_heide_groot_schietveld.Rmd:32). GeoPackage is an SQLite container
(OGC 12-128r17): feature tables are listed in ``gpkg_contents``
(data_type='features'), the geometry column in ``gpkg_geometry_columns``,
and each geometry value is a GPB blob — an 8-byte header (magic 'GP',
version, flags byte whose bits 1-3 select the envelope size, little/big
endian bit 0) + optional envelope + standard OGC WKB.

Two paths share the GPB/WKB decoder:

- ``read_geopackage`` — driver-side, for the reference's dimension-sized
  layers (a habitat or military-domain boundary,
  data_heide_groot_schietveld.Rmd:32): stdlib ``sqlite3`` random access,
  no extra dependency.
- ``read_geopackage_distributed`` — the big-layer scale path: the driver
  touches only the container CATALOG (layer list, geometry column,
  declared schema, rowid range); executors each open the SQLite file and
  range-scan one rowid window through the b-tree (``rowid BETWEEN`` is an
  index range scan, so tasks read disjoint pages), decoding GPB->WKT
  inside the task — the same ranged-read shape as
  ``spatial/shapefile.py``. Requires the .gpkg to be reachable from every
  executor (shared FS / distributed cache), the shapefile path's
  contract.

Attributes come along as typed columns; geometry lands as the engine's
WKT interchange column, composing with ``parse_wkt_layer`` /
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
    # EWKB (PostGIS-style) Z/M/SRID flag bits change the per-point
    # byte layout — silently masking them would misalign the coordinate
    # parse and emit garbage WKT; fail fast instead (ISO Z/M types
    # 1001+ already fall through to the unsupported-type raise below)
    if gtype & 0xE0000000:
        raise ValueError(
            f"EWKB Z/M/SRID flags not supported (type 0x{gtype:08x})"
        )
    gtype &= 0xFFFF
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


def _resolve_layer(path: str, layer: str | None) -> str:
    layers = list_layers(path)
    if layer is None:
        if len(layers) != 1:
            raise ValueError(f"specify layer; gpkg has {layers}")
        return layers[0]
    if layer not in layers:
        raise ValueError(f"no feature layer {layer!r}; gpkg has {layers}")
    return layer


def _decl_to_spark(decl: str | None) -> str:
    d = (decl or "").upper()
    if "INT" in d:
        return "bigint"
    if any(t in d for t in ("REAL", "FLOA", "DOUB")):
        return "double"
    if "BLOB" in d:
        return "binary"
    return "string"


def _attr_schema(info: list, geom_col: str) -> "StructType":
    """Non-geometry attribute schema from sqlite table_info rows plus
    the decoded ``wkt`` column — the ONE decl->StructField mapping both
    readers share (was two hand-kept copies)."""
    from pyspark.sql.types import (
        BinaryType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    spark_t = {
        "bigint": LongType(),
        "double": DoubleType(),
        "binary": BinaryType(),
        "string": StringType(),
    }
    return StructType(
        [
            StructField(r[1], spark_t[_decl_to_spark(r[2])], True)
            for r in info
            if r[1] != geom_col
        ]
        + [StructField("wkt", StringType(), True)]
    )


def read_geopackage_distributed(
    spark: SparkSession,
    path: str,
    layer: str | None = None,
    rows_per_task: int = 4096,
) -> DataFrame:
    """Distributed GPKG feature-layer read (see module docstring): the
    driver reads catalog metadata only; each task range-scans one rowid
    window and decodes GPB->WKT. Output columns and values match
    ``read_geopackage`` (all attribute columns, typed from the SQLite
    declarations, plus the ``wkt`` interchange column)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    layer = _resolve_layer(path, layer)
    with sqlite3.connect(path) as con:
        (geom_col,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns"
            " WHERE table_name = ?",
            (layer,),
        ).fetchone()
        info = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        # window boundaries by ROW COUNT, not rowid arithmetic: rowids
        # may be arbitrarily sparse (e.g. externally assigned feature
        # ids), and tiling min..max with fixed-width windows then
        # explodes into mostly-empty ranges — measured 220k windows /
        # 8.5 s wall for a 150k-feature layer with replica-shifted ids
        # vs ~300 balanced windows here. One covering-index scan
        # (rowid only, no payload — ~10^7 rows/s) fetches every
        # rows_per_task-th rowid as a boundary; each window then holds
        # exactly rows_per_task features regardless of id layout.
        bounds: list[int] = []
        last = None
        cur = con.execute(f'SELECT rowid FROM "{layer}" ORDER BY rowid')
        for i, (rid,) in enumerate(cur):
            if i % rows_per_task == 0:
                bounds.append(int(rid))
            last = int(rid)
    attrs = [(r[1], _decl_to_spark(r[2])) for r in info if r[1] != geom_col]
    schema = _attr_schema(info, geom_col)
    if last is None:  # empty layer
        return spark.createDataFrame([], schema)
    ranges = [
        (bounds[j], bounds[j + 1] - 1 if j + 1 < len(bounds) else last)
        for j in range(len(bounds))
    ]
    # join geom INTO the list: the old '+ ", geom"' spelling emitted a
    # leading-comma SQL syntax error for a geometry-only layer (legal
    # GPKG: rowid + geom, zero attribute columns)
    sel = ", ".join([f'"{n}"' for n, _ in attrs] + [f'"{geom_col}"'])
    names = [n for n, _ in attrs]

    def op(batches):
        import pandas as pd

        con = sqlite3.connect(path)
        try:
            for pdf in batches:
                for rlo, rhi in zip(pdf["lo"], pdf["hi"]):
                    rows = con.execute(
                        f'SELECT {sel} FROM "{layer}"'
                        " WHERE rowid BETWEEN ? AND ?",
                        (int(rlo), int(rhi)),
                    ).fetchall()
                    if not rows:
                        continue
                    data = {
                        n: [r[i] for r in rows]
                        for i, n in enumerate(names)
                    }
                    data["wkt"] = [gpb_to_wkt(r[-1]) for r in rows]
                    yield pd.DataFrame(data, columns=names + ["wkt"])
        finally:
            con.close()

    rng = spark.createDataFrame(ranges, "lo long, hi long").repartition(
        max(1, min(len(ranges), spark.sparkContext.defaultParallelism)),
        F.col("lo"),
    )
    return rng.mapInPandas(op, schema)


def read_geopackage(
    spark: SparkSession, path: str, layer: str | None = None
) -> DataFrame:
    """st_read(dsn, layer): load one feature layer (default: the only
    one) with its attributes; geometry decoded GPB->WKB->WKT into a
    ``wkt`` column."""
    from pyspark.sql.types import (
        BinaryType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    layer = _resolve_layer(path, layer)
    with sqlite3.connect(path) as con:
        (geom_col,) = con.execute(
            "SELECT column_name FROM gpkg_geometry_columns"
            " WHERE table_name = ?",
            (layer,),
        ).fetchone()
        info = con.execute(f'PRAGMA table_info("{layer}")').fetchall()
        cur = con.execute(f'SELECT * FROM "{layer}"')
        names = [d[0] for d in cur.description]
        gi = names.index(geom_col)
        data = []
        for row in cur.fetchall():
            attrs = [v for i, v in enumerate(row) if i != gi]
            data.append(tuple(attrs + [gpb_to_wkt(row[gi])]))
    # type from the SQLite column DECLARATIONS, not from the collected
    # rows: schema inference crashes on an empty layer (legal, e.g. a
    # filtered export) and on any all-NULL attribute column — shared
    # mapping with read_geopackage_distributed (_attr_schema)
    return spark.createDataFrame(data, _attr_schema(info, geom_col))


def _wkt_to_wkb(wkt: str) -> bytes:
    """WKT POLYGON / MULTIPOLYGON -> little-endian OGC WKB (inverse of
    ``wkb_to_wkt`` for the polygonal subset the engine emits)."""
    from n2khab_mhq_data_spark.spatial.wkt import parse_wkt_polygon

    polys = parse_wkt_polygon(wkt)

    def poly_body(rings) -> bytes:
        out = [struct.pack("<BII", 1, 3, len(rings))]
        for ring in rings:
            out.append(struct.pack("<I", len(ring)))
            for x, y in ring:
                out.append(struct.pack("<2d", x, y))
        return b"".join(out)

    if wkt.lstrip().upper().startswith("MULTIPOLYGON"):
        return (
            struct.pack("<BII", 1, 6, len(polys))
            + b"".join(poly_body(r) for r in polys)
        )
    assert len(polys) == 1
    return poly_body(polys[0])


def wkt_to_gpb(wkt: str | None, srs_id: int = 0) -> bytes | None:
    """WKT -> GeoPackage binary geometry (GP header, no envelope,
    little-endian) — the write-side counterpart of ``gpb_to_wkt``."""
    if wkt is None:
        return None
    return b"GP" + bytes([0, 1]) + struct.pack("<i", srs_id) + _wkt_to_wkb(wkt)


def write_geopackage_layer(
    path: str,
    layer: str,
    rows: list[tuple],
    attr_schema: list[tuple[str, str]],
    geom_col: str = "geom",
) -> None:
    """Create/replace one feature layer in a GeoPackage container
    (driver-side, dimension-sized — the write-side S7 surface; the
    read-back scale path is ``read_geopackage_distributed``). Each row
    is ``(*attrs, wkt)``; ``attr_schema`` is [(name, sqlite_decl)] with
    the FIRST attribute used as the INTEGER PRIMARY KEY (= rowid, which
    the distributed reader range-scans)."""
    with sqlite3.connect(path) as con:
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_contents ("
            " table_name TEXT PRIMARY KEY, data_type TEXT,"
            " identifier TEXT, srs_id INTEGER)"
        )
        con.execute(
            "CREATE TABLE IF NOT EXISTS gpkg_geometry_columns ("
            " table_name TEXT PRIMARY KEY, column_name TEXT,"
            " geometry_type_name TEXT, srs_id INTEGER, z TINYINT,"
            " m TINYINT)"
        )
        con.execute(f'DROP TABLE IF EXISTS "{layer}"')
        pk, rest = attr_schema[0], attr_schema[1:]
        cols = ", ".join(
            [f'"{pk[0]}" INTEGER PRIMARY KEY']
            + [f'"{n}" {d}' for n, d in rest]
            + [f'"{geom_col}" BLOB']
        )
        con.execute(f'CREATE TABLE "{layer}" ({cols})')
        marks = ", ".join("?" * (len(attr_schema) + 1))
        con.executemany(
            f'INSERT INTO "{layer}" VALUES ({marks})',
            [(*r[:-1], wkt_to_gpb(r[-1])) for r in rows],
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents VALUES (?, ?, ?, ?)",
            (layer, "features", layer, 0),
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns"
            " VALUES (?, ?, ?, ?, ?, ?)",
            (layer, geom_col, "GEOMETRY", 0, 0, 0),
        )
        con.commit()
