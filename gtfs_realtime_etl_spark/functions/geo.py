"""Geospatial column functions.

Replicates the reference's geo surface (cf. /root/reference/etl/runtime/
handler.py:118-152 for geohash/WKB/bbox on the write path and
/root/reference/notebooks/schedule_deviation.ipynb:596-598 for the
``ST_DWithin`` join predicate) as Spark Column expressions.

Design notes for scale:

- ``geohash_encode`` is PURE Column bit arithmetic — ~70 JVM expressions
  that stay inside whole-stage codegen.  No Python boundary on the hot
  enrichment path.
- ``ST_DWithin`` on unprojected CRS84 coordinates is planar Euclidean
  *degree* distance in DuckDB-spatial; we reproduce exactly that (not
  haversine) for parity.
- WKB construction needs IEEE-754 little-endian byte encoding which the
  Spark expression language cannot express; it is an Arrow-batched
  pandas_udf used only on the (cold) write/export path.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    StructField,
    StructType,
)

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lon: Column, precision: int = 7) -> Column:
    """Geohash of (lat, lon) at the given precision, as native Column ops.

    Classic geohash: quantize lon/lat into ``ceil(5p/2)`` / ``floor(5p/2)``
    bit integers, bit-interleave (lon first), emit 5-bit groups as base32.
    Matches ``pygeohash.encode`` (reference write path, handler.py:118-127).
    """
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2

    lon_max = (1 << lon_bits) - 1
    lat_max = (1 << lat_bits) - 1
    lon_int = F.least(
        F.floor((lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << lon_bits))),
        F.lit(lon_max),
    )
    lat_int = F.least(
        F.floor((lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(1 << lat_bits))),
        F.lit(lat_max),
    )

    # Interleave: combined bit (nbits-1-k) is lon bit for even k, lat for odd.
    combined = F.lit(0).cast("long")
    for k in range(nbits):
        out_shift = nbits - 1 - k
        if k % 2 == 0:  # longitude bit
            src, src_shift = lon_int, lon_bits - 1 - (k // 2)
        else:  # latitude bit
            src, src_shift = lat_int, lat_bits - 1 - (k // 2)
        bit = F.shiftright(src, src_shift).bitwiseAND(F.lit(1))
        combined = combined + F.shiftleft(bit, out_shift)

    chars = [
        F.substring(
            F.lit(_BASE32),
            F.shiftright(combined, 5 * (precision - 1 - i)).bitwiseAND(F.lit(31)) + 1,
            1,
        )
        for i in range(precision)
    ]
    return F.concat(*chars)


def euclid_degree_dist(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Planar Euclidean distance in degrees — DuckDB-spatial ``ST_Distance``
    semantics on unprojected CRS84 points (schedule_deviation.ipynb:598)."""
    return F.sqrt(F.pow(lon1 - lon2, F.lit(2)) + F.pow(lat1 - lat2, F.lit(2)))


def dwithin(lon1: Column, lat1: Column, lon2: Column, lat2: Column, radius: float) -> Column:
    """``ST_DWithin(p1, p2, radius)`` — planar degree distance ≤ radius."""
    return euclid_degree_dist(lon1, lat1, lon2, lat2) <= F.lit(radius)


#: WGS84 spherical radius used by EPSG:3857 (Web Mercator), meters.
WEB_MERCATOR_R = 6378137.0


def to_web_mercator(lon: Column, lat: Column) -> Column:
    """CRS84 lon/lat degrees → EPSG:3857 (Web Mercator) meters, as a
    ``struct<x double, y double>`` of pure Column math — absorbs the
    reference notebook's client-side GeoPandas ``to_crs(3857)`` step
    (schedule_deviation.ipynb:701-705) into the engine, so the
    visualization handoff needs no pandas/pyproj at all.

    Standard spherical formulas (the exact EPSG:3857 definition —
    pyproj agrees to float precision):
    ``x = R·lon_rad``, ``y = R·ln(tan(π/4 + lat_rad/2))``.
    Valid for |lat| < 90; the poles map to ±infinity as in any
    Mercator implementation.
    """
    import math

    x = F.radians(lon) * F.lit(WEB_MERCATOR_R)
    y = F.log(F.tan(F.lit(math.pi / 4.0) + F.radians(lat) / F.lit(2.0))) * F.lit(
        WEB_MERCATOR_R
    )
    return F.struct(x.alias("x"), y.alias("y"))


def bbox_struct(lon: Column, lat: Column) -> Column:
    """Degenerate per-point bbox covering struct, as written by the
    reference's GeoParquet writer (handler.py:146-152)."""
    return F.struct(
        lon.alias("xmin"), lat.alias("ymin"), lon.alias("xmax"), lat.alias("ymax")
    )


@F.pandas_udf(BinaryType())
def _point_wkb_udf(lon: pd.Series, lat: pd.Series) -> pd.Series:
    # 21-byte little-endian WKB point: 0x01, uint32 type=1, float64 x, float64 y.
    pack = struct.Struct("<BIdd").pack
    out = [
        None if x is None or y is None or pd.isna(x) or pd.isna(y) else pack(1, 1, x, y)
        for x, y in zip(lon, lat)
    ]
    return pd.Series(out)


def point_wkb(lon: Column, lat: Column) -> Column:
    """WKB point (lon, lat) — byte-identical to the reference's geoarrow
    ``as_wkb`` output (handler.py:131-141).  pandas_udf: IEEE-754 byte
    packing is not expressible in the JVM expression language."""
    return _point_wkb_udf(lon, lat)


# StructType object, not a DDL string: string return types are parsed
# via the active SparkSession, which does not exist at import time.
_WKB_POINT_STRUCT = StructType(
    [StructField("lon", DoubleType()), StructField("lat", DoubleType())]
)


@F.pandas_udf(_WKB_POINT_STRUCT)
def _wkb_point_lonlat_udf(wkb: pd.Series) -> pd.DataFrame:
    # Inverse of _point_wkb_udf: parse a WKB point back to (lon, lat).
    # Accepts either byte order (byte 0: 1=little, 0=big) — the engine
    # writes little-endian, but external GeoParquet writers may not.
    # Geometry type must be Point (1); anything else decodes to null
    # rather than garbage coordinates.
    import struct as _struct

    lons: list[float | None] = []
    lats: list[float | None] = []
    for b in wkb:
        if b is None or len(b) != 21:
            lons.append(None)
            lats.append(None)
            continue
        endian = "<" if b[0] == 1 else ">"
        gtype, x, y = _struct.unpack(endian + "Idd", b[1:])
        if gtype != 1:
            lons.append(None)
            lats.append(None)
        else:
            lons.append(x)
            lats.append(y)
    return pd.DataFrame({"lon": lons, "lat": lats})


def wkb_point_lonlat(wkb: Column) -> Column:
    """WKB point → ``struct<lon double, lat double>`` — the read-side
    inverse of :func:`point_wkb`, for ingesting lakes written by the
    reference's GeoParquet writer, which DROPS the lat/lon columns and
    keeps only the geometry (etl/runtime/handler.py:131-142).  Arrow-
    batched pandas_udf for the same reason as the writer: IEEE-754 byte
    reinterpretation is not expressible as JVM Column ops."""
    return _wkb_point_lonlat_udf(wkb)


def hex_wkb(wkb: Column) -> Column:
    """Upper-case hex of a WKB column — DuckDB ``ST_AsHEXWKB`` parity
    (schedule_deviation.ipynb:571)."""
    return F.upper(F.hex(wkb))
