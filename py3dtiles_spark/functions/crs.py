"""WGS84 CRS conversion + rotation alignment — closed-form, no pyproj.

Re-expresses the reference's projection path (utils.py:9-12 convert_to_ecef,
convert.py:387-416 reprojection + EPSG:4978 alignment rotation) with the
standard WGS84 ellipsoid equations. pyproj is not installed in this
environment; geodetic (EPSG:4326/4979) -> geocentric ECEF (EPSG:4978) has an
exact closed form, which is also the only CRS pair the engine's web-page
payload needs (pages geocode to lon/lat). Projected-CRS inputs (e.g. Lambert
zones) would need full proj machinery and raise a clear error.

Validated against the reference's own gdaltransform goldens
(tests/test_convert.py:10-18) in tests/test_crs.py.

Three forms of the same math:
- numpy (driver / Arrow-kernel side)
- native Column expressions (JVM-side, whole-stage codegen — the 100 TB path)
- 4x4 matrix helpers for the tileset `transform` (convert.py:36-41)
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import Column, functions as F

WGS84_A = 6378137.0                       # semi-major axis (m)
WGS84_F = 1.0 / 298.257223563             # flattening
WGS84_E2 = WGS84_F * (2.0 - WGS84_F)      # first eccentricity squared


def geodetic_to_ecef(lon_deg, lat_deg, h):
    """numpy: WGS84 geodetic -> ECEF. Accepts scalars or arrays."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    h = np.asarray(h, dtype=np.float64)
    sin_lat = np.sin(lat)
    n = WGS84_A / np.sqrt(1.0 - WGS84_E2 * sin_lat * sin_lat)
    x = (n + h) * np.cos(lat) * np.cos(lon)
    y = (n + h) * np.cos(lat) * np.sin(lon)
    z = (n * (1.0 - WGS84_E2) + h) * sin_lat
    return x, y, z


def ecef_exprs(lon_col="x", lat_col="y", h_col="z") -> tuple[Column, Column, Column]:
    """Native Column expressions for the same conversion — zero Python in
    the hot path; Catalyst folds the constants and codegens the trig."""
    lon = F.radians(F.col(lon_col).cast("double"))
    lat = F.radians(F.col(lat_col).cast("double"))
    h = F.col(h_col).cast("double")
    sin_lat = F.sin(lat)
    n = WGS84_A / F.sqrt(1.0 - WGS84_E2 * sin_lat * sin_lat)
    return ((n + h) * F.cos(lat) * F.cos(lon),
            (n + h) * F.cos(lat) * F.sin(lon),
            (n * (1.0 - WGS84_E2) + h) * sin_lat)


def reproject_to_ecef(points, lon_col="x", lat_col="y", h_col="z"):
    """DataFrame helper: replace (lon, lat, h) columns with ECEF meters."""
    ex, ey, ez = ecef_exprs(lon_col, lat_col, h_col)
    return (points.withColumn("_ex", ex).withColumn("_ey", ey)
            .withColumn("_ez", ez)
            .drop(lon_col, lat_col, h_col)
            .withColumnRenamed("_ex", lon_col)
            .withColumnRenamed("_ey", lat_col)
            .withColumnRenamed("_ez", h_col))


# ---------------------------------------------------------------- matrices --
# Standard homogeneous-transform builders (textbook Rodrigues/affine forms;
# same operations the reference takes from the vendored Gohlke
# transformations.py — re-derived, not copied).

def translation_matrix(direction) -> np.ndarray:
    m = np.identity(4)
    m[:3, 3] = direction[:3]
    return m


def scale_matrix(factor: float) -> np.ndarray:
    m = np.identity(4) * factor
    m[3, 3] = 1.0
    return m


def rotation_matrix(angle: float, axis) -> np.ndarray:
    """4x4 rotation of `angle` radians about `axis` through the origin."""
    u = np.asarray(axis, dtype=np.float64)
    norm = np.linalg.norm(u)
    if norm == 0.0:
        return np.identity(4)
    u = u / norm
    c, s = math.cos(angle), math.sin(angle)
    ux, uy, uz = u
    r = np.array([
        [c + ux * ux * (1 - c), ux * uy * (1 - c) - uz * s, ux * uz * (1 - c) + uy * s],
        [uy * ux * (1 - c) + uz * s, c + uy * uy * (1 - c), uy * uz * (1 - c) - ux * s],
        [uz * ux * (1 - c) - uy * s, uz * uy * (1 - c) + ux * s, c + uz * uz * (1 - c)],
    ])
    m = np.identity(4)
    m[:3, :3] = r
    return m


def align_vector_matrix(v_from, v_to) -> np.ndarray:
    """4x4 rotation taking direction v_from to v_to (reference
    make_rotation_matrix, convert.py:89-95)."""
    a = np.asarray(v_from, dtype=np.float64)
    b = np.asarray(v_to, dtype=np.float64)
    a = a / np.linalg.norm(a)
    b = b / np.linalg.norm(b)
    cross = np.cross(a, b)
    dot = float(np.clip(np.dot(a, b), -1.0, 1.0))
    angle = math.atan2(np.linalg.norm(cross), dot)
    if np.linalg.norm(cross) == 0.0:
        # parallel or anti-parallel: pick any perpendicular axis for pi
        if dot > 0:
            return np.identity(4)
        perp = np.cross(a, [1.0, 0.0, 0.0])
        if np.linalg.norm(perp) == 0.0:
            perp = np.cross(a, [0.0, 1.0, 0.0])
        return rotation_matrix(math.pi, perp)
    return rotation_matrix(angle, cross)


def ecef_alignment_rotation(avg_min_ecef, x_axis_ecef) -> np.ndarray:
    """P3: the EPSG:4978 'nicely aligned local frame' rotation
    (convert.py:406-416): geocentric normal -> (0,0,1), then the bbox
    x-axis -> (1,0,0)."""
    r1 = align_vector_matrix(avg_min_ecef, np.array([0.0, 0.0, 1.0]))
    r2 = align_vector_matrix(x_axis_ecef, np.array([1.0, 0.0, 0.0]))
    return np.dot(r2, r1)


def tileset_transform(offset, scale: float,
                      rotation: np.ndarray | None = None) -> list[float]:
    """The root tile `transform` = T(offset) . S(1/scale) . R^-1
    (convert.py:36-41), column-major-flattened (transform.T.reshape(16))."""
    t = np.identity(4) if rotation is None else np.linalg.inv(rotation)
    t = np.dot(t, scale_matrix(1.0 / scale))
    t = np.dot(translation_matrix(offset), t)
    return t.T.reshape(16).tolist()
