"""WGS84 CRS conversion + rotation alignment — closed-form, no pyproj.

Re-expresses the reference's projection path (utils.py:9-12 convert_to_ecef,
convert.py:387-416 reprojection + EPSG:4978 alignment rotation) with the
standard WGS84 ellipsoid equations. pyproj is not installed in this
environment; geodetic (EPSG:4326/4979) -> geocentric ECEF (EPSG:4978) has an
exact closed form, which is also the only CRS pair the engine's web-page
payload needs (pages geocode to lon/lat). Projected inputs in the Lambert
conformal conic family (Lambert-93 EPSG:2154, CC zones EPSG:3942-3950 — the
reference's own conversion test drives srs_in=3949) are unprojected with the
closed-form EPSG 9802 inverse below; other projected CRS raise clearly.

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


# -------------------------------------------------- Lambert Conformal Conic --
# Generic LCC 2SP (EPSG method 9802) closed form — covers the reference's own
# conversion test (srs_in=3949, tests/test_convert.py:29-42, convert.py:387-
# 399) without proj machinery. Formulas are the published EPSG Guidance
# Note 7-2 / Snyder eq. 15-1..15-11 equations; validated in
# tests/test_crs_lcc.py against Snyder's Clarke-1866 worked example, the
# grid origins of the French RGF93 zones, roundtrip, and expr/numpy parity.

GRS80_A = 6378137.0
GRS80_F = 1.0 / 298.257222101
GRS80_E2 = GRS80_F * (2.0 - GRS80_F)


class LCCParams:
    """Lambert Conformal Conic 2SP projection constants (EPSG 9802)."""

    def __init__(self, lat0, lat1, lat2, lon0, x0, y0,
                 a=GRS80_A, e2=GRS80_E2):
        self.a, self.e2, self.e = a, e2, math.sqrt(e2)
        self.lat0, self.lon0 = math.radians(lat0), math.radians(lon0)
        self.x0, self.y0 = x0, y0
        p1, p2 = math.radians(lat1), math.radians(lat2)
        e = self.e

        def m(p):
            s = math.sin(p)
            return math.cos(p) / math.sqrt(1.0 - e2 * s * s)

        def t(p):
            s = math.sin(p)
            return (math.tan(math.pi / 4 - p / 2)
                    / ((1.0 - e * s) / (1.0 + e * s)) ** (e / 2))

        m1, m2 = m(p1), m(p2)
        t0, t1, t2 = t(self.lat0), t(p1), t(p2)
        self.n = (math.log(m1) - math.log(m2)) / (math.log(t1) - math.log(t2))
        self.F = m1 / (self.n * t1 ** self.n)
        self.r0 = a * self.F * t0 ** self.n


# French RGF93 zones on GRS80: Lambert-93 + the 9 "conic conformal" zones
# CC42..CC50 (EPSG:3942-3950 — the reference test's 3949 is CC49)
LCC_ZONES: dict[int, LCCParams] = {
    2154: LCCParams(46.5, 44.0, 49.0, 3.0, 700_000.0, 6_600_000.0),
    **{3942 + i: LCCParams(42.0 + i, 41.25 + i, 42.75 + i, 3.0,
                           1_700_000.0, (i + 1) * 1_000_000.0 + 200_000.0)
       for i in range(9)},
}

_LCC_LAT_ITERS = 8   # linear convergence factor ~e^2/2: 8 double-converges


def _chi_to_lat_coeffs(e2: float):
    """Series coefficients for the inverse conformal-latitude expansion
    (Snyder, Map Projections — A Working Manual, eq. 3-5):
    lat = chi + A sin2chi + B sin4chi + C sin6chi + D sin8chi.
    Truncation error O(e^10) ~ 1e-11 deg on GRS80 — below float32 point
    precision by 5 orders of magnitude."""
    return (e2 / 2 + 5 * e2 ** 2 / 24 + e2 ** 3 / 12 + 13 * e2 ** 4 / 360,
            7 * e2 ** 2 / 48 + 29 * e2 ** 3 / 240 + 811 * e2 ** 4 / 11520,
            7 * e2 ** 3 / 120 + 81 * e2 ** 4 / 1120,
            4279 * e2 ** 4 / 161280)


def lcc_forward(p: LCCParams, lon_deg, lat_deg):
    """numpy LCC 2SP forward: geodetic degrees -> projected (E, N) meters."""
    lon = np.radians(np.asarray(lon_deg, dtype=np.float64))
    lat = np.radians(np.asarray(lat_deg, dtype=np.float64))
    s = np.sin(lat)
    t = (np.tan(np.pi / 4 - lat / 2)
         / ((1.0 - p.e * s) / (1.0 + p.e * s)) ** (p.e / 2))
    r = p.a * p.F * t ** p.n
    th = p.n * (lon - p.lon0)
    return p.x0 + r * np.sin(th), p.y0 + p.r0 - r * np.cos(th)


def lcc_inverse(p: LCCParams, easting, northing):
    """numpy LCC 2SP inverse: projected meters -> geodetic degrees."""
    de = np.asarray(easting, dtype=np.float64) - p.x0
    dn = p.r0 - (np.asarray(northing, dtype=np.float64) - p.y0)
    sgn = 1.0 if p.n >= 0 else -1.0
    r = sgn * np.sqrt(de * de + dn * dn)
    t = (r / (p.a * p.F)) ** (1.0 / p.n)
    lon = np.arctan2(sgn * de, sgn * dn) / p.n + p.lon0
    lat = np.pi / 2 - 2.0 * np.arctan(t)
    for _ in range(_LCC_LAT_ITERS):
        s = p.e * np.sin(lat)
        lat = np.pi / 2 - 2.0 * np.arctan(
            t * ((1.0 - s) / (1.0 + s)) ** (p.e / 2))
    return np.degrees(lon), np.degrees(lat)


def lcc_inverse_exprs(p: LCCParams, e_col="x", n_col="y"):
    """Native Column LCC inverse (degrees out) — pure JVM expressions so
    projected->ECEF stays whole-stage-codegen with zero Python (the 100 TB
    path). The latitude uses the closed-form Snyder eq. 3-5 series, NOT an
    unrolled fixed-point iteration: each iteration embeds the previous lat
    expression twice, so 8 unrolled steps grow the Catalyst tree ~2^8x and
    the downstream ECEF/rotation reuse multiplies it again — enough to OOM
    the JVM during codegen. The series references chi linearly."""
    de = F.col(e_col).cast("double") - F.lit(p.x0)
    dn = F.lit(p.r0) - (F.col(n_col).cast("double") - F.lit(p.y0))
    sgn = 1.0 if p.n >= 0 else -1.0
    r = sgn * F.sqrt(de * de + dn * dn)
    t = F.pow(r / (p.a * p.F), 1.0 / p.n)
    lon = F.atan2(sgn * de, sgn * dn) / p.n + F.lit(p.lon0)
    chi = math.pi / 2 - 2.0 * F.atan(t)
    ca, cb, cc, cd = _chi_to_lat_coeffs(p.e2)
    lat = (chi + ca * F.sin(2.0 * chi) + cb * F.sin(4.0 * chi)
           + cc * F.sin(6.0 * chi) + cd * F.sin(8.0 * chi))
    return F.degrees(lon), F.degrees(lat)


def convert_to_ecef(x, y, z, epsg_input: int):
    """API parity with the reference's public `convert_to_ecef`
    (utils.py:9-12): (x, y, z, source EPSG) -> EPSG:4978 ECEF meters.
    Geodetic input (4326/4979) takes the closed form directly; Lambert
    conformal conic zones unproject first. Accepts scalars or arrays."""
    if int(epsg_input) in (4326, 4979):
        return geodetic_to_ecef(x, y, z)
    lon, lat = projected_to_geodetic(epsg_input, x, y)
    return geodetic_to_ecef(lon, lat, z)


def projected_to_geodetic(srs_in: int, easting, northing):
    """numpy dispatch: known projected EPSG -> (lon_deg, lat_deg)."""
    if int(srs_in) not in LCC_ZONES:
        raise ValueError(
            f"EPSG:{srs_in} is not a supported projected CRS (known: "
            f"Lambert-93 2154, CC zones 3942-3950); geodetic 4326/4979 "
            "need no unprojection")
    return lcc_inverse(LCC_ZONES[int(srs_in)], easting, northing)
