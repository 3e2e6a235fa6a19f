"""S2 spherical cell index — the north-rule "H3/S2 encode" operator.

Implements the S2 construction from the published s2geometry scheme
(https://s2geometry.io/devguide/s2cell_hierarchy): unit sphere -> cube
face (0-5) -> quadratic ST projection -> leaf (i, j) -> space-filling
curve position. Two id variants:

- **quad id** (`s2_quad_id_expr`): face << 2L | morton(i, j). Pure native
  column expressions end to end (cos/sin/sqrt/floor/bit ops), zero
  Python — the 100 TB bucketing path. Morton order preserves the
  hierarchy (parent = id >> 2) and is exactly reproducible in ANSI SQL,
  so this variant is DuckDB-oracle-checked by the driver gate.
- **Hilbert cell id** (`s2_cell_id`): the classic S2 id layout
  (3 face bits, 2k position bits per level, trailing sentinel bit) with
  the position ordered by the S2 Hilbert state machine (kIJtoPos /
  kPosToOrientation tables, initial orientation = face & 1). Vectorized
  numpy for Arrow-batch UDF use. Locality: consecutive positions at a
  level are edge-adjacent cells — asserted by tests/test_s2.py, which
  also round-trips every cell of a full level through the center decode.

Reference tie-in: the same Morton-family packing as the tiler's LOD grid
key (functions/geometry.py xyz_to_key, reference distance.py:24-32) —
S2 is the spherical analogue used to bucket geocoded web pages before
the octree assignment.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, functions as F

# S2 Hilbert state machine (s2geometry s2coords.cc):
# kIJtoPos[orientation][2*i_bit + j_bit] -> child position on the curve,
# kPosToOrientation[pos] -> orientation XOR for descending into the child
# (kSwapMask=1, kInvertMask=2).
_IJ_TO_POS = np.array([[0, 1, 3, 2],
                       [0, 3, 1, 2],
                       [2, 3, 1, 0],
                       [2, 1, 3, 0]], dtype=np.int64)
_POS_TO_IJ = np.array([[0, 1, 3, 2],
                       [0, 2, 3, 1],
                       [3, 2, 0, 1],
                       [3, 1, 0, 2]], dtype=np.int64)
_POS_TO_ORIENT = np.array([1, 0, 0, 3], dtype=np.int64)

MAX_LEVEL = 30


# ------------------------------------------------------------ native exprs --

def _lonlat_to_xyz(lon: Column, lat: Column):
    rl, rp = F.radians(lon), F.radians(lat)
    cp = F.cos(rp)
    return cp * F.cos(rl), cp * F.sin(rl), F.sin(rp)


def _face_uv_from_xyz(x: Column, y: Column, z: Column):
    """(face, u, v) exprs from unit-sphere xyz Columns. Face selection
    mirrors s2geometry's LargestAbsComponent tie-breaking (x wins only
    strictly; then y; then z), and the per-face (u, v) formulas are the
    published ValidFaceXYZtoUV table. Shared by the one-expression and
    staged builders so the mapping exists exactly once."""
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    axis = (F.when((ax > ay) & (ax > az), F.lit(0))
            .when(ay > az, F.lit(1)).otherwise(F.lit(2)))
    comp = F.when(axis == 0, x).when(axis == 1, y).otherwise(z)
    face = axis + F.when(comp < 0, F.lit(3)).otherwise(F.lit(0))
    u = (F.when(face == 0, y / x).when(face == 1, -x / y)
         .when(face == 2, -x / z).when(face == 3, z / x)
         .when(face == 4, z / y).otherwise(-y / z))
    v = (F.when(face == 0, z / x).when(face == 1, z / y)
         .when(face == 2, -y / z).when(face == 3, y / x)
         .when(face == 4, -x / y).otherwise(-x / z))
    return face.cast("long"), u, v


def _ij_expr(st: Column, level: int) -> Column:
    """Quantize an ST coordinate to [0, 2^level) with the S2 clamp."""
    lim = 1 << level
    raw = F.floor(st * F.lit(float(lim))).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(lim - 1))


def _morton_expr(i: Column, j: Column, level: int) -> Column:
    morton = F.lit(0).cast("long")
    for k in range(level):
        morton = (morton
                  .bitwiseOR(F.shiftleft(F.shiftright(i, k).bitwiseAND(F.lit(1)),
                                         2 * k + 1))
                  .bitwiseOR(F.shiftleft(F.shiftright(j, k).bitwiseAND(F.lit(1)),
                                         2 * k)))
    return morton


def s2_face_uv_exprs(lon_col: str = "x", lat_col: str = "y"):
    """(face, u, v) native columns from lon/lat degree columns."""
    x, y, z = _lonlat_to_xyz(F.col(lon_col).cast("double"),
                             F.col(lat_col).cast("double"))
    return _face_uv_from_xyz(x, y, z)


def _uv_to_st(u: Column) -> Column:
    # S2's quadratic projection: equal-area to within ~2.1x (vs ~5.2 for
    # linear), closed-form both ways
    return F.when(u >= 0, 0.5 * F.sqrt(1.0 + 3.0 * u)) \
            .otherwise(1.0 - 0.5 * F.sqrt(1.0 - 3.0 * u))


def s2_face_ij_exprs(level: int, lon_col: str = "x", lat_col: str = "y"):
    """(face, i, j) native columns at `level` (i, j in [0, 2^level))."""
    face, u, v = s2_face_uv_exprs(lon_col, lat_col)
    return (face, _ij_expr(_uv_to_st(u), level),
            _ij_expr(_uv_to_st(v), level))


def s2_quad_id_expr(level: int, lon_col: str = "x",
                    lat_col: str = "y") -> Column:
    """face << 2L | morton(i, j) as one native column — hierarchical
    (parent cell = id >> 2), JVM-only, and reproducible in plain SQL
    (the driver-gate oracle builds the identical arithmetic).

    Level cap: face (3 bits, faces 4-5 need all three) sits at bit
    positions [2*level, 2*level+2], which must stay below the sign bit
    (position 63) of a signed long — 2*level+2 <= 62, i.e. level <= 30,
    same bound as s2_cell_id's [0, MAX_LEVEL]."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    face, i, j = s2_face_ij_exprs(level, lon_col, lat_col)
    return (F.shiftleft(face, 2 * level)
            .bitwiseOR(_morton_expr(i, j, level)).alias("s2_quad"))


def with_s2_quad(df, level: int, lon_col: str = "x", lat_col: str = "y",
                 out_col: str = "s2_quad"):
    """`out_col` = the level-`level` quad id, built as STAGED projections
    (face/u/v -> st -> ij -> morton) instead of one composed expression.

    Why this exists next to s2_quad_id_expr: composing everything into a
    single Column duplicates subtrees combinatorially — morton references
    i/j 2x per level, ij references st 2x (clamp), st references u 3x
    (sign branch), and every u branch embeds the xyz trig — ~70 copies of
    the trig tree at level 6, a huge codegen unit (measured 5.6x slower
    than geohash on identical input at sf0.1). Separate Projects keep
    each subexpression computed ONCE; Catalyst's CollapseProject will not
    re-inline them because the producers are non-cheap and multiply
    referenced. Same result, same zero-Python plan, ~5x less expression
    tree."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    tmp = ["_s2x", "_s2y", "_s2z", "_s2f", "_s2u", "_s2v", "_s2i", "_s2j"]
    # stage the trig once: face/u/v reference the xyz columns ~15x total
    xe, ye, ze = _lonlat_to_xyz(F.col(lon_col).cast("double"),
                                F.col(lat_col).cast("double"))
    df = df.withColumns({"_s2x": xe, "_s2y": ye, "_s2z": ze})
    face, u, v = _face_uv_from_xyz(F.col("_s2x"), F.col("_s2y"),
                                   F.col("_s2z"))
    df = df.withColumns({"_s2f": face, "_s2u": u, "_s2v": v})
    df = df.withColumns({
        "_s2i": _ij_expr(_uv_to_st(F.col("_s2u")), level),
        "_s2j": _ij_expr(_uv_to_st(F.col("_s2v")), level)})
    out = (F.shiftleft(F.col("_s2f"), 2 * level)
           .bitwiseOR(_morton_expr(F.col("_s2i"), F.col("_s2j"), level)))
    return df.withColumn(out_col, out).drop(*tmp)


def s2_quad_id_sql(level: int, lon_sql: str, lat_sql: str) -> str:
    """The DuckDB/ANSI twin of s2_quad_id_expr, as a SQL scalar expression
    string over lon/lat SQL sub-expressions — used by oracle_sql()."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    lim = 1 << level
    xyz = (f"cos(radians({lat_sql})) * cos(radians({lon_sql}))",
           f"cos(radians({lat_sql})) * sin(radians({lon_sql}))",
           f"sin(radians({lat_sql}))")
    x, y, z = xyz
    axis = (f"(CASE WHEN abs({x}) > abs({y}) AND abs({x}) > abs({z}) THEN 0 "
            f"WHEN abs({y}) > abs({z}) THEN 1 ELSE 2 END)")
    comp = f"(CASE {axis} WHEN 0 THEN {x} WHEN 1 THEN {y} ELSE {z} END)"
    face = f"({axis} + CASE WHEN {comp} < 0 THEN 3 ELSE 0 END)"
    u = (f"(CASE {face} WHEN 0 THEN ({y})/({x}) WHEN 1 THEN -({x})/({y}) "
         f"WHEN 2 THEN -({x})/({z}) WHEN 3 THEN ({z})/({x}) "
         f"WHEN 4 THEN ({z})/({y}) ELSE -({y})/({z}) END)")
    v = (f"(CASE {face} WHEN 0 THEN ({z})/({x}) WHEN 1 THEN ({z})/({y}) "
         f"WHEN 2 THEN -({y})/({z}) WHEN 3 THEN ({y})/({x}) "
         f"WHEN 4 THEN -({x})/({y}) ELSE -({x})/({z}) END)")

    def st(uu: str) -> str:
        return (f"(CASE WHEN {uu} >= 0 THEN 0.5*sqrt(1.0 + 3.0*{uu}) "
                f"ELSE 1.0 - 0.5*sqrt(1.0 - 3.0*{uu}) END)")

    def ij(ss: str) -> str:
        return (f"least(greatest(CAST(floor({ss} * {float(lim)}) AS BIGINT),"
                f" 0), {lim - 1})")

    i, j = ij(st(u)), ij(st(v))
    morton = " | ".join(
        f"((({i} >> {k}) & 1) << {2 * k + 1}) | ((({j} >> {k}) & 1) << {2 * k})"
        for k in range(level))
    return f"(CAST({face} AS BIGINT) << {2 * level}) | ({morton})"


# ------------------------------------------------------------ numpy kernel --

def _lonlat_to_face_ij(lon, lat, level: int):
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    x = np.cos(lat) * np.cos(lon)
    y = np.cos(lat) * np.sin(lon)
    z = np.sin(lat)
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    axis = np.where((ax > ay) & (ax > az), 0, np.where(ay > az, 1, 2))
    comp = np.choose(axis, [x, y, z])
    face = axis + np.where(comp < 0, 3, 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.choose(face, [y / x, -x / y, -x / z, z / x, z / y, -y / z])
        v = np.choose(face, [z / x, z / y, -y / z, y / x, -x / y, -x / z])

    def st(uu):
        with np.errstate(invalid="ignore"):   # untaken where-branch
            return np.where(uu >= 0, 0.5 * np.sqrt(1.0 + 3.0 * uu),
                            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * uu))

    lim = 1 << level

    def ij(ss):
        return np.clip(np.floor(ss * lim).astype(np.int64), 0, lim - 1)

    return face.astype(np.int64), ij(st(u)), ij(st(v))


def _face_ij_to_pos(face, i, j, level: int):
    """Hilbert curve position of (i, j) on `face` at `level` — the S2
    state machine run MSB-first, vectorized over rows."""
    orient = face & 1                      # initial orientation: swap bit
    pos = np.zeros_like(i)
    for k in range(level - 1, -1, -1):
        ij2 = ((i >> k) & 1) * 2 + ((j >> k) & 1)
        p = _IJ_TO_POS[orient, ij2]
        pos = (pos << 2) | p
        orient = orient ^ _POS_TO_ORIENT[p]
    return pos


def _pos_to_face_ij(pos, face, level: int):
    orient = face & 1
    i = np.zeros_like(pos)
    j = np.zeros_like(pos)
    for k in range(level - 1, -1, -1):
        p = (pos >> (2 * k)) & 3
        ij2 = _POS_TO_IJ[orient, p]
        i = (i << 1) | (ij2 >> 1)
        j = (j << 1) | (ij2 & 1)
        orient = orient ^ _POS_TO_ORIENT[p]
    return i, j


def s2_cell_id(lon, lat, level: int):
    """True S2-layout cell ids: face (3 bits) | Hilbert position (2*level
    bits) | sentinel 1 | zeros — i.e. face << 61 | pos << (61-2L) |
    1 << (60-2L), the standard 64-bit S2 encoding. Vectorized numpy; use
    inside a pandas UDF / mapInPandas for the distributed path.

    Signed-interop caveat: canonical S2 ids are uint64, but Spark LongType
    is signed int64, so ids on faces 4-5 set the sign bit and come out
    negative here. The BIT PATTERN is identical to s2geometry's uint64
    (``ids.view(np.uint64)`` or :func:`s2_id_uint64` recovers it exactly);
    only numeric comparisons differ. For canonical uint64 ORDER under a
    signed sort/range-partition, order by :func:`s2_sort_key` (sign-bit
    flip, the standard order-preserving uint64<->int64 map) instead of the
    raw id."""
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    face, i, j = _lonlat_to_face_ij(lon, lat, level)
    pos = _face_ij_to_pos(face, i, j, level)
    shift = 2 * (MAX_LEVEL - level) + 1
    return (face << (2 * MAX_LEVEL + 1)) | (pos << shift) | (1 << (shift - 1))


def s2_id_uint64(ids) -> np.ndarray:
    """Canonical uint64 view of signed int64 S2 ids (bit-identical
    reinterpret) — use when comparing against real s2geometry libraries."""
    return np.ascontiguousarray(np.asarray(ids, dtype=np.int64)) \
        .view(np.uint64)


def s2_sort_key(ids) -> np.ndarray:
    """Signed int64 key whose < order equals canonical uint64 S2 order:
    flip the sign bit (x ^ 2^63). Use for sorting / range-partitioning by
    cell id in Spark, where LongType comparisons are signed."""
    return np.asarray(ids, dtype=np.int64) ^ np.int64(-0x8000000000000000)


def s2_cell_level(ids) -> np.ndarray:
    """Level of each id (position of the lowest set bit)."""
    ids = np.asarray(ids, dtype=np.int64)
    lsb = ids & (-ids)
    # sentinel bit sits at position 2*(MAX_LEVEL - level)
    return (MAX_LEVEL - np.round(np.log2(lsb.astype(np.float64)))
            .astype(np.int64) // 2).astype(np.int64)


def s2_parent(ids, level: int):
    """Parent cell id at `level` (must be <= the ids' level)."""
    ids = np.asarray(ids, dtype=np.int64)
    shift = 2 * (MAX_LEVEL - level) + 1
    lsb = np.int64(1) << (shift - 1)
    return (ids & ~(2 * lsb - 1)) | lsb


def s2_cell_center(ids, level: int):
    """(lon_deg, lat_deg) of each cell's center — the decode inverse used
    by the round-trip tests."""
    ids = np.asarray(ids, dtype=np.int64)
    shift = 2 * (MAX_LEVEL - level) + 1
    # ids use the full 64-bit pattern (faces 4-5 set the sign bit, as in
    # s2geometry's uint64); mask after the arithmetic shift
    face = (ids >> (2 * MAX_LEVEL + 1)) & 7
    pos = (ids >> shift) & ((np.int64(1) << (2 * level)) - 1)
    i, j = _pos_to_face_ij(pos, face, level)
    lim = 1 << level
    s = (i.astype(np.float64) + 0.5) / lim
    t = (j.astype(np.float64) + 0.5) / lim

    def st2uv(ss):
        return np.where(ss >= 0.5, (4.0 * ss * ss - 1.0) / 3.0,
                        (1.0 - 4.0 * (1.0 - ss) * (1.0 - ss)) / 3.0)

    u, v = st2uv(s), st2uv(t)
    one = np.ones_like(u)
    # FaceUVtoXYZ (inverse of the per-face table above)
    xyz = np.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4],
        [np.stack([one, u, v]), np.stack([-u, one, v]),
         np.stack([-u, -v, one]), np.stack([-one, -v, -u]),
         np.stack([v, -one, -u])],
        default=np.stack([v, u, -one]))
    x, y, z = xyz[0], xyz[1], xyz[2]
    lat = np.degrees(np.arctan2(z, np.sqrt(x * x + y * y)))
    lon = np.degrees(np.arctan2(y, x))
    return lon, lat
