"""Spatial joins: point-in-polygon, point-in-rectangle, tileset routing.

Reference semantics being generalized (SURVEY.md §2.4):
- J2 point-in-tile containment: half-open range test min <= p < max
  (export.py:19-21, 141-160) drives quadtree placement
- J3 tileset->quadrant routing by center containment (merger.py:113-114)
- north_rule "point-in-polygon joins against tile boundaries": exact
  polygon PIP = coarse-cell equi-join prefilter + vectorized ray-cast

Physical strategy at scale:
- small polygon set (dims, admin boundaries): broadcast + bbox prefilter
  inside the ray-cast UDF — zero shuffle on the points side.
- large polygon set: both sides mapped to coarse grid cells (polygons via
  bbox cover, points directly — native exprs), equi-join on cell_id (a
  shuffle that AQE salts if skewed), then the exact test on the residual
  candidates. Filter selectivity comes from the grid, exactness from the
  ray-cast.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def point_in_rect_join(points: DataFrame, rects: DataFrame,
                       broadcast: bool = True) -> DataFrame:
    """Half-open containment join: rects (rect_id, xmin, ymin, xmax, ymax);
    points need (x, y). The reference BoundingBox.inside test."""
    r = F.broadcast(rects) if broadcast else rects
    cond = ((points.x >= r.xmin) & (points.x < r.xmax)
            & (points.y >= r.ymin) & (points.y < r.ymax))
    return points.join(r, cond, "inner")


def ray_cast_mask(px: np.ndarray, py: np.ndarray,
                  xs: np.ndarray, ys: np.ndarray) -> np.ndarray:
    """Vectorized even-odd ray cast of N points against ONE polygon ring.
    Float64; edges handled with the standard crossing rule."""
    inside = np.zeros(len(px), dtype=bool)
    n = len(xs)
    j = n - 1
    for i in range(n):
        xi, yi, xj, yj = xs[i], ys[i], xs[j], ys[j]
        crosses = ((yi > py) != (yj > py))
        with np.errstate(divide="ignore", invalid="ignore"):
            t = (py - yi) / (yj - yi)
        xint = xi + t * (xj - xi)
        inside ^= crosses & (px < xint)
        j = i
    return inside


def even_odd_mask(px: np.ndarray, py: np.ndarray, rings) -> np.ndarray:
    """Even-odd containment of N points against a polygon given as a list
    of rings [(xs, ys), ...] — exterior first, then holes. XOR of the
    per-ring crossing masks IS the even-odd rule over the whole boundary:
    a point inside the exterior but also inside a hole ring crosses an odd
    number of edges twice, so the bits cancel and it tests OUTSIDE (the
    donut semantics real admin boundaries — enclaves, lake islands —
    need)."""
    inside = np.zeros(len(px), dtype=bool)
    for xs, ys in rings:
        inside ^= ray_cast_mask(px, py, xs, ys)
    return inside


def _collect_rings(polygons: DataFrame):
    """[(geom_id, [(xs, ys) exterior, (xs, ys) hole, ...]), ...] from a
    polygons DataFrame with exterior `xs`/`ys` and optional hole columns
    `hxs`/`hys` (array<array<double>>, one entry per hole ring)."""
    has_holes = "hxs" in polygons.columns and "hys" in polygons.columns
    cols = ["geom_id", "xs", "ys"] + (["hxs", "hys"] if has_holes else [])
    out = []
    for r in polygons.select(*cols).collect():
        rings = [(np.asarray(r["xs"], dtype=np.float64),
                  np.asarray(r["ys"], dtype=np.float64))]
        if has_holes and r["hxs"] is not None:
            rings += [(np.asarray(hx, dtype=np.float64),
                       np.asarray(hy, dtype=np.float64))
                      for hx, hy in zip(r["hxs"], r["hys"])]
        out.append((r["geom_id"], rings))
    return out


def point_in_polygon_join(points: DataFrame, polygons: DataFrame,
                          keep_cols=("point_id",)) -> DataFrame:
    """Exact PIP join. polygons: (geom_id, xs array<double>, ys
    array<double>) exterior rings, plus OPTIONAL hole rings as
    `hxs`/`hys` array<array<double>> columns — containment is then the
    even-odd rule across all rings (donut polygons supported). Polygons
    are collected + broadcast (dim-table sized); the ray cast runs as one
    Arrow-batched mapInPandas over the points — no per-row Python, no
    shuffle.

    Returns one row per (point, containing polygon): keep_cols + geom_id.
    """
    polys = _collect_rings(polygons)
    # bbox prefilter from the exterior ring only (holes lie inside it)
    bboxes = [(g, rings[0][0].min(), rings[0][0].max(),
               rings[0][1].min(), rings[0][1].max())
              for g, rings in polys]
    keep = list(keep_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = pdf["x"].to_numpy(dtype=np.float64)
            py = pdf["y"].to_numpy(dtype=np.float64)
            outs = []
            for (g, rings), (_, x0, x1, y0, y1) in zip(polys, bboxes):
                cand = (px >= x0) & (px <= x1) & (py >= y0) & (py <= y1)
                if not cand.any():
                    continue
                idx = np.flatnonzero(cand)
                hit = even_odd_mask(px[idx], py[idx], rings)
                if hit.any():
                    rows = pdf.iloc[idx[hit]][keep].copy()
                    rows["geom_id"] = g
                    outs.append(rows)
            if outs:
                yield pd.concat(outs, ignore_index=True)

    schema = ", ".join(
        f"{c} {dict(points.dtypes)[c]}" for c in keep) + ", geom_id long"
    return points.mapInPandas(run, schema=schema)


def grid_cell_cover(xmin, ymin, xmax, ymax, cell_deg: float):
    """All coarse cells intersecting a bbox (driver/UDF helper)."""
    import math
    cells = []
    cx0 = math.floor(xmin / cell_deg)
    cx1 = math.floor(xmax / cell_deg)
    cy0 = math.floor(ymin / cell_deg)
    cy1 = math.floor(ymax / cell_deg)
    for cx in range(cx0, cx1 + 1):
        for cy in range(cy0, cy1 + 1):
            cells.append(cx * 100000 + cy)
    return cells


def point_cell_id(cell_deg: float):
    """Native expression: the coarse grid cell of a point — the scale path's
    equi-join key (same Morton/H3-family quantization as the LOD grid)."""
    return (F.floor(F.col("x") / cell_deg) * 100000
            + F.floor(F.col("y") / cell_deg)).alias("cell_id")


def polygon_cell_cover(xs: np.ndarray, ys: np.ndarray,
                       cell_deg: float, holes=None) -> set:
    """EXACT cell cover of one polygon: the set of grid cells whose square
    intersects the polygon interior/boundary — the tight replacement for
    the bbox cover when polygons are thin or diagonal (a country-sized
    diagonal polygon's bbox cover can be many times its true cover).
    `holes`: optional list of (hxs, hys) hole rings — hole boundaries join
    the supercover and interior centers use the even-odd rule, so cells
    strictly inside a hole drop out of the cover (they can hold no hit).

    Construction (exact, no heuristics):
    1. edge supercover — grid DDA over every boundary edge (exterior AND
       hole rings) marks every cell the boundary passes through (always
       in the cover);
    2. every remaining bbox cell contains NO boundary, so it is entirely
       inside or entirely outside — its center decides via the same
       even-odd ray-cast the exact join uses.
    """
    cells: set = set()
    rings = [(xs, ys)] + [(np.asarray(hx, dtype=np.float64),
                           np.asarray(hy, dtype=np.float64))
                          for hx, hy in (holes or [])]
    for rxs, rys in rings:
        _edge_supercover(rxs, rys, cell_deg, cells)
    # 2. interior cells: even-odd center-inside among non-boundary cells
    cx0 = int(np.floor(xs.min() / cell_deg))
    cx1 = int(np.floor(xs.max() / cell_deg))
    cy0 = int(np.floor(ys.min() / cell_deg))
    cy1 = int(np.floor(ys.max() / cell_deg))
    gx, gy = np.meshgrid(np.arange(cx0, cx1 + 1), np.arange(cy0, cy1 + 1))
    gx, gy = gx.ravel(), gy.ravel()
    boundary = np.array([(int(a), int(b)) in cells
                         for a, b in zip(gx, gy)])
    centers_x = (gx + 0.5) * cell_deg
    centers_y = (gy + 0.5) * cell_deg
    inside = even_odd_mask(centers_x, centers_y, rings) & ~boundary
    cells.update(zip(gx[inside].tolist(), gy[inside].tolist()))
    return cells


def _edge_supercover(xs: np.ndarray, ys: np.ndarray,
                     cell_deg: float, cells: set) -> None:
    n = len(xs)
    # 1. boundary supercover: exact Amanatides-Woo grid traversal per
    # edge — visits precisely the cells the segment passes through; on an
    # exact corner crossing both axis-neighbors are added (conservative)
    for i in range(n):
        x0, y0 = float(xs[i]), float(ys[i])
        x1, y1 = float(xs[(i + 1) % n]), float(ys[(i + 1) % n])
        cx, cy = int(np.floor(x0 / cell_deg)), int(np.floor(y0 / cell_deg))
        ex_, ey_ = int(np.floor(x1 / cell_deg)), int(np.floor(y1 / cell_deg))
        cells.add((cx, cy))
        dx, dy = x1 - x0, y1 - y0
        step_x = 1 if dx > 0 else -1
        step_y = 1 if dy > 0 else -1
        tmax_x = (np.inf if dx == 0 else
                  ((cx + (step_x > 0)) * cell_deg - x0) / dx)
        tmax_y = (np.inf if dy == 0 else
                  ((cy + (step_y > 0)) * cell_deg - y0) / dy)
        tdx = np.inf if dx == 0 else cell_deg / abs(dx)
        tdy = np.inf if dy == 0 else cell_deg / abs(dy)
        for _ in range(abs(ex_ - cx) + abs(ey_ - cy) + 4):
            if (cx, cy) == (ex_, ey_):
                break
            if tmax_x == tmax_y:          # exact corner: take both paths
                cells.add((cx + step_x, cy))
                cells.add((cx, cy + step_y))
                cx += step_x
                cy += step_y
                tmax_x += tdx
                tmax_y += tdy
            elif tmax_x < tmax_y:
                cx += step_x
                tmax_x += tdx
            else:
                cy += step_y
                tmax_y += tdy
            cells.add((cx, cy))


def point_in_polygon_join_large(points: DataFrame, polygons: DataFrame,
                                cell_deg: float = 5.0,
                                keep_cols=("point_id",),
                                exact_cover: bool = False) -> DataFrame:
    """PIP for polygon sets too big to broadcast whole: equi-join points to
    polygon bbox cell covers on a coarse grid, then exact ray-cast per
    candidate pair inside applyInPandas grouped by (geom_id, cell_id).

    The default bbox cover is a pure expression (explode of two integer
    sequences — no Python on the polygon side), and the exact kernel
    groups by (geom_id, cell_id) rather than geom_id alone: the ray cast
    is per-point, so a country-sized polygon's candidates run as one task
    per covered cell instead of serializing on a single worker — the
    hot-polygon skew answer at 10^12 points.

    exact_cover=True replaces the bbox cover with polygon_cell_cover
    (boundary supercover + center-decided interior, Arrow-batched on the
    polygon side): identical join results — both covers are supersets of
    every cell holding a hit — but thin/diagonal polygons produce far
    fewer candidate rows, at the price of Python on the (small) polygon
    side.

    Hole rings (`hxs`/`hys` array<array<double>> columns, optional)
    travel with the polygon through the equi-join and the exact kernel
    applies the even-odd rule across all rings; with exact_cover the
    hole boundaries join the supercover and hole interiors drop out of
    the cover entirely."""
    has_holes = "hxs" in polygons.columns and "hys" in polygons.columns
    ring_cols = ["xs", "ys"] + (["hxs", "hys"] if has_holes else [])
    ring_schema = "xs array<double>, ys array<double>" + (
        ", hxs array<array<double>>, hys array<array<double>>"
        if has_holes else "")
    if exact_cover:
        def cover(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for t in pdf.itertuples(index=False):
                    xs64 = np.asarray(t.xs, dtype=np.float64)
                    ys64 = np.asarray(t.ys, dtype=np.float64)
                    holes = (list(zip(t.hxs, t.hys))
                             if has_holes and t.hxs is not None else None)
                    for ccx, ccy in polygon_cell_cover(xs64, ys64, cell_deg,
                                                       holes=holes):
                        rows.append((int(t.geom_id), ccx * 100000 + ccy)
                                    + tuple(getattr(t, c) for c in ring_cols))
                yield pd.DataFrame(rows, columns=["geom_id", "cell_id"]
                                   + ring_cols)

        poly_cells = polygons.select("geom_id", *ring_cols).mapInPandas(
            cover, schema=f"geom_id long, cell_id long, {ring_schema}")
    else:
        cx = F.explode(F.sequence(
            F.floor(F.array_min("xs") / cell_deg).cast("long"),
            F.floor(F.array_max("xs") / cell_deg).cast("long"))).alias("cx")
        poly_cells = (polygons
                      .select("geom_id", *ring_cols, cx)
                      .select("geom_id", *ring_cols, "cx",
                              F.explode(F.sequence(
                                  F.floor(F.array_min("ys") / cell_deg)
                                  .cast("long"),
                                  F.floor(F.array_max("ys") / cell_deg)
                                  .cast("long"))).alias("cy"))
                      .withColumn("cell_id",
                                  F.col("cx") * 100000 + F.col("cy")))
    pts = points.withColumn("cell_id", point_cell_id(cell_deg))
    cand = pts.join(poly_cells.select("geom_id", "cell_id", *ring_cols),
                    "cell_id")
    keep = list(keep_cols)
    schema = ", ".join(
        f"{c} {dict(points.dtypes)[c]}" for c in keep) + ", geom_id long"

    def exact(pdf: pd.DataFrame) -> pd.DataFrame:
        rings = [(np.asarray(pdf["xs"].iat[0], dtype=np.float64),
                  np.asarray(pdf["ys"].iat[0], dtype=np.float64))]
        if has_holes and pdf["hxs"].iat[0] is not None:
            rings += [(np.asarray(hx, dtype=np.float64),
                       np.asarray(hy, dtype=np.float64))
                      for hx, hy in zip(pdf["hxs"].iat[0], pdf["hys"].iat[0])]
        hit = even_odd_mask(pdf["x"].to_numpy(np.float64),
                            pdf["y"].to_numpy(np.float64), rings)
        out = pdf.loc[hit, keep + ["geom_id"]]
        return out

    return cand.groupBy("geom_id", "cell_id").applyInPandas(exact, schema=schema)


def route_to_quadrant(items: DataFrame, aabb) -> DataFrame:
    """Tileset->quadrant routing (merger.py:104-114): which forced-quadtree
    child of `aabb` contains each item's (x, y) center. Pure expression."""
    cx = (aabb[0][0] + aabb[1][0]) / 2.0
    cy = (aabb[0][1] + aabb[1][1]) / 2.0
    return items.withColumn(
        "quadrant",
        (F.when(F.col("x") >= cx, 4).otherwise(0)
         + F.when(F.col("y") >= cy, 2).otherwise(0)).cast("int"))
