"""Tiles dimension table + 3D Tiles tileset.json (BVH) emission.

Reference behavior being re-expressed (not ported):
- per-tile REAL AABB from the tile's own points, replacing the octree-
  theoretic box (node.py:202-206)
- small-child merge: children with < 100 points are absorbed into their
  parent, parent AABB extended (node.py:222-249) — here a DataFrame
  rollup pass, not a file rewrite
- geometricError: root = ||aabb diagonal|| / scale (convert.py:80-81),
  per tile = 10 * spacing / scale (node.py:209), leaves 0.0
- refine: REPLACE at root, ADD below (convert.py:72-74)
- subtrees whose JSON exceeds 100 000 chars spill to tileset.<name>.json
  and are referenced via content.uri (node.py:282-296)

The tiles table is tile-count sized (thousands of rows at 100 TB of
points), so collecting it to the driver for JSON assembly is the right
physical plan — the same call the reference makes (convert.py:656).
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np
from pyspark.sql import DataFrame, functions as F

from py3dtiles_spark.functions.geometry import SMALL_CHILD_MERGE

TILESET_JSON_SPILL_CHARS = 100_000


def build_tiles_df(assignments_with_xyz: DataFrame) -> DataFrame:
    """(point_id, x, y, z, tile_id) -> one row per tile with real AABB.

    One shuffle on tile_id; map-side partial aggregation makes this cheap
    at any scale.
    """
    return assignments_with_xyz.groupBy("tile_id").agg(
        F.count("*").alias("point_count"),
        F.min("x").alias("min_x"), F.min("y").alias("min_y"),
        F.min("z").alias("min_z"),
        F.max("x").alias("max_x"), F.max("y").alias("max_y"),
        F.max("z").alias("max_z"),
    )


def rollup_small_children(assignments: DataFrame,
                          threshold: int = SMALL_CHILD_MERGE) -> DataFrame:
    """Reassign points of tiny tiles to their parent (node.py:222-249).

    A tile below the split threshold can never have children, so one pass
    suffices. Implemented as a broadcast semi-join of the (tiny) merge list
    against the assignments — no full-table shuffle.
    Returns assignments with an updated tile_id column.
    """
    counts = assignments.groupBy("tile_id").count()
    merged = (counts
              .filter((F.col("count") < threshold) & (F.length("tile_id") > 0))
              .select(F.col("tile_id").alias("m_tile"),
                      F.expr("substring(m_tile, 1, length(m_tile)-1)")
                      .alias("m_parent")))
    return (assignments
            .join(F.broadcast(merged),
                  assignments.tile_id == merged.m_tile, "left")
            .withColumn("tile_id", F.coalesce("m_parent", "tile_id"))
            .drop("m_tile", "m_parent"))


def build_tileset_json(tiles_rows, root_aabb: np.ndarray, root_spacing: float,
                       scale: float = 1.0,
                       spill_chars: Optional[int] = TILESET_JSON_SPILL_CHARS,
                       content_uri=lambda tid: f"r{tid}.pnts",
                       transform: Optional[list] = None) -> dict:
    """Driver-side BVH assembly from collected tiles rows.

    tiles_rows: iterable of Rows/dicts with tile_id, point_count,
    min_x..max_z. Returns {"tileset.json": <dict>, "tileset.<name>.json":
    <dict>, ...} — the main document plus any spilled subtrees.

    transform: optional 16-float column-major root transform matrix
    (T(offset) . S(1/scale) . R^-1, reference convert.py:36-41,71) — build
    with functions.crs.tileset_transform.
    """
    info = {}
    for r in tiles_rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        info[d["tile_id"]] = d

    # every ancestor prefix of an existing tile is a live BVH node
    prefixes = set()
    for tid in info:
        for i in range(len(tid) + 1):
            prefixes.add(tid[:i])

    docs = {}

    def node_json(tid: str) -> dict:
        spacing = root_spacing * (0.5 ** len(tid))
        t = {"geometricError": 10.0 * spacing / scale}
        d = info.get(tid)
        if d is not None:
            aabb_min = np.array([d["min_x"], d["min_y"], d["min_z"]], dtype=float)
            aabb_max = np.array([d["max_x"], d["max_y"], d["max_z"]], dtype=float)
            t["content"] = {"uri": content_uri(tid)}
        else:
            # internal node with no own points (shouldn't happen, but the
            # octree-theoretic box is the correct fallback)
            from py3dtiles_spark.functions.geometry import node_geometry
            box, _ = node_geometry(tid, root_aabb, root_spacing)
            aabb_min, aabb_max = box[0].astype(float), box[1].astype(float)
        children = []
        for digit in "01234567":
            child = tid + digit
            if child in prefixes:
                cj = node_json(child)
                children.append(cj)
                cb = cj["boundingVolume"]["box"]
                c, h = np.array(cb[:3]), np.array([cb[3], cb[7], cb[11]])
                aabb_min = np.minimum(aabb_min, c - h)
                aabb_max = np.maximum(aabb_max, c + h)
        center = (aabb_min + aabb_max) * 0.5
        half = (aabb_max - aabb_min) * 0.5
        t["boundingVolume"] = {"box": [
            center[0], center[1], center[2],
            half[0], 0, 0, 0, half[1], 0, 0, 0, half[2]]}
        if children:
            t["children"] = children
        else:
            t["geometricError"] = 0.0
        if tid and children and spill_chars is not None \
                and len(json.dumps(t)) > spill_chars:
            name = f"tileset.{tid}.json"
            docs[name] = {"asset": {"version": "1.0"}, "refine": "ADD",
                          "geometricError": t["geometricError"],
                          "root": dict(t)}
            t = {"geometricError": t["geometricError"],
                 "boundingVolume": t["boundingVolume"],
                 "content": {"uri": name}, "children": []}
        return t

    root = node_json("")
    # reference refine semantics (convert.py:72-74): REPLACE on the root,
    # ADD on the root's direct children (descendants inherit ADD)
    for child in root.get("children", []):
        child["refine"] = "ADD"
    diag = float(np.linalg.norm(
        np.asarray(root_aabb[1], dtype=float) - np.asarray(root_aabb[0], dtype=float)))
    root_doc = {**root, "refine": "REPLACE"}
    if transform is not None:
        root_doc["transform"] = list(transform)
    docs["tileset.json"] = {
        "asset": {"version": "1.0"},
        "geometricError": diag / scale,
        "root": root_doc,
    }
    return docs


def root_overview(points_with_tiles: DataFrame, root_aabb, root_spacing,
                  include_rgb: bool = False) -> DataFrame:
    """The root tile's pnts content (reference write_tileset,
    convert.py:44-66): a grid-accept LOD subsample of the depth-1
    children's contents at DOUBLE the root spacing (Node('', aabb,
    spacing*2)). The root holds no assigned points (node_process forces it
    empty); its content is this overview.

    Relational form: rows assigned to a depth-1 tile, grouped by ROOT grid
    cell (native key expression — one shuffle on the cell key), canonical
    (tile_id, point_id) order, sequential accept per cell at (2*spacing)^2.
    The reference's insertion order is its children's pnts file order; the
    engine pins the canonical order instead (same determinism contract as
    the tree build).
    """
    import pandas as pd
    from py3dtiles_spark.functions.geometry import (
        GRID_INITIAL_CELL_COUNT, node_frame, sequential_accept)

    frame = node_frame("", root_aabb, root_spacing)
    c = GRID_INITIAL_CELL_COUNT
    inv = np.float32(1.0) / frame.size
    scale = np.array([c] * 3, dtype=np.int32) * inv      # int32*f32 -> f64
    shift = int(c - 1).bit_length()

    def axis(col, mn, sc):
        diff = (F.col(col).cast("float") - F.lit(float(mn)).cast("float"))
        prod = F.lit(float(sc)) * diff.cast("double")
        return F.least(F.greatest(prod.cast("long"), F.lit(0)), F.lit(c - 1))

    key = (axis("x", frame.aabb[0][0], scale[0])
           + F.shiftleft(axis("y", frame.aabb[0][1], scale[1]), shift)
           + F.shiftleft(axis("z", frame.aabb[0][2], scale[2]), 2 * shift))

    sq = (2.0 * float(root_spacing)) ** 2
    cols = ["point_id", "x", "y", "z"] + (["r", "g", "b"] if include_rgb else [])
    schema = ("point_id long, x float, y float, z float"
              + (", r smallint, g smallint, b smallint" if include_rgb else ""))

    def accept_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["tile_id", "point_id"],
                              kind="stable").reset_index(drop=True)
        xyz = pdf[["x", "y", "z"]].to_numpy(dtype=np.float32)
        mask = sequential_accept(xyz, sq)
        return pdf.loc[mask, cols]

    depth1 = points_with_tiles.filter(F.length("tile_id") == 1)
    return (depth1.withColumn("_ck", key)
            .groupBy("_ck").applyInPandas(accept_cell, schema=schema))


def tileset_from_tiling(points_with_tiles: DataFrame, root_aabb, root_spacing,
                        scale: float = 1.0, rollup: bool = True):
    """Convenience: assignments+xyz -> (tiles_df_after_rollup, tileset docs)."""
    assignments = points_with_tiles
    if rollup:
        assignments = rollup_small_children(assignments)
    tiles = build_tiles_df(assignments)
    docs = build_tileset_json(tiles.collect(), root_aabb, root_spacing, scale)
    return tiles, docs
