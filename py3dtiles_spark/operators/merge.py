"""Tileset federation (reference `py3dtiles merge`, merger.py:156-232).

Merges N input tilesets into one master tileset by recursively quad-splitting
the union AABB and routing each tileset to the quadrant containing its
center; internal quadrants get an LOD overview sampled from children.

Data sizes: tileset count is dozens-to-thousands (driver-friendly); only the
overview sampling touches point-scale data, done as a per-quadrant
deterministic sample (reference uses np.random.choice with
ratio = min(0.5, 50000/total), merger.py:201-213 — we use hash-ordered
selection so the result is reproducible, SURVEY.md §7.4).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from py3dtiles_spark.functions.geometry import split_aabb

OVERVIEW_POINT_CAP = 50_000


def union_aabb(tilesets: list[dict]) -> np.ndarray:
    mins = np.min([t["aabb"][0] for t in tilesets], axis=0)
    maxs = np.max([t["aabb"][1] for t in tilesets], axis=0)
    return np.array([mins, maxs], dtype=np.float64)


def build_merge_tree(tilesets: list[dict], aabb: np.ndarray | None = None,
                     min_diag: float = 1.0) -> dict:
    """Recursive quadtree federation. Each tileset dict needs:
    {"uri": str, "aabb": (2,3) array, "center": (3,) array,
     "point_count": int, "geometric_error": float}.
    Returns the merged tileset root node (driver-side JSON-able dict).
    """
    if aabb is None:
        aabb = union_aabb(tilesets)
    diag = float(np.linalg.norm(aabb[1] - aabb[0]))
    if len(tilesets) == 1 or diag < min_diag:
        t = tilesets[0]
        node = {
            "geometricError": t["geometric_error"],
            "boundingVolume": _box(t["aabb"]),
            "content": {"uri": t["uri"]},
        }
        if len(tilesets) > 1:
            node["children"] = [build_merge_tree([x], x["aabb"], min_diag)
                                for x in tilesets[1:]]
        return node

    # forced-quadtree split with child indices 0/2/4/6 (merger.py:104-110)
    children = []
    child_error = 0.0
    for idx in (0, 2, 4, 6):
        sub = split_aabb(aabb, idx, force_quadtree=True).astype(np.float64)
        inside = [t for t in tilesets
                  if (sub[0][0] <= t["center"][0] <= sub[1][0]
                      and sub[0][1] <= t["center"][1] <= sub[1][1])]
        if not inside:
            continue
        child = build_merge_tree(inside, sub, min_diag)
        children.append(child)
        child_error += child["geometricError"]
        tilesets = [t for t in tilesets if t not in inside]

    node_aabb = union_aabb_boxes(children) if children else aabb
    return {
        # geometricError = sum of children's (merger.py:229)
        "geometricError": child_error,
        "boundingVolume": _box(node_aabb),
        "refine": "ADD",
        "children": children,
    }


def _box(aabb) -> dict:
    lo = np.asarray(aabb[0], dtype=float)
    hi = np.asarray(aabb[1], dtype=float)
    c, h = (lo + hi) / 2.0, (hi - lo) / 2.0
    return {"box": [c[0], c[1], c[2], h[0], 0, 0, 0, h[1], 0, 0, 0, h[2]]}


def union_aabb_boxes(children: list[dict]) -> np.ndarray:
    lows, highs = [], []
    for ch in children:
        b = ch["boundingVolume"]["box"]
        c = np.array(b[:3])
        h = np.array([b[3], b[7], b[11]])
        lows.append(c - h)
        highs.append(c + h)
    return np.array([np.min(lows, axis=0), np.max(highs, axis=0)])


def overview_sample(points: DataFrame, total: int,
                    cap: int = OVERVIEW_POINT_CAP, seed: int = 42) -> DataFrame:
    """Deterministic LOD overview sample: ratio = min(0.5, cap/total)
    (merger.py:201-213), chosen by hash order instead of RNG so reruns are
    identical. Pure window-free filter: keep rows whose hash bucket falls
    under the ratio."""
    if total <= 0:
        return points.limit(0)
    ratio = min(0.5, cap / total)
    denom = 1 << 20
    return points.filter(
        F.pmod(F.xxhash64("point_id", F.lit(seed)), F.lit(denom))
        < int(ratio * denom))


def merge_tilesets(tileset_rows, min_diag: float = 1.0) -> dict:
    """Entry point mirroring `py3dtiles merge`: rows/dicts with
    (tileset_id, uri, min_x..max_z or aabb, point_count, geometric_error)."""
    tilesets = []
    for r in tileset_rows:
        d = r.asDict() if hasattr(r, "asDict") else dict(r)
        if "aabb" not in d:
            d["aabb"] = np.array([[d["min_x"], d["min_y"], d["min_z"]],
                                  [d["max_x"], d["max_y"], d["max_z"]]])
        d.setdefault("uri", f"tileset_{d.get('tileset_id')}.json")
        d["center"] = (np.asarray(d["aabb"][0]) + np.asarray(d["aabb"][1])) / 2.0
        d.setdefault("geometric_error",
                     float(np.linalg.norm(
                         np.asarray(d["aabb"][1]) - np.asarray(d["aabb"][0]))))
        tilesets.append(d)
    root = build_merge_tree(tilesets, min_diag=min_diag)
    return {"asset": {"version": "1.0"},
            "geometricError": root["geometricError"] or 1.0,
            "root": root}
