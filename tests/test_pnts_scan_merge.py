"""pnts Spark source (S5), tileset-dir scan (S8), merge with overviews."""

from __future__ import annotations

import json
import os

import numpy as np

from py3dtiles_spark.sources.pnts import (
    decode_pnts, encode_pnts, name_to_relpath, relpath_to_name)


def test_relpath_roundtrip():
    for tid in ["", "0", "063", "01234567", "012345670", "0123456701234567"]:
        assert relpath_to_name("/out/" + name_to_relpath(tid)) == tid


def _write_tileset(out_dir, n_points, offset, seed):
    """A minimal single-tile tileset directory for merge tests."""
    rng = np.random.default_rng(seed)
    xyz = (rng.uniform(0, 10, size=(n_points, 3)) + offset).astype(np.float32)
    rgb = rng.integers(0, 255, size=(n_points, 3), dtype=np.uint8)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "r.pnts"), "wb") as f:
        f.write(encode_pnts(xyz, rgb))
    lo, hi = xyz.min(axis=0), xyz.max(axis=0)
    c, h = (lo + hi) / 2.0, (hi - lo) / 2.0
    doc = {"asset": {"version": "1.0"},
           "geometricError": float(np.linalg.norm(hi - lo)),
           "root": {"boundingVolume": {"box": [
               float(c[0]), float(c[1]), float(c[2]),
               float(h[0]), 0, 0, 0, float(h[1]), 0, 0, 0, float(h[2])]},
               "geometricError": 0.0, "refine": "REPLACE",
               "content": {"uri": "r.pnts"}}}
    with open(os.path.join(out_dir, "tileset.json"), "w") as f:
        json.dump(doc, f)
    return xyz


def test_pnts_scan_roundtrip(spark, tmp_path):
    xyz = _write_tileset(str(tmp_path / "a"), 1000, 0.0, 1)
    df = __import__("py3dtiles_spark.sources.pnts",
                    fromlist=["pnts_scan"]).pnts_scan(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 1000
    assert {r.tile_id for r in rows} == {""}
    got = sorted((r.x, r.y, r.z) for r in rows)
    exp = sorted(map(tuple, xyz.tolist()))
    np.testing.assert_allclose(got, exp, rtol=1e-6)


def test_scan_tilesets_and_merge_with_overviews(spark, tmp_path):
    from py3dtiles_spark.operators.merge import merge_with_overviews, scan_tilesets
    _write_tileset(str(tmp_path / "a"), 2000, 0.0, 1)
    _write_tileset(str(tmp_path / "b"), 3000, 100.0, 2)
    _write_tileset(str(tmp_path / "c"), 1000, 200.0, 3)

    ts = scan_tilesets(str(tmp_path))
    assert len(ts) == 3
    assert sum(t["point_count"] for t in ts) == 6000
    a = next(t for t in ts if t["uri"].startswith("a"))
    assert a["aabb"][0][0] >= 0.0 and a["aabb"][1][0] <= 10.0

    out = str(tmp_path / "merged")
    doc = merge_with_overviews(spark, str(tmp_path), out)
    assert os.path.exists(os.path.join(out, "tileset.json"))
    assert doc["root"]["content"]["uri"] == "r.pnts"
    with open(os.path.join(out, "r.pnts"), "rb") as f:
        oxyz, orgb, ft = decode_pnts(f.read())
    # ratio = min(0.5, 50000/6000) = 0.5 -> about half the points
    assert 2000 < ft["POINTS_LENGTH"] < 4000
    # every child quadrant references an input tileset
    uris = []

    def walk(t):
        if "content" in t and t["content"]["uri"].endswith("tileset.json"):
            uris.append(t["content"]["uri"])
        for c in t.get("children", []):
            walk(c)
    walk(doc["root"])
    assert len(uris) == 3


def test_scan_tilesets_applies_transform(tmp_path):
    from py3dtiles_spark.operators.merge import scan_tilesets
    _write_tileset(str(tmp_path / "a"), 100, 0.0, 4)
    # inject a root transform translating by (1000, 0, 0)
    p = os.path.join(str(tmp_path / "a"), "tileset.json")
    with open(p) as f:
        doc = json.load(f)
    tf = np.identity(4)
    tf[0, 3] = 1000.0
    doc["root"]["transform"] = tf.T.reshape(16).tolist()
    with open(p, "w") as f:
        json.dump(doc, f)
    ts = scan_tilesets(str(tmp_path))
    assert ts[0]["aabb"][0][0] >= 1000.0
