"""WKB multipolygon parsing + polygon triangulation — pure numpy.

Re-expresses the reference's TriangleSoup path (wkb_utils.py:139-233):
- `parse_wkb_multipolygon`: MultiPolygonZ (1006) / PolyhedralSurface (1015)
  / 2D MultiPolygon (6) -> list of polygons, each a list of float32 (n,3)
  rings with the WKB-redundant closing point dropped (wkb_utils.py:168-170).
- `triangulate_polygon`: project onto the dominant plane of the outer
  ring's normal (wkb_utils.py:178-205), triangulate with ear clipping
  (holes bridged into the outer ring), and re-orient every output triangle
  to match the outer normal (wkb_utils.py:208-218).

The triangulator is an independent ear-clipping implementation, NOT a port
of the vendored mapbox earcut: it guarantees the same triangle COUNT and
coverage for simple polygons (n_vertices - 2 + 2*n_holes), which is what
the b3dm byte-layout goldens check; individual diagonals may differ.
"""

from __future__ import annotations

import math
import struct

import numpy as np

_MULTIPOLYGON_Z = (1006, 0x80000006)
_POLYHEDRAL = (1015, 0x8000000F)


def parse_wkb_multipolygon(wkb: bytes) -> list:
    """-> [polygon], polygon = [ring f32 (n,3)], outer ring first."""
    bo = "<" if wkb[0] else ">"
    geomtype = struct.unpack(bo + "I", wkb[1:5])[0]
    has_z = geomtype in _MULTIPOLYGON_Z or geomtype in _POLYHEDRAL
    dim = 3 if has_z else 2
    stride = 8 * dim
    n_geom = struct.unpack(bo + "I", wkb[5:9])[0]
    off = 9
    out = []
    for _ in range(n_geom):
        off += 5                       # byteorder + polygon type
        n_rings = struct.unpack(bo + "I", wkb[off:off + 4])[0]
        off += 4
        polygon = []
        for _ in range(n_rings):
            n_pts = struct.unpack(bo + "I", wkb[off:off + 4])[0]
            off += 4
            flat = np.frombuffer(wkb, dtype=bo + "f8",
                                 count=(n_pts) * dim, offset=off)
            off += n_pts * stride
            ring = flat.reshape(n_pts, dim)[:-1]      # drop closing point
            if dim == 2:
                ring = np.column_stack([ring, np.zeros(len(ring))])
            polygon.append(ring.astype(np.float32))
        out.append(polygon)
    return out


def make_wkb_multipolygon(polygons: list) -> bytes:
    """Inverse of parse: [[ring (n,3) float]] -> little-endian
    MultiPolygonZ WKB (closing point re-added per ring). Test/synthesis
    helper — deterministic fixtures without shipping binary blobs."""
    out = [struct.pack("<bII", 1, 1006, len(polygons))]
    for polygon in polygons:
        out.append(struct.pack("<bII", 1, 1003, len(polygon)))
        for ring in polygon:
            ring = np.asarray(ring, dtype=np.float64)
            closed = np.vstack([ring, ring[:1]])
            out.append(struct.pack("<I", len(closed)))
            out.append(closed.astype("<f8").tobytes())
    return b"".join(out)


def _signed_area(pts2d: np.ndarray) -> float:
    x, y = pts2d[:, 0], pts2d[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _point_in_tri(p, a, b, c) -> bool:
    d1 = (p[0] - b[0]) * (a[1] - b[1]) - (a[0] - b[0]) * (p[1] - b[1])
    d2 = (p[0] - c[0]) * (b[1] - c[1]) - (b[0] - c[0]) * (p[1] - c[1])
    d3 = (p[0] - a[0]) * (c[1] - a[1]) - (c[0] - a[0]) * (p[1] - a[1])
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def _bridge_hole(outer: list, hole: list) -> list:
    """Splice a hole ring into the outer ring via a bridge at the hole's
    max-x vertex (the standard earcut eliminate-holes construction)."""
    hx = max(range(len(hole)), key=lambda i: hole[i][0][0])
    hp = hole[hx][0]
    # candidate outer vertices to the right of the hole point, nearest first
    cands = sorted((i for i in range(len(outer))
                    if outer[i][0][0] >= hp[0]),
                   key=lambda i: (outer[i][0][0] - hp[0]) ** 2
                   + (outer[i][0][1] - hp[1]) ** 2)
    if not cands:
        cands = sorted(range(len(outer)),
                       key=lambda i: (outer[i][0][0] - hp[0]) ** 2
                       + (outer[i][0][1] - hp[1]) ** 2)

    def visible(oi):
        a, b = hp, outer[oi][0]
        for j in range(len(outer)):
            j2 = (j + 1) % len(outer)
            if j == oi or j2 == oi:
                continue
            if _segments_cross(a, b, outer[j][0], outer[j2][0]):
                return False
        return True

    oi = next((i for i in cands if visible(i)), cands[0])
    # outer[0..oi] + hole[hx..] + hole[..hx] + hole[hx] + outer[oi..]
    return (outer[:oi + 1]
            + hole[hx:] + hole[:hx] + [hole[hx]]
            + outer[oi:])


def _segments_cross(a, b, c, d) -> bool:
    def orient(p, q, r):
        v = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
        return 0 if v == 0 else (1 if v > 0 else -1)
    o1, o2 = orient(a, b, c), orient(a, b, d)
    o3, o4 = orient(c, d, a), orient(c, d, b)
    return o1 != o2 and o3 != o4 and 0 not in (o1, o2, o3, o4)


def ear_clip(rings2d: list[np.ndarray],
             grid_threshold: int = 128) -> list[tuple]:
    """Triangulate a polygon (outer ring + holes) given 2D projections.

    rings2d: list of (n,2) float arrays, outer first, rings open.
    Returns triples of (ring_index, vertex_index) ids.

    Rings larger than grid_threshold vertices use a uniform spatial grid
    for the ear-blocker test: only vertices in cells overlapping the
    candidate triangle's bbox are checked, instead of every remaining
    vertex. Exact (bbox covers the triangle), and an independent take on
    the same problem the reference solves with z-order hashing for >80
    vertices (earcut.py:28) — typical cost drops from O(n^2) per ear
    scan to O(n) for coastline-sized rings.
    """
    # orient: outer CCW, holes CW
    labeled = []
    for ri, ring in enumerate(rings2d):
        idxs = list(range(len(ring)))
        area = _signed_area(ring)
        want_ccw = ri == 0
        if (area < 0) == want_ccw:
            idxs = idxs[::-1]
        labeled.append([(np.asarray(ring[i], dtype=np.float64),
                         (ri, i)) for i in idxs])

    chain = labeled[0]
    # bridge holes in decreasing max-x order (earcut's ordering heuristic)
    holes = sorted(labeled[1:],
                   key=lambda h: -max(p[0][0] for p in h))
    for hole in holes:
        chain = _bridge_hole(chain, hole)

    tris = []
    verts = chain[:]

    grid = None
    if len(verts) > grid_threshold:
        pts = np.array([p[0] for p in verts])
        glo = pts.min(axis=0)
        span = float(max(pts[:, 0].max() - glo[0],
                         pts[:, 1].max() - glo[1])) or 1.0
        csize = span / max(1, int(len(verts) ** 0.5))
        grid = {}

        def _cell(x, y):
            return (int((x - glo[0]) / csize), int((y - glo[1]) / csize))

        for w in verts:
            grid.setdefault(_cell(w[0][0], w[0][1]), []).append(w)

        def _grid_drop(w):
            cell = grid[_cell(w[0][0], w[0][1])]
            for j, u in enumerate(cell):
                if u is w:        # identity: bridge endpoints duplicate
                    del cell[j]   # the same tuple object in the chain
                    break

        def _candidates(a, v, b):
            x0, y0 = _cell(min(a[0][0], v[0][0], b[0][0]),
                           min(a[0][1], v[0][1], b[0][1]))
            x1, y1 = _cell(max(a[0][0], v[0][0], b[0][0]),
                           max(a[0][1], v[0][1], b[0][1]))
            for gx in range(x0, x1 + 1):
                for gy in range(y0, y1 + 1):
                    yield from grid.get((gx, gy), ())

    guard = 0
    while len(verts) > 3 and guard < 4 * len(chain) * len(chain):
        n = len(verts)
        clipped = False
        for i in range(n):
            a, v, b = verts[i - 1], verts[i], verts[(i + 1) % n]
            cross = ((v[0][0] - a[0][0]) * (b[0][1] - a[0][1])
                     - (v[0][1] - a[0][1]) * (b[0][0] - a[0][0]))
            if cross <= 0:
                continue                       # reflex or degenerate
            ear = True
            for w in (_candidates(a, v, b) if grid is not None else verts):
                if w[1] in (a[1], v[1], b[1]):
                    continue
                if _point_in_tri(w[0], a[0], v[0], b[0]):
                    ear = False
                    break
            if ear:
                tris.append((a[1], v[1], b[1]))
                if grid is not None:
                    _grid_drop(verts[i])
                del verts[i]
                clipped = True
                break
        guard += 1
        if not clipped:
            # degenerate remainder: fan it (mirrors earcut's tolerance)
            for i in range(1, len(verts) - 1):
                tris.append((verts[0][1], verts[i][1], verts[i + 1][1]))
            verts = verts[:3]
            break
    if len(verts) == 3:
        tris.append((verts[0][1], verts[1][1], verts[2][1]))
    return tris


def triangulate_polygon(polygon: list, data_polygons: list | None = None):
    """[ring f32 (n,3)] -> list of float32 (3,3) triangles, oriented to the
    outer ring's normal (reference triangulate, wkb_utils.py:178-218).

    data_polygons: optional list of SAME-TOPOLOGY polygons carrying
    per-vertex data (e.g. the UV multipolygon the reference threads as
    `additionalPolygons`, wkb_utils.py:210-231): the triangulation indices
    — including the orientation flip — are applied verbatim to each, and
    the return becomes (tris, [data_tris per dataset])."""
    outer = polygon[0]
    v1 = outer[1] - outer[0]
    v2 = outer[2] - outer[0]
    normal = np.cross(v1.astype(np.float64), v2.astype(np.float64))
    ax, ay, az = abs(normal[0]), abs(normal[1]), abs(normal[2])
    if ax > ay and ax > az:
        proj = (1, 2)          # (yz)
    elif ay > az:
        proj = (0, 2)          # (zx)
    else:
        proj = (0, 1)          # (xy)
    rings2d = [np.asarray(r, dtype=np.float64)[:, proj] for r in polygon]
    tris_idx = ear_clip(rings2d)
    out = []
    extra = [[] for _ in (data_polygons or [])]
    for (r0, i0), (r1, i1), (r2, i2) in tris_idx:
        p0 = polygon[r0][i0]
        p1 = polygon[r1][i1]
        p2 = polygon[r2][i2]
        cross = np.cross((p1 - p0).astype(np.float64),
                         (p2 - p0).astype(np.float64))
        invert = float(np.dot(normal, cross)) < 0
        if invert:
            out.append(np.stack([p1, p0, p2]))
        else:
            out.append(np.stack([p0, p1, p2]))
        for arr, dp in zip(extra, data_polygons or []):
            q0, q1, q2 = dp[r0][i0], dp[r1][i1], dp[r2][i2]
            arr.append(np.stack([q1, q0, q2] if invert else [q0, q1, q2]))
    if data_polygons is None:
        return out
    return out, extra


def wkb_to_triangles(wkb: bytes, associated: list | None = None):
    """MultiPolygon WKB -> flat list of float32 (3,3) triangles.
    `associated`: optional list of same-topology multipolygon WKBs
    (per-vertex data, e.g. UVs — reference
    TriangleSoup.from_wkb_multipolygon's associatedData,
    wkb_utils.py:12-55); when given, returns (tris, [data_tris per
    associated wkb]) with identical indices/orientation."""
    if associated is None:
        tris = []
        for polygon in parse_wkb_multipolygon(wkb):
            if len(polygon[0]) < 3:
                continue
            tris.extend(triangulate_polygon(polygon))
        return tris
    data_mps = [parse_wkb_multipolygon(a) for a in associated]
    tris = []
    extras = [[] for _ in associated]
    for pi, polygon in enumerate(parse_wkb_multipolygon(wkb)):
        if len(polygon[0]) < 3:
            continue
        t, e = triangulate_polygon(polygon, [mp[pi] for mp in data_mps])
        tris.extend(t)
        for acc, part in zip(extras, e):
            acc.extend(part)
    return tris, extras


def triangles_to_arrays(tris: list):
    """-> (positions bytes f32 xyz*3 per tri, normals bytes (per-vertex,
    face normal repeated), bbox [[min],[max]]) — the TriangleSoup
    getPositionArray/getNormalArray/getBbox trio (wkb_utils.py:57-121)."""
    if not tris:
        z = np.zeros((0, 3), dtype=np.float32)
        return z.tobytes(), z.tobytes(), [[0, 0, 0], [0, 0, 0]]
    stack = np.stack(tris).astype(np.float32)         # (T,3,3)
    positions = stack.reshape(-1, 3)
    u = stack[:, 1] - stack[:, 0]
    v = stack[:, 2] - stack[:, 0]
    n = np.cross(u, v)
    norms = np.linalg.norm(n, axis=1)
    n = np.where(norms[:, None] == 0, np.array([0, 0, 1], dtype=np.float32),
                 n / np.where(norms == 0, 1, norms)[:, None]).astype(np.float32)
    normals = np.repeat(n, 3, axis=0)
    bbox = [positions.min(axis=0).astype(float).tolist(),
            positions.max(axis=0).astype(float).tolist()]
    return positions.tobytes(), normals.tobytes(), bbox


def data_triangles_to_array(tris: list, dim: int = 2) -> bytes:
    """Per-vertex data triangles -> f32 bytes keeping the first `dim`
    components per vertex (UVs: dim=2) — TriangleSoup.getDataArray
    (wkb_utils.py:71-85); 2D WKB parses with a padded zero z that is
    dropped here."""
    if not tris:
        return b""
    stack = np.stack(tris).astype(np.float32)         # (T,3,C)
    return np.ascontiguousarray(stack[:, :, :dim]).reshape(-1).tobytes()
