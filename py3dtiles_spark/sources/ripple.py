"""Ripple point cloud generator (FIXTURES.md §2, mirrors tests/ripple.las).

Deterministic numpy generation; used by the golden octree tests. The flat
ripple (z extent << x/y extent) exercises the quadtree switch
(reference points/utils.py:47-51); a scaled-z variant exercises octree mode.
"""

from __future__ import annotations

import numpy as np


def ripple_cloud(n: int, z_scale: float = 1.0, seed: int = 42):
    """Returns (point_ids int64 (n,), xyz float32 (n,3))."""
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0.0, 10.0, size=(n, 2))
    r = np.hypot(xy[:, 0] - 5.0, xy[:, 1] - 5.0)
    z = np.sin(r) / (1.0 + r) * z_scale
    xyz = np.column_stack([xy, z]).astype(np.float32)
    return np.arange(n, dtype=np.int64), xyz
