"""Golden tests: the distributed engine must reproduce the canonical replay
(single-threaded reference semantics) tile-for-tile, point-for-point —
the exact-tile-assignment requirement of BASELINE.json."""

import numpy as np
import pytest

from py3dtiles_spark.operators.replay import replay_tiling
from py3dtiles_spark.operators.tiling import (
    TilingConfig, build_tiling, cleanup_checkpoint, compute_root_aabb)
from py3dtiles_spark.sources.ripple import ripple_cloud


def _points_df(spark, ids, xyz):
    import pandas as pd
    pdf = pd.DataFrame({"point_id": ids,
                        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2]})
    return spark.createDataFrame(pdf).repartition(8)


def _engine_assignments(spark, ids, xyz, cfg):
    df = _points_df(spark, ids, xyz)
    res = build_tiling(spark, df, cfg)
    rows = res.assignments.collect()
    got = {r.point_id: r.tile_id for r in rows}
    return got, res


@pytest.mark.parametrize("z_scale,label", [(1.0, "quadtree-flat"),
                                           (20.0, "octree-tall")])
def test_engine_matches_replay(spark, z_scale, label, tmp_path):
    ids, xyz = ripple_cloud(30_000, z_scale=z_scale)
    expected, _, _ = replay_tiling(ids, xyz, split_threshold=2000)

    cfg = TilingConfig(split_threshold=2000, in_kernel_threshold=6000,
                       checkpoint_dir=str(tmp_path / label))
    got, res = _engine_assignments(spark, ids, xyz, cfg)

    assert len(got) == len(ids)
    exp = {int(i): t for i, t in zip(ids, expected)}
    mismatches = {i: (exp[i], got[i]) for i in exp if exp[i] != got[i]}
    assert not mismatches, f"{len(mismatches)} mismatched assignments, e.g. " \
                           f"{list(mismatches.items())[:5]}"
    assert res.counters["points_assigned"] == len(ids)
    cleanup_checkpoint(res)


def test_engine_all_local_path(spark, tmp_path):
    """With a huge in-kernel threshold the whole tree builds in one task —
    must equal the multi-shuffle cell path."""
    ids, xyz = ripple_cloud(12_000)
    expected, _, _ = replay_tiling(ids, xyz, split_threshold=1500)
    cfg = TilingConfig(split_threshold=1500, in_kernel_threshold=10**9,
                       checkpoint_dir=str(tmp_path / "local"))
    got, res = _engine_assignments(spark, ids, xyz, cfg)
    assert all(got[int(i)] == t for i, t in zip(ids, expected))
    cleanup_checkpoint(res)


def test_root_aabb_and_leaf_small_cloud(spark, tmp_path):
    """The root never retains points (reference node_process.py:88,109):
    even a tiny cloud routes to depth-1 leaves, exactly like the reference
    (its ripple.las conversion produces r0.pnts, tests/test_convert.py)."""
    ids, xyz = ripple_cloud(500)
    df = _points_df(spark, ids, xyz)
    aabb, spacing = compute_root_aabb(df)
    np.testing.assert_allclose(aabb[0], xyz.min(axis=0), rtol=1e-6)
    np.testing.assert_allclose(aabb[1], xyz.max(axis=0), rtol=1e-6)

    cfg = TilingConfig(checkpoint_dir=str(tmp_path / "leaf"))
    got, res = _engine_assignments(spark, ids, xyz, cfg)
    tiles = set(got.values())
    assert "" not in tiles
    assert tiles <= set("01234567") and len(tiles) >= 2
    cleanup_checkpoint(res)


def test_resume_from_checkpoint(spark, tmp_path):
    """Interrupt after level 0, resume, and still match the replay exactly
    (the north_rule resumability requirement)."""
    ids, xyz = ripple_cloud(20_000)
    expected, _, _ = replay_tiling(ids, xyz, split_threshold=1500)

    ckpt = str(tmp_path / "resume")
    cfg1 = TilingConfig(split_threshold=1500, in_kernel_threshold=3000,
                        checkpoint_dir=ckpt, max_levels=1)
    df = _points_df(spark, ids, xyz)
    partial = build_tiling(spark, df, cfg1)
    assert not partial.counters["complete"]

    cfg2 = TilingConfig(split_threshold=1500, in_kernel_threshold=3000,
                        checkpoint_dir=ckpt)
    res = build_tiling(spark, df, cfg2, resume=True)
    assert res.counters["complete"]
    assert res.counters["levels"][0]["level"] == 0  # counters carried over
    got = {r.point_id: r.tile_id for r in res.assignments.collect()}
    assert all(got[int(i)] == t for i, t in zip(ids, expected))
    cleanup_checkpoint(res)


def test_express_mode_matches_replay(spark, tmp_path):
    """A megacity-style node far above the local cutoff goes through the
    'express' kernel (chain + spread re-emit) — must equal the replay."""
    rng = np.random.default_rng(11)
    n = 30_000
    xyz = np.empty((n, 3), dtype=np.float32)
    xyz[:, 0] = rng.uniform(0, 100, n)
    xyz[:, 1] = rng.uniform(0, 100, n)
    xyz[:, 2] = rng.uniform(0, 1, n)
    hot = rng.random(n) < 0.6
    xyz[hot, 0] = 20.0 + rng.uniform(-0.01, 0.01, hot.sum())
    xyz[hot, 1] = 30.0 + rng.uniform(-0.01, 0.01, hot.sum())
    ids = np.arange(n, dtype=np.int64)
    expected, _, _ = replay_tiling(ids, xyz, split_threshold=500)
    cfg = TilingConfig(split_threshold=500, in_kernel_threshold=1000,
                       local_hard_cap=2000,
                       checkpoint_dir=str(tmp_path / "exp"))
    got, res = _engine_assignments(spark, ids, xyz, cfg)
    modes = [m for s in res.counters["levels"] for m in s["modes"]]
    assert "express" in modes            # the hot cluster took the new path
    assert all(got[int(i)] == t for i, t in zip(ids, expected))
    cleanup_checkpoint(res)


def test_distributed_routing_over_cap(spark, tmp_path):
    """node_broadcast_rows below the live-node count forces the fully
    distributed routing path (shuffled node_meta join, histogram-only
    driver traffic) — must produce the exact same assignments as the
    LocalRelation broadcast path."""
    ids, xyz = ripple_cloud(30_000)
    expected, _, _ = replay_tiling(ids, xyz, split_threshold=2000)
    cfg = TilingConfig(split_threshold=2000, in_kernel_threshold=6000,
                       node_broadcast_rows=2,
                       checkpoint_dir=str(tmp_path / "overcap"))
    got, res = _engine_assignments(spark, ids, xyz, cfg)
    exp = {int(i): t for i, t in zip(ids, expected)}
    mismatches = {i: (exp[i], got[i]) for i in exp if exp[i] != got[i]}
    assert not mismatches, f"{len(mismatches)} mismatches, e.g. " \
                           f"{list(mismatches.items())[:5]}"
    assert res.counters["points_assigned"] == len(ids)
    cleanup_checkpoint(res)


def test_resume_missing_level_raises(spark, tmp_path):
    """ADVICE r4: resuming from a checkpoint whose claimed level dir was
    never written must raise, not silently complete with empty pending."""
    import json

    ckpt = tmp_path / "bad_resume"
    ckpt.mkdir()
    (ckpt / "meta.json").write_text(json.dumps(
        {"root_aabb": [[0, 0, 0], [1, 1, 1]], "root_spacing": 0.25,
         "scale": 1.0}))
    lv = ckpt / "level=0"
    lv.mkdir()
    (lv / "_MANIFEST.json").write_text(json.dumps(
        {"level": 0, "points_in": 10, "nodes": 1, "modes": {"cell": 1}}))
    # manifest says level 0 completed, but level=0/out was never written
    ids, xyz = ripple_cloud(100)
    df = _points_df(spark, ids, xyz)
    with pytest.raises(FileNotFoundError, match="does not exist"):
        build_tiling(spark, df,
                     TilingConfig(checkpoint_dir=str(ckpt)), resume=True)


def test_node_meta_df_matches_driver_rules(spark):
    """The distributed routing plan (_node_meta_df) and the driver-side
    rules (_node_meta_rows) must agree node-for-node — mode AND cell grid
    constants — on a randomized node population covering all four modes."""
    import numpy as np
    import pandas as pd
    from py3dtiles_spark.operators.tiling import (
        TilingConfig, _local_cutoff, _node_meta_df, _node_meta_rows)

    rng = np.random.default_rng(13)
    root_aabb = np.array([[0.0, 0.0, 0.0], [64.0, 64.0, 32.0]])
    root_spacing = 0.25
    cfg = TilingConfig(split_threshold=2000, in_kernel_threshold=6000,
                       local_hard_cap=50_000)
    rows = []
    for i in range(120):
        depth = int(rng.integers(0, 6))
        tid = "".join(str(d) for d in rng.integers(0, 8, depth))
        cnt = int(rng.choice([50, 1999, 2000, 5999, 6001, 30_000,
                              60_000, 400_000]))
        # half the big nodes get a tight bbox (single-child -> express)
        lo = rng.uniform(0, 60, 3)
        hi = lo + (rng.uniform(0.01, 0.2, 3) if rng.random() < 0.5
                   else rng.uniform(20, 40, 3))
        rows.append((tid, cnt, *lo.astype(np.float32),
                     *np.minimum(hi, 64).astype(np.float32)))
    pdf = pd.DataFrame(rows, columns=["tile_id", "cnt", "bx0", "by0",
                                      "bz0", "bx1", "by1", "bz1"])
    pdf = pdf.drop_duplicates("tile_id")
    total = int(pdf["cnt"].sum())
    cutoff = _local_cutoff(cfg, total, 8)

    counts = spark.createDataFrame(pdf)
    got = {r["tile_id"]: r for r in _node_meta_df(
        counts, cfg, root_aabb, root_spacing, cutoff).collect()}
    exp_rows = _node_meta_rows(
        [r._asdict() if hasattr(r, "_asdict") else dict(r)
         for r in pdf.to_dict("records")],
        cfg, root_aabb, root_spacing, cutoff)
    assert len(got) == len(exp_rows)
    modes_seen = set()
    for tid, mode, mnx, mny, mnz, sx, sy, sz in exp_rows:
        g = got[tid]
        assert g["mode"] == mode, (tid, g["mode"], mode)
        modes_seen.add(mode)
        if mode == "cell":
            assert (g["mnx"], g["mny"], g["mnz"]) == (mnx, mny, mnz), tid
            assert (g["sx"], g["sy"], g["sz"]) == (sx, sy, sz), tid
    assert {"leaf", "local", "cell", "express"} <= modes_seen
