"""Distributed octree/quadtree LOD tiling — the flagship engine.

Spark-first re-expression of the reference tiler (py3dtiles/convert.py:318-673
master/worker loop). The reference shuffles point batches between processes
over ZMQ keyed by node name; here each "ZMQ hop" is one Spark shuffle and the
build is a level-synchronous iteration (SURVEY.md §3.1 "Spark shape").

Per level, exactly TWO jobs:

  1. routing: groupBy(tile_id).agg(count, bbox) — one row per live node,
     fetched through a BOUNDED limit probe (r5): levels under
     node_broadcast_rows route driver-side over O(cap) rows (pure-JVM
     probe job, LocalRelation broadcast — the fast common case); over-cap
     levels run the SAME rule as a distributed DataFrame plan
     (_node_meta_df: native when() + an Arrow kernel for big-node rows)
     and the driver sees just the <=4-row per-mode histogram. Modes:
       leaf   count < 20000 or spacing floor  -> accept all (node.py:70-73)
       local  count <= in_kernel_threshold    -> one task recurses the WHOLE
              subtree (the reference's depth-limited pipelining,
              node_process.py:82-90, taken to its limit: zero further
              shuffles for that subtree)
       cell   huge node -> fan out by LOD-grid cell: the acceptance test is
              per-cell independent (points_grid.py:22-31 scans only the
              same cell), so a hot node runs as 27+ parallel tasks instead
              of serializing on one worker — the skew answer for megacity
              cells at 10^12 docs.
     and, for cell nodes, derives the float32 grid constants from the tile
     name (stateless, points/utils.py:83-88).

  2. kernel: ONE shuffle on (tile_id, group_key) — group_key is the grid
     cell for 'cell' nodes (computed NATIVELY in float32 column arithmetic,
     bit-identical to the numpy kernel; no Python pre-pass) and 0 otherwise
     — into ONE applyInPandas kernel handling all three modes, written ONCE
     to parquet. That parquet is the per-level checkpoint: resumable,
     lineage-truncating; accepted rows and next-level forwards are both
     filters over it (no extra writes).

Points are carried NARROW through the loop (point_id + xyz float32 only);
payload columns (url, html, text...) are joined back once at the end — at
100 TB you never shuffle the html through the tree.

Driver traffic is BOUNDED by node_broadcast_rows (~12 MB at the default
200k): at 10^12 docs a level can hold ~5e7 live nodes, which would make
an unbounded driver collect the reference master's State-dict bottleneck
reborn (convert.py:217-239) — those levels stay distributed (shuffled
node_meta join; only the per-mode histogram is collected for loop
termination and the manifest).

Counters (points in / nodes / modes / phase seconds per level) land in a
manifest JSON per level; the written==read invariant of the reference
(convert.py:652-653) is asserted on completion.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from py3dtiles_spark.functions.geometry import (
    GRID_INITIAL_CELL_COUNT,
    MIN_SPACING,
    SPLIT_THRESHOLD,
    cell_keys_for_node,
    node_frame,
    sequential_accept,
    child_index_for_node,
    compute_spacing,
)
from py3dtiles_spark.operators.replay import assign_subtree

PENDING_SCHEMA = "point_id long, x float, y float, z float, tile_id string"
KERNEL_SCHEMA = PENDING_SCHEMA + ", accepted boolean"
ASSIGN_SCHEMA = "point_id long, tile_id string"

# node_meta columns (produced by _node_meta_df): mn* grid aabb_min
# (float32, reference Grid constant); s* cell_count * inv_aabb_size —
# DOUBLE because the reference numba kernel promotes int32 * float32 to
# float64 (distance.py:24-27)
_NODE_META_SCHEMA = ("tile_id string, mode string, "
                     "mnx float, mny float, mnz float, "
                     "sx double, sy double, sz double")


@dataclass
class TilingConfig:
    scale: float = 1.0
    split_threshold: int = SPLIT_THRESHOLD
    # nodes at or below this size finish their whole subtree in one task;
    # keep near 2x split_threshold so big nodes keep fanning out per-cell
    in_kernel_threshold: int = 40_000
    # once a level has enough nodes to saturate the cluster, nodes up to
    # this many rows resolve their whole subtree in-task (local mode)
    # instead of paying shuffle+Arrow plumbing for every remaining level.
    # The effective local cutoff is
    #   max(in_kernel_threshold,
    #       min(local_hard_cap, level_points / (local_parallelism_factor *
    #                                           defaultParallelism)))
    # factor 1 (one local task's rows ~= one core's fair share) measured
    # strictly better than 2 at 1.6M docs/skew: level count 5 -> 2 (megacity
    # nodes resolve their whole chain in-task via express descent instead of
    # shuffling every level) and 8-core wall time -23%. The hard cap bounds
    # any single local task (a megacity node as one task = a multi-second
    # straggler that caps scaling); nodes above it fan out per cell.
    local_hard_cap: int = 300_000
    local_parallelism_factor: int = 1
    # parallelism used for the local-cutoff rule. None = the session's
    # defaultParallelism; set a fixed value to make the level plan
    # independent of the core count (identical plans across cluster sizes,
    # required for apples-to-apples scaling measurements)
    plan_parallelism: Optional[int] = None
    max_levels: int = 32
    checkpoint_dir: Optional[str] = None
    # "parquet": every level lands on storage (resumable, lineage-truncating
    #   — the 100 TB default: at cluster scale the level snapshot IS the
    #   recovery unit and feeds the final assignment read).
    # "memory": per-level persist(MEMORY_AND_DISK) instead of parquet —
    #   the classic Spark iterative-algorithm shape; no per-level file
    #   round-trip (2x less I/O + page churn per level), but not resumable
    #   across driver restarts. Right choice for ephemeral/benchmark runs.
    checkpoint: str = "parquet"
    # optional approximation for extreme scale: only the first N canonical
    # points per (node, cell) run the sequential accept loop; the rest are
    # forwarded as rejected. None = exact reference semantics.
    grid_sample_cap: Optional[int] = None
    cell_count: int = GRID_INITIAL_CELL_COUNT
    # levels whose routed node list fits in this many rows ride to the
    # executors as a LocalRelation broadcast (no extra job, no broadcast
    # exchange — the sandbox/common case); bigger levels NEVER reach the
    # driver: their node_meta stays a distributed frame and joins to
    # pending with a shuffled join (the right call anyway — at ~5e7 nodes
    # the list is GBs, far past broadcast territory). 200k rows ~= 12 MB
    # driver-side, a hard bound independent of data scale.
    node_broadcast_rows: int = 200_000
    # explicit root geometry (float64 (2,3) + spacing). The LAS/XYZ convert
    # plan passes the header-derived float64 aabb here for exact reference
    # parity (convert.py:420-437); None = one agg pass over the points.
    root_aabb: Optional[object] = None
    root_spacing: Optional[float] = None


@dataclass
class TilingResult:
    assignments: DataFrame          # (point_id, tile_id)
    root_aabb: np.ndarray
    root_spacing: float
    counters: dict = field(default_factory=dict)
    checkpoint_dir: str = ""


def compute_root_aabb(points: DataFrame):
    """One aggregation pass over the cloud (reference las_reader.init
    header scan, las_reader.py:27-32). Returns (aabb float32 (2,3), spacing)."""
    row = points.agg(
        F.min("x"), F.min("y"), F.min("z"),
        F.max("x"), F.max("y"), F.max("z"),
    ).collect()[0]
    aabb = np.array([[row[0], row[1], row[2]], [row[3], row[4], row[5]]],
                    dtype=np.float32)
    return aabb, compute_spacing(aabb)


def _unified_kernel(cfg: TilingConfig, root_aabb, root_spacing):
    """One grouped-map kernel for all three node modes. The group is
    (tile_id, group_key); `mode` rides as a column (constant per group)."""
    cap = cfg.grid_sample_cap

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        mode = pdf["mode"].iat[0]
        tile_id = pdf["tile_id"].iat[0]
        base = pdf[["point_id", "x", "y", "z", "tile_id"]]
        if mode == "leaf":
            out = base.copy()
            out["accepted"] = True
            return out
        if mode == "local":
            pdf = pdf.sort_values("point_id", kind="stable")
            ids = pdf["point_id"].to_numpy()
            xyz = pdf[["x", "y", "z"]].to_numpy(dtype=np.float32)
            tiles = assign_subtree(ids, xyz, tile_id, root_aabb,
                                   root_spacing, cfg.scale,
                                   cfg.split_threshold)
            return pd.DataFrame({
                "point_id": ids,
                "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
                "tile_id": tiles, "accepted": True})
        if mode == "express":
            # single-child descent for hot clustered nodes (megacities):
            # this group holds the node's ENTIRE point set, and as long as
            # every remaining point maps to ONE child octant, descendants
            # of tid can receive points only from here — so the kernel may
            # run the per-level accept AND descend in-task, level after
            # level, until the cluster finally spreads over >1 child. At
            # that point the remainder re-emits as pending and the normal
            # cell/local fan-out parallelizes it. Collapses the reference's
            # deep hot-cell chains (one shuffle round TOTAL instead of one
            # per level) without a multi-second monolithic local task.
            from py3dtiles_spark.functions.geometry import accept_mask_for_cells
            pdf = base.sort_values("point_id", kind="stable").reset_index(drop=True)
            ids = pdf["point_id"].to_numpy()
            xyz = pdf[["x", "y", "z"]].to_numpy(dtype=np.float32)
            n = len(pdf)
            out_tiles = np.empty(n, dtype=object)
            acc = np.zeros(n, dtype=bool)
            tid = tile_id
            live = np.arange(n)
            while live.size:
                frame = node_frame(tid, root_aabb, root_spacing)
                spacing = frame.spacing
                if (live.size < cfg.split_threshold
                        or spacing <= MIN_SPACING * cfg.scale):
                    out_tiles[live] = tid
                    acc[live] = True
                    break
                if live.size <= cfg.in_kernel_threshold:
                    out_tiles[live] = assign_subtree(
                        ids[live], xyz[live], tid, root_aabb,
                        root_spacing, cfg.scale, cfg.split_threshold)
                    acc[live] = True
                    break
                pts = xyz[live]
                corners = np.stack([pts.min(axis=0),
                                    pts.max(axis=0)]).astype(np.float32)
                cd = child_index_for_node(corners, frame)
                single_child = cd[0] == cd[1]
                if not single_child and tid != tile_id:
                    out_tiles[live] = tid        # pending at spread depth
                    break
                keys = cell_keys_for_node(pts, frame)
                mask = accept_mask_for_cells(pts, keys, spacing * spacing)
                out_tiles[live[mask]] = tid
                acc[live[mask]] = True
                rej = live[~mask]
                if rej.size == 0:
                    break
                if single_child:
                    live = rej
                    tid = tid + str(cd[0])
                    continue
                # first level already spreads: route per child and emit
                digits = child_index_for_node(xyz[rej], frame)
                out_tiles[rej] = [tid + str(d) for d in digits]
                live = np.empty(0, dtype=np.int64)
            return pd.DataFrame({
                "point_id": ids,
                "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
                "tile_id": out_tiles, "accepted": acc})
        # cell mode: canonical-order accept within one grid cell
        pdf = base.sort_values("point_id", kind="stable").reset_index(drop=True)
        frame = node_frame(tile_id, root_aabb, root_spacing)
        xyz = pdf[["x", "y", "z"]].to_numpy(dtype=np.float32)
        sq = frame.spacing * frame.spacing
        if cap is not None and len(pdf) > cap:
            accept = np.zeros(len(pdf), dtype=bool)
            accept[:cap] = sequential_accept(xyz[:cap], sq)
        else:
            accept = sequential_accept(xyz, sq)
        out = pdf.copy()
        out["accepted"] = accept
        rej = ~accept
        if rej.any():
            digits = child_index_for_node(xyz[rej], frame)
            out.loc[rej, "tile_id"] = [tile_id + str(d) for d in digits]
        return out

    return kernel


def _node_meta_rows(counts_rows, cfg: TilingConfig, root_aabb, root_spacing,
                    local_cutoff: int):
    """Driver-side routing for a BOUNDED node list (<= node_broadcast_rows,
    fetched via the limit probe): per live node -> mode + grid constants
    for cell nodes (aabb_min float32, scale = cell_count * inv_aabb_size
    float64 — the reference kernel's exact promotion). Pure-JVM probe job
    + O(cap) python beats the distributed plan's extra Arrow-UDF job by
    ~35% flagship wall at sandbox scale (r5 A/B); _node_meta_df is the
    SAME rule as a DataFrame plan for over-cap levels. Keep the two in
    lockstep (the over-cap golden test pins their agreement)."""
    spacing_floor = MIN_SPACING * cfg.scale
    rows = []
    for r in counts_rows:
        tid, cnt = r["tile_id"], r["cnt"]
        spacing = root_spacing * (0.5 ** len(tid))
        if cnt < cfg.split_threshold or spacing <= spacing_floor:
            rows.append((tid, "leaf", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
            continue
        if cnt > cfg.in_kernel_threshold:
            # clustered-node check: a node whose whole bbox maps into ONE
            # child octant (megacity cluster) runs 'express' — accept AND
            # descend in-task, one shuffle round for the entire hot chain
            frame = node_frame(tid, root_aabb, root_spacing)
            corners = np.array([[r["bx0"], r["by0"], r["bz0"]],
                                [r["bx1"], r["by1"], r["bz1"]]],
                               dtype=np.float32)
            cd = child_index_for_node(corners, frame)
            if cd[0] == cd[1]:
                rows.append((tid, "express", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
                continue
        if cnt <= local_cutoff:
            rows.append((tid, "local", 0.0, 0.0, 0.0, 0.0, 0.0, 0.0))
        else:
            frame = node_frame(tid, root_aabb, root_spacing)
            inv = np.float32(1.0) / frame.size          # f32 (node.py:30)
            scale = (np.array([cfg.cell_count] * 3, dtype=np.int32)
                     * inv)                             # int32*f32 -> f64
            rows.append((tid, "cell",
                         float(frame.aabb[0][0]), float(frame.aabb[0][1]),
                         float(frame.aabb[0][2]),
                         float(scale[0]), float(scale[1]), float(scale[2])))
    return rows


def _node_geom_udf(cfg: TilingConfig, root_aabb, root_spacing):
    """Arrow-batched per-node geometry for the big-node rows only
    (`need`=true, i.e. non-leaf with cnt > in_kernel_threshold): the
    express single-child corner test plus the cell-grid constants
    (aabb_min float32, scale = cell_count * inv_aabb_size float64 — the
    reference kernel's exact promotion, node.py:30 / distance.py:24-27).
    Node-count sized, never point-count sized."""
    cell_count = cfg.cell_count
    ra = np.asarray(root_aabb, dtype=np.float64)
    rs = float(root_spacing)

    @F.pandas_udf("express boolean, mnx float, mny float, mnz float, "
                  "sx double, sy double, sz double")
    def geom(tile_id: pd.Series, need: pd.Series,
             bx0: pd.Series, by0: pd.Series, bz0: pd.Series,
             bx1: pd.Series, by1: pd.Series,
             bz1: pd.Series) -> pd.DataFrame:
        n = len(tile_id)
        out = {"express": np.zeros(n, dtype=bool),
               "mnx": np.zeros(n, np.float32),
               "mny": np.zeros(n, np.float32),
               "mnz": np.zeros(n, np.float32),
               "sx": np.zeros(n, np.float64),
               "sy": np.zeros(n, np.float64),
               "sz": np.zeros(n, np.float64)}
        for i in np.flatnonzero(need.to_numpy()):
            frame = node_frame(tile_id.iat[i], ra, rs)
            corners = np.array([[bx0.iat[i], by0.iat[i], bz0.iat[i]],
                                [bx1.iat[i], by1.iat[i], bz1.iat[i]]],
                               dtype=np.float32)
            cd = child_index_for_node(corners, frame)
            if cd[0] == cd[1]:
                out["express"][i] = True
                continue
            inv = np.float32(1.0) / frame.size          # f32 (node.py:30)
            scale = (np.array([cell_count] * 3, dtype=np.int32)
                     * inv)                             # int32*f32 -> f64
            out["mnx"][i], out["mny"][i], out["mnz"][i] = frame.aabb[0]
            out["sx"][i], out["sy"][i], out["sz"][i] = scale
        return pd.DataFrame(out)

    return geom


def _local_cutoff(cfg: TilingConfig, est_total: Optional[int],
                  parallelism: int) -> int:
    """Effective local-mode cutoff (see TilingConfig). `est_total` is the
    level's point total — known exactly on the driver as the PREVIOUS
    level's points_in (each level's input is a subset of the prior one),
    None for level 0 / resume without manifests, where the conservative
    in_kernel_threshold applies. The estimate can only overshoot, which
    only ever nudges a would-be 'cell' node to 'local' — a plan heuristic,
    never a semantics change (every mode computes identical assignments).
    For any level with total <= in_kernel_threshold * parallelism (all
    sandbox workloads) the estimate and the exact value produce the SAME
    cutoff, so plans are bit-identical to the exact-total rule there."""
    if est_total is None:
        return cfg.in_kernel_threshold
    den = max(1, cfg.local_parallelism_factor * parallelism)
    return max(cfg.in_kernel_threshold,
               min(cfg.local_hard_cap, est_total // den))


def _node_meta_df(counts: DataFrame, cfg: TilingConfig, root_aabb,
                  root_spacing, local_cutoff: int) -> DataFrame:
    """Distributed node routing: per live node -> mode (+ grid constants
    for cell nodes). The r1-r4 engine collected the per-level node list to
    the driver and rebuilt it row-by-row — fine at sandbox scale but the
    reference master's State dict reborn: at 10^12 points a level can hold
    ~5x10^7 live nodes. Here the routing is a DataFrame plan over the
    (tile_id, cnt, bbox) aggregate:

      leaf / local / cell         native when() over cnt + name-derived
                                  spacing (pow(0.5, length(tile_id)))
      express corner test +       Arrow kernel over ONLY the big-node rows
      cell grid constants         (_node_geom_udf)

    build_tiling fetches the result through a BOUNDED limit probe
    (node_broadcast_rows); an over-cap level never reaches the driver.

    Mode rule (identical to r4, reference node.py:70-73 +
    node_process.py:82-90 generalized):
      leaf     cnt < split_threshold or spacing <= floor -> accept all
      express  big node whose bbox sits in ONE child octant
      local    cnt <= local_cutoff -> whole subtree in one task
      cell     fan out per LOD-grid cell
    """
    spacing_floor = float(MIN_SPACING * cfg.scale)
    c = counts
    spacing = (F.lit(float(root_spacing))
               * F.pow(F.lit(0.5), F.length("tile_id")))
    is_leaf = ((F.col("cnt") < int(cfg.split_threshold))
               | (spacing <= F.lit(spacing_floor)))
    need_geom = (~is_leaf) & (F.col("cnt") > int(cfg.in_kernel_threshold))

    geom = _node_geom_udf(cfg, root_aabb, root_spacing)
    c = c.withColumn("g", geom(
        F.col("tile_id"), need_geom,
        F.col("bx0"), F.col("by0"), F.col("bz0"),
        F.col("bx1"), F.col("by1"), F.col("bz1")))
    mode = (F.when(is_leaf, F.lit("leaf"))
            .when(need_geom & F.col("g.express"), F.lit("express"))
            .when(F.col("cnt") <= F.lit(int(local_cutoff)), F.lit("local"))
            .otherwise(F.lit("cell")))
    return c.select(
        "tile_id", mode.alias("mode"), "cnt",
        F.col("g.mnx").alias("mnx"), F.col("g.mny").alias("mny"),
        F.col("g.mnz").alias("mnz"),
        F.col("g.sx").alias("sx"), F.col("g.sy").alias("sy"),
        F.col("g.sz").alias("sz"))


def _root_route_expr(root_aabb, root_spacing):
    """Depth-1 octant digit as a native column expression (the reference's
    xyz_to_child_index vs the root center with the quadtree z-trick,
    node.py:123-131). Comparing the float32 column against the exact
    float32 center literal is equivalent to the reference's
    (xyz - center) >= 0 float32 test (nearby-operand subtraction is exact,
    and rounding never flips the sign of a nonzero difference)."""
    from py3dtiles_spark.functions.geometry import (
        QUADTREE, node_frame, subdivision_type)
    frame = node_frame("", root_aabb, root_spacing)
    cx, cy = float(frame.center[0]), float(frame.center[1])
    cz = (float(frame.aabb[1][2])
          if subdivision_type(frame.size) == QUADTREE
          else float(frame.center[2]))
    digit = ((F.col("x") >= cx).cast("int") * 4
             + (F.col("y") >= cy).cast("int") * 2
             + (F.col("z") >= cz).cast("int"))
    return digit.cast("string")


def _native_cell_key(cfg: TilingConfig):
    """group_key as a native column expression mirroring the reference
    xyz_to_key promotion exactly (distance.py:24-32): the DOUBLE scale
    column (int32 cell_count * float32 inv -> f64) times the FLOAT
    (xyz - aabb_min) difference widened to double (exact), truncated to
    long and clamped, packed y<<s | z<<2s. Keeping the product in f64
    matches the numpy/numba kernel bit-for-bit on boundary points where a
    float32 product would round 0.99999997 up to 1.0."""
    c = cfg.cell_count
    shift = int(c - 1).bit_length()

    def axis(col, mn, sc):
        diff = (F.col(col).cast("float") - F.col(mn).cast("float")).cast("float")
        prod = F.col(sc) * diff.cast("double")
        return F.least(F.greatest(prod.cast("long"), F.lit(0)), F.lit(c - 1))

    key = (axis("x", "mnx", "sx")
           + F.shiftleft(axis("y", "mny", "sy"), shift)
           + F.shiftleft(axis("z", "mnz", "sz"), 2 * shift))
    return F.when(F.col("mode") == "cell", key).otherwise(F.lit(0))


def build_tiling(spark: SparkSession, points: DataFrame,
                 cfg: TilingConfig | None = None,
                 resume: bool = False) -> TilingResult:
    """Run the level-synchronous octree build.

    points: DataFrame with (point_id: long, x, y, z numeric). Extra columns
    are dropped (join payload back on point_id afterwards).
    """
    cfg = cfg or TilingConfig()
    memory_mode = cfg.checkpoint == "memory"
    if memory_mode and resume:
        raise ValueError("resume=True requires checkpoint='parquet'")
    ckpt = cfg.checkpoint_dir or tempfile.mkdtemp(prefix="tiling_ckpt_")
    os.makedirs(ckpt, exist_ok=True)

    narrow = points.select(
        F.col("point_id").cast("long"),
        F.col("x").cast("float"), F.col("y").cast("float"),
        F.col("z").cast("float"),
    )

    meta_path = os.path.join(ckpt, "meta.json")
    start_level = 0
    counters: dict = {"levels": []}
    input_cached = None
    if resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        root_aabb = np.array(meta["root_aabb"], dtype=np.float64)
        root_spacing = float(meta["root_spacing"])
        done = sorted(int(d.split("=")[1]) for d in os.listdir(ckpt)
                      if d.startswith("level=") and
                      os.path.exists(os.path.join(ckpt, d, "_MANIFEST.json")))
        start_level = (done[-1] + 1) if done else 0
        for lv in done:
            with open(os.path.join(ckpt, f"level={lv}", "_MANIFEST.json")) as f:
                counters["levels"].append(json.load(f))
    else:
        # fresh run into a reused checkpoint_dir: stale level=* dirs from a
        # previous (possibly deeper or differently-configured) run would
        # leak into the final level=*/out glob — remove them first
        for d in os.listdir(ckpt):
            if d.startswith("level="):
                shutil.rmtree(os.path.join(ckpt, d), ignore_errors=True)
        # r7: persist the narrow input BEFORE the AABB pass — level 0
        # consumes the upstream lineage three times (AABB agg, per-node
        # counts, kernel pass); caching the 21 B/point narrow rows turns
        # three source-scan/generation executions into one. Unpersisted
        # before return.
        from pyspark import StorageLevel
        narrow = narrow.persist(StorageLevel.MEMORY_AND_DISK)
        input_cached = narrow
        if cfg.root_aabb is not None:
            root_aabb = np.asarray(cfg.root_aabb, dtype=np.float64)
            root_spacing = (float(cfg.root_spacing)
                            if cfg.root_spacing is not None
                            else compute_spacing(root_aabb))
        else:
            root_aabb, root_spacing = compute_root_aabb(narrow)
        with open(meta_path, "w") as f:
            json.dump({"root_aabb": root_aabb.tolist(),
                       "root_spacing": root_spacing,
                       "scale": cfg.scale}, f)

    if start_level == 0:
        # ROOT HOP — reference semantics: the root never retains points
        # (node_process.py:88,109 forces make_empty_node for name='', so
        # every point forwards to a depth-1 octant; the root pnts is a
        # post-hoc overview, operators/tileset.py root_overview). Pure JVM
        # column expression over the CACHED narrow rows: zero shuffle,
        # zero Python for the full-volume level — the cheapest possible
        # level 0 at 100 TB. The route expression re-evaluates per
        # consumer pass (cheap float compares), the cached input does not.
        if input_cached is None:
            # resume=True with meta.json present but no completed level:
            # the fresh-run persist above was skipped — do it here
            from pyspark import StorageLevel
            narrow = narrow.persist(StorageLevel.MEMORY_AND_DISK)
            input_cached = narrow
        pending = narrow.withColumn("tile_id", _root_route_expr(root_aabb,
                                                                root_spacing))
    else:
        pending = _read_pending(
            spark, os.path.join(ckpt, f"level={start_level - 1}", "out"))

    kernel = _unified_kernel(cfg, root_aabb, root_spacing)
    group_key = _native_cell_key(cfg)
    # level-total estimate for the local cutoff: the previous level's
    # points_in (this level's input is a subset of it); on resume, the
    # last completed manifest. None (level 0 of a fresh run) -> the
    # conservative in_kernel_threshold cutoff (see _local_cutoff).
    est_total = (counters["levels"][-1]["points_in"]
                 if counters["levels"] else None)
    complete = False
    level_dfs: list[DataFrame] = []   # memory mode: persisted level outputs

    # kernel groups are CPU-heavy but byte-tiny (narrow rows): AQE's
    # byte-based partition coalescing would serialize them onto a few
    # tasks — disable it for the level loop, restore after
    _coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    _coalesce_prev = spark.conf.get(_coalesce_key, "true")
    spark.conf.set(_coalesce_key, "false")
    # the bounded routing probe is a CollectLimit; by default Spark runs
    # it incrementally (1 partition, then scaleUpFactor more, ...) which
    # turns one routing job into several sequential mini-rounds per
    # level. The probe wants ALL partitions in one pass — the result is
    # node-count sized either way.
    _limit_key = "spark.sql.limit.initialNumPartitions"
    _limit_prev = spark.conf.get(_limit_key, None)
    spark.conf.set(_limit_key, "100000")

    try:
        for level in range(start_level, cfg.max_levels):
            lv_dir = os.path.join(ckpt, f"level={level}")
            t0 = time.time()
            # per-node count + bbox in ONE agg pass: the bbox costs nothing
            # extra (same shuffle) and lets the routing spot tight-cluster
            # nodes (megacities) whose whole point set sits within one spacing
            # — those get 'express' mode instead of a multi-second local task
            counts = (pending.groupBy("tile_id")
                      .agg(F.count("*").alias("cnt"),
                           F.min("x").alias("bx0"), F.min("y").alias("by0"),
                           F.min("z").alias("bz0"),
                           F.max("x").alias("bx1"), F.max("y").alias("by1"),
                           F.max("z").alias("bz1")))
            parallelism = (cfg.plan_parallelism
                           or spark.sparkContext.defaultParallelism)
            # BOUNDED probe: a level with <= node_broadcast_rows live nodes
            # (every sandbox level; most real levels) comes back whole from
            # the ONE pure-JVM routing job — modes computed driver-side over
            # the O(cap) rows (exact level_total, r4-identical plans), node
            # list re-shipped as a LocalRelation broadcast (no broadcast-
            # exchange job, no Arrow stage). Over-cap levels never reach the
            # driver: _node_meta_df runs the SAME rule as a distributed plan,
            # only the per-mode histogram is collected, and node_meta joins
            # to pending by shuffle (a GB-sized node list has no business
            # being broadcast anyway).
            cap = int(cfg.node_broadcast_rows)
            node_meta_full = None
            # persisted so the over-cap path's _node_meta_df
            # materialization reads the cached node rows instead of
            # re-running the full groupBy over every pending point (the
            # level's priciest pass); dropped right after the probe on
            # the common path
            counts = counts.persist()
            probe = counts.limit(cap + 1).collect()
            broadcast_path = len(probe) <= cap
            if broadcast_path:
                counts.unpersist()
                n_in = int(sum(r["cnt"] for r in probe))
                cutoff = _local_cutoff(cfg, n_in if n_in else None, parallelism)
                meta_rows = (_node_meta_rows(probe, cfg, root_aabb,
                                             root_spacing, cutoff)
                             if n_in else [])
                modes = {}
                for _, mode, *_ in meta_rows:
                    modes[mode] = modes.get(mode, 0) + 1
                n_nodes = len(meta_rows)
            else:
                cutoff = _local_cutoff(cfg, est_total, parallelism)
                node_meta_full = _node_meta_df(counts, cfg, root_aabb,
                                               root_spacing, cutoff).persist()
                stats_rows = (node_meta_full.groupBy("mode")
                              .agg(F.count("*").alias("nodes"),
                                   F.sum("cnt").alias("pts")).collect())
                counts.unpersist()
                modes = {r["mode"]: int(r["nodes"]) for r in stats_rows}
                n_nodes = int(sum(r["nodes"] for r in stats_rows))
                n_in = int(sum(r["pts"] for r in stats_rows))
            t_counts = time.time() - t0
            if n_in == 0:
                if node_meta_full is not None:
                    node_meta_full.unpersist()
                complete = True
                break
            est_total = n_in   # next level's input is a subset of this one's

            t0 = time.time()
            if broadcast_path:
                node_meta = spark.createDataFrame(meta_rows, _NODE_META_SCHEMA)
                tagged = pending.join(F.broadcast(node_meta), "tile_id")
            else:
                tagged = pending.join(node_meta_full.drop("cnt"), "tile_id")
            # leaf rows (the bulk at deep levels) are final as-is: pure JVM
            # filter, NO shuffle, NO Python — node.py:70-73 leaf semantics
            leaf_rows = (tagged.filter(F.col("mode") == "leaf")
                         .select("point_id", "x", "y", "z", "tile_id",
                                 F.lit(True).alias("accepted")))
            if set(modes) == {"leaf"}:
                # ALL-LEAF level (always the build's final level): the
                # non-leaf branch is provably empty — skip its shuffle +
                # Arrow kernel plan entirely instead of scheduling an
                # empty applyInPandas stage (the mode histogram is already
                # known driver-side either way)
                out_df = leaf_rows
            else:
                nonleaf = (tagged.filter(F.col("mode") != "leaf")
                           .withColumn("gk", group_key)
                           .drop("mnx", "mny", "mnz", "sx", "sy", "sz")
                           .groupBy("tile_id", "gk")
                           .applyInPandas(kernel, schema=KERNEL_SCHEMA))
                out_df = nonleaf.unionByName(leaf_rows)
            if memory_mode:
                from pyspark import StorageLevel
                out_df = out_df.persist(StorageLevel.MEMORY_AND_DISK)
                out_df.count()   # materialize the level
                level_dfs.append(out_df)
            else:
                # hive-partition by `accepted`: ONE write, but the next
                # level's NOT-accepted read partition-prunes the finalized
                # rows away entirely and the final assignments union reads
                # only accepted=true dirs — at deep levels (mostly-leaf
                # output) this halves checkpoint read volume, which on a
                # fault-bound host is wall-clock.
                # r7 (guide §6): decouple kernel parallelism from output
                # file count — the kernel fans out at shuffle width, but
                # its output is n_in narrow rows (~40 B each); letting
                # every kernel/leaf task open its own dynamic-partition
                # writers produced ~200 KB-sized files per level and paid
                # seconds of open/commit overhead. Repartition to a
                # size-derived file count (128 MB target) first: locally
                # 1-2 write tasks, petabyte levels thousands — never a
                # constant tuned to either.
                target_files = max(1, -(-n_in * 40 // (128 << 20)))
                (out_df.repartition(target_files)
                 .write.mode("overwrite").partitionBy("accepted")
                 .parquet(os.path.join(lv_dir, "out")))
            t_kernel = time.time() - t0
            if node_meta_full is not None:
                node_meta_full.unpersist()

            lv_stats = {"level": level, "points_in": n_in,
                        "nodes": n_nodes, "modes": modes,
                        "sec_counts": round(t_counts, 3),
                        "sec_kernel": round(t_kernel, 3)}
            if not memory_mode:
                with open(os.path.join(lv_dir, "_MANIFEST.json"), "w") as f:
                    json.dump(lv_stats, f)
            counters["levels"].append(lv_stats)

            if modes.get("cell", 0) == 0 and modes.get("express", 0) == 0:
                # leaf/local groups fully resolve their points — nothing forwards
                complete = True
                break
            if memory_mode:
                pending = out_df.filter("NOT accepted").drop("accepted")
            else:
                pending = _read_pending(spark, os.path.join(lv_dir, "out"))

    finally:
        spark.conf.set(_coalesce_key, _coalesce_prev)
        if _limit_prev is None:
            spark.conf.unset(_limit_key)
        else:
            spark.conf.set(_limit_key, _limit_prev)
    if input_cached is not None:
        input_cached.unpersist()
    if memory_mode:
        assignments = spark.createDataFrame([], ASSIGN_SCHEMA)
        if level_dfs:
            from functools import reduce
            # filter+project each cached level BEFORE the union: unioning
            # the raw persisted frames defeats Spark's cache lookup for one
            # branch (the level's Python kernel silently re-executes);
            # narrowing per-branch keeps every InMemoryTableScan
            assignments = reduce(DataFrame.unionByName, [
                df.filter("accepted").select("point_id", "tile_id")
                for df in level_dfs])
    else:
        # explicit per-level accepted=true subdirs (not a level=* glob):
        # stale dirs from other runs can never leak in, no multi-root
        # partition discovery, and the pending halves of every level are
        # never even listed — the union reads exactly the finalized rows.
        # Levels resumed from a pre-r4 FLAT checkpoint read the old way.
        parts = []
        for s in counters["levels"]:
            out = os.path.join(ckpt, f"level={s['level']}", "out")
            if _is_legacy_level_dir(out):
                parts.append(spark.read.schema(KERNEL_SCHEMA).parquet(out)
                             .filter("accepted")
                             .select("point_id", "tile_id"))
            elif os.path.isdir(p := os.path.join(out, "accepted=true")):
                parts.append(spark.read.schema(PENDING_SCHEMA).parquet(p)
                             .select("point_id", "tile_id"))
        if parts:
            from functools import reduce
            assignments = reduce(DataFrame.unionByName, parts)
        else:
            assignments = spark.createDataFrame([], ASSIGN_SCHEMA)

    counters["points_total"] = (counters["levels"][0]["points_in"]
                                if counters["levels"] else 0)
    counters["complete"] = complete
    if complete and counters["levels"]:
        # reference invariant: every point read is written (convert.py:652)
        assigned = assignments.count()
        counters["points_assigned"] = assigned
        assert assigned == counters["points_total"], counters
    return TilingResult(assignments=assignments, root_aabb=root_aabb,
                        root_spacing=root_spacing, counters=counters,
                        checkpoint_dir=ckpt)


def _is_legacy_level_dir(out_dir: str) -> bool:
    """True when `out_dir` is a pre-r4 FLAT checkpoint (parquet files with
    an `accepted` column, no hive accepted=*/ subdirs). Distinguishing it
    from 'partitioned but fully-accepted' matters: treating a legacy dir
    as 'no pending' would silently drop every prior level on resume."""
    if (os.path.isdir(os.path.join(out_dir, "accepted=false"))
            or os.path.isdir(os.path.join(out_dir, "accepted=true"))):
        return False
    return any(f.endswith(".parquet")
               for f in os.listdir(out_dir)) if os.path.isdir(out_dir) else False


def _read_pending(spark, out_dir: str) -> DataFrame:
    """Pending rows of a level checkpoint. Hive layout (r4+): target the
    accepted=false subdir directly — the finalized rows are never listed,
    let alone scanned; a level where everything finalized has no such dir
    (empty frame; the loop's next count pass then completes). Legacy flat
    layout (resuming a pre-r4 checkpoint): full read + filter."""
    if not os.path.isdir(out_dir):
        # a fully-accepted level HAS an out dir (with only accepted=true);
        # a missing dir means the checkpoint was never written — resuming
        # with a wrong start_level must fail loudly, not return an empty
        # pending that silently completes the build (ADVICE r4)
        raise FileNotFoundError(
            f"level checkpoint {out_dir} does not exist — wrong "
            "start_level / checkpoint_dir?")
    if _is_legacy_level_dir(out_dir):
        return (spark.read.schema(KERNEL_SCHEMA).parquet(out_dir)
                .filter("NOT accepted").drop("accepted"))
    p = os.path.join(out_dir, "accepted=false")
    if not os.path.isdir(p):
        return spark.createDataFrame([], PENDING_SCHEMA)
    return spark.read.schema(PENDING_SCHEMA).parquet(p)


def cleanup_checkpoint(result: TilingResult) -> None:
    shutil.rmtree(result.checkpoint_dir, ignore_errors=True)
