"""Distributed octree/quadtree LOD tiling — the flagship engine.

Spark-first re-expression of the reference tiler (py3dtiles/convert.py:318-673
master/worker loop). The reference shuffles point batches between processes
over ZMQ keyed by node name; here each "ZMQ hop" is one Spark shuffle and the
build is a level-synchronous iteration (SURVEY.md §3.1 "Spark shape"):

  level N pending points (point_id, x, y, z, tile_id)
    -> groupBy(tile_id).count()           # tiny: one row per live node
    -> broadcast-join the per-node decision back onto the points:
         leaf   (count < 20000 or spacing floor): accept ALL rows — pure
                DataFrame op, no UDF (node.py:70-73 semantics)
         local  (count small enough): groupBy(tile_id) + applyInPandas
                kernel recursing the WHOLE subtree in one task — zero
                further shuffles for that subtree (the reference's
                depth-limited pipelining, node_process.py:82-90, taken to
                its limit)
         cell   (huge node): compute the LOD-grid cell key as a vectorized
                Arrow UDF and groupBy(tile_id, cell_key) — the acceptance
                test is per-cell independent (points_grid.py:22-31 scans
                only the same cell), so a hot node fans out over 27+ tasks
                instead of serializing on one worker. This is the skew
                answer for megacity cells at 10^12 docs.
    -> kernel output written ONCE to parquet (the per-level checkpoint:
       resumable, lineage-truncating), then split into accepted
       assignments and next-level pending (rejects forwarded to children).

Points are carried NARROW through the loop (point_id + xyz only, float32);
payload columns (url, html, text...) are joined back once at the end — at
100 TB you never shuffle the html through the tree.

Counters (points in / accepted / forwarded / nodes per level) are recorded
in a manifest JSON per level; the written==read invariant of the reference
(convert.py:652-653) is asserted at the end.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from dataclasses import dataclass, field
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from py3dtiles_spark.functions.geometry import (
    GRID_INITIAL_CELL_COUNT,
    MIN_SPACING,
    SPLIT_THRESHOLD,
    cell_keys_for_node,
    child_index_for_node,
    compute_spacing,
    node_geometry,
    sequential_accept,
)
from py3dtiles_spark.operators.replay import assign_subtree

PENDING_SCHEMA = "point_id long, x float, y float, z float, tile_id string"
KERNEL_SCHEMA = PENDING_SCHEMA + ", accepted boolean"
ASSIGN_SCHEMA = "point_id long, tile_id string"


@dataclass
class TilingConfig:
    scale: float = 1.0
    split_threshold: int = SPLIT_THRESHOLD
    # nodes at or below this size finish their whole subtree in one task
    in_kernel_threshold: int = 131_072
    max_levels: int = 32
    checkpoint_dir: Optional[str] = None
    # optional approximation for extreme scale: only the first N canonical
    # points per (node, cell) run the sequential accept loop; the rest are
    # forwarded as rejected. None = exact reference semantics.
    grid_sample_cap: Optional[int] = None
    cell_count: int = GRID_INITIAL_CELL_COUNT


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


def _cell_kernel(cfg: TilingConfig, root_aabb, root_spacing):
    """Grouped-map kernel over one (tile_id, cell_key) group: canonical-order
    sequential accept; rejects routed to the child octant."""
    cap = cfg.grid_sample_cap
    scale = cfg.scale

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("point_id", kind="stable").reset_index(drop=True)
        tile_id = pdf["tile_id"].iat[0]
        aabb, spacing = node_geometry(tile_id, root_aabb, root_spacing)
        xyz = pdf[["x", "y", "z"]].to_numpy(dtype=np.float32)
        if cap is not None and len(pdf) > cap:
            accept = np.zeros(len(pdf), dtype=bool)
            accept[:cap] = sequential_accept(xyz[:cap], spacing * spacing)
        else:
            accept = sequential_accept(xyz, spacing * spacing)
        out = pdf.drop(columns=["cell_key"], errors="ignore").copy()
        out["accepted"] = accept
        rej = ~accept
        if rej.any():
            digits = child_index_for_node(xyz[rej], aabb)
            out.loc[rej, "tile_id"] = [tile_id + str(d) for d in digits]
        return out

    return kernel


def _subtree_kernel(cfg: TilingConfig, root_aabb, root_spacing):
    """Grouped-map kernel over one tile_id group small enough to finish
    locally: recurse the whole subtree with the canonical replay."""
    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        tile_id = pdf["tile_id"].iat[0]
        ids = pdf["point_id"].to_numpy()
        xyz = pdf[["x", "y", "z"]].to_numpy(dtype=np.float32)
        tiles = assign_subtree(ids, xyz, tile_id, root_aabb, root_spacing,
                               cfg.scale, cfg.split_threshold)
        return pd.DataFrame({"point_id": ids, "tile_id": tiles})

    return kernel


def _cell_key_udf_factory(cfg: TilingConfig, root_aabb, root_spacing):
    """Vectorized Arrow UDF computing the LOD-grid cell key, float32-exact
    (reference xyz_to_key, distance.py:24-32). mapInPandas-style iterator so
    per-tile geometry is derived once per batch."""
    cell_count = cfg.cell_count

    def compute(batch: pd.DataFrame) -> pd.Series:
        keys = np.empty(len(batch), dtype=np.int32)
        xyz = batch[["x", "y", "z"]].to_numpy(dtype=np.float32)
        for tid, idx in batch.groupby("tile_id", sort=False).indices.items():
            aabb, _ = node_geometry(tid, root_aabb, root_spacing)
            keys[idx] = cell_keys_for_node(xyz[idx], aabb, cell_count)
        return keys

    return compute


def build_tiling(spark: SparkSession, points: DataFrame,
                 cfg: TilingConfig | None = None,
                 resume: bool = False) -> TilingResult:
    """Run the level-synchronous octree build.

    points: DataFrame with (point_id: long, x, y, z numeric). Extra columns
    are dropped (join payload back on point_id afterwards).
    """
    cfg = cfg or TilingConfig()
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
    if resume and os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        root_aabb = np.array(meta["root_aabb"], dtype=np.float32)
        root_spacing = float(meta["root_spacing"])
        done = sorted(int(d.split("=")[1]) for d in os.listdir(ckpt)
                      if d.startswith("level=") and
                      os.path.exists(os.path.join(ckpt, d, "_MANIFEST.json")))
        start_level = (done[-1] + 1) if done else 0
        for lv in done:
            with open(os.path.join(ckpt, f"level={lv}", "_MANIFEST.json")) as f:
                counters["levels"].append(json.load(f))
    else:
        root_aabb, root_spacing = compute_root_aabb(narrow)
        with open(meta_path, "w") as f:
            json.dump({"root_aabb": root_aabb.tolist(),
                       "root_spacing": root_spacing,
                       "scale": cfg.scale}, f)

    if start_level == 0:
        pending = narrow.withColumn("tile_id", F.lit(""))
    else:
        prev = os.path.join(ckpt, f"level={start_level - 1}", "pending")
        pending = spark.read.schema(PENDING_SCHEMA).parquet(prev)

    spacing_floor = MIN_SPACING * cfg.scale
    cell_key_fn = _cell_key_udf_factory(cfg, root_aabb, root_spacing)

    def cell_key_map(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in it:
            batch = batch.copy()
            batch["cell_key"] = cell_key_fn(batch)
            yield batch

    complete = False
    for level in range(start_level, cfg.max_levels):
        lv_dir = os.path.join(ckpt, f"level={level}")
        counts = pending.groupBy("tile_id").agg(F.count("*").alias("cnt"))
        counts = counts.withColumn(
            "node_spacing",
            F.lit(root_spacing) * F.pow(F.lit(0.5), F.length("tile_id")))
        counts = counts.withColumn(
            "mode",
            F.when((F.col("cnt") < cfg.split_threshold)
                   | (F.col("node_spacing") <= spacing_floor), F.lit("leaf"))
             .when(F.col("cnt") <= cfg.in_kernel_threshold, F.lit("local"))
             .otherwise(F.lit("cell")))
        tagged = pending.join(
            F.broadcast(counts.select("tile_id", "mode")), "tile_id")

        # leaf: accept everything, no UDF
        leaves = (tagged.filter(F.col("mode") == "leaf")
                  .select("point_id", "tile_id"))
        leaves.write.mode("overwrite").parquet(
            os.path.join(lv_dir, "assigned_leaf"))

        # local: finish whole subtrees in one task each
        local = (tagged.filter(F.col("mode") == "local")
                 .drop("mode")
                 .groupBy("tile_id")
                 .applyInPandas(_subtree_kernel(cfg, root_aabb, root_spacing),
                                schema=ASSIGN_SCHEMA))
        local.write.mode("overwrite").parquet(
            os.path.join(lv_dir, "assigned_local"))

        # cell: one grid level of a huge node, fanned out per cell
        cellp = (tagged.filter(F.col("mode") == "cell").drop("mode")
                 .mapInPandas(cell_key_map,
                              schema=PENDING_SCHEMA + ", cell_key int")
                 .groupBy("tile_id", "cell_key")
                 .applyInPandas(_cell_kernel(cfg, root_aabb, root_spacing),
                                schema=KERNEL_SCHEMA))
        cellp.write.mode("overwrite").parquet(os.path.join(lv_dir, "cell_out"))

        cell_out = spark.read.schema(KERNEL_SCHEMA).parquet(
            os.path.join(lv_dir, "cell_out"))
        (cell_out.filter("accepted").select("point_id", "tile_id")
         .write.mode("overwrite")
         .parquet(os.path.join(lv_dir, "assigned_cell")))
        nxt = cell_out.filter("NOT accepted").drop("accepted")
        nxt.write.mode("overwrite").parquet(os.path.join(lv_dir, "pending"))

        forwarded = spark.read.schema(PENDING_SCHEMA).parquet(
            os.path.join(lv_dir, "pending")).count()
        n_in = pending.count()
        lv_stats = {"level": level, "points_in": n_in,
                    "forwarded": forwarded,
                    "accepted": n_in - forwarded,
                    "nodes": counts.count()}
        with open(os.path.join(lv_dir, "_MANIFEST.json"), "w") as f:
            json.dump(lv_stats, f)
        counters["levels"].append(lv_stats)

        if forwarded == 0:
            complete = True
            break
        pending = spark.read.schema(PENDING_SCHEMA).parquet(
            os.path.join(lv_dir, "pending"))

    assignments = spark.read.schema(ASSIGN_SCHEMA).parquet(
        os.path.join(ckpt, "level=*", "assigned_*"))

    counters["points_total"] = sum(l["points_in"] for l in counters["levels"]
                                   if l["level"] == 0)
    counters["points_assigned"] = sum(l["accepted"] for l in counters["levels"])
    counters["complete"] = complete
    # reference invariant: every point read is written (convert.py:652-653)
    if complete:
        assert counters["points_assigned"] == counters["points_total"], counters

    return TilingResult(assignments=assignments, root_aabb=root_aabb,
                        root_spacing=root_spacing, counters=counters,
                        checkpoint_dir=ckpt)


def cleanup_checkpoint(result: TilingResult) -> None:
    shutil.rmtree(result.checkpoint_dir, ignore_errors=True)
