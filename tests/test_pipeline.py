"""End-to-end flagship pipeline: pages -> geocode -> tiling -> tileset,
with the per-row byte-identical-text invariant (BASELINE.json input_hint)."""

import pytest

from py3dtiles_spark.operators.tiling import TilingConfig
from py3dtiles_spark.plans.pipeline import tile_pages, verify_text_invariant
from py3dtiles_spark.sources.pages import generate_pages, geocode


def test_generate_pages_deterministic(spark):
    a = generate_pages(spark, 200).orderBy("url").collect()
    b = generate_pages(spark, 200).orderBy("url").collect()
    assert a == b
    assert len({r.url for r in a}) == 200
    r0 = a[0]
    assert r0.html.decode("utf-8") == f"<html><body>{r0.text}</body></html>"
    assert r0.lang in {"en", "fr", "de", "es", "zh"}


def test_geocode_ranges_and_determinism(spark):
    g = geocode(generate_pages(spark, 500))
    row = g.selectExpr("min(x)", "max(x)", "min(y)", "max(y)",
                       "min(z)", "max(z)").collect()[0]
    assert -180 <= row[0] and row[1] <= 180
    assert -85 <= row[2] and row[3] <= 85
    assert 0 <= row[4] and row[5] <= 50


def test_pipeline_end_to_end(spark, tmp_path):
    pages = generate_pages(spark, 4000)
    cfg = TilingConfig(split_threshold=500, in_kernel_threshold=1500,
                       checkpoint_dir=str(tmp_path / "ckpt"))
    res = tile_pages(spark, pages, cfg)

    assert res.pages_tiled.count() == 4000
    assert res.tiling.counters["points_assigned"] == 4000
    # per-row invariant: byte-identical text per url
    assert verify_text_invariant(pages, res.pages_tiled) == 0

    ts = res.tileset_docs["tileset.json"]
    assert ts["root"]["refine"] == "REPLACE"
    n_tiles = res.tiles.count()
    assert n_tiles >= 1
    # rollup: no tile below merge threshold except possibly the root
    small = (res.tiles.filter("point_count < 100 and tile_id <> ''")).count()
    assert small == 0


def test_pipeline_skew_variant(spark, tmp_path):
    """Megacity hot cells must still complete (per-cell fan-out + deeper
    recursion around hot spots)."""
    pages = generate_pages(spark, 3000)
    cfg = TilingConfig(split_threshold=400, in_kernel_threshold=1000,
                       checkpoint_dir=str(tmp_path / "skew"))
    res = tile_pages(spark, pages, cfg, skew=True, build_json=False)
    assert res.tiling.counters["points_assigned"] == 3000
    # the tile histogram is skewed: megacity tiles are much hotter than the
    # uniform background, yet the run completes with exact counts
    counts = sorted(r.point_count for r in res.tiles.collect())
    assert counts[-1] > 3 * counts[len(counts) // 2]
