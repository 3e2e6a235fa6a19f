"""Physical-plan audit: prints the evidence that the headline queries get
the plans a 100 TB deployment needs (pushdown, pruning, broadcast, whole-
stage codegen, no stray Python stages), and writes PLANS.md.

Run: python scripts/plan_audit.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from py3dtiles_spark.session import get_spark

SF = "/root/testdata/sf0.01"

CHECKS = {
    "pricing_summary": [
        ("filter pushed to the parquet scan", r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate"),
        ("column pruning (no l_comment etc.)", r"ReadSchema: [^\n]*l_returnflag"),
        ("whole-stage codegen", r"WholeStageCodegen|\*\(\d+\)"),
        ("partial aggregation before shuffle", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "customer_order_join": [
        ("small dim side broadcast", r"BroadcastHashJoin"),
        ("scan prunes to join/agg columns", r"ReadSchema: [^\n]*c_mktsegment"),
    ],
    "hourly_events": [
        ("partial agg (map-side combine)", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
        ("codegen", r"WholeStageCodegen|\*\(\d+\)"),
    ],
    "pip_rect": [
        ("broadcast nested-loop on range predicate", r"Broadcast"),
    ],
    "octant_hist": [
        ("pure native expressions, zero Python", "!FlatMap|ArrowEval|BatchEval"),
    ],
    "neardup_pairs": [
        ("band-bucket equi-join (not cross join)", r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("no cartesian product anywhere", "!CartesianProduct"),
    ],
    "simhash_neardup": [
        ("native xxhash64 votes, zero Python stages", "!FlatMap|ArrowEval|BatchEval"),
    ],
    "feature_quadtree": [
        ("window rank per cell, no Python beyond the WKB-free path", r"Window"),
    ],
    "s2_cells": [
        ("S2 encode is pure native exprs, zero Python", "!FlatMap|ArrowEval|BatchEval"),
        ("partial agg before the cell shuffle", r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "raster_cells": [
        ("rasterize is native explode, zero Python", "!FlatMap|ArrowEval|BatchEval"),
        ("generator (sequence explode), not a join", r"Generate"),
    ],
    "raster_vectorize": [
        ("gaps-and-islands windows, zero Python", "!FlatMap|ArrowEval|BatchEval"),
        ("two window passes", r"Window[\s\S]*Window"),
    ],
    "knn_join": [
        ("query side broadcast", r"Broadcast"),
        ("native cosine, zero Python stages", "!FlatMap|ArrowEval|BatchEval"),
        # r6: the partition-local pre-rank is Catalyst's WindowGroupLimit
        # partial/final pair (replaces the manual _pid stage, which cost a
        # whole extra exchange of the candidate set)
        ("map-side partial top-k before the exchange (WindowGroupLimit "
         "Partial/Final)", r"WindowGroupLimit[\s\S]*WindowGroupLimit"),
        ("single candidate exchange (pre-rank shuffle eliminated)",
         "#Exchange hashpartitioning<=1"),
        # "no Exchange line carries the embedding arrays" is asserted
        # per-line in tests/test_knn_dedup.py::
        # test_knn_join_local_prerank_stage_present (a whole-plan
        # substring absence would false-positive on the legitimate
        # pre-exchange Project nodes)
    ],
    "repetition_stats": [
        ("per-row n-gram signal, zero Python and zero Generate/explode",
         "!FlatMap|ArrowEval|BatchEval|Generate"),
        ("map-side partial agg",
         r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "salted_join": [
        # audited with autoBroadcastJoinThreshold=-1 (CONF_OVERRIDES): the
        # gate dim is broadcast-sized, which would short-circuit the very
        # shuffle shape under audit (ADVICE r4) — at the operator's target
        # scale the small side is past broadcast range by definition
        ("salted shuffle join (broadcast disabled for the audit)",
         r"SortMergeJoin|ShuffledHashJoin"),
        ("no broadcast of either side", "!BroadcastHashJoin"),
        ("both sides exchange on the salted key",
         r"Exchange hashpartitioning\([^\n]*_salt"),
    ],
    "llm_pipeline": [
        ("composed pipeline never degrades to a cross product",
         "!CartesianProduct"),
        ("gate/dedup/zorder/kNN stages are all JVM-native, zero Python",
         "!FlatMap|ArrowEval|BatchEval"),
        ("kNN keeps the two-stage top-k through the composition "
         "(WindowGroupLimit partial/final)",
         r"WindowGroupLimit[\s\S]*WindowGroupLimit"),
        ("payload joins back as a broadcast (no extra shuffle at the "
         "seam)", r"BroadcastHashJoin"),
        # seam budget over the RAW lineage (audit mode disables the
        # production persist of `kept`), AQE final plan only: the dedup
        # window's hash-key exchange (duplicated subplans collapse to
        # ReusedExchange at execution), the grid-kNN candidate equi-join
        # exchange, and the top-k final exchange. A regression that adds
        # a shuffle at a stage seam trips the counter.
        ("no extra shuffles at the seams (exchange budget)",
         "#Exchange hashpartitioning<=4"),
    ],
    "zorder_key": [
        ("morton key is pure native exprs, zero Python",
         "!FlatMap|ArrowEval|BatchEval"),
    ],
    "geohash_cells": [
        ("geohash encode is pure native exprs, zero Python",
         "!FlatMap|ArrowEval|BatchEval"),
        ("partial agg before the cell shuffle",
         r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "tfidf_terms": [
        ("all-native text pipeline, zero Python",
         "!FlatMap|ArrowEval|BatchEval"),
        ("doc-count side broadcast into the df join", r"Broadcast"),
        ("window top-k per doc", r"Window"),
        ("map-side partial agg on the exploded tokens",
         r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "substring_dup": [
        ("all-native shingle pipeline, zero Python",
         "!FlatMap|ArrowEval|BatchEval"),
        ("never a cartesian product", "!CartesianProduct"),
        ("single corpus scan (r7): corpus counts come from a count window "
         "over the 8-byte xxhash64 shingle key, not a groupBy+join-back "
         "that re-ran the window-construction pass per branch",
         r"Window"),
        ("no join (and no corpus-sized broadcast) left in the plan",
         "!SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("map-side partial agg on the per-doc rollup",
         r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "unigram_logprob": [
        ("all-native LM scoring, zero Python",
         "!FlatMap|ArrowEval|BatchEval"),
        ("never a cartesian product", "!CartesianProduct"),
        ("scalar (T, V) side is broadcast", r"Broadcast"),
        ("map-side partial agg on the exploded tokens",
         r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    # rotated-to-legacy entries keep their plan coverage here (the
    # registry comment and SURVEY promise "still benched and
    # plan-audited" for them)
    "knn_top5": [
        # brute-force baseline: one Arrow-batched numpy matmul per
        # partition (the documented kernel shape), then a window re-rank
        ("Arrow-batched matmul kernel (no row-at-a-time Python)",
         r"MapInPandas|ArrowEval|mapInArrow"),
        ("two-stage top-k window", r"Window"),
        ("never a cartesian product", "!CartesianProduct"),
    ],
    "corpus_curation": [
        ("all-native gate+dedup pipeline, zero Python",
         "!FlatMap|ArrowEval|BatchEval"),
        ("window dedup on the md5 key, not document bodies",
         r"Window[\s\S]*_th"),
        ("map-side partial agg",
         r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "top_ngrams": [
        ("all-native vocab mining, zero Python",
         "!FlatMap|ArrowEval|BatchEval"),
        ("global top-k is TakeOrderedAndProject (heaps, no full sort)",
         r"TakeOrderedAndProject"),
        ("map-side partial agg on the exploded n-grams",
         r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "decontaminate": [
        ("all-native decontamination, zero Python",
         "!FlatMap|ArrowEval|BatchEval"),
        ("eval shingle set joins by broadcast", r"BroadcastHashJoin"),
        ("never a cartesian product", "!CartesianProduct"),
        ("map-side partial agg on the per-doc rollup",
         r"HashAggregate[\s\S]*Exchange[\s\S]*HashAggregate"),
    ],
    "knn_join_bucketed": [
        ("bucket equi-join, never a cross product", "!CartesianProduct"),
        ("hash/merge equi-join on the bucket key",
         r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin"),
        ("two-stage top-k (WindowGroupLimit partial/final)",
         r"WindowGroupLimit[\s\S]*WindowGroupLimit"),
    ],
}


# per-query session-conf overrides applied around collect+plan capture
CONF_OVERRIDES = {
    "salted_join": {"spark.sql.autoBroadcastJoinThreshold": "-1",
                    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1"},
}


def main():
    # queries that materialize intermediates (persist/localCheckpoint)
    # return a checkpoint-scan plan; this switch makes them hand back the
    # raw lineage so the windows/joins under audit are actually visible
    os.environ["SPARK_GRAFT_PLAN_AUDIT"] = "1"
    spark = get_spark("plan-audit", cpus=4)
    qs = {**entrymod.queries(), **entrymod.legacy_queries()}
    lines = ["# PLANS — physical-plan audit (sf0.01, auto-generated by "
             "scripts/plan_audit.py)", ""]
    failures = 0
    for name, checks in CHECKS.items():
        overrides = CONF_OVERRIDES.get(name, {})
        saved = {k: spark.conf.get(k, None) for k in overrides}
        for k, v in overrides.items():
            spark.conf.set(k, v)
        df = qs[name](spark, SF)
        df.collect()   # executes THIS df's QueryExecution -> AQE final plan
        plan = df._jdf.queryExecution().executedPlan().toString()
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
        lines.append(f"## {name}")
        for label, pat in checks:
            if pat.startswith("!"):
                # absence check: none of the |-separated substrings may
                # appear anywhere in the plan (a negative lookahead on a
                # multi-line plan silently matched only line 1)
                ok = not any(tok in plan for tok in pat[1:].split("|"))
            elif pat.startswith("#"):
                # budget check: "#substr<=N" -> occurrence count of substr
                # must not exceed N. Counted over the AQE FINAL plan only:
                # after collect() the executed-plan string appends the
                # "== Initial Plan ==" section, which would double-count
                # every exchange that survived into the final plan.
                token, bound = pat[1:].rsplit("<=", 1)
                final_plan = plan.split("== Initial Plan ==")[0]
                ok = final_plan.count(token) <= int(bound)
            else:
                ok = re.search(pat, plan) is not None
            mark = "PASS" if ok else "FAIL"
            if not ok:
                failures += 1
            lines.append(f"- [{mark}] {label}")
            print(f"{mark} {name}: {label}")
        # plan excerpt: first 12 lines
        head = "\n".join(plan.splitlines()[:12])
        lines.append("")
        lines.append("```")
        lines.append(head)
        lines.append("```")
        lines.append("")
    spark.stop()

    # flagship driver-traffic audit (VERDICT r4 #3): every .collect() in
    # the level loop must be provably bounded — the scalar root-aabb agg,
    # the limit(cap+1) routing probe, or the <=4-row per-mode histogram.
    # An unbounded pending/counts collect reintroduces the reference
    # master bottleneck and fails this audit.
    import ast
    src_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "py3dtiles_spark", "operators",
        "tiling.py")
    with open(src_path) as f:
        src = f.read()
    lines.append("## flagship_tiling — bounded driver traffic")
    allowed = 0
    unbounded = []
    for node in ast.walk(ast.parse(src)):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "collect"):
            # the exact source of THIS call chain — not a line window
            # that could pick up unrelated neighboring statements
            stmt = ast.get_source_segment(src, node) or ""
            ok = (".limit(cap + 1)" in stmt        # bounded routing probe
                  # scalar agg (no grouping -> 1 row)
                  or (".agg(" in stmt and ".groupBy" not in stmt)
                  # per-mode histogram (<=4 rows)
                  or '.groupBy("mode")' in stmt)
            (allowed := allowed + 1) if ok else unbounded.append(
                (node.lineno, stmt.splitlines()[-1].strip()))
    mark = "PASS" if not unbounded else "FAIL"
    if unbounded:
        failures += len(unbounded)
    lines.append(f"- [{mark}] every collect() is a bounded probe or a "
                 f"scalar/histogram agg ({allowed} allowed, "
                 f"{len(unbounded)} unbounded: {unbounded})")
    print(f"{mark} flagship_tiling: bounded driver traffic "
          f"({allowed} collects audited)")
    lines.append("")

    # tileset_emit driver-traffic audit (VERDICT r5 #1): the BVH assembly
    # must never collect the tiles table on the production paths. In
    # operators/tileset.py the only allowed collects are the distributed
    # assembly's two bounded ones — the <=8^k subtree-stub rows from the
    # applyInPandas kernel and the <= sum(8^j, j<k) shallow tiles — plus
    # the explicit small-scale fallback inside tileset_from_tiling
    # (distributed=False branch). Every production call site (bench, CLI,
    # plans/convert, plans/pipeline) must route through the distributed
    # builder, i.e. contain no tiles.collect().
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    lines.append("## tileset_emit — bounded driver traffic")
    ts_path = os.path.join(repo, "py3dtiles_spark", "operators",
                           "tileset.py")
    with open(ts_path) as f:
        ts_src = f.read()
    tree = ast.parse(ts_src)
    fn_ranges = [(n.name, n.lineno, max(getattr(n, "end_lineno", n.lineno),
                                        n.lineno))
                 for n in ast.walk(tree) if isinstance(n, ast.FunctionDef)]
    ts_allowed, ts_bad = 0, []
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "collect"):
            stmt = ast.get_source_segment(ts_src, node) or ""
            enclosing = [nm for nm, a, b in fn_ranges
                         if a <= node.lineno <= b]
            ok = (".applyInPandas(" in stmt                 # 8^k stubs
                  or 'F.length("tile_id") < k' in stmt      # shallow tiles
                  # documented small-scale fallback, off the scale path
                  or "tileset_from_tiling" in enclosing)
            (ts_allowed := ts_allowed + 1) if ok else ts_bad.append(
                (node.lineno, stmt.splitlines()[-1].strip()))
    for rel in ["bench.py", "py3dtiles_spark/__main__.py",
                "py3dtiles_spark/plans/convert.py",
                "py3dtiles_spark/plans/pipeline.py"]:
        with open(os.path.join(repo, rel)) as f:
            if "tiles.collect()" in f.read():
                ts_bad.append((rel, "tiles.collect() at a production "
                                    "call site"))
    mark = "PASS" if not ts_bad else "FAIL"
    if ts_bad:
        failures += len(ts_bad)
    lines.append(f"- [{mark}] BVH assembly never collects the tiles table "
                 f"on production paths ({ts_allowed} bounded collects "
                 f"allowed, {len(ts_bad)} violations: {ts_bad})")
    print(f"{mark} tileset_emit: bounded driver traffic "
          f"({ts_allowed} collects audited)")
    lines.append("")

    # vector-export driver-traffic audit (VERDICT r6 #2, closed r7): the
    # quadtree tileset assembly must never collect the node_boxes table
    # on a production path. In operators/export.py the allowed collects
    # are: the global-extent scalar agg (assign_quadtree), the
    # distributed assembly's <=4^k subtree stubs (applyInPandas) and the
    # level<k shallow node rows. The export CLI must route through
    # build_vector_tileset_distributed — no node_boxes(...).collect().
    lines.append("## vector export — bounded driver traffic")
    ex_path = os.path.join(repo, "py3dtiles_spark", "operators",
                           "export.py")
    with open(ex_path) as f:
        ex_src = f.read()
    tree = ast.parse(ex_src)
    ex_allowed, ex_bad = 0, []
    for node in ast.walk(tree):
        if (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "collect"):
            stmt = ast.get_source_segment(ex_src, node) or ""
            ok = (".agg(" in stmt                        # scalar extent agg
                  or ".applyInPandas(" in stmt           # 4^k stubs
                  or 'F.col("level") < k' in stmt)       # shallow nodes
            (ex_allowed := ex_allowed + 1) if ok else ex_bad.append(
                (node.lineno, stmt.splitlines()[-1].strip()))
    with open(os.path.join(repo, "py3dtiles_spark", "__main__.py")) as f:
        if "node_boxes(assigned).collect()" in f.read():
            ex_bad.append(("__main__.py", "node_boxes(...).collect() at "
                                          "the export CLI"))
    mark = "PASS" if not ex_bad else "FAIL"
    if ex_bad:
        failures += len(ex_bad)
    lines.append(f"- [{mark}] vector tileset assembly never collects the "
                 f"node table on production paths ({ex_allowed} bounded "
                 f"collects allowed, {len(ex_bad)} violations: {ex_bad})")
    print(f"{mark} vector_export: bounded driver traffic "
          f"({ex_allowed} collects audited)")
    lines.append("")

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "PLANS.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
