"""Worker-utilization introspection — the reference's `--graph` analogue.

The reference master tails per-worker activity CSVs and renders a pygal
SVG after the run (convert.py:722-759). Spark already records the ground
truth for every task in its event log, so the Spark-first equivalent is:
enable `spark.eventLog` for the run, then post-process the log's
SparkListenerTaskEnd events into

- ``activity.json`` — per-executor busy-seconds + overall core
  utilization (task-seconds / (cores * wall)), a concurrency timeline,
  and per-stage totals: the machine-readable "activity table";
- ``activity.svg`` — a single-series area chart of running tasks over
  time (one axis; the utilization number is printed in the subtitle
  rather than plotted on a second scale).

No listener plumbing (py4j callback servers are fragile from Python);
the event log is a documented public format (JSON lines, one object per
listener event).
"""

from __future__ import annotations

import json
import os
from typing import Optional


def parse_event_log(log_dir: str, app_id: Optional[str] = None) -> list[dict]:
    """Task intervals from the newest (or `app_id`'s) event log file.

    Returns [{executor, stage, launch_ms, finish_ms}] for every
    successfully recorded TaskEnd. `.inprogress` logs parse fine — events
    are flushed incrementally."""
    entries = [os.path.join(log_dir, f) for f in os.listdir(log_dir)
               if not f.startswith(".")]
    if app_id:
        entries = [f for f in entries if app_id in os.path.basename(f)]
    if not entries:
        raise FileNotFoundError(f"no event log under {log_dir}")
    newest = max(entries, key=os.path.getmtime)
    if os.path.isdir(newest):
        # Spark 4 rolling layout: eventlog_v2_<app>/events_<n>_<app>...
        paths = sorted(os.path.join(newest, f) for f in os.listdir(newest)
                       if f.startswith("events_"))
        if not paths:
            raise FileNotFoundError(f"no events_* files under {newest}")
    else:
        paths = [newest]
    tasks = []
    for path in paths:
        with open(path) as f:
            tasks.extend(_parse_lines(f))
    return tasks


def _parse_lines(f):
    tasks = []
    for line in f:
        if '"SparkListenerTaskEnd"' not in line:
            continue
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:          # truncated tail of .inprogress
            continue
        info = ev.get("Task Info") or {}
        if not info or info.get("Failed"):
            continue
        tasks.append({
            "executor": str(info.get("Executor ID", "driver")),
            "stage": int(ev.get("Stage ID", -1)),
            "launch_ms": int(info["Launch Time"]),
            "finish_ms": int(info["Finish Time"]),
        })
    return tasks


def activity_report(tasks: list[dict], cores: int, bins: int = 240) -> dict:
    """Aggregate task intervals into the utilization report."""
    if not tasks:
        return {"tasks": 0, "wall_sec": 0.0, "utilization": 0.0,
                "executors": {}, "stages": {}, "timeline": []}
    t0 = min(t["launch_ms"] for t in tasks)
    t1 = max(t["finish_ms"] for t in tasks)
    wall = max(t1 - t0, 1)
    executors: dict[str, float] = {}
    stages: dict[str, float] = {}
    conc = [0.0] * bins
    for t in tasks:
        dur = (t["finish_ms"] - t["launch_ms"]) / 1000.0
        executors[t["executor"]] = executors.get(t["executor"], 0.0) + dur
        stages[str(t["stage"])] = stages.get(str(t["stage"]), 0.0) + dur
        # spread the task over the timeline bins it overlaps
        lo = (t["launch_ms"] - t0) / wall * bins
        hi = (t["finish_ms"] - t0) / wall * bins
        for b in range(int(lo), min(int(hi) + 1, bins)):
            overlap = min(hi, b + 1) - max(lo, b)
            if overlap > 0:
                conc[b] += overlap
    busy = sum(executors.values())
    return {
        "tasks": len(tasks),
        "wall_sec": round(wall / 1000.0, 3),
        "cores": cores,
        "busy_task_sec": round(busy, 3),
        "utilization": round(busy / (cores * wall / 1000.0), 4),
        "executors": {k: round(v, 3) for k, v in sorted(executors.items())},
        "stages": {k: round(v, 3)
                   for k, v in sorted(stages.items(), key=lambda kv: -kv[1])},
        "timeline": [round(c, 2) for c in conc],
    }


def render_activity_svg(report: dict, out_path: str,
                        width: int = 960, height: int = 320) -> None:
    """Running-task concurrency over time as one filled series (the
    reference's activity.svg analogue). Single axis; utilization is text
    in the subtitle, not a second scale."""
    tl = report.get("timeline") or [0.0]
    cores = max(int(report.get("cores", 1)), 1)
    top = max(max(tl), float(cores), 1.0)
    ml, mr, mt, mb = 56, 16, 52, 36
    pw, ph = width - ml - mr, height - mt - mb

    def x(i):
        return ml + pw * i / max(len(tl) - 1, 1)

    def y(v):
        return mt + ph * (1.0 - v / top)

    pts = " ".join(f"{x(i):.1f},{y(v):.1f}" for i, v in enumerate(tl))
    area = (f"{ml:.1f},{y(0):.1f} " + pts
            + f" {ml + pw:.1f},{y(0):.1f}")
    # recessive horizontal grid at 0 / cores / top (top dropped when it
    # would crowd the cores line)
    grid_vals = sorted({0.0, float(cores)}
                       | ({top} if top > 1.15 * cores else set()))
    grid = "".join(
        f'<line x1="{ml}" y1="{y(v):.1f}" x2="{ml + pw}" y2="{y(v):.1f}" '
        f'stroke="#e5e7eb" stroke-width="1"/>'
        f'<text x="{ml - 8}" y="{y(v) + 4:.1f}" text-anchor="end" '
        f'font-size="11" fill="#6b7280">{v:g}</text>'
        for v in grid_vals)
    util = report.get("utilization", 0.0)
    sub = (f"{report.get('tasks', 0)} tasks · "
           f"{report.get('wall_sec', 0)} s wall · "
           f"{cores} cores · utilization {util:.0%}")
    svg = f"""<svg xmlns="http://www.w3.org/2000/svg" width="{width}" \
height="{height}" viewBox="0 0 {width} {height}" font-family="sans-serif">
<rect width="{width}" height="{height}" fill="#ffffff"/>
<text x="{ml}" y="22" font-size="14" fill="#111827" \
font-weight="600">Worker activity — running tasks over time</text>
<text x="{ml}" y="40" font-size="12" fill="#6b7280">{sub}</text>
{grid}
<polygon points="{area}" fill="#2563eb" fill-opacity="0.18"/>
<polyline points="{pts}" fill="none" stroke="#2563eb" stroke-width="2"/>
<line x1="{ml}" y1="{mt + ph}" x2="{ml + pw}" y2="{mt + ph}" \
stroke="#9ca3af" stroke-width="1"/>
<text x="{ml}" y="{height - 10}" font-size="11" fill="#6b7280">0 s</text>
<text x="{ml + pw}" y="{height - 10}" text-anchor="end" font-size="11" \
fill="#6b7280">{report.get('wall_sec', 0)} s</text>
</svg>
"""
    with open(out_path, "w") as f:
        f.write(svg)


def write_activity_artifacts(log_dir: str, out_dir: str,
                             cores: int) -> dict:
    """Parse the newest event log and write activity.json + activity.svg
    into `out_dir`. Returns the report."""
    report = activity_report(parse_event_log(log_dir), cores=cores)
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "activity.json"), "w") as f:
        json.dump(report, f, indent=1)
    render_activity_svg(report, os.path.join(out_dir, "activity.svg"))
    return report
