"""Worker-utilization introspection (reference --graph analogue)."""

import json
import os

import pytest

from py3dtiles_spark.plans.activity import (
    activity_report, parse_event_log, render_activity_svg,
    write_activity_artifacts)


def _fake_log(path, tasks):
    with open(path, "w") as f:
        f.write(json.dumps({"Event": "SparkListenerApplicationStart"})
                + "\n")
        for ex, stage, t0, t1 in tasks:
            f.write(json.dumps({
                "Event": "SparkListenerTaskEnd", "Stage ID": stage,
                "Task Info": {"Executor ID": ex, "Launch Time": t0,
                              "Finish Time": t1, "Failed": False}}) + "\n")
        f.write('{"Event": "SparkListenerTaskEnd", truncated\n')  # tail


def test_parse_and_report(tmp_path):
    log = tmp_path / "app-123"
    _fake_log(str(log), [("0", 1, 1000, 3000), ("0", 1, 1000, 2000),
                         ("1", 2, 2000, 5000)])
    tasks = parse_event_log(str(tmp_path))
    assert len(tasks) == 3
    rep = activity_report(tasks, cores=2, bins=40)
    assert rep["tasks"] == 3
    assert rep["wall_sec"] == pytest.approx(4.0)
    # busy = 2 + 1 + 3 = 6 task-seconds over 2 cores * 4 s
    assert rep["busy_task_sec"] == pytest.approx(6.0)
    assert rep["utilization"] == pytest.approx(6.0 / 8.0)
    assert rep["executors"] == {"0": 3.0, "1": 3.0}
    assert len(rep["timeline"]) == 40
    # concurrency integrates back to busy seconds (bin width = 0.1 s)
    assert sum(rep["timeline"]) * (4.0 / 40) == pytest.approx(6.0, rel=1e-6)


def test_rolling_dir_layout(tmp_path):
    d = tmp_path / "eventlog_v2_local-1"
    d.mkdir()
    _fake_log(str(d / "events_1_local-1"), [("0", 0, 0, 1000)])
    (d / "appstatus_local-1").write_text("")
    assert len(parse_event_log(str(tmp_path))) == 1


def test_artifacts_written(tmp_path):
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    _fake_log(str(log_dir / "app-1"),
              [("0", 0, 0, 2000), ("0", 0, 500, 1500)])
    out = tmp_path / "out"
    rep = write_activity_artifacts(str(log_dir), str(out), cores=4)
    assert rep["tasks"] == 2
    assert os.path.getsize(out / "activity.json") > 0
    svg = (out / "activity.svg").read_text()
    assert svg.startswith("<svg") and "polyline" in svg


def test_empty_report():
    rep = activity_report([], cores=8)
    assert rep["tasks"] == 0 and rep["utilization"] == 0.0
    render_activity_svg(rep, os.devnull)
