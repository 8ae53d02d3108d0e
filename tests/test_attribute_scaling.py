"""Unit tests for tools/attribute_scaling.py (pure Python, no Spark)."""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.attribute_scaling import _merge_intervals, analyze


def test_merge_intervals_overlap_and_gap():
    # [0,10] + [5,15] overlap -> 15; [20,25] separate -> +5
    assert _merge_intervals([(0, 10), (5, 15), (20, 25)]) == 20
    assert _merge_intervals([]) == 0
    assert _merge_intervals([(3, 3)]) == 0  # zero-width


def test_analyze_slices_to_window(tmp_path):
    t0, t1 = 1_000_000, 1_060_000  # 60s window
    events = [
        # job inside the window: covers 10s
        {"Event": "SparkListenerJobStart", "Job ID": 1,
         "Submission Time": t0 + 1_000},
        {"Event": "SparkListenerJobEnd", "Job ID": 1,
         "Completion Time": t0 + 11_000},
        # job outside the window: must be ignored
        {"Event": "SparkListenerJobStart", "Job ID": 2,
         "Submission Time": t1 + 5_000},
        {"Event": "SparkListenerJobEnd", "Job ID": 2,
         "Completion Time": t1 + 9_000},
        # stage inside
        {"Event": "SparkListenerStageCompleted", "Stage Info": {
            "Stage ID": 7, "Submission Time": t0 + 2_000,
            "Completion Time": t0 + 6_000, "Name": "mapInArrow",
            "Number of Tasks": 4}},
        # task inside: 5s duration, 4s run, 2.5e9 ns CPU, 1s GC
        {"Event": "SparkListenerTaskEnd", "Task Info": {
            "Launch Time": t0 + 2_000, "Finish Time": t0 + 7_000},
         "Task Metrics": {"Executor Run Time": 4_000,
                          "Executor CPU Time": 2_500_000_000,
                          "JVM GC Time": 1_000,
                          "Executor Deserialize Time": 500}},
        # task outside: ignored
        {"Event": "SparkListenerTaskEnd", "Task Info": {
            "Launch Time": t1 + 1_000, "Finish Time": t1 + 2_000},
         "Task Metrics": {"Executor Run Time": 1_000}},
    ]
    d = tmp_path / "ev"
    d.mkdir()
    with open(d / "events_1_app", "w") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")

    out = analyze(str(d), t0, t1, cores=8)
    assert out["window_s"] == 60.0
    assert out["n_jobs"] == 1
    assert out["job_covered_s"] == 10.0
    assert out["driver_gap_s"] == 50.0
    assert out["n_tasks"] == 1
    assert out["task_run_s"] == 4.0
    assert out["task_cpu_s"] == 2.5
    assert out["gc_s"] == 1.0
    assert out["deser_s"] == 0.5
    # occupancy = 4s run / (60s * 8 cores), rounded to 3 decimals
    assert out["core_occupancy"] == round(4.0 / 480.0, 3)
    assert out["top_stages"][0]["name"] == "mapInArrow"


def test_analyze_clips_edge_spanning_jobs(tmp_path):
    # a job overlapping a window edge contributes its in-window part only
    # (review finding r04: start-time-only slicing could make driver_gap_s
    # negative or count a fully-busy window as pure gap)
    t0, t1 = 1_000_000, 1_060_000
    events = [
        # spans the LEADING edge: submitted 10s before t0, ends 20s in
        {"Event": "SparkListenerJobStart", "Job ID": 1,
         "Submission Time": t0 - 10_000},
        {"Event": "SparkListenerJobEnd", "Job ID": 1,
         "Completion Time": t0 + 20_000},
        # spans the TRAILING edge: submitted 50s in, ends 30s after t1
        {"Event": "SparkListenerJobStart", "Job ID": 2,
         "Submission Time": t0 + 50_000},
        {"Event": "SparkListenerJobEnd", "Job ID": 2,
         "Completion Time": t1 + 30_000},
    ]
    d = tmp_path / "ev"
    d.mkdir()
    with open(d / "events_1_app", "w") as f:
        for ev in events:
            f.write(json.dumps(ev) + "\n")
    out = analyze(str(d), t0, t1, cores=8)
    assert out["n_jobs"] == 2
    assert out["job_covered_s"] == 30.0  # 20s leading + 10s trailing
    assert out["driver_gap_s"] == 30.0  # never negative, never 60
