"""Attribute where build time goes at two parallelism levels (VERDICT r03 #3).

Slices each leg's Spark eventlog to the child's timed-build window
(`build_t0_ms`/`build_t1_ms`, emitted by `bench/scaling.py --child`) and
aggregates driver-side and executor-side time so the 8->32 residual can be
named instead of guessed:

- window wall vs time covered by running jobs (the difference is pure
  driver/fixed cost: job submission, planning, Py4J round-trips);
- sum of task run time -> core-occupancy = run_time / (window * cores)
  (how much of the bought parallelism the build actually used);
- executor CPU vs run time (a healthy ratio ~1 means tasks computed the
  whole time; low means waiting: shuffle, disk, hypervisor non-delivery);
- GC, deserialize, shuffle write/fetch-wait, and the per-task overhead
  (duration - run - deser - result-ser: scheduler delay + launch cost);
- top stages by wall, to line the two legs up stage-for-stage.

Usage:
    python tools/attribute_scaling.py CORES:EVENTLOG_DIR:T0_MS:T1_MS [...]

One positional arg per leg, e.g.
    python tools/attribute_scaling.py 8:/tmp/evA8:17870...:17870... \
        32:/tmp/evA32:17870...:17870...
Prints one JSON line per leg plus a markdown comparison table.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys


def _lines(d: str):
    files = [
        p
        for p in glob.glob(f"{d}/**/*", recursive=True)
        if os.path.isfile(p) and "appstatus" not in p and not p.endswith(".crc")
    ]
    for path in files:
        if path.endswith(".zstd"):
            raw = subprocess.run(["zstd", "-dc", path], capture_output=True).stdout
            yield from raw.decode("utf-8", "replace").splitlines()
        else:
            with open(path) as f:
                yield from f


def _merge_intervals(iv: list[tuple[int, int]]) -> int:
    """Total ms covered by the union of [start, end] intervals."""
    iv = sorted(iv)
    covered, cur_s, cur_e = 0, None, None
    for s, e in iv:
        if cur_e is None or s > cur_e:
            if cur_e is not None:
                covered += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    if cur_e is not None:
        covered += cur_e - cur_s
    return covered


def analyze(d: str, t0: int, t1: int, cores: int) -> dict:
    jobs: dict[int, list] = {}  # job id -> [submit, end]
    stage_wall: dict[int, tuple[float, str, int]] = {}
    m = dict(
        n_tasks=0, dur=0.0, run=0.0, cpu=0.0, gc=0.0, deser=0.0, rser=0.0,
        shuf_write=0.0, fetch_wait=0.0, peak_mem=0,
    )
    for line in _lines(d):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerJobStart":
            # keep every job; overlap with [t0, t1] is decided (and the
            # interval clipped) after both endpoints are known — a job
            # spanning a window edge must contribute its in-window part,
            # not be dropped or counted whole (review finding r04)
            jobs[ev["Job ID"]] = [ev.get("Submission Time", 0), None]
        elif e == "SparkListenerJobEnd":
            if ev.get("Job ID") in jobs:
                jobs[ev["Job ID"]][1] = ev.get("Completion Time")
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub, comp = si.get("Submission Time"), si.get("Completion Time")
            if sub and comp and t0 <= sub <= t1:
                stage_wall[si["Stage ID"]] = (
                    (comp - sub) / 1000.0,
                    si.get("Name", "")[:60],
                    si.get("Number of Tasks", 0),
                )
        elif e == "SparkListenerTaskEnd":
            ti = ev.get("Task Info", {})
            launch = ti.get("Launch Time", 0)
            if not (t0 <= launch <= t1):
                continue
            tm = ev.get("Task Metrics") or {}
            m["n_tasks"] += 1
            m["dur"] += (ti.get("Finish Time", launch) - launch) / 1000.0
            m["run"] += tm.get("Executor Run Time", 0) / 1000.0
            m["cpu"] += tm.get("Executor CPU Time", 0) / 1e9
            m["gc"] += tm.get("JVM GC Time", 0) / 1000.0
            m["deser"] += tm.get("Executor Deserialize Time", 0) / 1000.0
            m["rser"] += tm.get("Result Serialization Time", 0) / 1000.0
            sw = tm.get("Shuffle Write Metrics") or {}
            m["shuf_write"] += sw.get("Shuffle Write Time", 0) / 1e9
            sr = tm.get("Shuffle Read Metrics") or {}
            m["fetch_wait"] += sr.get("Fetch Wait Time", 0) / 1000.0

    window_s = (t1 - t0) / 1000.0
    # clip each job interval to the window; drop jobs fully outside it
    job_iv = [
        (max(s, t0), min(e, t1))
        for s, e in jobs.values()
        if e is not None and e > t0 and s < t1
    ]
    covered_s = _merge_intervals(job_iv) / 1000.0
    out = {
        "cores": cores,
        "window_s": round(window_s, 2),
        "n_jobs": len(job_iv),
        "job_covered_s": round(covered_s, 2),
        "driver_gap_s": round(window_s - covered_s, 2),
        "n_tasks": m["n_tasks"],
        "task_dur_s": round(m["dur"], 1),
        "task_run_s": round(m["run"], 1),
        "task_cpu_s": round(m["cpu"], 1),
        "gc_s": round(m["gc"], 1),
        "deser_s": round(m["deser"], 1),
        "result_ser_s": round(m["rser"], 1),
        "shuffle_write_s": round(m["shuf_write"], 1),
        "fetch_wait_s": round(m["fetch_wait"], 1),
        "sched_overhead_s": round(m["dur"] - m["run"] - m["deser"] - m["rser"], 1),
        # share of the bought core-seconds that ran task code
        "core_occupancy": round(m["run"] / (window_s * cores), 3) if window_s else 0,
        # of the time tasks ran, how much was delivered CPU
        "cpu_per_run": round(m["cpu"] / m["run"], 3) if m["run"] else 0,
        "top_stages": [
            {"wall_s": round(w, 2), "tasks": n, "name": nm}
            for w, nm, n in sorted(
                ((w, nm, n) for w, nm, n in stage_wall.values()), reverse=True
            )[:8]
        ],
    }
    return out


def main() -> None:
    legs = []
    for arg in sys.argv[1:]:
        cores, d, t0, t1 = arg.split(":")
        legs.append(analyze(d, int(t0), int(t1), int(cores)))
    for leg in legs:
        print(json.dumps(leg))
    if len(legs) >= 2:
        keys = [
            "window_s", "n_jobs", "job_covered_s", "driver_gap_s", "n_tasks",
            "task_dur_s", "task_run_s", "task_cpu_s", "gc_s", "deser_s",
            "shuffle_write_s", "fetch_wait_s", "sched_overhead_s",
            "core_occupancy", "cpu_per_run",
        ]
        hdr = "| metric | " + " | ".join(f"local[{leg['cores']}]" for leg in legs)
        print("\n" + hdr + " |")
        print("|---" * (len(legs) + 1) + "|")
        for k in keys:
            print("| " + k + " | " + " | ".join(str(leg[k]) for leg in legs) + " |")


if __name__ == "__main__":
    main()
