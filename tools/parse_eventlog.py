"""Summarize a Spark event log: top stages by wall-clock, with call sites.

Usage: python tools/parse_eventlog.py [/tmp/spark-events]
"""

from __future__ import annotations

import glob
import json
import sys


def main() -> None:
    d = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark-events"
    import os

    files = [
        p
        for p in glob.glob(f"{d}/**/*", recursive=True)
        if os.path.isfile(p) and "appstatus" not in p and not p.endswith(".crc")
    ]

    def lines_of(path):
        if path.endswith(".zstd"):
            import pyarrow as pa

            codec = pa.Codec("zstd")
            with open(path, "rb") as f:
                # spark writes a zstd stream; decompress whole file
                import subprocess

                try:
                    raw = codec.decompress(f.read(), None)
                except Exception:
                    raw = subprocess.run(
                        ["zstd", "-dc", path], capture_output=True
                    ).stdout
            yield from raw.decode("utf-8", "replace").splitlines()
        else:
            with open(path) as f:
                yield from f

    stages = []
    for path in files:
        for line in lines_of(path):
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if ev.get("Event") == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    sub = si.get("Submission Time")
                    comp = si.get("Completion Time")
                    if sub and comp:
                        stages.append(
                            (
                                (comp - sub) / 1000.0,
                                si["Stage ID"],
                                si.get("Number of Tasks"),
                                si.get("Name", "")[:60],
                                (si.get("Details", "").splitlines() or [""])[0][:100],
                            )
                        )
    stages.sort(reverse=True)
    total = sum(s[0] for s in stages)
    print(f"{len(stages)} stages, {total:.1f}s total stage wall (overlaps possible)")
    for wall, sid, ntask, name, detail in stages[:25]:
        print(f"{wall:8.1f}s  stage={sid:<4} tasks={ntask:<4} {name}  || {detail}")


if __name__ == "__main__":
    main()
