#!/usr/bin/env python
"""Attribute low-occupancy wall time in a KG-pipeline event log to stages.

Parses a Spark event log (the rolling v2 layout profile_jobs.py produces),
builds the running-task-count timeline, and for every second where the
occupancy is <= --low (default 1) names the stage that was running (or
"driver gap" when none was).  This is the tool that turns "13s of the
8-core run is occupancy<=1" into a per-callsite work list.

Usage: python scripts/profile_occupancy.py <eventlog dir or file> --cores 8
"""

from __future__ import annotations

import argparse
import json
import os
from collections import defaultdict


def iter_events(path: str):
    if os.path.isdir(path):
        inner = [os.path.join(path, f) for f in sorted(os.listdir(path))]
        files = []
        for p in inner:
            if os.path.isdir(p):
                files.extend(
                    os.path.join(p, f) for f in sorted(os.listdir(p)) if f.startswith("events_")
                )
            elif os.path.basename(p).startswith("events_"):
                files.append(p)
        if not files:
            raise SystemExit(f"no events_* file under {path}")
    else:
        files = [path]
    for f in files:
        with open(f) as fh:
            for line in fh:
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("log", help="event log dir or file")
    ap.add_argument("--low", type=int, default=1, help="occupancy threshold to attribute")
    args = ap.parse_args()

    tasks = []  # (start_ms, end_ms, stage_id)
    stage_names = {}
    for ev in iter_events(args.log):
        e = ev.get("Event")
        if e == "SparkListenerStageSubmitted":
            si = ev["Stage Info"]
            stage_names[si["Stage ID"]] = si.get("Stage Name", "?")
        elif e == "SparkListenerTaskEnd":
            ti = ev.get("Task Info") or {}
            s, f = ti.get("Launch Time"), ti.get("Finish Time")
            if s and f and f > s:
                tasks.append((s, f, ev.get("Stage ID")))
    if not tasks:
        raise SystemExit("no tasks in log")

    t0 = min(s for s, _, _ in tasks)
    t1 = max(f for _, f, _ in tasks)
    # occupancy per 100ms tick; attribute each low tick to the stage with a running task
    tick = 100
    nticks = (t1 - t0) // tick + 1
    occ = [0] * nticks
    owner = [None] * nticks  # one running stage id (any)
    for s, f, sid in tasks:
        for i in range((s - t0) // tick, min((f - t0) // tick + 1, nticks)):
            occ[i] += 1
            owner[i] = sid

    by_stage = defaultdict(float)
    gap = 0.0
    for i in range(nticks):
        if occ[i] == 0:
            gap += tick / 1000.0
        elif occ[i] <= args.low:
            by_stage[owner[i]] += tick / 1000.0

    print(f"wall {(t1 - t0) / 1000.0:.1f}s  driver-gap {gap:.1f}s  occupancy<={args.low}:")
    rows = sorted(by_stage.items(), key=lambda kv: -kv[1])
    for sid, sec in rows[:25]:
        name = stage_names.get(sid, "?")
        print(f"  {sec:6.1f}s  stage {sid}  {name[:130]}")


if __name__ == "__main__":
    main()
