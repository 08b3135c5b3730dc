"""Unit tests for bench.py's event-log task-work accounting.

The work-normalized scaling efficiency (BENCH/BASELINE.md) is computed
from `_task_work`; these tests pin its accounting rules — each closed a
round-4 ADVICE item — against a synthesized event log, with no Spark
session involved:

- only successful, non-speculative task attempts count;
- tasks straddling a timed window contribute clipped overlap seconds
  (no all-or-nothing fudge margins), so probe-wave tasks launched after
  the window end contribute exactly zero;
- the NET duration subtracts the task's own JVM GC time and
  shuffle-write time, pro-rata for clipped tasks.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _task_work  # noqa: E402


def _event(launch_s: float, finish_s: float, reason: str = "Success",
           speculative: bool = False, gc_ms: int = 0, sw_ns: int = 0) -> dict:
    return {
        "Event": "SparkListenerTaskEnd",
        "Task End Reason": {"Reason": reason},
        "Task Info": {
            "Launch Time": int(launch_s * 1e3),
            "Finish Time": int(finish_s * 1e3),
            "Speculative": speculative,
        },
        "Task Metrics": {
            "JVM GC Time": gc_ms,
            "Shuffle Write Metrics": {"Shuffle Write Time": sw_ns},
        },
    }


def _write_log(tmp_path, events) -> str:
    log_dir = tmp_path / "events"
    log_dir.mkdir()
    (log_dir / "app-1").write_text("\n".join(json.dumps(e) for e in events) + "\n")
    return str(log_dir)


def test_success_only_non_speculative(tmp_path):
    log = _write_log(tmp_path, [
        _event(100.0, 110.0),                                   # counts: 10s
        _event(100.0, 110.0, reason="TaskKilled"),              # excluded
        _event(100.0, 110.0, reason="ExceptionFailure"),        # excluded
        _event(100.0, 110.0, speculative=True),                 # excluded
    ])
    work = _task_work(log, [(95.0, 115.0)], cores=2)
    assert work["task_sec"] == [10.0]
    assert work["util"] == [pytest.approx(10.0 / (2 * 20.0), abs=1e-4)]


def test_straddling_tasks_clip_to_window(tmp_path):
    # one task straddles the window start, one the end, one is fully
    # outside (a probe-wave task launched after the rep) — the old
    # all-or-nothing filter dropped the straddlers and could admit the
    # probe task via its +1.0s margin.
    log = _write_log(tmp_path, [
        _event(90.0, 110.0),    # 10s of overlap with [100, 200]
        _event(195.0, 215.0),   # 5s of overlap
        _event(201.0, 210.0),   # post-window probe task: zero
    ])
    work = _task_work(log, [(100.0, 200.0)], cores=1)
    assert work["task_sec"] == [15.0]


def test_net_subtracts_gc_and_shuffle_write_pro_rata(tmp_path):
    # fully-inside task: 10s gross, 2s GC + 1s shuffle write -> 7s net.
    # half-clipped task (20s span, 10s inside): 4s overhead -> pro-rata
    # 2s of it lands inside, 10 - 2 = 8s net.
    log = _write_log(tmp_path, [
        _event(110.0, 120.0, gc_ms=2000, sw_ns=int(1e9)),
        _event(190.0, 210.0, gc_ms=4000),
    ])
    work = _task_work(log, [(100.0, 200.0)], cores=1)
    assert work["task_sec"] == [20.0]
    assert work["task_sec_net"] == [pytest.approx(15.0, abs=0.1)]


def test_multiple_windows_independent(tmp_path):
    log = _write_log(tmp_path, [
        _event(100.0, 110.0),
        _event(300.0, 320.0),
    ])
    work = _task_work(log, [(95.0, 115.0), (295.0, 325.0)], cores=4)
    assert work["task_sec"] == [10.0, 20.0]
    assert work["task_sec_net"] == [10.0, 20.0]
