"""Minimal Spark event-log reader shared by the bench and profiler.

One place that knows the on-disk layout (rolling ``eventlog_v2_*/``
directories, ``appstatus_*`` markers, optional ``.zstd`` compression), so
a format quirk gets fixed once — bench.run_skew and
scripts/profile_jobs.py previously carried divergent copies (only one
handled compressed logs).
"""

from __future__ import annotations

import glob
import io
import json
import os
from typing import Iterator


def _open_log(path: str):
    if path.endswith(".zstd"):
        import subprocess

        # check=True: a missing zstd binary or corrupt log must surface as
        # an error, not silently parse as zero events (which made run_skew
        # report max_task_seconds = 0.0 — misleading evidence)
        out = subprocess.run(["zstd", "-dc", path], capture_output=True, check=True)
        return io.StringIO(out.stdout.decode())
    return open(path)


def iter_events(log_dir: str) -> Iterator[dict]:
    """Yield every parseable event dict from a Spark event-log directory."""
    paths = [
        p
        for pat in ("*", "*/*")
        for p in glob.glob(os.path.join(log_dir, pat))
        if os.path.isfile(p) and "appstatus" not in os.path.basename(p)
    ]
    for path in paths:
        with _open_log(path) as f:
            for line in f:
                try:
                    yield json.loads(line)
                except Exception:
                    continue


def iter_task_end(log_dir: str) -> Iterator[dict]:
    """Yield SparkListenerTaskEnd events only."""
    for ev in iter_events(log_dir):
        if ev.get("Event") == "SparkListenerTaskEnd":
            yield ev
