#!/usr/bin/env python
"""Job-level decomposition of one KG pipeline run.

Runs run_kg_pipeline with the Spark event log enabled, then parses the
log into a per-job timeline: job wall time, #stages, #tasks, task-time
sum, and the driver-side GAP before each job (time no job was running =
planning / collect deserialization / python driver work). The serial
constant that bounds local N->4N scaling is exactly (sum of small-job
walls) + (sum of gaps); this names each contributor by callsite.

Usage: python scripts/profile_jobs.py --cores 16 --replicate 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--replicate", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--parse-only", default=None, help="existing eventLog dir; skip the run")
    ap.add_argument("--conf", action="append", default=[], help="extra spark conf k=v")
    ap.add_argument("--warmup", action="store_true", help="run the bench warm-up pass first")
    args = ap.parse_args()

    if args.parse_only:
        log_dir, wall = args.parse_only, float("nan")
    else:
        log_dir = tempfile.mkdtemp(prefix="spark-events-")
        from bionext_spark.flagship import run_kg_pipeline
        from bionext_spark.session import get_spark

        spark = get_spark(
            f"profile-jobs-{args.cores}", cores=args.cores,
            shuffle_partitions=max(args.cores, 8),
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.compress": "false",
                "spark.eventLog.dir": f"file://{log_dir}",
                **dict(c.split("=", 1) for c in args.conf),
            },
        )
        if args.warmup:
            warm = args.sf_dir.replace("sf0.1", "sf0.01")
            run_kg_pipeline(spark, warm if os.path.isdir(warm) else args.sf_dir, 1).write.format(
                "noop"
            ).mode("overwrite").save()
        t0 = time.time()
        triples = run_kg_pipeline(spark, args.sf_dir, args.replicate)
        try:
            triples.write.format("noop").mode("overwrite").save()
        except Exception:
            triples.count()
        wall = time.time() - t0
        spark.stop()
        print(f"eventlog: {log_dir}")

    from bionext_spark.sparklog import iter_events

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    sql_desc: dict[str, str] = {}
    for ev in iter_events(log_dir):
                e = ev.get("Event")
                if e == "SparkListenerJobStart":
                    jid = ev["Job ID"]
                    props = ev.get("Properties", {})
                    jobs[jid] = {
                        "start": ev["Submission Time"],
                        "site": props.get("callSite.short", ""),
                        "desc": (props.get("spark.job.description") or "")[:60],
                        "exec_id": props.get("spark.sql.execution.id"),
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    }
                elif e and e.endswith("SparkListenerSQLExecutionStart"):
                    sql_desc[str(ev.get("executionId"))] = (ev.get("description") or "")[:60]
                elif e == "SparkListenerJobEnd":
                    jid = ev["Job ID"]
                    if jid in jobs:
                        jobs[jid]["end"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    d = stages.setdefault(si["Stage ID"], {})
                    # merge — the TaskEnd events for this stage already
                    # accumulated task_sum into the same dict
                    d["tasks"] = si["Number of Tasks"]
                    d["wall"] = (si.get("Completion Time", 0) - si.get("Submission Time", 0)) / 1e3
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    d = stages.setdefault(sid, {})
                    ti = ev.get("Task Info", {})
                    d["task_sum"] = d.get("task_sum", 0) + (ti.get("Finish Time", 0) - ti.get("Launch Time", 0)) / 1e3

    order = sorted(jobs, key=lambda j: jobs[j]["start"])
    prev_end = None
    rows = []
    tot_gap = tot_job = 0.0
    for jid in order:
        j = jobs[jid]
        if "end" not in j:
            continue
        gap = (j["start"] - prev_end) / 1e3 if prev_end is not None else 0.0
        prev_end = max(prev_end or 0, j["end"])
        dur = (j["end"] - j["start"]) / 1e3
        tot_gap += max(gap, 0)
        tot_job += dur
        ts = sum(stages.get(s, {}).get("task_sum", 0) for s in j["stages"])
        nt = sum(stages.get(s, {}).get("tasks", 0) for s in j["stages"] if stages.get(s, {}).get("task_sum"))
        label = j["site"] or j["desc"] or sql_desc.get(str(j.get("exec_id")), "")
        rows.append((jid, round(gap, 2), round(dur, 2), len(j["stages"]), nt, round(ts, 1), label))

    print(f"wall={wall:.1f}s  jobs={len(rows)}  sum(job wall)={tot_job:.1f}s  sum(gaps)={tot_gap:.1f}s")
    print(f"{'job':>4} {'gap':>7} {'dur':>8} {'#st':>4} {'#tk':>5} {'taskSum':>8}  site")
    for r in rows:
        print(f"{r[0]:>4} {r[1]:>7} {r[2]:>8} {r[3]:>4} {r[4]:>5} {r[5]:>8}  {r[6]}")
    # aggregate by callsite
    agg: dict[str, list[float]] = {}
    for r in rows:
        agg.setdefault(r[6], [0, 0, 0])
        agg[r[6]][0] += 1
        agg[r[6]][1] += r[2]
        agg[r[6]][2] += r[1]
    print("\nby site:  n  sum(dur)  sum(gap-before)")
    for site, (n, d, g) in sorted(agg.items(), key=lambda kv: -(kv[1][1] + kv[1][2])):
        print(f"  {site:40s} {int(n):>3} {d:>8.1f} {g:>8.1f}")


if __name__ == "__main__":
    main()
