#!/usr/bin/env python
"""Benchmark harness.

Default mode: times the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus the full KG
pipeline (turns/sec) at two parallelism levels (local[N] and local[4N],
via subprocesses so each gets a fresh JVM) for the north rule's scaling-
efficiency evidence. Prints ONE JSON line:

  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": <sf>,
   "kg_scaling": {"cores_n": 8, "turns_per_sec_n": ...,
                  "cores_4n": 32, "turns_per_sec_4n": ...,
                  "efficiency": ...}}

Subprocess mode (internal): `bench.py --phase kg --cores N` runs only the
KG pipeline and prints {"seconds": ..., "turns": ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "j1_broadcast_lookup",
    "j4_nearest_event",
    "j5_pair_selfjoin",
    "a1_majority_vote",
    "a2_softmax_argmax",
    "a3_interval_merge",
    "w1_ordered_reassembly",
    "sessionize",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_topk_cosine",
    "ann_lsh_bucket",
    "text_stats",
    "text_fingerprint",
]


def _materialize(df) -> int:
    try:
        df.write.format("noop").mode("overwrite").save()
        return -1
    except Exception:
        return df.count()


def run_kg(cores: int) -> dict:
    from bionext_spark.flagship import run_kg_pipeline
    from bionext_spark.session import get_spark

    spark = get_spark(f"bench-kg-{cores}", cores=cores, shuffle_partitions=max(cores, 8))
    turns = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    t0 = time.time()
    triples = run_kg_pipeline(spark, SF_DIR)
    _materialize(triples)
    dt = time.time() - t0
    spark.stop()
    return {"seconds": dt, "turns": turns}


def run_queries() -> tuple[dict[str, float], float]:
    from bionext_spark.corpus_queries import CORPUS
    from bionext_spark.entry_queries import RELATIONAL
    from bionext_spark.session import get_spark

    registry = {**RELATIONAL, **CORPUS}
    spark = get_spark("bench-queries", cores=CPUS, shuffle_partitions=max(CPUS, 8))
    times: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn, _ = registry[name]
        t0 = time.time()
        _materialize(fn(spark, SF_DIR))
        dt = time.time() - t0
        times[name] = round(dt, 3)
        total += dt
    spark.stop()
    return times, total


def scaling_evidence(n: int) -> dict:
    out = {}
    for label, cores in (("n", n), ("4n", 4 * n)):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", "kg", "--cores", str(cores)],
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
        r = json.loads(line)
        out[f"cores_{label}"] = cores
        out[f"seconds_{label}"] = round(r["seconds"], 3)
        out[f"turns_per_sec_{label}"] = round(r["turns"] / r["seconds"], 1)
        out["turns"] = r["turns"]
    out["efficiency"] = round(
        out["turns_per_sec_4n"] / (4.0 * out["turns_per_sec_n"]), 3
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="full", choices=["full", "kg", "queries"])
    ap.add_argument("--cores", type=int, default=CPUS)
    ap.add_argument("--scaling-n", type=int, default=8)
    ap.add_argument("--skip-scaling", action="store_true")
    args = ap.parse_args()

    if args.phase == "kg":
        print(json.dumps(run_kg(args.cores)))
        return

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    times, total = run_queries()
    result = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
    }
    if args.phase == "full" and not args.skip_scaling:
        try:
            result["kg_scaling"] = scaling_evidence(args.scaling_n)
        except Exception as e:  # scaling evidence is best-effort in bench
            result["kg_scaling_error"] = str(e)[:200]
    print(json.dumps(result))


if __name__ == "__main__":
    main()
