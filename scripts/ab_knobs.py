#!/usr/bin/env python
"""A/B one warm KG run at a core count with optional tuning knobs.

Usage: python scripts/ab_knobs.py --cores 16 --replicate 24 --variant base|tuned
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--replicate", type=int, default=24)
    ap.add_argument("--variant", default="tuned")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    if args.variant == "tuned":
        # worker thread caps must be in the env before the JVM forks workers
        for k in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
            os.environ[k] = "1"

    from bionext_spark.flagship import run_kg_pipeline
    from bionext_spark.session import get_spark

    extra = {}
    shuffle_parts = max(args.cores, 8)
    if args.variant == "tuned":
        extra = {
            "spark.shuffle.file.buffer": "1m",
            "spark.shuffle.unsafe.file.output.buffer": "1m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16m",
            "spark.executorEnv.OMP_NUM_THREADS": "1",
            "spark.executorEnv.OPENBLAS_NUM_THREADS": "1",
        }
        shuffle_parts = args.cores * 3

    spark = get_spark(f"ab-{args.variant}-{args.cores}", cores=args.cores,
                      shuffle_partitions=shuffle_parts, extra_conf=extra)
    warm = args.sf_dir.replace("sf0.1", "sf0.01")
    run_kg_pipeline(spark, warm if os.path.isdir(warm) else args.sf_dir, 1).write.format(
        "noop").mode("overwrite").save()
    t0 = time.time()
    triples = run_kg_pipeline(spark, args.sf_dir, args.replicate)
    triples.write.format("noop").mode("overwrite").save()
    dt = time.time() - t0
    print(json.dumps({"variant": args.variant, "cores": args.cores,
                      "replicate": args.replicate, "seconds": round(dt, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
