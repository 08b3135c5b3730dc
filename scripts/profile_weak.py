#!/usr/bin/env python
"""Weak-regime kernel batch-size A/B (round-3 verdict ask #2).

Round 3 measured weak-scaling (4N cores on 4x data vs N on 1x) at 0.579
and hypothesized the classifier tail burns more CPU per row at 12x data
(cache locality). This script runs the weak point (16 cores, replicate
4x24=96) under different cfg.kernel_batch_size values — which also sets
spark.sql.execution.arrow.maxRecordsPerBatch for the kernel stages — in
fresh subprocess JVMs with the bench's warm protocol, and prints seconds
per config. Usage: python scripts/profile_weak.py [batch ...]
"""
from __future__ import annotations

import dataclasses
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_one(batch: int, cores: int, replicate: int) -> None:
    import bionext_spark.flagship as FL
    from bionext_spark.session import get_spark

    FL.DEFAULT_CONFIG = dataclasses.replace(FL.DEFAULT_CONFIG, kernel_batch_size=batch)
    spark = get_spark(f"weak-{batch}", cores=cores, shuffle_partitions=max(cores, 8))
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    warm = sf.replace("sf0.1", "sf0.01")
    FL.run_kg_pipeline(spark, warm if os.path.isdir(warm) else sf, 1).write.format(
        "noop").mode("overwrite").save()
    t0 = time.time()
    FL.run_kg_pipeline(spark, sf, replicate).write.format("noop").mode("overwrite").save()
    print(json.dumps({"batch": batch, "cores": cores, "replicate": replicate,
                      "seconds": round(time.time() - t0, 1)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) >= 4 and sys.argv[1] == "--one":
        run_one(int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]))
        return
    batches = [int(x) for x in sys.argv[1:]] or [1024, 4096]
    for b in batches:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(b), "16", "96"],
            capture_output=True, text=True,
        )
        line = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        print(line[-1] if line else f"FAILED batch={b}: {proc.stderr[-300:]}")


if __name__ == "__main__":
    main()
