#!/usr/bin/env python
"""Weak-point shuffle-partition sweep: 16-core, replicate 96, warm."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parts = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    from bionext_spark.flagship import run_kg_pipeline
    from bionext_spark.session import get_spark

    spark = get_spark(f"weak-{parts}", cores=16, shuffle_partitions=parts,
                      extra_conf={"spark.driver.memory": "24g"})
    sf = "/root/testdata/sf0.1"
    run_kg_pipeline(spark, "/root/testdata/sf0.01", 1).write.format("noop").mode("overwrite").save()
    t0 = time.time()
    run_kg_pipeline(spark, sf, replicate).write.format("noop").mode("overwrite").save()
    print(json.dumps({"parts": parts, "replicate": replicate,
                      "seconds": round(time.time() - t0, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
