#!/usr/bin/env bash
# Cluster launch: package the engine and run the KG pipeline via
# spark-submit --py-files on a real cluster (the north rule's launch mode).
# Locally this degrades to local[N] (SPARK_GRAFT_ON_CLUSTER unset).
set -euo pipefail
cd "$(dirname "$0")/.."

rm -f /tmp/bionext_spark.zip
zip -qr /tmp/bionext_spark.zip bionext_spark

exec spark-submit \
  --driver-memory "${DRIVER_MEM:-8g}" \
  --py-files /tmp/bionext_spark.zip \
  --conf spark.sql.shuffle.partitions="${SHUFFLE_PARTITIONS:-32}" \
  --conf spark.sql.adaptive.enabled=true \
  --conf spark.sql.adaptive.skewJoin.enabled=true \
  --conf spark.sql.execution.arrow.pyspark.enabled=true \
  --conf spark.sql.session.timeZone=UTC \
  scripts/run_pipeline.py "$@"
