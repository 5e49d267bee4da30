#!/usr/bin/env bash
# spark-submit deployment smoke: the north rule's jobs run via spark-submit
# on a cluster; this packages the library jar and submits the Verify job
# (every SparkEntry operator end-to-end) through the real spark-submit
# launcher instead of sbt's forked JVM. Local master stands in for the
# cluster manager — the jar + entrypoint contract is identical.
#
#   scripts/spark_submit_smoke.sh [sfDir] [outDir] [master]
set -euo pipefail
cd "$(dirname "$0")/.."

SF_DIR="${1:-/root/testdata/sf0.001}"
OUT_DIR="${2:-/tmp/spark_submit_verify}"
MASTER="${3:-local[4]}"

sbt -batch package
JAR=$(ls target/scala-2.13/*.jar | head -1)
rm -rf "$OUT_DIR"

/opt/spark/bin/spark-submit \
  --master "$MASTER" \
  --class graft.Verify \
  --conf spark.ui.enabled=false \
  --conf spark.driver.host=127.0.0.1 \
  "$JAR" "$SF_DIR" "$OUT_DIR"

n=$(ls -d "$OUT_DIR"/q_* | wc -l)
echo "spark-submit smoke: $n query dumps in $OUT_DIR"
test "$n" -ge 40
