#!/bin/bash
# North-rule literal path: the scaling job driven by spark-submit — the
# exact graft.ScalingBench main the sbt path runs, as a packaged jar on a
# fresh JVM per parallelism level. The library has no dependencies beyond
# Spark itself, so the plain `sbt -batch package` jar submits as-is.
#
#   sbt -batch package
#   tools/spark_submit_scaling.sh <cpus> [pages] [roads]
#
# The session builder pins master=local[cpus] internally (identical to the
# sbt path), so the submitted app measures the same thing byte-for-byte;
# SPARK_GRAFT_* env knobs (PARTS, AQE, LOCAL_DIR) pass through unchanged.
set -eu
cd "$(dirname "$0")/.."
CPUS=${1:-8}; PAGES=${2:-400000}; ROADS=${3:-16000}
JAR=$(ls -t target/scala-2.13/*.jar 2>/dev/null | head -1)
if [ -z "$JAR" ]; then
  echo "no jar found — run 'sbt -batch package' first" >&2
  exit 1
fi
exec /opt/spark/bin/spark-submit \
  --master "local[$CPUS]" \
  --driver-memory "${SPARK_DRIVER_MEM:-48g}" \
  --conf spark.driver.extraJavaOptions="-XX:+AlwaysPreTouch" \
  --class graft.ScalingBench \
  "$JAR" "$CPUS" "$PAGES" "$ROADS"
