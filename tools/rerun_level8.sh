#!/bin/bash
# Re-certify the local[8] point of SCALING_r4: the first suite's post-probe
# read 49s (host degraded mid-suite), making the 848s level-8 number suspect.
# Gate on a healthy probe BEFORE and AFTER; only a run bracketed by two
# healthy probes is certified.
set -e
cd "$(dirname "$0")/.."
PAGES=25600000
ROADS=1024000
mkdir -p /dev/shm/spark-local
export SPARK_GRAFT_AQE=false
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local

probe() {
  sbt -batch "runMain graft.ScalingBench 32 400000 16000" 2>/dev/null \
    | grep -oE '\{"cpus".*\}' | tail -1 \
    | python3 -c "
import json, sys
try:
    print(json.load(sys.stdin)['sec'])
except Exception:
    print(99999)
"
}

for attempt in $(seq 1 40); do
  P=$(probe)
  echo "[rerun8] probe attempt $attempt: ${P}s" >&2
  if python3 -c "import sys; sys.exit(0 if float('$P') < 17.0 else 1)"; then
    R8=$(sbt -batch "runMain graft.ScalingBench 8 $PAGES $ROADS" 2>/dev/null | grep -oE '\{"cpus".*\}' | tail -1)
    echo "[rerun8] local[8]: $R8" >&2
    PPOST=$(probe)
    echo "[rerun8] post-probe: ${PPOST}s" >&2
    if python3 -c "import sys; sys.exit(0 if float('$PPOST') < 17.0 else 1)"; then
      echo "CERTIFIED $P $PPOST $R8"
      exit 0
    fi
    echo "[rerun8] post-probe unhealthy, retrying whole bracket" >&2
  fi
  sleep 180
done
echo "UNCERTIFIED"
exit 1
