#!/bin/bash
# Two-cluster-size scaling evidence: identical job, N=local[8] vs 4N=local[32],
# each in a fresh JVM with the machine otherwise idle.
set -e
PAGES=${1:-6400000}
ROADS=${2:-256000}
cd "$(dirname "$0")/.."
# wipe leaked shuffle dirs from killed runs first — 73G of tmpfs leftovers
# were found shrinking available RAM and degrading every later measurement
rm -rf /dev/shm/spark-local
mkdir -p /dev/shm/spark-local
export SPARK_GRAFT_AQE=false               # no driver-serial replanning in the measurement
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local
RN=$(sbt -batch "runMain graft.ScalingBench 2 $PAGES $ROADS" 2>/dev/null | grep -oE '\{"cpus".*\}' | tail -1)
R4N=$(sbt -batch "runMain graft.ScalingBench 8 $PAGES $ROADS" 2>/dev/null | grep -oE '\{"cpus".*\}' | tail -1)
R16N=$(sbt -batch "runMain graft.ScalingBench 32 $PAGES $ROADS" 2>/dev/null | grep -oE '\{"cpus".*\}' | tail -1)
python3 - "$RN" "$R4N" "$R16N" <<'PY'
import json, sys
rn, r4, r16 = (json.loads(a) for a in sys.argv[1:4])
assert rn["segments"] == r4["segments"] == r16["segments"], "nondeterministic output"
print(json.dumps({
    "N_local2": rn, "4N_local8": r4, "16N_local32": r16,
    "efficiency_N_to_4N": round((rn["sec"] / r4["sec"]) / 4.0, 3),
    "efficiency_4N_to_16N": round((r4["sec"] / r16["sec"]) / 4.0, 3)}))
PY
