#!/bin/bash
# Round-5 follow-up measurements (run AFTER tools/r5_evidence.sh):
#  A. two more 6.4M thread-mode N->4N brackets, level order alternated,
#     for the median-of-3 certificate (r4C protocol);
#  B. the multi-executor bracket re-run with per-executor JVM sizing —
#     each executor JVM on this 32-core host otherwise sizes GC/JIT/netty
#     pools for 32 CPUs (4 JVMs x ~23 GC threads) and lazily commits its
#     heap; -XX:ActiveProcessorCount=<cores> + -Xms=heap + AlwaysPreTouch
#     give every executor the same discipline the thread-mode `run` task
#     pins (BENCH.md: lazy page commit inverts 32-thread scaling).
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_AQE=false
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local
JAR=target/scala-2.13/npmrdsosmconflationspark_2.13-0.1.0.jar
say() { echo "[r5f] $(date +%H:%M:%S) $*" >&2; }
wipe() { rm -rf /dev/shm/spark-local; mkdir -p /dev/shm/spark-local; }

probe() {
  sbt -batch "runMain graft.ScalingBench 32 400000 16000" 2>/dev/null \
    | grep -oE '\{"cpus".*\}' | tail -1 \
    | python3 -c "
import json, sys
try: print(json.load(sys.stdin)['sec'])
except Exception: print(99999)"
}
healthy() { python3 -c "import sys; sys.exit(0 if float('$1') <= float('$BASE')*1.08 else 1)"; }
BASE=${BASELINE_OVERRIDE:-12.64}
say "baseline $BASE"

level() { # cpus pages roads
  sbt -batch "runMain graft.ScalingBench $1 $2 $3" 2>/dev/null \
    | grep -oE '\{"cpus".*\}' | tail -1
}

# ---- A: two more thread-mode brackets, order alternated ----
tbracket() { # order: "8 2" or "2 8"; out
  local first=$1 second=$2 out=$3
  for a in 1 2 3 4; do
    local P; P=$(probe); say "tbracket($first,$second) pre-probe: $P"
    if ! healthy "$P"; then sleep 150; continue; fi
    wipe
    local R1 R2; R1=$(level "$first" 6400000 256000); wipe
    R2=$(level "$second" 6400000 256000); wipe
    local POST; POST=$(probe); say "tbracket post-probe: $POST"
    if healthy "$POST" && python3 - "$R1" "$R2" "$P" "$POST" "$BASE" "$first" "$out" <<'PY'
import json, sys
r1, r2 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
assert r1["segments"] == r2["segments"] and r1["tiles"] == r2["tiles"]
lo, hi = (r1, r2) if r1["cpus"] < r2["cpus"] else (r2, r1)
out = {"order": f"{sys.argv[6]} first", "N": lo, "4N": hi,
       "efficiency_N_to_4N": round((lo["sec"] / hi["sec"]) / 4.0, 3),
       "probe_bracket": {"pre_sec": float(sys.argv[3]), "post_sec": float(sys.argv[4]),
                         "boot_baseline_sec": float(sys.argv[5])}}
json.dump(out, open(sys.argv[7], "w"), indent=1)
PY
    then say "tbracket -> $out"; return 0; fi
    say "tbracket dirty — retry"; sleep 120
  done
  return 1
}

tbracket 8 2 /tmp/SCALING_r5_b2.json
tbracket 2 8 /tmp/SCALING_r5_b3.json

# ---- B: cluster bracket with per-executor JVM sizing ----
cluster_level() { # workers cores mem_mb cpus pages roads
  local w=$1 c=$2 mb=$3 cpus=$4 pages=$5 roads=$6
  SPARK_GRAFT_MASTER="local-cluster[$w,$c,$mb]" \
  SPARK_LOCAL_DIRS=/dev/shm/spark-local \
  /opt/spark/bin/spark-submit --master "local-cluster[$w,$c,$mb]" \
    --driver-memory 16g \
    --conf spark.executor.memory=$((mb - 2048))m \
    --conf spark.driver.extraJavaOptions="-XX:+AlwaysPreTouch -XX:ActiveProcessorCount=4" \
    --conf spark.executor.extraJavaOptions="-XX:+AlwaysPreTouch -Xms$((mb - 2048))m -XX:ActiveProcessorCount=$c" \
    --class graft.ScalingBench "$JAR" "$cpus" "$pages" "$roads" 2>>/tmp/r5f_cluster.log \
    | grep -oE '\{"cpus".*\}' | tail -1
}
for a in 1 2 3 4; do
  P=$(probe); say "cluster pre-probe: $P"
  if ! healthy "$P"; then sleep 150; continue; fi
  wipe
  RN=$(cluster_level 1 2 16384 2 6400000 256000); wipe
  R4N=$(cluster_level 4 2 16384 8 6400000 256000); wipe
  POST=$(probe); say "cluster post-probe: $POST"
  if healthy "$POST" && python3 - "$RN" "$R4N" "$P" "$POST" "$BASE" <<'PY'
import json, sys
rn, r4 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
assert rn["segments"] == r4["segments"] and rn["tiles"] == r4["tiles"]
out = {"mode": "local-cluster separate executor JVMs (spark-submit)",
       "jvm_sizing": "-Xms=heap -XX:+AlwaysPreTouch -XX:ActiveProcessorCount=cores per executor",
       "N_1_executor_2_cores": rn, "4N_4_executors_2_cores": r4,
       "efficiency_N_to_4N": round((rn["sec"] / r4["sec"]) / 4.0, 3),
       "probe_bracket": {"pre_sec": float(sys.argv[3]), "post_sec": float(sys.argv[4]),
                         "boot_baseline_sec": float(sys.argv[5])}}
json.dump(out, open("/tmp/SCALING_r5_cluster_fixed.json", "w"), indent=1)
PY
  then say "cluster -> /tmp/SCALING_r5_cluster_fixed.json"; break; fi
  say "cluster dirty — retry"; sleep 120
done
say "FOLLOWUP COMPLETE"
