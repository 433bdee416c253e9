#!/bin/bash
# Round-5 stage 2: per-LEVEL probe gating (the r4_final protocol — fresh
# JVM per level, each level's reading accepted only inside its own clean
# probe window). The monolithic 33-min 25.6M bracket kept colliding with
# this host's ~35-min transient cadence; per-level windows fit between
# transients. Order: cheap evidence first.
#   1. two more 6.4M thread brackets (levels gated individually)
#   2. cluster bracket with per-executor JVM sizing
#   3. 25.6M N and 4N levels
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_AQE=false
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local
JAR=target/scala-2.13/npmrdsosmconflationspark_2.13-0.1.0.jar
say() { echo "[r5s2] $(date +%H:%M:%S) $*" >&2; }
wipe() { rm -rf /dev/shm/spark-local; mkdir -p /dev/shm/spark-local; }
BASE=${BASELINE_OVERRIDE:-12.64}

probe() {
  sbt -batch "runMain graft.ScalingBench 32 400000 16000" 2>/dev/null \
    | grep -oE '\{"cpus".*\}' | tail -1 \
    | python3 -c "
import json, sys
try: print(json.load(sys.stdin)['sec'])
except Exception: print(99999)"
}
healthy() { python3 -c "import sys; sys.exit(0 if float('$1') <= float('$BASE')*1.08 else 1)"; }

# gated_level <tag> <outfile> <cmd...>: probe, run, probe; retry till clean.
gated_level() {
  local tag=$1 out=$2; shift 2
  for a in $(seq 1 8); do
    local P; P=$(probe); say "$tag pre-probe $a: $P (base $BASE)"
    if ! healthy "$P"; then sleep 150; continue; fi
    wipe
    local R; R=$("$@")
    wipe
    local POST; POST=$(probe); say "$tag post-probe: $POST"
    if [ -n "$R" ] && healthy "$POST"; then
      python3 - "$R" "$P" "$POST" "$BASE" "$out" <<'PY'
import json, sys
d = json.loads(sys.argv[1])
d["probe_bracket"] = {"pre_sec": float(sys.argv[2]), "post_sec": float(sys.argv[3]),
                      "boot_baseline_sec": float(sys.argv[4]),
                      "gate": "per-level boot-relative probe gate +8%"}
json.dump(d, open(sys.argv[5], "w"), indent=1)
PY
      say "$tag DONE -> $out"; return 0
    fi
    say "$tag dirty — retry"; sleep 120
  done
  say "$tag GAVE UP"; return 1
}

level() { sbt -batch "runMain graft.ScalingBench $1 $2 $3" 2>/dev/null | grep -oE '\{"cpus".*\}' | tail -1; }

cluster_level() { # workers cores mem_mb cpus pages roads
  local w=$1 c=$2 mb=$3 cpus=$4 pages=$5 roads=$6
  SPARK_GRAFT_MASTER="local-cluster[$w,$c,$mb]" \
  SPARK_LOCAL_DIRS=/dev/shm/spark-local \
  /opt/spark/bin/spark-submit --master "local-cluster[$w,$c,$mb]" \
    --driver-memory 16g \
    --conf spark.executor.memory=$((mb - 2048))m \
    --conf spark.driver.extraJavaOptions="-XX:+AlwaysPreTouch -XX:ActiveProcessorCount=4" \
    --conf spark.executor.extraJavaOptions="-XX:+AlwaysPreTouch -Xms$((mb - 2048))m -XX:ActiveProcessorCount=$c" \
    --class graft.ScalingBench "$JAR" "$cpus" "$pages" "$roads" 2>>/tmp/r5s2_cluster.log \
    | grep -oE '\{"cpus".*\}' | tail -1
}

# 1. two more 6.4M brackets, levels gated individually, order alternated
gated_level b2_4N /tmp/r5s2_b2_4N.json level 8 6400000 256000
gated_level b2_N  /tmp/r5s2_b2_N.json  level 2 6400000 256000
gated_level b3_N  /tmp/r5s2_b3_N.json  level 2 6400000 256000
gated_level b3_4N /tmp/r5s2_b3_4N.json level 8 6400000 256000

# 2. cluster bracket, levels gated individually
gated_level cl_N  /tmp/r5s2_cl_N.json  cluster_level 1 2 16384 2 6400000 256000
gated_level cl_4N /tmp/r5s2_cl_4N.json cluster_level 4 2 16384 8 6400000 256000

# 3. 25.6M levels
gated_level s25_4N /tmp/r5s2_s25_4N.json level 8 25600000 1024000
gated_level s25_N  /tmp/r5s2_s25_N.json  level 2 25600000 1024000

say "STAGE2 COMPLETE"
