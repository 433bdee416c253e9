#!/bin/bash
# Keep hunting for a clean host window to certify the 25.6M local[8] point
# (SCALING_r4's one uncertified level). A certified bracket = healthy probe
# BEFORE the measurement and a healthy SETTLED probe after it. The post-run
# probe is taken twice: immediately (recorded for transparency) and after a
# 3-minute idle settle — the immediate one measures the 50 GB run's reclaim
# aftermath as much as ambient host health, which is not what the
# certificate is about. Both readings land in the artifact. On success:
# write the artifact, commit, and exit. Safe to leave running at round end.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_AQE=false
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local

# Killed/failed runs LEAK shuffle dirs into tmpfs — 73G of leftovers were
# found eating RAM (available 51G on a 125G box), which is exactly the
# "progressively degrading memory path" the level-8 reruns recorded: each
# failed attempt slowed the next. Wipe before every measurement; these
# scripts run exclusively, so nothing live uses the dir.
clean_shm() {
  rm -rf /dev/shm/spark-local
  mkdir -p /dev/shm/spark-local
}
clean_shm

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

for attempt in $(seq 1 60); do
  P=$(probe)
  echo "[certify8] $(date +%H:%M) probe $attempt: ${P}s" >&2
  if python3 -c "import sys; sys.exit(0 if float('$P') < 17.0 else 1)"; then
    clean_shm
    R8=$(sbt -batch "runMain graft.ScalingBench 8 25600000 1024000" 2>/dev/null | grep -oE '\{"cpus".*\}' | tail -1)
    echo "[certify8] $(date +%H:%M) local[8]: $R8" >&2
    clean_shm
    PIMM=$(probe)
    echo "[certify8] $(date +%H:%M) immediate post-probe: ${PIMM}s" >&2
    PPOST=$PIMM
    if ! python3 -c "import sys; sys.exit(0 if float('$PIMM') < 17.0 else 1)"; then
      sleep 180   # settle: let reclaim/compaction quiesce, then re-probe
      PPOST=$(probe)
      echo "[certify8] $(date +%H:%M) settled post-probe: ${PPOST}s" >&2
    fi
    if [ -n "$R8" ] && python3 -c "import sys; sys.exit(0 if float('$PPOST') < 17.0 else 1)"; then
      # the artifact write must SUCCEED (valid JSON, expected segment count)
      # before anything is committed — a garbled sbt run must not reach
      # "CERTIFIED" or stage a stale artifact from a previous attempt
      if python3 - "$R8" "$P" "$PIMM" "$PPOST" <<'PY'
import json, sys
r8 = json.loads(sys.argv[1])
assert r8["segments"] == 18543376, f"unexpected segments: {r8['segments']}"
out = {
  "certified_bracket": {"probe_pre_sec": float(sys.argv[2]),
                        "probe_post_immediate_sec": float(sys.argv[3]),
                        "probe_post_settled_sec": float(sys.argv[4]),
                        "settle_note": "post-probe certifies on the settled reading (3-min idle after the 50GB-RSS run) when the immediate one is inflated by reclaim aftermath; both recorded"},
  "local8_25p6M": r8,
  "efficiency_N_to_4N_vs_suite_local2": round((2310.99 / r8["sec"]) / 4.0, 3),
}
json.dump(out, open("SCALING_r4_level8_certified.json", "w"), indent=1)
PY
      then
        git add SCALING_r4_level8_certified.json \
          && git commit -q -m "Certify the 25.6M local[8] scaling point in a clean probe bracket" \
          && echo "[certify8] CERTIFIED" \
          && exit 0
        echo "[certify8] commit failed, retrying" >&2
      else
        echo "[certify8] level-8 output garbled, retrying" >&2
      fi
    else
      echo "[certify8] bracket not clean, retrying" >&2
    fi
  fi
  sleep 240
done
echo "[certify8] gave up after 60 attempts"
exit 1
