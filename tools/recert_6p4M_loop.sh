#!/bin/bash
# Re-certify the NORTH-RULE criterion bracket (6.4M pages / 256k roads,
# local[2] vs local[8], fresh JVM per level) on the CURRENT binary — the r3
# certificate (585.0 / 160.3 s, efficiency 0.913) predates the round-4 diff;
# although that diff did not touch the conflation pipeline, a same-round
# clean-window re-measurement is stronger evidence than the argument.
# Bracket rule: probe <16.2 before the suite and a settled probe <16.2
# after it. Self-commits SCALING_r4_6p4M_recert.json on success.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_AQE=false
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local

clean_shm() { rm -rf /dev/shm/spark-local; mkdir -p /dev/shm/spark-local; }
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
healthy() { python3 -c "import sys; sys.exit(0 if float('$1') < 16.2 else 1)"; }
level() {
  sbt -batch "runMain graft.ScalingBench $1 6400000 256000" 2>/dev/null \
    | grep -oE '\{"cpus".*\}' | tail -1
}

for attempt in $(seq 1 40); do
  P=$(probe)
  echo "[recert6p4] $(date +%H:%M) probe $attempt: ${P}s" >&2
  if ! healthy "$P"; then sleep 180; continue; fi
  clean_shm
  R2=$(level 2)
  echo "[recert6p4] $(date +%H:%M) local[2]: $R2" >&2
  clean_shm
  R8=$(level 8)
  echo "[recert6p4] $(date +%H:%M) local[8]: $R8" >&2
  clean_shm
  PIMM=$(probe)
  echo "[recert6p4] $(date +%H:%M) immediate post-probe: ${PIMM}s" >&2
  PPOST=$PIMM
  if ! healthy "$PIMM"; then
    sleep 180
    PPOST=$(probe)
    echo "[recert6p4] $(date +%H:%M) settled post-probe: ${PPOST}s" >&2
  fi
  if [ -n "$R2" ] && [ -n "$R8" ] && healthy "$PPOST"; then
    if python3 - "$R2" "$R8" "$P" "$PIMM" "$PPOST" <<'PY'
import json, sys
r2, r8 = json.loads(sys.argv[1]), json.loads(sys.argv[2])
for r in (r2, r8):
    assert r["n_pages"] == 6400000 and r["segments"] > 4000000, r
assert r2["segments"] == r8["segments"] and r2["tiles"] == r8["tiles"], (r2, r8)
out = {
  "scale": {"pages": 6400000, "roads": 256000},
  "binary": "round-4 HEAD (post q51-q57, dedup guards, bandMask fix)",
  "certified_bracket": {"probe_pre_sec": float(sys.argv[3]),
                        "probe_post_immediate_sec": float(sys.argv[4]),
                        "probe_post_settled_sec": float(sys.argv[5])},
  "N_local2": r2,
  "4N_local8": r8,
  "efficiency_N_to_4N": round((r2["sec"] / r8["sec"]) / 4.0, 3),
  "r3_reference": {"local2_sec": 585.0, "local8_sec": 160.3,
                   "efficiency": 0.913},
}
json.dump(out, open("SCALING_r4_6p4M_recert.json", "w"), indent=1)
print(out["efficiency_N_to_4N"])
PY
    then
      git add SCALING_r4_6p4M_recert.json \
        && git commit -q -m "Re-certify the 6.4M N-vs-4N criterion bracket on the round-4 binary" \
        && echo "[recert6p4] CERTIFIED" && exit 0
      echo "[recert6p4] commit failed, retrying" >&2
    else
      echo "[recert6p4] output garbled, retrying" >&2
    fi
  else
    echo "[recert6p4] bracket not clean, retrying" >&2
  fi
  sleep 240
done
echo "[recert6p4] gave up after 40 attempts"
exit 1
