#!/bin/bash
# Round-4 north-rule scaling evidence AT THE STRETCH SCALE: the identical
# conflation job on 25.6M pages / 1.024M roads at local[2] (N), local[8]
# (4N), and local[32] (16N), each level in a fresh JVM, machine otherwise
# idle, gated on the VM health probe (BENCH.md item 14: the host's memory
# path transiently degrades 2-5x; probing avoids certifying a noisy window).
set -e
cd "$(dirname "$0")/.."
PAGES=${1:-25600000}
ROADS=${2:-1024000}
OUT=${3:-SCALING_r4.json}
# wipe leaked shuffle dirs from killed runs first — 73G of tmpfs leftovers
# were found shrinking available RAM and degrading every later measurement
rm -rf /dev/shm/spark-local
mkdir -p /dev/shm/spark-local
export SPARK_GRAFT_AQE=false
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local

probe() {
  # a failed/garbled probe (e.g. concurrent recompile) reads as unhealthy,
  # not a crash
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

HEALTHY=0
for attempt in $(seq 1 20); do
  P=$(probe)
  echo "[scaling_r4] probe attempt $attempt: ${P}s" >&2
  if python3 -c "import sys; sys.exit(0 if float('$P') < 17.0 else 1)"; then
    HEALTHY=1
    break
  fi
  sleep 120
done
if [ "$HEALTHY" != 1 ]; then
  # never certify a noisy window: exhausting the probe budget aborts
  echo "[scaling_r4] no healthy probe in 20 attempts (last ${P}s) — aborting" >&2
  exit 1
fi
echo "[scaling_r4] probe healthy (${P}s), running levels" >&2

RN=$(sbt -batch "runMain graft.ScalingBench 2 $PAGES $ROADS" 2>/dev/null | grep -oE '\{"cpus".*\}' | tail -1)
echo "[scaling_r4] local[2]: $RN" >&2
R4N=$(sbt -batch "runMain graft.ScalingBench 8 $PAGES $ROADS" 2>/dev/null | grep -oE '\{"cpus".*\}' | tail -1)
echo "[scaling_r4] local[8]: $R4N" >&2
R16N=$(sbt -batch "runMain graft.ScalingBench 32 $PAGES $ROADS" 2>/dev/null | grep -oE '\{"cpus".*\}' | tail -1)
echo "[scaling_r4] local[32]: $R16N" >&2
PPOST=$(probe)
echo "[scaling_r4] post-probe: ${PPOST}s" >&2

python3 - "$RN" "$R4N" "$R16N" "$P" "$PPOST" > "$OUT" <<'PY'
import json, sys
rn, r4, r16 = (json.loads(a) for a in sys.argv[1:4])
assert rn["segments"] == r4["segments"] == r16["segments"], "nondeterministic output"
print(json.dumps({
    "scale": {"pages": rn["n_pages"], "roads": rn["n_roads"]},
    "probe_pre_sec": float(sys.argv[4]), "probe_post_sec": float(sys.argv[5]),
    "N_local2": rn, "4N_local8": r4, "16N_local32": r16,
    "efficiency_N_to_4N": round((rn["sec"] / r4["sec"]) / 4.0, 3),
    "efficiency_4N_to_16N": round((r4["sec"] / r16["sec"]) / 4.0, 3)}, indent=1))
PY
echo "[scaling_r4] wrote $OUT" >&2
cat "$OUT"
