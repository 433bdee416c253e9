#!/bin/bash
# Round-4 scaling CURVE on the final binary: the same 6.4M-page / 256k-road
# job at local[1], local[2], local[4], local[8] inside ONE probe-gated clean
# bracket (fresh JVM per level, tmpfs wiped between runs).
#
# Why a curve and not just the 2-vs-8 bracket: the north-rule criterion is
# "N vs 4N executors"; on this single shared box the memory controller is
# the resource that stops scaling, and WHERE it stops is the evidence that
# the engine (plan shape, partitioning, shuffle volume) is not the limiter.
# The curve gives two independent N-vs-4N instantiations (1->4 and 2->8)
# plus every adjacent doubling.
#
# Probe gating is boot-relative (median-of-3 startup probes +8%), same as
# tools/certify_r4b.sh — absolute gates do not transfer across VM reboots.
# Writes $OUT_JSON (default SCALING_r4_curve.json) on success; PAGES/ROADS/
# LEVELS/COMMIT_MSG parametrize the scale, the level set, and the commit.
set -u
cd "$(dirname "$0")/.."
export SPARK_GRAFT_AQE=false
export SPARK_GRAFT_LOCAL_DIR=/dev/shm/spark-local
PAGES=${PAGES:-6400000}
ROADS=${ROADS:-256000}
LEVELS=${LEVELS:-"1 2 4 8"}
OUT_JSON=${OUT_JSON:-SCALING_r4_curve.json}
COMMIT_MSG=${COMMIT_MSG:-"Measure the 6.4M scaling curve at 1/2/4/8 cores in one clean bracket"}

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
level() {
  clean_shm
  sbt -batch "runMain graft.ScalingBench $1 $PAGES $ROADS" 2>/dev/null \
    | grep -oE '\{"cpus".*\}' | tail -1
}

P1=$(probe); P2=$(probe); P3=$(probe)
BASE=$(python3 -c "print(sorted([float('$P1'),float('$P2'),float('$P3')])[1])")
echo "[curve] $(date +%H:%M) boot probes: $P1 $P2 $P3 -> baseline $BASE" >&2
if ! python3 -c "import sys; sys.exit(0 if float('$BASE') < 30 else 1)"; then
  echo "[curve] baseline insane, aborting" >&2; exit 1
fi
healthy() { python3 -c "import sys; sys.exit(0 if float('$1') <= float('$BASE')*1.08 else 1)"; }

for attempt in $(seq 1 12); do
  P=$(probe)
  echo "[curve] $(date +%H:%M) pre-probe $attempt: ${P}s" >&2
  if ! healthy "$P"; then sleep 180; continue; fi
  OUT="{"
  ok=1
  for lvl in $LEVELS; do
    R=$(level "$lvl")
    echo "[curve] $(date +%H:%M) local[$lvl]: $R" >&2
    if [ -z "$R" ]; then ok=0; break; fi
    OUT="$OUT\"local$lvl\": $R,"
  done
  clean_shm
  PIMM=$(probe)
  echo "[curve] $(date +%H:%M) post-probe: ${PIMM}s" >&2
  PPOST=$PIMM
  if ! healthy "$PIMM"; then
    sleep 180
    PPOST=$(probe)
    echo "[curve] $(date +%H:%M) settled post-probe: ${PPOST}s" >&2
  fi
  if [ "$ok" = 1 ] && healthy "$PPOST"; then
    python3 - "$OUT" "$P" "$PIMM" "$PPOST" "$BASE" "$PAGES" "$ROADS" "$OUT_JSON" <<'PY'
import json, sys
levels = json.loads(sys.argv[1].rstrip(",") + "}")
segs = {v["segments"] for v in levels.values()}
tiles = {v["tiles"] for v in levels.values()}
assert len(segs) == 1 and len(tiles) == 1, (segs, tiles)
sec = {int(k.replace("local", "")): v["sec"] for k, v in levels.items()}
cs = sorted(sec)
out = {
  "scale": {"pages": int(sys.argv[6]), "roads": int(sys.argv[7])},
  "binary": "round-4 final (fused match_score + summarized conflate shuffle + incremental-FNV synth + shuffled-hash winners semi-join)",
  "protocol": "one probe-gated clean bracket, fresh JVM per level, tmpfs wiped between levels; boot-relative gate (median-of-3 startup probes +8%)",
  "probe": {"boot_baseline_sec": float(sys.argv[5]), "pre_sec": float(sys.argv[2]),
            "post_immediate_sec": float(sys.argv[3]), "post_settled_sec": float(sys.argv[4])},
  "levels": levels,
  "outputs_identical": {"segments": segs.pop(), "tiles": tiles.pop()},
  "adjacent_doubling_efficiency": {
    f"{a}->{b}": round(sec[a] / sec[b] / (b / a), 3)
    for a, b in zip(cs, cs[1:])},
  "n_vs_4n": {
    f"{a}->{a*4}": round(sec[a] / sec[a*4] / 4.0, 3)
    for a in cs if a * 4 in sec},
}
json.dump(out, open(sys.argv[8], "w"), indent=1)
print("[curve]", json.dumps(out["n_vs_4n"]), json.dumps(out["adjacent_doubling_efficiency"]))
PY
    git add "$OUT_JSON" \
      && git commit -q -m "$COMMIT_MSG" \
      && echo "[curve] COMMITTED" >&2
    exit 0
  fi
  echo "[curve] bracket not clean, retrying" >&2
  sleep 120
done
echo "[curve] gave up" >&2
exit 1
