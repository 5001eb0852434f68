#!/bin/bash
# Round-4 stage-4 TPU queue (fresh box: compile + fidelity-ref caches are
# cold — expect the first steps to pay multi-minute compiles).
# Ordered by decision value for the VERDICT r4 items:
#   1. headline sanity with the new defaults (scatter revert,
#      sharc_query_from=2, overflow spill ON, mesh sort) — also primes
#      the trace compile cache
#   2. restir_initial internal split (top pass, 81 ms)
#   3. SHARC sweep + the 960x540 q_b2..8=0 anomaly (hit rate is the
#      biggest trace lever)
#   4. orbit-motion TAA variants (min-SSIM 0.936 -> >=0.95 hunt)
#   5. compaction impl A/B (deep-segment 32 ms entry)
#   6. mesh instance-sort A/B at the reference's 8-bounce default
# Usage: run_tpu_queue4.sh [outdir]
set -u
OUT=${1:-/tmp/tpuq4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* [$(date -u +%H:%M:%S)] ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "--- $name rc=$? [$(date -u +%H:%M:%S)] (tail) ---"
  tail -5 "$OUT/$name.log"
}

timeout 300 python -c "import jax; print(jax.devices())" >"$OUT/probe.log" 2>&1
if [ $? -ne 0 ]; then echo "TPU PROBE FAILED"; cat "$OUT/probe.log"; exit 3; fi
echo "TPU UP"

run bench_fast 5400 env DRTS_BENCH_FAST=1 python bench.py

run prof_restir_init 3600 python tools/prof_restir_init.py

run ab_sharc 7200 python tools/ab_sharc.py

run ab_motion4 10800 python tools/ab_motion.py baseline catmull \
  taaclip2.5 catmull_clip2.5 taaclip8

run prof_compact2 5400 python tools/prof_compact2.py

run bench_mesh_sort 5400 python -c "
import bench
print('mesh 2b sort=on:', bench.bench_mesh())
print('mesh 8b sort=on:', bench.bench_mesh(bounces=8, iters=2))
"
run bench_mesh_nosort 5400 env DRTS_MESH_SORT=0 python -c "
import bench
print('mesh 8b sort=off:', bench.bench_mesh(bounces=8, iters=2))
"

echo "=== STAGE-4 QUEUE DONE [$(date -u +%H:%M:%S)] — logs in $OUT ==="
