#!/bin/bash
# Round-4 stage-6 consolidated TPU queue — the highest-value remaining
# measurements, ordered for a bounded session:
#   1. full bench.py (new mesh rows: candidate path v1, all-mesh full
#      pipeline, 8-bounce mesh; plus the usual headline/pipeline record)
#   2. mesh candidate-path A/B: fused (CAND=2) vs multi-launch (1) vs
#      serial (0), 2-bounce and 8-bounce
#   3. orbit variants with the FIXED Catmull filter + blend sweep
#   4. per-bounce trace budget (where do the dense 73 ms go?)
#   5. MXU intersection A/B at precision HIGH
#   6. 1080p static fidelity + independent-tracer crosscheck
# Usage: run_tpu_queue6.sh [outdir]
set -u
OUT=${1:-/tmp/tpuq6}
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

run bench_full 7200 python bench.py

run mesh_cand2 3600 env DRTS_MESH_CAND=2 python -c "
import bench
print('mesh 2b cand=2:', bench.bench_mesh())
print('mesh 8b cand=2:', bench.bench_mesh(bounces=8, iters=2))
"
run mesh_cand0 3600 env DRTS_MESH_CAND=0 python -c "
import bench
print('mesh 2b cand=0:', bench.bench_mesh())
"

run ab_motion6 10800 python tools/ab_motion.py catmull blend0.05 \
  catmull_blend0.05 taaclip0.5

run prof_trace_bounces 3600 python tools/prof_trace_bounces.py

run bench_mxu_high 3600 env DRTS_MXU_KERNEL=1 DRTS_MXU_PREC=high \
  DRTS_BENCH_FAST=1 python bench.py

run fidelity_1080_xcheck 10800 python -m drts_tpu.fidelity \
  --width 1920 --height 1080 --frames 64 --crosscheck-spp 96

echo "=== STAGE-6 QUEUE DONE [$(date -u +%H:%M:%S)] — logs in $OUT ==="
