#!/bin/bash
# Round-4 stage-7 TPU queue — measurements for the three open VERDICT
# fronts, each with its lever already built:
#   1. MXU intersection kernels (precision-HIGH lowering fixed): headline
#      trace A/B + restir_initial split A/B (its 12 ms dense-live
#      visibility any-hit is the queued lever from stage 4).
#   2. Motion-adaptive TAA clip gamma (tight only under motion): the
#      stage-6 taaclip0.5 win without its static-frame cost, + the
#      tightness sweep around it.
#   3. gbuffer split (28.7 ms, never profiled inside).
# Usage: run_tpu_queue7.sh [outdir]
set -u
OUT=${1:-/tmp/tpuq7}
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

run bench_mxu_trace 5400 env DRTS_MXU_KERNEL=1 DRTS_BENCH_FAST=1 \
  python bench.py

run prof_restir_mxu 5400 env DRTS_MXU_KERNEL=1 \
  python tools/prof_restir_init.py

run ab_motion7 10800 python tools/ab_motion.py adapt0.5 adapt0.3 \
  adapt0.5_catmull taaclip0.3 taaclip0.7

run prof_gbuffer 5400 python tools/prof_gbuffer.py

echo "=== STAGE-7 QUEUE DONE [$(date -u +%H:%M:%S)] — logs in $OUT ==="
