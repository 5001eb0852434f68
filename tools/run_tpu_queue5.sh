#!/bin/bash
# Round-4 stage-5 TPU queue (chains after stage 4):
#   1. full bench.py — new headline + full pipeline + the candidate-path
#      mesh numbers + counters
#   2. per-bounce trace budget (is the 73 ms in the dense early bounces
#      or the deep tail? decides whether SHARC termination can pay)
#   3. sharc_update split after the live-row pre-compaction
#   4. MXU intersection kernel A/B at precision HIGH (round-2 measured
#      HIGHEST slower; bf16x3 halves the matmul cost)
#   5. ReSTIR spatial_offset shared-vs-per_pixel (queued since r3)
#   6. fidelity: 1080p static SSIM + independent-tracer crosscheck in
#      one JSON (VERDICT r4 #6)
# Usage: run_tpu_queue5.sh [outdir]
set -u
OUT=${1:-/tmp/tpuq5}
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

run bench_full 5400 python bench.py

run prof_trace_bounces 3600 python tools/prof_trace_bounces.py

run prof_sharc_update 3600 python tools/prof_sharc_update.py

run bench_mxu_high 3600 env DRTS_MXU_KERNEL=1 DRTS_MXU_PREC=high \
  DRTS_BENCH_FAST=1 python bench.py
run bench_mxu_tool 3600 env DRTS_MXU_PREC=high python tools/bench_mxu.py

run ab_spatial_offset 5400 python tools/ab_spatial_offset.py

run fidelity_1080_xcheck 10800 python -m drts_tpu.fidelity \
  --width 1920 --height 1080 --frames 64 --crosscheck-spp 96

echo "=== STAGE-5 QUEUE DONE [$(date -u +%H:%M:%S)] — logs in $OUT ==="
