#!/bin/bash
# Round-4 stage-2 TPU queue: A/B the round-4 optimizations (searchsorted
# compaction, ReSTIR dead-lane masking, SHARC splat pre-compaction, mesh
# bounds pre-pass), diagnose the TPU SHARC entry=0 anomaly, and record
# the upgraded headline + the de-circularized fidelity artifacts.
# Run from the UPDATED /root/repo after the stage-1 queue frees the
# tunnel. Usage: run_tpu_queue2.sh [outdir] [stage1_pid_to_wait_for]
set -u
OUT=${1:-/tmp/tpuq2}
WAIT_PID=${2:-}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

if [ -n "$WAIT_PID" ]; then
  echo "waiting for stage-1 queue (pid $WAIT_PID) to release the tunnel..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
  echo "stage-1 done."
fi

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "--- $name rc=$? (tail) ---"
  tail -5 "$OUT/$name.log"
}

timeout 300 python -c "import jax; print(jax.devices())" >"$OUT/probe.log" 2>&1
if [ $? -ne 0 ]; then echo "TPU PROBE FAILED"; cat "$OUT/probe.log"; exit 3; fi
echo "TPU UP"

# 1. Trace A/B: searchsorted compaction (was 75 ms / 42.8 Mray/s).
run bench_fast 3600 env DRTS_BENCH_FAST=1 python bench.py

# 2. restir_initial A/B: dead-lane masking (was 82.6 ms).
run prof_restir_init 3600 python tools/prof_restir_init.py

# 3. sharc_update split + splat pre-compaction A/B (was 58.6 ms).
run prof_sharc_update 3600 python tools/prof_sharc_update.py

# 4. SHARC entry=0 anomaly: state + manual-query probes at the CPU
#    control's exact shapes.
run diag_sharc 3600 python tools/diag_sharc_tpu.py

# 5. Per-bounce budget with the new compaction (b2 entry was 32 ms).
run prof_trace_bounces 4500 python tools/prof_trace_bounces.py

# 6. Mesh path A/B: bounds pre-pass + t_done tmax (was 1.45 Mray/s);
#    also the reference-default 8-bounce row (VERDICT item #4).
run bench_mesh 4500 python -c "
import bench
print('mesh 2-bounce:', bench.bench_mesh())
print('mesh 8-bounce:', bench.bench_mesh(bounces=8, iters=2))
"

# 7. Full bench: new headline + per-pass attribution + counters.
run bench 5400 python bench.py

# 8. Orbit-plateau candidates: TAA clip width + Catmull-Rom history
#    (ab_motion r4: raw1spp 0.916 vs baseline 0.936 — accumulation, not
#    the denoiser, is the limiter), then the pairwise/real-prev pair.
run ab_motion2 10800 python tools/ab_motion.py taaclip2.5 catmull \
  catmull_clip2.5 taaclip8 pairwise pairwise_real

# 9. De-circularized fidelity artifacts (VERDICT item #6): static SSIM
#    at the BASELINE's 1080p, and the independent-tracer cross-check.
run fidelity_1080 7200 python -m drts_tpu.fidelity --width 1920 \
  --height 1080 --spp 1024
run crosscheck 5400 python -m drts_tpu.crosscheck

echo "=== STAGE-2 QUEUE DONE — logs in $OUT ==="
