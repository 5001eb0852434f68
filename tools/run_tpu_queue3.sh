#!/bin/bash
# Round-4 stage-3 TPU queue: measure the post-stage-2 fixes and the new
# levers — scatter-form revert + sharc_query_from=2 headline, compaction
# impl A/B (blocked one-hot MXU vs scatter), batched ReSTIR candidates,
# mesh instance-coherence sort, the unmeasured TAA orbit variants, and
# the 960x540 SHARC q_b2..8=0 anomaly (now with the overflow counter).
# Usage: run_tpu_queue3.sh [outdir]
set -u
OUT=${1:-/tmp/tpuq3}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

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

# 1. Headline sanity after the scatter revert + sharc_query_from=2.
run bench_fast 3600 env DRTS_BENCH_FAST=1 python bench.py

# 2. Compaction impl A/B (the 32 ms deep-segment entry).
run prof_compact2 5400 python tools/prof_compact2.py

# 3. Batched ReSTIR candidate evaluation (restir_initial was 70 ms).
run prof_restir_init 3600 python tools/prof_restir_init.py

# 4. Mesh path: instance-coherence sort A/B at the reference's 8-bounce
#    default (VERDICT item #4; was 1.06 Mray/s @8b).
run bench_mesh_sort 5400 python -c "
import bench
print('mesh 2b sort=on:', bench.bench_mesh())
print('mesh 8b sort=on:', bench.bench_mesh(bounces=8, iters=2))
"
run bench_mesh_nosort 5400 env DRTS_MESH_SORT=0 python -c "
import bench
print('mesh 8b sort=off:', bench.bench_mesh(bounces=8, iters=2))
"

# 5. The round-4 TAA orbit variants (queued in stage-2 but the running
#    queue predated them): Catmull-Rom history + wider variance clip.
run ab_motion3 10800 python tools/ab_motion.py catmull taaclip2.5 \
  catmull_clip2.5 taaclip8

# 6. SHARC 960x540 anomaly: per-bounce q counts + overflow counter.
run ab_sharc 7200 python tools/ab_sharc.py

echo "=== STAGE-3 QUEUE DONE — logs in $OUT ==="
