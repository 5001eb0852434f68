#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r4 "do this" items 1-3 + the
# round-3 backlog). Executes every queued measurement with bounded time,
# tees each to /tmp/tpuq/<name>.log, and never stops on a single failure.
# One process holds the single tunnel — this serializes all TPU jobs.
set -u
OUT=${1:-/tmp/tpuq}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
# Tools are run as `python tools/x.py`, which puts tools/ (not the repo
# root) on sys.path — make `import drts_tpu` resolve regardless.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1; tmo=$2; shift 2
  echo "=== $name: $* ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "--- $name rc=$? (tail) ---"
  tail -5 "$OUT/$name.log"
}

# 0. Is the TPU even up? Bounded probe; abort the queue if not.
timeout 300 python -c "import jax; print(jax.devices())" >"$OUT/probe.log" 2>&1
if [ $? -ne 0 ]; then echo "TPU PROBE FAILED"; cat "$OUT/probe.log"; exit 3; fi
echo "TPU UP: $(cat "$OUT/probe.log")"

# 1. Fast trace-only record FIRST (insurance if the tunnel dies mid-queue;
#    trace program unchanged -> warm cache).
run bench_fast 3000 env DRTS_BENCH_FAST=1 python bench.py

# 2. restir_initial internals — the top pass (81 ms; VERDICT item #2).
run prof_restir_init 3000 python tools/prof_restir_init.py

# 3. Trace per-bounce budget (VERDICT item #1 re-budget).
run prof_trace_bounces 4500 python tools/prof_trace_bounces.py

# 4. SHARC hit-rate sweep: voxel sizing / capacity / min-sample threshold
#    (VERDICT item #1 diagnosis; reports gate/entry/hit split).
run ab_sharc 6000 python tools/ab_sharc.py

# 5. Orbit-motion limiter sweep (VERDICT item #3). Key variants only —
#    each pays a pipeline compile; gamma brackets via gamma0 only.
run ab_motion 7200 python tools/ab_motion.py \
  baseline nodenoise raw1spp norestirtemp relax hist12 gamma0 nospecvirt

# 6. spatial_offset_mode A/B (frame ms + SSIM shared vs per_pixel).
run ab_spatial 3000 python tools/ab_spatial_offset.py

# 7. Chunk-size fixed-cost check (sim predicts finer chunks win).
run prof_chunksize 3000 python tools/prof_chunksize.py

# 8. Full bench LAST (recompiles: counter additions changed the pipeline
#    HLO) — records the new gate/entry rates + upscaled/mesh rows.
run bench 3600 python bench.py

echo "=== QUEUE DONE — logs in $OUT ==="
