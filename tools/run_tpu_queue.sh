#!/bin/bash
# Pending TPU measurement queue (NEXT.md round-3). Run when the tunnel is
# back: executes every queued measurement with bounded time, tees each to
# /tmp/tpuq/<name>.log, and never stops on a single failure.
set -u
OUT=${1:-/tmp/tpuq}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
# Tools are run as `python tools/x.py`, which puts tools/ (not the repo
# root) on sys.path — make `import drts_tpu` resolve regardless.
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

run() {
  name=$1; shift
  echo "=== $name: $* ==="
  timeout 3000 "$@" >"$OUT/$name.log" 2>&1
  echo "--- $name rc=$? (tail) ---"
  tail -5 "$OUT/$name.log"
}

# 0. Is the TPU even up? Bounded probe; abort the queue if not.
timeout 300 python -c "import jax; print(jax.devices())" >"$OUT/probe.log" 2>&1
if [ $? -ne 0 ]; then echo "TPU PROBE FAILED"; cat "$OUT/probe.log"; exit 3; fi
echo "TPU UP: $(cat "$OUT/probe.log")"

# 1a. Fast trace-only record FIRST (insurance if the tunnel dies mid-queue).
run bench_fast env DRTS_BENCH_FAST=1 python bench.py

# 1b. Headline bench (trace + full pipeline + upscaled + mesh + counters).
run bench python bench.py

# 2. Denoiser-under-motion fidelity (target: min SSIM >= 0.95 @640x360).
run fidelity_motion python -m drts_tpu.fidelity --motion

# 3. Static fidelity regression (SSIM @ spec).
run fidelity_static python -m drts_tpu.fidelity

# 4. spatial_offset_mode A/B (frame ms + SSIM shared vs per_pixel).
run ab_spatial python tools/ab_spatial_offset.py

# 5. restir_initial internals — the new top pass (80.9 ms on 2026-08-19;
#    overtook the trace). Candidate gather vs visibility-ray split.
run prof_restir_init python tools/prof_restir_init.py

# 6. Chunk-size fixed-cost check (sim predicts finer chunks win even for
#    primaries under a 2-col/pair overhead model — validate on hardware).
run prof_chunksize python tools/prof_chunksize.py

# Settled by hardware 2026-08-18/19 (removed from the queue): compact_from
# sweep (spheres pin 2, mesh pins 1 — bench.py docstrings), mesh c1-vs-c2
# (1.45x c1 win recorded), per-pass attribution (bench.py emits passes_ms).

echo "=== QUEUE DONE — logs in $OUT ==="
