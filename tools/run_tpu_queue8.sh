#!/bin/bash
# Round-4 stage-8 TPU queue: motion-adaptive clip saturation sweep
# (stage-7 found taaclip0.3 meets the orbit target but costs statics;
# adapt@1px protects statics but saturates too slowly).
set -u
OUT=${1:-/tmp/tpuq8}
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

run ab_motion8 10800 python tools/ab_motion.py adapt0.3_s0.25 \
  adapt0.2_s0.25 adapt0.3_s0.1 taaclip0.2

echo "=== STAGE-8 QUEUE DONE [$(date -u +%H:%M:%S)] — logs in $OUT ==="
