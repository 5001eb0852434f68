#!/bin/bash
# Consolidated TPU queue runner (VERDICT r4 weak #8: one parameterized
# runner instead of per-stage one-shot scripts; an unfinished sweep is a
# rerunnable stage line, not a stranded file).
#
# Usage: bash tools/run_tpu_queue.sh <stage> [outdir]
#   outdir defaults to /tmp/tpuq_<stage>. One TPU tunnel per host —
#   serialize stages (run one queue at a time).
#
# Stages are DATA: each `stage_<name>` function emits lines
#   <jobname>|<timeout-seconds>|<command ...>
# which the runner executes in order, logging to $OUT/<jobname>.log.
set -u
STAGE=${1:?usage: run_tpu_queue.sh <stage> [outdir]}
OUT=${2:-/tmp/tpuq_$STAGE}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"

# ---------------------------------------------------------------- stages

stage_r5_motion() {  # round-5: finish the stranded stage-8 saturation sweep
  cat <<'EOF'
ab_motion9|14400|python tools/ab_motion.py adapt0.2_s0.25 adapt0.3_s0.1 taaclip0.2 adapt0.25_s0.25 adapt0.25_s0.25_catmull prevreal
prof_sharc_update|3600|python tools/prof_sharc_update.py
EOF
}

stage_r5_trace() {  # round-5: headline-trace structural levers (VERDICT #1)
  cat <<'EOF'
prof_trace5|14400|python tools/prof_trace5.py
prof_trace5_rb4096|7200|DRTS_RAY_BLOCK=4096 python tools/prof_trace5.py b8 b1
prof_trace5_rb8192|7200|DRTS_RAY_BLOCK=8192 python tools/prof_trace5.py b8 b1
EOF
}

stage_r5b() {  # round-5: restir kernel A/B + deep-entry decomposition
  cat <<'EOF'
prof_restir_kernel|14400|python tools/prof_restir_kernel.py
prof_deep_entry|7200|python tools/prof_deep_entry.py
EOF
}

stage_r5c() {  # round-5: deep-segment levers + restir 1b rerun + mesh conv
  cat <<'EOF'
prof_trace5b|14400|python tools/prof_trace5.py b8 b8_nowhile b8_level b8_onehot
prof_restir_kernel2|10800|python tools/prof_restir_kernel.py kernel_8l_1b xla_8l_1b
mesh_conv_t4b8|7200|python tools/bench_mesh.py 4 8
mesh_noconv_t4b8|7200|DRTS_MESH_CONV=0 python tools/bench_mesh.py 4 8
mesh_conv_c16|7200|DRTS_TRI_CHUNK=16 python tools/bench_mesh.py 4 8
mesh_conv_c64|7200|DRTS_TRI_CHUNK=64 python tools/bench_mesh.py 4 8
mesh_conv_cand2|7200|DRTS_MESH_CAND=2 python tools/bench_mesh.py 4 8
EOF
}

stage_r5f() {  # round-5 session 2: measurement priority order (cold cache)
  cat <<'EOF'
prof_deep_entry|7200|python tools/prof_deep_entry.py
prof_trace5a|14400|python tools/prof_trace5.py b8 b8_level b8_onehot
prof_restir_kernel|14400|python tools/prof_restir_kernel.py
EOF
}

stage_r5h() {  # round-5 session 2: deep-entry gather schedule + sort value
  cat <<'EOF'
prof_trace5_mono|10800|python tools/prof_trace5.py b8_mono b8_dsort0
prof_restir_kernel_1b|10800|python tools/prof_restir_kernel.py kernel_8l_1b xla_8l_1b
prof_deep_entry_rest|7200|python tools/prof_deep_entry.py gsel to_space all all_nosort
EOF
}

stage_r5g() {  # round-5 session 2: CLI verify + mesh convexity-cull A/Bs
  cat <<'EOF'
verify_smoke|1800|python -m drts_tpu.app --width 160 --height 92 --bounces 3 --no-denoise render --frames 2 --out-dir /tmp/tpuq_r5g/out
prof_restir_mxu|7200|DRTS_MXU_KERNEL=1 python tools/prof_restir_kernel.py kernel_8l_1b kernel_8l_0b
mesh_conv_8b|7200|python tools/bench_mesh.py 4 8
mesh_noconv_8b|7200|DRTS_MESH_CONV=0 python tools/bench_mesh.py 4 8
mesh_conv_2b|5400|python tools/bench_mesh.py 4 2
mesh_conv_c32|7200|DRTS_TRI_CHUNK=32 python tools/bench_mesh.py 4 8
mesh_conv_c16|7200|DRTS_TRI_CHUNK=16 python tools/bench_mesh.py 4 8
EOF
}

stage_r5d() {  # round-5: device-trace ground truth for the b8 frame
  cat <<'EOF'
prof_device_trace|14400|python tools/prof_device_trace.py b8 b1
EOF
}

stage_r5e() {  # round-5: frame-cost trades w/ fidelity guards + new splat
  cat <<'EOF'
prof_sharc_update2|3600|python tools/prof_sharc_update.py
ab_frame_cost|14400|python tools/ab_frame_cost.py
EOF
}

stage_r5j() {  # round-5 final: SSIM-guarded trades, recorded fidelity, bench
  cat <<'EOF'
ab_frame_cost|12600|python tools/ab_frame_cost.py baseline tex1 sharcp2 tex1_sharcp2
fid_mesh|7200|python -m drts_tpu.fidelity --mesh --record FIDELITY.json
fid_static|7200|python -m drts_tpu.fidelity --record FIDELITY.json
fid_motion|7200|python -m drts_tpu.fidelity --motion --record FIDELITY.json
bench|5400|python bench.py
EOF
}

stage_bench() {  # the full driver benchmark (primes the compile cache)
  cat <<'EOF'
bench|5400|python bench.py
EOF
}

stage_fidelity() {  # static + motion fidelity at shipping defaults
  cat <<'EOF'
fidelity|7200|python -m drts_tpu.fidelity
EOF
}

# Ad-hoc: run any single tool under the queue discipline.
#   bash tools/run_tpu_queue.sh tool /tmp/out -- python tools/prof_x.py a b
stage_tool() {
  shift_args=("${EXTRA_ARGS[@]}")
  echo "tool|14400|${shift_args[*]}"
}

# ---------------------------------------------------------------- runner

EXTRA_ARGS=()
if [ "$#" -ge 3 ] && [ "$3" = "--" ]; then
  shift 3
  EXTRA_ARGS=("$@")
fi

if ! declare -F "stage_$STAGE" >/dev/null; then
  echo "unknown stage '$STAGE'; available:" >&2
  declare -F | awk '{print $3}' | grep '^stage_' | sed 's/^stage_/  /' >&2
  exit 2
fi

timeout 300 python -c "import jax; print(jax.devices())" >"$OUT/probe.log" 2>&1
if [ $? -ne 0 ]; then echo "TPU PROBE FAILED"; cat "$OUT/probe.log"; exit 3; fi
echo "TPU UP [$(date -u +%H:%M:%S)]"

"stage_$STAGE" | while IFS='|' read -r name tmo cmd; do
  [ -z "$name" ] && continue
  echo "=== $name: $cmd [$(date -u +%H:%M:%S)] ==="
  timeout "$tmo" bash -c "$cmd" >"$OUT/$name.log" 2>&1
  echo "--- $name rc=$? [$(date -u +%H:%M:%S)] (tail) ---"
  tail -5 "$OUT/$name.log"
done

echo "=== QUEUE '$STAGE' DONE [$(date -u +%H:%M:%S)] — logs in $OUT ==="
