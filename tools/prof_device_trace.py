"""Device-trace profile of the headline trace frame (NEXT.md lesson #1:
trust jax.profiler device traces aggregated per op, not single-dispatch
timings). Runs the exact prof_trace5 b8/b1 programs under
jax.profiler.trace, parses the chrome trace (trace.json.gz), and prints
the top device ops by total time plus the b8-minus-b1 aggregate delta —
the ground truth for where the deep-segment ~40 ms actually lives.

Usage: python tools/prof_device_trace.py [b8 b1 ...]
"""
import collections
import glob
import gzip
import json
import sys
import time

from drts_tpu.utils import cache

cache.enable_compile_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from drts_tpu.models import clusters, myscene  # noqa: E402
from drts_tpu.ops import camera as camera_mod, gbuffer, pathtrace  # noqa: E402

W, H = 1920, 1080
host = myscene.build(oscillator_grid=10, load_textures=True)
scene = host.scene
plan = clusters.build_plan_morton(np.asarray(scene.center),
                                  np.asarray(scene.radius), max_members=32)
cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                             horizontal_fov_deg=90.0, aspect=W / H)

BASE = dict(width=W, height=H, samples_per_pixel=1, block_size=32768)
VARIANTS = {
    "b8": dict(bounces=8, compact_from=2),
    "b1": dict(bounces=1, compact_from=2),
    "b0": dict(bounces=0, compact_from=2),
}


def device_events(logdir):
    """Aggregate device-lane ops from the chrome trace: name -> total us
    (across all TPU op lanes; python/host lanes are excluded by their
    process names)."""
    agg = collections.Counter()
    for path in glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        pids_device = set()
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                nm = ev.get("args", {}).get("name", "")
                if "TPU" in nm or "/device:" in nm or "XLA" in nm:
                    pids_device.add(ev.get("pid"))
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("pid") in pids_device:
                agg[ev.get("name", "?")] += ev.get("dur", 0)
    return agg


def profile(name):
    cfg = pathtrace.PathTraceConfig(**BASE, **VARIANTS[name])

    @jax.jit
    def frame(scene, cam, fi):
        accel = clusters.make_morton_accel(plan, scene.center,
                                           scene.radius,
                                           sort_origin=cam.position)
        gbuf = gbuffer.generate(scene, cam, W, H, cfg.block_size,
                                accel=accel)
        out = pathtrace.trace_image(scene, cam, cfg, fi, gbuf=gbuf,
                                    accel=accel)
        return out.radiance

    rad = frame(scene, cam, 0)
    jax.block_until_ready(rad)
    rad = frame(scene, cam, 1)
    jax.block_until_ready(rad)

    logdir = f"/tmp/jaxtrace_{name}"
    n_prof = 3
    with jax.profiler.trace(logdir):
        for i in range(n_prof):
            rad = frame(scene, cam, 2 + i)
        jax.block_until_ready(rad)
    agg = device_events(logdir)
    per_frame = {k: v / n_prof / 1e3 for k, v in agg.items()}  # ms/frame
    return per_frame


def _kind(op):
    """Crude op-kind bucket from the event name (fusion.123 -> fusion)."""
    base = op.split("(")[0].split(".")[0]
    return base


names = sys.argv[1:] or ["b8", "b1"]
results = {}
for nm in names:
    t0 = time.perf_counter()
    results[nm] = profile(nm)
    # jit_frame(...) is the whole-program outer span — report it as the
    # ground-truth frame total, exclude it from op accounting.
    ops = {k: v for k, v in results[nm].items()
           if not k.startswith("jit_frame")}
    frame_ms = sum(v for k, v in results[nm].items()
                   if k.startswith("jit_frame"))
    total = sum(ops.values())
    tail = {k: v for k, v in ops.items() if v < 0.15}
    print(json.dumps({"k": nm, "frame_ms": round(frame_ms, 2),
                      "ops_sum_ms": round(total, 2),
                      "tail_lt_0p15_ms": round(sum(tail.values()), 2),
                      "tail_ops": len(tail),
                      "wall_s": round(time.perf_counter() - t0, 1)}),
          flush=True)
    kinds = collections.Counter()
    for k, v in ops.items():
        kinds[_kind(k)] += v
    for kd, ms in sorted(kinds.items(), key=lambda kv: -kv[1])[:20]:
        if ms < 0.2:
            break
        print(json.dumps({"kind": kd, "ms": round(ms, 2)}), flush=True)
    top = sorted(ops.items(), key=lambda kv: -kv[1])[:40]
    for op, ms in top:
        if ms < 0.15:
            break
        print(json.dumps({"op": op[:120], "ms": round(ms, 2)}), flush=True)

if "b8" in results and "b1" in results:
    print("=== b8 - b1 delta (top) ===", flush=True)
    keys = set(results["b8"]) | set(results["b1"])
    delta = {k: results["b8"].get(k, 0.0) - results["b1"].get(k, 0.0)
             for k in keys}
    for op, ms in sorted(delta.items(), key=lambda kv: -kv[1])[:40]:
        if ms < 0.15:
            break
        print(json.dumps({"dop": op[:120], "ms": round(ms, 2)}), flush=True)
