"""Deep-buffer capacity + chunk-size sweep at EXACT bench-headline
conditions (textured demo scene, sort_origin, gbuffer, 8 bounces).

Earlier hardware sweep (tools/prof_cfrom.py, untextured, no sort_origin)
showed fraction 8 -> 16 nearly doubling trace throughput (26.3 -> 45.7
Mray/s): deep-bounce sweeps cost ~capacity lanes regardless of live
count, so a tighter survivor buffer pays 1:1 until overflow_paths > 0.
This sweep finds the tightest safe capacity under the real headline
workload, and A/Bs 32- vs 64-sphere Morton chunks (prof_chunksize saw
mm=32 win ~7% on raw sweeps).
"""
import dataclasses
import json
import time

import jax
import numpy as np

from drts_tpu.models import clusters, myscene
from drts_tpu.ops import camera as camera_mod, gbuffer, pathtrace

W, H = 1920, 1080
host = myscene.build(oscillator_grid=10, load_textures=True)
scene = host.scene
cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                             horizontal_fov_deg=90.0, aspect=W / H)
base_cfg = pathtrace.PathTraceConfig(
    width=W, height=H, bounces=8, samples_per_pixel=1,
    russian_roulette=True, block_size=32768, compact_from=2)

plans = {mm: clusters.build_plan_morton(np.asarray(scene.center),
                                        np.asarray(scene.radius),
                                        max_members=mm)
         for mm in (64, 32)}


def run(fraction, mm=64, iters=8):
    cfg = dataclasses.replace(base_cfg, compact_fraction=fraction)
    plan = plans[mm]

    @jax.jit
    def frame(scene, cam, fi):
        accel = clusters.make_morton_accel(plan, scene.center, scene.radius,
                                           sort_origin=cam.position)
        gbuf = gbuffer.generate(scene, cam, W, H, cfg.block_size, accel=accel)
        out = pathtrace.trace_image(scene, cam, cfg, fi, gbuf=gbuf,
                                    accel=accel)
        return (out.radiance, out.rays_traced,
                out.counters["wavefront_overflow_paths"])

    r, rays, ovf = frame(scene, cam, 0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(iters):
        r, rays, ovf = frame(scene, cam, i + 1)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"fraction": fraction, "mm": mm, "ms": round(ms, 2),
                      "overflow_paths": int(ovf),
                      "mray_s": round(float(rays) / ms / 1e3, 2)}),
          flush=True)


run(12)            # current default
run(16)
run(20)
run(24)
run(32)
run(16, mm=32)
run(24, mm=32)
