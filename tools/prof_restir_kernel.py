"""A/B the fused initial-candidate kernel (ops/restir_pallas.py) on the
exact headline restir_initial program: 1080p, textured MyScene, ReGIR 8
light + 1 BRDF candidates (VERDICT r5 item #3, target <=40 ms vs 70).

Chained-state (frame index feeds the RNG), per NEXT.md measurement
lessons. Variants: kernel / xla, and light-candidates-only splits
(0 BRDF) to isolate the kernel's share.

Usage: python tools/prof_restir_kernel.py [variant ...]
"""
import json
import sys
import time
import traceback

from drts_tpu.utils import cache

cache.enable_compile_cache()

import jax                      # noqa: E402
import numpy as np              # noqa: E402

from drts_tpu.models import clusters, myscene  # noqa: E402
from drts_tpu.ops import (camera as camera_mod, gbuffer,  # noqa: E402
                          light as light_mod, restir)

W, H = 1920, 1080
host = myscene.build(oscillator_grid=10, load_textures=True)
scene = host.scene
plan = clusters.build_plan_morton(np.asarray(scene.center),
                                  np.asarray(scene.radius), max_members=32)
accel = clusters.make_morton_accel(plan, scene.center, scene.radius)
cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                             horizontal_fov_deg=90.0, aspect=W / H)

gbuf = jax.jit(lambda s, c: gbuffer.generate(s, c, W, H, 32768,
                                             accel=accel))(scene, cam)
lights = jax.jit(light_mod.prepare)(scene)
surface = jax.jit(restir.make_surface)(gbuf)

VARIANTS = {
    "kernel_8l_1b": dict(initial_kernel=True, brdf_samples=1),
    "xla_8l_1b": dict(initial_kernel=False, brdf_samples=1),
    "kernel_8l_0b": dict(initial_kernel=True, brdf_samples=0),
    "xla_8l_0b": dict(initial_kernel=False, brdf_samples=0),
}


def run(name, iters=8):
    cfg = restir.ReSTIRConfig(local_light_samples=8, **VARIANTS[name])

    # Separate jits (grid build | initial sampling), and ALL large arrays
    # passed as jit ARGUMENTS: a closed-over concrete array becomes a
    # jaxpr constant embedded in the serialized program, and the 1080p
    # surface (~200 MB of consts) blows the axon tunnel's remote-compile
    # body limit (HTTP 413). Grid cost is restir_prepare's, not
    # restir_initial's, so timing only f matches the bench pass.
    grid = jax.jit(lambda lg, fi: restir.build_regir_grid(
        lg, cam.position, cfg, fi))(lights, 0)
    jax.block_until_ready(grid)

    @jax.jit
    def f(surface, scene, lights, grid, accel, fi):
        res = restir.initial_sampling(surface, scene, lights, grid, cfg,
                                      fi, 32768, accel=accel)
        return res.w_out

    try:
        out = f(surface, scene, lights, grid, accel, 0)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(surface, scene, lights, grid, accel, i + 1)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"k": name, "ms": round(ms, 2)}), flush=True)
    except Exception:
        print(json.dumps({"k": name,
                          "error": traceback.format_exc(limit=3)}),
              flush=True)


for v in (sys.argv[1:] or list(VARIANTS)):
    run(v)
