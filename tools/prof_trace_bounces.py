"""Where do the trace pass's ~73 ms go? (VERDICT r4 item #1 re-budget.)

Times the headline trace (gbuffer-fed, textured, 1080p, compact_from=2)
at bounce depths 1 / 2 / 4 / 8. Deltas attribute cost: bounces=1 is the
dense primary shade + bounce-1 sweep; 2..8 add the compacted deep
segment per extra bounce. Also times a SHARC-queried variant at 8
bounces (the full-pipeline trace includes the per-bounce cache query
gathers; the bare bench trace does not).
"""
import dataclasses
import json
import time
import traceback

from drts_tpu.utils import cache

cache.enable_compile_cache()

import jax  # noqa: E402
import numpy as np  # noqa: E402

from drts_tpu.models import clusters, myscene  # noqa: E402
from drts_tpu.ops import camera as camera_mod, gbuffer, pathtrace  # noqa: E402
from drts_tpu.ops import sharc as sharc_mod  # noqa: E402

W, H = 1920, 1080
host = myscene.build(oscillator_grid=10, load_textures=True)
scene = host.scene
plan = clusters.build_plan_morton(np.asarray(scene.center),
                                  np.asarray(scene.radius), max_members=32)
cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                             horizontal_fov_deg=90.0, aspect=W / H)


def timeit(name, make_cfg, sharc_state=None, sharc_cfg=None, iters=6):
    cfg = make_cfg()

    @jax.jit
    def frame(scene, cam, fi):
        accel = clusters.make_morton_accel(plan, scene.center, scene.radius,
                                           sort_origin=cam.position)
        gbuf = gbuffer.generate(scene, cam, W, H, cfg.block_size, accel=accel)
        out = pathtrace.trace_image(scene, cam, cfg, fi, gbuf=gbuf,
                                    sharc_state=sharc_state,
                                    sharc_cfg=sharc_cfg, accel=accel)
        return out.radiance, out.rays_traced

    try:
        rad, rays = frame(scene, cam, 0)
        jax.block_until_ready(rad)
        t0 = time.perf_counter()
        for i in range(iters):
            rad, rays = frame(scene, cam, i + 1)
        jax.block_until_ready(rad)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"k": name, "ms": round(ms, 2),
                          "rays": int(rays)}), flush=True)
    except Exception:
        print(json.dumps({"k": name,
                          "error": traceback.format_exc(limit=3)}),
              flush=True)


base = dict(width=W, height=H, samples_per_pixel=1, block_size=32768,
            compact_from=2)
for b in (1, 2, 4, 8):
    timeit(f"trace_b{b}",
           lambda b=b: pathtrace.PathTraceConfig(bounces=b, **base))

# With SHARC queries wired (empty cache: every query misses — the worst
# case for query overhead; gauges the per-bounce gather cost).
scfg = sharc_mod.SHARCConfig()
timeit("trace_b8_sharc_empty",
       lambda: pathtrace.PathTraceConfig(bounces=8, **base),
       sharc_state=sharc_mod.init_state(scfg), sharc_cfg=scfg)

# Untextured at 8 bounces: bounds the texture-gather share of the dense
# bounce-0/1 shading.
host_nt = myscene.build(oscillator_grid=10, load_textures=False)
scene = host_nt.scene
timeit("trace_b8_notex",
       lambda: pathtrace.PathTraceConfig(bounces=8, **base))
