"""A/B the compaction src-table builders (PathTraceConfig.compact_impl)
under the real headline trace: scatter (row-serial XLA scatter over all
ns lanes — the measured ~32 ms deep-segment entry at 1080p) vs
blocked_onehot (segmented cumsum + batched one-hot MXU matmul) vs
two_level (segmented cumsum + 2-level bisection gathers).

Run on the real chip: python tools/prof_compact2.py
"""
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from drts_tpu.models import clusters, myscene  # noqa: E402
from drts_tpu.ops import camera as camera_mod, pathtrace  # noqa: E402
from drts_tpu.utils import cache  # noqa: E402

cache.enable_compile_cache()

W, H = 1920, 1080


def run(impl: str, bounces: int, host, plan, iters=6):
    scene = host.scene
    cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                                 horizontal_fov_deg=90.0, aspect=W / H)
    cfg = pathtrace.PathTraceConfig(
        width=W, height=H, bounces=bounces, samples_per_pixel=1,
        russian_roulette=True, block_size=32768, compact_impl=impl)

    @jax.jit
    def frame(scene, cam, fi):
        accel = clusters.make_morton_accel(plan, scene.center, scene.radius,
                                           sort_origin=cam.position)
        out = pathtrace.trace_image(scene, cam, cfg, fi, accel=accel)
        return out.radiance, out.rays_traced

    r, rays = frame(scene, cam, 0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(iters):
        r, rays = frame(scene, cam, i + 1)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({"k": f"trace_b{bounces}_{impl}",
                      "ms": round(dt * 1e3, 2),
                      "mray_s": round(float(rays) / dt / 1e6, 2)}),
          flush=True)


def main():
    host = myscene.build(oscillator_grid=10, load_textures=True)
    plan = clusters.build_plan_morton(np.asarray(host.scene.center),
                                      np.asarray(host.scene.radius),
                                      max_members=64)
    for impl in ["scatter", "blocked_onehot", "two_level"]:
        for bounces in (2, 8):
            try:
                run(impl, bounces, host, plan)
            except Exception as e:  # keep the sweep alive
                print(json.dumps({"k": f"trace_b{bounces}_{impl}",
                                  "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
