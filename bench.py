"""Benchmark harness: Mray/s per chip at 1080p, 1 spp (BASELINE.md metric).

Runs the flagship path tracer (reference default workload: 8 bounces,
Russian roulette on, the 448-sphere demo scene — MyAppData.h:183-188 /
MyScene.ixx) and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is measured Mray/s divided by the 200 Mray/s/chip target.
"""

from __future__ import annotations

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    import numpy as np

    from drts_tpu.models import clusters, myscene, scene as scene_mod
    from drts_tpu.ops import camera as camera_mod, gbuffer, pathtrace

    width, height = 1920, 1080
    bounces, spp = 8, 1

    host = myscene.build(oscillator_grid=10)
    scene = host.scene
    plan = clusters.build_plan_morton(np.asarray(scene.center),
                                      np.asarray(scene.radius),
                                      max_members=64)
    cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                                 horizontal_fov_deg=90.0,
                                 aspect=width / height)
    cfg = pathtrace.PathTraceConfig(
        width=width, height=height, bounces=bounces, samples_per_pixel=spp,
        russian_roulette=True, block_size=32768)

    @jax.jit
    def frame(scene, cam, frame_index):
        accel = clusters.make_morton_accel(plan, scene.center, scene.radius)
        gbuf = gbuffer.generate(scene, cam, width, height, cfg.block_size,
                                accel=accel)
        out = pathtrace.trace_image(scene, cam, cfg, frame_index, gbuf=gbuf,
                                    accel=accel)
        return out.radiance, out.rays_traced

    # Warm up / compile.
    radiance, rays = frame(scene, cam, 0)
    jax.block_until_ready(radiance)
    rays_per_frame = float(rays)

    iters = 8
    start = time.perf_counter()
    for i in range(iters):
        radiance, rays = frame(scene, cam, i + 1)
    jax.block_until_ready(radiance)
    elapsed = time.perf_counter() - start

    frame_ms = elapsed / iters * 1e3
    mray_s = rays_per_frame * iters / elapsed / 1e6
    print(json.dumps({
        "metric": "path_trace_1080p_1spp_8bounce",
        "value": round(mray_s, 2),
        "unit": "Mray/s/chip",
        "vs_baseline": round(mray_s / 200.0, 4),
        "frame_ms": round(frame_ms, 2),
        "rays_per_frame": int(rays_per_frame),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
