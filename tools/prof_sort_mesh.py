"""TPU A/B for the round-3 kernel work: (1) compact-sort on/off on the
flagship trace, (2) mesh-mode Mray/s with the instance-chunk TLAS.

Run on the real chip:  python tools/prof_sort_mesh.py
"""
import json
import sys
import time

import jax
import numpy as np

sys.path.insert(0, ".")

from drts_tpu.models import clusters, myscene  # noqa: E402
from drts_tpu.ops import camera as camera_mod, gbuffer, pathtrace  # noqa: E402

W, H = 1920, 1080


def run_trace(cfg_kw, host, plan, iters=6):
    scene = host.scene
    cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                                 horizontal_fov_deg=90.0, aspect=W / H)
    cfg = pathtrace.PathTraceConfig(
        width=W, height=H, bounces=8, samples_per_pixel=1,
        russian_roulette=True, block_size=32768, **cfg_kw)

    @jax.jit
    def frame(scene, cam, fi):
        accel = clusters.make_morton_accel(plan, scene.center, scene.radius,
                                           sort_origin=cam.position)
        gbuf = gbuffer.generate(scene, cam, W, H, cfg.block_size,
                                accel=accel)
        out = pathtrace.trace_image(scene, cam, cfg, fi, gbuf=gbuf,
                                    accel=accel)
        return out.radiance, out.rays_traced

    r, rays = frame(scene, cam, 0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(iters):
        r, rays = frame(scene, cam, i + 1)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    return float(rays) / dt / 1e6, dt * 1e3


def main():
    host = myscene.build(oscillator_grid=10, load_textures=True)
    plan = clusters.build_plan_morton(np.asarray(host.scene.center),
                                      np.asarray(host.scene.radius),
                                      max_members=64)
    out = {}
    for name, kw in [("sort_off", dict(compact_sort=False)),
                     ("sort_tile64", dict(compact_sort=True,
                                          compact_sort_tile=64)),
                     ("sort_tile128", dict(compact_sort=True,
                                           compact_sort_tile=128))]:
        mray, ms = run_trace(kw, host, plan)
        out[name] = {"mray_s": round(mray, 2), "ms": round(ms, 2)}
        print(name, out[name], flush=True)

    # Mesh mode: full demo scene as 448 triangle-mesh instances.
    mh = myscene.as_mesh_scene(host, tessellation=4)
    cam = camera_mod.make_camera(mh.camera_position, mh.camera_forward,
                                 horizontal_fov_deg=90.0, aspect=W / H)
    cfg = pathtrace.PathTraceConfig(width=W, height=H, bounces=2,
                                    samples_per_pixel=1, block_size=32768)

    @jax.jit
    def mesh_frame(scene, cam, fi):
        out = pathtrace.trace_image(scene, cam, cfg, fi)
        return out.radiance, out.rays_traced

    r, rays = mesh_frame(mh.scene, cam, 0)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    iters = 3
    for i in range(iters):
        r, rays = mesh_frame(mh.scene, cam, i + 1)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    out["mesh_tess4_2bounce"] = {"mray_s": round(float(rays) / dt / 1e6, 3),
                                 "ms": round(dt * 1e3, 1)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
