"""Net value of compaction: compact_from sweep at 8 bounces."""
import time, json
import jax, numpy as np

from drts_tpu.models import clusters, myscene
from drts_tpu.ops import camera as camera_mod, gbuffer, pathtrace

W, H = 1920, 1080
host = myscene.build(oscillator_grid=10)
scene = host.scene
plan = clusters.build_plan_morton(np.asarray(scene.center),
                                  np.asarray(scene.radius), max_members=64)
cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                             horizontal_fov_deg=90.0, aspect=W / H)

plan16 = clusters.build_plan_morton(np.asarray(scene.center),
                                    np.asarray(scene.radius),
                                    max_members=16)


def run(compact_from, fraction=8, iters=6, fraction_first=1,
        deep_chunk16=False):
    cfg = pathtrace.PathTraceConfig(
        width=W, height=H, bounces=8, samples_per_pixel=1,
        russian_roulette=True, block_size=32768,
        compact_from=compact_from, compact_fraction=fraction,
        compact_fraction_first=fraction_first)
    @jax.jit
    def frame(scene, cam, fi):
        accel = clusters.make_morton_accel(plan, scene.center, scene.radius)
        deep = (clusters.make_morton_accel(plan16, scene.center,
                                           scene.radius)
                if deep_chunk16 else None)
        gbuf = gbuffer.generate(scene, cam, W, H, cfg.block_size, accel=accel)
        out = pathtrace.trace_image(scene, cam, cfg, fi, gbuf=gbuf,
                                    accel=accel, accel_deep=deep)
        return (out.radiance, out.rays_traced,
                out.counters["wavefront_overflow_paths"])
    r, rays, ovf = frame(scene, cam, 0); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for i in range(iters):
        r, rays, ovf = frame(scene, cam, i + 1)
    jax.block_until_ready(r)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"compact_from": compact_from, "fraction": fraction,
                      "fraction_first": fraction_first,
                      "deep16": deep_chunk16, "ms": round(ms, 2),
                      "overflow_paths": int(ovf),
                      "mray_s": round(float(rays) / ms / 1e3, 1)}),
          flush=True)

run(99)        # dense all the way
run(2)         # current default
run(2, 16)     # smaller capacity
run(1)                        # bounce-1 compaction+sort, full capacity
run(1, fraction_first=2)      # half capacity (check overflow counter!)
run(1, deep_chunk16=True)     # + finer 16-sphere chunks for bounce sweeps
run(2, deep_chunk16=True)
run(3)
run(4)
