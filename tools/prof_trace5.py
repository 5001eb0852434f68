"""Round-5 headline-trace lever A/B (VERDICT r4 'Next round' #1).

The headline (bench.bench_trace: fused gbuffer + trace, 1080p, textured,
8 bounces) sits at 42 Mray/s / 76 ms. Measured decomposition (r4):
dense bounce-1 sweep ~24 ms, texture/material ~15 ms, gbuffer ~17-23 ms.
This sweep measures the round-5 structural levers on the EXACT headline
program (chained-state, per NEXT.md measurement lessons):

- b0/b1/b8: bounce-depth decomposition (b1-b0 = the dense bounce-1
  sweep + shade; b8-b1 = compaction + deep segment).
- tex1: texture_bounces=1 (bounce-1 material from constants — kills the
  bounce-1 half-mip fetch; needs an SSIM guard before shipping).
- cf1: compact_from=1 — the bounce-1 wavefront compacts + partition-
  sorts (octant, tile) before its sweep. Round 3 measured the KEY-SORT
  form a 5.6x loss for spheres; the 9-bucket stable partition
  (compact_sort_partition_min) didn't exist yet — this re-measures.
- cf1_nosort: compaction without the coherence sort (isolates the
  live-lane reduction from the cull re-arming).
- Combos of winners.

RAY_BLOCK variants run as separate processes (DRTS_RAY_BLOCK env).
Usage: python tools/prof_trace5.py [variant ...]  (no args = all)
"""
import json
import sys
import time
import traceback

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
    "b0": dict(bounces=0, compact_from=2),
    "b1": dict(bounces=1, compact_from=2),
    "b8": dict(bounces=8, compact_from=2),
    "b8_tex1": dict(bounces=8, compact_from=2, texture_bounces=1),
    "b8_cf1": dict(bounces=8, compact_from=1),
    "b8_cf1_nosort": dict(bounces=8, compact_from=1, compact_sort=False),
    "b8_cf1_tex1": dict(bounces=8, compact_from=1, texture_bounces=1),
    "b1_cf1": dict(bounces=1, compact_from=1),
    "b8_level": dict(bounces=8, compact_from=2,
                     compact_impl="two_level"),
    "b8_onehot": dict(bounces=8, compact_from=2,
                      compact_impl="blocked_onehot"),
    # Round-5 session 2: deep-entry state-gather schedule (monotone
    # big-table pull + small-table perm gather) and the deep coherence
    # sort's net value (the partition/sort made the SCATTER faster in the
    # piece benchmark — measure its end-to-end worth).
    "b8_mono": dict(bounces=8, compact_from=2, compact_gsel="mono"),
    "b8_dsort0": dict(bounces=8, compact_from=2, compact_sort=False),
    "b8_mono_tex1": dict(bounces=8, compact_from=2, compact_gsel="mono",
                         texture_bounces=1),
    # Shade-vs-entry isolation (no profiler needed): b1 ends at bounce 1
    # so its bounce-1 stage is TERMINAL (emission only — no BSDF
    # sample/scatter/RR); b2 runs the full dense bounce-1 shade plus the
    # deep-segment entry. b2_tinycap shrinks the deep segment to 1k slots
    # (spill off): b2_tinycap - b1 ~= dense bounce-1 shade + fixed entry
    # stream cost; b2 - b2_tinycap ~= the cap-proportional entry part.
    "b8_bsort": dict(bounces=8, compact_from=2,
                     compact_impl="blocked_sort"),
    "b8_bsort_dsort0": dict(bounces=8, compact_from=2,
                            compact_impl="blocked_sort",
                            compact_sort=False),
    "b2": dict(bounces=2, compact_from=2),
    "b2_tinycap": dict(bounces=2, compact_from=2, compact_capacity=1024,
                       overflow_spill=False),
}


def run(name, iters=6):
    cfg = pathtrace.PathTraceConfig(**BASE, **VARIANTS[name])

    @jax.jit
    def frame(scene, cam, fi):
        accel = clusters.make_morton_accel(plan, scene.center, scene.radius,
                                           sort_origin=cam.position)
        gbuf = gbuffer.generate(scene, cam, W, H, cfg.block_size, accel=accel)
        out = pathtrace.trace_image(scene, cam, cfg, fi, gbuf=gbuf,
                                    accel=accel)
        return out.radiance, out.rays_traced, out.counters

    try:
        rad, rays, cnt = frame(scene, cam, 0)
        jax.block_until_ready(rad)
        t0 = time.perf_counter()
        for i in range(iters):
            rad, rays, cnt = frame(scene, cam, i + 1)
        jax.block_until_ready(rad)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({
            "k": name, "ms": round(ms, 2), "rays": int(rays),
            "mray_s": round(float(rays) / ms / 1e3, 2),
            "overflow": float(cnt.get("wavefront_overflow_paths", 0.0)),
            "ray_block": int(__import__(
                "drts_tpu.ops.intersect_pallas",
                fromlist=["RAY_BLOCK"]).RAY_BLOCK)}), flush=True)
    except Exception:
        print(json.dumps({"k": name,
                          "error": traceback.format_exc(limit=3)}),
              flush=True)


for name in (sys.argv[1:] or list(VARIANTS)):
    run(name)
