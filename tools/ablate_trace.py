"""Trace-time attribution on TPU: where do the 135 ms go?

Measures, at 1080p over the 448-sphere demo scene:
  1. full trace at bounces 0/1/2/4/8 (marginal cost per bounce)
  2. raw intersection sweeps: coherent (primary) vs incoherent (random
     direction) rays, dense vs with dead fractions
  3. shading-only cost (material eval + BSDF sample at full res)
  4. the surface_attributes wide gather
Run on TPU: python tools/ablate_trace.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from drts_tpu.models import clusters, myscene, scene as scene_mod
from drts_tpu.ops import camera as camera_mod, gbuffer, intersect, pathtrace
from drts_tpu.utils import rng as rng_mod

W, H = 1920, 1080
N = W * H


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:45s} {ms:8.2f} ms", flush=True)
    return out


def main():
    host = myscene.build(oscillator_grid=10)
    scene = host.scene
    plan = clusters.build_plan_morton(np.asarray(scene.center),
                                      np.asarray(scene.radius),
                                      max_members=64)
    cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                                 horizontal_fov_deg=90.0, aspect=W / H)

    accel = jax.jit(lambda c, r: clusters.make_morton_accel(plan, c, r))(
        scene.center, scene.radius)

    # --- 1. bounce sweep ---------------------------------------------------
    for bounces in (0, 1, 2, 4, 8):
        cfg = pathtrace.PathTraceConfig(width=W, height=H, bounces=bounces,
                                        samples_per_pixel=1,
                                        russian_roulette=True,
                                        block_size=32768)

        @jax.jit
        def frame(scene, cam, fi):
            gbuf = gbuffer.generate(scene, cam, W, H, cfg.block_size,
                                    accel=accel)
            out = pathtrace.trace_image(scene, cam, cfg, fi, gbuf=gbuf,
                                        accel=accel)
            return out.radiance, out.rays_traced

        (rad, rays) = timeit(f"trace bounces={bounces}", frame, scene, cam, 1)
        print(f"    rays/frame: {float(rays)/1e6:.2f} M", flush=True)

    # --- 2. raw sweeps -----------------------------------------------------
    key = jax.random.PRNGKey(0)
    o_coh = jnp.broadcast_to(jnp.asarray(host.camera_position), (H, W, 3))
    ndc = camera_mod.pixel_ndc(W, H, jnp.zeros(2))
    _, d_coh, tmn, tmx = camera_mod.generate_pinhole_rays(cam, ndc)
    o_rand = jax.random.uniform(key, (H, W, 3), minval=-40, maxval=40)
    d_rand = jax.random.normal(jax.random.PRNGKey(1), (H, W, 3))
    d_rand = d_rand / jnp.linalg.norm(d_rand, axis=-1, keepdims=True)
    zeros = jnp.zeros((H, W))
    inf = jnp.full((H, W), jnp.inf)

    @jax.jit
    def sweep(o, d, tmax):
        hit = intersect.intersect_spheres(o, d, zeros, tmax, scene.center,
                                          scene.radius, 32768,
                                          attributes=False, accel=accel)
        return hit.t

    timeit("sweep coherent (primary rays)", sweep, o_coh, d_coh, inf)
    timeit("sweep incoherent (random o,d)", sweep, o_rand, d_rand, inf)
    for frac in (0.5, 0.25, 0.1):
        mask = jax.random.uniform(jax.random.PRNGKey(2), (H, W)) < frac
        tmax_m = jnp.where(mask, jnp.inf, -1.0)
        timeit(f"sweep incoherent {int(frac*100)}% live (scattered)",
               sweep, o_rand, d_rand, tmax_m)
    # spatially clustered live mask (front-compacted)
    for frac in (0.5, 0.25, 0.1):
        flat = jnp.arange(N).reshape(H, W) < int(N * frac)
        tmax_m = jnp.where(flat, jnp.inf, -1.0)
        timeit(f"sweep incoherent {int(frac*100)}% live (compacted)",
               sweep, o_rand, d_rand, tmax_m)

    # --- 3. shading only ---------------------------------------------------
    table = jax.jit(scene_mod.object_table)(scene)
    gbuf = jax.jit(lambda s, c: gbuffer.generate(s, c, W, H, 32768,
                                                 accel=accel))(scene, cam)
    surf = gbuf.surf

    @jax.jit
    def shade(surf, d):
        px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        rng = rng_mod.init(px, py, 7)
        em, l_dir, wgt, valid, lobe, bs, sv, v, rng = \
            pathtrace._shade_and_scatter(scene, surf, d, rng, None,
                                         "nearest")
        return em, l_dir, wgt

    timeit("shade+scatter (no textures)", shade, surf, gbuf.ray_direction)

    @jax.jit
    def shade_tex(surf, d):
        px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
        py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
        rng = rng_mod.init(px, py, 7)
        em, l_dir, wgt, valid, lobe, bs, sv, v, rng = \
            pathtrace._shade_and_scatter(scene, surf, d, rng, scene.textures,
                                         "nearest")
        return em, l_dir, wgt

    timeit("shade+scatter (nearest textures)", shade_tex, surf,
           gbuf.ray_direction)

    # --- 4. surface_attributes gather --------------------------------------
    hit = jax.jit(lambda o, d: intersect.intersect_spheres(
        o, d, zeros, inf, scene.center, scene.radius, 32768,
        attributes=False, accel=accel))(o_rand, d_rand)

    @jax.jit
    def attrs(hit, d):
        return scene_mod.surface_attributes(scene, hit, d, table)

    timeit("surface_attributes (wide gather)", attrs, hit, d_rand)


if __name__ == "__main__":
    main()
