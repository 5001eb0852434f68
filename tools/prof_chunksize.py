"""Probe: Morton chunk size vs sweep cost on the real scene (round 3).

Finer chunks -> tighter bounds -> more chunk culls, at more scalar-cull
overhead. Measures primary (coherent) and random (incoherent) sweeps plus
a realistic bounce-1 population (BSDF-sampled directions from the real
G-buffer) for max_members in {16, 32, 64}.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from drts_tpu.models import clusters, myscene
from drts_tpu.ops import camera as camera_mod, gbuffer, intersect, pathtrace
from drts_tpu.utils import rng as rng_mod

W, H = 1920, 1080


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:50s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
          flush=True)


def main():
    host = myscene.build(oscillator_grid=10)
    scene = host.scene
    cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                                 horizontal_fov_deg=90.0, aspect=W / H)

    # Realistic bounce-1 rays from the real G-buffer + BSDF sampling.
    plan64 = clusters.build_plan_morton(np.asarray(scene.center),
                                       np.asarray(scene.radius),
                                       max_members=64)
    accel64 = jax.jit(lambda c, r: clusters.make_morton_accel(plan64, c, r))(
        scene.center, scene.radius)
    gb = jax.jit(lambda s, c: gbuffer.generate(s, c, W, H, 32768,
                                               accel=accel64))(scene, cam)
    px = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    rng = rng_mod.init(px, py, 1)

    @jax.jit
    def bounce1(surf, d):
        em, l_dir, wgt, valid, lobe, bs, sv, v, r = \
            pathtrace._shade_and_scatter(scene, surf, d, rng, None, "nearest")
        o = intersect.safe_spawn_point(surf.position, surf.geometric_normal,
                                       l_dir)
        live = surf.valid & valid
        return o, l_dir, jnp.where(live, jnp.inf, -1.0)

    o1, d1, tmax1 = bounce1(gb.surf, gb.ray_direction)

    ndc = camera_mod.pixel_ndc(W, H, jnp.zeros(2))
    o0, d0, tmn, tmx = camera_mod.generate_pinhole_rays(cam, ndc)
    o0 = jnp.broadcast_to(o0, d0.shape)
    zeros = jnp.zeros((H, W))
    inf = jnp.full((H, W), jnp.inf)

    for mm in (64, 32, 16):
        plan = clusters.build_plan_morton(np.asarray(scene.center),
                                         np.asarray(scene.radius),
                                         max_members=mm)
        accel = jax.jit(lambda c, r: clusters.make_morton_accel(plan, c, r))(
            scene.center, scene.radius)

        @jax.jit
        def sweep(o, d, tmax):
            hit = intersect.intersect_spheres(o, d, zeros, tmax,
                                              scene.center, scene.radius,
                                              32768, attributes=False,
                                              accel=accel)
            return hit.t

        timeit(f"mm={mm:2d} primary sweep", sweep, o0, d0, inf)
        timeit(f"mm={mm:2d} bounce1 sweep (live BSDF rays)", sweep, o1, d1,
               tmax1)


if __name__ == "__main__":
    main()
