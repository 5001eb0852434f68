"""Split the gbuffer pass (28.7 ms @1080p, r3 attribution) into its
components: primary trace vs material eval vs demodulation vs motion.

Method (NEXT.md measurement lessons): cumulative-prefix jitted programs,
chained over iterations with a varying camera jitter so XLA cannot dedupe
dispatches; component cost = adjacent prefix difference. Prints one JSON
line per prefix.

Usage: python tools/prof_gbuffer.py [width height iters]
"""

import json
import sys
import time

import jax
import jax.numpy as jnp


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 1920
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 1080
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from drts_tpu.models import myscene, scene as scene_mod
    from drts_tpu.ops import (bxdf, camera as camera_mod, gbuffer, shading,
                              sky, trace as trace_mod)
    from drts_tpu.utils import math as m

    host = myscene.build(oscillator_grid=10, load_textures=True)
    scene = host.scene
    cam0 = camera_mod.make_camera(host.camera_position, host.camera_forward,
                                  horizontal_fov_deg=90.0,
                                  aspect=width / height)

    def prefix(stage):
        def fn(cam, seed):
            # Vary the subpixel jitter per iteration (anti-dedup).
            cam = cam.replace(jitter=jnp.stack(
                [jnp.sin(seed * 12.9898) * 0.5, jnp.cos(seed * 4.1414) * 0.5]))
            ndc = camera_mod.pixel_ndc(width, height, cam.jitter)
            ray_o, ray_d, t_min, t_max = camera_mod.generate_pinhole_rays(
                cam, ndc)
            ray_o = jnp.broadcast_to(ray_o, ray_d.shape)
            t_min = jnp.broadcast_to(t_min, (height, width))
            t_max = jnp.broadcast_to(t_max, (height, width))
            if stage == "rays":
                return jnp.sum(ray_d[..., 0])
            table = scene_mod.object_table(scene)
            surf = trace_mod.trace_scene(
                scene, ray_o, ray_d, t_min, t_max, 32768, accel=None,
                table=table, alpha_rounds=scene.alpha_test_rounds)
            if stage == "trace":
                return jnp.sum(surf.distance) + jnp.sum(surf.uv)
            mat = shading.evaluate_material(surf.material, surf.uv,
                                            surf.shading_normal, surf.tangent,
                                            scene.textures)
            if stage == "material":
                return jnp.sum(mat.base_color) + jnp.sum(mat.roughness)
            sv = bxdf.make_surface_vectors(surf.is_front_face,
                                           surf.geometric_normal,
                                           mat.shading_normal)
            bs = bxdf.make_bsdf(mat.base_color, mat.metallic, mat.roughness,
                                mat.ior, mat.transmission, surf.is_front_face)
            da, sa = bxdf.demodulation_factors(bs, sv, -ray_d)
            if stage == "albedo":
                return jnp.sum(da) + jnp.sum(sa)
            env = sky.environment_color(scene.env, ray_d)
            radiance = jnp.where(surf.valid[..., None], mat.emission, env)
            fwd = m.normalize(cam.forward)
            depth = jnp.where(surf.valid,
                              m.dot(surf.position - cam.position, fwd),
                              jnp.inf)
            row = scene_mod.fetch_rows(table, surf.object_index)
            obj_local = m.quat_rotate(m.quat_conj(row[..., 4:8]),
                                      surf.position - row[..., 0:3])
            prev_world = row[..., 8:11] + m.quat_rotate(row[..., 11:15],
                                                        obj_local)
            prev_ndc, _ = camera_mod.project_to_ndc(cam, prev_world,
                                                    previous=True)
            cur_ndc, _ = camera_mod.project_to_ndc(cam, surf.position,
                                                   previous=False)
            motion = (camera_mod.ndc_to_pixel(prev_ndc, width, height)
                      - camera_mod.ndc_to_pixel(cur_ndc, width, height))
            return (jnp.sum(radiance) + jnp.sum(jnp.where(
                jnp.isfinite(depth), depth, 0.0)) + jnp.sum(motion))
        return jax.jit(fn)

    results = {}
    prev = 0.0
    for stage in ("rays", "trace", "material", "albedo", "full"):
        fn = prefix(stage)
        out = fn(cam0, jnp.float32(0.0))
        jax.block_until_ready(out)
        start = time.perf_counter()
        acc = jnp.float32(0.0)
        for i in range(iters):
            acc = acc + fn(cam0, acc * 1e-9 + jnp.float32(i + 1))
        jax.block_until_ready(acc)
        ms = (time.perf_counter() - start) / iters * 1e3
        results[stage] = round(ms, 2)
        print(json.dumps({"prefix": stage, "ms": round(ms, 2),
                          "delta_ms": round(ms - prev, 2)}), flush=True)
        prev = ms

    # Real pass for cross-check: the full generate() as the pipeline calls
    # it (includes HitSurface/pytree packaging XLA may not DCE above).
    def real(cam, seed):
        cam = cam.replace(jitter=jnp.stack(
            [jnp.sin(seed * 12.9898) * 0.5, jnp.cos(seed * 4.1414) * 0.5]))
        g = gbuffer.generate(scene, cam, width, height, 32768)
        return (jnp.sum(g.motion) + jnp.sum(g.diffuse_albedo)
                + jnp.sum(jnp.where(jnp.isfinite(g.linear_depth),
                                    g.linear_depth, 0.0))
                + jnp.sum(g.mat.base_color) + jnp.sum(g.surf.distance))
    real = jax.jit(real)
    out = real(cam0, jnp.float32(0.0))
    jax.block_until_ready(out)
    start = time.perf_counter()
    acc = jnp.float32(0.0)
    for i in range(iters):
        acc = acc + real(cam0, acc * 1e-9 + jnp.float32(i + 1))
    jax.block_until_ready(acc)
    ms = (time.perf_counter() - start) / iters * 1e3
    print(json.dumps({"prefix": "generate_real", "ms": round(ms, 2)}),
          flush=True)


if __name__ == "__main__":
    main()
