"""Break down _target_pdf cost at 2M lanes."""
import time, json
import jax, jax.numpy as jnp, numpy as np

from drts_tpu.models import clusters, myscene
from drts_tpu.ops import (camera as camera_mod, gbuffer, light as light_mod,
                          restir, bxdf)

W, H = 1920, 1080
host = myscene.build(oscillator_grid=10)
scene = host.scene
plan = clusters.build_plan_morton(np.asarray(scene.center),
                                  np.asarray(scene.radius), max_members=64)
accel = clusters.make_morton_accel(plan, scene.center, scene.radius)
cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                             horizontal_fov_deg=90.0, aspect=W / H)
gbuf = jax.jit(lambda s, c: gbuffer.generate(s, c, W, H, 32768,
                                             accel=accel))(scene, cam)
lights = jax.jit(light_mod.prepare)(scene)
surface = jax.jit(restir.make_surface)(gbuf)
jax.block_until_ready(surface)

idx = jnp.asarray(np.random.RandomState(0).randint(0, 128, (H, W)),
                  jnp.int32)
uv = jnp.asarray(np.random.RandomState(1).rand(H, W, 2), jnp.float32)


def timeit(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"k": name,
                      "ms": round((time.perf_counter()-t0)/iters*1e3, 2)}),
          flush=True)


timeit("fetch_compact_onehot", jax.jit(
    lambda l, i: light_mod._onehot_fetch(l.compact, i)), lights, idx)
timeit("fetch_compact_gather", jax.jit(
    lambda l, i: l.compact[i]), lights, idx)

rows = jax.jit(lambda l, i: light_mod.fetch_rows(l, i))(lights, idx)
jax.block_until_ready(rows)

timeit("cone_sample_rows", jax.jit(
    lambda r, s, u: light_mod.sample_sphere_light_rows(r, s.position, u)),
    rows, surface, uv)

d = jax.jit(lambda r, s, u: light_mod.sample_sphere_light_rows(
    r, s.position, u)[0])(rows, surface, uv)
jax.block_until_ready(d)
timeit("eval_split", jax.jit(lambda s, di: bxdf.eval_split(
    s.bsdf, s.sv, di, s.view, s.lobe_weights)), surface, d)

timeit("target_pdf_full", jax.jit(lambda s, l, i, u: restir._target_pdf(
    s, l, i, u)[0]), surface, lights, idx, uv)
