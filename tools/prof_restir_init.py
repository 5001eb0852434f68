"""Profile restir initial sampling pieces at 1080p: where do 190ms go?"""
import time, json
import jax, jax.numpy as jnp, numpy as np

from drts_tpu.models import clusters, myscene
from drts_tpu.ops import (camera as camera_mod, gbuffer, light as light_mod,
                          restir)

W, H = 1920, 1080
host = myscene.build(oscillator_grid=10)
scene = host.scene
plan = clusters.build_plan_morton(np.asarray(scene.center),
                                  np.asarray(scene.radius), max_members=64)
accel = clusters.make_morton_accel(plan, scene.center, scene.radius)
cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                             horizontal_fov_deg=90.0, aspect=W / H)
cfg = restir.ReSTIRConfig(local_light_samples=8, brdf_samples=1)

gbuf = jax.jit(lambda s, c: gbuffer.generate(s, c, W, H, 32768,
                                             accel=accel))(scene, cam)
lights = jax.jit(light_mod.prepare)(scene)
surface = jax.jit(restir.make_surface)(gbuf)
grid = jax.jit(lambda l: restir.build_regir_grid(l, cam.position, cfg, 0))(
    lights)
jax.block_until_ready(grid)

idx = jnp.asarray(np.random.RandomState(0).randint(0, 448, (H, W)),
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


# 1. the raw wide-row gather
timeit("gather_448x8_2M", jax.jit(lambda t, i: t[i]), lights.table, idx)

# 2. one-hot matmul replacement
@jax.jit
def onehot_fetch(table, i):
    k = table.shape[0]
    flat = i.reshape(-1)
    oh = (flat[:, None] == jnp.arange(k)[None, :]).astype(jnp.bfloat16)
    return (oh @ table.astype(jnp.bfloat16)).astype(jnp.float32).reshape(
        i.shape + (table.shape[1],))
timeit("onehot_bf16_448x8_2M", onehot_fetch, lights.table, idx)

@jax.jit
def onehot_fetch_f32(table, i):
    k = table.shape[0]
    flat = i.reshape(-1)
    oh = (flat[:, None] == jnp.arange(k)[None, :]).astype(jnp.float32)
    return (oh @ table).reshape(i.shape + (table.shape[1],))
timeit("onehot_f32_448x8_2M", onehot_fetch_f32, lights.table, idx)

# 3. full _target_pdf (gather + cone sample + eval_split)
timeit("target_pdf", jax.jit(lambda s, l, i, u: restir._target_pdf(
    s, l, i, u)[0]), surface, lights, idx, uv)

# 4. target_pdf_with_bsdf
timeit("target_pdf_with_bsdf", jax.jit(lambda s, l, i, u:
       restir._target_pdf_with_bsdf(s, l, i, u)[0]), surface, lights, idx,
       uv)

# 5. full initial_sampling variants
def init_n(n_l, n_b, batch=False):
    c = restir.ReSTIRConfig(local_light_samples=n_l, brdf_samples=n_b,
                            candidate_batch=batch)
    return jax.jit(lambda su, sc, li, gr: restir.initial_sampling(
        su, sc, li, gr, c, 0, 32768, accel=accel))

timeit("initial_8l_1b", init_n(8, 1), surface, scene, lights, grid, iters=4)
timeit("initial_8l_1b_batched", init_n(8, 1, True), surface, scene, lights,
       grid, iters=4)
timeit("initial_8l_0b", init_n(8, 0), surface, scene, lights, grid, iters=4)
timeit("initial_8l_0b_batched", init_n(8, 0, True), surface, scene, lights,
       grid, iters=4)
timeit("initial_0l_1b", init_n(0, 1), surface, scene, lights, grid, iters=4)
timeit("initial_0l_0b", init_n(0, 0), surface, scene, lights, grid, iters=4)
timeit("initial_1l_0b", init_n(1, 0), surface, scene, lights, grid, iters=4)
