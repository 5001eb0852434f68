"""Floor-free pass profiling: run each pass N times inside ONE jitted
fori_loop; per-iteration cost = (t(N) - t(1)) / (N - 1). The tunneled
TPU adds a multi-ms per-dispatch floor that poisons single-shot timings;
looping inside the executable cancels it."""
import time, json, sys
import jax, jax.numpy as jnp, numpy as np

from drts_tpu.models import clusters, myscene, pipeline
from drts_tpu.ops import (camera as camera_mod, gbuffer, light as light_mod,
                          restir, sharc as sharc_mod)

W, H = 1920, 1080
host = myscene.build(oscillator_grid=10)
scene = host.scene
plan = clusters.build_plan_morton(np.asarray(scene.center),
                                  np.asarray(scene.radius), max_members=64)
accel = clusters.make_morton_accel(plan, scene.center, scene.radius)
cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                             horizontal_fov_deg=90.0, aspect=W / H)
rcfg = restir.ReSTIRConfig()
scfg = sharc_mod.SHARCConfig()

gbuf = jax.jit(lambda s, c: gbuffer.generate(s, c, W, H, 32768,
                                             accel=accel))(scene, cam)
lights = jax.jit(light_mod.prepare)(scene)
surface = jax.jit(restir.make_surface)(gbuf)
grid = jax.jit(lambda l: restir.build_regir_grid(l, cam.position, rcfg, 0))(
    lights)
res0 = jax.jit(lambda su, sc, li, gr: restir.initial_sampling(
    su, sc, li, gr, rcfg, 0, 32768, accel=accel))(surface, scene, lights,
                                                  grid)
sh = sharc_mod.init_state(scfg)
jax.block_until_ready((gbuf, lights, surface, grid, res0))


def loop_time(name, body, n=8, iters=4):
    """body: (i, carry) -> carry; carry must be a pytree of arrays."""
    def run(k):
        f = jax.jit(lambda: jax.lax.fori_loop(
            0, k, body, jnp.zeros((H, W), jnp.float32)))
        out = f(); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3
    t1, tn = run(1), run(n)
    print(json.dumps({"k": name, "ms": round((tn - t1) / (n - 1), 2),
                      "t1": round(t1, 1)}), flush=True)


which = set(sys.argv[1:]) or {"all"}

if which & {"all", "restir"}:
    def b_temporal(i, acc):
        out = restir.temporal_resampling(
            res0, res0, surface, lights, gbuf.motion, gbuf.linear_depth,
            gbuf.mat.shading_normal, rcfg, i)
        return acc + out.w_out
    loop_time("temporal", b_temporal)

    def b_spatial(i, acc):
        out = restir.spatial_resampling(res0, surface, lights, rcfg, i)
        return acc + out.w_out
    loop_time("spatial_basic", b_spatial)

    def b_final(i, acc):
        d, s = restir.final_shading(res0, surface, scene, lights, 32768,
                                    accel=accel)
        return acc + d[..., 0] + s[..., 0]
    loop_time("final", b_final)

    def b_initial(i, acc):
        out = restir.initial_sampling(surface, scene, lights, grid, rcfg,
                                      i, 32768, accel=accel)
        return acc + out.w_out
    loop_time("initial_8l_1b", b_initial, n=4)

    def b_tpdf(i, acc):
        idx = jnp.mod(jnp.arange(H * W, dtype=jnp.int32).reshape(H, W) + i,
                      128)
        p = restir._target_pdf(surface, lights, idx,
                               jnp.full((H, W, 2), 0.3))[0]
        return acc + p
    loop_time("target_pdf", b_tpdf)

if which & {"all", "sharc"}:
    def b_query(i, acc):
        rad, ok = sharc_mod.query(sh, surface.position, surface.normal,
                                  cam.position + i * 0.0, scfg)
        return acc + rad[..., 0]
    loop_time("sharc_query_2M", b_query)

if which & {"all", "gather"}:
    hist = jnp.asarray(np.random.RandomState(0).rand(H * W, 16),
                       jnp.float32)
    ridx = jnp.asarray(np.random.RandomState(1).randint(0, H * W, (H, W)),
                       jnp.int32)
    def b_gather(i, acc):
        rows = hist[(ridx + i) % (H * W)]
        return acc + rows.sum(-1)
    loop_time("gather_big_16c", b_gather)

    small = jnp.asarray(np.random.RandomState(2).rand(128, 9), jnp.float32)
    def b_sgather(i, acc):
        rows = small[(ridx + i) % 128]
        return acc + rows.sum(-1)
    loop_time("gather_small_9c", b_sgather)

    def b_onehot(i, acc):
        rows = light_mod._onehot_fetch(small, (ridx + i) % 128)
        return acc + rows.sum(-1)
    loop_time("onehot_small_9c", b_onehot)
