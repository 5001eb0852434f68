"""Split the sharc_update pass (58.6 ms at 1080p, BENCH_r03): update
trace vs splat (sort+dedup+scatter) vs resolve — and A/B the round-4
live-row pre-compaction in splat_levels. Chained-state timing per the
measurement lessons (NEXT.md)."""
import json
import time

from drts_tpu.utils import cache

cache.enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from drts_tpu.models import clusters, myscene  # noqa: E402
from drts_tpu.ops import (camera as camera_mod, pathtrace,  # noqa: E402
                          restir, sharc as sharc_mod)

W, H = 480, 270   # the 1080p default downscale-4 update resolution
host = myscene.build(oscillator_grid=10)
scene = host.scene
plan = clusters.build_plan_morton(np.asarray(scene.center),
                                  np.asarray(scene.radius), max_members=32)
cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                             horizontal_fov_deg=90.0, aspect=W / H)
scfg = sharc_mod.SHARCConfig()
cfg = pathtrace.PathTraceConfig(width=W, height=H, bounces=8,
                                block_size=32768, compact_from=2)


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"k": name, "ms": round(
        (time.perf_counter() - t0) / iters * 1e3, 2)}), flush=True)


accel = jax.jit(lambda s: clusters.make_morton_accel(
    plan, s.center, s.radius))(scene)
st0 = sharc_mod.init_state(scfg)


@jax.jit
def full_update(state, fi):
    new, counters = pathtrace.sharc_update_trace(scene, cam, state, scfg,
                                                 cfg, fi, accel=accel)
    return new


timeit("sharc_update_full", full_update, st0, 3)

# Resolve alone (dense per-slot blend at 2^22 rows).
frame_sum = jnp.zeros((1 << scfg.capacity_log2, 3))
frame_count = jnp.zeros((1 << scfg.capacity_log2,))
frame_fp = jnp.zeros((1 << scfg.capacity_log2,), jnp.uint32)
timeit("resolve_only",
       jax.jit(lambda s: sharc_mod.resolve(s, frame_sum, frame_count,
                                           frame_fp, scfg)), st0)

# Splat alone on a synthetic stream shaped like the real one (~15% live).
n = W * H * 9
rng = np.random.RandomState(0)
cap = 1 << scfg.capacity_log2
live = rng.rand(n) < 0.15
slots_np = np.where(live, rng.randint(0, cap, n), cap).astype(np.int32)
fp_np = np.where(live, rng.randint(1, 2**31, n), 0).astype(np.uint32)
rad_np = rng.rand(n, 3).astype(np.float32)
act_np = live


@jax.jit
def splat_only(slots, fps, rad, act):
    acc = (jnp.zeros((cap, 3)), jnp.zeros((cap,)),
           jnp.zeros((cap,), jnp.uint32))
    s, c, f, d = sharc_mod.splat_levels(acc, [slots], [fps], [rad], [act])
    return s.sum() + c.sum() + d


timeit("splat_only_15pct_live", splat_only, jnp.asarray(slots_np),
       jnp.asarray(fp_np), jnp.asarray(rad_np), jnp.asarray(act_np))
