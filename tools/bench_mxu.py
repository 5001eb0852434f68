"""MXU kernel: correctness vs planar kernel + speed, real scene."""
import time, json
import jax, jax.numpy as jnp, numpy as np

from drts_tpu.models import clusters, myscene
from drts_tpu.ops import camera as camera_mod, intersect_pallas as ip

host = myscene.build(oscillator_grid=10)
scene = host.scene
plan = clusters.build_plan_morton(np.asarray(scene.center),
                                  np.asarray(scene.radius), max_members=64)
accel = clusters.make_morton_accel(plan, scene.center, scene.radius)
N = 2048 * 1024

key = jax.random.PRNGKey(1)
o = jax.random.uniform(key, (N, 3), minval=-40.0, maxval=40.0)
d_raw = jax.random.normal(jax.random.PRNGKey(2), (N, 3))
d = d_raw / jnp.linalg.norm(d_raw, axis=-1, keepdims=True)
rays, _ = ip.pack_rays(o, d, jnp.zeros((N,)), jnp.full((N,), jnp.inf))
rays = jax.device_put(rays)

f_old = jax.jit(lambda r: ip.intersect_morton_planar(
    r, accel.bounds_tbl, accel.table, accel.n_chunks, accel.chunk))
f_new = jax.jit(lambda r: ip.intersect_morton_mxu(
    r, accel.bounds_tbl, accel.table, accel.mxu_a, accel.n_chunks,
    accel.chunk))

t_old, i_old = f_old(rays)
jax.block_until_ready(t_old)
t_new, i_new = f_new(rays)
jax.block_until_ready(t_new)

to = np.asarray(t_old); tn = np.asarray(t_new)
io = np.asarray(i_old); inw = np.asarray(i_new)
hit_o = np.isfinite(to); hit_n = np.isfinite(tn)
agree_hit = (hit_o == hit_n).mean()
both = hit_o & hit_n
t_rel = np.abs(to[both] - tn[both]) / np.maximum(np.abs(to[both]), 1e-6)
idx_agree = (io[both] == inw[both]).mean()
print(json.dumps({"agree_hit": float(agree_hit),
                  "t_rel_max": float(t_rel.max()) if both.any() else 0,
                  "t_rel_p999": float(np.quantile(t_rel, 0.999)),
                  "idx_agree": float(idx_agree),
                  "hit_rate": float(hit_o.mean())}), flush=True)

def timeit(name, fn, *args, iters=8):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"k": name, "ms": round((time.perf_counter()-t0)/iters*1e3, 2)}), flush=True)

timeit("planar_2M_incoherent", f_old, rays)
timeit("mxu_2M_incoherent", f_new, rays)

# coherent primary-like rays
cam_o = jnp.broadcast_to(jnp.asarray(host.camera_position), (N, 3))
rays_c, _ = ip.pack_rays(cam_o, d, jnp.zeros((N,)), jnp.full((N,), jnp.inf))
timeit("planar_2M_samedir_origin", f_old, jax.device_put(rays_c))
timeit("mxu_2M_samedir_origin", f_new, jax.device_put(rays_c))
