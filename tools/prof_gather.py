"""Big-table row-gather scaling on TPU: rows x cols x index coherence."""
import time, json
import jax, jax.numpy as jnp, numpy as np

H, W = 1080, 1920
N = H * W

def timeit(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"k": name,
                      "ms": round((time.perf_counter()-t0)/iters*1e3, 2)}),
          flush=True)

rng = np.random.RandomState(0)
motion = (rng.randn(H, W, 2) * 1.5).astype(np.float32)  # small motion
py, px = np.mgrid[0:H, 0:W]
iy = np.clip(np.round(py + motion[..., 1]), 0, H - 1).astype(np.int32)
ix = np.clip(np.round(px + motion[..., 0]), 0, W - 1).astype(np.int32)
idx_local = jnp.asarray(iy * W + ix)
idx_rand = jnp.asarray(rng.randint(0, N, (H, W)), jnp.int32)
idx_ident = jnp.asarray((py * W + px).astype(np.int32))

for cols in (4, 8, 16, 32):
    table = jnp.asarray(rng.rand(N, cols).astype(np.float32))
    f = jax.jit(lambda t, i: t[i.reshape(-1)].reshape(H, W, t.shape[-1]))
    timeit(f"g_{cols}c_local", f, table, idx_local)
    timeit(f"g_{cols}c_rand", f, table, idx_rand)
    timeit(f"g_{cols}c_ident", f, table, idx_ident)

# 2D-indexed fetch (the _fetch_packed pattern): does flattening matter?
table2 = jnp.asarray(rng.rand(H, W, 16).astype(np.float32))
f2 = jax.jit(lambda t, y, x: t[y, x])
timeit("g2d_16c_local", f2, table2, jnp.asarray(iy), jnp.asarray(ix))
