"""Small-table gather lowering: does padding the table change the path?"""
import time, json
import jax, jax.numpy as jnp, numpy as np

N = 1920 * 1080
rng = np.random.RandomState(0)
idx = jnp.asarray(rng.randint(0, 128, (N,)), jnp.int32)

def timeit(name, fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(json.dumps({"k": name,
                      "ms": round((time.perf_counter()-t0)/iters*1e3, 2)}),
          flush=True)

f = jax.jit(lambda t, i: t[i])
for k in (128, 448, 1024, 4096, 16384, 65536, 262144):
    table = jnp.asarray(rng.rand(k, 9).astype(np.float32))
    timeit(f"gather_k{k}", f, table, idx)

# does jnp.take with clip differ?
t128 = jnp.asarray(rng.rand(128, 9).astype(np.float32))
timeit("take_k128", jax.jit(lambda t, i: jnp.take(t, i, axis=0,
                                                  mode="clip")), t128, idx)
# index 2D layout
timeit("gather_k128_2d", jax.jit(lambda t, i: t[i]), t128,
       idx.reshape(1080, 1920))
