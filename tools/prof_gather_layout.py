"""Gather source-layout experiments (chained loop, dedup-proof)."""
import time, json
import jax, jax.numpy as jnp, numpy as np

W, H = 1920, 1080
N = H * W


def timeloop(name, body, *tables, n=6, iters=3):
    def run(k):
        f = jax.jit(lambda a0, *ts: jax.lax.fori_loop(
            0, k, lambda i, acc: body(i, acc, *ts), a0))
        out = f(jnp.zeros((H, W), jnp.float32), *tables)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(out, *tables)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3
    t1, tn = run(1), run(n)
    print(json.dumps({"k": name, "ms": round((tn - t1) / (n - 1), 2),
                      "t1": round(t1, 1)}), flush=True)


def d(acc):
    return acc[0, 0].astype(jnp.int32)


rng = np.random.RandomState(0)
src_flat = jnp.asarray(rng.rand(N, 9), jnp.float32)
src_3d = jnp.asarray(rng.rand(H, W, 9), jnp.float32)
iy = jnp.asarray(rng.randint(0, H, (H, W)), jnp.int32)
ix = jnp.asarray(rng.randint(0, W, (H, W)), jnp.int32)
ridx = jnp.asarray(rng.randint(0, N, (H, W)), jnp.int32)
# near-identity (reprojection-like) indices
noise = rng.randint(-2, 3, (H, W))
py, px = np.mgrid[0:H, 0:W]
idx_local = jnp.asarray(
    (np.clip(py + noise, 0, H - 1) * W
     + np.clip(px + noise.T[:H, :W] if False else px, 0, W - 1)).astype(
        np.int32))

timeloop("flat_9c_rand", lambda i, acc, s, r: acc + s[
    (r + i + d(acc)) % N].sum(-1), src_flat, ridx)
timeloop("flat_9c_local", lambda i, acc, s, r: acc + s[
    jnp.clip(r + i + d(acc) * 0, 0, N - 1)].sum(-1), src_flat, idx_local)
timeloop("3d_9c_rand", lambda i, acc, s, y: acc + s[
    (y + i + d(acc)) % H, ix].sum(-1), src_3d, iy)

# source forced through a transpose (maybe different layout assignment)
timeloop("flatT_9c_rand", lambda i, acc, s, r: acc + jnp.transpose(s)[
    (r + i + d(acc)) % N].sum(-1),
         jnp.transpose(src_flat), ridx)

# one column only (element-count scaling probe)
timeloop("flat_1c_rand", lambda i, acc, s, r: acc + s[
    (r + i + d(acc)) % N, 0], src_flat, ridx)
timeloop("flat_4c_rand", lambda i, acc, s, r: acc + s[
    (r + i + d(acc)) % N, :4].sum(-1), src_flat, ridx)
