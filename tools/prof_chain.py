"""Floor-free, dedup-proof pass timing: N-iteration fori_loop inside one
jit, CHAINED carry across calls (the tunnel dedups dispatches with
identical inputs), tables as jit ARGS (closure constants ship with the
remote-compile request), per-iter = (t(N)-t(1))/(N-1)."""
import time, json, sys
import jax, jax.numpy as jnp, numpy as np

W, H = 1920, 1080
N = H * W


def timeloop(name, body, *tables, n=8, iters=4, carry0=None):
    """body(i, acc, *tables) -> acc."""
    if carry0 is None:
        carry0 = jnp.zeros((H, W), jnp.float32)

    def run(k):
        f = jax.jit(lambda a0, *ts: jax.lax.fori_loop(
            0, k, lambda i, acc: body(i, acc, *ts), a0))
        out = f(carry0, *tables); jax.block_until_ready(out)
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


def scaling():
    hist32 = jnp.asarray(np.random.RandomState(0).rand(N, 32), jnp.float32)
    hist_bf = hist32.astype(jnp.bfloat16)
    ridx = jnp.asarray(np.random.RandomState(1).randint(0, N, (H, W)),
                       jnp.int32)

    for c in (4, 8, 16, 32):
        timeloop(f"big_{c}c",
                 lambda i, acc, h, r, c=c: acc + h[
                     (r + i + d(acc)) % N, :c].sum(-1), hist32, ridx)
    timeloop("big_16c_bf16",
             lambda i, acc, h, r: acc + h[
                 (r + i + d(acc)) % N, :16].sum(-1).astype(jnp.float32),
             hist_bf, ridx)
    timeloop("two_8c",
             lambda i, acc, h, r: acc + h[
                 (r + i + d(acc)) % N, :8].sum(-1)
             + h[(r + i + 7 + d(acc)) % N, 8:16].sum(-1), hist32, ridx)
    ident = jnp.arange(N, dtype=jnp.int32).reshape(H, W)
    noise = jnp.asarray(np.random.RandomState(5).randint(-3, 4, (H, W)),
                        jnp.int32)
    timeloop("big_16c_nearident",
             lambda i, acc, h, r: acc + h[
                 jnp.clip(r + noise + d(acc) * 0, 0, N - 1), :16].sum(-1),
             hist32, ident)


if __name__ == "__main__":
    scaling()
