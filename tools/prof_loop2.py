"""Floor-free gather costs with data-dependent indices (defeats
constant folding inside the jitted loop)."""
import time, json
import jax, jax.numpy as jnp, numpy as np

W, H = 1920, 1080
N = H * W

hist = jnp.asarray(np.random.RandomState(0).rand(N, 16), jnp.float32)
ridx = jnp.asarray(np.random.RandomState(1).randint(0, N, (H, W)),
                   jnp.int32)
small = jnp.asarray(np.random.RandomState(2).rand(128, 9), jnp.float32)


def loop_time(name, body, n=8, iters=4):
    def run(k):
        f = jax.jit(lambda h, r, s: jax.lax.fori_loop(
            0, k, lambda i, acc: body(i, acc, h, r, s),
            jnp.zeros((H, W), jnp.float32)))
        out = f(hist, ridx, small); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(hist, ridx, small)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3
    t1, tn = run(1), run(n)
    print(json.dumps({"k": name, "ms": round((tn - t1) / (n - 1), 2),
                      "t1": round(t1, 1)}), flush=True)


def dep(acc):
    # data-dependent scalar — blocks constant folding
    return acc[0, 0].astype(jnp.int32)


def b_big16(i, acc, h, r, s):
    rows = h[(r + i + dep(acc)) % N]
    return acc + rows.sum(-1)
loop_time("big_16c", b_big16)


def b_big16_identity(i, acc, h, r, s):
    ident = jnp.arange(N, dtype=jnp.int32).reshape(H, W)
    rows = h[(ident + dep(acc)) % N]
    return acc + rows.sum(-1)
loop_time("big_16c_nearident", b_big16_identity)


def b_big4(i, acc, h, r, s):
    rows = h[(r + i + dep(acc)) % N, :4]
    return acc + rows.sum(-1)
loop_time("big_4c", b_big4)


def b_small(i, acc, h, r, s):
    rows = s[(r + i + dep(acc)) % 128]
    return acc + rows.sum(-1)
loop_time("small_9c", b_small)


def b_small_pad(i, acc, h, r, s):
    # pad the 128-row table to 128k rows: does the lowering change?
    big_s = jnp.tile(s, (1024, 1))
    rows = big_s[((r + i + dep(acc)) % 128) + 128 * 512]
    return acc + rows.sum(-1)
loop_time("small_9c_padded128k", b_small_pad)


def b_small_1c(i, acc, h, r, s):
    col = s[(r + i + dep(acc)) % 128, 0]
    return acc + col
loop_time("small_1c", b_small_1c)
