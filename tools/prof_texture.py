"""Cost-model probe for the texture path redesign (round 3).

Measures, at 2M pixels on the real TPU, with chained state so dispatches
can't dedupe (NEXT.md measurement lessons):
  a) current path: 6 maps x 4-tap bilinear from the (8,512,512,4) f32 atlas
  b) packed path: ONE 8-word (32B) gather from a quad-duplicated u32 table
     at 256^2 (exact bilinear after unpack)
  c) split path: 4 gathers of 2-word rows from a 256^2 packed table
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N = 2 * 1024 * 1024
S = 256


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    x = args[0]
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name}: {dt:.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    uv = jax.random.uniform(key, (N, 2))
    tex_index = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, 3)

    # (a) current: full f32 atlas, 6 maps x bilinear
    atlas = jax.random.uniform(jax.random.PRNGKey(2), (8, 512, 512, 4))

    from drts_tpu.ops import shading

    @jax.jit
    def cur(uv, idx):
        acc = 0.0
        for m_i in range(6):
            acc = acc + shading.sample_atlas(atlas, idx + m_i % 2, uv)
        return acc

    # (b) packed quad rows: (T*S*S, 8) u32, one gather
    table8 = jax.random.randint(jax.random.PRNGKey(3), (3 * S * S, 8),
                                0, jnp.iinfo(jnp.int32).max,
                                dtype=jnp.int32).view(jnp.uint32)

    def unpack4(w):
        w = w.astype(jnp.uint32)
        return jnp.stack([(w >> s) & 0xFF for s in (0, 8, 16, 24)],
                         axis=-1).astype(jnp.float32) * (1.0 / 255.0)

    @jax.jit
    def packed1(uv, idx):
        x = uv[:, 0] * S - 0.5
        y = uv[:, 1] * S - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        xi = jnp.mod(x0.astype(jnp.int32), S)
        yi = jnp.clip(y0.astype(jnp.int32), 0, S - 1)
        rows = table8[idx * (S * S) + yi * S + xi]          # (N, 8)
        c00 = unpack4(rows[:, 0])
        c10 = unpack4(rows[:, 2])
        c01 = unpack4(rows[:, 4])
        c11 = unpack4(rows[:, 6])
        a = c00 * (1 - fx) + c10 * fx
        b = c01 * (1 - fx) + c11 * fx
        d00 = unpack4(rows[:, 1])
        d10 = unpack4(rows[:, 3])
        d01 = unpack4(rows[:, 5])
        d11 = unpack4(rows[:, 7])
        a2 = d00 * (1 - fx) + d10 * fx
        b2 = d01 * (1 - fx) + d11 * fx
        return a * (1 - fy) + b * fy + (a2 * (1 - fy) + b2 * fy)

    # (c) split: (T*S*S, 2) u32 rows, 4 gathers
    table2 = jax.random.randint(jax.random.PRNGKey(4), (3 * S * S, 2),
                                0, jnp.iinfo(jnp.int32).max,
                                dtype=jnp.int32).view(jnp.uint32)

    @jax.jit
    def split4(uv, idx):
        x = uv[:, 0] * S - 0.5
        y = uv[:, 1] * S - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        fx = (x - x0)[:, None]
        fy = (y - y0)[:, None]
        x0i = jnp.mod(x0.astype(jnp.int32), S)
        x1i = jnp.mod(x0i + 1, S)
        y0i = jnp.clip(y0.astype(jnp.int32), 0, S - 1)
        y1i = jnp.clip(y0i + 1, 0, S - 1)
        base = idx * (S * S)
        r00 = table2[base + y0i * S + x0i]
        r10 = table2[base + y0i * S + x1i]
        r01 = table2[base + y1i * S + x0i]
        r11 = table2[base + y1i * S + x1i]
        c = lambda r: unpack4(r[:, 0]) + unpack4(r[:, 1])
        a = c(r00) * (1 - fx) + c(r10) * fx
        b = c(r01) * (1 - fx) + c(r11) * fx
        return a * (1 - fy) + b * fy

    timeit("a_current_6map_bilinear_512f32", cur, uv, tex_index)
    timeit("b_packed_quad_1gather_256", packed1, uv, tex_index)
    timeit("c_packed_split_4gather_256", split4, uv, tex_index)


if __name__ == "__main__":
    main()
