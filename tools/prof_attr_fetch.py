"""Probe: object-table row fetch strategies at 2M rays (round-3).

The (K+M, 33) wide-row gather in surface_attributes costs ~15 ms at 2M
rays (tools/ablate_trace.py). Candidates:
  a) plain gather (current)
  b) one-hot MXU matmul (light._onehot_fetch generalized to 451x33)
  c) one-hot matmul on an f16 table (half the MXU bytes)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 2 * 1024 * 1024
K = 451
C = 33


def timeit(name, fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms")


def main():
    table = jax.random.uniform(jax.random.PRNGKey(0), (K, C))
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, K)

    @jax.jit
    def gather(idx):
        return table[idx]

    @jax.jit
    def onehot(idx):
        oh = (idx[:, None] == jnp.arange(K, dtype=idx.dtype)[None, :])
        return jax.lax.dot_general(oh.astype(jnp.float32), table,
                                   (((1,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST)

    tb16 = table.astype(jnp.bfloat16)

    @jax.jit
    def onehot_bf16(idx):
        oh = (idx[:, None] == jnp.arange(K, dtype=idx.dtype)[None, :])
        return jax.lax.dot_general(oh.astype(jnp.bfloat16), tb16,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    timeit("a_gather_451x33", gather, idx)
    timeit("b_onehot_f32", onehot, idx)
    timeit("c_onehot_bf16", onehot_bf16, idx)


if __name__ == "__main__":
    main()
