"""Probe: compact-wavefront machinery cost at 2M lanes (round 3).

bounce-2 marginal cost is ~26 ms (tools/ablate_trace.py); the compact
switchover does: cumsum over 2M, scatter of source indices, one 11-col
packed gather, then per-bounce work at cap lanes, then a scatter-add back.
Measures each piece, plus a hierarchical cumsum alternative.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 2 * 1024 * 1024
CAP = 174080


def timeit(name, fn, *args, iters=8):
    """Chained timing: each dispatch's input depends on the previous
    output (identical repeated dispatches get deduped to ~0 ms)."""
    out = fn(0, *args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    salt = 0
    for i in range(iters):
        salt = fn(i + 1, *args)
    jax.block_until_ready(salt)
    print(f"{name:45s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms",
          flush=True)


def main():
    act = jax.random.uniform(jax.random.PRNGKey(0), (N,)) < 0.065
    packed = jax.random.uniform(jax.random.PRNGKey(1), (N + 1, 11))

    @jax.jit
    def cumsum_flat(salt, act):
        return jnp.sum(jnp.cumsum((act ^ (salt > 1 << 30)).astype(jnp.int32)))

    @jax.jit
    def cumsum_hier(salt, act):
        b = 2048
        x = (act ^ (salt > 1 << 30)).astype(jnp.int32).reshape(N // b, b)
        within = jnp.cumsum(x, axis=1)
        block_tot = within[:, -1]
        offs = jnp.cumsum(block_tot) - block_tot
        return jnp.sum(within) + jnp.sum(offs)

    @jax.jit
    def full_compact(salt, act, packed):
        act = act ^ (salt > 1 << 30)
        pos = jnp.cumsum(act.astype(jnp.int32)) - 1
        keep = act & (pos < CAP)
        slot_of_src = jnp.where(keep, pos, CAP)
        src = jnp.full((CAP,), N, jnp.int32).at[slot_of_src].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop",
            unique_indices=True)
        rows = packed[jnp.minimum(src, N)]
        return jnp.sum(rows)

    @jax.jit
    def scatter_back(salt, src, contrib):
        pix = jnp.where(src < N, src + (salt & 1), N)
        return jnp.zeros((N, 3), jnp.float32).at[pix].add(
            contrib, mode="drop", unique_indices=True).sum()

    src = jnp.where(jnp.arange(CAP) < 140000,
                    jnp.arange(CAP, dtype=jnp.int32) * 14, N)
    contrib = jax.random.uniform(jax.random.PRNGKey(2), (CAP, 3))

    timeit("cumsum flat 2M", cumsum_flat, act)
    timeit("cumsum hierarchical 2M", cumsum_hier, act)
    timeit("full compact (cumsum+scatter+gather11)", full_compact, act,
           packed)
    timeit("scatter-add back (cap->2M)", scatter_back, src, contrib)


if __name__ == "__main__":
    main()
