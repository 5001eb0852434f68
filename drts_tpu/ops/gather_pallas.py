"""VMEM-resident small-table row fetch (Pallas TPU kernel).

TPU has no hardware gather; XLA lowers `table[idx]` at frame scale
(~2M lanes) to an HBM-round-trip form measured at ~8 ms even for a table
of a few KB, and the one-hot-matmul rewrite is only ~1.6x better because
XLA materializes the (N, K) one-hot to HBM. This kernel keeps everything
on-chip: per 2048-lane block it builds the one-hot in VMEM and contracts
it against the VMEM-resident table on the MXU — the fetch then runs at
output bandwidth (~1 ms for (2M, 16) f32).

Used for every per-ray small-table fetch on the hot path (light rows,
ReGIR candidate rows — see ops/light.py). The reference's analogue is a
raw StructuredBuffer load per thread (e.g. RTXDIAppBridge.hlsli light
lookups); on TPU the buffer load becomes this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _fetch_kernel(idx_ref, table_ref, out_ref, *, k: int):
    idx = idx_ref[:, 0:1]                                   # (B, 1) int32
    lane = jax.lax.broadcasted_iota(jnp.int32, (idx.shape[0], k), 1)
    onehot = (lane == idx).astype(jnp.float32)              # VMEM only
    out_ref[:, :] = jax.lax.dot_general(
        onehot, table_ref[:, :], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _pick_block(k: int) -> int:
    """Largest lane block whose (block, k) f32 one-hot stays ~<=1 MB —
    Mosaic keeps ~4 block-sized temporaries (iota, compare, convert,
    matmul operand) on the 16 MB VMEM stack, so bigger blocks OOM."""
    block = 2048
    while block < 16384 and (2 * block) * k * 4 <= 1024 * 1024:
        block *= 2
    return block


@functools.partial(jax.jit, static_argnames=("interpret",))
def fetch_rows_small(table, idx, interpret=False):
    """table: (K, C) f32, K*C small enough for VMEM residency (<= ~1 MB);
    idx: (...,) int32 in [0, K). Returns (..., C) f32 == table[idx] exactly
    (single 1.0 coefficient per row; HIGHEST-precision matmul). Out-of-range
    indices return the all-zero row (one-hot matches nothing) — callers use
    -1 as an intentional null row."""
    k, c = table.shape
    block = _pick_block(k)
    lead = idx.shape
    n = idx.size
    pad = (-n) % block
    flat = idx.reshape(-1)
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    flat = flat[:, None]

    out = pl.pallas_call(
        functools.partial(_fetch_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((n + pad, c), jnp.float32),
        grid=((n + pad) // block,),
        in_specs=[
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat, table)
    return out[:n].reshape(lead + (c,))
