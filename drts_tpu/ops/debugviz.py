"""Diagnostic visualization modes — the reference's runtime correctness
probes rebuilt as pure image transforms:

* ReGIR cell visualization (/root/reference/Shaders/DIFinalShading.hlsl:69-75
  `ReGIR_VISUALIZE_CELLS`): primary surfaces colored by a hash of their
  ReGIR grid cell.
* SHARC hash-grid coloring (/root/reference/Shaders/Raytracing.hlsl:279-284
  `SHARC_DEBUG`): primary surfaces colored by a hash of their cache slot —
  voxel size/level structure becomes directly visible.
* NRD validation overlay (/root/reference/Source/App.cpp:1522-1524
  `nrd::Denoiser::Validation`): denoiser history length (green = converged,
  red = fresh/disoccluded) blended over the image.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import rng as rng_mod
from . import restir as restir_mod, sharc as sharc_mod

MODES = ("None", "ReGIRCells", "SHARC", "NRDValidation")


def _hash_color(h):
    """uint32 -> pseudo-random rgb in [0.25, 1] (stable per id)."""
    r = (rng_mod.hash_u32(h) & jnp.uint32(255)).astype(jnp.float32)
    g = (rng_mod.hash_u32(h ^ jnp.uint32(0x55AA55AA))
         & jnp.uint32(255)).astype(jnp.float32)
    b = (rng_mod.hash_u32(h ^ jnp.uint32(0x33CC33CC))
         & jnp.uint32(255)).astype(jnp.float32)
    return 0.25 + 0.75 * jnp.stack([r, g, b], axis=-1) / 255.0


def regir_cells(grid, position, valid, cells_per_axis: int):
    """Primary-surface ReGIR cell id -> color; outside-grid surfaces dim."""
    cell, inside = restir_mod._cell_of(grid, position, cells_per_axis)
    color = _hash_color(cell.astype(jnp.uint32))
    color = jnp.where(inside[..., None], color, 0.05)
    return jnp.where(valid[..., None], color, 0.0)


def sharc_voxels(position, normal, camera_position, valid, cfg):
    """Primary-surface SHARC cache slot -> color (voxel LOD structure)."""
    slot, _fp = sharc_mod.cache_key(position, normal, camera_position, cfg)
    color = _hash_color(slot.astype(jnp.uint32))
    return jnp.where(valid[..., None], color, 0.0)


def validation_overlay(image, history_length, max_frames: float = 30.0):
    """History-length heat (red = young history / disocclusion trail,
    green = converged) blended 50% over the final image."""
    t = jnp.clip(history_length / max_frames, 0.0, 1.0)
    heat = jnp.stack([1.0 - t, t, jnp.zeros_like(t)], axis=-1)
    if heat.shape[:2] != image.shape[:2]:
        from . import post
        heat = post.resize_bilinear(heat, image.shape[0], image.shape[1])
    return 0.5 * image + 0.5 * heat
