"""Material evaluation at hit points: texture application + normal mapping.

TPU-native reimplementation of ``EvaluateMaterial`` and friends
(/root/reference/Shaders/ShadingHelpers.hlsli:61-235). Textures live in a
single (T, S, S, 4) atlas (all maps resized to one resolution at load time —
the ResourceDictionary analogue); a map index of -1 means "slot unused" and
multiplies by 1, keeping every lane's control flow uniform.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..utils import math as m
from ..models.material import Materials


def sample_atlas(atlas, tex_index, uv, filter: str = "bilinear"):
    """Sample the texture atlas; identity (1,1,1,1) where tex_index < 0.
    atlas: (T, S, S, 4); tex_index: (...,) int32; uv: (..., 2) in [0, 1]
    (wrap in U, clamp in V — lat-long convention). filter: "bilinear"
    (4 gathers) or "nearest" (1 gather — used for deep bounces where the
    footprint exceeds a texel anyway)."""
    t, s = atlas.shape[0], atlas.shape[1]
    idx = jnp.clip(tex_index, 0, t - 1)
    # Single-axis gathers from the flattened atlas — multi-index-array
    # advanced indexing lowers to a far slower XLA gather on TPU.
    flat = atlas.reshape(-1, atlas.shape[-1])
    base = idx * (s * s)
    if filter == "nearest":
        xi = jnp.mod((uv[..., 0] * s).astype(jnp.int32), s)
        yi = jnp.clip((uv[..., 1] * s).astype(jnp.int32), 0, s - 1)
        value = flat[base + yi * s + xi]
        return jnp.where((tex_index >= 0)[..., None], value,
                         jnp.ones_like(value))
    x = uv[..., 0] * s - 0.5
    y = uv[..., 1] * s - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), s)
    x1i = jnp.mod(x0i + 1, s)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, s - 1)
    y1i = jnp.clip(y0i + 1, 0, s - 1)
    c00 = flat[base + y0i * s + x0i]
    c10 = flat[base + y0i * s + x1i]
    c01 = flat[base + y1i * s + x0i]
    c11 = flat[base + y1i * s + x1i]
    value = m.lerp(m.lerp(c00, c10, fx), m.lerp(c01, c11, fx), fy)
    return jnp.where((tex_index >= 0)[..., None], value,
                     jnp.ones_like(value))


@struct.dataclass
class EvaluatedMaterial:
    """Post-texture material parameters at a hit."""
    base_color: jnp.ndarray      # (..., 3)
    alpha: jnp.ndarray           # (...,)
    emission: jnp.ndarray        # (..., 3)
    metallic: jnp.ndarray        # (...,)
    roughness: jnp.ndarray       # (...,)
    ior: jnp.ndarray             # (...,)
    transmission: jnp.ndarray    # (...,)
    shading_normal: jnp.ndarray  # (..., 3) possibly normal-mapped


def evaluate_material(mat: Materials, uv, shading_normal, tangent,
                      atlas=None, filter: str = "bilinear"
                      ) -> EvaluatedMaterial:
    """ShadingHelpers.hlsli:161-235 EvaluateMaterial, vectorized.

    `mat` holds per-ray gathered parameters (Materials.gather). When
    `atlas` is None all texture slots are treated as unused.
    """
    base_color = mat.base_color[..., :3]
    alpha = mat.base_color[..., 3]
    emission = mat.emission()
    metallic = mat.metallic
    roughness = mat.roughness
    transmission = mat.transmission
    n = shading_normal

    if atlas is not None:
        bc = sample_atlas(atlas, mat.base_color_map, uv, filter)
        base_color = base_color * bc[..., :3]
        alpha = alpha * bc[..., 3]
        emission = emission * sample_atlas(atlas, mat.emissive_color_map,
                                           uv, filter)[..., :3]
        metallic = metallic * sample_atlas(atlas, mat.metallic_map,
                                           uv, filter)[..., 0]
        roughness = roughness * sample_atlas(atlas, mat.roughness_map,
                                             uv, filter)[..., 0]
        transmission = transmission * sample_atlas(
            atlas, mat.transmission_map, uv, filter)[..., 0]
        # Normal perturbation (ShadingHelpers.hlsli:89-103): 2-channel
        # local normal, z reconstructed.
        nm = sample_atlas(atlas, mat.normal_map, uv, filter)
        nxy = nm[..., :2] * 2.0 - 1.0
        nz = jnp.sqrt(jnp.maximum(
            1.0 - nxy[..., 0] ** 2 - nxy[..., 1] ** 2, 0.0))
        t, b, nn = m.calculate_tbn(n, tangent)
        perturbed = m.normalize(nxy[..., 0:1] * t + nxy[..., 1:2] * b
                                + nz[..., None] * nn)
        n = jnp.where((mat.normal_map >= 0)[..., None], perturbed, n)

    return EvaluatedMaterial(
        base_color=base_color, alpha=alpha, emission=emission,
        metallic=metallic, roughness=roughness, ior=mat.ior,
        transmission=jnp.where(metallic < 1.0, transmission, 0.0),
        shading_normal=n)
