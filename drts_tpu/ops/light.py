"""Light preparation: emissive-instance list, power table, and sampling.

TPU-native reimplementation of the reference's light pipeline front end
(/root/reference/Source/LightPreparation.ixx +
Shaders/LightPreparation.hlsl + Shaders/Light.hlsli). The reference
enumerates emissive *triangles* into LightInfo records and builds a
Z-curve power PDF texture + mips for hierarchical sampling
(LightPreparation.hlsl:130-133, MipmapGeneration.hlsl). Our scene's lights
are emissive sphere instances, and on TPU the natural equivalent of the
PDF-texture descent is a power CDF + vectorized ``searchsorted`` — same
distribution, one dense op. Sphere lights are sampled by solid-angle cone
sampling (exact for non-penetrating spheres), the analogue of triangle
area sampling + ToSolidAnglePDF (Light.hlsli:25-96, Math.hlsli:48-51).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..utils import math as m
from ..models.scene import SphereScene

# Static capacity of the compact light list (top-power emissive objects).
# The demo scene has ~90 emissive oscillators + hero lights; scenes with
# more lights keep the brightest MAX_LIGHTS (the RTXDI RIS buffer is
# likewise a fixed-capacity presampled subset).
MAX_LIGHTS = 128


@struct.dataclass
class Lights:
    """LightInfo SoA: object-indexed fields over all K scene objects plus a
    COMPACT light-indexed table over the L=MAX_LIGHTS brightest emitters.

    Per-frame product of light preparation (LightPreparation::Process).
    Reservoirs and candidate streams carry *compact* indices: per-ray
    attribute fetches then run over a (L, 9) table, small enough for the
    one-hot-matmul fetch (`_onehot_fetch`) — a 2M-lane row gather from a
    small table costs ~8 ms on TPU, the equivalent MXU matmul ~1 ms.
    """
    center: jnp.ndarray     # (K, 3) — current frame positions
    radius: jnp.ndarray     # (K,)
    emission: jnp.ndarray   # (K, 3) radiance
    power: jnp.ndarray      # (K,) luminance-weighted emitted power
    total_power: jnp.ndarray  # scalar
    table: jnp.ndarray      # (K, 9) object row [c r e power light_id]
    compact: jnp.ndarray    # (L, 9) light row  [c r e power object_id]
    cdf: jnp.ndarray        # (L,) normalized inclusive power CDF (compact)


@struct.dataclass
class LightRows:
    """Per-ray gathered light attributes (one wide fetch)."""
    center: jnp.ndarray     # (..., 3)
    radius: jnp.ndarray     # (...,)
    emission: jnp.ndarray   # (..., 3)
    power: jnp.ndarray      # (...,)
    aux: jnp.ndarray        # (...,) int32: object_id for compact rows,
                            # light_id (-1 = not a light) for object rows


# One-hot fetches pay off once the index count dwarfs the table; below the
# threshold (CPU tests, small frames) the plain gather wins.
_ONEHOT_MIN = 1 << 16


def _onehot_fetch(table, idx):
    """Exact row fetch table[idx] as an MXU matmul: one-hot(idx) @ table.
    precision=HIGHEST makes the f32 matmul exact to f32 for a single
    nonzero coefficient of 1.0 (verified against the gather in tests).
    Chained-loop timing at 2M lanes x (128, 9): 2.0 ms vs 5.3 ms for the
    XLA gather; a VMEM-resident Pallas variant was tried and measured
    WORSE (9.8 ms — per-grid-program overhead dominates at the small
    block sizes its one-hot fits in)."""
    k, cols = table.shape
    flat = idx.reshape(-1)
    oh = (flat[:, None] == jnp.arange(k, dtype=flat.dtype)[None, :])
    out = jax.lax.dot_general(oh.astype(jnp.float32), table,
                              (((1,), (0,)), ((), ())),
                              precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape + (cols,))


def _fetch(table, idx, force_onehot=False):
    if force_onehot or idx.size >= _ONEHOT_MIN:
        return _onehot_fetch(table, idx)
    return table[idx]


def fetch_rows(lights: Lights, idx) -> LightRows:
    """COMPACT-indexed light fetch; `aux` is the source object id."""
    row = _fetch(lights.compact, idx)
    return LightRows(center=row[..., 0:3], radius=row[..., 3],
                     emission=row[..., 4:7], power=row[..., 7],
                     aux=jnp.round(row[..., 8]).astype(jnp.int32))


def fetch_rows_object(lights: Lights, obj_idx) -> LightRows:
    """OBJECT-indexed fetch (for BRDF-ray candidates that hit geometry);
    `aux` is the compact light id, -1 when the object is not a light."""
    row = _fetch(lights.table, obj_idx)
    return LightRows(center=row[..., 0:3], radius=row[..., 3],
                     emission=row[..., 4:7], power=row[..., 7],
                     aux=jnp.round(row[..., 8]).astype(jnp.int32))


def prepare(scene: SphereScene) -> Lights:
    """CountLights/PrepareResources/Process analogue
    (LightPreparation.ixx:52-133): emission -> power -> compact light list
    -> sampling CDF.

    Emissive-texture handling (LightPreparation.hlsl:86-128): the
    reference scales each light's radiance by a filtered average of its
    emissive map; here the per-texture mean is folded into the light
    record the same way. Mesh instances (material rows >= K) are not
    light sources — emissive mesh support would need triangle-area
    sampling (the reference's emissive-triangle path)."""
    k = scene.center.shape[0]

    def head(x):
        return x[:k]

    emission = head(scene.materials.emission())
    if scene.textures is not None:
        # Per-SET emissive-map mean, precomputed at texture bake time
        # (models/texpack.py) — the filtered-average analogue of
        # LightPreparation.hlsl:86-128 without touching the raw atlas.
        emap = head(scene.materials.emissive_color_map)  # set ids
        avg = scene.textures.emissive_mean[jnp.maximum(emap, 0)]
        emission = emission * jnp.where((emap >= 0)[:, None], avg, 1.0)
    # Power ∝ luminance * surface area (4 pi r^2); constant factors cancel
    # in the normalized CDF.
    power = m.luminance(emission) * scene.radius * scene.radius
    total = jnp.sum(power)

    # Compact list: top-MAX_LIGHTS objects by power. Powers derive from
    # static materials, so the ordering — and with it every compact id —
    # is frame-stable (temporal reservoir reuse stores compact ids).
    n_l = min(MAX_LIGHTS, k)
    top_power, top_obj = jax.lax.top_k(power, n_l)
    pad = MAX_LIGHTS - n_l
    if pad:
        top_power = jnp.pad(top_power, (0, pad))
        top_obj = jnp.pad(top_obj, (0, pad))
    is_light = top_power > 0
    top_obj = jnp.where(is_light, top_obj, -1)
    safe_obj = jnp.maximum(top_obj, 0)
    compact = jnp.concatenate([
        scene.center[safe_obj], scene.radius[safe_obj, None],
        emission[safe_obj], top_power[:, None],
        top_obj[:, None].astype(jnp.float32)], axis=-1)
    compact = jnp.where(is_light[:, None], compact,
                        jnp.zeros_like(compact).at[:, 8].set(-1.0))
    cdf = jnp.cumsum(top_power) / jnp.maximum(total, 1e-20)

    # Object-indexed reverse map: light_id of each object (-1 = none).
    # Non-light rows scatter to out-of-range index k and are dropped (a
    # dump-slot write could clobber a real object's id).
    light_id = jnp.full((k,), -1, jnp.int32).at[
        jnp.where(is_light, safe_obj, k)].set(
        jnp.arange(MAX_LIGHTS, dtype=jnp.int32), mode="drop")
    table = jnp.concatenate([scene.center, scene.radius[:, None], emission,
                             power[:, None],
                             light_id[:, None].astype(jnp.float32)], axis=-1)
    return Lights(center=scene.center, radius=scene.radius,
                  emission=emission, power=power, total_power=total,
                  table=table, compact=compact, cdf=cdf)


def _count_leq_chunked(cdf, u, chunk: int = 64):
    """#{cdf_j <= u} per query — searchsorted(side='right') for a small
    sorted table, laid out sublane-major ((chunk, N) compares) so the
    reduce runs along sublanes. Direct jnp.searchsorted lowers terribly on
    TPU at millions of queries (scan: ~250 ms; compare_all / lane-major
    broadcasts: tens of GB of traffic)."""
    import jax
    k = cdf.shape[0]
    k_pad = -(-k // chunk) * chunk
    table = jnp.pad(cdf, (0, k_pad - k), constant_values=jnp.inf)
    u_flat = u.reshape(1, -1)

    def body(c, acc):
        part = jax.lax.dynamic_slice_in_dim(table, c * chunk, chunk)
        return acc + jnp.sum(part[:, None] <= u_flat, axis=0,
                             dtype=jnp.int32)

    counts = jax.lax.fori_loop(0, k_pad // chunk, body,
                               jnp.zeros(u_flat.shape[1:], jnp.int32))
    return counts.reshape(u.shape)


def sample_light_index(lights: Lights, u):
    """Power-proportional light pick: COMPACT index + its selection PDF.
    The CDF inversion is the TPU analogue of the reference's PDF-texture
    mip descent. Per-pixel candidate streams never call this directly —
    restir.build_regir_grid amortizes it into per-frame ReGIR cells plus
    power-RIS fallback rows (the LocalLightPresampling.hlsl role)."""
    idx = _count_leq_chunked(lights.cdf, u)
    idx = jnp.clip(idx, 0, lights.cdf.shape[0] - 1)
    pdf = _fetch(lights.compact, idx)[..., 7] / jnp.maximum(
        lights.total_power, 1e-20)
    return idx, pdf


def sample_sphere_light(lights: Lights, idx, surface_pos, rand2):
    """Solid-angle cone sampling of sphere light `idx` from `surface_pos`.
    Convenience wrapper: fetches the packed row then defers to
    `sample_sphere_light_rows`."""
    rows = fetch_rows(lights, idx)
    return sample_sphere_light_rows(rows, surface_pos, rand2)


def sample_sphere_light_rows(rows: LightRows, surface_pos, rand2):
    """Cone sampling from pre-gathered light rows (one wide gather at the
    call site instead of four narrow ones here).

    Returns (direction, distance, solid_angle_pdf, emission). Exact for
    points outside the sphere; degrades to uniform-sphere-direction inside.
    """
    center = rows.center
    radius = rows.radius
    to_c = center - surface_pos
    dist_c = jnp.maximum(m.length(to_c), 1e-6)
    w = to_c / dist_c[..., None]

    sin_max_sq = jnp.clip((radius / dist_c) ** 2, 0.0, 1.0 - 1e-6)
    cos_max = jnp.sqrt(1.0 - sin_max_sq)
    # Uniform direction in the cone.
    cos_t = 1.0 - rand2[..., 0] * (1.0 - cos_max)
    sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
    phi = 2.0 * jnp.pi * rand2[..., 1]
    t, b = m.orthonormal_basis(w)
    direction = (t * (sin_t * jnp.cos(phi))[..., None]
                 + b * (sin_t * jnp.sin(phi))[..., None]
                 + w * cos_t[..., None])
    pdf = 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - cos_max), 1e-8)

    # Distance to the sphere along the sampled direction (near root).
    oc = -to_c
    bq = m.dot(oc, direction)
    cq = m.dot(oc, oc) - radius * radius
    disc = jnp.maximum(bq * bq - cq, 0.0)
    dist = jnp.maximum(-bq - jnp.sqrt(disc), 1e-4)

    return direction, dist, pdf, rows.emission


def light_pdf(lights: Lights, idx, surface_pos):
    """Solid-angle PDF of having cone-sampled light `idx` from
    `surface_pos` (for MIS against BSDF sampling — RAB_* contract)."""
    rows = fetch_rows(lights, idx)
    return light_pdf_rows(rows, surface_pos)


def light_pdf_rows(rows: LightRows, surface_pos):
    center = rows.center
    radius = rows.radius
    dist_c = jnp.maximum(m.length(center - surface_pos), 1e-6)
    sin_max_sq = jnp.clip((radius / dist_c) ** 2, 0.0, 1.0 - 1e-6)
    cos_max = jnp.sqrt(1.0 - sin_max_sq)
    return 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - cos_max), 1e-8)
