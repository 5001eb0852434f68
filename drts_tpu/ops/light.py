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

import jax.numpy as jnp
from flax import struct

from ..utils import math as m
from ..models.scene import SphereScene


@struct.dataclass
class Lights:
    """LightInfo SoA over all scene objects (emissive or not).

    Per-frame product of light preparation (LightPreparation::Process).
    `power` is 0 for non-emissive objects, so the CDF only ever selects
    true lights. `table` packs [cx cy cz r er eg eb power] so per-ray
    fetches are ONE wide-row gather — narrow per-field gathers from small
    tables cost ~17 ms each at 2M lanes on TPU.
    """
    center: jnp.ndarray     # (K, 3) — current frame positions
    radius: jnp.ndarray     # (K,)
    emission: jnp.ndarray   # (K, 3) radiance
    power: jnp.ndarray      # (K,) luminance-weighted emitted power
    cdf: jnp.ndarray        # (K,) normalized inclusive power CDF
    total_power: jnp.ndarray  # scalar
    table: jnp.ndarray      # (K, 8) packed row per light


@struct.dataclass
class LightRows:
    """Per-ray gathered light attributes (one wide gather)."""
    center: jnp.ndarray     # (..., 3)
    radius: jnp.ndarray     # (...,)
    emission: jnp.ndarray   # (..., 3)
    power: jnp.ndarray      # (...,)


def fetch_rows(lights: Lights, idx) -> LightRows:
    row = lights.table[idx]
    return LightRows(center=row[..., 0:3], radius=row[..., 3],
                     emission=row[..., 4:7], power=row[..., 7])


def prepare(scene: SphereScene) -> Lights:
    """CountLights/PrepareResources/Process analogue
    (LightPreparation.ixx:52-133): emission -> power -> sampling CDF.

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
        emap = head(scene.materials.emissive_color_map)
        tex_mean = jnp.mean(scene.textures[..., :3], axis=(1, 2))  # (T, 3)
        avg = tex_mean[jnp.maximum(emap, 0)]
        emission = emission * jnp.where((emap >= 0)[:, None], avg, 1.0)
    # Power ∝ luminance * surface area (4 pi r^2); constant factors cancel
    # in the normalized CDF.
    power = m.luminance(emission) * scene.radius * scene.radius
    total = jnp.sum(power)
    cdf = jnp.cumsum(power) / jnp.maximum(total, 1e-20)
    table = jnp.concatenate([scene.center, scene.radius[:, None], emission,
                             power[:, None]], axis=-1)
    return Lights(center=scene.center, radius=scene.radius,
                  emission=emission, power=power, cdf=cdf, total_power=total,
                  table=table)


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
    """Power-proportional light pick: index + its selection PDF.
    The CDF inversion is the TPU analogue of the reference's PDF-texture
    mip descent. For per-pixel candidate streams use `presample_tiles` —
    the LocalLightPresampling.hlsl design — which amortizes the inversion
    into one small pass per frame."""
    idx = _count_leq_chunked(lights.cdf, u)
    idx = jnp.clip(idx, 0, lights.cdf.shape[0] - 1)
    pdf = lights.power[idx] / jnp.maximum(lights.total_power, 1e-20)
    return idx, pdf


def presample_tiles(lights: Lights, count: int, frame_index):
    """Power-RIS presampling tiles (LocalLightPresampling.hlsl / RTXDI RIS
    buffer): draw `count` light indices from the power distribution once
    per frame; per-pixel candidates then pick uniformly from the tile —
    marginally power-distributed, O(1) per candidate."""
    from ..utils import rng as rng_mod
    lane = jnp.arange(count, dtype=jnp.int32)
    state = rng_mod.init(lane, jnp.full((count,), 4242, jnp.int32),
                         frame_index)
    u, _ = rng_mod.next_float(state)
    idx, _ = sample_light_index(lights, u)
    return idx


def pick_from_tiles(lights: Lights, tiles, u):
    """Uniform pick from the presampled tile buffer + its marginal pdf."""
    count = tiles.shape[0]
    slot = jnp.minimum((u * count).astype(jnp.int32), count - 1)
    idx = tiles[slot]
    pdf = lights.power[idx] / jnp.maximum(lights.total_power, 1e-20)
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
