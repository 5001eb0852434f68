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
    true lights; `count` (static) is the object count.
    """
    center: jnp.ndarray     # (K, 3) — current frame positions
    radius: jnp.ndarray     # (K,)
    emission: jnp.ndarray   # (K, 3) radiance
    power: jnp.ndarray      # (K,) luminance-weighted emitted power
    cdf: jnp.ndarray        # (K,) normalized inclusive power CDF
    total_power: jnp.ndarray  # scalar


def prepare(scene: SphereScene) -> Lights:
    """CountLights/PrepareResources/Process analogue
    (LightPreparation.ixx:52-133): emission -> power -> sampling CDF."""
    emission = scene.materials.emission()
    # Power ∝ luminance * surface area (4 pi r^2); constant factors cancel
    # in the normalized CDF.
    power = m.luminance(emission) * scene.radius * scene.radius
    total = jnp.sum(power)
    cdf = jnp.cumsum(power) / jnp.maximum(total, 1e-20)
    return Lights(center=scene.center, radius=scene.radius,
                  emission=emission, power=power, cdf=cdf, total_power=total)


def sample_light_index(lights: Lights, u):
    """Power-proportional light pick: index + its selection PDF.
    The CDF searchsorted is the TPU analogue of the reference's PDF-texture
    mip descent (LocalLightPresampling.hlsl)."""
    idx = jnp.searchsorted(lights.cdf, u, side="right").astype(jnp.int32)
    idx = jnp.clip(idx, 0, lights.cdf.shape[0] - 1)
    pdf = lights.power[idx] / jnp.maximum(lights.total_power, 1e-20)
    return idx, pdf


def sample_sphere_light(lights: Lights, idx, surface_pos, rand2):
    """Solid-angle cone sampling of sphere light `idx` from `surface_pos`.

    Returns (direction, distance, solid_angle_pdf, emission). Exact for
    points outside the sphere; degrades to uniform-sphere-direction inside.
    """
    center = lights.center[idx]
    radius = lights.radius[idx]
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

    return direction, dist, pdf, lights.emission[idx]


def light_pdf(lights: Lights, idx, surface_pos):
    """Solid-angle PDF of having cone-sampled light `idx` from
    `surface_pos` (for MIS against BSDF sampling — RAB_* contract)."""
    center = lights.center[idx]
    radius = lights.radius[idx]
    dist_c = jnp.maximum(m.length(center - surface_pos), 1e-6)
    sin_max_sq = jnp.clip((radius / dist_c) ** 2, 0.0, 1.0 - 1e-6)
    cos_max = jnp.sqrt(1.0 - sin_max_sq)
    return 1.0 / jnp.maximum(2.0 * jnp.pi * (1.0 - cos_max), 1e-8)
