"""Scene representation: sphere instances + materials + environment.

TPU-native reimplementation of /root/reference/Source/Scene.ixx: instead of
BLAS/TLAS handles and per-instance transform matrices, the scene is a pytree
of SoA arrays — current and previous poses (Scene::Refresh keeps both for
motion vectors, Scene.ixx:185-219), per-instance material parameters, and
the environment light. `advance_pose` is the TLAS-refit analogue: O(K) array
swaps instead of an acceleration-structure rebuild.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct

from ..ops import sky
from ..utils import math as m
from . import geometry
from .material import Materials


@struct.dataclass
class SphereScene:
    """All scene state a render pass reads (SURVEY.md §1 L2)."""
    # Dynamic pose (written by physics each frame; Scene::Refresh analogue).
    center: jnp.ndarray         # (K, 3)
    rotation: jnp.ndarray       # (K, 4) quaternion, object->world
    prev_center: jnp.ndarray    # (K, 3)
    prev_rotation: jnp.ndarray  # (K, 4)
    # Static shape + materials.
    radius: jnp.ndarray         # (K,)
    materials: Materials
    env: sky.EnvironmentLight
    # Texture atlas: (T, S, S, 4) float32 stack or None (added by loaders).
    textures: jnp.ndarray | None = None

    @property
    def object_count(self) -> int:
        return self.center.shape[0]


def advance_pose(scene: SphereScene, new_center, new_rotation) -> SphereScene:
    """Per-frame pose update, keeping the previous pose for motion vectors —
    the functional form of Scene::Refresh (Scene.ixx:185-219)."""
    return dataclasses.replace(
        scene, prev_center=scene.center, prev_rotation=scene.rotation,
        center=new_center, rotation=new_rotation)


@struct.dataclass
class HitSurface:
    """Shading-ready surface attributes — what CastRay's vertex fetch +
    interpolate produces (Shaders/RaytracingHelpers.hlsli:57-133), computed
    analytically for sphere instances."""
    valid: jnp.ndarray            # (...,) bool
    position: jnp.ndarray         # (..., 3)
    geometric_normal: jnp.ndarray  # (..., 3) outward unit normal
    shading_normal: jnp.ndarray   # (..., 3) front-flipped (HitInfo.hlsli)
    tangent: jnp.ndarray          # (..., 3)
    uv: jnp.ndarray               # (..., 2) lat-long in object space
    is_front_face: jnp.ndarray    # (...,)
    distance: jnp.ndarray         # (...,)
    object_index: jnp.ndarray     # (...,) int32
    material: Materials           # per-ray gathered material


def surface_attributes(scene: SphereScene, hit, ray_direction) -> HitSurface:
    """Build shading attributes from a SphereHit (ops/intersect.py).

    Mirrors HitInfo::Initialize (Shaders/HitInfo.hlsli:96-134): the shading
    normal is the geometric normal flipped to face the incoming ray; UV and
    tangent come from the instance-rotated lat-long parametrization (the
    geosphere's UV layout, MyScene.ixx:53-88).
    """
    rot = scene.rotation[hit.index]
    obj_normal = m.quat_rotate(m.quat_conj(rot), hit.normal)
    uv = m.to_latlong(obj_normal)
    tangent = m.quat_rotate(rot, geometry.sphere_tangent(obj_normal))
    shading_normal = jnp.where(hit.is_front_face[..., None],
                               hit.normal, -hit.normal)
    return HitSurface(
        valid=hit.hit,
        position=hit.position,
        geometric_normal=hit.normal,
        shading_normal=shading_normal,
        tangent=tangent,
        uv=uv,
        is_front_face=hit.is_front_face,
        distance=hit.t,
        object_index=hit.index,
        material=scene.materials.gather(hit.index),
    )
