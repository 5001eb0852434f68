"""Fused initial-candidate kernel (ops/restir_pallas.py) equivalence: the
Pallas path (run in interpret mode on CPU) must reproduce the XLA
sequential loop — same RNG draws, same reservoir update order; only float
reassociation may differ (ulp-level), so a rare take-flip on a
knife's-edge comparison is tolerated but bounded."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from drts_tpu.models import scene as scene_mod
from drts_tpu.models.material import MaterialDesc, pack_materials
from drts_tpu.ops import (camera as camera_mod, gbuffer, intersect,
                          light as light_mod, restir, sky)
from drts_tpu.utils import math as m


def _scene():
    """Floor + emitters + a metal and a glass sphere (all three BSDF lobes
    exercised in the candidate evaluation)."""
    mats = pack_materials([
        MaterialDesc(base_color=(0.8, 0.8, 0.8, 1), roughness=0.6),
        MaterialDesc(base_color=(0, 0, 0, 1), emissive_strength=8.0,
                     emissive_color=(1.0, 0.6, 0.3)),
        MaterialDesc(base_color=(0, 0, 0, 1), emissive_strength=20.0,
                     emissive_color=(0.2, 0.2, 1.0)),
        MaterialDesc(base_color=(0.9, 0.7, 0.4, 1), metallic=1.0,
                     roughness=0.15),
        MaterialDesc(base_color=(1.0, 1.0, 1.0, 1), roughness=0.05,
                     transmission=0.9, ior=1.5),
    ])
    center = jnp.array([[0.0, -100.0, 0.0],
                        [-2.0, 2.0, 0.0],
                        [2.0, 2.0, 0.0],
                        [0.8, 0.5, -1.0],
                        [-0.9, 0.6, 1.0]])
    rot = jnp.tile(m.QUAT_IDENTITY, (5, 1))
    return scene_mod.SphereScene(
        center=center, rotation=rot, prev_center=center, prev_rotation=rot,
        radius=jnp.array([99.5, 0.3, 0.3, 0.5, 0.55]),
        materials=mats,
        env=sky.make_environment_light(color=(0.0, 0.0, 0.0, 1.0)))


@pytest.mark.parametrize("n_b", [1, 0])
def test_initial_kernel_matches_xla_loop(n_b):
    scene = _scene()
    cam = camera_mod.make_camera((0.0, 1.0, -6.0), (0.0, -0.15, 1.0),
                                 aspect=1.0)
    gbuf = gbuffer.generate(scene, cam, 48, 48, 4096)
    lights = light_mod.prepare(scene)
    surface = restir.make_surface(gbuf)

    cfg = restir.ReSTIRConfig(local_light_samples=8, brdf_samples=n_b,
                              boiling_filter_strength=0.0)
    grid = restir.build_regir_grid(lights, cam.position, cfg, 3)

    old_backend = intersect.BACKEND
    try:
        intersect.BACKEND = "xla"
        ref = restir.initial_sampling(
            surface, scene, lights, grid,
            dataclasses.replace(cfg, initial_kernel=False), 3, 4096)
        intersect.BACKEND = "interpret"
        got = restir.initial_sampling(surface, scene, lights, grid, cfg,
                                      3, 4096)
    finally:
        intersect.BACKEND = old_backend

    ref_idx = np.asarray(ref.light_index)
    got_idx = np.asarray(got.light_index)
    # Identical draws -> identical winners except at take-comparison
    # knife edges flipped by float reassociation.
    mismatch = np.mean(ref_idx != got_idx)
    assert mismatch < 0.01, mismatch
    same = ref_idx == got_idx
    np.testing.assert_allclose(np.asarray(got.w_sum), np.asarray(ref.w_sum),
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.phat)[same],
                               np.asarray(ref.phat)[same],
                               rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.uv)[same],
                               np.asarray(ref.uv)[same],
                               rtol=1e-5, atol=1e-6)
    # w_out folds in the final visibility ray (direction/distance from the
    # kernel's winner vs the XLA re-fetch) — agreement here covers it.
    np.testing.assert_allclose(np.asarray(got.w_out)[same],
                               np.asarray(ref.w_out)[same],
                               rtol=2e-3, atol=1e-4)


def test_initial_kernel_gates_off_cleanly():
    """Power_RIS mode must not touch the kernel (no grid prefetch)."""
    scene = _scene()
    cam = camera_mod.make_camera((0.0, 1.0, -6.0), (0.0, -0.15, 1.0),
                                 aspect=1.0)
    gbuf = gbuffer.generate(scene, cam, 32, 32, 4096)
    lights = light_mod.prepare(scene)
    surface = restir.make_surface(gbuf)
    cfg = restir.ReSTIRConfig(local_light_samples=2,
                              local_light_mode="Power_RIS")
    res = restir.initial_sampling(surface, scene, lights, None, cfg, 0, 4096)
    assert np.isfinite(np.asarray(res.w_out)).all()
