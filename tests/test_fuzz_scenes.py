"""Property/fuzz tests: the integrator must stay finite and non-negative
over degenerate scene shapes the demo never hits — no emitters, all
emitters, single sphere, tiny/huge radii, extreme materials. Guards the
shape/edge-case axis the example-based tests don't cover (the reference
relies on the D3D12 debug layer for this class of bug; SURVEY §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from drts_tpu.models import scene as scene_mod
from drts_tpu.models.material import MaterialDesc, pack_materials
from drts_tpu.ops import camera as camera_mod, light as light_mod, \
    pathtrace, restir, sky
from drts_tpu.utils import math as m


def _random_scene(seed: int, k: int):
    rng = np.random.RandomState(seed)
    descs = []
    for i in range(k):
        descs.append(MaterialDesc(
            base_color=(*rng.rand(3), 1.0),
            metallic=float(rng.rand() < 0.3),
            roughness=float(rng.choice([0.0, rng.rand(), 1.0])),
            transmission=float(rng.rand() < 0.2) * rng.rand(),
            ior=1.0 + rng.rand(),
            emissive_color=tuple(
                rng.rand(3) * (10.0 if rng.rand() < 0.3 else 0.0)),
        ))
    center = jnp.asarray(rng.randn(k, 3) * 6, jnp.float32)
    radius = jnp.asarray(
        np.exp(rng.uniform(np.log(1e-2), np.log(5.0), k)), jnp.float32)
    rot = m.normalize(jnp.asarray(rng.randn(k, 4), jnp.float32))
    return scene_mod.SphereScene(
        center=center, rotation=rot, prev_center=center, prev_rotation=rot,
        radius=radius, materials=pack_materials(descs),
        env=sky.make_environment_light())


def test_demo_scene_poses_zero_overflow():
    """VERDICT r4 item #8: with the DEFAULT config (deep capacity n/24 +
    overflow spill), no pose of the demo scene may drop path radiance —
    the counter must read zero. Poses orbit and dive into the sphere
    field (worst case: the frame filled with close geometry maximizes
    survivors; the close poses DO overflow wave 0, which is exactly why
    the spill defaults on — wave 1 recovers them)."""
    from drts_tpu.models import myscene

    host = myscene.build(oscillator_grid=3)
    rng = np.random.RandomState(11)
    poses = [((0.0, 0.0, -15.0), (0.0, 0.0, 1.0)),   # reference default
             ((0.0, 6.0, -6.0), (0.0, -0.7, 0.7)),   # looking down
             ((0.0, 0.5, -3.0), (0.0, 0.0, 1.0))]    # inside the field
    for _ in range(2):
        p = rng.randn(3) * np.array([6.0, 2.0, 6.0]) + [0.0, 1.0, -8.0]
        f = -p / np.linalg.norm(p)
        poses.append((tuple(p), tuple(f)))
    cfg = pathtrace.PathTraceConfig(width=96, height=96, bounces=8,
                                    block_size=4096)  # default fractions
    for i, (pos, fwd) in enumerate(poses):
        cam = camera_mod.make_camera(pos, fwd, aspect=1.0)
        out = pathtrace.trace_image(host.scene, cam, cfg, i)
        assert float(out.counters["wavefront_overflow_paths"]) == 0.0, \
            (i, pos)


@pytest.mark.parametrize("seed,k", [(0, 1), (1, 3), (2, 17), (3, 64)])
def test_random_scene_trace_finite(seed, k):
    scene = _random_scene(seed, k)
    cam = camera_mod.make_camera((0.0, 0.0, -12.0), aspect=1.0)
    cfg = pathtrace.PathTraceConfig(width=24, height=24, bounces=3,
                                    samples_per_pixel=2, block_size=576)
    out = pathtrace.trace_image(scene, cam, cfg, seed)
    r = np.asarray(out.radiance)
    assert np.isfinite(r).all()
    assert (r >= 0.0).all()


def test_no_emitters_light_prep_and_restir():
    """Zero emissive objects: light preparation and ReSTIR initial
    sampling must produce all-zero DI, not NaNs (division-by-total-power
    class of bug)."""
    rng = np.random.RandomState(9)
    k = 8
    descs = [MaterialDesc(base_color=(*rng.rand(3), 1.0), roughness=0.5)
             for _ in range(k)]
    center = jnp.asarray(rng.randn(k, 3) * 5, jnp.float32)
    rot = jnp.tile(m.QUAT_IDENTITY, (k, 1))
    scene = scene_mod.SphereScene(
        center=center, rotation=rot, prev_center=center, prev_rotation=rot,
        radius=jnp.ones((k,), jnp.float32) * 0.7,
        materials=pack_materials(descs), env=sky.make_environment_light())
    lights = light_mod.prepare(scene)
    assert float(lights.total_power) == 0.0

    from drts_tpu.ops import gbuffer
    cam = camera_mod.make_camera((0.0, 0.0, -10.0), aspect=1.0)
    gbuf = gbuffer.generate(scene, cam, 16, 16, 256)
    surface = restir.make_surface(gbuf)
    cfg = restir.ReSTIRConfig()
    grid = restir.build_regir_grid(lights, cam.position, cfg, 0)
    res = restir.initial_sampling(surface, scene, lights, grid, cfg, 0,
                                  block_size=256)
    diff, spec = restir.final_shading(res, surface, scene, lights,
                                      block_size=256)
    di = np.asarray(diff) + np.asarray(spec)
    assert np.isfinite(di).all()
    assert float(np.abs(di).max()) == 0.0
