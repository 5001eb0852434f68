"""Intersection, scene construction, and physics unit tests."""

import jax
import jax.numpy as jnp
import numpy as np

from drts_tpu.models import geometry, myscene, scene as scene_mod
from drts_tpu.ops import intersect, physics
from drts_tpu.utils import math as m


def test_ray_sphere_basic():
    centers = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 20.0]])
    radii = jnp.array([1.0, 1.0])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit = intersect.intersect_spheres(o, d, jnp.zeros(1), jnp.full((1,), 1e9),
                                      centers, radii)
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 4.0, atol=1e-5)
    assert int(hit.index[0]) == 0
    np.testing.assert_allclose(np.asarray(hit.normal[0]), [0, 0, -1],
                               atol=1e-5)
    assert bool(hit.is_front_face[0])


def test_ray_sphere_inside_and_miss():
    centers = jnp.array([[0.0, 0.0, 0.0]])
    radii = jnp.array([2.0])
    o = jnp.array([[0.0, 0.0, 0.0], [5.0, 5.0, 5.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]])
    hit = intersect.intersect_spheres(o, d, jnp.zeros(2), jnp.full((2,), 1e9),
                                      centers, radii)
    # Inside: near root behind t_min -> far root, back face.
    assert bool(hit.hit[0])
    np.testing.assert_allclose(float(hit.t[0]), 2.0, atol=1e-5)
    assert not bool(hit.is_front_face[0])
    assert not bool(hit.hit[1])


def test_blocked_matches_unblocked():
    rng = np.random.RandomState(0)
    centers = jnp.asarray(rng.randn(37, 3) * 5, jnp.float32)
    radii = jnp.asarray(0.2 + rng.rand(37), jnp.float32)
    o = jnp.asarray(rng.randn(1000, 3) * 10, jnp.float32)
    d = m.normalize(jnp.asarray(rng.randn(1000, 3), jnp.float32))
    small = intersect.intersect_spheres(o, d, jnp.zeros(1000),
                                        jnp.full((1000,), 1e9), centers,
                                        radii, block_size=128)
    big = intersect.intersect_spheres(o, d, jnp.zeros(1000),
                                      jnp.full((1000,), 1e9), centers,
                                      radii, block_size=4096)
    np.testing.assert_allclose(np.asarray(small.t), np.asarray(big.t),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(small.index),
                                  np.asarray(big.index))


def test_safe_spawn_no_self_hit():
    centers = jnp.array([[0.0, 0.0, 5.0]])
    radii = jnp.array([1.0])
    o = jnp.array([[0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit = intersect.intersect_spheres(o, d, jnp.zeros(1), jnp.full((1,), 1e9),
                                      centers, radii)
    # Bounce straight back: must not re-hit the same sphere surface.
    new_o = intersect.safe_spawn_point(hit.position, hit.normal,
                                       -d)
    hit2 = intersect.intersect_spheres(new_o, -d, jnp.zeros(1),
                                       jnp.full((1,), 1e9), centers, radii)
    assert not bool(hit2.hit[0])


def test_geosphere_mesh():
    pos, nrm, uv, idx = geometry.create_geosphere(1.0, 3)
    np.testing.assert_allclose(np.linalg.norm(pos, axis=-1), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(nrm, axis=-1), 1.0, atol=1e-6)
    assert uv.min() >= 0.0 and uv.max() <= 1.0
    assert idx.min() >= 0 and idx.max() < pos.shape[0]
    tans = geometry.compute_tangent_frame(idx, pos, nrm, uv)
    dots = np.abs(np.sum(tans * nrm, axis=-1))
    assert dots.max() < 1e-3


def test_myscene_build():
    host = myscene.build(oscillator_grid=10)
    k = host.scene.object_count
    # 4 hero + up to 441 oscillators (some culled near heroes) + 3 celestial.
    assert 400 <= k <= 448
    kinds = host.kinds
    assert (kinds == myscene.KIND_HERO).sum() == 4
    assert (kinds == myscene.KIND_EARTH).sum() == 1
    # Star is static.
    star = int(np.nonzero(kinds == myscene.KIND_STAR)[0][0])
    assert float(host.bodies.inv_mass[star]) == 0.0
    assert float(host.scene.radius[star]) == 50.0
    # Earth mass matches Kepler relation for the moon's orbit.
    earth = int(host.bodies.earth_index)
    dist = 4.0
    expected = physics.gravitational_mass(dist, 10.0)
    np.testing.assert_allclose(float(host.bodies.mass[earth]), expected,
                               rtol=1e-5)


def test_surface_attributes_uv_rotation():
    host = myscene.build(oscillator_grid=1)
    sc = host.scene
    o = jnp.array([[0.0, 0.5, -5.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    hit = intersect.intersect_spheres(o, d, jnp.zeros(1), jnp.full((1,), 1e9),
                                      sc.center, sc.radius)
    surf = scene_mod.surface_attributes(sc, hit, d)
    assert bool(surf.valid[0])
    assert 0.0 <= float(surf.uv[0, 0]) <= 1.0
    # Tangent orthogonal to normal.
    assert abs(float(m.dot(surf.tangent[0], surf.geometric_normal[0]))) < 1e-3


def test_physics_moon_orbit():
    """One orbital period of the moon should return it near its start —
    validates the gravity + integrator against the Kepler setup
    (MyScene.ixx:233-302)."""
    host = myscene.build(oscillator_grid=0)  # only heroes + celestial + 1 osc ring
    b = host.bodies
    moon = int(np.nonzero(host.kinds == myscene.KIND_MOON)[0][0])
    start = np.asarray(b.position[moon])
    earth = np.asarray(b.position[int(b.earth_index)])
    r0 = np.linalg.norm(start - earth)
    dt = 1.0 / 60.0
    step = jax.jit(lambda s: physics.step(s, dt, False, False,
                                          contact_iterations=1))
    for _ in range(600):  # 10 s = one orbital period
        b = step(b)
    end = np.asarray(b.position[moon])
    r1 = np.linalg.norm(end - np.asarray(b.position[int(b.earth_index)]))
    # Radius conserved within a few percent; position returns near start.
    assert abs(r1 - r0) / r0 < 0.05
    assert np.linalg.norm(end - start) < 0.8


def test_physics_oscillator_period():
    host = myscene.build(oscillator_grid=2)
    b = host.bodies
    osc = np.nonzero(host.kinds == myscene.KIND_OSCILLATOR)[0]
    y0 = np.asarray(b.position[osc, 1])
    dt = 1.0 / 60.0
    step = jax.jit(lambda s: physics.step(s, dt, False, False,
                                          contact_iterations=1))
    for _ in range(180):  # one spring period (3 s)
        b = step(b)
    y1 = np.asarray(b.position[osc, 1])
    # After a full period the ensemble should be near its start heights.
    assert np.abs(y1 - y0).mean() < 0.12


def test_physics_contact_resolution():
    """Two equal spheres colliding head-on with restitution 0.6."""
    b = physics.RigidBodies(
        position=jnp.array([[-1.0, 0, 0], [1.0, 0, 0]]),
        velocity=jnp.array([[1.0, 0, 0], [-1.0, 0, 0]]),
        rotation=jnp.tile(m.QUAT_IDENTITY, (2, 1)),
        angular_velocity=jnp.zeros((2, 3)),
        mass=jnp.ones(2), inv_mass=jnp.ones(2),
        radius=jnp.full((2,), 0.5),
        is_oscillator=jnp.zeros(2, bool), spring_rest_y=jnp.float32(0.0),
        attracted_to_earth=jnp.zeros(2, bool),
        earth_index=jnp.int32(0), star_index=jnp.int32(1))
    dt = 1.0 / 60.0
    for _ in range(60):
        b = physics.step(b, dt)
    v = np.asarray(b.velocity)
    # Bounced apart with |v| ~ restitution * initial.
    assert v[0, 0] < 0 and v[1, 0] > 0
    np.testing.assert_allclose(np.abs(v[:, 0]), 0.6, atol=0.05)
    # No interpenetration.
    gap = np.linalg.norm(np.asarray(b.position[0] - b.position[1]))
    assert gap >= 0.99
