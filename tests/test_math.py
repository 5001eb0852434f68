"""Unit tests for the core math layer (SURVEY.md §4 test pyramid, level 1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from drts_tpu.utils import math as m
from drts_tpu.utils import rng as rng_mod


def test_normalize_unit_length():
    v = jnp.array([[3.0, 4.0, 0.0], [1e-3, 0.0, 0.0]])
    n = m.normalize(v)
    np.testing.assert_allclose(m.length(n), [1.0, 1.0], atol=1e-6)


def test_reflect_matches_hlsl():
    i = m.normalize(jnp.array([1.0, -1.0, 0.0]))
    n = jnp.array([0.0, 1.0, 0.0])
    r = m.reflect(i, n)
    np.testing.assert_allclose(np.asarray(r),
                               np.asarray(m.normalize(jnp.array([1.0, 1.0, 0.0]))),
                               atol=1e-6)


def test_refract_snell():
    # Normal incidence: direction unchanged.
    i = jnp.array([0.0, -1.0, 0.0])
    n = jnp.array([0.0, 1.0, 0.0])
    d, tir = m.refract(i, n, 1.0 / 1.5)
    assert not bool(tir)
    np.testing.assert_allclose(np.asarray(d), [0.0, -1.0, 0.0], atol=1e-6)
    # Grazing from dense to sparse: TIR.
    i2 = m.normalize(jnp.array([1.0, -0.1, 0.0]))
    d2, tir2 = m.refract(i2, n, 1.5)
    assert bool(tir2)


def test_quaternion_rotation_roundtrip():
    q = m.quat_from_axis_angle(jnp.array([0.0, 1.0, 0.0]), jnp.pi / 2)
    v = jnp.array([1.0, 0.0, 0.0])
    r = m.quat_rotate(q, v)
    np.testing.assert_allclose(np.asarray(r), [0.0, 0.0, -1.0], atol=1e-6)
    back = m.quat_rotate(m.quat_conj(q), r)
    np.testing.assert_allclose(np.asarray(back), np.asarray(v), atol=1e-6)


def test_quat_matrix_consistency():
    rng = np.random.RandomState(1)
    axis = rng.randn(3)
    q = m.quat_from_axis_angle(jnp.asarray(axis, jnp.float32), 0.7)
    v = jnp.asarray(rng.randn(3), jnp.float32)
    mat = m.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(m.quat_rotate(q, v)),
                               np.asarray(v @ mat), atol=1e-5)


def test_orthonormal_basis():
    rng = np.random.RandomState(0)
    n = m.normalize(jnp.asarray(rng.randn(64, 3), jnp.float32))
    t, b = m.orthonormal_basis(n)
    np.testing.assert_allclose(np.asarray(m.dot(t, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.dot(b, n)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.dot(t, b)), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(m.length(t)), 1.0, atol=1e-5)
    # to_local/to_world round-trip
    v = m.normalize(jnp.asarray(rng.randn(64, 3), jnp.float32))
    lv = m.to_local(t, b, n, v)
    np.testing.assert_allclose(np.asarray(m.to_world(t, b, n, lv)),
                               np.asarray(v), atol=1e-5)


def test_oct_encoding_roundtrip():
    rng = np.random.RandomState(3)
    n = m.normalize(jnp.asarray(rng.randn(256, 3), jnp.float32))
    dec = m.oct_decode(m.oct_encode(n))
    np.testing.assert_allclose(np.asarray(m.dot(dec, n)), 1.0, atol=1e-4)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(np.asarray(m.to_srgb(m.from_srgb(x))),
                               np.asarray(x), atol=1e-5)


def test_latlong_mapping():
    # +y -> v=0 (top); -y -> v=1; +z -> u=0.5.
    uv = m.to_latlong(jnp.array([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0],
                                 [0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(np.asarray(uv[:, 1]), [0.0, 1.0, 0.5],
                               atol=1e-6)
    np.testing.assert_allclose(float(uv[2, 0]), 0.5, atol=1e-6)


def test_rng_uniformity_and_decorrelation():
    px = jnp.arange(4096) % 64
    py = jnp.arange(4096) // 64
    state = rng_mod.init(px, py, 0)
    u1, state = rng_mod.next_float(state)
    u2, state = rng_mod.next_float(state)
    u1, u2 = np.asarray(u1), np.asarray(u2)
    assert 0.0 <= u1.min() and u1.max() < 1.0
    assert abs(u1.mean() - 0.5) < 0.02
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.05
    # Distinct pixels get distinct streams.
    assert len(np.unique(u1)) > 4000


def test_halton_low_discrepancy():
    pts = rng_mod.halton_sequence(1024)
    assert pts.shape == (1024, 2)
    assert abs(pts[:, 0].mean() - 0.5) < 0.01
    assert abs(pts[:, 1].mean() - 0.5) < 0.01


def test_config_clamp_and_json(tmp_path):
    from drts_tpu import config as cfg
    s = cfg.GraphicsSettings(
        raytracing=cfg.RaytracingSettings(bounces=99, samples_per_pixel=0))
    s = s.check()
    assert s.raytracing.bounces == 8
    assert s.raytracing.samples_per_pixel == 1
    p = str(tmp_path / "settings.json")
    cfg.save_settings(s, p)
    loaded = cfg.load_settings(p)
    assert loaded == s
    # Corrupt/missing file -> defaults.
    assert cfg.load_settings(str(tmp_path / "nope.json")) == \
        cfg.GraphicsSettings().check()
