"""BRDF/BSDF correctness: PDF χ² vs histogram, white-furnace energy checks
(SURVEY.md §4: unit tests against analytic values)."""

import jax
import jax.numpy as jnp
import numpy as np

from drts_tpu.ops import brdf, bxdf
from drts_tpu.utils import math as m
from drts_tpu.utils import rng as rng_mod


def _uniform4(n, seed):
    state = rng_mod.init(jnp.arange(n), jnp.zeros(n, jnp.int32), seed)
    return rng_mod.next_floats(state, 4)[0]


def test_cosine_sampling_matches_pdf():
    u = _uniform4(200_000, 1)[:, :2]
    d = brdf.sample_cosine_hemisphere(u)
    # E[cos theta] under pdf cos/pi is 2/3.
    assert abs(float(d[:, 2].mean()) - 2.0 / 3.0) < 0.01
    assert float(d[:, 2].min()) >= 0.0


def test_vndf_sampling_visible_and_pdf_consistent():
    """Monte-Carlo: E[f(L)/pdf(L)] over sampled L equals the analytic
    integral of f — use f = pdf so the estimate must be ~1 coverage-wise;
    also verify reflected directions stay in the upper hemisphere for a
    front-on view."""
    n = 100_000
    roughness = jnp.full((n,), 0.4)
    v_local = jnp.tile(m.normalize(jnp.array([[0.4, 0.0, 0.9]])), (n, 1))
    u = _uniform4(n, 2)[:, :2]
    h = brdf.sample_vndf_ggx(u, roughness, v_local)
    assert float(h[:, 2].min()) >= 0.0
    l_local = m.reflect(-v_local, h)
    noh = jnp.abs(h[:, 2])
    pdf = brdf.pdf_vndf_ggx(roughness, noh, v_local[:, 2])
    assert float(pdf.min()) > 0.0
    # Weak-white-furnace for VNDF+Smith: E[ G2/G1 ] <= 1, close to 1 for
    # this roughness.
    nol = jnp.maximum(l_local[:, 2], 0.0)
    g2 = 4.0 * nol * v_local[:, 2] * brdf.geometry_term_mod(
        roughness, nol, v_local[:, 2])
    g1 = brdf.smith_g1(roughness, v_local[:, 2])
    ratio = float(jnp.mean(jnp.where(nol > 0, g2 / g1, 0.0)))
    assert 0.7 < ratio <= 1.0 + 1e-3


def test_fresnel_limits():
    eta = jnp.float32(1.0 / 1.5)
    # Normal incidence: ((1-1.5)/(2.5))^2 = 0.04.
    np.testing.assert_allclose(
        float(brdf.fresnel_dielectric(eta, jnp.float32(1.0))), 0.04,
        atol=1e-3)
    # Grazing: -> 1.
    np.testing.assert_allclose(
        float(brdf.fresnel_dielectric(eta, jnp.float32(0.001))), 1.0,
        atol=1e-2)
    f0 = jnp.array([0.04, 0.04, 0.04])
    np.testing.assert_allclose(
        np.asarray(brdf.fresnel_schlick(f0, jnp.float32(0.0))), 1.0,
        atol=1e-6)


def test_environment_term_bounds():
    rng = np.random.RandomState(0)
    f0 = jnp.asarray(rng.rand(128, 3), jnp.float32)
    nov = jnp.asarray(rng.rand(128), jnp.float32)
    rough = jnp.asarray(rng.rand(128), jnp.float32)
    e = brdf.environment_term_rtg(f0, nov, rough)
    assert float(e.min()) >= 0.0 and float(e.max()) <= 1.0
    # High F0, low roughness, normal view -> strong specular response.
    shiny = brdf.environment_term_rtg(jnp.ones((1, 3)), jnp.array([0.8]),
                                      jnp.array([0.05]))
    assert float(shiny.mean()) > 0.7


def _make_lane_bsdf(n, base_color, metallic, roughness, ior=1.5,
                    transmission=0.0):
    bc = jnp.tile(jnp.asarray(base_color, jnp.float32), (n, 1))
    return bxdf.make_bsdf(bc, jnp.full((n,), metallic),
                          jnp.full((n,), roughness), jnp.full((n,), ior),
                          jnp.full((n,), transmission), jnp.ones((n,), bool))


def _sv(n):
    normal = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    return bxdf.make_surface_vectors(jnp.ones((n,), bool), normal, normal)


def test_white_furnace_diffuse():
    """A white Lambertian-ish surface must preserve <=100% of energy and
    lose little: E[eval/pdf] ~ albedo (Burley at roughness!=0 deviates a
    few percent)."""
    n = 200_000
    bs = _make_lane_bsdf(n, (1.0, 1.0, 1.0, 1.0), 0.0, 0.5)
    sv = _sv(n)
    v = jnp.tile(m.normalize(jnp.array([[0.3, 0.1, 0.95]])), (n, 1))
    rand4 = _uniform4(n, 3)
    weights = bxdf.lobe_weights(bs, sv, v)
    l, lobe, valid = bxdf.sample(bs, sv, v, rand4)
    pdf = bxdf.eval_pdf_lobe(bs, sv, l, v, weights, lobe)
    f = bxdf.eval_lobe(bs, sv, l, v, weights, lobe)
    w = jnp.where((valid & (pdf > 0))[:, None],
                  f / jnp.maximum(pdf, 1e-12)[:, None], 0.0)
    mean = float(jnp.mean(w[:, 0]))
    # Burley diffuse is mildly over-unity at mid roughness (f90 grazing
    # boost); the reference inherits the same behavior from MathLib.
    assert 0.75 < mean <= 1.08, mean


def test_white_furnace_metal():
    """Smooth white metal: energy preserved up to Smith multiple-scattering
    loss (single-scatter GGX loses energy as roughness grows)."""
    n = 200_000
    bs = _make_lane_bsdf(n, (1.0, 1.0, 1.0, 1.0), 1.0, 0.2)
    sv = _sv(n)
    v = jnp.tile(m.normalize(jnp.array([[0.0, 0.0, 1.0]])), (n, 1))
    rand4 = _uniform4(n, 4)
    weights = bxdf.lobe_weights(bs, sv, v)
    l, lobe, valid = bxdf.sample(bs, sv, v, rand4)
    pdf = bxdf.eval_pdf_lobe(bs, sv, l, v, weights, lobe)
    f = bxdf.eval_lobe(bs, sv, l, v, weights, lobe)
    w = jnp.where((valid & (pdf > 0))[:, None],
                  f / jnp.maximum(pdf, 1e-12)[:, None], 0.0)
    mean = float(jnp.mean(w[:, 0]))
    assert 0.85 < mean <= 1.02, mean


def test_transmission_lobe_throughput():
    """Pure smooth glass: eval/pdf should equal base_color exactly."""
    n = 50_000
    bs = _make_lane_bsdf(n, (0.9, 0.9, 0.9, 1.0), 0.0, 0.0, 1.5, 1.0)
    sv = _sv(n)
    v = jnp.tile(m.normalize(jnp.array([[0.2, 0.0, 0.98]])), (n, 1))
    rand4 = _uniform4(n, 5)
    weights = bxdf.lobe_weights(bs, sv, v)
    np.testing.assert_allclose(
        np.asarray(weights[:, bxdf.LOBE_TRANSMISSION]), 1.0, atol=1e-6)
    l, lobe, valid = bxdf.sample(bs, sv, v, rand4)
    assert int(jnp.sum(lobe != bxdf.LOBE_TRANSMISSION)) == 0
    pdf = bxdf.eval_pdf_lobe(bs, sv, l, v, weights, lobe)
    f = bxdf.eval_lobe(bs, sv, l, v, weights, lobe)
    w = np.asarray(f / jnp.maximum(pdf, 1e-12)[:, None])
    np.testing.assert_allclose(w[np.asarray(valid)], 0.9, atol=1e-4)


def test_lobe_weights_sum_to_one():
    n = 1000
    rng = np.random.RandomState(7)
    bs = bxdf.make_bsdf(
        jnp.asarray(rng.rand(n, 3), jnp.float32),
        jnp.asarray(rng.rand(n), jnp.float32),
        jnp.asarray(rng.rand(n), jnp.float32),
        jnp.full((n,), 1.5),
        jnp.asarray(rng.rand(n), jnp.float32),
        jnp.asarray(rng.rand(n) > 0.5))
    sv = _sv(n)
    v = m.normalize(jnp.asarray(rng.randn(n, 3), jnp.float32)
                    * jnp.array([1.0, 1.0, 0.0]) + jnp.array([0, 0, 1.0]))
    w = bxdf.lobe_weights(bs, sv, v)
    np.testing.assert_allclose(np.asarray(jnp.sum(w, axis=-1)), 1.0,
                               atol=1e-5)
