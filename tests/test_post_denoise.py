"""Post-processing, denoiser, TAA, and Pallas-kernel equivalence tests."""

import dataclasses

import jax.numpy as jnp
import numpy as np

from drts_tpu.ops import denoise, post, taa
from drts_tpu.utils import math as m


def test_tonemap_operators():
    x = jnp.array([[0.0, 0.18, 1.0], [4.0, 16.0, 1e4]])
    for name in post.TONEMAP_OPERATORS:
        y = post.tonemap(x[..., None].repeat(3, -1), name)
        y = np.asarray(y)
        assert y.min() >= 0.0 and y.max() <= 1.0
        assert (np.diff(y[..., 0].reshape(-1)) >= -1e-6).all()  # monotone


def test_bloom_spreads_and_conserves():
    img = jnp.zeros((64, 64, 3)).at[32, 32].set(100.0)
    out = np.asarray(post.bloom(img, strength=0.1))
    assert out[30, 30].sum() > 0.0          # energy spread to neighbors
    assert out[32, 32].sum() < 300.0        # peak reduced
    flat = jnp.full((64, 64, 3), 0.5)
    out2 = np.asarray(post.bloom(flat, strength=0.1))
    np.testing.assert_allclose(out2[16:48, 16:48], 0.5, atol=0.02)


def test_resize_bilinear_identity_and_mean():
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    same = post.resize_bilinear(img, 16, 16)
    np.testing.assert_allclose(np.asarray(same), np.asarray(img), atol=1e-6)
    up = post.resize_bilinear(img, 32, 32)
    np.testing.assert_allclose(float(up.mean()), float(img.mean()), atol=0.01)


def test_generate_mips():
    img = jnp.asarray(np.arange(64, dtype=np.float32).reshape(8, 8))
    mips = post.generate_mips(img, 3)
    assert [tuple(x.shape) for x in mips] == [(8, 8), (4, 4), (2, 2), (1, 1)]
    np.testing.assert_allclose(float(mips[-1][0, 0]), img.mean(), atol=1e-4)


def test_sharpen_enhances_edges():
    img = jnp.zeros((16, 16, 3)).at[:, 8:].set(1.0)
    out = np.asarray(post.sharpen(img, 1.0))
    assert out[8, 8].sum() > 3.0 - 1e-6  # overshoot on the bright side


def test_chromatic_aberration():
    """Lateral CA (README post chain): strength 0 is the identity; at
    strength > 0 an off-center impulse's red channel magnifies outward,
    blue inward, green stays put (a magnification scales integrals by the
    Jacobian, so only the green channel is exactly preserved)."""
    h = w = 65
    img = np.zeros((h, w, 3), np.float32)
    img[32, 48] = 1.0  # 16 px right of center
    x = jnp.asarray(img)

    assert post.chromatic_aberration(x, 0.0) is x

    out = np.asarray(post.chromatic_aberration(x, 0.03))
    assert np.isfinite(out).all()

    def centroid_x(ch):
        wsum = ch.sum()
        return (ch * np.arange(w)[None, :]).sum() / wsum, wsum

    rx, re = centroid_x(out[..., 0])
    gx, _ = centroid_x(out[..., 1])
    bx, be = centroid_x(out[..., 2])
    assert rx > 48.2, rx          # red pushed outward (right of center)
    assert abs(gx - 48.0) < 1e-4  # green untouched
    assert bx < 47.8, bx          # blue pulled inward
    # Jacobian bounds the per-channel integral drift.
    assert 0.9 < re < 1.12 and 0.9 < be < 1.12, (re, be)
    np.testing.assert_array_equal(out[..., 1], img[..., 1])


def test_denoiser_accumulates_static_scene():
    h = w = 32
    state = denoise.init_state(h, w)
    rng = np.random.RandomState(0)
    normal = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (h, w, 1))
    depth = jnp.full((h, w), 5.0)
    valid = jnp.ones((h, w), bool)
    rough = jnp.full((h, w), 0.5)
    motion = jnp.zeros((h, w, 2))
    clean = 1.0
    outs = []
    for f in range(16):
        noisy = jnp.asarray(clean + rng.randn(h, w, 4) * 0.5, jnp.float32)
        noisy = jnp.maximum(noisy, 0.0)
        state, fd, fs = denoise.denoise(state, noisy, noisy, motion, normal,
                                        depth, valid, rough,
                                        jnp.asarray(False))
        outs.append(np.asarray(fd[..., :3]))
    # Raw per-frame noise is E|N(0, 0.5)| ~ 0.4; the denoiser must land far
    # below it both early (spatial filtering dominates) and late (temporal
    # accumulation dominates — spatial filtering fades out by design as
    # history converges, so late error tracks sigma/sqrt(N), not zero).
    early_err = np.abs(outs[0] - clean).mean()
    late_err = np.abs(outs[-1] - clean).mean()
    assert early_err < 0.15
    assert late_err < 0.12


def test_denoiser_disocclusion_resets_history():
    h = w = 16
    state = denoise.init_state(h, w)
    normal = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (h, w, 1))
    depth = jnp.full((h, w), 5.0)
    valid = jnp.ones((h, w), bool)
    rough = jnp.full((h, w), 0.5)
    motion = jnp.zeros((h, w, 2))
    sig = jnp.ones((h, w, 4))
    for _ in range(8):
        state, _, _ = denoise.denoise(state, sig, sig, motion, normal, depth,
                                      valid, rough, jnp.asarray(False))
    assert float(state.history_length.mean()) > 7.0
    # Depth jump -> history invalid -> length resets to 1.
    state, _, _ = denoise.denoise(state, sig, sig, motion, normal,
                                  jnp.full((h, w), 50.0), valid, rough,
                                  jnp.asarray(False))
    assert float(state.history_length.mean()) <= 1.0 + 1e-6


def test_taa_upscale_converges_static():
    rh = rw = 16
    oh = ow = 32
    state = taa.init_state(oh, ow)
    img = jnp.tile(jnp.array([0.25, 0.5, 0.75]), (rh, rw, 1))
    motion = jnp.zeros((rh, rw, 2))
    for f in range(10):
        state, out = taa.upscale(state, img, motion, jnp.zeros(2), oh, ow,
                                 jnp.asarray(f == 0))
    np.testing.assert_allclose(np.asarray(out).mean(axis=(0, 1)),
                               [0.25, 0.5, 0.75], atol=0.01)
    assert out.shape == (oh, ow, 3)


def test_pallas_interpret_matches_xla():
    """Interpreted Pallas kernel == XLA formulation (SURVEY.md §4:
    interpret-mode equivalence on CPU)."""
    from drts_tpu.ops import intersect, intersect_pallas as ip
    rng = np.random.RandomState(1)
    k = 37
    centers = jnp.asarray(rng.randn(k, 3) * 4, jnp.float32)
    radii = jnp.asarray(0.2 + rng.rand(k), jnp.float32)
    n = 4096
    o = jnp.asarray(rng.randn(n, 3) * 8, jnp.float32)
    d = m.normalize(jnp.asarray(rng.randn(n, 3), jnp.float32))
    tmin = jnp.zeros(n)
    tmax = jnp.full((n,), 1e9)

    ref = intersect.intersect_spheres(o, d, tmin, tmax, centers, radii)
    rays, _ = ip.pack_rays(o, d, tmin, tmax)
    table = ip.pack_spheres(centers, radii)
    t_pal, i_pal = ip.intersect_spheres_planar(rays, table, interpret=True)
    t_pal = np.asarray(t_pal)[:n]
    i_pal = np.asarray(i_pal)[:n]
    fin = np.isfinite(np.asarray(ref.t))
    np.testing.assert_array_equal(np.isfinite(t_pal), fin)
    np.testing.assert_allclose(t_pal[fin], np.asarray(ref.t)[fin], rtol=2e-5,
                               atol=2e-4)
    np.testing.assert_array_equal(i_pal[fin], np.asarray(ref.index)[fin])


def test_relax_denoiser_converges_and_differs():
    """ReLAX mode: converges on a static noisy signal, is a genuinely
    distinct path from ReBLUR (App.cpp:456 ships both), and suppresses
    fireflies."""
    h = w = 32
    rng = np.random.RandomState(3)
    normal = jnp.tile(jnp.array([0.0, 0.0, -1.0]), (h, w, 1))
    depth = jnp.full((h, w), 5.0)
    valid = jnp.ones((h, w), bool)
    rough = jnp.full((h, w), 0.5)
    motion = jnp.zeros((h, w, 2))
    clean = 1.0
    s_relax = denoise.init_state(h, w)
    s_reblur = denoise.init_state(h, w)
    for f in range(12):
        noisy = jnp.asarray(clean + rng.randn(h, w, 4) * 0.5, jnp.float32)
        noisy = jnp.maximum(noisy, 0.0)
        s_relax, rd, _ = denoise.denoise_relax(
            s_relax, noisy, noisy, motion, normal, depth, valid, rough,
            jnp.asarray(False))
        s_reblur, bd, _ = denoise.denoise(
            s_reblur, noisy, noisy, motion, normal, depth, valid, rough,
            jnp.asarray(False))
    relax_err = np.abs(np.asarray(rd[..., :3]) - clean).mean()
    assert relax_err < 0.12
    # Distinct outputs (different algorithms, same inputs).
    assert np.abs(np.asarray(rd) - np.asarray(bd)).max() > 1e-4
    # Variance moments were actually accumulated.
    assert float(s_relax.moments[..., 1].mean()) > 0.0
    assert float(s_reblur.moments.sum()) == 0.0


def test_relax_firefly_suppression():
    h = w = 16
    sig = jnp.ones((h, w, 4)) * 0.1
    sig = sig.at[8, 8, :3].set(500.0)  # firefly
    out = denoise._firefly_suppress(sig, factor=8.0)
    assert float(out[8, 8, :3].max()) < 10.0
    np.testing.assert_allclose(np.asarray(out[2, 2]), np.asarray(sig[2, 2]),
                               rtol=1e-6)


def test_taa_jitter_aware_unjitters():
    """With jitter-aware reconstruction at native res, a static scene
    sampled with alternating jitter must converge to the unjittered signal
    (the jitter is compensated, not averaged into blur)."""
    rh = rw = 32
    state = taa.init_state(rh, rw)
    # A sharp vertical edge; jittering the sample grid shifts what each
    # pixel sees. ramp(x) so a +0.5 jitter shifts values by 0.5.
    x = jnp.arange(rw, dtype=jnp.float32)[None, :].repeat(rh, 0)
    base = jnp.stack([x, x, x], axis=-1) / rw
    motion = jnp.zeros((rh, rw, 2))
    jitters = [jnp.array([0.25, 0.0]), jnp.array([-0.25, 0.0])]
    for f in range(12):
        j = jitters[f % 2]
        # Render of a ramp scene with jittered sampling: value = ramp(x+jx).
        img = jnp.stack([(x + j[0])] * 3, axis=-1) / rw
        state, out = taa.upscale(state, img, motion, j, rh, rw,
                                 jnp.asarray(f == 0))
    # Interior pixels must match the unjittered ramp, not a shifted copy.
    err = np.abs(np.asarray(out[:, 2:-2]) - np.asarray(base[:, 2:-2])).mean()
    assert err < 0.01


def test_pallas_interpret_morton_and_clustered_match_xla():
    """Interpret-mode equivalence for the PRODUCTION kernels
    (intersect_morton_planar / intersect_clustered_planar) — the accel path
    the TPU pipeline runs (VERDICT r1 weak #3)."""
    from drts_tpu.models import clusters
    from drts_tpu.ops import intersect, intersect_pallas as ip
    rng = np.random.RandomState(7)
    k = 53
    centers = np.asarray(rng.randn(k, 3) * 6, np.float32)
    radii = np.asarray(0.2 + rng.rand(k), np.float32)
    n = 4096
    o = jnp.asarray(rng.randn(n, 3) * 10, jnp.float32)
    d = m.normalize(jnp.asarray(rng.randn(n, 3), jnp.float32))
    tmin = jnp.zeros(n)
    tmax = jnp.full((n,), 1e9)

    ref = intersect.intersect_spheres(o, d, tmin, tmax,
                                      jnp.asarray(centers),
                                      jnp.asarray(radii))
    rays, _ = ip.pack_rays(o, d, tmin, tmax)

    plan = clusters.build_plan_morton(centers, radii, max_members=8)
    acc = clusters.make_morton_accel(plan, jnp.asarray(centers),
                                     jnp.asarray(radii))
    t_m, i_m = ip.intersect_morton_planar(rays, acc.bounds_tbl, acc.table,
                                          acc.n_chunks, acc.chunk,
                                          interpret=True)
    acc2 = clusters.make_accel(plan, jnp.asarray(centers),
                               jnp.asarray(radii))
    t_c, i_c = ip.intersect_clustered_planar(
        rays, acc2.bounds_tbl, acc2.members_tbl, acc2.n_clusters,
        acc2.max_members, interpret=True)
    t_x, i_x = ip.intersect_morton_mxu(rays, acc.bounds_tbl, acc.table,
                                       acc.mxu_a, acc.n_chunks, acc.chunk,
                                       interpret=True)
    # Front-to-back chunk order (sort_origin) must be invisible: object
    # identity rides the table rows, closest-hit is a min over chunks.
    acc_s = clusters.make_morton_accel(
        plan, jnp.asarray(centers), jnp.asarray(radii),
        sort_origin=jnp.asarray([3.0, -2.0, 7.0]))
    t_s, i_s = ip.intersect_morton_planar(rays, acc_s.bounds_tbl,
                                          acc_s.table, acc_s.n_chunks,
                                          acc_s.chunk, interpret=True)

    fin = np.isfinite(np.asarray(ref.t))
    ref_t = np.asarray(ref.t)
    ref_i = np.asarray(ref.index)
    # Grazing margin per ray: min over spheres of |dist(line, center) - r|.
    # The MXU variant's bf16x3 matmuls carry ~1e-6 rel error, so rays that
    # graze a sphere within that margin may legitimately flip hit<->miss.
    oc = np.asarray(o)[:, None, :] - centers[None]          # (n, k, 3)
    dn = np.asarray(d)[:, None, :]
    perp = oc - (oc * dn).sum(-1, keepdims=True) * dn
    graze = np.abs(np.linalg.norm(perp, axis=-1) - radii[None]).min(1)
    for exact, (t_pal, i_pal) in ((True, (t_m, i_m)), (True, (t_c, i_c)),
                                  (False, (t_x, i_x)), (True, (t_s, i_s))):
        t_pal = np.asarray(t_pal)[:n]
        i_pal = np.asarray(i_pal)[:n]
        flip = np.isfinite(t_pal) != fin
        if exact:
            assert not flip.any()
            fin_v = fin
        else:
            assert flip.mean() < 0.005 and (graze[flip] < 1e-3).all()
            # t = -b - sqrt(b^2 - c) is ill-conditioned near grazing (the
            # ~1e-6 matmul error divides by sqrt(disc) -> 0), so the strict
            # t check applies only to non-grazing rays; grazing must stay
            # a small minority of this random set.
            strict = graze > 3e-2
            assert strict.mean() > 0.9
            fin_v = fin & ~flip & strict
        # Near-tie hits (two spheres at ~equal t) may resolve to either
        # winner because the Morton table visits spheres in a different
        # order than the flat argmin; t must still agree to ~1e-3 rel.
        # bf16x3 carries ~2^-16 relative matmul error, amplified through
        # the discriminant sqrt — hence the wider inexact atol.
        atol = 2e-4 if exact else 1e-2
        np.testing.assert_allclose(t_pal[fin_v], ref_t[fin_v], rtol=1e-3,
                                   atol=atol)
        same_i = i_pal[fin_v] == ref_i[fin_v]
        close_t = np.abs(t_pal[fin_v] - ref_t[fin_v]) \
            <= atol + 1e-3 * np.abs(ref_t[fin_v])
        assert (same_i | close_t).all()
        assert same_i.mean() > 0.98


def test_pallas_anyhit_matches_bruteforce():
    """Any-hit occlusion kernel (interpret mode) == XLA closest-hit-derived
    occlusion, including the per-ray excluded object (the target light)."""
    from drts_tpu.models import clusters
    from drts_tpu.ops import intersect
    rng = np.random.RandomState(11)
    k = 41
    centers = np.asarray(rng.randn(k, 3) * 5, np.float32)
    radii = np.asarray(0.3 + rng.rand(k) * 0.7, np.float32)
    n = 4096
    o = jnp.asarray(rng.randn(n, 3) * 8, jnp.float32)
    d = m.normalize(jnp.asarray(rng.randn(n, 3), jnp.float32))
    tmin = jnp.zeros(n)
    tmax = jnp.asarray(1.0 + rng.rand(n) * 30, jnp.float32)
    excl = jnp.asarray(rng.randint(0, k, n), jnp.int32)

    ref = intersect.intersect_spheres_any(
        o, d, tmin, tmax, jnp.asarray(centers), jnp.asarray(radii),
        exclude_index=excl)

    plan = clusters.build_plan_morton(centers, radii, max_members=8)
    acc = clusters.make_morton_accel(plan, jnp.asarray(centers),
                                     jnp.asarray(radii))
    old = intersect.BACKEND
    intersect.BACKEND = "interpret"
    try:
        occ = intersect.intersect_spheres_any(
            o, d, tmin, tmax, jnp.asarray(centers), jnp.asarray(radii),
            exclude_index=excl, accel=acc)
    finally:
        intersect.BACKEND = old
    np.testing.assert_array_equal(np.asarray(occ), np.asarray(ref))


def test_catmull_history_identity_and_shift():
    """Catmull-Rom history resample must be the IDENTITY at integer pixel
    coordinates (callers use index convention: py + motion) and reproduce
    a linear ramp under fractional shifts — the round-4 orbit A/B caught
    the half-texel-convention bug that blurred even static history."""
    import jax.numpy as jnp
    from drts_tpu.ops import taa

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.rand(16, 20, 3), np.float32)
    y = jnp.arange(16, dtype=jnp.float32)[:, None] * jnp.ones((1, 20))
    x = jnp.arange(20, dtype=jnp.float32)[None, :] * jnp.ones((16, 1))
    out = taa._catmull_rom_sample(img, y, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-6)

    ramp = (jnp.arange(20, dtype=jnp.float32)[None, :, None]
            * jnp.ones((16, 1, 1))).repeat(3, -1)
    out3 = taa._catmull_rom_sample(ramp, y, x + 0.3)
    np.testing.assert_allclose(np.asarray(out3)[2:-2, 2:-2],
                               np.asarray(ramp)[2:-2, 2:-2] + 0.3,
                               atol=1e-4)
