"""Parity odds-and-ends (VERDICT r1 item 10): EXR env maps, HDR10 output,
thin-lens DoF wiring, transmission maps."""

import os
import struct
import zlib

import jax.numpy as jnp
import numpy as np

from drts_tpu.models import myscene
from drts_tpu.models.material import MaterialDesc, pack_materials
from drts_tpu.ops import camera as camera_mod, post, shading, sky
from drts_tpu.utils import image as image_mod
from drts_tpu.utils import math as m


def _rand_img(h, w, seed=0):
    return np.random.RandomState(seed).rand(h, w, 3).astype(np.float32) * 9.0


def test_exr_roundtrip_uncompressed(tmp_path):
    img = _rand_img(7, 13)
    path = str(tmp_path / "t.exr")
    image_mod.write_exr(path, img)
    back = image_mod.read_exr(path)
    np.testing.assert_array_equal(back, img)


def test_exr_zip_block(tmp_path):
    """ZIP-compressed scanline EXR decodes exactly (forward transform =
    de-interleave + delta encode + zlib, built here by hand)."""
    img = _rand_img(4, 5, seed=3)
    h, w = img.shape[:2]
    path = str(tmp_path / "z.exr")
    # Reuse the uncompressed writer's header, then rewrite as one ZIP block.
    image_mod.write_exr(path, img)
    raw = open(path, "rb").read()
    comp_off = raw.index(b"compression\0compression\0")
    comp_pos = comp_off + len(b"compression\0compression\0") + 4
    out = bytearray(raw[:comp_pos])
    out[comp_pos:comp_pos + 1] = b"\x03"  # ZIP
    out += raw[comp_pos + 1:]
    # header ends right before the offset table = after the final \0 of
    # attributes; rebuild body: one block of all rows.
    hdr_end = len(raw) - (8 * h + sum(8 + w * 4 * 3 for _ in range(h)))
    body_rows = b""
    for y in range(h):
        body_rows += b"".join(img[y, :, c].astype("<f4").tobytes()
                              for c in (2, 1, 0))
    # forward: split halves interleaved, then delta-encode, then deflate
    t = np.frombuffer(body_rows, np.uint8)
    half = (t.size + 1) // 2
    inter = np.empty(t.size, np.uint8)
    inter[:half] = t[0::2]
    inter[half:] = t[1::2]
    d = inter.astype(np.int64)
    enc = np.empty_like(d)
    enc[0] = d[0]
    enc[1:] = (d[1:] - d[:-1] + 128) & 0xFF
    comp = zlib.compress(enc.astype(np.uint8).tobytes())
    body = struct.pack("<Q", hdr_end + 8) \
        + struct.pack("<ii", 0, len(comp)) + comp
    out2 = bytearray(out[:hdr_end]) + body
    path2 = str(tmp_path / "z2.exr")
    open(path2, "wb").write(bytes(out2))
    back = image_mod.read_exr(path2)
    np.testing.assert_array_equal(back, img)


def test_env_map_wiring(tmp_path):
    """myscene.build(env_map_path=...) feeds the lat-long texture into the
    sky sampler (MyScene.ixx:95 environment map)."""
    img = np.zeros((8, 16, 3), np.float32)
    img[:4] = (0.0, 0.0, 5.0)   # top half blue-ish
    img[4:] = (5.0, 0.0, 0.0)   # bottom half red-ish
    path = str(tmp_path / "env.exr")
    image_mod.write_exr(path, img)
    host = myscene.build(oscillator_grid=1, env_map_path=path)
    assert host.scene.env.texture is not None
    up = sky.environment_color(host.scene.env,
                               jnp.asarray([[0.0, 1.0, 0.0]]))
    down = sky.environment_color(host.scene.env,
                                 jnp.asarray([[0.0, -1.0, 0.0]]))
    assert float(up[0, 2]) > 1.0 and float(up[0, 0]) < 1e-3
    assert float(down[0, 0]) > 1.0 and float(down[0, 2]) < 1e-3
    # Quarter-res mip built at load (post.generate_mips, the
    # MipmapGeneration.hlsl role) and served to wide-footprint callers.
    assert host.scene.env.texture_low is not None
    assert host.scene.env.texture_low.shape == (2, 4, 3)
    up_w = sky.environment_color(host.scene.env,
                                 jnp.asarray([[0.0, 1.0, 0.0]]), wide=True)
    # The test map is constant per hemisphere: mip == full at the pole.
    np.testing.assert_allclose(np.asarray(up_w), np.asarray(up), atol=1e-5)


def test_st2084_tonemap():
    nits = jnp.asarray([0.0, 100.0, 1000.0, 10000.0])
    sig = post.st2084_encode(nits)
    s = np.asarray(sig)
    assert (np.diff(s) > 0).all() and s[0] < 1e-5  # PQ(0) = c1^m2 ~ 7e-7
    np.testing.assert_allclose(s[-1], 1.0, atol=1e-5)
    # 100 nits -> ~0.508 (the well-known PQ anchor).
    np.testing.assert_allclose(s[1], 0.5081, atol=2e-3)
    img = jnp.asarray(_rand_img(4, 4))
    out = post.tonemap(img, hdr=True, paper_white_nits=200.0)
    o = np.asarray(out)
    assert o.shape == img.shape and (o >= 0).all() and (o <= 1).all()
    # Rec.2020 rotation preserves white (rows sum to 1).
    rows = np.asarray(post.REC709_TO_REC2020)
    np.testing.assert_allclose(rows.sum(axis=1), 1.0, atol=1e-4)


def test_thin_lens_focus_plane():
    """Thin-lens rays from every aperture point re-converge at the focal
    plane (Camera.hlsli:43-54); aperture 0 degenerates to the pinhole."""
    cam = camera_mod.make_camera((0.0, 0.0, -10.0), (0.0, 0.0, 1.0),
                                 horizontal_fov_deg=60.0, aspect=1.0,
                                 aperture_radius=0.2, focus_distance=10.0)
    n = 64
    ndc = jnp.zeros((n, 2))
    u2 = jnp.stack([jnp.linspace(0.01, 0.99, n)] * 2, axis=-1)
    o, d, _, _ = camera_mod.generate_thin_lens_rays(cam, ndc, u2)
    # Rays differ in origin (aperture) but hit the ndc=0 focus point.
    assert float(jnp.std(o[:, 0])) > 1e-3
    t_plane = (0.0 - o[:, 2]) / d[:, 2]   # z=0 is the focus plane
    hit = o + d * t_plane[:, None]
    np.testing.assert_allclose(np.asarray(hit[:, :2]), 0.0, atol=1e-5)

    cam0 = camera_mod.make_camera((0.0, 0.0, -10.0), (0.0, 0.0, 1.0),
                                  horizontal_fov_deg=60.0, aspect=1.0,
                                  focus_distance=10.0)
    o0, d0, _, _ = camera_mod.generate_pinhole_rays(cam0, ndc)
    op, dp, _, _ = camera_mod.generate_thin_lens_rays(
        cam0, ndc, jnp.full((n, 2), 0.5))
    np.testing.assert_allclose(np.asarray(dp), np.asarray(
        jnp.broadcast_to(d0, dp.shape)), atol=1e-6)


def test_pack2f16_roundtrip():
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randn(1000).astype(np.float32) * 50)
    b = jnp.asarray(np.abs(rng.randn(1000).astype(np.float32)) * 1e3)
    x = m.pack2f16(a, b)
    a2, b2 = m.unpack2f16(x)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(a), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(b2), np.asarray(b), rtol=1e-3)
    n = m.normalize(jnp.asarray(rng.randn(500, 3), jnp.float32))
    n2 = m.unpack_oct16(m.pack_oct16(n))
    dots = np.asarray(m.dot(n, n2))
    assert dots.min() > 0.9999


def test_transmission_map_sampling():
    """transmission_map scales the material's transmission (EvaluateMaterial
    Transmission slot, ShadingHelpers.hlsli:161-235) — through the packed
    texture-set path (models/texpack.py)."""
    from drts_tpu.models import texpack
    atlas = np.full((1, 4, 4, 4), 0.25, np.float32)
    mats = pack_materials([
        MaterialDesc(base_color=(1, 1, 1, 1), transmission=0.8,
                     transmission_map=0),
        MaterialDesc(base_color=(1, 1, 1, 1), transmission=0.8),
    ])
    packed, mats = texpack.build(atlas, mats, size=4)
    idx = jnp.asarray([0, 1])
    mat = mats.gather(idx)
    uv = jnp.full((2, 2), 0.5)
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (2, 1))
    t = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (2, 1))
    ev = shading.evaluate_material(mat, uv, n, t, packed)
    np.testing.assert_allclose(float(ev.transmission[0]), 0.8 * 0.25,
                               atol=1.0 / 255.0)
    np.testing.assert_allclose(float(ev.transmission[1]), 0.8, rtol=1e-5)


def test_packed_texture_half_mip():
    """Deep-bounce ("nearest") fetches read the half-res mip: each mip
    texel is the area average of its 2x2 full-res block
    (MipmapGeneration.hlsl role); "nearest0" (alpha test) stays level 0."""
    from drts_tpu.models import texpack
    rng = np.random.RandomState(7)
    s = 16
    atlas = rng.random_sample((1, s, s, 4)).astype(np.float32)
    mats = pack_materials([
        MaterialDesc(base_color=(1, 1, 1, 1), base_color_map=0)])
    packed, pmats = texpack.build(atlas, mats, size=s)
    assert packed.half_size == s // 2
    assert packed.rows_half.shape == ((s // 2) ** 2, packed.rows.shape[1])

    # Texel centers of the mip: nearest fetch == 2x2 block average.
    hs = s // 2
    uv = jnp.asarray([[(i + 0.5) / hs, (j + 0.5) / hs]
                      for j in range(hs) for i in range(hs)], jnp.float32)
    idx = jnp.zeros((uv.shape[0],), jnp.int32)
    ts = shading.sample_packed(packed, idx, uv, "nearest")
    want = atlas[0, :, :, :3].reshape(hs, 2, hs, 2, 3).mean(axis=(1, 3))
    np.testing.assert_allclose(np.asarray(ts.base_rgb).reshape(hs, hs, 3),
                               want, atol=0.02)
    # nearest0 pins full res: texel (0,0) exact.
    uv0 = jnp.asarray([[0.5 / s, 0.5 / s]], jnp.float32)
    ts0 = shading.sample_packed(packed, jnp.zeros((1,), jnp.int32), uv0,
                                "nearest0")
    np.testing.assert_allclose(np.asarray(ts0.base_rgb)[0],
                               atlas[0, 0, 0, :3], atol=0.02)


def test_packed_texture_set_matches_float_atlas():
    """The quad-duplicated one-gather path reproduces the float-atlas
    bilinear sample to u8 precision for every channel, including sqrt-coded
    color and the normal perturbation slot."""
    from drts_tpu.models import texpack
    rng = np.random.RandomState(3)
    s = 16
    atlas = rng.random_sample((5, s, s, 4)).astype(np.float32)
    mats = pack_materials([
        MaterialDesc(base_color=(1, 1, 1, 1), metallic=1.0, roughness=1.0,
                     transmission=1.0, emissive_strength=1.0,
                     emissive_color=(1, 1, 1),
                     base_color_map=0, normal_map=1, metallic_map=2,
                     roughness_map=3, emissive_color_map=4,
                     transmission_map=2),
    ])
    packed, pmats = texpack.build(atlas, mats, size=s)
    assert packed.n_words == 3

    n_pts = 257
    uv = jnp.asarray(rng.random_sample((n_pts, 2)).astype(np.float32))
    idx = jnp.zeros((n_pts,), jnp.int32)
    mat = pmats.gather(idx)
    nrm = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_pts, 1))
    tan = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (n_pts, 1))
    ev = shading.evaluate_material(mat, uv, nrm, tan, packed)

    raw = mats.gather(jnp.zeros((n_pts,), jnp.int32))
    bc = shading.sample_atlas(jnp.asarray(atlas), raw.base_color_map, uv)
    mtl = shading.sample_atlas(jnp.asarray(atlas), raw.metallic_map, uv)
    rgh = shading.sample_atlas(jnp.asarray(atlas), raw.roughness_map, uv)
    # sqrt-coding quantizes before the lerp; tolerance covers u8 rounding
    # of each tap (< 1/255 in sqrt space -> < ~2/255 after squaring).
    np.testing.assert_allclose(np.asarray(ev.base_color),
                               np.asarray(bc[..., :3]), atol=0.02)
    np.testing.assert_allclose(np.asarray(ev.alpha),
                               np.asarray(bc[..., 3]), atol=0.01)
    np.testing.assert_allclose(np.asarray(ev.metallic),
                               np.asarray(mtl[..., 0]), atol=0.01)
    np.testing.assert_allclose(np.asarray(ev.roughness),
                               np.asarray(rgh[..., 0]), atol=0.01)
