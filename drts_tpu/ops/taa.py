"""Temporal anti-aliasing upscaler — the DLSS / XeSS super-resolution
stand-in.

TPU-native replacement for the Streamline/XeSS vendor integrations
(SURVEY.md §2.3: /root/reference/Source/Streamline.ixx, Source/XeSS.ixx,
wired at App.cpp:1644-1708): jittered low-res rendering accumulated into a
full-res history with motion-vector reprojection, Catmull-Rom history
resampling, and neighborhood variance clipping — the classical TAA-upscale
core those libraries refine. Same contract: render size < output size,
quality-mode scale factors match the reference's table
(App.cpp SetSuperResolutionOptions:1374-1451).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
from flax import struct

from ..utils import math as m
from . import post

# DLSS/XeSS-style quality-mode render-scale table.
SCALE_FACTORS = {
    "Native": 1.0,
    "Quality": 1.5,
    "Balanced": 1.72,
    "Performance": 2.0,
    "UltraPerformance": 3.0,
    "Auto": 2.0,
}


def render_size_for(output_w: int, output_h: int, mode: str):
    s = SCALE_FACTORS[mode]
    return max(16, int(round(output_w / s))), max(16, int(round(output_h / s)))


@dataclasses.dataclass(frozen=True)
class TAAConfig:
    blend_alpha: float = 0.1
    clip_gamma: float = 1.0      # variance-clip box size in std-devs
    # Motion-adaptive clip: gamma blends toward this value as per-pixel
    # motion reaches ~1 output pixel/frame. ab_motion (r4 stage 6)
    # measured a globally tight clip (0.5) winning under motion
    # (orbit min 0.936 -> 0.949) but LOSING statically (first-frame
    # 0.9816 -> 0.9733) — the adaptive form applies each where it wins.
    # < 0 disables (gamma stays clip_gamma everywhere).
    clip_gamma_motion: float = -1.0
    # Motion magnitude (output px/frame) at which the adaptive gamma
    # saturates to clip_gamma_motion. Stage-7 measured adapt@1.0px min
    # 0.948 vs global-tight 0.9518: slow-moving pixels (<1px/frame) kept
    # the loose box during the orbit — saturate faster.
    clip_motion_px: float = 1.0
    # History resample: "catmull" = 16 random row-reads/pixel (sharpest),
    # "bilinear" = 4. Random HBM reads dominate this pass on TPU.
    history_filter: str = "bilinear"
    # Jitter-aware sample accumulation (the DLSS-style reconstruction):
    # the current frame is resampled at its TRUE sub-pixel sample positions
    # (grid shifted by the camera jitter) and each output pixel's blend
    # weight scales with its distance to the nearest real sample, so the
    # Halton jitter sequence adds sub-pixel detail instead of shimmer.
    jitter_aware: bool = True
    jitter_sigma: float = 0.45   # reconstruction kernel width (render px)


@struct.dataclass
class TAAState:
    history: jnp.ndarray         # (OH, OW, 3) output-res accumulated color
    # (OH, OW, 2) f16-pair mirror [r|g, b|-]: the bilinear history fetch is
    # random-access-bandwidth-bound (~2.8 GB/s effective on TPU), so the
    # default path gathers 8-byte rows instead of 12 — NRD/DLSS likewise
    # keep history in fp16.
    packed: jnp.ndarray


def _pack_rgb16(img):
    return jnp.stack(
        [m.pack2f16(img[..., 0], img[..., 1]),
         m.pack2f16(img[..., 2], jnp.zeros_like(img[..., 2]))], axis=-1)


def _unpack_rgb16(p):
    r, g = m.unpack2f16(p[..., 0])
    b, _ = m.unpack2f16(p[..., 1])
    return jnp.stack([r, g, b], axis=-1)


def init_state(out_height: int, out_width: int) -> TAAState:
    zero = jnp.zeros((out_height, out_width, 3), jnp.float32)
    return TAAState(history=zero, packed=_pack_rgb16(zero))


def _catmull_rom_sample(img, y, x):
    """9-tap bicubic Catmull-Rom history resample (the filter DLSS-class
    TAA uses to avoid history blur)."""
    h, w = img.shape[0], img.shape[1]
    # Index convention: callers pass pixel-INDEX coordinates (centers at
    # integers, py + motion), so the integer base is floor(y) and f = 0 at
    # exact pixels — the filter must be the identity there. (The previous
    # half-texel-center form blurred even static history: identity error
    # 0.67, measured.)
    yc = jnp.floor(y)
    xc = jnp.floor(x)
    fy = y - yc
    fx = x - xc

    def weights(f):
        f2 = f * f
        f3 = f2 * f
        w0 = -0.5 * f3 + f2 - 0.5 * f
        w1 = 1.5 * f3 - 2.5 * f2 + 1.0
        w2 = -1.5 * f3 + 2.0 * f2 + 0.5 * f
        w3 = 0.5 * f3 - 0.5 * f2
        return w0, w1, w2, w3

    wy = weights(fy)
    wx = weights(fx)
    flat = img.reshape(-1, img.shape[-1])  # single-axis gathers (faster)
    acc = jnp.zeros(y.shape + (img.shape[-1],), img.dtype)
    for iy in range(4):
        yi = jnp.clip((yc + iy - 1).astype(jnp.int32), 0, h - 1)
        row = jnp.zeros_like(acc)
        for ix in range(4):
            xi = jnp.clip((xc + ix - 1).astype(jnp.int32), 0, w - 1)
            row = row + flat[yi * w + xi] * wx[ix][..., None]
        acc = acc + row * wy[iy][..., None]
    return jnp.maximum(acc, 0.0)


def _bilinear_history(packed, y, x):
    """Bilinear history resample from the f16-packed mirror (8 B rows):
    4 taps from a 16 MB source. The small source stays inside XLA's
    scoped gather memory, where these fetches run ~5x faster — a wider
    quad-packed single-gather variant was tried and measured neutral
    (gather cost scales with bytes), while quadrupling the source's
    scoped-memory footprint."""
    h, w = packed.shape[0], packed.shape[1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = (y - y0)[..., None]
    fx = (x - x0)[..., None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    flat = packed.reshape(-1, 2)
    c00 = _unpack_rgb16(flat[y0i * w + x0i])
    c01 = _unpack_rgb16(flat[y0i * w + x1i])
    c10 = _unpack_rgb16(flat[y1i * w + x0i])
    c11 = _unpack_rgb16(flat[y1i * w + x1i])
    return (c00 * (1 - fx) + c01 * fx) * (1 - fy) \
        + (c10 * (1 - fx) + c11 * fx) * fy


def _separable_bilinear(img, y, x):
    """Bilinear resample on a SEPARABLE coordinate grid (per-axis 1-D
    coords): two single-axis takes — contiguous row reads XLA handles
    cheaply — instead of 4 flat 2-D gathers (~15 ms/frame at 1080p). Valid
    whenever the sample positions are an axis-aligned affine map of the
    output grid (uniform scale + global jitter shift), which is exactly
    the current-frame resample's case."""
    h, w = img.shape[0], img.shape[1]
    y0 = jnp.floor(y)
    fy = (y - y0)[:, None, None]
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    rows = img[y0i] * (1.0 - fy) + img[y1i] * fy
    x0 = jnp.floor(x)
    fx = (x - x0)[None, :, None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
    x1i = jnp.clip(x0i + 1, 0, w - 1)
    return rows[:, x0i] * (1.0 - fx) + rows[:, x1i] * fx


def upscale(state: TAAState, color, motion, jitter, out_h: int, out_w: int,
            reset, cfg: TAAConfig = TAAConfig(), confidence=None):
    """One TAA-upscale step.

    color: (RH, RW, 3) jittered render-res frame; motion: (RH, RW, 2)
    render-res pixel motion (prev = cur + motion); jitter: (2,) the pixel
    jitter (x, y) in render-pixel fractions (Math::CalculateUV convention);
    reset: scalar bool. ``confidence`` (RH, RW) in [0, 1], optional: the
    joint denoise+upscale coupling (DLSS-RR analogue, App.cpp:1654-1671) —
    low confidence (young denoiser history / disocclusion) raises the blend
    toward the current frame so the upscaler doesn't ghost stale shading.
    Returns (new_state, output (OH, OW, 3)).
    """
    rh, rw = color.shape[0], color.shape[1]
    scale_y = out_h / rh
    scale_x = out_w / rw

    if cfg.jitter_aware:
        # Resample the jittered sample grid at output-pixel centers: render
        # sample i sits at index i + jitter, so interpolating that grid at
        # render-space position q reads the source at q - jitter.
        qy = (jnp.arange(out_h, dtype=jnp.float32) + 0.5) / scale_y - 0.5
        qx = (jnp.arange(out_w, dtype=jnp.float32) + 0.5) / scale_x - 0.5
        sy = qy - jitter[1]                    # (OH,)
        sx = qx - jitter[0]                    # (OW,)
        up = _separable_bilinear(color, sy, sx)
        # Distance from each output pixel to the nearest true sample, per
        # axis, in render pixels -> reconstruction confidence.
        dy = sy - jnp.round(sy)
        dx = sx - jnp.round(sx)
        d2 = (dy * dy)[:, None] + (dx * dx)[None, :]
        sample_w = jnp.exp(-d2 / (2.0 * cfg.jitter_sigma ** 2))
    else:
        # Jitter-blind upsample (the pre-reconstruction fallback).
        up = post.resize_bilinear(color, out_h, out_w)
        sample_w = jnp.ones((out_h, out_w), jnp.float32)

    # Motion at output res, in output pixels.
    motion_up = post.resize_bilinear(motion, out_h, out_w) \
        * jnp.array([scale_x, scale_y])
    py = jnp.arange(out_h, dtype=jnp.float32)[:, None] \
        * jnp.ones((1, out_w), jnp.float32)
    px = jnp.arange(out_w, dtype=jnp.float32)[None, :] \
        * jnp.ones((out_h, 1), jnp.float32)
    from . import intersect
    window_ok = None
    if intersect.pallas_enabled() and cfg.history_filter != "catmull":
        # Tile-windowed Pallas reprojection (ops/reproject_pallas.py) on
        # the full-f32 history — bilinear weights cannot act on packed
        # f16 bits, and the kernel streams its window anyway.
        from . import reproject_pallas as rp
        hist, window_ok = rp.reproject_packed(
            state.history, motion_up, "bilinear",
            interpret=(intersect.BACKEND == "interpret"))
    elif cfg.history_filter == "catmull":
        hist = _catmull_rom_sample(state.history, py + motion_up[..., 1],
                                   px + motion_up[..., 0])
    else:
        hist = _bilinear_history(state.packed, py + motion_up[..., 1],
                                 px + motion_up[..., 0])

    # Neighborhood variance clipping in the current frame (render res
    # neighborhood, evaluated at output res via the upsampled image).
    m1 = jnp.zeros_like(up)
    m2 = jnp.zeros_like(up)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ys = jnp.clip(jnp.arange(out_h) + dy, 0, out_h - 1)
            xs = jnp.clip(jnp.arange(out_w) + dx, 0, out_w - 1)
            s = up[ys][:, xs]
            m1 = m1 + s
            m2 = m2 + s * s
    mean = m1 / 9.0
    var = jnp.maximum(m2 / 9.0 - mean * mean, 0.0)
    gamma = jnp.float32(cfg.clip_gamma)
    if cfg.clip_gamma_motion >= 0.0:
        # Tighten the clip only where the pixel actually moves (saturating
        # at one output pixel/frame); static regions keep the loose box
        # that lets history converge past the 1spp noise floor.
        mlen = jnp.sqrt(motion_up[..., 0] ** 2 + motion_up[..., 1] ** 2)
        f = jnp.clip(mlen / cfg.clip_motion_px, 0.0, 1.0)[..., None]
        gamma = cfg.clip_gamma + (cfg.clip_gamma_motion - cfg.clip_gamma) * f
    sigma = jnp.sqrt(var) * gamma
    hist_clipped = jnp.clip(hist, mean - sigma, mean + sigma)

    in_bounds = (((py + motion_up[..., 1]) >= 0)
                 & ((py + motion_up[..., 1]) <= out_h - 1)
                 & ((px + motion_up[..., 0]) >= 0)
                 & ((px + motion_up[..., 0]) <= out_w - 1))
    if window_ok is not None:
        # Residuals outside the reprojection kernel's tap window refresh
        # from the current frame (same policy as out-of-bounds).
        in_bounds = in_bounds & window_ok
    alpha = cfg.blend_alpha * (0.25 + 0.75 * sample_w)
    if confidence is not None:
        conf_up = post.resize_bilinear(confidence[..., None], out_h,
                                       out_w)[..., 0]
        alpha = jnp.clip(alpha * (1.0 + 3.0 * (1.0 - conf_up)), 0.0, 1.0)
    alpha = jnp.where(in_bounds & ~reset, alpha, 1.0)[..., None]
    out = m.lerp(hist_clipped, up, alpha)
    return TAAState(history=out, packed=_pack_rgb16(out)), out
