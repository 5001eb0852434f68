"""Pallas TPU kernel for motion-vector history reprojection.

Every temporal pass (TAA upscale, denoiser accumulation, ReSTIR temporal
reuse) resamples a history buffer at `current pixel + motion` — on GPUs a
texture fetch, on TPU a random row-gather that runs at ~1-3 GB/s effective
and dominated those passes (~67 ms/frame combined at 1080p in the round-3
profile: 4 TAA taps ~36 ms, ReSTIR ~21 ms, denoiser ~10 ms).

This kernel exploits what those gathers ignore: the motion field is
smooth. Per output tile it
  1. computes the tile's MEAN source position (scalar reduction),
  2. DMAs one fixed-size source window centered there (dynamic offset,
     static shape) from HBM into VMEM,
  3. evaluates the resample as a short static loop of SHIFTED window
     reads weighted by a tent (bilinear) or box (nearest) kernel of each
     lane's residual — dense vector ops, no per-lane indexing.
Residuals beyond the loop radius R (motion discontinuities: object
silhouettes moving against the camera field) return ok=False, which
callers already treat as disocclusion — the same refresh they apply at
screen edges. Global motion of ANY magnitude is absorbed by the window
offset; only within-tile SPREAD is bounded.

Source layout is channel-first (C, H, W): a channel-last window would put
C in the 128-lane minor dimension at ~7% utilization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16
TILE_W = 384
MARGIN_Y = 8            # window rows above/below the tile
MARGIN_X = 64           # window cols left/right (lane-tile padding)
RADIUS = 3              # max |residual| after the mean offset, in pixels
ALIGN_Y = 8             # Mosaic requires DMA offsets aligned to the
ALIGN_X = 128           # (sublane, lane) tiling; the window carries the
                        # alignment slack and two dynamic rolls undo it
WIN_H = TILE_H + 2 * MARGIN_Y + ALIGN_Y
WIN_W = TILE_W + 2 * MARGIN_X + ALIGN_X


def _kernel(py_ref, px_ref, src_ref, out_ref, ok_ref, win, sem, *,
            n_channels: int, h_pad: int, w_pad: int, filter_mode: str,
            use_dma: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)
    prev_y = py_ref[:, :]                        # (TH, TW) source coords
    prev_x = px_ref[:, :]

    # Mosaic only lowers integer iota; cast afterwards.
    ty = jax.lax.broadcasted_iota(jnp.int32, prev_y.shape, 0).astype(jnp.float32)
    tx = jax.lax.broadcasted_iota(jnp.int32, prev_x.shape, 1).astype(jnp.float32)

    # Tile-mean DISPLACEMENT -> window origin (robust to tiles where only
    # some lanes are valid, e.g. grid padding; sentinel coords < -1e8 mark
    # invalid lanes and are excluded from the mean).
    base_y = i * TILE_H
    base_x = j * TILE_W
    valid = prev_y > -1e8
    cnt = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    dy_mean = jnp.sum(jnp.where(valid, prev_y - ty, 0.0)) / cnt - base_y
    dx_mean = jnp.sum(jnp.where(valid, prev_x - tx, 0.0)) / cnt - base_x
    oy = jnp.clip(base_y + jnp.round(dy_mean).astype(jnp.int32) - MARGIN_Y,
                  0, h_pad - WIN_H)
    ox = jnp.clip(base_x + jnp.round(dx_mean).astype(jnp.int32) - MARGIN_X,
                  0, w_pad - WIN_W)

    if use_dma:
        # Mosaic proves DMA offsets divisible by the (sublane, lane)
        # tiling only when they are constructed aligned; fetch the window
        # at the aligned origin and roll the intra-tile shift (sy, sx)
        # away afterwards so every tap read stays static.
        oy_al = pl.multiple_of((oy // ALIGN_Y) * ALIGN_Y, ALIGN_Y)
        ox_al = pl.multiple_of((ox // ALIGN_X) * ALIGN_X, ALIGN_X)
        sy = oy - oy_al
        sx = ox - ox_al
        dma = pltpu.make_async_copy(
            src_ref.at[:, pl.ds(oy_al, WIN_H), pl.ds(ox_al, WIN_W)],
            win, sem)
        dma.start()
    else:
        # Interpret mode: plain windowed read at the exact origin (the
        # interpreter's DMA semaphores hang under
        # xla_force_host_platform_device_count) — sy = sx = 0.
        sy = jnp.int32(0)
        sx = jnp.int32(0)
        win[:, :, :] = src_ref[:, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)]

    # Per-lane residual vs its nominal window position.
    ry = prev_y - (oy.astype(jnp.float32) + MARGIN_Y + ty)
    rx = prev_x - (ox.astype(jnp.float32) + MARGIN_X + tx)

    r = RADIUS
    if filter_mode == "bilinear":
        # Tent weights: sum over taps == 1 exactly when |residual| <= R.
        wys = [jnp.maximum(0.0, 1.0 - jnp.abs(ry - dy))
               for dy in range(-r, r + 2)]
        wxs = [jnp.maximum(0.0, 1.0 - jnp.abs(rx - dx))
               for dx in range(-r, r + 2)]
    else:
        # Box weights (nearest): the single closest source pixel.
        wys = [(jnp.abs(ry - dy) <= 0.5).astype(jnp.float32)
               for dy in range(-r, r + 2)]
        wxs = [(jnp.abs(rx - dx) < 0.5).astype(jnp.float32)
               for dx in range(-r, r + 2)]

    ok = (ry >= -r) & (ry <= r) & (rx >= -r) & (rx <= r) & valid
    ok_ref[:, :] = ok.astype(jnp.int32)

    if use_dma:
        dma.wait()

    if use_dma:
        ry_shift = (WIN_H - sy) % WIN_H
        rx_shift = (WIN_W - sx) % WIN_W

    for c in range(n_channels):
        wc = win[c, :, :]
        if use_dma:
            # Undo the DMA alignment: rolled[m, n] = win[m + sy, n + sx],
            # so index m maps back to source row oy + m (exact origin).
            # Taps read rows [MARGIN_Y-R, MARGIN_Y+TILE_H+R] < WIN_H -
            # ALIGN_Y and cols < WIN_W - ALIGN_X, so wrapped lanes are
            # never read.
            wc = pltpu.roll(pltpu.roll(wc, ry_shift, 0), rx_shift, 1)
        acc = jnp.zeros(prev_y.shape, jnp.float32)
        for iy, dy in enumerate(range(-r, r + 2)):
            row_w = wys[iy]
            y0 = MARGIN_Y + dy
            for ix, dx in enumerate(range(-r, r + 2)):
                x0 = MARGIN_X + dx
                s = wc[y0:y0 + TILE_H, x0:x0 + TILE_W]
                acc = acc + (row_w * wxs[ix]) * s
        out_ref[c, :, :] = acc


@functools.partial(jax.jit, static_argnames=("filter_mode", "interpret"))
def reproject_window(src_chw, prev_y, prev_x, filter_mode: str = "bilinear",
                     interpret: bool = False):
    """Tile-windowed history resample.

    src_chw: (C, H, W) f32 source (pad H to TILE_H and W to TILE_W
    multiples before calling — use pad_for_reproject); prev_y/prev_x:
    (H, W) f32 absolute source coordinates per output pixel (sentinel
    <= -1e9 for lanes to skip). Returns (out (C, H, W), ok (H, W) bool);
    ok=False where the residual left the tap window (callers treat as
    disocclusion, exactly like their existing out-of-bounds test).
    """
    c, hs, ws = src_chw.shape
    h, w = prev_y.shape
    assert h % TILE_H == 0 and w % TILE_W == 0, (h, w)
    assert hs >= WIN_H and ws >= WIN_W, (hs, ws)
    grid = (h // TILE_H, w // TILE_W)

    out, ok = pl.pallas_call(
        functools.partial(_kernel, n_channels=c, h_pad=hs, w_pad=ws,
                          filter_mode=filter_mode, use_dma=not interpret),
        out_shape=(jax.ShapeDtypeStruct((c, h, w), jnp.float32),
                   jax.ShapeDtypeStruct((h, w), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),    # src stays in HBM
        ],
        out_specs=(
            pl.BlockSpec((c, TILE_H, TILE_W), lambda i, j: (0, i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_H, TILE_W), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, WIN_H, WIN_W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        cost_estimate=pl.CostEstimate(
            flops=(2 * r_taps() ** 2 * c + 8) * h * w,
            bytes_accessed=c * h * w * 4 * 3,
            transcendentals=0),
        interpret=interpret,
    )(prev_y, prev_x, src_chw)
    return out, ok > 0


def r_taps() -> int:
    return 2 * RADIUS + 2


# Source apron: the window-centering math needs room to hang half a
# window off the image edge (identity motion at the border is the common
# case). PAD_Y >= MARGIN_Y + (TILE_H-1)//2; PAD_X >= MARGIN_X + slack.
PAD_Y = MARGIN_Y + TILE_H // 2          # 16
PAD_X = MARGIN_X + TILE_W // 2          # 256


def _pad_grid(img_hw, fill):
    """Pad an (H, W) coord array up to tile multiples (grid dims)."""
    h, w = img_hw.shape
    ph = (-h) % TILE_H
    pw = (-w) % TILE_W
    if ph == 0 and pw == 0:
        return img_hw
    return jnp.pad(img_hw, ((0, ph), (0, pw)), constant_values=fill)


def reproject_packed(packed_hwc, motion, filter_mode: str = "bilinear",
                     interpret: bool = False):
    """Drop-in for the gather-based `_reproject`: packed (H, W, C) source
    sampled at pixel + motion. Returns (prev (H, W, C), in_bounds (H, W)).
    in_bounds additionally requires the residual to stay inside the tap
    window (treated as disocclusion by all callers)."""
    h, w = packed_hwc.shape[:2]
    py = jnp.arange(h, dtype=jnp.float32)[:, None] + motion[..., 1]
    px = jnp.arange(w, dtype=jnp.float32)[None, :] + motion[..., 0]
    in_bounds = (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)

    # Right/bottom aprons additionally cover the grid-padding slack: the
    # last tile's window centers on lanes that may sit up to a tile short
    # of the grid edge.
    src = jnp.pad(jnp.moveaxis(packed_hwc, -1, 0),
                  ((0, 0),
                   (PAD_Y, PAD_Y + ((-h) % TILE_H)),
                   (PAD_X, PAD_X + ((-w) % TILE_W))), mode="edge")
    pyp = _pad_grid(jnp.clip(py, 0, h - 1) + PAD_Y, fill=-1e9)
    pxp = _pad_grid(jnp.clip(px, 0, w - 1) + PAD_X, fill=-1e9)
    out, ok = reproject_window(src, pyp, pxp, filter_mode, interpret)
    out = jnp.moveaxis(out, 0, -1)[:h, :w]
    return out, in_bounds & ok[:h, :w]
