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


MODE_SEEK_ITERS = 3
MODE_SEEK_SIGMA = 4.0


def _window_origin(sel, prev_y, prev_x, ty, tx, base_y, base_x,
                   h_pad: int, w_pad: int):
    """Window origin from the dominant displacement MODE of the `sel`
    lanes: the mean, then a few soft mean-shift iterations
    (exp(-d^2/2sigma^2) weights). A plain mean lands BETWEEN clusters
    when a tile splits into two comparable motion groups (a foreground
    edge crossing the tile) and then fits neither; the mode locks onto
    the heavier cluster so the second window can take the other."""
    dy = prev_y - ty - base_y
    dx = prev_x - tx - base_x
    self_w = sel.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(self_w), 1.0)
    cy = jnp.sum(jnp.where(sel, dy, 0.0)) / cnt
    cx = jnp.sum(jnp.where(sel, dx, 0.0)) / cnt
    inv2s2 = 1.0 / (2.0 * MODE_SEEK_SIGMA * MODE_SEEK_SIGMA)
    for _ in range(MODE_SEEK_ITERS):
        d2 = (dy - cy) ** 2 + (dx - cx) ** 2
        wgt = self_w * jnp.exp(-d2 * inv2s2)
        tot = jnp.maximum(jnp.sum(wgt), 1e-6)
        cy = jnp.sum(wgt * dy) / tot
        cx = jnp.sum(wgt * dx) / tot
    oy = jnp.clip(base_y + jnp.round(cy).astype(jnp.int32) - MARGIN_Y,
                  0, h_pad - WIN_H)
    ox = jnp.clip(base_x + jnp.round(cx).astype(jnp.int32) - MARGIN_X,
                  0, w_pad - WIN_W)
    return oy, ox


def _taps(prev_y, prev_x, oy, ox, ty, tx, valid, filter_mode: str):
    """Residual-tap weights + in-window mask for a window at (oy, ox)."""
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
        # Box weights (nearest): the single closest source pixel. The
        # interval MUST be half-open — a closed |r-d| <= 0.5 test fires
        # TWO taps at a residual of exactly .5, and summing two f16-packed
        # bit rows fabricates garbage (incl. NaN exponents) on lanes whose
        # ok stays True; an open test on both sides fires NONE (silent
        # zero rows). One tap fires for every in-window residual.
        wys = [((ry - dy >= -0.5) & (ry - dy < 0.5)).astype(jnp.float32)
               for dy in range(-r, r + 2)]
        wxs = [((rx - dx >= -0.5) & (rx - dx < 0.5)).astype(jnp.float32)
               for dx in range(-r, r + 2)]
    ok = (ry >= -r) & (ry <= r) & (rx >= -r) & (rx <= r) & valid
    return wys, wxs, ok


def _accumulate(wc, wys, wxs):
    r = RADIUS
    acc = jnp.zeros((TILE_H, TILE_W), jnp.float32)
    for iy, dy in enumerate(range(-r, r + 2)):
        row_w = wys[iy]
        y0 = MARGIN_Y + dy
        for ix, dx in enumerate(range(-r, r + 2)):
            x0 = MARGIN_X + dx
            s = wc[y0:y0 + TILE_H, x0:x0 + TILE_W]
            acc = acc + (row_w * wxs[ix]) * s
    return acc


def _kernel(py_ref, px_ref, src_ref, out_ref, ok_ref, win, sem, win2, sem2,
            *, n_channels: int, h_pad: int, w_pad: int, filter_mode: str,
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
    oy, ox = _window_origin(valid, prev_y, prev_x, ty, tx, base_y, base_x,
                            h_pad, w_pad)

    def fetch(oy, ox, w_scr, w_sem):
        """Start the window fetch; returns (dma|None, sy, sx)."""
        if use_dma:
            # Mosaic proves DMA offsets divisible by the (sublane, lane)
            # tiling only when they are constructed aligned; fetch the
            # window at the aligned origin and roll the intra-tile shift
            # (sy, sx) away afterwards so every tap read stays static.
            oy_al = pl.multiple_of((oy // ALIGN_Y) * ALIGN_Y, ALIGN_Y)
            ox_al = pl.multiple_of((ox // ALIGN_X) * ALIGN_X, ALIGN_X)
            dma = pltpu.make_async_copy(
                src_ref.at[:, pl.ds(oy_al, WIN_H), pl.ds(ox_al, WIN_W)],
                w_scr, w_sem)
            dma.start()
            return dma, oy - oy_al, ox - ox_al
        # Interpret mode: plain windowed read at the exact origin (the
        # interpreter's DMA semaphores hang under
        # xla_force_host_platform_device_count) — sy = sx = 0.
        w_scr[:, :, :] = src_ref[:, pl.ds(oy, WIN_H), pl.ds(ox, WIN_W)]
        return None, jnp.int32(0), jnp.int32(0)

    def channel(w_scr, sy, sx, c):
        """Alignment-rolled channel c of a fetched window."""
        wc = w_scr[c, :, :]
        if use_dma:
            # Undo the DMA alignment: rolled[m, n] = win[m + sy, n + sx],
            # so index m maps back to source row oy + m (exact origin).
            # Taps read rows [MARGIN_Y-R, MARGIN_Y+TILE_H+R] < WIN_H -
            # ALIGN_Y and cols < WIN_W - ALIGN_X, so wrapped lanes are
            # never read.
            wc = pltpu.roll(pltpu.roll(wc, (WIN_H - sy) % WIN_H, 0),
                            (WIN_W - sx) % WIN_W, 1)
        return wc

    dma, sy, sx = fetch(oy, ox, win, sem)
    wys, wxs, ok = _taps(prev_y, prev_x, oy, ox, ty, tx, valid, filter_mode)
    ok_ref[:, :] = ok.astype(jnp.int32)

    if use_dma:
        dma.wait()
    for c in range(n_channels):
        out_ref[c, :, :] = _accumulate(channel(win, sy, sx, c), wys, wxs)

    # Second window for residual outliers: lanes whose motion is far from
    # the tile mean (foreground parallax against a dominant background —
    # the orbiting-camera case). Centered on the OUTLIER mean, it resolves
    # the secondary motion cluster with the same exact taps; only tiles
    # that have outliers pay for it.
    fail = valid & ~ok
    nfail = jnp.sum(fail.astype(jnp.int32))

    @pl.when(nfail > 0)
    def _second_window():
        oy2, ox2 = _window_origin(fail, prev_y, prev_x, ty, tx,
                                  base_y, base_x, h_pad, w_pad)
        dma2, sy2, sx2 = fetch(oy2, ox2, win2, sem2)
        wys2, wxs2, ok2 = _taps(prev_y, prev_x, oy2, ox2, ty, tx, valid,
                                filter_mode)
        ok_ref[:, :] = (ok | ok2).astype(jnp.int32)
        if use_dma:
            dma2.wait()
        for c in range(n_channels):
            acc2 = _accumulate(channel(win2, sy2, sx2, c), wys2, wxs2)
            out_ref[c, :, :] = jnp.where(ok, out_ref[c, :, :], acc2)


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


# Source aprons, sized so the window-origin clip NEVER binds: cluster
# means range over dy in [PAD - (base + TILE - 1), h - 1 + PAD - base]
# (coords are edge-clamped before the kernel), so
#   oy_min = PAD - TILE + 1 - MARGIN  >= 0   =>  PAD >= TILE + MARGIN - 1
#   oy_max + WIN <= h_pad             =>  bottom >= TILE + MARGIN + ALIGN - 1
# An undersized apron silently clipped the SECOND window for
# bottom-tile outlier clusters (residual 9+ px -> spurious disocclusion).
PAD_Y = TILE_H + MARGIN_Y               # 24
PAD_X = TILE_W + MARGIN_X               # 448
BOT_PAD_Y = TILE_H + MARGIN_Y + ALIGN_Y     # 32
BOT_PAD_X = TILE_W + MARGIN_X + ALIGN_X     # 576


def _pad_grid(img_hw, fill):
    """Pad an (H, W) coord array up to tile multiples (grid dims)."""
    h, w = img_hw.shape
    ph = (-h) % TILE_H
    pw = (-w) % TILE_W
    if ph == 0 and pw == 0:
        return img_hw
    return jnp.pad(img_hw, ((0, ph), (0, pw)), constant_values=fill)


def reproject_packed(packed_hwc, motion, filter_mode: str = "bilinear",
                     interpret: bool = False, exact_fallback: bool = False,
                     fallback_fraction: int = 64):
    """Drop-in for the gather-based `_reproject`: packed (H, W, C) source
    sampled at pixel + motion. Returns (prev (H, W, C), in_bounds (H, W)).

    Motion discontinuities (foreground parallax far from the tile-mean
    window — the orbiting-camera case, where without recovery every
    near-object pixel is disoccluded every frame and temporal passes
    never accumulate: measured orbit-min SSIM 0.55 vs 0.94 exact) are
    recovered in two tiers:
      1. the kernel's per-tile SECOND window, centered on the outlier
         mean — dense taps, only outlier tiles pay (see _kernel);
      2. optionally (`exact_fallback`) a compacted per-pixel gather over
         whatever still misses, restoring exact gather-path semantics.
    The fallback is OFF by default: its dense compaction machinery costs
    ~14 ms per call at 1080p on TPU v5e even when the recovered set is
    empty (cumsum + full-frame index scatter + capacity-sized gathers),
    while the lanes it would save — residuals that fit neither the tile
    mean nor the outlier-cluster window — are incoherent-motion lanes
    whose history reuse is dubious anyway; callers treat their ok=False
    as disocclusion, exactly like screen-edge lanes."""
    h, w = packed_hwc.shape[:2]
    py = jnp.arange(h, dtype=jnp.float32)[:, None] + motion[..., 1]
    px = jnp.arange(w, dtype=jnp.float32)[None, :] + motion[..., 0]
    in_bounds = (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1)

    # Right/bottom aprons additionally cover the grid-padding slack: the
    # last tile's window centers on lanes that may sit up to a tile short
    # of the grid edge.
    src = jnp.pad(jnp.moveaxis(packed_hwc, -1, 0),
                  ((0, 0),
                   (PAD_Y, BOT_PAD_Y + ((-h) % TILE_H)),
                   (PAD_X, BOT_PAD_X + ((-w) % TILE_W))), mode="edge")
    pyp = _pad_grid(jnp.clip(py, 0, h - 1) + PAD_Y, fill=-1e9)
    pxp = _pad_grid(jnp.clip(px, 0, w - 1) + PAD_X, fill=-1e9)
    out, ok = reproject_window(src, pyp, pxp, filter_mode, interpret)
    out = jnp.moveaxis(out, 0, -1)[:h, :w]
    ok = ok[:h, :w]
    if exact_fallback:
        out, ok = _gather_fallback(packed_hwc, out, ok, in_bounds, py, px,
                                   filter_mode, fallback_fraction)
    return out, in_bounds & ok


def _gather_fallback(packed, out, ok, in_bounds, py, px, filter_mode: str,
                     fraction: int):
    """Exact resample of the kernel's residual-outlier lanes: compact the
    failing pixel ids (cumsum + unique permuting store, the
    pathtrace._compact_slots recipe), gather their history rows, scatter
    the values back. Cost scales with the outlier count (bounded by
    H*W/fraction rows), not the frame."""
    h, w, c = packed.shape
    n = h * w
    cap = max(128, n // fraction)
    fail = (in_bounds & ~ok).reshape(n)
    pos = jnp.cumsum(fail.astype(jnp.int32)) - 1
    keep = fail & (pos < cap)
    slot_of = jnp.where(keep, pos, cap)
    lin = jnp.full((cap,), n, jnp.int32).at[slot_of].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True)
    live = lin < n
    lin_c = jnp.where(live, lin, 0)
    pyf = py.reshape(n)[lin_c]
    pxf = px.reshape(n)[lin_c]
    flat = packed.reshape(n, c)
    if filter_mode == "nearest":
        # Bit-exact row copy — matches denoise._reproject nearest.
        yi = jnp.clip(jnp.round(pyf).astype(jnp.int32), 0, h - 1)
        xi = jnp.clip(jnp.round(pxf).astype(jnp.int32), 0, w - 1)
        val = flat[yi * w + xi]
    else:
        # Clamp-addressed bilinear — matches denoise._bilinear_sample.
        y0 = jnp.floor(pyf)
        x0 = jnp.floor(pxf)
        fy = (pyf - y0)[:, None]
        fx = (pxf - x0)[:, None]
        y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
        y1i = jnp.clip(y0i + 1, 0, h - 1)
        x0i = jnp.clip(x0.astype(jnp.int32), 0, w - 1)
        x1i = jnp.clip(x0i + 1, 0, w - 1)
        val = ((flat[y0i * w + x0i] * (1 - fx) + flat[y0i * w + x1i] * fx)
               * (1 - fy)
               + (flat[y1i * w + x0i] * (1 - fx) + flat[y1i * w + x1i] * fx)
               * fy)
    tgt = jnp.where(live, lin, n)
    out = out.reshape(n, c).at[tgt].set(val, mode="drop",
                                        unique_indices=True).reshape(h, w, c)
    ok = ok.reshape(n).at[tgt].set(True, mode="drop",
                                   unique_indices=True).reshape(h, w)
    return out, ok
