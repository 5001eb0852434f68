"""Fused Pallas TPU kernel for ReSTIR DI initial light-candidate RIS.

The reference evaluates all of DIInitialSampling's local-light candidates
in-register inside one shader (Shaders/DIInitialSampling.hlsl:6-58). The
XLA formulation in ops/restir.initial_sampling pays ~6 ms per candidate at
1080p: each round's light-row fetch + cone sampling + BSDF evaluation
materializes (H, W, 3) intermediates in HBM, and XLA neither keeps the
surface resident across rounds nor fuses the chain (measured r4:
prof_restir_init — base 9 ms, +19 first candidate, +3.8 each further,
candidate_batch via vmap SLOWER). This kernel is the TPU shape of the
in-register loop: one grid program streams a block of pixels' surface SoA
into VMEM once and runs ALL n_l candidate rounds there — slot select from
the prefetched ReGIR rows, light-row fetch as a one-hot MXU matmul against
the VMEM-resident compact light table, exact cone sampling, the full
three-lobe BSDF evaluation + mixture PDF (ports of ops/bxdf eval_split /
eval_pdf on planar components), the candidate MIS weight, and the
sequential reservoir update. Only the per-candidate uniforms (drawn outside
with the exact ops/utils/rng stream the XLA loop uses) and the packed
surface stream cross HBM.

Outputs carry the WINNING candidate's direction / distance / source object
id as well, so the caller's final visibility ray needs no re-fetch or
re-sampling (it replaces the trailing _target_pdf — another ~6 ms).

Sphere lights only (the demo scene's light type); scenes with triangle
lights fall back to the XLA path (restir.initial_sampling gates on
lights.has_triangles).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RESTIR_BLOCK = int(_os.environ.get("DRTS_RESTIR_BLOCK", "4096"))

PI = float(jnp.pi)
INV_PI = float(1.0 / jnp.pi)
TWO_PI = float(2.0 * jnp.pi)

# Surface stream row layout (build_surface_planar).
N_SURF_ROWS = 24
(ROW_PX, ROW_PY, ROW_PZ,
 ROW_NX, ROW_NY, ROW_NZ,          # shading normal
 ROW_GX, ROW_GY, ROW_GZ,          # front geometric normal
 ROW_VX, ROW_VY, ROW_VZ,          # view (toward camera)
 ROW_CR, ROW_CG, ROW_CB,          # base color
 ROW_METAL, ROW_ROUGH, ROW_IORI, ROW_IORO, ROW_TRANS,
 ROW_VALID,
 ROW_WD, ROW_WS, ROW_WT) = range(N_SURF_ROWS)


def _dot3(ax, ay, az, bx, by, bz):
    return ax * bx + ay * by + az * bz


def _normalize3(x, y, z):
    inv = jnp.reciprocal(jnp.maximum(
        jnp.sqrt(jnp.maximum(x * x + y * y + z * z, 0.0)), 1e-20))
    return x * inv, y * inv, z * inv


def _onb(nx, ny, nz):
    """Duff et al. branchless basis — exact port of m.orthonormal_basis."""
    s = jnp.where(nz >= 0, 1.0, -1.0)
    a = -1.0 / (s + nz)
    b = nx * ny * a
    tx = 1.0 + s * nx * nx * a
    ty = s * b
    tz = -s * nx
    bx = b
    by = s + ny * ny * a
    bz = -ny
    return tx, ty, tz, bx, by, bz


def _pow5(x):
    x = jnp.clip(x, 0.0, 1.0)
    x2 = x * x
    return x2 * x2 * x


def _kernel(surf_ref, uni_ref, slots_ref, tableT_ref, out_f_ref, out_i_ref,
            *, n_l: int, s: int, n_b: int, n_lights: int):
    px, py, pz = surf_ref[ROW_PX:ROW_PX + 1, :], \
        surf_ref[ROW_PY:ROW_PY + 1, :], surf_ref[ROW_PZ:ROW_PZ + 1, :]
    nx, ny, nz = surf_ref[ROW_NX:ROW_NX + 1, :], \
        surf_ref[ROW_NY:ROW_NY + 1, :], surf_ref[ROW_NZ:ROW_NZ + 1, :]
    gx, gy, gz = surf_ref[ROW_GX:ROW_GX + 1, :], \
        surf_ref[ROW_GY:ROW_GY + 1, :], surf_ref[ROW_GZ:ROW_GZ + 1, :]
    vx, vy, vz = surf_ref[ROW_VX:ROW_VX + 1, :], \
        surf_ref[ROW_VY:ROW_VY + 1, :], surf_ref[ROW_VZ:ROW_VZ + 1, :]
    cr, cg, cb = surf_ref[ROW_CR:ROW_CR + 1, :], \
        surf_ref[ROW_CG:ROW_CG + 1, :], surf_ref[ROW_CB:ROW_CB + 1, :]
    metal = surf_ref[ROW_METAL:ROW_METAL + 1, :]
    rough = surf_ref[ROW_ROUGH:ROW_ROUGH + 1, :]
    ior_i = surf_ref[ROW_IORI:ROW_IORI + 1, :]
    ior_o = surf_ref[ROW_IORO:ROW_IORO + 1, :]
    trans = surf_ref[ROW_TRANS:ROW_TRANS + 1, :]
    valid = surf_ref[ROW_VALID:ROW_VALID + 1, :] > 0.5
    wd = surf_ref[ROW_WD:ROW_WD + 1, :]
    ws = surf_ref[ROW_WS:ROW_WS + 1, :]
    wt = surf_ref[ROW_WT:ROW_WT + 1, :]

    shape = px.shape

    # BSDF derived parameters (bxdf.make_bsdf).
    f_diel = ((ior_i - ior_o) / (ior_i + ior_o)) ** 2
    f0r = f_diel + (cr - f_diel) * metal
    f0g = f_diel + (cg - f_diel) * metal
    f0b = f_diel + (cb - f_diel) * metal
    alr, alg, alb = cr * (1.0 - metal), cg * (1.0 - metal), cb * (1.0 - metal)

    # View-dependent precomputation shared by every candidate.
    nov = jnp.abs(_dot3(nx, ny, nz, vx, vy, vz))
    is_trans = wt > 0.0
    a_g = rough * rough
    a2_g = a_g * a_g
    # smith_g1(roughness, nov) for the VNDF pdf.
    g1_v = 2.0 * nov / jnp.maximum(
        nov + jnp.sqrt(jnp.maximum(a2_g + (1.0 - a2_g) * nov * nov, 0.0)),
        1e-8)
    m_total = float(n_l + n_b)

    res_idx = jnp.zeros(shape, jnp.int32)
    res_aux = jnp.zeros(shape, jnp.int32)
    res_uv0 = jnp.zeros(shape, jnp.float32)
    res_uv1 = jnp.zeros(shape, jnp.float32)
    res_phat = jnp.zeros(shape, jnp.float32)
    w_sum = jnp.zeros(shape, jnp.float32)
    win_dx = jnp.zeros(shape, jnp.float32)
    win_dy = jnp.zeros(shape, jnp.float32)
    win_dz = jnp.zeros(shape, jnp.float32)
    win_dist = jnp.zeros(shape, jnp.float32)

    lane_l = jax.lax.broadcasted_iota(jnp.int32, (n_lights, shape[1]), 0)

    for i in range(n_l):
        u_slot = uni_ref[4 * i + 0:4 * i + 1, :]
        u_keep = uni_ref[4 * i + 1:4 * i + 2, :]
        uv0 = uni_ref[4 * i + 2:4 * i + 3, :]
        uv1 = uni_ref[4 * i + 3:4 * i + 4, :]

        # Slot select from the prefetched ReGIR rows (s-way select chain;
        # slots_ref rows 0..s-1 = packed candidate id, rows s..2s-1 = W).
        slot = jnp.minimum((u_slot * float(s)).astype(jnp.int32), s - 1)
        cand_f = jnp.broadcast_to(slots_ref[0:1, :], u_slot.shape)
        w_cand = jnp.broadcast_to(slots_ref[s:s + 1, :], u_slot.shape)
        for j in range(1, s):
            take_j = slot == j
            cand_f = jnp.where(take_j, slots_ref[j:j + 1, :], cand_f)
            w_cand = jnp.where(take_j, slots_ref[s + j:s + j + 1, :], w_cand)
        cand = jnp.clip(cand_f.astype(jnp.int32), 0, n_lights - 1)

        # One-hot MXU row fetch from the VMEM-resident compact table:
        # rows = tableT (9, L) @ onehot (L, B). HIGHEST keeps the single
        # 1.0 coefficient f32-exact (light._onehot_fetch contract).
        oh = (lane_l == cand).astype(jnp.float32)
        rows = jax.lax.dot_general(
            tableT_ref[:, :], oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)      # (16, B)
        lcx, lcy, lcz = rows[0:1, :], rows[1:2, :], rows[2:3, :]
        lrad = rows[3:4, :]
        em_r, em_g, em_b = rows[4:5, :], rows[5:6, :], rows[6:7, :]
        lpow = rows[7:8, :]
        laux = rows[8:9, :]

        # Cone sampling (light.sample_sphere_light_rows).
        tcx, tcy, tcz = lcx - px, lcy - py, lcz - pz
        dist_c = jnp.maximum(jnp.sqrt(jnp.maximum(
            _dot3(tcx, tcy, tcz, tcx, tcy, tcz), 0.0)), 1e-6)
        wx_, wy_, wz_ = tcx / dist_c, tcy / dist_c, tcz / dist_c
        sin_max_sq = jnp.clip((lrad / dist_c) ** 2, 0.0, 1.0 - 1e-6)
        cos_max = jnp.sqrt(1.0 - sin_max_sq)
        cos_t = 1.0 - uv0 * (1.0 - cos_max)
        sin_t = jnp.sqrt(jnp.maximum(1.0 - cos_t * cos_t, 0.0))
        phi = TWO_PI * uv1
        tx, ty, tz, bx, by, bz = _onb(wx_, wy_, wz_)
        sc, ss = sin_t * jnp.cos(phi), sin_t * jnp.sin(phi)
        ldx = tx * sc + bx * ss + wx_ * cos_t
        ldy = ty * sc + by * ss + wy_ * cos_t
        ldz = tz * sc + bz * ss + wz_ * cos_t
        inv_cone = jnp.maximum(TWO_PI * (1.0 - cos_max), 1e-8)  # = 1/pdf
        # Distance to the sphere along the sampled direction (near root).
        bq = _dot3(-tcx, -tcy, -tcz, ldx, ldy, ldz)
        cq = _dot3(tcx, tcy, tcz, tcx, tcy, tcz) - lrad * lrad
        disc = jnp.maximum(bq * bq - cq, 0.0)
        ldist = jnp.maximum(-bq - jnp.sqrt(disc), 1e-4)

        # --- BSDF evaluation (bxdf eval_split + eval_pdf, fused) ---
        # Half vector (bxdf._half_vector): reflection form, or refraction
        # form where the transmission lobe is active and L is below the
        # geometric surface.
        hx, hy, hz = _normalize3(ldx + vx, ldy + vy, ldz + vz)
        rx = ldx * ior_o + vx * ior_i
        ry = ldy * ior_o + vy * ior_i
        rz = ldz * ior_o + vz * ior_i
        rx, ry, rz = _normalize3(rx, ry, rz)
        flip = _dot3(gx, gy, gz, rx, ry, rz) < 0
        rx = jnp.where(flip, -rx, rx)
        ry = jnp.where(flip, -ry, ry)
        rz = jnp.where(flip, -rz, rz)
        gol = _dot3(gx, gy, gz, ldx, ldy, ldz)
        use_refr = is_trans & (gol < 0)
        hx = jnp.where(use_refr, rx, hx)
        hy = jnp.where(use_refr, ry, hy)
        hz = jnp.where(use_refr, rz, hz)

        nol = jnp.abs(_dot3(nx, ny, nz, ldx, ldy, ldz))
        noh = jnp.abs(_dot3(nx, ny, nz, hx, hy, hz))
        voh = jnp.abs(_dot3(vx, vy, vz, hx, hy, hz))
        front = gol > 0

        rw = 1.0 - wt
        # Burley diffuse (brdf.diffuse_term_burley).
        f90 = 0.5 + 2.0 * rough * voh * voh
        burley = INV_PI * (1.0 + (f90 - 1.0) * _pow5(1.0 - nol)) \
            * (1.0 + (f90 - 1.0) * _pow5(1.0 - nov))
        k_diff = jnp.where(front, nol * burley * rw, 0.0)
        # GGX specular (brdf.distribution_ggx / geometry_term_mod /
        # fresnel_schlick).
        dterm = noh * noh * (a2_g - 1.0) + 1.0
        d_ggx = a2_g / jnp.maximum(PI * dterm * dterm, 1e-10)
        gv = nol * jnp.sqrt(jnp.maximum(nov * nov * (1.0 - a2_g) + a2_g, 0.0))
        gl = nov * jnp.sqrt(jnp.maximum(nol * nol * (1.0 - a2_g) + a2_g, 0.0))
        vis = 0.5 / jnp.maximum(gv + gl, 1e-8)
        p5 = _pow5(1.0 - voh)
        k_spec = jnp.where(front, nol * d_ggx * vis * rw, 0.0)
        # contrib = diffuse + specular + transmission lobes, dotted with
        # emission and the luminance weights in one pass.
        k_trans = nol * wt
        sum_r = k_diff * alr + k_spec * (f0r + (1.0 - f0r) * p5) \
            + k_trans * cr
        sum_g = k_diff * alg + k_spec * (f0g + (1.0 - f0g) * p5) \
            + k_trans * cg
        sum_b = k_diff * alb + k_spec * (f0b + (1.0 - f0b) * p5) \
            + k_trans * cb
        lum = (0.2126 * sum_r * em_r + 0.7152 * sum_g * em_g
               + 0.0722 * sum_b * em_b)
        p_hat = jnp.where(valid & (lpow > 0), lum * inv_cone, 0.0)

        if n_b > 0:
            # Mixture pdf of L (bxdf.eval_pdf) in uv measure — the MIS
            # "BRDF technique" density for light candidates.
            pdf_diff = jnp.where(front, nol * INV_PI, 0.0)
            pdf_spec = jnp.where(
                front, g1_v * d_ggx / jnp.maximum(4.0 * nov, 1e-6), 0.0)
            p_w = wd * pdf_diff + ws * pdf_spec + wt * nol
            p_other = p_w * inv_cone
            p_self = 1.0 / jnp.maximum(w_cand, 1e-20)
            wi = m_total * p_hat / jnp.maximum(
                n_l * p_self + n_b * p_other, 1e-20)
            wi = jnp.where(w_cand > 0, wi, 0.0)
        else:
            wi = p_hat * w_cand

        w_sum = w_sum + wi
        take = (u_keep * w_sum) < wi
        res_idx = jnp.where(take, cand, res_idx)
        res_aux = jnp.where(take, laux.astype(jnp.int32), res_aux)
        res_uv0 = jnp.where(take, uv0, res_uv0)
        res_uv1 = jnp.where(take, uv1, res_uv1)
        res_phat = jnp.where(take, p_hat, res_phat)
        win_dx = jnp.where(take, ldx, win_dx)
        win_dy = jnp.where(take, ldy, win_dy)
        win_dz = jnp.where(take, ldz, win_dz)
        win_dist = jnp.where(take, ldist, win_dist)

    out_f_ref[0:1, :] = res_uv0
    out_f_ref[1:2, :] = res_uv1
    out_f_ref[2:3, :] = res_phat
    out_f_ref[3:4, :] = w_sum
    out_f_ref[4:5, :] = win_dx
    out_f_ref[5:6, :] = win_dy
    out_f_ref[6:7, :] = win_dz
    out_f_ref[7:8, :] = win_dist
    out_i_ref[0:1, :] = res_idx
    out_i_ref[1:2, :] = res_aux


@functools.partial(jax.jit,
                   static_argnames=("n_l", "s", "n_b", "interpret"))
def initial_light_candidates(surf_planar, uni_planar, slots_planar, table,
                             n_l: int, s: int, n_b: int, interpret=False):
    """Run all n_l ReGIR light-candidate RIS rounds in one fused kernel.

    surf_planar: (24, N) surface stream (build rows per module header);
    uni_planar: (4*n_l, N) per-candidate uniforms [u_slot, u_keep, uv0,
    uv1] in draw order; slots_planar: (2*s, N) per-pixel prefetched ReGIR
    rows (candidate compact id f32, then RIS weight W); table: (L, 9)
    compact sphere-light rows (light.Lights.compact). N must be a multiple
    of RESTIR_BLOCK.

    Returns (out_f (8, N) f32 [uv0 uv1 phat w_sum dir_xyz dist],
             out_i (2, N) i32 [light_index aux_object_id]).
    """
    n = surf_planar.shape[1]
    assert n % RESTIR_BLOCK == 0, n
    n_lights = table.shape[0]
    grid = (n // RESTIR_BLOCK,)
    # Pad the 9 attribute columns to a 16-row sublane tile for the MXU.
    table_t = jnp.transpose(jnp.pad(table, ((0, 0), (0, 16 - table.shape[1]))))

    return pl.pallas_call(
        functools.partial(_kernel, n_l=n_l, s=s, n_b=n_b,
                          n_lights=n_lights),
        out_shape=(jax.ShapeDtypeStruct((8, n), jnp.float32),
                   jax.ShapeDtypeStruct((2, n), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N_SURF_ROWS, RESTIR_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * n_l, RESTIR_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * s, RESTIR_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(table_t.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8, RESTIR_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, RESTIR_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * n_l * (2 * n_lights * 9 + 250),
            bytes_accessed=(N_SURF_ROWS + 4 * n_l + 2 * s + 10) * n * 4,
            transcendentals=n * n_l * 8),
        interpret=interpret,
    )(surf_planar, uni_planar, slots_planar, table_t)
