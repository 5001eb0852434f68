"""Pallas TPU kernel for instanced triangle-mesh closest-hit.

The general-geometry analogue of the sphere kernel
(ops/intersect_pallas.py) and the TPU replacement for hardware BLAS/TLAS
traversal over instanced meshes
(/root/reference/Shaders/RaytracingHelpers.hlsli:57-133 CastRay,
Source/Scene.ixx:225-284 — one geosphere BLAS instanced ~448x). The
structure mirrors the reference's two-level hierarchy, vectorized the TPU
way:

- TLAS level: the instance table (pose + uniform scale + world bound) lives
  in SMEM; each (ray block, instance) pair is culled by the same scalar
  bounding-cone test as the sphere kernel's Morton chunks. Surviving
  instances transform the whole ray block into object space (two quaternion
  rotations per lane — cheap next to a triangle sweep).
- BLAS level: ONE shared object-space triangle table (v0 | e1 | e2 rows,
  Morton-ordered over centroids at build time so faces are spatially
  coherent) resident in VMEM, swept chunk-by-chunk with per-chunk
  object-space bounding-sphere culls (SMEM) — Moller-Trumbore evaluated as
  dense (chunk, rays) vector ops.
- Closest-hit bookkeeping uses the packed (truncated t | face id) i32
  encoding of intersect_pallas._slim_tail; the winning instance id is
  carried in a second scratch updated once per instance (compare the
  packed best before/after the chunk loop).

Callers recover exact t and barycentrics by re-running Moller-Trumbore on
the single winning (instance, face) per ray (refine_hit) — O(rays), not
O(rays x faces).
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .intersect_pallas import (INF_BITS, RAY_BLOCK, _bundle_summary,
                               _pos_bits)

# Triangle sublanes per inner step (multiple of 8). Env knob for A/B:
# smaller chunks = finer cull granularity but a longer unrolled chunk loop.
TRI_CHUNK = int(_os.environ.get("DRTS_TRI_CHUNK", "64"))
INST_CHUNK = 16       # instances per TLAS chunk (scalar cull granularity)
# Convexity chunk cull (VERDICT r5 item #5): on a closed CONVEX mesh, a
# ray whose origin is outside the body always hits a FRONT-facing
# triangle first (the entry point of the convex interval), so BLAS
# chunks whose whole normal cone is back-facing to the whole ray-bundle
# direction cone cannot contain the closest hit and are skipped.
# Origin-inside rays (glass transmission interiors) keep the full sweep
# via the |o_local| > R + tmin guard. DRTS_MESH_CONV=0 reverts.
MESH_CONV = _os.environ.get("DRTS_MESH_CONV", "1") != "0"
# Front-to-back chunk iteration in the fused candidate kernel: sweep the
# candidate BLAS's chunks in ascending entry-distance order (packed-key
# selection over the per-chunk scalar culls) so the closest-hit t_done
# collapses after the entry chunk and the rest far-cull. Opt-in A/B.
MESH_F2B = _os.environ.get("DRTS_MESH_F2B", "0") == "1"


def _conv_ok_scalar(sel, olx, oly, olz, tmn_l, coherent, conv_r):
    """Scalar gate for the convexity chunk cull over one candidate
    instance: every selected lane's object-space origin must sit outside
    the mesh bound with a tmin margin (entry t is then guaranteed to be
    >= tmin: entry >= |o_l| - R for unit local direction), and the local
    direction bundle must be a valid cone. With the margin, skipping
    back-facing chunks is exact for closest-hit — the front-facing entry
    always exists in [tmin, tmax] whenever any back-face exit would."""
    oo_l = olx * olx + oly * oly + olz * olz
    tmn_max = jnp.max(tmn_l)            # tmn_l is 0 on unselected lanes
    min_o2 = jnp.min(jnp.where(sel, oo_l, 1e30))
    margin = conv_r + tmn_max
    return coherent & (min_o2 > margin * margin)


def _conv_backface(tbounds_ref, c, axl, ayl, azl, cmin, sin_c, conv_ok):
    """Scalar chunk back-facing test: min over (normal-cone x direction-
    cone) pairs of n.d is cos(angle(an, a) + theta + phi); the chunk is
    skippable when that total angle < 90 deg (all normals strictly
    back-facing for all bundle rays). Angle sums accumulate via the
    addition identities; the ca>0 / c1>0 guards keep each partial sum
    below 90 deg so the final cosine test is monotone."""
    cnx = tbounds_ref[4, c]
    cny = tbounds_ref[5, c]
    cnz = tbounds_ref[6, c]
    ct = tbounds_ref[7, c]
    st = jnp.sqrt(jnp.maximum(1.0 - ct * ct, 0.0))
    ca = cnx * axl + cny * ayl + cnz * azl
    sa = jnp.sqrt(jnp.maximum(1.0 - ca * ca, 0.0))
    c1 = ca * ct - sa * st
    s1 = sa * ct + ca * st
    c2 = c1 * cmin - s1 * sin_c
    return conv_ok & (ca > 0.0) & (c1 > 0.0) & (c2 > 1e-4)


def _quat_conj_rotate_rows(qx, qy, qz, qw, vx, vy, vz):
    """Rotate (1, R) vector rows by the CONJUGATE of scalar quaternion q
    (world -> object). v' = v + 2*qv x (qv x v - w*v) with qv negated."""
    ax, ay, az = -qx, -qy, -qz
    # c1 = qv x v + w*v
    c1x = ay * vz - az * vy + qw * vx
    c1y = az * vx - ax * vz + qw * vy
    c1z = ax * vy - ay * vx + qw * vz
    # v' = v + 2 * (qv x c1)
    rx = vx + 2.0 * (ay * c1z - az * c1y)
    ry = vy + 2.0 * (az * c1x - ax * c1z)
    rz = vz + 2.0 * (ax * c1y - ay * c1x)
    return rx, ry, rz


def _mesh_kernel(rays_ref, inst_ref, ibounds_ref, tbounds_ref, tri_ref,
                 packed_ref, inst_out_ref, best_s, prev_s, binst_s, *,
                 n_ichunks: int, inst_chunk: int,
                 n_chunks: int, chunk: int, pos_bits: int,
                 conv: bool, conv_r: float):
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]
    trunc_mask = ~((1 << pos_bits) - 1)

    best_s[:, :] = jnp.full(ox.shape, INF_BITS, jnp.int32)
    binst_s[:, :] = jnp.zeros(ox.shape, jnp.int32)

    @pl.when(jnp.any(tmax >= tmin))
    def _():
        live = tmax >= tmin
        (mx, my, mz, orad, axw, ayw, azw, cmin, sin_c,
         coherent) = _bundle_summary(ox, oy, oz, dx, dy, dz, live)

        def t_done_now():
            # Block 'done' distance: per-lane min(best hit, tmax) — the
            # caller's bounds pre-pass (trimesh._bounds_prepass) gives
            # every lane a finite tmax, so far instances cull even before
            # any triangle hit lands (plain _t_done carries inf until the
            # first hit, which forced full TLAS sweeps on blocks with any
            # unresolved lane).
            t_best = jax.lax.bitcast_convert_type(
                best_s[:, :] & trunc_mask, jnp.float32)
            return jnp.max(jnp.where(live, jnp.minimum(t_best, tmax), 0.0))

        def visit_inst(k, _):
            px = inst_ref[0, k]
            py = inst_ref[1, k]
            pz = inst_ref[2, k]
            qx = inst_ref[3, k]
            qy = inst_ref[4, k]
            qz = inst_ref[5, k]
            qw = inst_ref[6, k]
            inv_s = inst_ref[7, k]
            brw = inst_ref[8, k]

            # World-space instance-bound cull (cone + behind + closest-hit
            # distance early-out) — the per-instance TLAS test. Padded
            # table rows carry brw = 0 and never pass.
            vx, vy, vz = px - mx, py - my, pz - mz
            er = brw + orad
            along = vx * axw + vy * ayw + vz * azw
            d2 = vx * vx + vy * vy + vz * vz
            perp = jnp.sqrt(jnp.maximum(d2 - along * along, 0.0))
            outside_cone = perp * cmin - along * sin_c > er
            behind = along < -er
            t_done = t_done_now()
            too_far = jnp.sqrt(d2) - er > t_done
            possible = (brw > 0.0) & jnp.logical_not(
                (coherent & (outside_cone | behind)) | too_far)

            @pl.when(possible)
            def _():
                prev_s[:, :] = best_s[:, :]
                # Ray block -> object space (uniform scale keeps t in
                # world units: o_l = R^T(o-p)/s, d_l = R^T d/s).
                olx, oly, olz = _quat_conj_rotate_rows(
                    qx, qy, qz, qw, ox - px, oy - py, oz - pz)
                olx, oly, olz = olx * inv_s, oly * inv_s, olz * inv_s
                dlx, dly, dlz = _quat_conj_rotate_rows(
                    qx, qy, qz, qw, dx, dy, dz)
                dlx, dly, dlz = dlx * inv_s, dly * inv_s, dlz * inv_s

                # Bundle summary transforms rigidly: rotate centroid/axis,
                # scale spreads; cone angle is rotation/scale-invariant.
                def rot_scalar(vx0, vy0, vz0):
                    ax0, ay0, az0 = -qx, -qy, -qz
                    c1x = ay0 * vz0 - az0 * vy0 + qw * vx0
                    c1y = az0 * vx0 - ax0 * vz0 + qw * vy0
                    c1z = ax0 * vy0 - ay0 * vx0 + qw * vz0
                    return (vx0 + 2.0 * (ay0 * c1z - az0 * c1y),
                            vy0 + 2.0 * (az0 * c1x - ax0 * c1z),
                            vz0 + 2.0 * (ax0 * c1y - ay0 * c1x))

                mlx, mly, mlz = rot_scalar(mx - px, my - py, mz - pz)
                mlx, mly, mlz = mlx * inv_s, mly * inv_s, mlz * inv_s
                alx, aly, alz = rot_scalar(axw, ayw, azw)
                orad_l = orad * inv_s
                if conv:
                    conv_ok = _conv_ok_scalar(
                        live, olx, oly, olz,
                        jnp.where(live, tmin, 0.0) * inv_s, coherent,
                        conv_r)

                def visit_chunk(c, _):
                    bx = tbounds_ref[0, c]
                    by = tbounds_ref[1, c]
                    bz = tbounds_ref[2, c]
                    br = tbounds_ref[3, c]
                    wx, wy, wz = bx - mlx, by - mly, bz - mlz
                    er2 = br + orad_l
                    along2 = wx * alx + wy * aly + wz * alz
                    dd2 = wx * wx + wy * wy + wz * wz
                    perp2 = jnp.sqrt(jnp.maximum(
                        dd2 - along2 * along2, 0.0))
                    out2 = perp2 * cmin - along2 * sin_c > er2
                    behind2 = along2 < -er2
                    # Refreshed per chunk: hits landed by earlier chunks
                    # tighten the remaining sweep immediately.
                    far2 = jnp.sqrt(dd2) - er2 > t_done_now() * inv_s
                    possible2 = jnp.logical_not(
                        (coherent & (out2 | behind2)) | far2)
                    if conv:
                        possible2 = possible2 & jnp.logical_not(
                            _conv_backface(tbounds_ref, c, alx, aly, alz,
                                           cmin, sin_c, conv_ok))

                    @pl.when(possible2)
                    def _():
                        s0 = pl.multiple_of(c * chunk, chunk)
                        tri = tri_ref[pl.ds(s0, chunk), :]   # (S, 9)
                        v0x = tri[:, 0:1]
                        v0y = tri[:, 1:2]
                        v0z = tri[:, 2:3]
                        e1x = tri[:, 3:4]
                        e1y = tri[:, 4:5]
                        e1z = tri[:, 5:6]
                        e2x = tri[:, 6:7]
                        e2y = tri[:, 7:8]
                        e2z = tri[:, 8:9]

                        # Two-sided Moller-Trumbore as (S, R) vector ops.
                        pvx = dly * e2z - dlz * e2y
                        pvy = dlz * e2x - dlx * e2z
                        pvz = dlx * e2y - dly * e2x
                        det = pvx * e1x + pvy * e1y + pvz * e1z
                        inv = 1.0 / det          # +-inf on degenerate
                        tvx = olx - v0x
                        tvy = oly - v0y
                        tvz = olz - v0z
                        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                        qvx = tvy * e1z - tvz * e1y
                        qvy = tvz * e1x - tvx * e1z
                        qvz = tvx * e1y - tvy * e1x
                        v = (dlx * qvx + dly * qvy + dlz * qvz) * inv
                        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                        ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                              & (t >= tmin) & (t <= tmax))
                        pos = jax.lax.broadcasted_iota(
                            jnp.int32, det.shape, 0) + s0
                        ti = (jax.lax.bitcast_convert_type(t, jnp.int32)
                              & trunc_mask) | pos
                        ti = jnp.where(ok, ti, INF_BITS)
                        best_s[:, :] = jnp.minimum(
                            best_s[:, :],
                            jnp.min(ti, axis=0, keepdims=True))
                    return 0

                jax.lax.fori_loop(0, n_chunks, visit_chunk, 0)
                binst_s[:, :] = jnp.where(best_s[:, :] < prev_s[:, :], k,
                                          binst_s[:, :])
            return 0

        # Instance-chunk level: one scalar cull covering inst_chunk
        # instances (the table is Morton-grouped, distance-ordered —
        # make_inst_tables). At 448 instances this replaces ~448 scalar
        # bound tests per ray block with ~28 chunk tests + members of the
        # few surviving chunks; the serial cull loop was the measured
        # floor of the mesh path (~0.94 Mray/s, NEXT r3).
        def visit_ichunk(ic, _):
            bcx = ibounds_ref[0, ic]
            bcy = ibounds_ref[1, ic]
            bcz = ibounds_ref[2, ic]
            bcr = ibounds_ref[3, ic]
            wx, wy, wz = bcx - mx, bcy - my, bcz - mz
            erc = bcr + orad
            alongc = wx * axw + wy * ayw + wz * azw
            dc2 = wx * wx + wy * wy + wz * wz
            perpc = jnp.sqrt(jnp.maximum(dc2 - alongc * alongc, 0.0))
            outc = perpc * cmin - alongc * sin_c > erc
            behindc = alongc < -erc
            farc = jnp.sqrt(dc2) - erc > t_done_now()
            possible_c = (bcr > 0.0) & jnp.logical_not(
                (coherent & (outc | behindc)) | farc)

            @pl.when(possible_c)
            def _():
                jax.lax.fori_loop(ic * inst_chunk, (ic + 1) * inst_chunk,
                                  visit_inst, 0)
            return 0

        jax.lax.fori_loop(0, n_ichunks, visit_ichunk, 0)

    packed_ref[:, :] = best_s[:, :]
    inst_out_ref[:, :] = binst_s[:, :]


@functools.partial(jax.jit, static_argnames=("n_ichunks", "inst_chunk",
                                             "n_chunks", "chunk",
                                             "interpret", "conv",
                                             "conv_r"))
def intersect_mesh_instances(rays_planar, inst_tbl, inst_bounds, tri_bounds,
                             tri_tbl, n_ichunks: int, inst_chunk: int,
                             n_chunks: int, chunk: int,
                             interpret=False, conv=False, conv_r=0.0):
    """Instanced-mesh closest hit.

    rays_planar: (8, N) planar rays, tmin >= 0; inst_tbl: (9, M_pad) SMEM
    instance scalars [px py pz qx qy qz qw inv_scale world_bound_radius]
    in Morton-grouped, chunk-distance-ordered order (make_inst_tables);
    inst_bounds: (4, IC_pad) world-space instance-chunk bounds (SMEM);
    tri_bounds: (8, C_pad) object-space chunk bounds + normal cones
    (SMEM); tri_tbl: (F_pad, 9) Morton-ordered object-space [v0 e1 e2]
    rows. conv/conv_r (static): enable the convexity back-face chunk cull
    with the mesh's object-space bounding radius (see MESH_CONV).
    Returns (t (N,) mantissa-truncated, face (N,) i32, instance (N,) i32 —
    positions in the SORTED table; map back via the builder's order array).
    """
    n = rays_planar.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)
    pos_bits = _pos_bits(tri_tbl.shape[0])

    packed, inst = pl.pallas_call(
        functools.partial(_mesh_kernel, n_ichunks=n_ichunks,
                          inst_chunk=inst_chunk, n_chunks=n_chunks,
                          chunk=chunk, pos_bits=pos_bits,
                          conv=conv, conv_r=conv_r),
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.int32),
                   jax.ShapeDtypeStruct((1, n), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, inst_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, inst_bounds.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tri_bounds.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tri_tbl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=45 * n * (n_ichunks * inst_chunk + tri_tbl.shape[0]),
            bytes_accessed=(8 + 2) * n * 4,
            transcendentals=n * n_chunks),
        interpret=interpret,
    )(rays_planar, inst_tbl, inst_bounds, tri_bounds, tri_tbl)

    pos_mask = (1 << pos_bits) - 1
    p = packed[0]
    face = p & pos_mask
    t = jax.lax.bitcast_convert_type(p & ~pos_mask, jnp.float32)
    return t, face, inst[0]


def _mesh_anyhit_kernel(rays_ref, inst_ref, ibounds_ref, tbounds_ref,
                        tri_ref, occ_ref, occ_s, *, n_ichunks: int,
                        inst_chunk: int, n_chunks: int, chunk: int):
    """Any-hit (shadow-ray) variant of _mesh_kernel — the instanced-mesh
    counterpart of intersect_pallas._anyhit_kernel
    (RAY_FLAG_ACCEPT_FIRST_HIT_AND_END_SEARCH, RTXDIAppBridge.hlsli:418-459):
    no closest-t/winner bookkeeping, just a per-lane blocked bit; instance
    chunks, instances, and triangle chunks are all skipped once every live
    lane is blocked, and distance culls use the block's max shadow range
    instead of the closest-hit bound."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]

    occ_s[:, :] = jnp.zeros(ox.shape, jnp.int32)

    @pl.when(jnp.any(tmax >= tmin))
    def _():
        live = tmax >= tmin
        (mx, my, mz, orad, axw, ayw, azw, cmin, sin_c,
         coherent) = _bundle_summary(ox, oy, oz, dx, dy, dz, live)
        tmax_max = jnp.max(jnp.where(live, tmax, 0.0))

        def visit_inst(k, _):
            px = inst_ref[0, k]
            py = inst_ref[1, k]
            pz = inst_ref[2, k]
            qx = inst_ref[3, k]
            qy = inst_ref[4, k]
            qz = inst_ref[5, k]
            qw = inst_ref[6, k]
            inv_s = inst_ref[7, k]
            brw = inst_ref[8, k]

            vx, vy, vz = px - mx, py - my, pz - mz
            er = brw + orad
            along = vx * axw + vy * ayw + vz * azw
            d2 = vx * vx + vy * vy + vz * vz
            perp = jnp.sqrt(jnp.maximum(d2 - along * along, 0.0))
            outside_cone = perp * cmin - along * sin_c > er
            behind = along < -er
            too_far = jnp.sqrt(d2) - er > tmax_max
            unresolved = jnp.any((occ_s[:, :] == 0) & live)
            possible = unresolved & (brw > 0.0) & jnp.logical_not(
                (coherent & (outside_cone | behind)) | too_far)

            @pl.when(possible)
            def _():
                olx, oly, olz = _quat_conj_rotate_rows(
                    qx, qy, qz, qw, ox - px, oy - py, oz - pz)
                olx, oly, olz = olx * inv_s, oly * inv_s, olz * inv_s
                dlx, dly, dlz = _quat_conj_rotate_rows(
                    qx, qy, qz, qw, dx, dy, dz)
                dlx, dly, dlz = dlx * inv_s, dly * inv_s, dlz * inv_s

                def rot_scalar(vx0, vy0, vz0):
                    ax0, ay0, az0 = -qx, -qy, -qz
                    c1x = ay0 * vz0 - az0 * vy0 + qw * vx0
                    c1y = az0 * vx0 - ax0 * vz0 + qw * vy0
                    c1z = ax0 * vy0 - ay0 * vx0 + qw * vz0
                    return (vx0 + 2.0 * (ay0 * c1z - az0 * c1y),
                            vy0 + 2.0 * (az0 * c1x - ax0 * c1z),
                            vz0 + 2.0 * (ax0 * c1y - ay0 * c1x))

                mlx, mly, mlz = rot_scalar(mx - px, my - py, mz - pz)
                mlx, mly, mlz = mlx * inv_s, mly * inv_s, mlz * inv_s
                alx, aly, alz = rot_scalar(axw, ayw, azw)
                orad_l = orad * inv_s
                tmax_max_l = tmax_max * inv_s

                def visit_chunk(c, _):
                    bx = tbounds_ref[0, c]
                    by = tbounds_ref[1, c]
                    bz = tbounds_ref[2, c]
                    br = tbounds_ref[3, c]
                    wx, wy, wz = bx - mlx, by - mly, bz - mlz
                    er2 = br + orad_l
                    along2 = wx * alx + wy * aly + wz * alz
                    dd2 = wx * wx + wy * wy + wz * wz
                    perp2 = jnp.sqrt(jnp.maximum(
                        dd2 - along2 * along2, 0.0))
                    out2 = perp2 * cmin - along2 * sin_c > er2
                    behind2 = along2 < -er2
                    far2 = jnp.sqrt(dd2) - er2 > tmax_max_l
                    unresolved2 = jnp.any((occ_s[:, :] == 0) & live)
                    possible2 = unresolved2 & jnp.logical_not(
                        (coherent & (out2 | behind2)) | far2)

                    @pl.when(possible2)
                    def _():
                        s0 = pl.multiple_of(c * chunk, chunk)
                        tri = tri_ref[pl.ds(s0, chunk), :]   # (S, 9)
                        v0x = tri[:, 0:1]
                        v0y = tri[:, 1:2]
                        v0z = tri[:, 2:3]
                        e1x = tri[:, 3:4]
                        e1y = tri[:, 4:5]
                        e1z = tri[:, 5:6]
                        e2x = tri[:, 6:7]
                        e2y = tri[:, 7:8]
                        e2z = tri[:, 8:9]

                        pvx = dly * e2z - dlz * e2y
                        pvy = dlz * e2x - dlx * e2z
                        pvz = dlx * e2y - dly * e2x
                        det = pvx * e1x + pvy * e1y + pvz * e1z
                        inv = 1.0 / det
                        tvx = olx - v0x
                        tvy = oly - v0y
                        tvz = olz - v0z
                        u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
                        qvx = tvy * e1z - tvz * e1y
                        qvy = tvz * e1x - tvx * e1z
                        qvz = tvx * e1y - tvy * e1x
                        v = (dlx * qvx + dly * qvy + dlz * qvz) * inv
                        t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
                        blocked = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                                   & (t >= tmin) & (t <= tmax))
                        any_hit = jnp.sum(blocked.astype(jnp.int32),
                                          axis=0, keepdims=True)
                        occ_s[:, :] = occ_s[:, :] \
                            | (any_hit > 0).astype(jnp.int32)
                    return 0

                jax.lax.fori_loop(0, n_chunks, visit_chunk, 0)
            return 0

        def visit_ichunk(ic, _):
            bcx = ibounds_ref[0, ic]
            bcy = ibounds_ref[1, ic]
            bcz = ibounds_ref[2, ic]
            bcr = ibounds_ref[3, ic]
            wx, wy, wz = bcx - mx, bcy - my, bcz - mz
            erc = bcr + orad
            alongc = wx * axw + wy * ayw + wz * azw
            dc2 = wx * wx + wy * wy + wz * wz
            perpc = jnp.sqrt(jnp.maximum(dc2 - alongc * alongc, 0.0))
            outc = perpc * cmin - alongc * sin_c > erc
            behindc = alongc < -erc
            farc = jnp.sqrt(dc2) - erc > tmax_max
            unresolved_c = jnp.any((occ_s[:, :] == 0) & live)
            possible_c = unresolved_c & (bcr > 0.0) & jnp.logical_not(
                (coherent & (outc | behindc)) | farc)

            @pl.when(possible_c)
            def _():
                jax.lax.fori_loop(ic * inst_chunk, (ic + 1) * inst_chunk,
                                  visit_inst, 0)
            return 0

        jax.lax.fori_loop(0, n_ichunks, visit_ichunk, 0)

    occ_ref[:, :] = occ_s[:, :]


@functools.partial(jax.jit, static_argnames=("n_ichunks", "inst_chunk",
                                             "n_chunks", "chunk",
                                             "interpret"))
def intersect_mesh_instances_any(rays_planar, inst_tbl, inst_bounds,
                                 tri_bounds, tri_tbl, n_ichunks: int,
                                 inst_chunk: int, n_chunks: int, chunk: int,
                                 interpret=False):
    """Any-hit occlusion against instanced meshes. Same table layout as
    intersect_mesh_instances; returns occluded (N,) bool."""
    n = rays_planar.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)

    occ = pl.pallas_call(
        functools.partial(_mesh_anyhit_kernel, n_ichunks=n_ichunks,
                          inst_chunk=inst_chunk, n_chunks=n_chunks,
                          chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, inst_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, inst_bounds.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tri_bounds.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(tri_tbl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=45 * n * (n_ichunks * inst_chunk + tri_tbl.shape[0]),
            bytes_accessed=(8 + 1) * n * 4,
            transcendentals=n * n_chunks),
        interpret=interpret,
    )(rays_planar, inst_tbl, inst_bounds, tri_bounds, tri_tbl)
    return occ[0] > 0


BSCAN_CHUNK = 128     # instance sublanes per bound-scan inner step


def _bound_scan_kernel(rays_ref, prev_ref, tblT_ref, out_ref, *,
                       n_chunks: int, chunk: int, pos_bits: int):
    """Next-candidate TLAS scan: for every ray, the MINIMUM packed
    (truncated clamped-entry-t | instance position) key strictly greater
    than the ray's cursor (prev_ref), over all instance bounding spheres
    whose [entry, exit] interval overlaps the ray's [tmin, tmax].

    This is the enumeration step of front-to-back TLAS traversal done the
    TPU way: each call advances every ray's cursor to its next-nearest
    bound, the caller traces that ONE instance's shared BLAS densely, and
    repeats — replacing the serial per-block instance walk of _mesh_kernel
    (the reference's RT-core front-to-back BVH order,
    Shaders/RaytracingHelpers.hlsli:57-133). Clamped entry = max(entry, 0)
    keeps the f32 bit pattern order-monotone (tmin >= 0 rays only);
    origin-inside bounds tie at 0 and order by instance position.
    tblT rows: [cx cy cz ccrr] with ccrr = |c|^2 - r^2 (+1e30 on padding,
    so disc < 0 -> NaN fails the interval test)."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]
    trunc_mask = ~((1 << pos_bits) - 1)

    out_ref[:, :] = jnp.full(ox.shape, INF_BITS, jnp.int32)

    @pl.when(jnp.any(tmax >= tmin))
    def _():
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz
        prev = prev_ref[:, :]
        best = jnp.full(ox.shape, INF_BITS, jnp.int32)
        for c in range(n_chunks):
            s0 = c * chunk
            cxT = tblT_ref[s0:s0 + chunk, 0:1]
            cyT = tblT_ref[s0:s0 + chunk, 1:2]
            czT = tblT_ref[s0:s0 + chunk, 2:3]
            ccrrT = tblT_ref[s0:s0 + chunk, 3:4]
            b = od - (cxT * dx + cyT * dy + czT * dz)
            c0 = oo - 2.0 * (cxT * ox + cyT * oy + czT * oz) + ccrrT
            sq = jnp.sqrt(b * b - c0)          # NaN when disc < 0
            entry = -b - sq
            exit_t = sq - b
            ok = (exit_t >= tmin) & (entry <= tmax)   # NaN fails both
            ce = jnp.maximum(entry, 0.0)
            pos = jax.lax.broadcasted_iota(jnp.int32, b.shape, 0) + s0
            key = (jax.lax.bitcast_convert_type(ce, jnp.int32)
                   & trunc_mask) | pos
            key = jnp.where(ok & (key > prev), key, INF_BITS)
            best = jnp.minimum(best, jnp.min(key, axis=0, keepdims=True))
        out_ref[:, :] = best


@functools.partial(jax.jit, static_argnames=("n_chunks", "chunk",
                                             "interpret"))
def bound_scan(rays_planar, bscan_tblT, n_chunks: int, chunk: int,
               prev_key, interpret=False):
    """Per-ray next-candidate key over the instance bounds (see
    _bound_scan_kernel). rays_planar (8, N); bscan_tblT (M_pad, 4);
    prev_key (1, N) i32 cursor (-1 starts enumeration). Returns (1, N)
    packed keys; INF_BITS = no further candidate."""
    n = rays_planar.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)
    m_pad = bscan_tblT.shape[0]
    return pl.pallas_call(
        functools.partial(_bound_scan_kernel, n_chunks=n_chunks,
                          chunk=chunk, pos_bits=_pos_bits(m_pad)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_pad, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        interpret=interpret,
    )(rays_planar, prev_key, bscan_tblT)


def _shared_blas_kernel(rays_ref, cand_ref, best_in_ref, binst_in_ref,
                        inst_ref, tbounds_ref, tri_ref,
                        best_out_ref, binst_out_ref, bobj_s, *,
                        m_pad: int, n_chunks: int, chunk: int,
                        pos_bits: int, conv: bool, conv_r: float):
    """One candidate-instance BLAS sweep per lane: every live lane tests
    the SHARED object-space triangle table against its own candidate
    instance (cand_ref, sorted-table position; >= m_pad = dead). The block
    loops over its distinct candidate ids (kmin..kmax — one or two after
    the candidate sort) and, per id, transforms the whole block into that
    instance's object frame with UNIT direction (t in object units,
    rescaled to world for the packed best), then runs the chunk-culled
    Moller-Trumbore sweep of _mesh_kernel.

    best/binst thread through calls: packed world (truncated t | face) and
    winning instance position. pos_bits is the FACE packing width."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]
    trunc_mask = ~((1 << pos_bits) - 1)

    cand = cand_ref[:, :]
    best0 = best_in_ref[:, :]
    binst0 = binst_in_ref[:, :]
    best_out_ref[:, :] = best0
    binst_out_ref[:, :] = binst0

    t_best_w = jax.lax.bitcast_convert_type(best0 & trunc_mask,
                                            jnp.float32)
    tmax_eff = jnp.minimum(tmax, t_best_w)
    live = (tmax_eff >= tmin) & (cand >= 0) & (cand < m_pad)

    @pl.when(jnp.any(live))
    def _():
        kmin = jnp.min(jnp.where(live, cand, m_pad))
        kmax = jnp.max(jnp.where(live, cand, -1))

        def visit_cand(k, _):
            sel = live & (cand == k)

            @pl.when(jnp.any(sel))
            def _():
                px = inst_ref[0, k]
                py = inst_ref[1, k]
                pz = inst_ref[2, k]
                qx = inst_ref[3, k]
                qy = inst_ref[4, k]
                qz = inst_ref[5, k]
                qw = inst_ref[6, k]
                inv_s = inst_ref[7, k]
                s_w = 1.0 / inv_s

                # Object frame, UNIT direction: positions scale by 1/s so
                # the sweep's t is in object units (t_world = t_obj * s).
                olx, oly, olz = _quat_conj_rotate_rows(
                    qx, qy, qz, qw, ox - px, oy - py, oz - pz)
                olx, oly, olz = olx * inv_s, oly * inv_s, olz * inv_s
                dlx, dly, dlz = _quat_conj_rotate_rows(
                    qx, qy, qz, qw, dx, dy, dz)
                tmn_l = jnp.where(sel, tmin * inv_s, 0.0)
                tmx_l = jnp.where(sel, tmax_eff * inv_s, -1.0)

                bundle = _bundle_summary(olx, oly, olz, dlx, dly, dlz, sel)
                (mx, my, mz, orad, axl, ayl, azl, cmin, sin_c,
                 coherent) = bundle
                if conv:
                    conv_ok = _conv_ok_scalar(sel, olx, oly, olz, tmn_l,
                                              coherent, conv_r)

                bobj_s[:, :] = jnp.full(ox.shape, INF_BITS, jnp.int32)
                for c in range(n_chunks):
                    bx = tbounds_ref[0, c]
                    by = tbounds_ref[1, c]
                    bz = tbounds_ref[2, c]
                    br = tbounds_ref[3, c]
                    wx, wy, wz = bx - mx, by - my, bz - mz
                    er = br + orad
                    along = wx * axl + wy * ayl + wz * azl
                    d2 = wx * wx + wy * wy + wz * wz
                    perp = jnp.sqrt(jnp.maximum(d2 - along * along, 0.0))
                    outside = perp * cmin - along * sin_c > er
                    behind = along < -er
                    t_hit = jax.lax.bitcast_convert_type(
                        bobj_s[:, :] & trunc_mask, jnp.float32)
                    t_done = jnp.max(jnp.where(
                        sel, jnp.minimum(t_hit, tmx_l), 0.0))
                    far = jnp.sqrt(d2) - er > t_done
                    possible = jnp.logical_not(
                        (coherent & (outside | behind)) | far)
                    if conv:
                        possible = possible & jnp.logical_not(
                            _conv_backface(tbounds_ref, c, axl, ayl, azl,
                                           cmin, sin_c, conv_ok))

                    @pl.when(possible)
                    def _():
                        bobj_s[:, :] = jnp.minimum(bobj_s[:, :], _mt_chunk(
                            tri_ref, c * chunk, chunk, olx, oly, olz,
                            dlx, dly, dlz, tmn_l, tmx_l, trunc_mask))

                best_obj = bobj_s[:, :]
                t_obj = jax.lax.bitcast_convert_type(
                    best_obj & trunc_mask, jnp.float32)
                t_w = t_obj * s_w
                packed_w = (jax.lax.bitcast_convert_type(t_w, jnp.int32)
                            & trunc_mask) | (best_obj & ~trunc_mask)
                packed_w = jnp.where(best_obj < INF_BITS, packed_w,
                                     INF_BITS)
                better = sel & (packed_w < best_out_ref[:, :])
                best_out_ref[:, :] = jnp.where(better, packed_w,
                                               best_out_ref[:, :])
                binst_out_ref[:, :] = jnp.where(better, k,
                                                binst_out_ref[:, :])
            return 0

        jax.lax.fori_loop(kmin, kmax + 1, visit_cand, 0)


def _mt_chunk(tri_ref, s0, chunk, olx, oly, olz, dlx, dly, dlz,
              tmn_l, tmx_l, trunc_mask):
    """One (chunk, rays) two-sided Moller-Trumbore sweep -> packed
    (truncated t | face position) column min (the _mesh_kernel inner
    body, factored for the shared-BLAS kernel)."""
    s0 = pl.multiple_of(s0, chunk)
    tri = tri_ref[pl.ds(s0, chunk), :]
    v0x = tri[:, 0:1]
    v0y = tri[:, 1:2]
    v0z = tri[:, 2:3]
    e1x = tri[:, 3:4]
    e1y = tri[:, 4:5]
    e1z = tri[:, 5:6]
    e2x = tri[:, 6:7]
    e2y = tri[:, 7:8]
    e2z = tri[:, 8:9]
    pvx = dly * e2z - dlz * e2y
    pvy = dlz * e2x - dlx * e2z
    pvz = dlx * e2y - dly * e2x
    det = pvx * e1x + pvy * e1y + pvz * e1z
    inv = 1.0 / det
    tvx = olx - v0x
    tvy = oly - v0y
    tvz = olz - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (dlx * qvx + dly * qvy + dlz * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    ok = ((u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
          & (t >= tmn_l) & (t <= tmx_l))
    pos = jax.lax.broadcasted_iota(jnp.int32, det.shape, 0) + s0
    ti = (jax.lax.bitcast_convert_type(t, jnp.int32) & trunc_mask) | pos
    ti = jnp.where(ok, ti, INF_BITS)
    return jnp.min(ti, axis=0, keepdims=True)


@functools.partial(jax.jit, static_argnames=("m_pad", "n_chunks", "chunk",
                                             "interpret", "conv",
                                             "conv_r"))
def shared_blas_sweep(rays_planar, cand, best_in, binst_in, inst_tbl,
                      tri_bounds, tri_tbl, m_pad: int, n_chunks: int,
                      chunk: int, interpret=False, conv=False,
                      conv_r=0.0):
    """One candidate iteration: trace each lane's candidate instance's
    shared BLAS (see _shared_blas_kernel). Returns (best_packed_world,
    best_inst_pos), both (1, N) i32, folded over the incoming best."""
    n = rays_planar.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)
    f_pad = tri_tbl.shape[0]
    return pl.pallas_call(
        functools.partial(_shared_blas_kernel, m_pad=m_pad,
                          n_chunks=n_chunks, chunk=chunk,
                          pos_bits=_pos_bits(f_pad),
                          conv=conv, conv_r=conv_r),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, inst_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tri_bounds.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((f_pad, 9), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.int32),
                   jax.ShapeDtypeStruct((1, n), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=45 * n * tri_tbl.shape[0],
            bytes_accessed=(8 + 5) * n * 4,
            transcendentals=n * n_chunks),
        interpret=interpret,
    )(rays_planar, cand, best_in, binst_in, inst_tbl, tri_bounds, tri_tbl)


def _shared_blas_any_kernel(rays_ref, cand_ref, occ_in_ref, inst_ref,
                            tbounds_ref, tri_ref, occ_out_ref, *,
                            m_pad: int, n_chunks: int, chunk: int):
    """Any-hit variant of _shared_blas_kernel: per lane, does the lane's
    candidate instance block its shadow segment? No winner bookkeeping —
    a per-lane occluded bit (folded over occ_in), and triangle chunks are
    skipped once every selected lane is blocked."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]

    cand = cand_ref[:, :]
    occ0 = occ_in_ref[:, :]
    occ_out_ref[:, :] = occ0
    live = (tmax >= tmin) & (cand >= 0) & (cand < m_pad) & (occ0 == 0)

    @pl.when(jnp.any(live))
    def _():
        kmin = jnp.min(jnp.where(live, cand, m_pad))
        kmax = jnp.max(jnp.where(live, cand, -1))

        def visit_cand(k, _):
            sel = live & (cand == k)

            @pl.when(jnp.any(sel))
            def _():
                px = inst_ref[0, k]
                py = inst_ref[1, k]
                pz = inst_ref[2, k]
                qx = inst_ref[3, k]
                qy = inst_ref[4, k]
                qz = inst_ref[5, k]
                qw = inst_ref[6, k]
                inv_s = inst_ref[7, k]

                olx, oly, olz = _quat_conj_rotate_rows(
                    qx, qy, qz, qw, ox - px, oy - py, oz - pz)
                olx, oly, olz = olx * inv_s, oly * inv_s, olz * inv_s
                dlx, dly, dlz = _quat_conj_rotate_rows(
                    qx, qy, qz, qw, dx, dy, dz)
                tmn_l = jnp.where(sel, tmin * inv_s, 0.0)
                tmx_l = jnp.where(sel, tmax * inv_s, -1.0)

                (mx, my, mz, orad, axl, ayl, azl, cmin, sin_c,
                 coherent) = _bundle_summary(olx, oly, olz, dlx, dly, dlz,
                                             sel)
                tmax_max = jnp.max(jnp.where(sel, tmx_l, 0.0))

                for c in range(n_chunks):
                    bx = tbounds_ref[0, c]
                    by = tbounds_ref[1, c]
                    bz = tbounds_ref[2, c]
                    br = tbounds_ref[3, c]
                    wx, wy, wz = bx - mx, by - my, bz - mz
                    er = br + orad
                    along = wx * axl + wy * ayl + wz * azl
                    d2 = wx * wx + wy * wy + wz * wz
                    perp = jnp.sqrt(jnp.maximum(d2 - along * along, 0.0))
                    outside = perp * cmin - along * sin_c > er
                    behind = along < -er
                    far = jnp.sqrt(d2) - er > tmax_max
                    unresolved = jnp.any(sel & (occ_out_ref[:, :] == 0))
                    possible = unresolved & jnp.logical_not(
                        (coherent & (outside | behind)) | far)

                    @pl.when(possible)
                    def _():
                        hit = _mt_chunk(
                            tri_ref, c * chunk, chunk, olx, oly, olz,
                            dlx, dly, dlz, tmn_l, tmx_l, -1) < INF_BITS
                        occ_out_ref[:, :] = jnp.where(
                            sel & hit, 1, occ_out_ref[:, :])
            return 0

        jax.lax.fori_loop(kmin, kmax + 1, visit_cand, 0)


@functools.partial(jax.jit, static_argnames=("m_pad", "n_chunks", "chunk",
                                             "interpret"))
def shared_blas_any(rays_planar, cand, occ_in, inst_tbl, tri_bounds,
                    tri_tbl, m_pad: int, n_chunks: int, chunk: int,
                    interpret=False):
    """One any-hit candidate iteration (see _shared_blas_any_kernel)."""
    n = rays_planar.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)
    f_pad = tri_tbl.shape[0]
    return pl.pallas_call(
        functools.partial(_shared_blas_any_kernel, m_pad=m_pad,
                          n_chunks=n_chunks, chunk=chunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, inst_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, tri_bounds.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((f_pad, 9), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=45 * n * tri_tbl.shape[0],
            bytes_accessed=(8 + 3) * n * 4,
            transcendentals=n * n_chunks),
        interpret=interpret,
    )(rays_planar, cand, occ_in, inst_tbl, tri_bounds, tri_tbl)


def intersect_mesh_instances_any_cand(rays_planar, inst_tbl, inst_bounds,
                                      tri_bounds, tri_tbl, n_ichunks: int,
                                      inst_chunk: int, n_chunks: int,
                                      chunk: int, iters: int = 4,
                                      interpret=False):
    """Candidate-iteration any-hit: enumerate each shadow ray's
    overlapping instance bounds front-to-back, test ONE shared-BLAS
    candidate per iteration, stop the lane at the first block. Exact
    backstop = the serial any-hit kernel for lanes with candidates left.
    Returns occluded (N,) bool."""
    n = rays_planar.shape[1]
    bscan = make_bscan_table(inst_tbl)
    m_pad = bscan.shape[0]
    m_tbl = inst_tbl.shape[1]
    pos_mask = (1 << _pos_bits(m_pad)) - 1

    cursor = jnp.full((1, n), -1, jnp.int32)
    occ = jnp.zeros((1, n), jnp.int32)
    rays_cur = rays_planar

    def kill_occluded(occ):
        # Occluded lanes leave the enumeration: dead t-range.
        return rays_planar.at[7:8, :].set(
            jnp.where(occ > 0, rays_planar[6:7, :] - 1.0,
                      rays_planar[7:8, :]))

    for _ in range(iters):
        key = bound_scan(rays_cur, bscan, m_pad // BSCAN_CHUNK,
                         BSCAN_CHUNK, cursor, interpret=interpret)
        cand = jnp.where(key < INF_BITS, key & pos_mask, m_tbl)
        occ = shared_blas_any(rays_cur, cand, occ, inst_tbl, tri_bounds,
                              tri_tbl, m_tbl, n_chunks, chunk,
                              interpret=interpret)
        cursor = key
        rays_cur = kill_occluded(occ)

    key = bound_scan(rays_cur, bscan, m_pad // BSCAN_CHUNK, BSCAN_CHUNK,
                     cursor, interpret=interpret)
    unresolved = (key < INF_BITS) & (occ == 0)
    rays_fb = rays_cur.at[7:8, :].set(
        jnp.where(unresolved, rays_cur[7:8, :], rays_cur[6:7, :] - 1.0))
    occ_fb = intersect_mesh_instances_any(
        rays_fb, inst_tbl, inst_bounds, tri_bounds, tri_tbl, n_ichunks,
        inst_chunk, n_chunks, chunk, interpret=interpret)
    return (occ[0] > 0) | occ_fb


def _cand_fused_kernel(rays_ref, inst_ref, ibounds_ref, bscanT_ref,
                       tbounds_ref, tri_ref, best_ref, binst_ref, key_ref,
                       cursor_s, bobj_s, *, iters: int, m_tbl: int,
                       n_ichunks: int, inst_chunk: int, n_chunks: int,
                       chunk: int, pos_bits: int, bs_pos_bits: int,
                       conv: bool, conv_r: float):
    """Fused candidate-iteration closest hit: the bound scan, the
    per-candidate shared-BLAS sweep, and the front-to-back iteration all
    run inside ONE kernel launch, so resolved blocks exit early instead of
    paying a full dense scan per host-side iteration (the multi-launch
    form costs ~12 us/block/scan at 448 instances — more than the whole
    sphere sweep budget).

    Scan chunks use the SAME scalar cone/behind/distance culls as the
    instance walk (ibounds at inst_chunk granularity), so coherent blocks
    sweep only the handful of bound chunks their cone touches. key_ref
    carries the FINAL scan result out: lanes with key < INF_BITS after
    `iters` candidates still have an un-tested overlapping bound and go to
    the exact serial backstop."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax0 = rays_ref[7:8, :]
    trunc_w = ~((1 << pos_bits) - 1)
    bs_trunc = ~((1 << bs_pos_bits) - 1)
    bs_pos_mask = (1 << bs_pos_bits) - 1

    best_ref[:, :] = jnp.full(ox.shape, INF_BITS, jnp.int32)
    binst_ref[:, :] = jnp.zeros(ox.shape, jnp.int32)
    key_ref[:, :] = jnp.full(ox.shape, INF_BITS, jnp.int32)
    cursor_s[:, :] = jnp.full(ox.shape, -1, jnp.int32)

    @pl.when(jnp.any(tmax0 >= tmin))
    def _():
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz
        live0 = tmax0 >= tmin
        bundle_w = _bundle_summary(ox, oy, oz, dx, dy, dz, live0)
        (mxw, myw, mzw, oradw, axw, ayw, azw, cminw, sin_cw,
         coherent_w) = bundle_w

        def tmax_eff():
            t_b = jax.lax.bitcast_convert_type(best_ref[:, :] & trunc_w,
                                               jnp.float32)
            return jnp.minimum(tmax0, t_b)

        def scan():
            """Next-candidate packed key per lane (strictly > the cursor),
            accumulated into key_ref (caller resets it to INF first)."""
            tmx = tmax_eff()
            t_done = jnp.max(jnp.where(live0, tmx, 0.0))
            prev = cursor_s[:, :]
            for c in range(n_ichunks):
                bx = ibounds_ref[0, c]
                by = ibounds_ref[1, c]
                bz = ibounds_ref[2, c]
                br = ibounds_ref[3, c]
                vx, vy, vz = bx - mxw, by - myw, bz - mzw
                er = br + oradw
                along = vx * axw + vy * ayw + vz * azw
                d2 = vx * vx + vy * vy + vz * vz
                perp = jnp.sqrt(jnp.maximum(d2 - along * along, 0.0))
                outc = perp * cminw - along * sin_cw > er
                behindc = along < -er
                farc = jnp.sqrt(d2) - er > t_done
                possible = (br > 0.0) & jnp.logical_not(
                    (coherent_w & (outc | behindc)) | farc)

                @pl.when(possible)
                def _():
                    s0 = pl.multiple_of(c * inst_chunk, inst_chunk)
                    cxT = bscanT_ref[pl.ds(s0, inst_chunk), 0:1]
                    cyT = bscanT_ref[pl.ds(s0, inst_chunk), 1:2]
                    czT = bscanT_ref[pl.ds(s0, inst_chunk), 2:3]
                    ccrrT = bscanT_ref[pl.ds(s0, inst_chunk), 3:4]
                    b = od - (cxT * dx + cyT * dy + czT * dz)
                    c0 = oo - 2.0 * (cxT * ox + cyT * oy + czT * oz) + ccrrT
                    sq = jnp.sqrt(b * b - c0)       # NaN when disc < 0
                    entry = -b - sq
                    exit_t = sq - b
                    ok = (exit_t >= tmin) & (entry <= tmx)
                    ce = jnp.maximum(entry, 0.0)
                    pos = jax.lax.broadcasted_iota(
                        jnp.int32, b.shape, 0) + s0
                    key = (jax.lax.bitcast_convert_type(ce, jnp.int32)
                           & bs_trunc) | pos
                    key = jnp.where(ok & (key > prev), key, INF_BITS)
                    key_ref[:, :] = jnp.minimum(
                        key_ref[:, :],
                        jnp.min(key, axis=0, keepdims=True))

        for it in range(iters + 1):
            # One scan per iteration; the (iters+1)-th only reports the
            # unresolved set (key_ref) for the host-side backstop.
            any_open = jnp.any(cursor_s[:, :] < INF_BITS)

            @pl.when(any_open)
            def _():
                key_ref[:, :] = jnp.full(ox.shape, INF_BITS, jnp.int32)
                scan()
                cursor_s[:, :] = jnp.where(
                    cursor_s[:, :] < INF_BITS, key_ref[:, :], INF_BITS)

            if it == iters:
                break

            key = cursor_s[:, :]
            cand = jnp.where(key < INF_BITS, key & bs_pos_mask, m_tbl)
            live = (cand < m_tbl) & live0

            @pl.when(jnp.any(live))
            def _():
                kmin = jnp.min(jnp.where(live, cand, m_tbl))
                kmax = jnp.max(jnp.where(live, cand, -1))

                def visit_cand(k, _):
                    sel = live & (cand == k)

                    @pl.when(jnp.any(sel))
                    def _():
                        px = inst_ref[0, k]
                        py = inst_ref[1, k]
                        pz = inst_ref[2, k]
                        qx = inst_ref[3, k]
                        qy = inst_ref[4, k]
                        qz = inst_ref[5, k]
                        qw = inst_ref[6, k]
                        inv_s = inst_ref[7, k]
                        s_w = 1.0 / inv_s

                        olx, oly, olz = _quat_conj_rotate_rows(
                            qx, qy, qz, qw, ox - px, oy - py, oz - pz)
                        olx, oly, olz = (olx * inv_s, oly * inv_s,
                                         olz * inv_s)
                        dlx, dly, dlz = _quat_conj_rotate_rows(
                            qx, qy, qz, qw, dx, dy, dz)
                        tmn_l = jnp.where(sel, tmin * inv_s, 0.0)
                        tmx_l = jnp.where(sel, tmax_eff() * inv_s, -1.0)

                        (mx, my, mz, orad, axl, ayl, azl, cmin, sin_c,
                         coherent) = _bundle_summary(olx, oly, olz, dlx,
                                                     dly, dlz, sel)
                        if conv:
                            conv_ok = _conv_ok_scalar(sel, olx, oly, olz,
                                                      tmn_l, coherent,
                                                      conv_r)

                        bobj_s[:, :] = jnp.full(ox.shape, INF_BITS,
                                                jnp.int32)
                        if MESH_F2B:
                            # Front-to-back (MESH_F2B): static pass ranks
                            # chunks by a packed (entry-distance | chunk)
                            # key using the t_done-INDEPENDENT culls; the
                            # ordered loop then re-checks only the
                            # distance cull with the tightening t_done.
                            assert n_chunks <= 256
                            ckeys = []
                            for c in range(n_chunks):
                                bx = tbounds_ref[0, c]
                                by = tbounds_ref[1, c]
                                bz = tbounds_ref[2, c]
                                br = tbounds_ref[3, c]
                                wx = bx - mx
                                wy = by - my
                                wz = bz - mz
                                er = br + orad
                                along = (wx * axl + wy * ayl + wz * azl)
                                d2 = wx * wx + wy * wy + wz * wz
                                perp = jnp.sqrt(jnp.maximum(
                                    d2 - along * along, 0.0))
                                outside = (perp * cmin - along * sin_c
                                           > er)
                                behind = along < -er
                                ok_c = jnp.logical_not(
                                    coherent & (outside | behind))
                                if conv:
                                    ok_c = ok_c & jnp.logical_not(
                                        _conv_backface(
                                            tbounds_ref, c, axl, ayl,
                                            azl, cmin, sin_c, conv_ok))
                                ed = jnp.maximum(along - er, 0.0)
                                kk = (jax.lax.bitcast_convert_type(
                                    ed, jnp.int32) & ~255) | c
                                ckeys.append(jnp.where(ok_c, kk,
                                                       INF_BITS))
                            kvec0 = jnp.stack(ckeys)[None, :]

                            def visit_rank(r, kv):
                                mkey = jnp.min(kv)

                                @pl.when(mkey < INF_BITS)
                                def _():
                                    cd = mkey & 255
                                    bx = tbounds_ref[0, cd]
                                    by = tbounds_ref[1, cd]
                                    bz = tbounds_ref[2, cd]
                                    br = tbounds_ref[3, cd]
                                    wx = bx - mx
                                    wy = by - my
                                    wz = bz - mz
                                    d2 = (wx * wx + wy * wy + wz * wz)
                                    t_hit = jax.lax.bitcast_convert_type(
                                        bobj_s[:, :] & trunc_w,
                                        jnp.float32)
                                    t_done = jnp.max(jnp.where(
                                        sel, jnp.minimum(t_hit, tmx_l),
                                        0.0))
                                    far = (jnp.sqrt(d2) - (br + orad)
                                           > t_done)

                                    @pl.when(jnp.logical_not(far))
                                    def _():
                                        s0 = pl.multiple_of(cd * chunk,
                                                            chunk)
                                        bobj_s[:, :] = jnp.minimum(
                                            bobj_s[:, :],
                                            _mt_chunk(tri_ref, s0, chunk,
                                                      olx, oly, olz, dlx,
                                                      dly, dlz, tmn_l,
                                                      tmx_l, trunc_w))
                                return jnp.where(kv == mkey, INF_BITS,
                                                 kv)

                            jax.lax.fori_loop(0, n_chunks, visit_rank,
                                              kvec0)
                        else:
                            for c in range(n_chunks):
                                bx = tbounds_ref[0, c]
                                by = tbounds_ref[1, c]
                                bz = tbounds_ref[2, c]
                                br = tbounds_ref[3, c]
                                wx, wy, wz = bx - mx, by - my, bz - mz
                                er = br + orad
                                along = wx * axl + wy * ayl + wz * azl
                                d2 = wx * wx + wy * wy + wz * wz
                                perp = jnp.sqrt(jnp.maximum(
                                    d2 - along * along, 0.0))
                                outside = perp * cmin - along * sin_c > er
                                behind = along < -er
                                t_hit = jax.lax.bitcast_convert_type(
                                    bobj_s[:, :] & trunc_w, jnp.float32)
                                t_done = jnp.max(jnp.where(
                                    sel, jnp.minimum(t_hit, tmx_l), 0.0))
                                far = jnp.sqrt(d2) - er > t_done
                                possible = jnp.logical_not(
                                    (coherent & (outside | behind)) | far)
                                if conv:
                                    possible = possible & jnp.logical_not(
                                        _conv_backface(tbounds_ref, c, axl,
                                                       ayl, azl, cmin,
                                                       sin_c, conv_ok))

                                @pl.when(possible)
                                def _():
                                    bobj_s[:, :] = jnp.minimum(
                                        bobj_s[:, :],
                                        _mt_chunk(tri_ref, c * chunk,
                                                  chunk, olx, oly, olz,
                                                  dlx, dly, dlz, tmn_l,
                                                  tmx_l, trunc_w))

                        best_obj = bobj_s[:, :]
                        t_obj = jax.lax.bitcast_convert_type(
                            best_obj & trunc_w, jnp.float32)
                        t_w = t_obj * s_w
                        packed_w = (jax.lax.bitcast_convert_type(
                            t_w, jnp.int32) & trunc_w) \
                            | (best_obj & ~trunc_w)
                        packed_w = jnp.where(best_obj < INF_BITS,
                                             packed_w, INF_BITS)
                        better = sel & (packed_w < best_ref[:, :])
                        best_ref[:, :] = jnp.where(better, packed_w,
                                                   best_ref[:, :])
                        binst_ref[:, :] = jnp.where(better, k,
                                                    binst_ref[:, :])
                    return 0

                jax.lax.fori_loop(kmin, kmax + 1, visit_cand, 0)


@functools.partial(jax.jit, static_argnames=("iters", "m_tbl", "n_ichunks",
                                             "inst_chunk", "n_chunks",
                                             "chunk", "interpret",
                                             "conv", "conv_r"))
def cand_fused(rays_planar, inst_tbl, inst_bounds, bscan_tblT, tri_bounds,
               tri_tbl, iters: int, m_tbl: int, n_ichunks: int,
               inst_chunk: int, n_chunks: int, chunk: int,
               interpret=False, conv=False, conv_r=0.0):
    """One-launch fused candidate iteration (see _cand_fused_kernel).
    Returns (best_packed_world, best_inst_pos, final_key), each (1, N)."""
    n = rays_planar.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)
    f_pad = tri_tbl.shape[0]
    m_pad = bscan_tblT.shape[0]
    return pl.pallas_call(
        functools.partial(_cand_fused_kernel, iters=iters, m_tbl=m_tbl,
                          n_ichunks=n_ichunks, inst_chunk=inst_chunk,
                          n_chunks=n_chunks, chunk=chunk,
                          pos_bits=_pos_bits(f_pad),
                          bs_pos_bits=_pos_bits(m_pad),
                          conv=conv, conv_r=conv_r),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, inst_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((4, inst_bounds.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((m_pad, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tri_bounds.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((f_pad, 9), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.int32),
                   jax.ShapeDtypeStruct((1, n), jnp.int32),
                   jax.ShapeDtypeStruct((1, n), jnp.int32)),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
                        pltpu.VMEM((1, RAY_BLOCK), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=45 * n * (n_ichunks * inst_chunk + iters
                            * tri_tbl.shape[0] // 4),
            bytes_accessed=(8 + 3) * n * 4,
            transcendentals=n * n_chunks),
        interpret=interpret,
    )(rays_planar, inst_tbl, inst_bounds, bscan_tblT, tri_bounds, tri_tbl)


def make_bscan_table(inst_tbl):
    """Bound-scan table from the per-frame TLAS instance table: transposed
    (M_pad128, 4) rows [cx cy cz ccrr], ccrr = |c|^2 - r^2 with +1e30 on
    padded rows (brw = 0) so their discriminant is negative. Jit-safe."""
    m = inst_tbl.shape[1]
    m_pad = -(-m // BSCAN_CHUNK) * BSCAN_CHUNK
    cx, cy, cz = inst_tbl[0], inst_tbl[1], inst_tbl[2]
    r = inst_tbl[8]
    ccrr = jnp.where(r > 0.0, cx * cx + cy * cy + cz * cz - r * r, 1e30)
    tbl = jnp.stack([cx, cy, cz, ccrr], axis=1)           # (M, 4)
    return jnp.pad(tbl, ((0, m_pad - m), (0, 0)),
                   constant_values=0.0).at[m:, 3].set(1e30)


def intersect_mesh_instances_cand_fused(rays_planar, inst_tbl, inst_bounds,
                                        tri_bounds, tri_tbl,
                                        n_ichunks: int, inst_chunk: int,
                                        n_chunks: int, chunk: int,
                                        iters: int = 6, interpret=False,
                                        conv=False, conv_r=0.0):
    """Single-launch fused variant of intersect_mesh_instances_cand (see
    _cand_fused_kernel); same contract."""
    m_tbl = inst_tbl.shape[1]
    bscan = make_bscan_table(inst_tbl)
    trunc_f = ~((1 << _pos_bits(tri_tbl.shape[0])) - 1)

    best, binst, key = cand_fused(
        rays_planar, inst_tbl, inst_bounds, bscan, tri_bounds, tri_tbl,
        iters, m_tbl, n_ichunks, inst_chunk, n_chunks, chunk,
        interpret=interpret, conv=conv, conv_r=conv_r)

    t_w = jax.lax.bitcast_convert_type(best & trunc_f, jnp.float32)
    unresolved = key < INF_BITS
    rays_fb = rays_planar.at[7:8, :].set(jnp.where(
        unresolved, jnp.minimum(rays_planar[7:8, :], t_w),
        rays_planar[6:7, :] - 1.0))
    t_fb, face_fb, inst_fb = intersect_mesh_instances(
        rays_fb, inst_tbl, inst_bounds, tri_bounds, tri_tbl, n_ichunks,
        inst_chunk, n_chunks, chunk, interpret=interpret, conv=conv,
        conv_r=conv_r)

    t_w1 = t_w[0]
    face = (best & ~trunc_f)[0]
    fb_better = unresolved[0] & (t_fb < t_w1)
    t_out = jnp.where(fb_better, t_fb,
                      jnp.where(best[0] < INF_BITS, t_w1, jnp.inf))
    face = jnp.where(fb_better, face_fb, face)
    inst = jnp.where(fb_better, inst_fb,
                     jnp.minimum(binst[0], m_tbl - 1))
    return t_out, face, inst


def intersect_mesh_instances_cand(rays_planar, inst_tbl, inst_bounds,
                                  tri_bounds, tri_tbl, n_ichunks: int,
                                  inst_chunk: int, n_chunks: int,
                                  chunk: int, iters: int = 6,
                                  interpret=False, conv=False,
                                  conv_r=0.0):
    """Candidate-iteration instanced closest hit: front-to-back TLAS
    enumeration (bound_scan) + dense shared-BLAS sweeps, with the serial
    per-block instance walk (intersect_mesh_instances) only as the exact
    backstop for rays still unresolved after `iters` candidates.

    Same contract as intersect_mesh_instances: returns (t_world (N,),
    face (N,), inst_pos (N,)) with inst_pos a SORTED-table position."""
    n = rays_planar.shape[1]
    bscan = make_bscan_table(inst_tbl)
    m_pad = bscan.shape[0]
    m_tbl = inst_tbl.shape[1]
    pos_mask = (1 << _pos_bits(m_pad)) - 1

    tmax0 = rays_planar[7:8, :]
    trunc_f = ~((1 << _pos_bits(tri_tbl.shape[0])) - 1)

    def tighten(best):
        t_b = jax.lax.bitcast_convert_type(best & trunc_f, jnp.float32)
        return rays_planar.at[7:8, :].set(jnp.minimum(tmax0, t_b))

    cursor = jnp.full((1, n), -1, jnp.int32)
    best = jnp.full((1, n), INF_BITS, jnp.int32)
    binst = jnp.zeros((1, n), jnp.int32)
    rays_cur = rays_planar
    for _ in range(iters):
        key = bound_scan(rays_cur, bscan, m_pad // BSCAN_CHUNK,
                         BSCAN_CHUNK, cursor, interpret=interpret)
        # Dead marker m_tbl also guards the SMEM instance reads: valid
        # keys only ever name real (brw > 0) rows < m_tbl.
        cand = jnp.where(key < INF_BITS, key & pos_mask, m_tbl)
        best, binst = shared_blas_sweep(
            rays_cur, cand, best, binst, inst_tbl, tri_bounds, tri_tbl,
            m_tbl, n_chunks, chunk, interpret=interpret, conv=conv,
            conv_r=conv_r)
        cursor = key
        rays_cur = tighten(best)

    # Exact backstop: rays with a remaining overlapping bound run the
    # full serial kernel on their tightened range (dead-block culls make
    # this near-free when the set is empty).
    key = bound_scan(rays_cur, bscan, m_pad // BSCAN_CHUNK, BSCAN_CHUNK,
                     cursor, interpret=interpret)
    unresolved = key < INF_BITS
    rays_fb = rays_cur.at[7:8, :].set(
        jnp.where(unresolved, rays_cur[7:8, :], rays_cur[6:7, :] - 1.0))
    t_fb, face_fb, inst_fb = intersect_mesh_instances(
        rays_fb, inst_tbl, inst_bounds, tri_bounds, tri_tbl, n_ichunks,
        inst_chunk, n_chunks, chunk, interpret=interpret, conv=conv,
        conv_r=conv_r)

    t_w = jax.lax.bitcast_convert_type(best & trunc_f, jnp.float32)[0]
    face = (best & ~trunc_f)[0]
    fb_better = unresolved[0] & (t_fb < t_w)
    t_w = jnp.where(fb_better, t_fb, jnp.where(best[0] < INF_BITS,
                                               t_w, jnp.inf))
    face = jnp.where(fb_better, face_fb, face)
    inst = jnp.where(fb_better, inst_fb,
                     jnp.minimum(binst[0], m_tbl - 1))
    return t_w, face, inst


def build_mesh_tables(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
                      chunk: int = TRI_CHUNK):
    """Host-side BLAS build: Morton-order faces by centroid, pad to a chunk
    multiple with degenerate rows (e1 = e2 = 0 never hit), compute
    per-chunk bounding spheres + outward normal cones, and detect mesh
    convexity (consistent winding + every vertex behind every face plane).
    Returns (order (F,), tri_tbl (F_pad, 9), tri_bounds (8, C_pad)
    [rows 0-3 center/radius, rows 4-7 outward-normal cone axis/min-cos],
    n_chunks, convex). Runs once per mesh (numpy)."""
    from ..models.clusters import _morton3

    f = v0.shape[0]
    cent = v0 + (e1 + e2) / 3.0
    lo = cent.min(axis=0)
    span = np.maximum(cent.max(axis=0) - lo, 1e-9)
    quant = np.clip((cent - lo) / span * 1023.0, 0, 1023).astype(np.uint64)
    order = np.argsort(_morton3(quant), kind="stable").astype(np.int32)

    f_pad = -(-f // chunk) * chunk
    tbl = np.zeros((f_pad, 9), np.float32)
    tbl[:f, 0:3] = v0[order]
    tbl[:f, 3:6] = e1[order]
    tbl[:f, 6:9] = e2[order]

    # Convexity + winding orientation (float64 for the plane tests).
    v0o = tbl[:f, 0:3].astype(np.float64)
    e1o = tbl[:f, 3:6].astype(np.float64)
    e2o = tbl[:f, 6:9].astype(np.float64)
    n_vec = np.cross(e1o, e2o)
    nn = np.linalg.norm(n_vec, axis=1)
    good = nn > 1e-12
    convex = False
    un_rows = np.zeros((f_pad, 3), np.float32)   # outward unit normals
    if good.any():
        unit = n_vec[good] / nn[good][:, None]
        ctr_mesh = cent.mean(axis=0)
        cgood = (v0o + (e1o + e2o) / 3.0)[good]
        side = np.einsum("fi,fi->f", unit, cgood - ctr_mesh)
        sgn = 1.0 if (side > 0).all() else (-1.0 if (side < 0).all()
                                            else 0.0)
        if sgn != 0.0:
            pts_all = np.concatenate([v0o, v0o + e1o, v0o + e2o])
            scale = np.abs(pts_all).max() + 1e-9
            # Dedup corners (grid-snap) to keep the (V, F) test small.
            key = np.round(pts_all / (scale * 1e-6)).astype(np.int64)
            _, uniq = np.unique(key, axis=0, return_index=True)
            pts = pts_all[uniq]
            d = pts @ (sgn * unit).T \
                - np.einsum("fi,fi->f", sgn * unit, v0o[good])
            convex = bool(d.max() <= 1e-5 * scale)
            if convex:
                un_rows[:f][good] = (sgn * unit).astype(np.float32)

    n_chunks = f_pad // chunk
    bounds = np.zeros((8, -(-n_chunks // 8) * 8), np.float32)
    bounds[7, :] = -1.0                 # full-spread cone: never culled
    valid_rows = np.zeros(f_pad, bool)
    valid_rows[:f] = good
    for c in range(n_chunks):
        rows = tbl[c * chunk:(c + 1) * chunk]
        pts = np.concatenate([rows[:, 0:3],
                              rows[:, 0:3] + rows[:, 3:6],
                              rows[:, 0:3] + rows[:, 6:9]])
        ctr = pts.mean(axis=0)
        bounds[0:3, c] = ctr
        bounds[3, c] = np.sqrt(((pts - ctr) ** 2).sum(-1)).max() + 1e-5
        vr = valid_rows[c * chunk:(c + 1) * chunk]
        if convex and vr.any():
            nrm = un_rows[c * chunk:(c + 1) * chunk][vr]
            an = nrm.mean(axis=0)
            ln = np.linalg.norm(an)
            if ln > 1e-6:
                an = an / ln
                bounds[4:7, c] = an
                bounds[7, c] = max(float((nrm @ an).min()) - 1e-6, -1.0)
    return order, tbl, bounds, n_chunks, convex


def _spread_bits(v):
    """10-bit -> 30-bit Morton spread, jnp (the in-jit mirror of
    models/clusters._morton3's numpy spread)."""
    v = v.astype(jnp.uint32) & 0x3FF
    v = (v | (v << 16)) & 0x030000FF
    v = (v | (v << 8)) & 0x0300F00F
    v = (v | (v << 4)) & 0x030C30C3
    v = (v | (v << 2)) & 0x09249249
    return v


def make_inst_tables(center, rotation, scale, bound_radius,
                     inst_chunk: int = INST_CHUNK, sort_origin=None):
    """Per-frame TLAS build (jitted — the refit analogue of the
    reference's per-frame TLAS update, Source/RaytracingHelpers.ixx:28-105):

    1. Morton-sort instances by center so consecutive table entries are
       spatially local,
    2. group runs of `inst_chunk` into TLAS chunks with covering bounding
       spheres (the kernel's first-level scalar cull),
    3. order chunks near-to-far from `sort_origin` (typically the mean live
       ray origin) so the kernel's closest-hit distance early-out tightens
       as early as possible.

    Returns (inst_tbl (9, M_pad), inst_bounds (4, IC_pad), order (M_pad,)
    mapping sorted position -> original instance id (-1 on padding),
    n_ichunks)."""
    mcount = center.shape[0]
    n_ic = -(-mcount // inst_chunk)
    m_pad = n_ic * inst_chunk

    lo = jnp.min(center, axis=0)
    span = jnp.maximum(jnp.max(center, axis=0) - lo, 1e-6)
    q = jnp.clip((center - lo) / span * 1023.0, 0.0, 1023.0)
    code = (_spread_bits(q[:, 0]) | (_spread_bits(q[:, 1]) << 1)
            | (_spread_bits(q[:, 2]) << 2))
    order = jnp.argsort(code).astype(jnp.int32)
    order = jnp.pad(order, (0, m_pad - mcount), constant_values=-1)

    valid = order >= 0
    idx = jnp.maximum(order, 0)
    sc = jnp.where(valid[:, None], center[idx], 0.0)        # (M_pad, 3)
    sr = jnp.where(valid, (bound_radius * scale)[idx], 0.0)  # (M_pad,)

    # Chunk bounds: centroid of valid members + covering radius.
    scc = sc.reshape(n_ic, inst_chunk, 3)
    vcc = valid.reshape(n_ic, inst_chunk)
    src = sr.reshape(n_ic, inst_chunk)
    cnt = jnp.maximum(jnp.sum(vcc, axis=1, keepdims=True), 1)
    ctr = jnp.sum(scc * vcc[..., None], axis=1) / cnt        # (IC, 3)
    d = jnp.sqrt(jnp.sum((scc - ctr[:, None, :]) ** 2, axis=-1))
    rad = jnp.max(jnp.where(vcc, d + src, 0.0), axis=1) + 1e-5

    if sort_origin is not None:
        dist = jnp.sqrt(jnp.sum((ctr - sort_origin) ** 2, axis=-1))
        corder = jnp.argsort(dist).astype(jnp.int32)
        ctr = ctr[corder]
        rad = rad[corder]
        order = (order.reshape(n_ic, inst_chunk)[corder]).reshape(m_pad)
        valid = order >= 0
        idx = jnp.maximum(order, 0)

    ic_pad = -(-n_ic // 8) * 8
    inst_bounds = jnp.zeros((4, ic_pad), jnp.float32)
    inst_bounds = inst_bounds.at[0:3, :n_ic].set(jnp.transpose(ctr))
    inst_bounds = inst_bounds.at[3, :n_ic].set(rad)

    inv_s = 1.0 / jnp.maximum(scale, 1e-12)

    def row(x, fill=0.0):
        return jnp.where(valid, x[idx].astype(jnp.float32), fill)

    inst_tbl = jnp.stack([
        row(center[:, 0]), row(center[:, 1]), row(center[:, 2]),
        row(rotation[:, 0]), row(rotation[:, 1]), row(rotation[:, 2]),
        row(rotation[:, 3], 1.0),
        row(inv_s, 1.0),
        row(bound_radius * scale),   # padded rows: brw = 0 -> never cull in
    ])
    return inst_tbl, inst_bounds, order, n_ic


def refine_hit(mesh, mi, origin, direction, t_trunc, face, inst):
    """Exact (t, u, v) for the kernel's winning (instance, face) per ray:
    one Moller-Trumbore evaluation in object space — O(rays). Replaces the
    pos_bits of mantissa the packed encoding truncated and yields the
    barycentrics the kernel doesn't carry."""
    from ..utils import math as m

    hit = jnp.isfinite(t_trunc)
    rot = mi.rotation[inst]
    pos_i = mi.center[inst]
    inv_s = (1.0 / jnp.maximum(mi.scale, 1e-12))[inst][..., None]
    inv_rot = m.quat_conj(rot)
    o_l = m.quat_rotate(inv_rot, origin - pos_i) * inv_s
    d_l = m.quat_rotate(inv_rot, direction) * inv_s

    v0 = mesh.v0[face]
    e1 = mesh.e1[face]
    e2 = mesh.e2[face]
    pvec = jnp.cross(d_l, e2)
    det = jnp.sum(pvec * e1, axis=-1)
    inv = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1.0)
    tvec = o_l - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(qvec * d_l, axis=-1) * inv
    t = jnp.sum(qvec * e2, axis=-1) * inv
    t = jnp.where(hit & (jnp.abs(det) > 1e-20), t, jnp.inf)
    return t, jnp.clip(u, 0.0, 1.0), jnp.clip(v, 0.0, 1.0)
