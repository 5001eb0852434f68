"""Pallas TPU kernel for ray-sphere closest-hit intersection.

The hot op of the framework — the TPU replacement for hardware RT-core
traversal (/root/reference/Shaders/RaytracingHelpers.hlsli:7-55). The XLA
brute-force formulation (ops/intersect.py) materializes (rays × spheres)
intermediates in HBM; this kernel keeps the whole sphere table and every
intermediate in VMEM, streaming only the ray SoA in and (t, index) out.

Layout: rays are planar (8, N) — components in sublanes, rays in lanes —
so the (spheres × rays) work tile is a native (sublane, lane) 2D block.
Spheres are planar (4, K_pad): cx, cy, cz, radius; entries padded with
radius 0 never intersect. Each grid program handles RAY_BLOCK lanes and
loops over sphere chunks of SPHERE_CHUNK sublanes, carrying the running
closest (t, index).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RAY_BLOCK = 2048      # lanes per grid program (multiple of 128). Measured
                      # best at 1080p: 4096 halves the ~5 us/program fixed
                      # cost but the (chunk, 4096) sweep temps pressure
                      # VMEM and cost more than the floor saved.
SPHERE_CHUNK = 128    # sphere sublanes per inner step (multiple of 8)
INF = float("inf")    # python literal — jnp constants can't be captured
                      # by a pallas kernel body


def _kernel(rays_ref, spheres_ref, t_ref, idx_ref, *, sphere_chunks: int):
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]

    t_ref[:, :] = jnp.full(ox.shape, INF, jnp.float32)
    idx_ref[:, :] = jnp.zeros(ox.shape, jnp.int32)

    # Dead-block skip: terminated/padded lanes carry tmax < tmin (the
    # wavefront loop marks them), so sky tiles and late-bounce-dead tiles
    # cost one reduction instead of the sphere sweep.
    @pl.when(jnp.any(tmax >= tmin))
    def _():
        od = ox * dx + oy * dy + oz * dz          # (1, R)
        oo = ox * ox + oy * oy + oz * oz          # (1, R)

        best_t = jnp.full(ox.shape, INF, jnp.float32)
        best_i = jnp.zeros(ox.shape, jnp.int32)

        for c in range(sphere_chunks):
            s0 = c * SPHERE_CHUNK
            cx = spheres_ref[0:1, s0:s0 + SPHERE_CHUNK]   # (1, S)
            cy = spheres_ref[1:2, s0:s0 + SPHERE_CHUNK]
            cz = spheres_ref[2:3, s0:s0 + SPHERE_CHUNK]
            r = spheres_ref[3:4, s0:s0 + SPHERE_CHUNK]

            # (S, R) quadratic coefficients via rank-1 broadcasts.
            cxT, cyT, czT, rT = (jnp.transpose(cx), jnp.transpose(cy),
                                 jnp.transpose(cz), jnp.transpose(r))
            b = od - (cxT * dx + cyT * dy + czT * dz)
            c0 = oo - 2.0 * (cxT * ox + cyT * oy + czT * oz) \
                + (cxT * cxT + cyT * cyT + czT * czT - rT * rT)
            disc = b * b - c0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            t_near = -b - sq
            t_far = -b + sq
            t = jnp.where(t_near >= tmin, t_near, t_far)
            valid = (disc > 0.0) & (t >= tmin) & (t <= tmax) & (rT > 0.0)
            t = jnp.where(valid, t, INF)

            chunk_t = jnp.min(t, axis=0, keepdims=True)          # (1, R)
            chunk_arg = jnp.argmin(t, axis=0).astype(jnp.int32)  # (R,)
            chunk_i = chunk_arg.reshape(chunk_t.shape) + s0
            closer = chunk_t < best_t
            best_t = jnp.where(closer, chunk_t, best_t)
            best_i = jnp.where(closer, chunk_i, best_i)

        t_ref[:, :] = best_t
        idx_ref[:, :] = best_i


def _morton_kernel(rays_ref, bounds_ref, table_ref, t_ref, idx_ref,
                   best_t_s, best_i_s, *, n_chunks: int, chunk: int):
    """Flat sweep over a Morton-ordered sphere table with per-chunk bound
    culling: the sphere table keeps the flat kernel's planar layout and
    static slicing (full Mosaic pipelining), but consecutive columns are
    spatially local, so each 128-wide chunk carries a tight bounding sphere
    (in SMEM) and a whole chunk is skipped when no ray in the block can
    touch it. Statically unrolled — no dynamic-index loads.

    Two-level cull per (block, chunk): first a SCALAR bounding-cone test —
    the block's live rays are summarized as an origin sphere + direction
    cone via masked reductions, and a chunk whose bound lies outside the
    cone is skipped without any per-ray math (this is what makes screen-
    tile-ordered primary and shadow blocks cheap); only then the per-ray
    interval test gates the member sweep."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]

    best_t_s[:, :] = jnp.full(ox.shape, INF, jnp.float32)
    best_i_s[:, :] = jnp.zeros(ox.shape, jnp.int32)

    @pl.when(jnp.any(tmax >= tmin))
    def _():
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz

        # --- block ray-bundle summary (masked scalar reductions) ---------
        live = tmax >= tmin
        livef = live.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(livef), 1.0)
        mx = jnp.sum(jnp.where(live, ox, 0.0)) / cnt
        my = jnp.sum(jnp.where(live, oy, 0.0)) / cnt
        mz = jnp.sum(jnp.where(live, oz, 0.0)) / cnt
        orad2 = jnp.max(jnp.where(
            live, (ox - mx) ** 2 + (oy - my) ** 2 + (oz - mz) ** 2, 0.0))
        orad = jnp.sqrt(orad2)
        ax = jnp.sum(jnp.where(live, dx, 0.0))
        ay = jnp.sum(jnp.where(live, dy, 0.0))
        az = jnp.sum(jnp.where(live, dz, 0.0))
        alen = jnp.sqrt(ax * ax + ay * ay + az * az)
        inv_alen = 1.0 / jnp.maximum(alen, 1e-12)
        ax, ay, az = ax * inv_alen, ay * inv_alen, az * inv_alen
        # cone half-angle: min cos over live rays (dirs are unit). A spread
        # beyond 90° (cmin <= 0) voids the cone/behind tests entirely —
        # incoherent blocks fall back to per-ray culling only.
        cmin = jnp.min(jnp.where(live, ax * dx + ay * dy + az * dz, 1.0))
        coherent = cmin > 0.0
        cmin = jnp.maximum(cmin, 0.0)
        sin_c = jnp.sqrt(jnp.maximum(1.0 - cmin * cmin, 0.0))

        for c in range(n_chunks):
            bx = bounds_ref[0, c]
            by = bounds_ref[1, c]
            bz = bounds_ref[2, c]
            br = bounds_ref[3, c]

            # Scalar cone-vs-sphere: expand the chunk bound by the origin
            # spread, test against the direction cone from the centroid.
            vx, vy, vz = bx - mx, by - my, bz - mz
            er = br + orad
            along = vx * ax + vy * ay + vz * az
            d2 = vx * vx + vy * vy + vz * vz
            perp = jnp.sqrt(jnp.maximum(d2 - along * along, 0.0))
            # Signed distance of the (expanded) sphere center outside the
            # cone surface: positive and > er means no ray can reach it.
            outside_cone = perp * cmin - along * sin_c > er
            behind = along < -er
            # Closest-hit early-out (block-granular front-to-back BVH
            # analogue): once EVERY live lane holds a hit closer than this
            # chunk's nearest possible intersection, skip it. Fires for
            # direction-incoherent but origin-clustered bounce blocks,
            # where the cone test is void.
            t_done = jnp.max(jnp.where(live, best_t_s[:, :], 0.0))
            too_far = jnp.sqrt(d2) - er > t_done
            chunk_possible = jnp.logical_not(
                (coherent & (outside_cone | behind)) | too_far)

            @pl.when(chunk_possible)
            def _():
                b = od - (bx * dx + by * dy + bz * dz)
                c0 = oo - 2.0 * (bx * ox + by * oy + bz * oz) \
                    + (bx * bx + by * by + bz * bz - br * br)
                disc = b * b - c0
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                touched = (disc > 0.0) & (-b - sq <= tmax) & (-b + sq >= tmin)

                @pl.when(jnp.any(touched))
                def _():
                    s0 = c * chunk
                    cxT = jnp.transpose(table_ref[0:1, s0:s0 + chunk])
                    cyT = jnp.transpose(table_ref[1:2, s0:s0 + chunk])
                    czT = jnp.transpose(table_ref[2:3, s0:s0 + chunk])
                    objT = jnp.transpose(table_ref[4:5, s0:s0 + chunk])
                    m2xT = jnp.transpose(table_ref[5:6, s0:s0 + chunk])
                    m2yT = jnp.transpose(table_ref[6:7, s0:s0 + chunk])
                    m2zT = jnp.transpose(table_ref[7:8, s0:s0 + chunk])
                    ccrrT = jnp.transpose(table_ref[8:9, s0:s0 + chunk])

                    b2 = od - (cxT * dx + cyT * dy + czT * dz)
                    # -2c and |c|^2 - r^2 precomputed in the table rows;
                    # padded entries carry ccrr = +1e30 so disc < 0 stands
                    # in for the radius test.
                    c2 = oo + (m2xT * ox + m2yT * oy + m2zT * oz) + ccrrT
                    disc2 = b2 * b2 - c2
                    sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
                    t_near = -b2 - sq2
                    t_far = -b2 + sq2
                    t = jnp.where(t_near >= tmin, t_near, t_far)
                    valid = (disc2 > 0.0) & (t >= tmin) & (t <= tmax)
                    t = jnp.where(valid, t, INF)

                    chunk_t = jnp.min(t, axis=0, keepdims=True)
                    arg = jnp.argmin(t, axis=0)
                    lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                    onehot = lane == arg[None, :]
                    chunk_obj = jnp.sum(jnp.where(onehot, objT, 0.0),
                                        axis=0,
                                        keepdims=True).astype(jnp.int32)

                    cur_t = best_t_s[:, :]
                    closer = chunk_t < cur_t
                    best_t_s[:, :] = jnp.where(closer, chunk_t, cur_t)
                    best_i_s[:, :] = jnp.where(closer, chunk_obj,
                                               best_i_s[:, :])

    t_ref[:, :] = best_t_s[:, :]
    idx_ref[:, :] = best_i_s[:, :]


@functools.partial(jax.jit, static_argnames=("n_chunks", "chunk",
                                             "interpret"))
def intersect_morton_planar(rays_planar, bounds_tbl, table, n_chunks: int,
                            chunk: int, interpret=False):
    """Morton-chunk-culled closest hit. rays_planar: (8, N);
    bounds_tbl: (4, C_pad) chunk bounds (SMEM); table: (9, n_chunks*chunk)
    planar Morton-ordered spheres [cx cy cz r obj -2cx -2cy -2cz |c|^2-r^2]
    (models/clusters.make_morton_accel)."""
    n = rays_planar.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)

    t, idx = pl.pallas_call(
        functools.partial(_morton_kernel, n_chunks=n_chunks, chunk=chunk),
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bounds_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=25 * n * (n_chunks + table.shape[1]),
            bytes_accessed=(8 + 2) * n * 4,
            transcendentals=n * n_chunks),
        interpret=interpret,
    )(rays_planar, bounds_tbl, table)
    return t[0], idx[0]


def _morton_mxu_kernel(rays_ref, bounds_ref, table_ref, a_ref, t_ref,
                       idx_ref, best_t_s, best_i_s, *, n_chunks: int,
                       chunk: int):
    """MXU variant of the Morton sweep: the per-(sphere, ray) quadratic
    coefficients b = od - c·d and the c·o part of c0 are rank-8 matmuls
    (chunk A-matrix (2*chunk, 8) @ ray matrix (8, R)), so they run on the
    systolic array instead of the VPU — the VPU keeps only disc/sqrt/
    select/argmin (~21 ops/pair vs ~33). A rows per chunk (built in
    models/clusters.make_mxu_tables):
      rows [0, chunk):        [-cx -cy -cz  0    0    0   1  0]
      rows [chunk, 2*chunk):  [ 0   0   0  -2cx -2cy -2cz 0  |c|^2-r^2]
    against X = [dx dy dz ox oy oz od 1], so Y[:chunk] = b and
    Y[chunk:] + oo = c0. Padded spheres carry |c|^2-r^2 = +1e30, which
    forces disc < 0 (replaces the rT > 0 test)."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]

    best_t_s[:, :] = jnp.full(ox.shape, INF, jnp.float32)
    best_i_s[:, :] = jnp.zeros(ox.shape, jnp.int32)

    @pl.when(jnp.any(tmax >= tmin))
    def _():
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz
        x = jnp.concatenate(
            [dx, dy, dz, ox, oy, oz, od, jnp.ones(ox.shape, jnp.float32)],
            axis=0)                                   # (8, R)

        # Block ray-bundle summary for the scalar chunk cull (identical to
        # _morton_kernel).
        live = tmax >= tmin
        livef = live.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(livef), 1.0)
        mx = jnp.sum(jnp.where(live, ox, 0.0)) / cnt
        my = jnp.sum(jnp.where(live, oy, 0.0)) / cnt
        mz = jnp.sum(jnp.where(live, oz, 0.0)) / cnt
        orad = jnp.sqrt(jnp.max(jnp.where(
            live, (ox - mx) ** 2 + (oy - my) ** 2 + (oz - mz) ** 2, 0.0)))
        ax = jnp.sum(jnp.where(live, dx, 0.0))
        ay = jnp.sum(jnp.where(live, dy, 0.0))
        az = jnp.sum(jnp.where(live, dz, 0.0))
        inv_alen = 1.0 / jnp.maximum(
            jnp.sqrt(ax * ax + ay * ay + az * az), 1e-12)
        ax, ay, az = ax * inv_alen, ay * inv_alen, az * inv_alen
        cmin = jnp.min(jnp.where(live, ax * dx + ay * dy + az * dz, 1.0))
        coherent = cmin > 0.0
        cmin = jnp.maximum(cmin, 0.0)
        sin_c = jnp.sqrt(jnp.maximum(1.0 - cmin * cmin, 0.0))

        for c in range(n_chunks):
            bx = bounds_ref[0, c]
            by = bounds_ref[1, c]
            bz = bounds_ref[2, c]
            br = bounds_ref[3, c]
            vx, vy, vz = bx - mx, by - my, bz - mz
            er = br + orad
            along = vx * ax + vy * ay + vz * az
            d2 = vx * vx + vy * vy + vz * vz
            perp = jnp.sqrt(jnp.maximum(d2 - along * along, 0.0))
            outside_cone = perp * cmin - along * sin_c > er
            behind = along < -er
            chunk_possible = jnp.logical_not(
                coherent & (outside_cone | behind))

            @pl.when(chunk_possible)
            def _():
                y = jax.lax.dot_general(
                    a_ref[2 * chunk * c:2 * chunk * (c + 1), :], x,
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)   # (2*chunk, R)
                b2 = y[:chunk]
                c2 = y[chunk:] + oo
                disc2 = b2 * b2 - c2
                sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
                t_near = -b2 - sq2
                t_far = -b2 + sq2
                t = jnp.where(t_near >= tmin, t_near, t_far)
                valid = (disc2 > 0.0) & (t >= tmin) & (t <= tmax)
                t = jnp.where(valid, t, INF)

                s0 = c * chunk
                objT = jnp.transpose(table_ref[4:5, s0:s0 + chunk])
                chunk_t = jnp.min(t, axis=0, keepdims=True)
                arg = jnp.argmin(t, axis=0)
                lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                onehot = lane == arg[None, :]
                chunk_obj = jnp.sum(jnp.where(onehot, objT, 0.0), axis=0,
                                    keepdims=True).astype(jnp.int32)

                cur_t = best_t_s[:, :]
                closer = chunk_t < cur_t
                best_t_s[:, :] = jnp.where(closer, chunk_t, cur_t)
                best_i_s[:, :] = jnp.where(closer, chunk_obj,
                                           best_i_s[:, :])

    t_ref[:, :] = best_t_s[:, :]
    idx_ref[:, :] = best_i_s[:, :]


@functools.partial(jax.jit, static_argnames=("n_chunks", "chunk",
                                             "interpret"))
def intersect_morton_mxu(rays_planar, bounds_tbl, table, a_tbl,
                         n_chunks: int, chunk: int, interpret=False):
    """MXU-offloaded Morton closest hit. a_tbl: (n_chunks*2*chunk, 8) chunk
    A-matrices (models/clusters.make_mxu_tables). Other args as
    intersect_morton_planar."""
    n = rays_planar.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)

    t, idx = pl.pallas_call(
        functools.partial(_morton_mxu_kernel, n_chunks=n_chunks,
                          chunk=chunk),
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bounds_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(a_tbl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=25 * n * (n_chunks + table.shape[1]),
            bytes_accessed=(8 + 2) * n * 4,
            transcendentals=n * n_chunks),
        interpret=interpret,
    )(rays_planar, bounds_tbl, table, a_tbl)
    return t[0], idx[0]


def _anyhit_kernel(rays_ref, bounds_ref, table_ref, occ_ref, occ_s, *,
                   n_chunks: int, chunk: int):
    """Occlusion (shadow-ray) sweep: the specialized any-hit kernel the
    reference reaches via RAY_FLAG_ACCEPT_FIRST_HIT_AND_END_SEARCH
    (RTXDIAppBridge.hlsli:418-459). No closest-t/argmin bookkeeping — just
    a running per-lane 'blocked' bit; a chunk is skipped when the block's
    cone misses it OR every live lane is already blocked. Row 8 of the ray
    SoA is an object index to EXCLUDE (the target light itself)."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]
    exclude = rays_ref[8:9, :]

    occ_s[:, :] = jnp.zeros(ox.shape, jnp.int32)

    @pl.when(jnp.any(tmax >= tmin))
    def _():
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz

        live = tmax >= tmin
        livef = live.astype(jnp.float32)
        cnt = jnp.maximum(jnp.sum(livef), 1.0)
        mx = jnp.sum(jnp.where(live, ox, 0.0)) / cnt
        my = jnp.sum(jnp.where(live, oy, 0.0)) / cnt
        mz = jnp.sum(jnp.where(live, oz, 0.0)) / cnt
        orad = jnp.sqrt(jnp.max(jnp.where(
            live, (ox - mx) ** 2 + (oy - my) ** 2 + (oz - mz) ** 2, 0.0)))
        ax = jnp.sum(jnp.where(live, dx, 0.0))
        ay = jnp.sum(jnp.where(live, dy, 0.0))
        az = jnp.sum(jnp.where(live, dz, 0.0))
        inv_alen = 1.0 / jnp.maximum(
            jnp.sqrt(ax * ax + ay * ay + az * az), 1e-12)
        ax, ay, az = ax * inv_alen, ay * inv_alen, az * inv_alen
        cmin = jnp.min(jnp.where(live, ax * dx + ay * dy + az * dz, 1.0))
        coherent = cmin > 0.0
        cmin = jnp.maximum(cmin, 0.0)
        sin_c = jnp.sqrt(jnp.maximum(1.0 - cmin * cmin, 0.0))
        # Shadow rays are range-bounded: cull chunks beyond the farthest
        # live tmax along the cone axis.
        tmax_max = jnp.max(jnp.where(live, tmax, 0.0))

        for c in range(n_chunks):
            bx = bounds_ref[0, c]
            by = bounds_ref[1, c]
            bz = bounds_ref[2, c]
            br = bounds_ref[3, c]
            vx, vy, vz = bx - mx, by - my, bz - mz
            er = br + orad
            along = vx * ax + vy * ay + vz * az
            d2 = vx * vx + vy * vy + vz * vz
            perp = jnp.sqrt(jnp.maximum(d2 - along * along, 0.0))
            outside_cone = perp * cmin - along * sin_c > er
            behind = along < -er
            too_far = d2 > (tmax_max + er) * (tmax_max + er)
            chunk_possible = jnp.logical_not(
                (coherent & (outside_cone | behind)) | too_far)
            unresolved = jnp.any((occ_s[:, :] == 0) & live)

            @pl.when(chunk_possible & unresolved)
            def _():
                s0 = c * chunk
                cxT = jnp.transpose(table_ref[0:1, s0:s0 + chunk])
                cyT = jnp.transpose(table_ref[1:2, s0:s0 + chunk])
                czT = jnp.transpose(table_ref[2:3, s0:s0 + chunk])
                objT = jnp.transpose(table_ref[4:5, s0:s0 + chunk])
                m2xT = jnp.transpose(table_ref[5:6, s0:s0 + chunk])
                m2yT = jnp.transpose(table_ref[6:7, s0:s0 + chunk])
                m2zT = jnp.transpose(table_ref[7:8, s0:s0 + chunk])
                ccrrT = jnp.transpose(table_ref[8:9, s0:s0 + chunk])

                b2 = od - (cxT * dx + cyT * dy + czT * dz)
                c2 = oo + (m2xT * ox + m2yT * oy + m2zT * oz) + ccrrT
                disc2 = b2 * b2 - c2
                sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
                t_near = -b2 - sq2
                t_far = -b2 + sq2
                t = jnp.where(t_near >= tmin, t_near, t_far)
                blocked = (disc2 > 0.0) & (t >= tmin) & (t <= tmax) \
                    & (objT != exclude)
                any_hit = jnp.sum(blocked.astype(jnp.int32), axis=0,
                                  keepdims=True)
                occ_s[:, :] = occ_s[:, :] | (any_hit > 0).astype(jnp.int32)

    occ_ref[:, :] = occ_s[:, :]


@functools.partial(jax.jit, static_argnames=("n_chunks", "chunk",
                                             "interpret"))
def occlusion_morton_planar(rays9, bounds_tbl, table, n_chunks: int,
                            chunk: int, interpret=False):
    """Any-hit occlusion over the Morton table. rays9: (9, N) planar
    [ox oy oz dx dy dz tmin tmax exclude_obj]; returns occluded (N,) bool."""
    n = rays9.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)

    occ = pl.pallas_call(
        functools.partial(_anyhit_kernel, n_chunks=n_chunks, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bounds_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=20 * n * (n_chunks + table.shape[1]),
            bytes_accessed=(9 + 1) * n * 4,
            transcendentals=n * n_chunks),
        interpret=interpret,
    )(rays9, bounds_tbl, table)
    return occ[0] > 0


def _clustered_kernel(rays_ref, bounds_ref, members_ref, t_ref, idx_ref,
                      best_t_s, best_i_s, *, n_clusters: int,
                      members_per_cluster: int):
    """Cluster-culled variant: test each ray block against C cluster bounds;
    run the member sweep only for clusters some lane can touch (predicated
    via pl.when — the block-coherent analogue of BVH traversal)."""
    ox = rays_ref[0:1, :]
    oy = rays_ref[1:2, :]
    oz = rays_ref[2:3, :]
    dx = rays_ref[3:4, :]
    dy = rays_ref[4:5, :]
    dz = rays_ref[5:6, :]
    tmin = rays_ref[6:7, :]
    tmax = rays_ref[7:8, :]

    best_t_s[:, :] = jnp.full(ox.shape, INF, jnp.float32)
    best_i_s[:, :] = jnp.zeros(ox.shape, jnp.int32)

    @pl.when(jnp.any(tmax >= tmin))
    def _():
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz
        mm = members_per_cluster

        def visit(c, _):
            # Bounds are scalars in SMEM (dynamic lane loads from VMEM are
            # not supported by Mosaic; scalar SMEM indexing is).
            bx = bounds_ref[0, c]
            by = bounds_ref[1, c]
            bz = bounds_ref[2, c]
            br = bounds_ref[3, c]
            b = od - (bx * dx + by * dy + bz * dz)
            c0 = oo - 2.0 * (bx * ox + by * oy + bz * oz) \
                + (bx * bx + by * by + bz * bz - br * br)
            disc = b * b - c0
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            # Conservative interval overlap with [tmin, tmax]; rays inside
            # the bound (c0 < 0) always pass (t_near < 0 < t_far).
            touched = (disc > 0.0) & (-b - sq <= tmax) & (-b + sq >= tmin)

            @pl.when(jnp.any(touched))
            def _():
                s0 = pl.multiple_of(c * mm, mm)
                chunk = members_ref[pl.ds(s0, mm), :]           # (M, 8)
                cx = chunk[:, 0:1]                              # (M, 1)
                cy = chunk[:, 1:2]
                cz = chunk[:, 2:3]
                r = chunk[:, 3:4]
                obj = chunk[:, 4:5]

                b2 = od - (cx * dx + cy * dy + cz * dz)
                c2 = oo - 2.0 * (cx * ox + cy * oy + cz * oz) \
                    + (cx * cx + cy * cy + cz * cz - r * r)
                disc2 = b2 * b2 - c2
                sq2 = jnp.sqrt(jnp.maximum(disc2, 0.0))
                t_near = -b2 - sq2
                t_far = -b2 + sq2
                t = jnp.where(t_near >= tmin, t_near, t_far)
                valid = (disc2 > 0.0) & (t >= tmin) & (t <= tmax) & (r > 0.0)
                t = jnp.where(valid, t, INF)

                chunk_t = jnp.min(t, axis=0, keepdims=True)        # (1, R)
                arg = jnp.argmin(t, axis=0)                        # (R,)
                lane = jax.lax.broadcasted_iota(jnp.int32, t.shape, 0)
                onehot = lane == arg[None, :]
                chunk_obj = jnp.sum(jnp.where(onehot, obj, 0.0), axis=0,
                                    keepdims=True).astype(jnp.int32)

                cur_t = best_t_s[:, :]
                closer = chunk_t < cur_t
                best_t_s[:, :] = jnp.where(closer, chunk_t, cur_t)
                best_i_s[:, :] = jnp.where(closer, chunk_obj,
                                           best_i_s[:, :])
            return 0

        jax.lax.fori_loop(0, n_clusters, visit, 0)

    t_ref[:, :] = best_t_s[:, :]
    idx_ref[:, :] = best_i_s[:, :]


@functools.partial(jax.jit,
                   static_argnames=("n_clusters", "members_per_cluster",
                                    "interpret"))
def intersect_clustered_planar(rays_planar, bounds_tbl, members_tbl,
                               n_clusters: int, members_per_cluster: int,
                               interpret=False):
    """Clustered closest-hit. rays_planar: (8, N); bounds_tbl: (4, C_pad);
    members_tbl: (5, C_pad*M) planar member tables (models/clusters.py);
    n_clusters = true (unpadded) cluster count.
    Returns (t (N,), object_index (N,) int32)."""
    n = rays_planar.shape[1]
    mm = members_per_cluster
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)

    t, idx = pl.pallas_call(
        functools.partial(_clustered_kernel, n_clusters=n_clusters,
                          members_per_cluster=mm),
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bounds_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(members_tbl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, RAY_BLOCK), jnp.float32),
            pltpu.VMEM((1, RAY_BLOCK), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=25 * n * (n_clusters + members_tbl.shape[0] // 4),
            bytes_accessed=(8 + 2) * n * 4,
            transcendentals=n * n_clusters),
        interpret=interpret,
    )(rays_planar, bounds_tbl, members_tbl)
    return t[0], idx[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def intersect_spheres_planar(rays_planar, spheres_planar, interpret=False):
    """rays_planar: (8, N) f32 [ox oy oz dx dy dz tmin tmax], N a multiple
    of RAY_BLOCK; spheres_planar: (4, K_pad) f32, K_pad a multiple of
    SPHERE_CHUNK (pad radius 0). Returns (t (N,), index (N,) int32)."""
    n = rays_planar.shape[1]
    k_pad = spheres_planar.shape[1]
    assert n % RAY_BLOCK == 0, n
    assert k_pad % SPHERE_CHUNK == 0, k_pad
    grid = (n // RAY_BLOCK,)

    t, idx = pl.pallas_call(
        functools.partial(_kernel, sphere_chunks=k_pad // SPHERE_CHUNK),
        out_shape=(jax.ShapeDtypeStruct((1, n), jnp.float32),
                   jax.ShapeDtypeStruct((1, n), jnp.int32)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, k_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=22 * n * k_pad, bytes_accessed=(8 + 2) * n * 4,
            transcendentals=n * k_pad),
        interpret=interpret,
    )(rays_planar, spheres_planar)
    return t[0], idx[0]


def pack_spheres(centers, radii):
    """(K, 3) + (K,) -> (4, K_pad) planar sphere table."""
    k = centers.shape[0]
    k_pad = -(-k // SPHERE_CHUNK) * SPHERE_CHUNK
    table = jnp.zeros((4, k_pad), jnp.float32)
    table = table.at[0, :k].set(centers[:, 0])
    table = table.at[1, :k].set(centers[:, 1])
    table = table.at[2, :k].set(centers[:, 2])
    table = table.at[3, :k].set(radii)
    return table


def pack_rays(origin, direction, t_min, t_max):
    """Flat (N, 3)/(N,) ray SoA -> padded planar (8, N_pad). Padded lanes
    get tmax < tmin so they never hit. Returns (planar, n)."""
    n = origin.shape[0]
    n_pad = -(-n // RAY_BLOCK) * RAY_BLOCK
    pad = n_pad - n

    def p(x, fill=0.0):
        x = x.astype(jnp.float32)
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, jnp.float32)])
        return x

    rays = jnp.stack([
        p(origin[:, 0]), p(origin[:, 1]), p(origin[:, 2]),
        p(direction[:, 0]), p(direction[:, 1]), p(direction[:, 2]),
        p(t_min), p(t_max, -1.0)])
    return rays, n
