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

The Morton kernels' inner loop is *select-bound*, not multiply-bound, so
the closest-hit bookkeeping uses a packed encoding (see _slim_tail): the
candidate's truncated t and table position share one i32, making a single
vector `min` carry both — ~6 fewer vector ops per (sphere, ray) pair than
the min/argmin/one-hot/select chain it replaces. The quadratic's linear
algebra can additionally ride the MXU as rank-8 chunk matmuls
(intersect_morton_mxu), leaving the VPU only sqrt/compare/min work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os_rb

RAY_BLOCK = int(_os_rb.environ.get("DRTS_RAY_BLOCK", "2048"))
                      # lanes per grid program (multiple of 128). Measured
                      # best at 1080p: 4096 halves the ~5 us/program fixed
                      # cost but the (chunk, 4096) sweep temps pressure
                      # VMEM and cost more than the floor saved. Env knob
                      # for A/Bs only; shipping default stays 2048.
SPHERE_CHUNK = 128    # sphere sublanes per inner step (multiple of 8)
INF = float("inf")    # python literal — jnp constants can't be captured
                      # by a pallas kernel body
INF_BITS = 0x7F800000  # bitcast(+inf): packed-miss sentinel (_slim_tail)

# MXU-kernel matmul precision (DRTS_MXU_PREC=default|high|highest).
# Round-2 measured the rank-8 matmuls SLOWER than the VPU sweep at
# HIGHEST (bf16x6 passes); HIGH (bf16x3: ~2^-16 rel err, comparable to
# the packed encoding's 2^-14 t truncation) halves that cost.
# Pallas' TPU lowering only accepts DEFAULT/HIGHEST dot precisions, so
# "high" is built manually: split both operands into bf16 hi+lo halves
# and take the three leading bf16 passes with f32 accumulation
# (hi@hi + hi@lo + lo@hi) — the same bf16x3 algorithm XLA calls HIGH.
import os as _os  # noqa: E402

_MXU_PREC_NAME = _os.environ.get("DRTS_MXU_PREC", "high")
_MXU_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "high": jax.lax.Precision.DEFAULT,   # unused; see _mxu_dot
    "highest": jax.lax.Precision.HIGHEST,
}[_MXU_PREC_NAME]


def _mxu_dot(a, x):
    """(M, 8) @ (8, R) f32 matmul on the MXU at the configured precision."""
    dims = (((1,), (0,)), ((), ()))
    if _MXU_PREC_NAME != "high":
        return jax.lax.dot_general(a, x, dims,
                                   preferred_element_type=jnp.float32,
                                   precision=_MXU_PRECISION)
    a_hi = a.astype(jnp.bfloat16)
    x_hi = x.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                            preferred_element_type=jnp.float32)
    return dot(a_hi, x_hi) + dot(a_hi, x_lo) + dot(a_lo, x_hi)


def _pos_bits(n_cols: int) -> int:
    """Mantissa bits claimed by the table position in the packed t|pos
    encoding (see _slim_tail)."""
    return max(1, (n_cols - 1).bit_length())


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


def _bundle_summary(ox, oy, oz, dx, dy, dz, live):
    """Block ray-bundle summary for the scalar chunk culls: live rays
    reduced to an origin sphere (centroid + spread) and a direction cone
    (mean axis + min cosine). A spread beyond 90 degrees (cmin <= 0) voids
    the cone/behind tests entirely — incoherent blocks fall back to the
    per-ray culls only."""
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
    return mx, my, mz, orad, ax, ay, az, cmin, sin_c, coherent


def _chunk_cull(bounds_ref, c, bundle, t_done):
    """Scalar chunk-possible test: cone-vs-expanded-bound + behind +
    closest-hit distance early-out. t_done = INF disables the distance
    cull (some live lane still has no hit)."""
    mx, my, mz, orad, ax, ay, az, cmin, sin_c, coherent = bundle
    bx = bounds_ref[0, c]
    by = bounds_ref[1, c]
    bz = bounds_ref[2, c]
    br = bounds_ref[3, c]
    vx, vy, vz = bx - mx, by - my, bz - mz
    er = br + orad
    along = vx * ax + vy * ay + vz * az
    d2 = vx * vx + vy * vy + vz * vz
    perp = jnp.sqrt(jnp.maximum(d2 - along * along, 0.0))
    # Signed distance of the (expanded) bound center outside the cone
    # surface: positive and > er means no ray can reach it.
    outside_cone = perp * cmin - along * sin_c > er
    behind = along < -er
    too_far = jnp.sqrt(d2) - er > t_done
    return jnp.logical_not((coherent & (outside_cone | behind)) | too_far)


def _slim_tail(b2, c2, tmin, tmax, obj_col, trunc_mask):
    """Shared per-pair closest-hit tail: quadratic roots -> packed
    (truncated t | object index) i32, then one vector `min` per chunk.

    The packing trick: for non-negative f32 the bit pattern is
    monotonically ordered, so stealing the low pos_bits mantissa bits for
    the candidate's OBJECT INDEX (obj_col: (S, 1) i32, a chunk-column
    constant broadcast across rays) makes a SINGLE i32 min do the work of
    the min/argmin/one-hot/select chain, and the winner's id falls out of
    the unpack with no post-kernel gather. t loses pos_bits of mantissa
    (rel. error 2^-(23-bits), ~6e-5 at 512 columns), always rounding DOWN;
    callers recover the exact root with one Newton step at the object-row
    gather they already do (models/scene.surface_attributes). Requires
    tmin >= 0 (negative t never packs). Misses carry INF_BITS. disc < 0
    propagates NaN through the unguarded sqrt, which fails both range
    compares — no explicit validity test needed."""
    disc2 = b2 * b2 - c2
    sq2 = jnp.sqrt(disc2)                       # NaN when disc2 < 0
    t_near = -b2 - sq2
    # Near root unless it is before tmin (ray starts inside the sphere).
    t = jnp.where(t_near >= tmin, t_near, sq2 - b2)
    ok = (t >= tmin) & (t <= tmax)              # NaN t fails both
    ti = (jax.lax.bitcast_convert_type(t, jnp.int32) & trunc_mask) | obj_col
    ti = jnp.where(ok, ti, INF_BITS)
    return jnp.min(ti, axis=0, keepdims=True)   # (1, R) packed


def _t_done(best_packed, live, trunc_mask):
    """Block-wide 'every live lane already has a hit closer than' distance
    for the chunk early-out. The truncated t underestimates the true t,
    keeping the cull conservative; lanes with no hit carry INF, which
    disables it."""
    t_best = jax.lax.bitcast_convert_type(best_packed & trunc_mask,
                                          jnp.float32)
    return jnp.max(jnp.where(live, t_best, 0.0))


def _morton_kernel(rays_ref, bounds_ref, tableT_ref, packed_ref, best_s, *,
                   n_chunks: int, chunk: int, pos_bits: int,
                   cull: bool = True):
    """Flat sweep over a Morton-ordered sphere table with per-chunk bound
    culling: consecutive table entries are spatially local, so each chunk
    carries a tight bounding sphere (in SMEM) and a whole chunk is skipped
    when no ray in the block can touch it. Statically unrolled — no
    dynamic-index loads. The sphere table arrives TRANSPOSED (cols, 9) so
    per-chunk slices are already (chunk, 1) column vectors — the planar
    (9, cols) layout cost 8 lane->sublane relayout ops per chunk.

    Two-level cull per (block, chunk): first a SCALAR bounding-cone test
    (_bundle_summary / _chunk_cull) — a chunk whose bound lies outside the
    block's ray cone is skipped without any per-ray math (this is what
    makes screen-tile-ordered primary and shadow blocks cheap); only then
    the member sweep runs. Output is _slim_tail's packed i32."""
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

    @pl.when(jnp.any(tmax >= tmin))
    def _():
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz
        live = tmax >= tmin
        bundle = _bundle_summary(ox, oy, oz, dx, dy, dz, live) if cull \
            else None

        for c in range(n_chunks):
            if cull:
                chunk_possible = _chunk_cull(
                    bounds_ref, c, bundle,
                    _t_done(best_s[:, :], live, trunc_mask))
            else:
                chunk_possible = jnp.bool_(True)

            @pl.when(chunk_possible)
            def _():
                s0 = c * chunk
                cxT = tableT_ref[s0:s0 + chunk, 0:1]
                cyT = tableT_ref[s0:s0 + chunk, 1:2]
                czT = tableT_ref[s0:s0 + chunk, 2:3]
                objT = tableT_ref[s0:s0 + chunk, 4:5].astype(jnp.int32)
                m2xT = tableT_ref[s0:s0 + chunk, 5:6]
                m2yT = tableT_ref[s0:s0 + chunk, 6:7]
                m2zT = tableT_ref[s0:s0 + chunk, 7:8]
                ccrrT = tableT_ref[s0:s0 + chunk, 8:9]

                b2 = od - (cxT * dx + cyT * dy + czT * dz)
                # -2c and |c|^2 - r^2 precomputed in the table rows;
                # padded entries carry ccrr = +1e30 so disc < 0 stands
                # in for the radius test.
                c2 = oo + (m2xT * ox + m2yT * oy + m2zT * oz) + ccrrT
                best_s[:, :] = jnp.minimum(
                    best_s[:, :],
                    _slim_tail(b2, c2, tmin, tmax, objT, trunc_mask))

    packed_ref[:, :] = best_s[:, :]


def _unpack_best(packed, table):
    """Packed (1, N) i32 -> (t (N,), object index (N,) i32). The object id
    rides the low bits (packed in-kernel from the table's obj row — no
    post-kernel gather); t keeps the truncated mantissa — callers that
    need the exact root refine it at their object-row gather
    (models/scene.surface_attributes)."""
    pos_mask = (1 << _pos_bits(table.shape[1])) - 1
    p = packed[0]
    obj = p & pos_mask                          # 0 for misses (INF_BITS)
    t = jax.lax.bitcast_convert_type(p & ~pos_mask, jnp.float32)
    return t, obj


@functools.partial(jax.jit, static_argnames=("n_chunks", "chunk",
                                             "interpret", "cull"))
def intersect_morton_planar(rays_planar, bounds_tbl, table, n_chunks: int,
                            chunk: int, interpret=False, cull: bool = True):
    """Morton-chunk-culled closest hit. rays_planar: (8, N) with
    tmin >= 0; bounds_tbl: (4, C_pad) chunk bounds (SMEM); table:
    (9, n_chunks*chunk) planar Morton-ordered spheres
    [cx cy cz r obj -2cx -2cy -2cz |c|^2-r^2]
    (models/clusters.make_morton_accel). Returns (t, object_index); t
    carries the packed-encoding truncation (see _slim_tail)."""
    n = rays_planar.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)

    table_t = jnp.transpose(table)              # (cols, 9), once per call
    packed = pl.pallas_call(
        functools.partial(_morton_kernel, n_chunks=n_chunks, chunk=chunk,
                          pos_bits=_pos_bits(table.shape[1]), cull=cull),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bounds_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(table_t.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=25 * n * (n_chunks + table.shape[1]),
            bytes_accessed=(8 + 1) * n * 4,
            transcendentals=n * n_chunks),
        interpret=interpret,
    )(rays_planar, bounds_tbl, table_t)
    return _unpack_best(packed, table)


def _morton_mxu_kernel(rays_ref, bounds_ref, table_ref, a_ref, packed_ref,
                       best_s, *, n_chunks: int, chunk: int, pos_bits: int):
    """MXU variant of the Morton sweep: the per-(sphere, ray) quadratic
    coefficients b = od - c·d and the c·o part of c0 are rank-8 matmuls
    (chunk A-matrix (2*chunk, 8) @ ray matrix (8, R)), so they run on the
    systolic array instead of the VPU — the VPU keeps only the
    sqrt/compare/packed-min tail (~10 ops/pair vs ~20). A rows per chunk
    (built in models/clusters.make_mxu_tables):
      rows [0, chunk):        [-cx -cy -cz  0    0    0   1  0]
      rows [chunk, 2*chunk):  [ 0   0   0  -2cx -2cy -2cz 0  |c|^2-r^2]
    against X = [dx dy dz ox oy oz od 1], so Y[:chunk] = b and
    Y[chunk:] + oo = c0. Padded spheres carry |c|^2-r^2 = +1e30, which
    forces disc < 0 (replaces the radius test)."""
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

    @pl.when(jnp.any(tmax >= tmin))
    def _():
        od = ox * dx + oy * dy + oz * dz
        oo = ox * ox + oy * oy + oz * oz
        x = jnp.concatenate(
            [dx, dy, dz, ox, oy, oz, od, jnp.ones(ox.shape, jnp.float32)],
            axis=0)                                   # (8, R)
        live = tmax >= tmin
        bundle = _bundle_summary(ox, oy, oz, dx, dy, dz, live)

        for c in range(n_chunks):
            chunk_possible = _chunk_cull(
                bounds_ref, c, bundle,
                _t_done(best_s[:, :], live, trunc_mask))

            @pl.when(chunk_possible)
            def _():
                y = _mxu_dot(
                    a_ref[2 * chunk * c:2 * chunk * (c + 1), :],
                    x)                                     # (2*chunk, R)
                b2 = y[:chunk]
                c2 = y[chunk:] + oo
                s0 = c * chunk
                objT = jnp.transpose(
                    table_ref[4:5, s0:s0 + chunk]).astype(jnp.int32)
                best_s[:, :] = jnp.minimum(
                    best_s[:, :],
                    _slim_tail(b2, c2, tmin, tmax, objT, trunc_mask))

    packed_ref[:, :] = best_s[:, :]


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

    packed = pl.pallas_call(
        functools.partial(_morton_mxu_kernel, n_chunks=n_chunks,
                          chunk=chunk, pos_bits=_pos_bits(table.shape[1])),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
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
        out_specs=pl.BlockSpec((1, RAY_BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, RAY_BLOCK), jnp.int32)],
        cost_estimate=pl.CostEstimate(
            flops=25 * n * (n_chunks + table.shape[1]),
            bytes_accessed=(8 + 1) * n * 4,
            transcendentals=n * n_chunks),
        interpret=interpret,
    )(rays_planar, bounds_tbl, table, a_tbl)
    return _unpack_best(packed, table)


def _anyhit_kernel(rays_ref, bounds_ref, tableT_ref, occ_ref, occ_s, *,
                   n_chunks: int, chunk: int):
    """Occlusion (shadow-ray) sweep: the specialized any-hit kernel the
    reference reaches via RAY_FLAG_ACCEPT_FIRST_HIT_AND_END_SEARCH
    (RTXDIAppBridge.hlsli:418-459). No closest-t/argmin bookkeeping — just
    a running per-lane 'blocked' bit; a chunk is skipped when the block's
    cone misses it OR every live lane is already blocked. Row 8 of the ray
    SoA is an object index to EXCLUDE (the target light itself). Table
    arrives transposed (cols, 9) — see _morton_kernel."""
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
        bundle = _bundle_summary(ox, oy, oz, dx, dy, dz, live)
        # Shadow rays are range-bounded: cull chunks beyond the farthest
        # live tmax along the cone axis (reuses the _chunk_cull distance
        # slot, which otherwise implements the closest-hit early-out).
        tmax_max = jnp.max(jnp.where(live, tmax, 0.0))

        for c in range(n_chunks):
            chunk_possible = _chunk_cull(bounds_ref, c, bundle, tmax_max)
            unresolved = jnp.any((occ_s[:, :] == 0) & live)

            @pl.when(chunk_possible & unresolved)
            def _():
                s0 = c * chunk
                cxT = tableT_ref[s0:s0 + chunk, 0:1]
                cyT = tableT_ref[s0:s0 + chunk, 1:2]
                czT = tableT_ref[s0:s0 + chunk, 2:3]
                objT = tableT_ref[s0:s0 + chunk, 4:5]
                m2xT = tableT_ref[s0:s0 + chunk, 5:6]
                m2yT = tableT_ref[s0:s0 + chunk, 6:7]
                m2zT = tableT_ref[s0:s0 + chunk, 7:8]
                ccrrT = tableT_ref[s0:s0 + chunk, 8:9]

                b2 = od - (cxT * dx + cyT * dy + czT * dz)
                c2 = oo + (m2xT * ox + m2yT * oy + m2zT * oz) + ccrrT
                disc2 = b2 * b2 - c2
                sq2 = jnp.sqrt(disc2)               # NaN when disc2 < 0
                t_near = -b2 - sq2
                t = jnp.where(t_near >= tmin, t_near, sq2 - b2)
                blocked = (t >= tmin) & (t <= tmax) & (objT != exclude)
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

    table_t = jnp.transpose(table)
    occ = pl.pallas_call(
        functools.partial(_anyhit_kernel, n_chunks=n_chunks, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bounds_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(table_t.shape, lambda i: (0, 0),
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
    )(rays9, bounds_tbl, table_t)
    return occ[0] > 0


def _anyhit_mxu_kernel(rays_ref, bounds_ref, table_ref, a_ref, occ_ref,
                       occ_s, *, n_chunks: int, chunk: int):
    """MXU variant of the any-hit sweep: b/c from the same chunk A-matrix
    matmul as _morton_mxu_kernel; the VPU tail keeps only
    sqrt/select/compare plus the exclude-object test."""
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
        x = jnp.concatenate(
            [dx, dy, dz, ox, oy, oz, od, jnp.ones(ox.shape, jnp.float32)],
            axis=0)                                   # (8, R)
        live = tmax >= tmin
        bundle = _bundle_summary(ox, oy, oz, dx, dy, dz, live)
        tmax_max = jnp.max(jnp.where(live, tmax, 0.0))

        for c in range(n_chunks):
            chunk_possible = _chunk_cull(bounds_ref, c, bundle, tmax_max)
            unresolved = jnp.any((occ_s[:, :] == 0) & live)

            @pl.when(chunk_possible & unresolved)
            def _():
                y = _mxu_dot(
                    a_ref[2 * chunk * c:2 * chunk * (c + 1), :],
                    x)                                     # (2*chunk, R)
                b2 = y[:chunk]
                c2 = y[chunk:] + oo
                s0 = c * chunk
                objT = jnp.transpose(table_ref[4:5, s0:s0 + chunk])
                disc2 = b2 * b2 - c2
                sq2 = jnp.sqrt(disc2)               # NaN when disc2 < 0
                t_near = -b2 - sq2
                t = jnp.where(t_near >= tmin, t_near, sq2 - b2)
                blocked = (t >= tmin) & (t <= tmax) & (objT != exclude)
                any_hit = jnp.sum(blocked.astype(jnp.int32), axis=0,
                                  keepdims=True)
                occ_s[:, :] = occ_s[:, :] | (any_hit > 0).astype(jnp.int32)

    occ_ref[:, :] = occ_s[:, :]


@functools.partial(jax.jit, static_argnames=("n_chunks", "chunk",
                                             "interpret"))
def occlusion_morton_mxu(rays9, bounds_tbl, table, a_tbl, n_chunks: int,
                         chunk: int, interpret=False):
    """MXU-offloaded any-hit occlusion. Args as occlusion_morton_planar
    plus the (n_chunks*2*chunk, 8) A-matrix table."""
    n = rays9.shape[1]
    assert n % RAY_BLOCK == 0, n
    grid = (n // RAY_BLOCK,)

    occ = pl.pallas_call(
        functools.partial(_anyhit_mxu_kernel, n_chunks=n_chunks,
                          chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((1, n), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((9, RAY_BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, bounds_tbl.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(table.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(a_tbl.shape, lambda i: (0, 0),
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
    )(rays9, bounds_tbl, table, a_tbl)
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
