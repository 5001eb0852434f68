"""Sphere clustering: the framework's acceleration structure (TLAS/BLAS
analogue).

TPU-native replacement for the reference's BLAS/TLAS + RTXMU stack
(SURVEY.md §1 L1, /root/reference/Source/RaytracingHelpers.ixx:28-74,
Scene.ixx:225-284): instead of a pointer-chased BVH, instances are grouped
into a flat array of bounding-sphere clusters with *static membership*
(assigned once at scene build from rest positions) and per-frame *refit*
(one jitted segment pass — the TLAS-update analogue of
``BuildTopLevelAccelerationStructure`` with ``performUpdate=true``).

The intersection kernel then tests each ray block against cluster bounds
first and only runs the member tests for clusters some ray in the block can
touch — block-coherent culling, which is how a vector machine wants to
traverse (SURVEY.md §7 hard part #1 mitigation), instead of per-ray stack
traversal.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np
from flax import struct

MAX_MEMBERS = 32


@struct.dataclass
class MortonAccel:
    """Per-frame acceleration structure for the Morton-chunk flat kernel
    (the TLAS analogue): planar Morton-ordered sphere table + per-chunk
    culling bounds. Static chunk geometry rides the treedef so the handle
    passes through jit boundaries as an ordinary pytree."""
    bounds_tbl: jnp.ndarray   # (4, C_pad) chunk bounding spheres (SMEM)
    table: jnp.ndarray        # (5, C*M) planar [cx cy cz r obj]
    mxu_a: jnp.ndarray = None  # (C*2M, 8) chunk A-matrices (MXU kernel)
    n_chunks: int = struct.field(pytree_node=False, default=0)
    chunk: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class ClusteredAccel:
    """Cluster-culled kernel tables (fori-loop variant)."""
    bounds_tbl: jnp.ndarray   # (4, C_pad)
    members_tbl: jnp.ndarray  # (C_pad*M, 8)
    n_clusters: int = struct.field(pytree_node=False, default=0)
    max_members: int = struct.field(pytree_node=False, default=0)


@dataclasses.dataclass(frozen=True)
class ClusterPlan:
    """Host-side static clustering (membership never changes; bounds refit
    per frame)."""
    member_object: np.ndarray   # (C, MAX_MEMBERS) int32, -1 = empty slot
    num_clusters: int


@struct.dataclass
class ClusterBounds:
    """Per-frame refit product, consumed by the intersection kernel."""
    center: jnp.ndarray   # (C, 3)
    radius: jnp.ndarray   # (C,)


def build_plan(positions: np.ndarray, radii: np.ndarray,
               cell_size: float = 4.0) -> ClusterPlan:
    """Greedy spatial binning on the xz plane at rest pose.

    Objects larger than the cell become singleton clusters (the demo's
    star/earth/moon); the rest bin by floor(xz / cell). Bins overflowing
    MAX_MEMBERS split round-robin.
    """
    from .. import native
    native_plan = native.cluster_plan(positions, radii, cell_size,
                                      MAX_MEMBERS)
    if native_plan is not None:
        return ClusterPlan(member_object=native_plan,
                           num_clusters=native_plan.shape[0])

    k = positions.shape[0]
    big = radii > cell_size * 0.5
    bins: dict = {}
    for i in range(k):
        if big[i]:
            bins[("big", i)] = [i]
            continue
        key = (int(np.floor(positions[i, 0] / cell_size)),
               int(np.floor(positions[i, 2] / cell_size)))
        bins.setdefault(key, []).append(i)

    clusters: list[list[int]] = []
    for members in bins.values():
        for start in range(0, len(members), MAX_MEMBERS):
            clusters.append(members[start:start + MAX_MEMBERS])

    c = len(clusters)
    table = np.full((c, MAX_MEMBERS), -1, np.int32)
    for ci, members in enumerate(clusters):
        table[ci, :len(members)] = members
    return ClusterPlan(member_object=table, num_clusters=c)


def _morton3(x: np.ndarray) -> np.ndarray:
    """30-bit Morton code from (N, 3) positions normalized to [0, 1024)."""
    def spread(v):
        v = v.astype(np.uint64) & 0x3FF
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v
    return (spread(x[:, 0]) | (spread(x[:, 1]) << 1)
            | (spread(x[:, 2]) << 2))


def build_plan_morton(positions: np.ndarray, radii: np.ndarray,
                      big_radius: float = 2.0,
                      max_members: int = MAX_MEMBERS) -> ClusterPlan:
    """Morton-order clustering: sort small spheres along a space-filling
    curve and chunk consecutive runs of MAX_MEMBERS — full-occupancy
    clusters with spatially tight bounds (the LBVH-style build from
    SURVEY.md §7 step 4, flattened to one level). Oversized spheres become
    singletons so they don't inflate chunk bounds."""
    k = positions.shape[0]
    big = np.nonzero(radii > big_radius)[0]
    small = np.nonzero(radii <= big_radius)[0]
    pos = positions[small]
    lo = pos.min(axis=0)
    span = np.maximum(pos.max(axis=0) - lo, 1e-6)
    quant = np.clip((pos - lo) / span * 1023.0, 0, 1023).astype(np.uint64)
    order = small[np.argsort(_morton3(quant), kind="stable")]

    clusters = [order[s:s + max_members]
                for s in range(0, len(order), max_members)]
    clusters += [[i] for i in big]
    c = len(clusters)
    table = np.full((c, max_members), -1, np.int32)
    for ci, members in enumerate(clusters):
        table[ci, :len(members)] = members
    return ClusterPlan(member_object=table, num_clusters=c)


def refit(plan: ClusterPlan, centers, radii, slack: float = 0.25
          ) -> ClusterBounds:
    """Per-frame bound update (jitted): centroid + covering radius with a
    motion slack margin so bounds stay conservative for a few frames of
    drift (the reference's RTXMU update-vs-rebuild tradeoff)."""
    member = jnp.asarray(plan.member_object)          # (C, M)
    valid = member >= 0
    safe = jnp.maximum(member, 0)
    pos = centers[safe]                               # (C, M, 3)
    rad = jnp.where(valid, radii[safe], 0.0)          # (C, M)
    count = jnp.maximum(jnp.sum(valid, axis=1), 1)
    centroid = jnp.sum(jnp.where(valid[..., None], pos, 0.0), axis=1) \
        / count[:, None]
    dist = jnp.sqrt(jnp.sum((pos - centroid[:, None, :]) ** 2, axis=-1))
    cover = jnp.max(jnp.where(valid, dist + rad, 0.0), axis=1)
    return ClusterBounds(center=centroid, radius=cover + slack)


def make_accel(plan: ClusterPlan, centers, radii):
    """Per-frame acceleration-structure update: refit + pack. Returns the
    accel tuple (bounds_tbl, members_tbl, n_clusters, max_members) consumed
    by ops/intersect.py — the TLAS-refit product."""
    bounds = refit(plan, centers, radii)
    bounds_tbl, members_tbl = pack_for_kernel(plan, bounds, centers, radii)
    return ClusteredAccel(bounds_tbl=bounds_tbl, members_tbl=members_tbl,
                          n_clusters=plan.num_clusters,
                          max_members=plan.member_object.shape[1])


def pack_for_kernel(plan: ClusterPlan, bounds: ClusterBounds, centers,
                    radii):
    """Kernel tables, laid out for Mosaic's dynamic-indexing rules:
    bounds (4, C_pad) — lives in SMEM, scalar-indexed by cluster id;
    members (C_pad*MAX_MEMBERS, 8) — member slots along sublanes (dynamic
    sublane slices are supported; dynamic lane slices are not), columns
    cx cy cz r obj_index pad pad pad (radius 0 = empty slot)."""
    member = jnp.asarray(plan.member_object)
    valid = member >= 0
    safe = jnp.maximum(member, 0)
    mpos = centers[safe]                              # (C, M, 3)
    mrad = jnp.where(valid, radii[safe], 0.0)
    c, mm = plan.member_object.shape
    c_pad = -(-c // 8) * 8
    flat = c * mm
    flat_pad = c_pad * mm

    cols = jnp.stack([
        mpos[..., 0].reshape(flat),
        mpos[..., 1].reshape(flat),
        mpos[..., 2].reshape(flat),
        mrad.reshape(flat),
        jnp.where(valid, member, 0).reshape(flat).astype(jnp.float32),
    ], axis=-1)                                       # (flat, 5)
    members = jnp.zeros((flat_pad, 8), jnp.float32)
    members = members.at[:flat, :5].set(cols)

    def pad_to(x, total):
        return jnp.pad(x, (0, total - x.shape[0]))

    bounds_tbl = jnp.stack([
        pad_to(bounds.center[:, 0], c_pad),
        pad_to(bounds.center[:, 1], c_pad),
        pad_to(bounds.center[:, 2], c_pad),
        pad_to(bounds.radius, c_pad),
    ])
    return bounds_tbl, members


def make_morton_accel(plan: ClusterPlan, centers, radii, sort_origin=None):
    """Per-frame tables for the Morton-chunk flat kernel
    (ops/intersect_pallas.intersect_morton_planar): refit chunk bounds +
    planar sphere table in Morton order with an object-index row.

    `sort_origin` (usually the camera position) additionally orders chunks
    near-to-far from that point: the kernel sweeps chunks in table order
    and its closest-hit distance cull (_t_done) only starts skipping once
    live lanes have hits, so visiting near chunks first lets interior
    blocks cull the far tail. Order is semantically invisible (closest-hit
    = min over chunks; object ids ride the table rows)."""
    member = jnp.asarray(plan.member_object)          # (C, M)
    bounds = refit(plan, centers, radii)
    if sort_origin is not None:
        key = jnp.sqrt(jnp.sum((bounds.center - sort_origin) ** 2,
                               axis=-1)) - bounds.radius
        corder = jnp.argsort(key)
        member = member[corder]
        bounds = ClusterBounds(center=bounds.center[corder],
                               radius=bounds.radius[corder])
    c, mm = member.shape
    valid = member >= 0
    safe = jnp.maximum(member, 0)
    mpos = centers[safe]
    mrad = jnp.where(valid, radii[safe], 0.0)
    flat = c * mm
    cx = mpos[..., 0].reshape(flat)
    cy = mpos[..., 1].reshape(flat)
    cz = mpos[..., 2].reshape(flat)
    r = mrad.reshape(flat)
    # Rows 5-8 precompute the quadratic's sphere-side constants (-2c and
    # |c|^2 - r^2) so the kernel's per-pair c0 needs no scaling/sub, and
    # padded entries (r = 0) carry +1e30, forcing disc < 0 — the kernel
    # then needs no radius-validity test.
    ccrr = jnp.where(r > 0.0, cx * cx + cy * cy + cz * cz - r * r, 1e30)
    table = jnp.stack([
        cx, cy, cz, r,
        jnp.where(valid, member, 0).reshape(flat).astype(jnp.float32),
        -2.0 * cx, -2.0 * cy, -2.0 * cz, ccrr,
    ])
    c_pad = -(-c // 8) * 8

    def pad_to(x):
        return jnp.pad(x, (0, c_pad - x.shape[0]))

    bounds_tbl = jnp.stack([pad_to(bounds.center[:, 0]),
                            pad_to(bounds.center[:, 1]),
                            pad_to(bounds.center[:, 2]),
                            pad_to(bounds.radius)])
    return MortonAccel(bounds_tbl=bounds_tbl, table=table, n_chunks=c,
                       chunk=mm, mxu_a=make_mxu_tables(table, c, mm))


def make_mxu_tables(table, n_chunks: int, chunk: int):
    """Chunk A-matrices for the MXU intersection kernel
    (ops/intersect_pallas._morton_mxu_kernel): per chunk a (2*chunk, 8)
    block so that A @ [dx dy dz ox oy oz od 1] yields the quadratic b
    coefficient (rows [0, chunk)) and c0 - oo (rows [chunk, 2*chunk)).
    Empty slots (radius 0) get |c|^2 - r^2 = +1e30, which forces a negative
    discriminant — the kernel then needs no radius test."""
    cx, cy, cz, r = table[0], table[1], table[2], table[3]
    ccrr = cx * cx + cy * cy + cz * cz - r * r
    ccrr = jnp.where(r > 0.0, ccrr, 1e30)
    k = table.shape[1]
    zeros = jnp.zeros((k,), jnp.float32)
    ones = jnp.ones((k,), jnp.float32)
    top = jnp.stack([-cx, -cy, -cz, zeros, zeros, zeros, ones, zeros],
                    axis=-1)                        # (K, 8): b rows
    bot = jnp.stack([zeros, zeros, zeros, -2.0 * cx, -2.0 * cy, -2.0 * cz,
                     zeros, ccrr], axis=-1)         # (K, 8): c0 rows
    # Interleave per chunk: [top_c; bot_c] for each chunk c.
    a = jnp.concatenate([top.reshape(n_chunks, chunk, 8),
                         bot.reshape(n_chunks, chunk, 8)], axis=1)
    return a.reshape(n_chunks * 2 * chunk, 8)
