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


def pack_for_kernel(plan: ClusterPlan, bounds: ClusterBounds, centers,
                    radii):
    """Planar tables for the Pallas kernel:
    bounds (4, C): cx cy cz r;
    members (5, C*MAX_MEMBERS): cx cy cz r obj_index (radius 0 = empty)."""
    member = jnp.asarray(plan.member_object)
    valid = member >= 0
    safe = jnp.maximum(member, 0)
    mpos = centers[safe]                              # (C, M, 3)
    mrad = jnp.where(valid, radii[safe], 0.0)
    flat = plan.num_clusters * MAX_MEMBERS
    members = jnp.stack([
        mpos[..., 0].reshape(flat),
        mpos[..., 1].reshape(flat),
        mpos[..., 2].reshape(flat),
        mrad.reshape(flat),
        jnp.where(valid, member, 0).reshape(flat).astype(jnp.float32),
    ])
    bounds_tbl = jnp.stack([bounds.center[:, 0], bounds.center[:, 1],
                            bounds.center[:, 2], bounds.radius])
    return bounds_tbl, members
