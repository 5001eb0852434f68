"""Predict the bounce-1 coherence-sort win WITHOUT TPU hardware.

The intersection kernel's per-(block, chunk) work is gated by the scalar
bundle-cone cull (ops/intersect_pallas._bundle_summary/_chunk_cull). This
tool generates REAL bounce-1 rays for the demo scene on CPU, then
replays the cull math in numpy for several slot orderings and reports the
fraction of (ray-block, sphere-chunk) member sweeps that survive — a
direct proxy for the kernel's VPU work (the distance early-out is left
out, so all numbers are conservative).

Usage: PYTHONPATH= JAX_PLATFORMS=cpu python tools/sim_sort_cull.py [w h]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from drts_tpu.models import clusters, myscene, scene as scene_mod  # noqa
from drts_tpu.ops import camera as camera_mod, pathtrace, trace  # noqa
from drts_tpu.ops.intersect_pallas import RAY_BLOCK  # noqa: E402
from drts_tpu.utils import rng as rng_mod  # noqa: E402


def bounce1_rays(w, h, host=None):
    host = host or myscene.build(oscillator_grid=10)
    scene = host.scene
    cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                                 horizontal_fov_deg=90.0, aspect=w / h)
    ndc = camera_mod.pixel_ndc(w, h, jnp.zeros(2))
    o0, d0, tmn, tmx = camera_mod.generate_pinhole_rays(cam, ndc)
    table = scene_mod.object_table(scene)
    surf = trace.trace_scene(scene, o0, d0, jnp.broadcast_to(tmn, (h, w)),
                             jnp.broadcast_to(tmx, (h, w)), 16384,
                             table=table)
    px = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    rng = rng_mod.init(px, py, 0)
    _, l_dir, _, valid, _, _, _, _, _ = pathtrace._shade_and_scatter(
        scene, surf, d0, rng, None, "nearest")
    from drts_tpu.ops import intersect
    origin = intersect.safe_spawn_point(surf.position, surf.geometric_normal,
                                        l_dir)
    active = surf.valid & valid
    plan = clusters.build_plan_morton(np.asarray(scene.center),
                                      np.asarray(scene.radius),
                                      max_members=64)
    accel = clusters.make_morton_accel(plan, scene.center, scene.radius,
                                       sort_origin=cam.position)
    return (np.asarray(origin).reshape(-1, 3),
            np.asarray(l_dir).reshape(-1, 3),
            np.asarray(active).reshape(-1),
            np.asarray(accel.bounds_tbl), int(accel.n_chunks))


def survivors(o, d, live, bounds, n_chunks):
    """Numpy replay of _bundle_summary + _chunk_cull (no distance cull)."""
    n = o.shape[0]
    nb = -(-n // RAY_BLOCK)
    pad = nb * RAY_BLOCK - n
    if pad:
        o = np.vstack([o, np.zeros((pad, 3))])
        d = np.vstack([d, np.tile([[0, 0, 1.0]], (pad, 1))])
        live = np.concatenate([live, np.zeros(pad, bool)])
    o = o.reshape(nb, RAY_BLOCK, 3)
    d = d.reshape(nb, RAY_BLOCK, 3)
    live = live.reshape(nb, RAY_BLOCK)

    cnt = np.maximum(live.sum(1), 1)[:, None]
    m = (o * live[..., None]).sum(1) / cnt                      # (nb, 3)
    orad = np.sqrt((np.where(live, ((o - m[:, None]) ** 2).sum(-1),
                             0.0)).max(1))
    ax = (d * live[..., None]).sum(1)
    ax = ax / np.maximum(np.linalg.norm(ax, axis=-1, keepdims=True), 1e-12)
    cmin = np.where(live, (d * ax[:, None]).sum(-1), 1.0).min(1)
    coherent = cmin > 0.0
    cmin = np.maximum(cmin, 0.0)
    sin_c = np.sqrt(np.maximum(1.0 - cmin * cmin, 0.0))

    bx = bounds[0, :n_chunks][None]
    by = bounds[1, :n_chunks][None]
    bz = bounds[2, :n_chunks][None]
    br = bounds[3, :n_chunks][None]
    v = np.stack([bx - m[:, 0:1], by - m[:, 1:2], bz - m[:, 2:3]], -1)
    er = br + orad[:, None]
    along = (v * ax[:, None]).sum(-1)
    d2 = (v * v).sum(-1)
    perp = np.sqrt(np.maximum(d2 - along ** 2, 0.0))
    outside = perp * cmin[:, None] - along * sin_c[:, None] > er
    behind = along < -er
    dead_block = ~live.any(1)
    possible = ~(coherent[:, None] & (outside | behind))
    possible &= ~dead_block[:, None]
    return possible.sum(), nb * n_chunks, (~dead_block).sum()


CULL_EQUIV = 2.0  # scalar cull cost in "sphere-column" units per pair


def main(w=960, h=540):
    host = myscene.build(oscillator_grid=10)
    scene = host.scene
    o, d, live, _, _ = bounce1_rays(w, h, host)
    n = o.shape[0]
    print(f"{n} rays, {live.sum()} live ({live.mean():.2%})")
    print(f"modeled work = surviving_pairs*chunk + {CULL_EQUIV}*all_pairs "
          f"(sphere-columns per ray block; lower = faster sweep)\n")

    packed = np.argsort(~live, kind="stable")     # live first, pixel order
    octant = ((d[:, 0] < 0) * 4 + (d[:, 1] < 0) * 2
              + (d[:, 2] < 0)).astype(np.int64)
    key = np.where(live, octant, 8)
    o_part = packed[np.argsort(key[packed], kind="stable")]
    ts = 64
    tiles_x = -(-w // ts)
    fl = np.arange(n)
    tile = (fl // (w * ts)) * tiles_x + (fl % w) // ts
    key2 = np.where(live, octant * (tiles_x * (-(-h // ts))) + tile,
                    1 << 30)
    k_sort = packed[np.argsort(key2[packed], kind="stable")]

    # Tile-major compaction + stable octant partition (the implemented
    # partition mode): must reproduce the key sort's grouping.
    tm = np.argsort(tile, kind="stable")
    packed_tm = tm[np.argsort(~live[tm], kind="stable")]
    tm_part = packed_tm[np.argsort(
        np.where(live[packed_tm], octant[packed_tm], 8), kind="stable")]

    orders = [("dense pixel order", np.arange(n)),
              ("compact, pixel order", packed),
              ("compact + octant part.", o_part),
              ("tile-major + oct part.", tm_part),
              ("compact + (oct, tile64)", k_sort)]

    for members in (16, 32, 64, 128):
        plan = clusters.build_plan_morton(np.asarray(scene.center),
                                          np.asarray(scene.radius),
                                          max_members=members)
        accel = clusters.make_morton_accel(plan, scene.center, scene.radius)
        bounds = np.asarray(accel.bounds_tbl)
        n_chunks = int(accel.n_chunks)
        print(f"-- chunk size {members} ({n_chunks} chunks) --")
        for name, order in orders:
            oo, dd, ll = o[order], d[order], live[order]
            s, total, _ = survivors(oo, dd, ll, bounds, n_chunks)
            work = s * members + CULL_EQUIV * total
            print(f"  {name:25s} pairs {s:6d}/{total:6d} "
                  f"({s / total:6.2%})  work {work / 1e3:8.1f}k")
        print()


if __name__ == "__main__":
    w = int(sys.argv[1]) if len(sys.argv) > 1 else 960
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 540
    main(w, h)
