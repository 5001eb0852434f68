"""The wavefront path tracer — the framework's flagship compute pass.

TPU-native redesign of the reference's raygen megakernel
(/root/reference/Shaders/Raytracing.hlsl:103-415). The per-pixel bounce loop
with divergent control flow is restructured bounce-synchronously (SURVEY.md
§7): at each bounce the *entire* frame's rays intersect, shade, sample, and
terminate together as dense masked vector ops — the formulation that keeps
the TPU's 8×128 vector lanes full. Terminated lanes carry a False mask
instead of being compacted; for ≤8 bounces the masked-dense form beats
sort-based compaction on TPU (no gather/scatter traffic).

Same integrator semantics as the reference: per-hit emission, three-lobe
BSDF importance sampling with single-lobe selection, PDF-weighted
throughput, Russian roulette after bounce 3 (Raytracing.hlsl:348-356),
throughput-luminance cutoff (:361-364), NaN guard (:377), and the
diffuse/hit-distance AOVs the denoiser consumes (:376-414).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils import math as m
from ..utils import rng as rng_mod
from ..models import scene as scene_mod
from . import (bxdf, camera as camera_mod, intersect, shading, sharc, sky,
               trace as trace_mod)


@dataclasses.dataclass(frozen=True)
class PathTraceConfig:
    """Static (jit-specializing) integrator knobs."""
    width: int = 256
    height: int = 256
    bounces: int = 8
    samples_per_pixel: int = 1
    russian_roulette: bool = True
    throughput_threshold: float = 1e-3
    block_size: int = 16384  # intersection working-set block
    # Texture fetches beyond this bounce use material constants (the ray
    # footprint exceeds texel size well before then; saves ~20 gathers per
    # bounce). Bounce 0 samples bilinearly, deeper bounces nearest.
    texture_bounces: int = 2
    # Compact-wavefront switchover: bounces >= compact_from run on a
    # compacted survivor buffer of n_pixels/compact_fraction lanes instead
    # of full-frame masked-dense arrays. Measured at 1080p/8 bounces:
    # bounces 2-8 carry ~130k live rays yet cost ~95 ms dense (scattered
    # live lanes defeat the dead-block skip); compacted they cost a few ms
    # per bounce. The SER/ray-compaction analogue of
    # /root/reference/Shaders/RaytracingHelpers.hlsli:46-53. Set
    # compact_from > bounces to disable (pure dense).
    # fraction sweep at 1080p/8 bounces under the full headline workload
    # (textured + sort_origin, tools/prof_fraction.py on TPU v5e):
    # /12 38.1 Mray/s, /16 39.9, /24 41.6, /32 overflows 18k paths.
    # /24 is the tightest zero-overflow capacity for the demo scene
    # (survivors land between the /32 cap 64.8k, which dropped 18k paths,
    # and the /24 cap 86.4k); overflow silently drops path radiance but
    # is surfaced per frame as the wavefront_overflow_paths counter.
    #
    # compact_from = 1 compacts + coherence-sorts the BOUNCE-1 wavefront
    # too (segment [1,1] at n/compact_fraction_first capacity, then a
    # re-compaction to the tight deep capacity for bounces >= 2). Bounce-1
    # rays are BSDF-scattered — pixel-order blocks give the intersection
    # kernel white-noise direction bundles exactly like deep bounces, so
    # the (octant, tile) sort re-arms the bundle-cone culls for ~half of
    # all rays in a frame. The deep segment cascades in the bounce-1
    # segment's slot space (no dense round-trip). Also enables the
    # compacted+sorted SHARC update trace.
    compact_from: int = 2
    compact_fraction: int = 24
    # Explicit deep-segment capacity in slots (0 = derive from
    # compact_fraction). Mainly for capacity stress tests and tuning.
    compact_capacity: int = 0
    # Overflow handling (VERDICT r3 weak #7): with spill OFF, survivors
    # beyond the deep segment's capacity silently lose their remaining
    # bounces' radiance (counted in wavefront_overflow_paths). With spill
    # ON (default), a second wave re-runs the deep segment over the
    # dropped lanes under lax.cond — zero runtime cost on frames with no
    # overflow, one extra segment dispatch when it triggers; only paths
    # beyond 2x capacity then drop (still counted). Default ON because
    # close-in camera poses DO overflow the demo-tuned /24 capacity
    # (tests/test_fuzz_scenes.py poses), and a counter is not a fix.
    overflow_spill: bool = True
    # src-table builder for the compaction front-end (_compact_slots):
    # "scatter" (permuting-store scatter over all ns rows),
    # "blocked_onehot" (segmented cumsum + per-block one-hot MXU matmul),
    # "two_level" (segmented cumsum + 2-level binary search),
    # "blocked_sort" (per-block stable sort packing live lanes to block
    # heads + one direct gather per slot — no row-serial scatter, no
    # per-slot bisection). Identical output; TPU cost differs.
    compact_impl: str = "scatter"
    # Capacity divisor for the bounce-1 segment. Survivors there are all
    # primary hits with a valid scatter — routinely 60-80% of the frame,
    # so /2 would OVERFLOW and silently drop GI paths; default /1 keeps
    # full capacity (the coherence sort, not the lane reduction, is what
    # the bounce-1 segment buys — dead tail blocks skip cheaply anyway).
    compact_fraction_first: int = 1
    # Sort the compacted survivors by (direction octant, screen tile) before
    # the deep sweep. Pixel-order compaction gives each RAY_BLOCK white-noise
    # bounce directions, voiding the intersection kernel's bundle-cone cull
    # (_bundle_summary: coherent requires every lane within 90° of the mean
    # axis). Octant-major grouping guarantees a sub-90° cone per block;
    # tile-minor keeps origins spatially local so the cone apex sphere stays
    # small and the closest-hit distance cull bites. Per-path math is
    # order-independent, so radiance is unchanged (tested) — only the chunk
    # culls gain. The TPU analogue of SER coherence sorting
    # (/root/reference/Source/Raytracing.ixx NVAPI SER usage).
    compact_sort: bool = True
    compact_sort_tile: int = 64
    # At large capacities (the bounce-1 segment: ~1-2M slots) a full
    # (octant, tile) lax.sort costs O(cap log^2 cap) compare-exchange
    # passes (~230 sweeps at 2M lanes). Capacities >= this threshold use a
    # stable 9-bucket octant partition instead (9 masked cumsums — two
    # orders of magnitude less traffic) over a STATIC tile-major
    # compaction order, which reproduces the key sort's exact
    # (octant, tile, pixel) grouping (tools/sim_sort_cull.py). The deep
    # segment (~174k slots) keeps the key sort.
    compact_sort_partition_min: int = 500_000
    # Slot-gather schedule for the compacted segment's state pull
    # (_compact_slots gsel): "direct" gathers each state array at the
    # sorted slot order (random rows into the 2M-row tables); "mono"
    # gathers at the MONOTONE compaction-rank order (coherent big-table
    # reads) and applies the coherence sort afterwards as a second
    # (cap,)-row gather from the small rank-ordered intermediate (which
    # fits scoped memory). Identical results — pure gather algebra
    # (src_sorted[p] = src_rank[perm[p]]); only the memory schedule
    # differs.
    compact_gsel: str = "direct"
    # First bounce that queries the SHARC cache (reference queries from
    # bounce 1, Raytracing.hlsl:261-291). Bounce-1 queries run DENSE over
    # the full frame (~13 ms at 1080p: cache_key + packed-mirror gather on
    # 2M lanes) for a measured ~12% hit rate; 2 restricts queries to the
    # compacted deep segment (~86k lanes) where they are nearly free.
    sharc_query_from: int = 1


@struct.dataclass
class TraceOutput:
    """Radiance + first-bounce AOVs (Raytracing.hlsl output routing)."""
    radiance: jnp.ndarray             # (H, W, 3)
    is_diffuse: jnp.ndarray           # (H, W) bool: first scatter was diffuse
    hit_distance: jnp.ndarray         # (H, W) first secondary-hit distance
    primary_valid: jnp.ndarray        # (H, W) bool: primary ray hit geometry
    primary_position: jnp.ndarray     # (H, W, 3)
    primary_normal: jnp.ndarray       # (H, W, 3) shading normal
    primary_albedo: jnp.ndarray       # (H, W, 3) diffuse demodulation albedo
    primary_f_env: jnp.ndarray        # (H, W, 3) specular demodulation
    primary_radiance: jnp.ndarray     # (H, W, 3) emission/env at bounce 0
    rays_traced: jnp.ndarray          # scalar: total rays cast (bench metric)
    # Frame counters (SURVEY.md §5.5; round-2 VERDICT weak #5/#9): path
    # loss + per-bounce SHARC cache statistics, keys fixed by the static
    # config: "wavefront_overflow_paths", and per bounce b (sharc only)
    # "sharc_hits_b{b}" / "sharc_queries_b{b}".
    counters: dict


def _shade_and_scatter(scene, surf, ray_d, rng, atlas=None,
                       tex_filter="nearest", mat=None,
                       min_roughness: float = 0.0):
    """One bounce's material eval + BSDF sample. Returns
    (emission, new_dir, eval/pdf weight, valid, lobe, rng). A precomputed
    `mat` (e.g. the G-buffer's) skips the texture fetches entirely.
    `min_roughness` floors the BSDF roughness — the SHARC update trace's
    RoughnessThreshold clamp (Raytracing.hlsl:309: under SHARC_UPDATE the
    sample roughness is raised to the threshold so cached paths diffuse
    out instead of following mirror chains the cache can't represent)."""
    if mat is None:
        mat = shading.evaluate_material(surf.material, surf.uv,
                                        surf.shading_normal, surf.tangent,
                                        atlas, tex_filter)
    if min_roughness > 0.0:
        mat = mat.replace(roughness=jnp.maximum(mat.roughness,
                                                min_roughness))
    sv = bxdf.make_surface_vectors(surf.is_front_face, surf.geometric_normal,
                                   mat.shading_normal)
    bs = bxdf.make_bsdf(mat.base_color, mat.metallic, mat.roughness, mat.ior,
                        mat.transmission, surf.is_front_face)
    v = -ray_d
    weights = bxdf.lobe_weights(bs, sv, v)
    rand4, rng = rng_mod.next_floats(rng, 4)
    l_dir, lobe, valid = bxdf.sample(bs, sv, v, rand4)
    pdf = bxdf.eval_pdf_lobe(bs, sv, l_dir, v, weights, lobe)
    f = bxdf.eval_lobe(bs, sv, l_dir, v, weights, lobe)
    pdf_ok = pdf > 0.0
    weight = jnp.where(pdf_ok[..., None], f / jnp.maximum(pdf, 1e-20)[..., None], 0.0)
    f_nonzero = jnp.any(f != 0.0, axis=-1)
    valid = valid & pdf_ok & f_nonzero
    return mat.emission, l_dir, weight, valid, lobe, bs, sv, v, rng


def _compact_capacity(n_pixels: int, fraction: int) -> int:
    cap = max(1024, n_pixels // fraction)
    return -(-cap // 1024) * 1024


_BLOCKED_LB = 512  # lanes per compaction block (see _src_table_blocked)


def _src_table_blocked(act_src, order_ids, cap: int, wave: int, impl: str):
    """src-table builders that sidestep the 2M-row XLA scatter (TPU
    scatters run row-serial, ~0.3 GB/s by rows processed — the measured
    ~32 ms deep-segment entry). Both split the lane stream into
    `_BLOCKED_LB`-lane blocks and compute per-block live ranks with a
    SEGMENTED cumsum, then resolve each output slot to (block, rank):

    - "blocked_onehot": per-block one-hot(rank) @ positions batched MXU
      matmul (exact for int payloads < 2^24 at HIGHEST precision, the
      `light._onehot_fetch` recipe) -> semi table (B, LB); output slots
      then need one cheap (cap,) gather.
    - "two_level": 2-level binary search — searchsorted over the B block
      offsets, then log2(LB) manual bisection gathers into the block's
      cumsum row. cap*(1+log2(LB)) random 4-byte gathers instead of the
      full-stream scatter.

    Returns (src (cap,), keep_src (ns,), pos_src (ns,), overflow) —
    identical by construction to the scatter form (asserted in
    tests/test_intersect_scene.py)."""
    ns = act_src.shape[0]
    assert ns < (1 << 24), "f32-exact one-hot payload limit"
    lb = _BLOCKED_LB
    b = -(-ns // lb)
    pad = b * lb - ns
    a = jnp.pad(act_src.astype(jnp.int32), (0, pad)).reshape(b, lb)
    c = jnp.cumsum(a, axis=1)                      # inclusive local count
    counts = c[:, -1]
    cum_counts = jnp.cumsum(counts)
    off = cum_counts - counts                      # exclusive global offset
    total = cum_counts[-1]

    # Input-space window membership (same contract as the scatter form).
    gpos = (c - 1 + off[:, None]).reshape(-1)[:ns] - wave * cap
    keep_src = act_src & (gpos >= 0) & (gpos < cap)
    pos_src = gpos
    overflow = jnp.maximum(total - (wave + 1) * cap, 0)

    s_query = jnp.arange(cap, dtype=jnp.int32) + wave * cap   # global rank
    bi = jnp.minimum(jnp.searchsorted(cum_counts, s_query, side="right"),
                     b - 1).astype(jnp.int32)
    valid = s_query < total

    if impl == "blocked_sort":
        # Per-block STABLE sort (dead lanes to the tail), vectorized over
        # all blocks in one lax.sort — O(LB log^2 LB) compare-exchange
        # passes over the (B, LB) layout, all streaming, no row-serial
        # scatter and no per-slot bisection. semi[b, r] = the r-th live
        # lane's order id; each output slot then needs exactly ONE
        # (cap,)-row gather (vs two_level's log2(LB) random gathers per
        # slot — the measured loss of that form).
        vals = jnp.pad(order_ids, (0, pad), constant_values=0).reshape(
            b, lb)
        _, semi = jax.lax.sort((a == 0, vals), dimension=1, num_keys=1,
                               is_stable=True)
        flat_at = jnp.clip(bi * lb + (s_query - off[bi]), 0, b * lb - 1)
        src = jnp.where(valid, semi.reshape(-1)[flat_at], ns)
    elif impl == "blocked_onehot":
        lrank = c - a                              # exclusive local rank
        j = jnp.arange(lb, dtype=jnp.int32)
        # oh[b, rank, lane] = live & (lrank[b, lane] == rank)
        oh = ((a > 0)[:, None, :]
              & (lrank[:, None, :] == j[None, :, None]))
        vals = jnp.pad(order_ids, (0, pad),
                       constant_values=0).reshape(b, lb)
        semi = jax.lax.dot_general(
            oh.astype(jnp.float32),                   # (b, rank, lane)
            vals.astype(jnp.float32)[..., None],      # (b, lane, 1)
            (((2,), (1,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST)[..., 0]
        semi_i = jnp.round(semi).astype(jnp.int32)
        flat_at = jnp.clip(bi * lb + (s_query - off[bi]), 0, b * lb - 1)
        src = jnp.where(valid, semi_i.reshape(-1)[flat_at], ns)
    else:  # two_level
        target = s_query + 1 - off[bi]             # 1-based rank in block
        c_flat = c.reshape(-1)
        lo = jnp.zeros((cap,), jnp.int32)
        hi = jnp.full((cap,), lb - 1, jnp.int32)
        for _ in range(lb.bit_length() - 1):       # log2(LB) bisections
            mid = (lo + hi) // 2
            ge = c_flat[bi * lb + mid] >= target
            hi = jnp.where(ge, mid, hi)
            lo = jnp.where(ge, lo, mid + 1)
        ext = jnp.concatenate([order_ids,
                               jnp.zeros((pad,), jnp.int32)])
        src = jnp.where(valid, ext[jnp.minimum(bi * lb + lo,
                                               b * lb - 1)], ns)
    return src, keep_src, pos_src, overflow


def _compact_slots(act, l_dir_flat, pixel_ids, cfg, cap: int,
                   h: int, w: int, wave: int = 0):
    pixel_space = pixel_ids is None
    """Shared compaction front-end: pack live lanes of `act`
    into a (cap,) slot buffer, coherence-sort the slots by
    (direction octant, screen tile), and return the pieces the
    wavefront segments and the SHARC update trace build on:
    src (slot -> input position), slot_live, overflow,
    (keep, pos, perm) for _slots_to_space, and gsel (per-array
    slot gather with a dead row appended).

    `wave` selects the capacity window [wave*cap, (wave+1)*cap) of the
    live-lane sequence: wave 0 is the normal compaction; wave 1 packs
    the lanes wave 0 had to drop (the overflow-spill pass). `overflow`
    counts live lanes beyond THIS wave's window."""
    ns = act.shape[0]
    partition_mode = (cfg.compact_sort
                      and cap >= cfg.compact_sort_partition_min)
    if partition_mode and pixel_space:
        # Compact in STATIC tile-major pixel order: the stable octant
        # partition below then yields (octant, tile, pixel-in-tile) slot
        # grouping — exactly the key sort's grouping (sim: 2x less
        # surviving sweep work at bounce 1 vs pixel-row order,
        # tools/sim_sort_cull.py) at counting-sort cost. tm/inv_tm are
        # trace-time numpy constants. Slot-space input is already
        # tile-grouped by the previous segment, so it compacts in place.
        ts = cfg.compact_sort_tile
        tiles_x = -(-w // ts)
        fl_np = np.arange(ns)
        tile_np = (fl_np // (w * ts)) * tiles_x + (fl_np % w) // ts
        tm_np = np.argsort(tile_np, kind="stable").astype(np.int32)
        tm = jnp.asarray(tm_np)
        inv_tm = jnp.asarray(np.argsort(tm_np).astype(np.int32))
        act_src = act[tm]
        order_ids = tm            # input-space positions, compaction order
    else:
        tm = inv_tm = None
        act_src = act
        order_ids = jnp.arange(ns, dtype=jnp.int32)
    if pixel_ids is None:
        pixel_ids = jnp.arange(ns, dtype=jnp.int32)

    if cfg.compact_impl == "scatter":
        live_count = jnp.cumsum(act_src.astype(jnp.int32))
        pos_src = live_count - 1 - wave * cap
        keep_src = act_src & (pos_src >= 0) & (pos_src < cap)
        overflow = jnp.sum((act_src & (pos_src >= cap)).astype(jnp.int32))

        # Source table: slot s -> input-space position (ns = empty slot).
        # Permuting-store scatter (unique indices, drop mode — the fast
        # XLA lowering): dead lanes get the out-of-range slot `cap` and
        # are DROPPED instead of colliding on a dump slot (the colliding
        # form serializes on the collisions). A searchsorted-over-cumsum
        # gather variant was tried in r4 and measured SLOWER (binary
        # search = cap*log2(ns) RANDOM gathers at ~0.3-3 GB/s;
        # prof_trace_bounces b2-b1 38 ms vs 32 ms scatter).
        slot_of_src = jnp.where(keep_src, pos_src, cap)
        src = jnp.full((cap,), ns, jnp.int32).at[slot_of_src].set(
            order_ids, mode="drop", unique_indices=True)
    else:
        src, keep_src, pos_src, overflow = _src_table_blocked(
            act_src, order_ids, cap, wave, cfg.compact_impl)

    # Input-space-order (keep, pos) for the final contribution gathers.
    if tm is not None:
        keep = keep_src[inv_tm]
        pos = pos_src[inv_tm]
    else:
        keep, pos = keep_src, pos_src

    # Coherence sort (see PathTraceConfig.compact_sort): permute the slot ->
    # pixel map by (octant, tile) BEFORE the wide state gather, so every
    # downstream per-bounce op sees the sorted order for free. Dead slots
    # carry a sentinel key and stay packed at the tail (whole-block dead
    # skip). perm[s] = the slot's pre-sort position, used to un-permute the
    # contribution buffer so the final per-pixel read stays monotone.
    src_pre = src          # rank-ordered src (before the coherence sort)
    perm = None
    if cfg.compact_sort:
        d = l_dir_flat
        octant = ((d[:, 0] < 0).astype(jnp.int32) * 4
                  + (d[:, 1] < 0).astype(jnp.int32) * 2
                  + (d[:, 2] < 0).astype(jnp.int32))
        if partition_mode:
            # Stable octant partition (see compact_sort_partition_min):
            # bucket 8 = dead slots, packed at the tail like the key
            # sort's sentinel. Every slot lands in exactly one bucket, so
            # new_pos is a full permutation of [0, cap). Slot order is
            # tile-major (see above; slot-space input inherits the
            # previous segment's grouping), so stability gives tile-minor
            # grouping within each octant for free.
            key_dense = jnp.concatenate([octant, jnp.array([8], jnp.int32)])
            key_slots = key_dense[jnp.minimum(src, ns)]
            new_pos = jnp.zeros((cap,), jnp.int32)
            base = jnp.int32(0)
            for b in range(9):
                mask = key_slots == b
                mi = mask.astype(jnp.int32)
                rank = jnp.cumsum(mi) - 1
                new_pos = jnp.where(mask, base + rank, new_pos)
                base = base + jnp.sum(mi)
            arange_cap = jnp.arange(cap, dtype=jnp.int32)
            src = jnp.zeros((cap,), jnp.int32).at[new_pos].set(
                src, unique_indices=True)
            perm = jnp.zeros((cap,), jnp.int32).at[new_pos].set(
                arange_cap, unique_indices=True)
        else:
            ts = cfg.compact_sort_tile
            tiles_x = -(-w // ts)
            tiles_y = -(-h // ts)
            # Tile from the TRUE pixel id (slot-space inputs carry it).
            tile = ((pixel_ids // (w * ts)) * tiles_x
                    + (pixel_ids % w) // ts)
            key_dense = octant * (tiles_x * tiles_y) + tile
            key_dense = jnp.concatenate(
                [key_dense, jnp.array([2 ** 30], jnp.int32)])
            key_slots = key_dense[jnp.minimum(src, ns)]
            _, src, perm = jax.lax.sort(
                (key_slots, src, jnp.arange(cap, dtype=jnp.int32)),
                num_keys=1)

    slot_live = src < ns
    idx = jnp.minimum(src, ns)

    # Per-array slot gathers (each with one appended dead row). Narrow
    # gathers of 1-3 columns cost the same bytes as the former 11-wide
    # concat gather but skip the concat's full extra copy of the state.
    # compact_gsel="mono": pull from the big table at the MONOTONE rank
    # order, then apply the coherence sort as a (cap,)-row gather from the
    # small intermediate (see PathTraceConfig.compact_gsel).
    mono = cfg.compact_gsel == "mono" and perm is not None
    idx_pre = jnp.minimum(src_pre, ns) if mono else None

    def gsel(x_flat, dead):
        ext = jnp.concatenate(
            [x_flat, jnp.asarray(dead, x_flat.dtype).reshape(
                (1,) + x_flat.shape[1:])])
        if mono:
            return ext[idx_pre][perm]
        return ext[idx]

    return {"src": src, "slot_live": slot_live,
            "overflow": overflow, "keep": keep, "pos": pos,
            "perm": perm, "gsel": gsel}


def _trace_deep_compact(scene, table, cam, cfg: PathTraceConfig,
                        sharc_state, sharc_cfg, origin, l_dir, throughput,
                        prev_roughness, rng, active, start_bounce: int,
                        accel, cap: int, end_bounce: int | None = None,
                        di_valid=None, want_aov: bool = False,
                        return_state: bool = False, pixel_ids=None,
                        img_hw=None, wave: int = 0):
    """Bounces [start_bounce, end_bounce] on a compacted survivor buffer.

    Live paths are packed to the front of a (cap,) buffer; every
    per-bounce op (intersection sweep, attribute fetch, SHARC query, BSDF
    sample) then costs O(survivors) instead of O(frame pixels). Survivors
    beyond `cap` are dropped (counted in the returned overflow) —
    capacity is sized ~3x the measured survivor count.

    The INPUT space is either the pixel frame ((H, W)-shaped arrays,
    pixel_ids None) or a previous segment's slot buffer (flat (ns,)
    arrays + `pixel_ids` mapping each element to its true pixel; pass
    img_hw for the tile keys). Cascading in slot space avoids the ~350 MB
    dense round-trip a pixel-space handoff would cost at 1080p — the
    next segment re-compacts straight from these (cap,) arrays with a few
    narrow gathers.

    `di_valid` (only meaningful when the segment covers bounce 1)
    suppresses bounce-1 emission for pixels whose direct light was
    already added at the primary vertex (Raytracing.hlsl:302).
    `want_aov` captures the first trace's hit distance (the bounce-1
    AOV). `return_state` (end_bounce < cfg.bounces) returns the
    continuation state in SLOT space plus a `mapper` that converts any
    later (cap,)-space per-path values back to this segment's input
    space (_slots_to_space).

    Returns a dict: radiance, rays, overflow, counters, and optionally
    hit_distance / state / mapper. Array outputs are (H, W, ...) for
    pixel-space input, flat (ns, ...) otherwise.
    """
    if end_bounce is None:
        end_bounce = cfg.bounces
    pixel_space = pixel_ids is None
    if img_hw is None:
        h, w = active.shape
    else:
        h, w = img_hw
    ns = active.size
    n_px = h * w

    cs = _compact_slots(active.reshape(ns), l_dir.reshape(ns, 3),
                        pixel_ids, cfg, cap, h, w, wave=wave)
    src = cs["src"]
    slot_live = cs["slot_live"]
    overflow = cs["overflow"]
    keep, pos, perm = cs["keep"], cs["pos"], cs["perm"]
    gsel = cs["gsel"]
    if pixel_ids is None:
        pixel_ids = jnp.arange(ns, dtype=jnp.int32)

    c_origin = gsel(origin.reshape(ns, 3), [[0.0, 0.0, 0.0]])
    c_dir = gsel(l_dir.reshape(ns, 3), [[0.0, 0.0, 1.0]])
    c_thr = gsel(throughput.reshape(ns, 3), [[0.0, 0.0, 0.0]])
    c_rough = gsel(prev_roughness.reshape(ns), [0.0])
    c_rng = gsel(rng.reshape(ns), [0])
    c_pix = gsel(pixel_ids, [n_px])

    if di_valid is not None:
        c_di = gsel(di_valid.reshape(ns), [False])
    else:
        c_di = None

    c_active = slot_live
    c_radiance = jnp.zeros((cap, 3), jnp.float32)
    c_hitdist = None
    rays_add = jnp.float32(0.0)
    zeros_c = jnp.zeros((cap,), jnp.float32)
    counters = {}

    for bounce in range(start_bounce, end_bounce + 1):
        rays_add = rays_add + jnp.sum(c_active.astype(jnp.float32))
        surf = trace_mod.trace_scene(
            scene, c_origin, c_dir, zeros_c,
            jnp.where(c_active, jnp.inf, -1.0), cfg.block_size,
            accel=accel, table=table,
            alpha_rounds=scene.alpha_test_rounds)
        if want_aov and bounce == start_bounce:
            c_hitdist = jnp.where(surf.valid, surf.distance, jnp.inf)

        env_color = sky.environment_color(
            scene.env, c_dir, wide=bounce >= cfg.texture_bounces)
        miss = c_active & ~surf.valid
        c_radiance = c_radiance + jnp.where(miss[..., None],
                                            c_thr * env_color, 0.0)
        c_active = c_active & surf.valid

        if sharc_state is not None and bounce >= cfg.sharc_query_from:
            front_flat = jnp.where(surf.is_front_face[..., None],
                                   surf.geometric_normal,
                                   -surf.geometric_normal)
            fp_ok = sharc.footprint_valid(surf.distance, c_rough,
                                          surf.position, cam.position,
                                          sharc_cfg)
            cached, cache_hit = sharc.query(sharc_state, surf.position,
                                            front_flat, cam.position,
                                            sharc_cfg)
            use_cache = c_active & fp_ok & cache_hit
            counters[f"sharc_hits_b{bounce}"] = jnp.sum(
                use_cache.astype(jnp.float32))
            counters[f"sharc_queries_b{bounce}"] = jnp.sum(
                c_active.astype(jnp.float32))
            # Failure split (VERDICT r3 #1 diagnosis): gate = footprint
            # heuristic passed; entry = a resolved cache row existed.
            counters[f"sharc_gate_b{bounce}"] = jnp.sum(
                (c_active & fp_ok).astype(jnp.float32))
            counters[f"sharc_entry_b{bounce}"] = jnp.sum(
                (c_active & cache_hit).astype(jnp.float32))
            c_radiance = c_radiance + jnp.where(use_cache[..., None],
                                                c_thr * cached, 0.0)
            c_active = c_active & ~use_cache

        atlas_b = scene.textures if bounce < cfg.texture_bounces else None
        if bounce == cfg.bounces:
            mat = shading.evaluate_material(surf.material, surf.uv,
                                            surf.shading_normal,
                                            surf.tangent, atlas_b, "nearest")
            emission = mat.emission
            if c_di is not None and bounce == 1:
                emission = jnp.where(c_di[..., None], 0.0, emission)
            c_radiance = c_radiance + jnp.where(c_active[..., None],
                                                c_thr * emission, 0.0)
            break

        emission, new_dir, weight, valid, lobe, bs, _, _, c_rng = \
            _shade_and_scatter(scene, surf, c_dir, c_rng, atlas_b, "nearest")
        if c_di is not None and bounce == 1:
            emission = jnp.where(c_di[..., None], 0.0, emission)
        c_radiance = c_radiance + jnp.where(c_active[..., None],
                                            c_thr * emission, 0.0)
        c_thr = c_thr * weight
        c_active = c_active & valid
        c_rough = c_rough + jnp.where(lobe == bxdf.LOBE_DIFFUSE, 1.0,
                                      bs.roughness)

        if cfg.russian_roulette and bounce > 3:
            prob = jnp.max(c_thr, axis=-1)
            u, c_rng = rng_mod.next_float(c_rng)
            kill = u >= prob
            c_active = c_active & ~kill
            c_thr = c_thr / jnp.maximum(prob, 1e-20)[..., None]
        c_active = c_active & (m.luminance(c_thr) > cfg.throughput_threshold)

        c_origin = intersect.safe_spawn_point(surf.position,
                                              surf.geometric_normal, new_dir)
        c_dir = new_dir

    # Read contributions back into the input space (each path owns one
    # input element): element -> slot is just the cumsum position, so
    # this is a GATHER with monotone indices — measured 6.9 ms as a
    # scatter-add (XLA TPU scatter runs ~0.3 GB/s) vs streaming-rate as a
    # gather.
    mapper = (keep, pos, perm, cap)

    def to_space(slot_vals, fill):
        vals = _slots_to_space(slot_vals, fill, mapper)
        if pixel_space:
            return vals.reshape((h, w) + vals.shape[1:])
        return vals

    contrib = jnp.where(slot_live[..., None], c_radiance, 0.0)
    out = {
        "radiance": to_space(contrib, 0.0),
        "rays": rays_add, "overflow": overflow, "counters": counters,
        "mapper": mapper,
    }
    if c_hitdist is not None:
        out["hit_distance"] = to_space(c_hitdist[:, None], jnp.inf)[..., 0]
    if return_state:
        # Continuation state stays in SLOT space; the next segment
        # re-compacts straight from these (cap,) arrays (a few narrow
        # gathers) instead of a dense pixel round-trip. c_pix keeps the
        # true pixel identity for its tile keys and output mapping.
        out["state"] = {
            "origin": c_origin, "dir": c_dir, "throughput": c_thr,
            "roughness": c_rough, "rng": c_rng, "active": c_active,
            "pixel_ids": c_pix,
        }
    return out


def _slots_to_space(slot_vals, fill, mapper):
    """(cap, C) slot values -> (ns, C) input-space values: un-permute to
    pre-sort slot order, then the monotone positional gather. `mapper`
    is the (keep, pos, perm, cap) tuple a segment returns — apply it to
    map a LATER segment's per-path outputs back through this one."""
    keep, pos, perm, cap = mapper
    vals = slot_vals
    if perm is not None:
        vals = jnp.zeros_like(vals).at[perm].set(vals, unique_indices=True)
    vals = jnp.concatenate(
        [vals, jnp.full((1,) + vals.shape[1:], fill, vals.dtype)])
    return vals[jnp.where(keep, pos, cap)]


def _deep_with_spill(scene, table, cam, cfg, sharc_state, sharc_cfg,
                     origin, l_dir, throughput, prev_roughness, rng, active,
                     start_bounce, accel, cap, pixel_ids=None, img_hw=None):
    """Terminal deep segment with optional overflow spill (see
    PathTraceConfig.overflow_spill): wave 0 always runs; when it
    overflows and spill is on, wave 1 re-runs the segment over the
    dropped lanes under lax.cond (no runtime cost on clean frames).
    Returns the merged segment dict."""
    seg = _trace_deep_compact(scene, table, cam, cfg, sharc_state,
                              sharc_cfg, origin, l_dir, throughput,
                              prev_roughness, rng, active, start_bounce,
                              accel, cap, pixel_ids=pixel_ids,
                              img_hw=img_hw)
    if not cfg.overflow_spill:
        return seg

    def spill(_):
        s2 = _trace_deep_compact(scene, table, cam, cfg, sharc_state,
                                 sharc_cfg, origin, l_dir, throughput,
                                 prev_roughness, rng, active, start_bounce,
                                 accel, cap, pixel_ids=pixel_ids,
                                 img_hw=img_hw, wave=1)
        return (s2["radiance"], s2["rays"], s2["overflow"], s2["counters"])

    def no_spill(_):
        return (jnp.zeros_like(seg["radiance"]), jnp.float32(0.0),
                seg["overflow"],
                jax.tree.map(jnp.zeros_like, seg["counters"]))

    rad2, rays2, overflow_out, cnt2 = jax.lax.cond(
        seg["overflow"] > 0, spill, no_spill, None)
    seg["radiance"] = seg["radiance"] + rad2
    seg["rays"] = seg["rays"] + rays2
    seg["overflow"] = overflow_out
    seg["counters"] = {k: seg["counters"][k] + cnt2[k]
                       for k in seg["counters"]}
    return seg


def trace_image(scene: scene_mod.SphereScene, cam: camera_mod.Camera,
                cfg: PathTraceConfig, frame_index,
                gbuf=None, sharc_state=None, sharc_cfg=None,
                di_radiance=None, di_in_radiance: bool = True,
                accel=None, accel_deep=None) -> TraceOutput:
    """Render one frame's path-traced radiance (plus AOVs).

    Pure function of (scene, camera, frame index); jit with
    ``static_argnums`` on cfg or via functools.partial. When a GBuffer is
    passed the primary hit is reused from it (the reference reconstructs
    primaries from the G-buffer, Raytracing.hlsl:118-163) instead of
    re-traced.

    ``accel_deep``: optional second Morton accel used for the COMPACTED
    bounce sweeps only (bounce-ray blocks favor finer chunks — tighter
    bounds cull better once directions are octant-sorted, while primary
    blocks amortize fewer, fatter chunks; tools/sim_sort_cull.py).
    Results are accel-independent; this is purely a scheduling choice.
    """
    h, w = cfg.height, cfg.width
    ndc = camera_mod.pixel_ndc(w, h, cam.jitter)
    ray_o0, ray_d0, t_min0, t_max0 = camera_mod.generate_pinhole_rays(cam, ndc)
    t_min0 = jnp.broadcast_to(t_min0, (h, w))
    t_max0 = jnp.broadcast_to(t_max0, (h, w))

    px = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)

    table = scene_mod.object_table(scene)

    # Primary hit is shared across spp (the reference reconstructs it from
    # the G-buffer once, Raytracing.hlsl:118-163).
    if gbuf is not None:
        primary_surf = gbuf.surf
        ray_d0 = gbuf.ray_direction
    else:
        primary_surf = trace_mod.trace_scene(
            scene, ray_o0, ray_d0, t_min0, t_max0, cfg.block_size,
            accel=accel, table=table,
            alpha_rounds=scene.alpha_test_rounds)

    class _P:  # minimal hit view over the primary surface
        hit = primary_surf.valid
        t = primary_surf.distance
    primary_hit = _P

    # Primary demodulation AOVs for the denoiser (GBufferGeneration.hlsl).
    # When a G-buffer is supplied its products are reused verbatim — the
    # reference reads them back instead of re-shading (Raytracing.hlsl:
    # 118-163); re-evaluating here measured ~10 ms/frame at 1080p.
    if gbuf is not None:
        p_mat = gbuf.mat
        p_albedo, p_f_env = gbuf.diffuse_albedo, gbuf.specular_albedo
    else:
        p_mat = shading.evaluate_material(primary_surf.material,
                                          primary_surf.uv,
                                          primary_surf.shading_normal,
                                          primary_surf.tangent,
                                          scene.textures, "bilinear")
        p_sv = bxdf.make_surface_vectors(primary_surf.is_front_face,
                                         primary_surf.geometric_normal,
                                         p_mat.shading_normal)
        p_bs = bxdf.make_bsdf(p_mat.base_color, p_mat.metallic,
                              p_mat.roughness, p_mat.ior,
                              p_mat.transmission,
                              primary_surf.is_front_face)
        p_albedo, p_f_env = bxdf.demodulation_factors(p_bs, p_sv, -ray_d0)

    radiance = jnp.zeros((h, w, 3), jnp.float32)
    is_diffuse = jnp.ones((h, w), bool)
    hit_distance = jnp.full((h, w), jnp.inf, jnp.float32)
    rays_traced = jnp.float32(h * w)  # the primary-visibility pass

    # ReSTIR DI handoff (Raytracing.hlsl:150-163): when direct illumination
    # is supplied, it is added once at the primary vertex and bounce-1
    # emission is suppressed to avoid double counting.
    if di_radiance is not None:
        di_valid = primary_hit.hit & (jnp.sum(di_radiance, axis=-1) > 0.0)
    else:
        di_valid = jnp.zeros((h, w), bool)

    # Compact-wavefront switchover (see PathTraceConfig.compact_from): the
    # dense loop runs bounces [0, compact_start); survivors continue on the
    # compacted buffer. Bounces 0-1 stay dense (AOVs, DI handoff, textures).
    use_compact = 1 <= cfg.compact_from <= cfg.bounces
    dense_last = cfg.compact_from - 1 if use_compact else cfg.bounces
    cap = cfg.compact_capacity or _compact_capacity(h * w,
                                                    cfg.compact_fraction)
    cap_first = _compact_capacity(h * w, cfg.compact_fraction_first)
    counters = {"wavefront_overflow_paths": jnp.float32(0.0)}

    for sample_index in range(cfg.samples_per_pixel):
        rng = rng_mod.init(px, py,
                           frame_index * cfg.samples_per_pixel + sample_index)
        sample_radiance = jnp.zeros((h, w, 3), jnp.float32)
        throughput = jnp.ones((h, w, 3), jnp.float32)
        active = jnp.ones((h, w), bool)
        prev_roughness = jnp.zeros((h, w), jnp.float32)
        ray_d = ray_d0
        surf = primary_surf
        hit_ok = primary_hit.hit

        if di_radiance is not None and di_in_radiance:
            # Denoiser-off routing (Raytracing.hlsl:379-385 `radiance+=DI`);
            # with NRD-style denoising DI instead rides the direct
            # diffuse/specular channels (:400-413).
            sample_radiance = sample_radiance + jnp.where(
                di_valid[..., None], di_radiance, 0.0)

        for bounce in range(dense_last + 1):
            if bounce > 0:
                rays_traced = rays_traced + jnp.sum(
                    active.astype(jnp.float32))
                origin = intersect.safe_spawn_point(
                    surf.position, surf.geometric_normal, l_dir)
                # Dead lanes get tmax < tmin so the kernel's block-skip can
                # drop whole tiles of terminated paths.
                surf = trace_mod.trace_scene(
                    scene, origin, l_dir, jnp.zeros((h, w)),
                    jnp.where(active, jnp.inf, -1.0), cfg.block_size,
                    accel=accel, table=table,
                    alpha_rounds=scene.alpha_test_rounds)
                ray_d = l_dir
                hit_ok = surf.valid
                if sample_index == 0 and bounce == 1:
                    is_diffuse = lobe == bxdf.LOBE_DIFFUSE
                    hit_distance = jnp.where(hit_ok, surf.distance, jnp.inf)

            # Miss -> environment light, terminate (Raytracing.hlsl:241-259).
            env_color = sky.environment_color(
                scene.env, ray_d, wide=bounce >= cfg.texture_bounces)
            miss = active & ~hit_ok
            sample_radiance = sample_radiance + jnp.where(
                miss[..., None], throughput * env_color, 0.0)
            active = active & hit_ok

            # SHARC query: early-terminate into the cache once the ray
            # footprint exceeds the voxel size (Raytracing.hlsl:261-291).
            if sharc_state is not None and bounce >= max(
                    cfg.sharc_query_from, 1):
                front_flat = jnp.where(surf.is_front_face[..., None],
                                       surf.geometric_normal,
                                       -surf.geometric_normal)
                fp_ok = sharc.footprint_valid(surf.distance, prev_roughness,
                                              surf.position, cam.position,
                                              sharc_cfg)
                cached, cache_hit = sharc.query(
                    sharc_state, surf.position, front_flat, cam.position,
                    sharc_cfg)
                use_cache = active & fp_ok & cache_hit
                counters[f"sharc_hits_b{bounce}"] = counters.get(
                    f"sharc_hits_b{bounce}", 0.0) + jnp.sum(
                    use_cache.astype(jnp.float32))
                counters[f"sharc_queries_b{bounce}"] = counters.get(
                    f"sharc_queries_b{bounce}", 0.0) + jnp.sum(
                    active.astype(jnp.float32))
                counters[f"sharc_gate_b{bounce}"] = counters.get(
                    f"sharc_gate_b{bounce}", 0.0) + jnp.sum(
                    (active & fp_ok).astype(jnp.float32))
                counters[f"sharc_entry_b{bounce}"] = counters.get(
                    f"sharc_entry_b{bounce}", 0.0) + jnp.sum(
                    (active & cache_hit).astype(jnp.float32))
                sample_radiance = sample_radiance + jnp.where(
                    use_cache[..., None], throughput * cached, 0.0)
                active = active & ~use_cache

            if bounce == cfg.bounces:
                # Last iteration only adds emission (no scatter needed).
                atlas_b = scene.textures if bounce < cfg.texture_bounces \
                    else None
                if bounce == 0:
                    mat = p_mat
                else:
                    mat = shading.evaluate_material(
                        surf.material, surf.uv, surf.shading_normal,
                        surf.tangent, atlas_b, "nearest")
                emission = mat.emission
                if bounce == 1:
                    emission = jnp.where(di_valid[..., None], 0.0, emission)
                sample_radiance = sample_radiance + jnp.where(
                    active[..., None], throughput * emission, 0.0)
                break

            atlas_b = scene.textures if bounce < cfg.texture_bounces \
                else None
            emission, l_dir, weight, valid, lobe, bs, _, _, rng = \
                _shade_and_scatter(
                    scene, surf, ray_d, rng, atlas_b,
                    "bilinear" if bounce == 0 else "nearest",
                    mat=p_mat if bounce == 0 else None)
            if bounce == 1:
                # DI already sampled this light at the primary vertex
                # (Raytracing.hlsl:302).
                emission = jnp.where(di_valid[..., None], 0.0, emission)
            sample_radiance = sample_radiance + jnp.where(
                active[..., None], throughput * emission, 0.0)
            throughput = throughput * weight
            active = active & valid
            prev_roughness = prev_roughness + jnp.where(
                lobe == bxdf.LOBE_DIFFUSE, 1.0, bs.roughness)

            # Russian roulette after bounce 3 (Raytracing.hlsl:348-356:
            # `bounceIndex > 3`, i.e. first applied on the 4th bounce).
            if cfg.russian_roulette and bounce > 3:
                prob = jnp.max(throughput, axis=-1)
                u, rng = rng_mod.next_float(rng)
                kill = u >= prob
                active = active & ~kill
                throughput = throughput / jnp.maximum(prob, 1e-20)[..., None]

            # Throughput luminance cutoff (Raytracing.hlsl:361-364).
            active = active & (m.luminance(throughput)
                               > cfg.throughput_threshold)

        if use_compact:
            origin = intersect.safe_spawn_point(
                surf.position, surf.geometric_normal, l_dir)

            def fold(res, through=None):
                """Accumulate a segment's outputs; `through` is the
                previous segment's result when this one ran in ITS slot
                space (radiance then maps back via that mapper)."""
                nonlocal sample_radiance, rays_traced, hit_distance
                rad = res["radiance"]
                if through is not None:
                    rad = _slots_to_space(rad, 0.0,
                                          through["mapper"]).reshape(
                        h, w, 3)
                sample_radiance = sample_radiance + rad
                rays_traced = rays_traced + res["rays"]
                counters["wavefront_overflow_paths"] = \
                    counters["wavefront_overflow_paths"] \
                    + res["overflow"].astype(jnp.float32)
                for k, v in res["counters"].items():
                    counters[k] = counters.get(k, 0.0) + v
                if "hit_distance" in res:
                    hit_distance = res["hit_distance"]

            if cfg.compact_from == 1:
                # Bounce-1 AOVs the dense loop would have produced: the
                # first-scatter lobe is bounce-0 state (already dense);
                # the secondary hit distance comes back from the segment.
                if sample_index == 0:
                    is_diffuse = lobe == bxdf.LOBE_DIFFUSE
                two_segment = cfg.bounces >= 2
                seg = _trace_deep_compact(
                    scene, table, cam, cfg, sharc_state, sharc_cfg,
                    origin, l_dir, throughput, prev_roughness, rng, active,
                    1, accel_deep or accel, cap_first,
                    end_bounce=1 if two_segment else cfg.bounces,
                    di_valid=di_valid, want_aov=sample_index == 0,
                    return_state=two_segment)
                fold(seg)
                if two_segment:
                    # Deep segment cascades in segment A's SLOT space —
                    # no dense round-trip (see _trace_deep_compact doc).
                    st = seg["state"]
                    fold(_deep_with_spill(
                        scene, table, cam, cfg, sharc_state, sharc_cfg,
                        st["origin"], st["dir"], st["throughput"],
                        st["roughness"], st["rng"], st["active"],
                        2, accel_deep or accel, cap,
                        pixel_ids=st["pixel_ids"], img_hw=(h, w)),
                        through=seg)
            else:
                fold(_deep_with_spill(
                    scene, table, cam, cfg, sharc_state, sharc_cfg,
                    origin, l_dir, throughput, prev_roughness, rng, active,
                    cfg.compact_from, accel_deep or accel, cap))

        # NaN guard (Raytracing.hlsl:377).
        finite = jnp.all(jnp.isfinite(sample_radiance), axis=-1,
                         keepdims=True)
        radiance = radiance + jnp.where(finite, sample_radiance, 0.0)

    radiance = radiance / cfg.samples_per_pixel
    if gbuf is not None:
        primary_radiance = gbuf.radiance
    else:
        env0 = sky.environment_color(scene.env, ray_d0)
        primary_radiance = jnp.where(primary_hit.hit[..., None],
                                     p_mat.emission, env0)
    return TraceOutput(
        radiance=radiance,
        is_diffuse=is_diffuse,
        hit_distance=hit_distance,
        primary_valid=primary_hit.hit,
        primary_position=primary_surf.position,
        primary_normal=p_mat.shading_normal,
        primary_albedo=p_albedo,
        primary_f_env=p_f_env,
        primary_radiance=primary_radiance,
        rays_traced=rays_traced,
        counters=counters,
    )


@partial(jax.jit, static_argnums=2)
def trace_image_jit(scene, cam, cfg: PathTraceConfig, frame_index):
    return trace_image(scene, cam, cfg, frame_index)


def sharc_update_trace(scene: scene_mod.SphereScene, cam: camera_mod.Camera,
                       sharc_state, sharc_cfg, cfg: PathTraceConfig,
                       frame_index, di_radiance=None, accel=None):
    """The SHARC_UPDATE pass: a low-res trace that splats path radiance into
    the hash-grid cache (Raytracing.hlsl SHARC_UPDATE permutation,
    dispatched at renderSize/DownscaleFactor — Raytracing.ixx:114-148).

    The in-shader SharcUpdateHit/SetThroughput accumulation state becomes a
    record of per-bounce (slot, fingerprint, emission, segment throughput),
    closed by a backward scan L_v = E_v + T_v * L_{v+1} and one scatter-add
    per bounce (see ops/sharc.py module docstring).

    cfg.width/height must already be the downscaled size. Returns the new
    SHARCState after resolve.
    """
    from . import sharc as sharc_mod

    h, w = cfg.height, cfg.width
    px = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    py = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    rng = rng_mod.init(px + 131, py + 173, frame_index)

    # Random sub-pixel jitter instead of the camera's Halton jitter
    # (Raytracing.hlsl:111-112).
    jit2, rng = rng_mod.next_floats(rng, 2)
    ndc = camera_mod.pixel_ndc(w, h, jnp.zeros(2))
    jitter_ndc = (jit2 - 0.5) * jnp.array([2.0, -2.0]) / jnp.array(
        [w, h], jnp.float32)
    ray_o, ray_d, t_min, t_max = camera_mod.generate_pinhole_rays(
        cam, ndc + jitter_ndc)
    t_min = jnp.broadcast_to(t_min, (h, w))
    t_max = jnp.broadcast_to(t_max, (h, w))

    table = scene_mod.object_table(scene)

    if di_radiance is not None:
        di_small = post_resize(di_radiance, h, w)
    else:
        di_small = None

    # Per-bounce records. `emissions[b]` carries the radiance *emitted at*
    # level b: hit emission for live lanes, or — exactly once, at the miss
    # level — the environment color (SharcUpdateMiss). `seg_weights[b]` is
    # zero for non-live lanes so nothing propagates past a path's end.
    slots, fps, emissions, seg_weights, actives = [], [], [], [], []
    active = jnp.ones((h, w), bool)
    l_dir = ray_d
    surf = trace_mod.trace_scene(scene, ray_o, ray_d, t_min, t_max,
                                 cfg.block_size, accel=accel, table=table,
                                 alpha_rounds=scene.alpha_test_rounds)

    # Bounce >= 1 optionally runs compacted + coherence-sorted (the same
    # exact-parity machinery as the main trace's compact_from=1 segment;
    # bounce dirs here are BSDF-scattered too, so unsorted blocks void
    # the intersection kernel's bundle culls). One compaction after
    # bounce 0; slots stay fixed for the whole path so the per-bounce
    # records and the backward scan work in slot space unchanged, and
    # only level 1 -> 0 crosses back to pixel space (one small gather).
    use_compact = cfg.compact_from == 1 and cfg.bounces >= 1
    mapper = None
    origin_next = None

    for bounce in range(cfg.bounces + 1):
        if bounce > 0:
            if origin_next is not None:
                origin = origin_next
                origin_next = None
            else:
                origin = intersect.safe_spawn_point(
                    surf.position, surf.geometric_normal, l_dir)
            surf = trace_mod.trace_scene(
                scene, origin, l_dir, jnp.zeros(active.shape),
                jnp.where(active, jnp.inf, -1.0), cfg.block_size,
                accel=accel, table=table,
                alpha_rounds=scene.alpha_test_rounds)

        miss = active & ~surf.valid
        env_color = sky.environment_color(
            scene.env, l_dir, wide=bounce >= cfg.texture_bounces)
        live = active & surf.valid

        front_flat = jnp.where(surf.is_front_face[..., None],
                               surf.geometric_normal, -surf.geometric_normal)
        slot, fp = sharc_mod.cache_key(surf.position, front_flat,
                                       cam.position, sharc_cfg)

        if bounce == cfg.bounces:
            atlas_b = scene.textures if bounce < cfg.texture_bounces \
                else None
            mat = shading.evaluate_material(surf.material, surf.uv,
                                            surf.shading_normal,
                                            surf.tangent, atlas_b, "nearest")
            emission = mat.emission
            l_dir_new = l_dir
            weight = jnp.zeros(active.shape + (3,), jnp.float32)
            valid = jnp.zeros(active.shape, bool)
        else:
            atlas_b = scene.textures if bounce < cfg.texture_bounces \
                else None
            emission, l_dir_new, weight, valid, lobe, bs, sv, v, rng = \
                _shade_and_scatter(scene, surf, l_dir, rng, atlas_b,
                                   "nearest",
                                   min_roughness=sharc_cfg
                                   .roughness_threshold)

        if di_small is not None and bounce == 0:
            emission = emission + di_small

        level_radiance = jnp.where(live[..., None], emission,
                                   jnp.where(miss[..., None], env_color,
                                             0.0))
        slots.append(slot)
        fps.append(fp)
        emissions.append(level_radiance)
        seg_weights.append(jnp.where((live & valid)[..., None], weight, 0.0))
        actives.append(live)
        active = live & valid
        l_dir = l_dir_new

        if use_compact and bounce == 0:
            ns = h * w
            origin0 = intersect.safe_spawn_point(
                surf.position, surf.geometric_normal, l_dir)
            cap = _compact_capacity(ns, 1)
            cs = _compact_slots(active.reshape(ns), l_dir.reshape(ns, 3),
                                None, cfg, cap, h, w)
            gsel = cs["gsel"]
            mapper = (cs["keep"], cs["pos"], cs["perm"], cap)
            origin_next = gsel(origin0.reshape(ns, 3), [[0.0, 0.0, 0.0]])
            l_dir = gsel(l_dir.reshape(ns, 3), [[0.0, 0.0, 1.0]])
            rng = gsel(rng.reshape(ns), [0])
            active = cs["slot_live"]

    # Backward scan: L_v = E_v + T_v * L_{v+1} (SharcUpdateHit's internal
    # accumulation, made explicit), then ONE fused scatter for all levels
    # (splat_levels — per-level scatters dominated this pass).
    radiance_next = jnp.zeros(emissions[-1].shape, jnp.float32)
    capacity = sharc_state.fingerprint.shape[0]
    level_radiance = [None] * len(slots)
    for b in range(len(slots) - 1, -1, -1):
        nxt = radiance_next
        if nxt.shape != emissions[b].shape:
            # Slot space (level 1) -> pixel space (level 0) boundary.
            nxt = _slots_to_space(nxt, 0.0, mapper).reshape(
                emissions[b].shape)
        l_here = emissions[b] + seg_weights[b] * nxt
        l_here = jnp.where(jnp.isfinite(l_here), l_here, 0.0)
        level_radiance[b] = l_here
        radiance_next = l_here

    acc = (jnp.zeros((capacity, 3), jnp.float32),
           jnp.zeros((capacity,), jnp.float32),
           jnp.zeros((capacity,), jnp.uint32))
    frame_sum, frame_count, frame_fp, dropped = sharc_mod.splat_levels(
        acc, slots, fps, level_radiance, actives)
    new_state = sharc_mod.resolve(sharc_state, frame_sum, frame_count,
                                  frame_fp, sharc_cfg)
    return new_state, {"sharc_splat_dropped_rows":
                       dropped.astype(jnp.float32)}


def post_resize(img, h, w):
    from . import post
    return post.resize_bilinear(img, h, w)
