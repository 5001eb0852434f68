"""TPU SHARC anomaly diagnosis (round 4): ab_sharc at 960x540 on TPU
reported entry=0 at every bounce/scale while the identical config at
192x108 on CPU shows entry~0.22 at b1 — either the cache state is
empty/garbled on TPU (splat/resolve defect) or the query-side key/
fingerprint matching breaks (e.g. f32-bitcast NaN canonicalization of
the packed meta column on real hardware).

Runs the pipeline small (192x108, matching the CPU control), then
inspects the raw SHARCState and re-runs the query path manually against
keys derived from the live G-buffer. Prints one JSON line per probe.
"""
import json

from drts_tpu.utils import cache

cache.enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from drts_tpu.models import myscene, pipeline  # noqa: E402
from drts_tpu.ops import sharc as sharc_mod  # noqa: E402


def main(width=192, height=108, frames=8):
    cfg = pipeline.PipelineConfig(
        output_width=width, output_height=height,
        render_width=width, render_height=height,
        bounces=8, samples_per_pixel=1, block_size=32768)
    pipe = pipeline.RenderPipeline(cfg)
    host = myscene.build(oscillator_grid=10, load_textures=True)
    state = pipe.init_state(host)
    pose = pipe.default_camera_pose(host)
    step = jax.jit(lambda s, p: pipe.render_frame(s, p, 1.0 / 60.0))
    for _ in range(frames):
        state, img = step(state, pose)
    jax.block_until_ready(img)

    c = {k: float(v) for k, v in state.counters.items()}
    print(json.dumps({"probe": "counters",
                      **{k: v for k, v in sorted(c.items())
                         if "sharc" in k}}), flush=True)

    sh = state.sharc
    fp = np.asarray(sh.fingerprint)
    count = np.asarray(sh.sample_count)
    packed_meta = np.asarray(
        jax.lax.bitcast_convert_type(sh.packed[:, 2], jnp.uint32))
    nz = fp != 0
    print(json.dumps({
        "probe": "state",
        "nonzero_fp": int(nz.sum()),
        "count_ge4": int((count >= 4).sum()),
        "count_max": float(count.max()) if count.size else 0,
        "packed_meta_nonzero": int((packed_meta != 0).sum()),
        # Does the packed mirror's fingerprint survive the f32 bitcast
        # round-trip on this backend? (NaN canonicalization check)
        "meta_matches_fp": int(
            ((packed_meta & 0xFFFFFFC0) == (fp & 0xFFFFFFC0))[nz].sum()),
        "meta_mismatch_rows": int(
            ((packed_meta & 0xFFFFFFC0) != (fp & 0xFFFFFFC0))[nz].sum()),
    }), flush=True)

    # Manual query against PRIMARY-hit keys (the b1 population feeds from
    # bounce hits, but primaries land in the same voxel grid family): how
    # many primary surface keys have a resolved row?
    from drts_tpu.ops import gbuffer as gbuffer_mod
    scene = state.scene
    cam = pipe._camera(state, pose)
    gbuf = jax.jit(lambda s, cm: gbuffer_mod.generate(
        s, cm, width, height, cfg.block_size))(scene, cam)
    front = jnp.where(gbuf.surf.is_front_face[..., None],
                      gbuf.surf.geometric_normal,
                      -gbuf.surf.geometric_normal)
    slot, key_fp = sharc_mod.cache_key(gbuf.surf.position, front,
                                       cam.position, cfg.sharc)
    rad, valid = sharc_mod.query(sh, gbuf.surf.position, front,
                                 cam.position, cfg.sharc)
    sv = np.asarray(gbuf.surf.valid)
    slot_np = np.asarray(slot)[sv]
    keyfp_np = np.asarray(key_fp)[sv]
    row_fp = fp[slot_np]
    row_count = count[slot_np]
    print(json.dumps({
        "probe": "primary_query",
        "n": int(sv.sum()),
        "rows_nonzero": int((row_fp != 0).sum()),
        "fp_match": int(((row_fp & 0xFFFFFFC0)
                         == (keyfp_np & 0xFFFFFFC0)).sum()),
        "count_ge4_at_rows": int((row_count >= 4).sum()),
        "query_valid": int(np.asarray(valid)[sv].sum()),
    }), flush=True)


if __name__ == "__main__":
    main()
