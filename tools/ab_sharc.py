"""SHARC hit-rate sweep (VERDICT r4 item #1): why do settled-frame hit
rates sit at 8-27%/bounce, and which knob raises them?

Sweeps voxel sizing (scene_scale — note voxel = 2^level/scene_scale, so
scale 200 reproduces the reference SHaRC's voxel = 2^level/(scale*4)
semantics at its default scale 50), cache capacity, and the query
min-sample threshold. Reports, per settled frame at 960x540/8 bounces:
per-bounce query counts + gate/entry/hit rates (gate = footprint
heuristic passed; entry = resolved row existed) and the full-frame ms.

Run via tools/run_tpu_queue.sh; each variant recompiles (~minutes cold).
"""
import dataclasses
import json
import time
import traceback

from drts_tpu.utils import cache

cache.enable_compile_cache()

import jax  # noqa: E402

from drts_tpu.models import myscene, pipeline  # noqa: E402
from drts_tpu.ops import sharc as sharc_mod  # noqa: E402

VARIANTS = {
    "scale50_base": {},
    "scale100": {"scene_scale": 100.0},
    "scale200_refsemantics": {"scene_scale": 200.0},
    "scale400": {"scene_scale": 400.0},
    "scale200_cap23": {"scene_scale": 200.0, "capacity_log2": 23},
    "scale200_minsamp1": {"scene_scale": 200.0, "min_samples_for_query": 1.0},
}


def run(name, sharc_over, width=960, height=540, settle=12, iters=4):
    cfg = pipeline.PipelineConfig(
        output_width=width, output_height=height,
        render_width=width, render_height=height,
        bounces=8, samples_per_pixel=1, block_size=32768,
        sharc=dataclasses.replace(sharc_mod.SHARCConfig(), **sharc_over))
    pipe = pipeline.RenderPipeline(cfg)
    host = myscene.build(oscillator_grid=10, load_textures=True)
    state = pipe.init_state(host)
    pose = pipe.default_camera_pose(host)
    step = jax.jit(lambda s, p: pipe.render_frame(s, p, 1.0 / 60.0))
    for _ in range(settle):
        state, img = step(state, pose)
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    cur = state
    for _ in range(iters):
        cur, img = step(cur, pose)
    jax.block_until_ready(img)
    ms = (time.perf_counter() - t0) / iters * 1e3
    c = {k: float(v) for k, v in cur.counters.items()}
    per_bounce = {}
    for b in range(1, 9):
        q = c.get(f"sharc_queries_b{b}", 0.0)
        if q > 0:
            per_bounce[f"b{b}"] = {
                "q": int(q),
                "gate": round(c.get(f"sharc_gate_b{b}", 0.0) / q, 3),
                "entry": round(c.get(f"sharc_entry_b{b}", 0.0) / q, 3),
                "hit": round(c.get(f"sharc_hits_b{b}", 0.0) / q, 3),
            }
    return {"variant": name, "overrides": sharc_over,
            "frame_ms": round(ms, 2), "per_bounce": per_bounce,
            "splat_dropped": c.get("sharc_splat_dropped_rows", 0.0),
            # r4: the 960x540 stage-1 run reported q_b2..8 = 0 — if the
            # deep segment dropped its lanes this would show here.
            "overflow": c.get("wavefront_overflow_paths", 0.0)}


def main():
    import sys
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        try:
            print(json.dumps(run(name, VARIANTS[name])), flush=True)
        except Exception:
            print(json.dumps({"variant": name,
                              "error": traceback.format_exc(limit=3)}),
                  flush=True)


if __name__ == "__main__":
    main()
