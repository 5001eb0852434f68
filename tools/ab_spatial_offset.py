"""A/B: ReSTIR spatial_offset_mode per_pixel vs shared (NEXT.md queue #4).

Shared mode replaces the per-pixel spatial-neighbor gather with a dynamic
roll (one golden-angle offset per round, ops/restir.py:811); this measures
the full-pipeline frame time for both modes plus a small-res SSIM of
shared vs per_pixel output so the default flip is evidence-based.
"""
import dataclasses
import json
import time

import jax

from drts_tpu.models import myscene, pipeline
from drts_tpu.utils.image import ssim


def run(mode: str, width=1920, height=1080, iters=4):
    cfg = pipeline.PipelineConfig(
        output_width=width, output_height=height,
        render_width=width, render_height=height,
        bounces=8, samples_per_pixel=1, block_size=32768)
    cfg = dataclasses.replace(
        cfg, restir=dataclasses.replace(cfg.restir, spatial_offset_mode=mode))
    pipe = pipeline.RenderPipeline(cfg)
    host = myscene.build(oscillator_grid=10, load_textures=True)
    state = pipe.init_state(host)
    pose = pipe.default_camera_pose(host)
    step = jax.jit(lambda s, p: pipe.render_frame(s, p, 1.0 / 60.0))
    state, image = step(state, pose)
    jax.block_until_ready(image)
    t0 = time.perf_counter()
    cur = state
    for _ in range(iters):
        cur, image = step(cur, pose)
    jax.block_until_ready(image)
    ms = (time.perf_counter() - t0) / iters * 1e3
    return ms, image


def main():
    out = {}
    imgs = {}
    for mode in ("per_pixel", "shared"):
        ms, img = run(mode)
        out[f"{mode}_ms"] = round(ms, 2)
        imgs[mode] = img
    out["ssim_shared_vs_per_pixel"] = round(
        float(ssim(imgs["shared"], imgs["per_pixel"])), 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
