"""Monolithic-frame ablation: attribute full-pipeline cost by toggling one
stage at a time (per-pass microbenchmarks on the tunneled TPU carry an
unreliable per-dispatch floor; monolith diffs don't)."""
import time, json, sys
import jax
import dataclasses

from drts_tpu.models import myscene, pipeline
from drts_tpu.ops import restir as restir_mod

W, H = 1920, 1080


def run(tag, iters=6, **overrides):
    cfg = pipeline.PipelineConfig(
        output_width=W, output_height=H, render_width=W, render_height=H,
        bounces=8, samples_per_pixel=1, block_size=32768)
    if overrides:
        rs_fields = {f.name for f in dataclasses.fields(
            restir_mod.ReSTIRConfig)}
        restir_over = {k[7:]: v for k, v in overrides.items()
                       if k.startswith("restir_") and k[7:] in rs_fields}
        other = {k: v for k, v in overrides.items()
                 if not (k.startswith("restir_") and k[7:] in rs_fields)}
        if restir_over:
            other["restir"] = dataclasses.replace(cfg.restir, **restir_over)
        cfg = dataclasses.replace(cfg, **other)
    pipe = pipeline.RenderPipeline(cfg)
    host = myscene.build(oscillator_grid=10)
    state = pipe.init_state(host)
    pose = pipe.default_camera_pose(host)
    step = jax.jit(lambda s, p: pipe.render_frame(s, p, 1.0 / 60.0))
    state, image = step(state, pose)
    jax.block_until_ready(image)
    cur = state
    t0 = time.perf_counter()
    for _ in range(iters):
        cur, image = step(cur, pose)
    jax.block_until_ready(image)
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(json.dumps({"tag": tag, "ms": round(ms, 1)}), flush=True)
    return ms


if __name__ == "__main__":
    which = sys.argv[1:] or ["base"]
    for tag in which:
        if tag == "base":
            run("base")
        elif tag == "nosharc":
            run("nosharc", sharc_enabled=False)
        elif tag == "norestir":
            run("norestir", restir_enabled=False)
        elif tag == "nodenoise":
            run("nodenoise", denoiser="None")
        elif tag == "nospatial":
            run("nospatial", restir_spatial_enabled=False)
        elif tag == "notemporal":
            run("notemporal", restir_temporal_enabled=False)
        elif tag == "nobrdf":
            run("nobrdf", restir_brdf_samples=0)
        elif tag == "4light":
            run("4light", restir_local_light_samples=4)
        elif tag == "bounces2":
            run("bounces2", bounces=2)
        else:
            print(f"unknown tag {tag}", flush=True)
