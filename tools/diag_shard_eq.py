"""Bisect the 8-device-vs-1-device divergence: which stage introduces it?

Runs the failing test's scenario with frame-graph stages toggled off one
at a time and reports the max |sharded - single| per variant.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platform_name", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/drts_diag_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drts_tpu.models import myscene, pipeline
from drts_tpu.ops import restir, sharc
from drts_tpu.parallel import mesh as mesh_mod


def run_variant(name, **kw):
    h = w = 64
    base = dict(
        output_width=w, output_height=h, render_width=w, render_height=h,
        bounces=2, samples_per_pixel=1, block_size=1024,
        sharc=sharc.SHARCConfig(capacity_log2=14),
        restir=restir.ReSTIRConfig(regir_cells_per_axis=8,
                                   regir_build_samples=4,
                                   local_light_samples=4))
    base.update(kw)
    cfg = pipeline.PipelineConfig(**base)
    pipe = pipeline.RenderPipeline(cfg)
    host = myscene.build(oscillator_grid=3)
    state = pipe.init_state(host)
    pose = pipe.default_camera_pose(host)

    step = jax.jit(lambda s, p: pipe.render_frame(s, p, 1.0 / 60.0))
    s1, img1 = step(state, pose)
    s1, img1 = step(s1, pose)

    mesh = mesh_mod.make_mesh(8)
    state_sharding = mesh_mod.frame_state_sharding(
        state, mesh, image_heights=(h, pipe.cfg.output_height))
    pose_sharding = jax.tree.map(lambda _: mesh_mod.replicated(mesh), pose)
    sharded_step = jax.jit(
        lambda s, p: pipe.render_frame(s, p, 1.0 / 60.0),
        in_shardings=(state_sharding, pose_sharding),
        out_shardings=(state_sharding, mesh_mod.image_sharding(mesh)))
    s8 = jax.device_put(state, state_sharding)
    p8 = jax.device_put(pose, pose_sharding)
    s8, img8 = sharded_step(s8, p8)
    s8, img8 = sharded_step(s8, p8)

    d_img = float(np.max(np.abs(np.asarray(img1) - np.asarray(img8))))
    d_hist = float(np.max(np.abs(np.asarray(s1.taa.history)
                                 - np.asarray(s8.taa.history))))
    # Where available, also compare intermediate state pieces.
    extras = {}
    for field in ("denoiser", "sharc", "reservoirs"):
        a = getattr(s1, field, None)
        b = getattr(s8, field, None)
        if a is None or b is None:
            continue
        leaves1 = jax.tree.leaves(a)
        leaves8 = jax.tree.leaves(b)
        dm = 0.0
        for x, y in zip(leaves1, leaves8):
            x = np.asarray(x).astype(np.float64)
            y = np.asarray(y).astype(np.float64)
            if x.shape == y.shape:
                dm = max(dm, float(np.max(np.abs(x - y))))
        extras[field] = dm
    print(f"{name}: img {d_img:.2e} taa_hist {d_hist:.2e} {extras}",
          flush=True)


if __name__ == "__main__":
    run_variant("full (the failing test)")
    run_variant("no_sharc", sharc_enabled=False)
    run_variant("no_restir", restir_enabled=False)
    run_variant("no_denoise", denoiser="None")
