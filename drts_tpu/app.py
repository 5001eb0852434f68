"""Application shell: CLI entry replacing the Win32/ImGui loop.

TPU-native replacement for /root/reference/Source/Main.cpp (wWinMain +
message pump) and the interactive parts of Source/App.cpp: subcommands

  render       — render N frames of the demo scene to PNG
  bench        — frame-time / Mray/s loop (StepTimer FPS analogue)
  interactive  — scripted camera fly-through (the fly-cam analogue)

Settings load/save uses the JSON config system (config.py), mirroring
MyAppData's Settings/ directory convention.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _build_pipeline(args):
    from . import config as config_mod
    from .models import myscene, pipeline

    if args.settings and os.path.exists(args.settings):
        settings = config_mod.load_settings(args.settings)
    else:
        settings = config_mod.GraphicsSettings().check()

    cfg = pipeline.PipelineConfig.from_settings(
        settings, output_width=args.width, output_height=args.height)
    overrides = {}
    if args.bounces is not None:
        overrides["bounces"] = args.bounces
    if args.spp is not None:
        overrides["samples_per_pixel"] = args.spp
    if args.no_denoise:
        overrides["denoiser"] = "None"
    if args.no_physics:
        overrides["physics_enabled"] = False
    if overrides:
        import dataclasses
        cfg = dataclasses.replace(cfg, **overrides)

    pipe = pipeline.RenderPipeline(cfg)
    host = myscene.build(seed=args.seed,
                         load_textures=not args.no_textures)
    return pipe, host


def cmd_render(args):
    import jax
    from .utils import image as image_mod

    pipe, host = _build_pipeline(args)
    state = pipe.init_state(host)
    pose = pipe.default_camera_pose(host)
    step = jax.jit(lambda s, p: pipe.render_frame(s, p, 1.0 / 60.0))

    os.makedirs(args.out_dir, exist_ok=True)
    for i in range(args.frames):
        state, img = step(state, pose)
        if i >= args.frames - args.save_last:
            path = os.path.join(args.out_dir, f"frame_{i:04d}.png")
            image_mod.write_png(path, np.asarray(img))
            print(f"wrote {path}")


def cmd_bench(args):
    import jax

    pipe, host = _build_pipeline(args)
    state = pipe.init_state(host)
    pose = pipe.default_camera_pose(host)
    step = jax.jit(lambda s, p: pipe.render_frame(s, p, 1.0 / 60.0))

    state, img = step(state, pose)  # compile
    jax.block_until_ready(img)
    start = time.perf_counter()
    for _ in range(args.frames):
        state, img = step(state, pose)
    jax.block_until_ready(img)
    elapsed = time.perf_counter() - start
    print(json.dumps({
        "frames": args.frames,
        "frame_ms": round(elapsed / args.frames * 1e3, 2),
        "fps": round(args.frames / elapsed, 2),
        "resolution": f"{pipe.cfg.render_width}x{pipe.cfg.render_height}"
                      f"->{pipe.cfg.output_width}x{pipe.cfg.output_height}",
    }))


def cmd_interactive(args):
    """Scripted orbit fly-through (CameraController analogue)."""
    import jax
    import jax.numpy as jnp
    from .models.pipeline import CameraPose
    from .utils import image as image_mod

    pipe, host = _build_pipeline(args)
    state = pipe.init_state(host)
    step = jax.jit(lambda s, p, q: pipe.render_frame(s, p, 1.0 / 60.0,
                                                     prev_pose=q))

    os.makedirs(args.out_dir, exist_ok=True)
    prev = pipe.default_camera_pose(host)
    for i in range(args.frames):
        angle = 2.0 * np.pi * i / max(args.frames, 1) * 0.25
        pos = np.array([15.0 * np.sin(angle), 2.0, -15.0 * np.cos(angle)],
                       np.float32)
        fwd = -pos / np.linalg.norm(pos)
        pose = CameraPose(position=jnp.asarray(pos),
                          forward=jnp.asarray(fwd, jnp.float32),
                          up=jnp.asarray([0.0, 1.0, 0.0], jnp.float32))
        state, img = step(state, pose, prev)
        prev = pose
        if args.save_last and i >= args.frames - args.save_last:
            path = os.path.join(args.out_dir, f"orbit_{i:04d}.png")
            image_mod.write_png(path, np.asarray(img))
            print(f"wrote {path}")


def main(argv=None):
    p = argparse.ArgumentParser("drts_tpu",
                                description="TPU-native path tracer")
    p.add_argument("--settings", default="Settings/graphics.json",
                   help="JSON settings file (MyAppData analogue)")
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--bounces", type=int, default=None)
    p.add_argument("--spp", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--no-denoise", action="store_true")
    p.add_argument("--no-physics", action="store_true")
    p.add_argument("--no-textures", action="store_true")
    sub = p.add_subparsers(dest="command", required=True)

    r = sub.add_parser("render")
    r.add_argument("--frames", type=int, default=8)
    r.add_argument("--save-last", type=int, default=1)
    r.add_argument("--out-dir", default="out")
    r.set_defaults(fn=cmd_render)

    b = sub.add_parser("bench")
    b.add_argument("--frames", type=int, default=16)
    b.set_defaults(fn=cmd_bench)

    it = sub.add_parser("interactive")
    it.add_argument("--frames", type=int, default=32)
    it.add_argument("--save-last", type=int, default=4)
    it.add_argument("--out-dir", default="out")
    it.set_defaults(fn=cmd_interactive)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
