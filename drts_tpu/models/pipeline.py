"""The flagship render pipeline: the frame orchestrator.

TPU-native redesign of the reference's App layer
(/root/reference/Source/App.cpp:144-643 Tick/Update/Render +
RenderScene:1111-1283 + PostProcessGraphics:1460-1525): the imperative frame
graph over command lists and ping-pong textures collapses into one pure
function ``state', image = render_frame(pipeline, state, camera_pose)``,
fully jittable. History swap (App.cpp:618-625) is functional state
threading; ``reset_history`` (App.cpp:667-679) reinitializes the state
pytree.

Frame graph (mirrors SURVEY.md §3.2/3.3/3.4):
  physics step -> scene pose refresh (TLAS-refit analogue) -> G-buffer ->
  [ReSTIR DI] -> path trace (with SHARC GI cache) -> denoise ->
  TAA upscale -> bloom -> tone map.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from .. import config as config_mod
from ..ops import (camera as camera_mod, denoise, gbuffer, pathtrace,
                   physics, post, taa)
from ..utils import math as m
from ..utils import rng as rng_mod
from . import myscene, scene as scene_mod


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Static pipeline topology, derived from GraphicsSettings."""
    output_width: int = 1920
    output_height: int = 1080
    render_width: int = 1920
    render_height: int = 1080
    bounces: int = 8
    samples_per_pixel: int = 1
    russian_roulette: bool = True
    throughput_threshold: float = 1e-3
    denoiser: str = "NRDReBLUR"           # "None" | "NRDReBLUR" | "NRDReLAX"
    upscaling: bool = True
    bloom_enabled: bool = True
    bloom_strength: float = 0.05
    sharpen_enabled: bool = True
    sharpness: float = 0.5
    tone_map_operator: str = "ACESFilmic"
    exposure: float = 1.0
    jitter_enabled: bool = True
    physics_enabled: bool = True
    horizontal_fov_deg: float = 90.0
    block_size: int = 16384
    halton_period: int = 64

    @classmethod
    def from_settings(cls, s: config_mod.GraphicsSettings,
                      output_width: int | None = None,
                      output_height: int | None = None) -> "PipelineConfig":
        ow = output_width or s.render_width
        oh = output_height or s.render_height
        if (s.post.upscaler != config_mod.Upscaler.NONE
                and s.post.super_resolution_mode
                != config_mod.SuperResolutionMode.NATIVE):
            rw, rh = taa.render_size_for(ow, oh,
                                         s.post.super_resolution_mode.value)
        else:
            rw, rh = ow, oh
        return cls(
            output_width=ow, output_height=oh,
            render_width=rw, render_height=rh,
            bounces=s.raytracing.bounces,
            samples_per_pixel=s.raytracing.samples_per_pixel,
            russian_roulette=s.raytracing.is_russian_roulette_enabled,
            throughput_threshold=s.raytracing.throughput_threshold,
            denoiser=("None" if s.post.denoiser == config_mod.Denoiser.NONE
                      else "NRDReBLUR"),
            upscaling=(rw, rh) != (ow, oh),
            bloom_enabled=s.post.is_bloom_enabled,
            bloom_strength=s.post.bloom_strength,
            sharpen_enabled=s.post.is_sharpening_enabled,
            sharpness=s.post.sharpness,
            tone_map_operator=s.post.tone_map_operator.value,
            exposure=s.post.exposure,
            jitter_enabled=s.camera.is_jitter_enabled,
            horizontal_fov_deg=s.camera.horizontal_field_of_view,
        )


@struct.dataclass
class FrameState:
    """All cross-frame state (the 'functions-like-a-checkpoint' set from
    SURVEY.md §5.4: history textures, accumulators, physics world, frame
    counter — serializable as one pytree)."""
    frame_index: jnp.ndarray
    bodies: physics.RigidBodies
    scene: scene_mod.SphereScene
    denoiser: denoise.DenoiserState
    taa: taa.TAAState
    earth_gravity: jnp.ndarray   # scalar bool toggles (MyScene.ixx userData)
    star_gravity: jnp.ndarray


@struct.dataclass
class CameraPose:
    """Dynamic camera inputs (position/orientation from the controller)."""
    position: jnp.ndarray  # (3,)
    forward: jnp.ndarray   # (3,)
    up: jnp.ndarray        # (3,)


class RenderPipeline:
    """Holds static config + Halton jitter table; all methods pure."""

    def __init__(self, cfg: PipelineConfig):
        self.cfg = cfg
        self.jitter_table = jnp.asarray(
            rng_mod.halton_jitter(cfg.halton_period))

    # -- state management ---------------------------------------------------

    def init_state(self, host: myscene.MySceneHost | None = None,
                   seed: int = 0) -> FrameState:
        if host is None:
            host = myscene.build(seed=seed)
        c = self.cfg
        return FrameState(
            frame_index=jnp.int32(0),
            bodies=host.bodies,
            scene=host.scene,
            denoiser=denoise.init_state(c.render_height, c.render_width),
            taa=taa.init_state(c.output_height, c.output_width),
            earth_gravity=jnp.asarray(False),
            star_gravity=jnp.asarray(False),
        )

    def default_camera_pose(self, host: myscene.MySceneHost | None = None
                            ) -> CameraPose:
        pos = host.camera_position if host else (0.0, 0.0, -15.0)
        fwd = host.camera_forward if host else (0.0, 0.0, 1.0)
        return CameraPose(position=jnp.asarray(pos, jnp.float32),
                          forward=jnp.asarray(fwd, jnp.float32),
                          up=jnp.asarray((0.0, 1.0, 0.0), jnp.float32))

    def reset_history(self, state: FrameState) -> FrameState:
        """m_resetHistory (App.cpp:667-679)."""
        c = self.cfg
        return state.replace(
            denoiser=denoise.init_state(c.render_height, c.render_width),
            taa=taa.init_state(c.output_height, c.output_width))

    # -- per-frame ----------------------------------------------------------

    def _camera(self, state: FrameState, pose: CameraPose,
                prev_pose: CameraPose | None = None) -> camera_mod.Camera:
        c = self.cfg
        jitter = jnp.where(
            c.jitter_enabled,
            self.jitter_table[jnp.mod(state.frame_index,
                                      c.halton_period)],
            jnp.zeros(2, jnp.float32))
        cam = camera_mod.make_camera(
            pose.position, pose.forward, pose.up,
            horizontal_fov_deg=c.horizontal_fov_deg,
            aspect=c.render_width / c.render_height, jitter=jitter)
        if prev_pose is not None:
            prev = camera_mod.make_camera(
                prev_pose.position, prev_pose.forward, prev_pose.up,
                horizontal_fov_deg=c.horizontal_fov_deg,
                aspect=c.render_width / c.render_height)
            cam = cam.replace(prev_position=prev.position,
                              prev_right=prev.right, prev_up=prev.up,
                              prev_forward=prev.forward)
        return cam

    def render_frame(self, state: FrameState, pose: CameraPose,
                     dt=1.0 / 60.0, prev_pose: CameraPose | None = None,
                     reset=False):
        """One full App::Tick (update + render + post). Pure; jittable.

        Returns (new_state, output image (OH, OW, 3) in display [0,1])."""
        c = self.cfg
        reset = jnp.asarray(reset)

        # --- Update: physics + scene refresh (App.cpp:556-557,972) ---------
        if c.physics_enabled:
            bodies = physics.step(state.bodies, dt, state.earth_gravity,
                                  state.star_gravity)
        else:
            bodies = state.bodies
        scene = scene_mod.advance_pose(state.scene, bodies.position,
                                       bodies.rotation)

        cam = self._camera(state, pose, prev_pose)

        # --- RenderScene (App.cpp:1111-1283) --------------------------------
        gbuf = gbuffer.generate(scene, cam, c.render_width, c.render_height,
                                c.block_size)
        pt_cfg = pathtrace.PathTraceConfig(
            width=c.render_width, height=c.render_height, bounces=c.bounces,
            samples_per_pixel=c.samples_per_pixel,
            russian_roulette=c.russian_roulette,
            throughput_threshold=c.throughput_threshold,
            block_size=c.block_size)
        out = pathtrace.trace_image(scene, cam, pt_cfg, state.frame_index,
                                    gbuf=gbuf)

        # --- PostProcessGraphics (App.cpp:1460-1525) -------------------------
        den_state = state.denoiser
        if c.denoiser != "None":
            # Split indirect radiance into demodulated diffuse/specular
            # channels (Raytracing.hlsl:400-413 + NRDComposition pack).
            indirect = jnp.maximum(out.radiance - out.primary_radiance, 0.0)
            hd = jnp.where(jnp.isfinite(out.hit_distance), out.hit_distance,
                           0.0)
            d_diff, d_spec = denoise.demodulate(
                jnp.where(out.is_diffuse[..., None], indirect, 0.0),
                jnp.where(out.is_diffuse[..., None], 0.0, indirect),
                out.primary_albedo, out.primary_f_env)
            diff4 = jnp.concatenate([d_diff, hd[..., None]], axis=-1)
            spec4 = jnp.concatenate([d_spec, hd[..., None]], axis=-1)
            den_state, f_diff, f_spec = denoise.denoise(
                state.denoiser, diff4, spec4, gbuf.motion,
                out.primary_normal, gbuf.linear_depth, out.primary_valid,
                gbuf.mat.roughness, reset)
            color = denoise.compose(out.primary_radiance, f_diff, f_spec,
                                    out.primary_albedo, out.primary_f_env,
                                    out.primary_valid)
        else:
            color = out.radiance

        taa_state = state.taa
        if c.upscaling or c.denoiser != "None":
            taa_state, color = taa.upscale(
                state.taa, color, gbuf.motion, cam.jitter,
                c.output_height, c.output_width, reset)
        elif (c.output_height, c.output_width) != (c.render_height,
                                                   c.render_width):
            color = post.resize_bilinear(color, c.output_height,
                                         c.output_width)

        if c.sharpen_enabled:
            color = post.sharpen(color, c.sharpness)
        if c.bloom_enabled:
            color = post.bloom(color, c.bloom_strength)
        image = post.tonemap(color, c.tone_map_operator, c.exposure)

        new_state = FrameState(
            frame_index=state.frame_index + 1,
            bodies=bodies, scene=scene, denoiser=den_state, taa=taa_state,
            earth_gravity=state.earth_gravity,
            star_gravity=state.star_gravity)
        return new_state, image

    def render_frame_jit(self):
        """Jitted render_frame closure (static self via closure capture)."""
        return jax.jit(lambda state, pose, dt, reset:
                       self.render_frame(state, pose, dt, reset=reset))
