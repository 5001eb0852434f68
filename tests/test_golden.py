"""Golden-image regression net (SURVEY.md §4: golden-image tests per pass
at tiny resolutions). The golden was rendered by this exact recipe on the
CPU backend; SSIM tolerance absorbs cross-version numeric drift while any
real integrator/shading/tonemap regression (energy shift, geometry break,
color swap) lands far below it. Regenerate deliberately with
tools/regen_golden.py when the change is INTENDED."""

import os

import jax.numpy as jnp
import numpy as np

from drts_tpu.models import myscene
from drts_tpu.ops import camera as camera_mod, pathtrace, post
from drts_tpu.utils import image as image_mod

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "demo_64.png")


def render_golden_frame():
    host = myscene.build(oscillator_grid=8)
    pos = np.array([0.0, 1.0, -5.0])
    fwd = -pos / np.linalg.norm(pos)
    cam = camera_mod.make_camera(tuple(pos), tuple(fwd),
                                 horizontal_fov_deg=90.0, aspect=1.0)
    cfg = pathtrace.PathTraceConfig(width=64, height=64, bounces=3,
                                    samples_per_pixel=4, block_size=4096)
    out = pathtrace.trace_image(host.scene, cam, cfg, 0)
    return np.asarray(post.tonemap(jnp.asarray(out.radiance)))


def test_demo_scene_matches_golden():
    img = render_golden_frame()
    golden = image_mod.load_image(GOLDEN)[..., :3]
    assert golden.shape == img.shape, (golden.shape, img.shape)
    score = image_mod.ssim(img, golden)
    assert score > 0.97, score
    assert abs(float(img.mean()) - float(golden.mean())) < 0.01
