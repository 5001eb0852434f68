"""Camera + controller tests (Camera.ixx / Camera.hlsli semantics)."""

import jax.numpy as jnp
import numpy as np

from drts_tpu.ops import camera as camera_mod
from drts_tpu.utils import math as m


def test_pinhole_rays_center_and_fov():
    cam = camera_mod.make_camera((0, 0, 0), forward=(0, 0, 1),
                                 horizontal_fov_deg=90.0, aspect=1.0)
    ndc = jnp.array([[0.0, 0.0], [1.0, 0.0], [-1.0, 0.0]])
    o, d, tmin, tmax = camera_mod.generate_pinhole_rays(cam, ndc)
    np.testing.assert_allclose(np.asarray(d[0]), [0, 0, 1], atol=1e-6)
    # 90° hfov: edge ray at 45° from center.
    np.testing.assert_allclose(float(m.dot(d[1], d[0])), np.cos(np.pi / 4),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(o), 0.0, atol=1e-6)


def test_project_roundtrip():
    cam = camera_mod.make_camera((1.0, 2.0, -5.0), forward=(0, 0, 1),
                                 horizontal_fov_deg=90.0, aspect=16 / 9)
    ndc_in = jnp.array([[0.3, -0.4], [0.0, 0.0], [-0.9, 0.8]])
    o, d, _, _ = camera_mod.generate_pinhole_rays(cam, ndc_in)
    world = o + d * 7.0
    ndc_out, depth = camera_mod.project_to_ndc(cam, world)
    np.testing.assert_allclose(np.asarray(ndc_out), np.asarray(ndc_in),
                               atol=1e-5)
    assert (np.asarray(depth) > 0).all()


def test_pixel_ndc_roundtrip():
    ndc = camera_mod.pixel_ndc(64, 32, jnp.zeros(2))
    px = camera_mod.ndc_to_pixel(ndc, 64, 32)
    xs = np.asarray(px[..., 0])
    ys = np.asarray(px[..., 1])
    np.testing.assert_allclose(xs[0], np.arange(64), atol=1e-4)
    np.testing.assert_allclose(ys[:, 0], np.arange(32), atol=1e-4)


def test_controller_translate_rotate():
    c = camera_mod.CameraController(position=(0, 0, 0), forward=(0, 0, 1))
    c.translate((0.0, 0.0, 2.0))
    np.testing.assert_allclose(c.position, [0, 0, 2], atol=1e-9)
    c.rotate(yaw=np.pi / 2)
    # Left-handed frame (reference SimpleMath): +90° yaw turns +z to +x.
    np.testing.assert_allclose(c.forward, [1, 0, 0], atol=1e-6)
    c.translate((0.0, 0.0, 1.0))
    np.testing.assert_allclose(c.position, [1, 0, 2], atol=1e-6)
    # Orthonormal after arbitrary rotations.
    c.rotate(yaw=0.3, pitch=0.2, roll=0.1)
    assert abs(np.dot(c.forward, c.right)) < 1e-6
    assert abs(np.linalg.norm(c.forward) - 1) < 1e-6
    pose = c.pose()
    assert pose.position.shape == (3,)


def test_controller_look_at():
    c = camera_mod.CameraController(position=(5.0, 1.0, 0.0))
    c.look_at((0.0, 1.0, 0.0))
    np.testing.assert_allclose(c.forward, [-1, 0, 0], atol=1e-6)


def test_thin_lens_dof():
    cam = camera_mod.make_camera((0, 0, 0), aperture_radius=0.2, aspect=1.0)
    ndc = jnp.zeros((64, 2))
    rnd = jnp.stack([jnp.linspace(0.01, 0.99, 64)] * 2, axis=-1)
    o, d, _, _ = camera_mod.generate_thin_lens_rays(cam, ndc, rnd)
    # Origins spread over the aperture; rays converge at the focal plane.
    assert float(jnp.std(o[:, 0])) > 0.01
    focal = o + d / m.dot(d, jnp.array([0.0, 0.0, 1.0]))[:, None]
    spread = np.asarray(focal) - np.asarray(focal)[0]
    np.testing.assert_allclose(spread, np.zeros_like(spread), atol=1e-5)


def test_apply_input_key_bindings():
    """CLI fly-camera key map (App.cpp ProcessInput analogue): w moves
    along local forward, d along local right, l yaws right (forward tips
    toward +x for a +z-facing camera), r/p/x report their actions,
    unbound keys are ignored without touching the state."""
    c = camera_mod.CameraController(position=(0.0, 0.0, -15.0))
    assert camera_mod.apply_input_key(c, "w", move_step=2.0) == "move"
    np.testing.assert_allclose(c.position, [0, 0, -13], atol=1e-9)
    assert camera_mod.apply_input_key(c, "d", move_step=1.0) == "move"
    np.testing.assert_allclose(c.position, [1, 0, -13], atol=1e-9)
    fwd_before = c.forward
    assert camera_mod.apply_input_key(c, "l") == "turn"
    assert c.forward[0] > fwd_before[0]
    assert camera_mod.apply_input_key(c, "i") == "turn"
    assert c.forward[1] > 0.0  # pitch up
    assert camera_mod.apply_input_key(c, "r") == "reset"
    assert camera_mod.apply_input_key(c, "p") == "screenshot"
    assert camera_mod.apply_input_key(c, "x") == "quit"
    pos = c.position.copy()
    assert camera_mod.apply_input_key(c, "z") == ""
    np.testing.assert_array_equal(c.position, pos)
