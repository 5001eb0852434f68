"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4: fake a mesh with xla_force_host_platform_device_count)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drts_tpu.parallel import mesh as mesh_mod

pytestmark = pytest.mark.skipif(len(jax.devices()) < 2,
                                reason="needs multiple (virtual) devices")


def test_mesh_and_sharding_rules():
    mesh = mesh_mod.make_mesh(2)
    assert mesh.devices.size == 2
    state = {
        "image": jnp.zeros((16, 32, 3)),     # H divisible by 2 -> sharded
        "scene": jnp.zeros((448, 3)),        # replicated (not image height)
        "scalar": jnp.float32(0.0),
    }
    sharding = mesh_mod.frame_state_sharding(state, mesh,
                                             image_heights=(16,))
    assert sharding["image"].spec == jax.sharding.PartitionSpec(
        "rows", None, None)
    assert sharding["scene"].spec == jax.sharding.PartitionSpec()


def test_sharded_render_matches_single_device():
    """A sharded G-buffer + short trace equals the unsharded result —
    GSPMD must not change the math, only the placement."""
    from drts_tpu.models import myscene
    from drts_tpu.ops import camera as camera_mod, gbuffer, pathtrace

    host = myscene.build(oscillator_grid=1)
    scene = host.scene
    h, w = 16, 32
    cam = camera_mod.make_camera(host.camera_position, host.camera_forward,
                                 aspect=w / h)
    cfg = pathtrace.PathTraceConfig(width=w, height=h, bounces=1,
                                    block_size=512)

    def render(scene, cam):
        return pathtrace.trace_image(scene, cam, cfg, 0).radiance

    single = jax.jit(render)(scene, cam)

    mesh = mesh_mod.make_mesh(2)
    out_sharding = mesh_mod.image_sharding(mesh)
    sharded_fn = jax.jit(render, out_shardings=out_sharding)
    sharded = sharded_fn(scene, cam)
    assert len(sharded.sharding.device_set) == 2
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-5)


def test_dryrun_multichip_small():
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g
    g.dryrun_multichip(2)
