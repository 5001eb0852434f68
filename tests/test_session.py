"""Runtime settings mutation (the ImGui settings-window analogue,
App.cpp:1875-2273 + deferred re-init App.cpp:166-175)."""

import numpy as np

from drts_tpu import config as config_mod
from drts_tpu import session as session_mod

_HOST = None


def _host():
    """One tiny shared scene — Session otherwise builds the full 448-sphere
    demo per test, and on the 1-vCPU CI box scene+compile dominates."""
    global _HOST
    if _HOST is None:
        from drts_tpu.models import myscene
        _HOST = myscene.build(oscillator_grid=2)
    return _HOST


def _make_session(**overrides):
    settings = config_mod.GraphicsSettings(
        render_width=32, render_height=32).check()
    base = dict(restir_enabled=False, sharc_enabled=False, bounces=2,
                block_size=1024, physics_enabled=False)
    base.update(overrides)
    return session_mod.Session(settings, output_width=32, output_height=32,
                               config_overrides=base, host=_host())


def test_dynamic_setting_applies_without_recompile():
    sess = _make_session()
    img0 = np.asarray(sess.step())
    step_before = sess._step
    how = sess.set("post.exposure", "4.0")
    assert how == "dynamic"
    assert sess._step is step_before          # no re-jit
    img1 = np.asarray(sess.step())
    assert img1.mean() > img0.mean() + 1e-3   # took effect next frame


def test_static_setting_rejits_and_resets_history():
    sess = _make_session()
    sess.step()
    how = sess.set("raytracing.bounces", "1")
    assert how == "static"
    assert sess._step is None                 # stale executable dropped
    assert sess._pending_reset
    assert sess.pipe.cfg.bounces == 1
    img = np.asarray(sess.step())             # recompiles, history reset
    assert np.isfinite(img).all()
    assert not sess._pending_reset


def test_denoiser_switch_selects_distinct_path():
    sess = _make_session()
    sess.step()
    assert sess.set("post.denoiser", "NRDReLAX") == "static"
    assert sess.pipe.cfg.denoiser == "NRDReLAX"
    img_relax = np.asarray(sess.step())
    assert np.isfinite(img_relax).all()
    assert sess.set("post.denoiser", "DLSSRayReconstruction") == "static"
    img_rr = np.asarray(sess.step())
    assert np.isfinite(img_rr).all()


def test_upscaler_change_reallocates_state():
    sess = _make_session()
    sess.step()
    how = sess.set("post.upscaler", "None")
    assert how == "realloc"
    img = np.asarray(sess.step())
    assert img.shape == (32, 32, 3)
    assert np.isfinite(img).all()


def test_settings_file_reload(tmp_path):
    sess = _make_session()
    sess.step()
    path = str(tmp_path / "graphics.json")
    new = session_mod.set_by_path(sess.settings, "post.exposure", "2.5")
    new = session_mod.set_by_path(new, "raytracing.bounces", "1")
    config_mod.save_settings(new, path)
    changed = sess.reload_settings(path)
    assert set(changed) == {"post.exposure", "raytracing.bounces"}
    assert sess.settings.post.exposure == 2.5
    assert sess.pipe.cfg.bounces == 1


def test_set_by_path_unknown_key_raises():
    settings = config_mod.GraphicsSettings().check()
    try:
        session_mod.set_by_path(settings, "post.nonsense", "1")
    except KeyError:
        return
    raise AssertionError("expected KeyError")


def test_controls_settings_load_and_clamp(tmp_path):
    """Controls.json parity (MyAppData.h:392-414): defaults, JSON load,
    and the reference's clamp ranges (movement <= 1000, rotation <= 2)."""
    from drts_tpu import config as config_mod

    d = config_mod.load_controls(str(tmp_path / "missing.json"))
    assert d.camera_movement_speed == 10.0
    assert d.camera_rotation_speed == 0.5

    p = tmp_path / "controls.json"
    p.write_text('{"camera_movement_speed": 5000,'
                 ' "camera_rotation_speed": -1}')
    c = config_mod.load_controls(str(p))
    assert c.camera_movement_speed == 1000.0
    assert c.camera_rotation_speed == 0.0
