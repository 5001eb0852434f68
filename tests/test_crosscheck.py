"""Integrator-wide bias cross-check against the independent numpy tracer
(drts_tpu/crosscheck.py — de-circularized fidelity, round-3 VERDICT
weak #4): the full MyScene frame rendered by two implementations that
share no light-transport code must agree on scene energy."""

from drts_tpu import crosscheck


def test_full_scene_energy_matches_independent_tracer():
    r = crosscheck.run(width=32, height=18, spp=48, bounces=3)
    # Scene-mean MC noise at 48 spp x 576 px is ~0.5% per side; 3% is a
    # >3-sigma bound that still catches percent-level integrator bias
    # (measured agreement on landing: energy_ratio 0.9995).
    assert 0.97 < r["energy_ratio"] < 1.03, r
    # Per-pixel relative error is MC noise (~7% measured at 48 spp);
    # a systematic per-pixel defect (wrong lobe, flipped normal) blows
    # far past this.
    assert r["mean_rel_err"] < 0.15, r
