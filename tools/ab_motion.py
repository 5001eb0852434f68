"""Orbit-motion denoiser A/B: which knob moves min-SSIM under motion?

Measured 2026-08-19: orbit min SSIM 0.936 / mean 0.9416 at the defaults
(gamma 2.5, specular-virtual on, history 30) — the specular-virtual +
variance-clamp work did NOT move the number vs round 2, so the limiter
is elsewhere. This sweep isolates it. Converged references are
disk-cached (/tmp/drts_fid_refs), so each variant only pays the
real-time orbit (~1-2 min with a warm compile cache).

Usage: python tools/ab_motion.py [variant ...]
(no args = all variants; names below)
"""
import json
import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DRTS_BENCH_CACHE_DIR",
                                 "/tmp/drts_jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from drts_tpu import fidelity  # noqa: E402

VARIANTS = {
    "baseline": {},
    "gamma1.5": {"denoiser_clamp_gamma": 1.5},
    "gamma5": {"denoiser_clamp_gamma": 5.0},
    "gamma0": {"denoiser_clamp_gamma": 0.0},  # clamp off
    "nospecvirt": {"denoiser_specular_virtual": False},
    "hist12": {"denoiser_max_history": 12},
    "relax": {"denoiser": "NRDReLAX"},
    "nodenoise": {"denoiser": "None"},  # isolates denoiser vs TAA/1spp
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        ov = VARIANTS[name]
        r = fidelity.run_motion(pipeline_overrides=ov)
        print(json.dumps({"variant": name, "overrides": ov,
                          "min": r["min"], "mean": r["value"],
                          "per_frame": r["per_frame"]}), flush=True)


if __name__ == "__main__":
    main()
