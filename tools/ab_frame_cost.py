"""Frame-cost trade A/Bs with fidelity guards (round 5): each variant
cuts a measured frame cost (prof_trace5 / prof_sharc_update) and must
hold the static >=0.98 and orbit >=0.95 SSIM bars to ship.

- tex1: texture_bounces=1 (bounce-1 material from constants, saves ~6 ms
  of half-mip fetch at 1080p).
- sharcp2: SHARC update every other frame (saves ~19 ms average; the
  cache's 64-frame staleness window tolerates it).
- tex1_sharcp2: both.

Usage: python tools/ab_frame_cost.py [variant ...]
"""
import json
import sys
import traceback

from drts_tpu.utils import cache

cache.enable_compile_cache()

from drts_tpu import fidelity  # noqa: E402

VARIANTS = {
    "baseline": {},
    "tex1": {"texture_bounces": 1},
    "sharcp2": {"sharc_update_period": 2},
    "tex1_sharcp2": {"texture_bounces": 1, "sharc_update_period": 2},
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        ov = dict(VARIANTS[name])
        ov_str = {k: repr(v) for k, v in ov.items()}
        try:
            s = fidelity.run(pipeline_overrides=ov)
            r = fidelity.run_motion(pipeline_overrides=ov)
            print(json.dumps({"variant": name, "overrides": ov_str,
                              "static": s["value"],
                              "orbit_min": r["min"],
                              "orbit_mean": r["value"]}), flush=True)
        except Exception:
            print(json.dumps({"variant": name, "overrides": ov_str,
                              "error": traceback.format_exc(limit=3)}),
                  flush=True)


if __name__ == "__main__":
    main()
