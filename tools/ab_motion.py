"""Orbit-motion denoiser A/B: which knob moves min-SSIM under motion?

Measured 2026-08-19: orbit min SSIM 0.936 / mean 0.9416 at the defaults
(gamma 2.5, specular-virtual on, history 30) — the specular-virtual +
variance-clamp work did NOT move the number vs round 2, so the limiter
is elsewhere. This sweep isolates it. Converged references are
disk-cached (utils/cache.ref_cache_dir), so each variant only pays the
real-time orbit (~1-2 min with a warm compile cache).

Variant notes:
- "nodenoise" disables only the denoise stage but KEEPS TAA
  (taa_mode="on") — it bounds the 1spp+TAA floor; without the TAA
  override the pipeline's auto gate would also drop temporal
  accumulation and measure raw 1spp instead (ADVICE r3 medium).
- "norestirtemp" disables ReSTIR temporal resampling: if the limiter is
  the pseudo-previous-surface bias-correction shortcut
  (ops/restir.py:72-81), motion SSIM should RISE without it.
- A failed variant prints an error record and the sweep continues
  (queue policy: never lose the rest of the sweep to one failure).

Usage: python tools/ab_motion.py [variant ...]
(no args = all variants; names below)
"""
import json
import sys
import traceback

from drts_tpu.utils import cache

cache.enable_compile_cache()

from drts_tpu import fidelity  # noqa: E402
from drts_tpu.ops import restir  # noqa: E402

VARIANTS = {
    # ReSTIR temporal resampling off (spatial + initial only): isolates
    # the pseudo-previous-surface temporal bias shortcut under motion.
    "norestirtemp": {"restir": restir.ReSTIRConfig(temporal_enabled=False)},
    "baseline": {},
    "gamma1.5": {"denoiser_clamp_gamma": 1.5},
    "gamma5": {"denoiser_clamp_gamma": 5.0},
    "gamma0": {"denoiser_clamp_gamma": 0.0},  # clamp off
    "nospecvirt": {"denoiser_specular_virtual": False},
    "hist12": {"denoiser_max_history": 12},
    "relax": {"denoiser": "NRDReLAX"},
    # denoiser off, temporal accumulation ON: the 1spp+TAA floor.
    "nodenoise": {"denoiser": "None", "taa_mode": "on"},
    # raw 1spp, no temporal filtering at all (the hard floor).
    "raw1spp": {"denoiser": "None", "taa_mode": "off"},
    # Pairwise temporal MIS with the pseudo-previous surface vs the REAL
    # previous-frame surface rows (temporal_prev_surface="real") — does
    # unbiased temporal reuse under motion move orbit SSIM?
    "pairwise": {"restir": restir.ReSTIRConfig(
        temporal_bias_correction="pairwise")},
    "pairwise_real": {"restir": restir.ReSTIRConfig(
        temporal_bias_correction="pairwise", temporal_prev_surface="real")},
    # Round-4 orbit-plateau candidates (ab_motion r4 found raw1spp=0.916
    # vs baseline=0.936 — the temporal stack barely accumulates under
    # motion): Catmull-Rom history resampling (anti-blur) and a wider /
    # effectively-off TAA variance clip (anti-rejection).
    "catmull": {"taa_history_filter": "catmull"},
    "taaclip2.5": {"taa_clip_gamma": 2.5},
    "taaclip8": {"taa_clip_gamma": 8.0},
    "catmull_clip2.5": {"taa_history_filter": "catmull",
                        "taa_clip_gamma": 2.5},
    # Stage-4 measured: WIDER clip is worse (2.5 -> 0.9175, 8 -> worse)
    # => misaligned history, not over-rejection. Map the tight direction
    # too, and re-run catmull after the half-texel-convention fix (the
    # stage-4 catmull numbers measured the BUG: blur even at statics).
    "taaclip0.5": {"taa_clip_gamma": 0.5},
    "blend0.05": {"taa_blend_alpha": 0.05},
    "catmull_blend0.05": {"taa_history_filter": "catmull",
                          "taa_blend_alpha": 0.05},
    # Stage-6 measured: taaclip0.5 is the winner (min 0.9487 mean 0.9531)
    # but the tight clip costs the STATIC frame (0.9816 -> 0.9733).
    # Motion-adaptive gamma (tight only where pixels move) + the tightness
    # sweep around 0.5, plus combos with catmull (whose sharpness may
    # stack with the adaptive clip's static win).
    "taaclip0.3": {"taa_clip_gamma": 0.3},
    "taaclip0.7": {"taa_clip_gamma": 0.7},
    "adapt0.5": {"taa_clip_gamma_motion": 0.5},
    "adapt0.3": {"taa_clip_gamma_motion": 0.3},
    "adapt0.5_catmull": {"taa_clip_gamma_motion": 0.5,
                         "taa_history_filter": "catmull"},
    # Stage-7: taaclip0.3 global hits the orbit target (min 0.9518) but
    # costs the static frame (0.9667); adapt@1px-saturation protects the
    # static frame (0.9816) but slow pixels kept the loose box (0.948).
    # => saturate the adaptive ramp faster.
    "adapt0.3_s0.25": {"taa_clip_gamma_motion": 0.3,
                       "taa_clip_motion_px": 0.25},
    "adapt0.2_s0.25": {"taa_clip_gamma_motion": 0.2,
                       "taa_clip_motion_px": 0.25},
    "adapt0.3_s0.1": {"taa_clip_gamma_motion": 0.3,
                      "taa_clip_motion_px": 0.1},
    "taaclip0.2": {"taa_clip_gamma": 0.2},
    # Pure previous-surface A/B at the DEFAULT bias correction (VERDICT
    # r4 weak #4: the real-prev-surface lever was built but never given
    # a recorded verdict at defaults; pairwise_real changes two knobs).
    "prevreal": {"restir": restir.ReSTIRConfig(
        temporal_prev_surface="real")},
    # Stage-9 (round 5): adapt0.3_s0.25 min 0.9494 is 0.0006 short of the
    # 0.95 bar with statics protected; probe the gamma midpoint at fast
    # saturation and the catmull combo (sharper history may stack).
    "adapt0.25_s0.25": {"taa_clip_gamma_motion": 0.25,
                        "taa_clip_motion_px": 0.25},
    "adapt0.25_s0.25_catmull": {"taa_clip_gamma_motion": 0.25,
                                "taa_clip_motion_px": 0.25,
                                "taa_history_filter": "catmull"},
}


def main():
    names = sys.argv[1:] or list(VARIANTS)
    for name in names:
        ov = dict(VARIANTS[name])
        ov_str = {k: repr(v) for k, v in ov.items()}  # dataclass-safe
        try:
            r = fidelity.run_motion(pipeline_overrides=ov)
            print(json.dumps({"variant": name, "overrides": ov_str,
                              "min": r["min"], "mean": r["value"],
                              "per_frame": r["per_frame"]}), flush=True)
        except Exception:
            print(json.dumps({"variant": name, "overrides": ov_str,
                              "error": traceback.format_exc(limit=3)}),
                  flush=True)


if __name__ == "__main__":
    main()
