"""Chained-loop timing of SHARC splat/resolve and denoise/TAA at 1080p."""
import time, json, sys
import jax, jax.numpy as jnp, numpy as np

from drts_tpu.models import myscene
from drts_tpu.ops import denoise as dn, sharc as sharc_mod, taa as taa_mod

W, H = 1920, 1080
N = H * W
scfg = sharc_mod.SHARCConfig()
CAP = 1 << scfg.capacity_log2


def timeloop(name, body, carry0, n=6, iters=3):
    def run(k):
        f = jax.jit(lambda a0: jax.lax.fori_loop(0, k, body, a0))
        out = f(carry0); jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = f(out)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3
    t1, tn = run(1), run(n)
    print(json.dumps({"k": name, "ms": round((tn - t1) / (n - 1), 2),
                      "t1": round(t1, 1)}), flush=True)


which = set(sys.argv[1:]) or {"sharc"}
rng = np.random.RandomState(0)

if "sharc" in which:
    # 9 bounce levels at 480x270 (the update trace's splat volume).
    n_up = 480 * 270
    levels = 9
    slots = [jnp.asarray(rng.randint(0, CAP, (n_up,)), jnp.int32)
             for _ in range(levels)]
    fps = [jnp.asarray(rng.randint(1, 2**31, (n_up,)).astype(np.uint32))
           for _ in range(levels)]
    rads = [jnp.asarray(rng.rand(n_up, 3), jnp.float32)
            for _ in range(levels)]
    acts = [jnp.asarray(rng.rand(n_up) < 0.6) for _ in range(levels)]

    def b_splat(i, acc):
        st = (jnp.zeros((CAP, 3), jnp.float32),
              jnp.zeros((CAP,), jnp.float32),
              jnp.zeros((CAP,), jnp.uint32))
        d = acc[0].astype(jnp.int32)
        s2 = [jnp.clip(s + i + d, 0, CAP - 1) for s in slots]
        ssum, cnt, fp, dropped = sharc_mod.splat_levels(st, s2, fps, rads,
                                                        acts)
        return acc + jnp.array([jnp.sum(cnt) * 1e-9, 0.0])
    timeloop("splat_9x130k", b_splat, jnp.zeros((2,), jnp.float32))

    state = sharc_mod.init_state(scfg)
    fsum = jnp.asarray(rng.rand(CAP, 3), jnp.float32) * 0.1
    fcnt = jnp.asarray((rng.rand(CAP) < 0.2).astype(np.float32))
    ffp = jnp.asarray(rng.randint(0, 2**31, (CAP,)).astype(np.uint32))

    def b_resolve(i, acc):
        st = state.replace(sample_count=state.sample_count + acc[0])
        new = sharc_mod.resolve(st, fsum, fcnt, ffp, scfg)
        return acc + jnp.array([jnp.sum(new.packed[:, 3]) * 1e-12, 0.0])
    timeloop("resolve_4M", b_resolve, jnp.zeros((2,), jnp.float32))

if "denoise" in which:
    dstate = dn.init_state(H, W)
    diff = jnp.asarray(rng.rand(H, W, 4), jnp.float32)
    spec = jnp.asarray(rng.rand(H, W, 4), jnp.float32)
    motion = jnp.asarray(rng.randn(H, W, 2) * 1.5, jnp.float32)
    normal = jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 1))
    depth = jnp.full((H, W), 10.0)
    valid = jnp.ones((H, W), bool)
    rough = jnp.full((H, W), 0.5)

    def b_dn(i, acc):
        st = acc
        st2, fd, fs = dn.denoise(st, diff + st.depth[..., None] * 0, spec,
                                 motion, normal, depth, valid, rough,
                                 jnp.asarray(False))
        return st2
    timeloop("denoise_full", b_dn, dstate)

    def b_atrous(i, acc):
        st = acc
        sig = jnp.moveaxis(st.diffuse, -1, 0)
        nchw = jnp.moveaxis(normal, -1, 0)
        for j in range(3):
            sig = dn._atrous_pass_chw(sig, nchw, depth, 1 << j,
                                      dn.DenoiseConfig())
        return st.replace(diffuse=jnp.moveaxis(sig, 0, -1))
    timeloop("atrous_3x1sig", b_atrous, dstate)

if "taa" in which:
    hist0 = jnp.asarray(rng.rand(H, W, 3), jnp.float32)
    tstate = taa_mod.TAAState(history=hist0,
                              packed=taa_mod._pack_rgb16(hist0))
    color = jnp.asarray(rng.rand(H, W, 3), jnp.float32)
    motion = jnp.asarray(rng.randn(H, W, 2) * 1.5, jnp.float32)

    def b_taa(i, acc):
        st2, out = taa_mod.upscale(acc, color + acc.history * 1e-6, motion,
                                   jnp.zeros(2), H, W, jnp.asarray(False))
        return st2
    timeloop("taa_native", b_taa, tstate)
