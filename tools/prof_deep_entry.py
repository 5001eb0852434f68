"""Decompose the bounce-2 compacted-segment ENTRY cost (round 5).

prof_trace5 measured b1 38.1 ms -> b8 78.0 ms with only ~130k rays traced
in bounces 2-8, and prof_compact2 (r4) showed the cost is IDENTICAL across
all three src-table impls — so ~30+ ms hides in the entry path common to
them: the 2M cumsum, the coherence sort, the wide state gathers (gsel), or
the contribution map-back (_slots_to_space). This times each piece on
synthetic state at exact headline shapes (1080p frame, ~6.3% scattered
survivors, cap = n/24), chained-state per NEXT.md measurement lessons
(each iteration's input derives from the previous output so nothing
dedupes or hoists).

Usage: python tools/prof_deep_entry.py [piece ...]
"""
import json
import sys
import time
import traceback

from drts_tpu.utils import cache

cache.enable_compile_cache()

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
import numpy as np              # noqa: E402

from drts_tpu.ops import pathtrace  # noqa: E402

H, W = 1080, 1920
NS = H * W
CAP = pathtrace._compact_capacity(NS, 24)
LIVE_FRAC = 0.063
CFG = pathtrace.PathTraceConfig(width=W, height=H)
CFG_NOSORT = pathtrace.PathTraceConfig(width=W, height=H, compact_sort=False)

rng = np.random.RandomState(7)
ACT0 = jnp.asarray(rng.rand(NS) < LIVE_FRAC)
DIRS0 = jnp.asarray(rng.randn(NS, 3).astype(np.float32))
STATE0 = {
    "origin": jnp.asarray(rng.randn(NS, 3).astype(np.float32)),
    "dir": DIRS0,
    "thr": jnp.asarray(rng.rand(NS, 3).astype(np.float32)),
    "rough": jnp.asarray(rng.rand(NS).astype(np.float32)),
    "rng": jnp.asarray(rng.randint(0, 1 << 31, NS).astype(np.int32)),
    "pix": jnp.arange(NS, dtype=jnp.int32),
}


def _act(seed):
    """Fresh ~LIVE_FRAC live mask derived from a traced scalar (chains
    state; the hash keeps the live set scattered like real survivors)."""
    i = jnp.arange(NS, dtype=jnp.uint32) * jnp.uint32(2654435761) \
        + seed.astype(jnp.uint32)
    i = i ^ (i >> jnp.uint32(16))
    i = i * jnp.uint32(0x7FEB352D)
    return (i & jnp.uint32(0xFFFF)) < jnp.uint32(int(LIVE_FRAC * 65536))


def _mk(piece):
    import dataclasses
    cfg = CFG_NOSORT if piece.endswith("_nosort") else CFG
    base = piece.replace("_nosort", "")
    for impl in ("blocked_onehot", "two_level"):
        suf = "_" + impl.split("_")[-1]         # _onehot / _level
        if base.endswith(suf):
            base = base[:-len(suf)]
            cfg = dataclasses.replace(cfg, compact_impl=impl)
            break

    @jax.jit
    def f(seed):
        act = _act(seed)
        cs = pathtrace._compact_slots(act, DIRS0, None, cfg, CAP, H, W)
        if base == "src":
            return jnp.sum(cs["src"])
        if base == "gsel":
            g = cs["gsel"]
            tot = jnp.sum(g(STATE0["origin"], [[0.0, 0.0, 0.0]])) \
                + jnp.sum(g(STATE0["dir"], [[0.0, 0.0, 1.0]])) \
                + jnp.sum(g(STATE0["thr"], [[0.0, 0.0, 0.0]])) \
                + jnp.sum(g(STATE0["rough"], [0.0])) \
                + jnp.sum(g(STATE0["rng"], [0]).astype(jnp.float32)) \
                + jnp.sum(g(STATE0["pix"], [NS]).astype(jnp.float32))
            return tot + jnp.sum(cs["src"])
        if base == "to_space":
            vals = jnp.broadcast_to(
                jnp.sum(cs["src"]).astype(jnp.float32), (CAP, 3))
            back = pathtrace._slots_to_space(
                vals, 0.0, (cs["keep"], cs["pos"], cs["perm"], CAP))
            return jnp.sum(back)
        if base == "all":
            g = cs["gsel"]
            tot = jnp.sum(g(STATE0["origin"], [[0.0, 0.0, 0.0]])) \
                + jnp.sum(g(STATE0["dir"], [[0.0, 0.0, 1.0]])) \
                + jnp.sum(g(STATE0["thr"], [[0.0, 0.0, 0.0]])) \
                + jnp.sum(g(STATE0["rough"], [0.0])) \
                + jnp.sum(g(STATE0["rng"], [0]).astype(jnp.float32)) \
                + jnp.sum(g(STATE0["pix"], [NS]).astype(jnp.float32))
            vals = jnp.broadcast_to(tot.astype(jnp.float32), (CAP, 3))
            back = pathtrace._slots_to_space(
                vals, 0.0, (cs["keep"], cs["pos"], cs["perm"], CAP))
            return jnp.sum(back)
        raise ValueError(base)

    return f


PIECES = ["src_nosort", "src", "gsel_nosort", "gsel", "to_space", "all",
          "all_nosort", "src_level_nosort", "src_level", "all_level",
          "src_onehot_nosort"]


def run(piece, iters=20):
    try:
        f = _mk(piece)
        out = f(jnp.int32(0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(iters):
            out = f(out.astype(jnp.int32) % 1000 + i)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(json.dumps({"k": piece, "ms": round(ms, 2),
                          "cap": int(CAP)}), flush=True)
    except Exception:
        print(json.dumps({"k": piece,
                          "error": traceback.format_exc(limit=3)}),
              flush=True)


for p in (sys.argv[1:] or PIECES):
    run(p)
