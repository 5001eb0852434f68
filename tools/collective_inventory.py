"""Multi-chip collective inventory (VERDICT r4 item #9): compile the
8-device sharded frame step (the exact dryrun_multichip program) and
list every collective op in the optimized HLO with its operand bytes —
the ground-truth check on NEXT.md's "sub-ms over ICI" traffic estimate,
producible without multi-chip hardware.

Run on CPU: XLA_FLAGS=--xla_force_host_platform_device_count=8
            JAX_PLATFORMS=cpu python tools/collective_inventory.py
"""
import collections
import json
import os
import re
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

import __graft_entry__ as g  # noqa: E402
from drts_tpu.parallel import mesh as mesh_mod  # noqa: E402

DTYPE_BYTES = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4,
               "u32": 4, "s64": 8, "u64": 8, "s16": 2, "u16": 2,
               "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16}

SHAPE_RE = re.compile(r"(f64|f32|bf16|f16|s64|u64|s32|u32|s16|u16|s8|u8|"
                      r"pred|c64|c128)\[([\d,]*)\]")


def shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(text):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main(n_devices: int = 8):
    height = width = max(128, 8 * n_devices)
    pipe, state, pose = g._build(width, height, bounces=2, spp=1,
                                 compact_from=1)
    mesh = mesh_mod.make_mesh(n_devices)
    sharc_cap = (int(state.sharc.fingerprint.shape[0]),)
    state_sharding = mesh_mod.frame_state_sharding(
        state, mesh, image_heights=(height, pipe.cfg.output_height),
        slot_table_sizes=sharc_cap)
    pose_sharding = jax.tree.map(lambda _: mesh_mod.replicated(mesh), pose)
    state = jax.device_put(state, state_sharding)
    pose = jax.device_put(pose, pose_sharding)

    step = jax.jit(
        lambda s, p: pipe.render_frame(s, p, 1.0 / 60.0),
        in_shardings=(state_sharding, pose_sharding))
    hlo = step.lower(state, pose).compile().as_text()

    inv = collections.defaultdict(lambda: {"count": 0, "bytes": 0})
    for line in hlo.splitlines():
        s = line.strip()
        m = re.match(r"%?\S+ = (\S+) (all-reduce|all-gather|reduce-scatter|"
                     r"collective-permute|all-to-all)", s)
        if not m:
            continue
        op = m.group(2)
        inv[op]["count"] += 1
        # The result shape(s) lead the line: bytes moved ~ result size.
        inv[op]["bytes"] += shape_bytes(m.group(1))
    out = {"devices": n_devices, "render": f"{width}x{height}",
           "collectives": dict(inv),
           "total_bytes": sum(v["bytes"] for v in inv.values()),
           "total_count": sum(v["count"] for v in inv.values())}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
