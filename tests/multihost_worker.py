"""Subprocess body for the 2-process multi-host (DCN) smoke test.

Each process runs this script with `<port> <process_id>`: it boots the
jax.distributed runtime on the CPU backend (2 virtual devices per
process -> 4 global), builds the GLOBAL row mesh through
parallel/multihost.py, runs one row-sharded jitted reduction whose
result must agree across processes (the collective rides the
coordinator-established transport — the DCN stand-in), and prints the
process-local row range bookkeeping.
"""

import os
import sys

port, pid = sys.argv[1], int(sys.argv[2])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))
from drts_tpu.parallel import mesh as mesh_mod, multihost  # noqa: E402

assert multihost.initialize(f"127.0.0.1:{port}", 2, pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert len(jax.local_devices()) == 2

mesh = multihost.global_mesh()
assert mesh.devices.size == 4

h = 8
sharding = mesh_mod.row_sharded(mesh, 2)
# Build the global row-sharded array from per-process local shards (the
# multi-controller contract: every process provides its addressable rows).
x = jax.make_array_from_callback(
    (h, 4), sharding,
    lambda idx: jnp.arange(h * 4, dtype=jnp.float32).reshape(h, 4)[idx])

total = jax.jit(jnp.sum, out_shardings=mesh_mod.replicated(mesh))(x)
r0, r1 = multihost.process_local_rows(h)
print(f"RESULT pid={pid} sum={float(total)} rows={r0}:{r1}", flush=True)
