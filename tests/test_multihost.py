"""Multi-host (DCN) smoke test: 2 REAL processes, one coordinator.

SURVEY.md §5.8 / VERDICT r2 missing #7: the single-process no-op fallback
of parallel/multihost.py was the only exercised path. This test spawns
two OS processes that each call multihost.initialize() against a local
coordinator, build the same global 4-device row mesh, and run a
row-sharded jitted reduction — a cross-PROCESS collective (gloo CPU
transport standing in for DCN). Both must report the same sum and
complementary addressable row ranges.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_global_mesh_collective():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("PYTHONPATH", "JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    want_sum = float(sum(range(8 * 4)))
    lines = sorted(line for out in outs for line in out.splitlines()
                   if line.startswith("RESULT"))
    assert lines == [f"RESULT pid=0 sum={want_sum} rows=0:4",
                     f"RESULT pid=1 sum={want_sum} rows=4:8"], lines
