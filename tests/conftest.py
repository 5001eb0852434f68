"""Test configuration: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4: the CPU backend is our "WARP fake backend"; multi-chip tests
fake a mesh with xla_force_host_platform_device_count.
Must run before jax is imported anywhere.
"""

import os

# Force (not setdefault): the environment ships JAX_PLATFORMS=axon, and a
# test process that initializes the axon relay holds the single TPU tunnel,
# blocking concurrent benchmark runs.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin registers itself regardless of JAX_PLATFORMS; pin the
# default platform explicitly so tests run on the 8-device virtual CPU mesh
# (and stop competing with TPU benchmarks).
import jax  # noqa: E402

jax.config.update("jax_platform_name", "cpu")

# Persistent compilation cache: the suite is dominated by full-frame-graph
# XLA CPU compiles (30-60 s each on the 1-vCPU box); re-runs hit the cache
# and the suite drops well under 5 minutes. (The env-var spelling is not
# honored by this jax version — set via config.)
#
# Key the cache dir by machine: XLA:CPU AOT-compiles for the host's exact
# ISA, so entries written on another box SIGILL-warn (and silently recompile)
# here. A per-CPU-model dir makes the cache portable across checkouts without
# ever replaying foreign code objects.
import hashlib  # noqa: E402
import platform  # noqa: E402


def _machine_key() -> str:
    # cpuinfo model+flags alone proved insufficient across fleet boxes:
    # LLVM's host tuning features (e.g. prefer-no-scatter) can differ while
    # cpuinfo matches, and foreign AOT entries then warn about SIGILL risk.
    # Fold in the jaxlib build too, which pins the LLVM that wrote the cache.
    import jaxlib
    parts = [platform.machine(), platform.version(),
             getattr(jaxlib, "__version__", "?")]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("model name", "flags")):
                    parts.append(line.strip())
                    if len(parts) >= 5:
                        break
    except OSError:
        pass
    return hashlib.sha1("|".join(parts).encode()).hexdigest()[:12]


jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("DRTS_TEST_CACHE_DIR",
                                 f"/tmp/drts_jax_test_cache_{_machine_key()}"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
