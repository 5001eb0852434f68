"""Shared on-disk cache locations (compile cache + fidelity references).

User-scoped by default (ADVICE r3: a world-shared /tmp name can be
pre-created or seeded by another user on a multi-user host); the env
overrides keep the old behavior available for a deliberately shared dir.
"""

from __future__ import annotations

import getpass
import os
import tempfile


def _user() -> str:
    try:
        return getpass.getuser()
    except Exception:  # no passwd entry in minimal containers
        return f"uid{os.getuid()}" if hasattr(os, "getuid") else "user"


def compile_cache_dir() -> str:
    """Persistent XLA compile-cache dir (override: DRTS_BENCH_CACHE_DIR)."""
    return os.environ.get(
        "DRTS_BENCH_CACHE_DIR",
        os.path.join(tempfile.gettempdir(), f"drts_jax_cache_{_user()}"))


def ref_cache_dir() -> str:
    """Converged fidelity-reference dir (override: DRTS_FID_REF_DIR)."""
    return os.environ.get(
        "DRTS_FID_REF_DIR",
        os.path.join(tempfile.gettempdir(), f"drts_fid_refs_{_user()}"))


def enable_compile_cache() -> None:
    """Turn on the persistent XLA compile cache: bench/fidelity programs
    are large (minutes of compile at 1080p through the TPU tunnel) and
    byte-identical across runs on the same machine. TPU entries are keyed
    by device kind + HLO, so sharing the dir across checkouts is safe."""
    import jax

    jax.config.update("jax_compilation_cache_dir", compile_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
