"""Runtime switches shared by all Pallas ops.

Pallas kernels run in interpreter mode when no TPU is present (CPU CI /
multi-host simulation) or when FLASHT5_TPU_INTERPRET=1. This mirrors the
reference test strategy of validating kernels against pure references
(SURVEY.md §4) but lets the same kernel code run everywhere.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax


@lru_cache(maxsize=1)
def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Point JAX's persistent compilation cache at the repo-local store.

    Remote (tunneled) TPU compiles run 1-4 minutes per program; the cache
    turns re-runs of bench/validation/sweep tools into near-instant loads.
    Call from tool entry points (bench.py does its own equivalent setup).
    TPU-only: CPU AOT cache entries are machine-feature-specific and risk
    SIGILL when the store is shared across hosts (it is committed to git).
    """
    try:
        if jax.default_backend() != "tpu":
            return ""
    except Exception:
        return ""
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir


@lru_cache(maxsize=1)
def interpret_mode() -> bool:
    env = os.environ.get("FLASHT5_TPU_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True
