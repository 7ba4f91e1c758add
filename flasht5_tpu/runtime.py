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
def interpret_mode() -> bool:
    env = os.environ.get("FLASHT5_TPU_INTERPRET")
    if env is not None:
        return env not in ("0", "false", "")
    try:
        return jax.default_backend() != "tpu"
    except Exception:
        return True
