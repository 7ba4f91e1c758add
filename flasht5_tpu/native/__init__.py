"""ctypes bindings for the native (C++) host-side hot paths.

Builds lazily with `make` on first use if the shared library is missing;
every entry point has a numpy fallback in the pure-Python collator, so the
native layer is an accelerator, never a hard dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB = os.path.join(_DIR, "libul2_core.so")


@lru_cache(maxsize=1)
def load_ul2_core() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native UL2 core; None if unavailable."""
    if not os.path.exists(_LIB):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    lib.ul2_random_spans_noise_mask.restype = ctypes.c_int64
    lib.ul2_random_spans_noise_mask.argtypes = [
        ctypes.c_int64, ctypes.c_double, ctypes.c_double, ctypes.c_int64,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint8)]
    lib.ul2_best_fit_pack.restype = ctypes.c_int64
    lib.ul2_best_fit_pack.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64)]
    return lib


def native_noise_mask(length: int, mu: float, r: float, max_spans: int,
                      seed: int) -> Optional[np.ndarray]:
    lib = load_ul2_core()
    if lib is None:
        return None
    out = np.zeros(length, np.uint8)
    lib.ul2_random_spans_noise_mask(
        length, mu, r, max_spans, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)


def native_best_fit(len_in: np.ndarray, len_lb: np.ndarray,
                    n_sent: np.ndarray, max_len: int, max_labels: int,
                    sentinel_budget: int, batch_size: int
                    ) -> Optional[np.ndarray]:
    lib = load_ul2_core()
    if lib is None:
        return None
    n = len(len_in)
    li = np.ascontiguousarray(len_in, np.int64)
    ll = np.ascontiguousarray(len_lb, np.int64)
    ns = np.ascontiguousarray(n_sent, np.int64)
    out = np.full(n, -1, np.int64)
    p = ctypes.POINTER(ctypes.c_int64)
    lib.ul2_best_fit_pack(n, li.ctypes.data_as(p), ll.ctypes.data_as(p),
                          ns.ctypes.data_as(p), max_len, max_labels,
                          sentinel_budget, batch_size,
                          out.ctypes.data_as(p))
    return out
