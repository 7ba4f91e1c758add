"""Tracing / profiling / speed-of-light accounting.

TPU-native replacement for the reference's torch-profiler wrapper
(benchmarks/benchmark_utils.py:203-256 — warmup, activity capture, chrome
trace export): `profile_trace` wraps jax.profiler for a Perfetto/XProf
trace; `roofline` does the per-kernel speed-of-light math the north star
requires (BASELINE.json "every kernel at speed-of-light per chip").
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp


# v5e (TPU v5 lite) per-chip peaks; other chips can be registered.
CHIP_SPECS = {
    "v5e": {"bf16_flops": 197e12, "int8_flops": 394e12, "hbm_gbps": 819e9},
    "v4": {"bf16_flops": 275e12, "int8_flops": 275e12, "hbm_gbps": 1228e9},
    "cpu": {"bf16_flops": 1e12, "int8_flops": 1e12, "hbm_gbps": 100e9},
}


def _sync(x):
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf.astype(jnp.float32))) if leaf.ndim else float(leaf)


@contextlib.contextmanager
def profile_trace(logdir: str = "/tmp/flasht5_trace"):
    """Capture a jax.profiler trace viewable in Perfetto/XProf.

    with profile_trace("/tmp/trace"):
        run_steps()
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> float:
    """Seconds per call with scalar-transfer sync (remote-backend safe)."""
    for _ in range(warmup):
        _sync(fn(*args))
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    _sync(r)
    return (time.perf_counter() - t0) / iters


@dataclasses.dataclass
class Roofline:
    seconds: float
    flops: float
    bytes: float
    chip: str

    @property
    def achieved_tflops(self) -> float:
        return self.flops / self.seconds / 1e12

    @property
    def achieved_gbps(self) -> float:
        return self.bytes / self.seconds / 1e9

    @property
    def flops_bound_time(self) -> float:
        return self.flops / CHIP_SPECS[self.chip]["bf16_flops"]

    @property
    def memory_bound_time(self) -> float:
        return self.bytes / CHIP_SPECS[self.chip]["hbm_gbps"]

    @property
    def speed_of_light(self) -> float:
        """Fraction of the roofline bound actually achieved (1.0 = optimal)."""
        bound = max(self.flops_bound_time, self.memory_bound_time)
        return bound / self.seconds

    @property
    def bound(self) -> str:
        return ("compute" if self.flops_bound_time > self.memory_bound_time
                else "memory")

    def report(self) -> Dict:
        return {
            "seconds": round(self.seconds, 6),
            "achieved_tflops": round(self.achieved_tflops, 2),
            "achieved_gbps": round(self.achieved_gbps, 1),
            "bound": self.bound,
            "speed_of_light": round(self.speed_of_light, 3),
        }


def peak_memory_bytes(fn: Callable, *args) -> Optional[int]:
    """Peak device memory of one fn call (reference benchmark_memory
    parity, benchmarks/benchmark_utils.py:258-268). Returns None when the
    backend doesn't expose memory_stats (e.g. CPU)."""
    dev = jax.devices()[0]
    if not hasattr(dev, "memory_stats") or dev.memory_stats() is None:
        return None
    _sync(fn(*args))
    stats = dev.memory_stats() or {}
    return stats.get("peak_bytes_in_use")


def roofline(fn: Callable, *args, flops: float, bytes_accessed: float,
             chip: Optional[str] = None, iters: int = 10) -> Roofline:
    """Measure fn and compare against the chip's compute/memory roofline."""
    if chip is None:
        kind = jax.devices()[0].device_kind.lower()
        chip = "v5e" if "v5 lite" in kind else (
            "v4" if "v4" in kind else "cpu")
    return Roofline(timed(fn, *args, iters=iters), flops, bytes_accessed, chip)
