"""Utilities: profiling/tracing, roofline accounting."""

from flasht5_tpu.utils.profiling import profile_trace, roofline, timed

__all__ = ["profile_trace", "roofline", "timed"]
