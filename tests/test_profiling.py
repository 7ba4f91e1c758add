"""Roofline / timing utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from flasht5_tpu.utils.profiling import CHIP_SPECS, Roofline, roofline, timed


def test_timed_measures():
    f = jax.jit(lambda x: x @ x)
    x = jnp.ones((256, 256))
    t = timed(f, x, iters=3, warmup=1)
    assert t > 0


def test_roofline_math():
    r = Roofline(seconds=1e-3, flops=100e9, bytes=100e6, chip="v5e")
    assert r.achieved_tflops == 100.0
    assert r.bound == "compute"  # 100 GFLOP/197 TFLOPs > 100MB/819GBps
    assert 0 < r.speed_of_light < 1
    rep = r.report()
    assert set(rep) == {"seconds", "achieved_tflops", "achieved_gbps",
                        "bound", "speed_of_light"}


def test_roofline_measured():
    f = jax.jit(lambda x: jnp.sum(x * 2.0))
    x = jnp.ones((1024, 1024))
    r = roofline(f, x, flops=x.size * 2, bytes_accessed=x.size * 4, iters=3)
    assert r.chip in CHIP_SPECS
    assert np.isfinite(r.speed_of_light)
