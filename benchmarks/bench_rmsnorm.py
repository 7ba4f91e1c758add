"""RMSNorm benchmarks: XLA reference vs fused Pallas kernel
(reference: bench_layernorm.py)."""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.benchmark import Benchmark, measure  # noqa: E402
from flasht5_tpu.ops.rmsnorm import rms_norm, rms_norm_ref  # noqa: E402

bench = Benchmark("rmsnorm")


@bench.parametrize(rows=[8192, 32768], d=[768, 2048],
                   kernel=["ref", "pallas"], mode=["fwd", "fwd_bwd"])
def rmsnorm(rows, d, kernel, mode):
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, d), jnp.bfloat16)
    w = jnp.ones((d,), jnp.bfloat16)
    base = rms_norm if kernel == "pallas" else rms_norm_ref
    if mode == "fwd":
        fn = jax.jit(lambda x, w: jnp.sum(base(x, w).astype(jnp.float32)))
    else:
        fn = jax.jit(jax.grad(
            lambda x, w: jnp.sum(base(x, w).astype(jnp.float32)),
            argnums=(0, 1)))
    t = measure(fn, x, w, iters=20)
    gb = rows * d * 2 * (2 if mode == "fwd" else 4) / 1e9
    return {"ms": round(t * 1e3, 3), "GBps": round(gb / t, 1)}


if __name__ == "__main__":
    bench.run(out_csv="benchmarks/results/rmsnorm.csv")
