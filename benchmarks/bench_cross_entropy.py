"""Cross-entropy benchmarks: XLA reference vs fused Pallas kernel at real
vocab sizes (reference: bench_cross_entropy.py at vocab 32768)."""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.benchmark import Benchmark, measure  # noqa: E402
from flasht5_tpu.ops.cross_entropy import (  # noqa: E402
    cross_entropy_loss,
    cross_entropy_loss_ref,
)

bench = Benchmark("cross_entropy")


@bench.parametrize(rows=[2048, 8192], vocab=[32768], z=[0.0, 1e-4],
                   kernel=["ref", "pallas"], mode=["fwd", "fwd_bwd"])
def ce(rows, vocab, z, kernel, mode):
    logits = jax.random.normal(jax.random.PRNGKey(0), (rows, vocab),
                               jnp.float32)
    labels = jax.random.randint(jax.random.PRNGKey(1), (rows,), 0, vocab)

    base = cross_entropy_loss if kernel == "pallas" else (
        lambda lg, lb, z_, s: cross_entropy_loss_ref(
            lg, lb, lse_square_scale=z_, label_smoothing=s))

    if mode == "fwd":
        fn = jax.jit(lambda lg: jnp.sum(base(lg, labels, z, 0.0)[0]))
    else:
        fn = jax.jit(jax.grad(lambda lg: jnp.sum(base(lg, labels, z, 0.0)[0])))
    t = measure(fn, logits, iters=10)
    gb = rows * vocab * 4 / 1e9
    return {"ms": round(t * 1e3, 3), "GBps": round(gb / t, 1)}


if __name__ == "__main__":
    bench.run(out_csv="benchmarks/results/cross_entropy.csv")
