"""Attention kernel benchmarks: jnp reference (XLA SDPA-equivalent) vs Pallas
flash attention (+bias) vs RPE-fused, fwd and fwd+bwd, TFLOPS.

Grid parity with the reference (bench_fa2_bias.py:15-20): B=16, H=12,
D in {64,128}, S in {512,1024}, bf16, causal±.
"""

import functools
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from benchmarks.benchmark import (  # noqa: E402
    BWD_FLOP_FACTOR,
    Benchmark,
    attention_flops,
    measure,
)
from flasht5_tpu.ops.attn_ref import attn_ref  # noqa: E402
from flasht5_tpu.ops.flash_attention import flash_attention  # noqa: E402
from flasht5_tpu.ops.flash_attention_rpe import flash_attention_rpe  # noqa: E402

bench = Benchmark("attention")


def _inputs(b, h, s, d, dtype=jnp.bfloat16, with_bias=True):
    ks = jax.random.split(jax.random.PRNGKey(0), 5)
    q = jax.random.normal(ks[0], (b, h, s, d), dtype)
    k = jax.random.normal(ks[1], (b, h, s, d), dtype)
    v = jax.random.normal(ks[2], (b, h, s, d), dtype)
    bias = jax.random.normal(ks[3], (1, h, s, s), dtype) if with_bias else None
    w = jax.random.normal(ks[4], (32, h), jnp.float32) * 0.5
    return q, k, v, bias, w


@bench.parametrize(seq=[512, 1024], d=[64, 128], causal=[False, True],
                   kernel=["ref", "pallas_bias", "pallas_rpe"])
def attention_fwd(seq, d, causal, kernel):
    b, h = 16, 12
    q, k, v, bias, w = _inputs(b, h, seq, d)
    if kernel == "ref":
        fn = jax.jit(functools.partial(attn_ref, sm_scale=1.0, causal=causal))
        args = (q, k, v, bias)
    elif kernel == "pallas_bias":
        fn = jax.jit(functools.partial(flash_attention, sm_scale=1.0, causal=causal))
        args = (q, k, v, bias)
    else:
        fn = jax.jit(functools.partial(flash_attention_rpe, sm_scale=1.0,
                                       causal=causal, bidirectional=not causal))
        args = (q, k, v, w)
    t = measure(fn, *args)
    fl = attention_flops(b, h, seq, seq, d, causal)
    return {"ms": round(t * 1e3, 3), "tflops": round(fl / t / 1e12, 1)}


@bench.parametrize(seq=[512, 1024], d=[64], causal=[False, True],
                   kernel=["ref", "pallas_bias", "pallas_rpe"])
def attention_fwd_bwd(seq, d, causal, kernel):
    b, h = 16, 12
    q, k, v, bias, w = _inputs(b, h, seq, d)

    if kernel == "ref":
        def loss(q, k, v, bias):
            return jnp.sum(attn_ref(q, k, v, bias, sm_scale=1.0,
                                    causal=causal).astype(jnp.float32))
        fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        args = (q, k, v, bias)
    elif kernel == "pallas_bias":
        def loss(q, k, v, bias):
            return jnp.sum(flash_attention(q, k, v, bias, sm_scale=1.0,
                                           causal=causal).astype(jnp.float32))
        fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        args = (q, k, v, bias)
    else:
        def loss(q, k, v, w):
            return jnp.sum(flash_attention_rpe(
                q, k, v, w, sm_scale=1.0, causal=causal,
                bidirectional=not causal).astype(jnp.float32))
        fn = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3)))
        args = (q, k, v, w)
    t = measure(fn, *args, iters=5)
    fl = attention_flops(b, h, seq, seq, d, causal) * (1 + BWD_FLOP_FACTOR)
    return {"ms": round(t * 1e3, 3), "tflops": round(fl / t / 1e12, 1)}


if __name__ == "__main__":
    bench.run(out_csv="benchmarks/results/attention.csv")
