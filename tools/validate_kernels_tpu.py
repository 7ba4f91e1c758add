"""On-hardware kernel validation: run every Pallas kernel through Mosaic on
the real chip and compare against the jnp oracles.

CPU tests run the kernels in interpreter mode; Mosaic lowering has its own
failure modes (layout casts, VMEM budgets), so this script is the hardware
gate. Prints one OK/FAIL line per kernel; exits nonzero on any failure.

    python tools/validate_kernels_tpu.py
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

FAILURES = []


def check(tag, got, want, atol=2e-2, rtol=2e-2):
    got = np.asarray(jax.device_get(got), np.float32)
    want = np.asarray(jax.device_get(want), np.float32)
    err = np.abs(got - want)
    denom = np.abs(want) + 1e-6
    ok = (err <= atol + rtol * denom).mean() > 0.999
    print(f"{'OK  ' if ok else 'FAIL'} {tag}: maxerr={err.max():.2e}",
          flush=True)
    if not ok:
        FAILURES.append(tag)


def main():
    from flasht5_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()
    assert jax.default_backend() == "tpu", "run on the TPU"
    key = jax.random.PRNGKey(0)

    # ---- rmsnorm fwd/bwd ----
    from flasht5_tpu.ops.rmsnorm import rms_norm, rms_norm_ref
    x = jax.random.normal(key, (1024, 512), jnp.bfloat16)
    w = jnp.ones((512,), jnp.bfloat16)
    check("rmsnorm fwd", jax.jit(rms_norm)(x, w), rms_norm_ref(x, w), atol=5e-2)
    g = jax.jit(jax.grad(lambda x, w: jnp.sum(rms_norm(x, w).astype(jnp.float32)),
                         argnums=(0, 1)))(x, w)
    gr = jax.grad(lambda x, w: jnp.sum(rms_norm_ref(x, w).astype(jnp.float32)),
                  argnums=(0, 1))(x, w)
    check("rmsnorm dx", g[0], gr[0], atol=1e-1)
    check("rmsnorm dw", g[1], gr[1], atol=2.0, rtol=5e-2)

    # ---- cross entropy fwd/bwd at real vocab ----
    from flasht5_tpu.ops.cross_entropy import cross_entropy_loss, cross_entropy_loss_ref
    logits = jax.random.normal(key, (256, 32768), jnp.float32)
    labels = jax.random.randint(key, (256,), 0, 32768)
    check("ce fwd", jax.jit(lambda l: cross_entropy_loss(l, labels, 1e-4, 0.1)[0])(logits),
          cross_entropy_loss_ref(logits, labels, lse_square_scale=1e-4,
                                 label_smoothing=0.1)[0], atol=1e-3)
    gk = jax.jit(jax.grad(lambda l: jnp.mean(
        cross_entropy_loss(l, labels, 1e-4, 0.1)[0])))(logits)
    gr = jax.grad(lambda l: jnp.mean(cross_entropy_loss_ref(
        l, labels, lse_square_scale=1e-4, label_smoothing=0.1)[0]))(logits)
    check("ce bwd", gk, gr, atol=1e-5, rtol=1e-2)

    # ---- flash attention (+bias) fwd/bwd incl dbias ----
    from flasht5_tpu.ops.attn_ref import attn_ref
    from flasht5_tpu.ops.flash_attention import flash_attention
    ks = jax.random.split(key, 4)
    B, H, M, N, D = 2, 4, 640, 384, 64   # non-divisible M/N vs 512 blocks
    q = jax.random.normal(ks[0], (B, H, M, D), jnp.bfloat16)
    k = jax.random.normal(ks[1], (B, H, N, D), jnp.bfloat16)
    v = jax.random.normal(ks[2], (B, H, N, D), jnp.bfloat16)
    bias = jax.random.normal(ks[3], (1, H, M, N), jnp.bfloat16) * 0.5
    for causal in (False, True):
        out = jax.jit(lambda q, k, v, b: flash_attention(
            q, k, v, b, causal=causal, sm_scale=0.125))(q, k, v, bias)
        ref = attn_ref(q, k, v, bias, sm_scale=0.125, causal=causal)
        check(f"flash fwd causal={causal}", out, ref, atol=5e-2)
    gk = jax.jit(jax.grad(lambda q, k, v, b: jnp.sum(flash_attention(
        q, k, v, b, causal=True, sm_scale=0.125).astype(jnp.float32)),
        argnums=(0, 1, 2, 3)))(q, k, v, bias)
    gr = jax.grad(lambda q, k, v, b: jnp.sum(attn_ref(
        q, k, v, b, sm_scale=0.125, causal=True).astype(jnp.float32)),
        argnums=(0, 1, 2, 3))(q, k, v, bias)
    for name, a, b_ in zip(("dq", "dk", "dv", "dbias"), gk, gr):
        check(f"flash bwd {name}", a, b_, atol=2e-1, rtol=5e-2)

    # ---- RPE flash attention fwd/bwd ----
    from flasht5_tpu import positional
    from flasht5_tpu.ops.flash_attention_rpe import flash_attention_rpe
    wrpe = jax.random.normal(ks[3], (32, H), jnp.float32) * 0.5
    bias_rpe = positional.t5_relative_bias(
        {"relative_attention_bias": wrpe}, M, N, bidirectional=True,
        num_buckets=32, max_distance=128)
    out = jax.jit(lambda q, k, v, w: flash_attention_rpe(
        q, k, v, w, causal=False, sm_scale=0.125, bidirectional=True))(q, k, v, wrpe)
    check("rpe fwd", out, attn_ref(q, k, v, bias_rpe.astype(jnp.bfloat16),
                                   sm_scale=0.125), atol=5e-2)
    gk = jax.jit(jax.grad(lambda q, k, v, w: jnp.sum(flash_attention_rpe(
        q, k, v, w, causal=False, sm_scale=0.125,
        bidirectional=True).astype(jnp.float32)), argnums=(3,)))(q, k, v, wrpe)
    gr = jax.grad(lambda q, k, v, w: jnp.sum(attn_ref(
        q, k, v, positional.t5_relative_bias(
            {"relative_attention_bias": w}, M, N, bidirectional=True,
            num_buckets=32, max_distance=128),
        sm_scale=0.125).astype(jnp.float32)), argnums=(3,))(q, k, v, wrpe)
    check("rpe dw", gk[0], gr[0], atol=5e-1, rtol=5e-2)

    # ---- int8 dequant matmul ----
    from flasht5_tpu.ops.quant import quant_matmul, quant_matmul_ref, quantize_int8
    xq = jax.random.normal(key, (256, 512), jnp.bfloat16)
    wq = quantize_int8(jax.random.normal(key, (512, 1024)) * 0.05)
    check("quant matmul", jax.jit(quant_matmul)(xq, wq),
          quant_matmul_ref(xq, wq), atol=5e-2)

    # ---- fused decode attention (bf16 + int8 cache) ----
    from flasht5_tpu.ops.decode_attention import decode_attention, decode_attention_ref
    from flasht5_tpu.ops.quant import quantize_kv
    qd = jax.random.normal(ks[0], (8, H, D), jnp.float32)
    kd = jax.random.normal(ks[1], (8, H, 128, D), jnp.float32)
    vd = jax.random.normal(ks[2], (8, H, 128, D), jnp.float32)
    lengths = jnp.arange(8) * 16 + 8
    biasd = jax.random.normal(ks[3], (8, H, 128), jnp.float32) * 0.3
    check("decode attn",
          jax.jit(lambda *a: decode_attention(*a, lengths=lengths, bias=biasd,
                                              sm_scale=0.125))(qd, kd, vd),
          decode_attention_ref(qd, kd, vd, lengths=lengths, bias=biasd,
                               sm_scale=0.125), atol=1e-2)
    kq, ksc = quantize_kv(kd)
    vq, vsc = quantize_kv(vd)
    check("decode attn int8",
          jax.jit(lambda: decode_attention(qd, kq, vq, k_scales=ksc,
                                           v_scales=vsc, lengths=lengths,
                                           bias=biasd, sm_scale=0.125))(),
          decode_attention_ref(qd, kq, vq, k_scales=ksc, v_scales=vsc,
                               lengths=lengths, bias=biasd, sm_scale=0.125),
          atol=1e-2)  # TPU exp/rsqrt approximations vs the CPU-evaluated oracle

    # ---- ragged paged decode attention (scalar-prefetch page tables) ----
    from flasht5_tpu.inference.paged_kv import (
        PagedKVPool, paged_decode_attention, paged_decode_attention_ref)
    import numpy as _np
    for quantized in (False, True):
        pool = PagedKVPool(num_pages=32, num_heads=H, page_size=32,
                           head_dim=D, max_slots=4, max_pages_per_slot=4,
                           quantized=quantized)
        prng = _np.random.default_rng(0)
        for slot, L in enumerate([100, 32, 7, 128]):
            pool.ensure_capacity(slot, L)
            for _ in range(L):
                pool.append(jnp.asarray([slot]),
                            jnp.asarray(prng.normal(size=(1, H, D)), jnp.float32),
                            jnp.asarray(prng.normal(size=(1, H, D)), jnp.float32))
        qp = jax.random.normal(ks[0], (4, H, D), jnp.float32)
        check(f"paged decode quant={quantized}",
              jax.jit(lambda q: paged_decode_attention(q, pool, sm_scale=0.125))(qp),
              paged_decode_attention_ref(qp, pool, sm_scale=0.125), atol=1e-2)

    print("ALL OK" if not FAILURES else f"FAILURES: {FAILURES}", flush=True)
    sys.exit(1 if FAILURES else 0)


if __name__ == "__main__":
    main()
